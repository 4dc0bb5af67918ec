"""M12 — sign alignment as a staged DataFrame plan (SURVEY §2.9).

The reference flips per-session latent time courses so that all
sessions agree in sign before averaging (`cross_trial_type_cca_
analysis.py:1035-1147`): baseline = first session with a positive
restricted-window peak (W3/W7); sessions whose correlation with the
baseline is negative are flipped; the aligned mean is reported.

Here: sessions → users, latent time course → hour-of-day profile of
the (per-user centered) event value. Every stage is relational, so the
whole operator is oracle-checked — no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oxford_data_pipeline_spark.functions.compat import round6
from oxford_data_pipeline_spark.plans.memo import bounded_once
from oxford_data_pipeline_spark.plans.registry import register
from oxford_data_pipeline_spark.sources.catalog import load_table

_PEAK_LO, _PEAK_HI = 8, 17  # restricted peak window (hours, inclusive)

_M12_ORACLE = f"""
WITH series AS (
    SELECT event_type, user_id,
           CAST(epoch_ns(ts) // 3600000000000 % 24 AS INTEGER) AS t,
           avg(value) AS v_raw
    FROM events
    GROUP BY 1, 2, 3
),
centered AS (
    SELECT event_type, user_id, t,
           v_raw - avg(v_raw) OVER (PARTITION BY event_type, user_id) AS v
    FROM series
),
windowed AS (
    SELECT * FROM centered WHERE t BETWEEN {_PEAK_LO} AND {_PEAK_HI}
),
peaks AS (
    -- single-pass argmax: float self-equality across two scans is not
    -- stable under parallel aggregation, so rank on the rounded |v|
    SELECT event_type, user_id, v AS peak
    FROM (
        SELECT event_type, user_id, v,
               row_number() OVER (
                   PARTITION BY event_type, user_id
                   ORDER BY round(abs(v), 6) DESC, t
               ) AS rn
        FROM windowed
    )
    WHERE rn = 1
),
baseline AS (
    SELECT event_type, min(user_id) AS baseline_user
    FROM peaks WHERE peak > 0 GROUP BY 1
),
corrs AS (
    SELECT c.event_type, c.user_id, corr(c.v, b.v) AS r
    FROM centered c
    JOIN baseline bl ON c.event_type = bl.event_type
    JOIN centered b
      ON b.event_type = c.event_type AND b.user_id = bl.baseline_user
     AND b.t = c.t
    GROUP BY 1, 2
),
signed AS (
    SELECT c.event_type, c.user_id, c.t,
           CASE WHEN round(r.r, 6) < 0 THEN -c.v ELSE c.v END AS v_aligned,
           CASE WHEN round(r.r, 6) < 0 THEN 1 ELSE 0 END AS flipped
    FROM centered c
    JOIN corrs r ON c.event_type = r.event_type AND c.user_id = r.user_id
)
SELECT event_type, t,
       round(avg(v_aligned) * 1000000 + 0.01, 0) / 1000000 + 0 AS aligned_mean,
       count(*) AS n_users,
       CAST(sum(flipped) AS BIGINT) AS n_flipped
FROM signed
GROUP BY 1, 2
"""


@register("m12_sign_alignment", _M12_ORACLE)
def m12_sign_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M12 as a 5-stage relational plan: profile → restricted peak (W3)
    → first-positive baseline (W7) → per-user corr vs baseline (M9) →
    conditional flip + aligned mean. The flip decision is computed on
    the ROUNDED corr so both engines agree at the boundary."""
    ev = load_table(spark, sf_dir, "events")
    series = (
        ev.select(
            "event_type",
            "user_id",
            (F.expr("ts DIV 3600000000000") % 24).cast("int").alias("t"),
            "value",
        )
        .groupBy("event_type", "user_id", "t")
        .agg(F.avg("value").alias("v_raw"))
    )
    user_mean = series.groupBy("event_type", "user_id").agg(
        F.avg("v_raw").alias("mu")
    )
    # `centered` is BOUNDED (|types| x |users| x 24 profile rows — an
    # aggregate of the corpus, never the corpus) and referenced by FOUR
    # downstream subtrees (peaks, the baseline series b, corrs, signed);
    # materializing it once stops each reference from re-running the
    # corpus-sized per-(type, user, hour) aggregation + centering join.
    # LAZY checkpoint (r15, verdict item 4 + advisor item 4): the plan
    # truncation is identical, but the corpus aggregation no longer runs
    # as a separate eager job at construction time — the first consumer
    # materializes it inside the query's own action.
    centered = bounded_once(
        series.join(user_mean, ["event_type", "user_id"])
        .withColumn("v", F.col("v_raw") - F.col("mu"))
        .select("event_type", "user_id", "t", "v")
    )
    windowed = centered.filter(F.col("t").between(_PEAK_LO, _PEAK_HI))
    from pyspark.sql.window import Window as W

    wpk = W.partitionBy("event_type", "user_id").orderBy(
        F.round(F.abs("v"), 6).desc(), F.col("t")
    )
    peaks = (
        windowed.withColumn("rn", F.row_number().over(wpk))
        .filter(F.col("rn") == 1)
        .select("event_type", "user_id", F.col("v").alias("peak"))
    )
    baseline = (
        peaks.filter(F.col("peak") > 0)
        .groupBy("event_type")
        .agg(F.min("user_id").alias("baseline_user"))
    )
    b = (
        centered.join(baseline, "event_type")
        .filter(F.col("user_id") == F.col("baseline_user"))
        .select("event_type", "t", F.col("v").alias("bv"))
    )
    corrs = (
        centered.join(b, ["event_type", "t"])
        .groupBy("event_type", "user_id")
        .agg(F.corr("v", "bv").alias("r"))
    )
    flip = F.round("r", 6) < 0
    signed = centered.join(corrs, ["event_type", "user_id"]).select(
        "event_type",
        "user_id",
        "t",
        F.when(flip, -F.col("v")).otherwise(F.col("v")).alias("v_aligned"),
        F.when(flip, 1).otherwise(0).alias("flipped"),
    )
    return signed.groupBy("event_type", "t").agg(
        round6(F.avg("v_aligned")).alias("aligned_mean"),
        F.count(F.lit(1)).alias("n_users"),
        F.sum("flipped").cast("long").alias("n_flipped"),
    )
