"""A2/A3 — trial-averaged projections + cross-session aggregation, and
F11 — flip-detection predicate (SURVEY §2.4, §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oxford_data_pipeline_spark.functions.compat import round6
from oxford_data_pipeline_spark.plans.registry import register
from oxford_data_pipeline_spark.sources.catalog import load_table

# --------------------------------------------------------------------------
# A2/A3 — two-level aggregation: per-session trial average, then
# cross-session mean/std/SEM (union semantics over conditions)
# --------------------------------------------------------------------------
_A3_ORACLE = """
WITH per_session AS (
    SELECT event_type, user_id,
           CAST(epoch_ns(ts) // 3600000000000 % 24 AS INTEGER) AS t,
           avg(value) AS u_mean
    FROM events
    GROUP BY 1, 2, 3
)
SELECT event_type, t,
       count(*) AS n_sessions,
       round(avg(u_mean) * 1000000 + 0.01, 0) / 1000000 + 0 AS mean_u,
       CASE WHEN count(*) > 1 THEN round(stddev_samp(u_mean) * 1000000 + 0.01, 0) / 1000000 + 0 END AS std_u,
       CASE WHEN count(*) > 1
            THEN round(stddev_samp(u_mean) / sqrt(count(*)) * 1000000 + 0.01, 0) / 1000000 + 0 END AS sem_u
FROM per_session
GROUP BY 1, 2
"""


@register("a3_cross_session_agg", _A3_ORACLE)
def a3_cross_session_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 trial-averaged projection per session (`cross_trial_type_cca_
    analysis.py:690-711`) then A3 cross-session mean/std/SEM
    (`:989-1164`) — two chained groupBys; the second input is one row
    per (condition, session, t), tiny at any scale."""
    ev = load_table(spark, sf_dir, "events")
    per_session = (
        ev.select(
            "event_type",
            "user_id",
            (F.expr("ts DIV 3600000000000") % 24).cast("int").alias("t"),
            "value",
        )
        .groupBy("event_type", "user_id", "t")
        .agg(F.avg("value").alias("u_mean"))
    )
    n = F.count(F.lit(1))
    std = F.when(n > 1, F.stddev_samp("u_mean"))
    return per_session.groupBy("event_type", "t").agg(
        n.alias("n_sessions"),
        round6(F.avg("u_mean")).alias("mean_u"),
        round6(std).alias("std_u"),
        round6(std / F.sqrt(n)).alias("sem_u"),
    )


# --------------------------------------------------------------------------
# F11 — flip-detection predicate: sessions anti-correlated with baseline
# --------------------------------------------------------------------------
_F11_ORACLE = """
WITH series AS (
    SELECT event_type, user_id,
           CAST(epoch_ns(ts) // 3600000000000 % 24 AS INTEGER) AS t,
           avg(value) AS v_raw
    FROM events GROUP BY 1, 2, 3
),
centered AS (
    SELECT event_type, user_id, t,
           v_raw - avg(v_raw) OVER (PARTITION BY event_type, user_id) AS v
    FROM series
),
baseline AS (
    SELECT event_type, min(user_id) AS baseline_user FROM centered GROUP BY 1
),
corrs AS (
    SELECT c.event_type, c.user_id, corr(c.v, b.v) AS r
    FROM centered c
    JOIN baseline bl ON c.event_type = bl.event_type
    JOIN centered b
      ON b.event_type = c.event_type AND b.user_id = bl.baseline_user
     AND b.t = c.t
    WHERE c.user_id <> bl.baseline_user
    GROUP BY 1, 2
)
SELECT event_type, user_id, round(r * 1000000 + 0.01, 0) / 1000000 + 0 AS r
FROM corrs
WHERE round(r, 6) < -0.1
"""


@register("f11_flip_detection", _F11_ORACLE)
def f11_flip_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 — record (session, pair, comp) whose correlation against the
    reference falls below a negative threshold (`cross_trial_type_cca_
    analysis.py:2996-3054`; reference uses r < −0.5, here −0.1 so the
    driver tables produce a non-trivial result set)."""
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
    mu = series.groupBy("event_type", "user_id").agg(F.avg("v_raw").alias("mu"))
    centered = (
        series.join(mu, ["event_type", "user_id"])
        .withColumn("v", F.col("v_raw") - F.col("mu"))
        .select("event_type", "user_id", "t", "v")
    )
    baseline = centered.groupBy("event_type").agg(
        F.min("user_id").alias("baseline_user")
    )
    b = (
        centered.join(baseline, "event_type")
        .filter(F.col("user_id") == F.col("baseline_user"))
        .select("event_type", "t", F.col("v").alias("bv"))
    )
    corrs = (
        centered.join(baseline, "event_type")
        .filter(F.col("user_id") != F.col("baseline_user"))
        .join(b, ["event_type", "t"])
        .groupBy("event_type", "user_id")
        .agg(F.corr("v", "bv").alias("r"))
    )
    return corrs.filter(F.round("r", 6) < -0.1).select(
        "event_type", "user_id", round6("r").alias("r")
    )
