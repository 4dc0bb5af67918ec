"""Oracle-checked queries for the remaining SURVEY §2 lines that were
previously exercised only via pipeline tests: W4 peak amplitude, O4
truncate-to-min alignment, F9 significance predicate, J7 condition
weight reuse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oxford_data_pipeline_spark.functions.compat import round6
from oxford_data_pipeline_spark.plans.registry import register
from oxford_data_pipeline_spark.sources.catalog import load_table

_HOUR_NS = 3_600_000_000_000

_SERIES_CTE = f"""
series AS (
    SELECT event_type, user_id,
           CAST(epoch_ns(ts) // {_HOUR_NS} % 24 AS INTEGER) AS t,
           avg(value) AS v_raw
    FROM events GROUP BY 1, 2, 3
),
centered AS (
    SELECT event_type, user_id, t,
           v_raw - avg(v_raw) OVER (PARTITION BY event_type, user_id) AS v
    FROM series
)
"""


def _centered(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    series = (
        ev.select(
            "event_type",
            "user_id",
            (F.expr(f"ts DIV {_HOUR_NS}") % 24).cast("int").alias("t"),
            "value",
        )
        .groupBy("event_type", "user_id", "t")
        .agg(F.avg("value").alias("v_raw"))
    )
    mu = series.groupBy("event_type", "user_id").agg(F.avg("v_raw").alias("mu"))
    return (
        series.join(mu, ["event_type", "user_id"])
        .withColumn("v", F.col("v_raw") - F.col("mu"))
        .select("event_type", "user_id", "t", "v")
    )


# --------------------------------------------------------------------------
# W4 — post-stimulus peak amplitude
# --------------------------------------------------------------------------
_W4_ORACLE = f"""
WITH {_SERIES_CTE}
SELECT event_type, user_id,
       round(max(abs(v)) * 1000000 + 0.01, 0) / 1000000 + 0 AS peak_amp,
       count(*) AS n_bins
FROM centered
WHERE t BETWEEN 8 AND 17
GROUP BY 1, 2
"""


@register("w4_peak_amplitude", _W4_ORACLE)
def w4_peak_amplitude(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — `max(abs(proj))` within the post-stimulus window per
    (condition, session) (`cross_trial_type_cca_analysis.py:744-767`)."""
    c = _centered(spark, sf_dir).filter(F.col("t").between(8, 17))
    return c.groupBy("event_type", "user_id").agg(
        round6(F.max(F.abs("v"))).alias("peak_amp"),
        F.count(F.lit(1)).alias("n_bins"),
    )


# --------------------------------------------------------------------------
# O4 — truncate-to-min-length alignment
# --------------------------------------------------------------------------
_O4_ORACLE = f"""
WITH {_SERIES_CTE},
lens AS (SELECT user_id, max(t) AS t_max FROM centered GROUP BY 1),
cut AS (SELECT min(t_max) AS t_cut FROM lens)
SELECT c.event_type,
       count(*) AS n_rows,
       max(c.t) AS t_hi
FROM centered c CROSS JOIN cut
WHERE c.t <= cut.t_cut
GROUP BY 1
"""


@register("o4_truncate_min_length", _O4_ORACLE)
def o4_truncate_min_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 — align variable-length series by truncating to the shortest
    session (`CCA_test_all.py:720-723`)."""
    c = _centered(spark, sf_dir)
    lens = c.groupBy("user_id").agg(F.max("t").alias("t_max"))
    cut = lens.agg(F.min("t_max").alias("t_cut"))
    return (
        c.crossJoin(F.broadcast(cut))
        .filter(F.col("t") <= F.col("t_cut"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.max("t").alias("t_hi"))
    )


# --------------------------------------------------------------------------
# F9 — significance predicate on an inferential statistic
# --------------------------------------------------------------------------
_F9_ORACLE = """
WITH stats AS (
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           corr(l_quantity, l_extendedprice) AS r
    FROM lineitem
    GROUP BY 1, 2
)
SELECT l_returnflag, l_linestatus, n,
       round(r * 1000000 + 0.01, 0) / 1000000 + 0 AS r,
       round(r * sqrt((n - 2) / (1 - r ^ 2)) * 1000000 + 0.01, 0) / 1000000 + 0
           AS t_stat
FROM stats
WHERE abs(r * sqrt((n - 2) / (1 - r ^ 2))) > 1.96
"""


@register("f9_significance_filter", _F9_ORACLE)
def f9_significance_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 — keep only statistically significant effects
    (`oxford_GLM_CCA_coefficients_extract.m:471-473`; here the filter
    is |t| > 1.96, the large-sample p<0.05 boundary, expressed
    relationally so the predicate is oracle-checkable)."""
    li = load_table(spark, sf_dir, "lineitem")
    r = F.corr("l_quantity", "l_extendedprice")
    n = F.count(F.lit(1))
    stats = li.groupBy("l_returnflag", "l_linestatus").agg(
        n.alias("n"), r.alias("r")
    )
    t = F.col("r") * F.sqrt((F.col("n") - 2) / (1 - F.col("r") * F.col("r")))
    return stats.filter(F.abs(t) > 1.96).select(
        "l_returnflag",
        "l_linestatus",
        "n",
        round6("r").alias("r"),
        round6(t).alias("t_stat"),
    )


# --------------------------------------------------------------------------
# J7 — condition-alignment join: reference-condition weights reused
# --------------------------------------------------------------------------
_J7_ORACLE = f"""
WITH {_SERIES_CTE},
weights AS (
    -- "reference condition" = purchase: its per-(user, t) profile is
    -- the weight vector applied to every other condition
    SELECT user_id, t, v AS w FROM centered WHERE event_type = 'purchase'
)
SELECT c.event_type, c.user_id,
       round(sum(c.v * w.w) * 1000000 + 0.01, 0) / 1000000 + 0 AS proj,
       count(*) AS n_t
FROM centered c JOIN weights w ON c.user_id = w.user_id AND c.t = w.t
WHERE c.event_type <> 'purchase'
GROUP BY 1, 2
"""


@register("j7_condition_weight_reuse", _J7_ORACLE)
def j7_condition_weight_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 — the reference condition's weights applied to every other
    condition's data (`cross_trial_type_cca_analysis.py:569-715`):
    a join on (session, t) + sum-of-products projection."""
    c = _centered(spark, sf_dir)
    weights = (
        c.filter(F.col("event_type") == "purchase")
        .select("user_id", "t", F.col("v").alias("w"))
    )
    return (
        c.filter(F.col("event_type") != "purchase")
        .join(weights, ["user_id", "t"])
        .groupBy("event_type", "user_id")
        .agg(
            round6(F.sum(F.col("v") * F.col("w"))).alias("proj"),
            F.count(F.lit(1)).alias("n_t"),
        )
    )
