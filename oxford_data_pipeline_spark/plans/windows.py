"""Aggregation (SURVEY §2.4) and window-function (§2.5) queries.

Scale notes: every window here partitions by a bounded-cardinality key
(priority, status, nation) — no global unpartitioned windows except the
deliberately tiny post-aggregate ones, which run on grouped outputs
(cardinality ≤ #groups), never on fact rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from oxford_data_pipeline_spark.functions.compat import round2, round6
from oxford_data_pipeline_spark.plans.registry import register
from oxford_data_pipeline_spark.sources.catalog import load_table


# --------------------------------------------------------------------------
# A4 — connectivity matrix: rank per partition then pivot to matrix
# --------------------------------------------------------------------------
_A4_ORACLE = """
WITH ranked AS (
    SELECT o_orderpriority, o_orderstatus, o_totalprice,
           row_number() OVER (
               PARTITION BY o_orderpriority, o_orderstatus
               ORDER BY o_totalprice DESC, o_orderkey
           ) AS rnk
    FROM orders
)
SELECT o_orderpriority,
       round(avg(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) * 1000000 + 0.01, 0) / 1000000 + 0 AS "O",
       round(avg(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) * 1000000 + 0.01, 0) / 1000000 + 0 AS "F",
       round(avg(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END) * 1000000 + 0.01, 0) / 1000000 + 0 AS "P"
FROM ranked
WHERE rnk <= 10
GROUP BY 1
"""


@register("a4_connectivity_pivot", _A4_ORACLE)
def a4_connectivity_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+W1 — connectivity-matrix build (`CCA_test_all.py:481-541`):
    rank within (pair, session) by metric desc, keep top-k, pivot the
    second key into matrix columns."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority", "o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    ranked = orders.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 10)
    return (
        ranked.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(round6(F.avg("o_totalprice")))
    )


# --------------------------------------------------------------------------
# A5 — per-pair max-then-mean (two-level aggregation)
# --------------------------------------------------------------------------
_A5_ORACLE = """
WITH per_cust AS (
    SELECT o_orderpriority, o_custkey, max(o_totalprice) AS max_price
    FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority,
       count(*) AS n_customers,
       round(avg(max_price) * 1000000 + 0.01, 0) / 1000000 + 0 AS mean_max_price
FROM per_cust GROUP BY 1
"""


@register("a5_max_then_mean", _A5_ORACLE)
def a5_max_then_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — mean-over-sessions of max-over-components
    (`CCA_test_all.py:872-887`): two chained groupBys; the second runs
    on already-reduced data (one row per (pair, session))."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_orderpriority", "o_custkey").agg(
        F.max("o_totalprice").alias("max_price")
    )
    return per_cust.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_customers"),
        round6(F.avg("max_price")).alias("mean_max_price"),
    )


# --------------------------------------------------------------------------
# A6 — label distribution
# --------------------------------------------------------------------------
_A6_ORACLE = "SELECT event_type AS label, count(*) AS n FROM events GROUP BY 1"


@register("a6_label_distribution", _A6_ORACLE)
def a6_label_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — `groupcounts(t_approach,'label')`
    (`oxford_single_session_pipeline_mdl.m:128-134`)."""
    from oxford_data_pipeline_spark.operators.aggregates import label_distribution

    events = load_table(spark, sf_dir, "events")
    return label_distribution(events.withColumnRenamed("event_type", "label"))


# --------------------------------------------------------------------------
# A7 — threshold availability grid
# --------------------------------------------------------------------------
_THRESHOLDS = [10, 20, 30, 50, 75, 100]

_A7_ORACLE = f"""
WITH counts AS (
    SELECT user_id, event_type, count(*) AS n
    FROM events GROUP BY 1, 2
),
grid AS (SELECT unnest({_THRESHOLDS!r}) AS threshold)
SELECT c.event_type, g.threshold,
       CAST(sum(CASE WHEN c.n >= g.threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_available,
       count(*) AS n_total,
       round(sum(CASE WHEN c.n >= g.threshold THEN 1 ELSE 0 END) * 100.0
             / count(*) * 1000000 + 0.01, 0) / 1000000 + 0 AS pct_available
FROM counts c CROSS JOIN grid g
GROUP BY 1, 2
"""


@register("a7_threshold_grid", _A7_ORACLE)
def a7_threshold_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — neuron-count threshold availability
    (`analyze_neuron_count_thresholds.m:114-235`): per-entity counts
    crossJoined with a broadcast literal threshold grid."""
    from oxford_data_pipeline_spark.operators.aggregates import threshold_availability

    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    out = threshold_availability(
        counts, _THRESHOLDS, count_col="n", group_col="event_type", entity_col="user_id"
    )
    return out.select(
        "event_type", "threshold", "n_available", "n_total",
        round6("pct_available").alias("pct_available"),
    )


# --------------------------------------------------------------------------
# A8 — per-group count statistics (incl. median)
# --------------------------------------------------------------------------
_A8_ORACLE = """
WITH counts AS (
    SELECT n_regionkey, n_nationkey, count(*) AS n
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
)
SELECT n_regionkey,
       count(*) AS n_groups,
       round(avg(n) * 1000000 + 0.01, 0) / 1000000 + 0 AS mean_n,
       round(median(n) * 1000000 + 0.01, 0) / 1000000 + 0 AS median_n,
       min(n) AS min_n,
       max(n) AS max_n,
       CASE WHEN count(*) > 1 THEN round(stddev_samp(n) * 1000000 + 0.01, 0) / 1000000 + 0 END AS std_n
FROM counts GROUP BY 1
"""


@register("a8_count_stats", _A8_ORACLE)
def a8_count_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — N/mean/median/min/max/std of per-session neuron counts
    (`analyze_neuron_count_thresholds.m:237-252`)."""
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    counts = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_regionkey", "n_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    n_groups = F.count(F.lit(1))
    return counts.groupBy("n_regionkey").agg(
        n_groups.alias("n_groups"),
        round6(F.avg("n")).alias("mean_n"),
        round6(F.median("n")).alias("median_n"),
        F.min("n").alias("min_n"),
        F.max("n").alias("max_n"),
        F.when(n_groups > 1, round6(F.stddev_samp("n"))).alias("std_n"),
    )


# --------------------------------------------------------------------------
# A9 — two-level summary with ROLLUP
# --------------------------------------------------------------------------
_A9_ORACLE = """
SELECT o_orderpriority,
       grouping(o_orderpriority) AS g,
       count(*) AS n_orders,
       round(avg(o_totalprice) * 1000000 + 0.01, 0) / 1000000 + 0 AS mean_price,
       round(min(o_totalprice) * 1000000 + 0.01, 0) / 1000000 + 0 AS min_price,
       round(max(o_totalprice) * 1000000 + 0.01, 0) / 1000000 + 0 AS max_price
FROM orders
GROUP BY ROLLUP (o_orderpriority)
"""


@register("a9_rollup_summary", _A9_ORACLE)
def a9_rollup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 — per-pair summary + overall rollup row
    (`oxford_GLM_CCA_coefficients_extract.m:504-557`)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority")
        .agg(
            F.grouping("o_orderpriority").cast("long").alias("g"),
            F.count(F.lit(1)).alias("n_orders"),
            round6(F.avg("o_totalprice")).alias("mean_price"),
            round6(F.min("o_totalprice")).alias("min_price"),
            round6(F.max("o_totalprice")).alias("max_price"),
        )
    )


# --------------------------------------------------------------------------
# A10 — hierarchical rollup via mapping join, dropping within-group pairs
# --------------------------------------------------------------------------
_A10_ORACLE = """
WITH hier AS (
    SELECT n_nationkey, n_name,
           CASE WHEN n_regionkey IN (0, 1) THEN 'WEST'
                WHEN n_regionkey IN (2, 4) THEN 'EAST'
                ELSE 'CENTRAL' END AS region_group
    FROM nation
),
flows AS (
    SELECT hc.region_group AS g_cust, hs.region_group AS g_supp,
           l.l_extendedprice * (1 - l.l_discount) AS revenue
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN hier hc     ON c.c_nationkey = hc.n_nationkey
    JOIN hier hs     ON s.s_nationkey = hs.n_nationkey
)
SELECT least(g_cust, g_supp) AS pair_g1,
       greatest(g_cust, g_supp) AS pair_g2,
       count(*) AS n_flows,
       round(sum(revenue) * 100 + 0.01, 0) / 100 + 0 AS total_revenue
FROM flows
WHERE g_cust <> g_supp
GROUP BY 1, 2
"""


@register("a10_hierarchical_rollup", _A10_ORACLE)
def a10_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — anatomical-hierarchy rollup (`cross_trial_type_cca_
    analysis.py:96-118,1691-1868`): map fine regions → groups via a
    broadcast dimension, drop within-group pairs, canonicalize the pair
    key (J5), re-aggregate."""
    nat = load_table(spark, sf_dir, "nation")
    hier = nat.select(
        "n_nationkey",
        F.when(F.col("n_regionkey").isin(0, 1), "WEST")
        .when(F.col("n_regionkey").isin(2, 4), "EAST")
        .otherwise("CENTRAL")
        .alias("region_group"),
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    hc = hier.withColumnRenamed("region_group", "g_cust").alias("hc")
    hs = hier.withColumnRenamed("region_group", "g_supp").alias("hs")
    flows = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(hc), cust.c_nationkey == F.col("hc.n_nationkey"))
        .join(F.broadcast(hs), supp.s_nationkey == F.col("hs.n_nationkey"))
        .withColumn("revenue", F.col("l_extendedprice") * (1 - F.col("l_discount")))
    )
    return (
        flows.filter(F.col("g_cust") != F.col("g_supp"))
        .groupBy(
            F.least("g_cust", "g_supp").alias("pair_g1"),
            F.greatest("g_cust", "g_supp").alias("pair_g2"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_flows"),
            round2(F.sum("revenue")).alias("total_revenue"),
        )
    )


# --------------------------------------------------------------------------
# A11 — cumulative sum window (cumulative explained variance)
# --------------------------------------------------------------------------
_A11_ORACLE = """
WITH per_nation AS (
    SELECT c_nationkey, sum(o_totalprice) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
),
tot AS (SELECT sum(revenue) AS total FROM per_nation)
SELECT p.c_nationkey,
       round(p.revenue * 100 + 0.01, 0) / 100 + 0 AS revenue,
       round(sum(p.revenue) OVER (ORDER BY p.revenue DESC, p.c_nationkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / t.total * 1000000 + 0.01, 0) / 1000000 + 0
           AS cum_share
FROM per_nation p CROSS JOIN tot t
"""


@register("a11_cumulative_share", _A11_ORACLE)
def a11_cumulative_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 — `cumsum(explained_variance)` (`perform_region_pca.m:
    201-204`) as an unbounded-preceding running sum over the grouped
    (small) result — the window never touches fact rows."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    per_nation = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    tot = per_nation.agg(F.sum("revenue").alias("total"))
    w = W.orderBy(F.col("revenue").desc(), F.col("c_nationkey")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return per_nation.crossJoin(F.broadcast(tot)).select(
        "c_nationkey",
        round2("revenue").alias("revenue"),
        round6(F.sum("revenue").over(w) / F.col("total")).alias("cum_share"),
    )


# --------------------------------------------------------------------------
# W2 — percent_rank removal schedule (sensitivity-grid shape)
# --------------------------------------------------------------------------
_W2_ORACLE = """
WITH ranked AS (
    SELECT o_orderpriority, o_totalprice,
           percent_rank() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey
           ) AS pr
    FROM orders
),
grid AS (SELECT unnest([0.0, 0.25, 0.5, 0.75]) AS pct_removed)
SELECT r.o_orderpriority, g.pct_removed,
       count(*) FILTER (WHERE r.pr >= g.pct_removed) AS n_remaining,
       round(sum(r.o_totalprice) FILTER (WHERE r.pr >= g.pct_removed) * 100 + 0.01, 0) / 100 + 0
           AS sum_remaining
FROM ranked r CROSS JOIN grid g
GROUP BY 1, 2
"""


@register("w2_removal_schedule", _W2_ORACLE)
def w2_removal_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/M7 grid shape — top-|β| removal schedule (`Oxford_glm_
    sensitivity.m:276-314`): percent_rank per group, crossJoin the ρ
    grid, conditional aggregate of what survives each removal level."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    ranked = orders.withColumn("pr", F.percent_rank().over(w))
    grid = spark.createDataFrame(
        [(0.0,), (0.25,), (0.5,), (0.75,)], "pct_removed double"
    )
    keep = F.col("pr") >= F.col("pct_removed")
    return (
        ranked.crossJoin(F.broadcast(grid))
        .groupBy("o_orderpriority", "pct_removed")
        .agg(
            F.count(F.when(keep, 1)).alias("n_remaining"),
            round2(F.sum(F.when(keep, F.col("o_totalprice")))).alias("sum_remaining"),
        )
    )


# --------------------------------------------------------------------------
# W3/W4 — restricted-window peak (argmax of |value|) with det. tiebreak
# --------------------------------------------------------------------------
_W3_ORACLE = """
WITH windowed AS (
    SELECT event_type, event_id, value
    FROM events
    WHERE epoch_ns(ts) // 60000000000 % 226 BETWEEN 74 AND 149
),
peak AS (
    SELECT event_type, max(abs(value)) AS peak_abs FROM windowed GROUP BY 1
),
tie AS (
    SELECT w.event_type, min(w.event_id) AS peak_event_id
    FROM windowed w JOIN peak p
      ON w.event_type = p.event_type AND abs(w.value) = p.peak_abs
    GROUP BY 1
)
SELECT t.event_type,
       round(w.value * 1000000 + 0.01, 0) / 1000000 + 0 AS peak_value,
       round(p.peak_abs * 1000000 + 0.01, 0) / 1000000 + 0 AS peak_abs
FROM tie t
JOIN windowed w ON w.event_id = t.peak_event_id AND w.event_type = t.event_type
JOIN peak p     ON p.event_type = t.event_type
"""


@register("w3_restricted_peak", _W3_ORACLE)
def w3_restricted_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3/W4 — value at argmax(|value|) within a restricted time window
    (`CCA_test_all.py:727-750`), with an explicit min-id tiebreak so the
    result is deterministic under parallelism (SURVEY §7 hard part 1)."""
    events = load_table(spark, sf_dir, "events")
    windowed = events.select(
        "event_type", "event_id", "value",
        (F.expr("ts DIV 60000000000") % 226).alias("t"),
    ).filter(F.col("t").between(74, 149))
    peak = windowed.groupBy("event_type").agg(F.max(F.abs("value")).alias("peak_abs"))
    tie = (
        windowed.join(peak, "event_type")
        .filter(F.abs("value") == F.col("peak_abs"))
        .groupBy("event_type")
        .agg(F.min("event_id").alias("peak_event_id"))
    )
    return (
        tie.join(
            windowed,
            (tie.peak_event_id == windowed.event_id)
            & (tie.event_type == windowed.event_type),
            "inner",
        )
        .drop(windowed.event_type)
        .join(peak, "event_type")
        .select(
            "event_type",
            round6("value").alias("peak_value"),
            round6("peak_abs").alias("peak_abs"),
        )
    )


# --------------------------------------------------------------------------
# W5 — percentile significance threshold
# --------------------------------------------------------------------------
_W5_ORACLE = """
WITH thresh AS (
    SELECT o_orderpriority, quantile_cont(o_totalprice, 0.9) AS p90
    FROM orders GROUP BY 1
)
SELECT o.o_orderpriority,
       count(*) AS n_significant,
       round(min(o.o_totalprice) * 1000000 + 0.01, 0) / 1000000 + 0 AS min_significant,
       round(t.p90 * 1000000 + 0.01, 0) / 1000000 + 0 AS p90
FROM orders o JOIN thresh t ON o.o_orderpriority = t.o_orderpriority
WHERE o.o_totalprice >= t.p90
GROUP BY 1, t.p90
"""


@register("w5_percentile_threshold", _W5_ORACLE)
def w5_percentile_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 — significance = metric ≥ 90th percentile of its partition
    (`perform_session_cca.m:154-156`). Exact `percentile` (not approx)
    so the oracle agrees; at 100 TB swap to `percentile_approx` with a
    documented tolerance."""
    orders = load_table(spark, sf_dir, "orders")
    thresh = orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.9)").alias("p90")
    )
    return (
        orders.join(F.broadcast(thresh), "o_orderpriority")
        .filter(F.col("o_totalprice") >= F.col("p90"))
        .groupBy("o_orderpriority", "p90")
        .agg(
            F.count(F.lit(1)).alias("n_significant"),
            round6(F.min("o_totalprice")).alias("min_significant"),
        )
        .select(
            "o_orderpriority", "n_significant", "min_significant",
            round6("p90").alias("p90"),
        )
    )


# --------------------------------------------------------------------------
# W6 — contiguous fold assignment over a total order
# --------------------------------------------------------------------------
_W6_ORACLE = """
WITH ordered AS (
    SELECT value,
           row_number() OVER (ORDER BY user_id, epoch_ns(ts), event_id) - 1 AS rn
    FROM events
),
tot AS (SELECT count(*) AS n FROM ordered)
SELECT least(rn * 10 // t.n, 9) AS fold,
       count(*) AS n_rows,
       round(avg(value) * 1000000 + 0.01, 0) / 1000000 + 0 AS avg_value
FROM ordered CROSS JOIN tot t
GROUP BY 1
"""


@register("w6_contiguous_folds", _W6_ORACLE)
def w6_contiguous_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 — contiguous CV-fold assignment over an explicit total order
    (`perform_session_cca.m:287-291`): fold k = block k of the
    (trial, time)-ordered rows; the ordering is explicit columns, never
    physical row order."""
    events = load_table(spark, sf_dir, "events")
    w = W.orderBy("user_id", "ts", "event_id")
    ordered = events.select(
        "value", (F.row_number().over(w) - 1).alias("rn")
    )
    tot = ordered.agg(F.count(F.lit(1)).alias("n"))
    return (
        ordered.crossJoin(F.broadcast(tot))
        .select(
            F.least(F.expr("rn * 10 DIV n"), F.lit(9).cast("long")).alias("fold"),
            "value",
        )
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            round6(F.avg("value")).alias("avg_value"),
        )
    )


# --------------------------------------------------------------------------
# W7 — first-match baseline selection over a deterministic order
# --------------------------------------------------------------------------
_W7_ORACLE = """
WITH peaks AS (
    SELECT event_type, user_id, max(value) AS peak
    FROM events GROUP BY 1, 2
),
baseline AS (
    SELECT event_type, min(user_id) AS baseline_user
    FROM peaks WHERE peak > 150 GROUP BY 1
)
SELECT b.event_type, b.baseline_user,
       round(p.peak * 1000000 + 0.01, 0) / 1000000 + 0 AS baseline_peak
FROM baseline b
JOIN peaks p ON p.event_type = b.event_type AND p.user_id = b.baseline_user
"""


@register("w7_first_match_baseline", _W7_ORACLE)
def w7_first_match_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7/M12 stage 1 — the first session (in explicit order) whose
    peak passes the predicate becomes the sign baseline
    (`cross_trial_type_cca_analysis.py:1069-1096`)."""
    events = load_table(spark, sf_dir, "events")
    peaks = events.groupBy("event_type", "user_id").agg(F.max("value").alias("peak"))
    baseline = (
        peaks.filter(F.col("peak") > 150)
        .groupBy("event_type")
        .agg(F.min("user_id").alias("baseline_user"))
    ).alias("b")
    p = peaks.alias("p")
    return (
        baseline.join(
            p,
            (F.col("b.event_type") == F.col("p.event_type"))
            & (F.col("b.baseline_user") == F.col("p.user_id")),
        )
        .select(
            F.col("b.event_type").alias("event_type"),
            "baseline_user",
            round6("peak").alias("baseline_peak"),
        )
    )


# --------------------------------------------------------------------------
# A12 — Monte-Carlo iteration averaging over seeded subsamples
# --------------------------------------------------------------------------
_N_ITERS = 5

_A12_ORACLE = f"""
WITH iters AS (SELECT unnest(range({_N_ITERS})) AS iteration),
sampled AS (
    SELECT i.iteration, o.o_orderpriority, o.o_totalprice
    FROM orders o CROSS JOIN iters i
    WHERE substr(md5(CAST(i.iteration AS VARCHAR) || '|' || CAST(o.o_orderkey AS VARCHAR)), 1, 1)
          IN ('0', '1', '2', '3', '4', '5', '6', '7')
),
per_iter AS (
    SELECT o_orderpriority, iteration,
           avg(abs(o_totalprice)) AS mean_abs, count(*) AS n
    FROM sampled GROUP BY 1, 2
)
SELECT o_orderpriority,
       count(*) AS n_iterations,
       round(avg(mean_abs) * 1000000 + 0.01, 0) / 1000000 + 0 AS mc_mean,
       round(stddev_samp(mean_abs) * 1000000 + 0.01, 0) / 1000000 + 0 AS mc_std
FROM per_iter
GROUP BY 1
"""


@register("a12_mc_average", _A12_ORACLE)
def a12_mc_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 — mean over seeded Monte-Carlo iterations
    (`oxford_neuron_stability.m:450-457`; `perform_session_cca.m:
    322-323`): each iteration is a deterministic md5-keyed ~50%
    subsample; the final statistic is the across-iteration mean ± std.
    The iteration grid is a broadcast literal — rows scale linearly."""
    orders = load_table(spark, sf_dir, "orders")
    iters = spark.range(_N_ITERS).select(F.col("id").cast("int").alias("iteration"))
    member = F.substring(
        F.md5(
            F.concat_ws(
                "|", F.col("iteration").cast("string"), F.col("o_orderkey").cast("string")
            )
        ),
        1,
        1,
    ).isin(*"01234567")
    per_iter = (
        orders.crossJoin(F.broadcast(iters))
        .filter(member)
        .groupBy("o_orderpriority", "iteration")
        .agg(F.avg(F.abs("o_totalprice")).alias("mean_abs"))
    )
    return per_iter.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_iterations"),
        round6(F.avg("mean_abs")).alias("mc_mean"),
        round6(F.stddev_samp("mean_abs")).alias("mc_std"),
    )
