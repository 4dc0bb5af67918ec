"""Statistics as column algebra (SURVEY §2.9: M9, M11, M13, M16).

Everything here is associative aggregates + tiny post-aggregate math —
no UDFs, no collect — so it is oracle-verifiable and scales to any
number of groups. The p-value transforms that need distribution CDFs
live in the ML layer (`ml/inference.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from oxford_data_pipeline_spark.functions.compat import round6
from oxford_data_pipeline_spark.plans.registry import register
from oxford_data_pipeline_spark.sources.catalog import load_table


# --------------------------------------------------------------------------
# M9 — Pearson correlation (+ r², t statistic) per group
# --------------------------------------------------------------------------
_M9_ORACLE = """
SELECT l_returnflag,
       count(*) AS n,
       round(corr(l_quantity, l_extendedprice) * 1000000 + 0.01, 0) / 1000000 + 0 AS r,
       round(corr(l_quantity, l_extendedprice) ^ 2 * 1000000 + 0.01, 0) / 1000000 + 0 AS r2,
       round(corr(l_quantity, l_extendedprice)
             * sqrt((count(*) - 2) / (1 - corr(l_quantity, l_extendedprice) ^ 2)),
             6) + 0 AS t_stat
FROM lineitem
GROUP BY 1
"""


@register("m9_pearson_corr", _M9_ORACLE)
def m9_pearson_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9 — `pearsonr` per group (`cross_trial_type_cca_analysis.py:
    769-798`): built-in F.corr; t = r·√((n−2)/(1−r²)) feeds the p-value
    (M9's p computed in ml.inference via the t CDF)."""
    li = load_table(spark, sf_dir, "lineitem")
    r = F.corr("l_quantity", "l_extendedprice")
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        round6(r).alias("r"),
        round6(r * r).alias("r2"),
        round6(r * F.sqrt((n - 2) / (1 - r * r))).alias("t_stat"),
    )


# --------------------------------------------------------------------------
# M11 — paired difference: Cohen's d + paired-t statistic
# --------------------------------------------------------------------------
_M11_ORACLE = """
WITH per_pair AS (
    SELECT o_custkey,
           avg(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) AS a,
           avg(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) AS b
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
    GROUP BY 1
    HAVING count(CASE WHEN o_orderstatus = 'O' THEN 1 END) > 0
       AND count(CASE WHEN o_orderstatus = 'F' THEN 1 END) > 0
),
diffs AS (SELECT a - b AS d FROM per_pair)
SELECT count(*) AS n,
       round(avg(d) * 1000000 + 0.01, 0) / 1000000 + 0 AS mean_diff,
       round(stddev_samp(d) * 1000000 + 0.01, 0) / 1000000 + 0 AS std_diff,
       round(avg(d) / stddev_samp(d) * 1000000 + 0.01, 0) / 1000000 + 0 AS cohens_d,
       round(avg(d) / stddev_samp(d) * sqrt(count(*)) * 1000000 + 0.01, 0) / 1000000 + 0 AS t_stat
FROM diffs
"""


@register("m11_cohens_d", _M11_ORACLE)
def m11_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M11 — paired t + Cohen's d = mean(diff)/std(diff) on paired
    observations (`...within_session.py:652-715`): pairing = customers
    with both conditions; everything downstream is column math."""
    orders = load_table(spark, sf_dir, "orders")
    per_pair = (
        orders.filter(F.col("o_orderstatus").isin("O", "F"))
        .groupBy("o_custkey")
        .agg(
            F.avg(F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))).alias("a"),
            F.avg(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))).alias("b"),
        )
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    )
    d = per_pair.select((F.col("a") - F.col("b")).alias("d"))
    mean_d, std_d, n = F.avg("d"), F.stddev_samp("d"), F.count(F.lit(1))
    return d.agg(
        n.alias("n"),
        round6(mean_d).alias("mean_diff"),
        round6(std_d).alias("std_diff"),
        round6(mean_d / std_d).alias("cohens_d"),
        round6(mean_d / std_d * F.sqrt(n)).alias("t_stat"),
    )


# --------------------------------------------------------------------------
# M13 — effective dimensionality: participation ratio, entropy, cum-90
# --------------------------------------------------------------------------
_M13_ORACLE = """
WITH ev AS (
    SELECT n.n_regionkey AS grp, c.c_nationkey AS component,
           sum(o.o_totalprice) AS v
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
),
shares AS (
    SELECT grp, component, v,
           v / sum(v) OVER (PARTITION BY grp) AS p,
           sum(v) OVER (PARTITION BY grp ORDER BY v DESC, component
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               / sum(v) OVER (PARTITION BY grp) AS cum_share,
           row_number() OVER (PARTITION BY grp ORDER BY v DESC, component) AS rnk
    FROM ev
)
SELECT grp,
       count(*) AS n_components,
       round(pow(sum(v), 2) / sum(v * v) * 1000000 + 0.01, 0) / 1000000 + 0 AS participation_ratio,
       round(exp(-sum(p * ln(p))) * 1000000 + 0.01, 0) / 1000000 + 0 AS entropy_dim,
       min(CASE WHEN cum_share >= 0.9 THEN rnk END) AS k90
FROM shares
GROUP BY 1
"""


@register("m13_effective_dim", _M13_ORACLE)
def m13_effective_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M13 — participation ratio (Σλ)²/Σλ², entropy eff-dim
    exp(−Σ p ln p), and cumulative-90 argmax
    (`History/.../Dimensionality_communication_analysis.py:85-151`).
    Windows run on the aggregated (grp, component) table only."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    ev = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_regionkey").alias("grp"), F.col("c_nationkey").alias("component"))
        .agg(F.sum("o_totalprice").alias("v"))
    )
    wg = W.partitionBy("grp")
    wo = W.partitionBy("grp").orderBy(F.col("v").desc(), F.col("component"))
    shares = ev.select(
        "grp",
        "component",
        "v",
        (F.col("v") / F.sum("v").over(wg)).alias("p"),
        (
            F.sum("v").over(wo.rowsBetween(W.unboundedPreceding, W.currentRow))
            / F.sum("v").over(wg)
        ).alias("cum_share"),
        F.row_number().over(wo).alias("rnk"),
    )
    return shares.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_components"),
        round6(F.pow(F.sum("v"), 2) / F.sum(F.col("v") * F.col("v"))).alias(
            "participation_ratio"
        ),
        round6(F.exp(-F.sum(F.col("p") * F.log("p")))).alias("entropy_dim"),
        F.min(F.when(F.col("cum_share") >= 0.9, F.col("rnk"))).alias("k90"),
    )


# --------------------------------------------------------------------------
# M16 — Spearman correlation via deterministic ranks + Pearson
# --------------------------------------------------------------------------
_M16_ORACLE = """
WITH ranked AS (
    SELECT o_orderpriority,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey) AS rx,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_custkey, o_orderkey) AS ry
    FROM orders
)
SELECT o_orderpriority,
       count(*) AS n,
       round(corr(rx, ry) * 1000000 + 0.01, 0) / 1000000 + 0 AS spearman_r
FROM ranked
GROUP BY 1
"""


@register("m16_spearman", _M16_ORACLE)
def m16_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M16 — Spearman = Pearson on ranks (`History/.../Dimensionality_
    communication_analysis.py:359-362`); ranks use an explicit unique
    tiebreak so both engines produce identical permutations."""
    orders = load_table(spark, sf_dir, "orders")
    wx = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wy = W.partitionBy("o_orderpriority").orderBy("o_custkey", "o_orderkey")
    ranked = orders.select(
        "o_orderpriority",
        F.row_number().over(wx).alias("rx"),
        F.row_number().over(wy).alias("ry"),
    )
    return ranked.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        round6(F.corr("rx", "ry")).alias("spearman_r"),
    )


# --------------------------------------------------------------------------
# M10 (relational form) — Wilcoxon signed-rank statistic as rank algebra
# --------------------------------------------------------------------------
# The signed-rank statistic needs no UDF: zeros drop, average ranks
# for ties come from the grouped-|d| cumulative count
# (avg_rank = cnt_less + (cnt + 1)/2), W+ is a weighted sum, and the
# tie-corrected normal z is closed-form — the same math as
# ml/linalg.py:wilcoxon_signed_rank minus the p-value (the normal CDF
# has no common SQL primitive; the kernel query m10_wilcoxon reports
# it).  Differences are pre-rounded to 4 decimals with the stable
# convention so tie groups agree bit-for-bit across engines (raw
# avg() outputs differ by ~1e-15 between engines, which would
# otherwise split a tie).  Scale: the pair relation is bounded by
# |customers|; everything after is a 1-group rollup.
_M10_STAT_ORACLE = """
WITH per_pair AS (
    SELECT o_custkey,
           avg(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) AS a,
           avg(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) AS b
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
    GROUP BY 1
    HAVING count(CASE WHEN o_orderstatus = 'O' THEN 1 END) > 0
       AND count(CASE WHEN o_orderstatus = 'F' THEN 1 END) > 0
),
diffs AS (
    SELECT round((a - b) * 10000 + 0.01, 0) / 10000 AS d FROM per_pair
),
nz AS (SELECT d, abs(d) AS absd FROM diffs WHERE d <> 0),
grouped AS (
    SELECT absd, count(*) AS cnt,
           sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS pos_cnt
    FROM nz GROUP BY 1
),
ranked AS (
    SELECT absd, cnt, pos_cnt,
           sum(cnt) OVER (ORDER BY absd
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - cnt AS cnt_less
    FROM grouped
),
stats AS (
    SELECT CAST(sum(cnt) AS BIGINT) AS n,
           sum(pos_cnt * (cnt_less + (cnt + 1) / 2.0)) AS w_plus,
           sum(cnt * cnt * cnt - cnt) / 48.0 AS tie_term
    FROM ranked
)
SELECT n,
       round(w_plus * 1000000 + 0.01, 0) / 1000000 + 0 AS w_stat,
       round((w_plus - n * (n + 1) / 4.0)
             / sqrt(n * (n + 1) * (2.0 * n + 1) / 24.0 - tie_term)
             * 1000000 + 0.01, 0) / 1000000 + 0 AS z
FROM stats
"""


@register("m10_wilcoxon_stat", _M10_STAT_ORACLE)
def m10_wilcoxon_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10 as pure rank algebra: W+ and the tie-corrected normal z of
    the Wilcoxon signed-rank test, hash-checked against DuckDB (the
    kernel query m10_wilcoxon adds the p-value)."""
    orders = load_table(spark, sf_dir, "orders")
    per_pair = (
        orders.filter(F.col("o_orderstatus").isin("O", "F"))
        .groupBy("o_custkey")
        .agg(
            F.avg(
                F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))
            ).alias("a"),
            F.avg(
                F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
            ).alias("b"),
        )
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    )
    d4 = F.round((F.col("a") - F.col("b")) * 10000 + F.lit(0.01), 0) / 10000
    nz = per_pair.select(d4.alias("d")).filter(F.col("d") != 0).withColumn(
        "absd", F.abs("d")
    )
    grouped = nz.groupBy("absd").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).alias("pos_cnt"),
    )
    w = W.orderBy("absd").rowsBetween(W.unboundedPreceding, W.currentRow)
    ranked = grouped.withColumn("cnt_less", F.sum("cnt").over(w) - F.col("cnt"))
    stats = ranked.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(
            F.col("pos_cnt") * (F.col("cnt_less") + (F.col("cnt") + 1) / 2.0)
        ).alias("w_plus"),
        (F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")) / 48.0).alias(
            "tie_term"
        ),
    )
    n = F.col("n")
    mu = n * (n + 1) / 4.0
    sigma = F.sqrt(n * (n + 1) * (2.0 * n + 1) / 24.0 - F.col("tie_term"))
    return stats.select(
        "n",
        round6(F.col("w_plus")).alias("w_stat"),
        round6((F.col("w_plus") - mu) / sigma).alias("z"),
    )
