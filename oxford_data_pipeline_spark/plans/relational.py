"""Relational core queries (SURVEY.md §2.2 filters, §2.3 joins,
§2.7 set ops, §2.6 sorts/limits, §2.8 scalar functions).

Each query re-expresses a reference operator family on the driver star
schema and is paired with DuckDB oracle SQL. Scale posture: dimension
joins broadcast; fact-side groupBys shuffle once on their keys; every
"random" choice is a deterministic hash so results are reproducible on
any cluster layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oxford_data_pipeline_spark.functions.compat import round2, round6
from oxford_data_pipeline_spark.plans.registry import register
from oxford_data_pipeline_spark.sources.catalog import load_table


# --------------------------------------------------------------------------
# F1/F2/F8/F10 — predicate stack with repair semantics
# --------------------------------------------------------------------------
_F_ORACLE = """
SELECT l_returnflag,
       l_linestatus,
       count(*) AS n,
       round(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.01, 0) / 100 + 0 AS revenue,
       round(avg(l_quantity) * 1000000 + 0.01, 0) / 1000000 + 0 AS avg_qty
FROM lineitem
WHERE l_returnflag <> 'N'
  AND l_quantity BETWEEN 5 AND 45
  AND l_discount IS NOT NULL
  AND l_linestatus IN ('O', 'F')
GROUP BY 1, 2
"""


@register("f_predicate_stack", _F_ORACLE)
def f_predicate_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2 equality+IN predicates, F8 null guard, F10 label sanity
    (`segment_mdl_to_trials.m:117-156`; `perform_region_analysis.m:37-40`).
    All predicates push to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_returnflag") != "N")
            & F.col("l_quantity").between(5, 45)
            & F.col("l_discount").isNotNull()
            & F.col("l_linestatus").isin("O", "F")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            ),
            round6(F.avg("l_quantity")).alias("avg_qty"),
        )
    )


# --------------------------------------------------------------------------
# F5/F6 — HAVING admission + semi-join back (region min-count pattern)
# --------------------------------------------------------------------------
_F5_ORACLE = """
WITH admitted AS (
    SELECT c_nationkey
    FROM customer
    GROUP BY c_nationkey
    HAVING count(*) >= 5
)
SELECT c.c_nationkey,
       count(*) AS n_customers,
       round(avg(c.c_acctbal) * 1000000 + 0.01, 0) / 1000000 + 0 AS avg_acctbal
FROM customer c
WHERE c.c_nationkey IN (SELECT c_nationkey FROM admitted)
GROUP BY 1
"""


@register("f5_having_admission", _F5_ORACLE)
def f5_having_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 min-count admission (≥ threshold per group,
    `perform_region_analysis.m:43-75`) + F6 subset selection as a
    broadcast semi-join (`perform_session_cca.m:101-104`)."""
    cust = load_table(spark, sf_dir, "customer")
    admitted = (
        cust.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") >= 5)
    )
    return (
        cust.join(F.broadcast(admitted.select("c_nationkey")), "c_nationkey", "left_semi")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            round6(F.avg("c_acctbal")).alias("avg_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# F7 — min-sessions predicate (HAVING on countDistinct)
# --------------------------------------------------------------------------
_F7_ORACLE = """
SELECT l_partkey,
       count(DISTINCT l_orderkey) AS n_orders,
       round(sum(l_quantity) * 100 + 0.01, 0) / 100 + 0 AS total_qty
FROM lineitem
GROUP BY 1
HAVING count(DISTINCT l_orderkey) >= 3
"""


@register("f7_min_distinct", _F7_ORACLE)
def f7_min_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — keep entities seen in ≥ 3 distinct parents
    (`CCA_test_all.py:139-147`; min_sessions=3)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            round2(F.sum("l_quantity")).alias("total_qty"),
        )
        .filter(F.col("n_orders") >= 3)
    )


# --------------------------------------------------------------------------
# J2 — dimension-enrichment join chain (broadcast)
# --------------------------------------------------------------------------
_J2_ORACLE = """
SELECT r.r_name,
       n.n_name,
       count(*) AS n_customers,
       round(sum(c.c_acctbal) * 100 + 0.01, 0) / 100 + 0 AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
"""


@register("j2_dim_enrichment", _J2_ORACLE)
def j2_dim_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 neuron↔region enrichment analog (`extract_session_data_mdl.m:
    129-152`): fact rows joined to small dimensions — both joins
    broadcast, zero shuffles on the dimension side."""
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            round2(F.sum("c_acctbal")).alias("total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# J3 + J5/J6 — region-pair self-join with canonical pair keys
# --------------------------------------------------------------------------
_J3_ORACLE = """
WITH valid AS (
    SELECT n.n_regionkey, n.n_name
    FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
    HAVING count(*) >= 3
)
SELECT a.n_regionkey AS region_group,
       least(a.n_name, b.n_name) AS pair_r1,
       greatest(a.n_name, b.n_name) AS pair_r2
FROM valid a JOIN valid b
  ON a.n_regionkey = b.n_regionkey AND a.n_name < b.n_name
"""


@register("j3_pair_selfjoin", _J3_ORACLE)
def j3_pair_selfjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 all unordered pairs of admitted regions per session
    (`perform_region_analysis.m:79-99`) with J5 canonical keys
    (least/greatest replaces the reference's dual (i,j)/(j,i) lookup,
    `cross_trial_type_cca_analysis.py:480-535`)."""
    nat = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    valid = (
        nat.join(cust, nat.n_nationkey == cust.c_nationkey)
        .groupBy("n_regionkey", "n_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 3)
        .select("n_regionkey", "n_name")
    )
    a = valid.alias("a")
    b = valid.alias("b")
    return (
        a.join(
            b,
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_name") < F.col("b.n_name")),
        )
        .select(
            F.col("a.n_regionkey").alias("region_group"),
            F.least("a.n_name", "b.n_name").alias("pair_r1"),
            F.greatest("a.n_name", "b.n_name").alias("pair_r2"),
        )
    )


# --------------------------------------------------------------------------
# J4-analog — multi-fact join chain (lineitem ⋈ orders ⋈ customer ⋈ nation)
# --------------------------------------------------------------------------
_J4_ORACLE = """
SELECT n.n_name,
       o.o_orderpriority,
       count(*) AS n_items,
       round(sum(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.01, 0) / 100 + 0 AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'O'
GROUP BY 1, 2
"""


@register("j4_fact_join_chain", _J4_ORACLE)
def j4_fact_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 results↔source join analog (`oxford_GLM_CCA_coefficients_
    extract.m:142-260`): two large facts equi-join on their shared key,
    dimensions broadcast; filter pushed below the join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            round2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            ),
        )
    )


# --------------------------------------------------------------------------
# J8/E3 — fold assignment + train-set aggregation without a join
# --------------------------------------------------------------------------
_J8_ORACLE = """
WITH folded AS (
    SELECT o_orderkey % 5 AS fold, o_totalprice FROM orders
),
per_fold AS (
    SELECT fold, count(*) AS n_fold, sum(o_totalprice) AS sum_fold FROM folded GROUP BY 1
),
tot AS (
    SELECT count(*) AS n_all, sum(o_totalprice) AS sum_all FROM folded
)
SELECT p.fold,
       p.n_fold,
       t.n_all - p.n_fold AS n_train,
       round((t.sum_all - p.sum_fold) * 100 + 0.01, 0) / 100 + 0 AS sum_train
FROM per_fold p CROSS JOIN tot t
"""


@register("j8_fold_train_split", _J8_ORACLE)
def j8_fold_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 train/test setdiff per CV fold (`perform_session_cca.m:287-295`)
    expressed as complement-of-fold aggregates — the anti-join is free:
    train stats = global stats − fold stats (associative, 100 TB-safe)."""
    orders = load_table(spark, sf_dir, "orders")
    folded = orders.select(
        (F.col("o_orderkey") % 5).alias("fold"), "o_totalprice"
    )
    per_fold = folded.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_fold"), F.sum("o_totalprice").alias("sum_fold")
    )
    tot = folded.agg(
        F.count(F.lit(1)).alias("n_all"), F.sum("o_totalprice").alias("sum_all")
    )
    return per_fold.crossJoin(F.broadcast(tot)).select(
        "fold",
        "n_fold",
        (F.col("n_all") - F.col("n_fold")).alias("n_train"),
        round2(F.col("sum_all") - F.col("sum_fold")).alias("sum_train"),
    )


# --------------------------------------------------------------------------
# E1/E3/E4 — union / except / distinct
# --------------------------------------------------------------------------
_E_ORACLE = """
WITH membership AS (
    SELECT o_custkey,
           max(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS in_o,
           max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS in_f
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
    GROUP BY 1
)
SELECT count(*) AS n_union,
       count(CASE WHEN in_o = 1 AND in_f = 0 THEN 1 END) AS n_except,
       count(CASE WHEN in_o = 1 AND in_f = 1 THEN 1 END) AS n_intersect
FROM membership
"""


@register("e_set_ops", _E_ORACLE)
def e_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 union of condition sets (`cross_trial_type_cca_analysis.py:
    1022-1032`), E3 setdiff (`perform_session_cca.m:290`), E5 intersect
    (`neural_single_session_package_oxford_enhanced.py:629-662`).

    Implemented as ONE membership aggregation instead of three separate
    set-op jobs: union/except/intersect of key sets are conditional
    counts over per-key membership flags — one scan, one shuffle, lazy."""
    orders = load_table(spark, sf_dir, "orders")
    membership = (
        orders.filter(F.col("o_orderstatus").isin("O", "F"))
        .groupBy("o_custkey")
        .agg(
            F.max(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("in_o"),
            F.max(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("in_f"),
        )
    )
    return membership.agg(
        F.count(F.lit(1)).alias("n_union"),
        F.count(F.when((F.col("in_o") == 1) & (F.col("in_f") == 0), 1)).alias(
            "n_except"
        ),
        F.count(F.when((F.col("in_o") == 1) & (F.col("in_f") == 1), 1)).alias(
            "n_intersect"
        ),
    )


# --------------------------------------------------------------------------
# O1/J6 — deterministic ordering by position in a reference list
# --------------------------------------------------------------------------
_ANATOMICAL_ORDER = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

_O1_ORACLE = f"""
SELECT r.r_name,
       list_position({_ANATOMICAL_ORDER!r}, r.r_name) AS anat_rank,
       count(*) AS n_nations
FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
""".replace("'", "'")


@register("o1_anatomical_order", _O1_ORACLE)
def o1_anatomical_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/J6 — rank categories by position in a fixed reference
    ordering (`CCA_test_all.py:62-113,360-363`): the ordering is data,
    not code — `array_position` against a literal array."""
    reg = load_table(spark, sf_dir, "region")
    nat = load_table(spark, sf_dir, "nation")
    order_arr = F.array(*[F.lit(x) for x in _ANATOMICAL_ORDER])
    return (
        reg.join(nat, nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_nations"))
        .withColumn("anat_rank", F.array_position(order_arr, F.col("r_name")))
        .select("r_name", "anat_rank", "n_nations")
    )


# --------------------------------------------------------------------------
# O3 — deterministic pseudo-random k-of-n sample (seeded sampling analog)
# --------------------------------------------------------------------------
_O3_ORACLE = """
WITH ranked AS (
    SELECT p_partkey, p_retailprice,
           row_number() OVER (ORDER BY md5(CAST(p_partkey AS VARCHAR)), p_partkey) AS rn
    FROM part
)
SELECT p_partkey, p_retailprice FROM ranked WHERE rn <= 20
"""


@register("o3_seeded_sample", _O3_ORACLE)
def o3_seeded_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3/M18 — seeded k-of-n sampling (`neural_single_session_package_
    oxford_enhanced.py:490-496`; `perform_region_analysis.m:104-133`).
    Engine convention: "random" order = md5 of the key — identical on
    every engine, cluster layout, and retry (SURVEY §7 hard part 2)."""
    part = load_table(spark, sf_dir, "part")
    # orderBy+limit lowers to TakeOrderedAndProject (per-partition top-k
    # + driver merge) — no single-partition global-sort window
    return (
        part.orderBy(F.md5(F.col("p_partkey").cast("string")), F.col("p_partkey"))
        .limit(20)
        .select("p_partkey", "p_retailprice")
    )


# --------------------------------------------------------------------------
# §2.8 scalar functions — string/date/math families
# --------------------------------------------------------------------------
_SC_ORACLE = """
SELECT p_partkey,
       concat(p_brand, '_', p_type) AS part_key_str,
       regexp_replace(p_name, ' ', '_', 'g') AS name_underscored,
       str_split(p_type, ' ')[1] AS type_head,
       replace(p_brand, 'Brand#', 'B') AS brand_short,
       round(abs(p_retailprice - 1000.0) * 1000000 + 0.01, 0) / 1000000 + 0 AS price_dev,
       round(sqrt(p_size) * 1000000 + 0.01, 0) / 1000000 + 0 AS size_sqrt,
       CAST(floor(log(10, p_retailprice)) AS BIGINT) AS price_mag
FROM part
WHERE p_size >= 1
"""


@register("sc_scalar_functions", _SC_ORACLE)
def sc_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 — session-key sprintf, regexprep, strsplit, strrep and math
    (`extract_session_data_mdl.m:50`; `oxford_GLM_CCA_coefficients_
    extract.m:138,177`; `oxford_single_session_pipeline_mdl.m:66`)."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(F.col("p_size") >= 1).select(
        "p_partkey",
        F.concat_ws("_", "p_brand", "p_type").alias("part_key_str"),
        F.regexp_replace("p_name", " ", "_").alias("name_underscored"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
        F.expr("replace(p_brand, 'Brand#', 'B')").alias("brand_short"),
        round6(F.abs(F.col("p_retailprice") - 1000.0)).alias("price_dev"),
        round6(F.sqrt("p_size")).alias("size_sqrt"),
        F.floor(F.log(10.0, F.col("p_retailprice"))).cast("long").alias("price_mag"),
    )
