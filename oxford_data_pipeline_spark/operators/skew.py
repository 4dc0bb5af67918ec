"""Skew-mitigation helpers (SURVEY §4 / BASELINE 100 TB posture).

AQE's skew-join splitting handles most cases automatically
(`spark.sql.adaptive.skewJoin.enabled=true` in the session factory);
these helpers cover the two patterns AQE cannot: skewed AGGREGATION
keys (two-phase salted aggregate) and skewed BROADCAST-side replication
(salted join against a replicated small side).

Salts are deterministic (hash of stable columns mod n) so results are
reproducible — never rand().
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(cols: Sequence[str], n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) from the row's stable columns."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)).cast("int")


def salted_sum_count(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    salt_cols: Sequence[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: phase 1 reduces each
    (key, salt) shard, phase 2 combines the ≤ n_salts shard rows per
    key. Correct for any algebraic aggregate (sum/count here; avg =
    sum/count downstream). A hot key's rows spread over n_salts
    reducers instead of one."""
    group_cols = list(group_cols)
    phase1 = (
        df.withColumn("_salt", salt_column(salt_cols, n_salts))
        .groupBy(*group_cols, "_salt")
        .agg(F.sum(value_col).alias("_s"), F.count(F.lit(1)).alias("_c"))
    )
    return phase1.groupBy(*group_cols).agg(
        F.sum("_s").alias(f"sum_{value_col}"),
        F.sum("_c").alias("n"),
    )


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_cols: Sequence[str],
    n_salts: int = 16,
) -> DataFrame:
    """Skew-proof equi-join: the fact side gets a deterministic salt,
    the (small) dim side is replicated n_salts× with every salt value,
    and the join key becomes (key, salt) — a hot key's fact rows land
    on n_salts partitions. dim is broadcast, so replication is free."""
    salts = fact.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("_salt")
    )
    dim_rep = dim.crossJoin(F.broadcast(salts))
    salted_fact = fact.withColumn("_salt", salt_column(salt_cols, n_salts))
    return salted_fact.join(F.broadcast(dim_rep), [key, "_salt"]).drop("_salt")
