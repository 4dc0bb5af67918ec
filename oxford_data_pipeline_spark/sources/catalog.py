"""Source catalog: the driver star schema + session-file discovery.

Reference parity (SURVEY.md §2.1):
- S3 session-file discovery by glob (`CCA_test_all.py:187-192`) →
  path glob + ``input_file_name()``-derived keys.
- S4 multi-condition source union (`cross_trial_type_cca_analysis.py:
  67-70,290-340`) → ``unionByName`` with a ``lit(condition)`` column.
- S5/S7 sinks → partitioned parquet / json writers.

At 100 TB each table is a partitioned parquet dataset; here each is a
single file per scale factor under /root/testdata/sf*/.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table; Catalyst prunes columns/filters at the scan.

    All time math in the engine uses exact integer-nanosecond columns
    (`ts DIV 1e9` etc.), mirrored by `epoch_ns(ts)` in oracle SQL —
    integer arithmetic is unit-exact and timezone-free at any scale.
    The driver's parquet files have shipped both TIMESTAMP(NANOS)
    physical columns (readable only as raw longs via the legacy flag)
    and TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ); normalize either to
    epoch-nanosecond longs at the scan so every downstream plan sees
    one canonical schema.  Naive timestamps are interpreted as UTC,
    matching DuckDB's `epoch_ns` on the same files.

    Engine-built sessions (`session.get_spark`) already carry both
    required confs from session creation; the check-and-set below only
    fires for externally supplied sessions (e.g. the driver harness),
    so repeated catalog reads never mutate session state (round-3
    advice re: silent nanosAsLong inheritance).
    """
    for conf_key, want in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        if spark.conf.get(conf_key, None) != want:
            spark.conf.set(conf_key, want)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    ts_cols = [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("timestamp", "timestamp_ntz")
    ]
    for c in ts_cols:
        df = df.withColumn(
            c, F.unix_micros(F.col(c).cast("timestamp")) * F.lit(1000)
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def fan_out(df: DataFrame) -> DataFrame:
    """Widen a narrow scan before CPU-heavy per-row derivations.

    Parquet splits at row-group boundaries, so a small single-file table
    (one row group) scans as ONE task — and everything derived from it
    (tokenization, shingling, hashing) runs single-threaded no matter
    how many cores exist.  When the scan has fewer partitions than the
    cluster's default parallelism, shuffle the (compact, compressed)
    rows once so the expensive derivation runs wide.  On a production
    corpus with thousands of row groups the condition is false and this
    is a no-op — no gratuitous shuffle at scale.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all catalog tables as temp views for the SQL API."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def union_conditions(frames: dict[str, DataFrame], condition_col: str = "trial_type") -> DataFrame:
    """S4: union per-condition sources, tagging each with its condition.

    Mirrors the reference's TRIAL_TYPES dict of per-condition result dirs
    (`cross_trial_type_cca_analysis.py:67-70,290-340`); in Spark the union
    is lazy and each branch still gets its own pushed-down scan.
    """
    out = None
    for cond, df in frames.items():
        tagged = df.withColumn(condition_col, F.lit(cond))
        out = tagged if out is None else out.unionByName(tagged)
    if out is None:
        raise ValueError("no condition frames supplied")
    return out


def with_source_file(df: DataFrame, pattern: str = r"([^/]+)\.parquet$") -> DataFrame:
    """S3: derive a source key from the input file path (glob discovery)."""
    return df.withColumn(
        "source_file", F.regexp_extract(F.input_file_name(), pattern, 1)
    )
