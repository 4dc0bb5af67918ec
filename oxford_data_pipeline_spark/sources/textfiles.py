"""Text-corpus ingestion connectors: JSONL and CSV document sources.

Training corpora rarely arrive as parquet — the common interchange
shapes are JSON-Lines (one document object per line; the HF datasets /
Dolma / RedPajama convention) and CSV exports.  These connectors
normalize either shape onto the engine's canonical `documents` schema
(doc_id long, text string, lang string, source string, n_chars long)
so every registered text/dedup/curation query runs unchanged on
ingested corpora.

Scale notes:
- Both readers are plain `spark.read` sources — schema is EXPLICIT
  (never inferSchema, which double-scans), compression is handled by
  the format (gzip/zstd JSONL splits at file granularity; prefer many
  medium files over one giant archive).
- Malformed rows go to a quarantine column, not a job failure:
  `mode=PERMISSIVE` + `columnNameOfCorruptRecord` keeps a 100 TB
  ingest running and auditable (`bad_rows` counts them).
- Missing doc_id: a deterministic id is derived from the content
  (xxhash64 of source+text), NOT monotonically_increasing_id — content
  ids are stable across re-ingests and partition layouts, which is
  what incremental/CDC maintenance needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

_CORRUPT = "_corrupt_record"


def _normalize(df: DataFrame, default_source: str) -> DataFrame:
    """Project any (doc_id?, text, lang?, source?) relation onto the
    canonical documents schema with content-derived ids for rows that
    lack one."""
    out = df
    if "doc_id" not in out.columns:
        out = out.withColumn("doc_id", F.lit(None).cast("long"))
    if "lang" not in out.columns:
        out = out.withColumn("lang", F.lit(None).cast("string"))
    if "source" not in out.columns:
        out = out.withColumn("source", F.lit(None).cast("string"))
    src = F.coalesce(F.col("source"), F.lit(default_source))
    content_id = F.xxhash64(src, F.col("text"))
    return out.select(
        F.coalesce(F.col("doc_id").cast("long"), content_id).alias("doc_id"),
        F.col("text").cast("string").alias("text"),
        F.col("lang").cast("string").alias("lang"),
        src.alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    ).filter(F.col("text").isNotNull())


def read_jsonl_documents(
    spark: SparkSession, path: str, source: str = "jsonl"
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus → (documents, quarantine).  Documents carry
    the canonical schema; quarantine holds the raw text of lines that
    failed to parse (PERMISSIVE mode), for the ingest audit trail."""
    # StructType.add mutates in place — build a fresh copy per call
    schema = T.StructType(list(DOC_SCHEMA.fields) + [T.StructField(_CORRUPT, T.StringType())])
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    raw = raw.cache()  # one scan feeds both splits
    bad = raw.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_line")
    )
    good = raw.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    return _normalize(good, source), bad


def read_csv_documents(
    spark: SparkSession, path: str, source: str = "csv", header: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Read a CSV corpus → (documents, quarantine).  Explicit schema,
    RFC-4180 quoting/escapes, multiline quoted fields supported (text
    columns contain newlines), malformed rows quarantined."""
    # StructType.add mutates in place — build a fresh copy per call
    schema = T.StructType(list(DOC_SCHEMA.fields) + [T.StructField(_CORRUPT, T.StringType())])
    raw = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path)
    )
    raw = raw.cache()
    bad = raw.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_line")
    )
    good = raw.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    return _normalize(good, source), bad
