"""Multimodal-column queries.

`mm_byte_features` (rows-only) exercises the real Arrow/mapInPandas
decode plumbing — the numpy kernel is not SQL-expressible.
`mm_metadata_profile` is the oracle-checked half: the typed-metadata
layer (modality tagging, payload byte accounting) computed as plain
relational expressions identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oxford_data_pipeline_spark.functions.compat import round6
from oxford_data_pipeline_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
)
from oxford_data_pipeline_spark.plans.registry import register
from oxford_data_pipeline_spark.sources.catalog import load_table


_PROFILE_ORACLE = """
WITH m AS (
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           octet_length(encode(text)) AS n_bytes,
           ascii(text) AS first_byte
    FROM documents
)
SELECT modality,
       count(*) AS n_docs,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       round(avg(n_bytes) * 1000000 + 0.01, 0) / 1000000 + 0 AS avg_bytes,
       min(n_bytes) AS min_bytes,
       max(n_bytes) AS max_bytes,
       round(avg(first_byte) * 1000000 + 0.01, 0) / 1000000 + 0 AS avg_first_byte
FROM m GROUP BY 1
"""


@register("mm_metadata_profile", _PROFILE_ORACLE)
def mm_metadata_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata profile — the typed-metadata layer of the
    binary-column convention as a hash-checked relational query: per
    modality, payload byte accounting (octet lengths of the encoded
    payload) and the first-byte mean (corpus is ASCII, so codepoint ==
    byte on both engines).  One map-side-combinable aggregation; the
    opaque-payload byte features stay in `mm_byte_features`."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
        F.ascii("text").alias("first_byte"),
    )
    return m.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        round6(F.avg("n_bytes")).alias("avg_bytes"),
        F.min("n_bytes").alias("min_bytes"),
        F.max("n_bytes").alias("max_bytes"),
        round6(F.avg("first_byte")).alias("avg_first_byte"),
    )


@register("mm_byte_features")
def mm_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → mapInPandas feature extraction → per-modality
    rollup. The per-doc feature pass is partition-parallel with Arrow
    batches; the rollup is one small aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_binary_payload(docs))
    return (
        feats.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            round6(F.avg("byte_entropy")).alias("avg_entropy"),
            round6(F.avg("n_bytes")).alias("avg_bytes"),
            round6(F.avg(F.element_at("hist", 1))).alias("avg_hist_bin0"),
        )
    )
