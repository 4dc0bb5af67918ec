"""Multimodal-column queries (rows-only: the byte-level decode stub is
not SQL-expressible; schema/determinism are covered by property tests).
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
