"""Streaming quality gate — the batch admission stack applied to
documents as they ARRIVE.

The per-document gates are stateless scan-local expression chains
(`plans/quality.py:with_pii_features` / `with_c4_features`), so the
SAME column builders run unchanged on a streaming DataFrame: unified
batch/stream semantics with zero state store, zero watermark, and
bit-identical outputs (asserted in tests/test_sinks_streaming.py).
This is the ingest front-door of a production corpus: score + redact
+ gate each crawl batch online, route rejects to a quarantine sink,
and let only admitted documents reach the (stateful) dedup stage
downstream.  One Project node — Catalyst collapses the two feature
builders — so at any ingest rate the cost is the regex scan itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oxford_data_pipeline_spark.plans.quality import (
    with_c4_features,
    with_pii_features,
)

GATE_COLUMNS = [
    "doc_id",
    "source",
    "n_pii",
    "has_pii",
    "redacted_fp",
    "n_words",
    "has_curly",
    "has_lorem",
    "has_javascript",
    "c4_admitted",
    "admitted",
]


def quality_gate(docs: DataFrame) -> DataFrame:
    """PII + C4 features + the combined admission bit in one stateless
    projection over (doc_id, source, text).  Works identically on
    batch and streaming inputs; `admitted` requires passing the C4
    rules AND carrying no PII."""
    feat = with_c4_features(with_pii_features(docs))
    return feat.withColumn(
        "admitted", F.col("c4_admitted") & ~F.col("has_pii")
    ).select(*GATE_COLUMNS)
