"""Streaming multimodal fingerprinting — the online half of the
perceptual-hash near-dup index (`plans/multimodal.mm_phash`).

The dHash kernel is STATELESS per document (decode → band/column
integer sums → 60 bits), so the streaming maintainer is the same
Arrow `mapInPandas` kernel applied to the arriving micro-batch — no
state store, no shuffle, bit-identical rows to the batch fingerprint
relation (asserted in tests/test_sinks_streaming.py).  Downstream the
(doc_id, phash, blk0..blk3) rows merge into the maintained block
index exactly like a batch delta; arriving docs probe the existing
block tables for near-dup candidates the same way `dedup_incremental`
probes the band index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def phash_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, text, ...) → (doc_id, phash, blk0..blk3) for each
    arriving ASCII document — the same payload synthesis + real-codec
    kernel as the batch query, streaming-safe because it is
    scan-local."""
    from oxford_data_pipeline_spark.operators.multimodal import image_phash

    ascii_only = docs.filter(
        F.length(F.encode("text", "UTF-8")) == F.length("text")
    )
    mm = ascii_only.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return mm.mapInPandas(
        image_phash,
        schema="doc_id long, phash long, blk0 long, blk1 long,"
        " blk2 long, blk3 long",
    )
