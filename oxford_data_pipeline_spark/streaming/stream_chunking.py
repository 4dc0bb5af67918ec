"""Streaming context-window chunking — `text_chunking`'s transform
applied to documents as they ARRIVE.

Chunking is a stateless per-document explode (tokenize → window
starts → slice → fingerprint): no aggregation, no state store, no
watermark, so the SAME expression chain runs unchanged on a streaming
DataFrame and produces bit-identical rows to the batch plan (asserted
in tests/test_sinks_streaming.py).  This is the online half of a RAG
ingest path: each arriving document fans out into its chunk rows,
which downstream stages embed / index / dedup (the chunk fingerprint
is the dedup key — a stateful `dropDuplicates` on `chunk_fp` with a
watermark gives online chunk-level dedup for free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oxford_data_pipeline_spark.operators.textops import normalized, tokens
from oxford_data_pipeline_spark.plans.textops import _CHUNK_SIZE, _CHUNK_STRIDE

CHUNK_COLUMNS = ["doc_id", "chunk_idx", "start_pos", "n_tokens", "chunk_fp"]


def chunk_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, text, ...) → one row per overlapping token window,
    identical schema and values to the batch `text_chunking` query.
    Works on batch and streaming inputs alike; extra input columns
    (e.g. event_ts for downstream watermarking) pass through."""
    passthrough = [c for c in docs.columns if c not in ("text",)]
    t = tokens(normalized("text"))
    starts = docs.select(
        *passthrough,
        t.alias("t"),
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.size(t), F.lit(1)), F.lit(_CHUNK_STRIDE)
            )
        ).alias("start_pos"),
    )
    c = F.slice("t", F.col("start_pos"), _CHUNK_SIZE)
    extra = [p for p in passthrough if p != "doc_id"]
    return starts.select(
        "doc_id",
        ((F.col("start_pos") - 1) / _CHUNK_STRIDE).cast("int").alias("chunk_idx"),
        F.col("start_pos").cast("int"),
        F.size(c).alias("n_tokens"),
        F.md5(F.array_join(c, " ")).alias("chunk_fp"),
        *extra,
    )
