"""Streaming posting-list maintenance — the online half of the
maintained inverted index (`retrieval.postings_relation`).

Per arriving document the posting rows (doc_id, term, tf) are a
STATELESS per-document aggregation: tokenize, count terms within the
one document — `aggregate` over the token array, no shuffle, no state
store, no watermark.  The SAME expression chain runs unchanged on
batch and streaming inputs and produces bit-identical rows to the
batch posting relation (asserted in tests/test_sinks_streaming.py);
downstream an index maintainer merges the rows into the postings
table exactly as it merges `text_postings_incremental` deltas
(arrivals are pure `op=add` batches).  Per-doc length rows
(`doclen_stream`) come from the same pass for the BM25 normalizer
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oxford_data_pipeline_spark.operators.textops import normalized, tokens

POSTING_COLUMNS = ["doc_id", "term", "tf"]


def postings_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, text, ...) → one posting row per distinct term of each
    arriving document, identical values to the batch
    `postings_relation`.  The within-document term count is computed
    scan-locally with array higher-order functions (distinct terms ×
    aggregate), so no per-key state and no exchange is ever needed —
    each micro-batch emits its documents' postings independently."""
    passthrough = [c for c in docs.columns if c not in ("text", "t")]
    extra = [p for p in passthrough if p != "doc_id"]
    t = docs.select(*passthrough, tokens(normalized("text")).alias("t"))
    term = t.select(*passthrough, "t", F.explode(F.array_distinct("t")).alias("term"))
    # within-document term count, still scan-local (no state, no
    # exchange) but in CODEGEN: the previous `aggregate(t, 0L, ...)`
    # fold evaluated an interpreted lambda per token per distinct term
    # (higher-order functions are CodegenFallback — the r14 top_tf
    # defect); size(t) - size(array_remove(t, term)) counts the same
    # occurrences with a generated loop.  Tokens are never NULL (the
    # tokenizer filters empties), so remove-equality matches the fold's
    # `x = term` arithmetic exactly.
    tf = (F.size("t") - F.size(F.array_remove("t", F.col("term")))).cast("long")
    return term.select("doc_id", "term", tf.alias("tf"), *extra)


def doclen_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, text, ...) → (doc_id, dl): the arriving document's
    token length for the maintained BM25 doc-length table (docs with
    zero tokens are excluded, as in the batch relation)."""
    passthrough = [c for c in docs.columns if c != "text"]
    extra = [p for p in passthrough if p != "doc_id"]
    t = tokens(normalized("text"))
    return docs.select(
        "doc_id", F.size(t).cast("long").alias("dl"), *extra
    ).filter(F.col("dl") > 0)
