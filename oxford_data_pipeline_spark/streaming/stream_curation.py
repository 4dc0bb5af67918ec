"""Streaming curation pipeline — the quality gate CHAINED into the
stateful near-dup matcher: the streaming twin of the batch
`cur_pipeline` composition (`plans/curation.py`).

Topology (one streaming plan, one state store):

    raw crawl stream (doc_id, source, text, event_ts)
      -> quality admission   [stateless projection: PII + C4 gates,
                              `stream_quality.quality_gate` columns]
      -> admitted docs only
      -> MinHash band rows   [stateless, codegen — bit-identical to
                              the batch signatures]
      -> keyed dedup state   [`stream_neardup._match`: one group per
                              (band, sig), watermark-evicted]
      -> near-dup candidate rows

Rejected documents never create dedup state — the gate runs BEFORE
the shuffle to (band, sig) groups, so a PII-bearing or boilerplate
crawl wave costs only its scan, exactly like the batch pipeline's
gate-then-dedup stage order.  At 100 TB/day ingest this ordering is
the difference between state sized by the ADMITTED corpus and state
sized by the raw crawl.

A streaming query has one sink; the quarantine side (rejected rows +
reasons) is therefore a SECOND query over the same source — Spark
shares the source files, each query keeps its own checkpoint — or a
`foreachBatch` fan-out when both sinks must commit atomically.
`quarantine_stream` builds the rejected-side plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oxford_data_pipeline_spark.plans.quality import (
    with_c4_features,
    with_pii_features,
)
from oxford_data_pipeline_spark.streaming.stream_neardup import neardup_stream


def admitted_stream(stream: DataFrame) -> DataFrame:
    """The admission stage: append gate features, keep admitted docs
    (C4 rules pass AND no PII), project back to the dedup input shape.
    Stateless — safe anywhere in a streaming plan."""
    feat = with_c4_features(with_pii_features(stream))
    return feat.filter(F.col("c4_admitted") & ~F.col("has_pii")).select(
        "doc_id", "source", "text", "event_ts"
    )


def curation_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Gate -> near-dup candidates in ONE streaming plan: each arriving
    admitted document that shares an LSH band signature with its key's
    first-seen representative emits a candidate row (band, sig, doc_id,
    matched_doc, event_ts).  Rejected documents are filtered before the
    state shuffle and never touch the store."""
    return neardup_stream(
        admitted_stream(stream).select("doc_id", "text", "event_ts"), watermark
    )


def quarantine_stream(stream: DataFrame) -> DataFrame:
    """The rejected side: every non-admitted document with its reasons
    — run as a second query over the same source (own checkpoint), or
    inside a foreachBatch fan-out for atomic dual-sink commits."""
    feat = with_c4_features(with_pii_features(stream))
    return feat.filter(~(F.col("c4_admitted") & ~F.col("has_pii"))).select(
        "doc_id",
        "source",
        "event_ts",
        "has_pii",
        "c4_admitted",
        F.when(F.col("has_pii"), "pii")
        .when(~F.col("c4_admitted"), "c4")
        .alias("reason"),
    )
