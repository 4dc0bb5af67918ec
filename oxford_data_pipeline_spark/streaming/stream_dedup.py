"""Streaming deduplication — exact dedup as documents ARRIVE, the
online form of `dedup_exact`.

Each incoming document gets the engine's content fingerprint
(md5 of normalized text); `dropDuplicates` on the fingerprint keeps
first-seen rows with state in the state store. With an event-time
column + `dropDuplicatesWithinWatermark`, state is bounded by the
watermark horizon — the production shape for continuous ingest where
re-crawls arrive within a bounded window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oxford_data_pipeline_spark.operators.textops import normalized


def fingerprinted(stream: DataFrame) -> DataFrame:
    """Attach the exact-dedup fingerprint to a document stream."""
    return stream.withColumn("exact_fp", F.md5(normalized("text")))


def dedup_stream(stream: DataFrame) -> DataFrame:
    """First-seen-wins streaming dedup (unbounded state: use only when
    the fingerprint space is bounded or the run is finite)."""
    return fingerprinted(stream).dropDuplicates(["exact_fp"])


def dedup_stream_within_watermark(
    stream: DataFrame, ts_col: str = "event_ts", delay: str = "1 hour"
) -> DataFrame:
    """Watermark-bounded streaming dedup: duplicates are suppressed if
    they arrive within the watermark horizon of the first sighting;
    state for older fingerprints is evicted — bounded memory forever."""
    return (
        fingerprinted(stream)
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["exact_fp"])
    )


def url_dedup_stream(
    stream: DataFrame,
    url_col: str = "source",
    ts_col: str = "event_ts",
    delay: str = "1 hour",
    id_col: str = "doc_id",
) -> DataFrame:
    """URL-tier streaming dedup — the online form of `dedup_url`, the
    FIRST pass of a continuous crawl ingest: each arriving capture is
    keyed by its NORMALIZED URL (`operators/urlops.py` — scheme / www /
    fragment / tracking-param / port / trailing-slash noise removed
    scan-locally) and first-seen-wins within the watermark horizon,
    exactly as a re-crawl window works in production (the recrawl of a
    page arrives within the horizon and is suppressed; state for older
    URLs is evicted — bounded memory forever).  Runs BEFORE content
    fingerprinting, so recrawled bytes never reach the content tier.

    Two contract points: (1) rows WITHOUT a real URL (the WARC
    connector coalesces a missing WARC-Target-URI to its corpus label,
    so their "URLs" all normalize identically) are keyed by `id_col`
    instead — URL dedup must never collapse distinct URI-less
    documents; they fall through to the content-tier dedup.  (2)
    first-SEEN wins at micro-batch granularity: across batches the
    earlier batch's row is kept, but within one micro-batch Spark's
    dropDuplicates keeps an arbitrary representative — the batch
    keep-rule (min doc_id, `dedup_url`) applies on compaction."""
    from oxford_data_pipeline_spark.operators.urlops import normalize_urls

    normed = normalize_urls(stream, url_col=url_col)
    # a real URL has a dotted host after normalization; label-only
    # sources ('warc', 'crawl-demo', ...) do not
    key = F.when(
        F.col("host").contains("."), F.col("norm_url")
    ).otherwise(F.concat(F.lit("#nourl#"), F.col(id_col).cast("string")))
    return (
        normed.withColumn("_url_key", key)
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["_url_key"])
        .drop("_url_key")
    )
