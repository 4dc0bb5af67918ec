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
) -> DataFrame:
    """URL-tier streaming dedup — the online form of `dedup_url`, the
    FIRST pass of a continuous crawl ingest: each arriving capture is
    keyed by its NORMALIZED URL (`operators/urlops.py` — scheme / www /
    fragment / tracking-param / port / trailing-slash noise removed
    scan-locally) and first-seen-wins within the watermark horizon,
    exactly as a re-crawl window works in production (the recrawl of a
    page arrives within the horizon and is suppressed; state for older
    URLs is evicted — bounded memory forever).  Runs BEFORE content
    fingerprinting, so recrawled bytes never reach the content tier."""
    from oxford_data_pipeline_spark.operators.urlops import normalize_urls

    return (
        normalize_urls(stream, url_col=url_col)
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["norm_url"])
    )
