"""Streaming MinHash near-dup detection — `dedup_minhash_lsh`'s
candidate generation as documents ARRIVE.

The batch operator needs a corpus-wide shuffle per band; online, the
split is different and stream-friendly:

- **Signatures are stateless.** A doc's MinHash depends only on its
  own shingles, so the per-row form computes mh_s =
  `array_min(transform(shingles, sh -> md5(s|sh)))` entirely inside
  codegen — bit-identical to the batch aggregation (`operators/
  textops.py:minhash_band_signatures`, same md5(seed|shingle) string
  min, same band md5), which the tests assert.
- **Matching is keyed state.** One `applyInPandasWithState` group per
  (band, sig): the first-seen doc becomes the key's representative;
  every later arrival emits a (doc_id, matched_doc) candidate row.
  Event-time timeout evicts keys at the watermark, so state is bounded
  by the horizon — the same contract as `dropDuplicatesWithinWatermark`.

A doc pair sharing several bands emits one row per band; consumers
dedup batch-side (chaining another stateful op is restricted).  Exact
Jaccard verification of candidates stays a batch join against the
document store, as in the batch plan.

CHECKPOINT COMPATIBILITY: `STATE_SCHEMA` grew from 2 to 3 fields when
`last_ts` was added (idle-eviction support).  `applyInPandasWithState`
does not migrate state schemas — a stream restarted from a checkpoint
written before that change will fail or misread state.  Restarting
across the change requires a NEW checkpoint location (reprocessing
from the source per its retention), the standard Structured Streaming
contract for stateful schema changes.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from oxford_data_pipeline_spark.operators.textops import (
    normalized,
    tokens,
    word_shingles,
)

N_HASHES, ROWS_PER_BAND = 16, 4

OUTPUT_SCHEMA = (
    "band int, sig string, doc_id long, matched_doc long, event_ts timestamp"
)
STATE_SCHEMA = "first_doc long, first_ts long, last_ts long"


def _parse_duration_sec(text: str) -> float:
    """Spark interval string -> seconds.  Accepts the fixed-length
    units a watermark can carry — microsecond through week, multiple
    qty/unit pairs ('1 hour 30 minutes'), attached units ('90s',
    '10min', '500ms'), singular/plural long forms.  Calendar units
    (month/year, variable length) and anything unrecognized raise
    ValueError naming the accepted syntax."""
    units = {
        "us": 1e-6, "microsecond": 1e-6,
        "ms": 1e-3, "millisecond": 1e-3,
        "s": 1, "sec": 1, "second": 1,
        "min": 60, "minute": 60,
        "h": 3600, "hour": 3600,
        "d": 86400, "day": 86400,
        "w": 604800, "week": 604800,
    }
    pairs = re.findall(r"(\d+)\s*([a-zA-Z]+)", text.strip())
    if not pairs or "".join(q + u for q, u in pairs) != re.sub(
        r"\s+", "", text.strip()
    ):
        raise ValueError(
            f"unparseable interval {text!r}: expected qty/unit pairs like "
            "'90 seconds', '1 hour 30 minutes', '90s'"
        )
    total = 0.0
    for qty, unit in pairs:
        lu = unit.lower()
        # exact match first ('ms'/'us' would be mangled by rstrip),
        # then strip a plural 's' ('minutes' -> 'minute'; bare 's'
        # survives via the fallback)
        key = lu if lu in units else (lu.rstrip("s") or "s")
        if key not in units:
            raise ValueError(
                f"unknown interval unit {unit!r} in {text!r}: "
                f"expected one of {sorted(set(units))} "
                "(calendar units month/year are not fixed-length)"
            )
        total += int(qty) * units[key]
    return total


def band_signature_rows(stream: DataFrame) -> DataFrame:
    """(doc_id, text, event_ts) → (doc_id, event_ts, band, sig), one
    row per LSH band, computed per-row (no aggregation, no state):
    the streaming twin of `minhash_band_signatures`."""
    sh = word_shingles(tokens(normalized("text")))

    def _mh(seed: int):
        # single-parameter lambda: a second parameter (even defaulted)
        # makes F.transform pass the array INDEX into it
        prefix = str(seed)
        return F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat_ws("|", F.lit(prefix), s)))
        )

    mhs = [_mh(seed) for seed in range(N_HASHES)]
    n_bands = N_HASHES // ROWS_PER_BAND
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|", *[mhs[b * ROWS_PER_BAND + r] for r in range(ROWS_PER_BAND)]
                    )
                ).alias("sig"),
            )
            for b in range(n_bands)
        ]
    )
    return stream.select(
        "doc_id", "event_ts", F.explode(bands).alias("bs")
    ).select("doc_id", "event_ts", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))


def _match_fn(horizon_sec: int):
    """Build the per-key matcher with the eviction horizon closed over
    (derived from the plan's watermark, so admission and eviction use
    the same lateness contract)."""

    def _match(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        band, sig = key
        if state.hasTimedOut:
            state.remove()
            return

        rows = pd.concat(list(batches)).sort_values(["event_ts", "doc_id"])
        ts = rows["event_ts"].astype("int64") // 1_000_000_000

        if state.exists:
            first_doc, first_ts, prev_last = state.get
        else:
            first_doc, first_ts = int(rows["doc_id"].iloc[0]), int(ts.iloc[0])
            prev_last = first_ts

        out = []
        for doc, t in zip(rows["doc_id"], ts):
            doc, t = int(doc), int(t)
            if doc != first_doc:
                out.append((band, sig, doc, first_doc, pd.Timestamp(t, unit="s")))
        # Evict when the WATERMARK passes the key's last activity plus
        # the horizon — anchored to event time, not the current
        # watermark (a key touched only while the watermark trailed
        # would otherwise die as soon as it advances), and to the MAX
        # last-seen across batches: a late-but-admitted row must never
        # move the deadline backwards.
        last_ts = max(int(ts.max()), int(prev_last))
        state.update((first_doc, first_ts, last_ts))
        state.setTimeoutTimestamp(
            max((last_ts + horizon_sec) * 1000, state.getCurrentWatermarkMs() + 1)
        )
        if out:
            yield pd.DataFrame(
                out, columns=["band", "sig", "doc_id", "matched_doc", "event_ts"]
            )

    return _match


def neardup_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Near-dup candidate stream: each arriving doc that shares a band
    signature with the key's first-seen representative emits a
    candidate row (band, sig, doc_id, matched_doc, event_ts)."""
    return (
        band_signature_rows(stream)
        .withWatermark("event_ts", watermark)
        .groupBy("band", "sig")
        .applyInPandasWithState(
            _match_fn(_parse_duration_sec(watermark)),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
