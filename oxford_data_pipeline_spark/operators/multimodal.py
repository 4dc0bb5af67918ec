"""Multimodal-column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched `mapInPandas`.

The container has no image/audio codecs, so the DECODE step is stubbed
(`decode_media` raises NotImplementedError; `fake_decode_features` is
the deterministic stand-in) — but the Spark-side plumbing is real:
binary column schema, metadata struct, batch iterator UDF signature,
and partition-parallel feature extraction, exactly what a production
decode (PIL/ffmpeg via mapInPandas) would use at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HIST_BINS = 16

FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes int, byte_entropy double,"
    " hist array<double>"
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Wrap documents as multimodal rows: payload = opaque bytes (here
    the utf-8 text; in production the image/audio blob), plus a typed
    metadata struct — the engine's convention for non-text modalities."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.when(F.col("doc_id") % 3 == 0, "image")
            .when(F.col("doc_id") % 3 == 1, "audio")
            .otherwise("video")
            .alias("modality"),
            F.length("text").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, modality: str):  # pragma: no cover
    """Real decode (image resize / audio resample / video frame-sample).

    STUB: the runtime has no codec libraries. The Spark plumbing around
    this call (schema, batching, partitioning) is real and tested via
    `fake_decode_features`.
    """
    raise NotImplementedError(
        f"no codec available for {modality}; install PIL/soundfile/ffmpeg "
        "and replace this stub"
    )


def _concat_payloads(payloads) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flatten a batch of variable-length byte payloads into one uint8
    array plus per-row (offset, length) — the layout every vectorized
    kernel below indexes into.  One allocation per Arrow batch; no
    per-row Python objects beyond the join."""
    data = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=len(payloads))
    offs = np.concatenate(([0], np.cumsum(lens)[:-1])) if len(payloads) else np.zeros(0, np.int64)
    return data, offs, lens


def fake_decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic decode stand-in for `mapInPandas`: 16-bin byte
    histogram + entropy per payload.  Whole-batch numpy: one flattened
    bincount over (row_index·16 + nibble) builds every row's histogram
    at once — no per-row Python loop, the shape a real vectorized
    decoder should copy."""
    for pdf in batches:
        n = len(pdf)
        data, offs, lens = _concat_payloads(pdf["payload"])
        row_idx = np.repeat(np.arange(n), lens)
        hist2d = np.bincount(
            row_idx * N_HIST_BINS + (data >> 4), minlength=n * N_HIST_BINS
        ).astype(np.float64).reshape(n, N_HIST_BINS)
        totals = hist2d.sum(axis=1, keepdims=True)
        p = np.divide(hist2d, totals, out=np.zeros_like(hist2d), where=totals > 0)
        plogp = np.zeros_like(p)
        np.log2(p, out=plogp, where=p > 0)
        entropy = -(p * plogp).sum(axis=1)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "modality": [m["modality"] for m in pdf["meta"]],
                "n_bytes": np.array([int(m["n_bytes"]) for m in pdf["meta"]], dtype=np.int32),
                "byte_entropy": entropy,
                "hist": list(p),
            }
        )


def extract_features(mm: DataFrame) -> DataFrame:
    """Multimodal feature extraction over binary payloads."""
    return mm.mapInPandas(fake_decode_features, schema=FEATURE_SCHEMA)


def fake_resize_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic resize stand-in: downsample the payload byte
    sequence to a fixed 8-'pixel' strip by mean-pooling with edge
    padding (what an image resize does per channel).  Whole-batch
    numpy: segment sums come from one global prefix-sum indexed by an
    (n_rows × 8) boundary matrix; edge padding is added analytically as
    (missing_count × last_byte) — identical values to the former
    per-row reshape/mean, no per-row loop."""
    for pdf in batches:
        n = len(pdf)
        data, offs, lens = _concat_payloads(pdf["payload"])
        csum = np.concatenate(([0.0], np.cumsum(data, dtype=np.float64)))
        pad = (-lens) % 8
        chunk = np.maximum((lens + pad) // 8, 1)  # padded length / 8
        j = np.arange(9)
        # padded-space boundaries, clamped to the real data extent
        bounds = np.minimum(chunk[:, None] * j[None, :], lens[:, None])
        seg_real = csum[offs[:, None] + bounds[:, 1:]] - csum[offs[:, None] + bounds[:, :-1]]
        # padding contribution: segment part beyond the real extent,
        # filled with the row's last byte (np.pad mode="edge")
        over = np.maximum(chunk[:, None] * j[None, :] - lens[:, None], 0)
        pad_cnt = over[:, 1:] - over[:, :-1]
        if data.size:
            last_byte = np.where(lens > 0, data[(offs + lens - 1).clip(min=0)], 0).astype(np.float64)
        else:  # every payload in the batch is empty: no bytes to index
            last_byte = np.zeros(n, dtype=np.float64)
        strips = (seg_real + pad_cnt * last_byte[:, None]) / chunk[:, None]
        strips = np.where((lens > 0)[:, None], strips, 0.0).round(6)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "modality": [m["modality"] for m in pdf["meta"]],
                "strip": list(strips),
            }
        )


def fake_frame_sample(
    batches: Iterator[pd.DataFrame], n_frames: int = 4
) -> Iterator[pd.DataFrame]:
    """Deterministic frame-sample stand-in: split the payload into
    equal chunks ('frames') and keep every (len/n)-th — the ffmpeg
    keyframe-sampling shape, one output row per sampled frame.
    Whole-batch numpy: all (row, frame) chunk sums come from one global
    prefix-sum; empty trailing chunks are mask-dropped (same rows as
    the former per-row break)."""
    for pdf in batches:
        n = len(pdf)
        data, offs, lens = _concat_payloads(pdf["payload"])
        csum = np.concatenate(([0.0], np.cumsum(data, dtype=np.float64)))
        size = np.maximum(lens // n_frames, 1)
        i = np.arange(n_frames + 1)
        bounds = np.minimum(size[:, None] * i[None, :], lens[:, None])
        cnt = bounds[:, 1:] - bounds[:, :-1]
        sums = csum[offs[:, None] + bounds[:, 1:]] - csum[offs[:, None] + bounds[:, :-1]]
        keep = cnt > 0
        row_idx = np.repeat(np.arange(n), keep.sum(axis=1))
        frame_idx = np.nonzero(keep)[1]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy()[row_idx],
                "frame_idx": frame_idx.astype(np.int32),
                "n_bytes": cnt[keep].astype(np.int32),
                "mean_byte": sums[keep] / cnt[keep],
            }
        )


def resize_strips(mm: DataFrame) -> DataFrame:
    return mm.mapInPandas(
        fake_resize_features, schema="doc_id long, modality string, strip array<double>"
    )


def sample_frames(mm: DataFrame) -> DataFrame:
    return mm.filter(F.col("meta.modality") == "video").mapInPandas(
        fake_frame_sample,
        schema="doc_id long, frame_idx int, n_bytes int, mean_byte double",
    )
