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


def _byte_histogram(payload: bytes) -> np.ndarray:
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=N_HIST_BINS).astype(np.float64)
    total = hist.sum()
    return hist / total if total > 0 else hist


def fake_decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic decode stand-in for `mapInPandas`: 16-bin byte
    histogram + entropy per payload. Arrow-batched; never materializes
    more than one batch per partition."""
    for pdf in batches:
        feats = []
        for _, row in pdf.iterrows():
            hist = _byte_histogram(row["payload"])
            pos = hist[hist > 0]
            entropy = float(-(pos * np.log2(pos)).sum()) if pos.size else 0.0
            feats.append(
                (
                    row["doc_id"],
                    row["meta"]["modality"],
                    int(row["meta"]["n_bytes"]),
                    entropy,
                    hist.tolist(),
                )
            )
        yield pd.DataFrame(
            feats, columns=["doc_id", "modality", "n_bytes", "byte_entropy", "hist"]
        )


def extract_features(mm: DataFrame) -> DataFrame:
    """Multimodal feature extraction over binary payloads."""
    return mm.mapInPandas(fake_decode_features, schema=FEATURE_SCHEMA)


def fake_resize_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic resize stand-in: downsample the payload byte
    sequence to a fixed 8-'pixel' strip by mean-pooling (what an image
    resize does per channel), preserving the mapInPandas batch shape a
    real PIL resize would use."""
    for pdf in batches:
        rows = []
        for _, row in pdf.iterrows():
            arr = np.frombuffer(row["payload"], dtype=np.uint8).astype(np.float64)
            if arr.size == 0:
                strip = [0.0] * 8
            else:
                pad = (-arr.size) % 8
                arr = np.pad(arr, (0, pad), mode="edge")
                strip = arr.reshape(8, -1).mean(axis=1).round(6).tolist()
            rows.append((row["doc_id"], row["meta"]["modality"], strip))
        yield pd.DataFrame(rows, columns=["doc_id", "modality", "strip"])


def fake_frame_sample(
    batches: Iterator[pd.DataFrame], n_frames: int = 4
) -> Iterator[pd.DataFrame]:
    """Deterministic frame-sample stand-in: split the payload into
    equal chunks ('frames') and keep every (len/n)-th — the ffmpeg
    keyframe-sampling shape, one output row per sampled frame."""
    for pdf in batches:
        rows = []
        for _, row in pdf.iterrows():
            payload = row["payload"]
            size = max(len(payload) // n_frames, 1)
            for i in range(n_frames):
                chunk = payload[i * size:(i + 1) * size]
                if not len(chunk):
                    break
                rows.append(
                    (row["doc_id"], i, len(chunk), float(np.frombuffer(chunk, dtype=np.uint8).mean()))
                )
        yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "n_bytes", "mean_byte"])


def resize_strips(mm: DataFrame) -> DataFrame:
    return mm.mapInPandas(
        fake_resize_features, schema="doc_id long, modality string, strip array<double>"
    )


def sample_frames(mm: DataFrame) -> DataFrame:
    return mm.filter(F.col("meta.modality") == "video").mapInPandas(
        fake_frame_sample,
        schema="doc_id long, frame_idx int, n_bytes int, mean_byte double",
    )
