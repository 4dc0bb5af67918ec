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
