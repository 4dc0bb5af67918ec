"""S2 — the `.mat` (HDF5 v7.3) → canonical-Parquet conversion job.

The reference loads nested MATLAB structs per session with a
mat73/scipy fallback (`cross_trial_type_cca_analysis.py:125-140`);
this engine performs that normalization ONCE at the ingest boundary
(SURVEY §7 hard part 4): a distributed `binaryFile` scan feeds a
`mapInPandas` decoder that emits the long canonical tables
(firing_rates / trial_events / neurons), written partitioned by
session. Downstream never touches nested structures.

Two container formats share the `.mat` extension; `decode_mat_bytes`
sniffs the magic bytes and routes:
- **MAT v5** (`MATLAB 5.0` header) — decoded for real by the
  pure-python `sources.matfile` reader: numeric matrices (real AND
  complex), char/cellstr/struct (arbitrary nesting), compressed
  (miCOMPRESSED) elements, both byte orders ('IM'/'MI').
- **v7.3** (HDF5 container, signature at offset 0 or behind the
  512-byte MATLAB userblock) — decoded by the pure-python
  `sources.hdf5mat` reader: superblock v0; contiguous AND chunked
  layouts for float64 and char (UTF-16) datasets;
  deflate/shuffle/fletcher32 filter pipeline; v1 object headers with
  continuations AND v2 ("OHDR"/"OCHK") headers; structs as groups,
  cellstr/cell-of-struct via object references.

The `decoder` parameter of `ingest_mat_files` selects WHICH canonical
relation a file becomes (firing rates vs neuron metadata — different
schemas, same job topology); it is a composition point, not a
fallback for unsupported formats — the native readers cover every
shape the reference writes.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

FIRING_SCHEMA = "session string, neuron_id int, bin int, rate double"

_HDF5_MAGIC = b"\x89HDF\r\n\x1a\n"

Decoder = Callable[[str, bytes], pd.DataFrame]


def decode_mat_bytes(path: str, payload: bytes) -> pd.DataFrame:
    """Decode one `.mat` blob into long firing-rate rows.

    The firing-rate variable is the reference's
    `mdl.predictor.firingrate` dense [n_neurons × T] matrix
    (`extract_session_data_mdl.m:83-84`); here it is the file's
    `firingrate` matrix, session = file stem, neuron_id 1-based,
    bin 0-based — the engine's canonical long layout.
    """
    if payload[:8] == _HDF5_MAGIC or payload[512:520] == _HDF5_MAGIC:
        # v7.3 container (plain HDF5, or behind the MATLAB userblock)
        from oxford_data_pipeline_spark.sources.hdf5mat import read_mat73 as reader
    else:
        from oxford_data_pipeline_spark.sources.matfile import read_mat5 as reader

    session = os.path.splitext(os.path.basename(path))[0]
    fr = reader(payload)["firingrate"]
    n_neurons, n_bins = fr.shape
    return pd.DataFrame(
        {
            "session": session,
            "neuron_id": np.repeat(np.arange(1, n_neurons + 1), n_bins).astype(np.int32),
            "bin": np.tile(np.arange(n_bins), n_neurons).astype(np.int32),
            "rate": fr.ravel(order="C"),
        }
    )


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
            for path, content in zip(pdf["path"].to_numpy(), pdf["content"].to_numpy()):
                yield decoder(path, content)

    return raw.select("path", "content").mapInPandas(decode, schema=schema)


NEURON_META_SCHEMA = "session string, neuron_id int, field string, value string"


def decode_mat_metadata(path: str, payload: bytes) -> pd.DataFrame:
    """Decode per-neuron metadata — the reference's `cell_metrics`
    struct of cellstr/numeric vectors (`brainRegion_final`, firing
    stats; `Matlab_part/extract_session_data_mdl.m:86-141`) — into the
    long canonical (session, neuron_id, field, value) relation.

    Works on the pure-python readers' native decode (struct -> dict,
    cellstr -> object array of str, char -> str) with no injected
    decoder: the MAT v5 reader decodes char/cell/struct directly.
    Values are stringified ('%g' for numerics) so heterogeneous fields
    share one long relation; downstream casts what it needs.
    """
    if payload[:8] == _HDF5_MAGIC or payload[512:520] == _HDF5_MAGIC:
        from oxford_data_pipeline_spark.sources.hdf5mat import read_mat73 as reader
    else:
        from oxford_data_pipeline_spark.sources.matfile import read_mat5 as reader

    session = os.path.splitext(os.path.basename(path))[0]
    variables = reader(payload)
    meta = variables.get("cell_metrics", variables)
    if not isinstance(meta, dict):
        raise ValueError(f"{path}: expected a struct variable, got {type(meta)}")
    rows: list[tuple[str, int, str, str]] = []

    def stringify(v) -> str:
        """Full-value serialization: strings pass through, scalars as
        %g, nested arrays (per-neuron vectors in cells) as a
        comma-joined %g list — never truncated to element [0]."""
        if isinstance(v, str):
            return v
        a = np.asarray(v).ravel(order="F")
        if a.size == 0:
            return ""
        if a.dtype == object:
            return ",".join(stringify(x) for x in a)
        if np.iscomplexobj(a):  # MATLAB style: 1+2i / 1-2i
            def c(z):
                return "%g%+gi" % (z.real, z.imag)
            return c(a[0]) if a.size == 1 else ",".join(c(z) for z in a)
        if a.size == 1:
            return "%g" % float(a[0])
        return ",".join("%g" % float(x) for x in a)

    def walk(prefix: str, value) -> None:
        if isinstance(value, dict):
            # CellExplorer-style nested structs (.general, .acg, ...):
            # recurse with dotted field names instead of crashing
            for f, v in value.items():
                walk(f"{prefix}.{f}" if prefix else f, v)
            return
        if isinstance(value, str):  # scalar char applies to the session
            rows.append((session, 0, prefix, value))
            return
        if isinstance(value, (list, tuple)) or (
            isinstance(value, np.ndarray) and value.dtype == object
        ):
            flat = np.asarray(value, dtype=object).ravel(order="F")
        else:
            arr = np.asarray(value)
            if arr.ndim == 2 and arr.shape[0] > 1 and arr.shape[1] > 1:
                # matrix-valued per-neuron field (CellExplorer acg/
                # waveform: bins x n_neurons) — each COLUMN is one
                # neuron's vector; raveling would misattribute ids
                for i in range(arr.shape[1]):
                    rows.append((session, i + 1, prefix, stringify(arr[:, i])))
                return
            flat = arr.ravel(order="F")
        for i, v in enumerate(flat, start=1):
            rows.append((session, i, prefix, stringify(v)))

    for field, value in meta.items():
        walk(field, value)
    return pd.DataFrame(rows, columns=["session", "neuron_id", "field", "value"])


def ingest_mat_metadata(spark: SparkSession, glob_path: str) -> DataFrame:
    """Distributed metadata-conversion job: the `cell_metrics`-style
    struct of every matched `.mat` file becomes long rows, one decode
    task per file — same topology as `ingest_mat_files`."""
    return ingest_mat_files(
        spark, glob_path, decoder=decode_mat_metadata, schema=NEURON_META_SCHEMA
    )
