"""Streaming IVF ingest — the online half of the incremental ANN
index (`similarity.sim_ivf_incremental`).

A trained coarse quantizer is a FROZEN model artifact (FAISS-`add`
semantics: appends never retrain), so assigning an arriving vector to
its inverted-list cell needs no state store and no shuffle: the k
centroids are embedded in the plan as a literal array (k x dims
doubles — bytes, not a relation) and each row picks its cell with one
scan-local array fold per centroid.  The SAME affinity arithmetic as
the batch append pass (`_inc_index_parts.build_ranked`: cosine
rounded at 1e-6, ties to the smallest cell) makes the emitted
(vec_id, cell) rows bit-identical to the batch `merged` assignment —
asserted in tests/test_sinks_streaming.py.  Downstream the rows merge
into the inverted-list table exactly like a batch delta; cell-count
drift (the retrain trigger audited by `sim_ivf_incremental`) falls
out of a windowed count over this stream.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def centroid_literal(centroids: DataFrame) -> Column:
    """Freeze a long-form (cell, dim, w) quantizer relation into a
    literal array<struct<cell, cn, w: array<double>>> column — the
    model artifact shipped into the streaming plan.  k x dims values:
    for IVF coarse quantizers this is a few KiB, the same payload a
    broadcast would carry, minus the join."""
    rows = centroids.select("cell", "dim", "w").collect()
    by_cell: dict[int, dict[int, float]] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], {})[r["dim"]] = float(r["w"])
    cents = []
    for cell in sorted(by_cell):
        ws = [by_cell[cell][d] for d in sorted(by_cell[cell])]
        cn = math.sqrt(sum(w * w for w in ws))
        cents.append(
            F.struct(
                F.lit(int(cell)).alias("cell"),
                F.lit(cn).alias("cn"),
                F.array(*[F.lit(w) for w in ws]).alias("w"),
            )
        )
    return F.array(*cents)


def apply_ivf_tombstones(inverted: DataFrame, remove_ids: DataFrame) -> DataFrame:
    """Merge a tombstone CDC batch into the maintained inverted list:
    one equi-keyed anti-join removes every (vec_id, cell) row whose
    vector was deleted — the streaming twin of the batch tombstone
    apply (`similarity.sim_ivf_delete`), mirroring how
    `apply_postings_delta` merges remove rows on the text side.

    FAISS-delete semantics: the quantizer is untouched (no retrain, no
    reassignment of survivors) and serving reads the post-delete list,
    so a deleted vector can never be produced as a candidate.  The
    delta batch is tiny relative to the list table; at 100 TB this is
    one partition-local anti-join per maintenance cycle, never a
    rebuild.  Maintained-equals-batch is asserted in
    tests/test_sinks_streaming.py."""
    return inverted.join(
        remove_ids.select("vec_id").distinct(), "vec_id", "left_anti"
    )


def _dbl_sql(x: float) -> str:
    """Exact double literal for an inline SQL expression: repr() is the
    shortest round-trip decimal form and Double.parseDouble restores
    the identical IEEE-754 value, so the frozen quantizer weights reach
    the plan bit-for-bit (a bare decimal literal would parse as
    DECIMAL).  Constant-folded at optimization time — no runtime CAST."""
    return f"CAST('{x!r}' AS DOUBLE)"


def ivf_assign_stream(embs: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, embedding, ...) → (vec_id, cell, ...): nearest
    base-trained centroid per arriving vector, computed entirely
    scan-locally against the frozen quantizer — no state, no exchange,
    identical values to the batch incremental assignment.

    r15: the per-centroid dot products and the vector norm were
    ``aggregate(zip_with(...))`` folds — Spark's higher-order array
    functions are CodegenFallback, so every arriving vector paid
    k x dims interpreted lambda evaluations (the r14 batch-side
    headline defect, still live on this streaming path).  The
    centroid weights are plan literals, so the whole argmax unrolls to
    codegen arithmetic: one left-associative 64-term sum per cell with
    the weights embedded as exact double literals (same addition order
    as the fold — float-identical; asserted against the batch
    assignment in tests/test_sinks_streaming.py)."""
    passthrough = [c for c in embs.columns if c != "embedding"]
    extra = [p for p in passthrough if p != "vec_id"]
    rows = centroids.select("cell", "dim", "w").collect()
    by_cell: dict[int, dict[int, float]] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], {})[r["dim"]] = float(r["w"])
    # the unroll length is the QUANTIZER's dimensionality — arriving
    # vectors must match it for the dot to be meaningful (same fixed-
    # dims contract as the batch assignment)
    n_dims = max(len(ds) for ds in by_cell.values()) if by_cell else 0
    vec = F.expr("transform(embedding, x -> cast(x as double))")
    with_v = embs.select(
        *passthrough,
        vec.alias("_v"),
    ).withColumn(
        "_nrm",
        F.sqrt(F.expr(
            "0.0D + "
            + " + ".join(f"_v[{i}] * _v[{i}]" for i in range(n_dims))
        )),
    )
    # aff mirrors build_ranked: round(cos * 1e6 + 0.01) / 1e6; the
    # winner is max (aff, -cell) so ties go to the smallest cell, as
    # the batch row_number orderBy (aff desc, cell) does.
    structs = []
    for cell in sorted(by_cell):
        ws = [by_cell[cell][d] for d in sorted(by_cell[cell])]
        cn = math.sqrt(sum(w * w for w in ws))
        dot = "0.0D + " + " + ".join(
            f"_v[{i}] * {_dbl_sql(w)}" for i, w in enumerate(ws)
        )
        structs.append(
            f"struct(round(({dot}) / (_nrm * {_dbl_sql(cn)}) * 1e6 + 0.01, 0)"
            f" / 1e6 AS aff, {-int(cell)} AS negcell)"
        )
    best = F.expr(f"array_max(array({', '.join(structs)}))")
    return with_v.withColumn("_best", best).select(
        "vec_id",
        # zero-norm guard (matches the batch assignment): a vector with
        # no cosine direction goes to the -1 quarantine cell instead of
        # an arbitrary NaN-affinity winner
        F.when(F.col("_nrm") > 0, (-F.col("_best.negcell")).cast("int"))
        .otherwise(F.lit(-1))
        .alias("cell"),
        *extra,
    )
