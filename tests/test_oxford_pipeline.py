"""Behavior tests for the end-to-end Oxford flagship composite
(`oxford_pipeline`): stage outputs cross-validated against the numpy
kernels and the individual registered queries, plus the M12 alignment
invariants.  The end-to-end hash check against DuckDB runs via the
registry parametrization in test_oracle_parity."""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import functions as F

from oxford_data_pipeline_spark.plans.oxford import (
    QC_MIN,
    SAMP_K,
    oxford_pipeline,
)
from tests.conftest import SF_DIR


def _sampled_sides(spark):
    """Recompute stage 1-2 (QC + seeded sample) independently in
    Python, returning {pair_id: (X, Y)} 2-col matrices."""
    import os

    rows = spark.read.parquet(
        os.path.join(SF_DIR, "embeddings.parquet")
    ).select("label", "vec_id", "embedding").collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(
            (r["vec_id"], float(r["embedding"][0]), float(r["embedding"][1]))
        )
    admitted = {l for l, v in by_label.items() if len(v) >= QC_MIN}
    out = {}
    for pair in {l // 2 for l in admitted}:
        if 2 * pair in admitted and 2 * pair + 1 in admitted:
            sides = []
            for l in (2 * pair, 2 * pair + 1):
                v = sorted(
                    by_label[l],
                    key=lambda t: (
                        hashlib.md5(str(t[0]).encode()).hexdigest(),
                        t[0],
                    ),
                )[:SAMP_K]
                v.sort(key=lambda t: t[0])  # pairing order: by vec_id
                sides.append(np.array([(a, b) for _, a, b in v]))
            n = min(len(sides[0]), len(sides[1]))
            out[pair] = (sides[0][:n], sides[1][:n])
    return out


def test_rho1_matches_numpy_cca_kernel(spark):
    """The composite's closed-form rho1 equals the engine's numpy
    `canoncorr` first correlation on the independently recomputed
    sampled pairing — tying the relational chain to the UDF kernel."""
    from oxford_data_pipeline_spark.ml.linalg import canoncorr

    got = {r["pair_id"]: r for r in oxford_pipeline(spark, SF_DIR).collect()}
    ref = _sampled_sides(spark)
    assert set(got) == set(ref) and got, "pair admission mismatch"
    for pair, (X, Y) in ref.items():
        _, _, r = canoncorr(X, Y, 1)
        assert abs(got[pair]["rho1"] - float(r[0])) < 1e-5, pair
        assert got[pair]["n_samples"] == len(X)
        assert got[pair]["n_x"] == SAMP_K and got[pair]["n_y"] == SAMP_K


def test_alignment_and_aggregation_invariants(spark):
    rows = oxford_pipeline(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # M12: dominant-|w| component positive, unit norm
        w = (r["wx1"], r["wx2"])
        dom = w[0] if abs(w[0]) >= abs(w[1]) else w[1]
        assert dom > 0, f"pair {r['pair_id']} not sign-aligned: {w}"
        assert abs(w[0] ** 2 + w[1] ** 2 - 1.0) < 1e-5
        # sane stats
        assert 0.0 <= r["rho1"] <= 1.0
        assert 0.5 <= r["expl_x"] <= 1.0 and 0.5 <= r["expl_y"] <= 1.0
    # A3: deviations from the cross-pair mean sum to ~0
    assert abs(sum(r["rho1_dev"] for r in rows)) < 1e-5 * len(rows) + 1e-5


def test_projection_matches_weights(spark):
    """Stage 6: mean projection equals mean(x · w) over the sampled
    x-side pairing, recomputed independently."""
    got = {r["pair_id"]: r for r in oxford_pipeline(spark, SF_DIR).collect()}
    ref = _sampled_sides(spark)
    for pair, (X, _) in ref.items():
        w = np.array([got[pair]["wx1"], got[pair]["wx2"]])
        mean_proj = float((X @ w).mean())
        assert abs(got[pair]["mean_proj"] - mean_proj) < 1e-4, pair


# --------------------------------------------------------------------------
# Full-fidelity twin (verdict r7 item 4): real grouped kernels
# --------------------------------------------------------------------------
def test_oxford_full_kernel_invariants(spark):
    """The 64-dim real-kernel composite mirrors the reference runtime
    checks (`segment_mdl_to_trials.m:259-272`,
    `perform_session_cca.m:341-345`): CV R² in [0,1] per fold, 10
    folds, unit-norm sign-aligned weights, rho in [0,1], PC1 share in
    (0, 100], deviations sum to zero."""
    from oxford_data_pipeline_spark.plans.oxford import oxford_pipeline_full

    rows = oxford_pipeline_full(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_folds"] == 10
        assert 0.0 <= r["min_cv_r2"] <= r["max_cv_r2"] <= 1.0
        assert r["min_cv_r2"] <= r["mean_cv_r2_c1"] <= r["max_cv_r2"] + 1e-9
        assert 0.0 <= r["rho1"] <= 1.0
        assert abs(r["wx_norm"] - 1.0) < 1e-6
        assert r["dominant_positive"]
        assert 0.0 < r["pc1_pct_x"] <= 100.0 and 0.0 < r["pc1_pct_y"] <= 100.0
        assert r["n_samples"] == 36  # SAMP_K bound engaged
    assert abs(sum(r["rho1_dev"] for r in rows)) < 1e-5 * len(rows) + 1e-5


def test_oxford_full_seed_determinism_and_ridge_path(spark):
    """Two runs are bit-identical (md5 sampling + deterministic
    numerics), and the M2 guard on the composite's path regularizes a
    genuinely rank-deficient group (duplicated feature columns — the
    degenerate-session case `perform_session_cca.m` ridge-guards):
    ridge output must differ from plain canoncorr and stay bounded."""
    from oxford_data_pipeline_spark.ml.linalg import canoncorr, robust_cca
    from oxford_data_pipeline_spark.plans.oxford import oxford_pipeline_full

    a = sorted(map(tuple, oxford_pipeline_full(spark, SF_DIR).collect()))
    b = sorted(map(tuple, oxford_pipeline_full(spark, SF_DIR).collect()))
    assert a == b and len(a) > 0

    rng = np.random.default_rng(5)
    base = rng.normal(size=(36, 8))
    X = np.hstack([base, base[:, :4]])  # rank 8 < min(12, 35): deficient
    Y = rng.normal(size=(36, 12))
    Ar, _, rr = robust_cca(X, Y, 3)
    Ac, _, rc = canoncorr(X, Y, 3)
    assert not np.allclose(Ar, Ac), "ridge fallback did not engage"
    assert np.all(rr <= 1.0 + 1e-12) and np.all(rc <= 1.0 + 1e-12)
    assert np.all(np.isfinite(Ar))
