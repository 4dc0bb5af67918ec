"""Property tests for the pure-numpy ML kernels (SURVEY §5: R² bounds,
orthonormal bases, fold invariants, seed determinism — the reference's
runtime sanity checks, made into real tests)."""

from __future__ import annotations

import numpy as np
import pytest

from oxford_data_pipeline_spark.ml.inference import (
    betainc,
    norm_sf,
    t_ppf,
    t_two_sided_p,
)
from oxford_data_pipeline_spark.ml.linalg import (
    canoncorr,
    contiguous_folds,
    cv_cca,
    cv_pca,
    ols_inference,
    pca_fit,
    principal_angles,
    robust_cca,
    wilcoxon_signed_rank,
)

RNG = np.random.default_rng(42)


def test_betainc_known_values():
    assert betainc(2, 3, 0.5)[0] == pytest.approx(0.6875, abs=1e-10)
    assert betainc(0.5, 0.5, 0.5)[0] == pytest.approx(0.5, abs=1e-10)


def test_t_distribution_known_values():
    assert t_two_sided_p(2.0, 10)[0] == pytest.approx(0.0733880, abs=1e-5)
    assert t_ppf(0.975, 10) == pytest.approx(2.2281388, abs=1e-5)
    assert norm_sf(1.959964)[0] == pytest.approx(0.025, abs=1e-6)


def test_contiguous_folds_cover_everything():
    folds = contiguous_folds(103, 10)
    assert len(folds) == 10
    all_idx = np.concatenate(folds)
    assert np.array_equal(np.sort(all_idx), np.arange(103))
    # contiguity (W6): each fold is a consecutive block
    for f in folds:
        assert np.array_equal(f, np.arange(f[0], f[-1] + 1))


def test_pca_orthonormal_and_sorted():
    X = RNG.normal(size=(200, 8))
    W, ev = pca_fit(X, 5)
    assert np.allclose(W.T @ W, np.eye(5), atol=1e-8)
    assert np.all(np.diff(ev) <= 1e-12)  # descending variance


def test_cv_pca_invariants():
    X = RNG.normal(size=(120, 6))
    res = cv_pca(X, 4, 5)
    assert res["cv_mse"].shape == (5, 4)
    # more components never increases reconstruction error
    assert np.all(np.diff(res["cv_mse"], axis=1) <= 1e-9)
    assert res["explained_variance"].sum() == pytest.approx(100.0)
    assert np.all((res["coefficients_norm"] >= 0) & (res["coefficients_norm"] <= 1))


def test_canoncorr_recovers_linear_map():
    Z = RNG.normal(size=(300, 4))
    A, B, r = canoncorr(Z, Z @ RNG.normal(size=(4, 4)), 4)
    assert np.all(r > 0.999)
    assert np.all((r >= 0) & (r <= 1))


def test_robust_cca_rank_deficient():
    X = RNG.normal(size=(50, 5))
    X[:, 4] = X[:, 0]  # deficient
    Y = RNG.normal(size=(50, 3))
    A, B, r = robust_cca(X, Y, 3)
    assert A.shape == (5, 3) and B.shape == (3, 3)
    assert np.all(np.isfinite(A)) and np.all(np.isfinite(r))


def test_cv_cca_bounds_and_shape():
    res = cv_cca(RNG.normal(size=(100, 6)), RNG.normal(size=(100, 5)), 4, 5)
    assert res["cv_R2"].shape == (5, 4)
    assert np.all((res["cv_R2"] >= 0) & (res["cv_R2"] <= 1))


def test_ols_matches_closed_form():
    x = RNG.normal(size=(500, 2))
    y = 3.0 + 1.5 * x[:, 0] - 2.0 * x[:, 1] + RNG.normal(scale=0.5, size=500)
    res = ols_inference(x, y)
    assert res["beta"] == pytest.approx([3.0, 1.5, -2.0], abs=0.1)
    assert 0.8 < res["r2"] <= 1.0
    assert res["adj_r2"] <= res["r2"]
    assert np.all((res["p"] >= 0) & (res["p"] <= 1))
    assert np.all(res["ci_lo"] <= res["beta"]) and np.all(res["beta"] <= res["ci_hi"])
    assert res["bic"] > res["aic"]  # n=500 → log(n) > 2


def test_wilcoxon_matches_reference_case():
    # classic example: differences with known W
    x = np.array([125, 115, 130, 140, 140, 115, 140, 125, 140, 135], float)
    y = np.array([110, 122, 125, 120, 140, 124, 123, 137, 135, 145], float)
    res = wilcoxon_signed_rank(x, y)
    assert res["n"] == 9  # one zero difference dropped
    assert 0 <= res["p"] <= 1
    # symmetric null → insignificant
    assert res["p"] > 0.05


def test_principal_angles_bounds():
    U1 = RNG.normal(size=(12, 3))
    U2 = RNG.normal(size=(12, 3))
    ang = principal_angles(U1, U2)
    assert np.all((ang >= 0) & (ang <= np.pi / 2 + 1e-12))
    assert principal_angles(U1, U1).max() < 1e-8


# ---------------------------------------------------------------------------
# M19 — rastermap-style neuron sorting (spectral seriation fallback)
# ---------------------------------------------------------------------------
def test_spectral_order_groups_correlated_neurons():
    """Two anti-correlated response families interleaved by index must
    come out contiguous: the seriation property the raster figure needs."""
    import numpy as np

    from oxford_data_pipeline_spark.operators.rastersort import _spectral_order

    rng = np.random.default_rng(7)
    t = np.linspace(0, 2 * np.pi, 50)
    fam_a, fam_b = np.sin(t), np.cos(2 * t)
    rows = []
    for i in range(12):  # even index -> family A, odd -> family B
        base = fam_a if i % 2 == 0 else fam_b
        rows.append(base + rng.normal(0, 0.05, size=t.size))
    order = _spectral_order(np.vstack(rows))
    assert sorted(order.tolist()) == list(range(12))
    families = ["A" if i % 2 == 0 else "B" for i in order]
    # contiguous blocks: exactly one family switch along the ordering
    switches = sum(1 for a, b in zip(families, families[1:]) if a != b)
    assert switches == 1, f"families interleaved after sort: {families}"


def test_rastersort_order_on_entry_a(entry_a):
    """M19 over the real PSTH table: per (session, region) the ranks
    are a 1..N permutation, the fallback method is reported (rastermap
    is not installed here), and the ordering is deterministic."""
    from oxford_data_pipeline_spark.operators.rastersort import rastersort_order

    cfg, res = entry_a
    out = rastersort_order(res["psth"]).collect()
    assert out
    assert all(r.method == "spectral" for r in out)
    by_group = {}
    for r in out:
        by_group.setdefault((r.session, r.region), []).append((r.neuron_id, r.sort_rank))
    for (s, reg), pairs in by_group.items():
        ranks = sorted(rank for _, rank in pairs)
        assert ranks == list(range(1, len(pairs) + 1)), (s, reg)
    again = {
        (r.session, r.region, r.neuron_id): r.sort_rank
        for r in rastersort_order(res["psth"]).collect()
    }
    assert {(r.session, r.region, r.neuron_id): r.sort_rank for r in out} == again


def test_cca_closed_form_matches_numpy_kernel(spark):
    """m1_cca_closed_form's relational rho1 must equal the numpy
    canoncorr kernel's first canonical correlation on the same
    2-feature samples — the hash-checked closed form and the
    grouped-UDF CCA path agree on the math."""
    import numpy as np

    from oxford_data_pipeline_spark.ml.linalg import canoncorr
    from oxford_data_pipeline_spark.plans import QUERIES
    from oxford_data_pipeline_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR

    rows = {
        r.pair_id: r.rho1
        for r in QUERIES["m1_cca_closed_form"](spark, SF_DIR).collect()
    }
    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .selectExpr("label", "vec_id", "embedding")
        .collect()
    )
    by_label: dict = {}
    for r in sorted(emb, key=lambda r: r.vec_id):
        by_label.setdefault(r.label, []).append(
            [float(r.embedding[0]), float(r.embedding[1])]
        )
    checked = 0
    for pair_id, rho in rows.items():
        x = np.array(by_label.get(2 * pair_id, []))
        y = np.array(by_label.get(2 * pair_id + 1, []))
        n = min(len(x), len(y))
        if n < 4:
            continue
        _, _, r = canoncorr(x[:n], y[:n], 1)
        assert abs(rho - float(r[0])) < 1e-5, (pair_id, rho, float(r[0]))
        checked += 1
    assert checked >= 3


def test_pca_closed_form_matches_numpy_eigh(spark):
    """m4_pca_closed_form's eigenvalues/axis must equal numpy's eigh of
    the same 2x2 sample covariance."""
    import numpy as np

    from oxford_data_pipeline_spark.plans import QUERIES
    from oxford_data_pipeline_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR

    rows = {r.label: r for r in QUERIES["m4_pca_closed_form"](spark, SF_DIR).collect()}
    emb = load_table(spark, SF_DIR, "embeddings").select("label", "embedding").collect()
    by_label: dict = {}
    for r in emb:
        by_label.setdefault(r.label, []).append(
            [float(r.embedding[0]), float(r.embedding[1])]
        )
    checked = 0
    for label, row in rows.items():
        x = np.array(by_label[label])
        if len(x) < 3:
            continue
        lam = np.sort(np.linalg.eigvalsh(np.cov(x.T)))[::-1]
        assert abs(row.lambda1 - lam[0]) < 1e-5
        assert abs(row.lambda2 - lam[1]) < 1e-5
        assert abs(row.explained_ratio - lam[0] / lam.sum()) < 1e-5
        checked += 1
    assert checked >= 3
