"""ML-operator queries (SURVEY §2.9): CV-PCA, CV-CCA, GLM+inference,
sensitivity grid, stability Monte Carlo, Wilcoxon, principal angles,
CCA-on-PCA participation.

These are grouped `applyInPandas` kernels (Arrow-batched, one small
group per (label)/(pair) — SURVEY §2.11) and are NOT SQL-expressible,
so they register without oracle SQL: the driver records rows-only
checks, and `tests/test_mlops.py` adds the property tests the reference
maintains as runtime sanity checks (R² bounds, orthonormal bases, fold
counts, seed determinism).

Determinism under parallelism: every UDF sorts its group by vec_id
before fold assignment, and every random choice is seeded from md5 of
explicit keys.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oxford_data_pipeline_spark.plans.registry import register
from oxford_data_pipeline_spark.sources.catalog import load_table

_K = 5
_FOLDS = 5


def _seed_from(*parts) -> int:
    """Deterministic 32-bit seed from md5 of the key parts (the engine's
    cluster-safe replacement for rng(12345) — SURVEY §7 hard part 2)."""
    h = hashlib.md5("|".join(str(p) for p in parts).encode()).hexdigest()
    return int(h[:8], 16)


def _emb_matrix(pdf: pd.DataFrame) -> np.ndarray:
    """Group rows → dense [n × 64] matrix, rows ordered by vec_id."""
    pdf = pdf.sort_values("vec_id")
    return np.vstack(pdf["embedding"].map(np.asarray).to_numpy()).astype(np.float64)


# --------------------------------------------------------------------------
# M4 — cross-validated PCA per label
# --------------------------------------------------------------------------
@register("m4_cv_pca")
def m4_cv_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 — CV-PCA per embedding label group (`perform_region_pca.m:
    93-156,201-221`): contiguous folds, per-fold fit, test
    reconstruction MSE, fold-mean coefficients + explained variance."""
    from oxford_data_pipeline_spark.ml.linalg import cv_pca

    emb = load_table(spark, sf_dir, "embeddings")

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        X = _emb_matrix(pdf)
        res = cv_pca(X, _K, _FOLDS)
        return pd.DataFrame(
            {
                "label": pdf["label"].iloc[0],
                "component": np.arange(1, _K + 1),
                "explained_variance": res["explained_variance"][:_K],
                "cumulative_variance": res["cumulative_variance"][:_K],
                "mean_cv_mse": res["cv_mse"].mean(axis=0),
            }
        )

    return emb.groupBy("label").applyInPandas(
        fit,
        schema="label int, component int, explained_variance double,"
        " cumulative_variance double, mean_cv_mse double",
    )


# --------------------------------------------------------------------------
# M1/M2 — cross-validated CCA per label pair
# --------------------------------------------------------------------------
def _paired_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label pairs (2i, 2i+1): side 0 = even label, side 1 = odd."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.withColumn("pair_id", F.expr("label DIV 2")).withColumn(
        "side", F.col("label") % 2
    )


@register("m1_cv_cca")
def m1_cv_cca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 — CV-CCA per region pair (`perform_session_cca.m:270-334`):
    contiguous folds on vec_id-ordered rows, canoncorr on train, test
    R² per component; M2's ridge fallback handles rank deficiency."""
    from oxford_data_pipeline_spark.ml.linalg import cv_cca

    paired = _paired_embeddings(spark, sf_dir)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = _emb_matrix(pdf[pdf["side"] == 0])
        y = _emb_matrix(pdf[pdf["side"] == 1])
        n = min(len(x), len(y))
        if n < _FOLDS + 2:
            return pd.DataFrame(
                columns=["pair_id", "fold", "component", "r2", "mean_cv_r2"]
            )
        res = cv_cca(x[:n], y[:n], _K, _FOLDS)
        folds, comps = np.meshgrid(
            np.arange(1, _FOLDS + 1), np.arange(1, _K + 1), indexing="ij"
        )
        return pd.DataFrame(
            {
                "pair_id": int(pdf["pair_id"].iloc[0]),
                "fold": folds.ravel(),
                "component": comps.ravel(),
                "r2": res["cv_R2"].ravel(),
                "mean_cv_r2": np.tile(res["mean_cv_R2"], _FOLDS),
            }
        )

    return paired.groupBy("pair_id").applyInPandas(
        fit,
        schema="pair_id int, fold int, component int, r2 double, mean_cv_r2 double",
    )


# --------------------------------------------------------------------------
# M6 — GLM with full inference per event_type
# --------------------------------------------------------------------------
@register("m6_glm_inference")
def m6_glm_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 — OLS with full inferential stats per group
    (`oxford_GLM_CCA_coefficients_extract.m:402-485`): β, SE, t, p,
    95% CI, R², adj-R², AIC, BIC. Features are JVM-computed columns;
    only the small per-group solve is Python."""
    from oxford_data_pipeline_spark.ml.linalg import ols_inference

    ev = load_table(spark, sf_dir, "events")
    feats = ev.select(
        "event_type",
        F.col("value").alias("y"),
        (F.expr("ts DIV 3600000000000") % 24).cast("double").alias("x_hour"),
        (F.col("user_id") % 10).cast("double").alias("x_user"),
        F.get_json_object("props", "$.k").cast("double").alias("x_k"),
    ).na.drop()

    terms = ["intercept", "x_hour", "x_user", "x_k"]

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["x_hour", "x_user", "x_k", "y"])
        X = pdf[["x_hour", "x_user", "x_k"]].to_numpy(dtype=float)
        y = pdf["y"].to_numpy(dtype=float)
        res = ols_inference(X, y)
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"].iloc[0],
                "term": terms,
                "beta": res["beta"],
                "se": res["se"],
                "t_stat": res["t"],
                "p_value": res["p"],
                "ci_lo": res["ci_lo"],
                "ci_hi": res["ci_hi"],
                "r2": res["r2"],
                "adj_r2": res["adj_r2"],
                "aic": res["aic"],
                "bic": res["bic"],
                "n": res["n"],
            }
        )

    return feats.groupBy("event_type").applyInPandas(
        fit,
        schema="event_type string, term string, beta double, se double,"
        " t_stat double, p_value double, ci_lo double, ci_hi double,"
        " r2 double, adj_r2 double, aic double, bic double, n long",
    )


# --------------------------------------------------------------------------
# M7 — neuron-removal sensitivity grid
# --------------------------------------------------------------------------
_PCTS = [0, 10, 25, 50, 75, 90]
_MC_ITERS = 3


@register("m7_sensitivity")
def m7_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 — removal sensitivity (`Oxford_glm_sensitivity.m:54-55,
    256-342`): y = dim 0, X = dims 1..63 per label; drop top-|β| ρ% of
    predictors (strategy 'top') or seeded-random ρ% × MC iters
    (strategy 'random'), refit, record R²."""
    from oxford_data_pipeline_spark.ml.linalg import ols_inference

    emb = load_table(spark, sf_dir, "embeddings")

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        M = _emb_matrix(pdf)
        label = int(pdf["label"].iloc[0])
        y, X = M[:, 0], M[:, 1:]
        d = X.shape[1]
        base = ols_inference(X, y, inference=False)
        order = np.argsort(-np.abs(base["beta"][1:]), kind="stable")
        rows = []
        for pct in _PCTS:
            n_drop = int(np.floor(d * pct / 100.0))
            keep_top = np.setdiff1d(np.arange(d), order[:n_drop])
            r2_top = (
                ols_inference(X[:, keep_top], y, inference=False)["r2"] if keep_top.size else np.nan
            )
            rows.append((label, "top", pct, 0, float(r2_top)))
            for it in range(_MC_ITERS):
                rng = np.random.default_rng(_seed_from("m7", label, pct, it))
                drop = rng.choice(d, size=n_drop, replace=False)
                keep = np.setdiff1d(np.arange(d), drop)
                r2_r = ols_inference(X[:, keep], y, inference=False)["r2"] if keep.size else np.nan
                rows.append((label, "random", pct, it, float(r2_r)))
        return pd.DataFrame(
            rows, columns=["label", "strategy", "pct_removed", "iteration", "r2"]
        )

    return emb.groupBy("label").applyInPandas(
        fit,
        schema="label int, strategy string, pct_removed int, iteration int, r2 double",
    )


# --------------------------------------------------------------------------
# M8 — population-stability Monte Carlo
# --------------------------------------------------------------------------
_STAB_SIZES = [5, 10, 20, 31]


@register("m8_stability")
def m8_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8 — stability vs population size (`oxford_neuron_stability.m:
    21-26,382-565`): reference latent from the full X block (dims 0-31
    vs Y dims 32-63); for each subsample size × seeded iteration,
    re-run CCA on sampled X-dims and correlate |latent| with reference."""
    from oxford_data_pipeline_spark.ml.linalg import robust_cca

    emb = load_table(spark, sf_dir, "embeddings")

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        M = _emb_matrix(pdf)
        label = int(pdf["label"].iloc[0])
        X, Y = M[:, :32], M[:, 32:]
        A, B, _ = robust_cca(X, Y, 1)
        u_ref = np.abs((X - X.mean(0)) @ A[:, 0])
        rows = []
        for n_feat in _STAB_SIZES:
            for it in range(_MC_ITERS):
                rng = np.random.default_rng(_seed_from("m8", label, n_feat, it))
                sel = np.sort(rng.choice(32, size=n_feat, replace=False))
                Xs = X[:, sel]
                Ai, Bi, _ = robust_cca(Xs, Y, 1)
                u = np.abs((Xs - Xs.mean(0)) @ Ai[:, 0])
                c = (
                    float(np.corrcoef(u, u_ref)[0, 1])
                    if u.std() > 0 and u_ref.std() > 0
                    else np.nan
                )
                rows.append((label, n_feat, it, c))
        return pd.DataFrame(
            rows, columns=["label", "n_features", "iteration", "corr_to_ref"]
        )

    return emb.groupBy("label").applyInPandas(
        fit, schema="label int, n_features int, iteration int, corr_to_ref double"
    )


# --------------------------------------------------------------------------
# M10 — Wilcoxon signed-rank on paired condition means
# --------------------------------------------------------------------------
@register("m10_wilcoxon")
def m10_wilcoxon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10 — Wilcoxon signed-rank across paired observations
    (`cross_trial_type_cca_analysis.py:1259-1423`): pairs = customers
    with both 'O' and 'F' orders (same pairing as M11); the rank test
    runs in one tiny single-group UDF over the pre-aggregated pairs."""
    from oxford_data_pipeline_spark.ml.linalg import wilcoxon_signed_rank

    orders = load_table(spark, sf_dir, "orders")
    per_pair = (
        orders.filter(F.col("o_orderstatus").isin("O", "F"))
        .groupBy("o_custkey")
        .agg(
            F.avg(F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))).alias("a"),
            F.avg(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))).alias("b"),
        )
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .withColumn("g", F.lit(1))
    )

    def test(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("o_custkey")
        res = wilcoxon_signed_rank(
            pdf["a"].to_numpy(float), pdf["b"].to_numpy(float), "two-sided"
        )
        return pd.DataFrame(
            [(res["n"], res["W"], res["z"], res["p"])],
            columns=["n", "w_stat", "z", "p_value"],
        )

    return per_pair.groupBy("g").applyInPandas(
        test, schema="n long, w_stat double, z double, p_value double"
    )


# --------------------------------------------------------------------------
# M14/M15 — principal angles + CCA-on-PCA participation
# --------------------------------------------------------------------------
@register("m14_principal_angles")
def m14_principal_angles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M14 — θ = arccos σ(Q1ᵀQ2) between the top-3 PCA subspaces of the
    two sides of each label pair (`History/.../Pca_cca_comparison_
    framework.py:81-158`)."""
    from oxford_data_pipeline_spark.ml.linalg import pca_fit, principal_angles

    paired = _paired_embeddings(spark, sf_dir)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = _emb_matrix(pdf[pdf["side"] == 0])
        y = _emb_matrix(pdf[pdf["side"] == 1])
        if len(x) < 4 or len(y) < 4:
            return pd.DataFrame(columns=["pair_id", "k", "angle_deg"])
        W1, _ = pca_fit(x, 3)
        W2, _ = pca_fit(y, 3)
        ang = np.degrees(principal_angles(W1, W2))
        return pd.DataFrame(
            {
                "pair_id": int(pdf["pair_id"].iloc[0]),
                "k": np.arange(1, ang.size + 1),
                "angle_deg": ang,
            }
        )

    return paired.groupBy("pair_id").applyInPandas(
        fit, schema="pair_id int, k int, angle_deg double"
    )


@register("m15_cca_pca_participation")
def m15_cca_pca_participation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M15 — participation of CCA axis 1 on the PCA basis:
    α_i = (a₁ᵀ w_i)², row-normalized, with entropy effective dimension
    (`History/.../Pca_cca_comparison_framework.py:160-265`)."""
    from oxford_data_pipeline_spark.ml.linalg import pca_fit, robust_cca

    paired = _paired_embeddings(spark, sf_dir)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = _emb_matrix(pdf[pdf["side"] == 0])
        y = _emb_matrix(pdf[pdf["side"] == 1])
        n = min(len(x), len(y))
        if n < 6:
            return pd.DataFrame(
                columns=["pair_id", "pc_index", "alpha_norm", "entropy_effdim"]
            )
        A, _, _ = robust_cca(x[:n], y[:n], 1)
        W, _ = pca_fit(x[:n], 3)
        a1 = A[:, 0]
        na = np.linalg.norm(a1)
        if na > 0:
            a1 = a1 / na
        alpha = (W.T @ a1) ** 2
        s = alpha.sum()
        alpha_n = alpha / s if s > 0 else alpha
        pos = alpha_n[alpha_n > 0]
        eff = float(np.exp(-(pos * np.log(pos)).sum())) if pos.size else np.nan
        return pd.DataFrame(
            {
                "pair_id": int(pdf["pair_id"].iloc[0]),
                "pc_index": np.arange(1, alpha_n.size + 1),
                "alpha_norm": alpha_n,
                "entropy_effdim": eff,
            }
        )

    return paired.groupBy("pair_id").applyInPandas(
        fit,
        schema="pair_id int, pc_index int, alpha_norm double, entropy_effdim double",
    )
