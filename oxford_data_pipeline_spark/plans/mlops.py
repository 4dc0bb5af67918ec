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
# M6 (hash-checked) — closed-form 2-predictor OLS via normal equations
# --------------------------------------------------------------------------
_M6CF_ORACLE = """
WITH feats AS (
    SELECT event_type,
           value AS y,
           CAST((epoch_ns(ts) // 3600000000000) % 24 AS DOUBLE) AS x1,
           CAST(user_id % 10 AS DOUBLE) AS x2
    FROM events
    WHERE value IS NOT NULL
),
sums AS (
    SELECT event_type,
           CAST(count(*) AS DOUBLE) AS n,
           sum(x1) AS sx1, sum(x2) AS sx2, sum(y) AS sy,
           sum(x1*x1) AS sx1x1, sum(x2*x2) AS sx2x2, sum(x1*x2) AS sx1x2,
           sum(x1*y) AS sx1y, sum(x2*y) AS sx2y, sum(y*y) AS syy
    FROM feats GROUP BY 1
),
cm AS (
    SELECT event_type, n,
           sx1 / n AS mx1, sx2 / n AS mx2, sy / n AS my,
           sx1x1 - sx1*sx1/n AS s11,
           sx2x2 - sx2*sx2/n AS s22,
           sx1x2 - sx1*sx2/n AS s12,
           sx1y - sx1*sy/n AS s1y,
           sx2y - sx2*sy/n AS s2y,
           syy - sy*sy/n AS syy_c
    FROM sums
),
beta AS (
    SELECT *,
           s11*s22 - s12*s12 AS det,
           (s22*s1y - s12*s2y) / (s11*s22 - s12*s12) AS b1,
           (s11*s2y - s12*s1y) / (s11*s22 - s12*s12) AS b2
    FROM cm
),
model AS (
    SELECT *,
           my - b1*mx1 - b2*mx2 AS b0,
           syy_c - b1*s1y - b2*s2y AS sse
    FROM beta
),
stats AS (
    SELECT event_type, n, b0, b1, b2,
           sse / (n - 3) AS sigma2,
           1 - sse/syy_c AS r2,
           1 - (sse/(n - 3)) / (syy_c/(n - 1)) AS adj_r2,
           sqrt(sse/(n - 3) * (1.0/n + (mx1*mx1*s22 - 2*mx1*mx2*s12 + mx2*mx2*s11)/det)) AS se0,
           sqrt(sse/(n - 3) * s22/det) AS se1,
           sqrt(sse/(n - 3) * s11/det) AS se2
    FROM model
),
long AS (
    SELECT event_type, 'intercept' AS term, b0 AS b, se0 AS s, r2, adj_r2, n FROM stats
    UNION ALL
    SELECT event_type, 'x_hour', b1, se1, r2, adj_r2, n FROM stats
    UNION ALL
    SELECT event_type, 'x_user', b2, se2, r2, adj_r2, n FROM stats
)
SELECT event_type, term,
       round(b * 1000000 + 0.01, 0) / 1000000 + 0 AS beta,
       round(s * 1000000 + 0.01, 0) / 1000000 + 0 AS se,
       round(b / s * 1000000 + 0.01, 0) / 1000000 + 0 AS t_stat,
       round(r2 * 1000000 + 0.01, 0) / 1000000 + 0 AS r2,
       round(adj_r2 * 1000000 + 0.01, 0) / 1000000 + 0 AS adj_r2,
       CAST(n AS BIGINT) AS n
FROM long
"""


@register("m6_glm_closed_form", _M6CF_ORACLE)
def m6_glm_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 (hash-checked) — the 2-predictor OLS solved in closed form by
    normal equations over plain aggregates: β = (X'X)⁻¹X'y via Cramer's
    rule on centered moments, SE from σ²·diag((X'X)⁻¹), plus t, R²,
    adj-R² (`oxford_GLM_CCA_coefficients_extract.m:402-485`).

    Everything is one map-side-combinable aggregation per group plus
    scalar arithmetic — no UDF, no matrix library — so the DuckDB
    oracle hash-checks the GLM math itself (round-3 verdict item 5;
    the UDF query `m6_glm_inference` keeps the full p/CI/AIC surface
    that needs the t-CDF).  At 100 TB this is the preferred shape: the
    sufficient statistics are tiny and associative regardless of group
    size, where the grouped-UDF variant must hold a group in memory."""
    from oxford_data_pipeline_spark.functions.compat import round6

    ev = load_table(spark, sf_dir, "events")
    feats = ev.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.col("value").alias("y"),
        (F.expr("ts DIV 3600000000000") % 24).cast("double").alias("x1"),
        (F.col("user_id") % 10).cast("double").alias("x2"),
    )
    sums = feats.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("sx1x1"),
        F.sum(F.col("x2") * F.col("x2")).alias("sx2x2"),
        F.sum(F.col("x1") * F.col("x2")).alias("sx1x2"),
        F.sum(F.col("x1") * F.col("y")).alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).alias("sx2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    cm = sums.select(
        "event_type",
        "n",
        (F.col("sx1") / n).alias("mx1"),
        (F.col("sx2") / n).alias("mx2"),
        (F.col("sy") / n).alias("my"),
        (F.col("sx1x1") - F.col("sx1") * F.col("sx1") / n).alias("s11"),
        (F.col("sx2x2") - F.col("sx2") * F.col("sx2") / n).alias("s22"),
        (F.col("sx1x2") - F.col("sx1") * F.col("sx2") / n).alias("s12"),
        (F.col("sx1y") - F.col("sx1") * F.col("sy") / n).alias("s1y"),
        (F.col("sx2y") - F.col("sx2") * F.col("sy") / n).alias("s2y"),
        (F.col("syy") - F.col("sy") * F.col("sy") / n).alias("syy_c"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    beta = cm.withColumn("det", det).withColumns(
        {
            "b1": (F.col("s22") * F.col("s1y") - F.col("s12") * F.col("s2y")) / F.col("det"),
            "b2": (F.col("s11") * F.col("s2y") - F.col("s12") * F.col("s1y")) / F.col("det"),
        }
    )
    model = beta.withColumns(
        {
            "b0": F.col("my") - F.col("b1") * F.col("mx1") - F.col("b2") * F.col("mx2"),
            "sse": F.col("syy_c") - F.col("b1") * F.col("s1y") - F.col("b2") * F.col("s2y"),
        }
    )
    sigma2 = F.col("sse") / (n - 3)
    quad0 = (
        F.col("mx1") * F.col("mx1") * F.col("s22")
        - 2 * F.col("mx1") * F.col("mx2") * F.col("s12")
        + F.col("mx2") * F.col("mx2") * F.col("s11")
    ) / F.col("det")
    stats = model.select(
        "event_type",
        "n",
        "b0",
        "b1",
        "b2",
        (F.lit(1.0) - F.col("sse") / F.col("syy_c")).alias("r2"),
        (F.lit(1.0) - (F.col("sse") / (n - 3)) / (F.col("syy_c") / (n - 1))).alias("adj_r2"),
        F.sqrt(sigma2 * (F.lit(1.0) / n + quad0)).alias("se0"),
        F.sqrt(sigma2 * F.col("s22") / F.col("det")).alias("se1"),
        F.sqrt(sigma2 * F.col("s11") / F.col("det")).alias("se2"),
    )
    long = stats.select(
        "event_type",
        F.expr(
            "stack(3, 'intercept', b0, se0, 'x_hour', b1, se1, 'x_user', b2, se2)"
            " AS (term, b, s)"
        ),
        "r2",
        "adj_r2",
        "n",
    )
    return long.select(
        "event_type",
        "term",
        round6(F.col("b")).alias("beta"),
        round6(F.col("s")).alias("se"),
        round6(F.col("b") / F.col("s")).alias("t_stat"),
        round6(F.col("r2")).alias("r2"),
        round6(F.col("adj_r2")).alias("adj_r2"),
        F.col("n").cast("long").alias("n"),
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


# --------------------------------------------------------------------------
# M1 companion: closed-form first canonical correlation (hash-checked)
# --------------------------------------------------------------------------
# The CCA math itself, oracle-checked (the m6_glm_closed_form treatment
# applied to M1): on a 2-feature-per-side slice of each label pair, the
# first canonical correlation has a closed form — rho1^2 is the larger
# eigenvalue of the 2x2 matrix M = Sxx^-1 Sxy Syy^-1 Syx, i.e.
# (tr(M) + sqrt(tr(M)^2 - 4 det(M))) / 2 — all polynomial in the 2x2
# co-moment entries, which are plain aggregates.  Unnormalized
# co-moments suffice: the (n-1) scale cancels in M.  The SAME staged
# expression strings drive the Spark plan (selectExpr) and the DuckDB
# oracle (generated CTE chain), and a pytest cross-checks the result
# against the numpy `robust_cca` kernel — tying the grouped-UDF CCA
# path to a hash-checked relational ground truth.  Sample pairing is
# explicit (rank by vec_id within side, join on rank), identical in
# both engines.
_CCA2_STAGES = [
    ("sxx11", "sx1x1 - sx1 * sx1 / n"),
    ("sxx22", "sx2x2 - sx2 * sx2 / n"),
    ("sxx12", "sx1x2 - sx1 * sx2 / n"),
    ("syy11", "sy1y1 - sy1 * sy1 / n"),
    ("syy22", "sy2y2 - sy2 * sy2 / n"),
    ("syy12", "sy1y2 - sy1 * sy2 / n"),
    ("sxy11", "sx1y1 - sx1 * sy1 / n"),
    ("sxy12", "sx1y2 - sx1 * sy2 / n"),
    ("sxy21", "sx2y1 - sx2 * sy1 / n"),
    ("sxy22", "sx2y2 - sx2 * sy2 / n"),
    ("dxx", "sxx11 * sxx22 - sxx12 * sxx12"),
    ("dyy", "syy11 * syy22 - syy12 * syy12"),
    ("b11", "(syy22 * sxy11 - syy12 * sxy12) / dyy"),
    ("b12", "(syy22 * sxy21 - syy12 * sxy22) / dyy"),
    ("b21", "(syy11 * sxy12 - syy12 * sxy11) / dyy"),
    ("b22", "(syy11 * sxy22 - syy12 * sxy21) / dyy"),
    ("a11", "sxy11 * b11 + sxy12 * b21"),
    ("a12", "sxy11 * b12 + sxy12 * b22"),
    ("a21", "sxy21 * b11 + sxy22 * b21"),
    ("a22", "sxy21 * b12 + sxy22 * b22"),
    ("m11", "(sxx22 * a11 - sxx12 * a21) / dxx"),
    ("m22", "(sxx11 * a22 - sxx12 * a12) / dxx"),
    ("trm", "m11 + m22"),
    ("detm", "(a11 * a22 - a12 * a21) / dxx"),
    ("lam1", "(trm + sqrt(greatest(trm * trm - 4 * detm, 0))) / 2"),
    ("rho1", "sqrt(least(greatest(lam1, 0), 1.0))"),
]

_CCA2_SUMS = [
    ("sx1", "x1"), ("sx2", "x2"), ("sy1", "y1"), ("sy2", "y2"),
    ("sx1x1", "x1 * x1"), ("sx2x2", "x2 * x2"), ("sx1x2", "x1 * x2"),
    ("sy1y1", "y1 * y1"), ("sy2y2", "y2 * y2"), ("sy1y2", "y1 * y2"),
    ("sx1y1", "x1 * y1"), ("sx1y2", "x1 * y2"),
    ("sx2y1", "x2 * y1"), ("sx2y2", "x2 * y2"),
]


def _cca2_oracle() -> str:
    sums = ",\n           ".join(f"sum({e}) AS {nm}" for nm, e in _CCA2_SUMS)
    ctes = "".join(
        f",\ns_{i} AS (SELECT *, {e} AS {nm} FROM s_{i - 1})"
        for i, (nm, e) in enumerate(_CCA2_STAGES, start=1)
    ).replace("FROM s_0", "FROM agg", 1)
    return f"""
WITH p AS (
    SELECT label // 2 AS pair_id, label % 2 AS side,
           CAST(embedding[1] AS DOUBLE) AS e1,
           CAST(embedding[2] AS DOUBLE) AS e2,
           row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
    FROM embeddings
),
m AS (
    SELECT a.pair_id, a.e1 AS x1, a.e2 AS x2, b.e1 AS y1, b.e2 AS y2
    FROM p a JOIN p b ON a.pair_id = b.pair_id AND a.rn = b.rn
    WHERE a.side = 0 AND b.side = 1
),
agg AS (
    SELECT pair_id, CAST(count(*) AS DOUBLE) AS n,
           {sums}
    FROM m GROUP BY 1
){ctes}
SELECT CAST(pair_id AS INTEGER) AS pair_id, CAST(n AS BIGINT) AS n,
       round(rho1 * 1000000 + 0.01, 0) / 1000000 + 0 AS rho1
FROM s_{len(_CCA2_STAGES)}
"""


@register("m1_cca_closed_form", _cca2_oracle())
def m1_cca_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 (hash-checked): first canonical correlation of the first two
    embedding dims per label pair, in closed form over plain
    aggregates — no UDF, no matrix library (see _CCA2_STAGES)."""
    from pyspark.sql.window import Window as W

    from oxford_data_pipeline_spark.functions.compat import round6

    emb = load_table(spark, sf_dir, "embeddings")
    w = W.partitionBy("label").orderBy("vec_id")
    p = emb.select(
        F.expr("label DIV 2").alias("pair_id"),
        (F.col("label") % 2).alias("side"),
        F.element_at("embedding", 1).cast("double").alias("e1"),
        F.element_at("embedding", 2).cast("double").alias("e2"),
        F.row_number().over(w).alias("rn"),
    )
    a = p.filter(F.col("side") == 0).select(
        "pair_id", "rn", F.col("e1").alias("x1"), F.col("e2").alias("x2")
    )
    b = p.filter(F.col("side") == 1).select(
        "pair_id", "rn", F.col("e1").alias("y1"), F.col("e2").alias("y2")
    )
    samples = a.join(b, ["pair_id", "rn"])
    agg = samples.groupBy("pair_id").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        *[F.expr(f"sum({e})").alias(nm) for nm, e in _CCA2_SUMS],
    )
    staged = agg
    for nm, e in _CCA2_STAGES:
        staged = staged.selectExpr("*", f"{e} AS {nm}")
    return staged.select(
        F.col("pair_id").cast("int").alias("pair_id"),
        F.col("n").cast("long").alias("n"),
        round6(F.col("rho1")).alias("rho1"),
    )


# --------------------------------------------------------------------------
# M4 companion: closed-form 2-D PCA (hash-checked)
# --------------------------------------------------------------------------
# Same treatment for the PCA kernel: on the first two embedding dims
# per label, the 2x2 covariance eigendecomposition is closed-form —
# lam = ((s11 + s22) +/- sqrt((s11 - s22)^2 + 4 s12^2)) / 2 — giving
# the first PC's explained-variance ratio and axis angle
# (atan2(2 s12, s11 - s22) / 2) as plain aggregate arithmetic that
# DuckDB reproduces exactly; pytest cross-checks against numpy eigh.
_PCA2_ORACLE = """
WITH feat AS (
    SELECT label,
           CAST(embedding[1] AS DOUBLE) AS e1,
           CAST(embedding[2] AS DOUBLE) AS e2
    FROM embeddings
),
agg AS (
    SELECT label, CAST(count(*) AS DOUBLE) AS n,
           sum(e1) AS s1, sum(e2) AS s2,
           sum(e1 * e1) AS s11r, sum(e2 * e2) AS s22r, sum(e1 * e2) AS s12r
    FROM feat GROUP BY 1
),
cov AS (
    SELECT label, n,
           (s11r - s1 * s1 / n) / (n - 1) AS s11,
           (s22r - s2 * s2 / n) / (n - 1) AS s22,
           (s12r - s1 * s2 / n) / (n - 1) AS s12
    FROM agg
),
eig AS (
    SELECT label, n, s11, s22, s12,
           sqrt((s11 - s22) * (s11 - s22) + 4 * s12 * s12) AS disc
    FROM cov
)
SELECT CAST(label AS INTEGER) AS label, CAST(n AS BIGINT) AS n,
       round((s11 + s22 + disc) / 2 * 1000000 + 0.01, 0) / 1000000 + 0 AS lambda1,
       round((s11 + s22 - disc) / 2 * 1000000 + 0.01, 0) / 1000000 + 0 AS lambda2,
       round((s11 + s22 + disc) / (2 * (s11 + s22)) * 1000000 + 0.01, 0) / 1000000 + 0
           AS explained_ratio,
       round(atan2(2 * s12, s11 - s22) / 2 * 1000000 + 0.01, 0) / 1000000 + 0
           AS axis_angle
FROM eig
"""


@register("m4_pca_closed_form", _PCA2_ORACLE)
def m4_pca_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 (hash-checked): 2-D PCA per label in closed form — first/
    second eigenvalues of the sample covariance, explained-variance
    ratio, and principal-axis angle, from plain aggregates."""
    from oxford_data_pipeline_spark.functions.compat import round6

    emb = load_table(spark, sf_dir, "embeddings")
    feat = emb.select(
        "label",
        F.element_at("embedding", 1).cast("double").alias("e1"),
        F.element_at("embedding", 2).cast("double").alias("e2"),
    )
    agg = feat.groupBy("label").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("e1").alias("s1"),
        F.sum("e2").alias("s2"),
        F.sum(F.col("e1") * F.col("e1")).alias("s11r"),
        F.sum(F.col("e2") * F.col("e2")).alias("s22r"),
        F.sum(F.col("e1") * F.col("e2")).alias("s12r"),
    )
    n = F.col("n")
    cov = agg.select(
        "label",
        "n",
        ((F.col("s11r") - F.col("s1") * F.col("s1") / n) / (n - 1)).alias("s11"),
        ((F.col("s22r") - F.col("s2") * F.col("s2") / n) / (n - 1)).alias("s22"),
        ((F.col("s12r") - F.col("s1") * F.col("s2") / n) / (n - 1)).alias("s12"),
    )
    disc = F.sqrt(
        (F.col("s11") - F.col("s22")) * (F.col("s11") - F.col("s22"))
        + 4 * F.col("s12") * F.col("s12")
    )
    tr = F.col("s11") + F.col("s22")
    return cov.select(
        F.col("label").cast("int").alias("label"),
        F.col("n").cast("long").alias("n"),
        round6((tr + disc) / 2).alias("lambda1"),
        round6((tr - disc) / 2).alias("lambda2"),
        round6((tr + disc) / (2 * tr)).alias("explained_ratio"),
        round6(
            F.atan2(2 * F.col("s12"), F.col("s11") - F.col("s22")) / 2
        ).alias("axis_angle"),
    )
