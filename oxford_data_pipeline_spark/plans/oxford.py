"""The end-to-end Oxford flagship composite: the reference's actual
single-session → cross-session workflow as ONE registered, fully
hash-checked relational program.

Reference lifecycle (`oxford_single_session_pipeline_mdl.m:56-330` +
`cross_trial_type_cca_analysis.py:2734-2925`): segment → region QC →
seeded neuron sampling → per-region PCA → region-pair CCA → project
onto canonical axes → sign-align weights → aggregate across sessions.
Every stage is individually green as a registered query (F5, O3/M18,
M4, M1, M5, M12, A3); this composite chains the SAME math through one
plan over the `embeddings` table, proving the engine runs the
reference's workflow as a single job with checkpointed stage
boundaries — and, because each per-stage kernel is the closed-form
2-feature variant, the WHOLE pipeline is SQL-expressible and
hash-checks against DuckDB end-to-end (which subsumes per-stage hash
checks: any stage divergence changes the final relation).

Stage → here:
1. QC admission (F5):      labels with >= {QC_MIN} vectors; a pair is
                           admitted only when BOTH sides pass (J-join).
2. Seeded sampling (M18):  first {SAMP_K} rows per label in
                           md5(vec_id) order — the engine's
                           deterministic rng(12345) replacement.
3. PCA (M4, closed form):  per-side 2x2 covariance eigensystem →
                           explained-variance ratio of PC1.
4. CCA (M1, closed form):  rho1 via the 2x2 M = Sxx^-1 Sxy Syy^-1 Syx
                           eigensystem (shared stage strings with
                           `m1_cca_closed_form`).
5. Sign alignment (M12):   first canonical x-weight vector flipped so
                           its dominant-|w| component is positive,
                           then unit-normalized — the reference's
                           align-by-dominant-weight convention.
6. Projection (M5):        per-sample score x·w; per-pair mean.
7. Cross-session agg (A3): rho1 deviation from the cross-pair mean.

Scale shape: stage 2 bounds every downstream kernel to {SAMP_K} rows
per label regardless of corpus size (the reference samples 50 neurons
for the same reason); the sampled relation is the checkpointed stage
boundary consumed by PCA, CCA, and projection; all per-pair relations
are O(|pairs|) and broadcast.  The only corpus-wide work is the scan
plus one window per label — at 100 TB the per-label top-k sampling is
a TakeOrdered per group, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oxford_data_pipeline_spark.functions.compat import round6
from oxford_data_pipeline_spark.plans.memo import bounded_once
from oxford_data_pipeline_spark.plans.mlops import _CCA2_STAGES, _CCA2_SUMS
from oxford_data_pipeline_spark.plans.registry import register
from oxford_data_pipeline_spark.sources.catalog import load_table

QC_MIN = 40   # F5: min vectors per label (reference: >=50 neurons/region)
SAMP_K = 36   # M18: seeded sample size (reference: 50 neurons)

# Post-CCA stages: the M-matrix off-diagonal, the lam1 eigenvector,
# M12 dominant-sign alignment, and unit normalization.  Pure arithmetic
# continuing the `_CCA2_STAGES` chain — identical text executes on both
# engines.  The exact-zero degenerate guard is deterministic: both
# engines branch on the same IEEE-754 values.
_ALIGN_STAGES = [
    ("m12", "(sxx22 * a12 - sxx12 * a22) / dxx"),
    ("v1raw", "m12"),
    ("v2raw", "lam1 - m11"),
    ("v1g", "CASE WHEN abs(v1raw) + abs(v2raw) = 0 THEN 1.0e0 ELSE v1raw END"),
    ("v2g", "CASE WHEN abs(v1raw) + abs(v2raw) = 0 THEN 0.0e0 ELSE v2raw END"),
    ("sgn", "CASE WHEN (abs(v1g) >= abs(v2g) AND v1g < 0)"
            " OR (abs(v2g) > abs(v1g) AND v2g < 0)"
            " THEN -1.0e0 ELSE 1.0e0 END"),
    ("vnorm", "sqrt(v1g * v1g + v2g * v2g)"),
    ("wx1", "sgn * v1g / vnorm"),
    ("wx2", "sgn * v2g / vnorm"),
]

# Per-side PCA explained-variance ratio of PC1 (shared expression text;
# the (n-1) covariance scale cancels in the ratio so raw co-moments
# suffice).
_PCA_RATIO_EXPR = (
    "(c11 + c22 + sqrt((c11 - c22) * (c11 - c22) + 4 * c12 * c12))"
    " / (2 * (c11 + c22))"
)


def _oracle() -> str:
    cca_sums = ",\n           ".join(
        f"sum({e}) AS {nm}" for nm, e in _CCA2_SUMS
    )
    stages = _CCA2_STAGES + _ALIGN_STAGES
    ctes = "".join(
        f",\ns_{i} AS (SELECT *, {e} AS {nm} FROM s_{i - 1})"
        for i, (nm, e) in enumerate(stages, start=1)
    ).replace("FROM s_0", "FROM agg", 1)
    return f"""
WITH lab AS (
    SELECT label, vec_id,
           CAST(embedding[1] AS DOUBLE) AS e1,
           CAST(embedding[2] AS DOUBLE) AS e2
    FROM embeddings
),
admitted AS (
    SELECT label FROM lab GROUP BY 1 HAVING count(*) >= {QC_MIN}
),
padm AS (
    SELECT a.label // 2 AS pair_id
    FROM admitted a JOIN admitted b
      ON a.label // 2 = b.label // 2 AND a.label % 2 = 0 AND b.label % 2 = 1
),
ranked AS (
    SELECT l.*, row_number() OVER (
        PARTITION BY l.label
        ORDER BY md5(CAST(l.vec_id AS VARCHAR)), l.vec_id) AS srk
    FROM lab l
    JOIN admitted USING (label)
    JOIN padm p ON l.label // 2 = p.pair_id
),
sampled AS (
    SELECT label, vec_id, e1, e2 FROM ranked WHERE srk <= {SAMP_K}
),
pca AS (
    SELECT label, count(*) AS n_side,
           sum(e1 * e1) - sum(e1) * sum(e1) / count(*) AS c11,
           sum(e2 * e2) - sum(e2) * sum(e2) / count(*) AS c22,
           sum(e1 * e2) - sum(e1) * sum(e2) / count(*) AS c12
    FROM sampled GROUP BY 1
),
pcar AS (
    SELECT label, n_side, {_PCA_RATIO_EXPR} AS expl FROM pca
),
prn AS (
    SELECT label // 2 AS pair_id, label % 2 AS side, e1, e2,
           row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
    FROM sampled
),
m AS (
    SELECT a.pair_id, a.e1 AS x1, a.e2 AS x2, b.e1 AS y1, b.e2 AS y2
    FROM prn a JOIN prn b ON a.pair_id = b.pair_id AND a.rn = b.rn
    WHERE a.side = 0 AND b.side = 1
),
agg AS (
    SELECT pair_id, CAST(count(*) AS DOUBLE) AS n,
           {cca_sums}
    FROM m GROUP BY 1
){ctes},
wts AS (SELECT * FROM s_{len(stages)}),
proj AS (
    SELECT m.pair_id, avg(m.x1 * w.wx1 + m.x2 * w.wx2) AS mean_proj
    FROM m JOIN wts w ON m.pair_id = w.pair_id
    GROUP BY 1
)
SELECT CAST(w.pair_id AS INTEGER) AS pair_id,
       CAST(w.n AS BIGINT) AS n_samples,
       CAST(px.n_side AS BIGINT) AS n_x,
       CAST(py.n_side AS BIGINT) AS n_y,
       round(w.rho1 * 1000000 + 0.01, 0) / 1000000 + 0 AS rho1,
       round(w.wx1 * 1000000 + 0.01, 0) / 1000000 + 0 AS wx1,
       round(w.wx2 * 1000000 + 0.01, 0) / 1000000 + 0 AS wx2,
       round(px.expl * 1000000 + 0.01, 0) / 1000000 + 0 AS expl_x,
       round(py.expl * 1000000 + 0.01, 0) / 1000000 + 0 AS expl_y,
       round(p.mean_proj * 1000000 + 0.01, 0) / 1000000 + 0 AS mean_proj,
       round((w.rho1 - avg(w.rho1) OVER ()) * 1000000 + 0.01, 0) / 1000000 + 0
           AS rho1_dev
FROM wts w
JOIN pcar px ON px.label = w.pair_id * 2
JOIN pcar py ON py.label = w.pair_id * 2 + 1
JOIN proj p ON p.pair_id = w.pair_id
"""


@register("oxford_pipeline", _oracle())
def oxford_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Oxford flagship workflow end-to-end (see module docstring):
    QC → seeded sample → PCA → CCA → sign-aligned weights → projection
    → cross-pair aggregation, one composed hash-checked plan."""
    lab = load_table(spark, sf_dir, "embeddings").select(
        "label",
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("e1"),
        F.element_at("embedding", 2).cast("double").alias("e2"),
    )
    # 1. QC admission (F5) — tiny relation, broadcast to the scan
    admitted = lab.groupBy("label").agg(F.count(F.lit(1)).alias("cnt")).filter(
        F.col("cnt") >= QC_MIN
    ).select("label")
    padm = (
        admitted.alias("a")
        .join(
            admitted.alias("b"),
            (F.expr("a.label DIV 2") == F.expr("b.label DIV 2"))
            & (F.expr("a.label % 2 = 0"))
            & (F.expr("b.label % 2 = 1")),
        )
        .select(F.expr("a.label DIV 2").alias("pair_id"))
    )
    # 2. Seeded sampling (M18/O3): per-label md5-order top-k
    wsamp = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    sampled = (
        lab.join(F.broadcast(admitted), "label")
        .join(
            F.broadcast(padm),
            F.expr("label DIV 2") == F.col("pair_id"),
            "left_semi",
        )
        .withColumn("srk", F.row_number().over(wsamp))
        .filter(F.col("srk") <= SAMP_K)
        .select("label", "vec_id", "e1", "e2")
    )
    # stage boundary: PCA, pairing, and projection all consume the
    # sampled relation; materialize it once (lazily — r15)
    sampled = bounded_once(sampled)
    # 3. PCA per side (M4, closed form)
    n = F.count(F.lit(1))
    pca = sampled.groupBy("label").agg(
        n.alias("n_side"),
        (F.sum(F.col("e1") * F.col("e1")) - F.sum("e1") * F.sum("e1") / n).alias("c11"),
        (F.sum(F.col("e2") * F.col("e2")) - F.sum("e2") * F.sum("e2") / n).alias("c22"),
        (F.sum(F.col("e1") * F.col("e2")) - F.sum("e1") * F.sum("e2") / n).alias("c12"),
    )
    pcar = pca.selectExpr("label", "n_side", f"{_PCA_RATIO_EXPR} AS expl")
    # 4. Pair + CCA (M1 closed form, shared stage strings)
    wrn = Window.partitionBy("label").orderBy("vec_id")
    prn = sampled.select(
        F.expr("label DIV 2").alias("pair_id"),
        (F.col("label") % 2).alias("side"),
        "e1",
        "e2",
        F.row_number().over(wrn).alias("rn"),
    )
    a = prn.filter(F.col("side") == 0).select(
        "pair_id", "rn", F.col("e1").alias("x1"), F.col("e2").alias("x2")
    )
    b = prn.filter(F.col("side") == 1).select(
        "pair_id", "rn", F.col("e1").alias("y1"), F.col("e2").alias("y2")
    )
    m = a.join(b, ["pair_id", "rn"])
    agg = m.groupBy("pair_id").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        *[F.expr(f"sum({e})").alias(nm) for nm, e in _CCA2_SUMS],
    )
    wts = agg
    for nm, e in _CCA2_STAGES + _ALIGN_STAGES:
        wts = wts.selectExpr("*", f"{e} AS {nm}")
    # 5./6. Projection (M5) with the aligned weights — per-pair weight
    # relation is O(|pairs|): broadcast
    proj = (
        m.join(F.broadcast(wts.select("pair_id", "wx1", "wx2")), "pair_id")
        .groupBy("pair_id")
        .agg(
            F.avg(
                F.col("x1") * F.col("wx1") + F.col("x2") * F.col("wx2")
            ).alias("mean_proj")
        )
    )
    # 7. Cross-pair aggregation (A3): deviation from the global mean
    px = pcar.filter(F.col("label") % 2 == 0).select(
        F.expr("label DIV 2").alias("pair_id"),
        F.col("n_side").alias("n_x"),
        F.col("expl").alias("expl_x"),
    )
    py = pcar.filter(F.col("label") % 2 == 1).select(
        F.expr("label DIV 2").alias("pair_id"),
        F.col("n_side").alias("n_y"),
        F.col("expl").alias("expl_y"),
    )
    out = (
        wts.select("pair_id", "n", "rho1", "wx1", "wx2")
        .join(F.broadcast(px), "pair_id")
        .join(F.broadcast(py), "pair_id")
        .join(F.broadcast(proj), "pair_id")
    )
    # global mean via broadcast 1-row aggregate (not an unpartitioned
    # window): the pair relation is tiny but the plan stays clean
    gmean = out.agg(F.avg("rho1").alias("rho1_gmean"))
    out = out.crossJoin(F.broadcast(gmean))
    return out.select(
        F.col("pair_id").cast("int").alias("pair_id"),
        F.col("n").cast("long").alias("n_samples"),
        F.col("n_x").cast("long").alias("n_x"),
        F.col("n_y").cast("long").alias("n_y"),
        round6(F.col("rho1")).alias("rho1"),
        round6(F.col("wx1")).alias("wx1"),
        round6(F.col("wx2")).alias("wx2"),
        round6(F.col("expl_x")).alias("expl_x"),
        round6(F.col("expl_y")).alias("expl_y"),
        round6(F.col("mean_proj")).alias("mean_proj"),
        round6(F.col("rho1") - F.col("rho1_gmean")).alias("rho1_dev"),
    )


# --------------------------------------------------------------------------
# Full-fidelity twin: the REAL grouped kernels over the full 64 dims
# --------------------------------------------------------------------------
_FULL_K = 3        # canonical/principal components carried forward
_FULL_FOLDS = 10   # reference uses 10-fold CV (perform_session_cca.m)


@register("oxford_pipeline_full")
def oxford_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship lifecycle with the REAL numerical kernels (verdict
    r7 item 4): QC admission → seeded M18 sample → 10-fold `cv_pca`
    (M4) → 10-fold `cv_cca` routed through the M2 `robust_cca` guard
    (rank-checked; degenerate groups take the ridge branch — exercised
    in tests/test_oxford_pipeline.py) → `canoncorr` on the full sample →
    M12 dominant-sign alignment of the first canonical x-weight →
    M5 projection of the sampled side-x rows — all inside ONE grouped
    Arrow kernel per admitted pair, mirroring the reference chain
    `perform_region_pca.m` → `perform_session_cca.m:270-345` →
    `cross_trial_type_cca_analysis.py:2734-2925`.

    Rows-only by design (QR/SVD/eigh are not SQL-expressible); the
    hash-checked `oxford_pipeline` twin pins the relational stages and
    tests/test_oxford_pipeline.py pins this kernel's invariants
    (R² ∈ [0,1] per fold, unit-norm aligned weights, dominant-sign
    convention, fold counts, seed determinism).

    Scale shape: identical to `oxford_pipeline` — the M18 sample bounds
    every group to ≤2×{SAMP_K} rows regardless of corpus size, so the
    grouped kernel is O(pairs) tiny dense problems; the only
    corpus-wide work is the scan + per-label sampling window."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", "vec_id", "embedding"
    )
    admitted = (
        emb.groupBy("label")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= QC_MIN)
        .select("label")
    )
    wsamp = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    sampled = (
        emb.join(F.broadcast(admitted), "label")
        .withColumn("srk", F.row_number().over(wsamp))
        .filter(F.col("srk") <= SAMP_K)
        .select(
            F.expr("label DIV 2").alias("pair_id"),
            (F.col("label") % 2).alias("side"),
            "vec_id",
            "embedding",
        )
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        from oxford_data_pipeline_spark.ml.linalg import (
            canoncorr,
            cv_cca,
            cv_pca,
            robust_cca,
        )

        def mat(side: int) -> np.ndarray:
            sub = pdf[pdf["side"] == side].sort_values("vec_id")
            if not len(sub):
                return np.zeros((0, 0))
            return np.vstack(
                sub["embedding"].map(np.asarray).to_numpy()
            ).astype(np.float64)

        x, y = mat(0), mat(1)
        n = min(len(x), len(y))
        cols = [
            "pair_id", "n_samples", "n_folds", "pc1_pct_x", "pc1_pct_y",
            "rho1", "mean_cv_r2_c1", "min_cv_r2", "max_cv_r2",
            "wx_norm", "dominant_positive", "proj_mean",
        ]
        if n < _FULL_FOLDS + 2:
            return pd.DataFrame(columns=cols)
        x, y = x[:n], y[:n]
        # M4: per-side 10-fold CV-PCA, PC1 explained-variance ratio
        px = cv_pca(x, _FULL_K, _FULL_FOLDS)
        py = cv_pca(y, _FULL_K, _FULL_FOLDS)
        # PC1 share of the top-k fold-mean eigenvalue mass, in percent
        # (cv_pca's own convention, matching m4_cv_pca's output)
        evr_x = float(px["explained_variance"][0])
        evr_y = float(py["explained_variance"][0])
        # M1 (+M2 fallback inside): 10-fold CV-CCA test R²
        cv = cv_cca(x, y, _FULL_K, _FULL_FOLDS)
        # full-sample canonical weights (M2-guarded), first component
        A, _B, r = robust_cca(x, y, _FULL_K)
        w1 = A[:, 0]
        # M12: flip so the dominant-|w| component is positive, unit norm
        dom = int(np.argmax(np.abs(w1))) if np.abs(w1).sum() > 0 else 0
        sgn = -1.0 if w1[dom] < 0 else 1.0
        nrm = float(np.linalg.norm(w1))
        w1a = sgn * w1 / nrm if nrm > 0 else np.zeros_like(w1)
        # M5: project the sampled x rows onto the aligned axis (raw
        # scores, matching oxford_pipeline's uncentered x·w convention)
        proj = float((x @ w1a).mean()) if nrm > 0 else 0.0
        return pd.DataFrame(
            [
                {
                    "pair_id": int(pdf["pair_id"].iloc[0]),
                    "n_samples": int(n),
                    "n_folds": int(cv["cv_R2"].shape[0]),
                    "pc1_pct_x": evr_x,
                    "pc1_pct_y": evr_y,
                    "rho1": float(r[0]),
                    "mean_cv_r2_c1": float(cv["mean_cv_R2"][0]),
                    "min_cv_r2": float(cv["cv_R2"].min()),
                    "max_cv_r2": float(cv["cv_R2"].max()),
                    "wx_norm": float(np.linalg.norm(w1a)),
                    "dominant_positive": bool(w1a[dom] >= 0),
                    "proj_mean": proj,
                }
            ]
        )

    per_pair = sampled.groupBy("pair_id").applyInPandas(
        fit,
        schema=(
            "pair_id int, n_samples int, n_folds int, pc1_pct_x double,"
            " pc1_pct_y double, rho1 double, mean_cv_r2_c1 double,"
            " min_cv_r2 double, max_cv_r2 double, wx_norm double,"
            " dominant_positive boolean, proj_mean double"
        ),
    )
    # A3: cross-pair deviation off a broadcast 1-row global mean
    gmean = per_pair.agg(F.avg("rho1").alias("rho1_gmean"))
    return per_pair.crossJoin(F.broadcast(gmean)).select(
        "pair_id", "n_samples", "n_folds",
        round6(F.col("pc1_pct_x")).alias("pc1_pct_x"),
        round6(F.col("pc1_pct_y")).alias("pc1_pct_y"),
        round6(F.col("rho1")).alias("rho1"),
        round6(F.col("mean_cv_r2_c1")).alias("mean_cv_r2_c1"),
        round6(F.col("min_cv_r2")).alias("min_cv_r2"),
        round6(F.col("max_cv_r2")).alias("max_cv_r2"),
        round6(F.col("wx_norm")).alias("wx_norm"),
        "dominant_positive",
        round6(F.col("proj_mean")).alias("proj_mean"),
        round6(F.col("rho1") - F.col("rho1_gmean")).alias("rho1_dev"),
    )
