"""GLM stage — the reference's third pipeline (README_Oxford_GLM_
Analysis.md): regress CCA latents onto region population activity.

Chain: J4 join of projections with region spike data on (session,
pair) → M6 per-(session, pair, region) OLS with full inference →
F9 significance predicate (p < 0.05) → M7/W2 neuron-removal
sensitivity (top-|β| schedule vs seeded-random Monte-Carlo) →
A9-style summary rollup.

Reference: `oxford_GLM_CCA_coefficients_extract.m:113-485`,
`Oxford_glm_sensitivity.m:40-342`, `Oxford_GLM_summary.m`.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seed_from(*parts) -> int:
    h = hashlib.md5("|".join(str(p) for p in parts).encode()).hexdigest()
    return int(h[:8], 16)


def glm_fit(
    projections: DataFrame,
    segmented: DataFrame,
    sampled: DataFrame,
    component: int = 1,
    side: str = "i",
) -> DataFrame:
    """M6 — per (session, pair, region): OLS of the component-`component`
    latent (the `side` of the pair) on the region's z-scored neuron
    rates at the same (trial, t) samples. Output: one row per neuron
    coefficient with inference, plus model-level stats repeated."""
    from oxford_data_pipeline_spark.ml.linalg import ols_inference

    latent = projections.filter(
        (F.col("component") == component) & (F.col("side") == side)
    ).select("session", "pair_r1", "pair_r2", "trial_id", "t", "value")
    tagged = segmented.join(
        F.broadcast(sampled.select("session", "neuron_id", "region")),
        ["session", "neuron_id"],
    )
    joined = latent.join(
        tagged.withColumnRenamed("region", "n_region"),
        ["session", "trial_id", "t"],
    ).filter(
        (F.col("n_region") == F.col("pair_r1")) | (F.col("n_region") == F.col("pair_r2"))
    )

    _COLS = ["session", "pair_r1", "pair_r2", "region", "neuron_id", "beta",
             "se", "t_stat", "p_value", "r2", "adj_r2", "aic", "bic", "n_samples"]

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        piv = pdf.pivot_table(
            index=["trial_id", "t"], columns="neuron_id", values="rate",
            aggfunc="first", fill_value=0.0,
        ).sort_index()
        yv = (
            pdf.drop_duplicates(["trial_id", "t"])
            .set_index(["trial_id", "t"])["value"]
            .reindex(piv.index)
            .to_numpy(dtype=float)
        )
        X = piv.to_numpy(dtype=float)
        sd = X.std(axis=0, ddof=1)
        mu = X.mean(axis=0)
        X = (X - mu) / np.where(sd > 0, sd, 1.0)
        if X.shape[0] <= X.shape[1] + 2:
            return pd.DataFrame(columns=_COLS)
        res = ols_inference(X, yv)
        nids = [int(c) for c in piv.columns]
        rows = []
        for i, nid in enumerate(nids):
            rows.append(
                (pdf["session"].iloc[0], pdf["pair_r1"].iloc[0],
                 pdf["pair_r2"].iloc[0], pdf["n_region"].iloc[0], nid,
                 float(res["beta"][i + 1]), float(res["se"][i + 1]),
                 float(res["t"][i + 1]), float(res["p"][i + 1]),
                 float(res["r2"]), float(res["adj_r2"]), float(res["aic"]),
                 float(res["bic"]), int(res["n"]))
            )
        return pd.DataFrame(rows, columns=_COLS)

    return joined.groupBy("session", "pair_r1", "pair_r2", "n_region").applyInPandas(
        fit,
        schema="session string, pair_r1 string, pair_r2 string, region string,"
        " neuron_id int, beta double, se double, t_stat double, p_value double,"
        " r2 double, adj_r2 double, aic double, bic double, n_samples long",
    )


def significant_neurons(glm: DataFrame, alpha: float = 0.05) -> DataFrame:
    """F9 — p < α (`oxford_GLM_CCA_coefficients_extract.m:471-473`)."""
    return glm.filter(F.col("p_value") < alpha).select(
        "session", "pair_r1", "pair_r2", "region", "neuron_id", "beta", "p_value"
    )


def sensitivity_grid(
    projections: DataFrame,
    segmented: DataFrame,
    sampled: DataFrame,
    pcts: list[int] = (0, 25, 50, 75),
    mc_iters: int = 3,
    component: int = 1,
    side: str = "i",
) -> DataFrame:
    """M7 — refit after removing top-|β| ρ% of neurons (W2 schedule) or
    seeded-random ρ% × Monte-Carlo iterations; concentration index =
    ΔR²_top(50) − ΔR²_rand(50) computable from the output
    (`Oxford_glm_sensitivity.m:54-55,256-342`)."""
    from oxford_data_pipeline_spark.ml.linalg import ols_inference

    latent = projections.filter(
        (F.col("component") == component) & (F.col("side") == side)
    ).select("session", "pair_r1", "pair_r2", "trial_id", "t", "value")
    tagged = segmented.join(
        F.broadcast(sampled.select("session", "neuron_id", "region")),
        ["session", "neuron_id"],
    )
    joined = latent.join(
        tagged.withColumnRenamed("region", "n_region"), ["session", "trial_id", "t"]
    ).filter(
        (F.col("n_region") == F.col("pair_r1")) | (F.col("n_region") == F.col("pair_r2"))
    )
    pcts = list(pcts)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        piv = pdf.pivot_table(
            index=["trial_id", "t"], columns="neuron_id", values="rate",
            aggfunc="first", fill_value=0.0,
        ).sort_index()
        yv = (
            pdf.drop_duplicates(["trial_id", "t"])
            .set_index(["trial_id", "t"])["value"]
            .reindex(piv.index)
            .to_numpy(dtype=float)
        )
        X = piv.to_numpy(dtype=float)
        d = X.shape[1]
        if X.shape[0] <= d + 2:
            return pd.DataFrame(
                columns=["session", "pair_r1", "pair_r2", "region", "strategy",
                         "pct_removed", "iteration", "r2"]
            )
        base = ols_inference(X, yv, inference=False)
        order = np.argsort(-np.abs(base["beta"][1:]), kind="stable")
        key = (pdf["session"].iloc[0], pdf["pair_r1"].iloc[0],
               pdf["pair_r2"].iloc[0], pdf["n_region"].iloc[0])
        rows = []
        for pct in pcts:
            n_drop = int(np.floor(d * pct / 100.0))
            keep = np.setdiff1d(np.arange(d), order[:n_drop])
            r2_top = (
                ols_inference(X[:, keep], yv, inference=False)["r2"]
                if keep.size else np.nan
            )
            rows.append((*key, "top", pct, 0, float(r2_top)))
            for it in range(mc_iters):
                rng = np.random.default_rng(_seed_from("m7", *key, pct, it))
                drop = rng.choice(d, size=n_drop, replace=False)
                keep_r = np.setdiff1d(np.arange(d), drop)
                r2_r = (
                    ols_inference(X[:, keep_r], yv, inference=False)["r2"]
                    if keep_r.size else np.nan
                )
                rows.append((*key, "random", pct, it, float(r2_r)))
        return pd.DataFrame(
            rows, columns=["session", "pair_r1", "pair_r2", "region", "strategy",
                           "pct_removed", "iteration", "r2"]
        )

    return joined.groupBy("session", "pair_r1", "pair_r2", "n_region").applyInPandas(
        fit,
        schema="session string, pair_r1 string, pair_r2 string, region string,"
        " strategy string, pct_removed int, iteration int, r2 double",
    )


def glm_summary(glm: DataFrame, alpha: float = 0.05) -> DataFrame:
    """A9 — per-pair summary + overall rollup of GLM quality and
    significant-neuron counts (`oxford_GLM_CCA_coefficients_extract.m:
    504-557`)."""
    per_fit = glm.groupBy("session", "pair_r1", "pair_r2", "region").agg(
        F.first("r2").alias("r2"),
        F.count(F.when(F.col("p_value") < alpha, 1)).alias("n_significant"),
        F.count(F.lit(1)).alias("n_neurons"),
    )
    return per_fit.rollup("pair_r1", "pair_r2").agg(
        F.count(F.lit(1)).alias("n_fits"),
        F.avg("r2").alias("mean_r2"),
        F.min("r2").alias("min_r2"),
        F.max("r2").alias("max_r2"),
        F.avg("n_significant").alias("mean_n_significant"),
    )
