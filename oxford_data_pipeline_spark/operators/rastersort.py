"""M19 — rastermap-style neuron sorting (the last SURVEY §2 line).

The reference optionally sorts pooled z-scored neurons with the
3rd-party `rastermap` embedding so correlated neurons are adjacent in
raster figures (`Cross_trial_type_within_session/
cross_trial_type_within_session.py:724-796`;
`neural_single_session_package_oxford_enhanced.py:274-352`).
Visualization-only: the ordering feeds figures, never statistics.

Engine form: a grouped `applyInPandas` producing a per-(session,
region) neuron ordering.  If `rastermap` is importable it is used
(matching the reference); otherwise a deterministic spectral seriation
fallback runs: order neurons by the Fiedler vector (second-smallest
eigenvector) of the graph Laplacian of the non-negative temporal
correlation matrix — the classical 1-D seriation relaxation, which is
what rastermap's embedding approximates at k=1.  Pure numpy `eigh` on
a per-group N×N matrix (N = neurons per region ≤ ~50 after M18
sampling), so group payloads stay tiny at any corpus scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "session string, region string, neuron_id int, sort_rank int, method string"
)


def _spectral_order(M: np.ndarray) -> np.ndarray:
    """Deterministic seriation of the rows of M (neurons × time):
    Fiedler-vector order of the Laplacian of the clipped correlation
    graph.  Sign fixed so the vector correlates non-negatively with
    neuron index (ties then break on index), making the order unique."""
    n = M.shape[0]
    if n <= 2:
        return np.arange(n)
    with np.errstate(invalid="ignore"):
        C = np.corrcoef(M)
    C = np.nan_to_num(C, nan=0.0)
    S = np.clip(C, 0.0, None)
    np.fill_diagonal(S, 0.0)
    L = np.diag(S.sum(axis=1)) - S
    vals, vecs = np.linalg.eigh(L)
    fiedler = vecs[:, np.argsort(vals)[1]]
    # sign convention: positive correlation with the index sequence;
    # exact zero correlation -> positive first nonzero component
    idx = np.arange(n, dtype=float)
    c = float(np.dot(fiedler - fiedler.mean(), idx - idx.mean()))
    if c < 0:
        fiedler = -fiedler
    elif c == 0 and np.any(fiedler != 0):
        if fiedler[np.nonzero(fiedler)[0][0]] < 0:
            fiedler = -fiedler
    return np.lexsort((np.arange(n), fiedler))


def _rastermap_order(M: np.ndarray) -> np.ndarray | None:
    """Reference path: rastermap's 1-D embedding sort, if installed."""
    try:
        from rastermap import Rastermap  # optional 3rd-party, not in CI
    except Exception:
        return None
    model = Rastermap(n_clusters=min(20, M.shape[0]), n_PCs=min(64, M.shape[1]))
    model.fit(M)
    return np.asarray(model.isort)


def rastersort_order(psth: DataFrame) -> DataFrame:
    """Per (session, region): neuron display order from the temporal
    response profiles.  Input: long PSTH rows (session, region,
    neuron_id, t, mean_rate).  Output adds `sort_rank` (1-based display
    position) and the `method` used ('rastermap' or 'spectral')."""

    def sort_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["neuron_id", "t"])
        neurons = pdf["neuron_id"].unique()
        wide = (
            pdf.pivot_table(index="neuron_id", columns="t",
                            values="mean_rate", aggfunc="first")
            .loc[neurons]
            .to_numpy(dtype=float)
        )
        wide = np.nan_to_num(wide, nan=0.0)
        mu = wide.mean(axis=1, keepdims=True)
        sd = wide.std(axis=1, keepdims=True)
        z = np.where(sd > 0, (wide - mu) / np.where(sd > 0, sd, 1.0), 0.0)
        order = _rastermap_order(z)
        method = "rastermap"
        if order is None:
            order = _spectral_order(z)
            method = "spectral"
        ranks = np.empty(len(neurons), dtype=int)
        ranks[order] = np.arange(1, len(neurons) + 1)
        return pd.DataFrame(
            {
                "session": pdf["session"].iloc[0],
                "region": pdf["region"].iloc[0],
                "neuron_id": neurons,
                "sort_rank": ranks,
                "method": method,
            }
        )

    return psth.groupBy("session", "region").applyInPandas(
        sort_group, schema=OUTPUT_SCHEMA
    )
