"""Pure-numpy ML kernels mirroring the reference's statistical operators.

These run INSIDE grouped pandas UDFs (`applyInPandas`) — each group is
one (session, pair)/(session, region) worth of data, a few MB at most
(SURVEY §2.9: groups ≈ 45k rows × 50 cols). Nothing here ever sees a
full table.

Semantics ported (not code — the reference is MATLAB):
- cv folds are CONTIGUOUS blocks over the given row order
  (`perform_session_cca.m:287-291`, W6).
- CCA = MATLAB canoncorr semantics: QR + SVD of the centered blocks
  (`perform_session_cca.m:270-334`), ridge fallback on rank deficiency
  appending sqrt(lambda)*I rows, lambda=0.01 ×10 up to 5 attempts
  (`perform_session_cca.m:336-400`, M2).
- PCA per fold with reconstruction-MSE model selection
  (`perform_region_pca.m:93-156`, M4).
- OLS with full inference: beta, SE, t, p, CI, R2/adj, AIC/BIC
  (`oxford_GLM_CCA_coefficients_extract.m:402-485`, M6).
- Wilcoxon signed-rank with normal approximation + tie correction
  (`cross_trial_type_cca_analysis.py:1259-1423`, M10).

Determinism: SVD sign is fixed by forcing the max-|loading| entry of
each component positive; all sampling takes explicit seeds.
"""

from __future__ import annotations

import numpy as np

from oxford_data_pipeline_spark.ml.inference import norm_sf, t_ppf, t_two_sided_p


def _fix_signs(W: np.ndarray) -> np.ndarray:
    """Make each column's largest-|entry| positive (deterministic SVD)."""
    idx = np.argmax(np.abs(W), axis=0)
    signs = np.sign(W[idx, np.arange(W.shape[1])])
    signs[signs == 0] = 1.0
    return W * signs


def contiguous_folds(n: int, n_folds: int) -> list[np.ndarray]:
    """Contiguous test blocks (W6): fold k = rows [k*sz, (k+1)*sz)."""
    sz = n // n_folds
    folds = []
    for k in range(n_folds):
        lo = k * sz
        hi = (k + 1) * sz if k < n_folds - 1 else n
        folds.append(np.arange(lo, hi))
    return folds


# ---------------------------------------------------------------------------
# PCA (M4)
# ---------------------------------------------------------------------------


def pca_fit(X: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """PCA via SVD of the centered matrix. Returns (coeffs [d×k],
    explained_variance [k])."""
    Xc = X - X.mean(axis=0, keepdims=True)
    _, s, Vt = np.linalg.svd(Xc, full_matrices=False)
    k = min(k, Vt.shape[0])
    W = _fix_signs(Vt[:k].T)
    ev = (s[:k] ** 2) / max(X.shape[0] - 1, 1)
    return W, ev


def cv_pca(X: np.ndarray, k: int, n_folds: int = 10) -> dict:
    """Cross-validated PCA: per contiguous fold, fit on train, measure
    test reconstruction MSE for 1..k components; final coefficients =
    fold mean (then global min-max normalized), explained variance =
    fold-mean eigenvalues."""
    n, d = X.shape
    k = min(k, d)
    folds = contiguous_folds(n, n_folds)
    coeffs, evs = [], []
    mse = np.zeros((len(folds), k))
    for fi, test_idx in enumerate(folds):
        train_mask = np.ones(n, dtype=bool)
        train_mask[test_idx] = False
        Xtr, Xte = X[train_mask], X[test_idx]
        W, ev = pca_fit(Xtr, k)
        if W.shape[1] < k:  # rank-deficient fold: zero-pad
            W = np.pad(W, ((0, 0), (0, k - W.shape[1])))
            ev = np.pad(ev, (0, k - ev.shape[0]))
        coeffs.append(W)
        evs.append(ev)
        mu = Xtr.mean(axis=0, keepdims=True)
        Xte_c = Xte - mu
        for kk in range(1, k + 1):
            P = W[:, :kk]
            rec = Xte_c @ P @ P.T
            mse[fi, kk - 1] = float(np.mean((Xte_c - rec) ** 2))
    W_mean = np.mean(coeffs, axis=0)
    ev_mean = np.mean(evs, axis=0)
    lo, hi = np.min(W_mean), np.max(W_mean)
    W_norm = (W_mean - lo) / (hi - lo) if hi > lo else np.zeros_like(W_mean)
    total = ev_mean.sum()
    explained = ev_mean / total * 100.0 if total > 0 else ev_mean
    return {
        "coefficients": W_mean,
        "coefficients_norm": W_norm,
        "explained_variance": explained,
        "cumulative_variance": np.cumsum(explained),
        "cv_mse": mse,
    }


# ---------------------------------------------------------------------------
# CCA (M1/M2)
# ---------------------------------------------------------------------------


def canoncorr(X: np.ndarray, Y: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Canonical correlation via QR+SVD of centered blocks (the textbook
    algorithm MATLAB's canoncorr implements). Returns (A [dx×k],
    B [dy×k], r [k])."""
    n = X.shape[0]
    Xc = X - X.mean(axis=0, keepdims=True)
    Yc = Y - Y.mean(axis=0, keepdims=True)
    Qx, Rx = np.linalg.qr(Xc)
    Qy, Ry = np.linalg.qr(Yc)
    U, s, Vt = np.linalg.svd(Qx.T @ Qy, full_matrices=False)
    k = min(k, s.shape[0])
    A = np.linalg.lstsq(Rx, U[:, :k], rcond=None)[0] * np.sqrt(max(n - 1, 1))
    B = np.linalg.lstsq(Ry, Vt[:k].T, rcond=None)[0] * np.sqrt(max(n - 1, 1))
    return _fix_signs(A), _fix_signs(B), np.clip(s[:k], 0.0, 1.0)


def robust_cca(
    X: np.ndarray, Y: np.ndarray, k: int, lam: float = 0.01, attempts: int = 5
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """M2 — regularized fallback: if either block is rank-deficient,
    append sqrt(lam)*I rows (ridge), multiplying lam by 10 per retry;
    missing components are zero-padded."""
    dx, dy = X.shape[1], Y.shape[1]
    full = min(dx, dy, X.shape[0] - 1)
    if (
        np.linalg.matrix_rank(X - X.mean(0)) >= min(dx, X.shape[0] - 1)
        and np.linalg.matrix_rank(Y - Y.mean(0)) >= min(dy, Y.shape[0] - 1)
    ):
        A, B, r = canoncorr(X, Y, k)
    else:
        A = B = r = None
        cur = lam
        for _ in range(attempts):
            # ridge rows: sqrt(lam)*I appended to BOTH blocks with equal
            # row counts (max(dx, dy) rows, zero-padded columns)
            m = max(dx, dy)
            Xa = np.vstack([X, np.sqrt(cur) * np.eye(m)[:, :dx]])
            Ya = np.vstack([Y, np.sqrt(cur) * np.eye(m)[:, :dy]])
            try:
                A, B, r = canoncorr(Xa, Ya, k)
                break
            except np.linalg.LinAlgError:
                cur *= 10.0
        if A is None:
            A = np.zeros((dx, k))
            B = np.zeros((dy, k))
            r = np.zeros(k)
    if A.shape[1] < k:
        A = np.pad(A, ((0, 0), (0, k - A.shape[1])))
        B = np.pad(B, ((0, 0), (0, k - B.shape[1])))
        r = np.pad(r, (0, k - r.shape[0]))
    return A, B, r


def cv_cca(X: np.ndarray, Y: np.ndarray, k: int, n_folds: int = 10) -> dict:
    """M1 — cross-validated CCA: canoncorr on each train block, test
    R² = corr(X_test·a_j, Y_test·b_j)² per component; outputs
    cv_R2 [folds×k] and fold-mean weights."""
    n = X.shape[0]
    folds = contiguous_folds(n, n_folds)
    cv_r2 = np.zeros((len(folds), k))
    As, Bs = [], []
    for fi, test_idx in enumerate(folds):
        train_mask = np.ones(n, dtype=bool)
        train_mask[test_idx] = False
        A, B, _ = robust_cca(X[train_mask], Y[train_mask], k)
        As.append(A)
        Bs.append(B)
        u = (X[test_idx] - X[train_mask].mean(0)) @ A
        v = (Y[test_idx] - Y[train_mask].mean(0)) @ B
        for j in range(k):
            su, sv = u[:, j].std(), v[:, j].std()
            if su > 0 and sv > 0:
                c = float(np.corrcoef(u[:, j], v[:, j])[0, 1])
                cv_r2[fi, j] = c * c
    return {
        "cv_R2": cv_r2,
        "mean_cv_R2": cv_r2.mean(axis=0),
        "std_cv_R2": cv_r2.std(axis=0, ddof=0),
        "mean_A": np.mean(As, axis=0),
        "mean_B": np.mean(Bs, axis=0),
    }


# ---------------------------------------------------------------------------
# OLS with full inference (M6)
# ---------------------------------------------------------------------------


def ols_inference(
    X: np.ndarray, y: np.ndarray, alpha: float = 0.05, inference: bool = True
) -> dict:
    """OLS `y ~ [1, X]` with the reference's full inferential output:
    beta, SE, t, p, (1-alpha) CI, R², adj-R², MSE, AIC, BIC.

    inference=False skips the t-CDF work (p-values, CIs) for callers
    that only need fit quality (the M7 sensitivity grid refits)."""
    n, p = X.shape
    Xd = np.column_stack([np.ones(n), X])
    beta, *_ = np.linalg.lstsq(Xd, y, rcond=None)
    resid = y - Xd @ beta
    dof = n - p - 1
    sse = float(resid @ resid)
    sst = float(((y - y.mean()) ** 2).sum())
    mse = sse / dof if dof > 0 else np.nan
    XtX_inv = np.linalg.pinv(Xd.T @ Xd)
    se = np.sqrt(np.clip(np.diag(XtX_inv) * mse, 0.0, None))
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(se > 0, beta / se, 0.0)
    if inference and dof > 0:
        pvals = t_two_sided_p(t, dof)
        tcrit = t_ppf(1.0 - alpha / 2.0, dof)
    else:
        pvals = np.full_like(t, np.nan)
        tcrit = np.nan
    r2 = 1.0 - sse / sst if sst > 0 else np.nan
    adj_r2 = 1.0 - (1.0 - r2) * (n - 1) / dof if dof > 0 else np.nan
    ll = -0.5 * n * (np.log(2.0 * np.pi * sse / n) + 1.0) if sse > 0 else np.nan
    kparams = p + 2  # betas + intercept + sigma
    return {
        "beta": beta,
        "se": se,
        "t": t,
        "p": pvals,
        "ci_lo": beta - tcrit * se,
        "ci_hi": beta + tcrit * se,
        "r2": r2,
        "adj_r2": adj_r2,
        "mse": mse,
        "aic": 2 * kparams - 2 * ll,
        "bic": kparams * np.log(n) - 2 * ll,
        "n": n,
        "dof": dof,
    }


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank (M10)
# ---------------------------------------------------------------------------


def wilcoxon_signed_rank(
    x: np.ndarray, y: np.ndarray | None = None, alternative: str = "two-sided"
) -> dict:
    """Wilcoxon signed-rank with normal approximation + tie correction
    (zeros dropped, average ranks — the standard public formulation)."""
    d = np.asarray(x, dtype=float) - (0.0 if y is None else np.asarray(y, dtype=float))
    d = d[d != 0]
    n = d.size
    if n == 0:
        return {"n": 0, "W": np.nan, "z": np.nan, "p": np.nan}
    absd = np.abs(d)
    order = np.argsort(absd, kind="stable")
    ranks = np.empty(n)
    sorted_abs = absd[order]
    # average ranks for ties
    i = 0
    while i < n:
        j = i
        while j + 1 < n and sorted_abs[j + 1] == sorted_abs[i]:
            j += 1
        ranks[order[i : j + 1]] = 0.5 * (i + j) + 1.0
        i = j + 1
    w_plus = float(ranks[d > 0].sum())
    mu = n * (n + 1) / 4.0
    # tie correction
    _, counts = np.unique(sorted_abs, return_counts=True)
    tie_term = (counts**3 - counts).sum() / 48.0
    sigma = np.sqrt(n * (n + 1) * (2 * n + 1) / 24.0 - tie_term)
    z = (w_plus - mu) / sigma if sigma > 0 else 0.0
    if alternative == "greater":
        p = float(norm_sf(z)[0])
    elif alternative == "less":
        p = float(1.0 - norm_sf(z)[0])
    else:
        p = float(2.0 * norm_sf(abs(z))[0])
    return {"n": int(n), "W": w_plus, "z": float(z), "p": min(p, 1.0)}


# ---------------------------------------------------------------------------
# Principal angles (M14)
# ---------------------------------------------------------------------------


def principal_angles(U1: np.ndarray, U2: np.ndarray) -> np.ndarray:
    """θ_i = arccos σ_i(Q1ᵀQ2) between the column spans (radians)."""
    Q1, _ = np.linalg.qr(U1)
    Q2, _ = np.linalg.qr(U2)
    s = np.linalg.svd(Q1.T @ Q2, compute_uv=False)
    return np.arccos(np.clip(s, -1.0, 1.0))
