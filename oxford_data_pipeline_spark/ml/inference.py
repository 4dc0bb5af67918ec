"""Distribution functions for inferential statistics, in pure numpy.

The container has no scipy/statsmodels, so the t CDF/PPF needed by the
GLM stage (M6: p-values, confidence intervals — reference
`oxford_GLM_CCA_coefficients_extract.m:402-485` uses tinv/tcdf) is
implemented via the regularized incomplete beta function using the
standard continued-fraction expansion (Lentz's algorithm, as described
in public numerical-methods literature).
"""

from __future__ import annotations

import numpy as np


def _betacf(a: float, b: float, x: np.ndarray) -> np.ndarray:
    """Continued fraction for the incomplete beta function (vectorized)."""
    MAXIT, EPS, FPMIN = 200, 3e-14, 1e-300
    x = np.asarray(x, dtype=float)
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = np.ones_like(x)
    d = 1.0 - qab * x / qap
    d = np.where(np.abs(d) < FPMIN, FPMIN, d)
    d = 1.0 / d
    h = d.copy()
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < FPMIN, FPMIN, d)
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < FPMIN, FPMIN, c)
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < FPMIN, FPMIN, d)
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < FPMIN, FPMIN, c)
        d = 1.0 / d
        delta = d * c
        h *= delta
        if np.all(np.abs(delta - 1.0) < EPS):
            break
    return h


def betainc(a: float, b: float, x) -> np.ndarray:
    """Regularized incomplete beta I_x(a, b), vectorized over x."""
    import math

    x = np.atleast_1d(np.asarray(x, dtype=float))
    out = np.empty_like(x)
    lbeta = math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
    inner = (x > 0) & (x < 1)
    front = np.zeros_like(x)
    xi = x[inner]
    front[inner] = np.exp(lbeta + a * np.log(xi) + b * np.log1p(-xi))
    use_direct = x < (a + 1.0) / (a + b + 2.0)
    out[:] = 0.0
    out[x >= 1.0] = 1.0
    sel = inner & use_direct
    if sel.any():
        out[sel] = front[sel] * _betacf(a, b, x[sel]) / a
    sel = inner & ~use_direct
    if sel.any():
        out[sel] = 1.0 - front[sel] * _betacf(b, a, 1.0 - x[sel]) / b
    return out


def t_sf(t, df: float) -> np.ndarray:
    """Survival function P(T > t) of Student's t (vectorized)."""
    t = np.atleast_1d(np.asarray(t, dtype=float))
    x = df / (df + t * t)
    p = 0.5 * betainc(df / 2.0, 0.5, x)
    return np.where(t >= 0, p, 1.0 - p)


def t_cdf(t, df: float) -> np.ndarray:
    return 1.0 - t_sf(t, df)


def t_two_sided_p(t, df: float) -> np.ndarray:
    """Two-sided p-value for a t statistic."""
    return np.clip(2.0 * t_sf(np.abs(t), df), 0.0, 1.0)


from functools import lru_cache


@lru_cache(maxsize=4096)
def t_ppf(q: float, df: float, tol: float = 1e-10) -> float:
    """Inverse CDF by bisection (q in (0,1)); used for CI half-widths.
    Cached: the (q, dof) pairs repeat across every group's fit."""
    if not 0.0 < q < 1.0:
        raise ValueError("q must be in (0,1)")
    lo, hi = -1e6, 1e6
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if float(t_cdf(mid, df)[0]) < q:
            lo = mid
        else:
            hi = mid
        if hi - lo < tol:
            break
    return 0.5 * (lo + hi)


def norm_sf(z) -> np.ndarray:
    """Standard normal survival function via erfc (math.erfc, vectorized)."""
    import math

    z = np.atleast_1d(np.asarray(z, dtype=float))
    return np.array([0.5 * math.erfc(v / math.sqrt(2.0)) for v in z])
