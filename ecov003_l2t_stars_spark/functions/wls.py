"""Trailing-window weighted least squares kernel (BRDF regression analog).

NumPy re-derivation of the reference's per-pixel lagged-window WLS
(``/root/reference/ECOv003_L2T_STARS/VNP43NRT_jl/src/VNP43NRT.jl:310-394``):
for each target bucket, regress the value series over the trailing
``window`` buckets with exponential recency weights
``exp(-0.5 * lag / scale)`` (jl:362-363; default scale 1.87 per
``VNP43NRT/VNP43NRT.py:31``), solving the 2-parameter normal equations
(level + trend — the transcript-domain reduction of the reference's
3-parameter [iso, vol, geo] kernel design, jl:365-369). A minimum
observation gate leaves NULL below ``min_obs`` (jl:345-346: ``nt < 7``).

Vectorized across (series × target bucket) via sliding windows — the
same "stack pixels into a matrix, regress all at once" strategy as
``process_VNP43NRT.jl:87-102``. The engine UDF and the test oracle share
these functions.

Outputs per target bucket: trend (slope per bucket), level (weighted
intercept at the target bucket), se (slope standard error), r2, n_obs.
"""

from __future__ import annotations

import numpy as np

DEFAULT_SCALE = 1.87
DEFAULT_WINDOW = 16
DEFAULT_MIN_OBS = 7


def recency_weights(window: int, scale: float = DEFAULT_SCALE) -> np.ndarray:
    """w[lag] for lag = window-1 (oldest) .. 0 (newest), matching the
    reference's ``exp.(-0.5 .* (p-1 .. 0) ./ scale)`` (jl:362)."""
    lags = np.arange(window - 1, -1, -1, dtype=np.float64)
    return np.exp(-0.5 * lags / scale)


def wls_trailing(
    y: np.ndarray,
    window: int = DEFAULT_WINDOW,
    scale: float = DEFAULT_SCALE,
    min_obs: int = DEFAULT_MIN_OBS,
) -> dict[str, np.ndarray]:
    """Rolling trailing-window WLS over a (n_series, T) NaN-padded matrix.

    x is the lag coordinate (0 at the target bucket, -1 one bucket back,
    …) so ``level`` is the fit evaluated at the target bucket.
    Returns dict of (n_series, T) float64 arrays with NaN where the
    min-obs gate fails.
    """
    y = np.atleast_2d(np.asarray(y, dtype=np.float64))
    n, T = y.shape
    # left-pad with NaN so every target has a full trailing window
    pad = np.full((n, window - 1), np.nan)
    yp = np.concatenate([pad, y], axis=1)
    win = np.lib.stride_tricks.sliding_window_view(yp, window, axis=1)
    # win[:, t, j]: j = 0 oldest .. window-1 newest (target t)

    w_full = recency_weights(window, scale)  # index 0 oldest .. newest
    x_full = np.arange(-(window - 1), 1, dtype=np.float64)  # lag coordinate

    m = ~np.isnan(win)
    wv = np.where(m, w_full, 0.0)
    yv = np.where(m, win, 0.0)

    n_obs = m.sum(axis=2)
    sw = wv.sum(axis=2)
    sx = (wv * x_full).sum(axis=2)
    sxx = (wv * x_full * x_full).sum(axis=2)
    sy = (wv * yv).sum(axis=2)
    sxy = (wv * x_full * yv).sum(axis=2)

    with np.errstate(divide="ignore", invalid="ignore"):
        det = sw * sxx - sx * sx
        slope = (sw * sxy - sx * sy) / det
        intercept = (sxx * sy - sx * sxy) / det  # value at lag 0 == target
        resid = yv - (intercept[..., None] + slope[..., None] * x_full)
        sse = (wv * resid * resid).sum(axis=2)
        ybar = sy / sw
        sst = (wv * (yv - ybar[..., None]) ** 2 * m).sum(axis=2)
        r2 = 1.0 - sse / sst
        dof = n_obs - 2
        sigma2 = sse / np.where(dof > 0, dof, np.nan)
        se = np.sqrt(sigma2 * sw / det)

    gate = n_obs >= min_obs
    out = {}
    for name, arr in (
        ("trend", slope),
        ("level", intercept),
        ("se", se),
        ("r2", r2),
    ):
        out[name] = np.where(gate, arr, np.nan)
    out["n_obs"] = n_obs.astype(np.int64)
    return out


def wls_trailing_rank3(
    y: np.ndarray,
    window: int = DEFAULT_WINDOW,
    scale: float = DEFAULT_SCALE,
    min_obs: int = DEFAULT_MIN_OBS,
) -> dict[str, np.ndarray]:
    """Rank-3 trailing WLS: design ``[1, x, x^2]`` per target bucket.

    Completes the reference's 3-parameter normal-equations analog
    (``VNP43NRT_jl/src/VNP43NRT.jl:365-369`` — [iso, Kvol, Kgeo]) in the
    transcript domain: level (value at the target bucket), trend (first
    derivative at lag 0), curvature (second-order coefficient). Same
    exponential recency weights, same ``min_obs`` gate, same
    stack-into-a-matrix vectorization as :func:`wls_trailing`; the 3x3
    normal equations are solved in closed form (adjugate / det) so the
    whole thing stays one broadcast expression — no per-window Python.
    Verified against an independent ``np.linalg.lstsq`` oracle in tests.
    """
    y = np.atleast_2d(np.asarray(y, dtype=np.float64))
    n, T = y.shape
    pad = np.full((n, window - 1), np.nan)
    yp = np.concatenate([pad, y], axis=1)
    win = np.lib.stride_tricks.sliding_window_view(yp, window, axis=1)

    w_full = recency_weights(window, scale)
    x = np.arange(-(window - 1), 1, dtype=np.float64)
    x2 = x * x

    m = ~np.isnan(win)
    wv = np.where(m, w_full, 0.0)
    yv = np.where(m, win, 0.0)

    n_obs = m.sum(axis=2)
    s00 = wv.sum(axis=2)
    s01 = (wv * x).sum(axis=2)
    s02 = (wv * x2).sum(axis=2)
    s12 = (wv * x2 * x).sum(axis=2)
    s22 = (wv * x2 * x2).sum(axis=2)
    b0 = (wv * yv).sum(axis=2)
    b1 = (wv * x * yv).sum(axis=2)
    b2 = (wv * x2 * yv).sum(axis=2)

    with np.errstate(divide="ignore", invalid="ignore"):
        # symmetric cofactors of A = [[s00,s01,s02],[s01,s02,s12],
        # [s02,s12,s22]]; beta = adj(A) @ b / det
        c00 = s02 * s22 - s12 * s12
        c01 = -(s01 * s22 - s12 * s02)
        c02 = s01 * s12 - s02 * s02
        c11 = s00 * s22 - s02 * s02
        c12 = -(s00 * s12 - s01 * s02)
        c22 = s00 * s02 - s01 * s01
        det = s00 * c00 + s01 * c01 + s02 * c02
        beta0 = (c00 * b0 + c01 * b1 + c02 * b2) / det
        beta1 = (c01 * b0 + c11 * b1 + c12 * b2) / det
        beta2 = (c02 * b0 + c12 * b1 + c22 * b2) / det

        fit = (
            beta0[..., None]
            + beta1[..., None] * x
            + beta2[..., None] * x2
        )
        resid = yv - fit
        sse = (wv * resid * resid).sum(axis=2)
        ybar = b0 / s00
        sst = (wv * (yv - ybar[..., None]) ** 2 * m).sum(axis=2)
        r2 = 1.0 - sse / sst
        dof = n_obs - 3
        sigma2 = sse / np.where(dof > 0, dof, np.nan)
        se = np.sqrt(sigma2 * c11 / det)  # Var(beta1) = sigma2 * A^-1[1,1]

    gate = (n_obs >= min_obs) & np.isfinite(beta0)
    out = {}
    for name, arr in (
        ("level", beta0),
        ("trend", beta1),
        ("curv", beta2),
        ("se", se),
        ("r2", r2),
    ):
        out[name] = np.where(gate, arr, np.nan)
    out["n_obs"] = n_obs.astype(np.int64)
    return out
