"""Trailing-window WLS: kernel vs scalar reimplementation, Spark parity."""

from __future__ import annotations

import numpy as np
import pytest

from ecov003_l2t_stars_spark.functions.wls import (
    recency_weights,
    wls_trailing,
)
from ecov003_l2t_stars_spark.operators.gapfill import gap_fill
from ecov003_l2t_stars_spark.operators.rollup import (
    normalize,
    rollup_tier,
    with_latency,
)
from ecov003_l2t_stars_spark.operators.wls import wls_tier
from ecov003_l2t_stars_spark.sources.transcripts import GenSpec, generate_transcripts


def _scalar_wls(y, window, scale, min_obs):
    """Independent per-window reimplementation with explicit np.polyfit-free
    normal equations (cross-check of the vectorized sliding-window path)."""
    T = y.size
    out = {k: np.full(T, np.nan) for k in ("trend", "level", "se", "r2")}
    out["n_obs"] = np.zeros(T, dtype=np.int64)
    w_full = recency_weights(window, scale)
    for t in range(T):
        lo = max(0, t - window + 1)
        seg = y[lo: t + 1]
        x = np.arange(-(len(seg) - 1), 1, dtype=np.float64)
        w = w_full[window - len(seg):]
        m = ~np.isnan(seg)
        n = int(m.sum())
        out["n_obs"][t] = n
        if n < min_obs:
            continue
        wv, xv, yv = w[m], x[m], seg[m]
        sw, sx, sxx = wv.sum(), (wv * xv).sum(), (wv * xv * xv).sum()
        sy, sxy = (wv * yv).sum(), (wv * xv * yv).sum()
        det = sw * sxx - sx * sx
        slope = (sw * sxy - sx * sy) / det
        inter = (sxx * sy - sx * sxy) / det
        resid = yv - (inter + slope * xv)
        sse = (wv * resid * resid).sum()
        ybar = sy / sw
        sst = (wv * (yv - ybar) ** 2).sum()
        dof = n - 2
        out["trend"][t] = slope
        out["level"][t] = inter
        out["r2"][t] = 1.0 - sse / sst
        out["se"][t] = np.sqrt(sse / dof * sw / det) if dof > 0 else np.nan
    return out


def test_rank3_kernel_vs_lstsq_oracle():
    """Rank-3 kernel (closed-form 3x3 adjugate solve) vs an independent
    np.linalg.lstsq oracle on the weighted design [1, x, x^2]."""
    from ecov003_l2t_stars_spark.functions.wls import wls_trailing_rank3

    rng = np.random.default_rng(3)
    T, window, scale, min_obs = 60, 16, 1.87, 7
    y = rng.normal(size=T) + 0.03 * np.arange(T) ** 1.5 / T
    y[rng.random(T) < 0.2] = np.nan

    res = wls_trailing_rank3(y, window=window, scale=scale, min_obs=min_obs)
    w_full = recency_weights(window, scale)
    for t in range(T):
        lo = max(0, t - window + 1)
        seg = y[lo: t + 1]
        x = np.arange(-(len(seg) - 1), 1, dtype=np.float64)
        w = w_full[window - len(seg):]
        m = ~np.isnan(seg)
        n = int(m.sum())
        assert res["n_obs"][0, t] == n
        if n < min_obs:
            assert np.isnan(res["level"][0, t])
            continue
        X = np.column_stack([np.ones(n), x[m], x[m] ** 2])
        sw = np.sqrt(w[m])
        beta, *_ = np.linalg.lstsq(X * sw[:, None], seg[m] * sw,
                                   rcond=None)
        assert np.allclose(res["level"][0, t], beta[0], rtol=1e-8)
        assert np.allclose(res["trend"][0, t], beta[1], rtol=1e-8)
        assert np.allclose(res["curv"][0, t], beta[2], rtol=1e-8)
        # se: sigma2 * (X'WX)^-1 [1,1]
        A = (X * w[m][:, None]).T @ X
        resid = seg[m] - X @ beta
        sse = (w[m] * resid * resid).sum()
        sigma2 = sse / (n - 3)
        se = np.sqrt(sigma2 * np.linalg.inv(A)[1, 1])
        assert np.allclose(res["se"][0, t], se, rtol=1e-6, equal_nan=True)


def test_spark_rank3_appends_curvature(spark):
    """design='rank3' through the Spark operator: wls_curv appears and
    matches the kernel run series-by-series."""
    from ecov003_l2t_stars_spark.functions.wls import wls_trailing_rank3

    pdf = generate_transcripts(GenSpec(n_convs=12))
    tier = rollup_tier(
        with_latency(normalize(spark.createDataFrame(pdf))), "1h"
    )
    filled = gap_fill(tier, "1h", value_cols=("latency_p50",))
    out = wls_tier(filled, "1h", signal_col="latency_p50",
                   design="rank3").orderBy("conv_id", "bucket_start")
    rows = out.select("conv_id", "latency_p50", "wls_level", "wls_trend",
                      "wls_curv", "wls_n").collect()
    assert len(rows) > 0
    by_conv: dict = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append(r)
    checked = 0
    for conv, rs in by_conv.items():
        y = np.array([
            np.nan if r.latency_p50 is None else r.latency_p50 for r in rs
        ])
        exp = wls_trailing_rank3(y)
        for i, r in enumerate(rs):
            got = np.array([
                np.nan if v is None else v
                for v in (r.wls_level, r.wls_trend, r.wls_curv)
            ])
            want = np.array([exp["level"][0, i], exp["trend"][0, i],
                             exp["curv"][0, i]])
            assert np.allclose(got, want, equal_nan=True), (conv, i)
            checked += 1
    assert checked > 20


def test_kernel_vs_scalar():
    rng = np.random.default_rng(3)
    y = rng.normal(10, 2, size=120)
    y[rng.random(120) < 0.25] = np.nan
    got = wls_trailing(y[None, :], window=16, scale=1.87, min_obs=7)
    exp = _scalar_wls(y, 16, 1.87, 7)
    for k in ("trend", "level", "r2", "se"):
        g, e = got[k][0], exp[k]
        assert np.allclose(g, e, rtol=1e-9, atol=1e-12, equal_nan=True), k
    assert np.array_equal(got["n_obs"][0], exp["n_obs"])


def test_kernel_recovers_linear_trend():
    t = np.arange(60, dtype=np.float64)
    y = 3.0 + 0.5 * t
    got = wls_trailing(y[None, :], window=16, min_obs=7)
    # once the window is fully inside the series the slope is exact
    assert np.allclose(got["trend"][0][20:], 0.5, atol=1e-9)
    assert np.allclose(got["level"][0][20:], y[20:], atol=1e-8)
    assert np.allclose(got["r2"][0][20:], 1.0, atol=1e-9)


def test_min_obs_gate():
    y = np.array([1.0, 2.0, 3.0, np.nan, np.nan, 4.0])
    got = wls_trailing(y[None, :], window=6, min_obs=4)
    assert np.isnan(got["trend"][0][:3]).all()  # fewer than 4 obs
    assert not np.isnan(got["trend"][0][5])


@pytest.fixture(scope="module")
def wls_out(spark):
    pdf = generate_transcripts(GenSpec(n_convs=80))
    sdf = spark.createDataFrame(pdf)
    tier = rollup_tier(with_latency(normalize(sdf)), "1h")
    filled = gap_fill(tier, "1h", ("latency_p50",), method="locf")
    return wls_tier(filled, "1h", window=8, min_obs=3, n_groups=4).toPandas()


def test_spark_wls_matches_kernel(wls_out):
    out = wls_out
    for conv, g in out.groupby("conv_id"):
        g = g.sort_values("bucket_start")
        y = np.where(
            g["n_latency"].to_numpy() > 0,
            g["latency_sum"].to_numpy(dtype=np.float64)
            / np.maximum(g["n_latency"].to_numpy(), 1),
            np.nan,
        )
        exp = wls_trailing(y[None, :], window=8, min_obs=3)
        assert np.array_equal(
            g["wls_trend"].to_numpy(), exp["trend"][0], equal_nan=True
        ), conv
        assert np.array_equal(
            g["wls_n"].to_numpy(), exp["n_obs"][0]
        ), conv
