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
