"""Structured Streaming mode: incremental tier rollup + stateful smoothing.

The reference is an incremental daily pipeline in batch clothes
(SURVEY §2.9): it advances day-by-day, tolerates late granules up to
``VIIRS_GIVEUP_DAYS = 4`` (``constants.py:27``, enforced at
``generate_STARS_inputs.py:220-231``), and carries prior/posterior state
between runs (``load_prior.py``). This module is the same semantics on
``readStream``:

- tumbling-window aggregation per (conv_id, 1m window) with
  ``withWatermark(ts, '4 days')`` — the engine's allowed-lateness twin of
  the give-up constant; buckets finalize (append mode) once the watermark
  passes, late rows beyond it are dropped.
- streaming tiers carry the DECOMPOSABLE statistics (counts, sum, max).
  Exact percentiles are order statistics and do not stream; they are
  recomputed by the batch compaction pass (SURVEY §7.2 freeze), exactly
  as the reference recomputes products when late inputs arrive.
- per-conv Kalman state lives in ``applyInPandasWithState``: the same
  :mod:`functions.kalman` scalar kernel stepped incrementally, state =
  (x, b, pxx, pxb, pbb) — a superset of the batch ``rollup_state`` row
  (the cross-covariance never leaves the stream).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ecov003_l2t_stars_spark.functions.kalman import (
    DEFAULT_BIAS_MEAN,
    DEFAULT_BIAS_VAR,
    DEFAULT_PRIOR_MEAN,
    DEFAULT_PRIOR_VAR,
    KalmanParams,
)
from ecov003_l2t_stars_spark.operators.rollup import ROLES

WATERMARK = "4 days"


def streaming_rollup_1m(stream: DataFrame, watermark: str = WATERMARK) -> DataFrame:
    """Append-mode 1m tier of decomposable stats with allowed lateness."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.col("conv_id"), F.window("ts", "1 minute").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            *[
                F.count(F.when(F.col("role") == r, F.lit(1))).alias(f"n_{r}")
                for r in ROLES
            ],
            F.max(us).alias("last_turn_us"),
        )
        .select(
            "conv_id",
            F.col("w.start").alias("bucket_start"),
            F.col("w.end").alias("bucket_end"),
            "n_turns",
            *[f"n_{r}" for r in ROLES],
            "last_turn_us",
        )
    )


def streaming_sessions(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = WATERMARK,
) -> DataFrame:
    """Append-mode streaming sessionization via the state-store-backed
    native ``session_window``: sessions merge across micro-batches while
    open and finalize once the watermark passes their close (the
    streaming twin of ``operators.sessions.session_window_agg``, which
    tests cross-check against the gaps-and-islands batch construction).
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.col("conv_id"), F.session_window(F.col("ts"), gap))
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            "conv_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_turns",
        )
    )


STATE_SCHEMA = StructType(
    [
        StructField("x", DoubleType()),
        StructField("b", DoubleType()),
        StructField("pxx", DoubleType()),
        StructField("pxb", DoubleType()),
        StructField("pbb", DoubleType()),
        StructField("n_seen", LongType()),
        # state clock: unix micros of the newest processed observation;
        # later micro-batches drop rows at/behind it (the stateful twin
        # of the rollup path's watermark) so posteriors are never
        # conditioned out of time order
        StructField("last_ts_us", LongType()),
        StructField("n_late_dropped", LongType()),
    ]
)

SMOOTH_OUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("y", DoubleType()),
        StructField("smooth_mean", DoubleType()),
        StructField("smooth_sd", DoubleType()),
        StructField("smooth_bias", DoubleType()),
        StructField("smooth_bias_sd", DoubleType()),
    ]
)


def make_kalman_update(params: KalmanParams = KalmanParams()):
    """Stateful per-conv Kalman step for ``applyInPandasWithState``.

    Processes each micro-batch's observations for one conv in (ts) order,
    carrying the full 2x2 covariance in GroupState — the streaming twin
    of the batch filter (identical per-step arithmetic, including the
    ``clamp_lo/clamp_hi`` post-step of ``kalman_filter_scalar``).

    Out-of-order protection: the state carries the newest processed
    observation time; a row arriving in a later micro-batch with
    ``ts <= last_ts`` is DROPPED (counted in ``n_late_dropped``), never
    filtered against state that already advanced past it — mirroring the
    rollup path's watermark semantics, where a late row beyond the
    watermark is discarded rather than applied out of order."""
    import numpy as np

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        no_clock = -(1 << 62)  # sentinel: no observation processed yet
        if state.exists:
            x, b, pxx, pxb, pbb, n_seen, last_ts_us, n_late = state.get
        else:
            x, b = DEFAULT_PRIOR_MEAN, DEFAULT_BIAS_MEAN
            pxx, pxb, pbb = DEFAULT_PRIOR_VAR, 0.0, DEFAULT_BIAS_VAR
            n_seen = 0
            last_ts_us = no_clock
            n_late = 0

        frames = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts", kind="mergesort")
            if last_ts_us != no_clock:
                ts_us = (
                    pdf["ts"].astype("datetime64[us]").astype("int64")
                )
                fresh = (ts_us > last_ts_us).to_numpy()
                n_late += int((~fresh).sum())
                pdf = pdf[fresh]
            if len(pdf) == 0:
                continue
            ys = pdf["y"].to_numpy(dtype=np.float64)
            out = np.empty((len(ys), 4))
            for i, yv in enumerate(ys):
                pxx = pxx + params.q_level
                pbb = pbb + params.q_bias
                if not np.isnan(yv):
                    s = pxx + 2.0 * pxb + pbb + params.r_obs
                    kx = (pxx + pxb) / s
                    kb = (pxb + pbb) / s
                    v = yv - (x + b)
                    x = x + kx * v
                    b = b + kb * v
                    hp_x = pxx + pxb
                    hp_b = pxb + pbb
                    pxx = pxx - kx * hp_x
                    pxb = pxb - kx * hp_b
                    pbb = pbb - kb * hp_b
                if params.clamp_lo is not None:
                    x = max(x, params.clamp_lo)
                if params.clamp_hi is not None:
                    x = min(x, params.clamp_hi)
                out[i] = (x, np.sqrt(pxx), b, np.sqrt(pbb))
                n_seen += 1
            last_ts_us = int(
                pdf["ts"].astype("datetime64[us]").astype("int64").iloc[-1]
            )
            res = pdf[["conv_id", "ts", "y"]].copy()
            res["smooth_mean"] = out[:, 0]
            res["smooth_sd"] = out[:, 1]
            res["smooth_bias"] = out[:, 2]
            res["smooth_bias_sd"] = out[:, 3]
            frames.append(res)

        state.update((float(x), float(b), float(pxx), float(pxb),
                      float(pbb), int(n_seen), int(last_ts_us),
                      int(n_late)))
        yield from frames

    return update


def streaming_kalman(
    stream: DataFrame, params: KalmanParams = KalmanParams()
) -> DataFrame:
    """stream of (conv_id, ts, y) → smoothed stream with per-conv state."""
    return stream.groupBy("conv_id").applyInPandasWithState(
        make_kalman_update(params),
        outputStructType=SMOOTH_OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
