"""Trailing-window WLS operator over dense tier series.

Spark face of :mod:`ecov003_l2t_stars_spark.functions.wls` — the engine's
analog of the reference's ``VNP43NRT`` sub-pipeline (17-day trailing
window of observations per pixel → WLS with exponential recency weights →
trend/uncertainty layers, ``VNP43NRT/VNP43NRT.py:344-567`` +
``VNP43NRT_jl/src/VNP43NRT.jl:310-394``). Used as a smoothing diagnostic:
appends trend/level/se/r2 columns for the chosen signal.

Same batching strategy as :mod:`smooth`: hash-bucket groups → one Arrow
batch carries many conversations → the kernel regresses
(series × target bucket) in one vectorized shot. Input must be dense per
conv (gap_fill first); missing buckets count as missing observations
inside the window, gated by ``min_obs`` (jl:345: ``nt < 7``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from ecov003_l2t_stars_spark import TIER_SECONDS
from ecov003_l2t_stars_spark.functions.wls import (
    DEFAULT_MIN_OBS,
    DEFAULT_SCALE,
    DEFAULT_WINDOW,
    wls_trailing,
)

WLS_COLS = ("wls_trend", "wls_level", "wls_se", "wls_r2")


def wls_tier(
    filled_df: DataFrame,
    tier: str,
    signal_col: str | None = None,
    window: int = DEFAULT_WINDOW,
    scale: float = DEFAULT_SCALE,
    min_obs: int = DEFAULT_MIN_OBS,
    n_groups: int | None = None,
) -> DataFrame:
    """Append wls_trend/level/se/r2 (+ wls_n) to a dense tier table."""
    spark = filled_df.sparkSession
    if n_groups is None:
        n_groups = int(spark.conf.get("spark.sql.shuffle.partitions"))

    df = filled_df
    if signal_col is None:
        df = df.withColumn(
            "_y",
            F.when(
                F.col("n_latency") > 0, F.col("latency_sum") / F.col("n_latency")
            ),
        )
    else:
        df = df.withColumn("_y", F.col(signal_col))

    from ecov003_l2t_stars_spark.operators.smooth import (
        _length_bands,
        _series_bounds,
    )

    df = df.withColumn(
        "_grp", F.pmod(F.xxhash64("conv_id"), F.lit(n_groups))
    ).withColumn(
        "_idx", (F.unix_seconds("bucket_start") / TIER_SECONDS[tier]).cast("long")
    )

    out_schema = StructType(
        [f for f in df.schema.fields if f.name != "_grp"]
        + [StructField(c, DoubleType()) for c in WLS_COLS]
        + [StructField("wls_n", LongType())]
    )
    in_cols = [f.name for f in df.schema.fields if f.name != "_grp"]

    def run_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["conv_id", "_idx"], kind="mergesort").reset_index(
            drop=True
        )
        starts, lengths = _series_bounds(pdf)
        yv = pdf["_y"].to_numpy(dtype=np.float64)

        flat_f = {c: np.empty(len(pdf)) for c in WLS_COLS}
        flat_n = np.empty(len(pdf), dtype=np.int64)
        # per-band dense matrices: one long series bounds only its own
        # band's padding (see smooth._length_bands)
        for band in _length_bands(lengths):
            bl = lengths[band]
            nb, tmax = len(band), int(bl.max())
            col_idx = np.concatenate([np.arange(k) for k in bl])
            row_idx = np.repeat(np.arange(nb), bl)
            flat_pos = np.concatenate(
                [np.arange(starts[s], starts[s] + lengths[s]) for s in band]
            )
            y = np.full((nb, tmax), np.nan)
            y[row_idx, col_idx] = yv[flat_pos]
            res = wls_trailing(y, window=window, scale=scale,
                               min_obs=min_obs)
            flat_f["wls_trend"][flat_pos] = res["trend"][row_idx, col_idx]
            flat_f["wls_level"][flat_pos] = res["level"][row_idx, col_idx]
            flat_f["wls_se"][flat_pos] = res["se"][row_idx, col_idx]
            flat_f["wls_r2"][flat_pos] = res["r2"][row_idx, col_idx]
            flat_n[flat_pos] = res["n_obs"][row_idx, col_idx]

        out = pdf[in_cols].copy()
        for c in WLS_COLS:
            out[c] = flat_f[c]
        out["wls_n"] = flat_n
        return out

    return (
        df.groupBy("_grp")
        .applyInPandas(run_batch, out_schema)
        .drop("_idx", "_y")
    )
