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
        _series_bounds,
        _with_length_bucket,
    )

    df = (
        df.withColumn("_grp", F.pmod(F.xxhash64("conv_id"), F.lit(n_groups)))
        .withColumn(
            "_idx",
            (F.unix_seconds("bucket_start") / TIER_SECONDS[tier]).cast("long"),
        )
        .transform(_with_length_bucket)
    )

    _aux = ("_grp", "_lenb")
    out_schema = StructType(
        [f for f in df.schema.fields if f.name not in _aux]
        + [StructField(c, DoubleType()) for c in WLS_COLS]
        + [StructField("wls_n", LongType())]
    )
    in_cols = [f.name for f in df.schema.fields if f.name not in _aux]

    def run_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["conv_id", "_idx"], kind="mergesort").reset_index(
            drop=True
        )
        starts, lengths = _series_bounds(pdf)
        n, tmax = len(starts), int(lengths.max())

        y = np.full((n, tmax), np.nan)
        col_idx = np.concatenate([np.arange(k) for k in lengths])
        row_idx = np.repeat(np.arange(n), lengths)
        y[row_idx, col_idx] = pdf["_y"].to_numpy(dtype=np.float64)

        res = wls_trailing(y, window=window, scale=scale, min_obs=min_obs)
        out = pdf[in_cols].copy()
        out["wls_trend"] = res["trend"][row_idx, col_idx]
        out["wls_level"] = res["level"][row_idx, col_idx]
        out["wls_se"] = res["se"][row_idx, col_idx]
        out["wls_r2"] = res["r2"][row_idx, col_idx]
        out["wls_n"] = res["n_obs"][row_idx, col_idx]
        return out

    return (
        df.groupBy("_grp", "_lenb")
        .applyInPandas(run_batch, out_schema)
        .drop("_idx", "_y")
    )
