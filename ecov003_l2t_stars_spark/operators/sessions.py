"""Sessionization: inactivity-gap session windows per conversation.

Engine-new (SURVEY §2.9 T5 notes the reference has tumbling windows
only). Two equivalent implementations:

- :func:`sessionize` — batch, window-function form: a session break is
  ``gap > timeout``; session ids are the running sum of breaks (the
  classic gaps-and-islands construction, exactly reproducible in the
  DuckDB oracle).
- :func:`session_window_agg` — Spark's native ``session_window``
  (state-store backed in streaming); used for the streaming path and
  cross-checked against :func:`sessionize` in tests.

Scale: one shuffle on the series key; the running-sum window rides the
same hash(conv_id) partitioning as every other per-conv computation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str = "conv_id",
    ts: str = "ts",
    order_cols: tuple[str, ...] = ("turn_idx",),
    timeout_s: int = 1800,
) -> DataFrame:
    """Append ``session_id`` (0-based per key) via gaps-and-islands."""
    w = Window.partitionBy(key).orderBy(ts, *order_cols)
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    gap = (us - F.lag(us).over(w)).cast("double") / 1e6
    brk = F.when(gap > timeout_s, 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    df: DataFrame,
    key: str = "conv_id",
    ts: str = "ts",
    order_cols: tuple[str, ...] = ("turn_idx",),
    timeout_s: int = 1800,
) -> DataFrame:
    """Per-session aggregate: bounds, turn count, duration seconds."""
    s = sessionize(df, key, ts, order_cols, timeout_s)
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    return s.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min(us).alias("start_us"),
        F.max(us).alias("end_us"),
        ((F.max(us) - F.min(us)).cast("double") / F.lit(1e6)).alias(
            "duration_s"
        ),
    )


def session_window_agg(
    df: DataFrame,
    key: str = "conv_id",
    ts: str = "ts",
    timeout: str = "30 minutes",
) -> DataFrame:
    """Native session_window variant (streaming-capable shape)."""
    return (
        df.groupBy(F.col(key), F.session_window(F.col(ts), timeout))
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            key,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_turns",
        )
    )
