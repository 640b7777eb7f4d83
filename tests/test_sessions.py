"""Sessionization: gaps-and-islands vs native session_window equivalence."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ecov003_l2t_stars_spark.operators.sessions import (
    session_stats,
    session_window_agg,
    sessionize,
)
from ecov003_l2t_stars_spark.sources.transcripts import GenSpec, generate_transcripts

T0 = dt.datetime(2025, 1, 1)


def test_golden_sessions(spark):
    rows = [
        ("S", 0, T0),
        ("S", 1, T0 + dt.timedelta(minutes=5)),
        ("S", 2, T0 + dt.timedelta(minutes=50)),   # 45-min gap → new session
        ("S", 3, T0 + dt.timedelta(minutes=55)),
        ("T", 0, T0),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")
    out = {(r.conv_id, r.turn_idx): r.session_id
           for r in sessionize(df, timeout_s=1800).collect()}
    assert out[("S", 0)] == 0 and out[("S", 1)] == 0
    assert out[("S", 2)] == 1 and out[("S", 3)] == 1
    assert out[("T", 0)] == 0

    stats = {(r.conv_id, r.session_id): r
             for r in session_stats(df, timeout_s=1800).collect()}
    assert stats[("S", 0)].n_turns == 2
    assert stats[("S", 1)].duration_s == 300.0


def test_matches_native_session_window(spark):
    pdf = generate_transcripts(GenSpec(n_convs=150))
    df = spark.createDataFrame(pdf).dropDuplicates(["conv_id", "turn_idx"])
    ours = session_stats(df, timeout_s=1800)
    native = session_window_agg(df, timeout="30 minutes")
    # same session partitioning: identical (conv, n_turns, start) multisets
    a = ours.select(
        "conv_id", "n_turns",
        F.timestamp_micros(F.col("start_us")).alias("session_start"),
    )
    b = native.select("conv_id", "n_turns", "session_start")
    assert a.count() == b.count()
    assert a.join(b, ["conv_id", "n_turns", "session_start"], "left_anti").count() == 0
