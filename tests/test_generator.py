"""Transcript generator invariants (FIXTURES.md §1)."""

from __future__ import annotations

import numpy as np

from ecov003_l2t_stars_spark.sources.transcripts import GenSpec, generate_transcripts


def test_deterministic():
    a = generate_transcripts(GenSpec(n_convs=200))
    b = generate_transcripts(GenSpec(n_convs=200))
    assert a.equals(b)


def test_schema_and_invariants():
    df = generate_transcripts(GenSpec(n_convs=300))
    assert list(df.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert df["turn_idx"].dtype == np.int32

    d = df.drop_duplicates(["conv_id", "turn_idx"]).sort_values(
        ["conv_id", "turn_idx"]
    )
    g = d.groupby("conv_id")
    assert (g["turn_idx"].min() == 0).all()
    assert g["turn_idx"].apply(lambda s: (np.diff(s.values) == 1).all()).all()
    assert g["ts"].apply(lambda s: s.is_monotonic_increasing).all()

    assert set(df["role"].unique()) <= {"user", "assistant", "system", "tool"}
    assert df.loc[df.role != "tool", "tool"].isna().all()
    assert df.loc[df.role == "tool", "tool"].notna().all()


def test_duplicates_present():
    df = generate_transcripts(GenSpec(n_convs=300))
    n_dups = len(df) - len(df.drop_duplicates(["conv_id", "turn_idx"]))
    assert n_dups > 0
    # duplicates are exact row copies
    dup_keys = df[df.duplicated(["conv_id", "turn_idx"], keep=False)]
    per_key = dup_keys.groupby(["conv_id", "turn_idx"]).nunique()
    assert (per_key[["role", "text"]] <= 1).all().all()


def test_hot_conversations_skew():
    df = generate_transcripts(GenSpec(n_convs=3000))
    sizes = df.groupby("conv_id").size()
    assert sizes.max() > 50 * sizes.median()
