"""Incremental late-data MERGE equals full recompute (SURVEY §2.9 T2)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ecov003_l2t_stars_spark.operators.rollup import (
    normalize,
    rollup_tier,
    with_latency,
)
from ecov003_l2t_stars_spark.plans.late_data import IncrementalRollup
from ecov003_l2t_stars_spark.sources.transcripts import GenSpec, generate_transcripts


def _split_batches(pdf, late_frac=0.02, seed=7):
    """batch1 = most rows; batch2 = a late slice (older ts for some convs)
    plus genuinely new convs."""
    rng = np.random.default_rng(seed)
    late_mask = rng.random(len(pdf)) < late_frac
    return pdf[~late_mask], pdf[late_mask]


def _tier_pdf(df):
    return (
        df.drop("conv_bucket")
        .orderBy("conv_id", "bucket_start")
        .toPandas()
        .reset_index(drop=True)
    )


def test_incremental_equals_full(spark, tmp_path):
    pdf = generate_transcripts(GenSpec(n_convs=120))
    b1, b2 = _split_batches(pdf)
    sdf1 = spark.createDataFrame(b1)
    sdf2 = spark.createDataFrame(b2)

    inc = IncrementalRollup(spark, str(tmp_path / "inc"), tiers=("1m", "1h"),
                            n_buckets=4)
    inc.update(sdf1)
    inc.update(sdf2)  # late rows repair closed buckets

    full = spark.createDataFrame(pdf)
    for tier in ("1m", "1h"):
        exp = (
            rollup_tier(with_latency(normalize(full)), tier)
            .orderBy("conv_id", "bucket_start")
            .toPandas()
            .reset_index(drop=True)
        )
        got = _tier_pdf(inc.read_tier(tier))
        assert len(exp) == len(got), tier
        for c in exp.columns:
            e, g = exp[c].to_numpy(), got[c].to_numpy()
            if e.dtype.kind == "f":
                assert np.array_equal(e, g, equal_nan=True), (tier, c)
            else:
                assert (exp[c].isna() == got[c].isna()).all() and (
                    exp[c].dropna() == got[c].dropna()
                ).all(), (tier, c)


def test_unaffected_convs_untouched(spark, tmp_path):
    pdf = generate_transcripts(GenSpec(n_convs=60))
    sdf = spark.createDataFrame(pdf)
    inc = IncrementalRollup(spark, str(tmp_path / "inc2"), tiers=("1h",),
                            n_buckets=2)
    inc.update(sdf)
    before = _tier_pdf(inc.read_tier("1h"))

    # a batch touching one known conv only
    one = pdf[pdf.conv_id == pdf.conv_id.iloc[0]].head(1).copy()
    one["turn_idx"] = np.int32(999)
    one["turn_idx"] = one["turn_idx"].astype("int32")
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    inc.update(spark.createDataFrame(one, schema))
    after = _tier_pdf(inc.read_tier("1h"))

    touched = one["conv_id"].iloc[0]
    b = before[before.conv_id != touched].reset_index(drop=True)
    a = after[after.conv_id != touched].reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["n_turns"] == b["n_turns"]).all()
    assert after[after.conv_id == touched]["n_turns"].sum() == \
        before[before.conv_id == touched]["n_turns"].sum() + 1
