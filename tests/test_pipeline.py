"""End-to-end job + kill/resume identity (SURVEY §5.2 resume tests)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ecov003_l2t_stars_spark.plans.pipeline import (
    RollupConfig,
    RollupJob,
    read_tier,
)
from ecov003_l2t_stars_spark.sources.transcripts import (
    GenSpec,
    write_transcripts_parquet,
)


@pytest.fixture(scope="module")
def input_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("in") / "transcripts.parquet"
    write_transcripts_parquet(str(p), GenSpec(n_convs=200))
    return str(p)


def _collect_sorted(spark, out_dir, tier):
    df = read_tier(spark, out_dir, tier).drop("conv_bucket")
    return (
        df.orderBy("conv_id", "bucket_start")
        .toPandas()
        .reset_index(drop=True)
    )


def test_full_run_and_resume_identity(spark, input_path, tmp_path_factory):
    out_a = str(tmp_path_factory.mktemp("out_a"))
    out_b = str(tmp_path_factory.mktemp("out_b"))

    cfg_a = RollupConfig(input_path, out_a, n_buckets=8, tiers=("1m", "1h"),
                         smooth_tiers=("1h",), job_id="jobA")
    m = RollupJob(spark, cfg_a).run()
    assert m["buckets_processed"] == 8 and m["rows_processed"] > 0

    # simulated crash: process 3 buckets, "die", resume
    cfg_b = RollupConfig(input_path, out_b, n_buckets=8, tiers=("1m", "1h"),
                         smooth_tiers=("1h",), job_id="jobB")
    job_b = RollupJob(spark, cfg_b)
    m1 = job_b.run(max_buckets=3)
    assert m1["buckets_processed"] == 3
    assert job_b.completed_buckets() == set(range(3)) or len(
        job_b.completed_buckets()
    ) == 3
    m2 = job_b.run()
    assert m2["buckets_processed"] == 5
    # idempotence: nothing left
    assert job_b.run()["buckets_processed"] == 0

    for tier in ("1m", "1h"):
        a = _collect_sorted(spark, out_a, tier)
        b = _collect_sorted(spark, out_b, tier)
        assert list(a.columns) == list(b.columns)
        assert len(a) == len(b)
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if av.dtype.kind == "f":
                assert np.array_equal(av, bv, equal_nan=True), (tier, c)
            else:
                assert (
                    (a[c].isna() == b[c].isna()).all()
                    and (a[c].dropna() == b[c].dropna()).all()
                ), (tier, c)


def test_checkpoint_lineage(spark, input_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out_c"))
    cfg = RollupConfig(input_path, out, n_buckets=4, tiers=("1h",),
                       smooth_tiers=(), job_id="jobC")
    RollupJob(spark, cfg).run()
    ck = spark.read.parquet(f"{out}/checkpoints")
    rows = ck.collect()
    assert len(rows) == 4
    assert all(r.input_snapshot == input_path for r in rows)
    assert all(r.rows_processed > 0 for r in rows)
    # rows_processed sums to the deduped row count
    raw = spark.read.parquet(input_path).dropDuplicates(["conv_id", "turn_idx"])
    assert sum(r.rows_processed for r in rows) == raw.count()


def test_smoothed_tier_written(spark, input_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out_d"))
    cfg = RollupConfig(input_path, out, n_buckets=4, tiers=("1h",),
                       smooth_tiers=("1h",), job_id="jobD")
    RollupJob(spark, cfg).run()
    t = read_tier(spark, out, "1h")
    assert "smooth_mean" in t.columns
    assert t.where(F.col("smooth_mean").isNull()).count() == 0
    state = spark.read.parquet(f"{out}/rollup_state")
    assert state.count() == t.select("conv_id").distinct().count()
    segs = spark.read.parquet(f"{out}/payload_1h")
    assert segs.agg(F.sum("n_points")).collect()[0][0] == t.where(
        ~F.col("gap_filled")
    ).count()
