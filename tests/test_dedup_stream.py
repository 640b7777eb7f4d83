"""Streaming incremental near-dup: the foreachBatch sink over a file
stream equals the full-corpus batch recompute, and replayed batches
are idempotent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_streaming_near_dup_matches_batch_recompute(
    spark, docs, tmp_path
):
    """Two micro-batches through the foreachBatch sink emit exactly the
    full recompute's pair set (bit-equal jaccard)."""
    from ecov003_l2t_stars_spark.operators.dedup import minhash_lsh_dedup
    from ecov003_l2t_stars_spark.streaming.dedup_stream import (
        near_dup_sink,
        read_pairs,
    )

    in_dir = str(tmp_path / "in")
    state_dir = str(tmp_path / "state")
    # one file per micro-batch (maxFilesPerTrigger=1)
    docs.where(F.col("doc_id") % 3 != 0).coalesce(1).write.parquet(
        f"{in_dir}/b0"
    )
    docs.where(F.col("doc_id") % 3 == 0).coalesce(1).write.parquet(
        f"{in_dir}/b1"
    )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    q = (
        stream.writeStream
        .foreachBatch(near_dup_sink(spark, state_dir))
        .option("checkpointLocation", f"{state_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in read_pairs(spark, state_dir).collect()
    }
    full = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_lsh_dedup(docs).collect()
    }
    assert got == full and len(full) > 0

    # the signature store covers the whole corpus, one row set per batch
    store = spark.read.parquet(f"{state_dir}/sig_store")
    assert set(
        r["_batch_id"] for r in store.select("_batch_id").distinct().collect()
    ) == {0, 1}
    assert store.select("_id").distinct().count() == docs.where(
        F.col("text").isNotNull()
    ).count()

    # r6 (VERDICT r5 #4): the store's physical layout is clustered by
    # (band, _bhb) so the increment's touched-bucket predicate prunes at
    # scan planning — assert the directory scheme and that a
    # partition-column predicate lands in PartitionFilters, not as a
    # post-scan Filter over data columns.
    from pathlib import Path

    band_dirs = list(Path(state_dir, "sig_store").glob("band=*"))
    assert band_dirs, "store must be partitioned by band"
    assert list(band_dirs[0].glob("_bhb=*")), "store must bucket bh"
    pruned = store.where((F.col("band") == 0) & F.col("_bhb").isin([0, 1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "band" in plan


def test_replayed_batch_is_idempotent(spark, docs, tmp_path):
    """foreachBatch re-delivery: running the sink twice with the same
    batch_id leaves every table bit-identical (the _batch_id overwrite
    pattern), including when a later batch already exists."""
    from ecov003_l2t_stars_spark.streaming.dedup_stream import (
        near_dup_sink,
        read_pairs,
    )

    state_dir = str(tmp_path / "state2")
    sink = near_dup_sink(spark, state_dir)
    b0 = docs.where(F.col("doc_id") % 3 != 0)
    b1 = docs.where(F.col("doc_id") % 3 == 0)

    sink(b0, 0)
    sink(b1, 1)
    pairs_once = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in read_pairs(spark, state_dir).collect()
    }
    n_store = spark.read.parquet(f"{state_dir}/sig_store").count()

    sink(b1, 1)  # replay the last batch
    pairs_replay = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in read_pairs(spark, state_dir).collect()
    }
    assert pairs_replay == pairs_once
    assert spark.read.parquet(f"{state_dir}/sig_store").count() == n_store
