"""Incremental / late-data updates: conv-granular tier recomputation.

The reference re-runs a tile-date when late granules arrive (retry after
``AuxiliaryLatency``, ``L2T_STARS.py:356-388``) and advances its input
window from the previous product's date (W5 prior-aware range start,
``L2T_STARS.py:328-335``). The engine twin: raw batches are appended to
a raw area; an incremental update recomputes tiers ONLY for the
conversations present in the new batch and merges them into the tier
tables by overwriting just the affected conv_bucket partitions.

Correctness: per-conv statistics depend only on that conversation's
rows, so recomputing a conv from its full raw history (old ∪ new) and
replacing its tier rows is exactly equivalent to a full recompute —
property-tested in tests/test_late_data.py. Late rows inside the
watermark therefore repair closed buckets exactly; the streaming path
(watermark) drops them instead, and the batch MERGE is the repair
mechanism (SURVEY §2.9 T2 "late rows MERGE into open buckets").

Scale: cost is O(affected convs' history), not table size; the affected
partition set is discovered with one distinct() over the (small) new
batch. At 10^12 turns an update touching 0.01% of convs rewrites ~0.01%
of bucket partitions.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecov003_l2t_stars_spark.operators.rollup import (
    normalize,
    rollup_tier,
    with_latency,
)


class IncrementalRollup:
    """Raw-append + conv-granular tier refresh (parquet fallback layout).

    raw/        append-only batches of transcript rows
    rollup_<t>/ tier tables partitioned by conv_bucket
    """

    def __init__(self, spark: SparkSession, base_dir: str,
                 tiers: tuple[str, ...] = ("1m", "1h"),
                 n_buckets: int = 32) -> None:
        self.spark = spark
        self.base = Path(base_dir)
        self.tiers = tiers
        self.n_buckets = n_buckets
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    @property
    def raw_dir(self) -> str:
        return str(self.base / "raw")

    def _bucket_col(self):
        return F.pmod(F.xxhash64("conv_id"), F.lit(self.n_buckets)).cast("int")

    def ingest(self, batch: DataFrame) -> None:
        batch.write.mode("append").parquet(self.raw_dir)

    def refresh(self, batch: DataFrame) -> dict[str, int]:
        """Recompute tiers for the convs present in ``batch`` (which must
        already be ingested). Returns refreshed row counts per tier."""
        convs = batch.select("conv_id").distinct()
        raw = self.spark.read.parquet(self.raw_dir)
        affected = raw.join(F.broadcast(convs), "conv_id", "left_semi")
        affected = affected.repartition(self.n_buckets, "conv_id")
        lat = with_latency(normalize(affected)).persist()

        counts: dict[str, int] = {}
        for tier in self.tiers:
            tier_df = rollup_tier(lat, tier).withColumn(
                "conv_bucket", self._bucket_col()
            )
            path = str(self.base / f"rollup_{tier}")
            existing = None
            if (self.base / f"rollup_{tier}").exists():
                existing = self.spark.read.parquet(path)
            if existing is not None:
                # affected conv_buckets may hold unaffected convs too —
                # carry their existing rows into the partition overwrite
                buckets = [
                    r.conv_bucket
                    for r in tier_df.select("conv_bucket").distinct().collect()
                ]
                keep = existing.where(
                    F.col("conv_bucket").isin(buckets)
                ).join(F.broadcast(convs), "conv_id", "left_anti")
                out = keep.select(tier_df.columns).unionByName(tier_df)
            else:
                out = tier_df
            # materialize BEFORE the overwrite: the union's lineage reads
            # the very files the dynamic overwrite replaces (Iceberg's
            # snapshot isolation makes this safe natively; the parquet
            # fallback needs the explicit cache barrier)
            out = out.persist()
            counts[tier] = out.count()
            (
                out.repartition("conv_bucket")
                .sortWithinPartitions("conv_id", "bucket_start")
                .write.mode("overwrite")
                .partitionBy("conv_bucket")
                .parquet(path)
            )
            out.unpersist()
        lat.unpersist()
        return counts

    def update(self, batch: DataFrame) -> dict[str, int]:
        self.ingest(batch)
        return self.refresh(batch)

    def read_tier(self, tier: str) -> DataFrame:
        return self.spark.read.parquet(str(self.base / f"rollup_{tier}"))
