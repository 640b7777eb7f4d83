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
from ecov003_l2t_stars_spark.plans.table_format import (
    ParquetFormat,
    TableFormat,
)


class IncrementalRollup:
    """Raw-append + conv-granular tier refresh.

    raw/        append-only batches of transcript rows
    rollup_<t>/ tier tables partitioned by conv_bucket

    The repair is the table-format MERGE verb
    (:meth:`TableFormat.merge_replace_keys`): replace every affected
    conv's tier rows with the recompute from its full raw history.
    Default format is the parquet twin; the contract tests run this
    class against the snapshot-isolated in-memory format too.
    """

    def __init__(self, spark: SparkSession, base_dir: str,
                 tiers: tuple[str, ...] = ("1m", "1h"),
                 n_buckets: int = 32,
                 fmt: TableFormat | None = None) -> None:
        self.spark = spark
        self.base = Path(base_dir)
        self.tiers = tiers
        self.n_buckets = n_buckets
        self.fmt = fmt or ParquetFormat()
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    @property
    def raw_dir(self) -> str:
        return str(self.base / "raw")

    def _bucket_col(self):
        return F.pmod(F.xxhash64("conv_id"), F.lit(self.n_buckets)).cast("int")

    def ingest(self, batch: DataFrame) -> None:
        self.fmt.append(batch, self.raw_dir)

    def refresh(self, batch: DataFrame) -> dict[str, int]:
        """Recompute tiers for the convs present in ``batch`` (which must
        already be ingested). Returns refreshed row counts per tier.

        The write is one MERGE per tier: the format replaces the
        affected convs' rows and keeps everything else (carrying
        unaffected convs in shared partitions, with a persist barrier,
        is the PARQUET implementation's concern — an Iceberg-class
        format does it as a snapshot-isolated metadata MERGE).
        """
        convs = batch.select("conv_id").distinct()
        raw = self.fmt.read(self.spark, self.raw_dir)
        affected = raw.join(F.broadcast(convs), "conv_id", "left_semi")
        affected = affected.repartition(self.n_buckets, "conv_id")
        lat = with_latency(normalize(affected)).persist()

        counts: dict[str, int] = {}
        for tier in self.tiers:
            tier_df = rollup_tier(lat, tier).withColumn(
                "conv_bucket", self._bucket_col()
            )
            tier_df = tier_df.persist()
            counts[tier] = tier_df.count()
            self.fmt.merge_replace_keys(
                self.spark,
                str(self.base / f"rollup_{tier}"),
                tier_df,
                convs,
                key_col="conv_id",
                partition_col="conv_bucket",
                sort_cols=("conv_id", "bucket_start"),
            )
            tier_df.unpersist()
        lat.unpersist()
        return counts

    def update(self, batch: DataFrame) -> dict[str, int]:
        self.ingest(batch)
        return self.refresh(batch)

    def read_tier(self, tier: str) -> DataFrame:
        return self.fmt.read(self.spark, str(self.base / f"rollup_{tier}"))
