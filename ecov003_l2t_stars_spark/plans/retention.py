"""Retention + downsample enforcement over tier tables.

The "retention" third of the engine (BASELINE.json north_star): each
tier keeps a bounded trailing window of buckets; expired fine-tier rows
are dropped only after the coarser tier covering them exists (downsample
before delete — the engine twin of the reference's cleanup pass, which
removes staged inputs only after the product is written,
``process_STARS_product.py:468-507``).

Default policy (configurable):

    1m  → 7 days      1h → 90 days     1d → 730 days     30d → forever

Physical strategy: expiry is one table-format ``delete_where`` per tier
(:mod:`plans.table_format`). The default parquet implementation removes
expired rows by a filtered dynamic-partition overwrite of ONLY the
conv_buckets that contain expired rows (aggregate pruning pass first — a
partition holding no expired data is never rewritten), plus explicit
removal of partitions left with zero kept rows. On Iceberg the same verb
is a metadata-level ``DELETE WHERE bucket_end <= cutoff`` — no data
rewrite; the contract is exercised against the snapshot-isolated
in-memory format in tests/test_table_format.py (an actual Iceberg
runtime still cannot run in this sandbox — no jar, no network).

Safety invariant (tested): a fine bucket is only expirable if the
covering coarse bucket is closed, i.e. cutoff_fine <= cutoff of what the
coarse tier retains. ``validate_policy`` rejects policies that would
drop data never downsampled.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecov003_l2t_stars_spark import TIER_SECONDS, TIERS

FOREVER = None


@dataclass
class RetentionPolicy:
    keep: dict = field(
        default_factory=lambda: {
            "1m": dt.timedelta(days=7),
            "1h": dt.timedelta(days=90),
            "1d": dt.timedelta(days=730),
            "30d": FOREVER,
        }
    )

    def cutoff(self, tier: str, as_of: dt.datetime) -> dt.datetime | None:
        k = self.keep.get(tier)
        return None if k is None else as_of - k

    def validate(self) -> None:
        """Coarser tiers must retain at least as long as finer ones —
        otherwise expiry would destroy data before downsampling covers it."""
        prev = None
        for tier in TIERS:
            k = self.keep.get(tier)
            if prev is not None and k is not None and k < prev:
                raise ValueError(
                    f"tier {tier} retains {k} < finer tier's {prev}: "
                    "coarse tiers must outlive the fine tiers they cover"
                )
            if k is not None:
                prev = k


def expired_row_filter(tier: str, cutoff: dt.datetime):
    return F.col("bucket_end") <= F.lit(cutoff).cast("timestamp")


def expired_segment_filter(
    tier: str, cutoff: dt.datetime, segment_buckets: int = 4096
):
    """A payload segment is expirable only when its WHOLE POSSIBLE span
    is past the cutoff (segments are aligned to absolute
    ``segment_buckets``-bucket boundaries, so segment_start + span is
    the latest bucket_end any point inside can have — a straddling
    segment is kept whole; per-point trimming would force a decode +
    re-encode for marginal savings)."""
    span = segment_buckets * TIER_SECONDS[tier]
    return (
        F.unix_seconds(F.col("segment_start").cast("timestamp")) + span
    ) <= F.unix_seconds(F.lit(cutoff).cast("timestamp"))


def enforce_retention(
    spark: SparkSession,
    output_dir: str,
    as_of: dt.datetime,
    policy: RetentionPolicy | None = None,
    fmt=None,
) -> dict[str, int]:
    """Drop expired rows per tier. Returns rows dropped per tier.

    Idempotent: re-running with the same as_of is a no-op.

    The expiry is the table-format DELETE WHERE verb
    (:meth:`plans.table_format.TableFormat.delete_where`): one predicate
    delete per tier. The default parquet format implements it as a
    pruned dynamic-partition overwrite plus explicit removal of
    fully-expired partition directories; an Iceberg-class format does
    the same as a single metadata delete (contract-tested against the
    in-memory snapshot format).
    """
    from ecov003_l2t_stars_spark.plans.table_format import ParquetFormat

    fmt = fmt or ParquetFormat()
    policy = policy or RetentionPolicy()
    policy.validate()
    dropped: dict[str, int] = {}
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    for tier in TIERS:
        cutoff = policy.cutoff(tier, as_of)
        if cutoff is None:
            dropped[tier] = 0
            continue
        dropped[tier] = fmt.delete_where(
            spark,
            str(Path(output_dir) / f"rollup_{tier}"),
            expired_row_filter(tier, cutoff),
            partition_col="conv_bucket",
        )
        # the pipeline's compressed payload twin expires under the same
        # policy (previously it accumulated forever); whole-span rule,
        # no-op 0 when the job was configured without payload tables
        dropped[f"payload_{tier}"] = fmt.delete_where(
            spark,
            str(Path(output_dir) / f"payload_{tier}"),
            expired_segment_filter(tier, cutoff),
            partition_col="conv_bucket",
        )
    return dropped


def compact_tier(
    spark: SparkSession, output_dir: str, tier: str,
    target_files_per_partition: int = 1,
) -> None:
    """Small-file compaction: rewrite each conv_bucket partition into
    ``target_files_per_partition`` sorted files (the maintenance job an
    Iceberg ``rewrite_data_files`` procedure runs; here explicit)."""
    path = str(Path(output_dir) / f"rollup_{tier}")
    df = spark.read.parquet(path)
    (
        df.repartition(target_files_per_partition, "conv_bucket")
        .sortWithinPartitions("conv_id", "bucket_start")
        .write.mode("overwrite")
        .partitionBy("conv_bucket")
        .parquet(path)
    )


def downsample_then_expire(
    spark: SparkSession,
    output_dir: str,
    fine_tier: str,
    coarse_tier: str,
    as_of: dt.datetime,
    policy: RetentionPolicy | None = None,
) -> DataFrame:
    """Audit helper: fine-tier rows about to expire that are NOT covered
    by an existing coarse bucket (must be empty before enforcement —
    left-anti, the watermark-check shape, SURVEY §2.3 J4)."""
    policy = policy or RetentionPolicy()
    cutoff = policy.cutoff(fine_tier, as_of)
    fine = spark.read.parquet(str(Path(output_dir) / f"rollup_{fine_tier}"))
    coarse = spark.read.parquet(str(Path(output_dir) / f"rollup_{coarse_tier}"))
    n = TIER_SECONDS[coarse_tier]
    expiring = fine.where(expired_row_filter(fine_tier, cutoff)).withColumn(
        "_coarse_bucket",
        F.timestamp_seconds(
            F.floor(F.unix_seconds("bucket_start") / n) * n
        ),
    )
    return expiring.join(
        coarse.select(
            "conv_id", F.col("bucket_start").alias("_coarse_bucket")
        ),
        ["conv_id", "_coarse_bucket"],
        "left_anti",
    )


def prune_state(
    spark: SparkSession,
    output_dir: str,
    keep_last: int = 1,
) -> int:
    """Bound the append-only ``rollup_state`` table: keep the newest
    ``keep_last`` rows per (conv_id, tier) — every RollupJob run appends
    posterior states, so without pruning the table grows by
    convs × runs forever. ``keep_last > 1`` retains rerun-of-day-N
    priors for formats without snapshot history (a snapshot-keeping
    format gets the same via ``read_as_of``; Iceberg analog: a
    rewrite-data-files maintenance pass). Returns rows removed.

    Rewrite is a whole-table overwrite behind a persist barrier (rule
    8: the plan reads the files it replaces); the table is per-conv
    metadata scale, not data scale.
    """
    from pyspark.sql import Window

    path = Path(output_dir) / "rollup_state"
    if not path.exists():
        return 0
    df = spark.read.parquet(str(path))
    w = Window.partitionBy("conv_id", "tier").orderBy(F.col("as_of").desc())
    kept = (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= keep_last)
        .drop("_rn")
        .persist()
    )
    n_before = df.count()
    n_after = kept.count()
    if n_after < n_before:
        kept.write.mode("overwrite").parquet(str(path))
    kept.unpersist()
    return n_before - n_after
