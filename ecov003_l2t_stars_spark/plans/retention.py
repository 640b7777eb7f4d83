"""Retention + downsample enforcement over tier tables.

The "retention" third of the engine (BASELINE.json north_star): each
tier keeps a bounded trailing window of buckets; expired fine-tier rows
are dropped only after the coarser tier covering them exists (downsample
before delete — the engine twin of the reference's cleanup pass, which
removes staged inputs only after the product is written,
``process_STARS_product.py:468-507``).

Default policy (configurable):

    1m  → 7 days      1h → 90 days     1d → 730 days     30d → forever

Physical strategy in the parquet fallback: expired rows are removed by a
filtered dynamic-partition overwrite of ONLY the conv_buckets that
contain expired rows (computed by an aggregate pruning pass first — a
partition holding no expired data is never rewritten), plus explicit
removal of partitions left with zero kept rows. On Iceberg the same
operation would be a metadata-level ``DELETE WHERE bucket_end <= cutoff``
against a ``days(bucket_start)`` partition spec — no data rewrite — but
this is a DESIGN claim, not yet exercised: the sandbox has no Iceberg
runtime jar (see pipeline.py module docstring).

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


def _has_parquet(path: Path) -> bool:
    """True if the tier directory holds at least one data file (a fully
    expired tier leaves an empty/metadata-only dir that Spark cannot
    infer a schema from)."""
    return any(path.rglob("*.parquet"))


def enforce_retention(
    spark: SparkSession,
    output_dir: str,
    as_of: dt.datetime,
    policy: RetentionPolicy | None = None,
) -> dict[str, int]:
    """Drop expired rows per tier. Returns rows dropped per tier.

    Idempotent: re-running with the same as_of is a no-op.

    Dynamic-partition overwrite only replaces partitions PRESENT in the
    written output, so a conv_bucket whose rows are all expired would
    never be rewritten and its rows would silently survive. Those
    partitions are removed explicitly after the overwrite, and the
    dropped count reflects what was actually removed (on Iceberg the
    whole pass is a single metadata DELETE and this bookkeeping
    disappears).
    """
    import shutil

    policy = policy or RetentionPolicy()
    policy.validate()
    dropped: dict[str, int] = {}
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    for tier in TIERS:
        cutoff = policy.cutoff(tier, as_of)
        path = Path(output_dir) / f"rollup_{tier}"
        if cutoff is None or not path.exists() or not _has_parquet(path):
            dropped[tier] = 0
            continue
        df = spark.read.parquet(str(path))
        expired = expired_row_filter(tier, cutoff)

        # pruning pass: only conv_buckets that actually hold expired rows
        affected = [
            r.conv_bucket
            for r in df.where(expired)
            .select("conv_bucket")
            .distinct()
            .collect()
        ]
        if not affected:
            dropped[tier] = 0
            continue
        n_before = df.where(F.col("conv_bucket").isin(affected)).count()
        # persist barrier: `kept` reads the same files the overwrite
        # replaces (CLAUDE.md rule 8) and is consulted again afterwards
        kept = (
            df.where(F.col("conv_bucket").isin(affected))
            .where(~expired)
            .persist()
        )
        n_after = kept.count()
        kept_buckets = {
            r.conv_bucket
            for r in kept.select("conv_bucket").distinct().collect()
        }
        if n_after > 0:
            (
                kept.write.mode("overwrite")
                .partitionBy("conv_bucket")
                .parquet(str(path))
            )
        kept.unpersist()
        # fully expired partitions: not present in `kept`, so the dynamic
        # overwrite left them untouched — remove their directories
        for b in affected:
            if b not in kept_buckets:
                d = path / f"conv_bucket={b}"
                if d.exists():
                    shutil.rmtree(d)
        dropped[tier] = n_before - n_after
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
