"""Tier payload encoding: Gorilla segments as BinaryType columns.

Packages each conversation's tier series into compressed binary segments
(``(conv_id, tier, segment_start, n_points, payload)``), the engine's
storage analog of the reference's per-(variable, date, tile) GeoTIFF
layer files (``generate_filename.py:8-37`` — the filename schema IS the
reference's segment key). Encoding runs in ``applyInPandas`` over hash
buckets of conversations — one Python call per batch of many segments,
never per row.

``decode_payloads`` is the verification inverse: explodes segments back
into (conv_id, bucket_ts, value) rows for round-trip testing
(encode∘decode = id, SURVEY §5.2).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ecov003_l2t_stars_spark import TIER_SECONDS
from ecov003_l2t_stars_spark.functions.codec import decode_segment, encode_segment

SEGMENT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("tier", StringType()),
        StructField("segment_start", TimestampType()),
        StructField("n_points", LongType()),
        StructField("payload", BinaryType()),
        # integrity checksum (SURVEY §2.1 S11: the reference's POSIX
        # cksum manifest, cksum.py:9-66)
        StructField("crc32", LongType()),
    ]
)

POINT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("tier", StringType()),
        StructField("bucket_start", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def encode_payloads(
    tier_df: DataFrame,
    tier: str,
    value_col: str,
    segment_buckets: int = 4096,
    n_groups: int | None = None,
) -> DataFrame:
    """Compress (bucket_start, value) series into per-conv segments.

    ``segment_buckets`` bounds points per segment (and so decode memory);
    segment boundaries are aligned to absolute bucket index so re-runs
    produce identical segmentation (idempotent writes, mirrors the
    reference's keyed-artifact skip, ``VNP43NRT/VNP43NRT.py:390-397``).
    """
    spark = tier_df.sparkSession
    if n_groups is None:
        n_groups = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n = TIER_SECONDS[tier]
    seg_span = segment_buckets * n

    df = tier_df.select(
        F.col("conv_id").cast("string").alias("conv_id"),
        F.col("bucket_start"),
        F.col(value_col).cast("double").alias("_v"),
        (F.floor(F.unix_seconds("bucket_start") / seg_span) * seg_span).alias(
            "_seg"
        ),
        F.pmod(F.xxhash64(F.col("conv_id").cast("string")), F.lit(n_groups)).alias(
            "_grp"
        ),
    )

    def enc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["conv_id", "_seg", "bucket_start"], kind="mergesort")
        out = []
        ts_us_all = (
            pdf["bucket_start"].to_numpy().astype("datetime64[us]").view("int64")
        )
        vals_all = pdf["_v"].to_numpy(dtype=np.float64)
        keys = pdf[["conv_id", "_seg"]].to_records(index=False)
        bounds = np.flatnonzero(
            np.concatenate(([True], keys[1:] != keys[:-1], [True]))
        )
        for a, b in zip(bounds[:-1], bounds[1:]):
            payload = encode_segment(ts_us_all[a:b], vals_all[a:b])
            out.append(
                (
                    pdf["conv_id"].iat[a],
                    tier,
                    pd.Timestamp(int(pdf["_seg"].iat[a]), unit="s"),
                    b - a,
                    payload,
                    zlib.crc32(payload),
                )
            )
        return pd.DataFrame(
            out,
            columns=["conv_id", "tier", "segment_start", "n_points",
                     "payload", "crc32"],
        )

    return df.groupBy("_grp").applyInPandas(enc, SEGMENT_SCHEMA)


def decode_payloads(segments: DataFrame) -> DataFrame:
    """Explode segments back into (conv_id, tier, bucket_start, value)."""

    def dec(it):
        for pdf in it:
            frames = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload)
                if hasattr(r, "crc32") and zlib.crc32(payload) != r.crc32:
                    raise ValueError(
                        f"payload corruption: crc mismatch for "
                        f"{r.conv_id}/{r.tier}"
                    )
                ts_us, vals = decode_segment(payload)
                frames.append(
                    pd.DataFrame(
                        {
                            "conv_id": r.conv_id,
                            "tier": r.tier,
                            "bucket_start": ts_us.view("datetime64[us]"),
                            "value": vals,
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return segments.mapInPandas(dec, POINT_SCHEMA)
