"""Spark-side payload round-trip: encode tier → decode → identical points."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ecov003_l2t_stars_spark.operators.payload import (
    decode_payloads,
    encode_payloads,
)
from ecov003_l2t_stars_spark.operators.rollup import (
    normalize,
    rollup_tier,
    with_latency,
)
from ecov003_l2t_stars_spark.sources.transcripts import GenSpec, generate_transcripts


def test_roundtrip_on_tier(spark):
    pdf = generate_transcripts(GenSpec(n_convs=150))
    sdf = spark.createDataFrame(pdf)
    tier = rollup_tier(with_latency(normalize(sdf)), "1m")

    segs = encode_payloads(tier, "1m", "latency_sum", segment_buckets=256,
                           n_groups=4)
    pts = decode_payloads(segs).toPandas()

    exp = tier.select(
        "conv_id", "bucket_start",
        F.col("latency_sum").cast("double").alias("value"),
    ).toPandas()

    key = ["conv_id", "bucket_start"]
    m = exp.merge(pts[key + ["value"]], on=key, how="outer", indicator=True,
                  suffixes=("_e", "_g"))
    assert (m["_merge"] == "both").all()
    e = m["value_e"].to_numpy(dtype=np.float64)
    g = m["value_g"].to_numpy(dtype=np.float64)
    both_nan = np.isnan(e) & np.isnan(g)
    assert np.all(both_nan | (e == g))

    # segment sizes respect the bound and sum to the row count
    seg_pdf = segs.toPandas()
    assert (seg_pdf["n_points"] <= 256).all()
    assert seg_pdf["n_points"].sum() == len(exp)


def test_crc_detects_corruption(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    t0 = dt.datetime(2025, 1, 1)
    rows = [("C", t0 + dt.timedelta(minutes=i), float(i)) for i in range(50)]
    tier = spark.createDataFrame(
        rows, "conv_id string, bucket_start timestamp, v double"
    )
    segs = encode_payloads(tier, "1m", "v", n_groups=2)
    # valid round-trip passes
    assert decode_payloads(segs).count() == 50
    # flip a payload byte → decode must fail loudly
    corrupted = segs.withColumn(
        "payload",
        F.concat(
            F.expr("substring(payload, 1, length(payload) - 1)"),
            F.lit(bytes([0xFF])),
        ),
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="crc|corruption|Py4J"):
        decode_payloads(corrupted).collect()


def test_compression_ratio(spark):
    """Regular minute-cadence series should compress well below raw width."""
    import datetime as dt

    t0 = dt.datetime(2025, 1, 1)
    rows = [("Z", t0 + dt.timedelta(minutes=i), 42.0) for i in range(2000)]
    tier = spark.createDataFrame(
        rows, "conv_id string, bucket_start timestamp, v double"
    )
    segs = encode_payloads(tier, "1m", "v", segment_buckets=4096, n_groups=2)
    total = segs.agg(F.sum(F.length("payload"))).collect()[0][0]
    raw = 2000 * 16  # int64 ts + float64 value
    assert total < raw / 10
