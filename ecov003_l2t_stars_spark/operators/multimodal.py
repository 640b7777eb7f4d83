"""Multimodal column plumbing: binary payloads + typed metadata.

Treats image/audio/video as opaque ``binary`` columns with a typed
metadata struct, processed by Arrow-batched ``mapInPandas`` stages. The
Spark-side plumbing (schema, batching, partition sizing, UDF signatures)
is real and tested; the actual media decode is STUBBED — the container
has no image/audio libraries — behind :func:`_decode_stub`, which is
deterministic so tests can assert end-to-end behavior.

Scale notes: media rows are wide (payload bytes dominate); stages use
``mapInPandas`` (streaming iterator — bounded memory per batch, no
group-wide materialization) and a bytes-budgeted repartition helper so a
task never holds more than ``target_mb`` of payload at once.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def _decode_stub(payload: bytes, kind: str, dim: int = 16) -> np.ndarray:
    """Deterministic fake decode/feature-extract.

    A real deployment swaps this for PIL/librosa/ffmpeg; everything
    around it (Arrow batching, schemas, partitioning) is unchanged. It
    raises for unknown kinds, exactly where a real decoder would.
    """
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for media kind {kind!r}")
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4],
                        dtype=np.uint32)
    return (raw.astype(np.float64) / np.float64(2**32)).astype(np.float32)


def extract_features(
    media: DataFrame, dim: int = 16, decoder=None
) -> DataFrame:
    """binary payload → fixed-dim feature vector (mapInPandas).

    ``decoder(payload: bytes, kind: str, dim: int) -> np.ndarray`` is the
    pluggable decode seam: default is the deterministic stub; a real
    deployment passes a PIL/librosa/ffmpeg-backed callable and every line
    of Spark plumbing (schema, Arrow batching, partitioning) is unchanged
    — seam-tested in tests/test_multimodal.py.
    """
    decoder = decoder or _decode_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            feats = [
                decoder(bytes(p), k, dim)
                for p, k in zip(payloads, pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256": [
                        hashlib.sha256(bytes(p)).hexdigest() for p in payloads
                    ],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """video → frame rows (UDTF-style explode inside mapInPandas).

    Frame decode is stubbed as byte-slicing; the row-explosion shape,
    schema, and per-batch memory behavior are the real thing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "frame_idx": [],
                                    "frame_payload": []}
            for r in pdf.itertuples(index=False):
                if r.kind != "video":
                    continue
                n_frames = max(int((r.duration_ms or 0) // every_ms), 1)
                payload = bytes(r.payload)
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    out["media_id"].append(r.media_id)
                    out["frame_idx"].append(i)
                    out["frame_payload"].append(
                        payload[i * step: (i + 1) * step]
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FRAME_SCHEMA)


def repartition_by_bytes(
    media: DataFrame, target_mb: int = 128, avg_row_bytes: int | None = None
) -> DataFrame:
    """Size partitions by payload bytes, not row count (wide-row tables
    break rows-per-partition heuristics at 100 TB)."""
    total = media.agg(
        F.sum(F.length("payload")).alias("b")
    ).collect()[0]["b"] or 0
    n = max(int(total / (target_mb * 1024 * 1024)) + 1, 1)
    return media.repartition(n)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(64, 4096))
        payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav",
                 "video": "video/mp4"}[kind],
                int(rng.integers(16, 512)) if kind == "image" else None,
                int(rng.integers(16, 512)) if kind == "image" else None,
                int(rng.integers(1000, 10000)) if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
