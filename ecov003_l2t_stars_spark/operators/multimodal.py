"""Multimodal column plumbing: binary payloads + typed metadata.

Treats image/audio/video as opaque ``binary`` columns with a typed
metadata struct, processed by Arrow-batched ``mapInPandas`` stages. The
Spark-side plumbing (schema, batching, partition sizing, UDF signatures)
is real and tested. Decode comes in two flavors behind one seam:

- :func:`media_decoder` — REAL decoders for the formats parseable with
  stdlib + NumPy alone: binary PPM images (decode + nearest-neighbor
  :func:`resize_images` + re-encode) and PCM-16 WAV audio. Exercised
  end-to-end through ``extract_features`` in tests.
- :func:`_decode_stub` — deterministic fake for formats that need
  external libraries (PNG/JPEG/MP3/MP4: PIL/librosa/ffmpeg are absent
  in this container); a real deployment passes its own callable and no
  Spark plumbing changes. Video decode raises where an ffmpeg-class
  container parser would plug in.

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


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8 array. Pure bytes + NumPy —
    no image library needed; tolerant of ``#`` comments in the header."""
    tokens: list[bytes] = []
    i = 0
    n = len(payload)
    while len(tokens) < 4 and i < n:
        c = payload[i:i + 1]
        if c == b"#":
            while i < n and payload[i:i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not payload[j:j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    if len(tokens) < 4 or tokens[0] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    i += 1  # single whitespace after maxval
    data = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=i)
    return data.reshape(h, w, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM-16 WAV → (float64 samples in [-1, 1), sample_rate).

    stdlib ``wave`` + NumPy; channels are averaged to mono."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        n_ch = f.getnchannels()
        rate = f.getframerate()
        raw = f.readframes(f.getnframes())
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, rate


def _segment_stats(x: np.ndarray, dim: int, rms: bool) -> np.ndarray:
    """dim equal segments → per-segment mean (or RMS); pads short input."""
    if x.size == 0:
        return np.zeros(dim, dtype=np.float32)
    pad = (-x.size) % dim
    if pad:
        x = np.concatenate([x, np.zeros(pad, dtype=x.dtype)])
    seg = x.reshape(dim, -1)
    if rms:
        out = np.sqrt((seg * seg).mean(axis=1))
    else:
        out = seg.mean(axis=1)
    return out.astype(np.float32)


def media_decoder(payload: bytes, kind: str, dim: int = 16) -> np.ndarray:
    """REAL decoder for the formats this sandbox can parse without
    external libraries: binary PPM images and PCM-16 WAV audio.

    - image: PPM → grayscale (channel mean) → ``dim`` segment means / 255
    - audio: WAV → mono samples → ``dim`` per-segment RMS values

    Video needs a container parser (ffmpeg-class) — not available here,
    so it raises exactly where a real deployment plugs one in. This is
    the non-stub path through the same ``extract_features`` seam the
    deterministic ``_decode_stub`` exercises.
    """
    if kind == "image":
        img = decode_ppm(bytes(payload)).astype(np.float64)
        gray = img.mean(axis=2).ravel() / 255.0
        return _segment_stats(gray, dim, rms=False)
    if kind == "audio":
        x, _ = decode_wav_pcm16(bytes(payload))
        return _segment_stats(x, dim, rms=True)
    raise NotImplementedError(
        f"no in-sandbox decoder for media kind {kind!r} (video needs ffmpeg)"
    )


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL image resize stage: PPM decode → nearest-neighbor resample →
    PPM re-encode, as a mapInPandas stage over the media schema.
    Non-image rows pass through untouched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = pdf.copy()
            for i, r in enumerate(pdf.itertuples(index=False)):
                if r.kind != "image":
                    continue
                img = decode_ppm(bytes(r.payload))
                h, w, _ = img.shape
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                resized = img[yi[:, None], xi[None, :]]
                out_rows.iat[i, out_rows.columns.get_loc("payload")] = (
                    encode_ppm(resized)
                )
                out_rows.iat[i, out_rows.columns.get_loc("width")] = out_w
                out_rows.iat[i, out_rows.columns.get_loc("height")] = out_h
            yield out_rows

    return media.mapInPandas(run, MEDIA_SCHEMA)


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


def synthetic_real_media(spark, n: int = 24, seed: int = 42) -> DataFrame:
    """Media table whose payloads the REAL :func:`media_decoder` can
    parse: random-noise PPM images and sine-wave PCM-16 WAVs."""
    import io
    import wave

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        if i % 2 == 0:
            h = int(rng.integers(8, 64))
            w = int(rng.integers(8, 64))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            rows.append(
                (i, "image", encode_ppm(img), "image/x-portable-pixmap",
                 w, h, None)
            )
        else:
            rate = 8000
            secs = float(rng.uniform(0.1, 0.5))
            t = np.arange(int(rate * secs)) / rate
            freq = float(rng.uniform(100, 1000))
            x = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
            buf = io.BytesIO()
            with wave.open(buf, "wb") as f:
                f.setnchannels(1)
                f.setsampwidth(2)
                f.setframerate(rate)
                f.writeframes(x.tobytes())
            rows.append(
                (i, "audio", buf.getvalue(), "audio/wav", None, None,
                 int(secs * 1000))
            )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


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
