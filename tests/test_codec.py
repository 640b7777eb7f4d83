"""Codec round-trip property tests (encode∘decode = id, SURVEY §5.2)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ecov003_l2t_stars_spark.functions.codec import (
    _QNAN,
    decode_segment,
    encode_segment,
)


def _roundtrip(ts, vals):
    ts = np.asarray(ts, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float64)
    payload = encode_segment(ts, vals)
    ts2, vals2 = decode_segment(payload)
    assert np.array_equal(ts, ts2)
    # NaNs canonicalize; everything else is bit-exact
    b1 = vals.view(np.uint64).copy()
    b1[np.isnan(vals)] = np.uint64(_QNAN)
    assert np.array_equal(b1, vals2.view(np.uint64))
    return payload


def test_empty():
    p = encode_segment(np.array([], dtype=np.int64), np.array([]))
    ts, vals = decode_segment(p)
    assert ts.size == 0 and vals.size == 0


def test_single_point():
    _roundtrip([1735689600_000000], [3.14])


def test_regular_cadence_compresses():
    n = 1000
    ts = 1735689600_000000 + np.arange(n, dtype=np.int64) * 60_000_000
    vals = np.full(n, 42.0)
    p = _roundtrip(ts, vals)
    # constant cadence + constant value → pure control bits: 3 (ts
    # class code) + 2 (value code) per point in the section-wise
    # layout, plus fixed header/anchor sections and per-section padding
    assert len(p) < 12 + 8 * 6 + (5 * n) // 8 + 8


def test_nan_runs_and_specials():
    vals = [1.0, np.nan, np.nan, -0.0, np.inf, -np.inf, 5e-324, 1.7e308, np.nan]
    ts = np.cumsum(np.array([0, 1, 60, 60, 61, 59, 1000000, 1, 2], dtype=np.int64))
    _roundtrip(ts, vals)


def test_negative_and_unsorted_deltas():
    ts = np.array([100, 50, 200, 199, -5, 0], dtype=np.int64)  # codec is order-agnostic
    vals = np.array([1.0, 2.0, 2.0, 2.0000001, -3.5, 0.0])
    _roundtrip(ts, vals)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.floats(allow_nan=True, allow_infinity=True, width=64),
        ),
        min_size=0,
        max_size=80,
    )
)
def test_property_roundtrip(pairs):
    if pairs:
        ts, vals = zip(*pairs)
    else:
        ts, vals = [], []
    _roundtrip(list(ts), list(vals))


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_property_realistic_series(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 300))
    ts = np.cumsum(rng.integers(0, 10**7, size=n)).astype(np.int64)
    vals = rng.normal(size=n)
    vals[rng.random(n) < 0.2] = np.nan
    _roundtrip(ts, vals)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**60) + 1, max_value=2**60 - 1),
            st.floats(allow_nan=True, allow_infinity=True, width=64),
        ),
        min_size=3,
        max_size=120,
    )
)
def test_vectorized_encoder_byte_parity(pairs):
    """The vectorized fast path emits EXACTLY the scalar path's bytes
    (idempotent-write + CRC semantics depend on byte determinism)."""
    from ecov003_l2t_stars_spark.functions.codec import (
        _encode_fields_scalar,
        _encode_fields_vectorized,
    )

    ts, vals = zip(*pairs)
    ts = np.asarray(ts, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float64)
    assert _encode_fields_vectorized(ts, vals) == _encode_fields_scalar(
        ts, vals
    )


def test_escape_class_and_guard_fallback():
    """Timestamps beyond the 2^60 guard take the scalar path (Python-int
    arithmetic); dods beyond 2^36 use the 5+66-bit escape class on both
    paths — round-trips and byte-parity hold in each regime."""
    from ecov003_l2t_stars_spark.functions.codec import (
        _encode_fields_scalar,
        _encode_fields_vectorized,
    )

    # escape-class dods inside the guard
    ts = np.array([0, 1, 2**45, 2**45 + 1, 2**59], dtype=np.int64)
    vals = np.array([1.0, 2.0, 2.0, np.nan, -7.25])
    assert _encode_fields_vectorized(ts, vals) == _encode_fields_scalar(
        ts, vals
    )
    _roundtrip(ts, vals)
    # beyond the guard: encode_segment must still round-trip (scalar)
    ts2 = np.array([-(2**62), 2**62, -(2**61), 2**62 - 1], dtype=np.int64)
    _roundtrip(ts2, np.array([0.0, 1.0, 1.0, 2.0]))


def test_int64_min_routes_to_scalar_path():
    """np.abs(int64-min) wraps to int64-min — a wrap-free range guard
    must still route such inputs to the Python-int scalar encoder, and
    the round-trip must hold (the vectorized path would silently wrap
    np.diff/zigzag here)."""
    ts = np.array([-(2**63), -(2**63) + 7, -(2**63) + 9, 0], dtype=np.int64)
    vals = np.array([1.0, 2.0, 2.0, 3.5])
    _roundtrip(ts, vals)


def test_truncated_payload_raises():
    """Slice-based bit reads return zero bits past the buffer end — the
    decoder must detect truncation (ValueError), not emit garbage."""
    ts = np.arange(0, 64_000_000, 1_000_000, dtype=np.int64)
    vals = np.linspace(0.0, 6.3, ts.size)
    payload = encode_segment(ts, vals)
    with pytest.raises(ValueError, match="truncated"):
        decode_segment(payload[: len(payload) - 3])
    with pytest.raises(ValueError, match="truncated"):
        decode_segment(payload[:8])
    # corrupt header claiming a huge n must be rejected before any O(n)
    # allocation happens
    import struct as _struct

    magic = _struct.unpack(">I", payload[:4])[0]
    bogus = _struct.pack(">IQ", magic, 10**12) + payload[12:]
    with pytest.raises(ValueError, match="truncated"):
        decode_segment(bogus)
