"""Gorilla-style segment codec: delta-of-delta timestamps + XOR floats.

Engine-new component (SURVEY §2.10: the reference persists float32
GeoTIFF layers with external compression; a 10^12-turn tier store needs
in-payload compression). Implements the scheme from Pelkonen et al.,
"Gorilla: A Fast, Scalable, In-Memory Time Series Database" (VLDB 2015):

- timestamps (int64 epoch-micros): header stores t0 and the first delta
  verbatim; subsequent points store the delta-of-delta in variable-width
  classes ``0 | 10+14b | 110+20b | 1110+28b | 11110+36b | 11111+64b``
  (widened vs the paper's seconds-resolution classes to suit micros).
- values (float64 bit patterns): XOR with the previous value;
  ``0`` = identical; ``10`` = meaningful bits fit the previous
  leading/length window; ``11`` + 6-bit leading-zero count + 6-bit
  significant-bit length + bits.
- NaNs are canonicalized to the quiet-NaN pattern 0x7ff8000000000000
  before encoding so round-trips are bit-stable (SURVEY §7.2).

Pure-Python bit I/O over int accumulators; invoked only inside
Arrow-batched UDFs at segment granularity (encode once per
(conv, tier, segment)), never per Spark row.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = 0x47524C41  # "GRLA"
_QNAN = 0x7FF8000000000000

# delta-of-delta classes: (prefix_bits, prefix_len, payload_bits)
_DOD_CLASSES = (
    (0b10, 2, 14),
    (0b110, 3, 20),
    (0b1110, 4, 28),
    (0b11110, 5, 36),
)


class _BitWriter:
    """MSB-first bit appender that flushes completed bytes eagerly.

    The accumulator never grows past ``nbits_in_flight + 66`` bits: a
    single ever-growing int accumulator makes each ``write`` shift the
    whole stream (O(total_bits) word ops per call → quadratic in
    segment size; measured 21 µs/point at 4096-point segments, ~6×
    the flushed form). Emitted bit sequence is identical.
    """

    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        total = self.nbits + nbits
        rem = total & 7
        nbytes = total >> 3
        if nbytes:
            self.out += (acc >> rem).to_bytes(nbytes, "big")
            acc &= (1 << rem) - 1
        self.acc = acc
        self.nbits = rem

    def bytes(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            return bytes(self.out) + bytes(((self.acc << pad) & 0xFF,))
        return bytes(self.out)


def _zigzag(v: int) -> int:
    # magnitude-independent (deltas/dods of int64 values exceed int64)
    return (v << 1) if v >= 0 else (((-v) << 1) - 1)


def _unzigzag(z: int) -> int:
    return (z >> 1) if (z & 1) == 0 else -((z + 1) >> 1)


_DOD_THRESH = np.array([1 << 14, 1 << 20, 1 << 28, 1 << 36], dtype=np.int64)
_DOD_NBP = np.array([14, 20, 28, 36, 66], dtype=np.int64)
_DOD_COMBINED_NBITS = np.array([16, 23, 32, 41, 71], dtype=np.int64)
_DOD_PFX = np.array([0b10, 0b110, 0b1110, 0b11110, 0], dtype=np.int64)


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact bit_length of uint64 values via frexp on 32-bit halves.

    frexp returns the exact binary exponent (x = m·2^e, 0.5 ≤ m < 1), so
    bit_length(v) = e for v > 0 — no log2 rounding concerns; 32-bit
    halves keep the float64 conversion exact."""
    hi = (x >> np.uint64(32)).astype(np.float64)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.float64)
    _, e_hi = np.frexp(hi)
    _, e_lo = np.frexp(lo)
    return np.where(hi > 0, 32 + e_hi, e_lo).astype(np.int64)


def encode_segment(ts_us: np.ndarray, values: np.ndarray) -> bytes:
    """Encode parallel int64-micros timestamps + float64 values.

    Per-point metadata (delta-of-delta class, zigzag, XOR
    leading/trailing zero counts) is precomputed vectorized; the
    sequential window/bit-emission runs as a lean Python loop over the
    precomputed lists, emitting each point as ONE combined field
    (concatenation of sub-fields is associative, so the bit stream is
    identical to the per-field writes — sha-checked in tests). Falls
    back to the scalar path when |ts| ≥ 2^60, where int64 delta/dod
    arithmetic could wrap (the scalar path uses Python ints)."""
    ts = np.asarray(ts_us, dtype=np.int64)
    vals = np.asarray(values, dtype=np.float64)
    if ts.shape != vals.shape:
        raise ValueError("timestamp/value length mismatch")
    n = ts.size
    header = struct.pack(">IQ", MAGIC, n)
    if n == 0:
        return header
    # wrap-free range test: np.abs(int64-min) wraps back to int64-min,
    # which would pass an abs()-based guard and run the vectorized
    # delta/zigzag arithmetic outside its safety envelope
    if n > 2 and bool(np.all((ts > -(1 << 60)) & (ts < (1 << 60)))):
        return header + _encode_fields_vectorized(ts, vals)
    return header + _encode_fields_scalar(ts, vals)


def _encode_fields_scalar(ts: np.ndarray, vals: np.ndarray) -> bytes:
    """Reference body encoder: Python-int arithmetic, field-at-a-time.

    Handles any int64 timestamps (deltas/dods as unbounded Python ints);
    the vectorized path is byte-parity-tested against this one."""
    n = ts.size
    w = _BitWriter()
    # --- timestamps ---
    w.write(int(ts[0]) & 0xFFFFFFFFFFFFFFFF, 64)
    if n > 1:
        first_delta = int(ts[1]) - int(ts[0])
        w.write(_zigzag(first_delta), 66)  # |delta of int64s| < 2^64
        prev_delta = first_delta
        for i in range(2, n):
            delta = int(ts[i]) - int(ts[i - 1])
            dod = delta - prev_delta
            prev_delta = delta
            if dod == 0:
                w.write(0, 1)
            else:
                z = _zigzag(dod)
                for prefix, plen, bits in _DOD_CLASSES:
                    if z < (1 << bits):
                        w.write(prefix, plen)
                        w.write(z, bits)
                        break
                else:
                    # escape class: 66 bits covers zigzag of any
                    # difference of two int64 deltas
                    w.write(0b11111, 5)
                    w.write(z, 66)

    # --- values (XOR) ---
    bits = vals.view(np.uint64).copy()
    nan_mask = np.isnan(vals)
    bits[nan_mask] = np.uint64(_QNAN)
    prev = int(bits[0])
    w.write(prev, 64)
    prev_lead, prev_sig = 65, 0  # invalid window → first XOR uses control 11
    for i in range(1, n):
        cur = int(bits[i])
        x = prev ^ cur
        prev = cur
        if x == 0:
            w.write(0, 1)
            continue
        lead = 64 - x.bit_length()
        trail = (x & -x).bit_length() - 1
        if lead > 31:
            lead = 31
        sig = 64 - lead - trail
        if (
            prev_lead <= lead
            and (64 - prev_lead - prev_sig) <= trail
            and prev_sig > 0
        ):
            # reuse previous window
            w.write(0b10, 2)
            w.write(x >> (64 - prev_lead - prev_sig), prev_sig)
        else:
            w.write(0b11, 2)
            w.write(lead, 6)
            w.write(sig - 1, 6)
            w.write(x >> trail, sig)
            prev_lead, prev_sig = lead, sig
    return w.bytes()


def _encode_fields_vectorized(ts: np.ndarray, vals: np.ndarray) -> bytes:
    """Body encoder for the guarded fast path (n > 2, |ts| < 2^60)."""
    n = ts.size
    w = _BitWriter()
    wr = w.write

    # --- timestamps ---
    wr(int(ts[0]) & 0xFFFFFFFFFFFFFFFF, 64)
    deltas = np.diff(ts)  # < 2^61 in magnitude under the guard
    wr(_zigzag(int(deltas[0])), 66)
    dods = np.diff(deltas)  # < 2^62
    z = np.where(dods >= 0, dods << 1, ((-dods) << 1) - 1)  # < 2^63
    cls = np.searchsorted(_DOD_THRESH, z, side="right")
    zero = dods == 0
    nbits_t = np.where(zero, 1, _DOD_COMBINED_NBITS[cls])
    # escape-class combined value would need 71 bits — keep z raw there
    # and emit the prefix separately in the loop
    val_t = np.where(
        zero, 0, np.where(cls < 4, (_DOD_PFX[cls] << _DOD_NBP[cls]) | z, z)
    )
    for v, nb in zip(val_t.tolist(), nbits_t.tolist()):
        if nb == 71:
            wr(0b11111, 5)
            wr(v, 66)
        else:
            wr(v, nb)

    # --- values (XOR) ---
    bits = vals.view(np.uint64).copy()
    bits[np.isnan(vals)] = np.uint64(_QNAN)
    wr(int(bits[0]), 64)
    x = bits[1:] ^ bits[:-1]
    nz = x > 0
    lead = np.minimum(64 - _bit_length_u64(x), 31)
    lowbit = x & (~x + np.uint64(1))
    trail = np.where(nz, _bit_length_u64(lowbit) - 1, 0)
    xl = x.tolist()
    ll = lead.tolist()
    tl = trail.tolist()
    prev_lead, prev_sig = 65, 0
    for i in range(n - 1):
        xi = xl[i]
        if xi == 0:
            wr(0, 1)
            continue
        li = ll[i]
        ti = tl[i]
        if (
            prev_lead <= li
            and (64 - prev_lead - prev_sig) <= ti
            and prev_sig > 0
        ):
            wr(
                (0b10 << prev_sig)
                | (xi >> (64 - prev_lead - prev_sig)),
                2 + prev_sig,
            )
        else:
            si = 64 - li - ti
            wr(
                (((((0b11 << 6) | li) << 6) | (si - 1)) << si)
                | (xi >> ti),
                14 + si,
            )
            prev_lead, prev_sig = li, si
    return w.bytes()


def decode_segment(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_segment` → (ts_us int64, values float64).

    The bit cursor is inlined into the loops (local ``pos`` + direct
    ``int.from_bytes`` over the covering span; Python lists instead of
    per-element ndarray stores) — the decode stream is inherently
    sequential (variable-width fields), so this is a constant-factor
    tightening, not a vectorization."""
    if len(payload) < 12:
        raise ValueError("truncated payload: missing header")
    magic, n = struct.unpack(">IQ", payload[:12])
    if magic != MAGIC:
        raise ValueError("bad magic")
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    data = payload[12:]
    nbits_avail = len(data) * 8
    # cheapest possible stream for n points: 64-bit t0 (+66-bit first
    # delta, 1 control bit per further point) + 64-bit v0 + 1 control
    # bit per further value. Rejecting up front keeps a corrupt header
    # from allocating O(n) output for a tiny buffer.
    min_bits = 64 + 64 + (66 + (n - 2) if n > 1 else 0) + (n - 1)
    if nbits_avail < min_bits:
        raise ValueError(
            f"truncated payload: {nbits_avail} bits < minimum "
            f"{min_bits} for {n} points"
        )
    fb = int.from_bytes
    pos = 0

    def _rd(nbits: int) -> int:
        nonlocal pos
        end = pos + nbits
        hi = (end + 7) >> 3
        out = (fb(data[pos >> 3:hi], "big") >> ((hi << 3) - end)) & (
            (1 << nbits) - 1
        )
        pos = end
        return out

    t0 = _rd(64)
    if t0 >= 1 << 63:
        t0 -= 1 << 64
    out_ts = [t0] * n
    if n > 1:
        delta = _unzigzag(_rd(66))
        cur = int(np.int64(t0 + delta))  # wraps like int64 arithmetic
        out_ts[1] = cur
        prev_delta = delta
        for i in range(2, n):
            # control: 0 | 10 | 110 | 1110 | 11110 | 11111
            if _rd(1):
                cls = 0
                while cls < 4 and _rd(1):
                    cls += 1
                bits = 66 if cls == 4 else _DOD_CLASSES[cls][2]
                prev_delta = prev_delta + _unzigzag(_rd(bits))
            cur = cur + prev_delta
            out_ts[i] = cur
    ts = np.array(out_ts, dtype=np.int64)

    prev = _rd(64)
    out_bits = [prev] * n
    lead, sig = 0, 0
    for i in range(1, n):
        if _rd(1) == 0:
            out_bits[i] = prev
            continue
        if _rd(1):  # control 11: new window
            lead = _rd(6)
            sig = _rd(6) + 1
        prev ^= _rd(sig) << (64 - lead - sig)
        out_bits[i] = prev
    vals = np.array(out_bits, dtype=np.uint64).view(np.float64)
    # bytes-slice reads silently yield zero bits past the end of the
    # buffer — the cursor still advances, so one final bound check
    # catches any truncation mid-stream (the old per-byte loop raised
    # IndexError; this keeps that guarantee without per-read checks)
    if pos > nbits_avail:
        raise ValueError(
            f"truncated payload: stream needs {pos} bits, "
            f"have {nbits_avail}"
        )
    return ts, vals
