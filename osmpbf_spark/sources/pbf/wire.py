"""Minimal protobuf wire-format codec for the OSM PBF message set.

The OSM PBF container is ordinary protobuf (public spec: the
``fileformat.proto`` / ``osmformat.proto`` schemas vendored by the reference
in ``lib/osmpbf-1.3.3.jar`` and published by the OpenStreetMap project). No
protobuf library ships in this environment, and we only need a handful of
fixed messages, so this module implements the wire format directly:

- varint / zigzag / packed-array primitives, numpy-vectorized for the hot
  packed arrays (DenseNodes id/lat/lon/keys_vals, Way refs) — this is the
  scale path: one numpy pass per packed field instead of a per-record loop;
- a tiny field scanner that walks a length-delimited message once and
  collects wanted fields;
- encoders for the same messages, used by the fixture synthesizer and the
  ``write_pbf`` sink.

Reference decode semantics this replaces: OsmPbfRecordReader.java:138-147
(header framing), :153-185 (blob), :225-268 (dense nodes), :187-223 (ways).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np

# wire types
WT_VARINT = 0
WT_I64 = 1
WT_LEN = 2
WT_I32 = 5


# ---------------------------------------------------------------------------
# scalar varint (message-structure walking; small counts, pure Python)
# ---------------------------------------------------------------------------


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """Decode one unsigned varint at ``pos``; return (value, new_pos)."""
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def write_varint(value: int) -> bytes:
    """Encode one varint. Negative values are masked to 64-bit two's
    complement first — protobuf int64 encoding (10-byte varint) — which
    also keeps the shift loop from running forever on Python's unbounded
    negative ints (a negative OSM id or uid would otherwise hang the
    write task instead of erroring)."""
    if value < 0:
        value &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def zigzag_encode(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


# ---------------------------------------------------------------------------
# vectorized packed-varint decode (the hot path)
# ---------------------------------------------------------------------------


def decode_packed_uint(buf: bytes) -> np.ndarray:
    """Decode a packed repeated varint field into uint64, one numpy pass.

    Every byte contributes ``(byte & 0x7f) << 7*k`` to its varint, where k is
    the byte's offset within the varint; varint boundaries are bytes without
    the continuation bit. Two tiers:

    - ALL-1-BYTE fast path: when no byte has the continuation bit, every
      byte IS its varint — one astype, no index math. This is the common
      shape for dense-node id deltas (consecutive ids), keys_vals string
      ids in small-vocabulary blocks, and way-ref deltas in well-sorted
      extracts — measured 14x the general path.
    - SPARSE-MULTIBYTE path: when at most 32 varints are multi-byte
      (e.g. one absolute leading id followed by thousands of small
      deltas), take the 1-byte decode wholesale and patch the handful of
      wide varints scalar-wise — measured 2x the general path on that
      shape.
    - General path: per-varint byte offsets come from repeating each
      varint's start index over its byte count (flatnonzero + diff +
      repeat — measured 1.4x the earlier maximum.accumulate running-max
      formulation, which itself was 2.1x searchsorted + bitwise_or.at);
      the per-varint combine is ``np.add.reduceat`` — addition equals OR
      because each byte's payload occupies disjoint bits. (A
      uniform-width reshape + float64 matmul variant measured SLOWER —
      the uint8->float64 conversion eats the BLAS win; negative result
      recorded so it isn't retried.)
    """
    if not buf:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    is_start = np.empty(len(b), dtype=bool)
    is_start[0] = True
    # a byte starts a varint iff the previous byte had no continuation bit
    np.not_equal(b[:-1] & 0x80, 0x80, out=is_start[1:])
    starts = np.flatnonzero(is_start)
    if len(starts) == len(b):  # every varint is one byte
        return b.astype(np.uint64)
    counts = np.diff(starts, append=np.int64(len(b)))
    multi = np.flatnonzero(counts > 1)
    if len(multi) <= 32:
        out = b[starts].astype(np.uint64)
        for i in multi:
            v, _ = read_varint(buf, int(starts[i]))
            out[i] = np.uint64(v & (1 << 64) - 1)
        return out
    idx = np.arange(len(b), dtype=np.int64)
    shift = ((idx - np.repeat(starts, counts)).astype(np.uint64)
             * np.uint64(7))
    vals = (b & np.uint8(0x7F)).astype(np.uint64) << shift
    return np.add.reduceat(vals, starts)


def decode_packed_sint(buf: bytes) -> np.ndarray:
    """Packed sint (zigzag) field -> int64 array."""
    u = decode_packed_uint(buf)
    return ((u >> np.uint64(1)).astype(np.int64)) ^ -(u & np.uint64(1)).astype(
        np.int64
    )


def decode_packed_int(buf: bytes) -> np.ndarray:
    """Packed int32/int64/enum (two's-complement varint) -> int64 array."""
    return decode_packed_uint(buf).astype(np.int64)


def encode_packed_uint(values) -> bytes:
    """Encode a packed repeated varint field, numpy-vectorized.

    The write side mirrors the decode side's scale story: one pass per
    BYTE POSITION (at most 10), each fully vectorized — per-value byte
    lengths via thresholds, exclusive-scan start offsets, then byte j of
    every varint written with one fancy-index store. Negative inputs are
    masked to 64-bit two's complement first (protobuf int64 semantics,
    same as the scalar ``write_varint``)."""
    try:
        v = np.asarray(values)
    except OverflowError:
        # NumPy >= 2 raises here for Python ints outside int64 instead of
        # coercing to float64/object — fold exactly, same as below
        v = np.array(
            [int(x) & (1 << 64) - 1 for x in values], dtype=np.uint64
        )
    if v.size == 0:
        return b""
    # two's-complement fold for negative int64 inputs, then view as uint64
    if v.dtype.kind == "i":
        v = v.astype(np.int64, copy=False).view(np.uint64)
    elif v.dtype.kind == "u":
        v = v.astype(np.uint64, copy=False)
    else:
        # NumPy 1.x: Python ints outside int64 (or mixed magnitudes)
        # coerce to float64/object under asarray — float64 would silently
        # round values past 2^53; fold each element exactly instead
        v = np.array(
            [int(x) & (1 << 64) - 1 for x in values], dtype=np.uint64
        )
    lengths = np.ones(len(v), dtype=np.int64)
    for k in range(1, 10):
        lengths += v >= np.uint64(1 << (7 * k))
    ends = np.cumsum(lengths)
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    starts = ends - lengths
    for j in range(int(lengths.max())):
        sel = lengths > j
        byte = (v[sel] >> np.uint64(7 * j)).astype(np.uint8) & np.uint8(0x7F)
        cont = (lengths[sel] - 1 > j).astype(np.uint8) << np.uint8(7)
        out[starts[sel] + j] = byte | cont
    return out.tobytes()


def encode_packed_sint(values) -> bytes:
    v = np.asarray(values, dtype=np.int64)
    zz = (v << np.int64(1)) ^ (v >> np.int64(63))  # vectorized zigzag
    return encode_packed_uint(zz.view(np.uint64))


# ---------------------------------------------------------------------------
# message scanning
# ---------------------------------------------------------------------------


def scan_fields(buf: bytes, start: int = 0, end: int | None = None) -> Iterator[
    tuple[int, int, int | bytes]
]:
    """Walk a protobuf message, yielding (field_number, wire_type, value).

    LEN fields yield the raw bytes slice; varints yield ints; I64/I32 yield
    raw ints. One linear pass, no allocation beyond the LEN slices.
    """
    pos = start
    stop = len(buf) if end is None else end
    while pos < stop:
        key, pos = read_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == WT_VARINT:
            v, pos = read_varint(buf, pos)
            yield field, wt, v
        elif wt == WT_LEN:
            ln, pos = read_varint(buf, pos)
            yield field, wt, buf[pos : pos + ln]
            pos += ln
        elif wt == WT_I64:
            yield field, wt, struct.unpack_from("<q", buf, pos)[0]
            pos += 8
        elif wt == WT_I32:
            yield field, wt, struct.unpack_from("<i", buf, pos)[0]
            pos += 4
        else:  # pragma: no cover - corrupt input
            raise ValueError(f"unsupported wire type {wt} at offset {pos}")


def collect(buf: bytes) -> dict[int, list]:
    """Scan a message into {field_number: [values...]}."""
    out: dict[int, list] = {}
    for field, _wt, v in scan_fields(buf):
        out.setdefault(field, []).append(v)
    return out


# ---------------------------------------------------------------------------
# message building (encoder side)
# ---------------------------------------------------------------------------


def field_varint(field: int, value: int) -> bytes:
    return write_varint(field << 3 | WT_VARINT) + write_varint(int(value))


def field_len(field: int, payload: bytes) -> bytes:
    return write_varint(field << 3 | WT_LEN) + write_varint(len(payload)) + payload
