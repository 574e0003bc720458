"""Property-based tests (hypothesis) for the protobuf wire codec — the
lowest layer everything in the PBF path stands on. Round-trip laws over the
full value domains catch encoding edge cases (boundary varints, negative
int64 two's-complement, zigzag extremes, empty/huge packed arrays) that
fixture-driven tests never sample."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osmpbf_spark.sources.pbf import wire

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
U64 = st.integers(min_value=0, max_value=2**64 - 1)


@given(U64)
def test_varint_roundtrip_uint(v):
    buf = wire.write_varint(v)
    out, pos = wire.read_varint(buf, 0)
    assert out == v and pos == len(buf)
    assert len(buf) <= 10  # protobuf varint max


@given(I64)
def test_varint_negative_is_twos_complement(v):
    """Negative int64 encodes as its 64-bit two's complement (protobuf
    int64 semantics) and always terminates."""
    buf = wire.write_varint(v)
    out, _ = wire.read_varint(buf, 0)
    assert out == v & ((1 << 64) - 1)


@given(I64)
def test_zigzag_roundtrip(v):
    assert wire.zigzag_decode(wire.zigzag_encode(v)) == v


@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_zigzag_decode_encode_inverse(u):
    assert wire.zigzag_encode(wire.zigzag_decode(u)) == u


@given(st.lists(U64, max_size=300))
@settings(max_examples=50)
def test_packed_uint_roundtrip(vals):
    buf = wire.encode_packed_uint(vals)
    out = wire.decode_packed_uint(buf)
    # decoder returns int64-reinterpreted values (numpy); compare mod 2^64
    assert [int(x) & ((1 << 64) - 1) for x in out] == vals


@given(st.lists(I64, max_size=300))
@settings(max_examples=50)
def test_packed_sint_roundtrip(vals):
    buf = wire.encode_packed_sint(vals)
    out = wire.decode_packed_sint(buf)
    assert [int(x) for x in out] == vals


@given(st.lists(st.tuples(st.integers(1, 200), U64), max_size=30))
def test_scan_fields_walks_varint_messages(fields):
    """A message built from arbitrary varint fields scans back
    field-for-field in order."""
    buf = b"".join(wire.field_varint(f, v) for f, v in fields)
    got = [(f, v) for f, _wt, v in wire.scan_fields(buf)]
    assert got == [(f, v & ((1 << 64) - 1)) for f, v in fields]


@given(st.lists(st.tuples(st.integers(1, 200), st.binary(max_size=60)), max_size=20))
def test_scan_fields_walks_len_messages(fields):
    buf = b"".join(wire.field_len(f, p) for f, p in fields)
    got = [(f, v) for f, _wt, v in wire.scan_fields(buf)]
    assert got == fields


# ---------------------------------------------------------------------------
# block-level round-trip: encoder -> BlockDecoder over arbitrary node sets
# ---------------------------------------------------------------------------

_tag_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FA, exclude_characters=""),
    min_size=1,
    max_size=12,
)
_node = st.tuples(
    st.integers(min_value=-(2**40), max_value=2**40),  # id (negatives legal in editing data)
    st.integers(min_value=-(90 * 10**7), max_value=90 * 10**7),  # lat 1e-7 deg
    st.integers(min_value=-(180 * 10**7), max_value=180 * 10**7),  # lon
    st.one_of(st.none(), st.dictionaries(_tag_text, _tag_text, max_size=3)),
)


@given(st.lists(_node, min_size=1, max_size=60, unique_by=lambda n: n[0]))
@settings(max_examples=40, deadline=None)
def test_dense_block_roundtrip_property(nodes):
    """write_pbf -> index -> BlockDecoder is the identity on arbitrary
    (id, lat, lon, tags) sets: delta chains survive any id gaps/signs,
    the per-block string table round-trips arbitrary unicode tags, and
    coordinates land exactly on the 100-nanodegree grid."""
    import tempfile

    from osmpbf_spark.sources.pbf import decode, encode

    nodes = sorted(nodes, key=lambda n: n[0])  # ids strictly increasing
    ids = [n[0] for n in nodes]
    blk = {
        "nodes": {
            "id": ids,
            "lat_nano": [n[1] * 100 for n in nodes],
            "lon_nano": [n[2] * 100 for n in nodes],
            "tags": [n[3] for n in nodes],
        }
    }
    with tempfile.NamedTemporaryFile(suffix=".pbf") as f:
        encode.write_pbf(f.name, [blk])
        idx = decode.index_blocks(f.name)
        with open(f.name, "rb") as fh:
            bd = decode.BlockDecoder(
                decode.read_block_payload(fh, idx[1])
            )
    out = bd.decode_nodes()
    assert out["id"].tolist() == ids
    assert np.allclose(out["lat"], [n[1] * 1e-7 for n in nodes], atol=1e-12)
    assert np.allclose(out["lon"], [n[2] * 1e-7 for n in nodes], atol=1e-12)
    for i, (_, _, _, tags) in enumerate(nodes):
        lo, hi = out["tag_offsets"][i], out["tag_offsets"][i + 1]
        got = dict(zip(out["tag_keys"][lo:hi], out["tag_vals"][lo:hi]))
        assert got == (tags or {})


def test_sha_prefix_hash_cross_engine(spark, duck):
    """The round-4 base hash (sha256 hex prefix -> 60-bit integer) must be
    bit-identical across engines for arbitrary strings — it feeds the
    exact-oracle MinHash/SimHash queries, so any divergence (hex case,
    substr indexing, cast semantics) would silently break the driver's
    hash gate. Checked over ASCII, unicode, whitespace, and empty-ish
    inputs."""
    from pyspark.sql import functions as F

    samples = (
        ["", " ", "a", "ab", "the quick brown fox", "naïve café",
         "日本語テキスト", "tab\tsep", "new\nline", "0x1234", "'quote'",
         '"dq"', "back\\slash", "emoji 🙂 text"]
        + [f"shingle {i} of the corpus" for i in range(200)]
    )
    sdf = spark.createDataFrame([(s,) for s in samples], ["shingle"])
    got = {
        r.shingle: (r.h, r.h1, r.h2)
        for r in sdf.select(
            "shingle",
            F.expr(
                "CAST(conv(substr(sha2(shingle, 256), 1, 15), 16, 10)"
                " AS BIGINT) % 1000000007"
            ).alias("h"),
            F.expr(
                "CAST(conv(substr(sha2(shingle, 256), 1, 15), 16, 10) AS BIGINT)"
            ).alias("h1"),
            F.expr(
                "CAST(conv(substr(sha2(shingle, 256), 16, 15), 16, 10) AS BIGINT)"
            ).alias("h2"),
        ).collect()
    }
    for s in samples:
        h, h1, h2 = duck.execute(
            "SELECT ('0x' || substr(sha256(?), 1, 15))::BIGINT % 1000000007,"
            " ('0x' || substr(sha256(?), 1, 15))::BIGINT,"
            " ('0x' || substr(sha256(?), 16, 15))::BIGINT",
            [s, s, s],
        ).fetchone()
        assert got[s] == (h, h1, h2), f"hash mismatch for {s!r}: {got[s]} != {(h, h1, h2)}"
