"""Oracle parity for the text-analysis and multimodal operator families."""

from __future__ import annotations

import pytest

from osmpbf_spark.catalog import REGISTRY, all_queries
from tests.conftest import SF_DIR
from tests.parity import check_query

all_queries()

NAMES = sorted(
    n for n, q in REGISTRY.items() if set(q.tags) & {"text", "multimodal"}
)


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(spark, duck, name):
    pdf, _ = check_query(spark, duck, SF_DIR, name)
    assert len(pdf) > 0, f"{name}: empty result"


def test_multimodal_batch_contract(spark):
    """The mapInPandas extractor must see real binary payloads and the
    declared schema must hold (plumbing check beyond values)."""
    from osmpbf_spark.catalog import REGISTRY

    df = REGISTRY["q_multimodal"].fn(spark, SF_DIR)
    assert dict(df.dtypes)["n_bytes"] == "bigint"
    row = df.filter("doc_id = 0").collect()[0]
    assert row.media_type == "image"
    assert row.decoder == "stub"
    assert row.n_bytes > 0


def test_quality_verdict_split(spark, duck):
    pdf, _ = check_query(spark, duck, SF_DIR, "q_text_quality")
    # the corpus should produce both verdicts, else the threshold is inert
    assert set(pdf["verdict"]) == {"keep", "drop"}


def test_multimodal_frames_shape(spark):
    """Frame sampler: exactly N_FRAME_PROBES rows per video doc, offsets
    ordered head <= middle <= tail, signatures 4 bytes (8 hex chars)."""
    from osmpbf_spark.catalog import REGISTRY
    from osmpbf_spark.operators.multimodal import N_FRAME_PROBES

    pdf = REGISTRY["q_multimodal_frames"].fn(spark, SF_DIR).toPandas()
    per_doc = pdf.groupby("doc_id").size()
    assert (per_doc == N_FRAME_PROBES).all()
    wide = pdf.pivot(index="doc_id", columns="frame_id", values="byte_offset")
    assert ((wide[0] <= wide[1]) & (wide[1] <= wide[2])).all()
    assert (pdf["frame_sig"].str.len() == 8).all()


def test_doc_pack_chunks_invariants(spark, duck):
    """The chunk manifest must tile each source shard exactly: chunk ids
    contiguous from 0, every fill <= PACK_LEN, and per-shard fill total ==
    the shard's token count (no token lost or double-assigned)."""
    from osmpbf_spark.operators.textstats import PACK_LEN

    pdf, _ = check_query(spark, duck, SF_DIR, "q_doc_pack_chunks")
    assert (pdf["fill"] <= PACK_LEN).all() and (pdf["fill"] > 0).all()
    for src, g in pdf.groupby("source"):
        chunks = sorted(g["chunk"])
        assert chunks == list(range(len(chunks))), f"{src}: gap in {chunks}"
    want = {
        s: n
        for s, n in duck.sql(
            "SELECT source, SUM(len(string_split(text, ' ')))::BIGINT"
            " FROM documents GROUP BY source"
        ).fetchall()
    }
    got = pdf.groupby("source")["fill"].sum().to_dict()
    assert {k: int(v) for k, v in got.items()} == want


def test_png_codec_roundtrips_every_filter_type():
    """PNG roundtrip against the closed form for a spread of doc ids.
    h = 3 + doc_id % 4 caps at 6, and the encoder assigns filter r % 5
    per row — so ids with h in {3, 4} exercise filters 0-2/0-3 and the
    h >= 5 ids (6, 18, 30, 42) are the ones that reach Average AND
    Paeth; keep at least one of those in the list or filter-4 reversal
    loses its only coverage."""
    import numpy as np

    from osmpbf_spark.operators.multimodal import _gen_png, decode_png

    for doc_id in (0, 6, 12, 18, 24, 30, 36, 42):
        w, h = 4 + doc_id % 5, 3 + doc_id % 4
        payload = _gen_png(doc_id)
        got = decode_png(payload)
        want = int(
            ((doc_id * 7 + np.arange(w * h * 3, dtype=np.int64)) % 256).sum()
        )
        assert got == {
            "width": w,
            "height": h,
            "n_samples": None,
            "checksum": want,
            "decoder": "png",
        }, doc_id


def test_png_decoder_rejects_corruption():
    """Chunk CRCs are verified (bit-flip in IDAT body), the signature is
    enforced, and non-RGB8 profiles raise instead of guessing."""
    import pytest as _pytest

    from osmpbf_spark.operators.multimodal import _gen_png, decode_png

    payload = bytearray(_gen_png(6))
    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"P6 4 3 255 " + bytes(payload))
    # flip one bit inside the IDAT body (after sig+IHDR: 8 + 25 = 33;
    # IDAT body starts at 33 + 8)
    idat_body = bytes(payload).index(b"IDAT") + 4
    payload[idat_body + 2] ^= 0x01
    with _pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(payload))


def test_bpe_encode_distributed_segmentation_matches_local(spark):
    """q_bpe_encode's distributed escape hatch (vocab past the driver cap)
    must produce the same per-word token counts as the driver-side
    segmentation — the merges and greedy-left application are semantics,
    not an implementation detail of either path."""
    from pyspark.sql import functions as F

    from osmpbf_spark.catalog import load
    from osmpbf_spark.operators.textstats import (
        _bpe_distributed_core,
        _bpe_local,
        _bpe_words,
    )
    from tests.conftest import SF_DIR

    words = _bpe_words(load(spark, SF_DIR, "documents"))
    vocab = [(r["word"], int(r["wcnt"])) for r in words.collect()]
    local_rows, toks = _bpe_local(vocab)
    local = {w: len(t) for w, t in toks.items()}

    # the exact code q_bpe_encode's hatch runs (shared core + finish)
    dist_rows, counts = _bpe_distributed_core(
        words,
        finish=lambda f: f.groupBy("word")
        .agg(F.count("*").alias("n_tok"))
        .collect(),
    )
    dist = {r["word"]: int(r["n_tok"]) for r in counts}
    assert dist == local
    assert dist_rows == local_rows  # trajectories agree too


def test_png_codec_property_roundtrip():
    """Hypothesis: ANY (h, w) uint8 RGB raster roundtrips through the PNG
    encoder/decoder — dims up to 33x17 guarantee rows with every filter
    type, random pixel content exercises the wraparound arithmetic of
    Sub/Up/Average/Paeth far beyond the generator's smooth ramps."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from osmpbf_spark.operators.multimodal import (
        _decode_png_raster,
        _encode_png,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 17),
        h=st.integers(1, 33),
        seed=st.integers(0, 2**31 - 1),
    )
    def roundtrip(w, h, seed):
        rng = np.random.RandomState(seed)
        px = rng.randint(0, 256, (h, w * 3)).astype(np.uint8)
        got = _decode_png_raster(_encode_png(px))
        assert got.shape == px.shape
        assert (got == px).all()  # full pixel equality, position-exact

    roundtrip()


def test_bpe_encode_oracle_survives_dry_merge_rounds(duck):
    """When a merge round finds no candidate pair (single-character
    vocabulary), the oracle's per-round frame must pass through unchanged
    — the pre-fix CROSS JOIN against the empty top-1 CTE vaporized the
    whole symbol corpus and returned ZERO rows while both implementations
    returned per-doc counts (round-6 review finding). LEFT JOIN ON TRUE
    keeps the frame; every word encodes to its single symbol."""
    import duckdb as _duckdb

    from osmpbf_spark.operators.textstats import (
        _bpe_encode_oracle,
        _bpe_local,
    )

    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES"
        " (0, 'a b c'), (1, 'b c a a')) AS t(doc_id, text)"
    )
    rows = con.sql(_bpe_encode_oracle()).fetchall()
    got = {int(r[0]): (int(r[1]), int(r[2])) for r in rows}
    assert got == {0: (3, 3), 1: (4, 4)}, got
    # the local trainer agrees: no merges, every word stays one symbol
    traj, toks = _bpe_local([("a", 3), ("b", 2), ("c", 2)])
    assert traj == [] and all(len(t) == 1 for t in toks.values())


def test_bm25_ground_truth_and_plan(spark, duck):
    """Ground truth beyond the oracle: recompute tf/df/dl/N/S with plain
    Python over the tokenized corpus and replay the exact-rational
    components and the two-divide IEEE score chain; every emitted row
    must match exactly, and no (term, doc) with tf > 0 may be missing.
    Monotonicity spot-checks: score increases with tf at fixed dl and
    decreases with dl at fixed tf (the saturation/length-normalization
    behavior that makes BM25 BM25). Plan: corpus rows never shuffle —
    the only hash exchange keys on term, the stats re-enter via ONE
    broadcast, no SortAggregate."""
    from osmpbf_spark.operators.textstats import BM25_TERMS

    pdf, _ = check_query(spark, duck, SF_DIR, "q_text_bm25")
    assert len(pdf) > 0
    docs = duck.sql("SELECT doc_id, text FROM documents").df()
    toks = {
        int(r.doc_id): str(r.text).split(" ") for r in docs.itertuples()
    }
    N = len(toks)
    S = sum(len(t) for t in toks.values())
    tf = {
        (term, d): sum(1 for x in t if x == term)
        for d, t in toks.items()
        for term in BM25_TERMS
    }
    df = {
        term: sum(1 for d in toks if tf[(term, d)] > 0)
        for term in BM25_TERMS
    }
    expect = {k for k, v in tf.items() if v > 0}
    got = {(r.term, int(r.doc_id)) for r in pdf.itertuples()}
    assert got == expect
    for r in pdf.itertuples():
        d, term = int(r.doc_id), r.term
        dl = len(toks[d])
        t = tf[(term, d)]
        assert int(r.tf) == t and int(r.dl) == dl
        assert int(r.df) == df[term]
        idf_num, idf_den = 2 * N - 2 * df[term] + 1, 2 * df[term] + 1
        tfn_num = 44 * S * t
        tfn_den = 20 * S * t + 6 * S + 18 * dl * N
        assert int(r.idf_num) == idf_num and int(r.idf_den) == idf_den
        assert int(r.tfn_num) == tfn_num and int(r.tfn_den) == tfn_den
        assert r.score == (float(idf_num) / float(idf_den)) * (
            float(tfn_num) / float(tfn_den)
        )

    def tfn(t, dl):
        return (44 * S * t) / (20 * S * t + 6 * S + 18 * dl * N)

    assert tfn(2, 100) > tfn(1, 100)  # saturating gain in tf
    assert tfn(3, 50) > tfn(3, 500)  # length normalization

    import re

    from tests.test_plans import plan_of

    p = plan_of(spark, "q_text_bm25")
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)#", p))
    assert keys == {"term"}, p
    assert p.count("BroadcastExchange") == 1, p
    assert "SortAggregate" not in p, p
