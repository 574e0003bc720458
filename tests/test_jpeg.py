"""The baseline T.81 JPEG codec (operators/jpeg.py) — exactness regime,
lossy-regime tolerance, entropy-layer edge paths, and error handling.

The exact-roundtrip tests are the local twin of q_multimodal_jpeg's
DuckDB oracle (flat aligned blocks + gray + flat quant tables are
lossless — see the module docstring); the tolerance tests cover the
regime no closed form survives."""

from __future__ import annotations

import numpy as np
import pytest

from osmpbf_spark.operators.jpeg import (
    _gen_tile_raster,
    jpeg_decode,
    jpeg_encode,
)


def _gray(px: np.ndarray) -> np.ndarray:
    return np.stack([px, px, px], axis=-1)


@pytest.mark.parametrize("doc_id", [0, 3, 6, 9, 33, 63, 123, 498])
@pytest.mark.parametrize("mode", ["444", "420"])
def test_flat_tile_roundtrip_exact(doc_id, mode):
    r = _gen_tile_raster(doc_id)
    out, meta = jpeg_decode(jpeg_encode(r, mode))
    assert meta["subsample"] == mode
    assert (meta["height"], meta["width"]) == r.shape[:2]
    assert (out == r).all(), (
        f"doc {doc_id} {mode}: maxdiff "
        f"{np.abs(out.astype(int) - r.astype(int)).max()}"
    )


@pytest.mark.parametrize("mode", ["444", "420"])
def test_block_placement_exact(mode):
    """Distinct flat value per aligned 8x8 block: any mistake in MCU
    interleave order, block raster placement, or DC prediction chains a
    wrong value into some block — exact equality catches it."""
    rng = np.random.default_rng(7)
    v = rng.integers(0, 256, (4, 6))
    px = np.repeat(np.repeat(v, 8, axis=0), 8, axis=1).astype(np.uint8)
    r = _gray(px)
    out, _ = jpeg_decode(jpeg_encode(r, mode))
    assert (out == r).all()


@pytest.mark.parametrize("mode", ["444", "420"])
def test_nonflat_gray_tolerance(mode):
    """Arbitrary gray content, flat quant tables: the only loss is DCT
    coefficient rounding (gray has exactly flat chroma, so 4:2:0
    subsampling is lossless too). 24x24 also exercises the partial-MCU
    pad/crop path in 420 mode."""
    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    r = _gray(g)
    out, _ = jpeg_decode(jpeg_encode(r, mode))
    assert np.abs(out.astype(int) - r.astype(int)).max() <= 2


def test_color_444_tolerance():
    """Random color, 4:4:4: loss = YCbCr round-trip rounding + DCT
    coefficient rounding — a few levels at most."""
    rng = np.random.default_rng(13)
    c = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    out, _ = jpeg_decode(jpeg_encode(c, "444"))
    d = np.abs(out.astype(int) - c.astype(int))
    assert d.max() <= 6
    assert d.mean() <= 1.5


def test_color_420_chroma_smooth_tolerance():
    """4:2:0 destroys per-pixel chroma by design, so the 420 fidelity
    check uses content whose 2x2 blocks are constant (chroma survives
    the subsample exactly); residual error is rounding-scale."""
    rng = np.random.default_rng(3)
    small = rng.integers(0, 256, (8, 8, 3))
    img = np.repeat(np.repeat(small, 2, axis=0), 2, axis=1).astype(np.uint8)
    out, _ = jpeg_decode(jpeg_encode(img, "420"))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 6


def test_restart_markers_roundtrip():
    """RSTn every 2 MCUs over non-flat content: byte-aligned resync and
    DC predictor reset must reproduce the restartless decode exactly."""
    rng = np.random.default_rng(17)
    big = rng.integers(0, 256, (32, 48, 3)).astype(np.uint8)
    p0 = jpeg_encode(big, "420", restart_interval=0)
    p2 = jpeg_encode(big, "420", restart_interval=2)
    assert b"\xff\xd0" in p2
    o0, _ = jpeg_decode(p0)
    o2, m2 = jpeg_decode(p2)
    assert m2["restart_interval"] == 2
    assert (o0 == o2).all()


def test_byte_stuffing_exercised():
    """An entropy-coded 0xFF must be stuffed with 0x00 and un-stuffed on
    read; random content hits it quickly and the roundtrip must hold."""
    for seed in range(30):
        r = (
            np.random.default_rng(seed)
            .integers(0, 256, (16, 16, 3))
            .astype(np.uint8)
        )
        p = jpeg_encode(r, "444")
        i = p.find(b"\xff\xda")
        if b"\xff\x00" in p[i:]:
            jpeg_decode(p)  # must not raise
            return
    pytest.fail("no payload exercised byte stuffing in 30 seeds")


def test_rejects_progressive():
    p = bytearray(jpeg_encode(_gen_tile_raster(0), "444"))
    i = p.find(b"\xff\xc0")
    p[i + 1] = 0xC2  # SOF0 -> SOF2
    with pytest.raises(ValueError, match="non-baseline"):
        jpeg_decode(bytes(p))


def test_rejects_truncation_and_garbage():
    p = jpeg_encode(_gen_tile_raster(3), "444")
    with pytest.raises(ValueError):
        jpeg_decode(p[:40])
    with pytest.raises(ValueError):
        jpeg_decode(p[: len(p) // 2])
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"not a jpeg at all")


def test_decode_any_sniffs_jpeg():
    """multimodal.decode_any routes SOI-signature payloads to the real
    codec — JPEG left the documented-stub list in r17."""
    from osmpbf_spark.operators.multimodal import decode_any

    r = _gen_tile_raster(6)
    out = decode_any(jpeg_encode(r, "420"), "image")
    assert out["decoder"] == "jpeg420"
    assert (out["width"], out["height"]) == (r.shape[1], r.shape[0])
    assert out["checksum"] == int(r.sum(dtype=np.int64))


def test_oracle_parity_local(spark, duck):
    """Same check the driver runs at sf0.01, on the CI corpus."""
    from tests.conftest import SF_DIR
    from tests.parity import check_query

    pdf, _ = check_query(spark, duck, SF_DIR, "q_multimodal_jpeg")
    assert len(pdf) > 0
    # both subsampling modes and the restart slice must appear in the
    # driver-checked corpus, or those decoder paths are only pytest-deep
    assert set(pdf["decoder"]) == {"jpeg420", "jpeg444"}
    assert (pdf["doc_id"] % 12 == 0).any()
