"""The uncompressed-AVI container codec (operators/avi.py) and the
framed audio featurizer (q_audio_features) — the r17 multimodal verbs
beside the JPEG codec (tests/test_jpeg.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from osmpbf_spark.operators.avi import (
    _gen_video_frames,
    avi_decode,
    avi_encode,
)


@pytest.mark.parametrize("doc_id", [2, 5, 8, 11, 14, 17, 20, 59, 119])
def test_closed_form_roundtrip_exact(doc_id):
    fr = _gen_video_frames(doc_id)
    out, meta = avi_decode(avi_encode(fr))
    assert out.shape == fr.shape
    assert (out == fr).all()
    assert meta["n_frames"] == meta["n_frames_declared"] == fr.shape[0]
    assert meta["handler"] == "DIB"


def test_random_frames_roundtrip_with_stride_pad():
    """w=13 -> 39-byte rows padded to 40: the un-pad path runs on real
    data, and the format is lossless so equality is exact."""
    rng = np.random.default_rng(5)
    fr = rng.integers(0, 256, (4, 9, 13, 3)).astype(np.uint8)
    out, meta = avi_decode(avi_encode(fr, fps=25))
    assert (out == fr).all()
    assert meta["fps"] == 25
    assert (meta["width"], meta["height"]) == (13, 9)


def test_layout_is_really_reversed():
    """The DIB memory layout (bottom-up, BGR) must differ from the
    logical raster on asymmetric content — proving the encoder writes
    the real format and the decoder actually reverses it, rather than
    both sides sharing a no-op."""
    fr = np.zeros((1, 2, 1, 3), dtype=np.uint8)
    fr[0, 0, 0] = (10, 20, 30)  # top row RGB
    fr[0, 1, 0] = (40, 50, 60)  # bottom row
    payload = avi_encode(fr)
    i = payload.find(b"00db")
    raw = payload[i + 8 : i + 8 + 8]
    # file order: bottom row first, BGR
    assert raw[:3] == bytes([60, 50, 40])
    out, _ = avi_decode(payload)
    assert (out == fr).all()


def test_rejects_compressed_stream():
    fr = _gen_video_frames(2)
    p = bytearray(avi_encode(fr))
    i = p.find(b"strf")
    struct.pack_into("<I", p, i + 8 + 16, int.from_bytes(b"MJPG", "little"))
    with pytest.raises(ValueError, match="ffmpeg"):
        avi_decode(bytes(p))


def test_rejects_corrupt_index_and_truncation():
    fr = _gen_video_frames(5)
    p = bytearray(avi_encode(fr))
    j = p.find(b"idx1")
    struct.pack_into("<I", p, j + 8 + 8, 9999)
    with pytest.raises(ValueError, match="idx1"):
        avi_decode(bytes(p))
    whole = avi_encode(fr)
    with pytest.raises(ValueError):
        avi_decode(whole[:50])
    with pytest.raises(ValueError, match="RIFF"):
        avi_decode(b"definitely not a container")


def test_decode_any_sniffs_avi():
    from osmpbf_spark.operators.multimodal import decode_any

    fr = _gen_video_frames(8)
    out = decode_any(avi_encode(fr), "video")
    assert out["decoder"] == "avi"
    assert out["n_samples"] == fr.shape[0]
    assert out["checksum"] == int(fr.sum(dtype=np.int64))
    # non-AVI video payloads keep the documented stub
    stub = decode_any(b"raw codec bytes", "video")
    assert stub["decoder"] == "stub"


def test_audio_features_ground_truth():
    """Featurizer vs an independent per-sample Python recomputation on
    one generated WAV (the oracle does the same in SQL; this pins the
    numpy framing against scalar arithmetic)."""
    import pandas as pd

    from osmpbf_spark.operators.multimodal import _gen_wav
    from osmpbf_spark.operators.multimodal import (
        extract_audio_features,
    )

    did = 7
    pdf = pd.DataFrame({"doc_id": [did], "payload": [_gen_wav(did)]})
    out = next(extract_audio_features(iter([pdf]))).iloc[0]
    n = 400 + (did % 7) * 40
    s = [(did * 13 + i * 31) % 2003 - 1001 for i in range(n)]
    assert out["n_samples"] == n
    assert out["n_frames"] == n // 160
    assert out["peak"] == max(abs(x) for x in s)
    assert out["total_energy"] == sum(x * x for x in s)
    frames = [s[i * 160 : (i + 1) * 160] for i in range(n // 160)]
    assert out["frame_energy_max"] == max(
        sum(x * x for x in f) for f in frames
    )
    assert out["zcr"] == sum(
        1 for a, b in zip(s, s[1:]) if (a >= 0) != (b >= 0)
    )


def test_oracle_parity_local(spark, duck):
    from tests.conftest import SF_DIR
    from tests.parity import check_query

    for name in ("q_multimodal_video", "q_audio_features"):
        pdf, _ = check_query(spark, duck, SF_DIR, name)
        assert len(pdf) > 0
    # the video corpus must exercise every frame-count and stride-pad
    # variant or parts of the layout reversal are only unit-deep
    vid, _ = check_query(spark, duck, SF_DIR, "q_multimodal_video")
    assert set(vid["width"]) == {7, 8, 9, 10, 11}
    assert set(vid.groupby("doc_id")["frame_id"].max() + 1) == {2, 3, 4}
