"""Uncompressed AVI (RIFF 'AVI ') container codec in pure numpy + stdlib —
removing 'video' from the documented stub list for the profile this
sandbox can honestly parse, the same move PNG made in r06 and JPEG in
r17 (operators/jpeg.py).

Real video *codecs* (H.264/VP9/AV1) genuinely need ffmpeg-class
libraries that are absent here; the multimodal stub docstring has said
so since r05. But the AVI *container* with uncompressed DIB frames
(BI_RGB) is a pure struct format — RIFF chunk walk, AVI headers, padded
bottom-up BGR rasters — exactly the stdlib+numpy toolkit of the PBF
codec. What is real here:

- **RIFF layer**: 'RIFF'/'AVI ' signature, LIST chunk walk with word
  (2-byte) alignment, hdrl/movi/idx1 structure on both write and read.
- **Header layer**: 'avih' MainAVIHeader (frame timing, counts, dims),
  'strl' stream list with 'strh' AVIStreamHeader (fccType 'vids',
  handler 'DIB ', scale/rate = frame timing) and 'strf'
  BITMAPINFOHEADER (BI_RGB, 24-bit); compressed fourccs and non-24-bit
  depths are explicitly rejected with a diagnosable error.
- **Frame layer**: '00db' DIB frames with the real memory layout —
  bottom-up row order, BGR byte order, rows padded to 4-byte stride —
  plus the 'idx1' index whose offsets/sizes are verified against the
  movi chunks actually read.

The format is lossless, so q_multimodal_video gets an exact DuckDB
oracle with no tricks: closed-form frame pixels from doc_id, encoded
into a real AVI, decoded by the chunk-walking parser, and per-frame
plain + position-weighted checksums recomputed in SQL. The weighted
checksum (sum of k * pixel[k] over the flat RGB index) is the layout
probe: a missed vertical flip, an un-swapped BGR triple, or a stride
pad leaking into pixels all preserve the plain sum but scramble the
weighted one.

Scale posture: same as q_multimodal_jpeg — two chained Arrow-batched
``mapInPandas`` stages, map-only, the only shuffle an 8 B/row id
spread; a production H.264 decode drops ffmpeg into the same kernel
slot without touching the plan.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osmpbf_spark.catalog import load, query


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    """RIFF chunk: fourcc + size + body, padded to word alignment."""
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(listtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", listtype + body)


def _dib_frame(rgb: np.ndarray) -> bytes:
    """One frame's DIB bytes: bottom-up rows, BGR order, 4-byte stride."""
    h, w = rgb.shape[:2]
    stride = (w * 3 + 3) & ~3
    bgr = np.flipud(rgb[..., ::-1])  # bottom-up + channel swap
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return rows.tobytes()


def avi_encode(frames: np.ndarray, fps: int = 10) -> bytes:
    """Encode (n_frames, h, w, 3) uint8 RGB as an uncompressed AVI
    (DIB/BI_RGB 24-bit 'vids' stream with an idx1 index)."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("expected (n_frames, h, w, 3) uint8 frames")
    nf, h, w = frames.shape[:3]
    stride = (w * 3 + 3) & ~3
    frame_bytes = [_dib_frame(frames[i]) for i in range(nf)]
    buf_size = stride * h

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        buf_size * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        nf, 0, 1, buf_size,  # frames, initial, streams, sugg. buffer
        w, h, 0, 0, 0, 0,  # dims + reserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps, 0, nf,  # scale, rate, start, length
        buf_size, 0, -1,  # sugg. buffer, quality, sampleSize
        0, 0, w, h,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24, 0,  # biSize..biCompression (0 = BI_RGB)
        buf_size, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"".join(_chunk(b"00db", fb) for fb in frame_bytes)
    movi = _list(b"movi", movi_body)
    # idx1 offsets are relative to the start of the movi LIST's data
    # (the conventional 'offset from the movi fourcc' form: first = 4)
    idx_entries = []
    off = 4
    for fb in frame_bytes:
        idx_entries.append(
            struct.pack("<4sIII", b"00db", 0x10, off, len(fb))
        )
        off += 8 + len(fb) + (len(fb) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def avi_decode(payload: bytes) -> tuple[np.ndarray, dict]:
    """Decode an uncompressed AVI to ((n_frames, h, w, 3) uint8 RGB,
    meta). Walks the real container: verifies the RIFF/'AVI '
    signature, parses avih/strh/strf, rejects compressed fourccs and
    non-24-bit depths diagnosably, collects movi '00db'/'00dc' frames,
    cross-checks the idx1 index against the frames actually read, and
    reverses the DIB layout (stride un-pad, vertical flip, BGR->RGB)."""
    try:
        return _avi_decode_inner(payload)
    except (IndexError, struct.error) as e:
        raise ValueError("truncated AVI payload") from e


def _avi_decode_inner(payload: bytes) -> tuple[np.ndarray, dict]:
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (missing RIFF/'AVI ')")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if 8 + riff_size > len(payload):
        raise ValueError("truncated AVI payload")
    w = h = nf_declared = None
    fps_us = None
    compression = None
    bitcount = None
    handler = None
    frames_raw: list[bytes] = []
    frame_offsets: list[tuple[int, int]] = []  # (offset-in-movi, size)
    idx1: list[tuple[int, int]] = []

    def walk(pos: int, end: int, in_movi: bool, movi_base: int) -> None:
        nonlocal w, h, nf_declared, fps_us, compression, bitcount, handler
        while pos < end:
            fourcc = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body_start = pos + 8
            if body_start + size > end:
                raise ValueError("AVI chunk overruns its parent")
            if fourcc == b"LIST":
                listtype = payload[body_start : body_start + 4]
                walk(
                    body_start + 4,
                    body_start + size,
                    listtype == b"movi",
                    body_start,
                )
            elif fourcc == b"avih":
                vals = struct.unpack_from("<14I", payload, body_start)
                fps_us, nf_declared = vals[0], vals[4]
                w, h = vals[8], vals[9]
            elif fourcc == b"strh":
                fcc_type = payload[body_start : body_start + 4]
                if fcc_type == b"vids":
                    handler = payload[body_start + 4 : body_start + 8]
            elif fourcc == b"strf" and bitcount is None:
                (_, bw, bh, _, bc, comp) = struct.unpack_from(
                    "<IiiHHI", payload, body_start
                )
                bitcount, compression = bc, comp
            elif fourcc == b"idx1":
                for o in range(body_start, body_start + size, 16):
                    ckid, _, off, sz = struct.unpack_from("<4sIII", payload, o)
                    if ckid in (b"00db", b"00dc"):
                        idx1.append((off, sz))
            elif in_movi and fourcc in (b"00db", b"00dc"):
                frames_raw.append(payload[body_start : body_start + size])
                # idx1 'offset from the movi fourcc' convention;
                # movi_base points at that fourcc, so first chunk = 4
                frame_offsets.append((pos - movi_base, size))
            pos = body_start + size + (size % 2)

    walk(12, 8 + riff_size, False, 0)
    if w is None or bitcount is None:
        raise ValueError("AVI missing avih/strf headers")
    if compression != 0 or bitcount != 24:
        name = (
            struct.pack("<I", compression).decode("ascii", "replace")
            if compression
            else f"{bitcount}-bit"
        )
        raise ValueError(
            f"compressed/non-RGB24 AVI stream ({name}) unsupported — "
            "real video codecs need ffmpeg, absent in this sandbox"
        )
    if idx1 and idx1 != frame_offsets:
        raise ValueError("AVI idx1 index disagrees with movi chunks")
    stride = (w * 3 + 3) & ~3
    out = np.empty((len(frames_raw), h, w, 3), dtype=np.uint8)
    for i, fb in enumerate(frames_raw):
        if len(fb) != stride * h:
            raise ValueError("AVI frame size mismatch with declared dims")
        rows = np.frombuffer(fb, np.uint8).reshape(h, stride)[:, : w * 3]
        out[i] = np.flipud(rows.reshape(h, w, 3))[..., ::-1]
    meta = {
        "width": w,
        "height": h,
        "n_frames": len(frames_raw),
        "n_frames_declared": nf_declared,
        "fps": round(1_000_000 / fps_us) if fps_us else None,
        "handler": (handler or b"").decode("ascii", "replace").strip(),
    }
    return out, meta


# ---------------------------------------------------------------------------
# The query: closed-form frames through the full container roundtrip
# ---------------------------------------------------------------------------


def _gen_video_frames(doc_id: int) -> np.ndarray:
    """Closed-form RGB frames: nf = 2 + (id//3)%3 frames (NOT id%3 —
    the video slice fixes id = 2 mod 3, which would freeze the frame
    count) of (5 + id%4) rows x (7 + id%5) cols; pixel at flat RGB
    index k of frame f is (id*7 + f*131 + k) % 256. Widths 7..11 make
    the DIB stride pad 0-3 bytes, so the un-pad path always runs on
    real data."""
    nf = 2 + (doc_id // 3) % 3
    w = 7 + doc_id % 5
    h = 5 + doc_id % 4
    k = np.arange(h * w * 3, dtype=np.int64)
    return np.stack(
        [
            ((doc_id * 7 + f * 131 + k) % 256)
            .astype(np.uint8)
            .reshape(h, w, 3)
            for f in range(nf)
        ]
    )


def synthesize_avis(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = [
            avi_encode(_gen_video_frames(int(doc_id)))
            for doc_id in pdf["doc_id"]
        ]
        yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})


def decode_avis(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: sniff RIFF/'AVI ', run the container parser,
    emit one row per decoded frame with plain + position-weighted
    checksums over the reconstructed RGB raster."""
    for pdf in batches:
        rows: dict[str, list] = {
            "doc_id": [], "frame_id": [], "width": [], "height": [],
            "frame_checksum": [], "weighted_checksum": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            p = bytes(payload)
            if p[:4] != b"RIFF" or p[8:12] != b"AVI ":
                raise ValueError("expected an AVI payload")
            frames, meta = avi_decode(p)
            k = np.arange(meta["height"] * meta["width"] * 3, dtype=np.int64)
            for f in range(meta["n_frames"]):
                v = frames[f].reshape(-1).astype(np.int64)
                rows["doc_id"].append(doc_id)
                rows["frame_id"].append(f)
                rows["width"].append(meta["width"])
                rows["height"].append(meta["height"])
                rows["frame_checksum"].append(int(v.sum()))
                rows["weighted_checksum"].append(int((k * v).sum()))
        yield pd.DataFrame(rows)


@query(
    "q_multimodal_video",
    oracle="""
    WITH v AS (SELECT doc_id, 2 + (doc_id // 3) % 3 AS nf,
                      7 + doc_id % 5 AS w, 5 + doc_id % 4 AS h
               FROM documents WHERE doc_id % 3 = 2),
    f AS (SELECT doc_id, w, h, unnest(range(0, nf)) AS frame_id FROM v),
    px AS (SELECT doc_id, w, h, frame_id,
                  unnest(range(0, w * h * 3)) AS k
           FROM f)
    SELECT doc_id, CAST(frame_id AS INTEGER) AS frame_id,
           CAST(MIN(w) AS INTEGER) AS width,
           CAST(MIN(h) AS INTEGER) AS height,
           CAST(SUM((doc_id * 7 + frame_id * 131 + k) % 256) AS BIGINT)
               AS frame_checksum,
           CAST(SUM(k * ((doc_id * 7 + frame_id * 131 + k) % 256))
                AS BIGINT) AS weighted_checksum
    FROM px GROUP BY doc_id, frame_id
    """,
    tags=("multimodal", "udf"),
)
def q_multimodal_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container decode for the profile this sandbox can
    honestly parse: every video doc synthesizes closed-form RGB frames,
    encodes them into an actual RIFF/AVI container (headers, padded
    bottom-up BGR DIB frames, idx1 index), and the chunk-walking parser
    — which sees only opaque bytes — reconstructs the frames. One output
    row per decoded frame; the oracle recomputes dims and BOTH checksums
    from the closed pixel form. The position-weighted checksum is the
    layout probe: a missed vertical flip, an un-swapped BGR triple, or
    stride padding leaking into pixels preserves the plain sum but not
    the weighted one. Compressed codecs stay honestly rejected
    (avi_decode raises on non-BI_RGB streams — that class genuinely
    needs ffmpeg). Row-expanding map-only plan, the q_multimodal_frames
    shape: two chained Arrow-batched stages, no shuffle beyond the
    8 B/row id spread that parallelizes the Python kernel."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 2)
    ids = d.select("doc_id").repartition(spark.sparkContext.defaultParallelism)
    media = ids.mapInPandas(
        synthesize_avis, schema="doc_id long, payload binary"
    )
    return media.mapInPandas(
        decode_avis,
        schema=(
            "doc_id long, frame_id int, width int, height int, "
            "frame_checksum long, weighted_checksum long"
        ),
    )
