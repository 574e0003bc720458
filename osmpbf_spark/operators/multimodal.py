"""SURVEY.md §2C — multimodal column handling: opaque binary payloads with
typed metadata, processed by Arrow-batched ``mapInPandas``.

The pattern a 100 TB multimodal pipeline needs: media as ``BinaryType``
columns + a typed metadata struct, with decode/feature-extraction running
vectorized in Python workers. No image/audio libraries ship in this
container, so the decode step is STUBBED: ``_decode_media`` tries the real
libraries, and on ImportError falls back to a clearly-marked deterministic
fake. Everything around the stub — binary column construction, schema,
partitioning, the mapInPandas batch contract — is real and oracle-checked:
the deterministic features (byte length, head bytes, metadata passthrough)
are recomputed by DuckDB from the source table.

Payloads here are derived from ``documents.text`` (utf-8 bytes) because the
test corpus has no real media; the operator is payload-agnostic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osmpbf_spark.catalog import load, query

FEATURE_SCHEMA = (
    "doc_id long, media_type string, width int, height int, "
    "n_bytes long, head_hex string, decoder string"
)


def _decode_media(payload: bytes, media_type: str) -> dict:
    """Decode stub. Real decoders are not available in this environment;
    the fallback is deterministic so results stay oracle-checkable."""
    try:  # pragma: no cover - libs absent in this container
        if media_type == "image":
            import PIL.Image  # noqa: F401

            raise NotImplementedError(
                "real image decode not wired up yet (PIL found but "
                "decode path intentionally stubbed)"
            )
    except ImportError:
        pass
    # deterministic fake "decode": structural features of the raw bytes
    return {
        "n_bytes": len(payload),
        "head_hex": payload[:4].hex(),
        "decoder": "stub",
    }


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one vectorized pass per Arrow batch."""
    for pdf in batches:
        feats = [
            _decode_media(p, m)
            for p, m in zip(pdf["payload"], pdf["media_type"])
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "media_type": pdf["media_type"].values,
                "width": pdf["width"].values,
                "height": pdf["height"].values,
                "n_bytes": [f["n_bytes"] for f in feats],
                "head_hex": [f["head_hex"] for f in feats],
                "decoder": [f["decoder"] for f in feats],
            }
        )


@query(
    "q_multimodal",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
           CAST(32 + doc_id % 640 AS INTEGER) AS width,
           CAST(32 + doc_id % 480 AS INTEGER) AS height,
           octet_length(encode(text)) AS n_bytes,
           lower(hex(encode(substr(text, 1, 4)))) AS head_hex,
           'stub' AS decoder
    FROM documents
    """,
    tags=("multimodal", "udf"),
)
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary + metadata-struct columns through a mapInPandas feature
    extractor. The media table is synthesized from documents (payload =
    utf-8 text bytes, typed metadata derived from doc_id), then features
    are extracted per Arrow batch. The oracle recomputes every output
    column from the source table, so the whole binary->batch->feature
    plumbing is value-checked. Map-only at any scale: no shuffle, Python
    cost amortized over Arrow batches."""
    d = load(spark, sf_dir, "documents")
    media = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        (F.lit(32) + F.col("doc_id") % 640).cast("int").alias("width"),
        (F.lit(32) + F.col("doc_id") % 480).cast("int").alias("height"),
        F.encode("text", "utf-8").alias("payload"),
    )
    return media.mapInPandas(extract_features, schema=FEATURE_SCHEMA)


@query(
    "q_multimodal_agg",
    oracle="""
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
           COUNT(*) AS n_items,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           MAX(octet_length(encode(text))) AS max_bytes
    FROM documents
    GROUP BY media_type
    """,
    tags=("multimodal",),
)
def q_multimodal_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage accounting per media type over binary payloads — the
    'how big is my corpus' query. 3-key aggregation: shuffle volume
    constant."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            F.when(F.col("doc_id") % 3 == 0, "image")
            .when(F.col("doc_id") % 3 == 1, "audio")
            .otherwise("video")
            .alias("media_type"),
            F.octet_length(F.encode("text", "utf-8")).cast("bigint").alias("nb"),
        )
        .groupBy("media_type")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("nb").alias("total_bytes"),
            F.max("nb").alias("max_bytes"),
        )
    )


N_FRAME_PROBES = 3  # head / middle / tail — the classic video thumbnail set


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas frame sampler: 1 media row in -> N_FRAME_PROBES frame
    rows out, each a byte-slice of the payload. This is the real plumbing
    of video frame extraction (row-expanding batch transform over binary
    columns); the per-frame "decode" is the same stub policy as
    _decode_media — a real build drops ffmpeg/PIL into the slice step."""
    for pdf in batches:
        rows: dict[str, list] = {
            "doc_id": [],
            "frame_id": [],
            "byte_offset": [],
            "frame_sig": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            nb = len(payload)
            offs = (0, max(0, (nb - 4) // 2), max(0, nb - 4))
            for fid, off in enumerate(offs):
                rows["doc_id"].append(doc_id)
                rows["frame_id"].append(fid)
                rows["byte_offset"].append(off)
                rows["frame_sig"].append(payload[off : off + 4].hex())
        yield pd.DataFrame(rows)


@query(
    "q_multimodal_frames",
    oracle="""
    WITH v AS (SELECT doc_id, text, octet_length(encode(text)) AS nb
               FROM documents WHERE doc_id % 3 = 2),
    f AS (SELECT doc_id, unnest([0, 1, 2]) AS frame_id, text, nb FROM v)
    SELECT doc_id, CAST(frame_id AS INTEGER) AS frame_id,
           CAST(CASE frame_id WHEN 0 THEN 0
                              WHEN 1 THEN greatest(0, (nb - 4) // 2)
                              ELSE greatest(0, nb - 4) END AS BIGINT)
             AS byte_offset,
           lower(hex(encode(substr(text,
               CAST(CASE frame_id WHEN 0 THEN 0
                                  WHEN 1 THEN greatest(0, (nb - 4) // 2)
                                  ELSE greatest(0, nb - 4) END
                    + 1 AS INTEGER), 4)))) AS frame_sig
    FROM f
    """,
    tags=("multimodal", "udf"),
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video payloads: head/middle/tail probes, each
    emitting (frame_id, byte_offset, 4-byte frame signature). The
    row-expanding mapInPandas shape is exactly how per-frame extraction
    runs at scale — map-only, no shuffle, output rows = 3x input rows,
    Python cost amortized per Arrow batch. The oracle recomputes offsets
    and signatures from the source table (fixture text is pure ASCII, so
    the SQL char offsets equal the Spark side's byte offsets; the Spark
    path slices real bytes and works for arbitrary binary)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 2)
    media = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return media.mapInPandas(
        sample_frames,
        schema="doc_id long, frame_id int, byte_offset long, frame_sig string",
    )
