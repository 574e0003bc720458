"""Streaming tests: oracle parity for the s_* batch twins, then the REAL
Structured Streaming path — file source micro-batches, watermark late-data
drop, and applyInPandasWithState — checked against those same twins."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

from pyspark.sql import functions as F

from osmpbf_spark.catalog import REGISTRY, all_queries, load
from osmpbf_spark.streaming.windows import tumbling_agg
from tests.conftest import SF_DIR
from tests.parity import check_query

all_queries()

STREAM_QUERIES = sorted(n for n, q in REGISTRY.items() if "stream" in q.tags)


@pytest.mark.parametrize("name", STREAM_QUERIES)
def test_stream_twin_oracle_parity(spark, duck, name):
    pdf, _ = check_query(spark, duck, SF_DIR, name)
    assert len(pdf) > 0, f"{name}: empty result"


# ---------------------------------------------------------------------------
# real streaming paths
# ---------------------------------------------------------------------------


def _events_schema(spark):
    return load(spark, SF_DIR, "events").schema


def _write_stream_input(spark, path: str):
    """Materialize events (ts already micro-precision) as a stream source."""
    load(spark, SF_DIR, "events").coalesce(1).write.mode("overwrite").parquet(path)


def test_stream_tumble_matches_batch(spark, tmp_path):
    """readStream -> tumbling agg -> complete mode memory sink must equal
    the registered batch twin exactly."""
    src = str(tmp_path / "src")
    _write_stream_input(spark, src)
    stream = spark.readStream.schema(_events_schema(spark)).parquet(src)
    agg = tumbling_agg(stream.withWatermark("ts", "30 minutes"))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumble_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("tumble_test")
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    want = (
        tumbling_agg(load(spark, SF_DIR, "events"))
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_stream_watermark_drops_late(spark, tmp_path):
    """Watermark late-data drop — the GUARANTEED semantics: once the
    watermark has passed a window's end and its state is evicted (end of
    the batch that advanced the watermark), later arrivals for that window
    are filtered and can never resurrect it. (While state still exists,
    dropping is best-effort only — Spark aggregates such rows — so the
    test arranges eviction before the late arrival.)"""
    src = str(tmp_path / "late_src")
    os.makedirs(src, exist_ok=True)
    base = pd.Timestamp("2024-06-01 12:00:00")

    def mk(ids, ts):
        n = len(ids)
        return pd.DataFrame(
            {
                "event_id": ids,
                "ts": ts,
                "user_id": [1] * n,
                "event_type": ["a"] * n,
                "value": [1.0] * n,
                "props": ["{}"] * n,
            }
        )

    b1 = mk([1, 2, 3], [base, base + pd.Timedelta(minutes=2),
                        base + pd.Timedelta(hours=2)])
    # advances the watermark to 13:51 -> evicts the 12:00-12:05 window state
    b2 = mk([4], [base + pd.Timedelta(hours=2, minutes=1)])
    # 12:04 is now far below the watermark AND its state is gone -> dropped
    b3 = mk([5, 6], [base + pd.Timedelta(minutes=4),
                     base + pd.Timedelta(hours=2, minutes=2)])
    schema = spark.createDataFrame(b1).schema
    for i, b in enumerate([b1, b2, b3]):
        spark.createDataFrame(b).coalesce(1).write.parquet(f"{src}/b{i}")
        time.sleep(1.1)  # distinct mtimes => deterministic file order

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{src}/b*/")
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("window.start").alias("ws"), "cnt")
    )
    seen: list[pd.DataFrame] = []
    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(lambda bdf, _id: seen.append(bdf.toPandas()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    allb = pd.concat(seen, ignore_index=True)
    per_window = allb.groupby("ws")["cnt"].max()
    # 6 events written; the late 12:04 must be dropped: 12:00 window stays
    # at 2, 14:00 window reaches 3
    assert per_window[pd.Timestamp("2024-06-01 12:00:00")] == 2, allb
    assert per_window[pd.Timestamp("2024-06-01 14:00:00")] == 3, allb
    assert per_window.sum() == 5, allb


def test_apply_in_pandas_with_state(spark, tmp_path):
    """Real stateful streaming: running per-user event counts via
    applyInPandasWithState across micro-batches equal the batch counts."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = str(tmp_path / "state_src")
    _write_stream_input(spark, src)

    def count_events(key, pdf_iter, state: GroupState):
        (user_id,) = key
        n = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [user_id], "n_events": [n]})

    stream = spark.readStream.schema(_events_schema(spark)).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out = stream.groupBy("user_id").applyInPandasWithState(
        count_events,
        outputStructType="user_id long, n_events long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    seen: list[pd.DataFrame] = []
    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(lambda bdf, _id: seen.append(bdf.toPandas()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = (
        pd.concat(seen, ignore_index=True)
        .groupby("user_id")["n_events"]
        .max()
        .sort_index()
    )
    want = (
        load(spark, SF_DIR, "events")
        .groupBy("user_id")
        .count()
        .toPandas()
        .set_index("user_id")["count"]
        .sort_index()
    )
    assert (final == want).all()


def test_near_stream_candidates_cover_verified_pairs(spark, duck):
    """The streaming LSH bucket state must generate every candidate the
    batch MinHash query verifies: s_dedup_near_stream's pairs are the
    pre-verification candidate set, so q_dedup_minhash's jaccard-verified
    output is a subset by construction."""
    cand_pdf, _ = check_query(spark, duck, SF_DIR, "s_dedup_near_stream")
    ver_pdf, _ = check_query(spark, duck, SF_DIR, "q_dedup_minhash")
    cand = {(int(a), int(b)) for a, b in zip(cand_pdf["doc_a"], cand_pdf["doc_b"])}
    verified = {(int(a), int(b)) for a, b in zip(ver_pdf["doc_a"], ver_pdf["doc_b"])}
    assert verified <= cand, f"verified pairs missing from candidates: {verified - cand}"
