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


def _await_done(q, budget_s: int = 360) -> None:
    """awaitTermination(timeout) RETURNS False on timeout instead of
    raising, so a slow host turns downstream asserts into confusing
    empty-frame errors ('No objects to concatenate' — the r09 full-suite
    flake, host running ~2x slow). Make the timeout itself the assert,
    with a budget sized for a degraded machine."""
    assert q.awaitTermination(budget_s), (
        f"streaming query did not finish within {budget_s}s — "
        "host overloaded or trigger wedged; not a semantics failure"
    )


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
    _await_done(q)
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
    _await_done(q)
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
    _await_done(q)
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


def test_inc_lsh_emits_only_new_pairs(spark, tmp_path):
    """_inc_lsh_pairs must emit each candidate pair exactly ONCE, in the
    micro-batch where the pair's later doc arrives — the incremental
    contract that replaced the r04 complete-mode re-emit. Three files
    processed as three micro-batches; the raw (pre-distinct) sink must
    hold one row per (bucket, pair) emission, nothing re-emitted."""
    from osmpbf_spark.streaming import windows as W

    src = str(tmp_path / "inc_src")
    schema = "doc_id long, bkey string"
    # bucket X accumulates docs 1,2 (batch A) then 3 (batch B); bucket Y
    # gets 4 then 5; batch C adds 6 to X. Pair (1,2) must come from batch
    # A, (1,3),(2,3) from B, (4,5) from B, (1,6),(2,6),(3,6) from C.
    batches = [
        [(1, "X"), (2, "X"), (4, "Y")],
        [(3, "X"), (5, "Y")],
        [(6, "X")],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    got = W._inc_lsh_pairs(spark, stream, "inc_lsh_test").toPandas()
    pairs = {(int(a), int(b)) for a, b in zip(got["doc_a"], got["doc_b"])}
    assert pairs == {(1, 2), (1, 3), (2, 3), (4, 5), (1, 6), (2, 6), (3, 6)}
    # raw sink: each pair emitted exactly once (single band here), never
    # re-emitted on later batches
    raw = W._INC_RAW["inc_lsh_test"].toPandas()
    assert len(raw) == len(pairs)


def test_inc_lsh_ttl_evicts_idle_buckets(spark, tmp_path):
    """With a zero TTL, bucket membership from earlier micro-batches must
    be pruned before later arrivals — doc 3 joining bucket X a batch
    after docs 1,2 pairs with nothing (state aged out), while same-batch
    pairs still emit."""
    from osmpbf_spark.streaming import windows as W

    src = str(tmp_path / "ttl_src")
    schema = "doc_id long, bkey string"
    for rows in [[(1, "X"), (2, "X")], [(3, "X")]]:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    got = W._inc_lsh_pairs(spark, stream, "inc_ttl_test", ttl_minutes=0)
    pairs = {(int(a), int(b)) for a, b in zip(*[got.toPandas()[c] for c in ("doc_a", "doc_b")])}
    assert pairs == {(1, 2)}


def test_inc_dedup_decisions_multi_batch(spark, tmp_path):
    """s_dedup_append's stateful core across THREE micro-batches — the
    contracts the single-batch oracle can't reach: (1) emit-once — every
    arrival gets exactly one decision row in its own batch; (2)
    first-batch-wins — a later batch's smaller doc_id still resolves to
    the earlier keeper; (3) within-batch doc_id-ordered admission — the
    batch min is the keeper for same-trigger collisions."""
    from osmpbf_spark.streaming import windows as W

    src = str(tmp_path / "dedup_src")
    schema = "doc_id long, fp string"
    # batch A: fp X collides in-trigger (7, 9 -> keeper 7); fp Y singleton.
    # batch B: doc 3 < 7 arrives for X — first-batch keeper 7 must hold.
    # batch C: doc 8 joins Y -> keeper 4; doc 5 opens fresh fp Z.
    batches = [
        [(9, "X"), (7, "X"), (4, "Y")],
        [(3, "X")],
        [(8, "Y"), (5, "Z")],
    ]
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    got = W._inc_dedup_decisions(spark, stream, "inc_dedup_test").toPandas()
    decisions = {
        int(d): int(k) for d, k in zip(got["doc_id"], got["keep_id"])
    }
    assert len(got) == 6, "one decision row per arrival, exactly once"
    assert decisions == {9: 7, 7: 7, 4: 4, 3: 7, 8: 4, 5: 5}


def test_inc_dedup_decisions_ttl_reopens_fingerprint(spark, tmp_path):
    """With a zero TTL, a fingerprint idle since the prior micro-batch is
    pruned before the next batch's arrivals — the later doc becomes its
    own keeper (the dedup-horizon semantics), while same-batch collisions
    still resolve to the batch min."""
    from osmpbf_spark.streaming import windows as W

    src = str(tmp_path / "dedup_ttl_src")
    schema = "doc_id long, fp string"
    for rows in [[(1, "X"), (2, "X")], [(3, "X")]]:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    got = W._inc_dedup_decisions(
        spark, stream, "inc_dedup_ttl_test", ttl_minutes=0
    ).toPandas()
    decisions = {
        int(d): int(k) for d, k in zip(got["doc_id"], got["keep_id"])
    }
    assert decisions == {1: 1, 2: 1, 3: 3}


def test_inc_upsert_emits_only_winning_updates(spark, tmp_path):
    """_inc_upsert_updates must emit a key's row only in micro-batches
    where the arrival BEATS the key's current state winner — a stale or
    replayed row (older ts, or same ts with lower event_id) emits
    nothing, which is the idempotent-reprocessing contract."""
    from osmpbf_spark.streaming import windows as W

    src = str(tmp_path / "upsert_src")
    schema = "user_id long, event_type string, ts_us long, event_id long, value double"
    # batch A: k1 -> (ts=10, eid=1), k2 -> (ts=10, eid=2)
    # batch B: k1 newer (ts=20) -> emit; k2 REPLAY of (ts=10, eid=2) ->
    #          silent; k3 first-seen -> emit
    # batch C: k1 stale (ts=15) -> silent; k2 same-ts higher eid -> emit
    batches = [
        [(1, "a", 10, 1, 1.0), (2, "a", 10, 2, 2.0)],
        [(1, "a", 20, 3, 1.5), (2, "a", 10, 2, 2.0), (3, "a", 5, 4, 3.0)],
        [(1, "a", 15, 5, 9.9), (2, "a", 10, 6, 2.5)],
    ]
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    feed = W._inc_upsert_updates(spark, stream, "inc_upsert_test").toPandas()
    got = {
        (int(r.user_id), int(r.ts_us), int(r.event_id))
        for r in feed.itertuples()
    }
    assert got == {
        (1, 10, 1), (2, 10, 2),        # batch A first-seen
        (1, 20, 3), (3, 5, 4),         # batch B: newer + first-seen only
        (2, 10, 6),                    # batch C: same-ts eid tie-break
    }
    # compacting the feed yields the global latest-wins snapshot
    import pandas as pd

    snap = (
        feed.sort_values(["ts_us", "event_id"])
        .drop_duplicates(["user_id", "event_type"], keep="last")
        .set_index("user_id")["value"]
        .to_dict()
    )
    assert snap == {1: 1.5, 2: 2.5, 3: 3.0}


def test_anomaly_stream_parity_and_gate(spark, duck):
    """s_anomaly_stream: full value parity with the running-window oracle,
    and every emitted event genuinely sits above the 3σ prefix gate."""
    from tests.parity import check_query

    pdf, _ = check_query(spark, duck, SF_DIR, "s_anomaly_stream")
    assert len(pdf) > 0
    assert (pdf["z"] > 3.0).all()
    # emit-once: an event is flagged at most once
    assert pdf["event_id"].is_unique


def test_inc_funnel_multi_batch_equals_batch(spark, tmp_path):
    """_inc_funnel_updates across REAL multiple micro-batches: with
    in-order ingest the final per-user triple must equal the batch
    funnel, emissions happen exactly when a triple changes, and a
    replayed batch emits nothing (idempotent)."""
    from osmpbf_spark.streaming import windows as W

    src = str(tmp_path / "funnel_src")
    schema = "user_id long, ts_us long, event_id long, event_type string"
    # u1 completes the funnel across three batches; u2's purchase PRECEDES
    # its first view (must not count) and its click@8 precedes the view
    # too; u3 has only clicks (out of funnel). Batch 4 replays batch 3.
    batches = [
        [(1, 10, 1, "view"), (2, 5, 2, "purchase"), (3, 7, 3, "click")],
        [(2, 10, 4, "view"), (1, 20, 5, "click"), (2, 15, 6, "click")],
        [(1, 30, 7, "purchase")],
        [(1, 30, 7, "purchase")],
    ]
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    feed = W._inc_funnel_updates(spark, stream, "inc_funnel_test").toPandas()
    BIG = W._FUNNEL_BIG
    latest = feed.sort_values("seq").drop_duplicates("user_id", keep="last")
    got = {
        int(r.user_id): (int(r.t1), int(r.t2), int(r.t3))
        for r in latest.itertuples()
    }
    assert got == {1: (10, 20, 30), 2: (10, 15, BIG)}
    # emission ledger: u1 changes in batches 1,2,3 (not the replay);
    # u2 enters the funnel only in batch 2; u3 never
    assert len(feed) == 4
    assert feed.groupby("user_id").size().to_dict() == {1: 3, 2: 1}


def test_inc_anomaly_multi_batch_prefix(spark, tmp_path):
    """_inc_anomaly_flags across multiple micro-batches: the 3σ gate must
    fire on the PREFIX statistics accumulated through executor state —
    an outlier arriving in a later batch is judged against the carried
    (n, Σx, Σx²), and in-control arrivals after it stay silent."""
    from osmpbf_spark.streaming import windows as W

    src = str(tmp_path / "anom_src")
    schema = "user_id long, ts_us long, event_id long, value double, x long"
    flat = [(1, t, t, 10.0, 1000) for t in range(1, 13)]  # 12 calm points
    batches = [flat[:6], flat[6:], [(1, 13, 13, 50.0, 5000)],
               [(1, 14, 14, 10.0, 1000)]]
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    got = W._inc_anomaly_flags(spark, stream, "inc_anom_test").toPandas()
    # prefix math at the outlier: n=13, s=17000, q=37e6 ->
    # dev=48000, varn2=192e6, dev^2=2.304e9 > 9*varn2=1.728e9 -> flagged
    assert len(got) == 1
    row = got.iloc[0]
    assert (int(row.user_id), int(row.event_id)) == (1, 13)
    import math
    assert abs(row.z - 48000 / math.sqrt(192e6)) < 1e-12


def test_session_append_parity_and_finalization_subset(spark, duck):
    """s_session_append (r11, the 100 TB session shape): exact oracle
    parity — the append emissions equal the gaps-and-islands batch
    sessions restricted to those finalized by the end-of-stream
    watermark — and the emitted set must be a strict subset of the
    complete-mode twin's full session table, with the difference being
    EXACTLY the tail sessions still open at stream end (session_end
    above the final watermark). Proves: no early emission, no
    duplicates, no tail leak, and that the parquet file sink carries
    the same rows the driver-funneled memory sink would."""
    ap, _ = check_query(spark, duck, SF_DIR, "s_session_append")
    full, _ = check_query(spark, duck, SF_DIR, "s_session_stream")
    key = ["user_id", "session_start", "session_end", "n_events"]
    a = set(map(tuple, ap[key].itertuples(index=False)))
    f = set(map(tuple, full[key].itertuples(index=False)))
    assert a <= f, "append emitted a session the full state never held"
    tail = f - a
    assert tail, "fixture should have open tail sessions"
    wm_ms = duck.sql(
        "SELECT (epoch_us(MAX(ts)) // 1000 * 1000) - 30*60*1000000"
        " FROM events"
    ).fetchone()[0]
    for row in tail:
        end_us = int(pd.Timestamp(row[2]).value // 1000)
        assert end_us > wm_ms, (
            f"finalized session missing from append output: {row}"
        )


def test_session_append_watermark_tie_boundary(spark, tmp_path):
    """Pins the finalization comparator at the EXACT watermark tie —
    random fixture data can never hit it: user 1's session ends
    precisely ON the end-of-stream watermark (last event = max_ts −
    40 min, so end = last + 10-min gap = ms-truncated max_ts − 30-min
    lateness). Spark EMITS a session whose end equals the watermark,
    and the oracle's <= keeps it — a strict < on either side would
    diverge exactly here and nowhere else (probed r11; this test keeps
    the comparator from silently flipping in either engine)."""
    import duckdb
    import numpy as np

    from osmpbf_spark.catalog import REGISTRY, all_queries

    all_queries()
    M = pd.Timestamp("2024-01-01 12:00:00.000000")
    T = M - pd.Timedelta(minutes=40)
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "ts": [T - pd.Timedelta(minutes=1), T,
                   M - pd.Timedelta(minutes=5), M],
            "user_id": np.array([1, 1, 2, 2], dtype=np.int64),
            "event_type": ["a"] * 4,
            "value": [1.0] * 4,
            "props": ["{}"] * 4,
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet", index=False)
    q = REGISTRY["s_session_append"]
    out = q.fn(spark, str(tmp_path)).toPandas()
    assert len(out) == 1 and int(out["user_id"].iloc[0]) == 1
    assert pd.Timestamp(out["session_end"].iloc[0]) == M - pd.Timedelta(
        minutes=30
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    ora = con.sql(q.oracle).df()
    con.close()
    assert len(ora) == 1 and int(ora["user_id"].iloc[0]) == 1


def test_tumble_append_watermark_tie_boundary(spark, tmp_path):
    """Same tie-class pin as the session test above, for tumbling
    windows: a window whose end equals the ms-truncated end-of-stream
    watermark is EMITTED by Spark and KEPT by the oracle's <= — probed
    r11 (the r08-era oracle had never been exercised at the exact tie;
    both engines agree, this keeps it that way)."""
    import duckdb
    import numpy as np

    from osmpbf_spark.catalog import REGISTRY, all_queries

    all_queries()
    M = pd.Timestamp("2024-01-01 12:00:00.000000")
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(3, dtype=np.int64),
            "ts": [pd.Timestamp("2024-01-01 11:27:00"),
                   M - pd.Timedelta(minutes=3), M],
            "user_id": np.array([1, 2, 2], dtype=np.int64),
            "event_type": ["a"] * 3,
            "value": [1.0, 2.0, 3.0],
            "props": ["{}"] * 3,
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet", index=False)
    q = REGISTRY["s_tumble_append"]
    out = q.fn(spark, str(tmp_path)).toPandas()
    assert len(out) == 1
    assert pd.Timestamp(out["window_end"].iloc[0]) == M - pd.Timedelta(
        minutes=30
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    ora = con.sql(q.oracle).df()
    con.close()
    assert len(ora) == 1


def test_rocksdb_state_store_provider_parity(spark):
    """The RocksDB state-store knob (r15 — the deploy sizing for
    GB-scale state, where on-heap state was the measured cause of the
    late-suite GC transients) must change ONLY where state lives, never
    the emitted rows: s_session_append re-run under
    _STREAM_STATE_PROVIDER="rocksdb" returns the exact default-provider
    result, and the provider conf is restored after the scoped run."""
    from pyspark.sql import functions as F

    from osmpbf_spark.catalog import REGISTRY
    from osmpbf_spark.streaming import windows as W

    q = REGISTRY["s_session_append"].fn

    def fingerprint(df):
        # bit_xor: order-independent, never overflows ANSI long addition
        return df.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64(*df.columns)).alias("h"),
        ).collect()[0]

    base = fingerprint(q(spark, SF_DIR))
    old = W._STREAM_STATE_PROVIDER
    W._STREAM_STATE_PROVIDER = "rocksdb"
    try:
        rock = fingerprint(q(spark, SF_DIR))
    finally:
        W._STREAM_STATE_PROVIDER = old
    assert (base.n, base.h) == (rock.n, rock.h)
    # scoped conf restored: the next default-provider stream is unaffected
    assert (
        "RocksDB"
        not in spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    )
