"""Property-based tests (hypothesis) for the pure state-merge steps of
the incremental streaming operators. The claims under test are the load-
bearing ones the fixture's single-batch ingest cannot exercise: folding
the merge over ANY in-order batch split must equal the batch computation
over everything, and replaying a processed batch must change nothing.

Driving the module-level merge functions directly (no Spark, no state
store) keeps each hypothesis example to microseconds, so the search is
actually broad."""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from osmpbf_spark.streaming.windows import (
    _FUNNEL_BIG,
    _anomaly_merge,
    _funnel_merge,
)

ETYPES = ["view", "click", "purchase", "error"]

# a global event sequence: per event (user 0-3, event_type); ts = position
events_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.sampled_from(ETYPES)),
    min_size=1,
    max_size=40,
)
# contiguous batch split points, expressed as a list of batch lengths
splits_strategy = st.lists(st.integers(1, 10), min_size=1, max_size=6)


def _to_batches(rows, lens):
    batches, i = [], 0
    for ln in lens:
        if i >= len(rows):
            break
        batches.append(rows[i : i + ln])
        i += ln
    if i < len(rows):
        batches.append(rows[i:])
    return batches


def _funnel_brute(rows):
    """Reference funnel over the full ordered history."""
    out = {}
    for u in {r[0] for r in rows}:
        seq = [(ts, et) for ts, (uu, et) in enumerate(rows) if uu == u]
        t1 = min((ts for ts, et in seq if et == "view"), default=None)
        t2 = (
            min(
                (ts for ts, et in seq if et == "click" and ts > t1),
                default=None,
            )
            if t1 is not None
            else None
        )
        t3 = (
            min(
                (ts for ts, et in seq if et == "purchase" and ts > t2),
                default=None,
            )
            if t2 is not None
            else None
        )
        if t1 is not None:
            out[u] = (t1, t2, t3)
    return out


@settings(max_examples=200, deadline=None)
@given(events_strategy, splits_strategy)
def test_funnel_merge_any_split_equals_batch(rows, lens):
    cur = pd.DataFrame(
        {c: pd.Series([], dtype="int64") for c in ["user_id", "t1", "t2", "t3", "seq"]}
    )
    indexed = list(enumerate(rows))  # ts = global position (in-order)
    for batch in _to_batches(indexed, lens):
        pdf = pd.DataFrame(
            {
                "user_id": [u for _, (u, _) in batch],
                "ts_us": [ts for ts, _ in batch],
                "event_id": [ts for ts, _ in batch],
                "event_type": [et for _, (_, et) in batch],
            }
        )
        _, cur = _funnel_merge(cur, pdf)
    got = {
        int(r.user_id): (
            int(r.t1) if r.t1 < _FUNNEL_BIG else None,
            int(r.t2) if r.t2 < _FUNNEL_BIG else None,
            int(r.t3) if r.t3 < _FUNNEL_BIG else None,
        )
        for r in cur.itertuples()
        if r.t1 < _FUNNEL_BIG
    }
    assert got == _funnel_brute(rows)
    # idempotency: replaying the final batch emits nothing and keeps state
    last = _to_batches(indexed, lens)[-1]
    pdf = pd.DataFrame(
        {
            "user_id": [u for _, (u, _) in last],
            "ts_us": [ts for ts, _ in last],
            "event_id": [ts for ts, _ in last],
            "event_type": [et for _, (_, et) in last],
        }
    )
    emitted, cur2 = _funnel_merge(cur, pdf)
    assert len(emitted) == 0
    a = cur.sort_values("user_id").reset_index(drop=True)
    b = cur2.sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


values_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(-500, 500)),
    min_size=1,
    max_size=40,
)


@settings(max_examples=200, deadline=None)
@given(values_strategy, splits_strategy)
def test_anomaly_merge_any_split_equals_prefix(rows, lens):
    cur = pd.DataFrame(
        {c: pd.Series([], dtype="int64") for c in ["user_id", "n", "s", "q"]}
    )
    indexed = list(enumerate(rows))
    flagged = []
    for batch in _to_batches(indexed, lens):
        pdf = pd.DataFrame(
            {
                "user_id": [u for _, (u, _) in batch],
                "ts_us": [ts for ts, _ in batch],
                "event_id": [ts for ts, _ in batch],
                "value": [x / 100.0 for _, (_, x) in batch],
                "x": [x for _, (_, x) in batch],
            }
        )
        out, cur = _anomaly_merge(cur, pdf)
        flagged.extend(
            (int(r.user_id), int(r.event_id), r.z) for r in out.itertuples()
        )
    # brute-force prefix recomputation
    expected = []
    hist: dict[int, list[int]] = {}
    for ts, (u, x) in indexed:
        h = hist.setdefault(u, [])
        h.append(x)
        n, s, q = len(h), sum(h), sum(v * v for v in h)
        dev, varn2 = n * x - s, n * q - s * s
        if dev > 0 and dev * dev > 9 * varn2:
            expected.append((u, ts, dev / math.sqrt(varn2)))
    assert len(flagged) == len(expected)
    for (gu, gid, gz), (eu, eid, ez) in zip(
        sorted(flagged), sorted(expected)
    ):
        assert (gu, gid) == (eu, eid)
        assert gz == ez  # identical IEEE ops -> bit-equal


upsert_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),           # user
        st.sampled_from(["a", "b"]),  # event_type
        st.integers(0, 20),           # ts
        st.integers(-500, 500),       # value (cents)
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=200, deadline=None)
@given(upsert_strategy, splits_strategy)
def test_upsert_merge_any_split_equals_latest_wins(rows, lens):
    from osmpbf_spark.streaming.windows import (
        _UPSERT_COLS,
        _UPSERT_DTYPES,
        _upsert_merge,
    )

    cur = pd.DataFrame(
        {
            c: pd.Series([], dtype=t)
            for c, t in zip(_UPSERT_COLS, _UPSERT_DTYPES)
        }
    )
    indexed = list(enumerate(rows))  # event_id = global position
    emitted = 0
    for batch in _to_batches(indexed, lens):
        pdf = pd.DataFrame(
            {
                "user_id": [u for _, (u, _, _, _) in batch],
                "event_type": [e for _, (_, e, _, _) in batch],
                "ts_us": [ts for _, (_, _, ts, _) in batch],
                "event_id": [i for i, _ in batch],
                "value": [v / 100.0 for _, (_, _, _, v) in batch],
            }
        )
        upd, cur = _upsert_merge(cur, pdf)
        emitted += len(upd)
    # brute-force latest-wins over the full history
    expected = {}
    for i, (u, e, ts, v) in indexed:
        k = (u, e)
        if k not in expected or (ts, i) > expected[k][:2]:
            expected[k] = (ts, i, v / 100.0)
    got = {
        (int(r.user_id), r.event_type): (int(r.ts_us), int(r.event_id), r.value)
        for r in cur.itertuples()
    }
    assert got == expected
    # replaying the final batch emits nothing and keeps state
    last = _to_batches(indexed, lens)[-1]
    pdf = pd.DataFrame(
        {
            "user_id": [u for _, (u, _, _, _) in last],
            "event_type": [e for _, (_, e, _, _) in last],
            "ts_us": [ts for _, (_, _, ts, _) in last],
            "event_id": [i for i, _ in last],
            "value": [v / 100.0 for _, (_, _, _, v) in last],
        }
    )
    upd2, cur2 = _upsert_merge(cur, pdf)
    assert len(upd2) == 0
    a = cur.sort_values(["user_id", "event_type"]).reset_index(drop=True)
    b = cur2.sort_values(["user_id", "event_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
