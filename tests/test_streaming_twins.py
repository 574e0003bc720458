"""Fair-arm batch twins (r16 verdict Next #2): every twin in
osmpbf_spark/streaming/fair_twins.py must VALUE-MATCH the oracle it is
timed against — a timing arm that computes something else would make
the recorded ratio_like_work meaningless. Family twins (q_dedup_near /
q_dedup_embed) and class-batch twins are the registered queries whose
parity the driver already gates; this pins the INLINE twins, plus the
noncomparable s_pbf_stream twin against the stream query's own value
oracle."""

from __future__ import annotations

import pytest

from osmpbf_spark.catalog import REGISTRY, TABLES, all_queries
from osmpbf_spark.streaming.fair_twins import batch_twins
from tests.conftest import SF_DIR
from tests.parity import assert_frames_match, normalize

all_queries()

_INLINE = [
    "s_tumble_append",
    "s_session_append",
    "s_dedup_stream",
    "s_dedup_append",
    "s_join_stream",
    "s_upsert_stream",
    "s_anomaly_stream",
    "s_funnel_stream",
    "s_enrich_stream",
]


@pytest.mark.parametrize("name", _INLINE)
def test_inline_twin_matches_oracle(spark, duck, name):
    t = batch_twins()[name]
    got = t["fn"](spark, SF_DIR).toPandas()
    want = duck.sql(t["oracle"]).df()
    assert_frames_match(got, want, f"twin:{name}")


def test_twin_registry_covers_every_stream_query():
    twins = batch_twins()
    streams = {n for n in all_queries() if n.startswith("s_")}
    assert set(twins) == streams
    # noncomparable rows must still carry a twin fn and a reason
    for n, t in twins.items():
        assert callable(t["fn"]) and t["cls"] in (
            "batch",
            "stream",
            "noncomparable",
        )
        assert t["oracle"] is not None or t["cls"] == "noncomparable"


def test_pbf_twin_matches_stream_oracle(spark, duck):
    """The noncomparable twin still does the RIGHT work: the batch scan
    of the two-copy source must equal the stream query's value oracle
    (the pre-decoded image with doubled counts)."""
    t = batch_twins()["s_pbf_stream"]
    got = t["fn"](spark, SF_DIR).toPandas()
    want = duck.sql(REGISTRY["s_pbf_stream"].oracle).df()
    assert_frames_match(got, want, "twin:s_pbf_stream")
