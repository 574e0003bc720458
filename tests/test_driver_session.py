"""Regression guard for the driver's execution model: the correctness
harness runs queries under its OWN vanilla SparkSession — none of
get_spark()'s confs or registrations exist there. A fresh JVM subprocess is
the only honest way to test that (in-process getOrCreate would reuse the
configured session)."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = """
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[4]").getOrCreate()
spark.sparkContext.setLogLevel("FATAL")
import sys; sys.path.insert(0, {repo!r})
import __spark_entry__ as e
qs = e.queries()
# one query per previously-broken dependency class:
# events (nanos conf), pbf (format registration + pushFilters conf),
# opt-in pushdown (needs spark.sql.python.filterPushdown.enabled set at
# query time), real streaming (stream-source image + scoped confs)
assert qs["s_tumble"](spark, "/root/testdata/sf0.001").count() > 0
assert qs["q_pbf_scan_nodes"](spark, "/root/testdata/sf0.001").count() > 0
assert qs["q_pbf_pushdown"](spark, "/root/testdata/sf0.001").count() > 0
assert qs["s_dedup_stream"](spark, "/root/testdata/sf0.001").count() > 0
# round-4 streaming LSH queries: real micro-batch runs + batch tail under
# a vanilla session (scoped confs, memory sink, self-join expansion)
assert qs["s_dedup_near_stream"](spark, "/root/testdata/sf0.001").count() > 0
assert qs["s_dedup_embed_stream"](spark, "/root/testdata/sf0.001").count() > 0
# round-5 streaming CDC upsert: stateful update feed under a vanilla session
assert qs["s_upsert_stream"](spark, "/root/testdata/sf0.001").count() > 0
# round-5 streaming PBF source: readStream format registration + offsets
assert qs["s_pbf_stream"](spark, "/root/testdata/sf0.001").count() > 0
# round-5 streaming anomaly gate: stateful prefix statistics
assert qs["s_anomaly_stream"](spark, "/root/testdata/sf0.001").count() > 0
# round-5 streaming funnel: incremental triple state + edge compaction
assert qs["s_funnel_stream"](spark, "/root/testdata/sf0.001").count() > 0
# round-8 additions: mapInPandas/applyInPandas two-phase skyline, the
# Arrow-path BPE local relations, and the fixture-reading area query —
# each exercises a vanilla-session dependency class (Arrow confs absent,
# format registration, pandas fallback paths)
assert qs["q_skyline"](spark, "/root/testdata/sf0.001").count() > 0
assert qs["q_histogram"](spark, "/root/testdata/sf0.001").count() > 0
assert qs["q_trend_ols"](spark, "/root/testdata/sf0.001").count() > 0
assert qs["q_er_fuzzy_scaleb"](spark, "/root/testdata/sf0.001").count() > 0
assert qs["q_pbf_way_area"](spark, "/root/testdata/sf0.001").count() > 0
# round-13 curation additions: parquet write + _metadata.file_path +
# per-process rank dir under a vanilla session (no get_spark confs)
assert qs["q_sort_global"](spark, "/root/testdata/sf0.001").count() > 0
assert qs["q_corpus_shuffle"](spark, "/root/testdata/sf0.001").count() > 0
assert qs["q_split_hash"](spark, "/root/testdata/sf0.001").count() > 0
# round-14 additions: compaction round-trip (fragment write + _metadata
# file stats + coalesce rewrite) and the incremental near-dup ingest
# (two-branch HOF signing + asymmetric band-key join), both under a
# vanilla session
assert qs["q_compact_files"](spark, "/root/testdata/sf0.001").count() > 0
assert qs["q_dedup_minhash_incr"](spark, "/root/testdata/sf0.001").count() >= 0
# round-14: PBF block-transplant compaction (osmpbf sink + RDD merge +
# re-read) under a vanilla session
assert qs["q_pbf_compact"](spark, "/root/testdata/sf0.001").count() > 0
assert e.entry(spark).count() > 0
print("VANILLA_OK")
spark.stop()
"""


def test_queries_run_under_vanilla_session():
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=repo)],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=repo,
    )
    assert "VANILLA_OK" in out.stdout, f"stdout={out.stdout}\nstderr={out.stderr[-2000:]}"


def test_correctness_window_names_all_registered():
    """Every _R0N_WINDOW slot must name a registered query. The r07
    window listed q_er_fuzzy_scaleb before it existed; the driver
    silently back-filled the slot with an arbitrary query and the
    intended one got no correctness row. catalog._import_all now raises
    on phantom slots — this test proves the guard trips (and that the
    current window is clean, since all_queries() runs it)."""
    import re

    import osmpbf_spark.catalog as cat

    # discover the CURRENT round's window symbol (rotations rename it
    # each round; r11 broke this test by hardcoding _R10_WINDOW)
    names = sorted(n for n in vars(cat) if re.fullmatch(r"_R\d+_WINDOW", n))
    assert len(names) == 1, f"expected exactly one window tuple: {names}"
    wname = names[0]
    window = getattr(cat, wname)
    assert set(window) <= set(cat.all_queries())  # clean window
    assert len(window) == 50  # the driver checks exactly 50
    import pytest

    # the guard must FAIL LOUDLY on a bogus name, not sort it quietly
    try:
        setattr(cat, wname, window + ("q_this_query_does_not_exist",))
        with pytest.raises(RuntimeError, match="not in REGISTRY"):
            cat._import_all()
    finally:
        setattr(cat, wname, window)


TZ_SCRIPT = """
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.session.timeZone", "America/New_York")
         .getOrCreate())
spark.sparkContext.setLogLevel("FATAL")
import sys; sys.path.insert(0, {repo!r})
import __spark_entry__ as e
df = e.queries()["s_tumble"](spark, "/root/testdata/sf0.001")
lo = df.agg(F.min(F.unix_micros("window_start"))).collect()[0][0]
print("TZ_EPOCH", lo)
spark.stop()
"""


def test_non_utc_driver_session_pins_utc(spark):
    """load() must pin spark.sql.session.timeZone=UTC: under a New_York
    session the NTZ->LTZ cast would otherwise shift every instant by 4-5h
    (ADVICE r03). Compare the earliest window epoch against the UTC test
    session's — epochs are instant-based, so any tz leak shows up here."""
    import os

    from pyspark.sql import functions as F

    from osmpbf_spark.catalog import all_queries

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    df = all_queries()["s_tumble"](spark, "/root/testdata/sf0.001")
    want = df.agg(F.min(F.unix_micros("window_start"))).collect()[0][0]
    out = subprocess.run(
        [sys.executable, "-c", TZ_SCRIPT.format(repo=repo)],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=repo,
    )
    assert f"TZ_EPOCH {want}" in out.stdout, (
        f"expected epoch {want}; stdout={out.stdout}\nstderr={out.stderr[-2000:]}"
    )
