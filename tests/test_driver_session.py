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
