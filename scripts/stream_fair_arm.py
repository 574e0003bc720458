"""Fair-arm head-to-head for the streaming measurement class.

The s_* queries' registered DuckDB oracles verify VALUES, not
equivalent work (r16 verdict Next #2: s_pbf_stream's oracle reads a
pre-decoded parquet image in 4 ms while Spark executes a real streaming
ingest — a 970x "ratio" that carries no plan signal). This script
decides "within 2x of DuckDB" for the class on LIKE WORK:

  ratio_like_work  = spark(batch twin)     / duckdb(twin oracle)
  stream_overhead  = spark(stream query)   / spark(batch twin)

where the batch twin (osmpbf_spark/streaming/fair_twins.py) runs the
oracle's work as a Spark BATCH plan — for the *_stream/*_append forms
literally the query body minus readStream/state-store/sink; for the LSH
dedup streams the registry's batch form of the same operator family at
the same parameters. The machinery cost (micro-batch planning, offset
log, state store init, sink) is thereby REPORTED, never hidden inside a
gate ratio. s_pbf_stream is recorded as noncomparable (DuckDB cannot
decode PBF); its row still quantifies machinery overhead.

Protocol details match scripts/gate_h2h.py: one process, one host
state, DuckDB first on fresh capped connections (verbatim oracle
strings, min-of-N fetchall), then a presoaked Spark session (per-query
warm + min-of-N noop materialization), bench's host-speed probes
bracketing the run.

Usage:
    python scripts/stream_fair_arm.py [--sf /root/testdata/sf0.1] \
        [--reps 3] [s_session_append ...]
    python scripts/gate_h2h.py --streams     # same thing

Prints one JSON line; see BASELINE.md "Streaming measurement class".
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(sf: str, reps: int, names=None) -> dict:
    from osmpbf_spark.catalog import TABLES, all_queries
    from osmpbf_spark.streaming.fair_twins import batch_twins

    import gate_h2h  # noqa: F401  (sibling import for _duck_run)
    from gate_h2h import _duck_run

    twins = batch_twins()
    queries = all_queries()
    names = names or sorted(twins)
    for n in names:
        if n not in twins:
            raise SystemExit(f"{n}: not a registered s_* query")

    duck: dict[str, float | None] = {}
    for n in names:
        sql = twins[n]["oracle"]
        duck[n] = (
            _duck_run(sql, sf, TABLES, reps) if sql is not None else None
        )

    from osmpbf_spark.session import get_spark

    import bench

    spark = get_spark("stream_fair_arm")
    spark.sparkContext.setLogLevel("ERROR")
    for _ in range(3):
        (
            spark.range(0, 2_000_000, numPartitions=16)
            .selectExpr("id % 1000 AS k", "id AS v")
            .groupBy("k")
            .sum("v")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
    probe_start = bench._speed_probe(spark)

    def time_min(fn) -> float:
        for _ in range(2):
            bench.materialize(fn(spark, sf))  # warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            bench.materialize(fn(spark, sf))
            ts.append(time.perf_counter() - t0)
        return round(min(ts), 3)

    rows: dict[str, dict] = {}
    for n in names:
        t = twins[n]
        twin_s = time_min(t["fn"])
        stream_s = (
            twin_s if t["cls"] == "batch" else time_min(queries[n])
        )
        rows[n] = {
            "cls": t["cls"],
            "spark_stream": stream_s,
            "spark_batch_twin": twin_s,
            "duckdb": duck[n],
            "ratio_like_work": (
                round(twin_s / duck[n], 2) if duck[n] else None
            ),
            "stream_overhead": round(stream_s / twin_s, 2) if twin_s else None,
            "note": t["note"],
        }
    probe_end = bench._speed_probe(spark)
    spark.stop()
    return {
        "sf": sf,
        "queries": rows,
        "probe_start": probe_start,
        "probe_end": probe_end,
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("queries", nargs="*", default=None)
    ns = ap.parse_args()
    print(json.dumps(run(ns.sf, ns.reps, ns.queries or None)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
