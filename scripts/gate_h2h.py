"""Judge-reproducible head-to-head for the bench gate (<= 2x DuckDB).

Protocol (the r16 SURVEY fair-arm table was produced by exactly this):
one process, ONE host state for both engines — DuckDB first (verbatim
registered oracles, min-of-N fetchall), then Spark (presoaked session,
per-query warm + min-of-N noop materialization) — plus the bench's
host-speed probes before and after, so a ratio always ships with the
regime it was measured under.

DuckDB isolation (r16 verdict Next #3): each oracle runs on a FRESH
connection with a bounded memory_limit — a single long-lived connection
accumulates until OutOfMemoryException around oracle ~150, which killed
the full-registry judge run. Per-query connections also match how the
driver's correctness gate runs the oracles. ``--all`` runs every
oracle-carrying registered query.

Usage:
    python scripts/gate_h2h.py [--sf /root/testdata/sf0.1] [--reps 3] \
        [--all | q_cluster_kmeans q_sim_search_ivf ...]

Prints one JSON line: per-engine min seconds, ratios, and probe values.

Steady-state semantics for q_sim_search_ivf_probe: the FIRST run per
corpus identity builds the persisted cell store; that build is timed
separately and reported as ``store_build_sec`` (r16 ADVICE — the
headline ratio must not silently mix build + probe regimes across
engines). The timed number is the steady-state probe — the production
shape the query registers — and its ratio is listed under
``ratio_steady_state`` rather than ``ratio``, because the DuckDB arm
re-runs full kmeans training per rep (no persisted-store equivalent
exists in DuckDB SQL). The train-inline q_sim_search_ivf pays full
training every run on both engines and is the like-for-like ratio.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "q_cluster_kmeans",
    "q_sim_search_ivf",
    "q_sim_search_ivf_probe",
]

# Queries whose steady state is reached only after a persisted artifact
# exists; their warm pass may include a one-time build that is timed and
# reported separately.
STORE_BACKED = {"q_sim_search_ivf_probe"}

DUCKDB_MEMORY_LIMIT = os.environ.get("GATE_H2H_DUCK_MEM", "8GB")


def _duck_run(
    sql: str, sf: str, tables, reps: int, threads: int | None = None
) -> float:
    """Min-of-N for one oracle on a FRESH capped connection (the
    long-lived-connection OOM at ~150 oracles is the r16 verdict's
    reproducibility blocker). temp_directory lets DuckDB degrade to
    disk spill instead of a hard OutOfMemory under the cap (the
    sweep_oracles/conftest guard); threads is only overridden on the
    annotated OOM-retry path, never for the primary timing arm."""
    import duckdb

    con = duckdb.connect()
    try:
        con.sql(f"SET memory_limit='{DUCKDB_MEMORY_LIMIT}'")
        con.sql("SET temp_directory='/tmp/duckdb_spill_h2h'")
        if threads is not None:
            con.sql(f"SET threads={threads}")
        for t in tables:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')"
            )
        con.sql(sql).fetchall()  # warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            ts.append(time.perf_counter() - t0)
        return round(min(ts), 3)
    finally:
        con.close()


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--all",
        action="store_true",
        help="run every oracle-carrying registered query",
    )
    ap.add_argument(
        "--streams",
        action="store_true",
        help=(
            "run the streaming measurement class under its fair-arm"
            " protocol (batch twins; see scripts/stream_fair_arm.py and"
            " BASELINE.md) instead of the raw stream-vs-batch-SQL ratio"
        ),
    )
    ap.add_argument("queries", nargs="*", default=None)
    ns = ap.parse_args()

    if ns.streams:
        import stream_fair_arm

        print(
            json.dumps(
                stream_fair_arm.run(ns.sf, ns.reps, ns.queries or None)
            )
        )
        return 0

    from osmpbf_spark.catalog import TABLES, all_oracles, all_queries

    oracles = all_oracles()
    queries = all_queries()
    if ns.all:
        names = [n for n in queries if n in oracles]
    else:
        names = ns.queries or DEFAULT_QUERIES
    for n in names:
        if n not in queries or n not in oracles:
            raise SystemExit(f"{n}: not a registered oracle-carrying query")

    duck: dict[str, float] = {}
    duck_err: dict[str, str] = {}
    duck_notes: dict[str, str] = {}
    for n in names:
        try:
            duck[n] = _duck_run(oracles[n], ns.sf, TABLES, ns.reps)
        except Exception as exc:
            # transient page-provisioning OOM under the cap at default
            # (32) threads: retry once at 8 threads and LABEL the row —
            # a crashed arm measures nothing, but a retimed one must
            # never pass silently as like-for-like (r09 incident note)
            if "OutOfMemory" in type(exc).__name__ or "Out of Memory" in str(
                exc
            ):
                try:
                    duck[n] = _duck_run(
                        oracles[n], ns.sf, TABLES, ns.reps, threads=8
                    )
                    duck_notes[n] = "retried_threads_8_after_oom"
                    continue
                except Exception as exc2:
                    exc = exc2
            duck_err[n] = f"{type(exc).__name__}: {exc}"

    from osmpbf_spark.session import get_spark

    import bench

    spark = get_spark("gate_h2h")
    spark.sparkContext.setLogLevel("ERROR")
    for _ in range(3):  # presoak (bench.py's recipe)
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
    sp: dict[str, float] = {}
    sp_err: dict[str, str] = {}
    store_build: dict[str, float] = {}
    for n in names:
        fn = queries[n]
        try:
            for i in range(2):
                t0 = time.perf_counter()
                bench.materialize(fn(spark, ns.sf))  # warm (+ store build)
                w = time.perf_counter() - t0
                # first warm pass of a store-backed query may include the
                # one-time build; report it so build vs probe regimes are
                # never silently mixed (r16 ADVICE)
                if i == 0 and n in STORE_BACKED:
                    store_build[n] = round(w, 3)
            ts = []
            for _ in range(ns.reps):
                t0 = time.perf_counter()
                bench.materialize(fn(spark, ns.sf))
                ts.append(time.perf_counter() - t0)
            sp[n] = round(min(ts), 3)
        except Exception as exc:
            sp_err[n] = f"{type(exc).__name__}: {exc}"
    probe_end = bench._speed_probe(spark)
    spark.stop()

    # oracles whose min-of-N rounds to 0.000s are below the timer's
    # 1ms resolution — a ratio against them is meaningless (the
    # streaming-twin / trivial-oracle class BASELINE.md adjudicates);
    # list them instead of dividing by zero (--all hit this)
    sub_ms = sorted(n for n in duck if duck[n] == 0.0)
    # r17 ADVICE: an OOM-retried oracle ran throttled (threads=8), so its
    # slower DuckDB denominator would bias the headline ratio in the
    # engine's favor — keep those rows out of `ratio` and report them in
    # `ratio_retried` keyed alongside duckdb_notes.
    retried = set(duck_notes)
    ratio = {
        n: round(sp[n] / duck[n], 2)
        for n in names
        if n in sp
        and duck.get(n)
        and n not in STORE_BACKED
        and n not in retried
    }
    ratio_retried = {
        n: round(sp[n] / duck[n], 2)
        for n in names
        if n in sp and duck.get(n) and n in retried
    }
    ratio_steady = {
        n: round(sp[n] / duck[n], 2)
        for n in names
        if n in sp
        and duck.get(n)
        and n in STORE_BACKED
        and n not in retried
    }
    out = {
        "sf": ns.sf,
        "spark": sp,
        "duckdb": duck,
        "ratio": ratio,
        "probe_start": probe_start,
        "probe_end": probe_end,
    }
    if ratio_retried:
        out["ratio_retried"] = ratio_retried
    if ratio_steady:
        out["ratio_steady_state"] = ratio_steady
    if store_build:
        out["store_build_sec"] = store_build
    if sub_ms:
        out["duckdb_sub_ms"] = sub_ms
    if duck_notes:
        out["duckdb_notes"] = duck_notes
    if duck_err:
        out["duckdb_errors"] = duck_err
    if sp_err:
        out["spark_errors"] = sp_err
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
