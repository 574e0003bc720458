"""q_sort_global at scale with spill telemetry (r12 verdict Next #6).

The registered query proves correctness (global rank vs DuckDB ORDER BY)
at driver scale; this script proves the 100 TB posture: a FULL corpus
sort — every row, full text payload, written back ordered — completes
under a deliberately small executor memory budget because Spark's range
exchange + UnsafeExternalSorter spill to disk instead of holding a
partition resident.

Protocol:
  - corpus: the 300x documents table (1.5M rows, ~180 MB parquet,
    several hundred MB of in-memory strings) built by scale_synth
    --k 300; falls back to building a documents-only copy.
  - session: fresh JVM with spark.driver.memory=$SORT_DEMO_MEM
    (default 1g — local mode's single process holds all executor
    memory, so this caps the EXECUTION pool at ~300 MB across 32
    tasks: a range partition of this corpus cannot be fully resident).
  - job: score every doc (distinct-token count * 100000 + n_chars, the
    registered query's integer score), orderBy(score desc, doc_id),
    write parquet INCLUDING the text payload — the "order the corpus by
    quality and materialize it" curation step.
  - telemetry: Spark UI REST (ui enabled on a free port) — per-stage
    memoryBytesSpilled / diskBytesSpilled / peakExecutionMemory. The
    claim is NOT "no spill"; it is "bounded memory + disk absorbs the
    rest, wall stays linear".

Usage: python scripts/sort_global_demo.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

CORPUS = "/tmp/sf_synth_300"
OUT = "/tmp/sort_global_out"
UI_PORT = int(os.environ.get("SORT_DEMO_UI_PORT", "4049"))
MEM = os.environ.get("SORT_DEMO_MEM", "1g")


def ensure_corpus() -> str:
    import scale_synth

    # a full build() dir or a documents-only dir both serve; the
    # documents-only path writes its own marker so a fallback build is
    # built once, not on every run
    have = any(
        os.path.exists(f"{CORPUS}/{m}")
        for m in (scale_synth._MARKER, scale_synth._DOC_MARKER)
    ) and os.path.exists(f"{CORPUS}/documents.parquet")
    if not have:
        scale_synth._configure(300)
        scale_synth.build_documents()
    return f"{CORPUS}/documents.parquet"


def rest(path: str):
    with urllib.request.urlopen(
        f"http://localhost:{UI_PORT}/api/v1/{path}", timeout=10
    ) as r:
        return json.loads(r.read())


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    docs_path = ensure_corpus()

    spark = (
        SparkSession.builder.appName("sort_global_demo")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.driver.memory", MEM)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .getOrCreate()
    )
    try:
        spark.sparkContext.setLogLevel("ERROR")
        d = spark.read.parquet(docs_path)
        n = d.count()
        score = (
            F.size(F.array_distinct(F.split(F.lower("text"), " "))).cast(
                "long"
            )
            * 100000
            + F.col("n_chars")
        ).alias("score")
        t0 = time.perf_counter()
        (
            d.select("doc_id", score, "text")
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .write.mode("overwrite")
            .parquet(OUT)
        )
        wall = time.perf_counter() - t0
        apps = rest("applications")
        app_id = apps[0]["id"]
        stages = rest(f"applications/{app_id}/stages")
        spill_mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
        spill_disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
        peak = max(s.get("peakExecutionMemory", 0) for s in stages)
        print(
            f"sorted+wrote {n} docs in {round(wall, 2)}s under "
            f"driver.memory={MEM}: "
            f"spill mem {round(spill_mem / 1048576, 1)} MB, "
            f"spill disk {round(spill_disk / 1048576, 1)} MB, "
            f"peak task execution memory "
            f"{round(peak / 1048576, 1)} MB"
        )
        # order proof: first file holds the global max score, last file
        # the global min (range partitions are ordered by NUMERIC part
        # index — same rule as the engine's rank derivation, so the
        # proof and the engine can never disagree on file order)
        from osmpbf_spark.operators.relational import _part_index

        files = sorted(
            (f for f in os.listdir(OUT) if f.startswith("part-")),
            key=_part_index,
        )
        first = spark.read.parquet(f"{OUT}/{files[0]}")
        last = spark.read.parquet(f"{OUT}/{files[-1]}")
        hi = first.agg(F.max("score")).collect()[0][0]
        lo_first = first.agg(F.min("score")).collect()[0][0]
        hi_last = last.agg(F.max("score")).collect()[0][0]
        full_max = d.select(score).agg(F.max("score")).collect()[0][0]
        assert hi == full_max, "first part file must open with the max"
        assert hi_last <= lo_first, "part files must be range-ordered"
        print(
            f"order check: part-0 max {hi} == corpus max; "
            f"last-part max {hi_last} <= part-0 min {lo_first} OK"
        )
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
