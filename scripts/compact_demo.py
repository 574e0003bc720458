"""100x small-file compaction measurement (r13 verdict Next #5).

Builds the 100x documents corpus (scale_synth.build_documents), writes
it the way a long-lived streaming sink does — one small part file per
trigger — then runs operators.compact.compact_files and reports:

  - before/after file populations and byte totals (the SURVEY row),
  - the compaction wall (the maintenance pass you pay),
  - a downstream scan wall over fragmented vs compacted layout (the
    read tax the pass removes).

Usage: python scripts/compact_demo.py [--k 100] [--frag-files 2000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument(
        "--frag-files",
        type=int,
        default=2000,
        help="small files to fragment into (per-trigger sink shape)",
    )
    ap.add_argument(
        "--target-mb",
        type=int,
        default=32,
        help="compaction output target file size",
    )
    ns = ap.parse_args()

    import scale_synth

    scale_synth._configure(ns.k)
    out_dir = scale_synth.OUT
    if not (
        os.path.exists(f"{out_dir}/{scale_synth._MARKER}")
        or os.path.exists(f"{out_dir}/{scale_synth._DOC_MARKER}")
    ):
        print(f"building {ns.k}x documents corpus ...", flush=True)
        scale_synth.build_documents()

    from pyspark.sql import functions as F

    from osmpbf_spark.operators.compact import compact_files, file_stats
    from osmpbf_spark.session import get_spark

    spark = get_spark("compact_demo")
    spark.sparkContext.setLogLevel("ERROR")

    frag = "/tmp/osmpbf_compact_demo_frag"
    docs = spark.read.parquet(f"{out_dir}/documents.parquet")
    n_rows = docs.count()
    print(f"corpus: {n_rows} docs; fragmenting into {ns.frag_files} files",
          flush=True)
    t0 = time.perf_counter()
    docs.repartition(ns.frag_files).write.mode("overwrite").parquet(frag)
    print(f"fragment write: {round(time.perf_counter() - t0, 2)}s",
          flush=True)

    def scan_wall(path: str) -> tuple[float, int]:
        df = spark.read.parquet(path)
        n_tasks = df.rdd.getNumPartitions()
        # warm the EXACT timed plan shape (a sum-only warm pass leaves
        # the sum+count aggregate paying first-run codegen inside the
        # timed window — review r14), then time it. NOTE the honest
        # local-FS caveat this measurement carries: with listing and
        # footers page-cached and maxPartitionBytes bin-packing small
        # files into few tasks, the steady-state read tax of
        # fragmentation at this data size is modest — the structural
        # numbers (file count, task count) are what scale; the
        # per-file listing/GET/footer costs they multiply into are
        # object-store phenomena a local disk can't exhibit.
        agg = df.agg(F.sum("n_chars"), F.count(F.lit(1)))
        agg.collect()
        t0 = time.perf_counter()
        agg.collect()
        return round(time.perf_counter() - t0, 3), n_tasks

    frag_scan, frag_tasks = scan_wall(frag)

    t0 = time.perf_counter()
    out, stats = compact_files(
        spark, frag, target_bytes=ns.target_mb * 1024 * 1024
    )
    wall = round(time.perf_counter() - t0, 2)
    comp_scan, comp_tasks = scan_wall(out)

    mb = 1024 * 1024
    print(
        f"COMPACT: files {stats['files_before']} -> "
        f"{stats['files_after']}, bytes "
        f"{round(stats['bytes_before'] / mb, 1)} MB -> "
        f"{round(stats['bytes_after'] / mb, 1)} MB, rows {stats['rows']}, "
        f"target {ns.target_mb} MB, compaction wall {wall}s"
    )
    sizes = [r["bytes"] for r in file_stats(spark, out).collect()]
    print(
        f"output file sizes MB: min {round(min(sizes) / mb, 1)} "
        f"median {round(sorted(sizes)[len(sizes) // 2] / mb, 1)} "
        f"max {round(max(sizes) / mb, 1)}"
    )
    print(
        f"downstream scan (steady-state, page-cached local FS): "
        f"fragmented {frag_scan}s/{frag_tasks} tasks vs compacted "
        f"{comp_scan}s/{comp_tasks} tasks "
        f"({round(frag_scan / comp_scan, 2)}x)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
