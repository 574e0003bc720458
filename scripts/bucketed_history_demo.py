"""100x bucketed dedup-history measurement (r13 verdict Next #4).

q_dedup_incremental's per-ingest plan recomputes md5 + DISTINCT over
the WHOLE history every snapshot — fine for a self-contained oracle
query, wrong as the production recurrence. The maintained shape pays
that once: build_history_index writes the distinct content hashes as a
parquet table bucketed by hash, and every subsequent ingest anti-joins
against it exchange-free on the history side (plan-pinned in
tests/test_plans.py::test_bucketed_history_anti_join_no_exchange).

This demo measures both recurrences at 100x:

  arm A (self-contained): per-ingest = history md5 + distinct + window
         + anti-join (the registered query's plan, on the 100x corpus)
  arm B (maintained):     one-time index build (reported separately),
         then per-ingest = batch window + anti-join vs bucketed index

Usage: python scripts/bucketed_history_demo.py [--k 100]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--k", type=int, default=100)
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

    from osmpbf_spark.operators.dedup import (
        build_history_index,
        dedup_incremental_against_history,
    )
    from osmpbf_spark.session import get_spark

    spark = get_spark("bucketed_history_demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{out_dir}/documents.parquet")
    hist_docs = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    print(
        f"corpus: {docs.count()} docs "
        f"({hist_docs.count()} history, {batch.count()} batch)",
        flush=True,
    )

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(fn, runs=3):
        fn()  # warm
        ts = []
        for _ in range(runs - 1):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return round(min(ts), 2)

    # arm A: the self-contained recurrence (history reduced every ingest)
    from pyspark.sql import Window

    def arm_a():
        d = docs.withColumn("h", F.md5("text"))
        inc = d.filter(F.col("doc_id") % 5 == 0)
        hist = d.filter(F.col("doc_id") % 5 != 0).select("h").distinct()
        rn = F.row_number().over(Window.partitionBy("h").orderBy("doc_id"))
        mat(
            inc.withColumn("rn", rn)
            .filter(F.col("rn") == 1)
            .join(hist, "h", "left_anti")
            .select("doc_id", "source", "lang", "n_chars")
        )

    a = timed(arm_a)
    print(f"arm A (self-contained per-ingest): {a}s", flush=True)

    # arm B: maintained index — build once, then ingest against it
    tbl, path = "hist_idx_demo", "/tmp/osmpbf_hist_idx_demo"
    shutil.rmtree(path, ignore_errors=True)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    t0 = time.perf_counter()
    build_history_index(spark, hist_docs, tbl, path)
    build_wall = round(time.perf_counter() - t0, 2)
    print(f"arm B index build (one-time): {build_wall}s", flush=True)

    b = timed(lambda: mat(dedup_incremental_against_history(spark, batch, tbl)))
    print(f"arm B (ingest vs bucketed index): {b}s", flush=True)

    # parity: both arms keep the same survivor set
    got_a_df = None
    d = docs.withColumn("h", F.md5("text"))
    inc = d.filter(F.col("doc_id") % 5 == 0)
    hist = d.filter(F.col("doc_id") % 5 != 0).select("h").distinct()
    rn = F.row_number().over(Window.partitionBy("h").orderBy("doc_id"))
    got_a_df = (
        inc.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .join(hist, "h", "left_anti")
        .select("doc_id")
    )
    got_b_df = dedup_incremental_against_history(spark, batch, tbl).select(
        "doc_id"
    )
    n_a, n_b = got_a_df.count(), got_b_df.count()
    n_diff = got_a_df.exceptAll(got_b_df).count()
    assert n_a == n_b and n_diff == 0, (n_a, n_b, n_diff)
    print(
        f"RESULT: per-ingest {a}s -> {b}s ({round(a / b, 2)}x) with a "
        f"{build_wall}s one-time index build; survivor parity "
        f"{n_a} == {n_b} rows, 0 differing"
    )
    spark.stop()


if __name__ == "__main__":
    main()
