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

    from osmpbf_spark.catalog import fanout

    # fanout mirrors the registered queries' first step: the synthetic
    # parquet is few-row-group, so an un-fanned frame would sign on 1-2
    # tasks and the arm comparison would measure partitioning, not the
    # index (at production scale the batch scan has many row groups and
    # parallelizes by itself)
    docs = fanout(spark.read.parquet(f"{out_dir}/documents.parquet"))
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

    # arm A: the self-contained recurrence (history reduced every
    # ingest) — ONE construction shared by the timed arm and the
    # parity check below, so they can never desynchronize
    from pyspark.sql import Window

    def arm_a_frame():
        d = docs.withColumn("h", F.md5("text"))
        inc = d.filter(F.col("doc_id") % 5 == 0)
        hist = d.filter(F.col("doc_id") % 5 != 0).select("h").distinct()
        rn = F.row_number().over(Window.partitionBy("h").orderBy("doc_id"))
        return (
            inc.withColumn("rn", rn)
            .filter(F.col("rn") == 1)
            .join(hist, "h", "left_anti")
            .select("doc_id", "source", "lang", "n_chars")
        )

    a = timed(lambda: mat(arm_a_frame()))
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
    got_a_df = arm_a_frame().select("doc_id")
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

    # ---- phase 2: the NEAR-dup (MinHash) history index -----------------
    from osmpbf_spark.catalog import REGISTRY
    from osmpbf_spark.operators.dedup import (
        build_minhash_history_index,
        dedup_minhash_against_history,
    )

    mh_tbl, mh_path = "mh_idx_demo", "/tmp/osmpbf_mh_idx_demo"
    shutil.rmtree(mh_path, ignore_errors=True)
    spark.sql(f"DROP TABLE IF EXISTS {mh_tbl}")

    # arm A: self-contained recurrence — history RE-SIGNED every ingest
    qfn = REGISTRY["q_dedup_minhash_incr"].fn
    ma = timed(lambda: mat(qfn(spark, f"{out_dir}")))
    print(f"minhash arm A (self-contained per-ingest): {ma}s", flush=True)

    t0 = time.perf_counter()
    build_minhash_history_index(spark, hist_docs, mh_tbl, mh_path)
    mh_build = round(time.perf_counter() - t0, 2)
    print(f"minhash arm B index build (one-time): {mh_build}s", flush=True)
    mb = timed(
        lambda: mat(
            dedup_minhash_against_history(spark, batch, mh_tbl, hist_docs)
        )
    )
    print(f"minhash arm B (ingest vs bucketed band-key index): {mb}s",
          flush=True)

    pa = qfn(spark, f"{out_dir}").select("doc_new", "doc_hist")
    pb = dedup_minhash_against_history(
        spark, batch, mh_tbl, hist_docs
    ).select("doc_new", "doc_hist")
    np_a, np_b = pa.count(), pb.count()
    np_diff = pa.exceptAll(pb).count()
    assert np_a == np_b and np_diff == 0, (np_a, np_b, np_diff)
    print(
        f"MINHASH RESULT (broadcast-feasible regime): per-ingest {ma}s -> "
        f"{mb}s ({round(ma / mb, 2)}x) with a {mh_build}s one-time index "
        f"build; flagged-pair parity {np_a} == {np_b} rows, 0 differing"
    )

    # The regime that motivates the index: a production batch (a day's
    # crawl) is NOT broadcastable, so the candidate join must shuffle —
    # and without the index, every ingest shuffles the ENTIRE history
    # band-key set (corpus-proportional) plus re-signs history; with it,
    # only the batch's keys move. Emulate by disabling auto-broadcast.
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ma2 = timed(lambda: mat(qfn(spark, f"{out_dir}")))
        mb2 = timed(
            lambda: mat(
                dedup_minhash_against_history(
                    spark, batch, mh_tbl, hist_docs
                )
            )
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    print(
        f"MINHASH RESULT (broadcast-infeasible regime): per-ingest {ma2}s "
        f"-> {mb2}s ({round(ma2 / mb2, 2)}x)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
