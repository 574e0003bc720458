"""q_sim_search_ivf's learned-cell story at scale: nprobe vs recall vs wall.

r14 verdict Next #4's measurement half: the registered query now trains its
coarse quantizer (the q_cluster_kmeans trajectory) instead of borrowing the
label column, and the persisted form writes the corpus PARTITIONED BY cell
id. This script runs that persisted form on the 100x embedding corpus
(scale_synth --k 100; built here if missing) and reports, per nprobe:

  - probe wall (min-of-2) against the cell store — partition pruning means
    a probe scans ~nprobe/k of the files;
  - recall@10 vs numpy float64 brute force over the full corpus (ground
    truth computed driver-side: n x DIM doubles, fine at this scale);
  - the probed-cell fraction (files actually opened / cells).

KMEANS_K is patched to a scale-appropriate cell count for the 100x corpus
(the scale_synth EMB_BITS runtime-knob precedent: production sizes k to the
corpus at deploy time; the registered fixture keeps k=8 for its exact
oracle). A Spark brute-force arm (the q_sim_search shape on the same
corpus) anchors what the pruning buys.

Usage: python scripts/ivf_demo.py [--k 100] [--cells 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

TOP_K = 10


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--k", type=int, default=100, help="scale multiplier")
    ap.add_argument("--cells", type=int, default=64, help="k-means cells")
    ns = ap.parse_args()

    import scale_synth

    from osmpbf_spark.session import get_spark

    scale_synth._configure(ns.k)
    out_dir = scale_synth.OUT
    if not any(
        os.path.exists(f"{out_dir}/{m}")
        for m in (scale_synth._MARKER, scale_synth._EMB_MARKER)
    ):
        scale_synth.build_embeddings()

    spark = get_spark("ivf_demo")
    try:
        return _run(spark, out_dir, ns.cells)
    finally:
        spark.stop()


def _run(spark, sf_dir: str, cells: int) -> int:
    from pyspark.sql import functions as F

    from osmpbf_spark.catalog import load
    from osmpbf_spark.operators import similarity as S

    spark.sparkContext.setLogLevel("ERROR")

    old_k = S.KMEANS_K
    S.KMEANS_K = cells
    try:
        emb = load(spark, sf_dir, "embeddings")
        n = emb.count()
        print(f"corpus n={n}, cells={cells} (occupancy ~{n // cells}/cell)")

        store = f"/tmp/ivf_store_k{cells}_{os.path.basename(sf_dir)}"
        t0 = time.perf_counter()
        carr = S.build_ivf_cell_store(spark, sf_dir, store)
        t_build = time.perf_counter() - t0
        n_cells_occupied = len(
            [d for d in os.listdir(store) if d.startswith("cid=")]
        )
        print(
            f"store build (train {S.KMEANS_ITERS} Lloyd rounds + assign + "
            f"partitioned write): {round(t_build, 1)}s, "
            f"{n_cells_occupied} occupied cells"
        )

        # ground truth: numpy brute force (float64, unit-norm corpus)
        import duckdb

        con = duckdb.connect()
        rows = con.sql(
            f"SELECT vec_id, embedding FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
        ).fetchall()
        con.close()
        ids = np.array([r[0] for r in rows])
        V = np.array([r[1] for r in rows], dtype=np.float64)
        # query set from the SAME predicate the Spark side filters on
        # (vec_id < N_QUERIES), with qid -> row index mapped via ids —
        # slicing ids[:N_QUERIES] assumed a contiguous 0..n-1 id space
        # and would silently compare different query sets on a gapped
        # one (r15 advice)
        row_of = {int(v): j for j, v in enumerate(ids)}
        queries = sorted(int(v) for v in ids if v < S.N_QUERIES)
        truth = {}
        for qid in queries:
            qi = row_of[qid]
            sims = V @ V[qi]
            sims[qi] = -np.inf
            truth[qid] = set(
                int(ids[j]) for j in np.lexsort((ids, -sims))[:TOP_K]
            )

        q = emb.filter(F.col("vec_id") < S.N_QUERIES).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
        )

        def mat_rows(df):
            return df.collect()

        # Spark brute-force anchor (q_sim_search shape, same corpus)
        pairs = emb.join(F.broadcast(q), F.col("qid") != F.col("vec_id"))
        scored = pairs.select("qid", "vec_id", F.expr(S._DOT).alias("cos"))
        from pyspark.sql import Window

        w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
        bf = (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= TOP_K)
        )
        mat_rows(bf)  # warmup
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            mat_rows(bf)
            ts.append(time.perf_counter() - t0)
        t_bf = round(min(ts), 2)
        print(f"brute force (full scan): {t_bf}s")

        # driver-side replica of the probe ranking (the exact chain
        # order), so cells_hit reports the ACTUAL distinct probed cells —
        # len(queries)*nprobe is only an upper bound when queries share
        # cells (r15 review)
        cl = sorted((c.cid, list(c.ce)) for c in carr.collect()[0].cl)
        cent_ids = np.array([c for c, _ in cl])
        C = np.array([v for _, v in cl], dtype=np.float64)

        def probed_cells(nprobe: int) -> int:
            hit = set()
            for qi in range(len(queries)):
                acc = np.zeros(len(C))
                for j in range(C.shape[1]):
                    acc = acc + (C[:, j] - V[qi, j]) ** 2
                order = np.lexsort((np.arange(len(C)), acc))[:nprobe]
                hit.update(int(cent_ids[k]) for k in order)
            return len(hit)

        print(f"{'nprobe':>6} {'wall_s':>7} {'recall@10':>9} "
              f"{'cells_hit':>9} {'vs_brute':>8}")
        for nprobe in (1, 2, 4, 8, 16):
            if nprobe > cells:
                break
            res = S.ivf_probe_store(
                spark, store, carr, q, nprobe=nprobe, top_k=TOP_K
            )
            got = mat_rows(res)  # warmup + result
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                got = mat_rows(
                    S.ivf_probe_store(
                        spark, store, carr, q, nprobe=nprobe, top_k=TOP_K
                    )
                )
                ts.append(time.perf_counter() - t0)
            wall = round(min(ts), 2)
            by_q: dict[int, set] = {}
            for r in got:
                by_q.setdefault(int(r.qid), set()).add(int(r.vec_id))
            hit = sum(
                len(truth[qid] & by_q.get(qid, set())) for qid in queries
            )
            recall = hit / (len(queries) * TOP_K)
            print(
                f"{nprobe:>6} {wall:>7} {recall:>9.2f} "
                f"{probed_cells(nprobe):>9} "
                f"{round(t_bf / wall, 2):>8}x"
            )
        return 0
    finally:
        S.KMEANS_K = old_k


if __name__ == "__main__":
    raise SystemExit(main())
