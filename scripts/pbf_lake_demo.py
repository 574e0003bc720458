"""PBF lake planning + scan at 100x-class scale (r12 verdict Next #4).

The r12 sidecar-cache work (gated thread-pool header walks + JSON
sidecars keyed by (path, size, mtime_ns) — sources/pbf/decode.py
index_blocks_cached, datasource.py _index_files) was measured at the
decode layer only. This script exercises the full registered-query
shape on a real many-file lake:

  1. Build a 200-file, 20M-node lake with the engine's own writer
     (100k nodes/file, 8k-node blocks — the real-world block size;
     ~13 block-aligned split candidates per file).
  2. COLD plan: empty sidecar dir, empty in-proc cache — time the
     driver-side partitions() walk (what every first action pays).
  3. WARM plan: in-proc cache cleared (a NEW driver image), sidecars
     on disk — time partitions() again. The engine must issue zero
     header reads here (pinned by test_pbf.py
     test_lake_replan_zero_header_walks).
  4. Run the q_pbf_grid_agg shape (reference README.md:24-35: 2048^2
     grid-bin + count) over the lake end-to-end and report scan
     throughput.

Usage: python scripts/pbf_lake_demo.py  [--files 200] [--nodes 100000]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

LAKE = "/tmp/pbf_lake_200"
MARKER = "_built_v1"


def build_lake(n_files: int, nodes_per_file: int) -> None:
    from osmpbf_spark.sources.pbf import encode

    marker = f"{LAKE}/{MARKER}_{n_files}x{nodes_per_file}"
    if os.path.exists(marker):
        return
    shutil.rmtree(LAKE, ignore_errors=True)
    os.makedirs(LAKE, exist_ok=True)
    for i in range(n_files):
        rng = np.random.RandomState(1000 + i)
        ids = (
            np.cumsum(rng.randint(1, 5, nodes_per_file))
            + i * 10 * nodes_per_file
        )
        lat7 = rng.randint(-900_000_000, 900_000_000, nodes_per_file)
        lon7 = rng.randint(-1_800_000_000, 1_800_000_000, nodes_per_file)
        blocks = [
            {
                "nodes": {
                    "id": ids[j : j + 8000],
                    "lat_nano": lat7[j : j + 8000] * 100,
                    "lon_nano": lon7[j : j + 8000] * 100,
                    "tags": [None] * len(ids[j : j + 8000]),
                }
            }
            for j in range(0, nodes_per_file, 8000)
        ]
        encode.write_pbf(f"{LAKE}/part-{i:05d}.osm.pbf", blocks)
    with open(marker, "w") as fh:
        fh.write("ok")


TAG_LAKE = "/tmp/pbf_lake_tags"


def build_tag_lake(n_files: int, nodes_per_file: int) -> int:
    """A lake where the tag of interest is SPARSE the way a real planet
    extract is: every 4th file carries ONE block of highway-tagged nodes
    (8k rows); every other block is untagged, so its indexdata
    fingerprint is 0 and a tag_key scan can prove absence at planning
    time. Returns the number of tagged rows written."""
    from osmpbf_spark.sources.pbf import encode

    marker = f"{TAG_LAKE}/{MARKER}_{n_files}x{nodes_per_file}"
    block_rows = 8000
    # tagged rows = one full first block per every-4th file
    tagged_rows = min(block_rows, nodes_per_file) * len(range(0, n_files, 4))
    if os.path.exists(marker):
        return tagged_rows
    shutil.rmtree(TAG_LAKE, ignore_errors=True)
    os.makedirs(TAG_LAKE, exist_ok=True)
    for i in range(n_files):
        rng = np.random.RandomState(2000 + i)
        ids = (
            np.cumsum(rng.randint(1, 5, nodes_per_file))
            + i * 10 * nodes_per_file
        )
        lat7 = rng.randint(-900_000_000, 900_000_000, nodes_per_file)
        lon7 = rng.randint(-1_800_000_000, 1_800_000_000, nodes_per_file)
        blocks = []
        for j in range(0, nodes_per_file, block_rows):
            n = len(ids[j : j + block_rows])
            tagged = i % 4 == 0 and j == 0
            blocks.append(
                {
                    "nodes": {
                        "id": ids[j : j + block_rows],
                        "lat_nano": lat7[j : j + block_rows] * 100,
                        "lon_nano": lon7[j : j + block_rows] * 100,
                        "tags": [{"highway": "residential"}] * n
                        if tagged
                        else [None] * n,
                    }
                }
            )
        encode.write_pbf(f"{TAG_LAKE}/part-{i:05d}.osm.pbf", blocks)
    with open(marker, "w") as fh:
        fh.write("ok")
    return tagged_rows


def tag_pushdown_demo(spark, n_files: int, nodes_per_file: int) -> None:
    """Tag-filter pushdown at LAKE scale (r13 verdict Next #6): blocks
    skipped/read at planning time and the end-to-end wall vs an
    unfiltered scan — the osmium-extract use case (reference
    README.md:46-55) at the many-file shape."""
    from pyspark.sql import functions as F

    from osmpbf_spark.sources.pbf.datasource import OsmPbfReader, read_pbf

    t0 = time.perf_counter()
    expect = build_tag_lake(n_files, nodes_per_file)
    print(
        f"tag lake: {n_files} files, tagged rows {expect} "
        f"(build/check {round(time.perf_counter() - t0, 1)}s)"
    )

    def n_blocks(**opts) -> int:
        parts = OsmPbfReader({"path": TAG_LAKE, **opts}, None).partitions()
        return sum(len(p.ranges) for p in parts)

    total = n_blocks()
    kept = n_blocks(tag_key="highway")
    print(
        f"planning: {total} blocks total, {kept} kept under "
        f"tag_key=highway ({total - kept} skipped, "
        f"{round(100 * (total - kept) / total, 1)}%)"
    )

    def scan_wall(**opts) -> tuple[float, int]:
        df = read_pbf(spark, TAG_LAKE, "node", **opts)
        df.count()  # warm
        t0 = time.perf_counter()
        n = df.count()
        return time.perf_counter() - t0, n

    w_all, n_all = scan_wall()
    w_tag, n_tag = scan_wall(tag_key="highway")
    assert n_all == n_files * nodes_per_file, n_all
    assert n_tag == expect, (n_tag, expect)
    print(
        f"scan: unfiltered {round(w_all, 2)}s ({n_all} rows) vs "
        f"tag-filtered {round(w_tag, 2)}s ({n_tag} rows) — "
        f"{round(w_all / w_tag, 1)}x from block pruning"
    )


def compact_lake_demo(spark, n_files: int, nodes_per_file: int) -> None:
    """PBF lake compaction payoff (r14): block-transplant the many-file
    lake into ~32 MB files, then compare cold planning (header walks
    scale with file count) and scan wall before/after."""
    from pyspark.sql import functions as F  # noqa: F401

    from osmpbf_spark.sources.pbf import decode
    from osmpbf_spark.sources.pbf.compact import compact_pbf_files
    from osmpbf_spark.sources.pbf.datasource import OsmPbfReader, read_pbf

    out = "/tmp/pbf_lake_compacted"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    stats = compact_pbf_files(
        spark, LAKE, out, target_bytes=32 * 1024 * 1024
    )
    wall = round(time.perf_counter() - t0, 2)
    in_bytes = sum(
        os.path.getsize(os.path.join(LAKE, f))
        for f in os.listdir(LAKE)
        if f.endswith(".pbf")
    )
    print(
        f"pbf compact: {n_files} files -> {len(stats)} files "
        f"({round(in_bytes / 2**20, 1)} MB), merge wall {wall}s"
    )

    def cold_plan(path: str) -> tuple[float, int]:
        decode._INDEX_CACHE.clear()
        t0 = time.perf_counter()
        parts = OsmPbfReader({"path": path}, None).partitions()
        return time.perf_counter() - t0, len(parts)

    pb, nb = cold_plan(LAKE)
    pa, na = cold_plan(out)
    print(
        f"cold planning: {round(pb * 1000, 1)}ms/{nb} parts (fragmented) "
        f"-> {round(pa * 1000, 1)}ms/{na} parts (compacted), "
        f"{round(pb / pa, 1)}x"
    )

    def scan_wall(path: str) -> tuple[float, int]:
        df = read_pbf(spark, path, "node")
        df.count()  # warm
        t0 = time.perf_counter()
        n = df.count()
        return time.perf_counter() - t0, n

    wb, cb = scan_wall(LAKE)
    wa, ca = scan_wall(out)
    assert cb == ca == n_files * nodes_per_file, (cb, ca)
    print(
        f"scan: fragmented {round(wb, 2)}s -> compacted {round(wa, 2)}s "
        f"({round(wb / wa, 2)}x), {ca} rows both"
    )


def time_plan(cache_dir: str) -> tuple[float, int]:
    """One driver-side planning pass; returns (wall, n_partitions)."""
    from osmpbf_spark.sources.pbf.datasource import OsmPbfReader

    t0 = time.perf_counter()
    parts = OsmPbfReader(
        {"path": LAKE, "index_cache_dir": cache_dir}, None
    ).partitions()
    return time.perf_counter() - t0, len(parts)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=200)
    ap.add_argument("--nodes", type=int, default=100_000)
    args = ap.parse_args()

    from osmpbf_spark.session import get_spark
    from osmpbf_spark.sources.pbf import decode
    from osmpbf_spark.sources.pbf.datasource import read_pbf

    t0 = time.perf_counter()
    build_lake(args.files, args.nodes)
    print(f"lake: {args.files} files x {args.nodes} nodes "
          f"(build/check {round(time.perf_counter() - t0, 1)}s)")

    cache = f"{LAKE}_idxcache"
    shutil.rmtree(cache, ignore_errors=True)

    decode._INDEX_CACHE.clear()
    cold, nparts = time_plan(cache)
    n_sidecars = len(os.listdir(cache))
    decode._INDEX_CACHE.clear()  # NEW driver image: sidecars only
    warm, nparts2 = time_plan(cache)
    assert nparts == nparts2, "warm plan diverged from cold plan"
    print(
        f"planning: cold {round(cold * 1000, 1)}ms -> warm (sidecar) "
        f"{round(warm * 1000, 1)}ms  ({round(cold / warm, 1)}x), "
        f"{nparts} partitions, {n_sidecars} sidecars"
    )

    spark = get_spark("pbf_lake_demo")
    try:
        spark.sparkContext.setLogLevel("ERROR")
        from pyspark.sql import functions as F

        n_total = args.files * args.nodes

        def grid_agg():
            nodes = read_pbf(
                spark, LAKE, "node", index_cache_dir=cache
            )
            tile = (
                F.floor((F.col("lat") + 90) * 2048 / 180) * 2048
                + F.floor((F.col("lon") + 180) * 2048 / 360)
            ).cast("bigint")
            return nodes.groupBy(tile.alias("tile")).agg(
                F.count("*").alias("cnt")
            )

        # warmup (codegen, python workers), then timed
        grid_agg().write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        grid_agg().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(
            f"q_pbf_grid_agg shape over the lake: {round(dt, 2)}s, "
            f"{round(n_total / dt / 1e6, 2)} Mnodes/s"
        )
        cnt = grid_agg().agg(F.sum("cnt")).collect()[0][0]
        assert cnt == n_total, f"scan lost rows: {cnt} != {n_total}"
        print(f"row-count check: {cnt} == {n_total} OK")
        tag_pushdown_demo(spark, args.files, args.nodes)
        compact_lake_demo(spark, args.files, args.nodes)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
