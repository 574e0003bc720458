"""PBF lake compaction — block-transplant merge of small .osm.pbf files.

The parquet side's small-file pathology (operators/compact.py) has a PBF
twin: the engine's own sink writes one ``part-*.osm.pbf`` per partition
task and the streaming sink one per trigger, so a long-lived PBF lake
accumulates per-file open/header-walk cost at every plan (the exact cost
the r12 sidecar cache amortizes — but the steady-state fix is fewer
files, same as any lake). The reference world has the same tool gap:
``osmium merge`` exists but re-encodes; this pass does not.

The merge is a BYTE-LEVEL BLOCK TRANSPLANT: a PBF file is one OSMHeader
file block followed by self-contained OSMData file blocks (string tables
and delta chains restart per block — osmformat.proto; the reference
decodes each block independently, OsmPbfRecordReader.java:188-200), so
an output file is the first input's header bytes followed by every
input's data-block bytes copied verbatim. No decode, no re-encode, no
re-compress — pure sequential I/O at wire speed, the recipe bench.py's
20M-node stitcher proved and test_pbf pins for mixed primitives.
BlobHeader.indexdata rides inside the copied bytes, so planning-time
block pruning (kinds / id ranges / tag fingerprints) keeps working on
the compacted lake unchanged.

Scale shape: the driver plans groups from one file listing (first-fit by
size toward ``target_bytes`` — #files-sized state), and each group merge
is an independent sequential copy executed as one Spark task
(``parallelize(groups).map``; per-task imperative byte I/O is the one
legitimate RDD niche). Locality note (same caveat as the streaming file
sinks): executors write ``out_dir`` directly, so the directory must be
shared storage on a real cluster — local-mode tests and demos satisfy
this trivially.
"""

from __future__ import annotations

import os

from osmpbf_spark.sources.pbf import fs
from osmpbf_spark.sources.pbf.decode import index_blocks


def _index_file(path: str) -> tuple[int, int]:
    """(data_split, n_data_blocks) for one input: the byte offset where
    the OSMData region starts (end of the OSMHeader file block) and the
    number of OSMData blocks. One header walk serves both the copy
    boundary and the integrity check. Raises a diagnosable error on a
    headerless file (corrupt, or a foreign tool's output) instead of a
    bare StopIteration that PySpark would blur into a generic worker
    RuntimeError."""
    split = None
    n_data = 0
    for m in index_blocks(path):
        if m.block_type == "OSMHeader" and split is None:
            split = m.data_offset + m.data_size
        elif m.block_type == "OSMData":
            n_data += 1
    if split is None:
        raise ValueError(
            f"{path}: no OSMHeader block — refusing to transplant from "
            "a file the decoder could not plan"
        )
    return split, n_data


def plan_groups(
    paths: list[str], target_bytes: int
) -> list[list[str]]:
    """First-fit grouping of input files toward ``target_bytes`` output
    files, in name order (keeps any id-range ordering the lake already
    has, which keeps per-output id spans tight for min/max pruning)."""
    groups: list[list[str]] = []
    acc = 0
    for p in sorted(paths):
        st = fs.fs_stat(p)
        size = st[0] if st else 0
        if not groups or acc + size > target_bytes and acc > 0:
            groups.append([])
            acc = 0
        groups[-1].append(p)
        acc += size
    return [g for g in groups if g]


def merge_group(paths: list[str], out_path: str) -> dict:
    """Merge one group: first input's header + every input's data bytes,
    streamed in constant memory (seek + chunked copy — never the whole
    file resident; a multi-GB input would otherwise hold 2x its bytes in
    the Python worker). The merged file is then INDEX-VERIFIED before
    success is reported: its OSMData block count must equal the sum of
    the inputs' (the parquet twin's refuse-to-report-success discipline,
    operators/compact.py — a truncated or foreign input must surface
    here, not when a later scan hits garbage). Returns
    {file, n_inputs, n_blocks, bytes}."""
    import shutil as _sh

    total = 0
    expect_blocks = 0
    with open(out_path, "wb") as out:
        for i, p in enumerate(paths):
            split, n_data = _index_file(p)
            expect_blocks += n_data
            with open(p, "rb") as f:
                if i > 0:
                    f.seek(split)
                start = out.tell()
                _sh.copyfileobj(f, out, 1 << 20)
                total += out.tell() - start
    _, got_blocks = _index_file(out_path)
    if got_blocks != expect_blocks:
        raise RuntimeError(
            f"{out_path}: transplant block-count mismatch — inputs hold "
            f"{expect_blocks} OSMData blocks, merged file indexes "
            f"{got_blocks}; refusing to report success"
        )
    return {
        "file": out_path,
        "n_inputs": len(paths),
        "n_blocks": got_blocks,
        "bytes": total,
    }


def compact_pbf_files(
    spark,
    in_dir: str,
    out_dir: str,
    target_bytes: int = 256 * 1024 * 1024,
) -> list[dict]:
    """Compact every ``*.osm.pbf``/``*.pbf`` under ``in_dir`` into
    ~target-sized merged files in ``out_dir``. Group plan on the driver
    (one listing), one Spark task per output file. Returns the per-file
    stats list (#outputs-sized)."""
    paths = sorted(
        os.path.join(in_dir, f)
        for f in os.listdir(in_dir)
        if f.endswith((".pbf", ".osm.pbf"))
    )
    if not paths:
        raise ValueError(f"no PBF files under {in_dir}")
    os.makedirs(out_dir, exist_ok=True)
    groups = plan_groups(paths, target_bytes)
    jobs = [
        (g, os.path.join(out_dir, f"part-{i:05d}.osm.pbf"))
        for i, g in enumerate(groups)
    ]
    return (
        spark.sparkContext.parallelize(jobs, len(jobs))
        .map(lambda j: merge_group(j[0], j[1]))
        .collect()
    )
