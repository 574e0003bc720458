"""Query registry: every operator from SURVEY.md §2 registers here.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable plus, where the
semantics are ANSI-SQL-expressible, an exact DuckDB oracle twin. The driver
compares both at sf0.01 (row-count + schema + order-insensitive value-hash),
so column names are aliased identically on both sides and float aggregates go
through an exact-decimal path (see ``dsum``) to make the hash deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL twin; None -> driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}

# Oracle FIXTURES: full QueryDefs kept for CI parity (tests/parity.py
# resolves names here too) but excluded from all_queries()/all_oracles(),
# i.e. from the driver's correctness window and from bench.py. The one
# resident is q_dedup_semantic's fixed-k form — a deliberately quadratic
# pure-SQL-oracle shape whose only remaining job is anchoring
# q_dedup_semantic_scalek's fixture-equivalence test (r09 verdict Next
# #7: it measured 48.7x wall at 10x data and sat in slowest10 every
# round; the production semantics live in scalek/q_dedup_embed).
FIXTURES: dict[str, QueryDef] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    fixture: bool = False,
):
    """Decorator registering a query under ``name`` with its DuckDB twin.
    ``fixture=True`` routes to FIXTURES: CI-tested, never driver-facing."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        target = FIXTURES if fixture else REGISTRY
        target[name] = QueryDef(name, fn, oracle, tags, fn.__doc__ or "")
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided parquet table (TESTDATA.md) and normalize
    every timestamp column to TimestampType (LTZ; sessions run in UTC).

    The driver's generator has shipped two parquet timestamp encodings
    across rounds, and the engine accepts both:

    - TIMESTAMP(NANOS): Spark's reader rejects it outright, so
      ``get_spark()`` sets ``spark.sql.legacy.parquet.nanosAsLong`` and the
      column arrives as epoch-nanos bigint; rebuilt here via integer
      division (epoch nanos ~1.6e18 exceed double's 2^53 exact range, so a
      float path would be off by 1µs on a few % of rows — the data is
      micro-precision, the truncation is lossless).
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as TIMESTAMP_NTZ,
      which ``unix_micros``/``to_utc_timestamp`` reject. Cast to LTZ — in a
      UTC session the wall-clock values are unchanged, so the DuckDB
      oracles (naive timestamps) hash identically.

    The NTZ walk covers top-level columns only — no current table nests a
    timestamp inside a struct/array; if the generator ever ships one,
    recurse over df.schema instead of the flat dtypes list.
    """
    # The NTZ->LTZ cast below and every epoch-based consumer (unix_micros,
    # F.window alignment) assume a UTC session, matching the oracles'
    # treatment of naive timestamps as UTC instants. The driver runs
    # queries under ITS OWN SparkSession (not get_spark), which inherits
    # the JVM default timezone — pin UTC unconditionally (runtime-settable
    # SQLConf), else a non-UTC host shifts instants and breaks hash parity.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # vanilla sessions also hard-fail on TIMESTAMP(NANOS) parquet
        # without the nanos conf
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/{name}.parquet"
    # Schema-inference cache (optimization guide §1/§6): a bare
    # spark.read.parquet() re-reads footers and infers the schema on the
    # DRIVER at every call (~80-100ms per table on this host); with ~160
    # registered queries x 1-3 tables each, inference alone was ~15-20% of
    # the bench total. The schema is planning METADATA, not data — cache
    # the schema Spark itself inferred, keyed by the same
    # (file, size, mtime_ns) identity table_row_count uses, and replay it
    # via spark.read.schema() so repeat loads skip inference exactly the
    # way a catalog-backed (Hive/Iceberg) table would. Results still
    # compute from the parquet files on every invocation; a rewritten
    # file changes the identity key and re-infers.
    df = read_parquet_cached(spark, path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


# planning-time parquet row counts, keyed by (file, size, mtime_ns) —
# the index_blocks_cached identity pattern. Bounded FIFO; driver-side
# only, never shipped to executors.
_ROW_COUNT_CACHE: dict[tuple, int] = {}
_ROW_COUNT_CACHE_MAX = 1024

# inferred-schema cache for load(): same identity scheme, same bound.
# Holds StructType objects (driver-side planning metadata only).
_SCHEMA_CACHE: dict[tuple, object] = {}


def _file_identity(path: str) -> tuple | None:
    """(path, size, mtime_ns) identity of a parquet file or, for a
    directory layout (flat parts or partitioned subdirs), the sorted
    tuple of per-part identities from a recursive walk (dot/underscore
    entries skipped — the partition-discovery convention). None when the
    path cannot be stat'ed or the directory holds no parquet files yet
    (caller falls back to a plain inferring read, which raises the real
    error); the path itself leads the tuple so two directories with
    identical part listings never collide."""
    import os

    try:
        if os.path.isdir(path):
            parts = []
            for dirpath, dirnames, filenames in os.walk(path):
                dirnames[:] = sorted(
                    d for d in dirnames if not d.startswith((".", "_"))
                )
                for f in sorted(filenames):
                    if f.endswith(".parquet"):
                        fp = os.path.join(dirpath, f)
                        st = os.stat(fp)
                        parts.append((fp, st.st_size, st.st_mtime_ns))
            if not parts:
                return None
            return (path, *parts)
        st = os.stat(path)
        return (path, st.st_size, st.st_mtime_ns)
    except OSError:
        return None


def read_parquet_cached(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet with the inferred schema replayed from
    _SCHEMA_CACHE on repeat reads of an unchanged path (see load()).
    Shared by load() and the persisted-store readers (IVF cell store,
    centroid frame) whose paths are stable across invocations."""
    key = _file_identity(path)
    schema = _SCHEMA_CACHE.get(key) if key is not None else None
    if schema is None:
        df = spark.read.parquet(path)
        if key is not None:
            while len(_SCHEMA_CACHE) >= _ROW_COUNT_CACHE_MAX:
                _SCHEMA_CACHE.pop(next(iter(_SCHEMA_CACHE)))
            _SCHEMA_CACHE[key] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    return df


def table_row_count(sf_dir: str, name: str) -> int:
    """Exact row count of one driver-provided parquet table from FOOTER
    METADATA ONLY — no Spark job, no data pages read (r15 verdict Next
    #2: the size-dispatch regime probes used ``df.count()``, a full
    corpus pass per invocation at 100 TB just to pick a code path;
    parquet footers carry the exact count for free, and a (path, size,
    mtime_ns)-keyed cache makes repeat invocations zero-I/O). Handles
    both single-file tables (the driver's layout) and directory-of-parts
    layouts (anything the engine's own writers produce)."""
    import os

    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    else:
        files = [path]
    total = 0
    for f in files:
        st = os.stat(f)
        key = (f, st.st_size, st.st_mtime_ns)
        n = _ROW_COUNT_CACHE.get(key)
        if n is None:
            import pyarrow.parquet as pq

            n = pq.ParquetFile(f).metadata.num_rows
            while len(_ROW_COUNT_CACHE) >= _ROW_COUNT_CACHE_MAX:
                _ROW_COUNT_CACHE.pop(next(iter(_ROW_COUNT_CACHE)))
            _ROW_COUNT_CACHE[key] = n
        total += n
    return total


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Register tables as temp views for spark.sql-based queries. Pass the
    subset a query actually reads — registering all ten re-reads ten parquet
    footers per call, pure overhead for a two-table query."""
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


# --- deterministic float-aggregation helpers -------------------------------
#
# Double-sum order differs between engines (and between runs, under AQE), so
# any SUM(double) is hash-unstable. All money/quantity columns in this schema
# are 2-decimal, so the exact path is INTEGER CENTS: round(x*100) -> BIGINT
# sum -> /100.0. Integer sums are order-independent and stay inside
# whole-stage codegen's long adder; the earlier decimal(18,2) recipe was
# equally exact but ~2x slower (measured 1.54s -> 0.74s on q_agg_basic at
# sf0.1 — decimal aggregation buffers don't vectorize). Rounding mode is
# irrelevant: x is a 2-decimal value, so x*100 is within 1 ulp of an
# integer on both engines. The final /100.0 is exact while the cent total
# stays below 2^53 (~$90T per group — re-split groups before that).
# Averages are one IEEE double division of two exact operands.


def fanout(df: DataFrame, n: int | None = None) -> DataFrame:
    """Rebalance a small unsplittable scan across cores before an
    expression-heavy stage.

    The synthetic testdata parquet files are single-row-group, so Spark's
    scan gives them exactly ONE task no matter how many cores exist —
    every per-row-expensive expression (shingles, MinHash/SimHash UDFs,
    hyperplane dots) downstream of the scan runs single-threaded. One tiny
    round-robin shuffle (a dimension-sized table) unlocks full-width
    execution: q_dedup_ngram 1.40s -> 0.40s at sf0.1/local[32].

    At 100 TB this call is for DIMENSION-scale inputs only — fact scans
    have thousands of row groups and already parallelize; blindly
    repartitioning a fact table would shuffle the whole input."""
    return df.repartition(
        n or df.sparkSession.sparkContext.defaultParallelism
    )


def widened_distinct(df: DataFrame, *keys: str, n: int | None = None) -> DataFrame:
    """Full-width ``distinct()`` of a small-bytes/heavy-compute frame:
    hash-repartition on the row key BEFORE deduplicating.

    A candidate-pair frame is a few bytes per row, so a bare
    ``distinct()``'s ENSURE_REQUIREMENTS exchange gets AQE-coalesced to
    ~1 partition and the final hash aggregate — plus everything
    downstream — runs on one task. The former fix, ``fanout(distinct())``,
    restored downstream width but kept the 1-task aggregate AND added a
    round-robin exchange whose mandatory local sort
    (spark.sql.execution.sortBeforeRepartition, guide §2.5) also ran on
    that one task. Repartitioning by the key columns first is strictly
    better on all three counts: the REPARTITION_BY_NUM exchange is
    AQE-exempt (width is guaranteed by the plan), equal rows co-locate so
    the aggregate reuses the exchange (no second one), and the dedup runs
    across all partitions. Result set identical — distinct is
    partitioning-independent. Measured on q_dedup_embed at sf0.1:
    2 Exchange -> 1, candidate stage 0.86s -> 0.49s."""
    return df.repartition(
        n or df.sparkSession.sparkContext.defaultParallelism, *keys
    ).distinct()


def dsum(col: str, alias: str):
    """Exact integer-cents sum of a 2-decimal money/quantity column."""
    return (
        (F.sum(F.round(F.col(col) * 100).cast("long")).cast("double") / 100.0)
        .alias(alias)
    )


def davg(col: str, alias: str):
    """Deterministic average: exact cents sum / count, one double divide."""
    return (
        F.sum(F.round(F.col(col) * 100).cast("long")).cast("double")
        / 100.0
        / F.count(F.col(col))
    ).alias(alias)


def sql_dsum(col: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(ROUND({col} * 100) AS BIGINT)) AS DOUBLE) / 100.0"
        f" AS {alias}"
    )


def sql_davg(col: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(ROUND({col} * 100) AS BIGINT)) AS DOUBLE) / 100.0"
        f" / COUNT({col}) AS {alias}"
    )


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _import_all()
    return {name: q.fn for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _import_all()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


# Round-18 rotation for the driver's 50-query correctness window (the
# driver checks only the FIRST 50 registered queries each round; with
# len(REGISTRY) registered, ordering decides what gets a fresh hard
# row). Composition, continuing the stamp-freshness policy:
#
#   1. The sixteen r14-stamped deferrals named in the r17 rotation
#      note — the registry's oldest stamps. After r18 stamps land, no
#      registered stamp is older than r15.
#   2. Code CHANGED in r18 (optimization round — every change is
#      oracle-pinned, these get the fresh driver stamp): the IVF/kmeans
#      family (driver-local Lloyd trainer + driver-side probe-cell
#      ranking: q_cluster_kmeans, q_sim_search_ivf,
#      q_sim_search_ivf_probe), q_compact_files (footer-metadata
#      stats), s_dedup_near_stream (16-part source image), and the
#      r15-stamped streams the checkpoint-manager change touches
#      (s_tumble_stream, s_dedup_stream, s_dedup_append,
#      s_upsert_stream, s_dedup_embed_stream, s_pbf_stream — the other
#      affected streams carry r17 stamps already).
#   3. 23 of the 42 rows still carrying r15 stamps (oldest remaining
#      block, in r15-window order). The window holds 50, so nineteen
#      r15 rows defer to r19 (q_pbf_scan_nodes / q_pbf_way_area /
#      q_pbf_ways_bag / q_resample_interp / q_sample_topk_group /
#      q_set_except / q_sim_search / q_sim_search_lsh / q_text_bm25 /
#      q_text_fingerprint / q_text_lang / q_text_quality /
#      q_text_repetition / q_text_stats / q_text_token_freq /
#      q_text_tokens_bpe / q_trend_ols / q_twap / s_late) — every one
#      stays hash-compared against its DuckDB oracle in EVERY CI pass
#      (the per-family parametrized parity tests), so deferral costs
#      stamp freshness only, never verification coverage.
_R18_WINDOW = (
    # 1: the sixteen r14-stamped deferrals (r17 rotation note)
    "q_bpe_encode",
    "q_bpe_train",
    "q_corpus_mix",
    "q_doc_pack",
    "q_doc_pack_chunks",
    "q_pii_redact",
    "q_resample_locf",
    "q_text_rarity",
    "q_token_pmi",
    "q_dedup_ngram",
    "q_multimodal_agg",
    "q_multimodal_decode",
    "q_multimodal_frames",
    "q_pbf_tag_filter",
    "q_pbf_zorder",
    "s_tumble_append",
    # 2: r18-changed code
    "q_sim_search_ivf",
    "q_sim_search_ivf_probe",
    "q_cluster_kmeans",
    "q_compact_files",
    "s_dedup_near_stream",
    "s_tumble_stream",
    "s_dedup_stream",
    "s_dedup_append",
    "s_upsert_stream",
    "s_dedup_embed_stream",
    "s_pbf_stream",
    # 3: oldest remaining rows (r15), minus the nineteen deferrals
    "q_array_hof",
    "q_explode_pos",
    "q_incr_agg",
    "q_join_full",
    "q_merge_upsert",
    "q_anomaly_zscore",
    "q_session_funnel",
    "q_agg_cube",
    "q_agg_gsets",
    "q_attribution",
    "q_dedup_embed_scaleb",
    "q_fd_check",
    "q_inverted_index",
    "q_mix_sources",
    "q_pbf_changesets",
    "q_pbf_compat_pig",
    "q_pbf_grid_agg",
    "q_pbf_join_way_nodes",
    "q_pbf_meta",
    "q_pbf_multipolygon",
    "q_pbf_node_tags",
    "q_pbf_pushdown",
    "q_pbf_relations",
)

_R18_RANK = {n: i for i, n in enumerate(_R18_WINDOW)}


def _window_tier(name: str) -> int:
    return _R18_RANK.get(name, len(_R18_WINDOW))


def _import_all() -> None:
    """Import every operator module so decorators run, then order the
    registry for the driver's 50-query correctness window (tiers above)."""
    from osmpbf_spark.operators import (  # noqa: F401
        avi,
        cdc,
        compact,
        dedup,
        graph,
        grid,
        jpeg,
        multimodal,
        relational,
        similarity,
        textstats,
        udfs,
    )
    from osmpbf_spark.sources import pbf_queries  # noqa: F401
    from osmpbf_spark.streaming import windows  # noqa: F401

    # Phantom-entry guard (r07 postmortem: a window slot named a query
    # that was never registered; nothing failed and the driver silently
    # back-filled the slot, so the intended query got no correctness row).
    # The sweep CLI has the same guard for argv names
    # (scripts/sweep_oracles.py) — the window, which the driver actually
    # consumes, must fail just as loudly.
    phantom = [n for n in _R18_WINDOW if n not in REGISTRY]
    if phantom:
        raise RuntimeError(
            f"correctness-window names not in REGISTRY: {phantom} — "
            "register the query or remove the slot; a silent back-fill "
            "means the driver verifies something other than intended"
        )
    ordered = sorted(REGISTRY, key=_window_tier)
    reordered = {n: REGISTRY[n] for n in ordered}
    REGISTRY.clear()
    REGISTRY.update(reordered)
