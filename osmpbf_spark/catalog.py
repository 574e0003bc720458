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


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query under ``name`` with its DuckDB twin."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QueryDef(name, fn, oracle, tags, fn.__doc__ or "")
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
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


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


# Round-5 rotation for the driver's 50-query correctness window (the
# driver checks only the FIRST 50 registered queries each round; with 120
# registered, ordering decides what gets a fresh hard row). Three tiers:
#
#   0. _R05_PRIORITY — must re-verify THIS round: the query added in r05
#      (q_pbf_changesets — first row ever), every query whose Spark code
#      changed in r05 (minhash map-only signature + md5 base hash,
#      _jaccard_pairs boundary filter, decontaminate window fold,
#      doc-pack integer div, both streaming LSH reshapes), the two
#      r02-green stragglers the r04 window had to rotate out
#      (q_explode_pos, q_join_full — 3 rounds old by now), and the ten
#      q_pbf_* queries (r03-green, but datasource/decode/encode/fixture
#      changed in BOTH r04 and r05 — the verdict flagged their greens as
#      the oldest rows sitting on touched code).
#   1. everything NOT in r04's checked window and not already tier 0:
#      their last hard row is r03, two rounds old this round — ordered
#      with the one spill-over (see below) last.
#   2. the r04-green tail, unchanged since — rotates to the back.
#
# 45 tier-0 (20 above + the TWENTY-FIVE queries round 5 added mid-round,
# which have never had a correctness row and therefore outrank every
# aged green: q_scd2 / q_merge_upsert / q_anomaly_zscore / q_join_5way /
# q_text_rarity / q_cluster_kmeans / s_upsert_stream / s_pbf_stream /
# q_multimodal_decode / q_incr_agg, then the later batches q_pagerank /
# q_dedup_semantic / q_inverted_index / q_pii_redact / s_anomaly_stream /
# q_session_funnel / q_token_pmi / s_funnel_stream / q_triangle_count /
# q_resample_locf / s_session_stream / q_bpe_train / s_enrich_stream /
# q_profile / s_tumble_append; plus q_dedup_simhash_exact, r04-green but
# r05-reshaped)
# + 32 tier-1 = 77 candidates for 50 slots: twenty-seven tier-1 queries
# spill to r06 (q_mix_sources joining via the text-tag parity sweep;
# q_array_hof / q_window_ntile / q_approx_percentile via
# test_relational.py's exact-parity sweep, the latter also by its
# rank-error pytest) and s_join_stream overflows to the tail of tier 1
# (re-exercised every round by test_streaming.py's stream-tag parity
# sweep), chosen as the most stable of the aged set — each is
# untouched since its r03 green AND independently re-exercised every
# round by pytest (s_dedup_stream by tests/test_streaming.py's real
# streaming run; s_tumble / s_slide / s_session / s_late / s_time_rollup
# batch twins likewise, s_late additionally by
# test_stream_watermark_drops_late; q_multimodal_agg by
# test_text_multimodal's multimodal-tag parity sweep; q_bpe_merge_count,
# q_text_stats, q_text_lang and q_text_quality by test_text_multimodal's
# text-tag parity sweep (q_text_quality also by
# test_quality_verdict_split), q_text_fingerprint, q_text_tokens_bpe and
# q_text_repetition likewise, and q_text_token_freq likewise plus its
# test_token_freq_is_take_ordered plan freeze; u_udf / u_udaf / u_udtf
# by tests/test_udfs.py; q_dedup_exact / q_dedup_ngram by
# tests/test_dedup.py's exact-parity checks; q_sim_search /
# q_vec_centroid / q_vec_quantize by tests/test_similarity.py's
# exact-parity checks), so a regression would surface in CI even while
# their driver rows age one extra round.
_R05_PRIORITY = (
    "q_scd2", "q_merge_upsert", "q_anomaly_zscore",
    "q_join_5way", "q_text_rarity", "q_cluster_kmeans",
    "s_upsert_stream", "s_pbf_stream", "q_multimodal_decode", "q_incr_agg",
    "q_pagerank", "q_dedup_semantic", "q_inverted_index", "q_pii_redact",
    "s_anomaly_stream", "q_session_funnel", "q_token_pmi",
    "s_funnel_stream", "q_triangle_count", "q_resample_locf",
    "s_session_stream", "q_bpe_train", "s_enrich_stream",
    "q_profile", "s_tumble_append",
    "q_pbf_changesets",
    "q_dedup_minhash", "q_dedup_near", "q_decontaminate", "q_doc_pack_chunks",
    "q_dedup_simhash_exact",  # r05-reshaped (bucket-agg pair expansion):
    # its r04 green sits on changed code — the exact class the r04
    # verdict told the rotation to front
    "s_dedup_near_stream", "s_dedup_embed_stream",
    "q_explode_pos", "q_join_full",
    "q_pbf_scan_nodes", "q_pbf_node_tags", "q_pbf_ways_bag", "q_pbf_grid_agg",
    "q_pbf_join_way_nodes", "q_pbf_relations", "q_pbf_meta", "q_pbf_pushdown",
    "q_pbf_compat_pig", "q_pbf_roundtrip",
)

# keys of CORRECTNESS_r04.json — the 50 queries the r04 driver verified
_R04_CHECKED = frozenset(
    {
        "q_dedup_near", "q_dedup_minhash", "q_dedup_simhash_exact",
        "q_dedup_clusters", "q_dedup_simhash", "q_dedup_embed",
        "q_decontaminate", "q_sim_search_ivf", "q_sim_search_lsh",
        "q_doc_pack", "q_doc_pack_chunks", "s_dedup_embed_stream",
        "s_dedup_near_stream", "q_multimodal", "q_multimodal_frames",
        "q_scan_project", "q_filter_pred", "q_agg_basic", "q_agg_distinct",
        "q_agg_rollup", "q_agg_cube", "q_agg_gsets", "q_approx_cd",
        "q_having", "q_join_inner", "q_join_left", "q_join_semi",
        "q_join_anti", "q_join_broadcast", "q_join_range", "q_join_skew_salt",
        "q_pivot", "q_percentile", "q_asof_join", "q_sample_stratified",
        "q_window_lead_lag", "q_sort_limit", "q_set_union", "q_set_intersect",
        "q_set_except", "q_window_rank", "q_window_frame", "q_str_funcs",
        "q_map_funcs", "q_date_funcs", "q_math_funcs", "q_case_null",
        "q_json_funcs", "q_subq_scalar", "q_subq_in",
    }
)

# the deliberate spill set: aged but most-stable, pytest-covered every
# round, spills to r06 (see above)
_R05_SPILL = (
    "s_dedup_stream",
    "s_tumble",
    "s_slide",
    "s_session",
    "s_late",
    "s_time_rollup",
    "q_multimodal_agg",
    "q_bpe_merge_count",
    "u_udf",
    "u_udaf",
    "u_udtf",
    "q_dedup_exact",
    "q_dedup_ngram",
    "q_sim_search",
    "q_vec_centroid",
    "q_vec_quantize",
    "q_text_stats",
    "q_text_lang",
    "q_text_quality",
    "q_text_token_freq",
    "q_text_fingerprint",
    "q_text_tokens_bpe",
    "q_text_repetition",
    "q_mix_sources",
    "q_array_hof",
    "q_window_ntile",
    "q_approx_percentile",
)


def _window_tier(name: str) -> int:
    if name in _R05_PRIORITY:
        return 0
    if name in _R05_SPILL:
        return 2
    return 1 if name not in _R04_CHECKED else 3


def _import_all() -> None:
    """Import every operator module so decorators run, then order the
    registry for the driver's 50-query correctness window (tiers above)."""
    from osmpbf_spark.operators import (  # noqa: F401
        cdc,
        dedup,
        graph,
        grid,
        multimodal,
        relational,
        similarity,
        textstats,
        udfs,
    )
    from osmpbf_spark.sources import pbf_queries  # noqa: F401
    from osmpbf_spark.streaming import windows  # noqa: F401

    ordered = sorted(REGISTRY, key=_window_tier)
    reordered = {n: REGISTRY[n] for n in ordered}
    REGISTRY.clear()
    REGISTRY.update(reordered)
