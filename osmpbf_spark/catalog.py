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
    """
    if name == "events":
        # the driver runs queries under ITS OWN SparkSession (not
        # get_spark), so ensure the nanos conf here too — a vanilla session
        # hard-fails on TIMESTAMP(NANOS) parquet otherwise
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


# Queries the round-2 driver already verified green (rows+schema+hash all
# true in CORRECTNESS_r02.json). The driver's correctness window covers only
# the FIRST 50 registered queries, so ``_import_all`` registers everything
# NOT in this set first: the similarity/text/UDF/PBF/streaming tail and the
# three previously hash-red oracles get hard driver rows this round, while
# the battle-tested relational basics rotate to the back of the line.
_R02_GREEN = frozenset(
    {
        "q_dedup_exact", "q_dedup_ngram", "q_dedup_clusters", "q_dedup_embed",
        "q_decontaminate", "q_grid_agg", "q_multimodal", "q_multimodal_frames",
        "q_scan_project", "q_filter_pred", "q_agg_basic", "q_agg_distinct",
        "q_agg_rollup", "q_agg_cube", "q_agg_gsets", "q_approx_cd",
        "q_having", "q_join_inner", "q_join_left", "q_join_semi",
        "q_join_anti", "q_join_broadcast", "q_join_range", "q_join_skew_salt",
        "q_pivot", "q_percentile", "q_asof_join", "q_sample_stratified",
        "q_window_lead_lag", "q_sort_limit", "q_set_union", "q_set_intersect",
        "q_set_except", "q_window_rank", "q_window_frame", "q_str_funcs",
        "q_map_funcs", "q_date_funcs", "q_math_funcs", "q_case_null",
        "q_json_funcs", "q_subq_scalar", "q_subq_in", "q_explode_pos",
        "q_join_full",
    }
)


def _import_all() -> None:
    """Import every operator module so decorators run, then order the
    registry for the driver's 50-query correctness window: never-verified
    (or previously red) queries first, round-2-green queries last."""
    from osmpbf_spark.operators import (  # noqa: F401
        dedup,
        grid,
        multimodal,
        relational,
        similarity,
        textstats,
        udfs,
    )
    from osmpbf_spark.sources import pbf_queries  # noqa: F401
    from osmpbf_spark.streaming import windows  # noqa: F401

    ordered = sorted(REGISTRY, key=lambda n: n in _R02_GREEN)
    reordered = {n: REGISTRY[n] for n in ordered}
    REGISTRY.clear()
    REGISTRY.update(reordered)
