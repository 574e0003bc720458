"""Graph operators over the event stream — the link-analysis surface a
training-data pipeline runs on its citation/link graph (page quality
priors for crawl curation, domain authority weighting).

The reference enables graph work only as downstream MapReduce jobs over
its records (README.md:20-35 — the grid example IS a degenerate
map+reduce over keyed records); PageRank is the canonical iterative
member of that family, and the classic Hadoop-era follow-up to the
reference's worked example. Connected components already live in
dedup.py (q_dedup_clusters); this module holds the damped-iteration
shape.

Exactness: ranks are parts-per-million BIGINTs and every update is
integer arithmetic — contrib = rank div out_degree, new_rank =
150000 + (850000 * Σcontrib) div 1000000 — so three chained Lloyd-style
iterations hash-match the oracle with no float drift anywhere (the same
all-integer trajectory discipline as q_cluster_kmeans's fixed-point
centroids). Mass lost to integer-div truncation and dangling nodes is
the classic simplified-PageRank semantics (the original Hadoop/Spark
example's form), identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from osmpbf_spark.catalog import load, query

PR_NODES = 128  # node universe: ids 0..127 (events map into it mod-128)
PR_ITERS = 3
_PPM = 1_000_000
_DAMP_PPM = 850_000
_BASE_PPM = 150_000


def _pagerank_oracle() -> str:
    parts = [
        f"""WITH nodes AS (SELECT unnest(range(0, {PR_NODES})) AS id),
    e AS (SELECT DISTINCT user_id % {PR_NODES} AS src,
                 (user_id + 3 * event_id) % {PR_NODES} AS dst
          FROM events
          WHERE user_id % {PR_NODES} <> (user_id + 3 * event_id) % {PR_NODES}),
    ed AS (SELECT src, dst, COUNT(*) OVER (PARTITION BY src) AS deg FROM e),
    r0 AS (SELECT id, CAST({_PPM} AS BIGINT) AS r FROM nodes)"""
    ]
    prev = "r0"
    for it in range(1, PR_ITERS + 1):
        parts.append(f"""
    c{it} AS (SELECT ed.dst, CAST(SUM(p.r // ed.deg) AS BIGINT) AS s
              FROM ed JOIN {prev} p ON p.id = ed.src GROUP BY ed.dst),
    r{it} AS (SELECT n.id,
                     {_BASE_PPM} + ({_DAMP_PPM} * COALESCE(c{it}.s, 0))
                       // {_PPM} AS r
              FROM nodes n LEFT JOIN c{it} ON n.id = c{it}.dst)""")
        prev = f"r{it}"
    return (
        ",".join(parts)
        + f"""
    SELECT id AS node_id, r AS rank_ppm FROM r{PR_ITERS}"""
    )


@query("q_pagerank", oracle=_pagerank_oracle(), tags=("graph",))
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank, PR_ITERS=3 synchronous iterations over the
    event-derived link graph (nodes 0..127; an edge per distinct
    (user_id mod 128 → (user_id + 3·event_id) mod 128) event pair,
    self-loops dropped) — the simplified-PageRank semantics of the
    classic Hadoop/Spark example: dangling mass is not redistributed,
    ranks are not normalized, base = 0.15, damping = 0.85.

    An ITERATIVE algorithm under the driver's single-SQL oracle, like
    q_cluster_kmeans: ranks are ppm-scaled BIGINTs, contributions are
    integer `div`, so the full 3-iteration trajectory is bit-identical
    across engines — no "approximately converged" escape hatch.

    Plan: the edge list is DISTINCT pairs out of a 128² universe, so it
    is bounded at 16k rows regardless of event volume — one shuffle
    builds it, a window count attaches out-degrees on the same
    partitioning, and an eager localCheckpoint pins it so the three
    iterations reuse the materialized graph instead of re-scanning
    events (the q_dedup_embed precedent). Per iteration the rank vector
    (≤128 rows) BROADCASTS to the edge list — contribution is map-side —
    and the only exchange is the groupBy(dst) partial aggregation, whose
    shuffle volume is ≤ edge-partition × nodes after map-side combine.
    At 100 TB (web-scale graphs, nodes ≫ broadcast threshold) the same
    loop co-partitions ranks and edges on src — both sides bucketed by
    node id, so each iteration is a zero-exchange bucket join plus the
    dst aggregation; the CI-proven bucketed-join shape in
    tests/test_plans.py::test_bucketed_join_eliminates_exchange is
    exactly that join. Driver holds nothing: the loop composes one lazy
    plan, 3 iterations deep, like q_cluster_kmeans's Lloyd loop.
    """
    ev = load(spark, sf_dir, "events")
    src = (F.col("user_id") % PR_NODES).alias("src")
    dst = ((F.col("user_id") + 3 * F.col("event_id")) % PR_NODES).alias("dst")
    edges = (
        ev.select(src, dst)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .withColumn("deg", F.count("*").over(Window.partitionBy("src")))
        .localCheckpoint(eager=True)
    )
    nodes = spark.range(0, PR_NODES).select(F.col("id").cast("long").alias("id"))
    ranks = nodes.select("id", F.lit(_PPM).cast("long").alias("r"))
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(F.broadcast(ranks), edges["src"] == ranks["id"])
            .select("dst", F.expr("r div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(F.broadcast(contrib), nodes["id"] == contrib["dst"], "left")
            .select(
                "id",
                (
                    F.lit(_BASE_PPM)
                    + F.expr(f"{_DAMP_PPM} * coalesce(s, 0L) div {_PPM}")
                ).alias("r"),
            )
        )
    return ranks.select(F.col("id").alias("node_id"), F.col("r").alias("rank_ppm"))
