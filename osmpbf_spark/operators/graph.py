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

# ONE definition of the event-derived edge list, shared by every graph
# operator and oracle (changing the derivation means one edit here)
_EDGE_CTE = f"""SELECT DISTINCT user_id % {PR_NODES} AS src,
                 (user_id + 3 * event_id) % {PR_NODES} AS dst
          FROM events
          WHERE user_id % {PR_NODES} <> (user_id + 3 * event_id) % {PR_NODES}"""


def _edges(ev: DataFrame, dedup: bool = True) -> DataFrame:
    """Directed edges (src, dst), self-loops dropped — the Spark twin of
    _EDGE_CTE. ``dedup=False`` skips the directed DISTINCT for callers
    that immediately re-dedup on a coarser key (q_triangle_count's
    undirected normalization subsumes it — a second distinct exchange
    over the full edge multiset would be pure waste)."""
    src = (F.col("user_id") % PR_NODES).alias("src")
    dst = ((F.col("user_id") + 3 * F.col("event_id")) % PR_NODES).alias("dst")
    e = ev.select(src, dst).filter(F.col("src") != F.col("dst"))
    return e.distinct() if dedup else e


def _pagerank_oracle() -> str:
    parts = [
        f"""WITH nodes AS (SELECT unnest(range(0, {PR_NODES})) AS id),
    e AS ({_EDGE_CTE}),
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
    edges = (
        _edges(ev)
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


def _triangle_oracle() -> str:
    return f"""
    WITH d AS ({_EDGE_CTE}),
    u AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM d),
    deg AS (SELECT n, COUNT(*) AS dg FROM (
        SELECT a AS n FROM u UNION ALL SELECT b AS n FROM u) GROUP BY n),
    o AS (SELECT CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND u.a < u.b)
                      THEN u.a ELSE u.b END AS s,
                 CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND u.a < u.b)
                      THEN u.b ELSE u.a END AS t
          FROM u JOIN deg da ON da.n = u.a JOIN deg db ON db.n = u.b),
    w AS (SELECT e1.s AS apex, e1.t AS v, e2.t AS wv
          FROM o e1 JOIN o e2 ON e1.s = e2.s AND e1.t < e2.t),
    tri AS (SELECT w.apex FROM w
            JOIN u ON u.a = LEAST(w.v, w.wv) AND u.b = GREATEST(w.v, w.wv))
    SELECT apex AS node_id, COUNT(*) AS n_triangles
    FROM tri GROUP BY apex
    """


@query("q_triangle_count", oracle=_triangle_oracle(), tags=("graph",))
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counting over the undirected form of the
    event-derived link graph — the clustering-coefficient / community
    -density primitive, implemented as the textbook DEGREE-ORDERED
    node-iterator (node-iterator++): every undirected edge is oriented
    from its lower-(degree, id) endpoint to the higher one, wedges are
    enumerated only at each edge's smaller endpoint, and a triangle is
    closed by one equi-join of the wedge's outer pair back against the
    undirected edge set (normalized to (least, greatest) so the closing
    probe needs no orientation disjunction). Each triangle is counted
    exactly once, at its orientation-minimal apex.

    Why this shape at 100 TB: orientation bounds per-node wedge fanout
    by out-degree ≤ O(√m), so total wedge volume is O(m^1.5) instead of
    Σdeg² — the difference between feasible and not on a power-law web
    graph, where the highest-degree node alone would otherwise generate
    deg² wedges. All three joins are equi-joins on edge keys (shuffle =
    edge volume); the degree table is node-sized and broadcasts here
    (co-partitioned bucketed join at web scale, like q_pagerank's rank
    vector). Determinism: counts and degrees are exact integers; the
    (degree, id) tie-break makes the orientation total.
    """
    ev = load(spark, sf_dir, "events")
    und = (
        _edges(ev, dedup=False)
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)  # consumed by orientation AND closing join
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("dg"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("dg").alias("dga"))
    db = deg.select(F.col("n").alias("b"), F.col("dg").alias("dgb"))
    fwd = (F.col("dga") < F.col("dgb")) | (
        (F.col("dga") == F.col("dgb")) & (F.col("a") < F.col("b"))
    )
    o = (
        und.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("s"),
            F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("t"),
        )
    )
    e1 = o.select(F.col("s").alias("apex"), F.col("t").alias("v"))
    e2 = o.select(F.col("s").alias("apex"), F.col("t").alias("w"))
    wedges = e1.join(e2, "apex").filter(F.col("v") < F.col("w"))
    tri = wedges.join(
        und,
        (und["a"] == F.least("v", "w")) & (und["b"] == F.greatest("v", "w")),
    )
    return tri.groupBy(F.col("apex").alias("node_id")).agg(
        F.count("*").alias("n_triangles")
    )


# ---------------------------------------------------------------------------
# k-hop BFS shortest paths (frontier expansion — the traversal member of
# the graph family next to PageRank's damped iteration)
# ---------------------------------------------------------------------------

BFS_SEED = 0  # deterministic source node
BFS_K = 4  # hop bound


@query(
    "q_bfs_khop",
    oracle=f"""
    WITH RECURSIVE e AS ({_EDGE_CTE}),
    bfs(node, dist) AS (
      SELECT CAST({BFS_SEED} AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
      UNION
      SELECT e.dst, bfs.dist + 1
      FROM bfs JOIN e ON e.src = bfs.node
      WHERE bfs.dist < {BFS_K}
    )
    SELECT node, MIN(dist) AS dist FROM bfs GROUP BY node
    """,
    tags=("graph",),
)
def q_bfs_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-hop BFS from a seed node: exact shortest-path distances within
    BFS_K=4 hops over the shared event-derived link graph — the traversal
    primitive (crawl frontier expansion, influence radius) next to
    PageRank's damped iteration and the triangle counter's wedge join.
    The oracle is DuckDB's RECURSIVE CTE with UNION-dedup termination;
    Spark runs the same frontier expansion as K bounded join rounds —
    frontier JOIN edges -> next frontier minus visited — with the
    visited set broadcast each round (node universe is 128, so the
    broadcast is bounded; at planet scale the visited set becomes a
    bucketed anti-join and the frontier stays the small side). Distances
    are exact integers; a wrong frontier round, a lost dedup, or a
    revisit all change MIN(dist) somewhere and hash-mismatch.

    Per-hop plan, r08 shape (2.18s -> 1.43s at sf0.1): the broadcast
    anti-join against the visited set runs BEFORE the dedup, so the
    hop's ONLY exchange is one distinct over (expansion minus visited)
    — the r07 plan deduped first (an exchange over the full expansion)
    and anti-joined after, paying a second barrier per hop. Exactly one
    materialization per hop: `dist` localCheckpoints after the union
    (it feeds the next hop's anti-join, frontier filter, and the final
    result — three readers of one tiny frame), and the frontier is a
    FILTER of the checkpointed dist (dist == hop), never a separately
    checkpointed frame. The edge list materializes once (eager
    localCheckpoint, the q_pagerank discipline) so K rounds don't
    re-derive the DISTINCT. Everything stays driver-free.
    """
    ev = load(spark, sf_dir, "events")
    edges = _edges(ev).localCheckpoint(eager=True)
    # seed as a SQL VALUES LocalRelation (the q_join_range idiom):
    # createDataFrame routes even one row through applySchemaToPythonRDD
    # — ~0.25s of flat py4j/Python-worker overhead per query call
    dist = spark.sql(
        f"SELECT CAST({BFS_SEED} AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist"
    )
    for hop in range(1, BFS_K + 1):
        nxt = _bfs_hop(edges, dist, hop)
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
    return dist


def _bfs_hop(edges: DataFrame, dist: DataFrame, hop: int) -> DataFrame:
    """One frontier expansion: (edges ⋈ frontier) minus visited, then
    dedup — anti-join FIRST so the hop's single exchange (the distinct)
    sees only unvisited expansion rows. tests/test_plans.py freezes the
    one-exchange shape."""
    frontier = dist.filter(F.col("dist") == hop - 1).select(
        F.col("node").alias("src")
    )
    return (
        edges.join(F.broadcast(frontier), "src")
        .select(F.col("dst").alias("node"))
        .join(F.broadcast(dist.select("node")), "node", "left_anti")
        .distinct()
        .withColumn("dist", F.lit(hop).cast("long"))
    )
