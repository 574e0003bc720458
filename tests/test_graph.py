"""q_pagerank: oracle parity plus an independent integer-arithmetic
replication of the 3-iteration trajectory in numpy/python."""

from __future__ import annotations

from osmpbf_spark.catalog import all_queries
from osmpbf_spark.operators.graph import PR_ITERS, PR_NODES
from tests.conftest import SF_DIR
from tests.parity import check_query

all_queries()


def test_pagerank_parity_and_trajectory(spark, duck):
    pdf, _ = check_query(spark, duck, SF_DIR, "q_pagerank")
    assert len(pdf) == PR_NODES

    # independent replication: same edge derivation, same ppm integer math
    rows = duck.sql(
        f"""SELECT DISTINCT user_id % {PR_NODES},
                   (user_id + 3 * event_id) % {PR_NODES}
            FROM events
            WHERE user_id % {PR_NODES} <> (user_id + 3 * event_id) % {PR_NODES}"""
    ).fetchall()
    out = {}
    for s, d in rows:
        out.setdefault(int(s), []).append(int(d))
    rank = {n: 1_000_000 for n in range(PR_NODES)}
    for _ in range(PR_ITERS):
        recv = {n: 0 for n in range(PR_NODES)}
        for s, dsts in out.items():
            c = rank[s] // len(dsts)
            for d in dsts:
                recv[d] += c
        rank = {n: 150_000 + (850_000 * recv[n]) // 1_000_000 for n in recv}
    got = dict(zip(pdf["node_id"].astype(int), pdf["rank_ppm"].astype(int)))
    assert got == rank

    # base-floor semantics: a node with no in-edges sits exactly at 0.15
    sinks = [n for n in range(PR_NODES) if all(n not in v for v in out.values())]
    for n in sinks:
        assert got[n] == 150_000
    assert min(got.values()) >= 150_000


def test_triangle_count_parity_and_replication(spark, duck):
    """q_triangle_count: oracle parity plus an independent brute-force
    triangle enumeration (set intersection over the undirected adjacency,
    no orientation) — totals and per-apex counts must agree with the
    degree-ordered oriented plan."""
    pdf, _ = check_query(spark, duck, SF_DIR, "q_triangle_count")
    assert len(pdf) > 0
    rows = duck.sql(
        f"""SELECT DISTINCT LEAST(user_id % {PR_NODES},
                                  (user_id + 3 * event_id) % {PR_NODES}),
                   GREATEST(user_id % {PR_NODES},
                            (user_id + 3 * event_id) % {PR_NODES})
            FROM events
            WHERE user_id % {PR_NODES} <> (user_id + 3 * event_id) % {PR_NODES}"""
    ).fetchall()
    adj = {}
    deg = {}
    for a, b in rows:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for n, s in adj.items():
        deg[n] = len(s)
    key = lambda n: (deg[n], n)
    expected = {}
    for a, b in rows:
        for c in adj[a] & adj[b]:
            apex = min((a, b, c), key=key)
            expected[apex] = expected.get(apex, 0) + 1
    # the edge loop visits each triangle once per incident edge (3x)
    expected = {k: v // 3 for k, v in expected.items() if v}
    got = dict(zip(pdf["node_id"].astype(int), pdf["n_triangles"].astype(int)))
    assert got == {k: v for k, v in expected.items() if v}


def test_bfs_khop_matches_python_bfs(spark, duck):
    """k-hop BFS: oracle parity plus an independent Python BFS over the
    same edge derivation — distances, the hop bound, and unreachable
    node absence all checked against a third implementation."""
    from collections import deque

    from osmpbf_spark.operators.graph import BFS_K, BFS_SEED, PR_NODES
    from tests.conftest import SF_DIR
    from tests.parity import check_query

    pdf, _ = check_query(spark, duck, SF_DIR, "q_bfs_khop")
    rows = duck.sql(
        f"SELECT DISTINCT user_id % {PR_NODES},"
        f" (user_id + 3 * event_id) % {PR_NODES} FROM events"
        f" WHERE user_id % {PR_NODES} <> (user_id + 3 * event_id) % {PR_NODES}"
    ).fetchall()
    adj: dict[int, list[int]] = {}
    for s, d in rows:
        adj.setdefault(int(s), []).append(int(d))
    expect = {BFS_SEED: 0}
    q = deque([BFS_SEED])
    while q:
        u = q.popleft()
        if expect[u] >= BFS_K:
            continue
        for v in adj.get(u, []):
            if v not in expect:
                expect[v] = expect[u] + 1
                q.append(v)
    got = {int(r.node): int(r.dist) for r in pdf.itertuples()}
    assert got == expect
    assert max(got.values()) <= BFS_K
