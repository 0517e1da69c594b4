"""PageRank operator invariants (the oracle covers the registered query;
these pin the operator's math on graphs small enough to verify by hand)."""

import pytest
from pyspark.sql import functions as F

from ingest_pipeline_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_symmetric_pair_splits_evenly(spark):
    # two nodes linking to each other: rank stays uniform at 0.5
    e = _edges(spark, [(1, 2), (2, 1)])
    rows = {r["node"]: r["rank"] for r in pagerank(e, iterations=4).collect()}
    assert rows == {1: 0.5, 2: 0.5}


def test_rank_mass_conserved(spark):
    # undirected triangle plus a pendant: total rank mass stays 1
    und = [(1, 2), (2, 3), (3, 1), (3, 4)]
    e = _edges(spark, und + [(b, a) for a, b in und])
    ranks = pagerank(e, iterations=3)
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-9)
    # the degree-3 hub outranks the pendant
    rows = {r["node"]: r["rank"] for r in ranks.collect()}
    assert rows[3] > rows[4]


def test_deterministic_across_runs(spark):
    und = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
    e = _edges(spark, und + [(b, a) for a, b in und])
    a = sorted(map(tuple, pagerank(e, iterations=3).collect()))
    b = sorted(map(tuple, pagerank(e, iterations=3).collect()))
    assert a == b


def test_triangle_stats_known_graphs(spark):
    from ingest_pipeline_spark.operators.graph import triangle_stats

    # K4: 4 nodes, 6 edges, 4 triangles, 12 wedges, clustering 1.0
    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)], "u long, v long"
    )
    r = triangle_stats(k4).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles, r.n_wedges) == (4, 6, 4, 12)
    assert r.clustering == 1.0

    # path graph a-b-c: one wedge, no triangle
    path = spark.createDataFrame([(0, 1), (1, 2)], "u long, v long")
    r = triangle_stats(path).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles, r.n_wedges) == (3, 2, 0, 1)
    assert r.clustering == 0.0

    # hub star K1,5 plus one closing edge: exactly 1 triangle
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(1, 2)], "u long, v long"
    )
    r = triangle_stats(star).collect()[0]
    assert r.n_triangles == 1


def test_triangle_stats_empty_graph(spark):
    from ingest_pipeline_spark.operators.graph import triangle_stats

    e = spark.createDataFrame([], "u long, v long")
    r = triangle_stats(e).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (0, 0, 0)
    assert r.clustering is None


def test_triangle_stats_matches_brute_force_reference(spark):
    """Independent pure-Python check on a pseudo-random graph: the SQL
    oracle mirrors the same orientation algorithm, so an orientation
    bug would be invisible there — this counts triangles by neighbor-
    set intersection instead (the estimator-reference discipline)."""
    from ingest_pipeline_spark.operators.graph import triangle_stats

    # deterministic scale-free-ish graph: node i links to i*7 % 97 etc.
    edges = set()
    for i in range(97):
        for k in (7, 13, 29):
            j = (i * k + 3) % 97
            if i != j:
                edges.add((min(i, j), max(i, j)))
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    expected_tri = (
        sum(len(adj[u] & adj[v]) for u, v in edges) // 3
    )  # each triangle counted once per edge = 3 times
    expected_wedges = sum(
        len(n) * (len(n) - 1) // 2 for n in adj.values()
    )

    df = spark.createDataFrame(sorted(edges), "u long, v long")
    r = triangle_stats(df).collect()[0]
    assert r.n_edges == len(edges)
    assert r.n_nodes == len(adj)
    assert r.n_triangles == expected_tri, (r.n_triangles, expected_tri)
    assert r.n_wedges == expected_wedges
