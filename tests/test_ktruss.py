"""k-truss guards (operators/graph.py ktruss): multi-round cascade
peeling vs a pure-Python reference peel, the k<3 guard, in-truss
support reporting, and the sf0.001 non-empty oracle pin for the
registered query (the driver grades sf0.01)."""

import os
import sys
from itertools import combinations

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ingest_pipeline_spark.operators.graph import ktruss  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _reference_truss(edges, k):
    """Pure-Python peel; returns (surviving edge -> support, depth)."""
    E = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    depth = 0
    while True:
        adj = {}
        for u, v in E:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        supp = {(u, v): len(adj[u] & adj[v]) for u, v in E}
        bad = {e for e, s in supp.items() if s < k - 2}
        if not bad:
            return supp, depth
        depth += 1
        E -= bad


def _strip_plus_k5():
    # triangle strip 0..7 (edges (i,i+1) and (i,i+2)): under k=4 the
    # (i,i+2) border edges (support 1) die in round 1, which starves
    # the (i,i+1) spine edges -> round 2 kills the rest — a genuine
    # cascade; the K5 on 100..104 (every edge in 3 triangles) survives
    strip = [(i, i + 1) for i in range(7)] + [(i, i + 2) for i in range(6)]
    k5 = list(combinations(range(100, 105), 2))
    return strip + k5


def test_ktruss_cascade_matches_reference(spark):
    edges = _strip_plus_k5()
    want, depth = _reference_truss(edges, 4)
    assert depth >= 2, "fixture must exercise a multi-round cascade"
    assert want and all(e[0] >= 100 for e in want), "4-truss should be the K5"
    df = spark.createDataFrame(edges, "u bigint, v bigint")
    got = {
        (r["u"], r["v"]): r["support"] for r in ktruss(df, 4).collect()
    }
    assert got == want


def test_ktruss_k3_keeps_triangle_strip(spark):
    edges = _strip_plus_k5()
    want, _ = _reference_truss(edges, 3)
    df = spark.createDataFrame(edges, "u bigint, v bigint")
    got = {(r["u"], r["v"]): r["support"] for r in ktruss(df, 3).collect()}
    assert got == want
    # the strip survives k=3 (every edge in >= 1 triangle)
    assert any(e[0] < 100 for e in got)


def test_ktruss_rejects_k_below_3(spark):
    df = spark.createDataFrame([(1, 2)], "u bigint, v bigint")
    try:
        ktruss(df, 2)
    except ValueError as e:
        assert "k >= 3" in str(e)
    else:
        raise AssertionError("k=2 must raise")


def test_ktruss_empty_and_triangle_free(spark):
    empty = spark.createDataFrame([], "u bigint, v bigint")
    assert ktruss(empty, 3).count() == 0
    # a star has no triangles: 3-truss is empty
    star = spark.createDataFrame([(0, i) for i in range(1, 6)],
                                 "u bigint, v bigint")
    assert ktruss(star, 3).count() == 0


def test_registered_query_nonempty_oracle_at_sf0001(spark):
    from ingest_pipeline_spark.queries import oracle_sql, queries
    from tests.oracle_utils import compare_to_oracle

    df = queries()["graph_ktruss_copurchase"](spark, SF_DIR)
    assert df.count() > 0
    compare_to_oracle(df, oracle_sql()["graph_ktruss_copurchase"], SF_DIR)
