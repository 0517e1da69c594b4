"""Boruvka MSF guards (operators/graph.py boruvka_mst).

The forest is UNIQUE under the (w, a, b) struct tiebreak, so the edge
set is held to EXACT equality with a pure-Python Kruskal (union-find,
same tiebreak) — on hand fixtures covering multi-component forests and
weight ties, and on the real co-purchase graph the registered
rows-only query runs on."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ingest_pipeline_spark.operators.graph import boruvka_mst  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _kruskal(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    tree = []
    for w, a, b in sorted((w, a, b) for a, b, w in edges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            tree.append((a, b, w))
    return set(tree)


def _spark_mst(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long, w long")
    return {(r.a, r.b, r.w) for r in boruvka_mst(df).collect()}


def test_hand_fixtures(spark):
    # two components + a weight tie (edges (1,2) and (3,4) both w=5):
    # the (w, a, b) order keeps the forest unique
    edges = [
        (1, 2, 5), (2, 3, 2), (1, 3, 4),          # triangle
        (10, 11, 1), (11, 12, 1), (10, 12, 9),    # second component
        (3, 4, 5),
    ]
    got = _spark_mst(spark, edges)
    want = _kruskal(edges)
    assert got == want
    # forest sizes: component {1,2,3,4} -> 3 edges, {10,11,12} -> 2
    assert len(got) == 5


def test_single_edge_and_empty(spark):
    assert _spark_mst(spark, [(7, 9, 3)]) == {(7, 9, 3)}
    df = spark.createDataFrame([], "a long, b long, w long")
    assert boruvka_mst(df).count() == 0


def test_chain_needs_multiple_rounds(spark):
    # a path graph: every round halves components; 9 nodes -> >= 3 rounds
    edges = [(i, i + 1, 100 - i) for i in range(1, 9)]
    assert _spark_mst(spark, edges) == _kruskal(edges)


def test_real_copurchase_graph_matches_kruskal(spark):
    from ingest_pipeline_spark import queries as q

    got = {
        (r.a, r.b, r.co_count)
        for r in q.graph_mst_copurchase(spark, SF_DIR).collect()
    }
    # rebuild the same edge list relationally, then Kruskal it in Python
    from pyspark.sql import functions as F

    from ingest_pipeline_spark.operators.baskets import copurchase_pairs
    from ingest_pipeline_spark.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    pairs = copurchase_pairs(items, "l_orderkey", "l_partkey", min_support=3)
    edges = [
        (r.part_a, r.part_b, -r.support) for r in pairs.collect()
    ]
    want = {(a, b, -w) for a, b, w in _kruskal(edges)}
    assert got == want and len(got) > 0


def test_unrolled_oracles_match_at_sf0001(spark):
    """The r12 materialized unrolled-round oracles for the two graph
    fixpoint queries, exercised at sf0.001 where BOTH results are
    non-empty (100 kcore rows after the LIMIT — 200 2-core survivors —
    and 188 MSF edges).  Since r13 the kcore query is a
    2-core/support>=2, so the DRIVER row at sf0.01 is also non-empty
    (1535 survivors, peel depth 3) — the sf0.001 pin here guards the
    depth-0 no-peel boundary instead."""
    from ingest_pipeline_spark.queries import oracle_sql, queries
    from tests.oracle_utils import compare_to_oracle

    qs, osql = queries(), oracle_sql()
    for name in ("graph_kcore_parts", "graph_mst_copurchase"):
        df = qs[name](spark, SF_DIR)
        assert df.count() > 0, name
        compare_to_oracle(df, osql[name], SF_DIR)
