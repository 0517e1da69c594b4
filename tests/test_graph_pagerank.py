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
