"""range_join operator: bounds, bucket-boundary coverage, pair
uniqueness, alias guard, and the equi-join (no BNLJ) plan shape."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from ingest_pipeline_spark.operators.rangejoin import range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),
            (2, "u1", _ts("2024-01-01 11:59:30")),  # interval crosses a bucket edge
            (3, "u2", _ts("2024-01-01 10:00:00")),  # no right rows for u2
        ],
        "lid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, "u1", _ts("2024-01-01 10:00:00")),  # equal ts: excluded (strict)
            (11, "u1", _ts("2024-01-01 10:20:00")),  # inside lid=1 horizon
            (12, "u1", _ts("2024-01-01 10:30:00")),  # exactly at horizon: included
            (13, "u1", _ts("2024-01-01 12:10:00")),  # inside lid=2, next bucket
            (14, "u1", _ts("2024-01-01 13:00:00")),  # beyond every horizon
        ],
        "rid long, k string, rts timestamp",
    )
    return left, right


def test_range_join_bounds_and_buckets(spark):
    left, right = _frames(spark)
    pairs = range_join(left, right, "k", "ts", "rts", horizon_sec=1800)
    got = {(r["lid"], r["rid"]) for r in pairs.collect()}
    # lid=1: strict lower edge excludes rid=10, horizon edge includes rid=12
    # lid=2: rid=13 sits in the NEXT 30-min bucket — the explode must cover it
    assert got == {(1, 11), (1, 12), (2, 13)}
    # no pair is emitted twice (right row has exactly one bucket)
    assert pairs.count() == len(got)


def test_range_join_inclusive_lower_edge(spark):
    left, right = _frames(spark)
    pairs = range_join(
        left, right, "k", "ts", "rts", horizon_sec=1800, strict_after=False
    )
    got = {(r["lid"], r["rid"]) for r in pairs.collect()}
    assert (1, 10) in got


def test_range_join_rejects_colliding_columns(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="pre-alias"):
        range_join(left, right.withColumnRenamed("rts", "ts"), "k", "ts", "ts", 60)


def test_range_join_plan_is_equi_join(spark):
    left, right = _frames(spark)
    plan = (
        range_join(left, right, "k", "ts", "rts", horizon_sec=1800)
        ._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the interval predicate must NOT be the join itself — it's a
    # post-join codegen filter over the (key, bucket) equi-join
    assert "hashpartitioning" in plan or "BroadcastHashJoin" in plan


def test_geo_grid_join_complete_vs_brute_force(spark, sf_dir):
    """Grid bucketing is candidate pruning only: the pair set must
    equal the brute-force all-pairs radius filter."""
    from ingest_pipeline_spark.queries import queries
    from ingest_pipeline_spark.tables import register_views
    from pyspark.sql import functions as F

    out = {
        (r["s_suppkey"], r["c_custkey"])
        for r in queries()["geo_grid_join"](spark, sf_dir).collect()
    }
    t = register_views(spark, sf_dir)
    scale = 4503599627370496.0

    def xy(prefix, key):
        def u(axis):
            return (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{axis}:{prefix}:"), F.col(key).cast("string"))),
                        1, 13,
                    ), 16, 10,
                ).cast("long") / F.lit(scale)
            )
        return u("x"), u("y")

    cx, cy = xy("c", "c_custkey")
    sx, sy = xy("s", "s_suppkey")
    cust = t["customer"].select("c_custkey", cx.alias("x"), cy.alias("y"))
    supp = t["supplier"].select("s_suppkey", sx.alias("x"), sy.alias("y"))
    dx = F.col("s.x") - F.col("c.x")
    dy = F.col("s.y") - F.col("c.y")
    brute = {
        (r["s_suppkey"], r["c_custkey"])
        for r in supp.alias("s")
        .crossJoin(cust.alias("c"))
        .filter(dx * dx + dy * dy <= F.lit(0.02 * 0.02))
        .collect()
    }
    assert out == brute and len(out) > 0
