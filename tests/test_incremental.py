"""Mergeable rollup state: the merge identity, disjoint keys, and
read-time finalization."""

from decimal import Decimal

from pyspark.sql import functions as F

from ingest_pipeline_spark.operators.incremental import (
    finalize_rollup,
    merge_rollup,
    rollup_state,
)


def _rows(df):
    return {
        r[0]: (r["n"], r["sum_v"], r["min_v"], r["max_v"]) for r in df.collect()
    }


def test_merge_identity_exact(spark):
    df = spark.createDataFrame(
        [("a", 1.5), ("a", 2.25), ("b", -1.0), ("a", 0.125), ("b", 4.0)],
        "k string, v double",
    )
    direct = rollup_state(df, ["k"], "v")
    split = merge_rollup(
        rollup_state(df.filter(F.col("v") > 1), ["k"], "v"),
        rollup_state(df.filter(F.col("v") <= 1), ["k"], "v"),
    )
    assert _rows(direct) == _rows(split)


def test_merge_handles_keys_missing_from_a_slice(spark):
    a = spark.createDataFrame([("x", 1.0)], "k string, v double")
    b = spark.createDataFrame([("y", 2.0), ("y", 3.0)], "k string, v double")
    merged = _rows(merge_rollup(rollup_state(a, ["k"], "v"),
                                rollup_state(b, ["k"], "v")))
    assert merged["x"][0] == 1 and merged["y"][0] == 2
    assert merged["y"][1] == Decimal("5.000000")


def test_finalize_derives_avg(spark):
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "k string, v double")
    out = finalize_rollup(rollup_state(df, ["k"], "v")).collect()[0]
    assert out["avg_v"] == 1.5 and out["sum_v"] == 3.0
