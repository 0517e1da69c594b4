"""Distributed prefix aggregation (operators/prefix.py) — every
variant is checked bit-for-bit against Spark's own single-task global
window (the semantics oracle), across partition counts, so the
two-phase scan can never drift from ``... OVER (ORDER BY ...)``."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ingest_pipeline_spark.operators.prefix import (
    global_ntile,
    global_row_number,
    running_max_exclusive,
    running_sum,
)


@pytest.fixture(scope="module")
def points(spark):
    # deterministic, duplicate-heavy values under a unique tiebreak id
    df = spark.range(997).select(
        F.col("id"),
        (F.col("id") * 37 % 101).alias("v"),
        ((F.col("id") * 53 % 97)).cast("decimal(18,2)").alias("dec"),
    )
    return df.localCheckpoint(eager=True)


def _rows(df, *cols):
    return [tuple(r) for r in df.select(*cols).orderBy("id").collect()]


def test_running_sum_matches_global_window(spark, points):
    order = [F.asc("v"), F.asc("id")]
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    want = points.withColumn("cum", F.sum("dec").over(w))
    got = running_sum(points, order, "dec", "cum")
    assert _rows(got, "id", "cum") == _rows(want, "id", "cum")


def test_running_max_exclusive_matches_global_window(spark, points):
    order = [F.asc("v"), F.desc("id")]
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    want = points.withColumn("mx", F.max("dec").over(w))
    got = running_max_exclusive(points, order, "dec", "mx")
    assert _rows(got, "id", "mx") == _rows(want, "id", "mx")


def test_global_row_number_matches_global_window(spark, points):
    order = [F.desc("v"), F.asc("id")]
    w = Window.orderBy(*order)
    want = points.withColumn("rn", F.row_number().over(w).cast("long"))
    got = global_row_number(points, order, "rn")
    assert _rows(got, "id", "rn") == _rows(want, "id", "rn")


@pytest.mark.parametrize("k", [1, 2, 5, 7, 996, 997, 1000, 2000])
def test_global_ntile_matches_global_window(spark, points, k):
    # 997 rows: covers n % k != 0, n == k ± 1, and k > n
    order = [F.desc("v"), F.asc("id")]
    w = Window.orderBy(*order)
    want = points.withColumn("t", F.ntile(k).over(w).cast("long"))
    got = global_ntile(points, order, k, "t")
    assert _rows(got, "id", "t") == _rows(want, "id", "t")


def test_prefix_partition_invariance(spark, points):
    """The result is identical however many range partitions exist —
    the local stand-in for the 1000-executor accumulation hazard."""
    order = [F.asc("v"), F.asc("id")]
    base = running_sum(points, order, "dec", "cum")
    want = _rows(base, "id", "cum")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for n in ("1", "3"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            got = running_sum(points, order, "dec", "cum")
            assert _rows(got, "id", "cum") == want, f"partitions={n}"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_no_data_proportional_global_window_in_plan(spark, points):
    """The whole point: the only empty-partition window left operates
    on the per-partition totals (≤ shuffle partitions rows)."""
    order = [F.asc("v"), F.asc("id")]
    got = running_sum(points, order, "dec", "cum")
    plan = got._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    for ln in plan.splitlines():
        if "windowspecdefinition(" not in ln:
            continue
        inner = ln.split("windowspecdefinition(", 1)[1]
        first = inner.split(",", 1)[0]
        if " ASC" in first or " DESC" in first:  # empty partition spec
            assert "__prefix_pid" in first, ln


def test_grouped_row_number_matches_keyed_window(spark, points):
    from ingest_pipeline_spark.operators.prefix import grouped_row_number

    g = points.withColumn("grp", (F.col("id") % 3).cast("string"))
    g = g.localCheckpoint(eager=True)
    order = [F.asc("v"), F.asc("id")]
    w = Window.partitionBy("grp").orderBy(*order)
    want = g.withColumn("rn", F.row_number().over(w).cast("long")).withColumn(
        "n", F.count("*").over(Window.partitionBy("grp")).cast("long")
    )
    got = grouped_row_number(g, ["grp"], order, "rn", count_col="n")
    assert _rows(got, "id", "grp", "rn", "n") == _rows(
        want, "id", "grp", "rn", "n"
    )


def test_grouped_row_number_partition_invariant(spark, points):
    from ingest_pipeline_spark.operators.prefix import grouped_row_number

    g = points.withColumn("grp", (F.col("id") % 2).cast("string"))
    order = [F.asc("v"), F.asc("id")]
    base = None
    for parts in ("3", "17"):
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try:
            rows = _rows(
                grouped_row_number(g, ["grp"], order, "rn", count_col="n"),
                "id", "grp", "rn", "n",
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
        if base is None:
            base = rows
        else:
            assert rows == base


def test_running_sums_two_columns_match_global_window(spark, points):
    from ingest_pipeline_spark.operators.prefix import running_sums

    order = [F.asc("v"), F.asc("id")]
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    want = points.withColumn("ca", F.sum("dec").over(w)).withColumn(
        "cb", F.sum("v").over(w)
    )
    got = running_sums(points, order, [("dec", "ca"), ("v", "cb")])
    assert _rows(got, "id", "ca", "cb") == _rows(want, "id", "ca", "cb")
