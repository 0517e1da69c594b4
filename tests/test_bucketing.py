"""Bucketed-table co-location: the written clustering must eliminate
every Exchange from joins and aggregations on the bucket key."""

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from ingest_pipeline_spark.sources.bucketing import (
    co_located_join,
    ensure_database,
    write_bucketed,
)
from ingest_pipeline_spark.tables import load_table


@pytest.fixture(scope="module")
def bucket_db(spark, sf_dir):
    loc = tempfile.mkdtemp(prefix="bucket_db_")
    ensure_database(spark, "bucketdb", loc)
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "bucketdb.orders_b", "o_orderkey", 8)
    write_bucketed(lineitem, "bucketdb.lineitem_b", "o_orderkey", 8)
    yield "bucketdb"
    spark.sql("DROP DATABASE bucketdb CASCADE")
    shutil.rmtree(loc, ignore_errors=True)


def _no_broadcast(spark):
    return spark.conf.get("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_no_exchange(spark, bucket_db):
    prev = _no_broadcast(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_located_join(
            spark, "bucketdb.orders_b", "bucketdb.lineitem_b", "o_orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # the whole point: zero shuffles
        # and it's not just a plan artifact — the join produces rows
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_no_exchange(spark, bucket_db):
    agg = (
        spark.table("bucketdb.lineitem_b")
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "Exchange" not in plan
    assert agg.count() > 0


def test_mismatched_buckets_still_correct(spark, bucket_db, sf_dir):
    # a non-bucketed side falls back to a normal exchange — correctness
    # never depends on the physical layout
    cust = load_table(spark, sf_dir, "customer")
    joined = spark.table("bucketdb.orders_b").join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    )
    assert joined.count() == spark.table("bucketdb.orders_b").count()
