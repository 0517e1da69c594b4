"""Storage-layout utilities: bucketing for co-located joins, compaction.

At 100 TB the dominant cost of repeated joins on the same key (e.g.
lineitem↔orders on orderkey, files↔datasets on parent_uuid) is the
shuffle.  Bucketed tables persist the hash-partitioning so Catalyst
plans the join with ZERO Exchange on the bucketed sides — tested by
asserting no Exchange appears in the physical plan.

Local note: bucketBy requires saveAsTable (session catalog +
spark-warehouse dir); works the same on a cluster with a real
metastore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables — no shuffle on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def plan_has_exchange(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    return "Exchange" in plan


def compact(spark: SparkSession, path: str, out_path: str, target_partitions: int) -> None:
    """Small-files compaction: rewrite a parquet dir at a sane partition count."""
    spark.read.parquet(path).repartition(target_partitions).write.mode(
        "overwrite"
    ).parquet(out_path)
