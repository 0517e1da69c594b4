"""Bucketed tables: shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of a fact-fact join is the shuffle.  If
both tables are WRITTEN bucketed (hash-clustered + optionally sorted)
on the join key with the same bucket count, Spark's scan reports the
hash partitioning to Catalyst and the SortMergeJoin needs NO Exchange
on either side — the join runs entirely map-side, stage-fused with
the scans.  The same applies to groupBy on the bucket key.

This is the write-once/join-many contract a curated warehouse uses:
pay one clustering shuffle at ingest, then every downstream join and
rollup on that key is exchange-free.  (The reference pays the inverse
cost — re-grouping pandas frames per run, e.g. the per-dataset
regroupings in dags/launch_checksums.py:273-354.)

``write_bucketed`` targets a named catalog database so tests (and
embedded uses) can point storage at a scratch LOCATION; bucket
metadata only survives via the catalog (``saveAsTable``), never plain
``.parquet()`` writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def ensure_database(spark: SparkSession, name: str, location: str) -> None:
    """Create (idempotently) a catalog database rooted at ``location``."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name} LOCATION '{location}'")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed by ``key`` (and bucket-sorted by
    ``sort_cols``, default the key) as catalog table ``table``.

    ``n_buckets`` is the cluster-wide parallelism contract: pick it
    once per subject area (e.g. 4096 at 100 TB) — only tables with
    EQUAL bucket counts join exchange-free.
    """
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(*(sort_cols or [key]))
    )
    writer.saveAsTable(table)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucket-count catalog tables on their bucket key.

    With both sides bucketed this plans as SortMergeJoin with ZERO
    Exchange operators (asserted in tests/test_bucketing.py) — the
    scan's reported partitioning satisfies the join requirement.
    """
    return spark.table(left_table).join(spark.table(right_table), key, how)
