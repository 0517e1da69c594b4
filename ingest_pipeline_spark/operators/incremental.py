"""Incremental aggregation state: algebraic rollups you can maintain
without rescanning history.

A 100 TB continuous aggregate (hypertable_rollup shape) cannot
recompute from scratch per batch.  The classic fix is to keep the
rollup in MERGEABLE state form — per key: count, exact sum, min, max
— so that

    merge(rollup(A), rollup(B)) == rollup(A UNION ALL B)

holds exactly, and each new partition/day folds into the state with
one small keyed aggregation.  (The reference recomputes its report
frames per run, e.g. dags/generate_usage_report.py:85-240; this is
the scale-correct replacement.  Structured Streaming's stateful aggs
do the same thing inside a query; this operator gives the BATCH
version a persistable, engine-agnostic state table.)

Sums are decimal-exact (decimal(28,6)), so the identity above is
bit-for-bit — not merely approximate — and the oracle can verify the
incrementally-merged result against a direct GROUP BY over the full
input (queries.py incremental_rollup_orders).  Derived measures that
are NOT mergeable (avg, stddev) are emitted at read time from the
mergeable parts (``finalize_rollup``), never stored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Aggregate ``df`` into mergeable state: n / sum / min / max per key."""
    v = F.col(value_col).cast("decimal(28,6)")
    return df.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum(v).alias("sum_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    )


def merge_rollup(*states: DataFrame) -> DataFrame:
    """Fold any number of state tables into one (same schema).

    Each input is already aggregated, so the merge shuffles only
    O(keys) rows per input — new data folds in without touching the
    history that produced the existing state.
    """
    keys = [c for c in states[0].columns if c not in ("n", "sum_v", "min_v", "max_v")]
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").cast("decimal(28,6)").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finalize_rollup(state: DataFrame) -> DataFrame:
    """Read-time view: mergeable parts + derived (non-mergeable) avg."""
    return state.select(
        *[c for c in state.columns if c not in ("n", "sum_v", "min_v", "max_v")],
        "n",
        F.col("sum_v").cast("double").alias("sum_v"),
        F.col("min_v").cast("double").alias("min_v"),
        F.col("max_v").cast("double").alias("max_v"),
        (F.col("sum_v").cast("double") / F.col("n")).alias("avg_v"),
    )
