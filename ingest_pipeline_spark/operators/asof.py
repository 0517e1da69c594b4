"""Distributed as-of join: attach the most recent right-side row at or
before each left timestamp, per key.

The reference pipeline repeatedly wants "the latest prior observation"
(most-recent child dataset per entity, dags/utils.py:1160-1164 shape;
last status before a poll tick, tools/split_and_create.py:554-560) —
and LLM-corpus pipelines want it for feature/price/config attachment.
Spark has no ASOF JOIN operator, so this composes one from primitives
(prompt's custom-operator case (a)):

Union-merge, NOT a join: tag both inputs, union them, and run ONE
window per key ordered by (ts, side) carrying the last right-side
payload forward.  Right rows sort before left rows at equal
timestamps, so the match is inclusive (left_ts >= right_ts), exactly
DuckDB's ``ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts``.

Scale shape: one hash exchange on the key + an in-partition sort —
strictly cheaper than the range-join or per-key collect alternatives;
there is no join node, no broadcast, no row explosion.  The payload
rides a single struct so a right row whose value is NULL still
terminates the carry (last(ignorenulls) skips nulls of the WHOLE
struct, never of individual fields).  A hot key lands in one task, as
with any windowed operator — pre-salt by time-bucketing the key if a
single key exceeds a partition (operators/skew.py tools compose).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    prefix: str = "matched_",
    tolerance_sec: int | None = None,
) -> DataFrame:
    """For every left row, the latest right row with
    ``right_ts <= left_ts`` on the same ``key`` (inclusive).

    Returns all left columns plus ``<prefix><right_ts>`` and
    ``<prefix><col>`` for each of ``value_cols`` (NULL when no right
    row precedes).  ``tolerance_sec`` drops matches older than the
    given horizon (the match becomes NULL, the left row survives).
    """
    left_cols = left.columns
    payload = F.struct(
        F.col(right_ts).alias(f"{prefix}{right_ts}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in value_cols],
    )
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*left_cols).alias("__left"),
        F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType.simpleString()
        ).alias("__payload"),
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*left_cols).alias("l")).schema["l"]
            .dataType.simpleString()
        ).alias("__left"),
        payload.alias("__payload"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tag.unionByName(r_tag).withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    match: Column = F.col("__match")
    if tolerance_sec is not None:
        fresh = F.col("__ts").cast("long") - match[f"{prefix}{right_ts}"].cast(
            "long"
        ) <= F.lit(tolerance_sec)
        match = F.when(fresh, match)
    out = merged.filter(F.col("__side") == 1).select(
        *[F.col("__left")[c].alias(c) for c in left_cols],
        match[f"{prefix}{right_ts}"].alias(f"{prefix}{right_ts}"),
        *[match[f"{prefix}{c}"].alias(f"{prefix}{c}") for c in value_cols],
    )
    return out
