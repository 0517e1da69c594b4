"""Gap-based sessionization.

The reference accumulates CPU/GPU seconds by pairing job-start/end log
lines per session file (reference dags/extra_utils.py:184-244) — a
stateful scan.  The scalable Spark restatement is the classic
lag+cumsum pattern: a new session starts when the gap to the previous
event (per key) exceeds the threshold; session id = running count of
session starts.  Two window passes over the same (key, ts) ordering —
one shuffle total, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assign session_id per key; gap > gap_seconds starts a new session.

    Output: input columns + session_id (long, 1-based per key).
    tiebreak_col makes ordering deterministic under equal timestamps.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)
    is_new = F.when(prev_ts.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    df: DataFrame, key_col: str, ts_col: str, gap_seconds: int = 1800
) -> DataFrame:
    """Per-session stats: event count, duration seconds, start/end ts."""
    s = sessionize(df, key_col, ts_col, gap_seconds)
    return s.groupBy(key_col, "session_id").agg(
        F.count("*").alias("n_events"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).alias("duration_s"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )
