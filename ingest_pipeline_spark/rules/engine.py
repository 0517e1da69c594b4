"""First-match-wins regex rules engine.

One abstraction covering five reference subsystems: file-type
classification (reference dags/utils.py:91-101,700-714), pipeline
manifest matching (dags/utils.py:155-203), workflow routing
(dags/utils.py:1801-1817,1924-1938), resource routing
(dags/utils.py:1820-1842), and special-case rewrites
(misc/tools/split_and_create.py:52-81,376-387).

Two physical strategies, chosen by rule-count:

1. ``first_match_case`` — compile the ordered rule list into one
   chained CASE WHEN expression.  Zero shuffle, fully codegen'd,
   broadcast-free; right whenever the rule table fits in a plan
   (hundreds of rules).  This is the 100 TB-scale default: the rules
   ride inside the task binary, the scan stays one stage.

2. ``rules_broadcast_join`` — materialize rules as a small DataFrame,
   broadcast-join with ``rlike``, resolve first-match with a
   min(priority) struct-aggregation (no window shuffle).  Right when
   rules are data (thousands+, or updated at runtime).

Determinism: first match == lowest priority number; ties broken by
rule order.  Never relies on ``first()`` without ordering.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """(pattern, payload) with optional explicit priority (default: order)."""

    pattern: str
    payload: str
    priority: int | None = None


def _with_priorities(rules: list[Rule]) -> list[Rule]:
    return [
        Rule(r.pattern, r.payload, r.priority if r.priority is not None else i)
        for i, r in enumerate(rules)
    ]


def first_match_case(col: Column, rules: list[Rule], default: str | None = None) -> Column:
    """Ordered rules → one chained CASE WHEN rlike expression."""
    ordered = sorted(_with_priorities(rules), key=lambda r: r.priority)
    expr: Column = F.lit(default)
    for r in reversed(ordered):
        expr = F.when(col.rlike(r.pattern), F.lit(r.payload)).otherwise(expr)
    return expr


def rules_df(spark: SparkSession, rules: list[Rule]) -> DataFrame:
    ordered = _with_priorities(rules)
    return spark.createDataFrame(
        [(r.pattern, r.payload, r.priority) for r in ordered],
        "pattern string, payload string, priority int",
    )


def rules_broadcast_join(
    df: DataFrame,
    spark: SparkSession,
    col_name: str,
    rules: list[Rule],
    out_col: str = "payload",
    default: str | None = None,
) -> DataFrame:
    """Broadcast rlike-join + min-priority first-match resolution.

    Resolution uses ``min_by`` under the hood (min struct aggregation),
    not a window — one shuffle on the row key only, and with AQE the
    broadcast nested-loop join stays map-side.
    """
    rdf = rules_df(spark, rules)
    # synthesize a per-row key: grouping by the data columns alone would
    # collapse duplicate input rows into one output row
    keyed = df.withColumn("__row_id", F.monotonically_increasing_id())
    joined = keyed.join(
        F.broadcast(rdf),
        F.regexp_like(F.col(col_name), F.col("pattern")),
        "left",
    )
    # group on the fixed-width row id alone; data columns ride as
    # any_value aggregates (identical within a group) instead of
    # inflating the shuffle key with wide payloads
    resolved = joined.groupBy("__row_id").agg(
        *[F.any_value(F.col(c)).alias(c) for c in df.columns],
        F.min_by("payload", "priority").alias(out_col),
    ).drop("__row_id")
    if default is not None:
        resolved = resolved.withColumn(out_col, F.coalesce(F.col(out_col), F.lit(default)))
    return resolved


def map_fallback(col: Column, mapping: dict[str, str]) -> Column:
    """Dictionary translation with identity fallback.

    (reference misc/tools/split_and_create.py:37-43 bad-assay-name map)
    """
    if not mapping:
        return col
    pairs = [p for kv in mapping.items() for p in (F.lit(kv[0]), F.lit(kv[1]))]
    return F.coalesce(F.create_map(*pairs)[col], col)
