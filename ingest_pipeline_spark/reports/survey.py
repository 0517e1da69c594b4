"""Report builders — the reference's survey / usage-report dataflows.

- customer_survey: wide per-entity report (reference
  tools/survey.py:305-382 build_rec + tools/new_dataset_survey.py:
  302-391): one wide select over dims + derived aggregates with
  null-coalescing and multi-key sort (O1) — a single pass: dims
  broadcast, one shuffle for the per-entity aggregate, one more for
  the final sort.
- usage_report: log-mining report (reference
  dags/generate_usage_report.py:70-240): parse structured fields out
  of raw text lines with regexp_extract, filter with a diagnostics
  battery (V8 rlike rules), aggregate per entity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def customer_survey(
    customer: DataFrame, nation: DataFrame, region: DataFrame, orders: DataFrame
) -> DataFrame:
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.max("o_orderdate").alias("last_order"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_spend"),
    )
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "r_name",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
            F.col("last_order"),
            F.coalesce(F.col("total_spend"), F.lit(0.0)).alias("total_spend"),
        )
        .orderBy("r_name", "n_name", F.desc("total_spend"), "c_custkey")
    )


def order_columns(df: DataFrame, weights: dict[str, int]) -> DataFrame:
    """Weighted output-column ordering (O2, reference tools/survey.py:52-63).

    Columns with weights sort by (weight, name); unweighted columns go
    in the alphabetic middle at weight 0.  Pure projection-order logic
    — no data movement.
    """
    ordered = sorted(df.columns, key=lambda c: (weights.get(c, 0), c))
    return df.select(*ordered)


def usage_report(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse `user=<id> type=<t>` lines; per-user event and error counts."""
    parsed = lines.select(
        F.regexp_extract(F.col(line_col), r"user=(\d+)", 1).cast("bigint").alias(
            "user_id"
        ),
        F.regexp_extract(F.col(line_col), r"type=(\w+)", 1).alias("event_type"),
    )
    return parsed.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "n_errors"
        ),
    )


# notes the survey itself generates — never propagated from --notes
# inputs (reference misc/tools/new_dataset_survey.py:22-26)
VOLATILE_NOTES = (
    "BAD TYPE NAME",
    "UUID COLLISION!",
    "Multiple QA derived datasets",
    "BAD UUID: No parents?",
)


def merge_notes(
    df: DataFrame,
    notes: DataFrame,
    uuid_col: str = "uuid",
    note_col: str = "note",
) -> DataFrame:
    """Merge a notes side-file into a survey (reference
    new_dataset_survey.py:104-126 ``join_notes`` + ``_merge_note_pair``):
    left-join on uuid, split both note strings on ';', strip each word,
    drop empties, drop VOLATILE_NOTES from the incoming (y) side only,
    then order-preserving dedup of x-words followed by y-words, re-joined
    with ';'.

    Spark restatement: the word pipeline is split → transform(trim) →
    filter over arrays of a few words each (cold path, bounded arrays —
    the HOF-interpretation cost is irrelevant here), and the reference's
    first-seen dedup is exactly ``array_distinct`` (keeps the first
    occurrence in array order).  One broadcast-able left join, no other
    movement.
    """
    notes_y = notes.select(
        F.col(uuid_col), F.col(note_col).alias("__note_y")
    )
    joined = df.withColumnRenamed(note_col, "__note_x").join(
        F.broadcast(notes_y.dropDuplicates([uuid_col, "__note_y"])),
        uuid_col,
        "left",
    )

    def words(col, drop_volatile: bool):
        ws = F.filter(
            F.transform(F.split(F.coalesce(col, F.lit("")), ";"),
                        lambda w: F.trim(w)),
            lambda w: w != "",
        )
        if drop_volatile:
            vol = F.array(*[F.lit(v) for v in VOLATILE_NOTES])
            ws = F.filter(ws, lambda w: ~F.array_contains(vol, w))
        return ws

    merged = F.array_join(
        F.array_distinct(
            F.concat(words(F.col("__note_x"), False),
                     words(F.col("__note_y"), True))
        ),
        ";",
    )
    return joined.withColumn(note_col, merged).drop("__note_x", "__note_y")
