"""MERGE / upsert: the warehouse write-side primitive (Delta-style
``MERGE INTO`` semantics) expressed as one full-outer join.

Reference parity: the ingest pipeline's entity-update path overwrites
matched entity records and inserts new ones per batch (the REST upsert
loop in the reference's entity updates); here that becomes a set-based
merge usable as the batch-apply step for scd2_status_history /
snapshot_delta outputs.

Scale shape: ONE full-outer shuffle join on the natural key — the same
key both snapshot operators shuffle on, so a pipeline
(delta → merge → write) reuses partitioning.  No collect, no loops;
matched/inserted/deleted row provenance comes out as a column so the
caller can audit the write before committing it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    update_cols: list[str] | None = None,
    delete_col: str | None = None,
) -> DataFrame:
    """Merge ``source`` into ``target`` on ``key_cols``.

    - matched rows take ``update_cols`` from source (default: every
      non-key source column present in target);
    - source-only rows are inserted;
    - target-only rows pass through unchanged;
    - if ``delete_col`` names a boolean source column, matched rows
      with it true are dropped (WHEN MATCHED ... DELETE).

    Output columns: target schema + ``_merge_action`` in
    ('updated', 'inserted', 'kept').
    """
    data_cols = [c for c in target.columns if c not in key_cols]
    if update_cols is None:
        update_cols = [c for c in source.columns if c in data_cols]
    missing = [c for c in update_cols if c not in source.columns]
    if missing:
        raise KeyError(f"update_cols not in source: {missing}")

    s = source.select(
        *[F.col(k).alias(f"__s_{k}") for k in key_cols],
        *[F.col(c).alias(f"__s_{c}") for c in update_cols],
        *(
            [F.col(delete_col).alias("__s_delete")]
            if delete_col is not None
            else []
        ),
    )
    cond = [target[k] == s[f"__s_{k}"] for k in key_cols]
    j = target.join(s, cond, "full_outer")

    matched = F.col(f"__s_{key_cols[0]}").isNotNull() & target[
        key_cols[0]
    ].isNotNull()
    src_only = target[key_cols[0]].isNull()

    if delete_col is not None:
        j = j.filter(~(matched & F.coalesce(F.col("__s_delete"), F.lit(False))))

    def out(c: str) -> Column:
        if c in key_cols:
            return F.coalesce(target[c], F.col(f"__s_{c}")).alias(c)
        if c in update_cols:
            return F.when(
                matched | src_only, F.col(f"__s_{c}")
            ).otherwise(target[c]).alias(c)
        return target[c].alias(c)

    action = (
        F.when(matched, "updated")
        .when(src_only, "inserted")
        .otherwise("kept")
        .alias("_merge_action")
    )
    return j.select(*[out(c) for c in target.columns], action)


def cdc_compact(
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
) -> DataFrame:
    """Latest change per key: the CDC compaction step.

    ``seq_cols`` must totally order each key's changes (include a
    unique tiebreak — out-of-order capture with an ambiguous sequence
    is a data bug, not something to paper over).  One keyed window.
    """
    w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in seq_cols])
    return (
        changes.withColumn("__cdc_rn", F.row_number().over(w))
        .filter(F.col("__cdc_rn") == 1)
        .drop("__cdc_rn")
    )


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    update_cols: list[str] | None = None,
) -> DataFrame:
    """Apply a CDC change stream (op ∈ 'U'/'D' + sequence) to a base
    snapshot — the lakehouse CDC-merge primitive.

    Semantics per key, driven by the LATEST change (cdc_compact):
    - 'U' on an existing key: update ``update_cols``   → 'updated'
    - 'U' on an unseen key:   insert                   → 'inserted'
    - 'D' on an existing key: drop the row
    - 'D' on an unseen key:   no-op (unlike merge_upsert's delete_col,
      a delete must never materialize as an insert)
    - no change:              pass through              → 'kept'

    Scale shape: one keyed window over the changes (compaction) + ONE
    full-outer join on the key — same single-shuffle plan as
    merge_upsert, reusing the key partitioning end to end.  Output:
    base schema + ``_cdc_action``.
    """
    data_cols = [c for c in base.columns if c not in key_cols]
    if update_cols is None:
        update_cols = [c for c in changes.columns if c in data_cols]
    latest = cdc_compact(changes, key_cols, seq_cols)
    s = latest.select(
        *[F.col(k).alias(f"__s_{k}") for k in key_cols],
        *[F.col(c).alias(f"__s_{c}") for c in update_cols],
        F.col(op_col).alias("__s_op"),
    )
    cond = [base[k] == s[f"__s_{k}"] for k in key_cols]
    j = base.join(s, cond, "full_outer").filter(
        ~(F.coalesce(F.col("__s_op") == "D", F.lit(False)))
    )
    matched = F.col(f"__s_{key_cols[0]}").isNotNull() & base[
        key_cols[0]
    ].isNotNull()
    src_only = base[key_cols[0]].isNull()

    def out(c: str) -> Column:
        if c in key_cols:
            return F.coalesce(base[c], F.col(f"__s_{c}")).alias(c)
        if c in update_cols:
            return (
                F.when(matched | src_only, F.col(f"__s_{c}"))
                .otherwise(base[c])
                .alias(c)
            )
        return base[c].alias(c)

    action = (
        F.when(matched, "updated")
        .when(src_only, "inserted")
        .otherwise("kept")
        .alias("_cdc_action")
    )
    return j.select(*[out(c) for c in base.columns], action)
