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
