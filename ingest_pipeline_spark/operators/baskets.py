"""Market-basket frequent-pair mining (the apriori pair stage).

The pair self-join is keyed on the basket id, so the work is Σ k_i²
over basket sizes — fine when baskets are small (TPC-H: ≤7 lines), a
hot-basket bomb when they are heavy-tailed.  The classic apriori
pruning bounds it: an item present in fewer than ``min_support``
baskets cannot participate in any pair with support ≥ ``min_support``
(a pair's support is ≤ either item's support), so dropping infrequent
items BEFORE pairing is result-identical and shrinks every k_i to the
count of *frequent* items in the basket.  Same guard shape as the
df_cap stop-shingle cap in operators/dedup.py:ngram_jaccard_pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_items(
    items: DataFrame, basket_col: str, item_col: str, min_support: int
) -> DataFrame:
    """Distinct (basket, item) rows restricted to items whose basket
    count is ≥ min_support — one keyed agg + a broadcast-or-shuffle
    semi-join, both on the item key."""
    counts = (
        items.groupBy(item_col)
        .agg(F.count("*").alias("__item_support"))
        .filter(F.col("__item_support") >= min_support)
        .select(item_col)
    )
    return items.join(counts, item_col, "left_semi")


def copurchase_pairs(
    items: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int,
) -> DataFrame:
    """Item pairs co-occurring in ≥ min_support baskets.

    ``items`` must hold distinct (basket, item) rows.  Output columns:
    part_a, part_b (item_col values, a < b), support (long).
    """
    pruned = frequent_items(items, basket_col, item_col, min_support)
    a, b = pruned.alias("a"), pruned.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{basket_col}") == F.col(f"b.{basket_col}"))
            & (F.col(f"a.{item_col}") < F.col(f"b.{item_col}")),
        )
        .groupBy(
            F.col(f"a.{item_col}").alias("part_a"),
            F.col(f"b.{item_col}").alias("part_b"),
        )
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= min_support)
    )
