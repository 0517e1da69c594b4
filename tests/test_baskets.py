"""Apriori frequent-pair mining (operators/baskets.py): the prefilter
must be lossless versus the naive pair join, and must actually bound
basket sizes on a hot-basket fixture (the 100 TB guard)."""

import pytest
from pyspark.sql import functions as F

from ingest_pipeline_spark.operators.baskets import (
    copurchase_pairs,
    frequent_items,
)


@pytest.fixture(scope="module")
def baskets(spark):
    # 40 baskets: a frequent core {1,2,3} recurring, plus a long tail of
    # once-only items making baskets artificially fat (the hot-basket
    # shape the prefilter exists for).
    rows = []
    for b in range(40):
        rows.append((b, 1))
        if b % 2 == 0:
            rows.append((b, 2))
        if b % 3 == 0:
            rows.append((b, 3))
        for t in range(10):  # 10 unique tail items per basket
            rows.append((b, 1000 + b * 10 + t))
    return spark.createDataFrame(rows, "basket long, item long").localCheckpoint()


def _naive_pairs(items, min_support):
    a, b = items.alias("a"), items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.basket") == F.col("b.basket"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("part_a"), F.col("b.item").alias("part_b")
        )
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= min_support)
    )


@pytest.mark.parametrize("min_support", [2, 3, 14])
def test_prefilter_is_lossless(spark, baskets, min_support):
    got = sorted(
        tuple(r)
        for r in copurchase_pairs(baskets, "basket", "item", min_support).collect()
    )
    want = sorted(tuple(r) for r in _naive_pairs(baskets, min_support).collect())
    assert got == want and want  # non-vacuous: the core pairs survive


def test_duplicate_lines_dedup_like_distinct(spark, baskets):
    # r14 contract: copurchase_pairs accepts RAW (basket, item) lines —
    # duplicated rows must not inflate supports (collect_set dedups),
    # so feeding each row twice equals feeding the distinct relation.
    doubled = baskets.unionAll(baskets)
    got = sorted(
        tuple(r)
        for r in copurchase_pairs(doubled, "basket", "item", 3).collect()
    )
    want = sorted(
        tuple(r)
        for r in copurchase_pairs(baskets, "basket", "item", 3).collect()
    )
    assert got == want and want


def test_prefilter_bounds_basket_size(spark, baskets):
    pruned = frequent_items(baskets, "basket", "item", 3)
    sizes = (
        pruned.groupBy("basket")
        .agg(F.count("*").alias("k"))
        .agg(F.max("k").alias("mx"))
        .collect()[0]
    )
    # tail items (support 1) are gone: baskets shrink from 11-13 items
    # to at most the 3-item frequent core — Σk² drops ~16×
    assert sizes.mx <= 3
    raw_max = (
        baskets.groupBy("basket").agg(F.count("*").alias("k")).agg(F.max("k"))
    ).collect()[0][0]
    assert raw_max >= 11
