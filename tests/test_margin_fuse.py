"""Equivalence unit for similarity_margin_pairs' r14 window fuse: the
per-side k-NN stats (na/da) and the reciprocal best partner must come
from ONE ranked pass — and ``min(struct(r, partner))`` over the r<=4
rows must recover exactly the r==1 partner that the separate
best-window formulation produced, including on ties in sim (row_number
is unique, so (r, partner) min is the r==1 row deterministically).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_min_struct_rank_recovers_top1(spark):
    # sims engineered with ties so the idb ASC tiebreak matters, and a
    # partition with fewer than k rows
    rows = [
        ("a1", "b1", 0.9),
        ("a1", "b2", 0.9),   # tie with b1 -> b1 wins (idb asc)
        ("a1", "b3", 0.7),
        ("a1", "b4", 0.6),
        ("a1", "b5", 0.5),   # beyond k=4, excluded from both paths
        ("a2", "b9", 0.1),   # single-row partition
    ]
    pairs = spark.createDataFrame(rows, ["ida", "idb", "sim"])
    w = Window.partitionBy("ida").orderBy(F.desc("sim"), F.asc("idb"))
    ranked = pairs.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= 4
    )
    fused = ranked.groupBy("ida").agg(
        F.count("*").alias("d"),
        F.min(F.struct("r", "idb")).getField("idb").alias("best"),
    )
    legacy_best = (
        pairs.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("ida", F.col("idb").alias("best"))
    )
    legacy_d = (
        pairs.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 4)
        .groupBy("ida")
        .agg(F.count("*").alias("d"))
    )
    got = {r["ida"]: (r["d"], r["best"]) for r in fused.collect()}
    want = {
        r["ida"]: r["best"] for r in legacy_best.collect()
    }
    want_d = {r["ida"]: r["d"] for r in legacy_d.collect()}
    assert {k: v[1] for k, v in got.items()} == want
    assert {k: v[0] for k, v in got.items()} == want_d
    assert got["a1"] == (4, "b1")
    assert got["a2"] == (1, "b9")
