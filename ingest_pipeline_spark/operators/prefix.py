"""Distributed prefix (running) aggregation over a global order.

A Spark window with an EMPTY partition spec executes in ONE task —
every row shuffles to a single reducer, which is the classic
100×-scale straggler (a global ``SUM(x) OVER (ORDER BY k)`` on a
hundred million rows is one core's problem no matter how many
executors exist).  The reference pipelines never hit this because they
are single-node to begin with; the scalable restatement is the classic
two-phase parallel prefix scan:

1. ``repartitionByRange(order)`` + ``sortWithinPartitions(order)``
   gives a totally-ordered partitioning (partition *i* holds keys
   strictly below partition *i+1*; the order columns must include a
   unique tiebreak so the total order is well defined).
2. A per-partition running aggregate (window PARTITIONED by the range
   partition id — each partition is one task, full parallelism).
3. Per-partition totals (one row per partition — CLUSTER-proportional,
   not data-proportional) are prefix-combined into offsets and
   broadcast-joined back; ``global_running = offset ⊕ local_running``.

The partition-id column must be stable across the two consumers of the
ranged relation (the rows and the totals), and range boundaries come
from run-dependent sampling — so the ranged relation is
localCheckpoint-materialized ONCE (the same lineage rule CLAUDE.md
records for NGram/UDF fan-out).  Everything stays JVM-side and
decimal-exact; accumulation order within a combine is the sorted order,
so DECIMAL sums are bit-deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID = "__prefix_pid"
_LOCAL = "__prefix_local"
_OFF = "__prefix_off"


def _ranged(df: DataFrame, order_cols: list[Column]) -> DataFrame:
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    d = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn(_PID, F.spark_partition_id())
    )
    # Two consumers (rows + per-partition totals) must observe the SAME
    # sampled range boundaries — materialize once.
    return d.localCheckpoint(eager=True)


def running_sum(
    df: DataFrame, order_cols: list[Column], value_col: str, out_col: str
) -> DataFrame:
    """Globally-ordered inclusive running sum of ``value_col``.

    Equivalent to ``SUM(v) OVER (ORDER BY order ROWS UNBOUNDED
    PRECEDING)`` but executed as a two-phase distributed prefix scan;
    ``order_cols`` must totally order the rows (include a tiebreak).
    """
    return running_sums(df, order_cols, [(value_col, out_col)])


def running_sums(
    df: DataFrame, order_cols: list[Column], sums: list[tuple[str, str]]
) -> DataFrame:
    """Globally-ordered inclusive running sums of SEVERAL value
    columns over ONE shared range partitioning — one ranged
    checkpoint, one totals aggregation, one broadcast offsets join,
    however many ``(value_col, out_col)`` pairs are requested (e.g.
    the two empirical CDFs of a KS statistic).
    """
    d = _ranged(df, order_cols)
    wloc = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for i, (value_col, _out) in enumerate(sums):
        d = d.withColumn(f"{_LOCAL}{i}", F.sum(value_col).over(wloc))
    totals = d.groupBy(_PID).agg(
        *[F.sum(v).alias(f"__ptot{i}") for i, (v, _o) in enumerate(sums)]
    )
    # offsets: prefix over ≤ shuffle-partitions rows (cluster-sized)
    woff = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        _PID,
        *[
            F.sum(f"__ptot{i}").over(woff).alias(f"{_OFF}{i}")
            for i in range(len(sums))
        ],
    )
    d = d.join(F.broadcast(offsets), _PID)
    drop = [_PID]
    for i, (_v, out_col) in enumerate(sums):
        d = d.withColumn(
            out_col,
            F.when(
                F.col(f"{_OFF}{i}").isNull(), F.col(f"{_LOCAL}{i}")
            ).otherwise(F.col(f"{_OFF}{i}") + F.col(f"{_LOCAL}{i}")),
        )
        drop += [f"{_LOCAL}{i}", f"{_OFF}{i}"]
    return d.drop(*drop)


def global_row_number(
    df: DataFrame, order_cols: list[Column], out_col: str
) -> DataFrame:
    """Globally-ordered 1-based row number without a single-task window.

    Equivalent to ``ROW_NUMBER() OVER (ORDER BY order)`` for a total
    order: per-partition local row numbers plus prefix-combined
    per-partition row counts.
    """
    d = _ranged(df, order_cols)
    wloc = Window.partitionBy(_PID).orderBy(*order_cols)
    d = d.withColumn(_LOCAL, F.row_number().over(wloc).cast("long"))
    counts = d.groupBy(_PID).agg(F.count("*").alias("__ptot"))
    woff = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(_PID, F.sum("__ptot").over(woff).alias(_OFF))
    return (
        d.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, F.coalesce(F.col(_OFF), F.lit(0)) + F.col(_LOCAL))
        .drop(_PID, _LOCAL, _OFF)
    )


def global_ntile(
    df: DataFrame, order_cols: list[Column], k: int, out_col: str
) -> DataFrame:
    """Globally-ordered NTILE(k) without a single-task window.

    SQL NTILE semantics in closed form over the distributed global
    rank: with n rows, the first ``n mod k`` tiles hold ``⌈n/k⌉`` rows
    and the rest hold ``⌊n/k⌋`` — bit-identical to ``NTILE(k) OVER
    (ORDER BY order)`` for any total order.
    """
    rn = "__prefix_rn"
    d = _ranged(df, order_cols)
    wloc = Window.partitionBy(_PID).orderBy(*order_cols)
    d = d.withColumn(_LOCAL, F.row_number().over(wloc).cast("long"))
    counts = d.groupBy(_PID).agg(F.count("*").alias("__ptot"))
    counts = counts.localCheckpoint(eager=True)  # offsets + total share it
    woff = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(_PID, F.sum("__ptot").over(woff).alias(_OFF))
    # total rows from the SAME tiny per-partition counts — never a
    # second scan of the data
    n_total = counts.agg(F.sum("__ptot").alias("__n"))
    d = (
        d.join(F.broadcast(offsets), _PID)
        .withColumn(rn, F.coalesce(F.col(_OFF), F.lit(0)) + F.col(_LOCAL))
        .drop(_PID, _LOCAL, _OFF)
    )
    q = (F.col("__n") / k).cast("long")  # floor: n, k ≥ 0
    rem = F.col("__n") % k
    big = rem * (q + 1)  # rows covered by the ⌈n/k⌉-sized tiles
    r = F.col(rn)
    tile = F.when(
        (q + 1 > 0) & (r <= big), ((r - 1) / (q + 1)).cast("long") + 1
    ).otherwise(
        rem + F.when(q > 0, ((r - big - 1) / q).cast("long")).otherwise(0) + 1
    )
    return (
        d.crossJoin(F.broadcast(n_total))
        .withColumn(out_col, tile.cast("long"))
        .drop(rn, "__n")
    )


def grouped_row_number(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    out_col: str,
    count_col: str | None = None,
) -> DataFrame:
    """Per-group 1-based row number for LOW-CARDINALITY heavy groups.

    ``ROW_NUMBER() OVER (PARTITION BY g ORDER BY order)`` executes one
    task per group — with a handful of groups over a 100 TB table that
    is the same straggler as an empty partition spec, just sharded a
    few ways.  This restates it as a grouped two-phase prefix scan:
    range-partition on (group, order) so every partition holds a
    contiguous run of one-or-more group slices, number rows locally
    per (partition, group), then offset by the prefix-combined
    per-(partition, group) counts — a relation of at most
    ``n_partitions × n_groups`` rows, cluster-sized, never
    data-proportional.  If ``count_col`` is given, the per-group total
    row count is attached from the SAME tiny counts relation (no
    second scan).
    """
    gcols = [F.col(c) for c in group_cols]
    d = _ranged(df, [*gcols, *order_cols])
    wloc = Window.partitionBy(_PID, *group_cols).orderBy(*order_cols)
    d = d.withColumn(_LOCAL, F.row_number().over(wloc).cast("long"))
    counts = d.groupBy(_PID, *group_cols).agg(F.count("*").alias("__ptot"))
    counts = counts.localCheckpoint(eager=True)  # offsets + totals share it
    woff = (
        Window.partitionBy(*group_cols)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        _PID, *group_cols, F.sum("__ptot").over(woff).alias(_OFF)
    )
    d = (
        d.join(F.broadcast(offsets), [_PID, *group_cols])
        .withColumn(out_col, F.coalesce(F.col(_OFF), F.lit(0)) + F.col(_LOCAL))
        .drop(_PID, _LOCAL, _OFF)
    )
    if count_col is not None:
        totals = counts.groupBy(*group_cols).agg(
            F.sum("__ptot").alias(count_col)
        )
        d = d.join(F.broadcast(totals), group_cols)
    return d


def grouped_running_sum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    value_col: str,
    out_col: str,
    total_col: str | None = None,
) -> DataFrame:
    """Per-group inclusive running sum for LOW-CARDINALITY heavy groups.

    ``SUM(v) OVER (PARTITION BY g ORDER BY order ROWS UNBOUNDED
    PRECEDING)`` executes one task per group — the sharded flavor of
    the single-task global window.  Same grouped two-phase scan as
    ``grouped_row_number``: range-partition on (group, order), local
    running sums per (partition, group), prefix-combined
    per-(partition, group) offsets (a cluster-sized relation) joined
    back broadcast.  If ``total_col`` is given, the per-group total is
    attached from the SAME tiny counts relation (no second scan).
    """
    gcols = [F.col(c) for c in group_cols]
    d = _ranged(df, [*gcols, *order_cols])
    wloc = (
        Window.partitionBy(_PID, *group_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn(_LOCAL, F.sum(value_col).over(wloc))
    totals = d.groupBy(_PID, *group_cols).agg(F.sum(value_col).alias("__ptot"))
    totals = totals.localCheckpoint(eager=True)  # offsets + totals share it
    woff = (
        Window.partitionBy(*group_cols)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        _PID, *group_cols, F.sum("__ptot").over(woff).alias(_OFF)
    )
    d = (
        d.join(F.broadcast(offsets), [_PID, *group_cols])
        .withColumn(
            out_col,
            F.when(F.col(_OFF).isNull(), F.col(_LOCAL)).otherwise(
                F.col(_OFF) + F.col(_LOCAL)
            ),
        )
        .drop(_PID, _LOCAL, _OFF)
    )
    if total_col is not None:
        gt = totals.groupBy(*group_cols).agg(F.sum("__ptot").alias(total_col))
        d = d.join(F.broadcast(gt), group_cols)
    return d


def running_max_exclusive(
    df: DataFrame, order_cols: list[Column], value_col: str, out_col: str
) -> DataFrame:
    """Globally-ordered running max over STRICT predecessors.

    Equivalent to ``MAX(v) OVER (ORDER BY order ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)`` (NULL for the globally first row),
    executed as a two-phase distributed prefix scan.
    """
    d = _ranged(df, order_cols)
    wloc = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn(_LOCAL, F.max(value_col).over(wloc))
    totals = d.groupBy(_PID).agg(F.max(value_col).alias("__ptot"))
    woff = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(_PID, F.max("__ptot").over(woff).alias(_OFF))
    # greatest() ignores NULLs (returns the greatest non-null operand),
    # which is exactly the semantics an empty prefix needs.
    return (
        d.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, F.greatest(F.col(_LOCAL), F.col(_OFF)))
        .drop(_PID, _LOCAL, _OFF)
    )
