"""KMV (k-minimum-values) distinct-count sketch — deterministic, so
two engines agree bit-for-bit (unlike HLL, whose register layout is
implementation-defined).

Theory (Bar-Yossef et al. 2002): hash every value uniformly into
[0, 1); if a set has n distinct values, the k-th smallest hash u_(k)
concentrates around k/n, so ``(k-1)/u_(k)`` is an (unbiased) estimate
of n with relative error ~ 1/sqrt(k-2).  The sketch is the k smallest
hashes — mergeable by taking the k smallest of a union, which is what
a 100 TB rollup needs: sketch per partition/day, merge upward,
never rescan.

Determinism: the hash is the first 13 hex chars of md5 (52 bits —
exactly representable in a double) divided by 2^52.  md5 is identical
everywhere, the division has exact operands, and the estimate is
rounded to 6 dp — so the DuckDB oracle reproduces the Spark result
exactly (queries.py sketch_kmv_distinct).

Plan shape: distinct (group, hash) pairs → row_number window on the
group → keep rank <= k.  Spark's WindowGroupLimit pushes the top-k
map-side, so each partition forwards at most k rows per group — the
shuffle carries O(groups x k), not O(rows).  Spark's built-in
``approx_count_distinct`` (HLL) remains the zero-shuffle-extra
alternative when cross-engine reproducibility doesn't matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 2^52: 13 hex chars of md5, exactly representable in a double
_SCALE = float(1 << 52)


def kmv_hash(value_col: str) -> "F.Column":
    """Uniform [0,1) hash of a column, identical in Spark and DuckDB:
    CAST('0x' || SUBSTR(MD5(v),1,13) AS BIGINT) / 2^52."""
    return (
        F.conv(F.substring(F.md5(F.col(value_col)), 1, 13), 16, 10).cast("long")
        / F.lit(_SCALE)
    )


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = 16
) -> DataFrame:
    """Per-group distinct-count estimate: ``(group, est_distinct)``.

    Groups with fewer than k distinct values report the EXACT count
    (the sketch holds all their hashes); larger groups report the
    (k-1)/u_(k) estimate, rounded to 6 dp.
    """
    d = (
        df.select(F.col(group_col).alias("grp"), kmv_hash(value_col).alias("u"))
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy(F.asc("u"))
    sketch = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("grp")
        .agg(
            F.count("*").alias("cnt_le_k"),  # = min(n_distinct, k)
            F.max(F.when(F.col("rn") == k, F.col("u"))).alias("uk"),
        )
    )
    est = F.when(
        F.col("cnt_le_k") >= k, F.round(F.lit(float(k - 1)) / F.col("uk"), 6)
    ).otherwise(F.col("cnt_le_k").cast("double"))
    return sketch.select(F.col("grp").alias(group_col), est.alias("est_distinct"))
