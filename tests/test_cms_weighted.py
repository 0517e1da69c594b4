"""cms_counters weight_col (r14): the grid built from a (key, count)
census must be row-identical to the grid built from the raw rows —
the equivalence sketch_join_size_estimate's single-pass rewrite rests
on — and the census-derived exact FK join size must equal the raw
join's COUNT(*), duplicate keys on both sides included."""

from pyspark.sql import functions as F

from ingest_pipeline_spark.operators.sketches import cms_counters


def _raw(spark):
    # duplicate keys on both sides, incl. a key absent from the other
    rows = [(k,) for k in [1, 1, 1, 2, 2, 3, 5, 5, 5, 5]]
    return spark.createDataFrame(rows, "k bigint")


def _other(spark):
    rows = [(k,) for k in [1, 2, 2, 3, 4]]
    return spark.createDataFrame(rows, "k bigint")


def test_weighted_census_grid_equals_raw_grid(spark):
    raw = _raw(spark)
    census = raw.groupBy("k").agg(F.count("*").alias("n"))
    g_raw = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in cms_counters(raw, "k", d=4, w=64).collect()
    }
    g_cen = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in cms_counters(census, "k", d=4, w=64, weight_col="n").collect()
    }
    assert g_raw == g_cen and len(g_raw) > 0


def test_census_fk_size_equals_join_count(spark):
    a, b = _raw(spark), _other(spark)
    direct = a.join(b, "k").count()
    ca = a.groupBy("k").agg(F.count("*").alias("n"))
    cb = b.groupBy("k").agg(F.count("*").alias("m"))
    via = ca.join(cb, "k").agg(
        F.coalesce(F.sum(F.col("n") * F.col("m")), F.lit(0))
        .cast("bigint")
        .alias("exact")
    ).collect()[0]["exact"]
    assert via == direct
    # disjoint sides -> 0, not NULL (the replaced COUNT(*) contract)
    empty = ca.join(cb.filter(F.col("k") > 100), "k").agg(
        F.coalesce(F.sum(F.col("n") * F.col("m")), F.lit(0))
        .cast("bigint")
        .alias("exact")
    ).collect()[0]["exact"]
    assert empty == 0
