"""KMV distinct sketch: estimator accuracy, exact small-group path,
and the map-side top-k pruned plan."""

from pyspark.sql import functions as F

from ingest_pipeline_spark.operators.sketches import kmv_distinct


def test_kmv_estimates_large_group_accurately(spark):
    # 5000 distinct values, k=64: sd ~ 1/sqrt(62) ~ 12.7%; the data is
    # fixed so the estimate is deterministic — assert a 3-sigma bound
    df = spark.range(5000).select(
        F.lit("g").alias("grp"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    est = kmv_distinct(df, "grp", "v", k=64).collect()[0]["est_distinct"]
    assert abs(est - 5000) / 5000 < 0.38, est


def test_kmv_exact_below_k(spark):
    df = spark.range(10).select(
        F.lit("small").alias("grp"), F.col("id").cast("string").alias("v")
    )
    # duplicates must not inflate the count
    df = df.union(df)
    out = kmv_distinct(df, "grp", "v", k=16).collect()[0]
    assert out["est_distinct"] == 10.0


def test_kmv_plan_prunes_topk_map_side(spark, sf_dir):
    from ingest_pipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = (
        kmv_distinct(docs, "source", "text", k=16)
        ._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    )
    # rank<=k is pushed into a partial WindowGroupLimit before the
    # exchange: each task forwards at most k hashes per group
    assert "WindowGroupLimit" in plan and "Partial" in plan
