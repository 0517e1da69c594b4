"""Plan-quality regression tests: the physical plans the 100 TB design
requires, asserted — a future change that silently drops a pushdown,
broadcast, or semi-join fails here, not in production."""

from pyspark.sql import functions as F

from ingest_pipeline_spark.queries import queries


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def test_q1_pushdown_and_partial_agg(spark, sf_dir):
    plan = _plan(queries()["q1_pricing_summary"](spark, sf_dir))
    # the shipdate filter reaches the parquet scan…
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # …the scan reads only needed columns…
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]
    # …and aggregation is partial (map-side combine) before the exchange
    assert "partial_sum" in plan


def test_q4_uses_semi_join(spark, sf_dir):
    plan = _plan(queries()["q4_order_priority"](spark, sf_dir))
    assert "LeftSemi" in plan


def test_q5_dims_broadcast(spark, sf_dir):
    plan = _plan(queries()["q5_region_revenue"](spark, sf_dir))
    # nation/region never shuffle: they ride BroadcastExchange
    assert plan.count("BroadcastExchange") >= 2
    # exactly one hash-partitioned exchange (the final small groupBy)
    assert plan.count("Exchange hashpartitioning") == 1


def test_profile_single_scan(spark, sf_dir):
    plan = _plan(queries()["profile_orders"](spark, sf_dir))
    assert plan.count("FileScan") == 1


def test_similarity_topk_pushes_rank_limit(spark, sf_dir):
    plan = _plan(queries()["similarity_topk"](spark, sf_dir))
    # WindowGroupLimit Partial = top-k pruned map-side before the shuffle
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_minhash_no_cartesian(spark, sf_dir):
    plan = _plan(queries()["dedup_minhash_lsh"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    # signatures are localCheckpoint-materialized before the self-join
    # (one signature computation, both sides read it), so the pair plan
    # scans the checkpoint RDD rather than recomputing the pipeline
    assert "Scan ExistingRDD" in plan

    # the signature stage itself still combines its 16 mins map-side
    from ingest_pipeline_spark.operators.dedup import minhash_signatures
    from ingest_pipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sig_plan = _plan(minhash_signatures(docs, "text", "doc_id"))
    assert "partial_min" in sig_plan


def test_checksum_manifest_one_shuffle(spark, sf_dir):
    plan = _plan(queries()["checksum_manifest"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
