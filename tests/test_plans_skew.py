"""Tests: two-phase reorganize checkpoint, salted aggregation/join."""

from pyspark.sql import functions as F

from ingest_pipeline_spark.operators.skew import explode_salt_join, salted_agg
from ingest_pipeline_spark.plans.reorganize import (
    phase2_emit,
    reorganize_two_phase,
)


def test_reorganize_two_phase(spark, tmp_path):
    meta = spark.createDataFrame(
        [
            ("snare2", "ds1/raw", "1+2+3+4"),
            ("codex", "ds2/raw", "10"),
        ],
        "assay_type string, data_path string, sequencing_read_format string",
    )
    ckpt = str(tmp_path / "frozen")
    out = reorganize_two_phase(spark, meta, "upload1", ckpt)
    rows = {r.data_path: r for r in out.collect()}
    # fallback translation applied
    assert rows["ds1/raw"].canonical_assay_type == "SNARE-seq2"
    assert rows["ds2/raw"].canonical_assay_type == "codex"
    # deterministic 32-hex child ids
    assert len(rows["ds1/raw"].child_uuid) == 32
    # regex-gated rewrite applied only where the pattern matches
    assert rows["ds1/raw"].sequencing_read_format == "1/2/3/4"
    assert rows["ds2/raw"].sequencing_read_format == "10"
    assert all(r.status == "new" for r in rows.values())

    # phase 2 re-runs from the checkpoint with identical ids (idempotent)
    again = {r.data_path: r.child_uuid for r in phase2_emit(spark, ckpt).collect()}
    assert again == {p: r.child_uuid for p, r in rows.items()}


def test_salted_agg_matches_plain(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plain = {
        (r.event_type): (r.cnt, r.mx)
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("cnt"), F.max("user_id").alias("mx"))
        .collect()
    }
    salted = {
        (r.event_type): (r.cnt, r.mx)
        for r in salted_agg(
            ev,
            ["event_type"],
            {"cnt": F.count("*"), "mx": F.max("user_id")},
            {"cnt": F.sum("cnt"), "mx": F.max("mx")},
            salt_buckets=8,
        ).collect()
    }
    assert plain == salted


def test_explode_salt_join_matches_plain(spark):
    big = spark.createDataFrame(
        [(1, i) for i in range(100)] + [(2, 0)], "k int, v int"
    )
    small = spark.createDataFrame([(1, "hot"), (2, "cold")], "k int, name string")
    plain = sorted((r.k, r.v, r.name) for r in big.join(small, "k").collect())
    salted = sorted(
        (r.k, r.v, r.name)
        for r in explode_salt_join(big, small, "k", salt_buckets=8).collect()
    )
    assert plain == salted


def _hot_df(spark, n=200_000):
    """Synthetic hot-key table: key 0 holds 30% of all rows, the rest
    spread over ~1000 uniform keys."""
    return spark.range(n).select(
        F.when((F.col("id") % 10) < 3, F.lit(0))
        .otherwise(F.col("id") % 1000)
        .cast("long")
        .alias("k"),
        F.col("id").alias("v"),
    )


def test_hot_key_salting_balances_shuffle(spark):
    """The scale evidence for salting: with one key owning 30% of rows,
    a plain hash exchange funnels all of them to ONE reducer (that task
    IS the job's wall clock at 100 TB); salting bounds every reducer.
    Measured on the actual exchange distribution, deterministic."""
    n = 200_000
    buckets = 32
    df = _hot_df(spark, n).withColumn(
        "__salt", (F.rand(seed=42) * buckets).cast("int")
    )

    def max_partition_rows(*cols):
        return (
            df.repartition(buckets, *cols)
            .groupBy(F.spark_partition_id().alias("p"))
            .count()
            .agg(F.max("count"))
            .first()[0]
        )

    naive = max_partition_rows(F.col("k"))
    salted = max_partition_rows(F.col("k"), F.col("__salt"))
    assert naive >= 0.30 * n          # hot key concentrated on one task
    assert salted <= naive / 4        # salt spreads it >= 4x flatter
    # with 32 salt buckets the hot key's 60k rows land ~2k per reducer;
    # allow generous headroom over the uniform floor
    assert salted <= (0.30 * n) / buckets + (0.70 * n) / buckets * 3


def test_salted_agg_on_hot_key_correct_and_balanced(spark):
    """Correctness + timing of salted_agg on the hot-key table; timing
    is informational (printed), the assertion is on results."""
    import time

    df = _hot_df(spark)
    t0 = time.perf_counter()
    plain = {
        r.k: (r.cnt, r.s)
        for r in df.groupBy("k")
        .agg(F.count("*").alias("cnt"), F.sum("v").alias("s"))
        .collect()
    }
    t_plain = time.perf_counter() - t0
    t0 = time.perf_counter()
    salted = {
        r.k: (r.cnt, r.s)
        for r in salted_agg(
            df,
            ["k"],
            {"cnt": F.count("*"), "s": F.sum("v")},
            {"cnt": F.sum("cnt"), "s": F.sum("s")},
            salt_buckets=32,
        ).collect()
    }
    t_salted = time.perf_counter() - t0
    print(f"hot-key agg: plain={t_plain:.3f}s salted={t_salted:.3f}s")
    assert plain == salted
    assert plain[0][0] == 60_000  # the hot key really is 30% of 200k

    # plan shape: two aggregation phases keyed (k, __salt) then (k)
    plan = salted_agg(
        df, ["k"], {"cnt": F.count("*")}, {"cnt": F.sum("cnt")}, salt_buckets=32
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 4  # partial+final for both stages
    assert "__salt" in plan


def test_explode_salt_join_on_hot_key(spark):
    """Hot-key join through the salted path: equal results, and the
    replicated small side spreads the hot key across reducers."""
    big = _hot_df(spark, 50_000)
    small = (
        big.select("k").distinct().withColumn("name", F.concat(F.lit("n"), F.col("k")))
    )
    plain = big.join(small, "k").groupBy("k").count()
    salted = explode_salt_join(big, small, "k", salt_buckets=16).groupBy("k").count()
    assert {(r.k, r["count"]) for r in plain.collect()} == {
        (r.k, r["count"]) for r in salted.collect()
    }
