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


# --------------------------------------------------------------------------
# HLL
# --------------------------------------------------------------------------


def test_hll_merge_identity(spark):
    """hll(A ∪ B) == finalize(max-merge(registers(A), registers(B))) —
    the property that lets a 100 TB rollup fold partitions without
    rescanning."""
    from ingest_pipeline_spark.operators.sketches import (
        hll_distinct,
        hll_estimate,
        hll_registers,
    )

    a = spark.range(0, 3000).select(
        F.lit("g").alias("grp"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    b = spark.range(2000, 6000).select(
        F.lit("g").alias("grp"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    direct = hll_distinct(a.union(b), "grp", "v").collect()[0]
    merged_regs = (
        hll_registers(a, "grp", "v")
        .union(hll_registers(b, "grp", "v"))
        .groupBy("grp", "bucket")
        .agg(F.max("mj").alias("mj"))
    )
    merged = hll_estimate(merged_regs, "grp").collect()[0]
    assert direct["est_distinct"] == merged["est_distinct"]
    assert direct["v_empty"] == merged["v_empty"]


def test_hll_accuracy_and_small_range(spark):
    from ingest_pipeline_spark.operators.sketches import hll_distinct

    big = spark.range(6000).select(
        F.lit("big").alias("grp"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    est = hll_distinct(big, "grp", "v").collect()[0]["est_distinct"]
    # m=32 → sd ~ 1.04/sqrt(32) ~ 18%; this fixed draw lands ~6%
    # off, and the 0.30 bound can never admit a factor-2 scale bug
    # (the "x"-prefixed draw instead hits the small-m heavy tail at
    # +73% — faithful to the algorithm, verified against the pure
    # reference implementation below, just a bad test fixture)
    assert abs(est - 6000) / 6000 < 0.30, est
    # tiny group: linear counting path, duplicates absorbed by max()
    small = spark.range(5).select(
        F.lit("s").alias("grp"), F.concat(F.lit("y"), F.col("id")).alias("v")
    )
    small = small.union(small)
    row = hll_distinct(small, "grp", "v").collect()[0]
    assert row["v_empty"] > 0 and 1.0 <= row["est_distinct"] <= 15.0


# --------------------------------------------------------------------------
# Count-min
# --------------------------------------------------------------------------


def test_cms_never_underestimates_and_merges(spark):
    from ingest_pipeline_spark.operators.sketches import cms_counters, cms_estimate

    # skewed frequencies: key i appears i+1 times
    rows = spark.range(40).selectExpr(
        "explode(sequence(0, cast(id as int))) as dup", "id as key"
    )
    exact = {r["key"]: r["n"] for r in rows.groupBy("key").agg(F.count("*").alias("n")).collect()}
    counters = cms_counters(rows, "key", d=4, w=64)
    keys = rows.select("key").distinct()
    est = {
        r["key"]: r["est_count"]
        for r in cms_estimate(counters, keys, "key", d=4, w=64).collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] >= n  # CMS guarantee: never under
    # merge = adding the two halves' counter grids
    h1 = rows.filter(F.col("dup") % 2 == 0)
    h2 = rows.filter(F.col("dup") % 2 == 1)
    merged = (
        cms_counters(h1, "key", d=4, w=64)
        .union(cms_counters(h2, "key", d=4, w=64))
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    est_m = {
        r["key"]: r["est_count"]
        for r in cms_estimate(merged, keys, "key", d=4, w=64).collect()
    }
    assert est_m == est


def test_cms_estimates_unseen_keys_as_zero(spark):
    """A probe key absent from the sketched data must estimate 0 (all
    its buckets empty ⇒ min = 0), not vanish from the output — and a
    key whose buckets are only partially occupied must min over ALL d
    rows, preserving est ≥ true for arbitrary probe sets."""
    from ingest_pipeline_spark.operators.sketches import cms_counters, cms_estimate

    rows = spark.range(5).select(F.col("id").alias("key"))  # keys 0-4 once
    counters = cms_counters(rows, "key", d=4, w=64)
    probe = spark.range(2000, 2010).select(F.col("id").alias("key"))
    est = {
        r["key"]: r["est_count"]
        for r in cms_estimate(counters, probe, "key", d=4, w=64).collect()
    }
    assert set(est) == set(range(2000, 2010))  # nothing dropped
    assert all(v >= 0 for v in est.values())
    # with only 5 seen keys on a 4x64 grid most foreign probes hit at
    # least one empty bucket -> exact 0
    assert any(v == 0 for v in est.values())


# --------------------------------------------------------------------------
# Bloom
# --------------------------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    from ingest_pipeline_spark.operators.sketches import bloom_bits, bloom_probe

    build = spark.range(0, 500).select(F.col("id").alias("key"))
    probe = spark.range(0, 2000).select(F.col("id").alias("key"))
    bits = bloom_bits(build, "key", k=3, m=2048)
    out = {r["key"]: r["is_candidate"] for r in bloom_probe(probe, "key", bits, k=3, m=2048).collect()}
    assert len(out) == 2000
    for k in range(500):
        assert out[k], f"false negative on {k}"
    # with m=2048 bits / 500 keys the filter must actually reject most
    # non-members (fp rate ~ (1-e^(-kn/m))^k ~ 17%)
    rejected = sum(1 for k in range(500, 2000) if not out[k])
    assert rejected > 900


def test_bloom_bits_bounded(spark):
    from ingest_pipeline_spark.operators.sketches import bloom_bits

    build = spark.range(0, 10000).select(F.col("id").alias("key"))
    n_bits = bloom_bits(build, "key", k=3, m=512).count()
    assert n_bits <= 512  # state is the bit set, never the key set


def test_hll_matches_reference_implementation(spark):
    """The full Spark estimate must equal a pure-Python HLL computed
    from the same md5 bit math — guards the estimator constants
    (register/numerator scale), which oracle parity CANNOT catch
    because the SQL mirrors the same constants."""
    import hashlib
    import math

    from ingest_pipeline_spark.operators.sketches import hll_distinct

    vals = [f"key{i}" for i in range(2500)]
    m = 32
    regs = [0] * m
    for v in vals:
        h = int(hashlib.md5(v.encode()).hexdigest()[:8], 16)
        bucket, rem = h >> 27, h & ((1 << 27) - 1)
        rho = 28 if rem == 0 else 28 - rem.bit_length()
        regs[bucket] = max(regs[bucket], rho)
    z = sum(2.0 ** (-r) for r in regs)
    est = 0.697 * m * m / z
    v_empty = sum(1 for r in regs if r == 0)
    if est <= 2.5 * m and v_empty > 0:
        est = m * math.log(m / v_empty)
    expected = round(est, 6)

    df = spark.createDataFrame([("g", v) for v in vals], "grp string, v string")
    got = hll_distinct(df, "grp", "v").collect()[0]["est_distinct"]
    assert got == expected, (got, expected)


def test_kmv_matches_reference_implementation(spark):
    """Spark KMV estimate == a pure-Python KMV from the same md5 hash
    — guards the estimator constants against mirrored-in-the-oracle
    scale bugs (same rationale as the HLL reference test)."""
    from ingest_pipeline_spark.operators.sketches import kmv_distinct

    vals = [f"val{i}" for i in range(3000)]
    import hashlib

    k = 16
    hs = sorted(
        int(hashlib.md5(v.encode()).hexdigest()[:13], 16) / float(1 << 52)
        for v in set(vals)
    )
    expected = round((k - 1) / hs[k - 1], 6) if len(hs) >= k else float(len(hs))

    df = spark.createDataFrame([("g", v) for v in vals], "grp string, v string")
    got = kmv_distinct(df, "grp", "v", k=k).collect()[0]["est_distinct"]
    assert got == expected, (got, expected)
