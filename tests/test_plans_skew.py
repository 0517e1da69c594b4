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
