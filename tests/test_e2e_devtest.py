"""Devtest-style end-to-end ingest (the reference's §5 mock-e2e model).

Simulates a full upload lifecycle on a synthetic directory with no
external services: stage an upload (metadata.tsv + data files) →
distributed listing → TSV extraction → DQ validation → two-phase
reorganize (id minting, checkpoint) → checksum manifest → status
transitions → survey report.  Every stage is the same library code
the registry queries use.
"""

import pytest

from pyspark.sql import functions as F

from ingest_pipeline_spark.operators.status_machine import apply_status_updates
from ingest_pipeline_spark.plans.reorganize import reorganize_two_phase
from ingest_pipeline_spark.reports.survey import order_columns
from ingest_pipeline_spark.sources.readers import listing, read_tsv
from ingest_pipeline_spark.validate.checks import Check, violation_counts


@pytest.fixture()
def upload_dir(tmp_path):
    up = tmp_path / "upload1"
    (up / "ds1").mkdir(parents=True)
    (up / "ds2").mkdir()
    (up / "ds1" / "raw.bin").write_bytes(b"\x01" * 64)
    (up / "ds2" / "raw.bin").write_bytes(b"\x02" * 128)
    (up / "metadata.tsv").write_text(
        "assay_type\tdata_path\ttissue_id\n"
        "snare2\tds1\tD1-S1\n"
        "codex\tds2\tD1-S2\n"
    )
    return up


def test_devtest_ingest_end_to_end(spark, upload_dir, tmp_path):
    # 1. distributed listing of the upload
    files = listing(spark, str(upload_dir))
    by_path = {r.rel_path: r.size for r in files.collect()}
    assert by_path["ds1/raw.bin"] == 64 and by_path["ds2/raw.bin"] == 128

    # 2. metadata.tsv extraction (untyped strings)
    meta = read_tsv(spark, str(upload_dir / "metadata.tsv"))
    assert meta.count() == 2

    # 3. DQ validation battery: required columns present + shaped
    report = {
        r.check_name: r.n_violations
        for r in violation_counts(
            meta,
            [
                Check("missing_assay", F.col("assay_type").isNull()),
                Check("missing_data_path", F.col("data_path").isNull()),
                Check(
                    "bad_tissue_id", ~F.col("tissue_id").rlike(r"^D\d+-S\d+$")
                ),
            ],
        ).collect()
    }
    assert report == {"missing_assay": 0, "missing_data_path": 0, "bad_tissue_id": 0}

    # 4. two-phase reorganize: mint children, freeze, emit
    children = reorganize_two_phase(
        spark, meta, "upload1", str(tmp_path / "frozen")
    )
    kids = {r.data_path: r for r in children.collect()}
    assert kids["ds1"].canonical_assay_type == "SNARE-seq2"
    assert all(r.status == "new" for r in kids.values())

    # 5. checksum manifest over the upload's files (flagship shape)
    manifest = (
        files.withColumn("parent", F.split(F.col("rel_path"), "/")[0])
        .groupBy("parent")
        .agg(F.count("*").alias("n_files"), F.sum("size").alias("total_bytes"))
    )
    man = {r.parent: (r.n_files, r.total_bytes) for r in manifest.collect()}
    assert man["ds1"] == (1, 64) and man["ds2"] == (1, 128)

    # 6. status transitions: new → processing → qa for both children
    ents = children.select(F.col("child_uuid").alias("uuid"), "status")
    upd1 = children.select(
        F.col("child_uuid").alias("uuid"),
        F.lit("processing").alias("new_status"),
        F.lit(1).alias("run_id"),
    )
    after1, rej1 = apply_status_updates(ents, upd1, spark)
    assert rej1.isEmpty()
    upd2 = upd1.withColumn("new_status", F.lit("qa")).withColumn("run_id", F.lit(2))
    after2, rej2 = apply_status_updates(after1, upd2, spark)
    assert {r.status for r in after2.collect()} == {"qa"}

    # 7. survey report with weighted column order
    final = after2.select("uuid", "status")
    kids_meta = children.select("child_uuid", "canonical_assay_type", "data_path")
    surveyed = order_columns(
        final.join(kids_meta, final.uuid == kids_meta.child_uuid).select(
            "uuid", "status", "canonical_assay_type", "data_path"
        ),
        {"uuid": -10, "status": 10},
    )
    assert surveyed.columns[0] == "uuid" and surveyed.columns[-1] == "status"
