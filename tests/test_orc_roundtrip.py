"""ORC source/sink roundtrip (sources/readers.read_orc +
sources/sinks.write_orc): schema and value fidelity for the engine's
core column types, timestamp-NTZ normalization parity with
tables.load_table, and single-file vs partitioned layout."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ingest_pipeline_spark.sources.readers import read_orc  # noqa: E402
from ingest_pipeline_spark.sources.sinks import write_orc  # noqa: E402
from ingest_pipeline_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_orc_roundtrip_documents(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "docs_orc")
    write_orc(docs, out, single_file=True)
    back = read_orc(spark, out)
    assert back.schema == docs.schema
    a = sorted(docs.collect(), key=lambda r: r["doc_id"])
    b = sorted(back.collect(), key=lambda r: r["doc_id"])
    assert a == b
    assert len([f for f in os.listdir(out) if f.endswith(".orc")]) == 1


def test_orc_roundtrip_timestamps_match_parquet_path(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    out = str(tmp_path / "events_orc")
    write_orc(ev.limit(200), out)
    back = read_orc(spark, out)
    # the NTZ-cast discipline: no timestamp_ntz leaks out of the reader
    assert all(
        f.dataType.typeName() != "timestamp_ntz" for f in back.schema.fields
    )
    want = {tuple(r) for r in ev.limit(200).collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == want


def test_orc_partitioned_layout(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").repartition(4)
    out = str(tmp_path / "docs_orc_parts")
    write_orc(docs, out)
    n_files = len([f for f in os.listdir(out) if f.endswith(".orc")])
    assert n_files == 4
    assert read_orc(spark, out).count() == docs.count()
