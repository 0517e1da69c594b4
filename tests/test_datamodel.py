"""Schema-registry smoke tests: every canonical shape constructs."""

import datetime

from ingest_pipeline_spark.datamodel import SCHEMAS


def test_all_schemas_construct(spark):
    samples = {
        "file_manifest": [("a/b.txt", "text", 10, None, None, False, True)],
        "metadata_record": [("codex", "ds1", None, None, "D1-S1")],
        "metadata_document": [
            (
                "u1",
                {"k": "v"},
                [("A. Person", "Uni", "0000-0001")],
                [{"ab": "x"}],
                [("f.txt", "text", 1, None, None, None, None)],
                ["prov1"],
            )
        ],
        "entity": [("u1", "Dataset", "new", "grp", datetime.datetime(2024, 1, 1))],
        "edge": [("u1", "u2")],
        "status_update": [("u1", "qa", "r1")],
        "rule": [("^x", "payload", 0)],
        "checksum_record": [("p", 1, "u1", None, "s", "m")],
        "checksum_manifest": [("u1", 2, 10, "d")],
    }
    for name, schema in SCHEMAS.items():
        df = spark.createDataFrame(samples[name], schema)
        assert df.count() == 1, name
        assert df.schema == schema, name
