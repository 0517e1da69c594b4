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


def test_normalize_event_ts_both_generations(spark):
    """tables.normalize_event_ts handles nanosecond longs (legacy
    nanosAsLong testdata) and TIMESTAMP_NTZ (timestamp[us] testdata)
    identically: both land on session-tz TimestampType, same values."""
    from pyspark.sql import types as T

    from ingest_pipeline_spark.tables import normalize_event_ts

    micros = 1_700_000_000_000_000  # 2023-11-14T22:13:20 UTC
    as_long = spark.createDataFrame([(micros * 1000,)], "ts long")
    got_long = normalize_event_ts(as_long)
    assert isinstance(got_long.schema["ts"].dataType, T.TimestampType)

    as_ntz = spark.sql(
        f"SELECT CAST(timestamp_micros({micros}) AS TIMESTAMP_NTZ) AS ts"
    )
    assert isinstance(as_ntz.schema["ts"].dataType, T.TimestampNTZType)
    got_ntz = normalize_event_ts(as_ntz)
    assert isinstance(got_ntz.schema["ts"].dataType, T.TimestampType)
    assert got_long.first().ts == got_ntz.first().ts == datetime.datetime(
        2023, 11, 14, 22, 13, 20
    )

    # already-normalized input passes through untouched
    assert normalize_event_ts(got_ntz) is got_ntz


def test_schema_diff_reports_all_drift_kinds(spark):
    from pyspark.sql import types as T

    from ingest_pipeline_spark.validate.checks import schema_diff

    old = spark.createDataFrame(
        [], T.StructType([
            T.StructField("id", T.LongType(), False),
            T.StructField("gone", T.StringType()),
            T.StructField("widened", T.IntegerType()),
        ]))
    new = spark.createDataFrame(
        [], T.StructType([
            T.StructField("id", T.LongType(), True),
            T.StructField("widened", T.LongType()),
            T.StructField("fresh", T.DoubleType()),
        ]))
    diff = schema_diff(old, new)
    kinds = {(d["column"], d["kind"]) for d in diff}
    assert kinds == {
        ("gone", "removed"),
        ("fresh", "added"),
        ("widened", "type_changed"),
        ("id", "nullability_changed"),
    }
    assert schema_diff(old, old) == []
