"""Stream-stream interval join: the continuous plan must produce
exactly the batch range_join's pairs, and its state must be bounded
by watermarks (event-time conditions on both sides)."""

from pyspark.sql import functions as F

from ingest_pipeline_spark.operators.rangejoin import range_join
from ingest_pipeline_spark.streaming.events import (
    interval_join_stream,
    run_stream_once,
)
from ingest_pipeline_spark.tables import load_table, normalize_event_ts


def _split(ev):
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"), "user_id", F.col("ts").alias("e_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
    )
    return errors, clicks


def test_stream_interval_join_matches_batch_range_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    errors, clicks = _split(ev)
    batch_pairs = {
        (r["e_id"], r["c_id"])
        for r in range_join(
            errors, clicks, "user_id", "e_ts", "c_ts", horizon_sec=1800
        ).collect()
    }

    def transform(src):
        # one file stream, two filtered branches, self interval join —
        # the exact streaming counterpart of the batch operator
        s = normalize_event_ts(src)
        e, c = _split(s)
        return interval_join_stream(
            e, c, "user_id", "e_ts", "c_ts", horizon_sec=1800
        ).select("e_id", "c_id")

    raw = spark.read.parquet(f"{sf_dir}/events.parquet")  # on-disk schema
    out = run_stream_once(
        spark,
        f"{sf_dir}/events.parquet",
        raw.schema,
        transform,
        query_name="interval_join_out",
    )
    stream_pairs = {(r["e_id"], r["c_id"]) for r in out.collect()}
    assert stream_pairs == batch_pairs
    assert len(stream_pairs) > 0


def test_interval_join_stream_batch_parity_path(spark, sf_dir):
    # the same helper on batch inputs gives the same pairs (parity path)
    ev = load_table(spark, sf_dir, "events")
    errors, clicks = _split(ev)
    via_helper = {
        (r["e_id"], r["c_id"])
        for r in interval_join_stream(
            errors, clicks, "user_id", "e_ts", "c_ts", horizon_sec=1800
        ).collect()
    }
    via_range = {
        (r["e_id"], r["c_id"])
        for r in range_join(
            errors, clicks, "user_id", "e_ts", "c_ts", horizon_sec=1800
        ).collect()
    }
    assert via_helper == via_range
