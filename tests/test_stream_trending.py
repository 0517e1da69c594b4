"""Stream == batch equivalence for events_trending_topk: the hopping
per-type counts run through the REAL streaming engine (readStream →
watermark → windowed agg → memory sink), then rank/momentum are applied
post-aggregation exactly as a foreachBatch consumer would — the result
must be row-identical to the registered batch query."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ingest_pipeline_spark import queries as q  # noqa: E402
from ingest_pipeline_spark.streaming.events import (  # noqa: E402
    run_stream_once,
    windowed_event_counts,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
EVENT_SCHEMA = (
    "event_id long, user_id long, event_type string, ts timestamp, "
    "value double, session_hint string"
)


def _rank_and_momentum(c):
    wl = Window.partitionBy("event_type").orderBy("window_start")
    m = c.select(
        F.col("window_start").alias("win_start"),
        "event_type",
        F.col("n_events").cast("bigint").alias("n"),
        (
            F.col("n_events") - F.lag("n_events").over(wl)
        ).cast("bigint").alias("momentum"),
    )
    wr = Window.partitionBy("win_start").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        m.withColumn("rnk", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("win_start", "event_type", "n", "momentum", "rnk")
    )


def test_streamed_counts_plus_rank_match_batch_query(spark):
    streamed_counts = run_stream_once(
        spark,
        os.path.join(SF_DIR, "events.parquet"),
        EVENT_SCHEMA,
        lambda src: windowed_event_counts(
            src, window_len="6 hours", slide="3 hours", watermark="12 hours"
        ),
        query_name="trending_counts",
    )
    got = sorted(
        map(tuple, _rank_and_momentum(streamed_counts).collect())
    )
    want = sorted(map(tuple, q.events_trending_topk(spark, SF_DIR).collect()))
    assert got == want and len(want) > 0
