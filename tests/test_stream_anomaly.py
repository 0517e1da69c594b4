"""Streaming CUSUM control chart (streaming/anomaly.py): the stream
must emit EXACTLY the batch fallback's numbers (decimal-identical
state), and the alert must latch at the threshold."""

from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

from ingest_pipeline_spark.streaming.anomaly import cusum_stream
from ingest_pipeline_spark.streaming.events import run_stream_once

SF = "/root/testdata/sf0.001"
BASE = {"purchase": "55.00", "click": "40.00"}


def _batch_rows(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    return sorted(
        tuple(r)
        for r in cusum_stream(ev, BASE, threshold=1e9).collect()
    )


def test_stream_matches_batch_fallback(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = run_stream_once(
        spark,
        f"{SF}/events.parquet",
        ev.schema,
        lambda src: cusum_stream(src, BASE, threshold=1e9),
        query_name="cusum_out",
    )
    assert sorted(tuple(r) for r in got.collect()) == _batch_rows(spark)


def test_batch_matches_pure_python_fold(spark):
    t = pq.read_table(
        f"{SF}/events.parquet",
        columns=["event_id", "ts", "event_type", "value"],
    ).to_pydict()
    rows = sorted(
        zip(t["event_type"], t["ts"], t["event_id"], t["value"]),
        key=lambda r: (r[1], r[2]),
    )
    cent = Decimal("0.01")
    acc: dict[str, list] = {}
    for et, _ts, _id, v in rows:
        if et not in BASE:
            continue
        st = acc.setdefault(et, [0, Decimal(0), Decimal(0)])
        st[0] += 1
        # HALF_UP matches _q2's Spark decimal(18,2)-cast semantics; the
        # default HALF_EVEN would diverge on exact .xx5 halves
        st[1] += Decimal(repr(float(v))).quantize(
            cent, rounding=ROUND_HALF_UP
        ) - Decimal(BASE[et])
        st[2] = max(st[2], abs(st[1]))
    expected = sorted(
        (k, n, float(s), float(p), float(p) >= 1e9)
        for k, (n, s, p) in acc.items()
    )
    assert _batch_rows(spark) == expected


def test_alert_latches_at_threshold(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03"]),
            "event_type": ["purchase"] * 3,
            "value": [100.0, 100.0, 10.0],
        }
    )
    df = spark.createDataFrame(pdf)
    out = {r["key"]: r for r in cusum_stream(df, BASE, threshold=80.0).collect()}
    # deviations: +45, +45, -45 → cusum 45, peak 90 ≥ 80 → alert
    r = out["purchase"]
    assert r["n_obs"] == 3
    assert r["cusum"] == 45.0
    assert r["peak_abs"] == 90.0
    assert bool(r["alert"]) is True
    quiet = cusum_stream(df, BASE, threshold=95.0).collect()[0]
    assert bool(quiet["alert"]) is False
