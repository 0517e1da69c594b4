"""asof_join operator semantics: inclusive ties, NULL payloads,
tolerance horizon, and the no-join-node plan shape."""

import datetime as dt

from pyspark.sql import functions as F

from ingest_pipeline_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),  # before any right row
            (2, "u1", _ts("2024-01-01 12:00:00")),  # exact tie with right
            (3, "u1", _ts("2024-01-01 15:00:00")),  # after two right rows
            (4, "u2", _ts("2024-01-01 09:00:00")),  # key with no right rows
        ],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 12:00:00"), 100.0),
            ("u1", _ts("2024-01-01 13:00:00"), 200.0),
        ],
        "k string, ts timestamp, v double",
    )
    return left, right


def test_asof_inclusive_and_latest(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, "k", "ts", "ts", ["v"])
    rows = {r["id"]: r for r in out.collect()}
    assert len(rows) == 4  # every left row survives
    assert rows[1]["matched_v"] is None          # nothing precedes
    assert rows[2]["matched_v"] == 100.0         # tie matches (inclusive)
    assert rows[3]["matched_v"] == 200.0         # latest of two, not first
    assert rows[4]["matched_v"] is None          # key never observed
    assert rows[3]["matched_ts"] == _ts("2024-01-01 13:00:00")


def test_asof_tolerance_expires_match(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, "k", "ts", "ts", ["v"], tolerance_sec=3600)
    rows = {r["id"]: r for r in out.collect()}
    assert rows[2]["matched_v"] == 100.0         # 0s old: fresh
    assert rows[3]["matched_v"] is None          # 2h old: expired
    assert rows[3]["id"] == 3                    # …but the left row survives


def test_asof_null_right_value_still_matches(spark):
    # a right row with NULL v must terminate the carry (struct payload),
    # not let an older non-null value leak forward
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 15:00:00"))], "id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 11:00:00"), 50.0),
            ("u1", _ts("2024-01-01 14:00:00"), None),
        ],
        "k string, ts timestamp, v double",
    )
    out = asof_join(left, right, "k", "ts", "ts", ["v"]).collect()[0]
    assert out["matched_v"] is None
    assert out["matched_ts"] == _ts("2024-01-01 14:00:00")


def test_asof_plan_no_join_one_exchange(spark):
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, "k", "ts", "ts", ["v"])
        ._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    )
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert node not in plan
    assert plan.count("Exchange hashpartitioning") == 1
