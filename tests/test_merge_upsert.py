"""merge_upsert edge cases beyond the oracle-checked query."""

import pytest

from ingest_pipeline_spark.operators.merge import merge_upsert


def test_insert_leaves_unknown_target_cols_null(spark):
    tgt = spark.createDataFrame(
        [(1, 10.0, "a")], "key long, price double, note string"
    )
    src = spark.createDataFrame([(2, 20.0)], "key long, price double")
    rows = {
        r["key"]: r.asDict()
        for r in merge_upsert(tgt, src, ["key"]).collect()
    }
    assert rows[1]["_merge_action"] == "kept" and rows[1]["note"] == "a"
    assert rows[2]["_merge_action"] == "inserted"
    assert rows[2]["price"] == 20.0 and rows[2]["note"] is None


def test_delete_flag_drops_only_matched(spark):
    tgt = spark.createDataFrame([(1, 1.0), (2, 2.0)], "key long, v double")
    src = spark.createDataFrame(
        [(1, 9.0, True), (3, 3.0, True)], "key long, v double, del boolean"
    )
    out = merge_upsert(tgt, src, ["key"], delete_col="del")
    rows = {r["key"]: r["_merge_action"] for r in out.collect()}
    # matched+del dropped; unmatched source row inserts even with del=True
    assert rows == {2: "kept", 3: "inserted"}


def test_unknown_update_col_raises(spark):
    tgt = spark.createDataFrame([(1, 1.0)], "key long, v double")
    src = spark.createDataFrame([(1, 2.0)], "key long, v double")
    with pytest.raises(KeyError):
        merge_upsert(tgt, src, ["key"], update_cols=["nope"])


def test_cdc_apply_semantics(spark):
    """Latest-change-wins CDC apply: update, insert, delete, no-op
    delete on unseen key, pass-through — and a stale delete superseded
    by a later upsert must survive."""
    from ingest_pipeline_spark.operators.merge import cdc_apply

    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "key long, v double"
    )
    changes = spark.createDataFrame(
        [
            (1, 11.0, 1, "U"),   # update key 1
            (2, 0.0, 1, "D"),    # delete key 2
            (4, 40.0, 1, "U"),   # insert key 4
            (5, 0.0, 1, "D"),    # delete unseen key 5: no-op, NOT insert
            (6, 60.0, 1, "D"),   # stale delete...
            (6, 61.0, 2, "U"),   # ...superseded: key 6 inserts at 61
            (1, 12.0, 2, "U"),   # later update wins for key 1
        ],
        "key long, v double, seq long, op string",
    )
    got = {
        r.key: (r.v, r._cdc_action)
        for r in cdc_apply(base, changes, ["key"], ["seq"]).collect()
    }
    assert got == {
        1: (12.0, "updated"),
        3: (30.0, "kept"),
        4: (40.0, "inserted"),
        6: (61.0, "inserted"),
    }
