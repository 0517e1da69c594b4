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
