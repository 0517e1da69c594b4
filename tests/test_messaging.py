"""Messaging sink surface (S18): dispatch, routing, recipients, emit."""

import json
import os

from pyspark.sql import functions as F

from ingest_pipeline_spark.messaging import (
    CallableEmitter,
    CollectingEmitter,
    DEFAULT_TEST_CHANNEL,
    email_recipients,
    reject_stream_messages,
    render_messages,
    send_messages,
)


def _events(spark):
    return spark.createDataFrame(
        [
            (1, "error", None, None, None, "a@x"),       # processing error (no reason)
            (2, "error", "validation blew up", None, None, "b@x"),
            (3, "qa", None, None, None, "c@x"),
            (4, "reorganized", None, None, 7, "d@x"),
            (5, "processing", None, None, None, "e@x"),  # no rule -> dropped
        ],
        "uuid long, status string, reject_reason string, run_id string, "
        "n_children int, submitter_email string",
    )


def test_dispatch_subclass_gate_beats_main(spark):
    got = {r.uuid: r for r in render_messages(_events(spark), env="prod").collect()}
    assert got[1].rule == "dataset_error_processing"
    assert got[2].rule == "dataset_error"
    assert "validation blew up" in got[2].body
    assert got[3].rule == "dataset_qa"
    assert got[4].rule == "upload_reorganized"
    assert "7 datasets" in got[4].body
    assert 5 not in got  # status with no rule: no message is sent


def test_env_channel_routing(spark):
    prod = {r.uuid: r.channel for r in render_messages(_events(spark), env="prod").collect()}
    dev = {r.uuid: r.channel for r in render_messages(_events(spark), env="dev").collect()}
    assert prod[1] == "pipeline-alerts" and prod[3] == "curation"
    assert set(dev.values()) == {DEFAULT_TEST_CHANNEL}


def test_email_recipient_policy(spark):
    msgs = render_messages(_events(spark), env="prod").join(
        _events(spark).select("uuid", "submitter_email"), "uuid"
    )
    prod = {
        r.uuid: sorted(r.recipients)
        for r in email_recipients(msgs, env="prod").collect()
    }
    assert prod[1] == ["curation-team"]                 # error -> internal only
    assert prod[3] == sorted(["c@x", "curation-team"])  # good -> submitter + curation
    dev = {r.uuid: list(r.recipients) for r in email_recipients(msgs, env="dev").collect()}
    assert all(v == ["pipeline-notifications"] for v in dev.values())


def test_send_messages_driver_batches(spark):
    rec = CollectingEmitter()
    send_messages(render_messages(_events(spark)), rec, batch_size=3)
    assert [len(b) for b in rec.batches] == [3, 1]
    assert {m["rule"] for m in rec.messages} == {
        "dataset_error_processing", "dataset_error", "dataset_qa",
        "upload_reorganized",
    }


def test_send_messages_executor_path(spark, tmp_path):
    out = str(tmp_path / "emitted.jsonl")

    def post(batch):
        with open(out, "a") as f:
            for m in batch:
                f.write(json.dumps(m, sort_keys=True) + "\n")

    send_messages(
        render_messages(_events(spark)), CallableEmitter(post),
        batch_size=2, local=False,
    )
    assert os.path.exists(out)
    lines = [json.loads(x) for x in open(out)]
    assert {m["rule"] for m in lines} == {
        "dataset_error_processing", "dataset_error", "dataset_qa",
        "upload_reorganized",
    }


def test_reject_stream_feeds_messaging(spark):
    """status machine rejects -> rejected_update payloads end-to-end."""
    from ingest_pipeline_spark.operators.status_machine import (
        apply_status_updates,
    )

    ents = spark.createDataFrame(
        [(1, "new"), (2, "qa")], "uuid long, status string"
    )
    upd = spark.createDataFrame(
        [(1, "published", 10), (3, "qa", 11)],  # illegal + unknown entity
        "uuid long, new_status string, run_id long",
    )
    _, rejected = apply_status_updates(ents, upd, spark)
    msgs = {r.uuid: r for r in reject_stream_messages(rejected).collect()}
    assert msgs[1].rule == "rejected_update"
    assert "illegal_transition" in msgs[1].body
    assert "unknown_entity" in msgs[3].body
