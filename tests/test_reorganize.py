"""Upload reorganization phase 2 (split_and_create populate): e2e on disk."""

import os

import pytest

from pyspark.sql import functions as F

from ingest_pipeline_spark.operators.reorganize import (
    execute_file_ops,
    is_shared_upload,
    plan_reorganize,
    reorganized_integrity,
    shared_upload_violations,
    write_child_metadata,
)

META_SCHEMA = (
    "new_uuid string, data_path string, contributors_path string, "
    "antibodies_path string, non_global_files string, assay_type string"
)


def _listing_df(spark, root):
    rows = []
    for dirpath, _dn, fns in os.walk(root):
        for fn in fns:
            rows.append((os.path.relpath(os.path.join(dirpath, fn), root).replace(os.sep, "/"),))
    return spark.createDataFrame(rows, "rel_path string")


def _dest_listing_df(spark, root):
    rows = []
    for dirpath, _dn, fns in os.walk(root):
        for fn in fns:
            rel = os.path.relpath(os.path.join(dirpath, fn), root).replace(os.sep, "/")
            uuid, _, rest = rel.partition("/")
            rows.append((uuid, rest))
    return spark.createDataFrame(rows, "uuid string, rel_path string")


def _make_upload(tmp_path, shared=False):
    up = tmp_path / "upload"
    (up / "extras").mkdir(parents=True)
    (up / "extras" / "notes.txt").write_text("extra")
    (up / "contributors.tsv").write_text("name\nalice\n")
    if shared:
        (up / "global").mkdir()
        (up / "global" / "ref.bin").write_bytes(b"shared-ref")
        (up / "non_global" / "d1").mkdir(parents=True)
        (up / "non_global" / "d2").mkdir(parents=True)
        (up / "non_global" / "d1" / "cells.csv").write_text("a,b\n1,2\n")
        (up / "non_global" / "d2" / "cells.csv").write_text("a,b\n3,4\n")
    else:
        (up / "d1").mkdir()
        (up / "d1" / "raw.bin").write_bytes(b"\x01\x02")
        (up / "d2").mkdir()
        (up / "d2" / "raw.bin").write_bytes(b"\x03\x04\x05")
    return up


def test_reorganize_non_shared_moves_data(spark, tmp_path):
    up = _make_upload(tmp_path, shared=False)
    dest = tmp_path / "children"
    meta = spark.createDataFrame(
        [
            ("uuid-1", "d1", "contributors.tsv", None, None, "codex"),
            ("uuid-2", "d2", "contributors.tsv", None, None, "codex"),
        ],
        META_SCHEMA,
    )
    listing = _listing_df(spark, str(up))
    assert not is_shared_upload(listing)
    assert shared_upload_violations(meta, shared=False).count() == 0

    plan = plan_reorganize(meta, listing, shared=False)
    ops = {(r.new_uuid, r.op, r.src_rel, r.dest_rel) for r in plan.collect()}
    assert ("uuid-1", "move", "d1/raw.bin", "raw.bin") in ops
    assert ("uuid-1", "copy", "extras/notes.txt", "extras/notes.txt") in ops
    assert ("uuid-1", "copy", "contributors.tsv", "extras/contributors.tsv") in ops
    assert ("uuid-2", "move", "d2/raw.bin", "raw.bin") in ops

    execute_file_ops(plan, str(up), str(dest))
    write_child_metadata(meta, str(dest))

    assert (dest / "uuid-1" / "raw.bin").read_bytes() == b"\x01\x02"
    assert (dest / "uuid-2" / "raw.bin").read_bytes() == b"\x03\x04\x05"
    assert (dest / "uuid-1" / "extras" / "notes.txt").exists()
    assert (dest / "uuid-1" / "extras" / "contributors.tsv").exists()
    assert not (up / "d1" / "raw.bin").exists()  # moved, not copied
    md = (dest / "uuid-1" / "uuid-1-metadata.tsv").read_text().splitlines()
    assert md[0].split("\t")[0] == "data_path"
    assert md[1].split("\t")[0] == "."  # data_path rewritten
    assert "extras/contributors.tsv" in md[1]

    # declared-vs-actual: every planned dest exists on disk
    missing = reorganized_integrity(plan, _dest_listing_df(spark, str(dest)))
    assert missing.count() == 0

    # idempotent retry: re-running the executed plan must not fail
    execute_file_ops(plan, str(up), str(dest))


def test_reorganize_shared_upload(spark, tmp_path):
    up = _make_upload(tmp_path, shared=True)
    dest = tmp_path / "children"
    meta = spark.createDataFrame(
        [
            ("uuid-1", "d1", None, None, "d1/cells.csv", "codex"),
            ("uuid-2", "d2", None, None, "d2/cells.csv", "codex"),
        ],
        META_SCHEMA,
    )
    listing = _listing_df(spark, str(up))
    assert is_shared_upload(listing)
    assert shared_upload_violations(meta, shared=True).count() == 0

    plan = plan_reorganize(meta, listing, shared=True)
    execute_file_ops(plan, str(up), str(dest))
    # global tree lands in every child; non_global only where listed
    assert (dest / "uuid-1" / "ref.bin").read_bytes() == b"shared-ref"
    assert (dest / "uuid-2" / "ref.bin").read_bytes() == b"shared-ref"
    assert (dest / "uuid-1" / "d1" / "cells.csv").read_text() == "a,b\n1,2\n"
    assert not (dest / "uuid-1" / "d2").exists()
    assert (dest / "uuid-2" / "d2" / "cells.csv").read_text() == "a,b\n3,4\n"
    missing = reorganized_integrity(plan, _dest_listing_df(spark, str(dest)))
    assert missing.count() == 0


def test_reorganize_violations_and_missing_sources(spark, tmp_path):
    up = _make_upload(tmp_path, shared=True)
    meta = spark.createDataFrame(
        [
            ("uuid-1", "d1", None, None, None, "codex"),          # shared but no list
            ("uuid-2", "d2", None, None, "d2/nope.csv", "codex"),  # listed file missing
        ],
        META_SCHEMA,
    )
    v = {r.uuid: r.violation for r in shared_upload_violations(meta, shared=True).collect()}
    assert v == {"uuid-1": "shared_upload_missing_non_global_files"}

    plan = plan_reorganize(meta, _listing_df(spark, str(up)), shared=True)
    bad = plan.filter(F.col("op") == "missing_source").collect()
    assert [(r.new_uuid, r.src_rel) for r in bad] == [("uuid-2", "non_global/d2/nope.csv")]
    with pytest.raises(Exception, match="missing"):
        execute_file_ops(plan, str(up), str(tmp_path / "children"))
