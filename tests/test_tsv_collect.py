"""collect_tsvs guards (operators/tsv_collect.py — collect_tsvs.py
parity): signature classification priority and subset semantics, the
per-assay first-stem merge, stem dedup + conflict detection, the
multi-assay error path, and a pure-Python reference replay of the
whole gather on a hand-built census."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ingest_pipeline_spark.operators.tsv_collect import (  # noqa: E402
    SIGNATURE_RULES,
    classify_tsv_kind,
    collect_tsvs,
)

SCHEMA = (
    "src_uuid bigint, stem string, cols array<string>, "
    "assays array<string>, n_rows bigint, fingerprint string"
)

META_COLS = ["assay_type", "data_path", "donor_id"]
CONTRIB_COLS = ["affiliation", "first_name", "last_name"]
AB_COLS = ["channel_id", "antibody_name", "rr_id"]


def _census(spark):
    rows = [
        # two codex metadata files, different stems: merge keyed by the
        # FIRST stem (uuid order) — collect_tsvs.py:60-68
        (1, "meta-b", META_COLS, ["codex"], 10, ""),
        (2, "meta-a", META_COLS, ["codex"], 5, ""),
        # a second assay gets its own output row
        (3, "meta-c", META_COLS, ["rnaseq"], 7, ""),
        # multi-assay file trips the unique_assays==1 assert
        (4, "meta-d", META_COLS, ["codex", "rnaseq"], 3, ""),
        # same contributors stem, identical content: deduped, first kept
        (1, "contributors", CONTRIB_COLS, [], 4, "fp1"),
        (2, "contributors", CONTRIB_COLS, [], 4, "fp1"),
        # same antibodies stem, DIVERGENT content: conflict
        (1, "antibodies", AB_COLS, [], 6, "fpA"),
        (3, "antibodies", AB_COLS, [], 9, "fpB"),
        # unrelated tsv: ignored (collect_tsvs.py:83 'ignored.' branch)
        (5, "notes", ["foo", "bar"], [], 2, "x"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_classifier_subset_and_priority(spark):
    rows = [
        # superset of the metadata signature still matches
        (1, "m", META_COLS + ["extra"], [], 1, ""),
        # metadata wins over contributors when BOTH signatures present
        # (the reference's if/elif order)
        (2, "both", META_COLS + CONTRIB_COLS, [], 1, ""),
        # missing one required column -> not that kind
        (3, "near", ["assay_type", "donor_id"], [], 1, ""),
        (4, "c", CONTRIB_COLS, [], 1, ""),
        (5, "a", AB_COLS, [], 1, ""),
    ]
    df = classify_tsv_kind(spark.createDataFrame(rows, SCHEMA))
    got = {r["stem"]: r["kind"] for r in df.collect()}
    assert got == {
        "m": "metadata",
        "both": "metadata",
        "near": None,
        "c": "contributors",
        "a": "antibodies",
    }
    # the registry is the reference's three signature sets verbatim
    assert {r.kind: set(r.required) for r in SIGNATURE_RULES} == {
        "metadata": {"assay_type", "data_path"},
        "contributors": {"affiliation", "first_name", "last_name"},
        "antibodies": {"channel_id", "antibody_name", "rr_id"},
    }


def test_gather_matches_reference_semantics(spark):
    out = {
        (r["kind"], r["stem"]): r.asDict()
        for r in collect_tsvs(_census(spark)).collect()
    }
    assert set(out) == {
        ("metadata", "meta-b"),
        ("metadata", "meta-c"),
        ("multi_assay_error", "meta-d"),
        ("contributors", "contributors"),
        ("antibodies", "antibodies"),
    }
    codex = out[("metadata", "meta-b")]  # first stem for assay codex
    assert codex["assay_type"] == "codex"
    assert codex["n_files"] == 2 and codex["n_rows"] == 15
    assert codex["src_uuids"] == "00000001,00000002"
    rna = out[("metadata", "meta-c")]
    assert rna["n_files"] == 1 and rna["n_rows"] == 7
    bad = out[("multi_assay_error", "meta-d")]
    assert bad["assay_type"] is None and bad["src_uuids"] == "00000004"
    contrib = out[("contributors", "contributors")]
    assert contrib["conflict"] is False
    assert contrib["n_files"] == 2 and contrib["n_rows"] == 4
    ab = out[("antibodies", "antibodies")]
    assert ab["conflict"] is True
    # representative = first uuid's file (the one the reference keeps)
    assert ab["n_rows"] == 6
    assert ab["src_uuids"] == "00000001,00000003"


def test_gather_empty_census(spark):
    df = collect_tsvs(spark.createDataFrame([], SCHEMA))
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        "kind", "stem", "assay_type", "n_files", "n_rows",
        "src_uuids", "conflict",
    ]
