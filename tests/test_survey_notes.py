"""merge_notes guards (reports/survey.py — the reference's
join_notes/_merge_note_pair): exact word semantics vs a pure-Python
replay of new_dataset_survey.py:104-126, including the cases the
registered query's constrained seeds cannot reach (x/y duplicate
words, multi-word volatile drops, all-empty merges)."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ingest_pipeline_spark.reports.survey import (  # noqa: E402
    VOLATILE_NOTES,
    merge_notes,
)


def _reference_merge(note_x, note_y):
    # pure-Python replay of _merge_note_pair (pandas 'nan' quirk is the
    # None case here)
    note_x = note_x or ""
    note_y = note_y or ""
    words_x = [w.strip() for w in note_x.split(";")]
    words_x = [w for w in words_x if w]
    words_y = [w.strip() for w in note_y.split(";")]
    words_y = [w for w in words_y if w and w not in set(VOLATILE_NOTES)]
    dedup = []
    for w in words_x + words_y:
        if w not in dedup:
            dedup.append(w)
    return ";".join(dedup)


CASES = [
    # (uuid, note_x, note_y)
    (1, "UUID COLLISION! ", "priority review; needs contact"),
    (2, "", "  UUID COLLISION!;legacy"),  # volatile dropped from y
    (3, "UUID COLLISION! ", " UUID COLLISION! "),  # x keeps its own volatile
    (4, "alpha;beta", "beta; gamma ;alpha"),  # cross-side dedup, order kept
    (5, "", ""),
    (6, None, ";;;  ;"),
    (7, "BAD UUID: No parents? ;x", "BAD UUID: No parents?;x;y"),
    (8, "not in survey because missing", None),
]


def test_merge_notes_matches_reference(spark):
    df = spark.createDataFrame(
        [(u, x) for u, x, _ in CASES], "uuid bigint, note string"
    )
    notes = spark.createDataFrame(
        [(u, y) for u, y, _ in [(u, y, None) for u, _, y in CASES]
         if y is not None],
        "uuid bigint, note string",
    )
    got = {
        r["uuid"]: r["note"]
        for r in merge_notes(df, notes).collect()
    }
    for u, x, y in CASES:
        assert got[u] == _reference_merge(x, y), (u, got[u])


def test_merge_notes_keeps_other_columns_and_row_count(spark):
    df = spark.createDataFrame(
        [(1, "a", "x;y"), (2, "b", None)],
        "uuid bigint, payload string, note string",
    )
    notes = spark.createDataFrame([(1, "y;z")], "uuid bigint, note string")
    out = merge_notes(df, notes).collect()
    assert {(r["uuid"], r["payload"], r["note"]) for r in out} == {
        (1, "a", "x;y;z"),
        (2, "b", ""),
    }


def test_merge_notes_random_property(spark):
    """Property sweep: random note strings over an alphabet of words,
    semicolons, blanks, and VOLATILE_NOTES must merge exactly as the
    pure-Python reference replay (catches word-boundary/strip/dedup
    edge cases the 8 hand cases miss)."""
    import random

    rng = random.Random(13)
    vocab = ["a", "bb", "c c", " d ", "", "UUID COLLISION!",
             "BAD TYPE NAME", "x;y", ";", "  "]

    def rand_note():
        if rng.random() < 0.15:
            return None
        return ";".join(rng.choice(vocab) for _ in range(rng.randrange(5)))

    cases = [(i, rand_note(), rand_note()) for i in range(200)]
    df = spark.createDataFrame(
        [(u, x) for u, x, _ in cases], "uuid bigint, note string"
    )
    notes = spark.createDataFrame(
        [(u, y) for u, _, y in cases if y is not None],
        "uuid bigint, note string",
    )
    got = {r["uuid"]: r["note"] for r in merge_notes(df, notes).collect()}
    for u, x, y in cases:
        assert got[u] == _reference_merge(x, y), (u, x, y, got[u])
