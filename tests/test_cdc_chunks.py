"""Units for operators/dedup.cdc_chunks (content-defined chunking).

Three angles the oracle can't see:
- a pure-Python reference chunker (hashlib-free — same base-257 mod
  1e9+7 arithmetic) must produce identical (start, end, digest) spans,
- the chunk grid must TILE each document exactly (no gaps, no
  overlaps, full coverage of the normalized text),
- the realignment property that justifies CDC over fixed blocks: a
  prefix insertion leaves the shared suffix's chunks intact.
"""

from __future__ import annotations

import hashlib
import re

ROLLING_BASE = 257
ROLLING_MOD = 1_000_000_007


def _norm(text: str) -> str:
    s = re.sub(r"[^a-z0-9\s]", " ", text.lower())
    return re.sub(r"\s+", " ", s).strip()


def _ref_chunks(text: str, k: int = 8, divisor: int = 64):
    s = _norm(text)
    n = len(s)
    if n < 1:
        return []
    cuts = set()
    for i in range(0, max(n - k + 1, 0)):  # 0-indexed window start
        h = 0
        for j in range(k):
            h = (h + ord(s[i + j]) * pow(ROLLING_BASE, j, ROLLING_MOD)) % ROLLING_MOD
        if h % divisor == 0:
            cuts.add(i + k)  # 1-indexed inclusive end of the window
    cuts.add(n)
    out, prev = [], 0
    for c in sorted(cuts):
        chunk = s[prev:c]
        out.append((prev + 1, c, hashlib.md5(chunk.encode()).hexdigest()))
        prev = c
    return out


_FIXTURE = [
    (1, "The quick brown fox jumps over the lazy dog near the river bank "
        "while seventeen sleepy owls watch from a crooked oak tree at dusk"),
    (2, "zq9 The quick brown fox jumps over the lazy dog near the river bank "
        "while seventeen sleepy owls watch from a crooked oak tree at dusk"),
    (3, "short"),
    (4, "data pipelines shuffle partitions broadcast joins and window "
        "functions compose into one declarative plan that catalyst optimizes"),
]


def _spark_chunks(spark):
    from ingest_pipeline_spark.operators.dedup import cdc_chunks

    df = spark.createDataFrame(_FIXTURE, ["doc_id", "text"])
    rows = cdc_chunks(df, "text", "doc_id").collect()
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append((r["start"], r["end"], r["digest"]))
    return {i: sorted(v) for i, v in by_id.items()}


def test_cdc_matches_pure_python_reference(spark):
    got = _spark_chunks(spark)
    for doc_id, text in _FIXTURE:
        assert got.get(doc_id, []) == _ref_chunks(text), doc_id


def test_cdc_chunks_tile_exactly(spark):
    got = _spark_chunks(spark)
    for doc_id, text in _FIXTURE:
        spans = got[doc_id]
        assert spans[0][0] == 1
        assert spans[-1][1] == len(_norm(text))
        for (s1, e1, _), (s2, _e2, _d) in zip(spans, spans[1:]):
            assert s2 == e1 + 1, (doc_id, spans)


def test_cdc_realigns_after_prefix_insertion(spark):
    """Doc 2 is doc 1 with a 4-char prefix: every chunk of doc 1 that
    starts after doc 1's first boundary must reappear verbatim in doc
    2 (the content-defined grid re-synchronizes; a fixed grid would
    share nothing)."""
    got = _spark_chunks(spark)
    d1, d2 = got[1], got[2]
    assert len(d1) >= 3, "fixture must produce multiple chunks"
    digests2 = {d for _, _, d in d2}
    tail1 = [d for s, _, d in d1 if s > d1[0][1]]
    assert tail1, "doc 1 needs chunks after its first boundary"
    assert all(d in digests2 for d in tail1), (d1, d2)


# hypothesis property: for ARBITRARY text (unicode incl. punctuation the
# normalizer strips), the Spark chunker equals the pure-Python reference
# and the grid tiles exactly — the LZW-roundtrip discipline applied to
# the chunk geometry.
from hypothesis import HealthCheck, given, settings, strategies as st

_TEXT = st.text(
    alphabet=st.sampled_from("abcXYZ012 .,!\t\n-_"), min_size=0, max_size=200
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_TEXT, min_size=1, max_size=6))
def test_cdc_property_matches_reference(spark, texts):
    from ingest_pipeline_spark.operators.dedup import cdc_chunks

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = cdc_chunks(df, "text", "doc_id").collect()
    got: dict[int, list] = {}
    for r in rows:
        got.setdefault(r["id"], []).append((r["start"], r["end"], r["digest"]))
    for i, text in enumerate(texts):
        assert sorted(got.get(i, [])) == _ref_chunks(text), (i, text)
