"""Maximal duplicated-span guards (operators/dedup.py
max_duplicated_spans).

Three legs: a pure-Python reference implementation (independent
algorithm — direct longest-common-extension scan over the token
match matrix, NOT shingle islands) checked on hand fixtures; the
exact-dup guarantee on the augmented corpus (every duplicated doc
must surface as one full-document span); and split/adjacency edge
cases (two separate spans on the same diagonal stay separate)."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ingest_pipeline_spark.operators.dedup import (  # noqa: E402
    max_duplicated_spans,
)


def _ref_max_spans(docs, k=5, min_span=8):
    """Reference: for each pair and each (i, j) token alignment, extend
    the exact match to its maximal length; keep maximal runs >= max(k,
    min_span) that are not contained in a longer one starting earlier
    on the same diagonal.  O(n^3)-ish — fixtures only."""
    toks = {d: t.split() for d, t in docs}
    ids = sorted(toks)
    out = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            ta, tb = toks[a], toks[b]
            for i in range(len(ta)):
                for j in range(len(tb)):
                    # must be a span start: previous tokens differ
                    if i > 0 and j > 0 and ta[i - 1] == tb[j - 1]:
                        continue
                    ln = 0
                    while (i + ln < len(ta) and j + ln < len(tb)
                           and ta[i + ln] == tb[j + ln]):
                        ln += 1
                    if ln >= max(k, min_span):
                        out.add((a, b, i, j, ln))
    return out


def _spark_spans(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        (r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_tokens)
        for r in max_duplicated_spans(df, "text", "doc_id", **kw).collect()
    }


def test_matches_reference_on_fixtures(spark):
    shared = "the quick brown fox jumps over the lazy dog tonight"
    docs = [
        (1, "intro words here " + shared + " tail one two"),
        (2, "completely different " + shared + " and more stuff"),
        (3, "unrelated content with no overlap at all whatsoever indeed"),
        # doc 4 shares with 1 AND contains an internal repeat of the
        # shared phrase => two diagonals against doc 2
        (4, shared + " middle filler " + shared),
    ]
    got = _spark_spans(spark, docs, k=5, min_span=8, df_cap=50)
    want = _ref_max_spans(docs, k=5, min_span=8)
    assert got == want and len(want) >= 4


def test_two_islands_same_diagonal_stay_separate(spark):
    # same diagonal (offset 0), but a mismatching middle token splits
    # the run into two 8-token spans
    left = "a1 a2 a3 a4 a5 a6 a7 a8"
    right = "b1 b2 b3 b4 b5 b6 b7 b8"
    docs = [
        (1, f"{left} SPLITX {right}"),
        (2, f"{left} SPLITY {right}"),
    ]
    got = _spark_spans(spark, docs, k=5, min_span=8, df_cap=50)
    assert got == {(1, 2, 0, 0, 8), (1, 2, 9, 9, 8)}
    assert got == _ref_max_spans(docs, k=5, min_span=8)


def test_below_min_span_dropped(spark):
    docs = [
        (1, "x1 x2 x3 x4 x5 x6 x7 pad1 pad2 pad3"),
        (2, "x1 x2 x3 x4 x5 x6 x7 other words here"),
    ]
    # shared run = 7 tokens < min_span=8
    assert _spark_spans(spark, docs, k=5, min_span=8, df_cap=50) == set()
    assert _spark_spans(spark, docs, k=5, min_span=7, df_cap=50) == {
        (1, 2, 0, 0, 7)
    }


def test_exact_dups_surface_full_doc_span(spark):
    """The augmented corpus duplicates every doc_id % 10 == 0 text
    verbatim at doc_id + 1000000: each such pair must report a span
    covering the whole document (start 0/0, len = token count)."""
    from pyspark.sql import functions as F

    from ingest_pipeline_spark import queries as q
    from ingest_pipeline_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = q._aug_docs(spark, sf)
    ntok = {
        r.doc_id: r.n
        for r in docs.filter(F.col("doc_id") % 10 == 0)
        .filter(F.col("doc_id") < 1000000)
        .select(
            "doc_id",
            F.size(F.filter(F.split(F.trim("text"), r"\s+"),
                            lambda t: t != "")).alias("n"),
        )
        .collect()
    }
    spans = {
        (r.doc_a, r.doc_b): (r.start_a, r.start_b, r.span_tokens)
        for r in q.dedup_max_spans(spark, sf).collect()
    }
    missing = [
        d for d, n in ntok.items()
        if n >= 8 and spans.get((d, d + 1000000)) != (0, 0, n)
    ]
    assert not missing, missing[:5]


def test_span_coverage_audit_hand_corpus(spark):
    """The df_cap blind-spot audit on a corpus engineered so every band
    is non-empty (testdata never exceeds df 3, so the 'suppressed' band
    must be proven live on a fixture): with k=2 and df_cap=2, a bigram
    shared by 3 docs lands in 'suppressed' with hand-computed mass."""
    from ingest_pipeline_spark.operators.dedup import span_coverage_audit

    docs = spark.createDataFrame(
        [
            (1, "hot span here alpha one"),
            (2, "hot span there beta two"),
            (3, "hot span again hot span"),
            (4, "quiet words only"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r.band: (r.n_shingles, r.n_occurrences, r.max_df, r.occ_share)
        for r in span_coverage_audit(
            docs, "text", "doc_id", k=2, df_cap=2
        ).collect()
    }
    # bigrams: doc1 {hot span, span here, here alpha, alpha one}
    #          doc2 {hot span, span there, there beta, beta two}
    #          doc3 {hot span x2, span again, again hot}
    #          doc4 {quiet words, words only}
    # 'hot span': df 3, 4 occurrences -> suppressed
    # all other 10 bigrams: df 1, 1 occurrence each -> unique
    total = 14
    assert rows["suppressed"] == (1, 4, 3, round(4 / total, 6))
    assert rows["unique"] == (10, 10, 1, round(10 / total, 6))
    assert "kept" not in rows
