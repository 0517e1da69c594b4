"""BPE merge-learning guards.

The learned merge table is the model artifact — a wrong greedy-scan or
tiebreak produces a PLAUSIBLE but wrong tokenizer that no oracle can
catch (the loop is not SQL-expressible), so the distributed trainer is
held to exact equality with a pure-Python reference trainer on BOTH
hand fixtures (overlap/tiebreak edge cases) and the real sf0.001
corpus histogram (the mirrored-constant guard applied to an iterative
operator)."""

import os
import re
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ingest_pipeline_spark.operators.bpe import (  # noqa: E402
    apply_bpe_merges,
    learn_bpe_merges,
    word_histogram,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
BPE_ISH = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"


def _merge_seq(s, a, b):
    out, i = [], 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def ref_bpe(word_freqs, n_merges, min_count=2):
    """Reference trainer: greedy left-to-right merge, argmax by
    (count DESC, left ASC, right ASC)."""
    seqs = {w: list(w) for w in word_freqs}
    merges = []
    for r in range(n_merges):
        counts = {}
        for w, f in word_freqs.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                k = (s[i], s[i + 1])
                counts[k] = counts.get(k, 0) + f
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append((r, a, b, cnt))
        seqs = {w: _merge_seq(s, a, b) for w, s in seqs.items()}
    return merges


def _learn(spark, freqs, n_merges, min_count=2):
    words = spark.createDataFrame(
        list(freqs.items()), "word string, freq long"
    )
    got = learn_bpe_merges(spark, words, n_merges, min_count).collect()
    return [(r["rank"], r["left"], r["right"], r["pair_count"]) for r in got]


def test_bpe_hand_fixtures(spark):
    # overlap greediness: "aaa" contributes ONE (a,a) pair per greedy
    # convention? No — pair COUNTING counts both adjacent occurrences;
    # only the merge application is non-overlapping.  The reference
    # fold defines truth; the distributed trainer must match it.
    freqs = {"aaa": 5, "aab": 3, "ab": 4, "b": 2}
    assert _learn(spark, freqs, 4) == ref_bpe(freqs, 4)

    # tiebreak: (l,o) and (o,w) both appear twice in "low low" style
    # histograms — lexicographic (left, right) must break the tie
    freqs2 = {"low": 2, "lower": 1, "newest": 1, "widest": 1}
    assert _learn(spark, freqs2, 6) == ref_bpe(freqs2, 6)

    # leading-space pretokens and regex metachars as symbols
    freqs3 = {" the": 4, " th$n": 2, "$$": 3, "\\a\\a": 2, " t": 1}
    assert _learn(spark, freqs3, 5) == ref_bpe(freqs3, 5)

    # min_count early stop
    freqs4 = {"ab": 1, "cd": 1}
    assert _learn(spark, freqs4, 3, min_count=2) == []


def test_bpe_matches_reference_on_real_corpus(spark):
    docs = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
    freqs = {}
    for t in docs["text"].astype(str):
        for w in re.findall(BPE_ISH, t):
            freqs[w] = freqs.get(w, 0) + 1
    want = ref_bpe(freqs, 30)

    from ingest_pipeline_spark.tables import load_table

    hist = word_histogram(load_table(spark, SF_DIR, "documents"))
    got = learn_bpe_merges(spark, hist, 30).collect()
    got = [(r["rank"], r["left"], r["right"], r["pair_count"]) for r in got]
    assert got == want
    assert len(got) == 30  # the corpus supports a full 30-merge table


def test_apply_bpe_merges_lossless_and_ordered(spark):
    docs = spark.createDataFrame(
        [(1, "the theme then"), (2, "ab ab cd"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    merges = [("t", "h"), ("th", "e"), ("a", "b")]
    out = {
        r.doc_id: r.bpe_tokens
        for r in apply_bpe_merges(docs, merges).collect()
    }
    # lossless: concatenated tokens reproduce the pretoken stream, in
    # document order, and the learned merges actually fused symbols
    assert out[1] == ["the", " ", "the", "m", "e", " ", "the", "n"]
    assert out[2] == ["ab", " ", "ab", " ", "c", "d"]
    assert out[3] == []
    assert out[4] == []
