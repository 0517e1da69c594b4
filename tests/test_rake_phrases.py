"""Equivalence unit for text_rake_keywords' r14 row-local phrase
segmentation: the space-anchored regex split must yield EXACTLY the
maximal stopword-free token runs that the token-explode + prefix-sum
window formulation produced, on every corner the regex could get
wrong — adjacent stopwords, stopwords at doc start/end, stopwords as
token substrings (theory/band/tother), mixed whitespace, regex
metacharacters inside tokens, all-stopword and empty docs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_STOPS = ("the", "a", "of", "and", "to")


def _ref_phrases(text: str) -> list[str]:
    """Token-level reference: maximal runs of non-stopword tokens.
    Tokenization uses JAVA \\s semantics ([ \\t\\n\\x0B\\f\\r] — NOT
    Python's str.split(), which also treats \\x1c-\\x1f as whitespace),
    matching the original split(trim(text), '\\s+') formulation."""
    import re

    toks = [t for t in re.split(r"[ \t\n\x0b\f\r]+", text) if t != ""]
    out: list[list[str]] = []
    cur: list[str] = []
    for t in toks:
        if t in _STOPS:
            if cur:
                out.append(cur)
            cur = []
        else:
            cur.append(t)
    if cur:
        out.append(cur)
    return [" ".join(p) for p in out]


_CASES = [
    "the quick brown fox and the lazy dog",
    "a the of and to",                      # all stopwords
    "theory band tother andante",           # stopwords as substrings
    "and start middle and and end and",     # adjacent + boundary stops
    "tab\tseparated\nnewline  double  spaces",
    "x.y (z) a [q+r] of *meta* chars",      # regex metacharacters
    "single",
    "",
    "   ",
    "to",                                   # one stopword only
    "alpha a beta a gamma",                 # single-token phrases
]


def test_rowlocal_phrase_split_matches_token_reference(spark):
    norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    padded = F.concat(F.lit(" "), norm, F.lit(" "))
    pieces = F.split(padded, r" (?:the|a|of|and|to)(?= )")
    phrases = F.filter(
        F.transform(pieces, lambda p: F.trim(p)), lambda p: p != ""
    )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CASES)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: list(r["ph"])
        for r in df.select("doc_id", phrases.alias("ph")).collect()
    }
    for i, text in enumerate(_CASES):
        assert got[i] == _ref_phrases(text), (i, text, got[i])


from hypothesis import HealthCheck, given, settings, strategies as st

_TOKEN = st.sampled_from(
    ["the", "a", "of", "and", "to", "fox", "theory", "band", "x.y", "(q)",
     "a1", "to2", "2to", "\x1f", "ando", "ofa"]
)
_WS = st.sampled_from([" ", "  ", "\t", "\n", " \t "])


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(toks=st.lists(_TOKEN, min_size=0, max_size=12), data=st.data())
def test_rowlocal_phrase_split_property(spark, toks, data):
    seps = [data.draw(_WS) for _ in range(len(toks) + 1)]
    text = seps[0] + "".join(t + s for t, s in zip(toks, seps[1:]))
    norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    padded = F.concat(F.lit(" "), norm, F.lit(" "))
    pieces = F.split(padded, r" (?:the|a|of|and|to)(?= )")
    phrases = F.filter(
        F.transform(pieces, lambda p: F.trim(p)), lambda p: p != ""
    )
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    got = list(df.select(phrases.alias("ph")).collect()[0]["ph"])
    assert got == _ref_phrases(text), (text, got)
