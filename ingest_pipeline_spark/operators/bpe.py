"""Distributed BPE vocabulary induction (merge learning).

The classic byte-pair-encoding trainer (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") learns
a merge table from a WORD HISTOGRAM, not the raw corpus: the only
corpus-scale pass is pretokenize → groupBy(word) → count; every merge
round then runs against the vocabulary-sized histogram relation.  That
is exactly the shape that survives 100 TB — a trillion-token corpus
still collapses to a ~10⁷-row histogram, and the rounds never touch
the corpus again.

Spark-first design per round (fixpoint discipline of
operators/graph.py pagerank — localCheckpoint cadence, bounded
driver-side state):

1. pair counting: two shifted ``slice``s zipped + explode → groupBy
   (a, b) → weighted sum — all built-ins, one vocab-sized shuffle;
2. argmax: ``ORDER BY cnt DESC, a, b LIMIT 1`` collect of ONE row
   (deterministic tiebreak);
3. merge application: the symbol sequence lives as a \\x1f-joined
   string and the merge is ONE codegen'd ``regexp_replace`` with a
   trailing-separator lookahead — left-to-right non-overlapping
   replacement reproduces the reference trainer's greedy scan exactly
   (a freshly merged token can never re-match as the left element in
   the same round because its length grew);
4. the histogram relation is localCheckpointed each round so lineage
   never unrolls across rounds.

Reference capability matched: none (the reference pipeline has no
tokenizer training; LLM-extension mandate).  The learned merge table
is verified against a pure-Python reference trainer on the real
corpus (tests/test_bpe.py) — the mirrored-constant guard for
estimators applied to an iterative operator.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# U+001F (unit separator): cannot appear in pretokens — the BPE-ish
# pretokenizer emits letter/digit runs and \s-free punctuation runs,
# and \x1f is whitespace-class-free but excluded by the histogram
# guard below for safety.
SEP = "\x1f"


def _merge_pattern(a: str, b: str) -> str:
    """Non-overlapping greedy merge pattern for one (a, b) pair."""
    return re.escape(SEP + a + SEP + b) + "(?=" + re.escape(SEP) + ")"


def _quote_replacement(s: str) -> str:
    """Escape Java Matcher replacement metachars (backslash, $)."""
    return s.replace("\\", "\\\\").replace("$", "\\$")


def pair_counts(rep: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over a (freq, s) histogram relation
    where ``s`` is the SEP-joined symbol string: returns (a, b, cnt)
    with cnt = Σ word-freq over occurrences.  Two shifted slices +
    arrays_zip + explode — vocabulary-sized input, one shuffle.
    """
    arr = F.split(F.regexp_replace("s", f"^{SEP}|{SEP}$", ""), SEP)
    n = F.size(arr)
    zipped = F.arrays_zip(
        F.slice(arr, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(arr, 2, F.greatest(n - 1, F.lit(0))),
    )
    return (
        rep.select("freq", F.explode(zipped).alias("p"))
        .select(
            F.col("p").getField("0").alias("a"),
            F.col("p").getField("1").alias("b"),
            "freq",
        )
        .groupBy("a", "b")
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
    )


def word_histogram(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The single corpus-scale pass: BPE-ish pretokenize → histogram
    (word, freq).  Map-side partial aggregation collapses each
    partition to its local vocabulary before the shuffle.
    """
    from ..functions.text import tokenize_bpe_ish

    return (
        docs.select(
            F.explode(tokenize_bpe_ish(F.col(text_col))).alias("word")
        )
        .filter(~F.col("word").contains(SEP))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )


def learn_bpe_merges(
    spark: SparkSession,
    words: DataFrame,
    n_merges: int = 50,
    min_count: int = 2,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Learn up to ``n_merges`` BPE merges from a (word, freq)
    histogram.  Returns a DataFrame (rank int, left string, right
    string, pair_count bigint) — rank is merge order (0-based), the
    model artifact a tokenizer ships.  Stops early when the best
    remaining pair's weighted count falls below ``min_count``.

    Driver-side state is ONE collected row per round (the argmax) and
    the bounded merge list — never the histogram.
    """
    rep = words.select(
        "freq",
        F.concat(
            F.lit(SEP), F.array_join(F.split("word", ""), SEP), F.lit(SEP)
        ).alias("s"),
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, int]] = []
    for r in range(n_merges):
        best = (
            pair_counts(rep)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((r, a, b, cnt))
        rep = rep.withColumn(
            "s",
            F.regexp_replace(
                "s", _merge_pattern(a, b), _quote_replacement(SEP + a + b)
            ),
        )
        # cadence, not per-round: one pending regex pass per round is
        # cheap to recompute from the last checkpoint, and each eager
        # checkpoint is a full job — amortize it
        if (r + 1) % checkpoint_every == 0:
            rep = rep.localCheckpoint(eager=True)

    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count bigint"
    )


def apply_bpe_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Segment ``text_col`` with a learned merge list: adds a
    ``bpe_tokens array<string>`` column.  Encoding applies the merges
    in LEARNED ORDER (rank), each as the same greedy non-overlapping
    regexp_replace used during training, chained into one codegen'd
    projection — row-local, zero shuffles, scan-bound at any scale.
    """
    from ..functions.text import tokenize_bpe_ish

    word = F.concat(
        F.lit(SEP), F.array_join(F.split("__w", ""), SEP), F.lit(SEP)
    )
    for a, b in merges:
        word = F.regexp_replace(
            word, _merge_pattern(a, b), _quote_replacement(SEP + a + b)
        )
    toks = F.split(F.regexp_replace(word, f"^{SEP}|{SEP}$", ""), SEP)
    # posexplode + sort_array(struct(pos, …)) keeps word order across
    # the regroup shuffle (collect_list alone is order-nondeterministic)
    exploded = docs.withColumn(
        "__pre", tokenize_bpe_ish(F.col(text_col))
    ).select(*docs.columns, F.posexplode_outer("__pre").alias("__i", "__w"))
    per_word = exploded.withColumn(
        "__t", F.when(F.col("__w").isNull(), F.array()).otherwise(toks)
    )
    return per_word.groupBy(*docs.columns).agg(
        F.flatten(
            F.sort_array(
                F.collect_list(F.struct("__i", "__t"))
            ).getField("__t")
        ).alias("bpe_tokens")
    )
