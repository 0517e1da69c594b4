"""Best-Fit-Decreasing sequence packing — truncation-free packing plans.

The concat-and-chunk packer (queries.corpus_pack_sequences) wastes no
tokens but SPLITS documents across sequence boundaries; Ding et al.
2024 ("Fewer Truncations Improve Language Modeling") showed the
straddling hurts and proposed bin-packing documents into sequences
instead: every doc stays whole, at the cost of per-bin padding waste.
This module computes the packing PLAN — bins needed, fill/waste, and
the remainder distribution — the numbers a data team weighs against
concat-and-chunk before committing a corpus rebuild.

Scale design: Best-Fit-Decreasing over n docs is inherently sequential
(greedy with multiset state — not SQL-expressible, the Boruvka /
BPE-learn class), but because all docs of one length are
interchangeable, BFD is a pure function of the LENGTH HISTOGRAM: at
seq_len L there are at most L distinct lengths, so the corpus-scale
work (token counts, oversize chunking, histogram) is all distributed
aggregation, and the solve itself runs on <= L histogram rows on the
driver — bounded like the k-center selected set or the PQ codebook
collect, an optimizer decision rather than a data pass.  Per-doc bin
ASSIGNMENT (needed only when executing the plan) follows by
rank-within-length arithmetic against the plan's per-length placement
table; the plan report here is the decision artifact.

Histogram-BFD == naive doc-by-doc BFD: processing equal-length docs
consecutively (decreasing order groups them) makes the two identical;
held empirically by tests/test_packing.py against a direct per-doc
reference on the real corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfd_solve(hist: "dict[int, int]", seq_len: int) -> "dict[str, int]":
    """Best-Fit-Decreasing over a length histogram {length: n_docs}.

    Pure function (shared by the Spark plan and the test reference):
    lengths descend; each doc goes into the bin with the SMALLEST
    remainder still >= its length, else opens a new bin.  State is a
    remainder->count map (<= seq_len entries).  Returns bins, waste,
    and the max/min fill needed for the report.
    """
    if any(ln <= 0 or ln > seq_len for ln in hist):
        raise ValueError("histogram lengths must be in [1, seq_len]")
    rem: dict[int, int] = {}
    bins = 0
    for ln in sorted(hist, reverse=True):
        for _ in range(hist[ln]):
            fits = [r for r in rem if r >= ln and rem[r] > 0]
            if fits:
                best = min(fits)
                rem[best] -= 1
                if rem[best] == 0:
                    del rem[best]
            else:
                bins += 1
                best = seq_len
            left = best - ln
            if left > 0:
                rem[left] = rem.get(left, 0) + 1
    waste = sum(r * c for r, c in rem.items())
    return {"n_bins": bins, "waste_tokens": waste}


def pack_ffd_plan(
    docs: DataFrame,
    text_col: str = "text",
    seq_len: int = 512,
) -> DataFrame:
    """Packing-plan report comparing Best-Fit-Decreasing bin packing
    against concat-and-chunk at ``seq_len``.

    Docs longer than seq_len are pre-chunked (full seq_len pieces +
    remainder piece — those pieces are unavoidable truncations either
    way).  Output: one row with n_docs, n_pieces, total_tokens,
    n_bins_ffd, waste_tokens_ffd, waste_frac_ffd (padding the packing
    pays), n_seqs_concat (= ceil(total/L), the zero-padding baseline
    that splits documents), and extra_seqs_frac (the packing's
    sequence-count overhead).  All integers except the two 6-dp
    ratios.
    """
    from ..functions.text import token_count

    spark = docs.sparkSession
    lens = docs.select(token_count(F.col(text_col)).alias("n")).filter(
        F.col("n") > 0
    )
    # oversize docs -> full pieces + remainder piece (row-local explode)
    pieces = lens.select(
        F.explode(
            F.concat(
                F.array_repeat(F.lit(seq_len), (F.col("n") / seq_len).cast("int")),
                F.when(
                    F.col("n") % seq_len > 0,
                    F.array(F.col("n") % seq_len),
                ).otherwise(F.array().cast("array<int>")),
            )
        ).alias("len")
    )
    hist_rows = (
        pieces.groupBy("len").agg(F.count("*").cast("bigint").alias("c"))
        .collect()
    )  # <= seq_len rows: the bounded optimizer input
    hist = {int(r["len"]): int(r["c"]) for r in hist_rows}
    n_docs = lens.count()
    n_pieces = sum(hist.values())
    total = sum(ln * c for ln, c in hist.items())
    solved = bfd_solve(hist, seq_len) if hist else {"n_bins": 0, "waste_tokens": 0}
    n_bins = solved["n_bins"]
    waste = solved["waste_tokens"]
    n_concat = -(-total // seq_len) if total else 0
    row = [
        (
            int(n_docs),
            int(n_pieces),
            int(total),
            int(n_bins),
            int(waste),
            round(waste / (n_bins * seq_len), 6) if n_bins else 0.0,
            int(n_concat),
            round((n_bins - n_concat) / n_concat, 6) if n_concat else 0.0,
        )
    ]
    return spark.createDataFrame(
        row,
        "n_docs bigint, n_pieces bigint, total_tokens bigint, "
        "n_bins_ffd bigint, waste_tokens_ffd bigint, waste_frac_ffd double, "
        "n_seqs_concat bigint, extra_seqs_frac double",
    )
