"""BFD packing-plan guards (operators/packing.py).

The solve is a driver-side greedy over the bounded length histogram —
no oracle can check it (rows-only entry), so exactness rests here:
histogram-BFD must equal a naive per-doc Best-Fit-Decreasing reference
on the real corpus, and the plan must satisfy the bin-packing
invariants on adversarial fixtures."""

import os
import re
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ingest_pipeline_spark.operators.packing import (  # noqa: E402
    bfd_solve,
    pack_ffd_plan,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def naive_bfd(lengths, seq_len):
    """Per-doc reference: sort desc, place each into the bin with the
    smallest remainder that fits (list-of-bins state, no histogram)."""
    bins = []
    for ln in sorted(lengths, reverse=True):
        fits = [i for i, r in enumerate(bins) if r >= ln]
        if fits:
            i = min(fits, key=lambda i: bins[i])
            bins[i] -= ln
        else:
            bins.append(seq_len - ln)
    return {"n_bins": len(bins), "waste_tokens": sum(bins)}


def _corpus_piece_lengths(seq_len):
    docs = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
    out = []
    for t in docs["text"].astype(str):
        n = len([w for w in re.split(r"\s+", t.strip()) if w])
        if n <= 0:
            continue
        out += [seq_len] * (n // seq_len)
        if n % seq_len:
            out.append(n % seq_len)
    return out


def test_histogram_bfd_equals_naive_on_real_corpus():
    for seq_len in (64, 128, 512):
        lengths = _corpus_piece_lengths(seq_len)
        hist = {}
        for ln in lengths:
            hist[ln] = hist.get(ln, 0) + 1
        assert bfd_solve(hist, seq_len) == naive_bfd(lengths, seq_len), seq_len


def test_bfd_invariants_and_fixtures():
    # exact fits: four docs of 64 into seq_len 128 -> 2 bins, 0 waste
    assert bfd_solve({64: 4}, 128) == {"n_bins": 2, "waste_tokens": 0}
    # classic FFD case: 65s can't share, 63s backfill them
    assert bfd_solve({65: 3, 63: 3}, 128) == {"n_bins": 3, "waste_tokens": 0}
    # singles
    assert bfd_solve({128: 5}, 128) == {"n_bins": 5, "waste_tokens": 0}
    assert bfd_solve({}, 128) == {"n_bins": 0, "waste_tokens": 0}
    # lower bound: bins >= ceil(total / L); waste consistency
    import random

    rng = random.Random(7)
    for _ in range(50):
        hist = {
            rng.randrange(1, 129): rng.randrange(1, 30)
            for _ in range(rng.randrange(1, 12))
        }
        total = sum(k * v for k, v in hist.items())
        got = bfd_solve(hist, 128)
        assert got["n_bins"] >= -(-total // 128)
        assert got["n_bins"] * 128 == total + got["waste_tokens"]
    import pytest

    with pytest.raises(ValueError):
        bfd_solve({200: 1}, 128)


def test_pack_ffd_plan_on_spark(spark):
    from ingest_pipeline_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    [row] = pack_ffd_plan(docs, "text", seq_len=128).collect()
    lengths = _corpus_piece_lengths(128)
    want = naive_bfd(lengths, 128)
    assert row.n_bins_ffd == want["n_bins"]
    assert row.waste_tokens_ffd == want["waste_tokens"]
    assert row.n_pieces == len(lengths)
    assert row.total_tokens == sum(lengths)
    assert row.n_seqs_concat == -(-row.total_tokens // 128)
    assert row.n_bins_ffd * 128 == row.total_tokens + row.waste_tokens_ffd
