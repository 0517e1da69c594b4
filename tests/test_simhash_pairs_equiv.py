"""simhash_near_pairs first-agreeing-chunk dedup (r13 rewrite) ==
brute force: the chunk-banded candidate join + first-agree filter must
return exactly the pairs with Hamming(simhash) <= max_hamming, once
each — the property the old .distinct() guaranteed by construction."""

import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ingest_pipeline_spark.operators.dedup import (  # noqa: E402
    simhash_near_pairs,
    simhash_signatures,
)

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _corpus(seed: int, n: int = 60):
    rng = random.Random(seed)
    base = [" ".join(rng.choices(WORDS, k=12)) for _ in range(n // 3)]
    rows = []
    for i in range(n):
        if i < len(base):
            text = base[i]
        else:
            # perturb a base doc by swapping one word — dense near-dup
            # structure so low-Hamming pairs actually exist
            toks = base[i % len(base)].split()
            toks[rng.randrange(len(toks))] = rng.choice(WORDS)
            text = " ".join(toks)
        rows.append((i, text))
    return rows


def test_first_agree_equals_bruteforce(spark):
    for seed in (1, 7, 42):
        df = spark.createDataFrame(
            _corpus(seed), "doc_id bigint, text string"
        )
        sigs = {
            r["id"]: r["simhash"]
            for r in simhash_signatures(df, "text", "doc_id", 32).collect()
        }
        want = set()
        ids = sorted(sigs)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                if bin(sigs[a] ^ sigs[b]).count("1") <= 3:
                    want.add((a, b))
        got = [
            (r["id_a"], r["id_b"])
            for r in simhash_near_pairs(
                df, "text", "doc_id", bits=32, max_hamming=3, chunks=4
            ).collect()
        ]
        # exactly once each (the first-agree filter must not duplicate
        # a pair that matches on several chunks, nor drop one)
        assert len(got) == len(set(got)), f"seed {seed}: duplicated pairs"
        assert set(got) == want, f"seed {seed}"
        assert want, f"seed {seed}: vacuous corpus (no near pairs)"
