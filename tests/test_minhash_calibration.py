"""MinHash-calibration reference unit: recompute estimate (matching
slots / 16) and exact shingle Jaccard for every LSH candidate pair in
pure Python (hashlib md5, (h1 + i*h2) mod 2^32 slots) and hold the
bucketed report to exact equality — the mirrored-constant guard for
the 16-slot/4-band constants and the octile boundary."""

import hashlib
import math
import os
import sys
from decimal import Decimal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from ingest_pipeline_spark import queries as q  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _shingles(text, k=3):
    toks = [t for t in text.strip().split() if t]
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _sig(shingles, n=16):
    sig = []
    hs = []
    for s in shingles:
        d = hashlib.md5(s.encode()).hexdigest()
        hs.append((int(d[:8], 16), int(d[8:16], 16)))
    for i in range(n):
        sig.append(min((h1 + i * h2) % 2**32 for h1, h2 in hs))
    return sig


def test_matches_pure_python(spark):
    docs = duckdb.sql(
        f"""
        SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'
        UNION ALL
        SELECT doc_id + 1000000, text FROM '{SF_DIR}/documents.parquet'
        WHERE doc_id % 10 = 0
        """
    ).fetchall()
    sh = {d: _shingles(t) for d, t in docs if _shingles(t)}
    sig = {d: _sig(s) for d, s in sh.items()}
    # LSH candidates: 4 bands of 4 slots
    buckets = {}
    for d, s in sig.items():
        for b in range(4):
            buckets.setdefault((b, tuple(s[b * 4 : b * 4 + 4])), []).append(d)
    cand = set()
    for ids in buckets.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    # bucketed report
    agg = {}
    for a, b in cand:
        eq = sum(1 for i in range(16) if sig[a][i] == sig[b][i])
        ni = len(sh[a] & sh[b])
        exact = ni / (len(sh[a]) + len(sh[b]) - ni)
        octile = math.floor(abs(eq / 16.0 - exact) * 8.0)
        n, s_eq, s_ex = agg.get(octile, (0, 0, Decimal(0)))
        agg[octile] = (n + 1, s_eq + eq, s_ex + Decimal(repr(round(exact, 12))))
    want = {
        o: (n, s_eq, round(float(s_ex) / n, 6))
        for o, (n, s_eq, s_ex) in agg.items()
    }

    got = {
        r.err_octile: (r.n_pairs, r.sum_eq_slots, r.mean_exact_j)
        for r in q.dedup_minhash_calibration(spark, SF_DIR).collect()
    }
    assert got == want and len(want) > 0
