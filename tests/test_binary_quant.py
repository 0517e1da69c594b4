"""Binary (1-bit sign) quantization guards (operators/similarity.py
sign_bit_words / binary_hamming_topk).

Oracle parity cannot catch a wrong constant mirrored into the SQL
(the HLL r5 lesson), so the packing, Hamming pruning, and asymmetric
re-rank are each held to a pure-Python reference on the REAL corpus.
"""

import math
import os
import sys

import pyarrow.parquet as pq
import pyspark.sql.functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ingest_pipeline_spark import tables  # noqa: E402
from ingest_pipeline_spark.operators.similarity import (  # noqa: E402
    binary_hamming_topk,
    sign_bit_words,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _ref_words(vec):
    w0 = sum(1 << j for j in range(32) if vec[j] >= 0)
    w1 = sum(1 << (j - 32) for j in range(32, 64) if vec[j] >= 0)
    return w0, w1


def _vecs():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    return dict(
        zip(t.column("vec_id").to_pylist(), t.column("embedding").to_pylist())
    )


def test_sign_bit_words_match_reference(spark):
    emb = tables.load_table(spark, SF_DIR, "embeddings")
    got = {
        r["vec_id"]: (r["w0"], r["w1"])
        for r in sign_bit_words(emb, dim=64).collect()
    }
    vecs = _vecs()
    assert len(got) == len(vecs)
    for vid, vec in vecs.items():
        assert got[vid] == _ref_words(vec), vid


def test_binary_hamming_topk_matches_reference(spark):
    """Full pipeline (Hamming prune -> cosine re-rank, ties included)
    reproduced in pure Python on the real corpus."""
    emb = tables.load_table(spark, SF_DIR, "embeddings")
    qids = list(range(10))
    got = binary_hamming_topk(emb, qids, dim=64, n_candidates=8, k=3)
    got_rows = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["hamming"])
        for r in got.collect()
    }
    vecs = _vecs()
    words = {vid: _ref_words(v) for vid, v in vecs.items()}

    def cos6(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        # Spark/DuckDB ROUND(, 6) is HALF_UP on the shortest repr —
        # Python round() is banker's; emulate half-up via Decimal
        from decimal import ROUND_HALF_UP, Decimal

        return float(
            Decimal(repr(dot / (na * nb))).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )

    for q in qids:
        qw = words[q]
        ham = sorted(
            (
                bin(qw[0] ^ w[0]).count("1") + bin(qw[1] ^ w[1]).count("1"),
                vid,
            )
            for vid, w in words.items()
            if vid != q
        )
        cand = ham[:8]
        rer = sorted(
            (-cos6(vecs[vid], vecs[q]), vid, h) for h, vid in cand
        )
        for rank, (_negcos, vid, h) in enumerate(rer[:3], start=1):
            assert got_rows[(q, rank)] == (vid, h), (q, rank)


def test_query_registered_and_oracle_green(spark):
    from ingest_pipeline_spark.queries import oracle_sql, queries
    from tests.oracle_utils import compare_to_oracle

    qs, osql = queries(), oracle_sql()
    df = qs["embedding_binary_hamming_topk"](spark, SF_DIR)
    assert df.count() == 30
    compare_to_oracle(df, osql["embedding_binary_hamming_topk"], SF_DIR)
