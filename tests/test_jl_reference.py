"""Pure-Python reference for embedding_jl_projection_audit.

The 1/16 distortion scale, the ±1 sign derivation, the micro
quantization, and the band rule are mirrored into the oracle SQL — a
wrong constant shared by both engines would stay green (the HLL
lesson).  Recompute the full audit from the raw sf0.001 parquet with
hashlib + integer arithmetic and require identical rows.
"""

from __future__ import annotations

import hashlib
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _rnd6(v: float) -> Decimal:
    return Decimal(repr(float(v))).quantize(Decimal("1e-6"), ROUND_HALF_UP)


def _micro(v: float) -> int:
    # round(round(v, 6) * 1e6): the parity-proven double-round trick
    r6 = float(_rnd6(v))
    return int(Decimal(repr(r6 * 1000000.0)).quantize(Decimal(1), ROUND_HALF_UP))


def _sign(i: int, j: int) -> int:
    h = int(hashlib.md5(f"jl:{i}:{j}".encode()).hexdigest()[:8], 16)
    return 1 if h % 2 == 0 else -1


def test_jl_projection_audit_matches_reference(spark):
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {
        vid: [_micro(float(x)) for x in emb]
        for vid, emb in zip(t.column(0).to_pylist(), t.column(1).to_pylist())
    }
    d = 64
    signs = {(i, j): _sign(i, j) for i in range(d) for j in range(16)}
    ys = {
        vid: [sum(signs[(i, j)] * v[i] for i in range(d)) for j in range(16)]
        for vid, v in vecs.items()
    }

    bands: dict[int, list] = {}
    for ida in sorted(vecs):
        if ida + 1 not in vecs:
            continue
        a, b = vecs[ida], vecs[ida + 1]
        d2 = sum((x - y) ** 2 for x, y in zip(a, b))
        if d2 <= 0:
            continue
        p2 = sum((x - y) ** 2 for x, y in zip(ys[ida], ys[ida + 1]))
        r = float(_rnd6(p2 / (16 * d2)))
        band = min(7, max(0, int(r * 4.0 // 1)))
        bands.setdefault(band, []).append(r)

    expected = {}
    for band, rs in bands.items():
        s = sum((Decimal(repr(r)).quantize(Decimal("1e-6")) for r in rs), Decimal(0))
        expected[band] = (
            len(rs),
            float(_rnd6(float(s) / len(rs))),
            min(rs),
            max(rs),
        )

    from ingest_pipeline_spark import queries as q

    got = {
        r["band"]: (r["n_pairs"], r["avg_ratio"], r["min_ratio"], r["max_ratio"])
        for r in q.embedding_jl_projection_audit(spark, SF).collect()
    }
    assert got == expected, (got, expected)
