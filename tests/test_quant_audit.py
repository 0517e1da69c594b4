"""INT8 scalar-quantization audit reference unit (the r5
mirrored-constant guard: the oracle mirrors the same formula, so a
wrong constant — 256 instead of 255, round instead of floor, min
instead of asymmetric affine — would pass the hash check on both
sides; this pins the math to an independent pure-Python
implementation)."""

import math
import os
import sys
from decimal import Decimal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ingest_pipeline_spark import queries as q  # noqa: E402
from ingest_pipeline_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _ref_audit(vals):
    lo, hi = min(vals), max(vals)
    sse = Decimal(0)
    energy = Decimal(0)
    for v in vals:
        if hi > lo:
            code = min(255, max(0, math.floor((v - lo) * 255.0 / (hi - lo))))
        else:
            code = 0
        err = v - (lo + code * (hi - lo) / 255.0)
        sse += Decimal(repr(round(err * err, 12)))
        energy += Decimal(repr(round(v * v, 12)))
    rel = round(float(sse) / float(energy), 9)
    return len(vals), round(lo, 6), round(hi, 6), float(sse), rel


def test_matches_pure_python_reference(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    dims = {}
    for r in emb.select("embedding").collect():
        for j, v in enumerate(r.embedding):
            dims.setdefault(j, []).append(float(v))
    got = {
        r.j: (r.n, r.lo, r.hi, r.sse, r.rel_distortion)
        for r in q.embedding_int8_quant_audit(spark, SF_DIR).collect()
    }
    assert set(got) == set(dims)
    for j in sorted(dims)[:8]:  # 8 dims suffice; all share the code path
        n, lo, hi, sse, rel = _ref_audit(dims[j])
        gn, glo, ghi, gsse, grel = got[j]
        assert (gn, glo, ghi) == (n, lo, hi), j
        assert abs(gsse - sse) < 1e-11, j
        assert abs(grel - rel) < 2e-9, j


def test_roundtrip_error_bounded_by_step(spark):
    """Quantization error must never exceed one step size per element —
    the defining property of 256-level affine quantization (catches a
    shifted codebook that the SSE statistics alone could mask)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    rows = emb.select("embedding").collect()
    dims = {}
    for r in rows:
        for j, v in enumerate(r.embedding):
            dims.setdefault(j, []).append(float(v))
    for j, vals in list(dims.items())[:8]:
        lo, hi = min(vals), max(vals)
        step = (hi - lo) / 255.0
        for v in vals:
            code = min(255, max(0, math.floor((v - lo) * 255.0 / (hi - lo))))
            assert abs(v - (lo + code * step)) <= step + 1e-12
