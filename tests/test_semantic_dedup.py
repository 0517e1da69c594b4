"""semantic_dedup (SemDeDup-style): pure-Python reference parity +
bucketed-plan proof (candidates meet only through the cell equi-join).
"""

from __future__ import annotations

import math
import random

import pytest

from ingest_pipeline_spark.operators.similarity import semantic_dedup


def _cos(a, b):
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
    for x in a:
        na += float(x) * float(x)
    for y in b:
        nb += float(y) * float(y)
    return dot / (math.sqrt(na) * math.sqrt(nb))


def _reference(vectors: dict[int, list[float]], threshold: float, n_cells: int):
    """Independent scalar implementation of the operator's contract."""
    anchor_ids = sorted(vectors)[:n_cells]
    cell = {}
    for vid, v in vectors.items():
        best = max(
            anchor_ids,
            key=lambda a: (round(_cos(v, vectors[a]), 6), -a),
        )
        cell[vid] = best
    out = {}
    for vid, v in vectors.items():
        lower = [
            _cos(vectors[o], v)
            for o in vectors
            if o < vid and cell[o] == cell[vid]
        ]
        best_sim = max(lower) if lower else None
        keep = best_sim is None or best_sim < threshold
        out[vid] = (
            cell[vid],
            keep,
            round(best_sim, 6) if best_sim is not None else None,
        )
    return out


@pytest.fixture(scope="module")
def synth(spark):
    """60 vectors in 12 planted groups of 5 (tight perturbations, so
    intra-group cosine is high and inter-group is low) + 4 outliers."""
    rng = random.Random(7)
    vecs = {}
    vid = 0
    for _g in range(12):
        base = [rng.gauss(0, 1) for _ in range(16)]
        for _m in range(5):
            vecs[vid] = [b + rng.gauss(0, 0.05) for b in base]
            vid += 1
    for _o in range(4):
        vecs[vid] = [rng.gauss(0, 1) for _ in range(16)]
        vid += 1
    df = spark.createDataFrame(
        [(k, v) for k, v in sorted(vecs.items())],
        "vec_id long, embedding array<double>",
    )
    return vecs, df


def test_semantic_dedup_matches_reference(spark, synth):
    vecs, df = synth
    got = {
        r.vec_id: (r.cell, r.keep, r.best_lower_sim)
        for r in semantic_dedup(
            df, "embedding", "vec_id", threshold=0.9, n_cells=6
        ).collect()
    }
    exp = _reference(vecs, threshold=0.9, n_cells=6)
    assert set(got) == set(exp)
    for vid in exp:
        ec, ek, es = exp[vid]
        gc, gk, gs = got[vid]
        assert gc == ec, f"cell mismatch vec {vid}"
        assert gk == ek, f"keep mismatch vec {vid}"
        if es is None:
            assert gs is None
        else:
            assert gs == pytest.approx(es, abs=1.5e-6)
    # the planted groups guarantee both outcomes are exercised
    kept = [v for v, (_c, k, _s) in got.items() if k]
    assert 0 < len(kept) < len(got)


def test_semantic_dedup_bucketed(spark, synth):
    """No corpus cross product: the only nested-loop join is the
    bounded anchor broadcast (n_cells rows); intra-cell candidate
    generation is an equi-join on the cell key."""
    _vecs, df = synth
    out = semantic_dedup(df, "embedding", "vec_id", threshold=0.9, n_cells=6)
    plan = out._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 0  # pre-checkpoint stage
    assert "cell" in plan  # candidate join keyed on the cell column


def test_semantic_dedup_empty(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert semantic_dedup(df).count() == 0
