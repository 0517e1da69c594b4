"""IVF-PQ recall gauge: the composed operator must recover a floor of
the exact top-5 (quality), and its candidates must only ever come from
probed cells (the bucketed-plan contract — no cross-cell pair is
scored, so the scan cost is the probed code lists, not the corpus).
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
import pyspark.sql.functions as F

from ingest_pipeline_spark import tables
from ingest_pipeline_spark.operators.similarity import ivfpq_topk_det
from ingest_pipeline_spark.queries import queries

SF = "/root/testdata/sf0.01"


def _exact_top5(vecs: dict[int, list[float]], qid: int) -> set[int]:
    qv = [round(float(x), 6) for x in vecs[qid]]
    dots = sorted(
        (
            (sum(a * round(float(b), 6) for a, b in zip(qv, v)), i)
            for i, v in vecs.items()
            if i != qid
        ),
        reverse=True,
    )
    return {i for _, i in dots[:5]}


def test_ivfpq_recall_floor(spark):
    got = queries()["similarity_ivfpq_topk_det"](spark, SF).collect()
    t = pq.read_table(f"{SF}/embeddings.parquet")
    vecs = dict(
        zip(t.column("vec_id").to_pylist(), t.column("embedding").to_pylist())
    )
    hits = tot = 0
    for qid in range(20, 35):
        exact = _exact_top5(vecs, qid)
        mine = {r.neighbor_id for r in got if r.query_id == qid}
        hits += len(exact & mine)
        tot += 5
    # measured 0.4533 at sf0.01 (2-of-8-cell prune, sampled codebook,
    # refine=20); the md5-uniform codebook managed only 0.19 here
    assert hits / tot >= 0.40, f"recall@5 collapsed: {hits / tot:.3f}"


def test_ivfpq_unpruned_recall(spark):
    """With the IVF prune off (probe all cells) the sampled-codebook
    ADC+refine stack alone must hold a much higher floor (measured
    0.84) — isolates codebook quality from cell-pruning loss."""
    emb = tables.load_table(spark, SF, "embeddings")
    q = emb.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 35))
    got = ivfpq_topk_det(emb, q, k=5, n_probe=8, refine=4).collect()
    t = pq.read_table(f"{SF}/embeddings.parquet")
    vecs = dict(
        zip(t.column("vec_id").to_pylist(), t.column("embedding").to_pylist())
    )
    hits = tot = 0
    for qid in range(20, 35):
        exact = _exact_top5(vecs, qid)
        mine = {r.neighbor_id for r in got if r.query_id == qid}
        hits += len(exact & mine)
        tot += 5
    assert hits / tot >= 0.75, f"unpruned recall@5 collapsed: {hits / tot:.3f}"


def test_ivfpq_candidates_only_from_probed_cells(spark):
    """Every returned neighbor must live in one of its query's probed
    cells — proves the inverted-file prune is real, not decorative."""
    emb = tables.load_table(spark, SF, "embeddings")
    q = emb.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 35))
    got = ivfpq_topk_det(emb, q, k=5).collect()

    # recompute the deterministic cell assignment independently
    t = pq.read_table(f"{SF}/embeddings.parquet")
    import math

    vecs = dict(
        zip(t.column("vec_id").to_pylist(), t.column("embedding").to_pylist())
    )
    anchors = {i: vecs[i] for i in sorted(vecs)[:8]}

    def cells(v, keep):
        def cos(a, b):
            d = sum(float(x) * float(y) for x, y in zip(a, b))
            na = math.sqrt(sum(float(x) ** 2 for x in a))
            nb = math.sqrt(sum(float(y) ** 2 for y in b))
            return round(d / (na * nb), 6)

        ranked = sorted(
            anchors, key=lambda aid: (-cos(v, anchors[aid]), aid)
        )
        return ranked[:keep]

    for r in got:
        probed = set(cells(vecs[r.query_id], 2))
        neighbor_cell = cells(vecs[r.neighbor_id], 1)[0]
        assert neighbor_cell in probed, (
            f"neighbor {r.neighbor_id} of query {r.query_id} came from "
            f"unprobed cell {neighbor_cell}"
        )


def test_ivfpq_string_ids_raise_clear_error(spark):
    """r11 ADVICE: codes are labeled by sampled corpus ids and carried
    through the Arrow micro-argmin as an int64 vector; a string-id
    corpus must fail fast with a named ValueError at plan-build time,
    not an opaque numpy crash inside the UDF."""
    emb = tables.load_table(spark, SF, "embeddings")
    s = emb.select(
        F.concat(F.lit("v"), F.col("vec_id").cast("string")).alias("vec_id"),
        "embedding",
    )
    with pytest.raises(ValueError, match="integer"):
        ivfpq_topk_det(s, s.limit(2), k=3)


def test_anchor_cosines_null_embedding_yields_null_row(spark):
    """r11 ADVICE: a NULL embedding must flow through the Arrow
    multi-anchor cosine as a null output row (the replaced
    crossJoin+window shape produced null sims), not crash the stage."""
    from ingest_pipeline_spark.operators.similarity import anchor_cosines_seq

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    cos = anchor_cosines_seq([[1.0, 0.0], [0.0, 1.0]])
    rows = {r["vec_id"]: r["cs"] for r in
            df.select("vec_id", cos(F.col("embedding")).alias("cs")).collect()}
    assert rows[2] is None
    assert rows[1][0] == 1.0 and abs(rows[1][1]) < 1e-12
    assert rows[3][1] == 1.0
