"""Streaming MinHash-LSH near-dup dedup: per-row signatures must be
bit-identical to the batch explode→groupBy path, and the stateful
stream must emit the same duplicate set as the batch fallback."""

from pyspark.sql import functions as F

from ingest_pipeline_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_signatures,
)
from ingest_pipeline_spark.streaming.events import run_stream_once
from ingest_pipeline_spark.streaming.neardup import (
    banded_signature_rows,
    neardup_dedup_stream,
)
from ingest_pipeline_spark.tables import load_table


def _aug(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return docs.unionByName(dups)


def test_per_row_signatures_match_batch(spark, sf_dir):
    docs = _aug(spark, sf_dir).filter(F.col("doc_id") % 7 == 0)
    batch = minhash_signatures(docs, "text", "doc_id", num_hashes=16, shingle_k=3)
    rows_per_band = 4
    batch_banded = {
        (r.id, b, "_".join(str(r.signature[b * rows_per_band + k]) for k in range(rows_per_band)))
        for r in batch.collect()
        for b in range(4)
    }
    per_row = {
        (r.doc_id, r.band, r.band_key)
        for r in banded_signature_rows(docs, num_hashes=16, bands=4).collect()
    }
    assert per_row == batch_banded
    assert len(per_row) > 0


def test_batch_fallback_consistent_with_lsh_pairs(spark, sf_dir):
    docs = _aug(spark, sf_dir)
    records = neardup_dedup_stream(docs).collect()
    dup_set = {r.doc_id for r in records}
    assert dup_set, "aug copies must collide"
    # every emitted duplicate collides with a smaller id in some band,
    # so it must appear as id_b of an independent batch LSH candidate
    pair_bs = {
        r.id_b for r in minhash_lsh_pairs(docs, "text", "doc_id").collect()
    }
    assert dup_set <= pair_bs
    # every exact aug copy is caught
    originals_with_copy = {
        r.doc_id
        for r in docs.filter("doc_id >= 1000000").select(
            (F.col("doc_id") - 1000000).alias("doc_id")
        ).collect()
    }
    assert {o + 1000000 for o in originals_with_copy} <= dup_set


def test_streaming_neardup_matches_batch(spark, sf_dir, tmp_path):
    docs = _aug(spark, sf_dir).filter(F.col("doc_id") % 3 == 0)
    src = str(tmp_path / "docs")
    docs.write.mode("overwrite").parquet(src)
    raw = spark.read.parquet(src)

    expected = {
        (r.band, r.band_key, r.doc_id, r.dup_of)
        for r in neardup_dedup_stream(raw).collect()
    }
    got_df = run_stream_once(
        spark, src, raw.schema, neardup_dedup_stream, "neardup_test"
    )
    got = {(r.band, r.band_key, r.doc_id, r.dup_of) for r in got_df.collect()}
    assert got == expected
    assert len(got) > 0


def test_late_smaller_id_dethrones_and_emits_old_rep(spark, sf_dir, tmp_path):
    """A smaller doc id arriving in a LATER micro-batch must dethrone
    the stored representative AND emit it as a duplicate — otherwise
    the stream under-reports vs the batch fallback."""
    import os
    import time

    docs = _aug(spark, sf_dir).filter(F.col("doc_id") % 3 == 0)
    src = str(tmp_path / "docs2")
    os.makedirs(src, exist_ok=True)
    # file 1: the HIGH-id aug copies arrive first; file 2: originals
    high = docs.filter("doc_id >= 1000000")
    low = docs.filter("doc_id < 1000000")
    high.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "h"))
    low.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "l"))
    import glob
    import shutil

    h_file = glob.glob(str(tmp_path / "h" / "part-*.parquet"))[0]
    l_file = glob.glob(str(tmp_path / "l" / "part-*.parquet"))[0]
    shutil.copy(h_file, os.path.join(src, "0-high.parquet"))
    time.sleep(1.1)  # distinct mtimes → deterministic arrival order
    shutil.copy(l_file, os.path.join(src, "1-low.parquet"))

    raw = spark.read.parquet(src)
    out = spark.readStream.schema(raw.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    from ingest_pipeline_spark.streaming.neardup import neardup_dedup_stream

    q = (
        neardup_dedup_stream(out)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("neardup_late")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.band, r.band_key, r.doc_id, r.dup_of)
        for r in spark.sql("SELECT * FROM neardup_late").collect()
    }
    expected = {
        (r.band, r.band_key, r.doc_id, r.dup_of)
        for r in neardup_dedup_stream(raw).collect()
    }
    # batch records must all be present (stream may additionally carry
    # transient records from the first batch where a high id briefly
    # held the bucket rep — those are the dethroned emissions)
    assert expected <= got
    assert len(expected) > 0
    # in particular: every dethroned high-id rep was emitted as a dup
    batch_dups = {r[2] for r in expected}
    stream_dups = {r[2] for r in got}
    assert batch_dups <= stream_dups
