"""Every decode_ok-filtering multimodal query decodes its WHOLE corpus.

The r10 multimodal queries filter ``decode_ok`` Spark-side while their
DuckDB oracles enumerate every embedding unconditionally — correct
today because the synthetic corpora are lossless round-trips, but a
future codec regression would surface only as an opaque oracle hash
mismatch.  This battery pins the invariant directly: for each
query-corpus x decoder pair, decode_ok is ALL-true and error is null,
so a codec break fails here with the per-asset error message instead
of an oracle diff (r10 ADVICE #4).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ingest_pipeline_spark.operators.multimodal import (
    audio_silence_features,
    audio_zero_crossing_features,
    decode_audio_features,
    decode_image_features,
    embeddings_to_jpeg,
    embeddings_to_png,
    embeddings_to_tiff,
    embeddings_to_wav,
    embeddings_to_y4m,
    image_downsample_area,
    image_dhash_features,
    image_otsu_features,
    image_sobel_features,
    tile_pixel_stats,
    video_frame_stats,
    video_keyframes,
    video_shot_cuts,
)
from ingest_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def _assert_all_ok(feats, label):
    bad = (
        feats.filter(~F.col("decode_ok"))
        .select("asset_id", "error")
        .limit(5)
        .collect()
    )
    assert not bad, f"{label}: decode failures {[(r[0], r[1]) for r in bad]}"


# every (corpus builder, decoder) pair a registered query filters on —
# keep in sync with queries.py's multimodal registrations
CASES = [
    ("png+features", lambda e: decode_image_features(
        embeddings_to_png(e, width=8))),
    ("tiff+features", lambda e: decode_image_features(
        embeddings_to_tiff(e, width=8))),
    ("jpeg+features", lambda e: decode_image_features(
        embeddings_to_jpeg(e, tiles_per_row=8))),
    ("wav+features", lambda e: decode_audio_features(
        embeddings_to_wav(e, rate=16000))),
    ("tiff+downsample", lambda e: image_downsample_area(
        embeddings_to_tiff(e, width=8), factor=2)),
    ("png+sobel", lambda e: image_sobel_features(
        embeddings_to_png(e, width=8), edge_threshold=4000)),
    ("png+dhash", lambda e: image_dhash_features(
        embeddings_to_png(e, width=8))),
    ("tiff+tilestats", lambda e: tile_pixel_stats(
        embeddings_to_tiff(e, width=8), tile=4)),
    ("wav+silence", lambda e: audio_silence_features(
        embeddings_to_wav(e), window=8, threshold=60_000_000)),
    ("wav+zerocross", lambda e: audio_zero_crossing_features(
        embeddings_to_wav(e))),
    ("y4m+framestats", lambda e: video_frame_stats(
        embeddings_to_y4m(e, width=4, height=4), every_n=2)),
    ("y4m+shotcuts", lambda e: video_shot_cuts(
        embeddings_to_y4m(e, width=4, height=4), threshold=320)),
    ("y4m+keyframes", lambda e: video_keyframes(
        embeddings_to_y4m(e, width=4, height=4))),
]


@pytest.mark.parametrize("label,build", CASES, ids=[c[0] for c in CASES])
def test_query_corpus_decodes_clean(emb, label, build):
    _assert_all_ok(build(emb), label)


def test_otsu_corpus_constant_rows_are_the_only_failures(emb):
    # otsu legitimately degrades constant images to error rows; assert
    # failures (if any) are exactly the no-cut case, never a codec error
    feats = image_otsu_features(embeddings_to_tiff(emb, width=8))
    bad = feats.filter(~F.col("decode_ok")).select("error").distinct().collect()
    allowed = {"constant image has no otsu cut"}
    got = {r[0] for r in bad}
    assert got <= allowed, f"unexpected otsu failures: {got - allowed}"
