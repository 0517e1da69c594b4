"""Units for operators/multimodal.image_otsu_features.

The oracle pins the corpus path; these pin a hand-computed bimodal
threshold, the lowest-t tie rule, the constant-image degenerate case,
and the corrupt-media discipline.
"""

from __future__ import annotations

from ingest_pipeline_spark.operators.multimodal import (
    image_otsu_features,
    tiff_encode,
)


def _otsu(spark, px):
    rows = spark.createDataFrame(
        [(1, bytearray(tiff_encode(len(px), 1, bytes(px))))],
        "asset_id long, media binary",
    )
    return image_otsu_features(rows).collect()[0]


def test_otsu_bimodal_hand_computed(spark):
    # two clean modes {10,10,10, 200,200,200}: the optimal cut is at 10
    # (bg={10s}, fg={200s}); num2 = (30*3 - 600*3)^2 = 1710^2, den = 9
    r = _otsu(spark, [10, 10, 10, 200, 200, 200])
    assert (r.otsu_t, r.bg_count, r.fg_count) == (10, 3, 3)
    assert (r.num2, r.den) == (1710 * 1710, 9)


def test_otsu_tie_takes_lowest_threshold(spark):
    # symmetric {0, 100}: cuts at t=0 -> (0*1-100*1)^2/1 = 10000;
    # only one valid cut, but {0,50,100} gives equal-variance cuts:
    # t=0: (0*2-150*1)^2/2 = 11250; t=50: (50*1-100*2)^2/2 = 11250 -> t=0
    r = _otsu(spark, [0, 50, 100])
    assert r.otsu_t == 0
    assert (r.num2, r.den) == (150 * 150, 2)


def test_otsu_constant_image_degrades(spark):
    r = _otsu(spark, [42, 42, 42, 42])
    assert not r.decode_ok
    assert "constant" in r.error


def test_otsu_corrupt_media_degrades(spark):
    bad = spark.createDataFrame(
        [(1, bytearray(b"MM\x00*junk")), (2, None)],
        "asset_id long, media binary",
    )
    out = {r.asset_id: r.decode_ok for r in image_otsu_features(bad).collect()}
    assert out == {1: False, 2: False}
