"""Units for operators/multimodal.image_downsample_area.

The oracle pins the full-block 8x8 -> 4x4 path; these pin what it
can't: edge-block clamping on odd dimensions, the half-up integer
mean, the corrupt-media error-row discipline, and factor validation.
"""

from __future__ import annotations

import pytest

from ingest_pipeline_spark.operators.multimodal import (
    image_downsample_area,
    png_encode,
    tiff_encode,
)


def test_downsample_exact_full_blocks(spark):
    # 4x2 image, factor 2 -> two 2x2 blocks with known half-up means:
    # block0 = (10+20+30+40+2)//4 = 25; block1 = (0+1+1+2+2)//4 = 1
    px = bytes([10, 20, 0, 1, 30, 40, 1, 2])
    rows = spark.createDataFrame(
        [(1, bytearray(tiff_encode(4, 2, px)))], "asset_id long, media binary"
    )
    r = image_downsample_area(rows, factor=2).collect()[0]
    assert (r.out_w, r.out_h, r.pixels) == (2, 1, [25, 1])


def test_downsample_edge_blocks_clamp(spark):
    # 3x3 image, factor 2 -> 2x2 output; right/bottom blocks average
    # their ACTUAL counts (2, 2, 1), not padded zeros.
    px = bytes([1, 3, 5, 7, 9, 11, 13, 15, 17])
    rows = spark.createDataFrame(
        [(1, bytearray(png_encode(3, 3, 1, px)))], "asset_id long, media binary"
    )
    r = image_downsample_area(rows, factor=2).collect()[0]
    # blocks: [1,3,7,9]=5, [5,11]=8, [13,15]=14, [17]=17
    assert (r.out_w, r.out_h, r.pixels) == (2, 2, [5, 8, 14, 17])


def test_downsample_half_up_rounding(spark):
    # sum=2 over 4 px -> (2+2)//4 = 1 (half rounds UP, not banker's)
    px = bytes([1, 1, 0, 0])
    rows = spark.createDataFrame(
        [(1, bytearray(tiff_encode(2, 2, px)))], "asset_id long, media binary"
    )
    assert image_downsample_area(rows, factor=2).collect()[0].pixels == [1]


def test_downsample_factor_one_is_identity(spark):
    px = bytes([9, 8, 7, 6])
    rows = spark.createDataFrame(
        [(1, bytearray(tiff_encode(2, 2, px)))], "asset_id long, media binary"
    )
    assert image_downsample_area(rows, factor=1).collect()[0].pixels == [9, 8, 7, 6]


def test_downsample_corrupt_media_degrades_to_error_rows(spark):
    bad = spark.createDataFrame(
        [(1, bytearray(b"II*\x00garbage")), (2, bytearray(b"\x89PNG\r\n")),
         (3, None), (4, bytearray(b""))],
        "asset_id long, media binary",
    )
    out = {r.asset_id: r.decode_ok for r in
           image_downsample_area(bad).collect()}
    assert out == {1: False, 2: False, 3: False, 4: False}


def test_downsample_rejects_bad_factor():
    with pytest.raises(ValueError):
        image_downsample_area(None, factor=0)
