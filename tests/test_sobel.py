"""Units for operators/multimodal.image_sobel_features.

The oracle pins the 8x8 corpus; these pin hand-computed kernel values
(orientation matters — gx must respond to vertical edges, gy to
horizontal), the no-interior degenerate case, and the corrupt-media
error-row discipline.
"""

from __future__ import annotations

from ingest_pipeline_spark.operators.multimodal import (
    image_sobel_features,
    png_encode,
    tiff_encode,
)


def _feats(spark, w, h, px, threshold=0):
    rows = spark.createDataFrame(
        [(1, bytearray(png_encode(w, h, 1, bytes(px))))],
        "asset_id long, media binary",
    )
    return image_sobel_features(rows, edge_threshold=threshold).collect()[0]


def test_sobel_vertical_edge_hand_computed(spark):
    # 3x3 image: left column 0, right column 100, centre column 50.
    # Single interior pixel (1,1): gx = (100+200+100) - 0 = 400, gy = 0.
    px = [0, 50, 100, 0, 50, 100, 0, 50, 100]
    r = _feats(spark, 3, 3, px)
    assert (r.n_interior, r.grad_energy, r.max_grad2) == (1, 160000, 160000)


def test_sobel_horizontal_edge_hand_computed(spark):
    # transpose of the vertical fixture: gy = 400, gx = 0
    px = [0, 0, 0, 50, 50, 50, 100, 100, 100]
    r = _feats(spark, 3, 3, px)
    assert (r.n_interior, r.grad_energy, r.max_grad2) == (1, 160000, 160000)


def test_sobel_flat_image_zero_energy(spark):
    px = [77] * 16
    r = _feats(spark, 4, 4, px, threshold=0)
    assert (r.n_interior, r.grad_energy, r.max_grad2, r.n_edge_px) == (4, 0, 0, 0)


def test_sobel_no_interior_reports_zeros(spark):
    # 2x2 image has no interior pixels
    r = _feats(spark, 2, 2, [1, 2, 3, 4])
    assert (r.n_interior, r.grad_energy, r.max_grad2, r.n_edge_px) == (0, 0, 0, 0)
    assert r.decode_ok


def test_sobel_threshold_is_strict(spark):
    # vertical edge: g2 = 160000; threshold exactly 160000 -> not an edge
    px = [0, 50, 100, 0, 50, 100, 0, 50, 100]
    assert _feats(spark, 3, 3, px, threshold=160000).n_edge_px == 0
    assert _feats(spark, 3, 3, px, threshold=159999).n_edge_px == 1


def test_sobel_corrupt_media_degrades(spark):
    bad = spark.createDataFrame(
        [(1, bytearray(b"II*\x00junk")), (2, None),
         (3, bytearray(tiff_encode(2, 2, bytes([9, 9, 9, 9]))))],
        "asset_id long, media binary",
    )
    out = {r.asset_id: r.decode_ok for r in image_sobel_features(bad).collect()}
    assert out == {1: False, 2: False, 3: True}
