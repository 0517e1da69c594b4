"""MJPEG-in-AVI codec battery: container roundtrip, frame-accuracy on
general content, lossless constant-tile path, corrupt degradation."""

from __future__ import annotations

import random
import struct

import pytest

from pyspark.sql import functions as F

from ingest_pipeline_spark.operators.multimodal import (
    avi_mjpeg_decode,
    avi_mjpeg_encode,
    embeddings_to_avi,
    jpeg_decode,
    jpeg_encode,
    video_mjpeg_frame_stats,
)


def _const_tiles(vals, tiles_per_row=2):
    th = len(vals) // tiles_per_row
    w, h = tiles_per_row * 8, th * 8
    img = bytearray(w * h)
    for t, v in enumerate(vals):
        ty, tx = divmod(t, tiles_per_row)
        for r in range(8):
            row = (ty * 8 + r) * w + tx * 8
            img[row : row + 8] = bytes([v]) * 8
    return w, h, bytes(img)


def test_container_roundtrip_constant_tiles_lossless():
    w, h, f0 = _const_tiles([17, 99, 180, 255])
    _, _, f1 = _const_tiles([0, 1, 2, 3])
    blob = avi_mjpeg_encode(w, h, [f0, f1], fps=5)
    rw, rh, frames = avi_mjpeg_decode(blob)
    assert (rw, rh) == (w, h)
    assert frames == [f0, f1]  # DC-only blocks survive q=1 exactly


def test_general_content_frames_decode_near_exact():
    # general (non-constant) frames: the container must hand each
    # frame to the JPEG codec verbatim — whatever jpeg_encode/decode
    # do standalone is exactly what the AVI path reproduces
    rng = random.Random(3)
    frames = [
        bytes(rng.randrange(256) for _ in range(16 * 16)) for _ in range(3)
    ]
    blob = avi_mjpeg_encode(16, 16, frames)
    _, _, got = avi_mjpeg_decode(blob)
    for orig, dec in zip(frames, got):
        standalone = jpeg_decode(jpeg_encode(16, 16, 1, orig))[4]
        assert dec == standalone


def test_frame_order_and_count_preserved():
    frames = [bytes([v]) * 64 for v in (5, 250, 120, 7)]
    blob = avi_mjpeg_encode(8, 8, frames)
    _, _, got = avi_mjpeg_decode(blob)
    assert [f[0] for f in got] == [5, 250, 120, 7]
    # idx1 present and one entry per frame
    idx = blob.index(b"idx1")
    (size,) = struct.unpack("<I", blob[idx + 4 : idx + 8])
    assert size == 16 * len(frames)


def test_corrupt_inputs_raise_valueerror():
    good = avi_mjpeg_encode(8, 8, [bytes(64)])
    for tag, b in {
        "empty": b"",
        "not riff": b"XXXX" + good[4:],
        "not avi": good[:8] + b"WAVE" + good[12:],
        "truncated": good[: len(good) // 2],
        "no frames": good.replace(b"00dc", b"zzzz"),
    }.items():
        with pytest.raises(ValueError):
            avi_mjpeg_decode(b)
        assert tag


def test_mixed_frame_sizes_rejected():
    f8 = jpeg_encode(8, 8, 1, bytes(64))
    f16 = jpeg_encode(16, 16, 1, bytes(256))
    body = b"movi"
    for fr in (f8, f16):
        pad = b"\x00" if len(fr) % 2 else b""
        body += b"00dc" + struct.pack("<I", len(fr)) + fr + pad
    movi = b"LIST" + struct.pack("<I", len(body)) + body
    avi = b"RIFF" + struct.pack("<I", 4 + len(movi)) + b"AVI " + movi
    with pytest.raises(ValueError, match="disagree"):
        avi_mjpeg_decode(avi)


def test_spark_frame_stats_with_error_rows(spark):
    emb = spark.createDataFrame(
        [(0, [((j * 7) % 200) / 100.0 - 1.0 for j in range(8)]),
         (8, [0.5] * 8)],
        "vec_id long, embedding array<double>",
    )
    assets = embeddings_to_avi(emb, values_per_frame=4, tiles_per_row=2)
    corrupt = spark.createDataFrame(
        [(99, bytearray(b"RIFFjunk"))], "asset_id long, media binary"
    )
    out = video_mjpeg_frame_stats(assets.unionByName(corrupt))
    rows = out.collect()
    ok = [r for r in rows if r.decode_ok]
    bad = [r for r in rows if not r.decode_ok]
    assert len(ok) == 4 and len(bad) == 1  # 2 frames per asset, 1 error
    assert bad[0].asset_id == 99 and bad[0].error
    # per-frame stats mirror the quantized values exactly
    import math

    for r in ok:
        vec = [((j * 7) % 200) / 100.0 - 1.0 for j in range(8)] \
            if r.asset_id == 0 else [0.5] * 8
        q = [min(255, max(0, math.floor((v + 1.0) * 127.5)))
             for v in vec[r.frame_idx * 4 : r.frame_idx * 4 + 4]]
        assert (r.px_sum, r.px_min, r.px_max) == (64 * sum(q), min(q), max(q))
        assert (r.width, r.height) == (16, 16)
