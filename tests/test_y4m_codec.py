"""Y4M video codec guards (operators/multimodal.py y4m_encode/decode
+ video_frame_stats).

Legs: roundtrips (multi-frame, single-frame, zero-frame), a HAND-BUILT
byte fixture (header + FRAME markers assembled in literals), header
variants (extra params, wrong colorspace), corrupt-input degradation,
and the frame-sampling stride through the Spark path."""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ingest_pipeline_spark.operators.multimodal import (  # noqa: E402
    embeddings_to_y4m,
    video_frame_stats,
    y4m_decode,
    y4m_encode,
)


def _frames(n, w=4, h=4):
    return [
        bytes((i * 7 + k * 31 + 3) % 256 for i in range(w * h))
        for k in range(n)
    ]


def test_roundtrip():
    for n in (0, 1, 4, 9):
        fr = _frames(n)
        w, h, rate, out = y4m_decode(y4m_encode(4, 4, fr))
        assert (w, h, rate) == (4, 4, "25:1") and out == fr


def test_hand_built_fixture():
    blob = (
        b"YUV4MPEG2 W2 H2 F30000:1001 Ip A1:1 Cmono Xextra\n"
        b"FRAME\n\x01\x02\x03\x04"
        b"FRAMEIparam\n\x05\x06\x07\x08"
    )
    w, h, rate, frames = y4m_decode(blob)
    assert (w, h, rate) == (2, 2, "30000:1001")
    assert frames == [b"\x01\x02\x03\x04", b"\x05\x06\x07\x08"]


def test_corrupt_and_unsupported_raise_valueerror():
    good = y4m_encode(4, 4, _frames(2))
    bads = [
        b"",
        b"AVI ",
        b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420\n" + b"\x00" * 24,  # color
        b"YUV4MPEG2 F25:1 Cmono\n",                # missing W/H
        good[:-3],                                 # truncated frame
        good.replace(b"FRAME", b"FRUME", 1),       # bad marker
    ]
    for bad in bads:
        with pytest.raises(ValueError):
            y4m_decode(bad)
    with pytest.raises(ValueError):
        y4m_encode(4, 4, [b"\x00" * 15])  # bad frame length


def test_spark_frame_sampling_stride(spark):
    emb = spark.createDataFrame(
        [(i, [((i * 13 + j * 7) % 200) / 100.0 - 1.0 for j in range(64)])
         for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    rows = (
        video_frame_stats(embeddings_to_y4m(emb, 4, 4), every_n=2)
        .filter("decode_ok")
        .collect()
    )
    # 64 dims = 4 frames; stride 2 keeps frames 0 and 2
    assert {r.frame_idx for r in rows} == {0, 2}
    assert len(rows) == 8
    assert all(r.n_px == 16 for r in rows)


def test_corrupt_media_degrades_to_error_rows(spark):
    rows = spark.createDataFrame(
        [(1, bytearray(y4m_encode(2, 2, [b"\x01\x02\x03\x04"]))),
         (2, bytearray(b"YUV4MPEG2 garbage")),
         (3, None)],
        "asset_id long, media binary",
    )
    out = {r.asset_id: r.decode_ok for r in video_frame_stats(rows).collect()}
    assert out == {1: True, 2: False, 3: False}
