"""H.264 I_PCM subset battery: NAL/exp-Golomb/emulation-prevention
machinery, lossless roundtrip on arbitrary content, declared-scope
rejection of out-of-subset streams, corrupt degradation."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from ingest_pipeline_spark.operators.multimodal import (
    _BitReader,
    _BitWriter,
    _ep_insert,
    _ep_strip,
    embeddings_to_h264,
    h264_ipcm_decode,
    h264_ipcm_encode,
    video_h264_frame_stats,
)


def test_exp_golomb_roundtrip():
    w = _BitWriter()
    vals = [0, 1, 2, 3, 7, 8, 25, 255, 100000]
    svals = [0, 1, -1, 2, -2, 12, -37]
    for v in vals:
        w.ue(v)
    for v in svals:
        w.se(v)
    blob = w.rbsp_trailing()
    r = _BitReader(blob)
    assert [r.ue() for _ in vals] == vals
    assert [r.se() for _ in svals] == svals


def test_emulation_prevention_exact():
    cases = [
        b"\x00\x00\x00", b"\x00\x00\x01", b"\x00\x00\x02", b"\x00\x00\x03",
        b"\x00\x00\x04",                       # no escape needed
        b"a\x00\x00\x01b\x00\x00\x00c",
        bytes(range(256)) * 3,
        b"\x00" * 64,
    ]
    for rbsp in cases:
        ebsp = _ep_insert(rbsp)
        assert b"\x00\x00\x01" not in ebsp
        assert b"\x00\x00\x00" not in ebsp
        assert _ep_strip(ebsp) == rbsp
    assert _ep_insert(b"\x00\x00\x04") == b"\x00\x00\x04"


def test_roundtrip_arbitrary_content_lossless():
    rng = random.Random(11)
    for w, h, nf in [(16, 16, 1), (16, 16, 5), (32, 16, 2), (48, 32, 3)]:
        frames = [bytes(rng.randrange(256) for _ in range(w * h))
                  for _ in range(nf)]
        blob = h264_ipcm_encode(w, h, frames)
        assert h264_ipcm_decode(blob) == (w, h, frames)


def test_pcm_bytes_that_mimic_start_codes_survive():
    frames = [bytes([0, 0, 0, 1] * 64), bytes([0] * 256),
              bytes([0, 0, 3, 1] * 64)]
    blob = h264_ipcm_encode(16, 16, frames)
    assert h264_ipcm_decode(blob)[2] == frames


def test_out_of_subset_and_corrupt_streams_rejected():
    good = h264_ipcm_encode(16, 16, [bytes(256)])
    with pytest.raises(ValueError):
        h264_ipcm_decode(b"")
    with pytest.raises(ValueError):
        h264_ipcm_decode(b"\x00\x00\x01")          # empty NAL only
    with pytest.raises(ValueError):
        h264_ipcm_decode(good[: len(good) - 150])  # truncated PCM
    # slice before SPS/PPS
    first_slice = good.index(b"\x00\x00\x00\x01\x65")
    with pytest.raises(ValueError, match="SPS"):
        h264_ipcm_decode(good[first_slice:])
    # a non-I_PCM macroblock (mb_type 0 = I_4x4) must be named in the error
    w = _BitWriter()
    w.ue(0); w.ue(7); w.ue(0); w.u(0, 4); w.ue(0)
    w.u(0, 1); w.u(0, 1); w.se(0)
    w.ue(0)  # mb_type I_4x4 -> residual coding we do not implement
    bad_slice = b"\x00\x00\x00\x01\x65" + _ep_insert(w.rbsp_trailing())
    hdr_end = good.index(b"\x00\x00\x00\x01\x65")
    with pytest.raises(ValueError, match="I_PCM"):
        h264_ipcm_decode(good[:hdr_end] + bad_slice)
    # dimensions must be whole macroblocks
    with pytest.raises(ValueError):
        h264_ipcm_encode(8, 8, [bytes(64)])


def test_spark_frame_stats_match_source_values(spark):
    import math

    emb = spark.createDataFrame(
        [(i, [((i * 13 + j * 7) % 200) / 100.0 - 1.0 for j in range(8)])
         for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    corrupt = spark.createDataFrame(
        [(99, bytearray(b"\x00\x00\x01\x67junk"))],
        "asset_id long, media binary",
    )
    out = video_h264_frame_stats(
        embeddings_to_h264(emb).unionByName(corrupt)
    ).collect()
    ok = [r for r in out if r.decode_ok]
    bad = [r for r in out if not r.decode_ok]
    assert len(ok) == 10 and len(bad) == 1  # 2 frames x 5 assets
    assert bad[0].asset_id == 99 and bad[0].error
    for r in ok:
        vec = [((r.asset_id * 13 + j * 7) % 200) / 100.0 - 1.0
               for j in range(8)]
        q = [min(255, max(0, math.floor((v + 1.0) * 127.5)))
             for v in vec[r.frame_idx * 4 : r.frame_idx * 4 + 4]]
        assert (r.px_sum, r.px_min, r.px_max) == (64 * sum(q), min(q), max(q))
        assert (r.width, r.height) == (16, 16)


def test_hypothesis_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        mbs_w=st.integers(1, 3),
        mbs_h=st.integers(1, 3),
        nf=st.integers(1, 3),
        data=st.data(),
    )
    def prop(mbs_w, mbs_h, nf, data):
        w, h = mbs_w * 16, mbs_h * 16
        frames = [
            bytes(
                data.draw(
                    st.lists(st.integers(0, 255), min_size=w * h,
                             max_size=w * h)
                )
            )
            for _ in range(nf)
        ]
        assert h264_ipcm_decode(h264_ipcm_encode(w, h, frames)) == (
            w, h, frames,
        )

    prop()
