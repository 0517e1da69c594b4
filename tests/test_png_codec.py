"""PNG codec guards (operators/multimodal.py png_decode/png_encode).

A matched encoder/decoder bug pair (e.g. a/c swapped in Paeth on both
sides) survives round-trip tests, so the battery is three-legged:
round-trips across every filter×colortype, a HAND-DERIVED filtered
byte fixture (the spec arithmetic worked out independently in
literals), and real-world PNGs from EXTERNAL encoders shipped with the
OS (palette git-logo, RGBA sphinx icon) with header facts pinned."""

import os
import sys
import zlib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ingest_pipeline_spark.operators.multimodal import (  # noqa: E402
    decode_image_features,
    embeddings_to_png,
    png_decode,
    png_encode,
)


def _pixels(w, h, ch, seed=7):
    # deterministic pseudo-random-ish pixels with structure (gradients
    # make Sub/Up/Average/Paeth predictions non-trivial)
    return bytes(
        (x * 3 + y * 7 + c * 11 + seed * (1 + ((x * y) % 5))) % 256
        for y in range(h)
        for x in range(w)
        for c in range(ch)
    )


def test_roundtrip_all_filters_and_colortypes():
    for ch in (1, 2, 3, 4):
        px = _pixels(5, 4, ch)
        for f in range(5):
            blob = png_encode(5, 4, ch, px, filter_type=f)
            w, h, ch2, bd, out = png_decode(blob)
            assert (w, h, ch2, bd) == (5, 4, ch, 8), (ch, f)
            assert out == px, f"filter {f} colortype ch={ch} round-trip"


def test_unfilter_hand_derived():
    """Decode a hand-built IDAT with known filtered bytes — the
    expected reconstruction is derived by hand from the PNG spec, not
    by our encoder.  Grayscale 3x3, rows filtered Sub, Up, Paeth."""
    import struct

    # target image (raw samples):
    #   10 20 30
    #   13 24 35
    #   20 20 20
    # row0 Sub   (bpp=1): 10, 20-10=10, 30-20=10          -> 1,10,10,10
    # row1 Up            : 13-10=3, 24-20=4, 35-30=5      -> 2,3,4,5
    # row2 Paeth: a=left, b=up, c=up-left
    #   i0: a=0,c=0,b=13 -> pred=13 -> 20-13=7
    #   i1: a=20,b=24,c=13, p=31, pa=11,pb=7,pc=18 -> pred=b=24 -> 20-24=-4=252
    #   i2: a=20,b=35,c=24, p=31, pa=11,pb=4,pc=7  -> pred=b=35 -> 20-35=-15=241
    raw = bytes([1, 10, 10, 10, 2, 3, 4, 5, 4, 7, 252, 241])

    def chunk(typ, payload):
        return (
            struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload))
        )

    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 3, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, ch, bd, out = png_decode(blob)
    assert (w, h, ch, bd) == (3, 3, 1, 8)
    assert list(out) == [10, 20, 30, 13, 24, 35, 20, 20, 20]


GIT_LOGO = "/usr/share/gitweb/static/git-logo.png"
SPHINX_FILE = "/usr/share/doc/python3/_static/file.png"


@pytest.mark.skipif(not os.path.exists(GIT_LOGO), reason="no system PNG")
def test_decode_external_palette_png():
    w, h, ch, bd, px = png_decode(open(GIT_LOGO, "rb").read())
    # header facts independently verifiable (struct-parse of IHDR):
    # 72x27, 8-bit palette -> expanded to RGB
    assert (w, h, ch, bd) == (72, 27, 3, 8)
    assert len(px) == 72 * 27 * 3
    # re-encode with our encoder and decode again: pixels identical
    for f in (0, 4):
        assert png_decode(png_encode(w, h, ch, px, filter_type=f))[4] == px


@pytest.mark.skipif(not os.path.exists(SPHINX_FILE), reason="no system PNG")
def test_decode_external_rgba_png():
    w, h, ch, bd, px = png_decode(open(SPHINX_FILE, "rb").read())
    assert (w, h, ch, bd) == (16, 16, 4, 8)
    assert len(px) == 16 * 16 * 4


def test_decode_rejects_bad_input():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")
    # truncated IDAT stream
    blob = png_encode(4, 4, 1, bytes(16))
    with pytest.raises(ValueError):
        png_decode(blob[:40])
    # interlaced flag
    import struct

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)

    def chunk(typ, payload):
        return (
            struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload))
        )

    blob = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(6))) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlaced"):
        png_decode(blob)


def test_decode_image_features_mixed_media(spark):
    px = _pixels(4, 2, 1)
    good = png_encode(4, 2, 1, px, filter_type=2)
    assets = spark.createDataFrame(
        [
            (1, bytearray(good)),
            (2, bytearray(b"\xff\xd8\xffJPEGJUNK")),
            (3, bytearray(good[:30])),
            (4, None),
        ],
        "asset_id long, media binary",
    )
    rows = {r.asset_id: r for r in decode_image_features(assets).collect()}
    ok = rows[1]
    assert ok.decode_ok and (ok.width, ok.height, ok.channels) == (4, 2, 1)
    assert ok.px_sum == sum(px) and ok.px_min == min(px) and ok.px_max == max(px)
    # FFD8FF magic now routes to the real JPEG decoder (r10), so the
    # junk degrades with a JPEG marker-walk error instead of falling
    # through to PNG's "not a PNG"
    assert not rows[2].decode_ok and "segment" in rows[2].error
    assert not rows[3].decode_ok
    assert not rows[4].decode_ok
    # plan: Arrow-batched MapInPandas, no driver-side loop
    plan = decode_image_features(assets)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_embeddings_to_png_quantization(spark):
    emb = spark.createDataFrame(
        [(7, [0.0] * 16), (8, [-1.5, 1.5] + [0.25] * 14)],
        "vec_id long, embedding array<float>",
    )
    feats = {
        r.asset_id: r
        for r in decode_image_features(embeddings_to_png(emb, width=4)).collect()
    }
    # v=0 -> floor(127.5) = 127 everywhere
    assert feats[7].decode_ok and feats[7].px_sum == 127 * 16
    assert (feats[7].width, feats[7].height) == (4, 4)
    # clamping: -1.5 -> 0, 1.5 -> 255; 0.25 -> floor(159.375) = 159
    assert feats[8].px_min == 0 and feats[8].px_max == 255
    assert feats[8].px_sum == 0 + 255 + 159 * 14
