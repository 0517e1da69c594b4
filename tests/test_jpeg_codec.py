"""Baseline JPEG codec guards (operators/multimodal.py jpeg_encode /
jpeg_decode — the r9 verdict's ask #2).

The oracle-checked roundtrip query only exercises constant-block
grayscale (the mathematically lossless subset), so these units carry
the rest of the decoder surface: general-content accuracy, the color /
restart / subsampling paths, bit-level format interop via hand-packed
golden bytes (the LZW-fixture discipline — no JPEG library exists in
this container, so the spec-level hand packing IS the interop ground
truth), and the corrupt-input battery (one bad file = one error row,
never a failed scan)."""

import os
import struct
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pytest  # noqa: E402

from ingest_pipeline_spark.operators.multimodal import (  # noqa: E402
    _JPEG_AC_LUM_BITS,
    _JPEG_AC_LUM_VALS,
    _JPEG_DC_LUM_BITS,
    _JPEG_DC_LUM_VALS,
    _JPEG_ZZ,
    jpeg_decode,
    jpeg_encode,
)


def _tile_image(w_tiles, h_tiles, val_fn):
    w, h = w_tiles * 8, h_tiles * 8
    img = bytearray(w * h)
    for ty in range(h_tiles):
        for tx in range(w_tiles):
            v = val_fn(tx, ty) & 0xFF
            for r in range(8):
                row = (ty * 8 + r) * w + tx * 8
                img[row : row + 8] = bytes([v]) * 8
    return w, h, bytes(img)


def test_zigzag_is_the_standard_order():
    assert len(_JPEG_ZZ) == 64 and sorted(_JPEG_ZZ) == list(range(64))
    assert _JPEG_ZZ[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert _JPEG_ZZ[-4:] == [47, 55, 62, 63]


def test_constant_tile_roundtrip_is_lossless():
    w, h, img = _tile_image(6, 4, lambda tx, ty: (37 * tx + 53 * ty) % 251)
    got = jpeg_decode(jpeg_encode(w, h, 1, img))
    assert got == (w, h, 1, 8, img)
    # extremes: 0 and 255 tiles (max |DC|)
    w2, h2, img2 = _tile_image(2, 1, lambda tx, ty: 0 if tx == 0 else 255)
    assert jpeg_decode(jpeg_encode(w2, h2, 1, img2)) == (w2, h2, 1, 8, img2)


def test_restart_markers_roundtrip_lossless():
    w, h, img = _tile_image(6, 4, lambda tx, ty: (11 * tx + 29 * ty) % 256)
    for ri in (1, 3, 7, 24):
        blob = jpeg_encode(w, h, 1, img, restart_interval=ri)
        assert jpeg_decode(blob) == (w, h, 1, 8, img), ri
    # and the DRI segment is actually present
    assert b"\xff\xdd" in jpeg_encode(w, h, 1, img, restart_interval=3)
    assert b"\xff\xdd" not in jpeg_encode(w, h, 1, img)


def test_general_content_roundtrip_within_one_level():
    """With all-ones quant tables the only loss is FDCT/IDCT double
    rounding — every reconstructed sample must sit within 1 of the
    original (this exercises the full AC run-length path: ZRL, EOB,
    every-coefficient blocks)."""
    import random

    rng = random.Random(11)
    for w, h in ((48, 32), (13, 10), (8, 8), (1, 1), (17, 3)):
        img = bytes(rng.randrange(256) for _ in range(w * h))
        gw, gh, ch, bd, out = jpeg_decode(jpeg_encode(w, h, 1, img))
        assert (gw, gh, ch, bd) == (w, h, 1, 8)
        assert max(abs(a - b) for a, b in zip(img, out)) <= 1, (w, h)


def test_lossy_quant_table_roundtrip_decodes():
    """A real quant table (coarse) must still decode to the right
    geometry with bounded error — the lossy path end to end."""
    import random

    rng = random.Random(5)
    q = [1 + (i // 8) * 3 for i in range(64)]  # coarser with frequency
    # smooth gradient content: quantization error stays small
    img = bytes(
        min(255, x * 3 + y * 2 + rng.randrange(2))
        for y in range(32) for x in range(48)
    )
    gw, gh, ch, bd, out = jpeg_decode(jpeg_encode(48, 32, 1, img, qtable=q))
    assert (gw, gh, ch, bd) == (48, 32, 1, 8)
    err = max(abs(a - b) for a, b in zip(img, out))
    assert err <= 24, err  # bounded by Σq energy, not exactness


def test_color_444_roundtrip_close():
    import random

    rng = random.Random(3)
    w, h = 24, 16
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    gw, gh, ch, bd, out = jpeg_decode(jpeg_encode(w, h, 3, rgb))
    assert (gw, gh, ch, bd) == (w, h, 3, 8)
    # loss = RGB->YCbCr->RGB integer rounding only (q=1): tight bound
    assert max(abs(a - b) for a, b in zip(rgb, out)) <= 6


def test_golden_bytes_of_minimal_encode():
    """Bit-level interop pin: an 8x8 constant-130 grayscale JPEG's
    ENTIRE byte stream, derived by hand from T.81 — marker layout,
    zigzag DQT, canonical Annex K codes (DC cat5 = 110, EOB = 1010),
    two's-complement magnitude bits, and 1-padding.
    Entropy data: DC diff 16 -> 110 10000, EOB -> 1010, pad 1111
    => 0xD0 0xAF."""
    expected = bytearray(b"\xff\xd8")
    expected += (b"\xff\xe0" + struct.pack(">H", 16)
                 + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    expected += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    expected += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
    expected += b"\x01\x11\x00"
    dht = bytes([0x00] + _JPEG_DC_LUM_BITS + _JPEG_DC_LUM_VALS)
    dht += bytes([0x10] + _JPEG_AC_LUM_BITS + _JPEG_AC_LUM_VALS)
    expected += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    expected += b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    expected += b"\xd0\xaf"
    expected += b"\xff\xd9"
    got = jpeg_encode(8, 8, 1, bytes([130]) * 64)
    assert got == bytes(expected)


def test_annex_k_tables_are_wellformed():
    """Canonical-code sanity for the transcribed spec tables: counts,
    kraft inequality, and the known first codes (DC cat0 = 00 at len
    2; AC 0x01 = 00, 0x02 = 01 at len 2, EOB 0x00 = 1010 at len 4)."""
    from ingest_pipeline_spark.operators.multimodal import _huff_canonical

    dc = _huff_canonical(_JPEG_DC_LUM_BITS, _JPEG_DC_LUM_VALS)
    ac = _huff_canonical(_JPEG_AC_LUM_BITS, _JPEG_AC_LUM_VALS)
    assert len(dc) == 12 and len(ac) == 162
    assert dc[0] == (0b00, 2) and dc[5] == (0b110, 3)
    assert ac[0x01] == (0b00, 2) and ac[0x00] == (0b1010, 4)
    assert ac[0xF0] == (0b11111111001, 11)  # ZRL, the Annex K code
    for tab in (dc, ac):
        assert sum(2.0 ** -ln for _, ln in tab.values()) <= 1.0


def test_subsampled_420_color_decodes():
    """A hand-assembled 4:2:0 stream (16x16, one MCU: 4 Y blocks + Cb
    + Cr, constant planes Y=130 Cb=Cr=128) must decode through the
    multi-block-MCU + replication-upsampling path to uniform RGB 130."""
    from ingest_pipeline_spark.operators.multimodal import (
        _huff_canonical,
        _JpegBitWriter,
    )

    dc = _huff_canonical(_JPEG_DC_LUM_BITS, _JPEG_DC_LUM_VALS)
    ac = _huff_canonical(_JPEG_AC_LUM_BITS, _JPEG_AC_LUM_VALS)
    bw = _JpegBitWriter()

    def put_block(diff):
        s = abs(diff).bit_length()
        code, ln = dc[s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        code, ln = ac[0x00]
        bw.write(code, ln)

    put_block(16)   # Y block 1: DC = 8*(130-128)
    put_block(0)    # Y blocks 2-4: same DC, zero diff
    put_block(0)
    put_block(0)
    put_block(0)    # Cb: 128 -> DC 0
    put_block(0)    # Cr
    scan = bw.flush()

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 16, 16, 3)
    out += b"\x01\x22\x00"  # Y: 2x2 sampling
    out += b"\x02\x11\x00"  # Cb: 1x1
    out += b"\x03\x11\x00"  # Cr: 1x1
    dht = bytes([0x00] + _JPEG_DC_LUM_BITS + _JPEG_DC_LUM_VALS)
    dht += bytes([0x10] + _JPEG_AC_LUM_BITS + _JPEG_AC_LUM_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    out += b"\xff\xda" + struct.pack(">H", 12) + b"\x03"
    out += b"\x01\x00\x02\x00\x03\x00" + b"\x00\x3f\x00"
    out += scan + b"\xff\xd9"

    w, h, ch, bd, px = jpeg_decode(bytes(out))
    assert (w, h, ch, bd) == (16, 16, 3, 8)
    assert set(px) == {130}


CORRUPT = [
    b"",
    b"\x89PNG\r\n",
    b"\xff\xd8",
    b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00",  # SOF2
    b"\xff\xd8\xff\xdb\x00\x05\x00\x01\x02",  # truncated DQT
    b"\xff\xd8\xff\xc4\x00\x04\x00\x00",  # truncated DHT
    b"\xff\xd8\xff\xc0\x00\x0b\x08\x00\x00\x00\x08\x01\x01\x11\x00",  # h=0
    b"\xff\xd8\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00",  # SOS before SOF
]


def test_corrupt_inputs_raise_valueerror():
    for blob in CORRUPT + [jpeg_encode(8, 8, 1, bytes(64))[:30]]:
        with pytest.raises(ValueError):
            jpeg_decode(blob)


def test_encoder_input_validation():
    with pytest.raises(ValueError):
        jpeg_encode(8, 8, 2, bytes(128))  # channels
    with pytest.raises(ValueError):
        jpeg_encode(0, 8, 1, b"")  # zero dim
    with pytest.raises(ValueError):
        jpeg_encode(8, 8, 1, bytes(63))  # short buffer
    with pytest.raises(ValueError):
        jpeg_encode(8, 8, 1, bytes(64), qtable=[0] * 64)  # bad qtable


def test_jpeg_flows_through_image_extractors(spark):
    """Magic dispatch: decode_image_features, tile_pixel_stats and
    image_dhash_features must all decode JPEG media, and corrupt JPEG
    bytes must degrade to error rows inside a scan that still
    succeeds."""
    from ingest_pipeline_spark.operators.multimodal import (
        decode_image_features,
        image_dhash_features,
        tile_pixel_stats,
    )

    w, h, img = _tile_image(1, 1, lambda tx, ty: 200)
    good = jpeg_encode(w, h, 1, img)
    grad = jpeg_encode(8, 8, 1, bytes((r * 8 + c) % 251 for r in range(8)
                                      for c in range(8)))
    assets = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"\xff\xd8\xff\xe0bad")),
         (3, bytearray(grad))],
        "asset_id long, media binary",
    )
    feat = {r.asset_id: r for r in decode_image_features(assets).collect()}
    assert feat[1].decode_ok and feat[1].px_sum == 200 * 64
    assert feat[1].width == 8 and feat[1].channels == 1
    assert not feat[2].decode_ok and feat[2].error
    assert feat[3].decode_ok

    tiles = [r for r in tile_pixel_stats(assets, tile=4).collect()
             if r.asset_id == 1]
    assert len(tiles) == 4 and all(t.px_sum == 200 * 16 for t in tiles)

    dh = {r.asset_id: r for r in image_dhash_features(assets).collect()}
    assert dh[3].decode_ok and dh[3].n_bits == 56
    assert not dh[2].decode_ok


def test_fuzz_mutated_streams_raise_only_valueerror():
    """Error-class containment (the ADVICE failure class): any byte
    mutation of a valid JPEG must either decode or raise ValueError —
    never an IndexError/struct.error/KeyError that would escape the
    extractors' error-row discipline and fail a distributed scan."""
    import random

    rng = random.Random(42)
    w, h, img = _tile_image(3, 2, lambda tx, ty: (91 * tx + 17 * ty) % 256)
    base = bytearray(jpeg_encode(w, h, 1, img, restart_interval=2))
    for _ in range(400):
        blob = bytearray(base)
        for _m in range(rng.randrange(1, 4)):
            op = rng.randrange(3)
            if op == 0 and len(blob) > 4:
                blob[rng.randrange(len(blob))] = rng.randrange(256)
            elif op == 1 and len(blob) > 8:
                del blob[rng.randrange(len(blob)) :]
            else:
                blob.insert(rng.randrange(len(blob) + 1), rng.randrange(256))
        try:
            res = jpeg_decode(bytes(blob))
            assert isinstance(res, tuple) and len(res) == 5
        except ValueError:
            pass


def test_hypothesis_roundtrip_arbitrary_images():
    """Property: every 8-bit grayscale image roundtrips within 1 level
    at q=1, at every geometry hypothesis throws at it (partial blocks,
    single pixels, wide/tall strips)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(1, 40),
        st.integers(1, 40),
        st.binary(min_size=1600, max_size=1600),
        st.integers(0, 5),
    )
    def roundtrip(w, h, raw, ri):
        img = raw[: w * h]
        blob = jpeg_encode(w, h, 1, img, restart_interval=ri)
        gw, gh, ch, bd, out = jpeg_decode(blob)
        assert (gw, gh, ch, bd) == (w, h, 1, 8)
        assert max(abs(a - b) for a, b in zip(img, out)) <= 1

    roundtrip()
