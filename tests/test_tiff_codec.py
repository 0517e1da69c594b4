"""TIFF strip codec guards (operators/multimodal.py tiff_decode/encode).

Same three-legged battery as the PNG codec: round-trips across the
variant matrix (compression x predictor x byte order x strip layout),
a HAND-BUILT byte fixture whose IFD and predictor arithmetic are
worked out in literals (a matched encoder/decoder bug pair survives
round-trips), corrupt-input degradation (ValueError only — never
struct.error/zlib.error/KeyError escaping to fail a distributed job),
and a cross-codec check: the SAME embedding quantization through the
TIFF path and the PNG path must produce identical pixel stats."""

import os
import struct
import sys
import zlib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ingest_pipeline_spark.operators.extractors import (  # noqa: E402
    _tiff_ifd_tags,
)
from ingest_pipeline_spark.operators.multimodal import (  # noqa: E402
    decode_image_features,
    embeddings_to_png,
    embeddings_to_tiff,
    tiff_decode,
    tiff_encode,
)


def _pixels(w, h, seed=3):
    return bytes(
        (x * 5 + y * 11 + seed * (1 + ((x * y) % 7))) % 256
        for y in range(h)
        for x in range(w)
    )


def test_roundtrip_variant_matrix():
    px = _pixels(7, 9)
    for comp in ("none", "deflate"):
        for pred in (1, 2):
            for bo in ("<", ">"):
                for rps in (1, 4, 9, 100):
                    blob = tiff_encode(
                        7, 9, px, compression=comp, rows_per_strip=rps,
                        predictor=pred, byte_order=bo,
                    )
                    w, h, ch, bd, out = tiff_decode(blob)
                    assert (w, h, ch, bd) == (7, 9, 1, 8), (comp, pred, bo, rps)
                    assert out == px, (comp, pred, bo, rps)


def test_decode_hand_built_fixture():
    """Decode a TIFF assembled byte-by-byte in literals (not by our
    encoder): little-endian, 3x2 grayscale, TWO uncompressed strips
    (RowsPerStrip=1), Predictor 2 with hand-differenced strip bytes.

    target image:   10 25 45     row diffs: 10, 15, 20
                    200 190 210            200, -10=246, 20
    """
    e = "<"
    strip0 = bytes([10, 15, 20])
    strip1 = bytes([200, 246, 20])
    # layout: header(8) | IFD at 8 | strip arrays | strip data
    n_tags = 10
    ifd_size = 2 + n_tags * 12 + 4
    arr0 = 8 + ifd_size          # StripOffsets array (2 longs)
    arr1 = arr0 + 8              # StripByteCounts array (2 longs)
    data0 = arr1 + 8
    data1 = data0 + 3

    def entry(tag, typ, count, val4):
        return struct.pack(e + "HHI", tag, typ, count) + val4

    def short(v):
        return struct.pack(e + "H", v) + b"\x00\x00"

    ifd = struct.pack(e + "H", n_tags)
    ifd += entry(256, 3, 1, short(3))                       # width
    ifd += entry(257, 3, 1, short(2))                       # height
    ifd += entry(258, 3, 1, short(8))                       # bits
    ifd += entry(259, 3, 1, short(1))                       # no compression
    ifd += entry(262, 3, 1, short(1))                       # photometric
    ifd += entry(273, 4, 2, struct.pack(e + "I", arr0))     # strip offsets
    ifd += entry(277, 3, 1, short(1))                       # samples/px
    ifd += entry(278, 3, 1, short(1))                       # rows/strip
    ifd += entry(279, 4, 2, struct.pack(e + "I", arr1))     # byte counts
    ifd += entry(317, 3, 1, short(2))                       # predictor 2
    ifd += struct.pack(e + "I", 0)
    blob = (
        b"II" + struct.pack(e + "HI", 42, 8) + ifd
        + struct.pack(e + "II", data0, data1)
        + struct.pack(e + "II", 3, 3)
        + strip0 + strip1
    )
    w, h, ch, bd, out = tiff_decode(blob)
    assert (w, h, ch, bd) == (3, 2, 1, 8)
    assert out == bytes([10, 25, 45, 200, 190, 210])


def test_corrupt_inputs_raise_valueerror_only():
    good = tiff_encode(4, 4, _pixels(4, 4))
    bads = [
        b"",
        b"II",
        b"XX*\x00\x08\x00\x00\x00",          # bad byte order
        b"II\x2b\x00\x08\x00\x00\x00",       # BigTIFF magic
        good[:11],                            # truncated IFD
        good[:40],                            # truncated entries
        good[:-3],                            # truncated strip data
        # deflate strip replaced with garbage
        good[: len(good) - len(good) + 0],
    ]
    # corrupt a deflate strip in place: flip bytes in the tail
    corrupted = bytearray(tiff_encode(4, 4, _pixels(4, 4), compression="deflate"))
    corrupted[-5:] = b"\xff\xff\xff\xff\xff"
    bads.append(bytes(corrupted))
    # zero-count IFD entries: a count=0 ImageWidth (or BitsPerSample)
    # yields an empty value list — must be ValueError, never IndexError
    e = "<"
    (n,) = struct.unpack(e + "H", good[8:10])
    for target in (256, 258):
        zeroed = bytearray(good)
        for i in range(n):
            base = 10 + i * 12
            tag = struct.unpack(e + "H", zeroed[base : base + 2])[0]
            if tag == target:
                zeroed[base + 4 : base + 8] = struct.pack(e + "I", 0)
        bads.append(bytes(zeroed))
    for bad in bads:
        if not bad:
            with pytest.raises(ValueError):
                tiff_decode(bad)
            continue
        with pytest.raises(ValueError):
            tiff_decode(bad)


def test_unsupported_variants_raise():
    px = _pixels(4, 4)
    blob = bytearray(tiff_encode(4, 4, px, compression="none"))
    # patch Compression tag (259) value to JPEG (7): find the entry
    e = "<"
    (n,) = struct.unpack(e + "H", blob[8:10])
    for i in range(n):
        base = 10 + i * 12
        tag = struct.unpack(e + "H", blob[base : base + 2])[0]
        if tag == 259:
            blob[base + 8 : base + 10] = struct.pack(e + "H", 7)
    with pytest.raises(ValueError, match="compression"):
        tiff_decode(bytes(blob))
    with pytest.raises(ValueError):
        tiff_encode(4, 4, px, compression="jpeg")
    with pytest.raises(ValueError):
        tiff_encode(4, 4, px[:-1])  # buffer mismatch


def _pack9(codes):
    """Independent MSB-first bit packer (test-local, 9-bit only)."""
    acc, bits, out = 0, 0, bytearray()
    for c in codes:
        acc = (acc << 9) | c
        bits += 9
        while bits >= 8:
            bits -= 8
            out.append((acc >> bits) & 0xFF)
            acc &= (1 << bits) - 1
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    return bytes(out)


def test_lzw_hand_built_fixture():
    """Hand-derived TIFF-LZW stream for b'ABABABA': the code sequence
    [Clear, A, B, AB, ABA, EOI] where ABA is the KwKwK case (code ==
    table length at read time).  Packed by an independent test-local
    bit writer — pins both decoder semantics and the encoder's output
    byte-for-byte."""
    from ingest_pipeline_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    stream = _pack9([256, 65, 66, 258, 260, 257])
    assert _lzw_decode(stream) == b"ABABABA"
    assert _lzw_encode(b"ABABABA") == stream


def test_lzw_roundtrip_width_boundaries():
    """encode→decode identity across every code-width boundary
    (9→10→11→12 bits) and across a mid-stream table reset (Clear at
    next_code 4094) — the early-change off-by-one is exactly the bug
    class this sweep exists to catch."""
    import random

    from ingest_pipeline_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    rng = random.Random(1729)
    cases = [
        b"",
        b"\x00",
        b"\x07" * 4000,                      # highly compressible
        bytes(rng.randrange(256) for _ in range(600)),
        bytes(rng.randrange(256) for _ in range(2000)),   # crosses 511
        bytes(rng.randrange(256) for _ in range(5000)),   # crosses 1023
        bytes(rng.randrange(256) for _ in range(9000)),   # crosses 2047
        bytes(rng.randrange(256) for _ in range(20000)),  # mid-stream Clear
        bytes(rng.randrange(4) for _ in range(30000)),    # compressible long
    ]
    for data in cases:
        assert _lzw_decode(_lzw_encode(data)) == data, len(data)


def test_lzw_corrupt_streams_raise_valueerror():
    from ingest_pipeline_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    # no leading ClearCode: 9-bit code 65 first
    with pytest.raises(ValueError):
        _lzw_decode(_pack9([65, 257]))
    # first code after Clear must be a literal (< 256)
    with pytest.raises(ValueError):
        _lzw_decode(_pack9([256, 258, 257]))
    # code beyond the table
    with pytest.raises(ValueError):
        _lzw_decode(_pack9([256, 65, 300, 257]))
    # truncated stream decodes the intact prefix, never throws IndexError
    good = _lzw_encode(b"ABABABA")
    assert _lzw_decode(good[:2]) in (b"", b"A")


def test_lzw_tiff_variant_roundtrip_with_predictor():
    """Full-blob LZW TIFF roundtrip: multi-strip + Predictor 2 + both
    byte orders, against the same fixture generator as the other
    codec paths."""
    for bo in ("<", ">"):
        px = _pixels(9, 7)
        blob = tiff_encode(
            9, 7, px, compression="lzw", rows_per_strip=2,
            predictor=2, byte_order=bo,
        )
        w, h, ch, bd, out = tiff_decode(blob)
        assert (w, h, ch, bd) == (9, 7, 1, 8)
        assert out == px


def test_extractor_ifd_walk_agrees():
    """The metadata extractor's independent IFD walk must read the same
    dimensions from our encoder's output (two IFD readers, one format)."""
    blob = tiff_encode(6, 5, _pixels(6, 5), byte_order=">")
    tags = _tiff_ifd_tags(blob)
    assert tags[256] == 6 and tags[257] == 5 and tags[258] == 8


def test_deflate_strip_content_is_real_zlib():
    blob = tiff_encode(8, 3, _pixels(8, 3), compression="deflate",
                       rows_per_strip=100)
    # single strip: locate via decode path by re-walking with stdlib
    w, h, ch, bd, out = tiff_decode(blob)
    assert out == _pixels(8, 3)
    # the strip bytes must actually be zlib (not stored raw)
    assert zlib.decompress(blob[blob.index(b"x\x9c") :])


def test_spark_tiff_path_matches_png_path(spark):
    """Cross-codec equivalence: the same floor quantization through
    embeddings_to_tiff and embeddings_to_png must yield identical
    integer pixel stats per asset (both codecs lossless)."""
    emb = spark.createDataFrame(
        [(i, [((i * 13 + j * 7) % 200) / 100.0 - 1.0 for j in range(16)])
         for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    t = {
        r.asset_id: (r.width, r.height, r.px_sum, r.px_min, r.px_max)
        for r in decode_image_features(embeddings_to_tiff(emb, width=8))
        .filter("decode_ok").collect()
    }
    p = {
        r.asset_id: (r.width, r.height, r.px_sum, r.px_min, r.px_max)
        for r in decode_image_features(embeddings_to_png(emb, width=8))
        .filter("decode_ok").collect()
    }
    assert len(t) == 6 and t == p


def test_corrupt_media_degrades_to_error_rows(spark):
    rows = spark.createDataFrame(
        [(1, bytearray(tiff_encode(4, 2, bytes(range(8))))),
         (2, bytearray(b"II*\x00garbage")),
         (3, bytearray(b"MM\x00*")),
         (4, None)],
        "asset_id long, media binary",
    )
    out = {r.asset_id: r.decode_ok for r in
           decode_image_features(rows).collect()}
    assert out == {1: True, 2: False, 3: False, 4: False}


def test_lzw_decoder_fuzz_never_crashes():
    """Random byte strings fed to _lzw_decode must either decode to
    bytes or raise ValueError — never IndexError/KeyError/hang (the
    one-bad-file failure class, applied to the bit-level decoder)."""
    import random

    from ingest_pipeline_spark.operators.multimodal import _lzw_decode

    rng = random.Random(42)
    for trial in range(300):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 64)))
        try:
            out = _lzw_decode(blob)
            assert isinstance(out, bytes)
        except ValueError:
            pass


def test_new_extractors_degrade_on_corrupt_media(spark):
    """image_dhash_features / audio_zero_crossing_features /
    video_shot_cuts: one bad file yields an error row, never a failed
    distributed scan (the xlsx-reader ADVICE class, applied to every
    round-9 extractor)."""
    from ingest_pipeline_spark.operators.multimodal import (
        audio_zero_crossing_features,
        image_dhash_features,
        video_shot_cuts,
    )

    bad = spark.createDataFrame(
        [(1, bytearray(b"II*\x00garbage")), (2, bytearray(b"\x89PNG\r\n")),
         (3, bytearray(b"RIFFxxxx")), (4, bytearray(b"YUV4MPEG2 bogus")),
         (5, None), (6, bytearray(b""))],
        "asset_id long, media binary",
    )
    for fn in (image_dhash_features, audio_zero_crossing_features,
               video_shot_cuts):
        out = {r.asset_id: r.decode_ok for r in fn(bad).collect()}
        assert out == {i: False for i in range(1, 7)}, fn.__name__


def test_dhash_oversized_image_degrades_to_error_row(spark):
    """A 9x8 grayscale image packs (9-1)*8 = 64 difference bits — one
    past what an int64 dhash can hold.  The r9 ADVICE hazard: without
    the size guard the overflow surfaces at Arrow conversion as a
    non-ValueError that fails the whole distributed scan on one image.
    It must instead degrade to an error row, exactly like corrupt
    bytes; an 8x8 image (56 bits) beside it must still hash."""
    from ingest_pipeline_spark.operators.multimodal import (
        image_dhash_features,
        png_encode,
    )

    ok = png_encode(8, 8, 1, bytes((r * 8 + c) % 251 for r in range(8)
                                   for c in range(8)))
    big = png_encode(9, 8, 1, bytes((r * 9 + c) % 251 for r in range(8)
                                    for c in range(9)))
    assets = spark.createDataFrame(
        [(1, bytearray(ok)), (2, bytearray(big))],
        "asset_id long, media binary",
    )
    rows = {r.asset_id: r for r in image_dhash_features(assets).collect()}
    assert rows[1].decode_ok and rows[1].n_bits == 56
    assert rows[1].dhash is not None
    assert not rows[2].decode_ok and "63 bits" in rows[2].error
