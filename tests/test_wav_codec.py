"""Pure-stdlib WAV codec units: golden header bytes, roundtrip,
defensive chunk-walk rejects — the audio sibling of test_png_codec."""

from __future__ import annotations

import struct

import pytest

from ingest_pipeline_spark.operators.multimodal import wav_decode, wav_encode


def test_wav_header_golden():
    """Hand-derived RIFF layout for a 2-sample clip (spec bytes, not
    encoder-decoder circularity)."""
    blob = wav_encode([1, -2], rate=8000)
    assert blob[:4] == b"RIFF"
    assert blob[8:12] == b"WAVE"
    assert blob[12:16] == b"fmt "
    assert struct.unpack("<I", blob[16:20])[0] == 16
    fmt = struct.unpack("<HHIIHH", blob[20:36])
    assert fmt == (1, 1, 8000, 16000, 2, 16)
    assert blob[36:40] == b"data"
    assert struct.unpack("<I", blob[40:44])[0] == 4
    assert blob[44:48] == struct.pack("<hh", 1, -2)
    assert struct.unpack("<I", blob[4:8])[0] == len(blob) - 8


def test_wav_roundtrip_extremes():
    samples = [0, 1, -1, 32767, -32768, 12345, -12345]
    ch, rate, bits, got = wav_decode(wav_encode(samples, rate=44100))
    assert (ch, rate, bits) == (1, 44100, 16)
    assert got == samples


def test_wav_decode_rejects():
    good = wav_encode([5, 6, 7])
    with pytest.raises(ValueError, match="not a RIFF"):
        wav_decode(b"OggS" + good[4:])
    with pytest.raises(ValueError, match="truncated RIFF"):
        wav_decode(good[:-2])
    # non-PCM format code
    bad_fmt = bytearray(good)
    bad_fmt[20] = 3  # IEEE float
    with pytest.raises(ValueError, match="unsupported PCM"):
        wav_decode(bytes(bad_fmt))
    # fmt chunk missing entirely (RIFF size re-patched so the
    # truncation check doesn't fire first)
    no_fmt = good[:12] + good[36:]
    no_fmt = no_fmt[:4] + struct.pack("<I", len(no_fmt) - 8) + no_fmt[8:]
    with pytest.raises(ValueError, match="missing fmt"):
        wav_decode(no_fmt)


def test_wav_odd_chunk_alignment():
    """A word-aligned odd-size junk chunk before fmt must be skipped."""
    good = wav_encode([9, -9])
    junk = b"JUNK" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    blob = good[:12] + junk + good[12:]
    blob = blob[:4] + struct.pack("<I", len(blob) - 8) + blob[8:]
    ch, rate, bits, got = wav_decode(blob)
    assert got == [9, -9]
