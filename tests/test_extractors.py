"""Per-format metadata extractor battery (S9/F1) unit tests.

Parsers are tested directly on bytes (no Spark) plus one end-to-end
mapInPandas pass over the committed fixtures; corrupt inputs must
yield error rows, never task failures.
"""

import gzip
import json
import os
import struct

import pytest

from ingest_pipeline_spark.operators.extractors import (
    categorize,
    extract_format_metadata,
    extract_one,
    parse_fastq,
    parse_imzml,
    parse_mtx_tform,
    parse_ome_tiff,
    parse_scn_tiff,
    parse_txt_tform,
    parse_txt_wordlist,
)

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "formats")


def _read(name):
    with open(os.path.join(FIXTURES, name), "rb") as f:
        return f.read()


def test_categorize_dispatch():
    assert categorize("a/b/slide.ome.tiff") == "OME_TIFF"
    assert categorize("x.OME.TIF") == "OME_TIFF"
    assert categorize("r1.fastq") == "FASTQ"
    assert categorize("r1.fastq.gz") == "FASTQ"
    assert categorize("sample.imzML") == "imzML"
    assert categorize("t.mtx.txt") == "MtxTform"
    assert categorize("elastix.txt") == "TxtTform"
    assert categorize("warp_tform_0.txt") == "TxtTform"
    assert categorize("scan.czi") == "CZI"
    assert categorize("img.png") == "image"
    assert categorize("slide2.scn") == "Scn_TIFF"
    assert categorize("codes_wordlist.txt") == "TxtWordList"
    assert categorize("my_wordlist_v2.txt") == "TxtWordList"
    assert categorize("notes.md") == "unknown"


def test_scn_tiff_parse():
    meta = parse_scn_tiff(_read("slide2.scn"))
    assert meta["ImageWidth"] == 6 and meta["ImageLength"] == 4
    assert meta["CollectionSizeX"] == 300 and meta["CollectionSizeY"] == 200
    assert meta["n_images"] == 2
    assert meta["SizeX"] == 6 and meta["SizeY"] == 4
    # an OME-TIFF is a TIFF but not an SCN: must refuse, not mislabel
    with pytest.raises(ValueError, match="no scn XML"):
        parse_scn_tiff(_read("slide1.ome.tiff"))


def test_txt_wordlist_parse():
    meta = parse_txt_wordlist(_read("codes_wordlist.txt"))
    assert meta["words"] == ["alpha", "beta", "gamma", "delta", "epsilon"]
    assert meta["n_words"] == 5


def test_ome_tiff_parse():
    meta = parse_ome_tiff(_read("slide1.ome.tiff"))
    assert meta["ImageWidth"] == 6 and meta["ImageLength"] == 4
    assert meta["SizeX"] == 6 and meta["SizeY"] == 4 and meta["SizeC"] == 2
    assert meta["PhysicalSizeX"] == 0.65
    assert meta["Channels"] == ["DAPI", "CD4"]
    assert meta["Type"] == "uint8"


def test_tiff_big_endian():
    # same IFD structure, MM byte order, no OME block
    header = struct.pack(">2sHI", b"MM", 42, 8)
    entries = struct.pack(">HHII", 256, 3, 1, 7 << 16) + struct.pack(
        ">HHII", 257, 3, 1, 5 << 16
    )
    ifd = struct.pack(">H", 2) + entries + struct.pack(">I", 0)
    meta = parse_ome_tiff(header + ifd)
    assert meta["ImageWidth"] == 7 and meta["ImageLength"] == 5


def test_fastq_plain_and_gz():
    raw = b"@r1\nACGT\n+\nIIII\n@r2\nACGTAC\n+\nIIIIII\n"
    for data in (raw, gzip.compress(raw)):
        meta = parse_fastq(data)
        assert meta["n_reads"] == 2
        assert meta["read_len_min"] == 4 and meta["read_len_max"] == 6
        assert meta["read_len_mean"] == 5.0
        assert meta["quality_lengths_ok"] is True


def test_fastq_bad_separator_raises():
    with pytest.raises(ValueError, match="separator"):
        parse_fastq(b"@r1\nACGT\nXIII\nIIII\n")


def test_imzml_parse():
    meta = parse_imzml(_read("sample.imzML"))
    assert meta["max count of pixels x"] == 3
    assert meta["max count of pixels y"] == 2
    assert meta["pixel size x"] == 100.0
    assert meta["spectrum count"] == 6


def test_mtx_tform_shape_enforced():
    meta = parse_mtx_tform(_read("tform.mtx.txt"))
    assert len(meta["Transform"]) == 4
    assert meta["Transform"][0][3] == 12.5
    with pytest.raises(ValueError, match="4x4"):
        parse_mtx_tform(b"1 0\n0 1\n")
    with pytest.raises(ValueError, match="unexpected transform line"):
        parse_mtx_tform(b"a b c d\n" * 4)


def test_txt_tform_typed_values():
    meta = parse_txt_tform(_read("elastix.txt"))
    assert meta["Transform"] == "AffineTransform"
    assert meta["NumberOfParameters"] == 12
    assert meta["UseDirectionCosines"] is True
    assert meta["TransformParameters"][9:] == [0.5, -0.5, 2.0]


def test_corrupt_file_becomes_error_row_not_crash():
    r = extract_one("broken.ome.tiff", b"\x00\x01not a tiff")
    assert r["category"] == "OME_TIFF"
    assert "error" in r["meta"]
    r2 = extract_one("truncated.czi", b"ZISRAW")
    assert r2["meta"]["error"].startswith("not a CZI")
    r3 = extract_one("short.czi", b"ZISRAWFILE" + b"\x00" * 22)
    assert r3["meta"]["error"] == "not a CZI: truncated file header"


def test_czi_segment_walk():
    from ingest_pipeline_spark.operators.extractors import parse_czi

    meta = parse_czi(_read("scan.czi"))
    assert meta["SizeX"] == 6
    assert meta["SizeY"] == 4
    assert meta["SizeC"] == 2
    assert meta["PixelType"] == "Gray16"
    assert meta["Channels"] == ["DAPI", "CD4"]
    # metadata pointer outside the file -> explicit error
    bad = bytearray(_read("scan.czi"))
    struct.pack_into("<q", bad, 92, 10_000_000)
    with pytest.raises(ValueError, match="bad metadata position"):
        parse_czi(bytes(bad))
    # clobbered segment id -> explicit error
    bad2 = bytearray(_read("scan.czi"))
    bad2[544:548] = b"XXXX"
    with pytest.raises(ValueError, match="bad metadata segment id"):
        parse_czi(bytes(bad2))


def test_extract_battery_end_to_end(spark):
    files = spark.read.format("binaryFile").load(FIXTURES)
    rows = {r.file_name: r for r in extract_format_metadata(files).collect()}
    assert rows["slide1.ome.tiff"].width == 6
    assert rows["slide1.ome.tiff"].height == 4
    assert rows["reads.fastq.gz"].n_items == 3
    assert rows["sample.imzML"].width == 3
    ome = json.loads(rows["slide1.ome.tiff"].meta_json)
    assert ome["Channels"] == ["DAPI", "CD4"]
    assert rows["scan.czi"].width == 6
    assert json.loads(rows["scan.czi"].meta_json)["Channels"] == ["DAPI", "CD4"]
