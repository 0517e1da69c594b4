"""Generate the committed binary format fixtures under formats/.

Deterministic, stdlib-only. Run from the repo root:

    python tests/fixtures/make_format_fixtures.py

The fixtures model the file formats the reference's extractor battery
parses (reference md/data_file_types/*.py): a minimal OME-TIFF, an
imzML header, a gzipped FASTQ, MTX/TXT geometric transforms, plus a
CZI-magic file and a PNG for sniff-only coverage.  The expected
metadata for each fixture is pinned in the `multimodal_extract_features`
oracle (a VALUES golden table) and in tests/test_extractors.py.
"""

from __future__ import annotations

import gzip
import os
import struct

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "formats")

OME_XML = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
    '<Image ID="Image:0" Name="fixture">'
    '<Pixels ID="Pixels:0" DimensionOrder="XYCZT" Type="uint8" '
    'SizeX="6" SizeY="4" SizeC="2" SizeZ="1" SizeT="1" '
    'PhysicalSizeX="0.65" PhysicalSizeY="0.65">'
    '<Channel ID="Channel:0:0" Name="DAPI"/>'
    '<Channel ID="Channel:0:1" Name="CD4"/>'
    "</Pixels></Image></OME>"
)


SCN_XML = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<scn xmlns="http://www.leica-microsystems.com/scn/2010/10/01">'
    '<collection sizeX="300" sizeY="200">'
    '<image name="main"><pixels sizeX="6" sizeY="4"/></image>'
    '<image name="macro"><pixels sizeX="3" sizeY="2"/></image>'
    "</collection></scn>"
)

WORDLIST = "alpha beta gamma\ndelta epsilon\n"

CZI_XML = (
    "<ImageDocument><Metadata><Information><Image>"
    "<SizeX>6</SizeX><SizeY>4</SizeY><SizeC>2</SizeC><SizeZ>1</SizeZ>"
    "<PixelType>Gray16</PixelType>"
    "<Dimensions><Channels>"
    '<Channel Id="Channel:0" Name="DAPI"/>'
    '<Channel Id="Channel:1" Name="CD4"/>'
    "</Channels></Dimensions>"
    "</Image></Information></Metadata></ImageDocument>"
)


def write_czi(path: str) -> None:
    """Minimal valid CZI: ZISRAWFILE header segment pointing at a
    ZISRAWMETADATA segment whose payload embeds the metadata XML
    (public Zeiss segment layout: 16-byte ASCII id + int64
    allocated/used sizes, then the payload)."""
    xml = CZI_XML.encode()
    meta_payload = struct.pack("<ii", len(xml), 0) + b"\x00" * 248 + xml
    meta_seg = (
        b"ZISRAWMETADATA".ljust(16, b"\x00")
        + struct.pack("<qq", len(meta_payload), len(meta_payload))
        + meta_payload
    )
    hdr_payload = bytearray(512)
    struct.pack_into("<ii", hdr_payload, 0, 1, 0)  # major/minor version
    struct.pack_into("<q", hdr_payload, 60, 32 + 512)  # MetadataPosition
    hdr_seg = (
        b"ZISRAWFILE".ljust(16, b"\x00")
        + struct.pack("<qq", 512, 512)
        + bytes(hdr_payload)
    )
    with open(path, "wb") as f:
        f.write(hdr_seg + meta_seg)


def write_tiff(path: str, description: str) -> None:
    """Minimal valid little-endian TIFF: one IFD, XML in tag 270."""
    width, height = 6, 4
    pixels = bytes(range(width * height))  # one strip, 8-bit gray
    desc = description.encode()

    header = struct.pack("<2sHI", b"II", 42, 8)  # IFD at offset 8
    entries = []

    def entry(tag, typ, count, value):
        entries.append(struct.pack("<HHII", tag, typ, count, value))

    n_entries = 8
    ifd_size = 2 + n_entries * 12 + 4
    desc_off = 8 + ifd_size
    strip_off = desc_off + len(desc)

    entry(256, 3, 1, width)        # ImageWidth SHORT
    entry(257, 3, 1, height)       # ImageLength SHORT
    entry(258, 3, 1, 8)            # BitsPerSample
    entry(262, 3, 1, 1)            # PhotometricInterpretation BlackIsZero
    entry(270, 2, len(desc), desc_off)   # ImageDescription = OME-XML
    entry(273, 4, 1, strip_off)    # StripOffsets
    entry(278, 3, 1, height)       # RowsPerStrip
    entry(279, 4, 1, len(pixels))  # StripByteCounts

    ifd = struct.pack("<H", n_entries) + b"".join(entries) + struct.pack("<I", 0)
    with open(path, "wb") as f:
        f.write(header + ifd + desc + pixels)


IMZML = """<?xml version="1.0" encoding="ISO-8859-1"?>
<mzML xmlns="http://psi.hupo.org/ms/mzml" version="1.1">
  <scanSettingsList count="1">
    <scanSettings id="scansettings1">
      <cvParam cvRef="IMS" accession="IMS:1000042" name="max count of pixels x" value="3"/>
      <cvParam cvRef="IMS" accession="IMS:1000043" name="max count of pixels y" value="2"/>
      <cvParam cvRef="IMS" accession="IMS:1000044" name="max dimension x" value="300" unitName="micrometer"/>
      <cvParam cvRef="IMS" accession="IMS:1000045" name="max dimension y" value="200" unitName="micrometer"/>
      <cvParam cvRef="IMS" accession="IMS:1000046" name="pixel size x" value="100.0" unitName="micrometer"/>
      <cvParam cvRef="IMS" accession="IMS:1000047" name="pixel size y" value="100.0" unitName="micrometer"/>
    </scanSettings>
  </scanSettingsList>
  <run id="run1" defaultSourceFileRef="sf1">
    <spectrumList count="6" defaultDataProcessingRef="dp1"/>
  </run>
</mzML>
"""

FASTQ = b"""@SEQ_ID.1 run=fixture
GATTTGGGGTTCAAAGCAGT
+
IIIIIIIIIIIIIIIIIIII
@SEQ_ID.2 run=fixture
ACGTACGTACGTACGT
+
IIIIIIIIIIIIIIII
@SEQ_ID.3 run=fixture
TTTTGGGGCCCCAAAATTTTGGGG
+
IIIIIIIIIIIIIIIIIIIIIIII
"""

MTX_TFORM = """0.999 -0.013 0.0 12.5
0.013 0.999 0.0 -3.25
0.0 0.0 1.0 0.0
0.0 0.0 0.0 1.0
"""

TXT_TFORM = """(Transform "AffineTransform")
(NumberOfParameters 12)
(TransformParameters 1.0 0.0 0.0 0.0 1.0 0.0 0.0 0.0 1.0 0.5 -0.5 2.0)
(FixedImageDimension 3)
(UseDirectionCosines "true")
"""

PNG = bytes.fromhex(
    "89504e470d0a1a0a0000000d49484452000000010000000108060000001f15c489"
    "0000000d49444154789c626001000000ffff03000006000557bfabd40000000049454e44ae426082"
)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    write_tiff(os.path.join(OUT, "slide1.ome.tiff"), OME_XML)
    write_tiff(os.path.join(OUT, "slide2.scn"), SCN_XML)
    with open(os.path.join(OUT, "codes_wordlist.txt"), "w") as f:
        f.write(WORDLIST)
    with open(os.path.join(OUT, "sample.imzML"), "w") as f:
        f.write(IMZML)
    # mtime=0 + empty filename keep the gzip bytes fully deterministic
    with open(os.path.join(OUT, "reads.fastq.gz"), "wb") as raw:
        with gzip.GzipFile(fileobj=raw, mode="wb", filename="", mtime=0) as gz:
            gz.write(FASTQ)
    with open(os.path.join(OUT, "tform.mtx.txt"), "w") as f:
        f.write(MTX_TFORM)
    with open(os.path.join(OUT, "elastix.txt"), "w") as f:
        f.write(TXT_TFORM)
    write_czi(os.path.join(OUT, "scan.czi"))
    # corrupt input: the battery must emit an error ROW for it (oracle
    # pins the exact error metadata), never fail the task
    with open(os.path.join(OUT, "broken.ome.tiff"), "wb") as f:
        f.write(b"\x00\x01not a tiff at all")
    with open(os.path.join(OUT, "thumb.png"), "wb") as f:
        f.write(PNG)
    for fn in sorted(os.listdir(OUT)):
        print(fn, os.path.getsize(os.path.join(OUT, fn)))


if __name__ == "__main__":
    main()
