"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference's imaging-format probes (SURVEY §2.1 S9 — OME-TIFF, CZI,
imzML, FASTQ extractors under md/data_file_types/) are
recognize-and-extract operators over binary files.  The engine models a
multimodal corpus as:

    (asset_id, modality, media BINARY, meta STRUCT<mime, width, height,
     sample_rate, duration_s, n_frames>)

Spark-side plumbing (schema, partitioning, Arrow batch shape) is real
and tested; the actual codec work (image decode, resample, frame
sampling) is stubbed — the decode libraries are not in this container —
behind ``decode_stub_features``: a deterministic byte-level fake whose
signature/batching matches what a real Pandas-UDF decoder would use.
The format METADATA path is NOT stubbed: operators/extractors.py
parses OME-TIFF/imzML/FASTQ/transform files for real.

Scale notes: media bytes ride a BinaryType column (parquet splits by
row group; at 100 TB use `spark.sql.files.maxPartitionBytes` to bound
task input), metadata extraction runs in mapInPandas so each Arrow
batch amortizes Python crossing; per-format dispatch is a rules-table
CASE on magic bytes, not N passes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "mime string, width int, height int, sample_rate int, "
    "duration_s double, n_frames int"
)

ASSET_SCHEMA = f"asset_id long, modality string, media binary, meta struct<{META_SCHEMA}>"

# magic-byte sniffing rules (first-match, §2.2 P10 shape)
MAGIC_RULES: list[tuple[bytes, str]] = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"II*\x00", "image/tiff"),
    (b"MM\x00*", "image/tiff"),
    (b"RIFF", "audio/wav"),
    (b"\x1a\x45\xdf\xa3", "video/webm"),
]


def sniff_mime(col: Column) -> Column:
    """Magic-byte MIME classifier as a chained CASE over the binary col."""
    expr = F.lit("application/octet-stream")
    for magic, mime in reversed(MAGIC_RULES):
        hexs = magic.hex()
        expr = F.when(
            F.lower(F.hex(F.substring(col, 1, len(magic)))) == hexs, F.lit(mime)
        ).otherwise(expr)
    return expr


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Adapter: treat the documents table's text as opaque media bytes.

    Lets the multimodal plumbing run against the synthetic corpus —
    the binary column is real (utf-8 encoded), only the decoder is fake.
    """
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text").alias("modality"),
        F.encode(F.col("text"), "utf-8").alias("media"),
        F.named_struct(
            F.lit("mime"), F.lit("text/plain"),
            F.lit("width"), F.lit(None).cast("int"),
            F.lit("height"), F.lit(None).cast("int"),
            F.lit("sample_rate"), F.lit(None).cast("int"),
            F.lit("duration_s"), F.lit(None).cast("double"),
            F.lit("n_frames"), F.lit(None).cast("int"),
        ).alias("meta"),
    )


def decode_media(assets: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """Real decoder entry point — NOT IMPLEMENTED in this container.

    A production build plugs Pillow/librosa/pyav into the same
    mapInPandas harness used by decode_stub_features below.
    """
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use decode_stub_features for the plumbing-equivalent path"
    )


def decode_stub_features(assets: DataFrame, feat_dim: int = 4) -> DataFrame:
    """Deterministic fake feature extractor with real Spark plumbing.

    mapInPandas over Arrow batches; per asset emits byte_len plus a
    ``feat_dim``-long feature vector derived from byte content (sum of
    every d-th byte mod 997) — deterministic, order-independent,
    vectorizable, and shaped exactly like a real embedding UDF
    (binary in → array<double> out).
    """
    out_schema = f"asset_id long, modality string, byte_len long, features array<double>"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            lens = []
            for buf in pdf["media"]:
                b = bytes(buf) if buf is not None else b""
                lens.append(len(b))
                feats.append(
                    [float(sum(b[d::feat_dim]) % 997) for d in range(feat_dim)]
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "byte_len": lens,
                    "features": feats,
                }
            )

    return assets.mapInPandas(extract, out_schema)


def frame_sample_plan(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing: explode a frame index per video asset.

    Decode is stubbed (n_frames from metadata, not the codec); the
    explode/partitioning shape is the real one: one output row per
    sampled frame, repartitionable by (asset_id) for downstream decode.
    """
    n = F.coalesce(F.col("meta.n_frames"), F.lit(0))
    idx = F.sequence(F.lit(0), n - 1, F.lit(every_n))
    return (
        assets.filter(F.col("modality") == "video")
        .withColumn("frame_idx", F.explode(F.when(n > 0, idx).otherwise(F.array())))
        .select("asset_id", "frame_idx")
    )


def tile_plan(
    assets: DataFrame, tile: int = 256, overlap: int = 32
) -> DataFrame:
    """Image-tiling plumbing: explode a spatial tile grid per image.

    The spatial analog of frame_sample_plan — one output row per
    (asset, tile) with pixel-box coordinates, stride = tile - overlap,
    edge tiles clamped to the image bounds.  Decode stays stubbed
    (width/height from metadata, not the codec); the grid expansion is
    the real distributed shape: pure per-row explode, no shuffle,
    repartitionable by asset_id for downstream decode workers.
    """
    if overlap >= tile or tile <= 0 or overlap < 0:
        raise ValueError(
            f"tile_plan needs 0 <= overlap < tile (got tile={tile}, "
            f"overlap={overlap}); stride would be <= 0"
        )
    stride = tile - overlap
    w = F.coalesce(F.col("meta.width"), F.lit(0))
    h = F.coalesce(F.col("meta.height"), F.lit(0))

    def starts(extent):
        n = F.when(
            extent <= tile, F.lit(1)
        ).otherwise(
            F.ceil((extent - tile).cast("double") / stride).cast("int") + 1
        )
        return F.transform(
            F.sequence(F.lit(0), n - 1), lambda i: i * stride
        )

    tiles = (
        assets.filter((F.col("modality") == "image") & (w > 0) & (h > 0))
        .withColumn("x0", F.explode(starts(w)))
        .withColumn("y0", F.explode(starts(h)))
    )
    return tiles.select(
        "asset_id",
        "x0",
        "y0",
        F.least(F.lit(tile), w - F.col("x0")).alias("tile_w"),
        F.least(F.lit(tile), h - F.col("y0")).alias("tile_h"),
    )


def audio_window_plan(
    assets: DataFrame, window_ms: int = 1000, hop_ms: int = 500
) -> DataFrame:
    """Audio-windowing plumbing: explode fixed-length analysis windows
    per audio asset — the temporal analog of tile_plan (images) and
    frame_sample_plan (video).  Decode stays stubbed (duration_ms from
    metadata, not the codec); the window grid is the real distributed
    shape: per-row explode, no shuffle, repartitionable by asset_id
    for downstream decode workers.  Short clips yield one clamped
    window; the final window is clamped to the clip end.
    """
    if hop_ms <= 0 or window_ms <= 0:
        raise ValueError(
            f"audio_window_plan needs positive window/hop (got "
            f"window_ms={window_ms}, hop_ms={hop_ms})"
        )
    dur = (
        F.coalesce(F.col("meta.duration_s"), F.lit(0.0)) * 1000
    ).cast("long")
    n = F.when(dur <= window_ms, F.lit(1)).otherwise(
        F.ceil((dur - window_ms).cast("double") / hop_ms).cast("int") + 1
    )
    starts = F.transform(F.sequence(F.lit(0), n - 1), lambda i: i * hop_ms)
    return (
        assets.filter((F.col("modality") == "audio") & (dur > 0))
        .withColumn("t0_ms", F.explode(starts))
        # hop_ms > window_ms is legal (sparse sampling), but the ceil
        # grid can then land a start exactly at/after the clip end —
        # drop those zero-length windows instead of emitting win_ms=0
        .filter(F.col("t0_ms") < dur)
        .select(
            "asset_id",
            "t0_ms",
            (F.least(F.lit(window_ms), dur - F.col("t0_ms"))).alias("win_ms"),
        )
    )
