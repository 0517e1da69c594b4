"""Chunk-store packaging — the reference's zarr_zipper tool re-expressed
as a distributed group-and-package operator.

Reference: misc/tools/zarr_zipper.py — walks candidate zarr stores,
parses the owning entity uuid from the path, gates on the entity's
published status (published stores are NOT zipped unless explicitly
allowed), then zips each store directory in place.  Here the same flow
is Spark-first: the member-file relation is grouped by store, each
store's members are assembled into ONE deterministic STORED zip on the
executor that owns the group (work per store is local, stores pack in
parallel across the cluster), the publish gate is a relational filter
against the entity dimension, and every produced archive is read BACK
and re-hashed in the same task (the decode_ok discipline) so a
packaging bug surfaces as an audit column, not a corrupt artifact.

Scale: one hash-partitioned groupBy on store id; per-store memory is
bounded by the store's own size (the reference zips a whole store on
one node too — same bound, now parallel across stores).  Zip bytes are
deterministic (fixed DOS timestamp, sorted member order, STORED — no
compressor version drift), so re-runs are idempotent byte-for-byte.
"""

from __future__ import annotations

import hashlib
import io
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# fixed DOS timestamp (1980-01-01) — zipfile's minimum; keeps archives
# byte-identical across runs/machines
_ZIP_EPOCH = (1980, 1, 1, 0, 0, 0)


def zip_store_bytes(members: "list[tuple[str, bytes]]") -> bytes:
    """One deterministic STORED zip from (path, content) members:
    members sorted by path, fixed timestamp, no compression (zarr
    chunks are already compressed — mirrors common zarr-zip practice
    and keeps the bytes a pure function of the inputs)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for path, content in sorted(members, key=lambda m: m[0]):
            zi = zipfile.ZipInfo(path, date_time=_ZIP_EPOCH)
            zi.external_attr = 0o644 << 16
            zf.writestr(zi, content)
    return buf.getvalue()


def store_manifest_md5(members: "list[tuple[str, bytes]]") -> str:
    """Order-free store fingerprint: md5 over the path-sorted
    concatenation of '<path>:<md5(content)>;' entries — relational on
    purpose (the SQL oracle reproduces it with STRING_AGG ORDER BY)."""
    parts = [
        f"{path}:{hashlib.md5(content).hexdigest()};"
        for path, content in sorted(members, key=lambda m: m[0])
    ]
    return hashlib.md5("".join(parts).encode()).hexdigest()


def pack_stores(
    files: DataFrame,
    store_col: str = "store",
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """Group member files by store and package each store as one
    deterministic zip.  Returns (store, n_members, total_bytes,
    manifest_md5, zip_bytes, roundtrip_ok): roundtrip_ok re-opens the
    just-built archive IN THE SAME TASK and re-derives member count +
    manifest from the unzipped contents — the packaging analog of the
    codec batteries' decode_ok."""
    sel = files.select(
        F.col(store_col).alias("store"),
        F.col(path_col).alias("path"),
        F.col(content_col).alias("content"),
    )

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        members = [
            (str(p), bytes(c) if c is not None else b"")
            for p, c in zip(pdf["path"], pdf["content"])
        ]
        blob = zip_store_bytes(members)
        manifest = store_manifest_md5(members)
        ok = False
        try:
            with zipfile.ZipFile(io.BytesIO(blob)) as zf:
                back = [(n, zf.read(n)) for n in zf.namelist()]
            ok = (
                len(back) == len(members)
                and store_manifest_md5(back) == manifest
            )
        except zipfile.BadZipFile:
            ok = False
        return pd.DataFrame(
            {
                "store": [key[0]],
                "n_members": [len(members)],
                "total_bytes": [sum(len(c) for _p, c in members)],
                "manifest_md5": [manifest],
                "zip_bytes": [blob],
                "roundtrip_ok": [ok],
            }
        )

    return sel.groupBy("store").applyInPandas(
        pack,
        "store string, n_members long, total_bytes long, "
        "manifest_md5 string, zip_bytes binary, roundtrip_ok boolean",
    )
