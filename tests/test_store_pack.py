"""Store-packaging guards (operators/store_pack.py — the zarr_zipper
parity operator): zip-byte determinism, roundtrip fidelity, manifest
reference equality, and the registered query's oracle at sf0.001."""

import hashlib
import io
import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ingest_pipeline_spark.operators.store_pack import (  # noqa: E402
    pack_stores,
    store_manifest_md5,
    zip_store_bytes,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

MEMBERS = [
    ("c/00000002", b"beta"),
    ("c/00000000", b"alpha"),
    ("c/00000001", "h\xe9\xe9".encode()),
]


def test_zip_bytes_deterministic_and_order_free():
    a = zip_store_bytes(MEMBERS)
    b = zip_store_bytes(list(reversed(MEMBERS)))
    assert a == b  # member order and call count never move a byte
    assert zip_store_bytes(MEMBERS) == a


def test_zip_roundtrip_and_layout():
    blob = zip_store_bytes(MEMBERS)
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        assert zf.namelist() == sorted(p for p, _c in MEMBERS)
        for p, c in MEMBERS:
            assert zf.read(p) == c
        for zi in zf.infolist():
            assert zi.compress_type == zipfile.ZIP_STORED
            assert zi.date_time == (1980, 1, 1, 0, 0, 0)


def test_manifest_matches_hand_reference():
    want = hashlib.md5(
        "".join(
            f"{p}:{hashlib.md5(c).hexdigest()};"
            for p, c in sorted(MEMBERS)
        ).encode()
    ).hexdigest()
    assert store_manifest_md5(MEMBERS) == want
    assert store_manifest_md5(list(reversed(MEMBERS))) == want


def test_pack_stores_roundtrip_on_spark(spark):
    df = spark.createDataFrame(
        [("s1", p, c) for p, c in MEMBERS] + [("s2", "x", b"only")],
        "store string, path string, content binary",
    )
    rows = {r["store"]: r for r in pack_stores(df).collect()}
    assert set(rows) == {"s1", "s2"}
    r = rows["s1"]
    assert r["n_members"] == 3
    assert r["total_bytes"] == sum(len(c) for _p, c in MEMBERS)
    assert r["manifest_md5"] == store_manifest_md5(MEMBERS)
    assert r["roundtrip_ok"] is True
    assert bytes(r["zip_bytes"]) == zip_store_bytes(MEMBERS)
    assert rows["s2"]["n_members"] == 1 and rows["s2"]["roundtrip_ok"]


def test_query_oracle_green_and_gate(spark):
    from ingest_pipeline_spark.queries import oracle_sql, queries
    from tests.oracle_utils import compare_to_oracle

    qs, osql = queries(), oracle_sql()
    df = qs["store_zip_packaging"](spark, SF_DIR)
    rows = df.collect()
    assert rows, "no stores surveyed"
    for r in rows:
        # published stores are surveyed but never packaged (the
        # allow_published=False default); unpublished ones always are
        assert r["packaged"] == (not r["published"])
        if r["packaged"]:
            assert r["roundtrip_ok"] is True and r["manifest_md5"]
    compare_to_oracle(df, osql["store_zip_packaging"], SF_DIR)


def test_hypothesis_pack_roundtrip_property():
    """Random member sets (paths with unicode, empty contents, empty
    stores): zip bytes stay deterministic under input order and every
    member reads back exactly."""
    from hypothesis import given, settings, strategies as st

    path_st = st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",), blacklist_characters="\x00"
        ),
        min_size=1,
        max_size=20,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        members=st.dictionaries(
            path_st, st.binary(max_size=64), max_size=8
        ),
        seed=st.randoms(),
    )
    def prop(members, seed):
        items = list(members.items())
        shuffled = items[:]
        seed.shuffle(shuffled)
        a, b = zip_store_bytes(items), zip_store_bytes(shuffled)
        assert a == b
        with zipfile.ZipFile(io.BytesIO(a)) as zf:
            got = {n: zf.read(n) for n in zf.namelist()}
        assert got == dict(members)
        assert store_manifest_md5(items) == store_manifest_md5(shuffled)

    prop()
