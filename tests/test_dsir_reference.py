"""Pure-Python reference for corpus_dsir_selection.

Oracle hash parity cannot catch a wrong constant mirrored into the SQL
(the r5 HLL numerator-scale lesson): the 512-bucket width, the add-1
smoothing, the md5 bucket derivation, the 12-dp term rounding, and the
top-100 selection rule are all shared by both engines.  This unit
recomputes the DSIR log importance weights and the selection census
from the raw sf0.001 parquet with hashlib + math.log + Decimal and
requires bit-identical output.
"""

from __future__ import annotations

import hashlib
import math
import re
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _rnd(v: float, places: int) -> Decimal:
    # Spark ROUND(double, n): HALF_UP over the shortest decimal repr.
    return Decimal(repr(float(v))).quantize(Decimal(f"1e-{places}"), ROUND_HALF_UP)


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16) % 512


def test_dsir_selection_matches_reference(spark):
    t = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    ).to_pydict()

    db: dict[tuple[int, int], int] = {}
    meta: dict[int, tuple[str, str]] = {}
    c_r: dict[int, int] = {}
    c_t: dict[int, int] = {}
    for doc_id, text, lang, source in zip(
        t["doc_id"], t["text"], t["lang"], t["source"]
    ):
        meta[doc_id] = (source, lang)
        toks = [x for x in re.split(r"\s+", text.strip()) if x != ""]
        for tok in toks:
            b = _bucket(tok)
            db[(doc_id, b)] = db.get((doc_id, b), 0) + 1
            c_r[b] = c_r.get(b, 0) + 1
            if lang == "en":
                c_t[b] = c_t.get(b, 0) + 1
    n_r = sum(c_r.values())
    n_t = sum(c_t.values())

    lw: dict[int, Decimal] = {}
    for (doc_id, b), c in db.items():
        wgt = math.log((c_t.get(b, 0) + 1) / (n_t + 512)) - math.log(
            (c_r[b] + 1) / (n_r + 512)
        )
        lw[doc_id] = lw.get(doc_id, Decimal(0)) + _rnd(float(c) * wgt, 12)
    lw6 = {d: _rnd(float(v), 6) for d, v in lw.items()}

    sel = sorted(lw6, key=lambda d: (-lw6[d], d))[:100]
    expected: dict[str, list] = {}
    for d in lw6:
        src = meta[d][0]
        expected.setdefault(src, [0, 0, 0, Decimal(0)])
        expected[src][0] += 1
    for d in sel:
        src, lang = meta[d]
        expected[src][1] += 1
        if lang == "en":
            expected[src][2] += 1
        # Spark sums CAST(lw6 AS DECIMAL(18,6)) — exact decimal grid.
        expected[src][3] += lw6[d]

    from ingest_pipeline_spark import queries as q

    got = {
        r["source"]: (
            r["n_docs"],
            r["n_selected"],
            r["n_selected_en"],
            _rnd(r["sum_selected_logweight"], 6),
        )
        for r in q.corpus_dsir_selection(spark, SF).collect()
    }
    want = {
        src: (v[0], v[1], v[2], _rnd(float(v[3]), 6)) for src, v in expected.items()
    }
    assert got == want, (got, want)
