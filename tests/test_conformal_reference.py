"""Pure-Python reference for stats_conformal_interval.

The ceil(0.9(n+1)) position formula, the cents x n_train residual
scaling, and the md5 split thresholds are mirrored into the oracle —
a shared wrong constant would stay green (the HLL lesson).  Recompute
the Mondrian split-conformal audit from raw sf0.001 parquet with
hashlib + integers and require identical rows; also assert the
conformal coverage guarantee holds on the calibration set by
construction.
"""

from __future__ import annotations

import hashlib
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _unit(key: int) -> float:
    return int(hashlib.md5(f"cp:{key}".encode()).hexdigest()[:8], 16) / 2**32


def _cents(price: float) -> int:
    d = Decimal(repr(float(price))).quantize(Decimal("1e-2"), ROUND_HALF_UP)
    return int(d * 100)


def test_conformal_interval_matches_reference(spark):
    t = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    ).to_pydict()
    parts: dict[str, dict[str, list]] = {}
    for k, g, p in zip(t["o_orderkey"], t["o_orderpriority"], t["o_totalprice"]):
        u = _unit(k)
        part = "train" if u < 0.5 else ("cal" if u < 0.75 else "test")
        parts.setdefault(g, {"train": [], "cal": [], "test": []})[part].append(
            (k, _cents(p))
        )

    expected = {}
    for g, d in parts.items():
        n_train = len(d["train"])
        s = sum(c for _, c in d["train"])
        cal = sorted(
            (abs(c * n_train - s), k) for k, c in d["cal"]
        )
        n_cal = len(cal)
        pos = (9 * (n_cal + 1) + 9) // 10
        if pos > n_cal:
            continue  # group too small for a finite q-hat (not hit at sf0.001)
        q_num = cal[pos - 1][0]
        n_test = len(d["test"])
        n_cov = sum(1 for _, c in d["test"] if abs(c * n_train - s) <= q_num)
        cov = float(
            Decimal(repr(n_cov / n_test)).quantize(Decimal("1e-6"), ROUND_HALF_UP)
        )
        expected[g] = (n_train, n_cal, n_test, q_num, n_train, n_cov, cov)
        # split-conformal guarantee on the calibration set: at least
        # ceil(0.9(n+1)) of n_cal residuals are <= q-hat by construction
        assert sum(1 for r, _ in cal if r <= q_num) >= pos

    from ingest_pipeline_spark import queries as q

    got = {
        r["priority"]: (
            r["n_train"], r["n_cal"], r["n_test"], r["q_num_cents_scaled"],
            r["q_den"], r["n_covered"], r["coverage"],
        )
        for r in q.stats_conformal_interval(spark, SF).collect()
    }
    assert got == expected, (got, expected)
