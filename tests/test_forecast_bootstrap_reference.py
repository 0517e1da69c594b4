"""Pure-Python reference implementations for forecast_ewma_daily and
stats_bootstrap_ci (the mirrored-constant guard: oracle parity cannot
catch a wrong constant copied into BOTH the Spark code and the SQL, so
every estimator gets an independent scalar re-derivation from the raw
parquet).  Tolerances are loose enough to absorb decimal-vs-float
accumulation differences (<1e-9) and tight enough to catch any wrong
weight, window, normalization, or percentile position.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pyarrow.parquet as pq

from ingest_pipeline_spark.queries import queries

SF = "/root/testdata/sf0.001"


def _daily_revenue() -> list[float]:
    t = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"])
    byday: dict[dt.date, float] = {}
    for ts, v in zip(
        t.column("o_orderdate").to_pylist(), t.column("o_totalprice").to_pylist()
    ):
        d = ts.date() if hasattr(ts, "date") else ts
        byday[d] = byday.get(d, 0.0) + float(v)
    return [byday[d] for d in sorted(byday)]


def _daily_counts_by_nation() -> dict[str, list[int]]:
    orders = pq.read_table(f"{SF}/orders.parquet", columns=["o_custkey", "o_orderdate"])
    cust = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(f"{SF}/nation.parquet", columns=["n_nationkey", "n_name"])
    c2n = dict(zip(cust.column("c_custkey").to_pylist(), cust.column("c_nationkey").to_pylist()))
    n2name = dict(zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist()))
    series: dict[str, dict[dt.date, int]] = {}
    for ck, ts in zip(orders.column("o_custkey").to_pylist(), orders.column("o_orderdate").to_pylist()):
        name = n2name[c2n[ck]]
        d = ts.date() if hasattr(ts, "date") else ts
        series.setdefault(name, {})[d] = series.setdefault(name, {}).get(d, 0) + 1
    dense: dict[str, list[int]] = {}
    for name, byday in series.items():
        days = sorted(byday)
        lo, hi = days[0], days[-1]
        dense[name] = [byday.get(lo + dt.timedelta(days=i), 0) for i in range((hi - lo).days + 1)]
    return dense


def test_ewma_matches_reference(spark):
    got = {
        r.nation: r
        for r in queries()["forecast_ewma_daily"](spark, SF).collect()
    }
    dense = _daily_counts_by_nation()
    assert set(got) == set(dense)
    norm = 1.0 - 1.0 / (1 << 30)
    for nation, xs in dense.items():
        errs_e, errs_n = [], []
        for t in range(29, len(xs) - 1):
            level = sum(xs[t - i] * (1.0 / (1 << (i + 1))) for i in range(30)) / norm
            level = round(level, 6)
            errs_e.append(abs(xs[t + 1] - level))
            errs_n.append(abs(xs[t + 1] - xs[t]))
        r = got[nation]
        assert r.n_eval == len(errs_e), nation
        assert abs(r.mae_ewma - sum(errs_e) / len(errs_e)) < 1e-5, nation
        assert abs(r.mae_naive - sum(errs_n) / len(errs_n)) < 1e-5, nation
        rmse = math.sqrt(sum(e * e for e in errs_e) / len(errs_e))
        assert abs(r.rmse_ewma - rmse) < 1e-5, nation


def test_bootstrap_ci_matches_reference(spark):
    row = queries()["stats_bootstrap_ci"](spark, SF).collect()[0]
    v = [round(x, 6) for x in _daily_revenue()]
    n = len(v)
    assert row.n_days == n and row.n_boot == 200
    assert abs(row.point_mean - sum(v) / n) < 1e-5
    means = []
    for b in range(200):
        s = 0.0
        for j in range(n):
            h = int(hashlib.md5(f"bs:{b}:{j}".encode()).hexdigest()[:8], 16)
            s += v[h % n]
        means.append(round(s / n, 6))
    means.sort()
    # 5th / 195th order statistics (1-indexed) = percentile-method CI
    assert abs(row.boot_lo - means[4]) < 1e-4
    assert abs(row.boot_hi - means[194]) < 1e-4
    m = sum(means) / 200
    se = math.sqrt(sum((x - m) ** 2 for x in means) / 199)
    assert abs(row.boot_se - se) < 1e-4
    # the CI must bracket the point estimate for this well-behaved series
    assert row.boot_lo < row.point_mean < row.boot_hi
