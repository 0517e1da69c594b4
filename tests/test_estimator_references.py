"""Pure-Python reference implementations for the r6 estimators.

Oracle hash parity CANNOT catch a wrong constant that is mirrored into
the SQL (the r5 HLL numerator-scale lesson): a bucket-width or
co-moment formula bug would stay green forever if both engines share
it.  These tests recompute each estimator from the raw sf0.001 parquet
with plain Python floats/Decimals and require bit-identical output.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _dec6(v: float) -> Decimal:
    # Spark CAST(double AS DECIMAL(18,6)): HALF_UP over the shortest
    # decimal representation (Python repr == Java Double.toString here).
    return Decimal(repr(float(v))).quantize(Decimal("1e-6"), ROUND_HALF_UP)


def test_histogram_quantiles_match_reference(spark):
    """quantiles_histogram_estimate == a pure-Python 1024-bucket
    histogram walk over the same doubles (guards bucket width, the
    1023 clamp, the q·n crossing rule, and the edge reconstruction)."""
    from ingest_pipeline_spark import queries as q

    vals = [
        float(v)
        for v in pq.read_table(f"{SF}/lineitem.parquet", columns=["l_extendedprice"])
        .column(0)
        .to_pylist()
    ]
    lo, hi, n = min(vals), max(vals), len(vals)
    counts: dict[int, int] = {}
    for v in vals:
        b = min(int(math.floor((v - lo) / (hi - lo) * 1024.0)), 1023) if hi > lo else 0
        counts[b] = counts.get(b, 0) + 1
    expected = {}
    for qq in (0.5, 0.9, 0.99):
        cum = 0
        for b in sorted(counts):
            cum += counts[b]
            if float(cum) >= qq * float(n):
                expected[qq] = float(
                    Decimal(repr(lo + (hi - lo) * float(b) / 1024.0)).quantize(
                        Decimal("1e-6"), ROUND_HALF_UP
                    )
                )
                break

    got = {
        r["q"]: r["est_value"]
        for r in q.quantiles_histogram_estimate(spark, SF).collect()
    }
    assert got == expected, (got, expected)


def test_linear_trend_matches_reference(spark):
    """stats_linear_trend == pure-Python decimal co-moments + the same
    double slope formula (guards the re-basing, the decimal scales, and
    the n·sxy − sx·sy / n·sxx − sx² algebra)."""
    from ingest_pipeline_spark import queries as q

    t = pq.read_table(
        f"{SF}/events.parquet", columns=["ts", "event_type", "value"]
    ).to_pydict()
    from datetime import timezone

    # naive NTZ micros → UTC epoch seconds (session tz is pinned UTC)
    xs = [v.replace(tzinfo=timezone.utc).timestamp() for v in t["ts"]]
    t0 = min(int(math.floor(x)) for x in xs)
    agg: dict[str, list] = {}
    for ts, et, val in zip(xs, t["event_type"], t["value"]):
        x = int(math.floor(ts)) - t0
        y = _dec6(val)
        n, sx, sxx, sy, sxy = agg.get(et, (0, 0, 0, Decimal(0), Decimal(0)))
        agg[et] = [n + 1, sx + x, sxx + x * x, sy + y, sxy + Decimal(x) * y]
    expected = {}
    for et, (n, sx, sxx, sy, sxy) in agg.items():
        num = float(n) * float(sxy) - float(sx) * float(sy)
        den = float(n) * float(sxx) - float(sx) * float(sx)
        expected[et] = (
            n,
            float(Decimal(repr(num / den)).quantize(Decimal("1e-6"), ROUND_HALF_UP)),
        )

    got = {
        r["event_type"]: (r["n"], r["slope_per_sec"])
        for r in q.stats_linear_trend(spark, SF).collect()
    }
    assert got == expected, (got, expected)


def _dec2(v: float) -> Decimal:
    return Decimal(repr(float(v))).quantize(Decimal("1e-2"), ROUND_HALF_UP)


def test_benford_matches_reference(spark):
    """orders_benford_digit_audit == a pure-Python first-digit census
    with log10 expectations (guards the digit extraction rule and the
    ln(1+1/d)/ln(10) constant, which oracle parity would mirror)."""
    from ingest_pipeline_spark import queries as q

    vals = (
        pq.read_table(f"{SF}/orders.parquet", columns=["o_totalprice"])
        .column(0)
        .to_pylist()
    )
    counts: dict[int, int] = {}
    for v in vals:
        s = "".join(ch for ch in str(_dec2(v)) if ch in "123456789")
        d = int(s[0])
        counts[d] = counts.get(d, 0) + 1
    total = sum(counts.values())
    expected = {
        d: (
            n,
            float(_dec6(n / total)),
            float(_dec6(math.log(1.0 + 1.0 / d) / math.log(10.0))),
        )
        for d, n in counts.items()
    }
    got = {
        r["digit"]: (r["n_obs"], r["obs_share"], r["benford_share"])
        for r in q.orders_benford_digit_audit(spark, SF).collect()
    }
    assert got == expected, (got, expected)


def test_gini_matches_reference(spark):
    """customer_gini_by_nation == a pure-Python rank-formula Gini over
    decimal spends (guards the 2·Σ(i·x)/(n·Σx) − (n+1)/n algebra and
    the (spend, custkey) rank tiebreak)."""
    from ingest_pipeline_spark import queries as q

    o = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).to_pydict()
    c = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pydict()
    n = pq.read_table(
        f"{SF}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pydict()
    nat_of = dict(zip(c["c_custkey"], c["c_nationkey"]))
    name_of = dict(zip(n["n_nationkey"], n["n_name"]))
    spend: dict[int, Decimal] = {}
    for ck, tp in zip(o["o_custkey"], o["o_totalprice"]):
        if ck in nat_of:
            spend[ck] = spend.get(ck, Decimal(0)) + _dec2(tp)
    by_nation: dict[int, list] = {}
    for ck, sp in spend.items():
        by_nation.setdefault(nat_of[ck], []).append((sp, ck))
    expected = {}
    for nk, rows in by_nation.items():
        rows.sort()
        cnt = len(rows)
        sx = sum(sp for sp, _ in rows)
        sxi = sum(Decimal(i + 1) * sp for i, (sp, _) in enumerate(rows))
        gini = (2.0 * float(sxi)) / (cnt * float(sx)) - (cnt + 1.0) / cnt
        expected[name_of[nk]] = (cnt, float(sx), float(_dec6(gini)))
    got = {
        r["nation"]: (r["n_customers"], r["total_spend"], r["gini"])
        for r in q.customer_gini_by_nation(spark, SF).collect()
    }
    assert got == expected, (got, expected)


def test_autocorr_matches_reference(spark):
    """orders_autocorr_daily == a pure-Python day-sorted lag-1 Pearson
    over decimal daily totals (guards the year-keyed lag pairing)."""
    from ingest_pipeline_spark import queries as q

    t = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    ).to_pydict()
    daily: dict[tuple, Decimal] = {}
    for ts, tp in zip(t["o_orderdate"], t["o_totalprice"]):
        k = (ts.year, ts.date())
        daily[k] = daily.get(k, Decimal(0)) + _dec2(tp)
    by_year: dict[int, list] = {}
    for (yr, day), rev in daily.items():
        by_year.setdefault(yr, []).append((day, rev))
    expected = {}
    for yr, rows in by_year.items():
        rows.sort()
        pairs = [
            (rows[i - 1][1], rows[i][1]) for i in range(1, len(rows))
        ]
        if not pairs:
            continue
        cnt = len(pairs)
        sx = float(sum(p for p, _ in pairs))
        sy = float(sum(r for _, r in pairs))
        sxx = float(sum(p * p for p, _ in pairs))
        syy = float(sum(r * r for _, r in pairs))
        sxy = float(sum(p * r for p, r in pairs))
        corr = (cnt * sxy - sx * sy) / (
            math.sqrt(cnt * sxx - sx * sx) * math.sqrt(cnt * syy - sy * sy)
        )
        expected[yr] = (cnt, float(_dec6(corr)))
    got = {
        r["yr"]: (r["n_pairs"], r["autocorr_lag1"])
        for r in q.orders_autocorr_daily(spark, SF).collect()
    }
    assert got == expected, (got, expected)


def test_kaplan_meier_matches_reference(spark):
    """survival_customer_churn == a pure-Python product-limit fold
    (guards the risk-set direction, the censoring rule, and the
    Σ ln((n−d)/n) hazard algebra)."""
    from ingest_pipeline_spark import queries as q

    t = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).to_pydict()
    c = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pydict()
    seg_of = dict(zip(c["c_custkey"], c["c_mktsegment"]))
    span: dict[int, list] = {}
    for ck, ts in zip(t["o_custkey"], t["o_orderdate"]):
        d = ts.date()
        lo, hi = span.get(ck, (d, d))
        span[ck] = (min(lo, d), max(hi, d))
    max_day = max(hi for _, hi in span.values())
    by_seg: dict[str, dict[int, list]] = {}
    for ck, (lo, hi) in span.items():
        if ck not in seg_of:
            continue
        dur = (hi - lo).days
        churn = 1 if (max_day - hi).days > 90 else 0
        cell = by_seg.setdefault(seg_of[ck], {}).setdefault(dur, [0, 0])
        cell[0] += 1
        cell[1] += churn
    expected = {}
    for seg, cells in by_seg.items():
        remaining = sum(ca for ca, _ in cells.values())
        log_s = Decimal(0)
        for dur in sorted(cells):
            c_all, d_ev = cells[dur]
            n_risk = remaining
            remaining -= c_all
            if d_ev > 0 and n_risk > d_ev:
                term = Decimal(
                    repr(math.log(float(n_risk - d_ev) / float(n_risk)))
                ).quantize(Decimal("1e-12"), ROUND_HALF_UP)
                log_s += term
                expected[(seg, dur)] = (
                    n_risk,
                    d_ev,
                    float(_dec6(float(log_s))),
                )
    got = {
        (r["segment"], r["t_days"]): (
            r["n_risk"],
            r["d_events"],
            r["log_survival"],
        )
        for r in q.survival_customer_churn(spark, SF).collect()
    }
    assert got == expected, (len(got), len(expected))


def test_kcore_matches_reference(spark):
    """graph_kcore_parts == a pure-Python peeling loop over the same
    co-purchase edges (guards the symmetrize/dedup step, the peel-all
    round semantics, and the in-core degree reporting)."""
    import duckdb

    from ingest_pipeline_spark import queries as q

    edges = duckdb.sql(
        f"""
        WITH items AS (
          SELECT DISTINCT l_orderkey, l_partkey
          FROM '{SF}/lineitem.parquet')
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
         AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
        """
    ).fetchall()
    adj: dict[int, set] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    while True:
        bad = [n for n, nb in adj.items() if len(nb) < 2]
        if not bad:
            break
        for n in bad:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    expected = sorted(
        ((n, len(nb)) for n, nb in adj.items()),
        key=lambda t: (-t[1], t[0]),
    )[:100]
    got = [
        (r["node"], r["core_degree"])
        for r in q.graph_kcore_parts(spark, SF).collect()
    ]
    assert got == expected, (len(got), len(expected), got[:5], expected[:5])


def test_cusum_matches_reference(spark):
    """events_cusum_changepoint == a pure-Python scaled-integer CUSUM
    fold (guards the n·Σc − rank·total ≡ n·Σ(c−μ) identity and the
    |S| argmax tiebreak)."""
    from ingest_pipeline_spark import queries as q

    t = pq.read_table(
        f"{SF}/events.parquet", columns=["ts", "event_type"]
    ).to_pydict()
    daily: dict[tuple, int] = {}
    for ts, et in zip(t["ts"], t["event_type"]):
        k = (et, ts.date())
        daily[k] = daily.get(k, 0) + 1
    by_type: dict[str, list] = {}
    for (et, day), c in daily.items():
        by_type.setdefault(et, []).append((day, c))
    expected = {}
    for et, rows in by_type.items():
        rows.sort()
        total = sum(c for _, c in rows)
        n_days = len(rows)
        cum, best = 0, None
        for rank, (day, c) in enumerate(rows, start=1):
            cum += c
            s = n_days * cum - rank * total
            key = (-abs(s), day)
            if best is None or key < best[0]:
                best = (key, day, s)
        expected[et] = (
            best[1],
            n_days,
            float(_dec6(float(best[2]) / float(n_days))),
        )
    got = {
        r["event_type"]: (r["change_day"], r["n_days"], r["cusum_dev"])
        for r in q.events_cusum_changepoint(spark, SF).collect()
    }
    assert got == expected, (got, expected)


def test_ks_two_sample_matches_reference(spark):
    """stats_ks_two_sample == a pure-Python scaled-integer KS fold
    (guards the n2·F1 − n1·F2 identity, the distinct-value grouping,
    and the sup argmax tiebreak)."""
    from ingest_pipeline_spark import queries as q

    t = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"]
    ).to_pydict()
    cells: dict[Decimal, list] = {}
    for fl, pr in zip(t["l_returnflag"], t["l_extendedprice"]):
        if fl not in ("R", "N"):
            continue
        cell = cells.setdefault(_dec2(pr), [0, 0])
        cell[0 if fl == "R" else 1] += 1
    n1 = sum(c[0] for c in cells.values())
    n2 = sum(c[1] for c in cells.values())
    cum1 = cum2 = 0
    best = None
    for val in sorted(cells):
        cum1 += cells[val][0]
        cum2 += cells[val][1]
        s = abs(n2 * cum1 - n1 * cum2)
        key = (-s, val)
        if best is None or key < best[0]:
            best = (key, s, val)
    expected = (
        n1,
        n2,
        best[1],
        float(best[2]),
        float(_dec6(float(best[1]) / (float(n1) * float(n2)))),
    )
    [r] = q.stats_ks_two_sample(spark, SF).collect()
    got = (r["n_r"], r["n_n"], r["ks_scaled"], r["at_value"], r["ks_stat"])
    assert got == expected, (got, expected)


def test_mannwhitney_matches_reference(spark):
    """stats_mannwhitney_u == a pure-Python average-rank fold (guards
    the doubled rank-sum identity, the U₁ = R₁ − n₁(n₁+1)/2 algebra,
    and the tie-corrected variance)."""
    from ingest_pipeline_spark import queries as q

    t = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"]
    ).to_pydict()
    cells: dict[Decimal, list] = {}
    for fl, pr in zip(t["l_returnflag"], t["l_extendedprice"]):
        if fl not in ("R", "N"):
            continue
        cell = cells.setdefault(_dec2(pr), [0, 0])
        cell[0 if fl == "R" else 1] += 1
    n1 = sum(c[0] for c in cells.values())
    n2 = sum(c[1] for c in cells.values())
    cum = 0
    two_r1 = 0
    ties_t = 0
    for val in sorted(cells):
        c1, c2 = cells[val]
        call = c1 + c2
        cum += call
        # average rank of the tie block, doubled: first+last rank
        two_r1 += c1 * (2 * cum - call + 1)
        ties_t += call**3 - call
    u_x2 = two_r1 - n1 * (n1 + 1)
    u1 = u_x2 / 2.0
    mu = n1 * n2 / 2.0
    nn = float(n1 + n2)
    var = (n1 * n2 / 12.0) * ((nn + 1.0) - ties_t / (nn * (nn - 1.0)))
    z = float(_dec6((u1 - mu) / math.sqrt(var)))
    [r] = q.stats_mannwhitney_u(spark, SF).collect()
    got = (r["n_r"], r["n_n"], r["u_x2"], r["ties_t"], r["z_score"])
    assert got == (n1, n2, u_x2, ties_t, z), (got, (n1, n2, u_x2, ties_t, z))


def test_cuped_matches_reference(spark):
    """experiment_cuped_adjustment == a pure-Python per-user CUPED
    fold (guards the md5 assignment, the θ co-moment algebra, and the
    group-level rearrangement of the per-user adjustment)."""
    import hashlib

    from ingest_pipeline_spark import queries as q

    t = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts", "event_type", "value"]
    ).to_pydict()
    from datetime import datetime

    cut = datetime(2024, 1, 16)
    users: dict[int, list] = {}
    for uid, ts, et, val in zip(
        t["user_id"], t["ts"], t["event_type"], t["value"]
    ):
        if et != "purchase":
            continue
        cell = users.setdefault(uid, [Decimal(0), Decimal(0)])
        v = Decimal(repr(float(val))).quantize(
            Decimal("1e-6"), ROUND_HALF_UP
        )
        cell[0 if ts < cut else 1] += v
    groups: dict[str, list] = {"A": [0, Decimal(0), Decimal(0)],
                               "B": [0, Decimal(0), Decimal(0)]}
    n = 0
    sx = sy = sxx = sxy = Decimal(0)
    for uid, (x, y) in users.items():
        h = hashlib.md5(f"exp:{uid}".encode()).hexdigest()[:8]
        grp = "A" if int(h, 16) % 2 == 0 else "B"
        cell = groups[grp]
        cell[0] += 1
        cell[1] += x
        cell[2] += y
        n += 1
        sx += x
        sy += y
        sxx += x * x
        sxy += x * y
    theta = (n * float(sxy) - float(sx) * float(sy)) / (
        n * float(sxx) - float(sx) * float(sx)
    )
    na, gxa, gya = groups["A"]
    nb, gxb, gyb = groups["B"]
    dy = float(gya) / na - float(gyb) / nb
    dx = float(gxa) / na - float(gxb) / nb
    expected = (
        na,
        nb,
        float(_dec6(theta)),
        float(_dec6(dy)),
        float(_dec6(dy - theta * dx)),
    )
    [r] = q.experiment_cuped_adjustment(spark, SF).collect()
    got = (r["n_a"], r["n_b"], r["theta"], r["diff_raw"], r["diff_cuped"])
    assert got == expected, (got, expected)


def test_theil_matches_reference(spark):
    """customer_theil_by_nation == a pure-Python (x/μ)·ln(x/μ) fold
    (guards the 1/n normalization and the mean-ratio algebra)."""
    from ingest_pipeline_spark import queries as q

    o = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).to_pydict()
    c = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pydict()
    n = pq.read_table(
        f"{SF}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pydict()
    nat_of = dict(zip(c["c_custkey"], c["c_nationkey"]))
    name_of = dict(zip(n["n_nationkey"], n["n_name"]))
    spend: dict[int, Decimal] = {}
    for ck, tp in zip(o["o_custkey"], o["o_totalprice"]):
        if ck in nat_of:
            spend[ck] = spend.get(ck, Decimal(0)) + _dec2(tp)
    by_nation: dict[int, list] = {}
    for ck, sp in spend.items():
        by_nation.setdefault(nat_of[ck], []).append(sp)
    expected = {}
    for nk, xs in by_nation.items():
        cnt = len(xs)
        sx = float(sum(Decimal(x) for x in xs))
        tsum = Decimal(0)
        for x in xs:
            r = float(x) / (sx / float(cnt))
            tsum += Decimal(repr(r * math.log(r))).quantize(
                Decimal("1e-12"), ROUND_HALF_UP
            )
        expected[name_of[nk]] = (
            cnt,
            float(_dec6(float(tsum) / float(cnt))),
        )
    got = {
        r["nation"]: (r["n_customers"], r["theil"])
        for r in q.customer_theil_by_nation(spark, SF).collect()
    }
    assert got == expected, (got, expected)


def test_anova_matches_reference(spark):
    """stats_anova_oneway == a pure-Python decimal co-moment ANOVA
    (guards the SSB/SSW algebra, the 9-dp term rounding, and the
    F / eta² finalization)."""
    from ingest_pipeline_spark import queries as q

    o = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    ).to_pydict()
    g: dict[str, list] = {}
    for pr, tp in zip(o["o_orderpriority"], o["o_totalprice"]):
        x = _dec2(tp)
        cell = g.setdefault(pr, [0, Decimal(0), Decimal(0)])
        cell[0] += 1
        cell[1] += x
        cell[2] += x * x
    k = len(g)
    n = sum(c[0] for c in g.values())
    s = sum((c[1] for c in g.values()), Decimal(0))
    ssb = ssw = Decimal(0)
    for n_g, sdec, ssdec in g.values():
        n_g_d = float(n_g)
        diff = float(sdec) / n_g_d - float(s) / float(n)
        ssb += Decimal(repr(n_g_d * diff * diff)).quantize(
            Decimal("1e-9"), ROUND_HALF_UP
        )
        ssw += Decimal(
            repr(float(ssdec) - float(sdec) * float(sdec) / n_g_d)
        ).quantize(Decimal("1e-9"), ROUND_HALF_UP)
    ssb_f, ssw_f = float(ssb), float(ssw)
    f_stat = (ssb_f / float(k - 1)) / (ssw_f / float(n - k))
    expected = (
        k,
        n,
        k - 1,
        n - k,
        float(Decimal(repr(ssb_f)).quantize(Decimal("1e-2"), ROUND_HALF_UP)),
        float(Decimal(repr(ssw_f)).quantize(Decimal("1e-2"), ROUND_HALF_UP)),
        float(_dec6(f_stat)),
        float(_dec6(ssb_f / (ssb_f + ssw_f))),
    )
    [r] = q.stats_anova_oneway(spark, SF).collect()
    got = (
        r["k_groups"],
        r["n_rows"],
        r["dof_between"],
        r["dof_within"],
        r["ss_between"],
        r["ss_within"],
        r["f_stat"],
        r["eta_squared"],
    )
    assert got == expected, (got, expected)


def test_assortativity_matches_reference(spark):
    """graph_degree_assortativity == a pure-Python Newman r over the
    same support≥3 co-purchase edges (guards the symmetrized integer
    co-moments and the single final division)."""
    from itertools import combinations

    from ingest_pipeline_spark import queries as q

    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pydict()
    baskets: dict[int, set] = {}
    for ok, pk in zip(li["l_orderkey"], li["l_partkey"]):
        baskets.setdefault(ok, set()).add(pk)
    support: dict[tuple, int] = {}
    for parts in baskets.values():
        for a, b in combinations(sorted(parts), 2):
            support[(a, b)] = support.get((a, b), 0) + 1
    edges = [e for e, c in support.items() if c >= 3]
    deg: dict[int, int] = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    n = 2 * len(edges)
    sx = sum(deg[u] + deg[v] for u, v in edges)
    sxy = sum(2 * deg[u] * deg[v] for u, v in edges)
    sxx = sum(deg[u] * deg[u] + deg[v] * deg[v] for u, v in edges)
    denom = float(n) * float(sxx) - float(sx) * float(sx)
    r_val = (float(n) * float(sxy) - float(sx) * float(sx)) / denom
    expected = (len(deg), len(edges), float(_dec6(r_val)))
    [r] = q.graph_degree_assortativity(spark, SF).collect()
    got = (r["n_nodes"], r["n_edges"], r["assortativity"])
    assert got == expected, (got, expected)


def test_spearman_matches_reference(spark):
    """stats_spearman_rank == a pure-Python tie-averaged doubled-rank
    Pearson (guards the 2·cnt_less + cnt + 1 rank algebra and the
    integer co-moments)."""
    from ingest_pipeline_spark import queries as q

    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"]
    ).to_pydict()
    xs = [float(v) for v in li["l_quantity"]]
    ys = [float(v) for v in li["l_extendedprice"]]

    def doubled_ranks(vals):
        from collections import Counter

        cnt = Counter(vals)
        cum_less, out = 0, {}
        for v in sorted(cnt):
            out[v] = 2 * cum_less + cnt[v] + 1
            cum_less += cnt[v]
        return [out[v] for v in vals]

    rx, ry = doubled_ranks(xs), doubled_ranks(ys)
    n = len(rx)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    rho = (float(n) * float(sxy) - float(sx) * float(sy)) / (
        math.sqrt(float(n) * float(sxx) - float(sx) * float(sx))
        * math.sqrt(float(n) * float(syy) - float(sy) * float(sy))
    )
    expected = (n, float(_dec6(rho)))
    [r] = q.stats_spearman_rank(spark, SF).collect()
    assert (r["n_rows"], r["spearman_rho"]) == expected


def test_adamic_adar_matches_reference(spark):
    """graph_adamic_adar == a pure-Python wedge enumeration over the
    same support≥3 edges (guards the 1/ln(deg) discount, the
    non-adjacency filter, and the rounded-then-ranked top-25)."""
    from itertools import combinations

    from ingest_pipeline_spark import queries as q

    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pydict()
    baskets: dict[int, set] = {}
    for ok, pk in zip(li["l_orderkey"], li["l_partkey"]):
        baskets.setdefault(ok, set()).add(pk)
    support: dict[tuple, int] = {}
    for parts in baskets.values():
        for a, b in combinations(sorted(parts), 2):
            support[(a, b)] = support.get((a, b), 0) + 1
    edges = {e for e, c in support.items() if c >= 3}
    nbrs: dict[int, set] = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    cand: dict[tuple, list] = {}
    for w, ns in nbrs.items():
        if len(ns) < 2:  # no wedge through a degree-1 center
            continue
        dterm = Decimal(repr(1.0 / math.log(float(len(ns))))).quantize(
            Decimal("1e-12"), ROUND_HALF_UP
        )
        for a, b in combinations(sorted(ns), 2):
            if (a, b) in edges:
                continue
            cell = cand.setdefault((a, b), [0, Decimal(0)])
            cell[0] += 1
            cell[1] += dterm
    scored = [
        (a, b, nc, float(_dec6(float(s))))
        for (a, b), (nc, s) in cand.items()
    ]
    scored.sort(key=lambda t: (-t[3], t[0], t[1]))
    expected = scored[:25]
    got = [
        (r["part_a"], r["part_b"], r["n_common"], r["adamic_adar"])
        for r in q.graph_adamic_adar(spark, SF).collect()
    ]
    assert got == expected, (got[:5], expected[:5])


def test_roc_auc_matches_reference(spark):
    """quality_roc_auc == a pure-Python tie-averaged rank AUC over the
    same 6-dp logit scores (guards the doubled-rank algebra and the
    R2+ - n+(n+1) numerator)."""
    from ingest_pipeline_spark import queries as q

    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["text", "lang"]
    ).to_pydict()
    import re

    pairs = []
    for text, lang in zip(docs["text"], docs["lang"]):
        n_chars = len(text)
        n_tok = len([t for t in re.split(r"\s+", text.strip()) if t != ""])
        if n_tok <= 0 or n_chars <= 0:
            continue
        n_digit = len(re.sub(r"[^0-9]", "", text))
        n_punct = len(re.sub(r"[^.,!?;:]", "", text))
        z = (
            -3.0
            + 0.55 * (float(n_chars) / float(n_tok))
            - 6.0 * (float(n_digit) / float(n_chars))
            - 2.5 * (float(n_punct) / float(n_chars))
            + 0.002 * float(n_tok)
        )
        z = float(
            Decimal(repr(z)).quantize(Decimal("1e-6"), ROUND_HALF_UP)
        )
        pairs.append((z, 1 if lang == "en" else 0))

    from collections import Counter

    cnt = Counter(z for z, _ in pairs)
    cum_less, rank2 = 0, {}
    for v in sorted(cnt):
        rank2[v] = 2 * cum_less + cnt[v] + 1
        cum_less += cnt[v]
    n = len(pairs)
    npos = sum(y for _, y in pairs)
    r2pos = sum(rank2[z] for z, y in pairs if y == 1)
    auc = (float(r2pos) - float(npos) * (float(npos) + 1.0)) / (
        2.0 * float(npos) * float(n - npos)
    )
    expected = (n, npos, n - npos, float(_dec6(auc)))
    [r] = q.quality_roc_auc(spark, SF).collect()
    assert (r["n_docs"], r["n_pos"], r["n_neg"], r["auc"]) == expected


def test_kendall_tau_matches_reference(spark):
    """stats_kendall_tau == Knight's O(n log n) mergesort tau-b — a
    genuinely independent derivation (inversion counting vs the
    engine's cell-grid fold), guarding the doubled tie terms and the
    C-D sign fold."""
    from ingest_pipeline_spark import queries as q

    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_quantity", "l_discount"]
    ).to_pydict()
    xs = [float(v) for v in li["l_quantity"]]
    ys = [float(v) for v in li["l_discount"]]
    n = len(xs)

    def count_inversions(a):
        # mergesort count of strict inversions (left > right)
        def rec(lst):
            if len(lst) <= 1:
                return lst, 0
            mid = len(lst) // 2
            left, il = rec(lst[:mid])
            right, ir = rec(lst[mid:])
            merged, inv, i, j = [], il + ir, 0, 0
            while i < len(left) and j < len(right):
                if left[i] <= right[j]:
                    merged.append(left[i])
                    i += 1
                else:
                    merged.append(right[j])
                    j += 1
                    inv += len(left) - i
            merged.extend(left[i:])
            merged.extend(right[j:])
            return merged, inv

        return rec(a)[1]

    from collections import Counter

    pairs = sorted(zip(xs, ys))
    disc = count_inversions([y for _, y in pairs])
    cx, cy, cxy = Counter(xs), Counter(ys), Counter(zip(xs, ys))
    n0 = n * (n - 1) // 2
    n1 = sum(t * (t - 1) // 2 for t in cx.values())
    n2 = sum(t * (t - 1) // 2 for t in cy.values())
    n3 = sum(t * (t - 1) // 2 for t in cxy.values())
    conc = n0 - n1 - n2 + n3 - disc
    tau = (float(conc) - float(disc)) / math.sqrt(
        (float(n0) - float(n1)) * (float(n0) - float(n2))
    )
    [r] = q.stats_kendall_tau(spark, SF).collect()
    assert r["n_rows"] == n
    # independent derivation: same value to well beyond the 6-dp round,
    # but the algebra differs (n0-n1 vs n(n-1)-P1 doubled) — compare
    # at the published precision
    assert abs(r["tau_b"] - tau) < 5e-7, (r["tau_b"], tau)


def test_runs_test_matches_reference(spark):
    """orders_runs_test == a pure-Python Wald-Wolfowitz over the same
    decimal daily revenues (guards the lower-median pick, the
    equal-median drop, and the run-count variance)."""
    from ingest_pipeline_spark import queries as q

    o = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    ).to_pydict()
    daily: dict = {}
    for d, p in zip(o["o_orderdate"], o["o_totalprice"]):
        day = d.date() if hasattr(d, "date") else d
        daily[day] = daily.get(day, Decimal(0)) + Decimal(repr(p)).quantize(
            Decimal("0.01"), ROUND_HALF_UP
        )
    revs_by_day = sorted(daily.items())
    ordered = sorted(daily.values())
    nd = len(ordered)
    m = ordered[-(-nd // 2) - 1]  # lower median: rank ceil(n/2), 1-based
    seq = [rev > m for _, rev in revs_by_day if rev != m]
    n1 = sum(seq)
    n2 = len(seq) - n1
    runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
    nn = float(n1 + n2)
    mu = 2.0 * n1 * n2 / nn + 1.0
    var = (2.0 * n1 * n2 * (2.0 * n1 * n2 - nn)) / (nn * nn * (nn - 1.0))
    z = float(_dec6((runs - mu) / math.sqrt(var)))
    [r] = q.orders_runs_test(spark, SF).collect()
    got = (r["n_days"], r["n_above"], r["n_below"], r["n_runs"], r["z"])
    assert got == (n1 + n2, n1, n2, runs, z), got


def test_welch_matches_reference(spark):
    """stats_welch_ttest == a pure-Python decimal sufficient-stats
    Welch t (guards the decimal Σx/Σx², the variance algebra, the
    t-stat, and the Welch-Satterthwaite df finalization)."""
    from ingest_pipeline_spark import queries as q

    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"]
    ).to_pydict()
    g: dict[str, list] = {}
    for fl, xp in zip(li["l_returnflag"], li["l_extendedprice"]):
        if fl not in ("R", "N"):
            continue
        x = _dec2(xp)
        cell = g.setdefault(fl, [0, Decimal(0), Decimal(0)])
        cell[0] += 1
        cell[1] += x
        cell[2] += x * x
    stats = {}
    for fl, (n, sx, sxx) in g.items():
        mean = float(sx) / n
        var = (float(sxx) - n * mean * mean) / (n - 1)
        stats[fl] = (n, mean, var)
    n1, m1, v1 = stats["R"]
    n2, m2, v2 = stats["N"]
    se1, se2 = v1 / n1, v2 / n2
    t = (m1 - m2) / math.sqrt(se1 + se2)
    df = ((se1 + se2) * (se1 + se2)) / (
        se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)
    )
    [r] = q.stats_welch_ttest(spark, SF).collect()
    got = (r["n1"], r["n2"], r["mean_r"], r["mean_n"], r["t_stat"], r["df_welch"])
    expected = (
        n1,
        n2,
        float(_dec6(m1)),
        float(_dec6(m2)),
        float(_dec6(t)),
        float(_dec6(df)),
    )
    assert got == expected, (got, expected)


def test_modularity_matches_reference(spark):
    """graph_modularity_brand == a pure-Python Newman per-community
    contribution over the same support≥3 co-purchase edges (guards the
    intra-edge count, the degree sums, and the L/m - (D/2m)² final)."""
    from itertools import combinations

    from ingest_pipeline_spark import queries as q

    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pydict()
    pt = pq.read_table(
        f"{SF}/part.parquet", columns=["p_partkey", "p_brand"]
    ).to_pydict()
    brand = dict(zip(pt["p_partkey"], pt["p_brand"]))
    baskets: dict[int, set] = {}
    for ok, pk in zip(li["l_orderkey"], li["l_partkey"]):
        baskets.setdefault(ok, set()).add(pk)
    support: dict[tuple, int] = {}
    for parts in baskets.values():
        for a, b in combinations(sorted(parts), 2):
            support[(a, b)] = support.get((a, b), 0) + 1
    edges = [e for e, c in support.items() if c >= 3]
    m = len(edges)
    d_sum: dict[str, int] = {}
    nodes: dict[str, set] = {}
    intra: dict[str, int] = {}
    for u, v in edges:
        for node in (u, v):
            d_sum[brand[node]] = d_sum.get(brand[node], 0) + 1
            nodes.setdefault(brand[node], set()).add(node)
        if brand[u] == brand[v]:
            intra[brand[u]] = intra.get(brand[u], 0) + 1
    expected = {}
    for b in d_sum:
        frac = float(d_sum[b]) / (2.0 * float(m))
        expected[b] = (
            len(nodes[b]),
            d_sum[b],
            intra.get(b, 0),
            float(_dec6(float(intra.get(b, 0)) / float(m) - frac * frac)),
        )
    got = {
        r["brand"]: (r["n_nodes"], r["d_sum"], r["intra_edges"], r["q_contrib"])
        for r in q.graph_modularity_brand(spark, SF).collect()
    }
    assert got == expected, (got, expected)


def test_hyperball_matches_reference(spark):
    """graph_hyperball_neighborhood == a pure-Python HyperBall (md5
    registers, max-propagation, the shared HLL estimator) — guards the
    register bit math, the per-round union-max, and the numerator /
    linear-counting constants; a second assertion checks the t<=1
    estimates sit within the HLL error band of the EXACT ball sizes
    (the estimator, not just its mirror, is right)."""
    import hashlib
    from itertools import combinations

    from ingest_pipeline_spark import queries as q

    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pydict()
    baskets: dict[int, set] = {}
    for ok, pk in zip(li["l_orderkey"], li["l_partkey"]):
        baskets.setdefault(ok, set()).add(pk)
    support: dict[tuple, int] = {}
    for parts in baskets.values():
        for a, b in combinations(sorted(parts), 2):
            support[(a, b)] = support.get((a, b), 0) + 1
    edges = [e for e, c in support.items() if c >= 3]
    adj: dict[int, set] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    nodes = sorted(adj)

    def regs_of(node: int) -> dict[int, int]:
        h = int(hashlib.md5(str(node).encode()).hexdigest()[:8], 16)
        bucket, rem = h // (1 << 27), h % (1 << 27)
        rho = 28 if rem == 0 else 28 - rem.bit_length()
        return {bucket: rho}

    def estimate(regs: dict[int, int]) -> float:
        from ingest_pipeline_spark.operators.sketches import HLL_RAW_NUMERATOR

        n_present = len(regs)
        z = sum(1 << (28 - mj) for mj in regs.values())
        z += (32 - n_present) * (1 << 28)
        e_raw = HLL_RAW_NUMERATOR / float(z)
        if e_raw <= 80.0 and n_present < 32:
            e_raw = 32.0 * math.log(32.0 / float(32 - n_present))
        return float(_dec6(e_raw))

    state = {v: regs_of(v) for v in nodes}
    expected = {}
    balls = {v: {v} for v in nodes}  # exact balls for the accuracy band
    for t in range(3):
        total = sum(
            (Decimal(repr(estimate(state[v]))) for v in nodes), Decimal(0)
        )
        n = len(nodes)
        expected[t] = (
            n,
            float(total),
            float(_dec6(float(total) / float(n))),
        )
        if t < 2:
            new_state = {}
            new_balls = {}
            for v in nodes:
                merged = dict(state[v])
                for w in adj[v]:
                    for bkt, mj in state[w].items():
                        if merged.get(bkt, -1) < mj:
                            merged[bkt] = mj
                new_state[v] = merged
                new_balls[v] = set(balls[v]).union(*(balls[w] for w in adj[v]))
            state, balls = new_state, new_balls

    rows = q.graph_hyperball_neighborhood(spark, SF).collect()
    got = {r["t"]: (r["n_nodes"], r["ball_sum"], r["avg_ball"]) for r in rows}
    assert got == expected, (got, expected)

    # accuracy band: HLL with 32 registers has ~18.5% relative error;
    # summed over all nodes the estimate must land within 30% of the
    # exact neighborhood function for the sizes this graph reaches
    exact_n1 = sum(1 + len(adj[v]) for v in nodes)
    assert abs(got[1][1] - exact_n1) / exact_n1 < 0.30, (got[1][1], exact_n1)


def test_power_iteration_matches_reference(spark):
    """embedding_top_component == a pure-Python decimal power iteration
    (guards the scaled-integer gram, the centering algebra, the per-
    round 12-dp product rounding, and the Rayleigh finalization); a
    numpy-eigh band checks the Rayleigh estimate is a genuine lower
    bound within 20% of the true top eigenvalue."""
    import numpy as np

    from ingest_pipeline_spark import queries as q

    t = pq.read_table(f"{SF}/embeddings.parquet")
    raw = t.column("embedding").to_pylist()
    n, dim = len(raw), len(raw[0])

    def _dec12(v: float) -> Decimal:
        return Decimal(repr(float(v))).quantize(Decimal("1e-12"), ROUND_HALF_UP)

    # scaled-integer gram + means (mirrors gram_partials exactly)
    A = [[int(_dec6(x) * 10**6) for x in vec] for vec in raw]
    S = [[0] * dim for _ in range(dim)]
    SM = [0] * dim
    for row in A:
        for i in range(dim):
            SM[i] += row[i]
            ri = row[i]
            for j in range(dim):
                S[i][j] += ri * row[j]
    s_d = [[float(Decimal(S[i][j]) / Decimal(10**12)) for j in range(dim)]
           for i in range(dim)]
    m_d = [float(Decimal(SM[i]) / Decimal(10**6)) for i in range(dim)]
    C = [[s_d[i][j] / n - (m_d[i] / n) * (m_d[j] / n) for j in range(dim)]
         for i in range(dim)]

    v = [1.0] + [0.0] * (dim - 1)
    for _ in range(8):
        y = [
            float(sum((_dec12(C[i][j] * v[j]) for j in range(dim)), Decimal(0)))
            for i in range(dim)
        ]
        nrm = math.sqrt(
            float(sum((_dec12(yi * yi) for yi in y), Decimal(0)))
        )
        v = [float(_dec12(yi / nrm)) for yi in y]
    y = [
        float(sum((_dec12(C[i][j] * v[j]) for j in range(dim)), Decimal(0)))
        for i in range(dim)
    ]
    lam = float(
        sum((_dec12(y[i] * v[i]) for i in range(dim)), Decimal(0))
    )
    expected = {
        i: (float(_dec6(v[i])), float(_dec6(lam))) for i in range(dim)
    }
    got = {
        r["pos"]: (r["loading"], r["eigenvalue"])
        for r in q.embedding_top_component(spark, SF).collect()
    }
    assert got == expected

    # accuracy band: Rayleigh quotient of a (near-)unit vector is a
    # lower bound on lambda_1 and must be within 20% after 8 rounds
    X = np.round(np.array(raw, dtype=np.float64), 6)
    Cn = X.T @ X / n - np.outer(X.mean(0), X.mean(0))
    lam1 = float(np.linalg.eigvalsh(Cn)[-1])
    assert lam <= lam1 * 1.001 and lam >= 0.8 * lam1, (lam, lam1)


def test_join_size_estimate_matches_reference(spark):
    """sketch_join_size_estimate == a pure-Python CMS inner-product
    estimator (guards the seeded md5 bucket formula, the per-row inner
    product, the min-over-rows rule, and est >= exact)."""
    import hashlib

    from ingest_pipeline_spark import queries as q

    li = (
        pq.read_table(f"{SF}/lineitem.parquet", columns=["l_partkey"])
        .column(0)
        .to_pylist()
    )
    pt = (
        pq.read_table(f"{SF}/part.parquet", columns=["p_partkey"])
        .column(0)
        .to_pylist()
    )

    def bucket(j: int, key) -> int:
        h = hashlib.md5(f"{j}:{key}".encode()).hexdigest()
        return int(h[:8], 16) % 4096

    def grid(keys):
        g: dict[tuple, int] = {}
        for k in keys:
            for j in range(4):
                b = (j, bucket(j, k))
                g[b] = g.get(b, 0) + 1
        return g

    ga, gb = grid(li), grid(pt)
    self_est = min(
        sum(c * c for (j, _), c in ga.items() if j == jj) for jj in range(4)
    )
    fk_est = min(
        sum(
            c * gb.get((j, b), 0)
            for (j, b), c in ga.items()
            if j == jj
        )
        for jj in range(4)
        for j in [jj]
    )
    freq: dict[int, int] = {}
    for k in li:
        freq[k] = freq.get(k, 0) + 1
    self_exact = sum(n * n for n in freq.values())
    pset = set(pt)
    fk_exact = sum(n for k, n in freq.items() if k in pset)
    expected = {
        "lineitem_self_f2": (
            self_est,
            self_exact,
            float(_dec6((self_est - self_exact) / self_exact)),
        ),
        "lineitem_part_fk": (
            fk_est,
            fk_exact,
            float(_dec6((fk_est - fk_exact) / fk_exact)),
        ),
    }
    got = {
        r["pair"]: (r["est"], r["exact"], r["rel_overestimate"])
        for r in q.sketch_join_size_estimate(spark, SF).collect()
    }
    assert got == expected, (got, expected)
    assert all(e >= x for e, x, _ in expected.values())


def test_benjamini_hochberg_matches_reference(spark):
    """stats_benjamini_hochberg == a pure-Python BH step-up (guards the
    u*m*10 <= k*2^32 cross-multiplication, the injected-effect rule,
    and the kmax cutoff — constants an oracle mirror can't catch)."""
    import hashlib

    from ingest_pipeline_spark import queries as q

    t = pq.read_table(f"{SF}/documents.parquet", columns=["source", "lang"])
    cells = sorted({(s, g) for s, g in zip(*[c.to_pylist() for c in t.columns])})
    rows = []
    for s, g in cells:
        u0 = int(hashlib.md5(f"bh:{s}:{g}".encode()).hexdigest()[:8], 16)
        u = u0 // 65536 if u0 % 4 == 0 else u0
        rows.append((s, g, u))
    m = len(rows)
    ranked = sorted(rows, key=lambda r: (r[2], r[0], r[1]))
    kmax = 0
    for k, (_s, _g, u) in enumerate(ranked, 1):
        if u * m * 10 <= k * 2**32:
            kmax = k
    expected = {
        (s, g): (float(_dec6(u / 4294967296.0)), k, k <= kmax)
        for k, (s, g, u) in enumerate(ranked, 1)
    }
    got = {
        (r.source, r.lang): (r.p, r.k, r.rejected)
        for r in q.queries()["stats_benjamini_hochberg"](spark, SF).collect()
    }
    assert got == expected and any(v[2] for v in got.values())


def test_line_dedup_matches_reference(spark):
    """corpus_line_dedup == a pure-Python keep-first line dedup over
    the same augmented corpus (guards the chunking, the struct
    first-key ordering, and the partial-last-line token accounting)."""
    import re

    from ingest_pipeline_spark import queries as q

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = list(zip(t.column(0).to_pylist(), t.column(1).to_pylist()))
    docs += [(d + 1000000, x) for d, x in docs if d % 10 == 0]
    first: dict[str, int] = {}
    lines_by_doc: dict[int, list[tuple[int, str, int]]] = {}
    for d, text in docs:
        toks = [w for w in re.split(r"\s+", (text or "").strip()) if w]
        if not toks:
            continue
        ls = []
        for i in range(0, (len(toks) + 7) // 8):
            chunk = toks[i * 8 : i * 8 + 8]
            ls.append((i, " ".join(chunk), len(chunk)))
        lines_by_doc[d] = ls
        for i, line, _n in ls:
            key = (d, i)  # lexicographic tuple, mirrors the struct MIN
            if line not in first or key < first[line]:
                first[line] = key
    expected = {}
    for d, ls in lines_by_doc.items():
        nl = len(ls)
        rm = [(i, n) for i, line, n in ls if first[line] != (d, i)]
        expected[d] = (nl, len(rm), sum(n for _i, n in rm))
    got = {
        r.doc_id: (r.n_lines, r.n_lines_removed, r.tokens_removed)
        for r in q.queries()["corpus_line_dedup"](spark, SF).collect()
    }
    assert got == expected and sum(v[1] for v in got.values()) > 0


def test_token_budget_allocation_matches_reference(spark):
    """corpus_token_budget_allocation == a pure-Python greedy fill
    (guards the 60% budget constant, the rank key, and the clamp)."""
    import re

    from ingest_pipeline_spark import queries as q

    t = pq.read_table(f"{SF}/documents.parquet", columns=["source", "text"])
    per: dict[str, list[int]] = {}
    for s, text in zip(t.column(0).to_pylist(), t.column(1).to_pylist()):
        toks = [w for w in re.split(r"\s+", (text or "").strip()) if w]
        per.setdefault(s, []).append(len(toks))
    stats = {s: (len(v), sum(v)) for s, v in per.items()}
    budget = sum(n for _d, n in stats.values()) * 3 // 5
    ranked = sorted(
        stats.items(), key=lambda kv: (-(kv[1][1] / kv[1][0]), kv[0])
    )
    expected, prev = {}, 0
    for rk, (s, (nd, nt)) in enumerate(ranked, 1):
        expected[s] = (rk, nd, nt, max(min(nt, budget - prev), 0))
        prev += nt
    got = {
        r.source: (r.rnk, r.n_docs, r.n_tokens, r.allocated)
        for r in q.queries()["corpus_token_budget_allocation"](
            spark, SF
        ).collect()
    }
    assert got == expected
    assert sum(v[3] for v in got.values()) == budget  # budget exhausted


def test_pq_lloyd_codebook_and_topk_match_reference(spark):
    """pq_codebook_lloyd / pq_topk_lloyd == a pure-Python integer
    Lloyd's + ADC pipeline over the same parquet (the r9 verdict ask:
    the learned-PQ registry entry must not rest on recall floors
    alone).  Guards the micro quantization, the md5 grid init, the
    (dist2, c) argmin tiebreak, the half-up integer mean, the
    empty-cluster keep rule, ADC self-exclusion, and both rank
    tiebreaks — EXACT equality end to end, no tolerances."""
    import hashlib

    from ingest_pipeline_spark.operators.similarity import (
        pq_codebook_lloyd,
        pq_topk_lloyd,
    )
    from ingest_pipeline_spark.tables import load_table

    M, NC, DSUB, ITERS, K, REFINE = 8, 16, 8, 3, 3, 2

    def micro(v: float) -> int:
        return int(_dec6(v) * 10**6)

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {
        int(i): [micro(v) for v in e]
        for i, e in zip(t.column(0).to_pylist(), t.column(1).to_pylist())
    }

    def grid_val(j: int, c: int, ps: int) -> int:
        u = int(hashlib.md5(f"pqlloyd:{j}:{c}:{ps}".encode()).hexdigest()[:8], 16)
        return micro((u / 4294967296.0) * 2 - 1)

    cb = {(j, c, ps): grid_val(j, c, ps)
          for j in range(M) for c in range(NC) for ps in range(DSUB)}

    def hu_mean(s: int, n: int) -> int:
        return (2 * s + n) // (2 * n) if s >= 0 else -((2 * -s + n) // (2 * n))

    def assign(cbk):
        out = {}
        for vid, v in vecs.items():
            for j in range(M):
                sub = v[j * DSUB:(j + 1) * DSUB]
                out[(vid, j)] = min(
                    range(NC),
                    key=lambda c: (
                        sum((sub[ps] - cbk[(j, c, ps)]) ** 2
                            for ps in range(DSUB)),
                        c,
                    ),
                )
        return out

    for _ in range(ITERS):
        asg = assign(cb)
        sums: dict[tuple, list] = {}
        for (vid, j), c in asg.items():
            for ps in range(DSUB):
                k2 = (j, c, ps)
                s, n = sums.get(k2, (0, 0))
                sums[k2] = (s + vecs[vid][j * DSUB + ps], n + 1)
        cb = {k2: (hu_mean(*sums[k2]) if k2 in sums else old)
              for k2, old in cb.items()}

    emb = load_table(spark, SF, "embeddings")
    got_cb = {
        (r.j, r.c, r.ps): r.cbv
        for r in pq_codebook_lloyd(emb, m=M, n_codes=NC, iters=ITERS).collect()
    }
    assert got_cb == cb

    # full pipeline: encode, ADC (self excluded), refine — exact ranks
    codes = assign(cb)
    expected = {}
    for q_id in [i for i in vecs if i < 5]:
        qv = vecs[q_id]
        lut = {
            (j, c): sum(qv[j * DSUB + ps] * cb[(j, c, ps)]
                        for ps in range(DSUB))
            for j in range(M) for c in range(NC)
        }
        adc = {
            vid: sum(lut[(j, codes[(vid, j)])] for j in range(M))
            for vid in vecs if vid != q_id
        }
        cand = sorted(adc, key=lambda i: (-adc[i], i))[: REFINE * K]
        exact = {i: sum(a * b for a, b in zip(qv, vecs[i])) for i in cand}
        for rank, nid in enumerate(
            sorted(exact, key=lambda i: (-exact[i], i))[:K], start=1
        ):
            expected[(q_id, nid)] = (exact[nid] / 1000000000000.0, rank)
    probe = emb.filter("vec_id < 5")
    got = {
        (r.query_id, r.neighbor_id): (r.dot, r.rank)
        for r in pq_topk_lloyd(emb, probe, k=K, iters=ITERS,
                               refine=REFINE).collect()
    }
    assert got == expected and len(got) == 5 * K


def test_matryoshka_agreement_matches_reference(spark):
    """embedding_matryoshka_agreement == a pure-Python Decimal
    prefix-dot pipeline (guards the band boundaries 8/16/32/64 — which
    the oracle mirrors — the self-exclusion, the (dot DESC, id ASC)
    tiebreak, and the /3 overlap normalization)."""
    from ingest_pipeline_spark import queries as q

    def dec12(x: float) -> Decimal:
        return Decimal(repr(x)).quantize(Decimal("1e-12"), ROUND_HALF_UP)

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {
        int(i): [float(_dec6(v)) for v in e]
        for i, e in zip(t.column(0).to_pylist(), t.column(1).to_pylist())
    }
    probes = [i for i in vecs if i < 20]
    expected = {}
    for dim in (8, 16, 32, 64):
        agree, overlap = 0, 0
        for qid in probes:
            def top3(d):
                dots = {
                    i: sum((dec12(vecs[qid][p] * vecs[i][p])
                            for p in range(d)), Decimal(0))
                    for i in vecs if i != qid
                }
                return sorted(dots, key=lambda i: (-dots[i], i))[:3]

            full = top3(64)
            pre = top3(dim)
            agree += pre[0] == full[0]
            overlap += len(set(pre) & set(full))
        expected[dim] = (
            len(probes),
            agree,
            float(_dec6(overlap / (3.0 * len(probes)))),
        )
    got = {
        r.prefix_dim: (r.n_queries, r.n_top1_agree, r.avg_top3_overlap)
        for r in q.queries()["embedding_matryoshka_agreement"](
            spark, SF
        ).collect()
    }
    assert got == expected
