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
