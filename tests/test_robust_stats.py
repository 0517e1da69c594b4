"""Pure-Python reference units for the r8 statistics queries
(stats_theil_sen, quality_rater_kappa) — the r5 mirrored-constant
discipline: the oracle mirrors the same formulas, so a wrong pe
marginal product or a wrong median position on BOTH sides would pass
the hash check; these pin the math independently."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from ingest_pipeline_spark import queries as q  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_theil_sen_matches_bruteforce(spark):
    """Recompute the windowed Theil-Sen median slope by brute force in
    Python from the daily revenue series and compare the selected
    rational(s) at the lower/upper median positions."""
    rows = duckdb.sql(
        f"""
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(28,2)) AS rev
        FROM '{SF_DIR}/orders.parquet' GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    daily = [(d, float(r)) for d, r in rows]
    pairs = []
    for i in range(len(daily)):
        for j in range(i + 1, len(daily)):
            gap = (daily[j][0] - daily[i][0]).days
            if gap <= 60:
                num = round((daily[j][1] - daily[i][1]) * 100)
                pairs.append(
                    (num / gap, daily[i][0], daily[j][0], num, gap)
                )
    pairs.sort(key=lambda t: (t[0], t[1], t[2]))
    n = len(pairs)
    lo, hi = pairs[(n + 1) // 2 - 1], pairs[(n + 2) // 2 - 1]

    got = {
        r.which: (r.position, r.num_cents, r.den_days, r.n_pairs)
        for r in q.stats_theil_sen(spark, SF_DIR).collect()
    }
    assert got["lower"] == ((n + 1) // 2, lo[3], lo[4], n)
    assert got["upper"] == ((n + 2) // 2, hi[3], hi[4], n)


def test_kappa_matches_hand_formula(spark):
    """Recompute kappa from the query's own confusion cells with the
    textbook formula AND recompute the cells from raw text in Python."""
    import re

    (row,) = q.quality_rater_kappa(spark, SF_DIR).collect()
    # formula leg
    n, n11, n10, n01, n00 = row.n, row.n11, row.n10, row.n01, row.n00
    po = (n11 + n00) / n
    pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (n * n)
    assert row.po == round(po, 6)
    assert row.pe == round(pe, 6)
    assert row.kappa == round((po - pe) / (1 - pe), 6)
    # cells leg: independent rater implementation over the raw corpus
    docs = duckdb.sql(
        f"SELECT text, n_chars FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    stop = {"the", "a", "of", "and", "to"}
    cells = {"11": 0, "10": 0, "01": 0, "00": 0}
    for text, n_chars in docs:
        toks = [t for t in re.split(r"\s+", text.strip()) if t]
        wc = len(toks)
        sc = sum(1 for t in re.split(r"\s+", text.strip().lower()) if t in stop)
        ra = 20 <= wc <= 400 and n_chars <= 3000
        rb = sc * 20 >= wc and wc > 0
        cells[f"{int(ra)}{int(rb)}"] += 1
    assert (n11, n10, n01, n00) == (
        cells["11"], cells["10"], cells["01"], cells["00"]
    )
    assert n == len(docs)


def test_kappa_known_fixture():
    """Classic textbook example: perfect agreement -> kappa 1; marginal
    independence -> kappa 0."""
    def kappa(n11, n10, n01, n00):
        n = n11 + n10 + n01 + n00
        po = (n11 + n00) / n
        pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (n * n)
        return (po - pe) / (1 - pe)

    assert kappa(30, 0, 0, 70) == 1.0
    # independent raters: joint = product of marginals -> po == pe
    assert abs(kappa(20, 20, 30, 30)) < 1e-12


def test_permutation_test_matches_pure_python(spark):
    """Recompute the md5 permutation test end-to-end in pure Python
    (hashlib, exact ints) and compare every output column."""
    import hashlib

    rows = duckdb.sql(
        f"""
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                    AS BIGINT) AS cents
        FROM '{SF_DIR}/orders.parquet' GROUP BY 1
        """
    ).fetchall()
    daily = [(d, int(c)) for d, c in rows]
    na = sum(1 for d, _ in daily if d.month <= 6)
    nb = len(daily) - na
    sa = sum(c for d, c in daily if d.month <= 6)
    sb = sum(c for d, c in daily if d.month > 6)
    absnum = abs(sa * nb - sb * na)
    n_ge = 0
    for r in range(200):
        keyed = sorted(
            daily,
            key=lambda dc: (
                hashlib.md5(f"{r}:{dc[0]}".encode()).hexdigest(),
                dc[0],
            ),
        )
        sa_r = sum(c for _, c in keyed[:na])
        sb_r = sum(c for _, c in keyed[na:])
        if abs(sa_r * nb - sb_r * na) >= absnum:
            n_ge += 1

    (row,) = q.stats_permutation_test(spark, SF_DIR).collect()
    assert (row.n_days_a, row.n_days_b) == (na, nb)
    assert (row.sum_cents_a, row.sum_cents_b) == (sa, sb)
    assert row.obs_diff_num == sa * nb - sb * na
    assert row.obs_diff_den == na * nb
    assert row.n_extreme == n_ge
    assert row.p_value == round((n_ge + 1) / 201, 6)


def test_recall_probe_curve_monotone_and_bounded(spark):
    rows = {
        r.n_probe: r
        for r in q.similarity_recall_probe_curve(spark, SF_DIR).collect()
    }
    assert set(rows) == {1, 2, 4}
    # more probed cells can only add candidates -> recall monotone
    assert rows[1].n_hits <= rows[2].n_hits <= rows[4].n_hits
    for r in rows.values():
        assert 0 <= r.n_hits <= r.n_exact
        assert r.recall == round(r.n_hits / r.n_exact, 6)


def test_kcenter_coreset_matches_pure_python(spark):
    """Re-run the greedy farthest-point selection in pure Python
    (rounded cosines, id tiebreaks) and hold the full (rank, id,
    max_sim) sequence to exact equality."""
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet'"
    ).fetchall()
    vecs = {int(i): [float(x) for x in v] for i, v in rows}

    def cos(a, b):
        num = 0.0
        for x, y in zip(a, b):
            num += x * y
        na = nb = 0.0
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return round(num / (na**0.5 * nb**0.5), 6)

    sel = [min(vecs)]
    want = [(1, sel[0], None)]
    for r in range(2, 9):
        best = None
        for i in sorted(vecs):
            if i in sel:
                continue
            mx = max(cos(vecs[i], vecs[s]) for s in sel)
            if best is None or (mx, i) < best:
                best = (mx, i)
        sel.append(best[1])
        want.append((r, best[1], best[0]))

    got = sorted(
        (r.rank, r.vec_id, r.max_sim_to_prior)
        for r in q.sample_kcenter_coreset(spark, SF_DIR).collect()
    )
    assert got == want


def test_pack_boundary_sweep_hand_fixture(spark):
    """Recompute the straddle/sequence arithmetic by hand on the real
    corpus (pure Python cumsum per source) — guards the ceil-division
    and boundary-crossing formulas mirrored into the oracle."""
    rows = duckdb.sql(
        f"""
        SELECT doc_id, source,
               LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                   x -> x <> '')) AS n
        FROM '{SF_DIR}/documents.parquet' ORDER BY source, doc_id
        """
    ).fetchall()
    bysrc = {}
    for _, src, n in rows:
        bysrc.setdefault(src, []).append(int(n))
    want = {}
    for L in (512, 1024, 2048):
        n_docs = n_str = n_seqs = 0
        for ns in bysrc.values():
            start = 0
            for n in ns:
                n_docs += 1
                if n > 0 and start // L != (start + n - 1) // L:
                    n_str += 1
                start += n
            n_seqs += (start + L - 1) // L
        want[L] = (n_docs, n_str, n_seqs)
    got = {
        r.seq_len: (r.n_docs, r.n_straddlers, r.n_seqs)
        for r in q.corpus_pack_boundary_sweep(spark, SF_DIR).collect()
    }
    assert got == want
