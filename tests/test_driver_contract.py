"""Driver-contract guards: the surfaces the correctness/bench driver
touches must stay wired — a rename that orphans a bench headline entry
or an oracle key fails here, not in the driver's round report."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
import bench  # noqa: E402
from ingest_pipeline_spark import queries as q  # noqa: E402


def test_registry_and_oracles_consistent():
    qs = q.queries()
    oracles = q.oracle_sql()
    assert set(oracles) <= set(qs)
    # rows-only queries are the deliberate non-SQL-expressible ones
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "source_listing",
        "text_bpe_learn_merges",  # iterative merge loop: reference-
        # trainer equality unit instead (tests/test_bpe.py)
        "corpus_pack_ffd",  # Best-Fit-Decreasing bin packing: greedy
        # multiset-state loop, not SQL-expressible; naive-BFD equality
        # + invariant units instead (tests/test_packing.py)
        # (graph_kcore_parts and graph_mst_copurchase gained
        # materialized unrolled-round oracles in r12 — the
        # graph_lpa_communities trick)
    }
    # no duplicate registrations silently overwrote each other
    assert len(qs) >= 104


def test_driver_first_block_is_registered_and_sized():
    qs = q.queries()
    names = list(qs)
    assert len(set(q._DRIVER_FIRST)) == len(q._DRIVER_FIRST)
    # the driver grades exactly the first 50 — an oversized priority
    # list silently pushes its own tail outside the graded window
    assert len(q._DRIVER_FIRST) == 50, len(q._DRIVER_FIRST)
    missing = [n for n in q._DRIVER_FIRST if n not in qs]
    assert not missing, f"_DRIVER_FIRST references unknown queries: {missing}"
    # the driver grades the first 50: round 13's window must contain
    # ALL 27 remaining r6-stale greens (r12-verdict ask #1 — the end
    # of the freshness rotation) plus graph_kcore_parts (re-graded:
    # its parameters changed to 2-core/support>=2 this round so the
    # sf0.01 driver row is non-empty — r12-verdict ask #2), and the
    # permanently-rows-only entries must NOT burn slots (each would
    # sit as an eternal `no_oracle` row)
    first50 = set(names[:50])
    for must in ("lineitem_shipping_lag_stats", "mine_hard_negatives",
                 "nation_trade_balance", "orders_backlog_aging",
                 "pareto_revenue_concentration",
                 "profile_functional_dependency", "quality_logistic_score",
                 "report_monthly_top_parts", "report_yoy_growth",
                 "sample_weighted_orders", "scd2_point_in_time_join",
                 "search_bm25_topk", "sessions_maintenance_overlap",
                 "sessions_peak_concurrency", "similarity_ivf_topk_det",
                 "sketch_cms_heavy_hitters", "sketch_hll_distinct",
                 "sketch_hll_rolling_users", "sketch_hll_set_algebra",
                 "skyline_pareto_parts", "stats_chi2_independence",
                 "stats_correlation_lineitem", "supplier_share_of_wallet",
                 "text_bigram_perplexity", "text_pmi_collocations",
                 "window_cume_dist_prices", "zorder_locality_stats",
                 "graph_kcore_parts"):
        assert must in first50, f"{must} fell out of the driver's window"
    assert "source_listing" not in first50
    assert "text_bpe_learn_merges" not in first50
    assert "corpus_pack_ffd" not in first50


def test_bench_headline_entries_registered():
    qs = q.queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"bench headline references unknown queries: {missing}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_entry_runs_and_is_stable(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == entrymod.entry(spark).columns
