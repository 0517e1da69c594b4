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
    # the driver grades the first 50: round 15's window must contain
    # ALL 33 remaining r7-stale greens (r14-verdict ask #7 — the
    # freshness rotation continues; verified against
    # CORRECTNESS_r01..r14), and the permanently-rows-only entries
    # must NOT burn slots (each would sit as an eternal `no_oracle`
    # row)
    first50 = set(names[:50])
    for must in ("graph_adamic_adar", "graph_degree_assortativity",
                 "graph_triangle_count", "linkage_surprisal_pairs",
                 "market_concentration_hhi", "multimodal_work_plan",
                 "orders_autocorr_daily", "orders_benford_digit_audit",
                 "orders_cohort_ltv", "orders_price_decile_stats",
                 "orders_runs_test", "orders_seasonal_index",
                 "quality_roc_auc", "quantiles_exact_global",
                 "quantiles_histogram_estimate", "similarity_ann_recall",
                 "stats_anova_oneway", "stats_group_mad",
                 "stats_group_median", "stats_kendall_tau",
                 "stats_ks_two_sample", "stats_linear_trend",
                 "stats_mannwhitney_u", "stats_mode_per_group",
                 "stats_spearman_rank", "stats_weighted_median_brand",
                 "stats_winsorized_mean", "survival_customer_churn",
                 "text_bpe_pair_stats", "text_bpe_token_budget",
                 "text_source_kl_divergence", "text_vocab_coverage",
                 "text_zipf_slope"):
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
