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
    # the driver grades the first 50: round 12's window must contain
    # ALL 23 r5-stale greens (r11-verdict ask #1) plus the two graph
    # fixpoint queries that gained oracles this round, and the
    # permanently-rows-only entries must NOT burn slots (each would
    # sit as an eternal `no_oracle` row)
    first50 = set(names[:50])
    for must in ("q8_market_share", "q9_product_profit",
                 "q12_late_shipment_priority", "q13_order_count_census",
                 "q14_promo_revenue_share", "q15_top_supplier",
                 "q16_supplier_part_census", "q18_large_volume_orders",
                 "q19_disjunctive_revenue", "range_join_error_clicks",
                 "reorganize_multiassay_merge", "sample_reservoir_groups",
                 "scd2_status_history", "similarity_pq_topk_det",
                 "snapshot_delta", "stream_neardup_records",
                 "text_chunk_documents", "text_pii_scrub",
                 "text_rolling_hash", "text_token_entropy",
                 "tfidf_top_terms", "token_crypto_roundtrip",
                 "window_moving_range_sum",
                 "graph_kcore_parts", "graph_mst_copurchase"):
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
