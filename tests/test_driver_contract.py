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
        "graph_kcore_parts",  # iterative peeling: not SQL-expressible
        "text_bpe_learn_merges",  # iterative merge loop: reference-
        # trainer equality unit instead (tests/test_bpe.py)
        "graph_mst_copurchase",  # Boruvka rounds: not SQL-expressible;
        # exact Kruskal equality unit instead (tests/test_mst.py)
        "corpus_pack_ffd",  # Best-Fit-Decreasing bin packing: greedy
        # multiset-state loop, not SQL-expressible; naive-BFD equality
        # + invariant units instead (tests/test_packing.py)
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
    # the driver grades the first 50: the 22 oracle-backed queries that
    # had never been driver-sampled before r11 must be inside round 11's
    # window (plus stale-re-sample spot checks from the r5 band), and
    # the permanently-rows-only entries must NOT burn slots (each would
    # sit as an eternal `no_oracle` row)
    first50 = set(names[:50])
    for must in ("similarity_pq_topk", "multimodal_jpeg_roundtrip",
                 "embedding_matryoshka_agreement", "corpus_dsir_selection",
                 "dedup_cdc_chunks", "similarity_margin_pairs",
                 "events_sequence_regex", "graph_rich_club",
                 "validate_referential_integrity", "mdm_golden_record",
                 "privacy_k_anonymity_audit", "multimodal_video_keyframes",
                 "corpus_prepare_training", "graph_pagerank_suppliers",
                 "merge_upsert_orders", "q2_min_cost_supplier"):
        assert must in first50, f"{must} fell out of the driver's window"
    assert "source_listing" not in first50
    assert "graph_kcore_parts" not in first50
    assert "text_bpe_learn_merges" not in first50
    assert "graph_mst_copurchase" not in first50
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
