"""Partitioning invariance: representative queries produce BIT-IDENTICAL
results regardless of shuffle fan-out.

This is the local stand-in for "would the answer change on a
1000-executor cluster": every accumulation-order hazard (float sums,
first/last without order, per-partition ids leaking into results) shows
up as a diff between shuffle.partitions=3 and =32.  The decimal-internal
sum rule and full ORDER BY tiebreaks exist precisely to make this hold.
"""

import pytest

from ingest_pipeline_spark.queries import queries

# Chosen to cover the hazard classes: multi-stage float aggregation,
# window cumsums, iterative numerics, salted two-stage merge, banded
# join dedup, top-k ranking.
REPRESENTATIVE = [
    "q1_pricing_summary",
    "corpus_pack_sequences",
    "dedup_minhash_lsh",
    "embedding_nearest_centroid",
    "graph_pagerank_suppliers",
    "agg_salted_hot_keys",
    "tfidf_top_terms",
    "merge_upsert_orders",
    # r5 late additions: decimal moments feeding IEEE z-scores, integer
    # sketch registers, IVM partial-agg merge, prune-verify similarity
    # join, exponential-key weighted sampling
    "anomaly_zscore_events",
    "sketch_hll_distinct",
    "incremental_join_maintenance",
    "dedup_prefix_jaccard",
    "sample_weighted_orders",
    # salted join: rand() salt is partition-dependent BY DESIGN; the
    # result must still be invariant (salt is distribution-only)
    "join_salted_hot_events",
    # min-plus relaxation: MIN is order-free, path sums per-row IEEE
    "graph_shortest_paths",
    # r6 hazard classes: two-phase prefix scans (pid count varies WITH
    # the partitioning — offsets must compose to the same totals),
    # fixpoint frontier rounds, CDC latest-wins compaction, HLL
    # register merge across a time window, decimal OLS co-moments
    "pareto_revenue_concentration",
    "customer_rfm_segments",
    "orders_price_decile_stats",
    "graph_bfs_fixpoint",
    "cdc_apply_changes",
    "sketch_hll_rolling_users",
    "stats_linear_trend",
    # grouped prefix rank (per-group offsets compose across pid counts)
    # and degree-ordered triangle orientation (pure integer, any split)
    "stats_group_median",
    "graph_triangle_count",
    # 12-dp-rounded ratio terms decimal-summed (the tfidf discipline)
    "market_concentration_hhi",
    # positional clamping via grouped prefix rank; tied bounds self-clamp
    "stats_winsorized_mean",
    # global token prefix scan → shard ids (pid-count-dependent offsets
    # must compose identically) and keyed-rank Gini decimal Σ(i·x)
    "corpus_token_shards",
    "customer_gini_by_nation",
    # smoothed-probability grid decimal term sum; double grouped
    # positional medians via the grouped prefix scan
    "text_source_kl_divergence",
    "stats_group_mad",
    # two shared-scan prefix CDFs + scaled-integer sup argmax
    "stats_ks_two_sample",
    # value-at-global-rank extraction (tie order varies, value must not)
    "quantiles_exact_global",
    # grouped + global rank matched by rational positions
    "docs_quantile_normalize",
    # r7 hazard classes: per-Arrow-batch integer gram partials (batch
    # boundaries move with partitioning — int64 sums must compose),
    # HLL register max-propagation over edge joins, rational credit
    # fractions decimal-summed per touch, ROLLUP over a ranked join
    "embedding_top_component",
    "graph_hyperball_neighborhood",
    "events_attribution_position",
    "rec_precision_at_k",
    # synchronous LPA: per-round frequency argmax must not depend on
    # vote arrival order (min-struct over counts)
    "graph_lpa_communities",
    # r8 hazard classes: gaps-and-islands row_number on a pair/diagonal
    # partition (island grouping must not depend on shuffle order);
    # interval-union running-max flag windows under duplicate intervals
    "dedup_max_spans",
    "corpus_span_dedup_cut",
    # per-rep md5-rank permutation + integer-numerator decision
    "stats_permutation_test",
    # prefix-ntile deciles + first-occurrence MIN join must compose
    # identically across pid counts
    "corpus_heaps_curve",
    # Boruvka: per-component min-struct argmin + contraction fixpoint
    "graph_mst_copurchase",
    # r9 hazard classes: first-occurrence keep-first line dedup (MIN over
    # composite keys must not depend on shuffle order); global prefix
    # running max over a jittered arrival order (offsets compose across
    # pid counts, ties on the arrival key broken by event_id)
    "corpus_line_dedup",
    "events_late_arrival_audit",
    # decimal dist2 min-struct argmin must not depend on partial-agg
    # merge order; pigeonhole chunk join + distinct pair dedup
    "similarity_pq_index_upsert",
    "dedup_image_dhash",
    # r10 hazard classes: integer Lloyd codebook (census collect/merge
    # order must not leak into the learned centroids) and prefix-band
    # decimal dots ranked under a per-(dim, query) window
    "similarity_pq_topk",
    "embedding_matryoshka_agreement",
    # late-r10 hazard classes: DSIR top-100 boundary over 6-dp scores
    # (decimal term sums + tiebroken ordered limit), CDC chunk islands
    # (per-doc lag window over cut offsets + MIN-struct first
    # occurrence), two chained bounded top-k passes (pass-2 term list
    # derives from pass-1's boundary), exact-integer JL distance bands,
    # grouped prefix rank at the conformal quantile position
    "corpus_dsir_selection",
    "dedup_cdc_chunks",
    "search_rocchio_expansion",
    "embedding_jl_projection_audit",
    "stats_conformal_interval",
    # k-NN means as integer rationals + two keyed rank windows + a
    # margin top-20 boundary — every piece must compose across splits
    "similarity_margin_pairs",
    # r11 hazard classes: Arrow-batch band dots / argmin encodes (batch
    # boundaries move with partitioning, int64 partials must compose),
    # struct-sort anchor argmax replacing the window (ordering parity
    # incl. -0.0/NaN normalization), md5-retention record sampling +
    # regex masking under the corpus spread repartition
    "similarity_ivfpq_topk_det",
    "similarity_index_upsert",
    "fastq_scrub",
    "multimodal_h264_frames",
    # r12 hazard classes: sign-bit word packing is a conditional
    # shiftleft SUM (partial-agg merge order must not move any bit),
    # then two tiebroken rank boundaries (Hamming top-8, cosine top-3);
    # unrolled Boruvka selection + min-label contraction must compose
    # across splits (ROW_NUMBER argmin per component)
    "embedding_binary_hamming_topk",
    "graph_mst_copurchase",
    # r12 incremental FPS rewrite: the running greatest() max-sim and
    # the per-round (mx, id) argmin must not depend on split order
    "sample_kcenter_coreset",
]


def _rows(spark, name, sf_dir, partitions):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        df = queries()[name](spark, sf_dir)
        return sorted(map(tuple, df.collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_result_invariant_under_shuffle_fanout(spark, sf_dir, name):
    a = _rows(spark, name, sf_dir, 3)
    b = _rows(spark, name, sf_dir, 32)
    assert a == b, f"{name}: result depends on shuffle partitioning"
