"""Query registry: the driver-facing surface of the engine.

``build_queries()`` returns ``(queries, oracles)`` — one entry per
implemented operator from SURVEY.md §2 (plus the training-data operators).
Each query callable takes ``sf_dir`` and returns a ``ray.data.Dataset``
(or pandas/pyarrow for small results); the matching oracle is ANSI SQL
DuckDB runs over the same parquet tables.  Nothing here calls
``ray.init`` — the caller owns the Ray session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from prlib_ray import oracles
from prlib_ray.stages import threshold


def _binarize_query(rule: str, **params) -> Callable[[str], Any]:
    def q(sf_dir: str):
        import ray.data as rd

        ds = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return threshold.binarize(ds, rule, **params)

    q.__name__ = f"binarize_{rule}"
    return q


def build_queries() -> tuple[dict[str, Callable[[str], Any]], dict[str, str]]:
    queries: dict[str, Callable[[str], Any]] = {}
    sql: dict[str, str] = {}

    # §2.1 binarization family — windowed block keep/drop over documents.
    for rule in threshold.RULES:
        name = f"binarize_{rule}"
        queries[name] = _binarize_query(rule)
        sql[name] = oracles.binarize_sql(rule)

    # FBCITB OPERATIONS flags (binarizeFBCITB.h:39-51): the edge-only and
    # variance-only detection paths as param-driven query variants
    queries["binarize_fbcitb_edges"] = _binarize_query("fbcitb", paths="edge")
    sql["binarize_fbcitb_edges"] = oracles.binarize_sql("fbcitb_edges")
    queries["binarize_fbcitb_var"] = _binarize_query("fbcitb", paths="var")
    sql["binarize_fbcitb_var"] = oracles.binarize_sql("fbcitb_var")

    # binarizeByLocalVariancesWithoutFilters: same rule, reference's
    # lighter parameters (binarizeByLocalVariances.cpp:143-292)
    queries["binarize_local_variances_nofilter"] = _binarize_query(
        "local_variances", min_var=10.0
    )
    sql["binarize_local_variances_nofilter"] = oracles.binarize_sql(
        "local_variances_nofilter"
    )

    # corpus-global WolfJolion variant (aggregate-then-broadcast pattern);
    # the global min/max make it non-expressible as a per-row SQL mirror of
    # the same *structure*, but the value is still SQL-expressible:
    def binarize_wolf_global(sf_dir: str):
        import ray.data as rd

        ds = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return threshold.binarize_wolf_global(ds)

    queries["binarize_wolf_global"] = binarize_wolf_global
    sql["binarize_wolf_global"] = oracles.wolf_global_sql()

    _register_more(queries, sql)
    return _prioritize(queries, sql)


# Driver-window rotation.  The driver's correctness gate records exactly
# the FIRST 50 registry entries each round, so registration order is a
# coverage decision.  Rounds 1-4 recorded 180 oracle-green names (plus
# the 6 r2 `no_oracle` LSH/SimHash rows whose oracles only landed in r3
# — those count as never oracle-recorded).  This round's 50 slots go to
# the 63-name never-oracle-recorded set: the 6 LSH/SimHash names first
# (VERDICT r4 item 1), then the TPC-H / corpus-stats tail; the 13
# lowest-risk shapes (trivial sampling/profile ops, all sim+pytest
# green) stay at positions 51-63.  The op -> driver-green-round ledger
# lives in COVERAGE.md, "Driver window ledger" — keep it in sync with
# every rotation.
_PRIORITY = [
    # -- round-5 window: 50 never-oracle-recorded names --------------
    "dedup_simhash", "dedup_simhash_hamming", "dedup_clusters_minhash",
    "dedup_embedding_lsh", "lsh_bucket_stats", "ann_bruteforce_topk",
    "ann_pq_adc_topk", "pq_codes", "q2_min_cost_supplier",
    "q11_important_stock", "q12_shipmode_priority", "q14_promo_revenue",
    "q15_top_supplier", "q17_small_quantity", "q18_large_orders",
    "q20_excess_parts", "basket_part_pairs", "bigram_lm_score",
    "brand_supplier_counts", "build_inverted_index", "chunk_tokens",
    "cms_word_frequency", "corpus_diff", "dedup_best_survivor",
    "dup_ngram_fraction", "dup_substring_fraction", "embedding_outliers",
    "event_transitions", "followed_within", "fulfillment_latency",
    "global_sales_opportunity", "label_centroid_affinity",
    "label_norm_quantiles", "lang_agreement", "orders_with_late_items",
    "repetition_stats", "retention_cohorts", "rolling_event_window",
    "sales_rollup", "segment_dedup", "source_minhash_jaccard",
    "source_overlap", "source_term_stats", "source_word_lift",
    "tfidf_top_term", "token_count_subword", "unigram_freq_score",
    "user_path_topk", "user_stickiness", "vocab_oov_rate",
    # -- remaining never-recorded (13): trivial sampling/profile
    # shapes, sim+pytest green; final-sweep candidates ---------------
    "shuffle_head", "hot_keys", "mix_sources", "sample_per_source",
    "split_assign", "length_filter_p95", "key_skew_profile",
    "interarrival_profile", "length_rank_transform",
    "customer_running_total", "customers_without_orders",
    "heavy_hitter_words", "sampled_quantiles",
    # -- driver-green in r4 (50 ops; round per name: COVERAGE.md) ----
    "binarize_fbcitb_edges", "binarize_fbcitb_var", "binarize_niblack_morph",
    "binarize_wolf_morph", "binarize_feng_morph", "binarize_local_otsu_morph",
    "binarize_cococlust_morph", "warp_crop_points",
    "compare_extraction_fraction", "q16_supplier_cnt", "q4_order_priority",
    "q8_market_share", "q19_disjunctive_revenue", "q21_waiting_suppliers",
    "q13_custdist", "q10_returned_revenue", "hits_scores", "link_reciprocity",
    "indegree_histogram", "pagerank_mass_audit", "fk_orphan_audit",
    "column_drift_tvd", "bpe_token_count", "kcenter_coreset",
    "ann_recall_audit", "ann_dim_truncation_audit", "entity_resolution",
    "corpus_merkle", "token_budget_fill", "dedup_unicode", "ngram_novelty",
    "dedup_threshold_curve", "dedup_containment", "doc_stitch_candidates",
    "split_no_leakage", "multimodal_resize", "multimodal_frame_sample",
    "events_hopping_window", "events_late_by_watermark", "search_topk",
    "pareto_orders", "bloom_semi_join", "funnel_conversion",
    "price_rank_ntile", "frequent_ngrams", "hard_negatives",
    "segment_price_quantiles", "dedup_winnow_pairs", "dedup_semantic",
    "pii_scan",
    # -- driver-green in r1-r3 (round recorded per name: COVERAGE.md
    # ledger); prior in-window order preserved ----------------------
    "flagship_extract", "extract_turns_exact", "extract_turn_spans",
    "conv_structure_audit", "conv_extract_digest", "curate_corpus",
    "web_curate", "corpus_validate", "data_factory", "utf8_hygiene",
    "profile_columns", "dedup_exact", "dedup_normalized",
    "dedup_sorted_neighborhood", "dedup_edit_distance",
    "dedup_rate_by_source", "cross_source_dup_matrix", "dedup_minhash_lsh",
    "dedup_prefix_filter", "cdc_chunk_dups", "dedup_embedding",
    "cluster_top_terms", "cluster_balance", "dedup_incremental",
    "snapshot_diff", "pagerank_docs", "anchor_text_stats",
    "crawl_frontier_depth", "triangle_count", "knn_label_agreement",
    "mmr_diversified_topk", "ann_ivf_topk", "ann_lsh_topk",
    "tokenizer_budget_curve", "bpe_train", "gopher_quality",
    "quality_classifier", "dsir_select", "split_leakage", "decontaminate",
    "pack_sequences", "pii_redact", "q9_product_profit", "props_field_stats",
    "weighted_sample", "pmi_top_pairs", "price_zscore_outliers",
    "trade_volume", "rolling_active_users", "asof_latest_order",
    "q3_top_orders", "range_join_recent_orders",
    "orders_by_segment", "top_orders_per_segment",
    "events_hourly_window", "sessionize",
    "set_ops_users_customers", "approx_distinct_users", "reassemble_events",
    "deskew", "dedup_cc_clusters", "q5_local_supplier", "q1_pricing_summary",
    "fingerprint_md5",
    "fingerprint_winnow", "multimodal_decode", "pipeline_chain",
    "embedding_centroids", "ann_neighbor_counts", "quality_score", "lang_id",
    "dedup_ngram_jaccard", "token_count", "dedup_survivors",
    "binarize_sauvola", "denoise_kuwahara_iterated",
    "q6_forecast_revenue", "warp_crop", "source_csv_roundtrip", "top_orders",
    "distinct_event_types", "compare_extractions", "source_jsonl_roundtrip",
    "binarize_niblack", "binarize_nick", "binarize_wolf", "binarize_feng",
    "binarize_pure_adaptive", "binarize_pure_adaptive_gaussian",
    "binarize_at", "binarize_agt", "binarize_gat", "binarize_mokji",
    "binarize_fbcitb", "binarize_cococlust", "binarize_local_variances",
    "binarize_local_otsu", "binarize_native_adaptive",
    "binarize_local_variances_nofilter", "binarize_wolf_global",
    "background_normalization", "clean_background_to_white",
    "gamma_correction", "color_balance", "correct_nuil",
    "simple_white_balance", "denoise_salt_pepper", "denoise_nlm",
    "basic_deblur", "denoise_kuwahara", "wiener_filter", "remove_lines",
    "remove_dots", "remove_hole_punch", "is_blurred", "is_glared",
    "thin_zhang_suen", "thin_guo_hall", "document_contour",
    "document_contour_retry", "check_rectangle", "auto_crop",
    "find_hough_line_contour", "resize", "split_page",
    "gray_world_white_balance", "find_angle", "find_orientation", "rotate",
    "binarize_sauvola_morph",
]


def _prioritize(queries, sql):
    ordered = {}
    for name in _PRIORITY:
        if name in queries:
            ordered[name] = queries[name]
    for name, fn in queries.items():
        if name not in ordered:
            ordered[name] = fn
    osql = {n: sql[n] for n in ordered if n in sql}
    return ordered, osql


def _register_more(queries, sql) -> None:
    """Extended families appended as they are implemented (see api_ext)."""
    from prlib_ray import api_ext

    api_ext.register(queries, sql)
