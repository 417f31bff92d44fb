"""Registration of the normalize/denoise/furniture/quality/thinning/crop
families into the driver-facing query registry (see prlib_ray/api.py)."""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from prlib_ray import oracles_ext as osql
from prlib_ray.stages import crop, denoise, furniture, normalize, quality, thinning


def _doc_query(batch_fn, columns=("doc_id", "text")) -> Callable[[str], Any]:
    def wrapped(b):
        import pyarrow as pa

        if b.num_rows == 0:
            # run the kernel on a typed dummy row and slice to zero rows:
            # keeps the output schema stable for empty read-task blocks.
            # The dummy is built from the batch's ACTUAL schema (not name
            # heuristics) so string ids / extra column types can't make
            # the empty block's schema diverge from non-empty blocks.
            def neutral(t: pa.DataType):
                if pa.types.is_integer(t) or pa.types.is_floating(t):
                    return pa.array([0], type=t)
                if pa.types.is_string(t) or pa.types.is_large_string(t):
                    return pa.array([""], type=t)
                if pa.types.is_binary(t) or pa.types.is_large_binary(t):
                    return pa.array([b""], type=t)
                return pa.array([None], type=t)

            dummy = pa.table(
                {f.name: neutral(f.type) for f in b.schema}
            )
            return batch_fn(dummy).slice(0, 0)
        return batch_fn(b)

    def q(sf_dir: str):
        import ray.data as rd

        ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))
        return ds.map_batches(wrapped, batch_format="pyarrow", zero_copy_batch=True)

    return q


_DOC_OPS: list[tuple[str, Callable, str]] = [
    # §2.5 normalization family
    ("background_normalization", normalize.background_normalization_batch,
     osql.BACKGROUND_NORMALIZATION),
    ("clean_background_to_white", normalize.clean_background_batch,
     osql.CLEAN_BACKGROUND),
    ("gamma_correction", normalize.gamma_correction_batch, osql.GAMMA_CORRECTION),
    ("color_balance", normalize.color_balance_batch, osql.COLOR_BALANCE),
    ("correct_nuil", normalize.correct_nuil_batch, osql.CORRECT_NUIL),
    ("simple_white_balance", normalize.simple_white_balance_batch,
     osql.SIMPLE_WHITE_BALANCE),
    # §2.3 denoise/deblur family
    ("denoise_salt_pepper", denoise.denoise_salt_pepper_batch,
     osql.DENOISE_SALT_PEPPER),
    ("denoise_nlm", denoise.denoise_nlm_batch, osql.DENOISE_NLM),
    ("basic_deblur", denoise.basic_deblur_batch, osql.BASIC_DEBLUR),
    ("denoise_kuwahara", denoise.kuwahara_batch, osql.KUWAHARA),
    ("wiener_filter", denoise.wiener_batch, osql.WIENER),
    # §2.4 artifact removal
    ("remove_lines", furniture.remove_lines_batch, osql.REMOVE_LINES),
    ("remove_dots", furniture.remove_dots_batch, osql.REMOVE_DOTS),
    ("remove_hole_punch", furniture.remove_hole_punch_batch,
     osql.REMOVE_HOLE_PUNCH),
    # §2.6 detectors + thinning
    ("is_blurred", quality.blur_scores_batch, osql.BLUR_SCORES),
    ("is_glared", quality.glare_scores_batch, osql.GLARE_SCORES),
    ("thin_zhang_suen", thinning.thin_zhang_suen_batch, osql.THIN_ZHANG_SUEN),
    ("thin_guo_hall", thinning.thin_guo_hall_batch, osql.THIN_GUO_HALL),
    # §2.2 border detection / crop
    ("document_contour", crop.document_contour_batch, osql.DOCUMENT_CONTOUR),
    ("document_contour_retry", crop.document_contour_retry_batch,
     osql.DOCUMENT_CONTOUR_RETRY),
    ("check_rectangle", crop.check_rectangle_batch, osql.CHECK_RECTANGLE),
    ("auto_crop", crop.autocrop_batch, osql.AUTOCROP),
    ("find_hough_line_contour", crop.hough_region_batch, osql.HOUGH_REGION),
    ("resize", crop.resize_batch, osql.RESIZE),
    ("split_page", crop.split_page_batch, osql.SPLIT_PAGE),
]


def register(queries: dict[str, Callable[[str], Any]], sql: dict[str, str]) -> None:
    for name, fn, oracle in _DOC_OPS:
        queries[name] = _doc_query(fn)
        sql[name] = oracle

    def gray_world(sf_dir: str):
        import ray.data as rd

        ds = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
        )
        return normalize.gray_world_balance(ds)

    queries["gray_world_white_balance"] = gray_world
    sql["gray_world_white_balance"] = osql.GRAY_WORLD

    # iterated anisotropic Kuwahara as an ACTOR-POOL stage (per-worker
    # precomputed sector state + the reference's iterations param,
    # kuwaharaFilter.cpp:34, :164-166)
    queries["denoise_kuwahara_iterated"] = denoise.kuwahara_iterated
    sql["denoise_kuwahara_iterated"] = osql.KUWAHARA_ITERATED

    _register_reassemble(queries, sql)
    _register_relational(queries, sql)
    _register_data_ops(queries, sql)


def _register_data_ops(queries, sql) -> None:
    from prlib_ray import oracles_data as odata
    from prlib_ray.stages import dedup, multimodal, similarity, text_analysis

    # dedup family
    queries["dedup_exact"] = dedup.exact_dedup
    sql["dedup_exact"] = odata.EXACT_DEDUP
    # normalization-invariant exact dedup (planted case/whitespace
    # mutants keep the collapse path non-vacuous at every sf)
    queries["dedup_normalized"] = dedup.normalized_dedup
    sql["dedup_normalized"] = odata.NORMALIZED_DEDUP
    # NFC-fold dedup (planted precomposed/decomposed pairs — the
    # fixtures are ASCII, where NFC is the identity)
    queries["dedup_unicode"] = dedup.unicode_dedup
    sql["dedup_unicode"] = odata.UNICODE_DEDUP
    # Levenshtein verification of the bounded near-dup candidates
    # (planted one-word-substitution mutants keep small nonzero
    # distances non-vacuous at every sf)
    queries["dedup_edit_distance"] = dedup.edit_distance_pairs
    sql["dedup_edit_distance"] = odata.EDIT_DISTANCE_PAIRS
    # production survivor policy over the same normalized groups
    queries["dedup_best_survivor"] = dedup.best_survivor_dedup
    sql["dedup_best_survivor"] = odata.BEST_SURVIVOR_DEDUP
    # cross-split contamination audit over the normalized groups
    queries["split_leakage"] = dedup.split_leakage
    sql["split_leakage"] = odata.SPLIT_LEAKAGE
    # per-source dedup accounting + provenance matrix (planted
    # cross-source duplicates keep both non-vacuous at every sf)
    queries["dedup_rate_by_source"] = dedup.dedup_rate_by_source
    sql["dedup_rate_by_source"] = odata.DEDUP_RATE_BY_SOURCE
    queries["cross_source_dup_matrix"] = dedup.cross_source_dup_matrix
    sql["cross_source_dup_matrix"] = odata.CROSS_SOURCE_DUP_MATRIX
    # MOSS-style shared-winnow-fingerprint pairs (df-capped stop
    # fingerprints; reuses fingerprint_winnow's selection kernel)
    queries["dedup_winnow_pairs"] = dedup.winnow_pair_dedup
    sql["dedup_winnow_pairs"] = odata.WINNOW_PAIRS
    queries["dedup_ngram_jaccard"] = dedup.ngram_jaccard_pairs
    sql["dedup_ngram_jaccard"] = odata.NGRAM_JACCARD
    # exact similarity self-join over the FULL corpus via prefix
    # filtering (AllPairs/PPJoin): complete recall by construction, so
    # the oracle is unbounded — the only whole-table exact-Jaccard gate
    # in the registry (NGRAM_JACCARD's is doc_id-bounded)
    queries["dedup_prefix_filter"] = dedup.prefix_filter_join
    sql["dedup_prefix_filter"] = odata.PREFIX_FILTER
    # per-doc shingle novelty (corpus df == 1 fraction) — the
    # curation signal complementing intra-doc dup_ngram_fraction
    queries["ngram_novelty"] = dedup.ngram_novelty
    sql["ngram_novelty"] = odata.NGRAM_NOVELTY
    # threshold-sweep curve over the COMPLETE prefix-filter pair set
    # (every tau >= 50 exact — an LSH curve would under-count)
    queries["dedup_threshold_curve"] = dedup.dedup_threshold_curve
    sql["dedup_threshold_curve"] = odata.DEDUP_THRESHOLD_CURVE
    # asymmetric subset-duplication pairs (containment of the smaller
    # doc's shingles; planted snippet docs make it fire where Jaccard
    # cannot)
    queries["dedup_containment"] = dedup.containment_pairs
    sql["dedup_containment"] = odata.CONTAINMENT_PAIRS
    # CDC chunk-level cross-doc duplicate inventory: the chunk-hash
    # scale path the containment family documents, made real —
    # content-defined boundaries re-align duplicated passages under
    # insertions where fixed windows cannot
    queries["cdc_chunk_dups"] = dedup.cdc_chunk_dups
    sql["cdc_chunk_dups"] = odata.CDC_CHUNK_DUPS
    # the three-stage record-linkage pipeline composed end-to-end:
    # SNM blocking -> Levenshtein verify -> CC entity labels
    queries["entity_resolution"] = dedup.entity_resolution
    sql["entity_resolution"] = odata.ENTITY_RESOLUTION
    # shard-boundary stitching: last CDC chunk of one doc == first of
    # another (the crawl split-record signature), shared chunker
    queries["doc_stitch_candidates"] = dedup.doc_stitch_candidates
    sql["doc_stitch_candidates"] = odata.DOC_STITCH
    # sorted-neighborhood candidate pairs: exact global-order windowing
    # via ordered range partitions + a dense-rank forward halo (no
    # global sort exchange)
    queries["dedup_sorted_neighborhood"] = dedup.sorted_neighborhood_pairs
    sql["dedup_sorted_neighborhood"] = odata.SORTED_NEIGHBORHOOD
    # the banding itself mirrors in SQL (md5_number shingle ids, HUGEINT
    # (a*x+b) mod p minhashes, ':'-joined band sigs): full exact oracle
    queries["dedup_minhash_lsh"] = dedup.minhash_lsh_dedup
    sql["dedup_minhash_lsh"] = odata.MINHASH_LSH
    # bit-exact SQL mirror via DuckDB md5_number_upper + bit-index remap
    queries["dedup_simhash"] = _doc_query(dedup.simhash_batch)
    sql["dedup_simhash"] = odata.SIMHASH
    # no-silent-caps observability for the LSH bucket explosion guard —
    # same banding CTEs as MINHASH_LSH, aggregated
    queries["lsh_bucket_stats"] = dedup.lsh_bucket_stats
    sql["lsh_bucket_stats"] = odata.LSH_BUCKET_STATS
    # pairs -> connected components -> survivors (the dedup OUTPUT)
    queries["dedup_cc_clusters"] = dedup.dedup_cc_clusters
    sql["dedup_cc_clusters"] = odata.DEDUP_CC_CLUSTERS
    queries["dedup_survivors"] = dedup.dedup_survivors
    sql["dedup_survivors"] = odata.DEDUP_SURVIVORS
    # min-label fixpoint == component minimum: recursive-CTE oracle over
    # the SQL-mirrored minhash pairs
    queries["dedup_clusters_minhash"] = dedup.dedup_clusters_minhash
    sql["dedup_clusters_minhash"] = odata.CLUSTERS_MINHASH
    # leakage-free splits: assignment by near-dup CLUSTER label, so a
    # verified pair cannot cross train/test by construction
    queries["split_no_leakage"] = dedup.split_no_leakage
    sql["split_no_leakage"] = odata.SPLIT_NO_LEAKAGE
    queries["dedup_incremental"] = dedup.incremental_dedup
    sql["dedup_incremental"] = odata.INCREMENTAL_DEDUP
    queries["corpus_diff"] = dedup.corpus_diff
    sql["corpus_diff"] = odata.CORPUS_DIFF

    # text analysis
    queries["token_count"] = _doc_query(text_analysis.token_count_batch)
    sql["token_count"] = odata.TOKEN_COUNT
    queries["token_count_subword"] = _doc_query(
        text_analysis.token_count_subword_batch
    )
    sql["token_count_subword"] = odata.TOKEN_COUNT_SUBWORD
    queries["quality_score"] = _doc_query(text_analysis.quality_score_batch)
    sql["quality_score"] = odata.QUALITY_SCORE
    queries["gopher_quality"] = _doc_query(text_analysis.gopher_quality_batch)
    sql["gopher_quality"] = odata.GOPHER_QUALITY
    # hashed-feature linear model inference (actor-pool model load)
    queries["quality_classifier"] = text_analysis.quality_classifier
    sql["quality_classifier"] = odata.QUALITY_CLASSIFIER
    # DSIR-style importance resampling: target-vs-raw hashed-unigram
    # histograms -> exact-integer Laplace weights -> length-normalized
    # top-K selection (the published log-ratio becomes an integer
    # ratio so the oracle is exact)
    queries["dsir_select"] = text_analysis.dsir_select
    sql["dsir_select"] = odata.DSIR_SELECT
    # distributed BPE vocabulary training: greedy pair-merge rounds
    # over the word-frequency table, unrolled-rounds oracle with the
    # gaps-and-islands greedy-left merge semantics
    queries["bpe_train"] = text_analysis.bpe_train
    sql["bpe_train"] = odata.BPE_TRAIN
    # encode with the learned merges: per-doc BPE token counts (no
    # vocab broadcast — each batch replays the tiny merge list on its
    # own unique words); the oracle composes the SAME chain CTEs
    queries["bpe_token_count"] = text_analysis.bpe_token_count
    sql["bpe_token_count"] = odata.BPE_TOKEN_COUNT
    queries["repetition_stats"] = _doc_query(
        text_analysis.repetition_stats_batch
    )
    sql["repetition_stats"] = odata.REPETITION_STATS
    queries["lang_id"] = _doc_query(text_analysis.lang_id_batch)
    sql["lang_id"] = odata.LANG_ID
    queries["lang_agreement"] = text_analysis.lang_agreement
    sql["lang_agreement"] = odata.LANG_AGREEMENT
    # per-source mojibake/encoding audit (planted control/replacement/
    # accent suffixes — the fixtures are pure ASCII)
    queries["utf8_hygiene"] = text_analysis.utf8_hygiene
    sql["utf8_hygiene"] = odata.UTF8_HYGIENE
    queries["fingerprint_md5"] = _doc_query(text_analysis.fingerprint_batch)
    sql["fingerprint_md5"] = odata.FINGERPRINT
    queries["fingerprint_winnow"] = _doc_query(text_analysis.winnow_batch)
    sql["fingerprint_winnow"] = odata.WINNOW

    # similarity search
    queries["ann_neighbor_counts"] = similarity.ann_neighbor_counts
    sql["ann_neighbor_counts"] = odata.ANN_NEIGHBOR_COUNTS
    # integer-exact score (sign * cos^2 * 1e4, floor): full SQL oracle
    queries["ann_bruteforce_topk"] = similarity.ann_bruteforce_topk
    sql["ann_bruteforce_topk"] = odata.ANN_BRUTEFORCE
    # matryoshka dim-truncation recall audit (one scan, both variants)
    queries["ann_dim_truncation_audit"] = similarity.ann_dim_truncation_audit
    sql["ann_dim_truncation_audit"] = odata.ANN_DIM_TRUNCATION
    # contrastive hard-negative mining (wrong-class nearest neighbors)
    queries["hard_negatives"] = similarity.hard_negatives
    sql["hard_negatives"] = odata.HARD_NEGATIVES
    # farthest-from-own-centroid prune audit
    queries["embedding_outliers"] = similarity.embedding_outliers
    sql["embedding_outliers"] = odata.EMBEDDING_OUTLIERS
    # per-label norm spectrum (exact integer quantiles)
    queries["label_norm_quantiles"] = similarity.label_norm_quantiles
    sql["label_norm_quantiles"] = odata.LABEL_NORM_QUANTILES
    # recall<1 vs brute force, but the probe itself (md5-derived integer
    # hyperplane buckets + integer score) mirrors exactly in SQL
    queries["ann_lsh_topk"] = similarity.ann_lsh_topk
    sql["ann_lsh_topk"] = odata.ANN_LSH_TOPK
    # integer Lloyd training + integer probe: the ENTIRE index mirrors
    # in SQL (unrolled iteration CTEs) — full oracle despite recall<1
    queries["ann_ivf_topk"] = similarity.ann_ivf_topk
    sql["ann_ivf_topk"] = odata.ANN_IVF_TOPK
    # greedy k-center coreset (farthest-point diversity pruning) with
    # the unrolled-MATERIALIZED-rounds oracle discipline
    queries["kcenter_coreset"] = similarity.kcenter_coreset
    sql["kcenter_coreset"] = odata.KCENTER_CORESET
    # recall@k of the trained IVF index vs exact brute force — the
    # index-quality evaluation, composed from the two existing paths
    queries["ann_recall_audit"] = similarity.ann_recall_audit
    sql["ann_recall_audit"] = odata.ANN_RECALL_AUDIT

    # label-noise audit: exact kNN majority vote over the label column,
    # same integer score contract as the brute-force ranking
    queries["knn_label_agreement"] = similarity.knn_label_agreement
    sql["knn_label_agreement"] = odata.KNN_LABEL_AGREEMENT

    queries["dedup_embedding"] = similarity.embedding_near_dup_pairs
    sql["dedup_embedding"] = odata.EMBEDDING_NEAR_DUP
    # SemDedup: centroid-assign then within-cluster exact near-dup
    queries["dedup_semantic"] = similarity.dedup_semantic
    sql["dedup_semantic"] = odata.DEDUP_SEMANTIC
    # embedding-space class-balance audit (same assignment contract,
    # full table — no pairwise stage so the linear mirror is unbounded)
    queries["cluster_balance"] = similarity.cluster_balance
    sql["cluster_balance"] = odata.CLUSTER_BALANCE
    # pairwise label-centroid affinity (exact integer sums, cosine of
    # sums == cosine of means; pairwise math on the bounded table only)
    queries["label_centroid_affinity"] = similarity.label_centroid_affinity
    sql["label_centroid_affinity"] = odata.LABEL_CENTROID_AFFINITY
    # product-quantization codes (vector compression for the ANN index)
    queries["pq_codes"] = similarity.pq_codes
    sql["pq_codes"] = odata.PQ_CODES
    # the PQ query path: integer-Lloyd codebook training + ADC pricing +
    # exact re-rank, ALL mirrored in SQL (unrolled iteration CTEs)
    queries["ann_pq_adc_topk"] = similarity.ann_pq_adc_topk
    sql["ann_pq_adc_topk"] = odata.ANN_PQ_ADC
    # the scale path: LSH candidates + exact hugeint verify — candidate
    # generation mirrors in SQL too (integer hyperplanes), full oracle
    queries["dedup_embedding_lsh"] = similarity.embedding_near_dup_lsh
    sql["dedup_embedding_lsh"] = odata.EMBEDDING_LSH
    # grouped vector aggregate (centroid partial+final over list<float>)
    queries["embedding_centroids"] = similarity.embedding_centroids
    sql["embedding_centroids"] = odata.EMBEDDING_CENTROIDS
    # 16-bit band buckets + bit_count(xor) verify, mirrored end-to-end
    queries["dedup_simhash_hamming"] = dedup.simhash_hamming_dedup
    sql["dedup_simhash_hamming"] = odata.SIMHASH_HAMMING

    # dataset-prep family: mixing, epoch shuffle, decontamination, packing
    from prlib_ray import oracles_prep as oprep
    from prlib_ray.stages import dataset_prep

    queries["mix_sources"] = dataset_prep.mix_sources
    sql["mix_sources"] = oprep.MIX_SOURCES
    queries["shuffle_head"] = dataset_prep.shuffle_head
    sql["shuffle_head"] = oprep.SHUFFLE_HEAD
    queries["decontaminate"] = dataset_prep.decontaminate
    sql["decontaminate"] = oprep.DECONTAMINATE
    queries["pack_sequences"] = dataset_prep.pack_sequences
    sql["pack_sequences"] = oprep.PACK_SEQUENCES
    # the capstone composite: survivors -> Gopher gate -> leakage-free
    # splits -> per-split doc/token counts, all four stages the
    # registry's own oracle-proven ops composed unchanged
    queries["data_factory"] = dataset_prep.data_factory
    sql["data_factory"] = odata.DATA_FACTORY
    queries["chunk_tokens"] = dataset_prep.chunk_tokens
    sql["chunk_tokens"] = oprep.CHUNK_TOKENS
    queries["pii_scan"] = dataset_prep.pii_scan
    sql["pii_scan"] = oprep.PII_SCAN
    # the redaction transform the scan only measures (md5-proven)
    queries["pii_redact"] = dataset_prep.pii_redact
    sql["pii_redact"] = oprep.PII_REDACT
    queries["source_term_stats"] = dataset_prep.source_term_stats
    sql["source_term_stats"] = oprep.SOURCE_TERM_STATS
    # CDC-style snapshot reconciliation: the FULL OUTER join shape
    # (added/removed/changed/unchanged per source)
    queries["snapshot_diff"] = dataset_prep.snapshot_diff
    sql["snapshot_diff"] = oprep.SNAPSHOT_DIFF
    # per-conversation structural QA over the deterministic transcript
    # (role alternation / tool turns / char budgets)
    queries["conv_structure_audit"] = dataset_prep.conv_structure_audit
    sql["conv_structure_audit"] = oprep.CONV_STRUCTURE_AUDIT
    # conversation-level extraction digest: md5 of the '\n'-joined
    # clean turns in (conv, turn) order — the stable-ordering check
    from prlib_ray import oracles_data as _odata

    queries["conv_extract_digest"] = dataset_prep.conv_extract_digest
    sql["conv_extract_digest"] = _odata.CONV_EXTRACT_DIGEST
    # link-graph centrality: integer PageRank over the synthesized
    # closed doc graph (unrolled power iteration, exact both sides)
    from prlib_ray.stages.graph import pagerank_docs

    queries["pagerank_docs"] = pagerank_docs
    sql["pagerank_docs"] = oprep.PAGERANK_DOCS
    # inbound-link anchor aggregation over the same closed graph
    from prlib_ray.stages.graph import anchor_text_stats, pagerank_mass_audit

    queries["anchor_text_stats"] = anchor_text_stats
    sql["anchor_text_stats"] = oprep.ANCHOR_TEXT_STATS
    # per-iteration rank-mass telemetry (no-silent-iteration discipline)
    queries["pagerank_mass_audit"] = pagerank_mass_audit
    sql["pagerank_mass_audit"] = oprep.PAGERANK_MASS_AUDIT
    # BFS hops-from-seeds over the same closed graph (frontier-only
    # expansion, min-fold per coarse node-hash part, unrolled mirror)
    from prlib_ray.stages.graph import (
        crawl_frontier_depth, indegree_histogram, link_reciprocity,
        triangle_count)

    queries["crawl_frontier_depth"] = crawl_frontier_depth
    sql["crawl_frontier_depth"] = oprep.CRAWL_FRONTIER_DEPTH
    # link-graph shape audits: in-degree histogram, mutual-link census
    queries["indegree_histogram"] = indegree_histogram
    sql["indegree_histogram"] = oprep.INDEGREE_HISTOGRAM
    queries["link_reciprocity"] = link_reciprocity
    sql["link_reciprocity"] = oprep.LINK_RECIPROCITY
    # wedge-join triangle census (affine arms + planted closure arm)
    queries["triangle_count"] = triangle_count
    sql["triangle_count"] = oprep.TRIANGLE_COUNT
    # HITS hubs & authorities: the gather-join iterative discipline
    from prlib_ray.stages.graph import hits_scores

    queries["hits_scores"] = hits_scores
    sql["hits_scores"] = oprep.HITS_SCORES
    queries["length_filter_p95"] = dataset_prep.length_filter_p95
    sql["length_filter_p95"] = oprep.LENGTH_FILTER_P95
    queries["sample_per_source"] = dataset_prep.sample_per_source
    sql["sample_per_source"] = oprep.SAMPLE_PER_SOURCE
    queries["weighted_sample"] = dataset_prep.weighted_sample
    sql["weighted_sample"] = oprep.WEIGHTED_SAMPLE
    queries["frequent_ngrams"] = dataset_prep.frequent_ngrams
    sql["frequent_ngrams"] = oprep.FREQUENT_NGRAMS
    # bounded-memory Misra-Gries sketch + exact rescan (no-false-
    # negative guarantee checked at runtime) — exact oracle
    queries["heavy_hitter_words"] = dataset_prep.heavy_hitter_words
    sql["heavy_hitter_words"] = oprep.HEAVY_HITTER_WORDS

    # corpus-statistics family: corpus-wide side tables (vocabulary /
    # document frequency / cross-doc n-gram counts) attached back per doc
    from prlib_ray import oracles_corpus as ocorp
    from prlib_ray.stages import corpus_stats

    queries["unigram_freq_score"] = corpus_stats.unigram_freq_score
    sql["unigram_freq_score"] = ocorp.UNIGRAM_FREQ_SCORE
    # Merkle-style corpus digest: per-source leaves + root — the
    # integrity/versioning primitive a corpus registry publishes
    queries["corpus_merkle"] = corpus_stats.corpus_merkle
    sql["corpus_merkle"] = ocorp.CORPUS_MERKLE
    # exact water-filling token-budget allocation across sources (the
    # mixture-budgeting step; closed form on the bounded source dim)
    queries["token_budget_fill"] = corpus_stats.token_budget_fill
    sql["token_budget_fill"] = ocorp.TOKEN_BUDGET_FILL
    # corpus-trained bigram LM fluency score (KenLM/CCNet filter shape)
    queries["bigram_lm_score"] = corpus_stats.bigram_lm_score
    sql["bigram_lm_score"] = ocorp.BIGRAM_LM_SCORE
    queries["tfidf_top_term"] = corpus_stats.tfidf_top_term
    sql["tfidf_top_term"] = ocorp.TFIDF_TOP_TERM
    queries["dup_ngram_fraction"] = corpus_stats.dup_ngram_fraction
    sql["dup_ngram_fraction"] = ocorp.DUP_NGRAM_FRACTION
    queries["dup_substring_fraction"] = corpus_stats.dup_substring_fraction
    sql["dup_substring_fraction"] = ocorp.DUP_SUBSTRING_FRACTION
    queries["segment_dedup"] = corpus_stats.segment_dedup
    sql["segment_dedup"] = ocorp.SEGMENT_DEDUP
    queries["build_inverted_index"] = corpus_stats.build_inverted_index
    sql["build_inverted_index"] = ocorp.INVERTED_INDEX
    queries["search_topk"] = corpus_stats.search_topk
    sql["search_topk"] = ocorp.SEARCH_TOPK
    # pairwise source vocabulary overlap (bitmask histogram plan)
    queries["source_overlap"] = corpus_stats.source_overlap
    sql["source_overlap"] = ocorp.SOURCE_OVERLAP
    # its mergeable-sketch complement: per-source minhash signatures
    queries["source_minhash_jaccard"] = corpus_stats.source_minhash_jaccard
    sql["source_minhash_jaccard"] = ocorp.SOURCE_MINHASH_JACCARD
    # top-V vocabulary OOV fraction per source (tokenizer budget report)
    queries["vocab_oov_rate"] = corpus_stats.vocab_oov_rate
    sql["vocab_oov_rate"] = ocorp.VOCAB_OOV_RATE
    # word-association mining: doc-co-occurrence PMI over the top-V vocab
    queries["pmi_top_pairs"] = corpus_stats.pmi_top_pairs
    sql["pmi_top_pairs"] = ocorp.PMI_TOP_PAIRS
    # OOV mass at several candidate vocab sizes in one pass
    queries["tokenizer_budget_curve"] = corpus_stats.tokenizer_budget_curve
    sql["tokenizer_budget_curve"] = ocorp.TOKENIZER_BUDGET_CURVE
    # characteristic vocabulary per source (integer lift ranking)
    queries["source_word_lift"] = corpus_stats.source_word_lift
    sql["source_word_lift"] = ocorp.SOURCE_WORD_LIFT
    # cross-modal: characteristic words per EMBEDDING cluster
    queries["cluster_top_terms"] = corpus_stats.cluster_top_terms
    sql["cluster_top_terms"] = ocorp.CLUSTER_TOP_TERMS
    # pre-flight data-quality audit (planted corruption mirrors)
    from prlib_ray import oracles_data as odata

    queries["corpus_validate"] = corpus_stats.corpus_validate
    sql["corpus_validate"] = odata.CORPUS_VALIDATE
    # Count-Min sketch frequency estimates vs exact (observable tail)
    queries["cms_word_frequency"] = corpus_stats.cms_word_frequency
    sql["cms_word_frequency"] = ocorp.CMS_WORD_FREQUENCY
    # global rank transform via histogram-CDF broadcast (no global sort)
    queries["length_rank_transform"] = corpus_stats.length_rank_transform
    sql["length_rank_transform"] = ocorp.LENGTH_RANK_TRANSFORM

    # end-to-end curation funnel (gopher gate -> exact dedup ->
    # boilerplate drop), per-source accounting
    from prlib_ray.pipelines.curate import curate_corpus

    queries["curate_corpus"] = curate_corpus
    sql["curate_corpus"] = ocorp.CURATE_CORPUS

    # web-curation funnel: PageRank prior + in-degree gate alongside the
    # Gopher content gate (graph signals feeding curation)
    from prlib_ray import oracles_prep as _oprep
    from prlib_ray.pipelines.curate import web_curate

    queries["web_curate"] = web_curate
    sql["web_curate"] = _oprep.WEB_CURATE

    # config-driven pipeline assembly (SURVEY §2.7 extension surface)
    def pipeline_chain(sf_dir: str):
        from prlib_ray.pipeline import run_config

        return run_config(
            sf_dir,
            [
                {"stage": "normalize_whitespace"},
                {"stage": "remove_lines"},
                {"stage": "thin_zhang_suen"},
            ],
        )

    queries["pipeline_chain"] = pipeline_chain
    sql["pipeline_chain"] = odata.PIPELINE_CHAIN

    # multimodal plumbing (decode kernel stubbed, metadata exact)
    queries["multimodal_decode"] = multimodal.decode_pipeline
    sql["multimodal_decode"] = odata.MULTIMODAL_DECODE
    # decode -> resize actor-pool chain + frame-sample flat explode
    queries["multimodal_resize"] = multimodal.resize_pipeline
    sql["multimodal_resize"] = odata.MULTIMODAL_RESIZE
    queries["multimodal_frame_sample"] = multimodal.frame_sample_pipeline
    sql["multimodal_frame_sample"] = odata.MULTIMODAL_FRAME_SAMPLE

    # flagship transcript extraction (synthesized-fixture input; goldens are
    # the straight-line reference in pytest — rng synth is not
    # SQL-expressible, so the driver records a rows-only check)
    from prlib_ray.pipelines.extract import flagship

    def flagship_extract(sf_dir: str):
        # spans (list<struct>) don't survive the driver's pandas hash path
        # uniformly; project the hashable columns before the shuffle
        return flagship(sf_dir, include_spans=False)

    queries["flagship_extract"] = flagship_extract

    # exact-integer extraction twin: the SAME furniture rules + a Sauvola
    # keep decision restated in integer arithmetic (boilerplate.py:
    # extract_exact_batch derivation comment), over a transcript
    # synthesized DETERMINISTICALLY from documents — so the driver's
    # value hash checks per-turn extracted-text equality against a full
    # SQL mirror (the north rule's literal check; the rng flagship stays
    # the rows-only throughput path)
    def extract_turns_exact(sf_dir: str):
        import ray.data as rd

        from prlib_ray.stages.boilerplate import extract_exact_batch

        ds = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return ds.map_batches(
            extract_exact_batch, batch_format="pyarrow", zero_copy_batch=True
        )

    queries["extract_turns_exact"] = extract_turns_exact
    sql["extract_turns_exact"] = odata.EXTRACT_TURNS_EXACT

    # the SPANS view of the same extraction (SURVEY §1.2's spans column
    # as flat driver-hashable rows): one row per kept line with char
    # offsets into the turn's clean_text; shares _exact_line_frame so
    # the keep decisions cannot drift from extract_turns_exact
    def extract_turn_spans(sf_dir: str):
        import ray.data as rd

        from prlib_ray.stages.boilerplate import extract_spans_batch

        ds = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return ds.map_batches(
            extract_spans_batch, batch_format="pyarrow", zero_copy_batch=True
        )

    queries["extract_turn_spans"] = extract_turn_spans
    sql["extract_turn_spans"] = odata.EXTRACT_TURN_SPANS

    # MMR diversified retrieval: bounded greedy over the integer-score
    # shortlist, unrolled selection CTEs in the mirror
    from prlib_ray.stages.similarity import mmr_diversified_topk

    queries["mmr_diversified_topk"] = mmr_diversified_topk
    sql["mmr_diversified_topk"] = odata.MMR_DIVERSIFIED

    _register_morph_and_joins(queries, sql)


def _register_morph_and_joins(queries, sql) -> None:
    from prlib_ray import oracles_morph as omorph
    from prlib_ray.stages import crop
    from prlib_ray.stages.morphology import binarize_morph_batch

    # binarization morphIters epilogue for the whole family, with the
    # reference's per-op iteration defaults (binarizeSauvola.cpp:125-134
    # morphIters=2; binarizeNiblack.h:43-47 =2; binarizeWolfJolion.h =2;
    # binarizeFeng.h:46-53 =2; binarizeLocalOtsu.h:50-57 =1;
    # binarizeCOCOCLUST.h:50-56 =4.  binarizeNICK.h morphIters=0 -> the
    # plain binarize_nick query IS its reference default, no variant.)
    import functools

    for mrule, iters in [("sauvola", 2), ("niblack", 2), ("wolf", 2),
                         ("feng", 2), ("local_otsu", 1), ("cococlust", 4)]:
        mname = f"binarize_{mrule}_morph"
        queries[mname] = _doc_query(
            functools.partial(binarize_morph_batch, rule=mrule,
                              morph_iters=iters)
        )
        sql[mname] = omorph.binarize_morph_sql(mrule, iters)

    # warpCrop strict slice (warp.cpp:32-73): no fallback to full text
    def warp_batch(b):
        import numpy as np
        import pyarrow as pa

        from prlib_ray.blocks import split_words_blocks
        from prlib_ray.stages.crop import _islands

        from prlib_ray.blocks import join_kept

        frame = split_words_blocks(b["text"], 12)
        start, end, isum, dsum = _islands(frame)
        ok = (start >= 0) & (20 * isum >= dsum)
        bidx = frame.block_idx_within_doc()
        doc = frame.doc_of_block()
        # strict slice: gate-failing docs keep NOTHING ('' fallback)
        keep = ok[doc] & (bidx >= start[doc]) & (bidx <= end[doc])
        out = join_kept(frame, keep)
        return pa.table(
            {"doc_id": b["doc_id"], "clean_text": pa.array(out, type=pa.string())}
        )

    queries["warp_crop"] = _doc_query(warp_batch)
    sql["warp_crop"] = omorph.warp_crop_sql()

    # warpCrop (points) variant (warp.cpp:76-102): validates the corner
    # points BEFORE delegating to the coords transform — here the
    # CheckRectangle gates (area/side/angle) must all pass or the crop
    # is refused ('' like the strict coords variant on gate failure)
    def warp_points_batch(b):
        import pyarrow as pa

        from prlib_ray.stages.crop import check_rectangle_batch

        gates = check_rectangle_batch(b)
        quad_ok = gates["quad_ok"].to_numpy(zero_copy_only=False)
        starts = gates["span_start"].to_numpy()
        ends = gates["span_end"].to_numpy()
        from prlib_ray.blocks import join_kept, split_words_blocks

        frame = split_words_blocks(b["text"], 12)
        bidx = frame.block_idx_within_doc()
        doc = frame.doc_of_block()
        keep = quad_ok[doc] & (bidx >= starts[doc]) & (bidx <= ends[doc])
        out = join_kept(frame, keep)
        return pa.table(
            {"doc_id": b["doc_id"], "clean_text": pa.array(out, type=pa.string())}
        )

    queries["warp_crop_points"] = _doc_query(warp_points_batch)
    sql["warp_crop_points"] = omorph.warp_crop_points_sql()

    # compareImages analogue via the native hash join (Dataset.join)
    def compare_extractions(sf_dir: str):
        import pyarrow as pa
        import ray.data as rd

        from prlib_ray.stages import threshold

        base = f"{sf_dir}/documents.parquet"
        a = threshold.binarize(
            rd.read_parquet(base, columns=["doc_id", "text"]), "sauvola"
        )
        b = threshold.binarize(
            rd.read_parquet(base, columns=["doc_id", "text"]), "niblack"
        )
        joined = a.join(
            b, "inner", num_partitions=8, on=("doc_id",), right_suffix="_b"
        )

        def flag(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            eq = pc.equal(t["clean_text"], t["clean_text_b"])
            return pa.table({"doc_id": t["doc_id"], "equal": eq})

        return joined.map_batches(flag, batch_format="pyarrow")

    queries["compare_extractions"] = compare_extractions
    sql["compare_extractions"] = omorph.compare_extractions_sql()

    # compareImages FULL semantics (utils.cpp:37-86): per-document
    # fraction of exactly-equal lines between two operator outputs;
    # shape mismatch (different line counts) -> 0 like the reference's
    # 0.0 on size/type mismatch.  Integer (n_eq, n_lines) outputs.
    def compare_extraction_fraction(sf_dir: str):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data as rd

        from prlib_ray.stages import threshold

        base = f"{sf_dir}/documents.parquet"
        a = threshold.binarize(
            rd.read_parquet(base, columns=["doc_id", "text"]), "sauvola"
        )
        b = threshold.binarize(
            rd.read_parquet(base, columns=["doc_id", "text"]), "niblack"
        )
        joined = a.join(
            b, "inner", num_partitions=8, on=("doc_id",), right_suffix="_b"
        )

        def frac(t: pa.Table) -> pa.Table:
            ca = t["clean_text"]
            cb = t["clean_text_b"]
            if isinstance(ca, pa.ChunkedArray):
                ca = ca.combine_chunks()
            if isinstance(cb, pa.ChunkedArray):
                cb = cb.combine_chunks()
            la = pc.split_pattern(ca, pattern="\n")
            lb = pc.split_pattern(cb, pattern="\n")
            if isinstance(la, pa.ChunkedArray):
                la = la.combine_chunks()
            if isinstance(lb, pa.ChunkedArray):
                lb = lb.combine_chunks()
            na = np.diff(la.offsets.to_numpy().astype(np.int64))
            nb = np.diff(lb.offsets.to_numpy().astype(np.int64))
            same = na == nb
            n_eq = np.zeros(t.num_rows, dtype=np.int64)
            if same.any():
                sa = la.filter(pa.array(same))
                sb = lb.filter(pa.array(same))
                eq = pc.equal(sa.values, sb.values).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                csum = np.concatenate(([0], np.cumsum(eq)))
                offs = sa.offsets.to_numpy().astype(np.int64)
                n_eq[same] = csum[offs[1:]] - csum[offs[:-1]]
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "n_eq": pa.array(n_eq),
                    "n_lines": pa.array(np.maximum(na, nb)),
                }
            )

        return joined.map_batches(frac, batch_format="pyarrow")

    queries["compare_extraction_fraction"] = compare_extraction_fraction
    sql["compare_extraction_fraction"] = omorph.compare_fraction_sql()

    # source-format coverage: CSV / JSON-lines ingest roundtrips
    from prlib_ray.sources import io as pio

    queries["source_csv_roundtrip"] = pio.csv_roundtrip_counts
    sql["source_csv_roundtrip"] = pio.ROUNDTRIP_SQL
    queries["source_jsonl_roundtrip"] = pio.jsonl_roundtrip_counts
    sql["source_jsonl_roundtrip"] = pio.ROUNDTRIP_SQL


def _register_reassemble(queries, sql) -> None:
    from prlib_ray import oracles_rel as orel
    from prlib_ray.stages import reassemble

    # §2.2 geometry family, driven on the events table (conv = user_id)
    pairs = [
        ("reassemble_events", reassemble.reassemble_events, orel.REASSEMBLE_EVENTS),
        ("find_angle", reassemble.find_angle_events, orel.FIND_ANGLE_EVENTS),
        ("find_orientation", reassemble.find_orientation_events,
         orel.FIND_ORIENTATION_EVENTS),
        ("rotate", reassemble.rotate_events, orel.ROTATE_EVENTS),
        ("deskew", reassemble.deskew_events, orel.DESKEW_EVENTS),
    ]
    for name, fn, oracle in pairs:
        queries[name] = fn
        sql[name] = oracle


def _register_relational(queries, sql) -> None:
    from prlib_ray import oracles_rel as orel
    from prlib_ray import relational as rel

    pairs = [
        ("q1_pricing_summary", rel.q1_pricing_summary, orel.Q1),
        ("q3_top_orders", rel.q3_top_orders, orel.Q3),
        ("q5_local_supplier", rel.q5_local_supplier, orel.Q5),
        ("q6_forecast_revenue", rel.q6_forecast_revenue, orel.Q6),
        ("orders_by_segment", rel.orders_by_segment, orel.ORDERS_BY_SEGMENT),
        ("top_orders", rel.top_orders, orel.TOP_ORDERS),
        ("distinct_event_types", rel.distinct_event_types,
         orel.DISTINCT_EVENT_TYPES),
        ("events_hourly_window", rel.events_hourly, orel.EVENTS_HOURLY),
        ("events_hopping_window", rel.events_hopping_window, orel.EVENTS_HOPPING),
        ("events_late_by_watermark", rel.events_late_by_watermark,
         orel.EVENTS_LATE_WATERMARK),
        ("sessionize", rel.sessionize, orel.SESSIONIZE),
        ("rolling_event_window", rel.rolling_event_window,
         orel.ROLLING_EVENT_WINDOW),
        ("event_transitions", rel.event_transitions,
         orel.EVENT_TRANSITIONS),
        ("sampled_quantiles", rel.sampled_quantiles,
         orel.SAMPLED_QUANTILES),
        ("sales_rollup", rel.sales_rollup, orel.SALES_ROLLUP),
        ("asof_latest_order", rel.asof_latest_order, orel.ASOF_LATEST_ORDER),
        ("top_orders_per_segment", rel.top_orders_per_segment,
         orel.TOP_ORDERS_PER_SEGMENT),
        ("range_join_recent_orders", rel.range_join_recent_orders,
         orel.RANGE_JOIN_RECENT_ORDERS),
        ("split_assign", rel.split_assign_counts, orel.SPLIT_ASSIGN),
        ("customers_without_orders", rel.customers_without_orders,
         orel.CUSTOMERS_WITHOUT_ORDERS),
        ("segment_price_quantiles", rel.segment_price_quantiles,
         orel.SEGMENT_PRICE_QUANTILES),
        ("set_ops_users_customers", rel.set_ops_users_customers,
         orel.SET_OPS_USERS_CUSTOMERS),
        # shuffle-key skew profiling (the pre-shuffle salting report)
        ("key_skew_profile", rel.key_skew_profile, orel.KEY_SKEW_PROFILE),
        ("hot_keys", rel.hot_keys, orel.HOT_KEYS),
        # semi-structured extraction over the JSON props column
        ("props_field_stats", rel.props_field_stats,
         orel.PROPS_FIELD_STATS),
        # ordered funnel (earliest-event chaining over the user stream)
        ("funnel_conversion", rel.funnel_conversion,
         orel.FUNNEL_CONVERSION),
        # cohort retention report (first-active-day cohorts x offsets)
        ("retention_cohorts", rel.retention_cohorts,
         orel.RETENTION_COHORTS),
        # bloom-prefilter semi-join (exact join on the survivor stream;
        # the FP tail is observable as n_pass - n_true)
        ("bloom_semi_join", rel.bloom_semi_join, orel.BLOOM_SEMI_JOIN),
        # event-stream cadence report (power-of-two gap histogram)
        ("interarrival_profile", rel.interarrival_profile,
         orel.INTERARRIVAL_PROFILE),
        # correlated-EXISTS fact-fact semi-join (TPC-H Q4 shape)
        ("orders_with_late_items", rel.orders_with_late_items,
         orel.ORDERS_WITH_LATE_ITEMS),
        # order-to-ship latency histogram (fact-fact copart + pow2)
        ("fulfillment_latency", rel.fulfillment_latency,
         orel.FULFILLMENT_LATENCY),
        # entry-path analysis (ordered string_agg + two-fold top-K)
        ("user_path_topk", rel.user_path_topk, orel.USER_PATH_TOPK),
        # market-basket co-purchase pairs (Apriori levels 1-2)
        ("basket_part_pairs", rel.basket_part_pairs,
         orel.BASKET_PART_PAIRS),
        # cumulative PARTITION-ORDER window transform (LTV series)
        ("customer_running_total", rel.customer_running_total,
         orel.CUSTOMER_RUNNING_TOTAL),
        # TPC-H Q14 shape: promo revenue share (copart part join)
        ("q14_promo_revenue", rel.q14_promo_revenue,
         orel.Q14_PROMO_REVENUE),
        # TPC-H Q16 shape: grouped COUNT DISTINCT via two co-locations
        ("brand_supplier_counts", rel.brand_supplier_counts,
         orel.BRAND_SUPPLIER_COUNTS),
        # DAU/WAU engagement ratio per week (distinct-actives folds)
        ("user_stickiness", rel.user_stickiness, orel.USER_STICKINESS),
        # TPC-H Q13 shape: customers-by-order-count distribution
        ("q13_custdist", rel.q13_custdist, orel.Q13_CUSTDIST),
        # TPC-H Q18 shape: threshold fold + order attach in ONE copart
        ("q18_large_orders", rel.q18_large_orders, orel.Q18_LARGE_ORDERS),
        # TPC-H Q10 shape: two-level revenue fold + winner dim attach
        ("q10_returned_revenue", rel.q10_returned_revenue,
         orel.Q10_RETURNED_REVENUE),
        # TPC-H Q7 shape: cross-nation trade matrix (copart + dims)
        ("trade_volume", rel.trade_volume, orel.TRADE_VOLUME),
        # TPC-H Q17 shape: correlated per-key AVG threshold, one copart
        ("q17_small_quantity", rel.q17_small_quantity,
         orel.Q17_SMALL_QUANTITY),
        # TPC-H Q15 shape: tie-complete global argmax of a fold
        ("q15_top_supplier", rel.q15_top_supplier, orel.Q15_TOP_SUPPLIER),
        # TPC-H Q22 shape: global-scalar filter + windowed anti-join
        ("global_sales_opportunity", rel.global_sales_opportunity,
         orel.GLOBAL_SALES_OPPORTUNITY),
        # TPC-H Q19 shape: disjunctive predicate spanning the part join
        ("q19_disjunctive_revenue", rel.q19_disjunctive_revenue,
         orel.Q19_DISJUNCTIVE_REVENUE),
        # TPC-H Q21 shape: EXISTS + NOT-EXISTS self-join, one copart
        ("q21_waiting_suppliers", rel.q21_waiting_suppliers,
         orel.Q21_WAITING_SUPPLIERS),
        # TPC-H Q8 shape: market share as a bounded post-fold of Q7
        ("q8_market_share", rel.q8_market_share, orel.Q8_MARKET_SHARE),
        # temporal followed-by pair counts (windowed funnel shape)
        ("followed_within", rel.followed_within, orel.FOLLOWED_WITHIN),
        # exact distributed variance outliers (hi/lo second moment)
        ("price_zscore_outliers", rel.price_zscore_outliers,
         orel.PRICE_ZSCORE_OUTLIERS),
        # referential-integrity pre-flight (planted-orphan anti-joins)
        ("fk_orphan_audit", rel.fk_orphan_audit, orel.FK_ORPHAN_AUDIT),
        # TPC-H Q11 shape over the SYNTHESIZED partsupp dimension
        # (global scalar + per-key fold; above-mean strict compare)
        ("q11_important_stock", rel.q11_important_stock,
         orel.Q11_IMPORTANT_STOCK),
        # TPC-H Q20 shape: correlated availqty-vs-shipped compare on a
        # COMPOSITE (partkey, suppkey) copart key
        ("q20_excess_parts", rel.q20_excess_parts,
         orel.Q20_EXCESS_PARTS),
        # distribution-drift audit between snapshot halves: exact-cents
        # equal-width bins, permille shares, TVD contributions
        ("column_drift_tvd", rel.column_drift_tvd,
         orel.COLUMN_DRIFT_TVD),
        # TPC-H Q16 proper (sweep complete at 22/22): filtered part
        # subset x COUNT(DISTINCT supplier) with a real NOT IN
        # complaint-supplier anti-filter over synthesized partsupp
        ("q16_supplier_cnt", rel.q16_supplier_cnt,
         orel.Q16_SUPPLIER_CNT),
        # TPC-H Q2 shape: correlated per-part MIN over in-region offers
        ("q2_min_cost_supplier", rel.q2_min_cost_supplier,
         orel.Q2_MIN_COST_SUPPLIER),
        # TPC-H Q9 shape: two chained fact-fact coparts + dim probes
        ("q9_product_profit", rel.q9_product_profit,
         orel.Q9_PRODUCT_PROFIT),
        # TPC-H Q12 shape: synthesized shipmode/commit/receipt dates
        ("q12_shipmode_priority", rel.q12_shipmode_priority,
         orel.Q12_SHIPMODE_PRIORITY),
        # TPC-H Q4 shape: EXISTS semi-join counted per order priority
        # (same synthesized commit/receipt dates as Q12)
        ("q4_order_priority", rel.q4_order_priority,
         orel.Q4_ORDER_PRIORITY),
        # Deequ/dbt-style column profiler (exact n_distinct/min/max per
        # column; planted NULLs keep the null accounting non-vacuous)
        ("profile_columns", rel.profile_columns, orel.PROFILE_COLUMNS),
        # exact global rank + NTILE decile via ordered range partitions
        # (the distributed sort-rank; no global sort exchange)
        ("price_rank_ntile", rel.price_rank_ntile, orel.PRICE_RANK_NTILE),
        # multi-objective dominance (skyline): subset-stable local
        # frontiers + a bounded driver merge of the same kernel
        ("pareto_orders", rel.pareto_orders, orel.PARETO_ORDERS),
        # sliding-window COUNT(DISTINCT) via per-user interval-coverage
        # deltas + a calendar-bounded prefix sum
        ("rolling_active_users", rel.rolling_active_users,
         orel.ROLLING_ACTIVE_USERS),
    ]
    for name, fn, oracle in pairs:
        queries[name] = fn
        sql[name] = oracle
    # mergeable-sketch pattern; approximate by design -> rows-only
    # (pytest bounds the relative error against the exact count)
    queries["approx_distinct_users"] = rel.approx_distinct_users
