"""Pathological-corpus robustness: empty/whitespace/unicode/control-char
texts and a 4000-word doc through the operators whose distributed
plumbing is shape-sensitive (sparse candidate sets -> empty Ray blocks
bypass map UDFs and can reach join aggregators schema-less)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("edge_sf"))
    rng = np.random.RandomState(3)
    texts = [
        "",
        " ",
        "   multi   space   runs   ",
        "x",
        "é ü ñ 中文 🙂 mixed unicode words",
        "\n\n\nnewlines\n\n\nonly\n\n\n",
        "dup " * 50,
        " ".join(rng.choice(
            ["alpha", "beta", "gamma", "-----", "=====)", "(c) corp"],
            size=4000,
        ).tolist()),
        "\x00\x01 control\x7f chars �",
        "‘curly’ “quotes” –— …",
    ]
    n = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(["en"] * n, type=pa.string()),
        # half old-snapshot, half new-crawl (incremental dedup's split)
        "source": pa.array([f"src{(i % 2) * 10}" for i in range(n)],
                           type=pa.string()),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    }), os.path.join(d, "documents.parquet"))
    vecs = rng.standard_normal((20, 8)).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(20), type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
        "label": pa.array([i % 3 for i in range(20)], type=pa.int32()),
    }), os.path.join(d, "embeddings.parquet"))
    return d


EDGE_CASES = [
    # the sparse-candidate join pipelines (previously crashed on empty
    # schema-less blocks) + the tiny-corpus IVF guard + representatives
    "dedup_minhash_lsh",
    "dedup_simhash_hamming",
    "dedup_clusters_minhash",
    "dedup_embedding_lsh",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "dedup_cc_clusters",
    "dedup_survivors",
    "binarize_sauvola",
    "binarize_local_otsu",
    "auto_crop",
    "simple_white_balance",
    "quality_score",
    "multimodal_frame_sample",
    # corpus-wide side-table ops: empty docs drop out, zero-window docs
    # must not crash the explode (the np.r_[True, empty] pitfall)
    "unigram_freq_score",
    "tfidf_top_term",
    "dup_ngram_fraction",
    "segment_dedup",
    "gopher_quality",
    "dedup_semantic",
    "curate_corpus",
    "lang_agreement",
    "dup_substring_fraction",
    "pq_codes",
    "ann_pq_adc_topk",
    "build_inverted_index",
    "search_topk",
    "dedup_incremental",
    "weighted_sample",
    "frequent_ngrams",
    "corpus_diff",
    "bigram_lm_score",
    "quality_classifier",
    "ann_bruteforce_topk",
    "heavy_hitter_words",
    "source_overlap",
    "knn_label_agreement",
    # normalized dedup collapses the ""/" "-class docs into ONE group
    # (plus every planted mutant); winnow pairs must survive docs
    # shorter than the k-gram and the all-identical 'dup' runs
    "dedup_normalized",
    "dedup_winnow_pairs",
    # best-survivor shares the normalized groups; the audit must count
    # the pathological docs (empties are REAL rows here, not planted)
    "dedup_best_survivor",
    "corpus_validate",
    # the bigram sketch must survive 0/1-word docs (no bigrams) and the
    # OOV probe a corpus smaller than the top-V vocabulary
    "source_minhash_jaccard",
    "vocab_oov_rate",
    # the sketch must survive empty/1-word docs and a vocab < TOP
    "cms_word_frequency",
    # the CDF probe must survive length ties and the 0-length doc
    "length_rank_transform",
    # tiny-embedding audits: 20 vectors, 3 labels, dim 8
    "cluster_balance",
    "label_centroid_affinity",
    "embedding_outliers",
    "hard_negatives",
    # split audit over the pathological texts (the ""/" " class forms
    # one multi-doc normalized group whose members' splits are real)
    "split_leakage",
    # redaction over empty/control-char/unicode texts
    "pii_redact",
    # PMI over a 31-word-ish pathological vocab (empty docs drop out)
    "pmi_top_pairs",
    # OOV curve where sizes exceed the distinct-word count
    "tokenizer_budget_curve",
    # lift over two sources where one is all-pathological texts
    "source_word_lift",
    # per-label quantiles over the 20-vector tiny embeddings
    "label_norm_quantiles",
    # cross-modal join where EMBEDDINGS 10-19 have no document (the
    # doc-without-embedding direction is pinned by the constructed
    # ghost-doc test in test_corpus_stats)
    "cluster_top_terms",
    # round-4 ADVICE sweep: the map_groups folds that previously lacked
    # the empty-group guard (np.r_[True, empty] / zero-length bincount
    # weights) — pathological short/empty docs drive their candidate
    # sets sparse enough to produce empty coarse partitions
    "cdc_chunk_dups",
    "doc_stitch_candidates",
    "ngram_novelty",
    "bpe_train",
    "corpus_merkle",
    "dedup_containment",
    "token_budget_fill",
    "entity_resolution",
]


@pytest.mark.parametrize("name", EDGE_CASES)
def test_edge_corpus_runs(name, edge_dir, ray_session):
    from prlib_ray.api import build_queries

    queries, _ = build_queries()
    out = queries[name](edge_dir)
    n = (
        out.count()
        if hasattr(out, "count") and not isinstance(out, pa.Table)
        else out.num_rows
    )
    assert n >= 0
