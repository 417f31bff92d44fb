"""Benchmark harness (driver contract).

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "turns_per_sec": ...}

Headline = flagship transcript extraction over materialized transcript
parquet at $GRAFT_SF_DIR (default /root/testdata/sf0.1).  Transcripts are
synthesized once per (sf, fixture-version) into /tmp and cached — the
timed region is read_parquet -> extract -> reassemble -> count, i.e. the
pipeline, not the fixture generator.

--scaling: run the headline twice in fresh processes at num_cpus=8 and
32 on the same input and report throughput at both + efficiency
(the sandbox stand-in for the N vs 4N node criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# headline layout knobs, so --scaling can run the distributed-meta
# (meta_via="join") and total-order (physical="sort") layouts under the
# same pre-registered protocol (VERDICT r3 item 7); defaults unchanged
HEADLINE_META_VIA = os.environ.get("PRLIB_BENCH_META_VIA", "broadcast")
HEADLINE_PHYSICAL = os.environ.get("PRLIB_BENCH_PHYSICAL", "bucket")
FIXTURE_VERSION = 3
# bench-scale turn multiplier: ~4M turns at sf0.1 so fixed costs amortize
BENCH_TURNS_MULT = os.environ.setdefault("GRAFT_TURNS_MULT", "100")


def transcripts_path(sf_dir: str) -> str:
    tag = sf_dir.strip("/").replace("/", "_")
    return (f"/tmp/prlib_bench/transcripts_v{FIXTURE_VERSION}"
            f"_m{os.environ['GRAFT_TURNS_MULT']}_{tag}")


def materialize_transcripts(sf_dir: str) -> str:
    """Synthesize + write transcript parquet once; cached across runs so
    both scaling legs read identical bytes."""
    out = transcripts_path(sf_dir)
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    import ray.data as rd

    from prlib_ray.fixtures import synth_batch

    os.makedirs(out, exist_ok=True)
    # 128 files so the read stage yields enough blocks to keep every core
    # busy (task granularity follows input blocks).  Repartition the
    # SMALL documents table before the 1->N synthesis, not the
    # multi-GiB transcript table after it — the post-synth repartition
    # was an all-to-all over the full output (48 GiB at mult=3000) and
    # ran the materialization out of disk via spill (round 5)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).repartition(128)
    docs.map_batches(
        synth_batch, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=256,
    ).write_parquet(out)
    with open(done, "w") as f:
        f.write("ok")
    return out


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    from prlib_ray.pipelines.extract import extract_pipeline

    tpath = materialize_transcripts(SF_DIR)
    # warm-up (untimed): page cache AND worker processes — a long-running
    # cluster's workers already hold imports; a fresh local session pays
    # a one-time import storm that would otherwise pollute the measurement
    rd.read_parquet(tpath).count()
    import numpy as _np
    import pyarrow as _pa

    def _warm(b):
        from prlib_ray.stages import boilerplate  # noqa: F401  (import in worker)

        return b

    rd.range(NUM_CPUS * 4).map_batches(
        _warm, batch_size=1, batch_format="pyarrow"
    ).count()
    # untimed miniature end-to-end run: warms the planner, the writer and
    # every code path the timed run uses.  NOTE: a deterministic single
    # file, NOT .limit(N) — limit() picks whichever rows arrive first, so
    # the stats pass and the extract pass could see different rows and
    # the broadcast direction meta would miss conversations (KeyError).
    import glob as _glob
    import shutil as _sh

    _sh.rmtree("/tmp/prlib_bench/warm_out", ignore_errors=True)
    from prlib_ray.state.partitioning import write_partitioned as _wp

    one_file = sorted(_glob.glob(f"{tpath}/*.parquet"))[0]
    _wp(
        extract_pipeline(rd.read_parquet(one_file), include_spans=False),
        "/tmp/prlib_bench/warm_out",
    )

    queries: dict[str, float] = {}

    # headline: full extraction DAG (read -> clean/threshold -> direction
    # stats -> order repair -> bucketed layout), consumed by count.
    # CPU + shuffle only: the disk sink is measured separately because a
    # single box's disk bandwidth cannot scale with CPUs, while a real
    # N->4N cluster's per-node disks do (see BASELINE.md note).
    # min of 2 in-session reps: shared-host noise swings single runs by
    # up to ~30% (BASELINE.md); min is the standard robust estimator.
    headline_reps: list[float] = []
    for _ in range(2):
        t0 = time.time()
        ts = rd.read_parquet(tpath)
        n_turns = extract_pipeline(
            ts, include_spans=False,
            meta_via=HEADLINE_META_VIA, physical=HEADLINE_PHYSICAL,
        ).count()
        headline_reps.append(round(time.time() - t0, 3))
    headline = min(headline_reps)
    queries["flagship_extract"] = round(headline, 3)

    if os.environ.get("PRLIB_BENCH_HEADLINE_ONLY"):
        result = {
            "metric": "extraction_wall_seconds",
            "value": queries["flagship_extract"],
            "unit": "sec",
            "queries": queries,
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "n_turns": int(n_turns),
            "turns_per_sec": round(n_turns / headline, 1),
            # every in-session rep, disclosed (the headline is their min;
            # both scaling legs run this same code so the estimator is
            # symmetric across legs)
            "headline_reps_sec": headline_reps,
            "headline_layout": f"{HEADLINE_META_VIA}/{HEADLINE_PHYSICAL}",
        }
        ray.shutdown()
        return result

    # secondary: resumable partitioned parquet sink (disk-bound)
    import shutil

    out_dir = f"/tmp/prlib_bench/out_{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)
    from prlib_ray.state.partitioning import write_partitioned

    t0 = time.time()
    manifests = write_partitioned(
        extract_pipeline(rd.read_parquet(tpath), include_spans=False), out_dir
    )
    queries["flagship_partitioned_write"] = round(time.time() - t0, 3)
    assert sum(m["rows"] for m in manifests) == n_turns

    # secondary: materializing the total order with a global sort
    t0 = time.time()
    extract_pipeline(rd.read_parquet(tpath), include_spans=False,
                     physical="sort").count()
    queries["flagship_global_sort"] = round(time.time() - t0, 3)

    from prlib_ray.api import build_queries

    qs, _ = build_queries()
    for name in ("binarize_sauvola", "binarize_at", "binarize_local_otsu",
                 "binarize_native_adaptive", "q1_pricing_summary",
                 "q3_top_orders", "q5_local_supplier", "deskew",
                 "dedup_exact", "dedup_minhash_lsh", "dedup_simhash_hamming",
                 "ann_ivf_topk", "token_count", "decontaminate",
                 "pack_sequences", "mix_sources", "dup_ngram_fraction",
                 "unigram_freq_score", "dedup_incremental",
                 "weighted_sample", "gopher_quality", "segment_dedup",
                 "dedup_semantic", "curate_corpus", "quality_classifier",
                 "bigram_lm_score", "ann_lsh_topk", "ann_pq_adc_topk",
                 "heavy_hitter_words", "source_overlap",
                 "key_skew_profile", "knn_label_agreement",
                 "props_field_stats", "funnel_conversion",
                 "dedup_normalized", "dedup_winnow_pairs",
                 "retention_cohorts", "bloom_semi_join",
                 "source_minhash_jaccard", "vocab_oov_rate",
                 "cluster_balance", "interarrival_profile",
                 "label_centroid_affinity", "orders_with_late_items",
                 "dedup_best_survivor", "corpus_validate",
                 "cms_word_frequency", "length_rank_transform",
                 "hard_negatives", "pii_redact", "split_leakage",
                 "embedding_outliers", "pmi_top_pairs",
                 "tokenizer_budget_curve", "source_word_lift",
                 "fulfillment_latency", "label_norm_quantiles",
                 "user_path_topk", "basket_part_pairs",
                 "customer_running_total", "cluster_top_terms",
                 "q14_promo_revenue", "brand_supplier_counts",
                 "user_stickiness", "q13_custdist", "q18_large_orders",
                 "q10_returned_revenue", "trade_volume",
                 "q17_small_quantity", "q15_top_supplier",
                 "global_sales_opportunity", "dedup_rate_by_source",
                 "cross_source_dup_matrix", "ann_dim_truncation_audit",
                 "q19_disjunctive_revenue", "q21_waiting_suppliers",
                 "q8_market_share", "followed_within",
                 "price_zscore_outliers", "fk_orphan_audit",
                 "extract_turns_exact", "dedup_unicode",
                 "dedup_edit_distance", "q11_important_stock",
                 "q20_excess_parts", "q2_min_cost_supplier",
                 "q9_product_profit", "q12_shipmode_priority",
                 "profile_columns", "utf8_hygiene",
                 "snapshot_diff", "price_rank_ntile",
                 "pagerank_docs", "anchor_text_stats", "pareto_orders",
                 "conv_structure_audit", "mmr_diversified_topk",
                 "rolling_active_users", "web_curate",
                 "conv_extract_digest", "crawl_frontier_depth",
                 "triangle_count", "indegree_histogram",
                 "link_reciprocity", "extract_turn_spans",
                 "hits_scores", "dedup_containment",
                 "dedup_sorted_neighborhood", "dedup_prefix_filter",
                 "q16_supplier_cnt", "dsir_select", "cdc_chunk_dups",
                 "doc_stitch_candidates", "column_drift_tvd",
                 "kcenter_coreset", "bpe_train", "bpe_token_count",
                 "ngram_novelty", "split_no_leakage",
                 "ann_recall_audit", "data_factory", "corpus_merkle",
                 "token_budget_fill", "dedup_threshold_curve"):
        t0 = time.time()
        out = qs[name](SF_DIR)
        if hasattr(out, "count"):
            out.count()
        queries[name] = round(time.time() - t0, 3)

    result = {
        "metric": "extraction_wall_seconds",
        "value": queries["flagship_extract"],
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_turns": int(n_turns),
        "turns_per_sec": round(n_turns / headline, 1),
        "headline_reps_sec": headline_reps,
        "headline_layout": f"{HEADLINE_META_VIA}/{HEADLINE_PHYSICAL}",
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def leg_once(ncpu: int) -> dict:
        """One fresh-process headline run at ``ncpu``."""
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR,
                   PRLIB_BENCH_HEADLINE_ONLY="1")
        proc = subprocess.run(
            [sys.executable, "bench.py"],
            env=env,
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if proc.returncode != 0:
            sys.stderr.write(
                f"leg(num_cpus={ncpu}) failed:\n{proc.stderr[-2000:]}\n"
            )
            proc.check_returncode()
        return json.loads(proc.stdout.strip().splitlines()[-1])

    # N vs 4N.  Default 4 -> 16: this box advertises 32 vCPUs but
    # saturates past ~16 concurrent workers (shared host) — 16 CPUs
    # outruns 32 — so the 8->32 pair measures host oversubscription, not
    # the engine.  Both pairs are reported; BASELINE.md documents it.
    #
    # Reps run INTERLEAVED (A/B/A/B...) so shared-host load drift hits
    # both legs equally; every rep is reported, the min (the standard
    # noise-robust estimator) defines the headline efficiency.
    # Pre-registered protocol (round 3): >= 5 interleaved fresh-process
    # reps per leg; report the MEDIAN efficiency as the headline claim
    # and the best-rep efficiency alongside it (round 2's best-of-N
    # estimator, kept for comparability); the host-capacity control
    # (tools/host_capacity_control.py) should run in the same hour.
    n_lo = int(os.environ.get("PRLIB_SCALING_LO", "4"))
    n_hi = 4 * n_lo
    reps = int(os.environ.get("PRLIB_SCALING_REPS", "5"))
    runs: dict[int, list[dict]] = {n_lo: [], n_hi: []}
    for _ in range(reps):
        for n in (n_lo, n_hi):
            runs[n].append(leg_once(n))

    def med(vals: list[float]) -> float:
        s = sorted(vals)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2.0

    lo = min(runs[n_lo], key=lambda r: r["value"])
    hi = min(runs[n_hi], key=lambda r: r["value"])
    tput_lo = lo["turns_per_sec"]
    tput_hi = hi["turns_per_sec"]
    med_lo = med([r["turns_per_sec"] for r in runs[n_lo]])
    med_hi = med([r["turns_per_sec"] for r in runs[n_hi]])
    eff_best = (tput_hi / tput_lo) / 4
    eff_median = (med_hi / med_lo) / 4
    out = {
        "metric": "scaling_efficiency",
        "n_lo": n_lo,
        "n_hi": n_hi,
        f"sec_{n_lo}": lo["value"],
        f"sec_{n_hi}": hi["value"],
        f"turns_per_sec_{n_lo}": tput_lo,
        f"turns_per_sec_{n_hi}": tput_hi,
        f"median_turns_per_sec_{n_lo}": round(med_lo, 1),
        f"median_turns_per_sec_{n_hi}": round(med_hi, 1),
        f"all_reps_turns_per_sec_{n_lo}": [r["turns_per_sec"] for r in runs[n_lo]],
        f"all_reps_turns_per_sec_{n_hi}": [r["turns_per_sec"] for r in runs[n_hi]],
        "reps": reps,
        # headline claim = median (pre-registered); best kept alongside
        "scaling_efficiency": round(eff_median, 3),
        "scaling_efficiency_median": round(eff_median, 3),
        "scaling_efficiency_best": round(eff_best, 3),
        "sf": SF_DIR,
        "n_turns": lo.get("n_turns"),
        "headline_layout": f"{HEADLINE_META_VIA}/{HEADLINE_PHYSICAL}",
    }
    if os.environ.get("PRLIB_SCALING_ALSO_8_32"):
        lo8, hi32 = leg_once(8), leg_once(32)
        out["sec_8"] = lo8["value"]
        out["sec_32"] = hi32["value"]
        out["scaling_efficiency_8_32"] = round(
            (hi32["turns_per_sec"] / lo8["turns_per_sec"]) / 4, 3
        )
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
