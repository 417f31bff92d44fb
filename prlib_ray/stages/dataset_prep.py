"""Dataset-preparation operators for large-scale training pipelines:
source mixing (quota sampling), seeded epoch-shuffle sampling,
benchmark decontamination, and sequence packing.

These extend the training-data family (SURVEY §2 LLM-data ops) with the
steps that sit between "filtered corpus" and "token stream" in a 100 TB
pre-training pipeline.  All outputs are integers/strings so every op has
an exact DuckDB oracle (oracles_prep.py).

Scale notes per op are inline; the common discipline:
* per-batch partial aggregation before any groupby (counts shuffle, rows
  don't);
* broadcast sides are bounded (benchmark n-gram set, chunk offsets) and
  shipped once via ray.put;
* the only row-level shuffle (pack_sequences) moves 4-int rows through
  N_PACK_PARTS coarse partitions — the dedup.py coarse-partition
  pattern, not a per-key map_groups.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from prlib_ray.stages.text_analysis import TOKEN_PATTERN, _flat_words

# ---------------------------------------------------------------------------
# source mixing (quota sampling)

# Deterministic per-source keep rates, keyed by the numeric source
# suffix mod 4.  Thresholds are 4-hex-char prefixes of md5 (16-bit
# resolution): a doc survives iff substr(md5('mix:' || doc_id), 1, 4)
# sorts below its source's threshold.  'g' > every hex char, so it
# keeps everything (rate 1.0).  Fixed-width lowercase hex makes the
# lexicographic compare equal the numeric compare — the same trick as
# relational.split_assign_counts, so DuckDB mirrors it exactly.
MIX_THRESHOLDS = ("g", "c000", "8000", "4000")  # 1.0 / .75 / .5 / .25
MIX_SALT = "mix:"


def _mix_hash_prefixes(ids: np.ndarray) -> np.ndarray:
    return np.asarray(
        [hashlib.md5((MIX_SALT + str(int(i))).encode()).hexdigest()[:4]
         for i in ids],
        dtype=object,
    )


def mix_sources(sf_dir: str):
    """Domain-mixing quota sampler: per source, how many docs survive
    its deterministic keep-rate.  Per-batch partial counts -> tiny final
    groupby; the document rows themselves never shuffle.  At 100 TB the
    same plan holds — the shuffle payload is (source, n) pairs."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"source": pa.array([], type=pa.string()),
                 "one_sum": pa.array([], type=pa.int64()),
                 "keep_sum": pa.array([], type=pa.int64())}
            )
        ids = b["doc_id"].to_numpy().astype(np.int64)
        src = b["source"].to_pylist()
        suffix = np.asarray([int(s[3:]) for s in src], dtype=np.int64)
        thresh = np.asarray(
            [MIX_THRESHOLDS[k] for k in suffix % 4], dtype=object
        )
        keep = (_mix_hash_prefixes(ids) < thresh).astype(np.int64)
        t = pa.table(
            {
                "source": b["source"],
                "one": pa.array(np.ones(len(ids), dtype=np.int64)),
                "keep": pa.array(keep),
            }
        )
        return t.group_by("source").aggregate([("one", "sum"), ("keep", "sum")])

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            Sum("one_sum", alias_name="n_total"),
            Sum("keep_sum", alias_name="n_kept"),
        )
    )


# ---------------------------------------------------------------------------
# seeded epoch-shuffle sample

SHUFFLE_SALT = "epoch0:"
SHUFFLE_K = 100


def shuffle_head(sf_dir: str):
    """First SHUFFLE_K docs of a seeded epoch shuffle WITHOUT a global
    sort: order = md5(salt || doc_id).  Each batch keeps its local
    top-K smallest hashes (a combiner), the tiny per-batch survivors
    fold on the driver, and only there the final K are ranked.  The
    all-to-all shuffle a naive ORDER BY would cost never happens; the
    driver sees at most K rows per block."""
    import ray.data as rd

    from prlib_ray.relational import _collect_columns

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def local_topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "h": pa.array([], type=pa.string())}
            )
        ids = b["doc_id"].to_numpy().astype(np.int64)
        hs = np.asarray(
            [hashlib.md5((SHUFFLE_SALT + str(int(i))).encode()).hexdigest()
             for i in ids],
            dtype=object,
        )
        o = np.argsort(hs, kind="stable")[:SHUFFLE_K]
        return pa.table(
            {
                "doc_id": pa.array(ids[o]),
                "h": pa.array(hs[o], type=pa.string()),
            }
        )

    cols = _collect_columns(
        ds.map_batches(local_topk, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["doc_id", "h"],
    )
    hs = cols["h"].astype(object)
    o = np.argsort(hs, kind="stable")[:SHUFFLE_K]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(o) + 1, dtype=np.int64)),
            "doc_id": pa.array(cols["doc_id"].astype(np.int64)[o]),
            "h": pa.array(hs[o], type=pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# benchmark decontamination

DECON_BENCH_MOD = 97  # doc_id % 97 == 0 -> held-out "benchmark" doc
DECON_NGRAM = 3       # word n-gram size shared with the SQL oracle

# 64-bit mixing constants for combining word hashes into an n-gram id
# (odd multipliers; equal word triples always collide, unequal ones
# collide with ~2^-64 probability — the same practical-exactness bar as
# dedup.py's md5-truncated shingle ids, dedup.py:108).
_C0 = np.uint64(0x9E3779B97F4A7C15)
_C1 = np.uint64(0xC2B2AE3D27D4EB4F)


def _word_hashes(words: pa.Array) -> np.ndarray:
    """uint64 md5-derived hash per word, computed once per UNIQUE word
    (the corpus vocabulary is tiny relative to the flat word stream)."""
    w = np.asarray(words.to_pylist(), dtype=object)
    uniq, inv = np.unique(w, return_inverse=True)
    uh = np.fromiter(
        (int.from_bytes(hashlib.md5(u.encode()).digest()[:8], "big")
         for u in uniq),
        dtype=np.uint64,
        count=len(uniq),
    )
    return uh[inv]


def _ngram_ids(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(ngram uint64 ids, doc index per ngram) for all DECON_NGRAM-word
    windows that stay inside one document.  One split_pattern pass, one
    unique-word md5 pass, vectorized combine — no per-row Python."""
    words, doc_of_word, _ = _flat_words(batch)
    if len(words) < DECON_NGRAM:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)
    h = _word_hashes(words)
    d = doc_of_word
    n = DECON_NGRAM
    valid = d[: len(d) - n + 1] == d[n - 1:]
    with np.errstate(over="ignore"):
        g = h[: len(h) - n + 1] * _C0 + h[1: len(h) - n + 2] * _C1 \
            + h[n - 1:]
    return g[valid], d[: len(d) - n + 1][valid]


def decontaminate(sf_dir: str):
    """Benchmark decontamination: flag every training doc sharing a
    3-word n-gram with the held-out benchmark slice (doc_id % 97 == 0).
    Output: per source, total non-benchmark docs and how many are
    contaminated.

    Physical plan (the 100 TB layout): the benchmark n-gram set is
    bounded by the benchmark SIZE, not the corpus — build it with a
    distributed scan + per-batch unique, fold the (small) id set on the
    driver, ray.put once.  The main scan then probes per batch with one
    sorted-array searchsorted and emits per-source partial counts; no
    document row ever shuffles."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from prlib_ray.relational import _collect_columns

    docs = f"{sf_dir}/documents.parquet"

    bench_ds = rd.read_parquet(docs, columns=["doc_id", "text"])

    def bench_grams(b: pa.Table) -> pa.Table:
        if b.num_rows:
            ids = b["doc_id"].to_numpy().astype(np.int64)
            b = b.filter(pa.array(ids % DECON_BENCH_MOD == 0))
        if b.num_rows == 0:
            return pa.table({"g": pa.array([], type=pa.uint64())})
        g, _ = _ngram_ids(b)
        return pa.table({"g": pa.array(np.unique(g))})

    bench = np.unique(
        _collect_columns(
            bench_ds.map_batches(bench_grams, batch_format="pyarrow",
                                 zero_copy_batch=True),
            ["g"],
        )["g"].astype(np.uint64)
    )
    ref = ray.put(bench)

    main = rd.read_parquet(docs, columns=["doc_id", "text", "source"])

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows:
            ids = b["doc_id"].to_numpy().astype(np.int64)
            b = b.filter(pa.array(ids % DECON_BENCH_MOD != 0))
        if b.num_rows == 0:
            return pa.table(
                {"source": pa.array([], type=pa.string()),
                 "one_sum": pa.array([], type=pa.int64()),
                 "hit_sum": pa.array([], type=pa.int64())}
            )
        bg = ray.get(ref)
        g, d = _ngram_ids(b)
        idx = np.searchsorted(bg, g)
        hit = (idx < len(bg)) & (bg[np.minimum(idx, len(bg) - 1)] == g)
        doc_hit = np.zeros(b.num_rows, dtype=bool)
        doc_hit[np.unique(d[hit])] = True
        t = pa.table(
            {
                "source": b["source"],
                "one": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                "hit": pa.array(doc_hit.astype(np.int64)),
            }
        )
        return t.group_by("source").aggregate([("one", "sum"), ("hit", "sum")])

    return (
        main.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            Sum("one_sum", alias_name="n_docs"),
            Sum("hit_sum", alias_name="n_contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# sequence packing (contiguous token stream)

PACK_BUDGET = 256   # tokens per training bin
# Docs per chunk for the two-level prefix sum.  64 exercises the
# multi-chunk path at fixture scale; at 10^9 docs raise to ~4096 so the
# driver-folded chunk-total table stays in the MB range (one int64 pair
# per chunk).
PACK_CHUNK = 64
N_PACK_PARTS = 32   # coarse shuffle partitions for the within-chunk pass


def pack_sequences(sf_dir: str):
    """GPT-style sequence packing: concatenate all documents in doc_id
    order into one token stream and cut it into PACK_BUDGET-token bins;
    report, per doc, its global token offset, its first bin, and how
    many bins it spans (the quantities a packing loader needs to route
    shards).

    This is a distributed EXACT prefix sum, two-level:
    1. token counts per doc via one Arrow regex pass (no text shuffles
       past this point — only (doc_id, ntok, chunk, part) int rows);
    2. chunk totals (chunk = doc_id // PACK_CHUNK) by per-batch partial
       + tiny groupby, folded and exclusive-cumsum'd on the driver
       (bounded: one pair per chunk), broadcast once;
    3. within-chunk prefix via the coarse-partition pattern
       (dedup.py:165): chunks hash into N_PACK_PARTS groups, one
       vectorized lexsort+cumsum pass per group — not a per-chunk Ray
       group."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from prlib_ray.relational import _collect_columns

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def toks(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy().astype(np.int64) if b.num_rows else \
            np.zeros(0, dtype=np.int64)
        ntok = pc.cast(
            pc.count_substring_regex(b["text"], pattern=TOKEN_PATTERN),
            pa.int64(),
        ).to_numpy(zero_copy_only=False) if b.num_rows else \
            np.zeros(0, dtype=np.int64)
        chunk = ids // PACK_CHUNK
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "ntok": pa.array(ntok),
                "chunk": pa.array(chunk),
                "part": pa.array((chunk % N_PACK_PARTS).astype(np.int64)),
            }
        )

    small = ds.map_batches(
        toks, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def chunk_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"chunk": pa.array([], type=pa.int64()),
                 "ntok_sum": pa.array([], type=pa.int64())}
            )
        return b.select(["chunk", "ntok"]).group_by("chunk").aggregate(
            [("ntok", "sum")]
        )

    totals = (
        small.map_batches(chunk_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("chunk")
        .aggregate(Sum("ntok_sum", alias_name="tot"))
    )
    cols = _collect_columns(totals, ["chunk", "tot"])
    chunks = cols["chunk"].astype(np.int64)
    tots = cols["tot"].astype(np.int64)
    o = np.argsort(chunks)
    chunks = chunks[o]
    offs = np.concatenate(([0], np.cumsum(tots[o])[:-1]))
    ref = ray.put((chunks, offs))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        doc = g["doc_id"].to_numpy().astype(np.int64)
        ntok = g["ntok"].to_numpy().astype(np.int64)
        chunk = g["chunk"].to_numpy().astype(np.int64)
        o = np.argsort(doc, kind="stable")  # chunk = doc // C => grouped
        doc_s, ntok_s, ch_s = doc[o], ntok[o], chunk[o]
        cs = np.cumsum(ntok_s) - ntok_s  # within-part exclusive prefix
        new = np.r_[True, ch_s[1:] != ch_s[:-1]]
        base = cs[np.flatnonzero(new)]
        run = np.cumsum(new) - 1  # chunk-run index per row
        within = cs - base[run]
        chs, off = ray.get(ref)
        tok_start = off[np.searchsorted(chs, ch_s)] + within
        first_bin = tok_start // PACK_BUDGET
        last_bin = np.where(
            ntok_s > 0, (tok_start + ntok_s - 1) // PACK_BUDGET, first_bin
        )
        n_bins = np.where(ntok_s > 0, last_bin - first_bin + 1, 0)
        return pd.DataFrame(
            {
                "doc_id": doc_s,
                "tok_start": tok_start,
                "first_bin": first_bin,
                "n_bins": n_bins.astype(np.int64),
            }
        )

    return small.groupby("part").map_groups(per_part, batch_format="pandas")
