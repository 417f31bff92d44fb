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

from prlib_ray.blocks import int_bincount

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
# stratified per-source sample (grouped top-K combiner)

SAMPLE_SALT = "sample:"
SAMPLE_PER_SOURCE = 10


def sample_per_source(sf_dir: str):
    """Stratified sampling: the first SAMPLE_PER_SOURCE docs of each
    source's seeded shuffle (order = md5(salt || doc_id)) — the
    per-domain holdout picker.  Grouped top-K as a combiner: each batch
    keeps at most K rows PER SOURCE (vectorized run-boundary rank mask,
    no Python loop), so the per-source groupby only shuffles
    K x sources x batches candidate rows, never the corpus."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    K = SAMPLE_PER_SOURCE

    def _ranked_topk(src: np.ndarray, ids: np.ndarray, hs: np.ndarray):
        """(keep mask applied) arrays sorted by (source, h), rank 1..K."""
        order = np.lexsort((hs, src))
        src_s, ids_s, hs_s = src[order], ids[order], hs[order]
        new = np.r_[True, src_s[1:] != src_s[:-1]]
        run_start = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1
        rank = np.arange(len(src_s)) - run_start[run_id]
        keep = rank < K
        return src_s[keep], ids_s[keep], hs_s[keep], (rank[keep] + 1)

    def local_topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"source": pa.array([], type=pa.string()),
                 "doc_id": pa.array([], type=pa.int64()),
                 "h": pa.array([], type=pa.string())}
            )
        ids = b["doc_id"].to_numpy().astype(np.int64)
        src = np.asarray(b["source"].to_pylist(), dtype=object)
        hs = np.asarray(
            [hashlib.md5((SAMPLE_SALT + str(int(i))).encode()).hexdigest()
             for i in ids],
            dtype=object,
        )
        s, i, h, _ = _ranked_topk(src, ids, hs)
        return pa.table(
            {
                "source": pa.array(s, type=pa.string()),
                "doc_id": pa.array(i),
                "h": pa.array(h, type=pa.string()),
            }
        )

    def final_topk(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"source": pa.array([], type=pa.string()),
                             "rank": z, "doc_id": z,
                             "h": pa.array([], type=pa.string())})
        src = np.asarray(g["source"].to_pylist(), dtype=object)
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hs = np.asarray(g["h"].to_pylist(), dtype=object)
        s, i, h, r = _ranked_topk(src, ids, hs)
        return pa.table(
            {"source": pa.array(s, type=pa.string()),
             "rank": pa.array(r.astype(np.int64)),
             "doc_id": pa.array(i),
             "h": pa.array(h, type=pa.string())}
        )

    return (
        ds.map_batches(local_topk, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("source")
        .map_groups(final_topk, batch_format="pyarrow")
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


def _word_hashes(words: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """uint64 md5-derived hash per word, computed once per UNIQUE word
    (the corpus vocabulary is tiny relative to the flat word stream).
    The distinct pass is Arrow ``dictionary_encode`` (C hash table) —
    an object-array np.unique here measured ~85x slower per batch and
    dominated every word-level partial's profile; the hash value per
    word is identical either way."""
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    wd = pc.dictionary_encode(words)
    inv = wd.indices.to_numpy(zero_copy_only=False)
    uh = np.fromiter(
        (int.from_bytes(hashlib.md5(u.encode()).digest()[:8], "big")
         for u in wd.dictionary.to_pylist()),
        dtype=np.uint64,
        count=len(wd.dictionary),
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
                 "ntok_sum": pa.array([], type=pa.int64()),
                 "part": pa.array([], type=pa.int64())}
            )
        t = b.select(["chunk", "ntok"]).group_by("chunk").aggregate(
            [("ntok", "sum")]
        )
        return t.append_column(
            "part", pa.array((t["chunk"].to_numpy() % N_PACK_PARTS)
                             .astype(np.int64))
        )

    # chunk-key cardinality scales with the corpus (ndocs / PACK_CHUNK):
    # fold the partials per chunk-side coarse partition, one vectorized
    # pandas groupby each, not Ray's per-key aggregate
    def chunk_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"chunk": z, "tot": z})
        ch = g["chunk"].to_numpy(zero_copy_only=False).astype(np.int64)
        ns = g["ntok_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(ch, kind="stable")
        ch, ns = ch[o], ns[o]
        starts = np.flatnonzero(np.r_[True, ch[1:] != ch[:-1]])
        return pa.table({"chunk": pa.array(ch[starts]),
                         "tot": pa.array(np.add.reduceat(ns, starts))})

    totals = (
        small.map_batches(chunk_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("part")
        .map_groups(chunk_fold, batch_format="pyarrow")
    )
    cols = _collect_columns(totals, ["chunk", "tot"])
    chunks = cols["chunk"].astype(np.int64)
    tots = cols["tot"].astype(np.int64)
    o = np.argsort(chunks)
    chunks = chunks[o]
    offs = np.concatenate(([0], np.cumsum(tots[o])[:-1]))
    ref = ray.put((chunks, offs))

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc_id": z, "tok_start": z,
                             "first_bin": z, "n_bins": z})
        doc = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ntok = g["ntok"].to_numpy(zero_copy_only=False).astype(np.int64)
        chunk = g["chunk"].to_numpy(zero_copy_only=False).astype(np.int64)
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
        return pa.table(
            {
                "doc_id": pa.array(doc_s),
                "tok_start": pa.array(tok_start),
                "first_bin": pa.array(first_bin),
                "n_bins": pa.array(n_bins.astype(np.int64)),
            }
        )

    return small.groupby("part").map_groups(per_part, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# context-window chunking (1 doc row -> N chunk rows)

CHUNK_WINDOW = 128  # tokens per chunk
CHUNK_STRIDE = 96   # overlap = CHUNK_WINDOW - CHUNK_STRIDE


def chunk_tokens(sf_dir: str):
    """Context-window chunking: explode each document into overlapping
    CHUNK_WINDOW-token windows at CHUNK_STRIDE (the retrieval/training
    chunker).  Pure per-batch flat explode — token counting is one Arrow
    regex pass, the row expansion one np.repeat/arange, no shuffle at
    any scale."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    W, S = CHUNK_WINDOW, CHUNK_STRIDE

    def explode(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table(
                {"doc_id": z, "chunk_idx": z, "tok_lo": z, "tok_hi": z}
            )
        ids = b["doc_id"].to_numpy().astype(np.int64)
        ntok = pc.cast(
            pc.count_substring_regex(b["text"], pattern=TOKEN_PATTERN),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        nc = np.where(
            ntok == 0, 0, 1 + np.maximum(0, (ntok - W + S - 1) // S)
        ).astype(np.int64)
        total = int(nc.sum())
        doc_rep = np.repeat(ids, nc)
        ntok_rep = np.repeat(ntok, nc)
        base = np.repeat(np.cumsum(nc) - nc, nc)
        ci = np.arange(total, dtype=np.int64) - base
        lo = ci * S
        hi = np.minimum(lo + W, ntok_rep)
        return pa.table(
            {
                "doc_id": pa.array(doc_rep),
                "chunk_idx": pa.array(ci),
                "tok_lo": pa.array(lo),
                "tok_hi": pa.array(hi),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow",
                          zero_copy_batch=True)


# ---------------------------------------------------------------------------
# PII scanning (deterministically augmented input — the raw corpus
# contains no PII-shaped strings, which would make the check vacuous;
# the oracle mirrors the same augmentation with string concat)

PII_EMAIL_MOD = 7    # doc_id % 7 == 0 -> planted email
PII_PHONE_MOD = 11   # doc_id % 11 == 0 -> planted phone number
PII_EMAIL_PATTERN = r"[A-Za-z0-9._]+@[A-Za-z0-9.]+"
PII_PHONE_PATTERN = r"555-[0-9]{4}"


def _augment_pii(ids: np.ndarray, texts: pa.Array) -> pa.Array:
    tails = np.asarray(
        [
            ((" contact user%d@example.com now" % i) if i % PII_EMAIL_MOD == 0
             else "")
            + (" call 555-0199" if i % PII_PHONE_MOD == 0 else "")
            for i in ids
        ],
        dtype=object,
    )
    return pc.binary_join_element_wise(
        texts, pa.array(tails, type=pa.string()), ""
    )


def pii_scan(sf_dir: str):
    """PII scrubbing scan: per source, docs containing PII, email/phone
    match counts, and the chars a redaction pass would remove.  Counting
    and redaction-length are Arrow regex kernels; per-batch partial
    counts -> tiny groupby (document rows never shuffle)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table(
                {"source": pa.array([], type=pa.string()),
                 "one_sum": z, "pii_sum": z, "email_sum": z,
                 "phone_sum": z, "red_sum": z}
            )
        ids = b["doc_id"].to_numpy().astype(np.int64)
        text = _augment_pii(ids, b["text"])
        ne = pc.cast(
            pc.count_substring_regex(text, pattern=PII_EMAIL_PATTERN),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        np_ = pc.cast(
            pc.count_substring_regex(text, pattern=PII_PHONE_PATTERN),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        red = pc.replace_substring_regex(
            pc.replace_substring_regex(
                text, pattern=PII_EMAIL_PATTERN, replacement=""
            ),
            pattern=PII_PHONE_PATTERN,
            replacement="",
        )
        nred = (
            pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
            - pc.utf8_length(red).to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                "source": b["source"],
                "one": pa.array(np.ones(len(ids), dtype=np.int64)),
                "pii": pa.array(((ne + np_) > 0).astype(np.int64)),
                "email": pa.array(ne),
                "phone": pa.array(np_),
                "red": pa.array(nred.astype(np.int64)),
            }
        )
        return t.group_by("source").aggregate(
            [("one", "sum"), ("pii", "sum"), ("email", "sum"),
             ("phone", "sum"), ("red", "sum")]
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            Sum("one_sum", alias_name="n_docs"),
            Sum("pii_sum", alias_name="n_docs_with_pii"),
            Sum("email_sum", alias_name="n_email"),
            Sum("phone_sum", alias_name="n_phone"),
            Sum("red_sum", alias_name="n_chars_redacted"),
        )
    )


# ---------------------------------------------------------------------------
# percentile length filter (exact distributed quantile over a bounded
# integer domain)

LENGTH_PCT = 95


def length_filter_p95(sf_dir: str):
    """Length-outlier filter: exact corpus-wide p95 of the token count
    (value at 0-based sorted index (95*(N-1))//100), then per-source
    totals and how many docs exceed it.

    The quantile is EXACT and distributed without any sort: token
    counts live in a bounded integer domain, so a per-batch
    np.unique histogram partial + a tiny (value, count) groupby gives
    the full distribution; the driver folds the (small) histogram,
    walks the cumsum to the index, and the second pass probes with a
    captured scalar.  Texts are dropped after the first map — only
    (source, ntok) int/str rows flow."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from prlib_ray.relational import _collect_columns

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def to_ntok(b: pa.Table) -> pa.Table:
        ntok = pc.cast(
            pc.count_substring_regex(b["text"], pattern=TOKEN_PATTERN),
            pa.int64(),
        )
        return pa.table({"source": b["source"], "ntok": ntok})

    small = ds.map_batches(
        to_ntok, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def hist(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"val": z, "c": z})
        vals, cnts = np.unique(
            b["ntok"].to_numpy().astype(np.int64), return_counts=True
        )
        return pa.table(
            {"val": pa.array(vals), "c": pa.array(cnts.astype(np.int64))}
        )

    h = _collect_columns(
        small.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("val")
        .aggregate(Sum("c", alias_name="n")),
        ["val", "n"],
    )
    vals = h["val"].astype(np.int64)
    cnts = h["n"].astype(np.int64)
    o = np.argsort(vals)
    vals, cnts = vals[o], cnts[o]
    total = int(cnts.sum())
    k = (LENGTH_PCT * (total - 1)) // 100  # 0-based index into the sort
    p95 = int(vals[np.searchsorted(np.cumsum(cnts), k + 1)])

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table(
                {"source": pa.array([], type=pa.string()),
                 "one_sum": z, "long_sum": z}
            )
        ntok = b["ntok"].to_numpy().astype(np.int64)
        t = pa.table(
            {
                "source": b["source"],
                "one": pa.array(np.ones(len(ntok), dtype=np.int64)),
                "long": pa.array((ntok > p95).astype(np.int64)),
            }
        )
        return t.group_by("source").aggregate([("one", "sum"), ("long", "sum")])

    agg = (
        small.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            Sum("one_sum", alias_name="n_total"),
            Sum("long_sum", alias_name="n_long"),
        )
    )

    def attach_p95(b: pa.Table) -> pa.Table:
        return b.append_column(
            "p95_tokens",
            pa.array(np.full(b.num_rows, p95, dtype=np.int64)),
        )

    return agg.map_batches(attach_p95, batch_format="pyarrow",
                           zero_copy_batch=True)


# ---------------------------------------------------------------------------
# per-source term statistics (hierarchical wide-key aggregation)


def source_term_stats(sf_dir: str):
    """Per-source corpus term stats: total non-empty words, distinct
    terms, and the hottest term's count — the vocabulary profile a
    mixing/filtering decision reads.

    Hierarchical aggregation: per-batch (source, term) partial counts
    (composite-key np.unique over dictionary codes) pre-combine BEFORE
    the shuffle, so the exchanged rows are bounded by per-batch
    vocabulary, not word count; a (source, term) groupby folds the
    partials, then a per-source groupby reduces to 3 numbers.  The
    word stream itself never shuffles."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Sum

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"source": pa.array([], type=pa.string()),
                 "term": pa.array([], type=pa.string()),
                 "c_sum": pa.array([], type=pa.int64())}
            )
        words, doc_of_word, _ = _flat_words(b)
        src = np.asarray(b["source"].to_pylist(), dtype=object)
        usrc, src_code = np.unique(src, return_inverse=True)
        nonempty = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
        dict_arr = pc.dictionary_encode(words)
        codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        term_of_code = np.asarray(dict_arr.dictionary.to_pylist(),
                                  dtype=object)
        vocab = len(term_of_code) if len(term_of_code) else 1
        s = src_code[doc_of_word[nonempty]]
        c = codes[nonempty]
        key = s * vocab + c
        uniq, counts = np.unique(key, return_counts=True)
        return pa.table(
            {
                "source": pa.array(usrc[(uniq // vocab).astype(np.int64)],
                                   type=pa.string()),
                "term": pa.array(term_of_code[(uniq % vocab).astype(np.int64)],
                                 type=pa.string()),
                "c_sum": pa.array(counts.astype(np.int64)),
            }
        )

    # (source, term) cardinality scales with the vocabulary: fold the
    # partials per TERM-side coarse partition (a term never spans parts,
    # so neither does a (source, term) pair), one vectorized pandas
    # groupby each — not Ray's per-key aggregate
    import zlib

    def add_part(b: pa.Table) -> pa.Table:
        t = partial(b)
        part = np.asarray(
            [zlib.crc32(w.encode()) % 32 for w in t["term"].to_pylist()],
            dtype=np.int64,
        )
        return t.append_column("part", pa.array(part))

    def term_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"source": pa.array([], type=pa.string()),
                             "term": pa.array([], type=pa.string()),
                             "c": pa.array([], type=pa.int64())})
        srcs = np.asarray(g["source"].to_pylist(), dtype=object)
        terms = np.asarray(g["term"].to_pylist(), dtype=object)
        cs = g["c_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, si = np.unique(srcs, return_inverse=True)
        _, ti = np.unique(terms, return_inverse=True)
        o = np.lexsort((ti, si))
        si_s, ti_s, c_s = si[o], ti[o], cs[o]
        new = np.r_[True, (si_s[1:] != si_s[:-1]) | (ti_s[1:] != ti_s[:-1])]
        starts = np.flatnonzero(new)
        sel = o[starts]
        return pa.table({
            "source": pa.array(srcs[sel], type=pa.string()),
            "term": pa.array(terms[sel], type=pa.string()),
            "c": pa.array(np.add.reduceat(c_s, starts)),
        })

    per_term = (
        ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(term_fold, batch_format="pyarrow")
    )

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table(
                {"source": pa.array([], type=pa.string()),
                 "w_sum": z, "d_sum": z, "t_max": z}
            )
        t = pa.table(
            {
                "source": b["source"],
                "w": b["c"],
                "d": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                "t": b["c"],
            }
        )
        return t.group_by("source").aggregate(
            [("w", "sum"), ("d", "sum"), ("t", "max")]
        )

    return (
        per_term.map_batches(fold, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            Sum("w_sum", alias_name="n_words"),
            Sum("d_sum", alias_name="n_distinct"),
            Max("t_max", alias_name="top_count"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic weighted priority sample (Efraimidis–Spirakis shape,
# exact-integer keys)

WSAMPLE_SALT = "wsample:"
WSAMPLE_K = 100
WSAMPLE_SCALE = 1_000_000


def weighted_sample(sf_dir: str):
    """Weighted sampling without replacement, weight = n_chars: the
    WSAMPLE_K docs with the smallest priority key
    ``floor(h32 * WSAMPLE_SCALE / n_chars)`` where h32 is the first 32
    bits of md5(salt || doc_id).  Longer docs get proportionally smaller
    keys — the deterministic, exactly-reproducible analogue of
    Efraimidis–Spirakis u^(1/w) priorities, kept in pure int64 so the
    selection is bit-exact on both the Ray and the SQL side (no libm:
    h32 < 2^32, * 10^6 < 2^52, integer floor-divide).

    Same no-global-sort layout as shuffle_head: each batch keeps its
    local top-K (vectorized lexsort on (key, doc_id)), the tiny
    survivors fold once on the driver, and only there the final K are
    ranked."""
    import ray.data as rd

    from prlib_ray.relational import _collect_columns

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def local_topk(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if b.num_rows == 0:
            return pa.table({"doc_id": z, "key": z, "n_chars": z})
        ids = b["doc_id"].to_numpy().astype(np.int64)
        w = np.maximum(b["n_chars"].to_numpy().astype(np.int64), 1)
        h32 = np.asarray(
            [
                int(hashlib.md5(
                    (WSAMPLE_SALT + str(int(i))).encode()
                ).hexdigest()[:8], 16)
                for i in ids
            ],
            dtype=np.int64,
        )
        key = (h32 * WSAMPLE_SCALE) // w  # < 2^52: exact int64
        o = np.lexsort((ids, key))[:WSAMPLE_K]
        return pa.table(
            {
                "doc_id": pa.array(ids[o]),
                "key": pa.array(key[o]),
                "n_chars": pa.array(b["n_chars"].to_numpy().astype(np.int64)[o]),
            }
        )

    cols = _collect_columns(
        ds.map_batches(local_topk, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["doc_id", "key", "n_chars"],
    )
    ids = cols["doc_id"].astype(np.int64)
    key = cols["key"].astype(np.int64)
    o = np.lexsort((ids, key))[:WSAMPLE_K]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(o) + 1, dtype=np.int64)),
            "doc_id": pa.array(ids[o]),
            "key": pa.array(key[o]),
            "n_chars": pa.array(cols["n_chars"].astype(np.int64)[o]),
        }
    )


# ---------------------------------------------------------------------------
# frequent-n-gram mining (exact heavy hitters with rescan)

FREQ_NGRAM_T = 5   # corpus-scale knob: min occurrences to report; raise
#                    with corpus size so the winner set stays broadcastable
N_FREQ_PARTS = 64


def frequent_ngrams(sf_dir: str):
    """Boilerplate phrase mining: every DECON_NGRAM-word gram occurring
    at least FREQ_NGRAM_T times corpus-wide, with its exact count — the
    "most repeated phrases" report a curation pipeline uses to build
    strip lists.

    Exact heavy hitters in two phases (no sketch, no string shuffle):
    1. count per 64-bit gram id — per-batch pre-combine, gram-side
       coarse partitions, one vectorized fold each; ids at or above the
       threshold fold back (bounded by FREQ_NGRAM_T) and broadcast
       sorted;
    2. RESCAN: each batch recomputes its window ids, searchsorted
       against the winners, and emits one representative gram STRING
       per winning id (strings only travel for winners); a per-part
       distinct keeps one row per gram.

    Equal grams share an id by construction; distinct grams collide
    with ~2^-64 probability (the decontaminate convention, brute-force
    pinned), so the DuckDB string-gram oracle is exact."""
    import ray
    import ray.data as rd

    from prlib_ray.relational import _collect_columns

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def count_partial(b: pa.Table) -> pa.Table:
        z64 = pa.array([], type=pa.uint64())
        z = pa.array([], type=pa.int64())
        if b.num_rows == 0:
            return pa.table({"g": z64, "c": z, "part": z})
        g, _ = _ngram_ids(b)
        if len(g) == 0:
            return pa.table({"g": z64, "c": z, "part": z})
        gu, c = np.unique(g, return_counts=True)
        return pa.table(
            {
                "g": pa.array(gu),
                "c": pa.array(c.astype(np.int64)),
                "part": pa.array(
                    (gu % np.uint64(N_FREQ_PARTS)).astype(np.int64)
                ),
            }
        )

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"g": pa.array([], type=pa.uint64()),
                             "n": pa.array([], type=pa.int64())})
        gid = g["g"].to_numpy(zero_copy_only=False).astype(np.uint64)
        c = g["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(gid, kind="stable")
        g_s, c_s = gid[order], c[order]
        new = np.r_[True, g_s[1:] != g_s[:-1]]
        run = np.cumsum(new) - 1
        tot = int_bincount(run, c_s)
        gu = g_s[new]
        keep = tot >= FREQ_NGRAM_T
        return pa.table({"g": pa.array(gu[keep]),
                         "n": pa.array(tot[keep])})

    winners = (
        ds.map_batches(count_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
    )
    cols = _collect_columns(winners, ["g", "n"])
    wg = cols["g"].astype(np.uint64)
    wn = cols["n"].astype(np.int64)
    o = np.argsort(wg)
    wg, wn = wg[o], wn[o]
    ref = ray.put((wg, wn))

    k = DECON_NGRAM

    def extract(b: pa.Table) -> pa.Table:
        z64 = pa.array([], type=pa.uint64())
        z = pa.array([], type=pa.int64())
        zs = pa.array([], type=pa.string())
        if b.num_rows == 0:
            return pa.table({"g": z64, "gram": zs, "n_count": z, "part": z})
        words, d, _ = _flat_words(b)
        if len(words) < k:
            return pa.table({"g": z64, "gram": zs, "n_count": z, "part": z})
        h = _word_hashes(words)
        m = len(h) - k + 1
        valid = d[:m] == d[k - 1:]
        with np.errstate(over="ignore"):
            g = h[:m] * _C0 + h[1: m + 1] * _C1 + h[k - 1:]
        gv = g[valid]
        sv = np.flatnonzero(valid)
        wg, wn = ray.get(ref)
        idx = np.searchsorted(wg, gv)
        hit = (idx < len(wg)) & (wg[np.minimum(idx, len(wg) - 1)] == gv)
        if not hit.any():
            return pa.table({"g": z64, "gram": zs, "n_count": z, "part": z})
        gh, sh = gv[hit], sv[hit]
        o2 = np.argsort(gh, kind="stable")
        first = np.r_[True, gh[o2][1:] != gh[o2][:-1]]
        gsel, ssel = gh[o2][first], sh[o2][first]
        wl = words.to_pylist()
        grams = [" ".join(wl[s: s + k]) for s in ssel]  # winners only
        ns = wn[np.searchsorted(wg, gsel)]
        return pa.table(
            {
                "g": pa.array(gsel),
                "gram": pa.array(grams, type=pa.string()),
                "n_count": pa.array(ns),
                "part": pa.array(
                    (gsel % np.uint64(N_FREQ_PARTS)).astype(np.int64)
                ),
            }
        )

    def distinct(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"gram": pa.array([], type=pa.string()),
                             "n_count": pa.array([], type=pa.int64())})
        gid = g["g"].to_numpy(zero_copy_only=False).astype(np.uint64)
        o = np.argsort(gid, kind="stable")
        first = np.r_[True, gid[o][1:] != gid[o][:-1]]
        sel = o[first]
        grams = np.asarray(g["gram"].to_pylist(), dtype=object)
        nc = g["n_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "gram": pa.array(grams[sel], type=pa.string()),
                "n_count": pa.array(nc[sel]),
            }
        )

    return (
        ds.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(distinct, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Misra-Gries ("Frequent") heavy hitters — bounded-memory sketch + rescan

MG_K = 4096      # sketch capacity per batch AND per fold partition
MG_T_DIV = 100   # threshold = total_words // MG_T_DIV
N_MG_PARTS = 32


def _mg_truncate(words: np.ndarray, counts: np.ndarray,
                 k: int) -> tuple[np.ndarray, np.ndarray]:
    """One Misra-Gries decrement step, vectorized: subtract the
    (k+1)-th largest count from every counter and keep the positive
    ones — at most k survive, and every item's count drops by at most
    (stream weight)/(k+1)."""
    if len(counts) <= k:
        return words, counts
    thresh = np.partition(counts, -(k + 1))[-(k + 1)]
    kept = counts - thresh
    m = kept > 0
    return words[m], kept[m]


def _mg_decode(acc: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Accumulator rows are 'count:word' strings (Arrow-friendly, so
    partial aggregation blocks stay native list<string> instead of
    falling back to pickled objects)."""
    if not acc:
        return (np.asarray([], dtype=object), np.asarray([], dtype=np.int64))
    pairs = [s.split(":", 1) for s in acc]
    return (
        np.asarray([p[1] for p in pairs], dtype=object),
        np.asarray([int(p[0]) for p in pairs], dtype=np.int64),
    )


def _mg_merge(acc: list[str], words: np.ndarray, counts: np.ndarray,
              k: int) -> list[str]:
    """Merge (words, counts) into a bounded MG accumulator: sum
    duplicate words, then one truncation step.  Mergeable-summaries
    property (Agarwal/Cormode et al.): any sequence/tree of such
    merges undercounts by at most (total merged weight)/(k+1) — the
    bound does NOT grow with the number of merges, so the streaming
    fold has the same guarantee as a one-shot fold."""
    if not len(words):
        return acc
    aw, ac = _mg_decode(acc)
    cw = np.concatenate([aw, words])
    cc = np.concatenate([ac, counts])
    o = np.argsort(cw, kind="stable")
    cw, cc = cw[o], cc[o]
    first = np.r_[True, cw[1:] != cw[:-1]]
    uw = cw[first]
    # exact int64 duplicate-sum (reduceat, not float-weighted bincount):
    # the no-false-negative bound needs exact counts past 2^53
    uc = np.add.reduceat(cc, np.flatnonzero(first)).astype(np.int64)
    kw, kc = _mg_truncate(uw, uc, k)
    return [f"{c}:{w}" for w, c in zip(kw, kc)]


def heavy_hitter_words(sf_dir: str, *, k: int = MG_K):
    """Corpus heavy hitters with BOUNDED memory: every word occurring
    at least total_words // MG_T_DIV times, with its exact count.

    frequent_ngrams keeps exact per-partition hash tables; this is the
    sketch variant for when even those don't fit — per-batch and
    per-partition Misra-Gries truncation caps live state at MG_K
    counters per task regardless of vocabulary size.  The fold level
    is a custom mergeable AggregateFn whose accumulator never exceeds
    MG_K entries (Ray streams per-group block slices through
    accumulate/merge — the group is never materialized), and the
    mergeable-summaries bound keeps the two-level undercount at most
    2·n/(MG_K+1): every true heavy hitter (count >= T > 2n/(MG_K+1))
    survives into the candidate set — NO false negatives.  When the
    caller's capacity cannot guarantee the threshold it raises; when
    NO capacity could (a tiny corpus floors T to 0 — exactly where an
    exact fold trivially fits) it falls back to an exact count so the
    result stays defined wherever the SQL oracle is.  An exact RESCAN
    of the bounded candidate set (<= N_MG_PARTS·MG_K words) then
    replaces sketch estimates with exact counts, which is why a plain
    GROUP BY ... HAVING oracle matches bit-for-bit."""
    import zlib

    import ray
    import ray.data as rd
    from ray.data.aggregate import AggregateFn, Sum

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def batch_words(b: pa.Table):
        words, _, _ = _flat_words(b)
        ne = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
        return np.asarray(words.to_pylist(), dtype=object)[ne]

    def sketch_partial(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {"w": pa.array([], type=pa.string()),
             "c": pa.array([], type=pa.int64()),
             "part": pa.array([], type=pa.int64()),
             "n": pa.array([], type=pa.int64())}
        )
        if b.num_rows == 0:
            return empty
        w = batch_words(b)
        if not len(w):
            return empty
        uniq, counts = np.unique(w, return_counts=True)
        kw, kc = _mg_truncate(uniq, counts.astype(np.int64), k)
        # the batch word total rides on a dedicated sentinel row (w=''
        # can never be a real candidate — empties are filtered): a
        # truncation that drops EVERY counter must not lose the total,
        # or the threshold would drift from the oracle's count(*)
        kw = np.concatenate([kw, np.asarray([""], dtype=object)])
        kc = np.concatenate([kc, np.zeros(1, dtype=np.int64)])
        part = np.asarray(
            [zlib.crc32(x.encode()) % N_MG_PARTS for x in kw],
            dtype=np.int64,
        )
        n = np.zeros(len(kw), dtype=np.int64)
        n[-1] = len(w)
        return pa.table(
            {"w": pa.array(kw, type=pa.string()), "c": pa.array(kc),
             "part": pa.array(part), "n": pa.array(n)}
        )

    sketched = ds.map_batches(
        sketch_partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_total = int(sketched.aggregate(Sum("n", alias_name="s"))["s"] or 0)
    threshold = n_total // MG_T_DIV

    def exact_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"w": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        w = np.asarray(g["w"].to_pylist(), dtype=object)
        c = g["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(w, kind="stable")
        w_s, c_s = w[o], c[o]
        starts = np.flatnonzero(np.r_[True, w_s[1:] != w_s[:-1]])
        tot = np.add.reduceat(c_s, starts)
        keep = tot >= threshold
        return pa.table({"w": pa.array(w_s[starts][keep], type=pa.string()),
                         "n": pa.array(tot[keep])})

    if threshold * (k + 1) <= 2 * n_total:
        if threshold * (MG_K + 1) > 2 * n_total:
            # the DEFAULT capacity would satisfy the guarantee: the
            # caller squeezed k below legal — refuse, don't under-report
            raise ValueError(
                f"MG capacity {k} cannot guarantee threshold "
                f"{threshold} at {n_total} words (need T > 2n/(K+1)); "
                "raise MG_K or MG_T_DIV"
            )

        # NO capacity can guarantee this threshold (a tiny corpus
        # floors it to 0) — which is exactly where an exact unbounded
        # fold trivially fits.  The SQL oracle defines a result for
        # every input; return it instead of crashing.
        def exact_partial(b: pa.Table) -> pa.Table:
            empty = pa.table(
                {"w": pa.array([], type=pa.string()),
                 "c": pa.array([], type=pa.int64()),
                 "part": pa.array([], type=pa.int64())}
            )
            if b.num_rows == 0:
                return empty
            w = batch_words(b)
            if not len(w):
                return empty
            uniq, counts = np.unique(w, return_counts=True)
            part = np.asarray(
                [zlib.crc32(x.encode()) % N_MG_PARTS for x in uniq],
                dtype=np.int64,
            )
            return pa.table(
                {"w": pa.array(uniq, type=pa.string()),
                 "c": pa.array(counts.astype(np.int64)),
                 "part": pa.array(part)}
            )

        out = (
            ds.map_batches(
                exact_partial, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("part")
            .map_groups(exact_fold, batch_format="pyarrow")
        )
        return out.sort("w")

    # fold level: a mergeable bounded-memory aggregate — the per-part
    # accumulator holds <= k 'count:word' rows at every accumulate and
    # merge step, so fold memory does NOT grow with batch count (the
    # old map_groups fold materialized every survivor row of the
    # partition before truncating)
    def mg_accumulate(acc: list[str], blk) -> list[str]:
        if isinstance(blk, pd.DataFrame):
            w = blk["w"].to_numpy().astype(object)
            c = blk["c"].to_numpy().astype(np.int64)
        else:
            w = np.asarray(blk["w"].to_pylist(), dtype=object)
            c = blk["c"].to_numpy()
        m = w != ""  # drop the batch-total sentinel rows
        return _mg_merge(acc, w[m], c[m], k)

    def mg_merge_accs(a: list[str], b: list[str]) -> list[str]:
        bw, bc = _mg_decode(b)
        return _mg_merge(a, bw, bc, k)

    mg_agg = AggregateFn(
        init=lambda key: [],
        accumulate_block=mg_accumulate,
        merge=mg_merge_accs,
        finalize=lambda acc: [s.split(":", 1)[1] for s in acc],
        name="cand",
    )
    rows = sketched.groupby("part").aggregate(mg_agg).take_all()
    cw = np.sort(np.unique(np.concatenate(
        [np.asarray(r["cand"], dtype=object) for r in rows]
        + [np.asarray([], dtype=object)]
    )))
    # candidate partitions are fixed once the candidate set is — ship
    # them with the words instead of recomputing crc32 in every batch
    cparts = np.asarray(
        [zlib.crc32(x.encode()) % N_MG_PARTS for x in cw], dtype=np.int64
    )
    ref = ray.put((cw, cparts))

    # exact rescan: counts only for the bounded candidate set
    def rescan(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {"w": pa.array([], type=pa.string()),
             "c": pa.array([], type=pa.int64()),
             "part": pa.array([], type=pa.int64())}
        )
        if b.num_rows == 0:
            return empty
        cw, cparts = ray.get(ref)
        w = batch_words(b)
        if not len(w) or not len(cw):
            return empty
        idx = np.searchsorted(cw, w)
        hit = (idx < len(cw)) & (cw[np.minimum(idx, len(cw) - 1)] == w)
        cnt = np.bincount(idx[hit], minlength=len(cw)).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {"w": pa.array(cw[nz], type=pa.string()),
             "c": pa.array(cnt[nz]), "part": pa.array(cparts[nz])}
        )

    out = (
        ds.map_batches(rescan, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(exact_fold, batch_format="pyarrow")
    )
    return out.sort("w")


def pii_redact(sf_dir: str):
    """The redaction TRANSFORM pii_scan only measures: per document the
    redacted-text fingerprint and removal accounting (emails first,
    then phones — order matters when matches touch, so it is part of
    the contract and mirrored in the oracle).  n_redacted_chars is
    EXACTLY pii_scan's metric — the chars a removal pass deletes
    (length delta under ''-replacement in the same order) — so the two
    paired ops cross-check; the md5 is of the [EMAIL]/[PHONE]-token
    form a downstream pipeline would actually train on.  Embarrassingly
    parallel Arrow regex kernels; md5 of the redacted utf-8 bytes
    proves the transform byte-exact without shipping the text."""
    import hashlib

    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def redact(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc_id": z, "n_redacted_chars": z,
                             "redacted_md5": pa.array([], type=pa.string())})
        ids = b["doc_id"].to_numpy().astype(np.int64)
        text = _augment_pii(ids, b["text"])
        red = pc.replace_substring_regex(
            pc.replace_substring_regex(
                text, pattern=PII_EMAIL_PATTERN, replacement="[EMAIL]"
            ),
            pattern=PII_PHONE_PATTERN,
            replacement="[PHONE]",
        )
        gone = pc.replace_substring_regex(
            pc.replace_substring_regex(
                text, pattern=PII_EMAIL_PATTERN, replacement=""
            ),
            pattern=PII_PHONE_PATTERN,
            replacement="",
        )
        nred = (
            pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
            - pc.utf8_length(gone).to_numpy(zero_copy_only=False)
        )
        md5s = [hashlib.md5(t.encode()).hexdigest() for t in red.to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids),
            "n_redacted_chars": pa.array(nred.astype(np.int64)),
            "redacted_md5": pa.array(md5s, type=pa.string()),
        })

    return ds.map_batches(redact, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# snapshot reconciliation (CDC-style diff between two crawl snapshots)

# The fixtures ship ONE documents table, so the two snapshots derive
# from it in pure mod arithmetic (the partsupp-synthesis discipline,
# NOTES_r3 item 75), mirrored 1:1 by the oracle's CTEs:
#   * NEW  = every document; doc_id % 11 == 5 rows carry revised text
#     (changed), so their fingerprints differ between snapshots.
#   * OLD  = every document EXCEPT doc_id % 7 == 3 (those are "added"
#     in NEW), PLUS stale rows at doc_id + SNAP_REMOVED_OFF for
#     doc_id % 13 == 1 (present ONLY in OLD -> "removed").
SNAP_ADDED_MOD, SNAP_ADDED_RES = 7, 3
SNAP_CHANGED_MOD, SNAP_CHANGED_RES = 11, 5
SNAP_REMOVED_MOD, SNAP_REMOVED_RES = 13, 1
SNAP_REMOVED_OFF = 3_000_000
SNAP_REV_SUFFIX = " rev2"
N_SNAP_PARTS = 32
_SNAP_STATUS = np.asarray(["added", "removed", "changed", "unchanged"],
                          dtype=object)


def snapshot_diff(sf_dir: str):
    """CDC-style snapshot reconciliation: per (source, status) counts of
    added / removed / changed / unchanged documents between two crawl
    snapshots — the ingest audit run before an incremental dedup pass
    decides what to reprocess.  The one FULL-OUTER-join shape in the
    registry (q13 is LEFT, bloom/fk are semi/anti); distinct from
    dedup.corpus_diff, which set-diffs FINGERPRINTS (no identity, no
    changed/unchanged classification) — this op reconciles per doc ID.

    Plan (both sides fact-sized, so neither may broadcast): each side
    reduces per batch to (id, side, source, md5-hex) rows — text never
    shuffles; rows co-locate by id hash into N_SNAP_PARTS coarse
    partitions (an id lives in exactly one part, so the full outer join
    resolves per part); per part ONE lexsort + run-boundary pass
    classifies every id (run length 1 -> added/removed by side, length
    2 -> changed/unchanged by fingerprint equality) and pre-folds to
    (source, status) counts; the driver merges <= 4 * n_sources *
    N_SNAP_PARTS count rows.  At 100 TB the same plan holds — the
    shuffle payload is (id, hash) pairs, the driver fold is bounded by
    source cardinality."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    gold = np.uint64(0x9E3779B97F4A7C15)

    def sides(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "id": pa.array([], type=pa.int64()),
                "side": pa.array([], type=pa.int64()),
                "source": pa.array([], type=pa.string()),
                "h": pa.array([], type=pa.string()),
                "part": pa.array([], type=pa.int64()),
            })
        ids = b["doc_id"].to_numpy().astype(np.int64)
        src = np.asarray(b["source"].to_pylist(), dtype=object)
        txt = b["text"].to_pylist()
        h = np.asarray(
            [hashlib.md5(t.encode()).hexdigest() for t in txt], dtype=object
        )
        chg = (ids % SNAP_CHANGED_MOD) == SNAP_CHANGED_RES
        hn = h.copy()
        for i in np.flatnonzero(chg):
            hn[i] = hashlib.md5(
                (txt[i] + SNAP_REV_SUFFIX).encode()
            ).hexdigest()
        in_old = (ids % SNAP_ADDED_MOD) != SNAP_ADDED_RES
        rem = (ids % SNAP_REMOVED_MOD) == SNAP_REMOVED_RES
        out_id = np.concatenate(
            [ids, ids[in_old], ids[rem] + SNAP_REMOVED_OFF])
        out_side = np.concatenate([
            np.ones(len(ids), dtype=np.int64),
            np.zeros(int(in_old.sum()) + int(rem.sum()), dtype=np.int64),
        ])
        out_src = np.concatenate([src, src[in_old], src[rem]])
        out_h = np.concatenate([hn, h[in_old], h[rem]])
        part = ((out_id.view(np.uint64) * gold)
                % np.uint64(N_SNAP_PARTS)).astype(np.int64)
        return pa.table({
            "id": pa.array(out_id),
            "side": pa.array(out_side),
            "source": pa.array(out_src, type=pa.string()),
            "h": pa.array(out_h, type=pa.string()),
            "part": pa.array(part),
        })

    def diff_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"source": pa.array([], type=pa.string()),
                             "st": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        ids = g["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        side = g["side"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, codes = np.unique(
            np.asarray(g["source"].to_pylist(), dtype=object),
            return_inverse=True)
        hc = np.unique(np.asarray(g["h"].to_pylist(), dtype=object),
                       return_inverse=True)[1]
        o = np.lexsort((side, ids))
        ids, side, codes, hc = ids[o], side[o], codes[o], hc[o]
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        lens = np.diff(np.r_[starts, len(ids)])
        status = np.empty(len(starts), dtype=np.int64)
        one = lens == 1
        status[one] = np.where(side[starts[one]] == 1, 0, 1)
        two = np.flatnonzero(lens == 2)
        eq = hc[starts[two]] == hc[starts[two] + 1]
        status[two] = np.where(eq, 3, 2)
        comp = codes[starts] * 4 + status
        cu, tot = np.unique(comp, return_counts=True)
        return pa.table({
            "source": pa.array(uniq[cu // 4], type=pa.string()),
            "st": pa.array((cu % 4).astype(np.int64)),
            "n": pa.array(tot.astype(np.int64)),
        })

    parts = (
        ds.map_batches(sides, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(diff_fold, batch_format="pyarrow")
        .take_all()  # bounded: <= 4 * n_sources * N_SNAP_PARTS count rows
    )
    src = np.asarray([r["source"] for r in parts], dtype=object)
    st = np.asarray([int(r["st"]) for r in parts], dtype=np.int64)
    n = np.asarray([int(r["n"]) for r in parts], dtype=np.int64)
    scodes, suniq = pd.factorize(src, sort=True)
    comp = scodes * 4 + st
    cu, inv = np.unique(comp, return_inverse=True)
    tot = np.zeros(len(cu), dtype=np.int64)
    np.add.at(tot, inv, n)
    out_src = suniq[cu // 4]
    out_st = _SNAP_STATUS[cu % 4]
    o = np.lexsort((out_st, out_src))
    return pa.table({
        "source": pa.array(out_src[o], type=pa.string()),
        "status": pa.array(out_st[o], type=pa.string()),
        "n": pa.array(tot[o]),
    })


# ---------------------------------------------------------------------------
# conversation-structure audit (transcript-shape QA)

# The transcript synthesizes like boilerplate's exact-extraction twin
# (each doc = one turn of conv_id = doc_id % EXACT_NCONV, turns ordered
# by doc_id) plus a deterministic ROLE: the first md5 hex byte of
# 'role:<doc_id>' buckets into user/assistant/tool at ~1/3 each.  The
# hash makes the within-conversation role sequence aperiodic, so
# alternation violations are non-vacuous at every sf (a mod-arithmetic
# role would cycle with the id stride and never violate).
CONV_ROLE_SALT = "role:"
CONV_ROLE_B1 = "55"   # < '55' -> user (85/256)
CONV_ROLE_B2 = "aa"   # < 'aa' -> assistant, else tool
N_CONV_PARTS = 16


def conv_structure_audit(sf_dir: str):
    """Per-conversation structural QA over the deterministic transcript:
    n_turns, adjacent same-role pairs (alternation violations), tool
    turns, total/max turn chars — the pre-train chat-data audit that
    decides which conversations need repair before packing.

    Physical plan: per batch each turn reduces to 4 int64s + a role code
    (text never shuffles — chars are measured in place); rows co-locate
    by conv hash into N_CONV_PARTS coarse partitions (a conversation
    lives in exactly one part, so adjacency is exact per part); per part
    ONE lexsort (conv, doc_id) + run-boundary pass folds every metric;
    <= EXACT_NCONV rows reach the driver.  At 10^12 turns the same plan
    holds — the shuffle payload is int rows, and a mega-conversation
    skewing one part is the flagship's salting discussion (here the
    fold is a linear scan, so skew costs time not memory)."""
    import ray.data as rd

    from prlib_ray.stages.boilerplate import EXACT_NCONV

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def prep(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "conv_id": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "role": pa.array([], type=pa.int64()),
                "chars": pa.array([], type=pa.int64()),
                "part": pa.array([], type=pa.int64()),
            })
        ids = b["doc_id"].to_numpy().astype(np.int64)
        chars = pc.utf8_length(b["text"]).to_numpy().astype(np.int64)
        h2 = [hashlib.md5(f"{CONV_ROLE_SALT}{int(i)}".encode())
              .hexdigest()[:2] for i in ids]
        role = np.asarray(
            [0 if h < CONV_ROLE_B1 else (1 if h < CONV_ROLE_B2 else 2)
             for h in h2], dtype=np.int64)
        conv = ids % EXACT_NCONV
        return pa.table({
            "conv_id": pa.array(conv),
            "doc_id": pa.array(ids),
            "role": pa.array(role),
            "chars": pa.array(chars),
            "part": pa.array(conv % N_CONV_PARTS),
        })

    def fold(g: pa.Table) -> pa.Table:
        cols = ("conv_id", "n_turns", "n_role_violations", "n_tool_turns",
                "total_chars", "max_turn_chars")
        if g.num_rows == 0:
            return pa.table({c: pa.array([], type=pa.int64())
                             for c in cols})
        conv = g["conv_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        role = g["role"].to_numpy(zero_copy_only=False).astype(np.int64)
        chars = g["chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((ids, conv))
        conv, role, chars = conv[o], role[o], chars[o]
        starts = np.flatnonzero(np.r_[True, conv[1:] != conv[:-1]])
        n_turns = np.diff(np.r_[starts, len(conv)])
        same_run = np.r_[False, (conv[1:] == conv[:-1])
                         & (role[1:] == role[:-1])].astype(np.int64)
        csum = np.r_[0, np.cumsum(same_run)]
        ends = np.r_[starts[1:], len(conv)]
        viol = csum[ends] - csum[starts]
        tool = np.add.reduceat((role == 2).astype(np.int64), starts)
        tot = np.add.reduceat(chars, starts)
        mx = np.maximum.reduceat(chars, starts)
        return pa.table({
            "conv_id": pa.array(conv[starts]),
            "n_turns": pa.array(n_turns.astype(np.int64)),
            "n_role_violations": pa.array(viol.astype(np.int64)),
            "n_tool_turns": pa.array(tool),
            "total_chars": pa.array(tot),
            "max_turn_chars": pa.array(mx),
        })

    rows = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .take_all()  # bounded: <= EXACT_NCONV conversation rows
    )
    df = pd.DataFrame(rows).sort_values("conv_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def conv_extract_digest(sf_dir: str):
    """Per-conversation digest of the extracted transcript: md5 of the
    '\\n'-joined clean_text in (conv_id, turn_idx) order, plus turn and
    char counts — the conversation-level restatement of the north
    rule's contract (per-turn text equality UNDER STABLE TURN
    ORDERING): any turn mis-ordered, dropped or altered anywhere in the
    distributed pipeline changes the digest, so the driver's value hash
    checks ordering itself, not just per-turn content.

    Physical plan: the embarrassingly-parallel exact-extraction kernel
    (boilerplate.extract_exact_batch) emits per-turn rows; turns
    co-locate by conv hash into coarse partitions (a digest needs the
    whole conversation in one place — the flagship's bucketed layout
    assumption; mega-conversations are the salting discussion, here a
    time-not-memory cost); per part ONE lexsort (conv, turn) + one
    run-boundary '\\n'.join + md5 per conversation; <= EXACT_NCONV
    digest rows reach the driver."""
    import ray.data as rd

    from prlib_ray.stages.boilerplate import EXACT_NCONV, extract_exact_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def prep(b: pa.Table) -> pa.Table:
        t = extract_exact_batch(b)
        conv = t["conv_id"].to_numpy().astype(np.int64)
        return pa.table({
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"],
            "clean_text": t["clean_text"],
            "part": pa.array(conv % N_CONV_PARTS),
        })

    def fold(g: pa.Table) -> pa.Table:
        cols = ("conv_id", "n_turns", "n_chars", "digest")
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"conv_id": z, "n_turns": z, "n_chars": z,
                             "digest": pa.array([], type=pa.string())})
        conv = g["conv_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        turn = g["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        txt = np.asarray(g["clean_text"].to_pylist(), dtype=object)
        o = np.lexsort((turn, conv))
        conv, txt = conv[o], txt[o]
        starts = np.flatnonzero(np.r_[True, conv[1:] != conv[:-1]])
        ends = np.r_[starts[1:], len(conv)]
        out = {c: [] for c in cols}
        for s, e in zip(starts, ends):  # <= EXACT_NCONV iterations
            joined = "\n".join(txt[s:e])
            out["conv_id"].append(int(conv[s]))
            out["n_turns"].append(e - s)
            out["n_chars"].append(len(joined))
            out["digest"].append(
                hashlib.md5(joined.encode("utf-8")).hexdigest())
        return pa.table({
            "conv_id": pa.array(out["conv_id"], type=pa.int64()),
            "n_turns": pa.array(out["n_turns"], type=pa.int64()),
            "n_chars": pa.array(out["n_chars"], type=pa.int64()),
            "digest": pa.array(out["digest"], type=pa.string()),
        })

    rows = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .take_all()  # bounded: <= EXACT_NCONV digest rows
    )
    df = pd.DataFrame(rows).sort_values("conv_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def data_factory(sf_dir: str):
    """The capstone composite — the pretraining-data funnel end-to-end
    as ONE pipeline: exact-dedup SURVIVORS -> Gopher quality gate ->
    leakage-free cluster-keyed SPLITS -> per-split document and token
    counts.  Every stage is an already-oracle-proven registry op
    composed unchanged (survivor rule = EXACT_DEDUP's, gate =
    gopher_quality's conjunction, split = split_no_leakage's cluster
    labels, tokens = token_count's regex), so the funnel cannot drift
    from its parts; the oracle composes the same four bodies as
    subqueries.  Output: (split, n_docs, n_tokens), <= 3 rows.

    Physical plan: survivors and splits join by doc_id hash (both
    doc-keyed Datasets — no broadcast of anything corpus-sized); the
    quality gate and token counts ride the SAME pruned documents scan
    in one map_batches; the final fold is a bounded 3-key partial
    merge.  At 100 TB this is three doc-keyed hash joins and one
    streaming scan — the shape of the real job."""
    import ray.data as rd
    from ray.data import from_arrow

    from prlib_ray.stages.dedup import _join_partitions, split_no_leakage
    from prlib_ray.stages.text_analysis import (
        gopher_quality_batch,
        token_count_batch,
    )
    from prlib_ray.stages import dedup as dd

    npart = _join_partitions()

    # survivors: one hash-group shuffle (the dedup_exact layout)
    surv = dd.exact_dedup(sf_dir)
    surv_ds = from_arrow(surv) if isinstance(surv, pa.Table) else surv
    surv_ds = surv_ds.map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow"
    )

    # quality gate + token counts: one scan, two vectorized kernels
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def gate(b: pa.Table) -> pa.Table:
        g = gopher_quality_batch(b)
        t = token_count_batch(b)
        keep = g["passes"].to_numpy().astype(bool)
        return pa.table({
            "doc_id": b["doc_id"].filter(pa.array(keep)),
            "n_tokens": t["n_tokens"].filter(pa.array(keep)),
        })

    gated = docs.map_batches(gate, batch_format="pyarrow",
                             zero_copy_batch=True)

    splits = split_no_leakage(sf_dir).map_batches(
        lambda b: b.select(["doc_id", "split"]), batch_format="pyarrow"
    )

    joined = surv_ds.join(
        gated, "inner", num_partitions=npart, on=("doc_id",),
    ).repartition(npart).join(
        splits, "inner", num_partitions=npart, on=("doc_id",),
    )

    def fold(b: pa.Table) -> pa.Table:
        sp = b["split"].to_numpy(zero_copy_only=False)
        nt = b["n_tokens"].to_numpy().astype(np.int64)
        names, inv = np.unique(sp, return_inverse=True)
        return pa.table({
            "split": pa.array(list(names), type=pa.string()),
            "n_docs": pa.array(np.bincount(inv).astype(np.int64)),
            "n_tokens": pa.array(
                int_bincount(inv, nt)),
        })

    parts = joined.map_batches(fold, batch_format="pyarrow").take_all()
    acc: dict[str, list[int]] = {}
    for r in parts:  # bounded: <= 3 rows per batch
        a = acc.setdefault(r["split"], [0, 0])
        a[0] += int(r["n_docs"])
        a[1] += int(r["n_tokens"])
    names = sorted(acc)
    return pa.table({
        "split": pa.array(names, type=pa.string()),
        "n_docs": pa.array(
            np.asarray([acc[s][0] for s in names], dtype=np.int64)),
        "n_tokens": pa.array(
            np.asarray([acc[s][1] for s in names], dtype=np.int64)),
    })
