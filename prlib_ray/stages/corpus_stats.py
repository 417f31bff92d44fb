"""Corpus-level statistics operators for training-data curation:
unigram corpus-frequency scoring (rare-word quality signal), per-doc
TF-IDF top term, and the Gopher-style duplicate-n-gram fraction.

These need a CORPUS-WIDE side table (vocabulary counts / document
frequencies / cross-document n-gram counts) attached back to every
document — the canonical two-pass shape of large-scale data curation.
The vocabulary side is size-gated like relational._probe_join:

* below ``VOCAB_BROADCAST_MAX_ROWS`` the folded (word, count) arrays
  broadcast once via ``ray.put`` and every batch probes with one
  ``np.searchsorted`` (zero extra shuffle);
* above it the exploded per-doc word rows hash-join the vocabulary
  Dataset (``Dataset.join``) and fold per doc through the
  coarse-partition pattern (dedup.py:165) — no driver materialization
  of a corpus-sized table ever happens.

``via="auto"`` picks the layout from the counted vocab size; pytest
pins the two layouts byte-equal.

All outputs are integers/strings (plus one exactly-mirrored float
ordering for the TF-IDF argmax), so every op has an exact DuckDB
oracle (oracles_corpus.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from prlib_ray.stages.dataset_prep import _word_hashes
from prlib_ray.stages.text_analysis import _flat_words

from prlib_ray.blocks import int_bincount

# Broadcast-vs-join gate for the vocabulary side.  Raw-word vocabularies
# are zipfian: even web-scale corpora stay in the 10^8 range, but the
# join layout exists for when they don't.
VOCAB_BROADCAST_MAX_ROWS = 5_000_000

# Coarse shuffle partitions for the per-doc fold on the join path — the
# dedup.py coarse-partition discipline (one vectorized pass per part,
# never a per-doc Ray group).
N_CORPUS_PARTS = 32


def _n_join_parts() -> int:
    """Join aggregators are ACTORS: sizing num_partitions above the CPU
    count stalls the pipeline (dedup._join_partitions lesson, NOTES_r2).
    Half the CPUs, floor 2."""
    from prlib_ray.stages.dedup import _join_partitions

    return _join_partitions()

DUP_NGRAM = 8  # window size for the duplicate-n-gram fraction

# Odd 64-bit mixing multipliers, one per n-gram position (extends the
# 3-slot scheme of dataset_prep._ngram_ids to order-8 windows; equal
# word windows always collide, unequal ones with ~2^-64 probability —
# pinned against a string-tuple brute force in tests).
_POS_MULT = np.array(
    [
        0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
        0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63, 0xFF51AFD7ED558CCD,
        0xC4CEB9FE1A85EC53, 0x2545F4914F6CDD1D,
    ],
    dtype=np.uint64,
)


# ---------------------------------------------------------------------------
# shared vocabulary-side builders


def _word_count_partial(b: pa.Table) -> pa.Table:
    """Per-batch (word, occurrences) partial — dictionary codes +
    bincount, empty words dropped; the pre-combine before the vocab
    groupby so the shuffle moves per-batch vocabulary, not words."""
    if b.num_rows == 0:
        return pa.table(
            {"w": pa.array([], type=pa.string()),
             "c": pa.array([], type=pa.int64())}
        )
    words, _, _ = _flat_words(b)
    nonempty = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
    dict_arr = pc.dictionary_encode(words)
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    terms = np.asarray(dict_arr.dictionary.to_pylist(), dtype=object)
    cnt = np.bincount(codes[nonempty], minlength=len(terms)).astype(np.int64)
    keep = cnt > 0
    return pa.table(
        {"w": pa.array(terms[keep], type=pa.string()),
         "c": pa.array(cnt[keep])}
    )


def _doc_freq_partial(b: pa.Table) -> pa.Table:
    """Per-batch (word, n_docs_containing) partial.  Rows are whole
    documents, so per-batch per-doc distinctness is complete."""
    if b.num_rows == 0:
        return pa.table(
            {"w": pa.array([], type=pa.string()),
             "c": pa.array([], type=pa.int64())}
        )
    words, doc_of_word, _ = _flat_words(b)
    nonempty = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
    dict_arr = pc.dictionary_encode(words)
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    terms = np.asarray(dict_arr.dictionary.to_pylist(), dtype=object)
    key = doc_of_word[nonempty] * max(len(terms), 1) + codes[nonempty]
    uniq = np.unique(key)  # distinct (doc, word)
    df = np.bincount(
        (uniq % max(len(terms), 1)).astype(np.int64), minlength=len(terms)
    ).astype(np.int64)
    keep = df > 0
    return pa.table(
        {"w": pa.array(terms[keep], type=pa.string()),
         "c": pa.array(df[keep])}
    )


def _word_part_tags(words) -> pa.Array:
    """crc32(w) % N_CORPUS_PARTS — the ONE definition of the word-side
    coarse partition scheme (shared by _vocab_dataset and the
    source-word fold so the 'a word lives in exactly one part'
    invariant cannot drift between consumers)."""
    import zlib

    return pa.array(np.asarray(
        [zlib.crc32(w.encode()) % N_CORPUS_PARTS for w in words],
        dtype=np.int64,
    ))


def _vocab_dataset(sf_dir: str, partial_fn):
    """(w, n) vocabulary counts.  The fold runs per WORD-side coarse
    partition (crc32(w) % N_CORPUS_PARTS, one vectorized pandas groupby
    each): vocabulary cardinality scales with the corpus and Ray's
    aggregate pays per-key cost (the dup_ngram_fraction lesson)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def add_part(b: pa.Table) -> pa.Table:
        t = partial_fn(b)
        return t.append_column("part", _word_part_tags(t["w"].to_pylist()))

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"w": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        w = np.asarray(g["w"].to_pylist(), dtype=object)
        c = g["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(w, kind="stable")
        w_s, c_s = w[o], c[o]
        starts = np.flatnonzero(np.r_[True, w_s[1:] != w_s[:-1]])
        return pa.table({"w": pa.array(w_s[starts], type=pa.string()),
                         "n": pa.array(np.add.reduceat(c_s, starts))})

    return (
        ds.map_batches(add_part, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
    )


def _resolve_via(via: str, vocab) -> tuple[str, object]:
    """('broadcast'|'join', materialized vocab Dataset).  The count that
    drives the gate is metadata-cheap on the materialized result."""
    mat = vocab.materialize()
    if via == "auto":
        via = ("broadcast" if mat.count() <= VOCAB_BROADCAST_MAX_ROWS
               else "join")
    return via, mat


def _rename_vocab(mat):
    """(w, n) -> (vw, n) so the hash join's key columns can't collide."""
    def ren(b: pa.Table) -> pa.Table:
        return b.rename_columns(["vw", "n"])

    return mat.map_batches(ren, batch_format="pyarrow", zero_copy_batch=True)


def _fold_vocab(mat) -> tuple[np.ndarray, np.ndarray]:
    from prlib_ray.relational import _collect_columns

    cols = _collect_columns(mat, ["w", "n"])
    w = cols["w"].astype(object)
    n = cols["n"].astype(np.int64)
    o = np.argsort(w, kind="stable")
    return w[o], n[o]


# ---------------------------------------------------------------------------
# unigram corpus-frequency score (rare-word quality signal)


def unigram_freq_score(sf_dir: str, *, via: str = "auto"):
    """Per doc: word count, summed corpus frequency of its words, and
    the rarest word's corpus count — the signal a rare-token / OCR-junk
    filter thresholds on (docs full of corpus-rare words score low).

    Two passes: (1) corpus vocabulary counts (per-batch partial +
    word groupby); (2) per-doc attach, size-gated broadcast-vs-join as
    documented in the module docstring.  Docs with zero non-empty words
    drop out (inner-join semantics, mirrored by the oracle)."""
    import ray
    import ray.data as rd

    via, vocab_mat = _resolve_via(via, _vocab_dataset(sf_dir, _word_count_partial))
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    if via == "broadcast":
        vw, vn = _fold_vocab(vocab_mat)
        ref = ray.put((vw, vn))

        def score(b: pa.Table) -> pa.Table:
            z = pa.array([], type=pa.int64())
            if b.num_rows == 0:
                return pa.table(
                    {"doc_id": z, "n_words": z, "freq_sum": z, "min_freq": z}
                )
            vw, vn = ray.get(ref)
            words, doc_of_word, ndocs = _flat_words(b)
            nonempty = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
            w = np.asarray(words.to_pylist(), dtype=object)[nonempty]
            d = doc_of_word[nonempty]
            cnt = vn[np.searchsorted(vw, w)]  # every word is in the vocab
            nw = np.bincount(d, minlength=ndocs).astype(np.int64)
            fs = int_bincount(d, cnt, minlength=ndocs)
            # per-doc min over the (already doc-ordered) word stream
            starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
            mins = np.zeros(ndocs, dtype=np.int64)
            if len(d):
                mins[d[starts]] = np.minimum.reduceat(cnt, starts)
            keep = nw > 0
            ids = b["doc_id"].to_numpy().astype(np.int64)
            return pa.table(
                {
                    "doc_id": pa.array(ids[keep]),
                    "n_words": pa.array(nw[keep]),
                    "freq_sum": pa.array(fs[keep]),
                    "min_freq": pa.array(mins[keep]),
                }
            )

        return docs.map_batches(score, batch_format="pyarrow",
                                zero_copy_batch=True)

    # join layout: exploded per-doc (word, occurrences) rows hash-join
    # the vocabulary; per-doc sums/min via groupby aggregation
    def explode(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if b.num_rows == 0:
            return pa.table(
                {"doc_id": z, "w": pa.array([], type=pa.string()), "tf": z}
            )
        words, doc_of_word, _ = _flat_words(b)
        nonempty = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
        dict_arr = pc.dictionary_encode(words)
        codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        terms = np.asarray(dict_arr.dictionary.to_pylist(), dtype=object)
        vocab = max(len(terms), 1)
        key = doc_of_word[nonempty] * vocab + codes[nonempty]
        uniq, tf = np.unique(key, return_counts=True)
        ids = b["doc_id"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids[(uniq // vocab).astype(np.int64)]),
                "w": pa.array(terms[(uniq % vocab).astype(np.int64)],
                              type=pa.string()),
                "tf": pa.array(tf.astype(np.int64)),
            }
        )

    joined = (
        docs.map_batches(explode, batch_format="pyarrow",
                         zero_copy_batch=True)
        .repartition(N_CORPUS_PARTS)  # coalesce empty/sparse blocks pre-join
        .join(_rename_vocab(vocab_mat), "inner",
              num_partitions=_n_join_parts(), on=("w",), right_on=("vw",))
    )

    def weighted(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if b.num_rows == 0:
            return pa.table(
                {"doc_id": z, "nw": z, "fs": z, "mn": z}
            )
        tf = b["tf"].to_numpy().astype(np.int64)
        n = b["n"].to_numpy().astype(np.int64)
        ids = b["doc_id"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "nw": pa.array(tf),
                "fs": pa.array(tf * n),
                "mn": pa.array(n),
                "dpart": pa.array(ids % N_CORPUS_PARTS),
            }
        )

    # doc-key cardinality is corpus-scale: fold per DOC-side coarse
    # partition (one vectorized pandas groupby each), not Ray's
    # per-key aggregate (the dup_ngram_fraction lesson)
    def doc_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc_id": z, "n_words": z,
                             "freq_sum": z, "min_freq": z})
        d = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nw = g["nw"].to_numpy(zero_copy_only=False).astype(np.int64)
        fs = g["fs"].to_numpy(zero_copy_only=False).astype(np.int64)
        mn = g["mn"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(d, kind="stable")
        d_s = d[o]
        starts = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
        return pa.table({
            "doc_id": pa.array(d_s[starts]),
            "n_words": pa.array(np.add.reduceat(nw[o], starts)),
            "freq_sum": pa.array(np.add.reduceat(fs[o], starts)),
            "min_freq": pa.array(np.minimum.reduceat(mn[o], starts)),
        })

    return (
        joined.map_batches(weighted, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("dpart")
        .map_groups(doc_fold, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# per-doc TF-IDF top term


def tfidf_top_term(sf_dir: str, *, via: str = "auto"):
    """Per doc, the term maximizing tf/df (N is constant per corpus, so
    the idf log is order-irrelevant), ties broken by the lexically
    smallest term — the one-word topic label a curation dashboard shows.

    The df side is the size-gated vocabulary pattern; the per-doc argmax
    is a vectorized run-boundary pass (lexsort by (doc, -score, term)),
    driver-free in both layouts.  The float tf/df ordering is the same
    IEEE division DuckDB evaluates (exact-int operands), so the oracle
    hash is exact."""
    import ray
    import ray.data as rd

    via, df_mat = _resolve_via(via, _vocab_dataset(sf_dir, _doc_freq_partial))
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def _argmax(ids, terms, tf, df):
        """Per-doc winner of (tf/df desc, term asc); inputs unordered."""
        if len(ids) == 0:  # batch of only empty-word docs
            return ids, terms, tf, df
        score = tf / df
        order = np.lexsort((terms, -score, ids))
        i, t = ids[order], terms[order]
        s_tf, s_df = tf[order], df[order]
        first = np.r_[True, i[1:] != i[:-1]]
        return i[first], t[first], s_tf[first], s_df[first]

    if via == "broadcast":
        vw, vdf = _fold_vocab(df_mat)
        ref = ray.put((vw, vdf))

        def top_term(b: pa.Table) -> pa.Table:
            z = pa.array([], type=pa.int64())
            if b.num_rows == 0:
                return pa.table(
                    {"doc_id": z, "term": pa.array([], type=pa.string()),
                     "tf": z, "df": z}
                )
            vw, vdf = ray.get(ref)
            words, doc_of_word, _ = _flat_words(b)
            nonempty = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
            dict_arr = pc.dictionary_encode(words)
            codes = dict_arr.indices.to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            terms = np.asarray(dict_arr.dictionary.to_pylist(), dtype=object)
            vocab = max(len(terms), 1)
            key = doc_of_word[nonempty] * vocab + codes[nonempty]
            uniq, tf = np.unique(key, return_counts=True)
            d_idx = (uniq // vocab).astype(np.int64)
            t_arr = terms[(uniq % vocab).astype(np.int64)]
            df = vdf[np.searchsorted(vw, t_arr)]
            ids = b["doc_id"].to_numpy().astype(np.int64)
            di, dt, dtf, ddf = _argmax(
                ids[d_idx], t_arr, tf.astype(np.int64), df
            )
            return pa.table(
                {
                    "doc_id": pa.array(di),
                    "term": pa.array(dt, type=pa.string()),
                    "tf": pa.array(dtf),
                    "df": pa.array(ddf),
                }
            )

        return docs.map_batches(top_term, batch_format="pyarrow",
                                zero_copy_batch=True)

    # join layout: (doc, term, tf) rows join the df Dataset, per-doc
    # argmax through coarse partitions (never a per-doc Ray group)
    def explode(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if b.num_rows == 0:
            return pa.table(
                {"doc_id": z, "w": pa.array([], type=pa.string()),
                 "tf": z, "part": z}
            )
        words, doc_of_word, _ = _flat_words(b)
        nonempty = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
        dict_arr = pc.dictionary_encode(words)
        codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        terms = np.asarray(dict_arr.dictionary.to_pylist(), dtype=object)
        vocab = max(len(terms), 1)
        key = doc_of_word[nonempty] * vocab + codes[nonempty]
        uniq, tf = np.unique(key, return_counts=True)
        ids = b["doc_id"].to_numpy().astype(np.int64)
        d = ids[(uniq // vocab).astype(np.int64)]
        return pa.table(
            {
                "doc_id": pa.array(d),
                "w": pa.array(terms[(uniq % vocab).astype(np.int64)],
                              type=pa.string()),
                "tf": pa.array(tf.astype(np.int64)),
                "part": pa.array((d % N_CORPUS_PARTS).astype(np.int64)),
            }
        )

    joined = (
        docs.map_batches(explode, batch_format="pyarrow",
                         zero_copy_batch=True)
        .repartition(N_CORPUS_PARTS)
        .join(_rename_vocab(df_mat), "inner",
              num_partitions=_n_join_parts(), on=("w",), right_on=("vw",))
    )

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc_id": z,
                             "term": pa.array([], type=pa.string()),
                             "tf": z, "df": z})
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        terms = np.asarray(g["w"].to_pylist(), dtype=object)
        tf = g["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        di, dt, dtf, ddf = _argmax(ids, terms, tf, df)
        return pa.table(
            {"doc_id": pa.array(di),
             "term": pa.array(dt, type=pa.string()),
             "tf": pa.array(dtf), "df": pa.array(ddf)}
        )

    return joined.groupby("part").map_groups(per_part, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# duplicate-n-gram fraction (Gopher-style boilerplate signal)


def _window_ids(b: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(uint64 window ids, doc index per window) for all DUP_NGRAM-word
    windows staying inside one document.  One split pass, one
    unique-word md5 pass, DUP_NGRAM vectorized multiply-adds."""
    words, doc_of_word, _ = _flat_words(b)
    n = DUP_NGRAM
    if len(words) < n:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)
    h = _word_hashes(words)
    d = doc_of_word
    m = len(h) - n + 1
    valid = d[:m] == d[n - 1:]
    g = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            g += h[j: m + j] * _POS_MULT[j]
    return g[valid], d[:m][valid]


def dup_ngram_fraction(sf_dir: str):
    """Per doc: total DUP_NGRAM-word windows, how many repeat in at
    least one OTHER document, and the integer percentage — the
    Gopher-style duplicate-n-gram boilerplate fraction."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return _crossdoc_window_fraction(ds, _window_ids)


# Exact-substring dedup signal (Lee et al. 2022 shape): character-level
# windows instead of word n-grams — catches boilerplate that word
# tokenization splits differently.  SUBSTR_LEN follows the paper's
# ~50-character ballpark, sized so the fixtures keep naturally
# duplicated windows (11k+ at sf0.01).
SUBSTR_LEN = 40

# one well-mixed odd multiplier per character position (md5-derived,
# same practical-exactness convention as _POS_MULT)
_CHAR_MULT = np.fromiter(
    (int.from_bytes(hashlib.md5(f"substr-{j}".encode()).digest()[:8],
                    "big") | 1
     for j in range(SUBSTR_LEN)),
    dtype=np.uint64,
    count=SUBSTR_LEN,
)


def _char_window_ids(b: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(uint64 ids, doc index) for every SUBSTR_LEN-character window
    staying inside one document.  One utf-32 decode of the whole batch
    (one uint32 code point per character — the same character counting
    as DuckDB's length()/substr()), then SUBSTR_LEN vectorized
    multiply-adds over the flat code-point stream."""
    texts = b["text"].to_pylist()
    if not texts:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)
    joined = "".join(texts)
    cp = np.frombuffer(
        joined.encode("utf-32-le"), dtype=np.uint32
    ).astype(np.uint64)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64,
                       count=len(texts))
    d = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    L = SUBSTR_LEN
    if len(cp) < L:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)
    m = len(cp) - L + 1
    valid = d[:m] == d[L - 1:]
    g = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(L):
            g += cp[j: m + j] * _CHAR_MULT[j]
    return g[valid], d[:m][valid]


def dup_substring_fraction(sf_dir: str):
    """Per doc: total SUBSTR_LEN-char windows, how many occur in at
    least one OTHER document, and the integer percentage — the exact-
    substring dedup signal (character-level; Lee et al. 2022 shape)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return _crossdoc_window_fraction(ds, _char_window_ids)


def _crossdoc_window_fraction(ds, window_fn):
    """Shared cross-document duplicate-window plan (dup_ngram_fraction
    AND dup_substring_fraction — one implementation so the two signals
    cannot desynchronize):

    per-batch explode to distinct (window id, doc, occurrences) rows
    (pre-combined — within-doc repeats never shuffle as separate
    rows); window ids hash into N_CORPUS_PARTS coarse partitions so
    each part resolves cross-document sharing in one vectorized pass
    (a window id never spans parts); per-doc partials then fold
    through DOC-side coarse partitions.  Only integer rows shuffle,
    and each window id moves once per doc."""

    def explode(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if b.num_rows == 0:
            return pa.table(
                {"g": pa.array([], type=pa.uint64()), "doc_id": z,
                 "c": z, "part": z}
            )
        g, d = window_fn(b)
        if len(g) == 0:  # non-empty batch, but no doc long enough
            return pa.table(
                {"g": pa.array([], type=pa.uint64()), "doc_id": z,
                 "c": z, "part": z}
            )
        ids = b["doc_id"].to_numpy().astype(np.int64)
        # distinct (window, doc) with occurrence counts, vectorized
        order = np.lexsort((d, g))
        gs, ds_ = g[order], d[order]
        new = np.r_[True, (gs[1:] != gs[:-1]) | (ds_[1:] != ds_[:-1])]
        starts = np.flatnonzero(new)
        c = np.diff(np.r_[starts, len(gs)]).astype(np.int64)
        gu, du = gs[starts], ds_[starts]
        return pa.table(
            {
                "g": pa.array(gu),
                "doc_id": pa.array(ids[du]),
                "c": pa.array(c),
                "part": pa.array(
                    (gu % np.uint64(N_CORPUS_PARTS)).astype(np.int64)
                ),
            }
        )

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc_id": z, "tot": z, "dup": z, "dpart": z})
        gid = g["g"].to_numpy(zero_copy_only=False).astype(np.uint64)
        doc = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = g["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(gid, kind="stable")
        gs, doc_s, c_s = gid[order], doc[order], c[order]
        new = np.r_[True, gs[1:] != gs[:-1]]
        run = np.cumsum(new) - 1
        ndocs = np.bincount(run)  # (window, doc) rows are distinct
        dup = ndocs[run] >= 2
        # per-doc partial within this part, pre-keyed by the doc-side
        # coarse partition for the second fold
        ud, inv = np.unique(doc_s, return_inverse=True)
        tot = int_bincount(inv, c_s)
        dupc = int_bincount(inv, c_s * dup)
        return pa.table(
            {"doc_id": pa.array(ud), "tot": pa.array(tot),
             "dup": pa.array(dupc),
             "dpart": pa.array(ud % N_CORPUS_PARTS)}
        )

    # Second fold: per-doc totals via DOC-side coarse partitions, one
    # vectorized bincount pass per part.  Measured 25 s -> 1.3 s at sf0.1
    # vs groupby(doc_id).aggregate(Sum, Sum): Ray's sort-aggregate pays
    # per-GROUP cost (and ~10x worse on the pandas blocks map_groups
    # emits) — the same per-key lesson as dedup's candidate pairs.  Each
    # dpart group holds ~ndocs/N_CORPUS_PARTS 4-int rows; raise
    # N_CORPUS_PARTS for 10^9+ doc corpora (same knob note as PACK_CHUNK).
    def merge_docs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc_id": z, "n_windows": z,
                             "dup_windows": z})
        doc = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ud, inv = np.unique(doc, return_inverse=True)
        tot = g["tot"].to_numpy(zero_copy_only=False).astype(np.int64)
        dup = g["dup"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ud),
                "n_windows": pa.array(int_bincount(inv, tot)),
                "dup_windows": pa.array(int_bincount(inv, dup)),
            }
        )

    agg = (
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
        .groupby("dpart")
        .map_groups(merge_docs, batch_format="pyarrow")
    )

    def pct(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "n_windows": pa.array([], type=pa.int64()),
                 "dup_windows": pa.array([], type=pa.int64()),
                 "dup_pct": pa.array([], type=pa.int64())}
            )
        nw = b["n_windows"].to_numpy().astype(np.int64)
        dw = b["dup_windows"].to_numpy().astype(np.int64)
        return b.append_column(
            "dup_pct", pa.array((100 * dw) // np.maximum(nw, 1))
        )

    return agg.map_batches(pct, batch_format="pyarrow", zero_copy_batch=True)


def build_inverted_index(sf_dir: str):
    """The search-index build artifact: one posting row per distinct
    (term, doc) — term, doc_id, term frequency, and the term's document
    frequency (the BM25 inputs) — term-partitioned and term-sorted the
    way an index shard is written.

    Per-batch explode to pre-combined (term, doc, tf) rows; terms hash
    into N_CORPUS_PARTS coarse partitions (a term never spans parts, so
    each part computes its terms' df in the same lexsort pass that
    orders the postings); only the distinct posting rows shuffle."""
    import zlib

    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def explode(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if b.num_rows == 0:
            return pa.table(
                {"w": pa.array([], type=pa.string()), "doc_id": z,
                 "tf": z, "part": z}
            )
        words, doc_of_word, _ = _flat_words(b)
        nonempty = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
        dict_arr = pc.dictionary_encode(words)
        codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        terms = np.asarray(dict_arr.dictionary.to_pylist(), dtype=object)
        vocab = max(len(terms), 1)
        key = doc_of_word[nonempty] * vocab + codes[nonempty]
        uniq, tf = np.unique(key, return_counts=True)
        ids = b["doc_id"].to_numpy().astype(np.int64)
        t_arr = terms[(uniq % vocab).astype(np.int64)]
        uniq_t, inv_t = np.unique(t_arr, return_inverse=True)
        pu = np.asarray(
            [zlib.crc32(t.encode()) % N_CORPUS_PARTS for t in uniq_t],
            dtype=np.int64,
        )
        return pa.table(
            {
                "w": pa.array(t_arr, type=pa.string()),
                "doc_id": pa.array(ids[(uniq // vocab).astype(np.int64)]),
                "tf": pa.array(tf.astype(np.int64)),
                "part": pa.array(pu[inv_t]),
            }
        )

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"term": pa.array([], type=pa.string()),
                             "doc_id": z, "tf": z, "df": z})
        w = np.asarray(g["w"].to_pylist(), dtype=object)
        doc = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tf = g["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((doc, w))
        ws, ds_, tfs = w[order], doc[order], tf[order]
        new = np.r_[True, ws[1:] != ws[:-1]]
        run = np.cumsum(new) - 1
        df = np.bincount(run)  # (term, doc) rows are distinct
        return pa.table(
            {"term": pa.array(ws, type=pa.string()),
             "doc_id": pa.array(ds_), "tf": pa.array(tfs),
             "df": pa.array(df[run].astype(np.int64))}
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
    )


# Retrieval over the index: a fixed conjunctive keyword query scored
# with integer idf weights — floor(1e6 / df) per term, tf-weighted —
# so the ranking is exact (BM25's log/length terms would break the
# value-hash oracle; the integer weighting preserves the idf ordering).
SEARCH_TERMS = ("table", "join", "hash")
SEARCH_K = 10
IDF_SCALE = 1_000_000


def search_topk(sf_dir: str):
    """Top-SEARCH_K documents for the fixed SEARCH_TERMS query:
    score(doc) = sum over query terms of tf(term, doc) * (IDF_SCALE //
    df(term)), ties to the smallest doc_id — the query path over the
    inverted index.

    The filtered postings (<= |terms| rows per doc) materialize ONCE;
    the 3-row df table folds from it (bounded take); scoring is a
    vectorized weight gather; per-doc totals fold through coarse doc
    partitions, each emitting a local top-K, and the <= K * parts
    candidate rows merge on the driver (the q3 bounded-merge
    pattern)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    tset = pa.array(SEARCH_TERMS, type=pa.string())

    def explode(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if b.num_rows == 0:
            return pa.table(
                {"w": pa.array([], type=pa.string()), "doc_id": z, "tf": z}
            )
        words, doc_of_word, _ = _flat_words(b)
        hit = pc.is_in(words, value_set=tset).to_numpy(zero_copy_only=False)
        if not hit.any():
            return pa.table(
                {"w": pa.array([], type=pa.string()), "doc_id": z, "tf": z}
            )
        # materialize ONLY the hits (bounded by |terms| x docs), never
        # the batch's full flat word stream
        w = np.asarray(
            words.filter(pa.array(hit)).to_pylist(), dtype=object
        )
        d = doc_of_word[hit]
        uniq_t, code = np.unique(w, return_inverse=True)
        key = d * len(uniq_t) + code
        uniq, tf = np.unique(key, return_counts=True)
        ids = b["doc_id"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "w": pa.array(uniq_t[(uniq % len(uniq_t)).astype(np.int64)],
                              type=pa.string()),
                "doc_id": pa.array(ids[(uniq // len(uniq_t)).astype(np.int64)]),
                "tf": pa.array(tf.astype(np.int64)),
            }
        )

    tfq = ds.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # <= |terms| rows per matching doc

    # df per query term: a bounded (<= |terms| rows) aggregate take
    from ray.data.aggregate import Count

    df_rows = tfq.groupby("w").aggregate(Count(alias_name="df")).take_all()
    weight = {r["w"]: IDF_SCALE // int(r["df"]) for r in df_rows}

    def score_part(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if b.num_rows == 0:
            return pa.table({"doc_id": z, "score": z, "part": z})
        w = np.asarray(b["w"].to_pylist(), dtype=object)
        tf = b["tf"].to_numpy().astype(np.int64)
        ids = b["doc_id"].to_numpy().astype(np.int64)
        wt = np.asarray([weight[t] for t in w], dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "score": pa.array(tf * wt),
                "part": pa.array(ids % N_CORPUS_PARTS),
            }
        )

    def local_topk(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc_id": z, "score": z})
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sc = g["score"].to_numpy(zero_copy_only=False).astype(np.int64)
        ud, inv = np.unique(ids, return_inverse=True)
        # int64 accumulation (bincount's float64 weights would round
        # past 2^53, breaking the exact-integer scoring contract)
        tot = np.zeros(len(ud), dtype=np.int64)
        np.add.at(tot, inv, sc)
        order = np.lexsort((ud, -tot))[:SEARCH_K]
        return pa.table({"doc_id": pa.array(ud[order]),
                         "score": pa.array(tot[order])})

    cand = (
        tfq.map_batches(score_part, batch_format="pyarrow",
                        zero_copy_batch=True)
        .groupby("part")
        .map_groups(local_topk, batch_format="pyarrow")
        .take_all()  # <= SEARCH_K * N_CORPUS_PARTS bounded rows
    )
    cand.sort(key=lambda r: (-int(r["score"]), int(r["doc_id"])))
    top = cand[:SEARCH_K]
    return pa.table(
        {
            "doc_id": pa.array([int(r["doc_id"]) for r in top],
                               type=pa.int64()),
            "score": pa.array([int(r["score"]) for r in top],
                              type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# C4-style cross-document segment dedup


# C4 (Raffel et al. 2020 §2.2) drops any three-sentence span occurring
# more than once in the corpus.  This corpus has no sentence boundaries
# (single-space word streams), so the unit is the disjoint SEG_WIDTH-word
# segment; a segment whose exact text occurs >= SEG_DUP_MIN times
# corpus-wide (total occurrences, not distinct docs — thrice in one doc
# also trips it) is removed everywhere.  At these settings the sf
# fixtures contain 20+ naturally duplicated segments, so the driver row
# is non-vacuous without planting.
SEG_WIDTH = 4
SEG_DUP_MIN = 3


def _segment_ids(b: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(uint64 segment ids, doc index per segment) for the disjoint
    SEG_WIDTH-token segments of each doc (empty tokens retained, the
    <SEG_WIDTH tail dropped).  One split pass, one unique-word md5 pass,
    a position-multiplier combine summed per segment with reduceat —
    token runs of a segment are adjacent in the flat stream."""
    words, d, ndocs = _flat_words(b)
    if len(words) == 0:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)
    h = _word_hashes(words)
    ntok = np.bincount(d, minlength=ndocs).astype(np.int64)
    doc_start = np.r_[0, np.cumsum(ntok)][:-1]
    idx = np.arange(len(d), dtype=np.int64) - doc_start[d]
    pos = idx % SEG_WIDTH
    with np.errstate(over="ignore"):
        contrib = h * _POS_MULT[pos]
    starts = np.flatnonzero(pos == 0)
    g = np.add.reduceat(contrib, starts)
    full = idx[starts] + SEG_WIDTH <= ntok[d[starts]]
    return g[full], d[starts][full]


def segment_dedup(sf_dir: str):
    """Per doc: full SEG_WIDTH-word segments, how many are removed by
    the corpus-wide >=SEG_DUP_MIN-occurrence rule, and the integer
    removal percentage — the C4 boilerplate-removal accounting.

    Same physical plan as dup_ngram_fraction: per-batch explode to
    distinct (segment id, doc, occurrences) rows; segment ids hash into
    N_CORPUS_PARTS coarse partitions (an id never spans parts, so each
    part resolves corpus-wide occurrence totals in one vectorized
    pass); per-doc partials fold through DOC-side coarse partitions.
    Only integer rows shuffle."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return segment_stats(ds)


def segment_stats(ds):
    """The segment-dedup accounting over an arbitrary (doc_id, text)
    Dataset — factored out so pipeline compositions (pipelines/curate.py)
    can run it over an augmented corpus."""

    def explode(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        empty = pa.table(
            {"g": pa.array([], type=pa.uint64()), "doc_id": z,
             "c": z, "part": z}
        )
        if b.num_rows == 0:
            return empty
        g, d = _segment_ids(b)
        if len(g) == 0:
            return empty
        ids = b["doc_id"].to_numpy().astype(np.int64)
        order = np.lexsort((d, g))
        gs, ds_ = g[order], d[order]
        new = np.r_[True, (gs[1:] != gs[:-1]) | (ds_[1:] != ds_[:-1])]
        starts = np.flatnonzero(new)
        c = np.diff(np.r_[starts, len(gs)]).astype(np.int64)
        gu, du = gs[starts], ds_[starts]
        return pa.table(
            {
                "g": pa.array(gu),
                "doc_id": pa.array(ids[du]),
                "c": pa.array(c),
                "part": pa.array(
                    (gu % np.uint64(N_CORPUS_PARTS)).astype(np.int64)
                ),
            }
        )

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc_id": z, "tot": z, "rem": z, "dpart": z})
        gid = g["g"].to_numpy(zero_copy_only=False).astype(np.uint64)
        doc = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = g["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(gid, kind="stable")
        gs, doc_s, c_s = gid[order], doc[order], c[order]
        new = np.r_[True, gs[1:] != gs[:-1]]
        run = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        # corpus-wide OCCURRENCE total per segment (C4 counts repeats,
        # not distinct docs)
        tot_per_seg = np.add.reduceat(c_s, starts)
        dup = tot_per_seg[run] >= SEG_DUP_MIN
        ud, inv = np.unique(doc_s, return_inverse=True)
        tot = int_bincount(inv, c_s)
        rem = int_bincount(inv, c_s * dup)
        return pa.table(
            {"doc_id": pa.array(ud), "tot": pa.array(tot),
             "rem": pa.array(rem),
             "dpart": pa.array(ud % N_CORPUS_PARTS)}
        )

    def merge_docs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc_id": z, "n_segments": z,
                             "removed_segments": z})
        doc = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ud, inv = np.unique(doc, return_inverse=True)
        tot = g["tot"].to_numpy(zero_copy_only=False).astype(np.int64)
        rem = g["rem"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ud),
                "n_segments": pa.array(int_bincount(inv, tot)),
                "removed_segments": pa.array(int_bincount(inv, rem)),
            }
        )

    agg = (
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
        .groupby("dpart")
        .map_groups(merge_docs, batch_format="pyarrow")
    )

    def pct(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "n_segments": pa.array([], type=pa.int64()),
                 "removed_segments": pa.array([], type=pa.int64()),
                 "removed_pct": pa.array([], type=pa.int64())}
            )
        ns = b["n_segments"].to_numpy().astype(np.int64)
        rs = b["removed_segments"].to_numpy().astype(np.int64)
        return b.append_column(
            "removed_pct", pa.array((100 * rs) // np.maximum(ns, 1))
        )

    return agg.map_batches(pct, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# bigram language-model score (KenLM/CCNet-style n-gram LM quality proxy)

LM_SCALE = 1_000_000


def _doc_bigram_stream(b: pa.Table):
    """ONE definition of the bigram stream, shared by training
    (_bigram_partial) and inference (bigram_lm_score's per-doc attach)
    so the two can never desynchronize: (g Arrow array 'w1 w2', first
    words a1, doc index per bigram, ndocs); g is None when the batch
    holds no within-doc adjacent non-empty word pair."""
    words, doc_of_word, ndocs = _flat_words(b)
    ne = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
    w = np.asarray(words.to_pylist(), dtype=object)[ne]
    d = doc_of_word[ne]
    if len(w) < 2:
        return None, None, None, ndocs
    valid = d[:-1] == d[1:]
    a1 = w[:-1][valid]
    a2 = w[1:][valid]
    dg = d[:-1][valid]
    if not len(a1):
        return None, None, None, ndocs
    g = pc.binary_join_element_wise(
        pa.array(a1, type=pa.string()), pa.array(a2, type=pa.string()), " "
    )
    return g, a1, dg, ndocs


def _bigram_partial(b: pa.Table) -> pa.Table:
    """Per-batch (g, w1, c) bigram-count partial: g = 'w1 w2' over
    adjacent non-empty words within one document, c = occurrences in
    this batch.  Vectorized: the join is Arrow binary_join_element_wise,
    the count a dictionary-encode + bincount."""
    empty = pa.table(
        {"g": pa.array([], type=pa.string()),
         "w1": pa.array([], type=pa.string()),
         "c": pa.array([], type=pa.int64())}
    )
    if b.num_rows == 0:
        return empty
    g, a1, _, _ = _doc_bigram_stream(b)
    if g is None:
        return empty
    dict_arr = pc.dictionary_encode(g)
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq, first = np.unique(codes, return_index=True)
    cnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
    terms = np.asarray(dict_arr.dictionary.to_pylist(), dtype=object)
    return pa.table(
        {
            "g": pa.array(terms[uniq], type=pa.string()),
            "w1": pa.array(a1[first], type=pa.string()),
            "c": pa.array(cnt[uniq]),
        }
    )


def _bigram_term_dataset(sf_dir: str):
    """(g, term) Dataset: term = floor(LM_SCALE * c2(g) / c1(w1)) —
    the integer conditional-probability table the scorer probes.  Both
    folds run per coarse word-side partition; the c1 attach is a
    Dataset.join of two vocabulary-sized sides (never a driver fold)."""
    import zlib

    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def add_part(b: pa.Table) -> pa.Table:
        t = _bigram_partial(b)
        part = np.asarray(
            [zlib.crc32(g.encode()) % N_CORPUS_PARTS
             for g in t["g"].to_pylist()],
            dtype=np.int64,
        )
        return t.append_column("part", pa.array(part))

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"g": pa.array([], type=pa.string()),
                             "w1": pa.array([], type=pa.string()),
                             "c2": pa.array([], type=pa.int64())})
        gk = np.asarray(g["g"].to_pylist(), dtype=object)
        w1 = np.asarray(g["w1"].to_pylist(), dtype=object)
        c = g["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(gk, kind="stable")
        g_s, c_s = gk[o], c[o]
        starts = np.flatnonzero(np.r_[True, g_s[1:] != g_s[:-1]])
        return pa.table({
            "g": pa.array(g_s[starts], type=pa.string()),
            "w1": pa.array(w1[o][starts], type=pa.string()),
            "c2": pa.array(np.add.reduceat(c_s, starts)),
        })

    bigrams = (
        ds.map_batches(add_part, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .repartition(_n_join_parts())  # coalesce pre-join
    )
    unigrams = _vocab_dataset(sf_dir, _word_count_partial)
    joined = bigrams.join(
        # repartition coalesces the fold's schema-less empty pandas
        # blocks (they bypass map UDFs and crash the join aggregators —
        # the NOTES_r3 empty-block pitfall; surfaced at sf0.1)
        _rename_vocab(unigrams).repartition(_n_join_parts()), "inner",
        num_partitions=_n_join_parts(), on=("w1",), right_on=("vw",),
    )

    def to_term(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if b.num_rows == 0:
            return pa.table({"g": pa.array([], type=pa.string()),
                             "term": z})
        c2 = b["c2"].to_numpy().astype(np.int64)
        c1 = b["n"].to_numpy().astype(np.int64)
        return pa.table(
            {"g": b["g"],
             "term": pa.array((LM_SCALE * c2) // np.maximum(c1, 1))}
        )

    return joined.map_batches(to_term, batch_format="pyarrow")


def bigram_lm_score(sf_dir: str, *, via: str = "auto"):
    """Per doc: bigram count and an integer n-gram-LM fluency score —
    sum over the doc's bigram occurrences of floor(LM_SCALE *
    c2(w1,w2) / c1(w1)), i.e. scaled conditional probabilities from a
    corpus-trained bigram table (the KenLM/CCNet quality-filter shape,
    exact integers so the DuckDB oracle matches bit-for-bit).

    Two passes: (1) train — bigram + unigram corpus counts, folded per
    coarse word partition, term table via Dataset.join; (2) inference —
    per-doc attach, size-gated broadcast-vs-join exactly like
    unigram_freq_score.  Docs with < 2 non-empty words drop out
    (inner-join semantics, mirrored by the oracle)."""
    import ray
    import ray.data as rd

    via, term_mat = _resolve_via(via, _bigram_term_dataset(sf_dir))
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def doc_bigrams(b: pa.Table):
        """(g array, doc index per bigram, ndocs) — the shared stream
        definition (_doc_bigram_stream), first-word column dropped."""
        g, _, dg, ndocs = _doc_bigram_stream(b)
        return g, dg, ndocs

    if via == "broadcast":
        from prlib_ray.relational import _collect_columns

        cols = _collect_columns(term_mat, ["g", "term"])
        gv = cols["g"].astype(object)
        tv = cols["term"].astype(np.int64)
        o = np.argsort(gv, kind="stable")
        ref = ray.put((gv[o], tv[o]))

        def score(b: pa.Table) -> pa.Table:
            z = pa.array([], type=pa.int64())
            if b.num_rows == 0:
                return pa.table(
                    {"doc_id": z, "n_bigrams": z, "lm_score": z}
                )
            gv, tv = ray.get(ref)
            g, dg, ndocs = doc_bigrams(b)
            ids = b["doc_id"].to_numpy().astype(np.int64)
            if g is None:
                return pa.table(
                    {"doc_id": z, "n_bigrams": z, "lm_score": z}
                )
            terms = tv[np.searchsorted(gv, np.asarray(g.to_pylist(),
                                                      dtype=object))]
            nb = np.bincount(dg, minlength=ndocs).astype(np.int64)
            lm = int_bincount(dg, terms, minlength=ndocs)
            keep = nb > 0
            return pa.table(
                {
                    "doc_id": pa.array(ids[keep]),
                    "n_bigrams": pa.array(nb[keep]),
                    "lm_score": pa.array(lm[keep]),
                }
            )

        return docs.map_batches(score, batch_format="pyarrow",
                                zero_copy_batch=True)

    # join layout: exploded per-doc (g, tf) rows hash-join the term
    # table; per-doc fold through doc-side coarse partitions
    def explode(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if b.num_rows == 0:
            return pa.table(
                {"doc_id": z, "g": pa.array([], type=pa.string()), "tf": z}
            )
        g, dg, _ = doc_bigrams(b)
        ids = b["doc_id"].to_numpy().astype(np.int64)
        if g is None:
            return pa.table(
                {"doc_id": z, "g": pa.array([], type=pa.string()), "tf": z}
            )
        dict_arr = pc.dictionary_encode(g)
        codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        terms = np.asarray(dict_arr.dictionary.to_pylist(), dtype=object)
        k = max(len(terms), 1)
        key = dg * k + codes
        uniq, tf = np.unique(key, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(ids[(uniq // k).astype(np.int64)]),
                "g": pa.array(terms[(uniq % k).astype(np.int64)],
                              type=pa.string()),
                "tf": pa.array(tf.astype(np.int64)),
            }
        )

    def rename_term(b: pa.Table) -> pa.Table:
        return b.rename_columns(["tg", "term"])

    joined = (
        docs.map_batches(explode, batch_format="pyarrow",
                         zero_copy_batch=True)
        .repartition(N_CORPUS_PARTS)
        .join(term_mat.map_batches(rename_term, batch_format="pyarrow"),
              "inner", num_partitions=_n_join_parts(),
              on=("g",), right_on=("tg",))
    )

    def weighted(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if b.num_rows == 0:
            return pa.table({"doc_id": z, "nb": z, "lm": z, "dpart": z})
        tf = b["tf"].to_numpy().astype(np.int64)
        t = b["term"].to_numpy().astype(np.int64)
        ids = b["doc_id"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "nb": pa.array(tf),
                "lm": pa.array(tf * t),
                "dpart": pa.array(ids % N_CORPUS_PARTS),
            }
        )

    def doc_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc_id": z, "n_bigrams": z, "lm_score": z})
        d = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = g["nb"].to_numpy(zero_copy_only=False).astype(np.int64)
        lm = g["lm"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(d, kind="stable")
        d_s = d[o]
        starts = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
        return pa.table({
            "doc_id": pa.array(d_s[starts]),
            "n_bigrams": pa.array(np.add.reduceat(nb[o], starts)),
            "lm_score": pa.array(np.add.reduceat(lm[o], starts)),
        })

    return (
        joined.map_batches(weighted, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("dpart")
        .map_groups(doc_fold, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# pairwise source vocabulary overlap — the "how redundant are my crawls"
# report a mixing plan is drawn from

MAX_OVERLAP_SOURCES = 63  # one int64 bitmask bit per source


def source_overlap(sf_dir: str):
    """For every ordered source pair (s1 < s2, string order): how many
    distinct words they share, plus each side's distinct-word count —
    the cross-source redundancy report mixing and dedup budgets are
    drawn from.

    Scale plan: the vocabulary never reaches the driver.  Every word
    reduces to ONE int64 source-BITMASK (sources are bounded —
    asserted <= 63): per-batch OR partials (dictionary codes +
    bitwise_or.at over unique batch words), coarse word-partitioned OR
    folds (lexsort + or-reduceat per part) — and each part converts
    its local mask histogram into PAIR-COUNT partials right there, so
    only <= S*(S+1)/2 (i, j, n) rows per part reach the driver.  The
    driver fold is O(parts * S^2), independent of vocabulary size AND
    of how many distinct masks exist (a 2^S mask histogram would
    itself approach vocabulary cardinality once S is large).  Rows
    that shuffle: one (word, mask, part) row per distinct
    (batch, word)."""
    import collections

    import ray.data as rd

    # dedicated pruned read for the source-enumeration pre-pass: the
    # main read also needs text, and scanning the heavy text column
    # twice just to list distinct sources would double the operator's
    # I/O
    src_rows = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source"]
    ).map_batches(
        lambda b: pa.table({"source": pc.unique(b["source"])}),
        batch_format="pyarrow", zero_copy_batch=True,
    ).take_all()

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "source"]
    )
    sources = sorted({r["source"] for r in src_rows})
    if len(sources) > MAX_OVERLAP_SOURCES:
        raise ValueError(
            f"source_overlap bitmasks hold <= {MAX_OVERLAP_SOURCES} "
            f"sources; got {len(sources)} — shard the report by source "
            "group"
        )
    smap = {s: i for i, s in enumerate(sources)}

    def partial(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        empty = pa.table(
            {"w": pa.array([], type=pa.string()), "mask": z, "part": z}
        )
        if b.num_rows == 0:
            return empty
        words, dow, _ = _flat_words(b)
        ne = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
        if not ne.any():
            return empty
        src = b["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        d = pc.dictionary_encode(src)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dictbits = np.asarray(
            [smap[s] for s in d.dictionary.to_pylist()], dtype=np.int64
        )
        bits = dictbits[codes][dow[ne]]
        # Arrow dictionary_encode = the per-batch distinct-word pass in
        # C (string-exact), replacing the object-array np.unique that
        # dominated this partial's profile
        wd = pc.dictionary_encode(
            words.filter(pa.array(ne))
            if isinstance(words, pa.Array)
            else pa.chunked_array([words]).combine_chunks().filter(
                pa.array(ne))
        )
        inv = wd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq_arr = wd.dictionary
        acc = np.zeros(len(uniq_arr), dtype=np.int64)
        np.bitwise_or.at(acc, inv, np.int64(1) << bits)
        part = (
            _word_hashes(uniq_arr) % np.uint64(N_CORPUS_PARTS)
        ).astype(np.int64)
        return pa.table(
            {"w": uniq_arr, "mask": pa.array(acc), "part": pa.array(part)}
        )

    n_sources = len(sources)

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"i": z, "j": z, "n": z})
        m = g["mask"].to_numpy(zero_copy_only=False).astype(np.int64)
        # dictionary-encode (Arrow C) groups duplicate words exactly,
        # replacing the object-array stable sort + run boundaries
        denc = pc.dictionary_encode(g["w"].combine_chunks())
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniques = denc.dictionary
        om = np.zeros(len(uniques), dtype=np.int64)
        np.bitwise_or.at(om, codes, m)
        # collapse to the part-local mask histogram FIRST (bounded by
        # this part's distinct words), then reduce it to <= S*(S+1)/2
        # pair-count rows — the only thing that leaves the part
        masks, cnts = np.unique(om, return_counts=True)
        ii, jj, nn = [], [], []
        for i in range(n_sources):
            has_i = ((masks >> i) & 1) == 1
            if not has_i.any():
                continue
            ii.append(i)
            jj.append(i)
            nn.append(int(cnts[has_i].sum()))  # diagonal = n_src partial
            for j in range(i + 1, n_sources):
                both = has_i & (((masks >> j) & 1) == 1)
                if both.any():
                    ii.append(i)
                    jj.append(j)
                    nn.append(int(cnts[both].sum()))
        return pa.table(
            {
                "i": pa.array(ii, type=pa.int64()),
                "j": pa.array(jj, type=pa.int64()),
                "n": pa.array(nn, type=pa.int64()),
            }
        )

    pair_rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
    ).take_all()

    agg: collections.Counter = collections.Counter()
    for r in pair_rows:
        agg[(int(r["i"]), int(r["j"]))] += int(r["n"])
    n_src = np.zeros(n_sources, dtype=np.int64)
    for (i, j), n in agg.items():
        if i == j:
            n_src[i] = n
    out: dict[str, list] = {"s1": [], "s2": [], "shared": [],
                            "n1": [], "n2": []}
    for i in range(n_sources):
        if n_src[i] == 0:  # wordless sources don't appear (oracle parity)
            continue
        for j in range(i + 1, n_sources):
            if n_src[j] == 0:
                continue
            out["s1"].append(sources[i])
            out["s2"].append(sources[j])
            out["shared"].append(int(agg.get((i, j), 0)))
            out["n1"].append(int(n_src[i]))
            out["n2"].append(int(n_src[j]))
    return pa.table(
        {
            "s1": pa.array(out["s1"], type=pa.string()),
            "s2": pa.array(out["s2"], type=pa.string()),
            "shared": pa.array(out["shared"], type=pa.int64()),
            "n1": pa.array(out["n1"], type=pa.int64()),
            "n2": pa.array(out["n2"], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# top-V vocabulary OOV rate: the "how much of each source falls outside
# the tokenizer vocabulary" report a training pipeline runs before
# committing to a vocab size.

OOV_VOCAB = 16  # top-V words by corpus count (ties: word ASC)


def _local_top_words(b: pa.Table, k: int) -> pa.Table:
    """Per-part local top-k of a (w, n) block by (count DESC, word ASC)
    — the shared bounded-merge kernel (vocab_oov_rate /
    cms_word_frequency).  Numeric pre-cut before touching strings: keep
    everything at or above the k-th largest count (ties included) so
    the object lexsort runs over O(k + boundary ties), never the whole
    part vocabulary (item-43 lesson: object-array sorts in per-block
    paths are the slow path)."""
    if b.num_rows == 0:
        return pa.table({"w": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    n = b["n"].to_numpy().astype(np.int64)
    if len(n) > k:
        thr = np.partition(n, len(n) - k)[len(n) - k]
        keep = np.flatnonzero(n >= thr)
    else:
        keep = np.arange(len(n))
    w = np.asarray(pc.take(b["w"], pa.array(keep)).to_pylist(), dtype=object)
    nk = n[keep]
    o = np.lexsort((w, -nk))[:k]
    return pa.table({"w": pa.array(w[o], type=pa.string()),
                     "n": pa.array(nk[o])})


def vocab_oov_rate(sf_dir: str):
    """Per source: total nonempty tokens and how many are OUTSIDE the
    top-``OOV_VOCAB`` corpus vocabulary (count DESC, word ASC ties —
    the deterministic head a tokenizer build would freeze).

    Plan: the shared coarse-partition vocabulary fold
    (``_vocab_dataset``), then per-part local top-V + a <= V * parts
    driver merge (the hot_keys bounded-merge pattern — the full
    vocabulary never reaches the driver); winners broadcast as an
    Arrow value_set and every batch probes with one C-speed
    ``pc.is_in`` pass.  Only per-(batch, source) count partials
    shuffle into the bounded final groupby."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    cand = (
        _vocab_dataset(sf_dir, _word_count_partial)
        .map_batches(lambda b: _local_top_words(b, OOV_VOCAB),
                     batch_format="pyarrow")
    ).take_all()
    cw = np.asarray([r["w"] for r in cand], dtype=object)
    cn = np.asarray([r["n"] for r in cand], dtype=np.int64)
    o = np.lexsort((cw, -cn))[:OOV_VOCAB]
    vocab = pa.array(sorted(cw[o]), type=pa.string())

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "source"]
    )

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "source": pa.array([], type=pa.string()),
            "n_tokens": pa.array([], type=pa.int64()),
            "n_oov": pa.array([], type=pa.int64()),
        })
        if b.num_rows == 0:
            return empty
        words, dow, _ = _flat_words(b)
        ne = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
        if not ne.any():
            return empty
        inv = pc.is_in(words, value_set=vocab).to_numpy(zero_copy_only=False)
        src = b["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        d = pc.dictionary_encode(src)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ns = len(d.dictionary)
        scode = codes[dow]
        tot = np.bincount(scode[ne], minlength=ns).astype(np.int64)
        oov = np.bincount(scode[ne & ~inv], minlength=ns).astype(np.int64)
        keep = tot > 0  # all-empty-word sources absent (oracle parity)
        kidx = np.flatnonzero(keep)
        return pa.table({
            "source": pc.take(d.dictionary, pa.array(kidx)),
            "n_tokens": pa.array(tot[kidx]),
            "n_oov": pa.array(oov[kidx]),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("n_tokens", alias_name="n_tokens"),
                   Sum("n_oov", alias_name="n_oov"))
        .sort("source")
    )


# ---------------------------------------------------------------------------
# per-source MinHash sketch: the mergeable-signature complement to
# source_overlap's exact shared-word counts — the layout that still works
# when per-source vocabularies are too large to intersect exactly.


def source_minhash_jaccard(sf_dir: str):
    """For every ordered source pair (s1 < s2): how many of the
    ``dedup.N_HASH`` minhash seeds agree over the source's word-BIGRAM
    set — the standard unbiased Jaccard estimate (n_match / N_HASH)
    kept as an exact integer.  The element universe is within-document
    adjacent nonempty word pairs: unigram sets are near-identical
    across sources on real corpora (measured identical on the
    fixtures — every unigram sketch matched 64/64), while bigram sets
    spread the estimate across the whole range.

    Reuses the dedup family's (a*x + b) mod (2^61-1) permutation
    contract over big-endian md5 shingle ids, so the SQL mirror is
    the proven MINHASH CTE chain keyed by source (2-shingles instead
    of 3).  Per batch: distinct (source, bigram-id) pairs -> one
    lexsort + minimum.reduceat per seed -> <= n_sources * N_HASH
    partial rows; the fold is a Ray-native groupby-min over that
    BOUNDED key set.  Bigram rows never shuffle and the driver only
    sees S * N_HASH signature cells."""
    import ray.data as rd
    from ray.data.aggregate import Min

    from prlib_ray.stages.dedup import (
        _AU, _BU, _mod_p61, _mulmod_p61, _P61, MERSENNE, N_HASH,
    )

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "source"]
    )

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "source": pa.array([], type=pa.string()),
            "h": pa.array([], type=pa.int64()),
            "mh": pa.array([], type=pa.int64()),
        })
        if b.num_rows == 0:
            return empty
        words, dow, _ = _flat_words(b)
        ne = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
        if not ne.any():
            return empty
        src = b["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        d = pc.dictionary_encode(src)
        scode_row = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # within-document adjacent nonempty word pairs, in flat order
        # (dropping empties preserves per-doc order — the SQL mirror's
        # row_number-over-nonempty join)
        w_ne = (words if isinstance(words, pa.Array)
                else pa.chunked_array([words]).combine_chunks()
                ).filter(pa.array(ne))
        d_ne = dow[ne]
        if len(w_ne) < 2:
            return empty
        valid = d_ne[:-1] == d_ne[1:]
        if not valid.any():
            return empty
        grams = pc.binary_join_element_wise(
            w_ne.slice(0, len(w_ne) - 1), w_ne.slice(1), " "
        ).filter(pa.array(valid))
        # md5 once per UNIQUE bigram (the _word_hashes discipline)
        wid = _word_hashes(grams)
        scode = scode_row[d_ne[:-1][valid]]
        # distinct (source, bigram-id) pairs (the signature is over
        # SETS); ids are full 64-bit so dedupe via lexsort
        o = np.lexsort((wid, scode))
        s_s, w_s = scode[o], wid[o]
        first = np.r_[True, (s_s[1:] != s_s[:-1]) | (w_s[1:] != w_s[:-1])]
        s_u, w_u = s_s[first], w_s[first]
        x = _mod_p61(_mod_p61(w_u))  # fold 2^64-range ids below p
        starts = np.flatnonzero(np.r_[True, s_u[1:] != s_u[:-1]])
        vals = _mulmod_p61(_AU[:, None], x[None, :]) + _BU[:, None]
        vals = np.where(vals >= _P61, vals - _P61, vals)
        mins = np.stack(
            [np.minimum.reduceat(vals[h_], starts) for h_ in range(N_HASH)]
        )  # (N_HASH, n_sources_in_batch)
        sidx = s_u[starts]
        nsb = len(starts)
        return pa.table({
            "source": pc.take(
                d.dictionary, pa.array(np.repeat(sidx, N_HASH))),
            "h": pa.array(np.tile(np.arange(N_HASH, dtype=np.int64), nsb)),
            "mh": pa.array(
                mins.T.reshape(-1).astype(np.int64)),
        })

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "h"])
        .aggregate(Min("mh", alias_name="mh"))
    ).take_all()
    sig: dict[str, np.ndarray] = {}
    for r in rows:
        sig.setdefault(r["source"], np.full(N_HASH, MERSENNE, dtype=np.int64))[
            int(r["h"])] = int(r["mh"])
    srcs = sorted(sig)
    out_s1, out_s2, out_m = [], [], []
    for i, s1 in enumerate(srcs):
        for s2 in srcs[i + 1:]:
            out_s1.append(s1)
            out_s2.append(s2)
            out_m.append(int((sig[s1] == sig[s2]).sum()))
    return pa.table({
        "s1": pa.array(out_s1, type=pa.string()),
        "s2": pa.array(out_s2, type=pa.string()),
        "n_match": pa.array(out_m, type=pa.int64()),
    })


# --- Corpus validation audit ---------------------------------------------------

# Like dedup's normalization mutants, the fixtures are CLEAN (zero
# nulls, empties, length mismatches, duplicate ids at every sf), which
# would make a validation audit a vacuous row of zeros.  The query
# plants one deterministic corruption of each kind per low doc_id and
# the oracle mirrors the plant with UNION ALLs, so every check counts
# a known non-zero and the code paths are provably exercised.
N_PLANT_VAL = 10
VAL_NULL_OFFSET = 1_000_000
VAL_EMPTY_OFFSET = 2_000_000
VAL_MISMATCH_OFFSET = 3_000_000


def _plant_val_batch(b: pa.Table) -> pa.Table:
    """Append this batch's planted corruptions: a NULL text, an empty
    text (n_chars consistently 0), an off-by-one n_chars, and a
    duplicated doc_id (same row re-emitted)."""
    ids = b["doc_id"].to_numpy().astype(np.int64)
    m = ids < N_PLANT_VAL
    base = pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": b["text"],
        "n_chars": b["n_chars"].cast(pa.int64()),
    })
    if not m.any():
        return base
    d = base.filter(pa.array(m))
    k = d.num_rows
    did = d["doc_id"].to_numpy()
    parts = [
        base,
        pa.table({
            "doc_id": pa.array(did + VAL_NULL_OFFSET),
            "text": pa.array([None] * k, type=pa.string()),
            "n_chars": d["n_chars"],
        }),
        pa.table({
            "doc_id": pa.array(did + VAL_EMPTY_OFFSET),
            "text": pa.array([""] * k, type=pa.string()),
            "n_chars": pa.array(np.zeros(k, dtype=np.int64)),
        }),
        pa.table({
            "doc_id": pa.array(did + VAL_MISMATCH_OFFSET),
            "text": d["text"],
            "n_chars": pa.array(d["n_chars"].to_numpy() + 1),
        }),
        d,  # duplicate id: the same row again
    ]
    return pa.concat_tables([p.cast(base.schema) for p in parts])


def corpus_validate(sf_dir: str):
    """One-row data-quality audit of the documents table: row count,
    NULL texts, empty texts, stored-length mismatches (n_chars !=
    length(text); NULL text rows are excluded, matching SQL NULL
    comparison semantics), and duplicate doc_ids — the pre-flight gate
    a pipeline runs before investing compute in a crawl snapshot.

    Two pruned passes, both bounded: (1) per-batch int64 counter
    partials -> one global sum (a handful of numbers per batch); (2)
    duplicate ids via per-batch (part, doc_id, n) pre-combine ->
    coarse id-hash partitions -> per-part exact (rows - distinct) —
    an id never spans parts, so the global duplicate count is the sum
    of per-part counts and NO global distinct shuffle happens."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "n_chars"])

    def counters(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if b.num_rows == 0:
            return pa.table({"n_rows": z, "n_null_text": z,
                             "n_empty_text": z, "n_len_mismatch": z})
        t = _plant_val_batch(b)
        txt = t["text"]
        null_m = pc.is_null(txt)
        empty_m = pc.equal(txt, "")  # NULL stays NULL -> not counted
        mism_m = pc.not_equal(t["n_chars"],
                              pc.utf8_length(txt).cast(pa.int64()))
        return pa.table({
            "n_rows": pa.array([t.num_rows], type=pa.int64()),
            "n_null_text": pa.array(
                [pc.sum(null_m.cast(pa.int64())).as_py() or 0],
                type=pa.int64()),
            "n_empty_text": pa.array(
                [pc.sum(empty_m.cast(pa.int64())).as_py() or 0],
                type=pa.int64()),
            "n_len_mismatch": pa.array(
                [pc.sum(mism_m.cast(pa.int64())).as_py() or 0],
                type=pa.int64()),
        })

    agg = ds.map_batches(
        counters, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(
        Sum("n_rows", alias_name="n_rows"),
        Sum("n_null_text", alias_name="n_null_text"),
        Sum("n_empty_text", alias_name="n_empty_text"),
        Sum("n_len_mismatch", alias_name="n_len_mismatch"),
    )

    def id_counts(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if b.num_rows == 0:
            return pa.table({"part": z, "doc_id": z, "n": z})
        t = _plant_val_batch(b)
        ids = np.sort(t["doc_id"].to_numpy().astype(np.int64))
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        uid = ids[starts]
        n = np.diff(np.r_[starts, len(ids)]).astype(np.int64)
        return pa.table({
            "part": pa.array(uid % N_CORPUS_PARTS),
            "doc_id": pa.array(uid),
            "n": pa.array(n),
        })

    def part_dups(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"n_dup": pa.array([0], type=pa.int64())})
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "n_dup": pa.array([int(n.sum()) - len(np.unique(ids))],
                              type=pa.int64()),
        })

    dup_rows = (
        ds.map_batches(id_counts, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("part")
        .map_groups(part_dups, batch_format="pyarrow")
        .aggregate(Sum("n_dup", alias_name="n_dup"))
    )
    return pa.table({
        "n_rows": pa.array([int(agg["n_rows"])], type=pa.int64()),
        "n_null_text": pa.array([int(agg["n_null_text"])], type=pa.int64()),
        "n_empty_text": pa.array([int(agg["n_empty_text"])], type=pa.int64()),
        "n_len_mismatch": pa.array([int(agg["n_len_mismatch"])],
                                   type=pa.int64()),
        "n_dup_ids": pa.array([int(dup_rows["n_dup"])], type=pa.int64()),
    })


# --- Count-Min sketch word frequency --------------------------------------------

# Bounded-memory frequency estimation: the mergeable-sketch complement
# of the exact heavy-hitter rescan (Misra-Gries).  D rows x W counters
# = a fixed 32 KiB sketch regardless of vocabulary size; estimates are
# conservative (n_est >= n_exact always), so the over-count tail is
# observable per word exactly like bloom_semi_join's FP tail.
CMS_D = 4
CMS_W = 1024
CMS_TOP = 20


def _cms_positions(words: np.ndarray) -> np.ndarray:
    """(len(words), CMS_D) counter positions per word via the shared md5
    double-hash ladder (blocks.md5_ladder_positions — the 'cm1:'/'cm2:'
    + word contract, mirrored in SQL through oracles_data._byteswap8 of
    md5_number_upper)."""
    from prlib_ray.blocks import md5_ladder_positions

    payloads = [w.encode() for w in words]
    return md5_ladder_positions(payloads, CMS_W, CMS_D, b"cm1:", b"cm2:")


def cms_word_frequency(sf_dir: str):
    """Count-Min estimates vs exact counts for the CMS_TOP most frequent
    words: (w, n_exact, n_est) with n_est >= n_exact guaranteed — the
    report that tells you whether a fixed-width sketch is accurate
    enough to replace the exact vocabulary fold at the next scale jump.

    ONE corpus scan: the shared coarse vocabulary fold materializes the
    folded (word, count) rows once (distinct words — far smaller than
    the corpus), and BOTH consumers read it: the sketch build (each
    distinct word hashed exactly once -> ONE bincount into the D*W-cell
    vector, nonzero cells -> coarse cell partitions -> the <= D*W-row
    sketch collects driver-side, 32 KiB invariant in the corpus) and
    the candidate head (per-part local top-K + a <= K*parts driver
    merge — the vocab_oov_rate pattern; the full vocabulary never
    reaches the driver)."""
    vocab = _vocab_dataset(sf_dir, _word_count_partial).materialize()

    # -- sketch (over the folded vocabulary, not the raw corpus) -----------
    def sketch_partial(t: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if t.num_rows == 0:
            return pa.table({"cell": z, "n": z, "part": z})
        ws = np.asarray(t["w"].to_pylist(), dtype=object)
        c = t["n"].to_numpy().astype(np.int64)
        pos = _cms_positions(ws)
        cells = (np.arange(CMS_D, dtype=np.int64)[None, :] * CMS_W
                 + pos).ravel()
        wts = np.repeat(c, CMS_D)
        vec = int_bincount(cells, wts, minlength=CMS_D * CMS_W)
        nz = np.flatnonzero(vec)
        return pa.table({"cell": pa.array(nz), "n": pa.array(vec[nz]),
                         "part": pa.array(nz % 8)})

    def cell_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"cell": z, "n": z})
        cells = g["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(cells, kind="stable")
        cells, n = cells[o], n[o]
        starts = np.flatnonzero(np.r_[True, cells[1:] != cells[:-1]])
        return pa.table({
            "cell": pa.array(cells[starts]),
            "n": pa.array(np.add.reduceat(n, starts).astype(np.int64)),
        })

    rows = (
        vocab.map_batches(sketch_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("part")
        .map_groups(cell_fold, batch_format="pyarrow")
        .take_all()  # bounded: <= CMS_D * CMS_W cells
    )
    sketch = np.zeros(CMS_D * CMS_W, dtype=np.int64)
    for r in rows:
        sketch[int(r["cell"])] = int(r["n"])

    # -- exact top-K candidates (bounded local tops over the same fold) ----
    cand = (
        vocab.map_batches(lambda b: _local_top_words(b, CMS_TOP),
                          batch_format="pyarrow")
        .take_all()  # bounded: <= CMS_TOP * N_CORPUS_PARTS rows
    )
    cw = np.asarray([r["w"] for r in cand], dtype=object)
    cn = np.asarray([r["n"] for r in cand], dtype=np.int64)
    o = np.lexsort((cw, -cn))[:CMS_TOP]
    cw, cn = cw[o], cn[o]

    pos = _cms_positions(cw)
    est = sketch[(np.arange(CMS_D, dtype=np.int64)[None, :] * CMS_W
                  + pos)].min(axis=1)
    o2 = np.argsort(cw, kind="stable")
    return pa.table({
        "w": pa.array(cw[o2], type=pa.string()),
        "n_exact": pa.array(cn[o2]),
        "n_est": pa.array(est[o2].astype(np.int64)),
    })


# --- Global rank transform (no global sort) -------------------------------------


def length_rank_transform(sf_dir: str):
    """Every document's exact global length rank: n_smaller = how many
    docs in the corpus are strictly shorter (SQL rank() - 1 under ties)
    — the rank/percentile transform a curation pipeline uses to filter
    by corpus-relative length instead of absolute thresholds.

    The classic global-sort query done WITHOUT a global sort: lengths
    fold to a (value, count) histogram (distinct lengths ≪ corpus —
    bounded by the max document size, not the row count), the sorted
    values + exclusive prefix sums broadcast once via ray.put, and
    every batch probes with one searchsorted.  No doc row ever
    shuffles; the only exchange is the bounded histogram fold."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])

    def hist_partial(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if b.num_rows == 0:
            return pa.table({"v": z, "c": z})
        v = b["n_chars"].to_numpy().astype(np.int64)
        vs = np.sort(v)
        starts = np.flatnonzero(np.r_[True, vs[1:] != vs[:-1]])
        return pa.table({
            "v": pa.array(vs[starts]),
            "c": pa.array(np.diff(np.r_[starts, len(vs)]).astype(np.int64)),
        })

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("v")
        .aggregate(Sum("c", alias_name="c"))
        .take_all()  # bounded: one row per distinct length
    )
    vals = np.asarray(sorted(int(r["v"]) for r in hist), dtype=np.int64)
    cnt = {int(r["v"]): int(r["c"]) for r in hist}
    counts = np.asarray([cnt[int(v)] for v in vals], dtype=np.int64)
    below = np.concatenate(([0], np.cumsum(counts)[:-1]))  # exclusive
    ref = ray.put((vals, below))

    def probe(b: pa.Table) -> pa.Table:
        vals_, below_ = ray.get(ref)
        v = b["n_chars"].to_numpy().astype(np.int64)
        idx = np.searchsorted(vals_, v)
        return pa.table({
            "doc_id": b["doc_id"].cast(pa.int64()),
            "n_chars": pa.array(v),
            "n_smaller": pa.array(below_[idx]),
        })

    return ds.map_batches(probe, batch_format="pyarrow",
                          zero_copy_batch=True)


# ---------------------------------------------------------------------------
# word-association mining: PMI over document co-occurrence

PMI_VOCAB = 24       # pair universe: top-V words (count DESC, word ASC)
PMI_MIN_COOC = 2     # pairs must co-occur in >= this many documents
PMI_K = 20           # report top-K pairs (score DESC, wa ASC, wb ASC)
PMI_SCALE = 1_000_000


def pmi_top_pairs(sf_dir: str):
    """Word-association mining: for each unordered pair of top-PMI_VOCAB
    words, the pointwise-mutual-information ratio over DOCUMENT
    co-occurrence — n_ab * N / (n_a * n_b), kept as the exact integer
    floor(n_ab * N * PMI_SCALE / (n_a * n_b)); log is monotone, so
    ranking by the ratio IS ranking by PMI.  N = total documents,
    n_a = documents containing a.  Top-PMI_K pairs with
    n_ab >= PMI_MIN_COOC, ties (wa ASC, wb ASC).

    Plan: the shared vocab fold (_vocab_dataset + _local_top_words)
    picks the universe and the winners broadcast sorted; per batch ONE
    is_in + searchsorted maps words to vocabulary ranks, a per-doc
    0/1 presence matrix forms, and B.T @ B — a single int64 matmul —
    yields ALL pairwise doc co-occurrence counts with the per-word doc
    frequencies on its diagonal.  <= V(V+1)/2 + 1 partial rows per
    batch (a sentinel row carries the batch's doc count) reach a
    bounded Ray-native groupby; the <= V^2 final rows score on the
    driver in exact Python ints (the cross products overflow int64 at
    corpus scale; the table is tiny).  PMI_VOCAB is the corpus-scale
    knob: the pair table is V^2 regardless of corpus size."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from prlib_ray.stages.text_analysis import _flat_words

    cand = (
        _vocab_dataset(sf_dir, _word_count_partial)
        .map_batches(lambda b: _local_top_words(b, PMI_VOCAB),
                     batch_format="pyarrow")
    ).take_all()
    cw = np.asarray([r["w"] for r in cand], dtype=object)
    cn = np.asarray([r["n"] for r in cand], dtype=np.int64)
    o = np.lexsort((cw, -cn))[:PMI_VOCAB]
    vocab_sorted = np.sort(cw[o])
    vocab_set = pa.array(vocab_sorted.tolist(), type=pa.string())
    nv = len(vocab_sorted)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"i": pa.array([], type=pa.int64()),
                          "j": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        words, dow, ndocs = _flat_words(b)
        inv = pc.is_in(words, value_set=vocab_set).to_numpy(
            zero_copy_only=False)
        rows = [pa.table({"i": pa.array([-1], type=pa.int64()),
                          "j": pa.array([-1], type=pa.int64()),
                          "n": pa.array([ndocs], type=pa.int64())})]
        if inv.any():
            wsel = np.asarray(
                pc.take(words, pa.array(np.flatnonzero(inv))).to_pylist(),
                dtype=object,
            )
            rank = np.searchsorted(vocab_sorted, wsel)
            B = np.zeros((ndocs, nv), dtype=np.int64)
            B[dow[inv], rank] = 1
            C = B.T @ B  # co-occurrence counts; diagonal = doc freq
            iu, ju = np.triu_indices(nv)
            nz = C[iu, ju] > 0
            rows.append(pa.table({
                "i": pa.array(iu[nz].astype(np.int64)),
                "j": pa.array(ju[nz].astype(np.int64)),
                "n": pa.array(C[iu, ju][nz]),
            }))
        return pa.concat_tables(rows)

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["i", "j"])
        .aggregate(Sum("n", alias_name="n"))
    ).take_all()
    n_total = 0
    df = np.zeros(nv, dtype=object)
    pair_n: dict[tuple[int, int], int] = {}
    for r in folded:
        i, j, n = int(r["i"]), int(r["j"]), int(r["n"])
        if i == -1:
            n_total += n
        elif i == j:
            df[i] = n
        else:
            pair_n[(i, j)] = n
    out = []
    for (i, j), n_ab in pair_n.items():
        if n_ab < PMI_MIN_COOC:
            continue
        score = (n_ab * n_total * PMI_SCALE) // (int(df[i]) * int(df[j]))
        out.append((str(vocab_sorted[i]), str(vocab_sorted[j]),
                    n_ab, score))
    out.sort(key=lambda t: (-t[3], t[0], t[1]))
    out = out[:PMI_K]
    return pa.table({
        "wa": pa.array([t[0] for t in out], type=pa.string()),
        "wb": pa.array([t[1] for t in out], type=pa.string()),
        "n_ab": pa.array([t[2] for t in out], type=pa.int64()),
        "score": pa.array([t[3] for t in out], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# tokenizer budget curve: OOV mass at several candidate vocab sizes

# Fixture-scaled candidate sizes (the corpus has ~31 distinct words, so
# 4/8/16 produce real splits and 32 the saturated row); at corpus scale
# pass powers up to ~2^17.  Must be ascending; the largest bounds the
# per-part head the driver merges.
TOK_CURVE_SIZES = (4, 8, 16, 32)


def tokenizer_budget_curve(sf_dir: str, *, sizes: tuple = TOK_CURVE_SIZES):
    """For each candidate vocabulary size V (the vocab_oov_rate head
    contract: top-V words by count DESC, word ASC): how many corpus
    tokens and how many distinct word types fall OUTSIDE the top-V —
    the budget curve a tokenizer build reads before freezing its size,
    in ONE corpus pass instead of len(sizes) vocab_oov_rate runs.

    Plan: the shared coarse vocabulary fold materializes once and
    serves all three consumers (total tokens, distinct types, top-head)
    — a word lives in exactly one crc32 part, so per-part local
    top-max(V) heads merge into the EXACT global head; only the
    <= max(V) * parts candidate rows and two scalar aggregates reach
    the driver, never the vocabulary."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    vmax = max(sizes)
    fold = _vocab_dataset(sf_dir, _word_count_partial).materialize()
    tot_row = fold.aggregate(Sum("n", alias_name="tok"),
                             Count(alias_name="types"))
    total_tokens = int(tot_row["tok"] or 0)
    n_types = int(tot_row["types"] or 0)
    cand = (
        fold.map_batches(lambda b: _local_top_words(b, vmax),
                         batch_format="pyarrow")
    ).take_all()
    cw = np.asarray([r["w"] for r in cand], dtype=object)
    cn = np.asarray([r["n"] for r in cand], dtype=np.int64)
    o = np.lexsort((cw, -cn))[:vmax]
    head_counts = cn[o]
    csum = np.cumsum(head_counts)
    out_v, out_tok, out_typ = [], [], []
    for v in sizes:
        inside = int(csum[min(v, len(csum)) - 1]) if len(csum) else 0
        out_v.append(int(v))
        out_tok.append(total_tokens - inside)
        out_typ.append(n_types - min(int(v), n_types))
    return pa.table({
        "vocab_size": pa.array(out_v, type=pa.int64()),
        "n_oov_tokens": pa.array(out_tok, type=pa.int64()),
        "n_oov_types": pa.array(out_typ, type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# characteristic vocabulary per source: word lift ranking

LIFT_K = 5            # words reported per source
LIFT_SCALE = 10_000   # lift 1.0 == 10000 (integer-exact floor)


def _source_word_partial(b: pa.Table) -> pa.Table:
    """Per-batch (w, source, c) occurrence partial — one
    dictionary_encode per column + a composite bincount, empty words
    dropped (the _word_count_partial discipline with a source axis)."""
    empty = pa.table({"w": pa.array([], type=pa.string()),
                      "s": pa.array([], type=pa.string()),
                      "c": pa.array([], type=pa.int64())})
    if b.num_rows == 0:
        return empty
    from prlib_ray.stages.text_analysis import _flat_words

    words, dow, _ = _flat_words(b)
    ne = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
    if not ne.any():
        return empty
    wd = pc.dictionary_encode(words)
    wcodes = wd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    terms = np.asarray(wd.dictionary.to_pylist(), dtype=object)
    src = b["source"]
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    sd = pc.dictionary_encode(src)
    scodes = sd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    srcs = np.asarray(sd.dictionary.to_pylist(), dtype=object)
    ns = len(srcs)
    key = wcodes[ne] * ns + scodes[dow][ne]
    cnt = np.bincount(key, minlength=len(terms) * ns).astype(np.int64)
    keep = np.flatnonzero(cnt > 0)
    return pa.table({
        "w": pa.array(terms[keep // ns], type=pa.string()),
        "s": pa.array(srcs[keep % ns], type=pa.string()),
        "c": pa.array(cnt[keep]),
    })


def source_word_lift(sf_dir: str, *, k: int = LIFT_K):
    """Characteristic vocabulary per source: the k words with the
    highest LIFT n_sw·N / (n_s·n_w) — "this word is X times more
    frequent here than corpus-wide", the per-source drilldown of
    pmi_top_pairs' association score — as the exact integer
    floor(n_sw·N·LIFT_SCALE / (n_s·n_w)); ties (word ASC).  Measured
    spread on the fixtures 0.67x-1.95x, a real per-source ranking.

    Plan: one (w, source, c) partial pass materializes and serves BOTH
    the bounded totals (per-source n_s + corpus N, Ray-native groupby
    over <= S keys, broadcast by closure) and the coarse word-partition
    fold; a word lives in exactly one part, so each part computes n_w
    EXACTLY, scores its rows, and emits its per-source local top-k —
    <= S·k·parts candidate rows merge on the driver.  Scores go
    through exact Python ints whenever n_sw·N·SCALE could overflow
    int64 (the LABEL_CENTROID_AFFINITY discipline)."""
    return _word_lift_rank(_vocab_src_parts(sf_dir), k=k,
                           out_col="source")


def _word_lift_rank(partials, *, k: int, out_col: str) -> pa.Table:
    """The lift-scoring + per-group top-k fold over a (w, s, c, part)
    partials Dataset — ONE definition shared by source_word_lift and
    cluster_top_terms so the score/tie/fold contract cannot drift.
    ``out_col`` names the group column in the output table."""
    import pandas as pd
    from ray.data.aggregate import Sum

    partials = partials.materialize()
    tot = partials.groupby("s").aggregate(Sum("c", alias_name="n")).take_all()
    ns_of = {r["s"]: int(r["n"]) for r in tot}
    n_total = sum(ns_of.values())
    empty = pa.table({out_col: pa.array([], type=pa.string()),
                      "w": pa.array([], type=pa.string()),
                      "n_sw": pa.array([], type=pa.int64()),
                      "score": pa.array([], type=pa.int64())})
    if n_total == 0:
        return empty

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"s": pa.array([], type=pa.string()),
                             "w": pa.array([], type=pa.string()),
                             "n_sw": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.int64())})
        w = np.asarray(g["w"].to_pylist(), dtype=object)
        s = np.asarray(g["s"].to_pylist(), dtype=object)
        c = g["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((s, w))
        w_s, s_s, c_s = w[order], s[order], c[order]
        # combine per (w, group) across batches
        new = np.r_[True, (w_s[1:] != w_s[:-1]) | (s_s[1:] != s_s[:-1])]
        starts = np.flatnonzero(new)
        gid = np.cumsum(new) - 1
        n_sw = int_bincount(gid, c_s)
        wu, su = w_s[starts], s_s[starts]
        # n_w per word: word runs over the same (w-major) order
        wnew = np.r_[True, wu[1:] != wu[:-1]]
        wid = np.cumsum(wnew) - 1
        n_w = int_bincount(wid, n_sw)[wid]
        ns_arr = np.asarray([ns_of[x] for x in su], dtype=np.int64)
        num_ok = n_total * LIFT_SCALE <= (2**62) // max(int(n_sw.max()), 1)
        den_ok = (int(ns_arr.max(initial=1))
                  <= (2**62) // max(int(n_w.max(initial=1)), 1))
        if num_ok and den_ok:
            score = (n_sw * (n_total * LIFT_SCALE)) // (ns_arr * n_w)
        else:  # exact big-int fallback (corpus-scale token counts)
            score = np.asarray(
                [int(a) * n_total * LIFT_SCALE // (int(b) * int(d))
                 for a, b, d in zip(n_sw, ns_arr, n_w)],
                dtype=np.int64,
            )
        # per-group local top-k by (score DESC, w ASC)
        o2 = np.lexsort((wu, -score, su))
        s2 = su[o2]
        new2 = np.r_[True, s2[1:] != s2[:-1]]
        starts2 = np.flatnonzero(new2)
        run = np.cumsum(new2) - 1
        pos = np.arange(len(s2)) - starts2[run]
        keep = o2[pos < k]
        return pa.table({"s": pa.array(su[keep], type=pa.string()),
                         "w": pa.array(wu[keep], type=pa.string()),
                         "n_sw": pa.array(n_sw[keep]),
                         "score": pa.array(score[keep])})

    cand = (
        partials.groupby("part")
        .map_groups(fold, batch_format="pyarrow")
    ).take_all()
    if not cand:
        return empty
    src = np.asarray([r["s"] for r in cand], dtype=object)
    wc = np.asarray([r["w"] for r in cand], dtype=object)
    nsw = np.asarray([r["n_sw"] for r in cand], dtype=np.int64)
    sc = np.asarray([r["score"] for r in cand], dtype=np.int64)
    o = np.lexsort((wc, -sc, src))
    s_s = src[o]
    new_s = np.r_[True, s_s[1:] != s_s[:-1]]
    starts_s = np.flatnonzero(new_s)
    run = np.cumsum(new_s) - 1
    pos = np.arange(len(s_s)) - starts_s[run]
    keep = o[pos < k]
    ko = np.lexsort((wc[keep], -sc[keep], src[keep]))
    keep = keep[ko]
    return pa.table({
        out_col: pa.array(src[keep].tolist(), type=pa.string()),
        "w": pa.array(wc[keep].tolist(), type=pa.string()),
        "n_sw": pa.array(nsw[keep]),
        "score": pa.array(sc[keep]),
    })


def _vocab_src_parts(sf_dir: str):
    """(w, s, c, part) partial Dataset for the source-word fold —
    partitioned by the SHARED _word_part_tags scheme."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "source"]
    )

    def add_part(b: pa.Table) -> pa.Table:
        t = _source_word_partial(b)
        return t.append_column("part", _word_part_tags(t["w"].to_pylist()))

    return ds.map_batches(add_part, batch_format="pyarrow",
                          zero_copy_batch=True)


def cluster_top_terms(sf_dir: str, *, k: int = LIFT_K):
    """CROSS-MODAL drilldown: the characteristic words of each
    EMBEDDING cluster's documents — "what is this region of embedding
    space about?", the topic-labeling report a curation pipeline reads
    after clustering.  Clusters come from dedup_semantic's exact
    assignment contract (integer dot argmax over the N_SEM_SEEDS
    lowest-id seed vectors, ties to the smallest centroid id); each
    embedding joins its document by vec_id == doc_id (docs without an
    embedding drop — INNER-join parity); words score with the SAME
    integer lift contract as source_word_lift via the shared
    _word_lift_rank fold.

    Scale plan: documents and embeddings co-partition by id hash (a
    doc/vector id never spans parts); per part one searchsorted
    attaches each doc's cluster, one _flat_words pass folds
    (w, cluster, c) partials tagged by the shared word-partition
    scheme — neither table broadcasts, the assignment never leaves
    the workers, and the lift fold is the proven machinery."""
    import pandas as pd
    import ray
    import ray.data as rd

    from prlib_ray.stages.similarity import (N_SEM_SEEDS, _low_id_seed_matrix,
                                             _quantize)

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    S, _ = _low_id_seed_matrix(emb, N_SEM_SEEDS)
    sref = ray.put(S)
    n_id_parts = N_CORPUS_PARTS

    def emb_norm(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"part": z, "id": z, "cluster": z,
                             "text": pa.array([], type=pa.string())})
        S_ = ray.get(sref)
        ids = b["vec_id"].to_numpy().astype(np.int64)
        Q = np.stack(_quantize(b["embedding"].to_pylist()))
        cid = np.argmax(Q @ S_.T, axis=1).astype(np.int64)
        return pa.table({
            "part": pa.array(ids % n_id_parts),
            "id": pa.array(ids),
            "cluster": pa.array(cid),
            "text": pa.nulls(b.num_rows, pa.string()),
        })

    def doc_norm(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy().astype(np.int64)
        return pa.table({
            "part": pa.array(ids % n_id_parts),
            "id": pa.array(ids),
            "cluster": pa.array(np.full(b.num_rows, -1, dtype=np.int64)),
            "text": b["text"],
        })

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    both = emb.map_batches(
        emb_norm, batch_format="pyarrow", zero_copy_batch=True
    ).union(docs.map_batches(
        doc_norm, batch_format="pyarrow", zero_copy_batch=True
    ))

    def attach_and_count(g: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        empty = pa.table({"w": pa.array([], type=pa.string()),
                          "s": pa.array([], type=pa.string()),
                          "c": z, "part": z})
        if g.num_rows == 0:
            return empty
        cl = g["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_doc = cl == -1
        e_idx = np.flatnonzero(~is_doc)
        d_idx = np.flatnonzero(is_doc)
        if len(e_idx) == 0 or len(d_idx) == 0:
            return empty
        from prlib_ray.relational import _sorted_key_attach

        ids = g["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        did = ids[d_idx]
        es, _, pos, hit = _sorted_key_attach(
            ids[e_idx], did
        )  # docs without an embedding drop
        ecl_s = cl[e_idx][es]
        texts = np.asarray(g["text"].to_pylist(), dtype=object)[d_idx][hit]
        clus = ecl_s[pos[hit]]
        t = pa.table({
            "text": pa.array(texts.tolist(), type=pa.string()),
            "source": pa.array([str(c) for c in clus], type=pa.string()),
        })
        p = _source_word_partial(t)
        return pa.table({
            "w": p["w"],
            "s": p["s"],
            "c": p["c"],
            "part": _word_part_tags(p["w"].to_pylist()),
        })

    partials = both.groupby("part").map_groups(
        attach_and_count, batch_format="pyarrow"
    )
    out = _word_lift_rank(partials, k=k, out_col="cluster_s")
    return pa.table({
        "cluster": pa.array(
            [int(x) for x in out["cluster_s"].to_pylist()],
            type=pa.int64(),
        ),
        "w": out["w"],
        "n_cw": out["n_sw"],
        "score": out["score"],
    })


def corpus_merkle(sf_dir: str):
    """Merkle-style corpus digest: per SOURCE, the leaf hash = md5 of
    the source's doc content hashes concatenated in sorted order; plus
    one root row = md5 of the leaf hashes concatenated in source order
    — the integrity/versioning primitive a corpus registry publishes
    (two corpora are byte-identical per source iff leaves match; the
    root pins the whole corpus in one value).  Output (node, hash):
    'leaf:<source>' rows + the 'root' row, sorted.

    Plan: one pruned scan emits (source, md5(text)) pairs pre-combined
    per batch; sources are a bounded dimension (~20), so the per-source
    sort+digest runs as per-group folds and the root folds the <= 20
    leaf rows on the driver.  At a fan-in where one source's hash list
    outgrows a group, the documented scale path is hierarchical leaves
    (bucket sub-leaves by hash prefix, then per-source md5 of
    sub-leaves) — same tree, one more level."""
    import hashlib as hl

    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])

    def hashes(b: pa.Table) -> pa.Table:
        hs = [hl.md5(t.encode("utf-8")).hexdigest()
              for t in b["text"].to_pylist()]
        return pa.table({
            "source": b["source"],
            "h": pa.array(hs, type=pa.string()),
        })

    def leaf(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({
                "node": pa.array([], type=pa.string()),
                "hash": pa.array([], type=pa.string())})
        hs = np.sort(np.asarray(g["h"].to_pylist(), dtype=object))
        digest = hl.md5("".join(hs).encode()).hexdigest()
        return pa.table({
            "node": pa.array(["leaf:" + str(g["source"][0].as_py())],
                             type=pa.string()),
            "hash": pa.array([digest], type=pa.string()),
        })

    leaves = (
        ds.map_batches(hashes, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("source").map_groups(leaf, batch_format="pyarrow")
        .take_all()
    )  # bounded: one row per source
    leaves.sort(key=lambda r: r["node"])
    root = hl.md5("".join(r["hash"] for r in leaves).encode()).hexdigest()
    nodes = [r["node"] for r in leaves] + ["root"]
    vals = [r["hash"] for r in leaves] + [root]
    return pa.table({
        "node": pa.array(nodes, type=pa.string()),
        "hash": pa.array(vals, type=pa.string()),
    })


# Water-filling budget allocation: the mixture-budgeting step a
# pretraining run performs when a global token budget must spread
# across sources without letting any one source dominate (cap c = the
# max integer water level with sum(min(tokens_s, c)) <= budget).
TOKEN_BUDGET_PERMILLE = 600  # budget = 60% of the corpus's tokens


def token_budget_fill(sf_dir: str):
    """Per source: total regex tokens and the exact water-filling
    allocation under budget = TOKEN_BUDGET_PERMILLE of the corpus
    total.  Closed form on the ascending-sorted per-source totals:
    m* = max { m : P_m + (k-m)·t_m <= B } (P = prefix sum), cap
    c = (B - P_m*) // (k - m*); sources with t <= c keep everything,
    the rest cap at c — maximality of m* guarantees c < t_{m*+1}, so
    min(t, c) IS the exact fill (slack < k tokens from the floor).

    Plan: per-source token totals fold as per-batch partials (sources
    are a bounded dimension); the allocation itself is closed-form on
    <= n_sources rows — one streaming scan, no shuffle."""
    import ray.data as rd

    from prlib_ray.stages.text_analysis import token_count_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])

    def partial(b: pa.Table) -> pa.Table:
        t = token_count_batch(b)
        import pandas as pd

        df = pd.DataFrame({
            "source": b["source"].to_numpy(zero_copy_only=False),
            "n": t["n_tokens"].to_numpy(),
        }).groupby("source", sort=False, as_index=False).agg(
            n=("n", "sum"))
        return pa.Table.from_pandas(df, preserve_index=False)

    acc: dict[str, int] = {}
    for part in ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for s, n in zip(part["source"].to_pylist(),
                        part["n"].to_pylist()):
            acc[s] = acc.get(s, 0) + int(n)

    src = np.array(sorted(acc), dtype=object)
    t = np.asarray([acc[s] for s in src], dtype=np.int64)
    k = len(t)
    B = int(t.sum()) * TOKEN_BUDGET_PERMILLE // 1000
    o = np.lexsort((src, t))  # ascending t, ties by source
    ts = t[o]
    pf = np.cumsum(ts)
    # feasible(m): P_m + (k-m)*t_m <= B, m in 1..k; m*=0 if none
    feas = np.flatnonzero(pf + (k - np.arange(1, k + 1)) * ts <= B)
    if len(feas) == k:
        alloc = t.copy()
    else:
        m = int(feas[-1]) + 1 if len(feas) else 0
        pm = int(pf[m - 1]) if m else 0
        c = (B - pm) // (k - m)
        alloc = np.minimum(t, c)
    return pa.table({
        "source": pa.array(list(src), type=pa.string()),
        "n_tokens": pa.array(t),
        "allocated": pa.array(alloc.astype(np.int64)),
    })
