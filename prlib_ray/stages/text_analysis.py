"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

These extend the reference's detector family (SURVEY §2.6) with the
operators a 100 TB text pipeline needs.  All integer/string outputs so
every op has an exact DuckDB oracle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from prlib_ray.blocks import int_bincount

TOKEN_PATTERN = "[A-Za-z0-9]+"

# Marker stopword sets per language (ASCII only, deterministic argmax with
# lexicographic tie-break).  Tiny by design: the lang-id heuristic is an
# n-gram/stopword vote, not a model.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "en": ("the", "and", "of", "to", "is", "in"),
    "es": ("el", "la", "los", "que", "es", "y"),
    "fr": ("le", "la", "les", "et", "est", "que"),
    "zh": ("de", "shi", "le", "bu", "wo", "zai"),
}

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is")
PUNCT_PATTERN = "[.,;:!?]"


def token_count_batch(batch: pa.Table) -> pa.Table:
    """Token counting: non-overlapping [A-Za-z0-9]+ runs (RE2 both sides)."""
    n = pc.count_substring_regex(batch["text"], pattern=TOKEN_PATTERN)
    return pa.table(
        {"doc_id": batch["doc_id"], "n_tokens": pc.cast(n, pa.int64())}
    )


# BPE-ish subword proxy: letter runs chunk into <=4-char pieces, each
# digit and each non-space symbol is its own token — a deterministic
# regex stand-in for a learned tokenizer's piece count (the quantity a
# training-data pipeline budgets by).  RE2 on both sides (Arrow
# count_substring_regex / DuckDB regexp_extract_all), so the oracle is
# exact.
SUBWORD_PATTERN = r"[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]"


def token_count_subword_batch(batch: pa.Table) -> pa.Table:
    """Subword (BPE-ish) token counting — see SUBWORD_PATTERN."""
    n = pc.count_substring_regex(batch["text"], pattern=SUBWORD_PATTERN)
    return pa.table(
        {"doc_id": batch["doc_id"],
         "n_subword_tokens": pc.cast(n, pa.int64())}
    )


def _flat_words(batch: pa.Table):
    """(words values array, doc index per word, ndocs) via split_pattern."""
    arr = batch["text"]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    lv = pc.split_pattern(arr, pattern=" ")
    if isinstance(lv, pa.ChunkedArray):
        lv = lv.combine_chunks()
    offs = lv.offsets.to_numpy().astype(np.int64)
    doc_of_word = np.repeat(
        np.arange(len(lv), dtype=np.int64), np.diff(offs)
    )
    return lv.values, doc_of_word, len(lv)


def quality_score_batch(batch: pa.Table) -> pa.Table:
    """Quality scoring: stopword/punct/length signals, integer outputs.

    score_pct = (100 * n_stop) // max(n_words, 1) — integer arithmetic so
    the oracle hash is exact.  Word/stopword counting is one
    split_pattern + is_in pass over the flat word array (no per-row
    Python split loop)."""
    words, doc_of_word, ndocs = _flat_words(batch)
    nonempty = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
    is_stop = pc.is_in(
        words, value_set=pa.array(STOPWORDS, type=pa.string())
    ).to_numpy(zero_copy_only=False)
    nw = np.bincount(doc_of_word[nonempty], minlength=ndocs).astype(np.int64)
    ns = np.bincount(doc_of_word[is_stop], minlength=ndocs).astype(np.int64)
    n_punct = pc.cast(
        pc.count_substring_regex(batch["text"], pattern=PUNCT_PATTERN), pa.int64()
    )
    score = (100 * ns) // np.maximum(nw, 1)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(nw),
            "n_stop": pa.array(ns),
            "n_punct": n_punct,
            "score_pct": pa.array(score),
        }
    )


# Gopher-style document-quality rules (Rae et al. 2021, Table A1 subset;
# the published bounds, not corpus-tuned ones).  Every decision is pure
# integer arithmetic — the mean-word-length band [3, 10] is tested as
# 3*n_words <= sum_word_len <= 10*n_words, the >=80%-alphabetic rule as
# 5*n_alpha >= 4*n_words — so the DuckDB oracle hash is exact.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3
GOPHER_MAX_MEAN_LEN = 10
GOPHER_MIN_STOP = 2
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_batch(batch: pa.Table) -> pa.Table:
    """Gopher quality-rule scoring: per doc the rule inputs (word count,
    summed word length, alphabetic-word count, stopword count) and the
    0/1 pass flag of the conjunction — the gate a pre-training corpus
    filter applies before anything expensive runs.

    One split_pattern pass; lengths / alpha / stopword tests are Arrow
    kernels over the flat word array folded per doc with bincount.  Docs
    with zero non-empty words stay in the output (n_words=0, passes=0) —
    a filter must give a verdict on every document."""
    words, doc_of_word, ndocs = _flat_words(batch)
    nonempty = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
    wl = pc.utf8_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    is_stop = pc.is_in(
        words, value_set=pa.array(GOPHER_STOPWORDS, type=pa.string())
    ).to_numpy(zero_copy_only=False)
    has_alpha = pc.match_substring_regex(
        words, pattern="[A-Za-z]"
    ).to_numpy(zero_copy_only=False)
    d = doc_of_word
    nw = np.bincount(d[nonempty], minlength=ndocs).astype(np.int64)
    sl = np.bincount(
        d[nonempty], weights=wl[nonempty], minlength=ndocs
    ).astype(np.int64)
    na = np.bincount(d[has_alpha], minlength=ndocs).astype(np.int64)
    ns = np.bincount(d[is_stop], minlength=ndocs).astype(np.int64)
    passes = (
        (nw >= GOPHER_MIN_WORDS)
        & (nw <= GOPHER_MAX_WORDS)
        & (GOPHER_MIN_MEAN_LEN * nw <= sl)
        & (sl <= GOPHER_MAX_MEAN_LEN * nw)
        & (5 * na >= 4 * nw)
        & (ns >= GOPHER_MIN_STOP)
    ).astype(np.int64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(nw),
            "sum_word_len": pa.array(sl),
            "n_alpha": pa.array(na),
            "n_stop": pa.array(ns),
            "passes": pa.array(passes),
        }
    )


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """Repetition-ratio quality signal: per doc, total words, distinct
    words, the top word's frequency and rep_pct = (100*top)//max(n,1) —
    the boilerplate/spam indicator a training-data filter thresholds on.

    Fully vectorized: one split_pattern + dictionary_encode over the
    flat word array, then (doc, word-code) composite-key np.unique for
    the frequency table — no per-row Python."""
    words, doc_of_word, ndocs = _flat_words(batch)
    nonempty = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
    codes_arr = pc.dictionary_encode(words)
    codes = codes_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = int(codes.max()) + 1 if len(codes) else 1
    d = doc_of_word[nonempty]
    c = codes[nonempty]
    nw = np.bincount(d, minlength=ndocs).astype(np.int64)
    key = d * vocab + c
    uniq, counts = np.unique(key, return_counts=True)
    udoc = uniq // vocab
    n_distinct = np.bincount(udoc, minlength=ndocs).astype(np.int64)
    top = np.zeros(ndocs, dtype=np.int64)
    np.maximum.at(top, udoc, counts.astype(np.int64))
    rep = (100 * top) // np.maximum(nw, 1)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(nw),
            "n_distinct": pa.array(n_distinct),
            "top_count": pa.array(top),
            "rep_pct": pa.array(rep),
        }
    )


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Language ID: marker-stopword vote, argmax with lexicographic
    tie-break (ties -> smallest language code)."""
    words, doc_of_word, ndocs = _flat_words(batch)
    langs = sorted(LANG_MARKERS)
    counts = np.zeros((len(langs), ndocs), dtype=np.int64)
    for li, c in enumerate(langs):
        hit = pc.is_in(
            words, value_set=pa.array(LANG_MARKERS[c], type=pa.string())
        ).to_numpy(zero_copy_only=False)
        counts[li] = np.bincount(doc_of_word[hit], minlength=ndocs)
    # argmax keeps the FIRST maximal row and langs is sorted ascending ->
    # smallest code wins ties (same rule as the scalar max())
    best = np.argmax(counts, axis=0)
    lang_arr = np.array(langs, dtype=object)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang_pred": pa.array(lang_arr[best], type=pa.string()),
        }
    )


def lang_agreement(sf_dir: str):
    """Per source: documents, documents whose DECLARED lang column
    matches the lang-ID heuristic, and the integer agreement percentage
    — the QA report a multilingual pipeline uses to find mislabeled
    sources before lang-filtered training mixes are drawn.

    Per-batch partial (source-bincounted ints) -> one bounded-key
    groupby Sum -> integer pct; the text never shuffles."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )

    def partial(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if b.num_rows == 0:
            return pa.table(
                {"source": pa.array([], type=pa.string()),
                 "n_docs": z, "n_agree": z}
            )
        pred = lang_id_batch(b)["lang_pred"]
        lang = b["lang"]
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        agree = pc.equal(lang, pred).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        src = b["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        d = pc.dictionary_encode(src)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(d.dictionary)
        return pa.table(
            {
                "source": d.dictionary,
                "n_docs": pa.array(
                    np.bincount(codes, minlength=n).astype(np.int64)
                ),
                "n_agree": pa.array(
                    int_bincount(codes, agree, minlength=n)
                ),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_agree", alias_name="n_agree"))
    )

    def pct(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table(
                {"source": pa.array([], type=pa.string()),
                 "n_docs": z, "n_agree": z, "agree_pct": z}
            )
        n = b["n_docs"].to_numpy().astype(np.int64)
        a = b["n_agree"].to_numpy().astype(np.int64)
        return b.append_column(
            "agree_pct", pa.array((100 * a) // np.maximum(n, 1))
        )

    return agg.map_batches(pct, batch_format="pyarrow")


# --- hashed-feature linear quality classifier --------------------------------
#
# The fastText/CCNet filtering shape: a linear model over the hashing
# trick (Weinberger et al.) — every token hashes into one of
# QCLF_BUCKETS feature buckets, the model is one weight per bucket, a
# document's score is the weight sum over its tokens (with
# multiplicity) and the verdict is score > 0.  The weights here are
# md5-derived integers so the scoring is int64-exact AND the DuckDB
# oracle can recompute the model inline; swapping in trained weights
# changes only the __init__ (the Ray plumbing — actor-pool model load,
# vectorized batch inference — is the production layout).

QCLF_BUCKETS = 256
QCLF_WEIGHT_RANGE = 101  # weights in [-50, 50]


class QualityClassifier:
    """Actor-pool model-inference stage: the weight table is the
    'model', built ONCE per actor in ``__init__`` (the model-load
    pattern — at scale this is the fastText/ONNX load); ``__call__``
    scores each batch vectorized (unique-word md5 -> bucket -> weight
    gather -> per-doc int64 add)."""

    def __init__(self) -> None:
        self.weights = np.array(
            [
                int.from_bytes(
                    hashlib.md5(f"qw:{b}".encode()).digest()[:8], "little"
                ) % QCLF_WEIGHT_RANGE - QCLF_WEIGHT_RANGE // 2
                for b in range(QCLF_BUCKETS)
            ],
            dtype=np.int64,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        words, doc_of_word, ndocs = _flat_words(batch)
        ne = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
        w = words.to_numpy(zero_copy_only=False)[ne]
        d = doc_of_word[ne]
        scores = np.zeros(ndocs, dtype=np.int64)
        if len(w):
            uniq, inv = np.unique(w, return_inverse=True)
            buckets = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.md5(u.encode()).digest()[:8], "little"
                    ) % QCLF_BUCKETS
                    for u in uniq
                ),
                dtype=np.int64,
                count=len(uniq),
            )
            np.add.at(scores, d, self.weights[buckets[inv]])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "clf_score": pa.array(scores),
                "clf_pass": pa.array((scores > 0).astype(np.int64)),
            }
        )


def quality_classifier(sf_dir: str):
    """Model-based quality filtering over documents — see
    QualityClassifier."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(
        QualityClassifier,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 4),
    )


# DSIR-style data selection (hashed-feature importance resampling,
# after Xie et al. 2023, "Data Selection for Language Models via
# Importance Resampling" — public method).  The published form uses
# log-ratio weights over hashed unigram+bigram features; here the
# per-bucket weight is the EXACT integer ratio ((tgt+1)*SCALE)//(raw+1)
# (Laplace-smoothed) over hashed unigrams so the scoring is int64-exact
# and the DuckDB oracle mirrors it bit-for-bit; the bigram extension
# changes only the bucket function.
DSIR_BUCKETS = 512
DSIR_TARGET_SOURCE = "src0"  # the "high-quality target" domain
DSIR_SCALE = 10_000
DSIR_TOP_K = 100


def dsir_select(sf_dir: str):
    """Select the DSIR_TOP_K raw-pool documents whose hashed-unigram
    distribution best matches the target domain (source ==
    DSIR_TARGET_SOURCE): per-token importance weight from the
    target-vs-raw bucket histograms, per-doc score summed over token
    instances, ranked by length-normalized score_pt = score * SCALE //
    n_tokens.

    Physical plan: pass 1 folds the two B-bucket histograms as
    per-batch bincount partials (B = 512 rows each — a calendar-bounded
    driver merge, the user_stickiness discipline), broadcasting the
    weight array once; pass 2 scores every raw doc vectorized (one
    unique-word md5 gather per batch) and trims to a LOCAL top-K per
    batch, so only <= K rows per batch reach the global
    sort-descending + limit.  At 100 TB both passes stream; the only
    driver state is 2 x 512 int64."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "source"],
    )

    def _buckets(w: np.ndarray) -> np.ndarray:
        uniq, inv = np.unique(w, return_inverse=True)
        b = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(u.encode()).digest()[:8], "little"
                ) % DSIR_BUCKETS
                for u in uniq
            ),
            dtype=np.int64,
            count=len(uniq),
        )
        return b[inv]

    def hist_partial(b: pa.Table) -> pa.Table:
        words, doc_of, _ = _flat_words(b)
        ne = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
        w = words.to_numpy(zero_copy_only=False)[ne]
        src = b["source"].to_numpy(zero_copy_only=False)
        is_tgt = (src == DSIR_TARGET_SOURCE)[doc_of[ne]]
        bk = _buckets(w) if len(w) else np.zeros(0, dtype=np.int64)
        tgt = np.bincount(bk[is_tgt], minlength=DSIR_BUCKETS)
        raw = np.bincount(bk[~is_tgt], minlength=DSIR_BUCKETS)
        return pa.table(
            {
                "bucket": pa.array(np.arange(DSIR_BUCKETS, dtype=np.int64)),
                "tgt": pa.array(tgt.astype(np.int64)),
                "raw": pa.array(raw.astype(np.int64)),
            }
        )

    tgt = np.zeros(DSIR_BUCKETS, dtype=np.int64)
    raw = np.zeros(DSIR_BUCKETS, dtype=np.int64)
    for part in ds.map_batches(
        hist_partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        bk = part["bucket"].to_numpy()
        np.add.at(tgt, bk, part["tgt"].to_numpy())
        np.add.at(raw, bk, part["raw"].to_numpy())
    weights_ref = ray.put((tgt + 1) * DSIR_SCALE // (raw + 1))

    def score(b: pa.Table) -> pa.Table:
        wts = ray.get(weights_ref)
        words, doc_of, ndocs = _flat_words(b)
        ne = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
        w = words.to_numpy(zero_copy_only=False)[ne]
        d = doc_of[ne]
        scores = np.zeros(ndocs, dtype=np.int64)
        ntok = np.bincount(d, minlength=ndocs).astype(np.int64)
        if len(w):
            np.add.at(scores, d, wts[_buckets(w)])
        src = b["source"].to_numpy(zero_copy_only=False)
        keep = (src != DSIR_TARGET_SOURCE) & (ntok > 0)
        did = b["doc_id"].to_numpy().astype(np.int64)[keep]
        sc, nt = scores[keep], ntok[keep]
        spt = sc * DSIR_SCALE // nt
        # local top-K: only the batch's best K rows travel
        o = np.lexsort((did, -spt))[:DSIR_TOP_K]
        return pa.table(
            {
                "doc_id": pa.array(did[o]),
                "score": pa.array(sc[o]),
                "n_tokens": pa.array(nt[o]),
                "score_pt": pa.array(spt[o]),
            }
        )

    return (
        ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["score_pt", "doc_id"], descending=[True, False])
        .limit(DSIR_TOP_K)
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Document fingerprint: md5 of the normalized skeleton (lowercase,
    alnum+space, collapsed) — a canonical content hash."""
    # skeletonize the whole column in Arrow (lower + strip + collapse),
    # then md5 each skeleton (the hash itself is the per-doc cost)
    sk = pc.utf8_lower(batch["text"])
    sk = pc.replace_substring_regex(sk, pattern="[^a-z0-9 ]", replacement="")
    sk = pc.replace_substring_regex(sk, pattern=" +", replacement=" ")
    sk = pc.utf8_trim(sk, characters=" ")
    fps = [
        hashlib.md5(t.encode("utf-8")).hexdigest() for t in sk.to_pylist()
    ]
    return pa.table(
        {"doc_id": batch["doc_id"], "fp": pa.array(fps, type=pa.string())}
    )


# Rolling-hash winnowing parameters (polynomial over ASCII codes — fully
# arithmetic so the oracle can reproduce it without a hash function).
KGRAM = 5
WIN = 4
BASE = 31
MOD = 1_000_000_007


def winnow_batch(batch: pa.Table) -> pa.Table:
    """Winnowing fingerprint: k-gram polynomial rolling hashes; a position
    is selected when its hash equals the min of the trailing window;
    output = distinct (doc_id, h) selected hashes."""
    texts = batch["text"].to_pylist()
    ids = batch["doc_id"].to_pylist()
    out_id, out_h = [], []
    pows = [pow(BASE, KGRAM - 1 - j, MOD) for j in range(KGRAM)]
    for did, t in zip(ids, texts):
        n = len(t)
        if n < KGRAM:
            continue
        # ord() = unicode code point = DuckDB ascii() — exact SQL parity
        ords = np.fromiter((ord(c) for c in t), dtype=np.int64, count=n)
        h = np.zeros(n - KGRAM + 1, dtype=np.int64)
        for j in range(KGRAM):
            h = (h + ords[j : j + len(h)] * pows[j]) % MOD
        # trailing-window min via one padded sliding_window_view (the
        # clamped left edge becomes +inf padding) — no per-position loop
        padded = np.concatenate((np.full(WIN - 1, np.iinfo(np.int64).max), h))
        wmin = np.lib.stride_tricks.sliding_window_view(padded, WIN).min(axis=1)
        sel = np.unique(h[h == wmin])
        out_id.extend([did] * len(sel))
        out_h.extend(sel.tolist())
    return pa.table(
        {
            "doc_id": pa.array(out_id, type=pa.int64()),
            "h": pa.array(out_h, type=pa.int64()),
        }
    )


# --- UTF-8 hygiene audit -------------------------------------------------------

# The fixtures are pure ASCII, so the audit plants deterministic
# mojibake (UNION-ALL-mirrored in the oracle) to keep every counter
# non-vacuous: a control-char suffix, a replacement-char suffix (the
# classic mis-decode residue) and an accented suffix.
N_PLANT_HYG = 12
HYG_SUFFIX_CTRL = "\x07"
HYG_SUFFIX_REPL = "�"
HYG_SUFFIX_ACC = "caf\xe9"
# RE2 patterns shared verbatim with the DuckDB oracle (both sides RE2):
# C0 controls except \t \n \r, plus DEL; and any non-ASCII codepoint.
HYG_CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
HYG_NONASCII_RE = r"[^\x00-\x7f]"


def utf8_hygiene(sf_dir: str):
    """Per-source mojibake/encoding audit: documents containing raw
    control characters, U+FFFD replacement characters (the fingerprint
    of a lossy re-decode) or any non-ASCII codepoint — the hygiene
    report a crawl-ingest pipeline gates on before tokenization.

    Embarrassingly parallel: per batch, three vectorized RE2/substring
    matches + one factorized per-source exact-int64 bincount;
    <= n_sources partial rows per batch reach the bounded final
    groupby.  Nothing but the count matrix leaves the workers."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])

    def hyg_partial(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy().astype(np.int64)
        m = doc_id < N_PLANT_HYG
        tabs = [b.select(["text", "source"])]
        if m.any():
            planted = b.filter(pa.array(m))
            texts = planted["text"].to_pylist()  # bounded: < N_PLANT_HYG
            for suffix in (HYG_SUFFIX_CTRL, HYG_SUFFIX_REPL,
                           HYG_SUFFIX_ACC):
                tabs.append(pa.table({
                    "text": pa.array([t + suffix for t in texts],
                                     type=pa.string()),
                    "source": planted["source"],
                }).cast(tabs[0].schema))
        aug = pa.concat_tables(tabs)
        text = aug["text"]
        flags = {
            "n_ctrl": pc.match_substring_regex(text, HYG_CTRL_RE),
            "n_repl": pc.match_substring(text, HYG_SUFFIX_REPL),
            "n_nonascii": pc.match_substring_regex(text, HYG_NONASCII_RE),
        }
        codes, uniq = pd.factorize(aug["source"].to_pandas())
        k = len(uniq)
        cols = {"source": pa.array(list(uniq), type=pa.string()),
                "n_docs": pa.array(np.bincount(codes, minlength=k)
                                   .astype(np.int64))}
        for name, f in flags.items():
            hit = f.to_numpy(zero_copy_only=False).astype(bool)
            cnt = np.zeros(k, dtype=np.int64)  # exact int64 (item 39)
            np.add.at(cnt, codes[hit], 1)
            cols[name] = pa.array(cnt)
        return pa.table(cols)

    rows = (
        ds.map_batches(hyg_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("source").aggregate(  # bounded: n_sources keys
            Sum("n_docs"), Sum("n_ctrl"), Sum("n_repl"), Sum("n_nonascii"))
        .take_all()
    )
    rows.sort(key=lambda r: r["source"])
    return pa.table({
        "source": pa.array([r["source"] for r in rows], type=pa.string()),
        "n_docs": pa.array([int(r["sum(n_docs)"]) for r in rows],
                           type=pa.int64()),
        "n_ctrl": pa.array([int(r["sum(n_ctrl)"]) for r in rows],
                           type=pa.int64()),
        "n_repl": pa.array([int(r["sum(n_repl)"]) for r in rows],
                           type=pa.int64()),
        "n_nonascii": pa.array([int(r["sum(n_nonascii)"]) for r in rows],
                               type=pa.int64()),
    })


# Distributed BPE vocabulary training (Sennrich et al. 2016, public):
# BPE_MERGES greedy rounds of most-frequent-adjacent-pair merging over
# the corpus word-frequency table, word-internal (no end-of-word
# marker — documented simplification), ties -> lexicographically
# smallest (left, right).  The merge-apply is greedy-left
# non-overlapping; overlapping candidate chains (left == right, e.g.
# 'aaaa') merge at even chain offsets — the same gaps-and-islands
# parity the SQL mirror uses, so both sides share one semantics.
BPE_MERGES = 6


def _bpe_apply_merge(wid: np.ndarray, sym: np.ndarray, left: str,
                     right: str):
    """One greedy-left merge pass over flat (word-id, symbol) arrays —
    fully vectorized, including the overlapping-chain parity."""
    if len(sym) < 2:
        return wid, sym
    cand = np.r_[(sym[:-1] == left) & (sym[1:] == right)
                 & (wid[:-1] == wid[1:]), False]
    if not cand.any():
        return wid, sym
    # maximal runs of consecutive candidates: greedy-left takes even
    # offsets (runs longer than 1 only possible when left == right)
    runstart = cand & ~np.r_[False, cand[:-1]]
    idx = np.arange(len(cand))
    start = np.maximum.accumulate(np.where(runstart, idx, -1))
    take = cand & ((idx - start) % 2 == 0)
    drop = np.r_[False, take[:-1]]  # right halves
    out_sym = sym.copy()
    out_sym[take] = left + right
    keep = ~drop
    return wid[keep], out_sym[keep]


def _bpe_learn(sf_dir: str) -> list[tuple[str, str, int]]:
    """The first BPE_MERGES learned merges over the corpus:
    (round, left_sym, right_sym, pair_count) — the tokenizer-training
    step of an LLM data pipeline as a distributed op, oracle-mirrored
    with unrolled MATERIALIZED merge rounds (QUALIFY winner + the
    parity-island merge application).

    Physical plan: the word-frequency table folds once into coarse
    word-hash partitions and materializes (BPE's working set is the
    VOCABULARY, not the corpus — scans after pass 0 touch unique words
    only); each round re-derives symbol state per batch by replaying
    the t-1 broadcast merges (stateless, exactly what the SQL rounds
    do) and emits bounded (left, right, count) partials folded on the
    driver (bounded by the live pair space; at a 10^9-type vocabulary
    the same fold coarse-partitions by pair hash — documented)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def wf_partial(b: pa.Table) -> pa.Table:
        words, _, _ = _flat_words(b)
        ne = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
        w = words.to_numpy(zero_copy_only=False)[ne]
        uniq, counts = np.unique(w, return_counts=True)
        part = np.asarray(
            [int.from_bytes(hashlib.md5(u.encode()).digest()[:4], "little")
             % 64 for u in uniq], dtype=np.int64)
        return pa.table({
            "w": pa.array(list(uniq), type=pa.string()),
            "f": pa.array(counts.astype(np.int64)),
            "part": pa.array(part),
        })

    def wf_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"w": pa.array([], type=pa.string()),
                             "f": pa.array([], type=pa.int64())})
        w = np.asarray(g["w"].to_pylist(), dtype=object)
        f = g["f"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(w, kind="stable")
        w, f = w[o], f[o]
        new = np.r_[True, w[1:] != w[:-1]]
        gid = np.cumsum(new) - 1
        tot = int_bincount(gid, f)
        return pa.table({"w": pa.array(w[new], type=pa.string()),
                         "f": pa.array(tot)})

    wf = (
        ds.map_batches(wf_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("part").map_groups(wf_fold, batch_format="pyarrow")
        .materialize()
    )

    merges: list[tuple[str, str, int]] = []
    for t in range(BPE_MERGES):
        done = list(merges)

        def pair_partial(b: pa.Table, done=done) -> pa.Table:
            words = b["w"].to_pylist()
            f = b["f"].to_numpy().astype(np.int64)
            lens = np.fromiter(map(len, words), dtype=np.int64,
                               count=len(words))
            sym = np.array(list("".join(words)), dtype=object)
            wid = np.repeat(np.arange(len(words), dtype=np.int64), lens)
            for l, r, _ in done:
                wid, sym = _bpe_apply_merge(wid, sym, l, r)
            if len(sym) < 2:
                return pa.table({
                    "l": pa.array([], type=pa.string()),
                    "r": pa.array([], type=pa.string()),
                    "cnt": pa.array([], type=pa.int64()),
                })
            adj = wid[:-1] == wid[1:]
            ls = sym[:-1][adj]
            rs = sym[1:][adj]
            fw = f[wid[:-1][adj]]
            # pair key = integer (symbol-index, symbol-index) — no
            # in-band string separator, so symbols containing ANY byte
            # (merged or raw) key correctly (review finding)
            su, sidx = np.unique(np.concatenate([ls, rs]),
                                 return_inverse=True)
            li, ri = sidx[:len(ls)], sidx[len(ls):]
            pk = li * len(su) + ri
            uniq, inv = np.unique(pk, return_inverse=True)
            cnt = int_bincount(inv, fw)
            return pa.table({
                "l": pa.array(list(su[uniq // len(su)]),
                              type=pa.string()),
                "r": pa.array(list(su[uniq % len(su)]),
                              type=pa.string()),
                "cnt": pa.array(cnt),
            })

        acc: dict[tuple[str, str], int] = {}
        for part in wf.map_batches(
            pair_partial, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow"):
            for l, r, c in zip(part["l"].to_pylist(),
                               part["r"].to_pylist(),
                               part["cnt"].to_pylist()):
                acc[(l, r)] = acc.get((l, r), 0) + int(c)
        if not acc:
            break
        (l, r), c = min(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, c))

    return merges


def bpe_train(sf_dir: str):
    """Driver view of _bpe_learn: (round, left_sym, right_sym,
    pair_count) rows for the learned merges."""
    merges = _bpe_learn(sf_dir)
    return pa.table({
        "round": pa.array(np.arange(1, len(merges) + 1, dtype=np.int64)),
        "left_sym": pa.array([m[0] for m in merges], type=pa.string()),
        "right_sym": pa.array([m[1] for m in merges], type=pa.string()),
        "pair_count": pa.array(np.asarray([m[2] for m in merges],
                                          dtype=np.int64)),
    })


def bpe_token_count(sf_dir: str):
    """Encode with the learned vocabulary: per document, the number of
    BPE tokens after applying the BPE_MERGES trained merges — train
    then encode, the full tokenizer loop as registry ops.

    The encode pass needs NO vocabulary broadcast and no join: the
    merge list is tiny (BPE_MERGES entries), so each batch char-splits
    its own UNIQUE words, replays the merges with the shared
    _bpe_apply_merge, and maps per-word symbol counts back through the
    unique-inverse — one streaming scan after training."""
    import ray.data as rd

    merges = _bpe_learn(sf_dir)

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def encode(b: pa.Table) -> pa.Table:
        words, doc_of, ndocs = _flat_words(b)
        ne = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
        w = words.to_numpy(zero_copy_only=False)[ne]
        d = doc_of[ne]
        n = np.zeros(ndocs, dtype=np.int64)
        if len(w):
            uniq, inv = np.unique(w, return_inverse=True)
            lens = np.fromiter(map(len, uniq), dtype=np.int64,
                               count=len(uniq))
            sym = np.array(list("".join(uniq)), dtype=object)
            wid = np.repeat(np.arange(len(uniq), dtype=np.int64), lens)
            for l, r, _ in merges:
                wid, sym = _bpe_apply_merge(wid, sym, l, r)
            n_sym = np.bincount(wid, minlength=len(uniq)).astype(np.int64)
            np.add.at(n, d, n_sym[inv])
        return pa.table({
            "doc_id": b["doc_id"],
            "n_bpe_tokens": pa.array(n),
        })

    return ds.map_batches(encode, batch_format="pyarrow",
                          zero_copy_batch=True)
