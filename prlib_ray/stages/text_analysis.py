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


def quality_score_batch(batch: pa.Table) -> pa.Table:
    """Quality scoring: stopword/punct/length signals, integer outputs.

    score_pct = (100 * n_stop) // max(n_words, 1) — integer arithmetic so
    the oracle hash is exact.
    """
    texts = batch["text"].to_pylist()
    stop = set(STOPWORDS)
    n_words, n_stop = [], []
    for t in texts:
        ws = [w for w in t.split(" ") if w != ""]
        n_words.append(len(ws))
        n_stop.append(sum(1 for w in ws if w in stop))
    n_punct = pc.cast(
        pc.count_substring_regex(batch["text"], pattern=PUNCT_PATTERN), pa.int64()
    )
    nw = np.array(n_words, dtype=np.int64)
    ns = np.array(n_stop, dtype=np.int64)
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


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Language ID: marker-stopword vote, argmax with lexicographic
    tie-break (ties -> smallest language code)."""
    texts = batch["text"].to_pylist()
    langs = sorted(LANG_MARKERS)
    sets = {c: set(LANG_MARKERS[c]) for c in langs}
    pred = []
    for t in texts:
        ws = t.split(" ")
        counts = {c: sum(1 for w in ws if w in sets[c]) for c in langs}
        best = max(langs, key=lambda c: (counts[c], ))  # max count; ties ->
        # max() keeps the FIRST maximal element in iteration order, and
        # langs is sorted ascending -> smallest code wins ties.
        pred.append(best)
    return pa.table(
        {"doc_id": batch["doc_id"], "lang_pred": pa.array(pred, type=pa.string())}
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Document fingerprint: md5 of the normalized skeleton (lowercase,
    alnum+space, collapsed) — a canonical content hash."""
    from prlib_ray.functions.textfns import skeleton_zhang_suen

    texts = batch["text"].to_pylist()
    fps = [
        hashlib.md5(skeleton_zhang_suen(t).encode("utf-8")).hexdigest()
        for t in texts
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
        sel = set()
        for p in range(len(h)):
            lo = max(0, p - WIN + 1)
            if h[p] == h[lo : p + 1].min():
                sel.add(int(h[p]))
        for v in sorted(sel):
            out_id.append(did)
            out_h.append(v)
    return pa.table(
        {
            "doc_id": pa.array(out_id, type=pa.int64()),
            "h": pa.array(out_h, type=pa.int64()),
        }
    )
