"""Deduplication family for training-data pipelines.

* exact        — content-hash partition + per-group min (oracle-exact)
* ngram Jaccard— exact 3-word-shingle Jaccard pairs, integer threshold
                 decision 5*|∩| >= |∪|  (oracle-exact on a bounded id range)
* MinHash+LSH  — shingle -> 64 minhashes -> 16 bands -> bucket groupby ->
                 candidate pairs -> exact-Jaccard verification (probabilistic
                 candidate generation: no SQL oracle; pytest checks recall
                 against the exact pairs)
* SimHash      — 64-bit simhash over word md5s, hamming-bucket candidates
* embedding    — near-duplicate pairs by quantized-integer cosine (exact
                 integer decision, oracle-backed; see similarity.py)

Scale notes: exact dedup shuffles one (hash, doc_id) pair per row;
MinHash shuffles one (band, bucket, doc_id) triple per band per doc —
both linear in input with tiny rows, the standard web-scale layouts.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from prlib_ray.blocks import int_bincount, note_bounded_input


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _hash_min_fold(ds, key_batch_fn, *, counts: bool, ranked: bool = False):
    """Shared hash-group survivor layout: per-batch pre-combine (best doc
    [+ count] per hash key), crc32 coarse hash partitions, ONE
    vectorized lexsort run-boundary fold per part — used by exact_dedup,
    normalized_dedup AND best_survivor_dedup so the fold can never
    drift between them.

    The fold runs per COARSE partition (crc32(hash) % N_DEDUP_PARTS),
    not per hash key: Ray's per-key aggregate pays ms-scale cost per
    distinct key and the key count here is the document count itself.
    A hash never spans parts, and each batch pre-combines so at most
    one row per (batch, hash) shuffles.

    ``key_batch_fn(b) -> (hs, ids)`` — or ``(hs, ids, rank)`` when
    ``ranked=True``: object ndarray of hash keys + int64 ndarray of doc
    ids for the (possibly augmented) batch.  Unranked, the survivor is
    min(doc_id); ranked (int64, e.g. text length) it is (rank DESC,
    doc_id ASC) and the output carries the survivor's rank as column
    ``rank``."""
    import zlib

    import pandas as pd

    empty_cols = {"h": pa.array([], type=pa.string()),
                  "doc_id": pa.array([], type=pa.int64()),
                  "part": pa.array([], type=pa.int64())}
    if counts:
        empty_cols["n_docs"] = pa.array([], type=pa.int64())

    def add_hash(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            e = dict(empty_cols)
            if ranked:
                e["rank"] = pa.array([], type=pa.int64())
            return pa.table(e)
        res = key_batch_fn(b)
        hs, ids = res[0], res[1]
        rank = res[2] if ranked else None
        # local pre-combine: the survivor sorts first within a hash run
        order = (np.lexsort((ids, -rank, hs)) if rank is not None
                 else np.lexsort((ids, hs)))
        h_s, i_s = hs[order], ids[order]
        starts = np.flatnonzero(np.r_[True, h_s[1:] != h_s[:-1]])
        h_u, i_u = h_s[starts], i_s[starts]
        part = np.asarray(
            [zlib.crc32(h.encode()) % N_DEDUP_PARTS for h in h_u],
            dtype=np.int64,
        )
        cols = {"h": pa.array(h_u, type=pa.string()),
                "doc_id": pa.array(i_u), "part": pa.array(part)}
        if rank is not None:
            cols["rank"] = pa.array(rank[order][starts])
        if counts:
            cnt = np.diff(np.r_[starts, len(h_s)]).astype(np.int64)
            cols["n_docs"] = pa.array(cnt)
        return pa.table(cols)

    def per_part(g: pa.Table) -> pa.Table:
        # Arrow-native fold (round 4): map_groups used to run in pandas,
        # copying every block out of Arrow; the group is int/str columns
        # only, so the numpy kernel reads the Arrow buffers directly
        if g.num_rows == 0:
            e = {"h": pa.array([], type=pa.string()),
                 "doc_id": pa.array([], type=pa.int64())}
            if ranked:
                e["rank"] = pa.array([], type=pa.int64())
            if counts:
                e["n_docs"] = pa.array([], type=pa.int64())
            return pa.table(e)
        hs = np.asarray(g["h"].to_pylist(), dtype=object)
        ids = g["doc_id"].to_numpy().astype(np.int64)
        if ranked:
            rank = g["rank"].to_numpy().astype(np.int64)
            order = np.lexsort((ids, -rank, hs))
        else:
            order = np.lexsort((ids, hs))
        h_s, i_s = hs[order], ids[order]
        starts = np.flatnonzero(np.r_[True, h_s[1:] != h_s[:-1]])
        out = {"h": pa.array(h_s[starts], type=pa.string()),
               "doc_id": pa.array(i_s[starts])}
        if ranked:
            out["rank"] = pa.array(rank[order][starts])
        if counts:
            ns = g["n_docs"].to_numpy().astype(np.int64)[order]
            out["n_docs"] = pa.array(
                np.add.reduceat(ns, starts).astype(np.int64))
        return pa.table(out)

    return (
        ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
    )


def exact_dedup(sf_dir: str):
    """Exact dedup: md5(text) -> hash-partition -> min(doc_id) survives
    (the shared _hash_min_fold layout)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def keys(b: pa.Table):
        hs = np.asarray([_md5(t) for t in b["text"].to_pylist()],
                        dtype=object)
        return hs, b["doc_id"].to_numpy().astype(np.int64)

    return _hash_min_fold(ds, keys, counts=False)


def _shingles(text: str, k: int = 3) -> set[str]:
    words = [w for w in text.split(" ") if w != ""]
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


MAX_PAIR_ID = 300  # bounded id range for the exact all-pairs oracle query


def _bounded_candidate_pairs(docs: dict[int, str]):
    """All-pairs integer-Jaccard candidates (union > 0 and
    5*inter >= union, i.e. J >= 0.2) over a BOUNDED {doc_id: text}
    map — THE candidate rule, shared by ngram_jaccard_pairs and
    edit_distance_pairs (both SQL mirrors state the same inequality)
    so the two queries cannot silently disagree on candidates.
    Returns id-ordered (doc_a, doc_b, inter, union) tuples."""
    items = sorted((d, _shingles(t)) for d, t in docs.items())
    out = []
    for i in range(len(items)):
        ida, sa = items[i]
        for j in range(i + 1, len(items)):
            idb, sb = items[j]
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if union > 0 and 5 * inter >= union:
                out.append((ida, idb, inter, union))
    return out


def ngram_jaccard_pairs(sf_dir: str):
    """Exact n-gram Jaccard near-dup pairs over doc_id < MAX_PAIR_ID.

    Decision is pure integer arithmetic (5*inter >= union, union > 0 —
    i.e. Jaccard >= 0.2), so the DuckDB oracle matches bit-for-bit.
    All-pairs is the *baseline*; the scale path is minhash_lsh_dedup.
    """
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    note_bounded_input("dedup_ngram_jaccard", ds.count(), "MAX_PAIR_ID", MAX_PAIR_ID)
    ds = ds.map_batches(
        lambda b: b.filter(pa.array(b["doc_id"].to_numpy() < MAX_PAIR_ID)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    rows = ds.take_all()  # bounded: < MAX_PAIR_ID rows by construction
    cand = _bounded_candidate_pairs(
        {int(r["doc_id"]): r["text"] for r in rows})
    return pa.table(
        {
            "doc_a": pa.array([a for a, _, _, _ in cand], type=pa.int64()),
            "doc_b": pa.array([b for _, b, _, _ in cand], type=pa.int64()),
            "inter": pa.array([i for _, _, i, _ in cand], type=pa.int64()),
            "uni": pa.array([u for _, _, _, u in cand], type=pa.int64()),
        }
    )


# --- Containment (asymmetric subset-duplication) pairs ------------------------

N_PLANT_CONTAIN = 5          # planted snippet docs (quote-in-long-doc)
PLANT_CONTAIN_OFFSET = 2_000_000
CONTAIN_SNIPPET_WORDS = 6    # first K space-split parts of the source


def containment_pairs(sf_dir: str):
    """Exact n-gram CONTAINMENT near-dup pairs over doc_id <
    MAX_PAIR_ID: 2*inter >= min(n_a, n_b), min > 0 — i.e. at least
    half of the SMALLER doc's shingles appear in the other.  The
    asymmetric subset-duplication rule Jaccard misses: a short doc
    quoted verbatim inside a long one has containment ~1.0 but
    Jaccard ~ |short|/|long| ~ 0.  Bounded all-pairs baseline like
    ngram_jaccard_pairs (the integer decision mirrors bit-for-bit in
    SQL); at scale containment dedup runs on suffix-array / CDC-chunk
    machinery, with minhash banding as the candidate generator.

    The fixtures contain no true subset-duplicate, so the input is
    AUGMENTED deterministically (the dedup_embedding plant
    discipline): each doc_id < N_PLANT_CONTAIN contributes a snippet
    doc at +PLANT_CONTAIN_OFFSET holding its first
    CONTAIN_SNIPPET_WORDS space-split parts — containment fires on
    every plant, Jaccard's 5*inter >= union cannot (pinned in
    pytest)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    note_bounded_input("dedup_containment", ds.count(), "MAX_PAIR_ID", MAX_PAIR_ID)
    ds = ds.map_batches(
        lambda b: b.filter(pa.array(b["doc_id"].to_numpy() < MAX_PAIR_ID)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    rows = ds.take_all()  # bounded: < MAX_PAIR_ID rows by construction
    docs = {int(r["doc_id"]): r["text"] for r in rows}
    for did in sorted(docs):
        if did < N_PLANT_CONTAIN:
            docs[did + PLANT_CONTAIN_OFFSET] = " ".join(
                docs[did].split(" ")[:CONTAIN_SNIPPET_WORDS])
    items = sorted((d, _shingles(t)) for d, t in docs.items())
    out = []
    for i in range(len(items)):
        ida, sa = items[i]
        for j in range(i + 1, len(items)):
            idb, sb = items[j]
            inter = len(sa & sb)
            lo = min(len(sa), len(sb))
            if lo > 0 and 2 * inter >= lo:
                out.append((ida, idb, inter, len(sa), len(sb)))
    return pa.table({
        "doc_a": pa.array([a for a, _, _, _, _ in out], type=pa.int64()),
        "doc_b": pa.array([b for _, b, _, _, _ in out], type=pa.int64()),
        "inter": pa.array([i for _, _, i, _, _ in out], type=pa.int64()),
        "n_a": pa.array([x for _, _, _, x, _ in out], type=pa.int64()),
        "n_b": pa.array([y for _, _, _, _, y in out], type=pa.int64()),
    })


# --- Sorted-neighborhood (SNM) candidate pairs ---------------------------------

SNM_WINDOW = 3       # pair ranks within this distance in the global order
SNM_KEY_WORDS = 4    # blocking key = md5 of the first K lowercased words
N_SNM_PARTS = 32     # contiguous key-interval range partitions
SNM_BLOCK = 4096     # dense-rank block size for the window join


def sorted_neighborhood_pairs(sf_dir: str):
    """Sorted-neighborhood-method candidate pairs: docs within
    SNM_WINDOW positions of each other in the GLOBAL (blocking key,
    doc_id) order, where the key is md5 of the first SNM_KEY_WORDS
    lowercased words — the classic record-linkage candidate generator
    (Hernandez-Stolfo): sort once, slide a fixed window, compare only
    neighbors.  Output: (doc_a, doc_b, dist, key_equal) — exact, the
    oracle is a row_number self-join.

    Physical plan — exact global-order windowing with NO global sort
    exchange (price_rank_ntile's rank discipline + a dense-rank halo):
    (1) contiguous key-interval range partitions (leading md5 byte //
    8) preserve the global order across parts; a bounded (part, n)
    count fold prefix-sums into exclusive offsets on the driver, each
    part sorts independently: global rank = offset + local rank.
    (2) ranked rows route to dense-rank block rank // SNM_BLOCK and
    ALSO to block (rank + SNM_WINDOW) // SNM_BLOCK when different (the
    forward halo — ranks are dense, so a window can cross at most one
    boundary and empty key intervals cannot starve it); per block one
    sorted grouped-arange pass emits each window pair exactly once
    (only rows whose natural block is this one emit as the right-hand
    doc).  ASCII-lower contract: the fixtures' text is pure ASCII, so
    Python .lower() == DuckDB lower() (the utf8_hygiene plants are
    query-side and not in this table)."""
    import hashlib

    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def keyed(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "h": pa.array([], type=pa.string()),
                "doc_id": pa.array([], type=pa.int64()),
                "kpart": pa.array([], type=pa.int64()),
            })
        ids = b["doc_id"].to_numpy().astype(np.int64)
        # per-doc md5, inherently per-row (the fingerprint_md5 caveat)
        hs = [hashlib.md5(" ".join(t.split(" ")[:SNM_KEY_WORDS])
                          .lower().encode()).hexdigest()
              for t in b["text"].to_pylist()]
        kpart = np.array([int(h[:2], 16) // (256 // N_SNM_PARTS)
                          for h in hs], dtype=np.int64)
        return pa.table({
            "h": pa.array(hs, type=pa.string()),
            "doc_id": pa.array(ids),
            "kpart": pa.array(kpart),
        })

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    def count_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"kpart": z, "n": z})
        kp = b["kpart"].to_numpy().astype(np.int64)
        vals, counts = np.unique(kp, return_counts=True)
        return pa.table({"kpart": pa.array(vals),
                         "n": pa.array(counts.astype(np.int64))})

    totals = np.zeros(N_SNM_PARTS, dtype=np.int64)
    for r in keyed_ds.map_batches(
            count_partial, batch_format="pyarrow",
            zero_copy_batch=True).take_all():  # bounded: <= parts/batch
        totals[int(r["kpart"])] += int(r["n"])
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1]))

    def rank_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({
                "h": pa.array([], type=pa.string()),
                "doc_id": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int64())})
        h = np.asarray(g["h"].to_pylist(), dtype="U32")
        did = g["doc_id"].to_numpy().astype(np.int64)
        o = np.lexsort((did, h))
        base = offsets[int(g["kpart"][0].as_py())]
        return pa.table({
            "h": pa.array(h[o], type=pa.string()),
            "doc_id": pa.array(did[o]),
            "rank": pa.array(base + np.arange(len(o), dtype=np.int64)),
        })

    ranked = (
        keyed_ds.groupby("kpart")
        .map_groups(rank_fold, batch_format="pyarrow")
    )

    def route(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "h": pa.array([], type=pa.string()),
                "doc_id": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int64()),
                "block": pa.array([], type=pa.int64()),
            })
        h = b["h"]
        did = b["doc_id"].to_numpy().astype(np.int64)
        rank = b["rank"].to_numpy().astype(np.int64)
        own = rank // SNM_BLOCK
        fwd = (rank + SNM_WINDOW) // SNM_BLOCK
        extra = fwd != own
        return pa.table({
            "h": pa.concat_arrays([h.combine_chunks()
                                   if isinstance(h, pa.ChunkedArray)
                                   else h,
                                   (h.combine_chunks()
                                    if isinstance(h, pa.ChunkedArray)
                                    else h).filter(pa.array(extra))]),
            "doc_id": pa.array(np.concatenate([did, did[extra]])),
            "rank": pa.array(np.concatenate([rank, rank[extra]])),
            "block": pa.array(np.concatenate([own, fwd[extra]])),
        })

    def window_fold(g: pa.Table) -> pa.Table:
        cols = ("doc_a", "doc_b", "dist", "key_equal")
        if g.num_rows == 0:
            return pa.table({c: pa.array([], type=pa.int64())
                             for c in cols})
        blk = int(g["block"][0].as_py())
        rank = g["rank"].to_numpy().astype(np.int64)
        did = g["doc_id"].to_numpy().astype(np.int64)
        h = np.asarray(g["h"].to_pylist(), dtype="U32")
        o = np.argsort(rank, kind="stable")
        rank, did, h = rank[o], did[o], h[o]
        # halo copies duplicate ranks only across blocks, never within
        # one group (a rank routes to two DIFFERENT blocks) — ranks are
        # unique here by construction
        nat = rank // SNM_BLOCK == blk  # right-hand docs owned here
        lo = np.searchsorted(rank, rank - SNM_WINDOW, side="left")
        j = np.flatnonzero(nat)
        cnt = j - lo[j]                 # partners strictly before j
        jj = np.repeat(j, cnt)
        off = np.repeat(np.cumsum(cnt) - cnt, cnt)
        ii = np.arange(cnt.sum()) - off + np.repeat(lo[j], cnt)
        return pa.table({
            "doc_a": pa.array(did[ii]),
            "doc_b": pa.array(did[jj]),
            "dist": pa.array(rank[jj] - rank[ii]),
            "key_equal": pa.array((h[ii] == h[jj]).astype(np.int64)),
        })

    return (
        ranked.map_batches(route, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("block")
        .map_groups(window_fold, batch_format="pyarrow")
    )


# --- Edit-distance verification of near-dup candidates ------------------------

N_PLANT_EDIT = 10
PLANT_EDIT_OFFSET = 1_000_000
EDIT_VARIANT_WORD = "editvariant"  # replaces each planted doc's first word


def _levenshtein(a: str, b: str) -> int:
    """Exact Levenshtein via the row-DP with the rank-trick insertion
    pass: cur[j] = min_k<=j (cur_pre[k] + (j-k)) computed as one
    minimum.accumulate over (cur - j).  O(len(a)) vectorized rows —
    the only Python loop is over a's characters, and the op runs on a
    BOUNDED candidate set (like the md5 fingerprints, inherently
    per-pair)."""
    if a == b:
        return 0
    if not a or not b:
        return max(len(a), len(b))
    bv = np.frombuffer(b.encode("utf-8"), dtype=np.uint8)
    av = np.frombuffer(a.encode("utf-8"), dtype=np.uint8)
    nb = len(bv)
    rank = np.arange(nb + 1, dtype=np.int64)
    prev = rank.copy()
    cur = np.empty(nb + 1, dtype=np.int64)
    for i, ca in enumerate(av, start=1):
        cur[0] = i
        np.minimum(prev[:-1] + (bv != ca), prev[1:] + 1, out=cur[1:])
        t = cur - rank
        np.minimum.accumulate(t, out=t)
        np.add(t, rank, out=cur)
        prev, cur = cur, prev
    return int(prev[-1])


def edit_distance_pairs(sf_dir: str):
    """Levenshtein verification of the near-dup candidate pairs — the
    fuzzy-dedup verify step an LSH recall stage hands off to.

    Candidates are the SAME bounded all-pairs 5*inter >= union shingle
    rule as ngram_jaccard_pairs, over the corpus augmented with planted
    one-word-substitution mutants (doc_id < N_PLANT_EDIT at
    +PLANT_EDIT_OFFSET, first word -> EDIT_VARIANT_WORD) so small
    nonzero distances are non-vacuous at every sf.  Output per pair:
    exact char-level distance + an integer near-dup permille
    (floor(1000*dist/max(len))), both mirrored by DuckDB's
    levenshtein().  ASCII corpus contract: the byte-level DP equals
    DuckDB's per-character distance (documented; the fixtures and
    plants are ASCII)."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    note_bounded_input("dedup_edit_distance", ds.count(), "MAX_PAIR_ID", MAX_PAIR_ID)
    ds = ds.map_batches(
        lambda b: b.filter(pa.array(b["doc_id"].to_numpy() < MAX_PAIR_ID)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    rows = ds.take_all()  # bounded: < MAX_PAIR_ID rows by construction
    docs = {int(r["doc_id"]): r["text"] for r in rows}
    for i in sorted(docs):
        if i >= N_PLANT_EDIT:
            break
        words = docs[i].split(" ")
        docs[i + PLANT_EDIT_OFFSET] = " ".join(
            [EDIT_VARIANT_WORD] + words[1:]
        )
    pairs = [(a, b) for a, b, _, _ in _bounded_candidate_pairs(docs)]
    if not pairs:
        return pa.table({
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
            "dist": pa.array([], type=pa.int64()),
            "near_permille": pa.array([], type=pa.int64()),
        })
    # the DP runs distributed: pairs are a Dataset, the bounded text
    # lookup broadcasts once (same boundedness as the candidate rule)
    texts_ref = ray.put(docs)
    pair_ds = rd.from_arrow(pa.table({
        "doc_a": pa.array([p[0] for p in pairs], type=pa.int64()),
        "doc_b": pa.array([p[1] for p in pairs], type=pa.int64()),
    }))

    def dist_batch(b: pa.Table) -> pa.Table:
        lookup = ray.get(texts_ref)
        da = b["doc_a"].to_numpy()
        db = b["doc_b"].to_numpy()
        dist = np.empty(len(da), dtype=np.int64)
        mx = np.empty(len(da), dtype=np.int64)
        for k in range(len(da)):
            ta, tb = lookup[int(da[k])], lookup[int(db[k])]
            dist[k] = _levenshtein(ta, tb)
            mx[k] = max(len(ta), len(tb))
        near = np.where(mx > 0, 1000 * dist // np.maximum(mx, 1), 0)
        return pa.table({
            "doc_a": b["doc_a"], "doc_b": b["doc_b"],
            "dist": pa.array(dist),
            "near_permille": pa.array(near.astype(np.int64)),
        })

    return pair_ds.map_batches(
        dist_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# --- MinHash + LSH -----------------------------------------------------------

N_HASH = 64
N_BANDS = 16  # 4 rows per band
MERSENNE = (1 << 61) - 1
_rng = np.random.RandomState(42)
_A = _rng.randint(1, MERSENNE, size=N_HASH, dtype=np.int64)
_B = _rng.randint(0, MERSENNE, size=N_HASH, dtype=np.int64)


def _shingle_ids(text: str, k: int = 3) -> np.ndarray:
    """Stable 64-bit shingle ids from md5 (no PYTHONHASHSEED dependence)."""
    sh = _shingles(text, k)
    if not sh:
        return np.zeros(0, dtype=np.uint64)
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
            for s in sh
        ),
        dtype=np.uint64,
        count=len(sh),
    )


_P61 = np.uint64(MERSENNE)
_AU = _A.astype(np.uint64)
_BU = _B.astype(np.uint64)


def _mod_p61(z: np.ndarray) -> np.ndarray:
    """Fold z (uint64, z < 2^63) into [0, 2^61-1) exactly."""
    z = (z & _P61) + (z >> np.uint64(61))
    return np.where(z >= _P61, z - _P61, z)


def _mulmod_p61(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact (a*b) mod 2^61-1 for a, b < 2^61 in pure uint64 arithmetic.

    Splits each factor into 32-bit halves; the cross terms are reduced
    with 2^64 = 8 and 2^61 = 1 (mod p), every intermediate < 2^63.
    """
    a_hi, a_lo = a >> np.uint64(32), a & np.uint64(0xFFFFFFFF)
    b_hi, b_lo = b >> np.uint64(32), b & np.uint64(0xFFFFFFFF)
    hh = a_hi * b_hi                   # < 2^58   (term of 2^64 ≡ 8)
    mid = a_hi * b_lo + a_lo * b_hi    # < 2^62   (term of 2^32)
    ll = a_lo * b_lo                   # < 2^64
    mid_hi = mid >> np.uint64(29)      # mid*2^32 = mid_hi*2^61 + mid_lo*2^32
    mid_lo = mid & np.uint64((1 << 29) - 1)
    ll_red = (ll & _P61) + (ll >> np.uint64(61))
    z = hh * np.uint64(8) + mid_hi + (mid_lo << np.uint64(32)) + ll_red
    return _mod_p61(z)


def _minhash(sids: np.ndarray) -> np.ndarray:
    """64 permutation minima via (a*x+b) mod 2^61-1 — exact uint64
    split-multiply arithmetic (no Python big-int objects in the hot path;
    identical values to the arbitrary-precision formula)."""
    if len(sids) == 0:
        return np.full(N_HASH, MERSENNE, dtype=np.int64)
    x = _mod_p61(_mod_p61(sids.astype(np.uint64)))[None, :]  # 2^64-range -> < p
    vals = _mulmod_p61(_AU[:, None], x) + _BU[:, None]  # < 2p < 2^62
    vals = np.where(vals >= _P61, vals - _P61, vals)
    return vals.min(axis=1).astype(np.int64)


LSH_BUCKET_CAP = 64  # all-pairs only up to this bucket size (see below)
N_DEDUP_PARTS = 64  # coarse hash partitions for the exact pair-distinct


def _pair_indices(n: int, cap: int) -> tuple[np.ndarray, np.ndarray]:
    """Within-bucket candidate pair indices with an explosion guard.

    Buckets up to ``cap`` members emit all C(n,2) pairs (the plain LSH
    contract).  A hot bucket — boilerplate-heavy corpora guarantee some
    — would emit O(n^2) pairs with no bound (one 10^6-doc spam cluster =
    5*10^11 pairs), so above ``cap`` we switch to sorted-neighborhood
    pairing: each doc pairs with its next ``cap`` neighbors in doc_id
    order, O(n*cap) pairs.  True duplicate clusters stay connected
    (transitively) through neighborhood pairs; the cap is observable via
    ``lsh_bucket_stats`` (no silent truncation)."""
    if n < 2:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    if n <= cap:
        return np.triu_indices(n, k=1)
    offs = np.arange(1, cap + 1, dtype=np.int64)
    i = np.repeat(np.arange(n, dtype=np.int64), cap)
    j = i + np.tile(offs, n)
    m = j < n
    return i[m], j[m]


def _join_partitions() -> int:
    """Join aggregators are actors: more partitions than CPUs stalls the
    pipeline (see NOTES); size to half the CPUs."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return max(2, ncpu // 2)


def _pairs_from_buckets(bands, key_cols: list[str], cap: int = LSH_BUCKET_CAP,
                        order_col: str | None = None):
    """bucket rows -> candidate pair Dataset (doc_a, doc_b), distinct.

    The pairs stay distributed end-to-end: dedup across buckets is a
    coarse hash-partitioned distinct, not a driver-side drop_duplicates.

    Bucketing itself is ALSO coarse-partitioned: a per-bucket-key Ray
    groupby means one Python group call per DISTINCT bucket (docs x
    bands of them — measured 12 s of pure scheduling overhead at sf0.1
    vs ~2 s for the same pairs through 64 coarse parts).  Rows hash by
    bucket key into N_DEDUP_PARTS groups; inside each part a run-length
    pass visits only multi-member buckets (singletons — the vast
    majority — are skipped wholesale).

    ``order_col``: when an over-cap bucket falls back to neighborhood
    pairing, sort its members by this column instead of doc_id — for
    SimHash the full signature value, so near-duplicates (numerically
    close signatures) stay adjacent and survive the cap (Charikar-style
    sorted-fingerprint neighborhoods)."""

    def add_bucket_part(b: pa.Table) -> pa.Table:
        import zlib

        n = b.num_rows
        acc = np.zeros(n, dtype=np.uint64)
        for c in key_cols:
            col = b[c]
            if pa.types.is_integer(col.type):
                v = col.to_numpy().astype(np.int64).view(np.uint64)
            else:
                v = np.fromiter(
                    (zlib.crc32(s.encode()) for s in col.to_pylist()),
                    dtype=np.uint64, count=n,
                )
            acc = (acc * np.uint64(0x100000001B3)) ^ (
                v * np.uint64(0x9E3779B97F4A7C15)
            )
        part = (acc % np.uint64(N_DEDUP_PARTS)).astype(np.int32)
        return b.append_column("part", pa.array(part))

    def part_pairs(g: pa.Table) -> pa.Table:
        # Arrow-native fold (round 4; was a pandas map_groups with a
        # pandas-groupby ngroup): per-column factorize + one stable
        # lexsort groups identical bucket keys contiguously with the
        # original within-bucket row order preserved (np.lexsort is
        # stable), which is all the pair expansion below relies on
        if g.num_rows == 0:
            return pa.table({"doc_a": pa.array([], type=pa.int64()),
                             "doc_b": pa.array([], type=pa.int64())})
        invs = []
        for c in key_cols:
            col = g[c]
            if pa.types.is_integer(col.type):
                v = col.to_numpy()
            else:
                v = np.asarray(col.to_pylist(), dtype=object)
            _, inv = np.unique(v, return_inverse=True)
            invs.append(inv)
        doc = g["doc_id"].to_numpy().astype(np.int64)
        ordv = (g[order_col].to_numpy().astype(np.int64)
                if order_col is not None else None)
        # lexsort: last key is primary -> reversed(key_cols) order
        order = np.lexsort(tuple(reversed(invs)))
        inv_s = [iv[order] for iv in invs]
        doc_s = doc[order]
        change = np.zeros(len(doc_s), dtype=bool)
        change[0] = True
        for iv in inv_s:
            change[1:] |= iv[1:] != iv[:-1]
        bounds = np.flatnonzero(np.r_[change, True])
        sizes = np.diff(bounds)
        out_a, out_b = [], []
        for bi in np.flatnonzero(sizes >= 2):  # multi-member buckets only
            lo, hi = bounds[bi], bounds[bi + 1]
            raw = doc_s[lo:hi]
            uniq, first = np.unique(raw, return_index=True)
            if len(uniq) < 2:
                continue
            if order_col is not None and len(uniq) > cap:
                o = np.argsort(
                    ordv[order][lo:hi][first].view(np.uint64), kind="stable"
                )
                ids = uniq[o]
            else:
                ids = uniq
            i, j = _pair_indices(len(ids), cap)
            a, b_ = ids[i], ids[j]
            out_a.append(np.minimum(a, b_))
            out_b.append(np.maximum(a, b_))
        if not out_a:
            return pa.table({"doc_a": pa.array([], type=pa.int64()),
                             "doc_b": pa.array([], type=pa.int64())})
        return pa.table({"doc_a": pa.array(np.concatenate(out_a)),
                         "doc_b": pa.array(np.concatenate(out_b))})

    cand = (
        bands.map_batches(add_bucket_part, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("part")
        .map_groups(part_pairs, batch_format="pyarrow")
    )
    # Distinct over (doc_a, doc_b): NOT a per-pair-key groupby — Ray's
    # aggregate pays per-GROUP Python overhead, catastrophic at ~10^5+
    # distinct pairs (measured 124 s for 467k keys at sf0.1).  Instead
    # hash-partition the pairs into a few coarse groups and run one
    # vectorized drop_duplicates per group: same exact distinct, the
    # group count stays O(cluster cores) regardless of pair count.
    def add_part(b: pa.Table) -> pa.Table:
        a = b["doc_a"].to_numpy().astype(np.int64).view(np.uint64)
        bb = b["doc_b"].to_numpy().astype(np.int64).view(np.uint64)
        part = ((a * np.uint64(0x9E3779B97F4A7C15) ^ bb)
                % np.uint64(N_DEDUP_PARTS)).astype(np.int32)
        return b.append_column("part", pa.array(part))

    def drop_dups(g: pa.Table) -> pa.Table:
        # Arrow-native distinct (round 4; was pandas drop_duplicates):
        # one lexsort + run-boundary mask over the two int64 columns
        if g.num_rows == 0:
            return pa.table({"doc_a": pa.array([], type=pa.int64()),
                             "doc_b": pa.array([], type=pa.int64())})
        a = g["doc_a"].to_numpy().astype(np.int64)
        b = g["doc_b"].to_numpy().astype(np.int64)
        o = np.lexsort((b, a))
        a, b = a[o], b[o]
        m = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        return pa.table({"doc_a": pa.array(a[m]), "doc_b": pa.array(b[m])})

    distinct = (
        cand.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(drop_dups, batch_format="pyarrow")
        # normalize non-empty blocks to the exact (doc_a, doc_b) schema
        .map_batches(_pair_schema, batch_format="pyarrow")
        # mostly-empty partitions (small corpora) yield SCHEMA-LESS empty
        # pandas blocks which BYPASS map UDFs and crash the downstream
        # join aggregators; repartition coalesces them into real blocks
        .repartition(_join_partitions())
    )
    # candidate pairs are the tiny side (linear in corpus by the cap);
    # materialize once so the empty-set branch and the two verify joins
    # don't re-execute the banding pipeline
    return distinct.materialize()


def _pair_schema(b: pa.Table) -> pa.Table:
    if b.num_rows == 0 or "doc_a" not in b.column_names:
        return pa.table({"doc_a": pa.array([], type=pa.int64()),
                         "doc_b": pa.array([], type=pa.int64())})
    return pa.table({"doc_a": b["doc_a"], "doc_b": b["doc_b"]})


def _blobify_batch(b: pa.Table) -> pa.Table:
    """doc -> sorted-unique shingle-id uint64 blob (+ count).  The one
    md5-heavy pass; both the banding and the verification joins reuse
    the stored blobs."""
    blobs, ns = [], []
    for t in b["text"].to_pylist():
        s = np.sort(_shingle_ids(t))
        blobs.append(s.tobytes())
        ns.append(len(s))
    return pa.table(
        {
            "doc_id": b["doc_id"],
            "sh": pa.array(blobs, type=pa.large_binary()),
            "n_sh": pa.array(ns, type=pa.int64()),
        }
    )


def _bands_from_blob_batch(b: pa.Table) -> pa.Table:
    """(band, sig, doc_id) rows from stored shingle blobs — THE band
    generation, shared by ``minhash_lsh_dedup`` and ``lsh_bucket_stats``
    so the observability stats can never desynchronize from the pairs
    they describe (one definition of the banding, two consumers)."""
    ids, bands_, sigs = [], [], []
    rows = N_HASH // N_BANDS
    for did, sh in zip(b["doc_id"].to_pylist(), b["sh"].to_pylist()):
        mh = _minhash(np.frombuffer(sh, dtype=np.uint64))
        for band in range(N_BANDS):
            seg = mh[band * rows : (band + 1) * rows]
            ids.append(did)
            bands_.append(band)
            # ':'-joined decimal encoding (not raw bytes): equality-
            # preserving, and md5(concat_ws(':', ...)) is expressible in
            # the DuckDB oracle — the whole banding mirrors in SQL
            sigs.append(
                hashlib.md5(":".join(map(str, seg.tolist())).encode())
                .hexdigest()
            )
    return pa.table(
        {
            "band": pa.array(bands_, type=pa.int32()),
            "sig": pa.array(sigs, type=pa.string()),
            "doc_id": pa.array(ids, type=pa.int64()),
        }
    )


def _pairwise_intersection_counts(sh_a: list[bytes], sh_b: list[bytes],
                                  na: np.ndarray, nb: np.ndarray) -> np.ndarray:
    """|A_i ∩ B_i| per pair, where each side is a SORTED-UNIQUE uint64
    blob — one vectorized pass over the whole batch instead of a
    per-pair np.intersect1d loop.

    Both sides of a pair concatenate into one (pair_id, value) stream;
    after a lexsort by (pair_id, value), an adjacent equal (pair_id,
    value) duplicate can only be a cross-side match (each side is unique
    within a pair), so the intersection count is a bincount of adjacent
    duplicates per pair."""
    n = len(sh_a)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    va = (np.frombuffer(b"".join(sh_a), dtype=np.uint64)
          if sh_a else np.zeros(0, dtype=np.uint64))
    vb = (np.frombuffer(b"".join(sh_b), dtype=np.uint64)
          if sh_b else np.zeros(0, dtype=np.uint64))
    pid = np.concatenate([
        np.repeat(np.arange(n, dtype=np.int64), na.astype(np.int64)),
        np.repeat(np.arange(n, dtype=np.int64), nb.astype(np.int64)),
    ])
    vals = np.concatenate([va, vb])
    order = np.lexsort((vals, pid))
    p = pid[order]
    v = vals[order]
    dup = (p[1:] == p[:-1]) & (v[1:] == v[:-1])
    return np.bincount(p[1:][dup], minlength=n).astype(np.int64)


def _attach(pairs, payload, key: str, *, num_partitions: int):
    """Hash-join a per-doc payload Dataset onto one side of the pairs."""
    return pairs.join(
        payload,
        "inner",
        num_partitions=num_partitions,
        on=(key,),
        right_on=("doc_id",),
    )


_PF_GOLD = np.uint64(0x9E3779B97F4A7C15)
N_PF_PARTS = 64


def _hp(x: np.ndarray) -> np.ndarray:
    """Golden-ratio coarse partition hash (sid/doc -> part id) — the
    ONE hash for every posting-layout stage."""
    return ((x.view(np.uint64) * _PF_GOLD)
            % np.uint64(N_PF_PARTS)).astype(np.int64)


def _pf_explode_batch(b: pa.Table, *, with_n: bool) -> pa.Table:
    """Shared posting explode: a blob batch -> (sid, doc[, n], part)
    rows — ONE definition consumed by prefix_filter_join AND
    ngram_novelty so the posting layout cannot drift (review finding /
    the band-generation lesson)."""
    if b.num_rows == 0:
        z = pa.array([], type=pa.int64())
        cols = {"sid": z, "doc": z}
        if with_n:
            cols["n"] = z
        cols["part"] = z
        return pa.table(cols)
    blobs = b["sh"].to_pylist()
    n = b["n_sh"].to_numpy().astype(np.int64)
    did = b["doc_id"].to_numpy().astype(np.int64)
    sid = np.frombuffer(b"".join(blobs), dtype=np.uint64).view(np.int64)
    cols = {"sid": pa.array(sid), "doc": pa.array(np.repeat(did, n))}
    if with_n:
        cols["n"] = pa.array(np.repeat(n, n))
    cols["part"] = pa.array(_hp(sid))
    return pa.table(cols)



def prefix_filter_join(sf_dir: str):
    """Exact similarity self-join (J >= 0.5) over the FULL corpus via
    prefix filtering (the AllPairs/PPJoin core) — COMPLETE recall by
    construction, unlike LSH: order every doc's shingle ids by the
    global (df, id) total order; with prefix length
    p = n - ceil(n/2) + 1, any pair with J >= 1/2 has
    inter >= ceil(n/2) on each side (3·inter >= n_a + n_b and
    inter <= n_b give 2·inter >= n_a), so its order-SMALLEST common
    token must sit inside BOTH prefixes — candidates are exactly the
    co-occurrences in prefix inverted lists.  The bounded all-pairs
    baseline (dedup_ngram_jaccard, doc_id < 300) generalized to the
    whole table with an unbounded exact oracle.

    Physical plan: the shared _blobify_batch substrate (ONE md5 pass,
    materialized — feeds the df explode AND the verify joins); df per
    shingle folds in sid-hash parts and rides back on each posting; a
    doc-hash shuffle lexsorts each doc's tokens by (df, sid) and emits
    its prefix postings; sid-hash parts turn prefix buckets into
    candidate pairs (grouped-arange, no Python pair loop); pair-hash
    parts dedup; the SHARED _verify_pairs path (two Dataset.joins +
    one vectorized intersection pass) confirms exactly.  NO caps
    anywhere — the df-ordered prefix self-limits hot buckets (rarest
    tokens first; measured sf0.1: max bucket 10, 431k candidates from
    134k postings); capping would trade away the completeness
    guarantee.  At 10^12 docs each stage is 2-4 int64 columns through
    coarse hash shuffles; the blobs shuffle only in the final verify
    join of the (tiny) candidate set."""
    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    blob = ds.map_batches(
        _blobify_batch, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def explode(b: pa.Table) -> pa.Table:
        return _pf_explode_batch(b, with_n=True)

    def df_attach(g: pa.Table) -> pa.Table:
        cols = ("sid", "doc", "n", "df", "part2")
        if g.num_rows == 0:
            return pa.table({c: pa.array([], type=pa.int64())
                             for c in cols})
        sid = g["sid"].to_numpy().astype(np.int64)
        doc = g["doc"].to_numpy().astype(np.int64)
        n = g["n"].to_numpy().astype(np.int64)
        o = np.argsort(sid, kind="stable")
        sid, doc, n = sid[o], doc[o], n[o]
        starts = np.flatnonzero(np.r_[True, sid[1:] != sid[:-1]])
        lens = np.diff(np.r_[starts, len(sid)])
        df = np.repeat(lens, lens)
        return pa.table({"sid": pa.array(sid), "doc": pa.array(doc),
                         "n": pa.array(n), "df": pa.array(df),
                         "part2": pa.array(_hp(doc))})

    def prefix_fold(g: pa.Table) -> pa.Table:
        cols = ("sid", "doc", "part3")
        if g.num_rows == 0:
            return pa.table({c: pa.array([], type=pa.int64())
                             for c in cols})
        sid = g["sid"].to_numpy().astype(np.int64)
        doc = g["doc"].to_numpy().astype(np.int64)
        n = g["n"].to_numpy().astype(np.int64)
        df = g["df"].to_numpy().astype(np.int64)
        o = np.lexsort((sid, df, doc))
        sid, doc, n = sid[o], doc[o], n[o]
        starts = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
        pos = np.arange(len(doc)) - np.repeat(starts,
                                              np.diff(np.r_[starts,
                                                            len(doc)]))
        p = n - (n + 1) // 2 + 1
        keep = pos < p
        return pa.table({"sid": pa.array(sid[keep]),
                         "doc": pa.array(doc[keep]),
                         "part3": pa.array(_hp(sid[keep]))})

    def bucket_pairs(g: pa.Table) -> pa.Table:
        cols = ("doc_a", "doc_b", "part4")
        if g.num_rows == 0:
            return pa.table({c: pa.array([], type=pa.int64())
                             for c in cols})
        sid = g["sid"].to_numpy().astype(np.int64)
        doc = g["doc"].to_numpy().astype(np.int64)
        o = np.lexsort((doc, sid))
        sid, doc = sid[o], doc[o]
        starts = np.flatnonzero(np.r_[True, sid[1:] != sid[:-1]])
        ends = np.r_[starts[1:], len(sid)]
        run_end = np.repeat(ends, ends - starts)
        idx = np.arange(len(sid))
        cnt = run_end - idx - 1
        a = np.repeat(doc, cnt)
        off = np.repeat(np.cumsum(cnt) - cnt, cnt)
        bb = doc[np.arange(cnt.sum()) - off + np.repeat(idx + 1, cnt)]
        pp = (((a.view(np.uint64) * _PF_GOLD + bb.view(np.uint64))
               * _PF_GOLD) % np.uint64(N_PF_PARTS)).astype(np.int64)
        return pa.table({"doc_a": pa.array(a), "doc_b": pa.array(bb),
                         "part4": pa.array(pp)})

    def pair_dedup(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc_a": z, "doc_b": z})
        a = g["doc_a"].to_numpy().astype(np.int64)
        bb = g["doc_b"].to_numpy().astype(np.int64)
        o = np.lexsort((bb, a))
        a, bb = a[o], bb[o]
        first = np.r_[True, (a[1:] != a[:-1]) | (bb[1:] != bb[:-1])]
        return pa.table({"doc_a": pa.array(a[first]),
                         "doc_b": pa.array(bb[first])})

    cand = (
        blob.map_batches(explode, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby("part").map_groups(df_attach, batch_format="pyarrow")
        .groupby("part2").map_groups(prefix_fold, batch_format="pyarrow")
        .groupby("part3").map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby("part4").map_groups(pair_dedup, batch_format="pyarrow")
        # materialize: count() streams a COPIED plan in Ray 2.49, so an
        # unmaterialized emptiness probe would re-run all four shuffles
        # a second time inside _verify_pairs (review finding; pairs are
        # tiny, the materialization is cheap)
        .materialize()
    )
    if cand.count() == 0:
        z = pa.array([], type=pa.int64())
        return pa.table({"doc_a": z, "doc_b": z, "inter": z, "uni": z})
    return _verify_pairs(cand, blob, 0.5)


def _verify_pairs(cand, blob, jaccard_threshold: float):
    """Exact-Jaccard verification of candidate (doc_a, doc_b) pairs
    against the per-doc sorted-unique shingle blobs — THE one verify
    path (two Dataset.joins + one vectorized intersection pass per
    batch), shared by minhash_lsh_dedup AND prefix_filter_join so the
    two candidate generators cannot diverge in their decision rule.
    Returns verified pairs (doc_a, doc_b, inter, uni), sorted."""

    def rename_blob(b: pa.Table, col: str) -> pa.Table:
        return pa.table(
            {"doc_id": b["doc_id"], f"sh_{col}": b["sh"], f"n_{col}": b["n_sh"]}
        )

    npart = _join_partitions()
    blob_a = blob.map_batches(
        lambda b: rename_blob(b, "a"), batch_format="pyarrow"
    )
    blob_b = blob.map_batches(
        lambda b: rename_blob(b, "b"), batch_format="pyarrow"
    )
    joined = _attach(
        # repartition between the chained joins: sparse first-join
        # output can hold schema-less empty partitions that crash the
        # second join's aggregators (same empty-block pitfall as above)
        _attach(cand, blob_a, "doc_a", num_partitions=npart).repartition(npart),
        blob_b, "doc_b", num_partitions=npart,
    )
    thr_num = int(jaccard_threshold * 100)

    def verify(b: pa.Table) -> pa.Table:
        na = b["n_a"].to_numpy()
        nb = b["n_b"].to_numpy()
        inter = _pairwise_intersection_counts(
            b["sh_a"].to_pylist(), b["sh_b"].to_pylist(), na, nb
        )
        uni = na + nb - inter
        keep = (uni > 0) & (100 * inter >= thr_num * uni)
        return pa.table(
            {
                "doc_a": b["doc_a"].filter(pa.array(keep)),
                "doc_b": b["doc_b"].filter(pa.array(keep)),
                "inter": pa.array(inter[keep]),
                "uni": pa.array(uni[keep]),
            }
        )

    out = joined.map_batches(verify, batch_format="pyarrow")
    # verified pairs are tiny; the sort only orders the result for
    # deterministic downstream hashing
    return out.sort(["doc_a", "doc_b"])


def minhash_lsh_dedup(sf_dir: str, *, jaccard_threshold: float = 0.5):
    """MinHash+LSH near-dup detection, the web-scale layout — fully
    distributed, nothing funnels through the driver:

    1. map_batches: per doc -> 64 minhashes -> 16 band signatures ->
       explode to (band, sig, doc_id) rows
    2. groupby(band, sig): buckets emit candidate pairs (hot buckets
       capped to sorted-neighborhood pairing, see _pair_indices);
       distinct pairs via a (doc_a, doc_b) groupby
    3. the docs' sorted shingle-id sets (uint64 blobs) hash-join onto
       the pairs twice (Dataset.join), and exact-Jaccard verification
       runs inside map_batches
    Returns verified pairs (doc_a, doc_b, inter, uni), sorted for
    deterministic output."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    # the shingle-id sets are the md5-heavy substrate shared by BOTH the
    # banding and the verification joins: compute ONCE.  Default: pin in
    # the object store (materialize).  PRLIB_BLOB_SPILL_DIR switches to
    # the 100-TB layout — write the blob table to storage and re-read it
    # for each consumer: materialize() pins the WHOLE set, and when the
    # blobs exceed the object store the restore-evict loop livelocks
    # (measured in tools/memory_pressure.py at 256x docs / <=1 GiB
    # store); the parquet roundtrip streams instead.
    import os as _os

    blob_src = ds.map_batches(
        _blobify_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    spill_dir = _os.environ.get("PRLIB_BLOB_SPILL_DIR")
    if spill_dir:
        import shutil as _shutil

        # tool-owned subdirectory + sentinel: never rmtree whatever the
        # env var happens to point at (a misconfigured value naming an
        # existing data directory must not be silently deleted)
        blob_dir = _os.path.join(spill_dir, "prlib_blob")
        sentinel = _os.path.join(blob_dir, ".prlib_blob_owned")
        if _os.path.isdir(blob_dir):
            if not _os.path.exists(sentinel):
                raise RuntimeError(
                    f"refusing to clear {blob_dir!r}: missing the "
                    "prlib-owned sentinel (set PRLIB_BLOB_SPILL_DIR to "
                    "a scratch directory)"
                )
            _shutil.rmtree(blob_dir)
        _os.makedirs(blob_dir, exist_ok=True)
        with open(sentinel, "w") as f:
            f.write("created by prlib_ray minhash_lsh blob spill\n")
        blob_src.write_parquet(blob_dir)
        blob = rd.read_parquet(blob_dir)
    else:
        blob = blob_src.materialize()

    bands = blob.map_batches(
        _bands_from_blob_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    cand = _pairs_from_buckets(bands, ["band", "sig"])
    if cand.count() == 0:
        return pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "inter": pa.array([], type=pa.int64()),
                "uni": pa.array([], type=pa.int64()),
            }
        )

    return _verify_pairs(cand, blob, jaccard_threshold)


def lsh_bucket_stats(sf_dir: str):
    """Observability for the LSH bucket cap (no-silent-caps rule): per
    band-bucket population histogram + how many buckets exceeded
    LSH_BUCKET_CAP (those switched to sorted-neighborhood pairing)."""
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    # bucket sizes via the coarse-partition pattern (a per-bucket-key
    # Ray aggregate pays per-GROUP overhead — catastrophic at 10^6+
    # buckets): per-batch (band, sig, cnt) partials, hash-partitioned
    # into N_DEDUP_PARTS groups, one vectorized pandas sum per group
    def partial_counts(b: pa.Table) -> pa.Table:
        return b.group_by(["band", "sig"]).aggregate([("doc_id", "count")])

    def add_part(b: pa.Table) -> pa.Table:
        import zlib

        part = np.fromiter(
            (
                zlib.crc32(f"{band}:{sig}".encode()) % N_DEDUP_PARTS
                for band, sig in zip(
                    b["band"].to_pylist(), b["sig"].to_pylist()
                )
            ),
            dtype=np.int32,
            count=b.num_rows,
        )
        return b.append_column("part", pa.array(part))

    def sum_counts(g: pa.Table) -> pa.Table:
        # Arrow-native fold (round 4): factorize (band, sig) + one
        # stable lexsort + reduceat, replacing the pandas groupby-sum
        if g.num_rows == 0:
            return pa.table({"band": pa.array([], type=pa.int32()),
                             "sig": pa.array([], type=pa.string()),
                             "doc_id_count": pa.array([], type=pa.int64())})
        band = g["band"].to_numpy().astype(np.int64)
        sig = np.asarray(g["sig"].to_pylist(), dtype=object)
        cnt = g["doc_id_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, sinv = np.unique(sig, return_inverse=True)
        o = np.lexsort((sinv, band))
        band, sig, sinv, cnt = band[o], sig[o], sinv[o], cnt[o]
        new = np.r_[True, (band[1:] != band[:-1]) | (sinv[1:] != sinv[:-1])]
        starts = np.flatnonzero(new)
        return pa.table({
            "band": pa.array(band[starts].astype(np.int32)),
            "sig": pa.array(sig[starts], type=pa.string()),
            "doc_id_count": pa.array(np.add.reduceat(cnt, starts)),
        })

    sizes = (
        ds.map_batches(_blobify_batch, batch_format="pyarrow",
                       zero_copy_batch=True)
        .map_batches(_bands_from_blob_batch, batch_format="pyarrow",
                     zero_copy_batch=True)
        .map_batches(partial_counts, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sum_counts, batch_format="pyarrow")
    )

    def flag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "doc_id_count" not in b.column_names:
            sz = np.zeros(0, dtype=np.int64)
        else:
            sz = b["doc_id_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n_buckets": pa.array(np.ones(len(sz), dtype=np.int64)),
                "bucket_size": pa.array(sz),
                "over_cap": pa.array((sz > LSH_BUCKET_CAP).astype(np.int64)),
            }
        )

    agg = sizes.map_batches(flag, batch_format="pyarrow").aggregate(
        Sum("n_buckets", alias_name="n_buckets"),
        Max("bucket_size", alias_name="max_bucket"),
        Sum("over_cap", alias_name="n_capped"),
    )
    return pa.table({k: pa.array([v], type=pa.int64()) for k, v in agg.items()})


def simhash_hamming_dedup(sf_dir: str, *, max_hamming: int = 8):
    """SimHash near-dup pairs: 4x16-bit band buckets (a pair within
    hamming distance <= 16/band-count must collide on some band for
    moderate distances) -> candidate pairs -> exact hamming verification.

    Fully distributed like minhash_lsh_dedup: candidate pairs stay a
    Dataset (hot buckets capped), the signatures hash-join back onto the
    pairs (Dataset.join x2), and the popcount verification is one
    vectorized unpackbits pass inside map_batches.

    Probabilistic candidate generation (banding misses pairs whose
    differing bits spread across all 4 bands) -> rows-only check;
    pytest pins determinism and the verification predicate."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # signatures feed the banding AND both join sides: materialize once
    # (tiny: doc_id + int64) instead of recomputing the md5-heavy batch
    sigs = ds.map_batches(
        simhash_batch, batch_format="pyarrow", zero_copy_batch=True
    ).drop_columns(["simhash_hex"]).materialize()

    def to_bands(b: pa.Table) -> pa.Table:
        u = b["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        n = len(u)
        keys = np.empty(4 * n, dtype=np.int32)
        for band in range(4):
            keys[band::4] = (
                (u >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            ).astype(np.int32)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
                "key": pa.array(keys),
                "doc_id": pa.array(
                    np.repeat(b["doc_id"].to_numpy().astype(np.int64), 4)
                ),
                # carried so over-cap buckets can neighborhood-pair in
                # signature order (near signatures = near duplicates)
                "simhash": pa.array(np.repeat(u.view(np.int64), 4)),
            }
        )

    bands = sigs.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True)
    cand = _pairs_from_buckets(bands, ["band", "key"], order_col="simhash")
    if cand.count() == 0:
        return pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "hamming": pa.array([], type=pa.int64()),
            }
        )

    def rename(b: pa.Table, col: str) -> pa.Table:
        return pa.table({"doc_id": b["doc_id"], f"sig_{col}": b["simhash"]})

    npart = _join_partitions()
    joined = _attach(
        _attach(
            cand,
            sigs.map_batches(lambda b: rename(b, "a"), batch_format="pyarrow"),
            "doc_a", num_partitions=npart,
        ).repartition(npart),  # coalesce empty partitions between joins
        sigs.map_batches(lambda b: rename(b, "b"), batch_format="pyarrow"),
        "doc_b", num_partitions=npart,
    )

    def verify(b: pa.Table) -> pa.Table:
        xa = b["sig_a"].to_numpy().astype(np.int64).view(np.uint64)
        xb = b["sig_b"].to_numpy().astype(np.int64).view(np.uint64)
        x = (xa ^ xb).view(np.uint8).reshape(-1, 8)
        ham = np.unpackbits(x, axis=1).sum(axis=1).astype(np.int64)
        keep = pa.array(ham <= max_hamming)
        return pa.table(
            {
                "doc_a": b["doc_a"].filter(keep),
                "doc_b": b["doc_b"].filter(keep),
                "hamming": pa.array(ham[ham <= max_hamming]),
            }
        )

    return joined.map_batches(verify, batch_format="pyarrow").sort(
        ["doc_a", "doc_b"]
    )


# --- Clustering (pairs -> connected components -> survivors) ----------------

def dedup_cc_clusters(sf_dir: str):
    """Connected-components clustering over the exact n-gram Jaccard
    pairs (the bounded oracle baseline): every doc appearing in >= 1
    near-dup pair gets cluster_id = min doc_id of its component.

    Union-find with attach-larger-root-to-smaller keeps each root the
    component minimum; the DuckDB oracle mirrors it with a recursive
    transitive-closure CTE (exactly the same components)."""
    pairs = ngram_jaccard_pairs(sf_dir)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # attach the LARGER root under the smaller -> root == min
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    docs = sorted(parent)
    return pa.table(
        {
            "doc_id": pa.array(docs, type=pa.int64()),
            "cluster_id": pa.array([find(d) for d in docs], type=pa.int64()),
        }
    )


def dedup_survivors(sf_dir: str):
    """The dedup OUTPUT: docs (within the bounded range) that survive
    near-dup collapse — each cluster keeps its min doc_id; docs in no
    pair survive trivially.  survivor = (doc_id == cluster_id or
    unpaired)."""
    import ray.data as rd

    clusters = dedup_cc_clusters(sf_dir)
    dropped = {
        d for d, c in zip(
            clusters["doc_id"].to_pylist(), clusters["cluster_id"].to_pylist()
        ) if d != c
    }
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    note_bounded_input("dedup_survivors", ds.count(), "MAX_PAIR_ID",
                       MAX_PAIR_ID)

    def keep(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy().astype(np.int64)
        m = (ids < MAX_PAIR_ID) & ~np.isin(
            ids, np.fromiter(dropped, dtype=np.int64, count=len(dropped))
        )
        return pa.table({"doc_id": pa.array(ids[m], type=pa.int64())})

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def dedup_clusters_minhash(sf_dir: str, *, max_iterations: int = 64):
    """Scale-path clustering: synchronous min-label propagation over the
    verified MinHash near-dup pair Dataset — the distributed connected
    components layout for corpora whose pair set exceeds one machine.

    Each round: every edge forwards its endpoint's current label; a
    doc's new label = min(own, incoming) via the coarse hash-partitioned
    min-reduce (same pattern as the pair distinct — group count stays
    O(cores) at any doc count).  The loop runs TO A FIXPOINT: labels
    only decrease, so an unchanged label sum between rounds (one cheap
    Sum aggregate over the tiny label Dataset) proves no label moved —
    a duplicate chain of any diameter gets one cluster.
    ``max_iterations`` is a hard safety bound; hitting it without
    convergence raises instead of returning silently split labels.
    Probabilistic pair source -> rows-only check; pytest pins agreement
    with the exact union-find on the oracle range."""
    import ray.data as rd
    from ray.data import from_arrow

    pairs_tbl = minhash_lsh_dedup(sf_dir)
    if hasattr(pairs_tbl, "to_pandas") and not isinstance(pairs_tbl, pa.Table):
        pairs_ds = pairs_tbl.select_columns(["doc_a", "doc_b"])
    else:
        pairs_ds = from_arrow(pairs_tbl.select(["doc_a", "doc_b"]))
    return _propagate_min_labels(pairs_ds, max_iterations=max_iterations)


CC_DRIVER_MAX_EDGES = 200_000  # size gate: below this, exact union-find


def _propagate_min_labels(pairs_ds, *, max_iterations: int = 64,
                          via: str = "auto"):
    """Min-label propagation to fixpoint over a (doc_a, doc_b) pair
    Dataset; returns (doc_id, label) sorted by doc_id.

    ``via="auto"`` (default) size-gates the physical plan — the repo's
    standard discipline (extract meta_via / _probe_join): a verified
    near-dup edge set below CC_DRIVER_MAX_EDGES runs the exact driver
    union-find (identical labels, none of the per-round join/
    materialize fixed cost that dominates small inputs); above the
    gate, the distributed min-label loop.  ``via="distributed"`` /
    ``"driver"`` force a layout (tests pin both byte-equal)."""
    if via not in ("auto", "driver", "distributed"):
        raise ValueError(
            f"via must be 'auto', 'driver' or 'distributed', got {via!r}")

    def sym(b: pa.Table) -> pa.Table:
        a = b["doc_a"].to_numpy().astype(np.int64)
        bb = b["doc_b"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, bb])),
                "dst": pa.array(np.concatenate([bb, a])),
            }
        )

    edges = pairs_ds.map_batches(sym, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "label": pa.array([], type=pa.int64()),
            }
        )
    if via == "driver" or (via == "auto" and n_edges <= CC_DRIVER_MAX_EDGES):
        from ray.data import from_arrow

        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for b in edges.iter_batches(batch_format="pyarrow"):
            for s, d in zip(b["src"].to_numpy(), b["dst"].to_numpy()):
                s, d = int(s), int(d)
                parent.setdefault(s, s)
                parent.setdefault(d, d)
                rs, rd = find(s), find(d)
                if rs != rd:
                    # attach larger root under smaller: roots stay minima
                    if rs < rd:
                        parent[rd] = rs
                    else:
                        parent[rs] = rd
        ids = sorted(parent)
        return from_arrow(pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "label": pa.array([find(i) for i in ids], type=pa.int64()),
        }))

    def init_labels(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["src"], "label": b["src"]})

    labels = edges.map_batches(init_labels, batch_format="pyarrow")
    labels = _min_by_doc(labels).materialize()  # distinct docs, label = doc_id

    def _label_sum(lb) -> int:
        # labels only decrease under min-propagation, so sum(label) is
        # strictly monotone until the fixpoint: equal sums <=> converged
        from ray.data.aggregate import Sum

        agg = lb.aggregate(Sum("label", alias_name="s"))
        return int(agg["s"])

    npart = _join_partitions()
    prev = _label_sum(labels)
    for _ in range(max_iterations):
        fwd = edges.join(
            labels, "inner", num_partitions=npart,
            on=("src",), right_on=("doc_id",),
        ).map_batches(
            lambda b: pa.table({"doc_id": b["dst"], "label": b["label"]}),
            batch_format="pyarrow",
        )
        labels = _min_by_doc(labels.union(fwd)).materialize()
        cur = _label_sum(labels)
        if cur == prev:
            return labels.sort("doc_id")
        prev = cur
    raise RuntimeError(
        f"min-label propagation did not converge in {max_iterations} "
        "rounds — component diameter exceeds the safety bound"
    )


def _min_by_doc(labels):
    """Exact per-doc min label via coarse hash partitions + one
    vectorized pandas groupby-min per partition (Ray's aggregate pays
    per-group overhead at high key cardinality; this stays O(cores))."""

    def add_part(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy().astype(np.int64).view(np.uint64)
        part = ((d * np.uint64(0x9E3779B97F4A7C15))
                % np.uint64(N_DEDUP_PARTS)).astype(np.int32)
        return b.append_column("part", pa.array(part))

    def min_label(g: pa.Table) -> pa.Table:
        # Arrow-native fold (round 4): lexsort by (label, doc) and keep
        # each doc run's first row == its min label
        if g.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "label": pa.array([], type=pa.int64())})
        d = g["doc_id"].to_numpy().astype(np.int64)
        l = g["label"].to_numpy().astype(np.int64)
        o = np.lexsort((l, d))
        d, l = d[o], l[o]
        first = np.r_[True, d[1:] != d[:-1]]
        return pa.table({"doc_id": pa.array(d[first]),
                         "label": pa.array(l[first])})

    def label_schema(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "doc_id" not in b.column_names:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "label": pa.array([], type=pa.int64())})
        return pa.table({"doc_id": b["doc_id"], "label": b["label"]})

    return (
        labels.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(min_label, batch_format="pyarrow")
        .map_batches(label_schema, batch_format="pyarrow")
        # coalesce schema-less empty blocks (they bypass map UDFs and
        # would crash the next round's join)
        .repartition(_join_partitions())
    )


# --- SimHash -----------------------------------------------------------------

def simhash_batch(batch: pa.Table) -> pa.Table:
    """64-bit SimHash over distinct-word md5 hashes (stable across workers).

    Emitted as int64 (bit 63 wraps negative) plus the 16-hex string for
    readability; pytest pins golden values — no SQL oracle (bit twiddling
    is impractical to mirror in SQL).
    """
    texts = batch["text"].to_pylist()
    ndocs = len(texts)
    # distinct words per doc -> md5 (cached per batch: corpora repeat
    # words heavily), then one vectorized bit pass over the whole batch
    word_h: dict[str, bytes] = {}
    doc_of: list[int] = []
    hbytes: list[bytes] = []
    for d, t in enumerate(texts):
        for w in set(t.split(" ")):
            if w == "":
                continue
            h = word_h.get(w)
            if h is None:
                # little-endian 8 bytes so unpackbits(bitorder="little")
                # yields bits in (h >> bit) & 1 order, bit = 0..63
                h = word_h[w] = hashlib.md5(w.encode()).digest()[:8][::-1]
            doc_of.append(d)
            hbytes.append(h)
    vals_u = np.zeros(ndocs, dtype=np.uint64)
    if hbytes:
        mat = np.frombuffer(b"".join(hbytes), dtype=np.uint8).reshape(-1, 8)
        bits = np.unpackbits(mat, axis=1, bitorder="little")  # (nwords, 64)
        cnt = np.zeros((ndocs, 64), dtype=np.int64)
        np.add.at(cnt, np.asarray(doc_of, dtype=np.int64), bits)
        nw = np.bincount(
            np.asarray(doc_of, dtype=np.int64), minlength=ndocs
        )[:, None]
        keep = 2 * cnt > nw  # acc = 2*ones - nwords > 0
        vals_u = (
            keep.astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]
        ).sum(axis=1, dtype=np.uint64)
    arr = vals_u.view(np.int64)  # bit 63 wraps negative, as documented
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "simhash": pa.array(arr),
            "simhash_hex": pa.array(
                [format(v, "016x") for v in vals_u.tolist()], type=pa.string()
            ),
        }
    )


# ---------------------------------------------------------------------------
# incremental snapshot dedup (anti-join against an earlier snapshot)

INCR_PREFIX_WORDS = 5  # head-fingerprint width (boilerplate-headed docs)
OLD_SNAPSHOT_MAX_SRC = 10  # source ids < this form the "already ingested" set


def incremental_dedup(sf_dir: str):
    """Incremental-ingestion dedup: docs from the NEW crawl (source id >=
    OLD_SNAPSHOT_MAX_SRC) survive iff their head fingerprint — md5 of the
    first INCR_PREFIX_WORDS words — was never seen in the OLD snapshot
    (source id < OLD_SNAPSHOT_MAX_SRC).  The production shape for "don't
    re-ingest what the last crawl already has".

    Scale layout: the old-side fingerprint set is CORPUS-sized, so it is
    never broadcast and never driver-folded.  Both sides flow through one
    pruned read; each batch emits (fingerprint, doc_id, side, part) rows
    with part = crc32(fingerprint) % N_DEDUP_PARTS, and a coarse
    ``groupby(part)`` resolves the anti-join per part in one vectorized
    pass (a fingerprint never spans parts).  Only fingerprint-sized int/
    hash rows shuffle; text stays at the read."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )

    import zlib

    def fp(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if b.num_rows == 0:
            return pa.table(
                {"f": pa.array([], type=pa.string()), "doc_id": z,
                 "src": pa.array([], type=pa.int64()), "part": z}
            )
        texts = b["text"].to_pylist()
        fs = [
            _md5(" ".join(t.split(" ")[:INCR_PREFIX_WORDS])) for t in texts
        ]
        src = np.asarray(
            [int(s[3:]) for s in b["source"].to_pylist()], dtype=np.int64
        )
        part = np.asarray(
            [zlib.crc32(f.encode()) % N_DEDUP_PARTS for f in fs],
            dtype=np.int64,
        )
        return pa.table(
            {
                "f": pa.array(fs, type=pa.string()),
                "doc_id": b["doc_id"],
                "src": pa.array(src),
                "part": pa.array(part),
            }
        )

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "f": pa.array([], type=pa.string())})
        f = np.asarray(g["f"].to_pylist(), dtype=object)
        doc = g["doc_id"].to_numpy().astype(np.int64)
        src = g["src"].to_numpy().astype(np.int64)
        is_old = src < OLD_SNAPSHOT_MAX_SRC
        order = np.argsort(f, kind="stable")
        fs, docs_, olds = f[order], doc[order], is_old[order]
        new_run = np.r_[True, fs[1:] != fs[:-1]]
        run = np.cumsum(new_run) - 1
        # a new-side row survives iff its fingerprint run contains no old row
        seen_old = np.bincount(run, weights=olds).astype(np.int64) > 0
        keep = (~olds) & (~seen_old[run])
        return pa.table(
            {"doc_id": pa.array(docs_[keep]),
             "f": pa.array(fs[keep], type=pa.string())}
        )

    return (
        ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
    )


def corpus_diff(sf_dir: str):
    """Snapshot diff report: how many distinct head fingerprints (same
    definition as ``incremental_dedup``) were ADDED by the new crawl,
    REMOVED since the old snapshot, and are COMMON to both — the
    between-crawls dashboard row.

    Same scale layout as the anti-join: both sides flow through one
    pruned read, (fingerprint, side) rows hash into coarse partitions
    (a fingerprint never spans parts), each part classifies its
    fingerprints in one vectorized pass and emits three counts; a
    3-key groupby sums the partials."""
    import zlib

    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )

    def fp(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if b.num_rows == 0:
            return pa.table(
                {"f": pa.array([], type=pa.string()), "is_new": z, "part": z}
            )
        fs = np.asarray(
            [_md5(" ".join(t.split(" ")[:INCR_PREFIX_WORDS]))
             for t in b["text"].to_pylist()],
            dtype=object,
        )
        src = np.asarray(
            [int(s[3:]) for s in b["source"].to_pylist()], dtype=np.int64
        )
        is_new = (src >= OLD_SNAPSHOT_MAX_SRC).astype(np.int64)
        # per-batch distinct (f, side) pre-combine
        order = np.lexsort((is_new, fs))
        f_s, n_s = fs[order], is_new[order]
        first = np.r_[True, (f_s[1:] != f_s[:-1]) | (n_s[1:] != n_s[:-1])]
        f_u, n_u = f_s[first], n_s[first]
        part = np.asarray(
            [zlib.crc32(f.encode()) % N_DEDUP_PARTS for f in f_u],
            dtype=np.int64,
        )
        return pa.table(
            {"f": pa.array(f_u, type=pa.string()),
             "is_new": pa.array(n_u), "part": pa.array(part)}
        )

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"status": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        f = np.asarray(g["f"].to_pylist(), dtype=object)
        new = g["is_new"].to_numpy().astype(np.int64)
        order = np.argsort(f, kind="stable")
        f_s, n_s = f[order], new[order]
        run_new = np.r_[True, f_s[1:] != f_s[:-1]]
        run = np.cumsum(run_new) - 1
        has_new = np.bincount(run, weights=n_s).astype(np.int64) > 0
        has_old = np.bincount(run, weights=1 - n_s).astype(np.int64) > 0
        added = int((has_new & ~has_old).sum())
        removed = int((has_old & ~has_new).sum())
        common = int((has_new & has_old).sum())
        return pa.table(
            {"status": pa.array(["added", "removed", "common"],
                                type=pa.string()),
             "n": pa.array([added, removed, common], type=pa.int64())}
        )

    return (
        ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
        .groupby("status")
        .aggregate(Sum("n", alias_name="n_fingerprints"))
    )


# --- Normalized exact dedup ---------------------------------------------------

# Like the embedding fixtures (similarity.N_PLANT), the raw documents
# table has no case/whitespace mutants, which would make a normalized
# dedup vacuously identical to the byte-exact one.  The query plants
# deterministic mutants (doc_id < N_PLANT_NORM duplicated at
# + PLANT_NORM_OFFSET with a leading tab, upper case and trailing
# spaces); the oracle mirrors the mutation with a UNION ALL, so the
# normalization path provably collapses real variants at every scale.
N_PLANT_NORM = 10
PLANT_NORM_OFFSET = 1_000_000


def _plant_norm_batch(b: pa.Table) -> pa.Table:
    """Append this batch's planted case/whitespace mutants (ASCII-safe:
    the fixtures are pure ASCII, so lower(upper(x)) == lower(x))."""
    ids = b["doc_id"].to_numpy().astype(np.int64)
    m = ids < N_PLANT_NORM
    if not m.any():
        return b
    dup = b.filter(pa.array(m))
    mut = pa.array(
        ["\t" + t.upper() + "  " for t in dup["text"].to_pylist()],
        type=b.schema.field("text").type,
    )
    dup = pa.table({
        "doc_id": pa.array(
            dup["doc_id"].to_numpy().astype(np.int64) + PLANT_NORM_OFFSET
        ),
        "text": mut,
    })
    base = pa.table({
        "doc_id": pa.array(ids, type=pa.int64()), "text": b["text"]
    })
    return pa.concat_tables([base, dup.cast(base.schema)])


def _norm_hashes(texts: pa.Array) -> np.ndarray:
    """md5 of the normalized text — the ONE definition of the
    normalization contract (lowercase, collapse RE2 \\s+ runs to one
    space, trim; trim(x, ' ') == the oracle's trim because
    post-collapse edges are plain spaces), shared by normalized_dedup,
    best_survivor_dedup AND split_leakage so the three can never
    drift."""
    import pyarrow.compute as pc

    norm = pc.utf8_trim(
        pc.replace_substring_regex(
            pc.utf8_lower(texts), pattern=r"\s+", replacement=" "
        ),
        characters=" ",
    )
    return np.asarray([_md5(t) for t in norm.to_pylist()], dtype=object)


def _norm_keys(b: pa.Table, *, with_len: bool = False):
    """(hs, ids[, lengths]) for the planted-and-normalized batch;
    lengths (when requested) are utf8_length of the UNnormalized
    planted text — the rank key of the best-survivor policy."""
    import pyarrow.compute as pc

    b = _plant_norm_batch(b)
    hs = _norm_hashes(b["text"])
    ids = b["doc_id"].to_numpy().astype(np.int64)
    if with_len:
        return hs, ids, pc.utf8_length(b["text"]).to_numpy().astype(np.int64)
    return hs, ids


def normalized_dedup(sf_dir: str):
    """Normalization-invariant exact dedup: lowercase, collapse ASCII
    whitespace runs to one space, trim — then md5-group.  Survivor =
    min(doc_id), n_docs = collapsed group size: the standard
    'near-exact' web-dedup pass that catches the case/whitespace
    mutants byte-exact dedup misses.

    Same scale layout as exact_dedup via the shared _hash_min_fold
    (counts=True adds per-batch count partials + a reduceat sum in the
    fold) — at most one row per (batch, hash) shuffles and no per-key
    Ray group exists anywhere."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return _hash_min_fold(ds, _norm_keys, counts=True)


# --- Unicode-normalization-invariant dedup ------------------------------------

# The fixtures are pure ASCII (NFC is the identity there), so the query
# plants one precomposed/decomposed mutant PAIR per low doc_id — two
# strings that differ byte-wise but are NFC-equal — mirrored in the
# oracle with UNION ALLs (the dedup_embedding lesson: a green row must
# be able to fail).
PLANT_UNI_OFFSET_NFC = 1_000_000  # precomposed mutant (U+00E9)
PLANT_UNI_OFFSET_NFD = 2_000_000  # decomposed mutant (e + U+0301)
UNI_SUFFIX_NFC = " caf\u00e9"
UNI_SUFFIX_NFD = " cafe\u0301"  # NFC-equal to UNI_SUFFIX_NFC

_NONASCII_TABLE = np.zeros(256, dtype=np.int64)
_NONASCII_TABLE[0x80:] = 1


def _plant_uni_batch(b: pa.Table) -> pa.Table:
    ids = b["doc_id"].to_numpy().astype(np.int64)
    m = ids < N_PLANT_NORM
    if not m.any():
        return b
    dup = b.filter(pa.array(m))
    texts = dup["text"].to_pylist()
    base = pa.table({
        "doc_id": pa.array(ids, type=pa.int64()), "text": b["text"]
    })
    parts = [base]
    for off, suffix in ((PLANT_UNI_OFFSET_NFC, UNI_SUFFIX_NFC),
                        (PLANT_UNI_OFFSET_NFD, UNI_SUFFIX_NFD)):
        parts.append(pa.table({
            "doc_id": pa.array(
                dup["doc_id"].to_numpy().astype(np.int64) + off
            ),
            "text": pa.array([t + suffix for t in texts],
                             type=base.schema.field("text").type),
        }).cast(base.schema))
    return pa.concat_tables(parts)


def _uni_keys(b: pa.Table):
    """md5 of the NFC-normalized planted text.  ASCII rows (the
    overwhelming majority of any real corpus) skip the per-string
    normalize via a one-pass byte-table scan; only rows with a byte
    >= 0x80 pay unicodedata.normalize."""
    import unicodedata

    from prlib_ray.stages.boilerplate import _byte_class_counts

    b = _plant_uni_batch(b)
    texts = b["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lst = texts.to_pylist()
    for i in np.flatnonzero(_byte_class_counts(texts, _NONASCII_TABLE) > 0):
        lst[i] = unicodedata.normalize("NFC", lst[i])
    hs = np.asarray([_md5(t) for t in lst], dtype=object)
    return hs, b["doc_id"].to_numpy().astype(np.int64)


def unicode_dedup(sf_dir: str):
    """Unicode-normalization-invariant exact dedup: NFC-fold the text,
    then md5-group (survivor = min doc_id, n_docs = group size) — the
    dedup pass that catches precomposed-vs-decomposed near-identical
    web pages byte-exact dedup misses.  Same _hash_min_fold scale
    layout as exact/normalized dedup; DuckDB mirrors the fold via
    nfc_normalize (verified equal to Python's unicodedata NFC)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return _hash_min_fold(ds, _uni_keys, counts=True)


# --- Cross-split contamination audit ------------------------------------------

# Second mutant set for split_leakage: the md5 split rule sends
# id 7 + SL_PLANT_OFFSET2 -> test and id 9 + SL_PLANT_OFFSET2 -> val
# (searched offline), so the CROSS-split rows are non-vacuous at every
# sf — the +1e6 mutants all land in train (P(train) ~ 250/256).
SL_PLANT_OFFSET2 = 2_000_190
_SL_SPLITS = ("test", "train", "val")  # lexicographic — the pair order


def split_leakage(sf_dir: str):
    """Train/val/test contamination audit: for every ORDERED pair of
    splits (a <= b lexicographically), the number of normalized-dup
    groups (>= 2 documents under the _norm_hashes contract) touching
    both a and b.  Cross rows (a != b) are the leakage a decontamination
    pass must resolve before training; (s, s) rows are the intra-split
    dup mass ordinary dedup removes.  The pair contract is the SQL
    self-join over the group's DISTINCT splits — a {train, val} group
    contributes (train,train), (train,val) and (val,val).

    Plants: dedup_normalized's mutants (+1e6) PLUS a second set at
    +SL_PLANT_OFFSET2 whose md5 splits cross (ids 7 -> test, 9 -> val).

    Scale layout: per-batch (hash, split) pre-combine -> crc32 coarse
    hash partitions (a hash never spans parts) -> per part ONE lexsort
    resolves group sizes + split-presence bitmasks, and an 8x6
    mask-to-pair-slot matrix turns the mask histogram into the six pair
    counts -> <= 6 rows per part into a bounded final groupby."""
    import zlib

    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    from prlib_ray.relational import split_of

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    code_of = {s: i for i, s in enumerate(_SL_SPLITS)}
    # slot index for code pair (i <= j): rows of the 6-slot output
    pair_slots = [(i, j) for i in range(3) for j in range(3) if i <= j]
    slot_of = {p: k for k, p in enumerate(pair_slots)}
    # mask (bit i = code i present) -> 6-slot increment vector
    mask_mat = np.zeros((8, 6), dtype=np.int64)
    for mask in range(1, 8):
        present = [c for c in range(3) if mask >> c & 1]
        for ai, a in enumerate(present):
            for b_ in present[ai:]:
                mask_mat[mask, slot_of[(a, b_)]] = 1

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "h": pa.array([], type=pa.string()),
            "code": pa.array([], type=pa.int64()),
            "n": pa.array([], type=pa.int64()),
            "part": pa.array([], type=pa.int64()),
        })
        if b.num_rows == 0:
            return empty
        b = _plant_norm_batch(b)
        ids = b["doc_id"].to_numpy().astype(np.int64)
        m = ids < N_PLANT_NORM  # originals only (plant-1 ids are +1e6)
        if m.any():
            dup = b.filter(pa.array(m))
            mut = pa.array(
                ["\n" + t + " \t" for t in dup["text"].to_pylist()],
                type=b.schema.field("text").type,
            )
            extra = pa.table({
                "doc_id": pa.array(ids[m] + SL_PLANT_OFFSET2),
                "text": mut,
            })
            b = pa.concat_tables([b, extra.cast(b.schema)])
            ids = b["doc_id"].to_numpy().astype(np.int64)
        hs = _norm_hashes(b["text"])
        codes = np.asarray([code_of[s] for s in split_of(ids)],
                           dtype=np.int64)
        # pre-combine per (hash, split): at most one row each per batch
        order = np.lexsort((codes, hs))
        h_s, c_s = hs[order], codes[order]
        starts = np.flatnonzero(
            np.r_[True, (h_s[1:] != h_s[:-1]) | (c_s[1:] != c_s[:-1])]
        )
        cnt = np.diff(np.r_[starts, len(h_s)]).astype(np.int64)
        h_u, c_u = h_s[starts], c_s[starts]
        part = np.asarray(
            [zlib.crc32(h.encode()) % N_DEDUP_PARTS for h in h_u],
            dtype=np.int64,
        )
        return pa.table({
            "h": pa.array(h_u, type=pa.string()),
            "code": pa.array(c_u), "n": pa.array(cnt),
            "part": pa.array(part),
        })

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"split_a": pa.array([], type=pa.string()),
                             "split_b": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        hs = np.asarray(g["h"].to_pylist(), dtype=object)
        codes = g["code"].to_numpy().astype(np.int64)
        ns = g["n"].to_numpy().astype(np.int64)
        order = np.lexsort((codes, hs))
        h_s, c_s, n_s = hs[order], codes[order], ns[order]
        gstart = np.flatnonzero(np.r_[True, h_s[1:] != h_s[:-1]])
        gid = np.cumsum(np.r_[True, h_s[1:] != h_s[:-1]]) - 1
        total = int_bincount(gid, n_s)
        mask = np.bitwise_or.reduceat(
            (np.int64(1) << c_s).astype(np.int64), gstart
        )
        slots = mask_mat[mask[total >= 2]].sum(axis=0)
        # all six rows every part (consistent non-empty schema for the
        # final aggregate); globally-zero pairs drop after the fold
        return pa.table({
            "split_a": pa.array([_SL_SPLITS[i] for i, _ in pair_slots],
                                type=pa.string()),
            "split_b": pa.array([_SL_SPLITS[j] for _, j in pair_slots],
                                type=pa.string()),
            "n": pa.array(slots),
        })

    def drop_zero(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b["n_groups"], 0))

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
        .groupby(["split_a", "split_b"])
        .aggregate(Sum("n", alias_name="n_groups"))
        .map_batches(drop_zero, batch_format="pyarrow")
        .sort(["split_a", "split_b"])
    )


# --- Winnowing shared-fingerprint pairs (MOSS layout) -------------------------

WINNOW_DF_CAP = 20  # stop-fingerprint rule: drop fps in > CAP docs
WINNOW_MIN_SHARED = 3  # report pairs sharing >= this many fingerprints


def winnow_pair_dedup(sf_dir: str):
    """MOSS-style near-dup pairs: documents sharing >= WINNOW_MIN_SHARED
    winnowing fingerprints (text_analysis.winnow_batch — the same
    k-gram rolling-hash selection the fingerprint_winnow query emits),
    after dropping 'stop fingerprints' present in > WINNOW_DF_CAP docs
    — the exact analogue of MOSS's ignore-frequent-substrings rule AND
    the pair-explosion guard: a retained fingerprint emits at most
    C(cap, 2) pairs, so pair volume is linear in distinct fingerprints.

    Plan: (doc_id, h) fingerprint rows hash by h into coarse partitions
    (a fingerprint never spans parts); per part ONE lexsort pass drops
    over-cap runs and emits each kept bucket's pairs; the pairs hash by
    (doc_a, doc_b) into a second coarse partitioning where a run-length
    pass counts shared fingerprints and applies the threshold.  No
    per-key Ray group, no driver funnel."""
    import pandas as pd
    import ray.data as rd

    from prlib_ray.stages.text_analysis import winnow_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    gold = np.uint64(0x9E3779B97F4A7C15)

    def fp_part(b: pa.Table) -> pa.Table:
        t = winnow_batch(b)
        h = t["h"].to_numpy().astype(np.int64)
        part = ((h.view(np.uint64) * gold) % np.uint64(N_DEDUP_PARTS)
                ).astype(np.int64)
        return t.append_column("part", pa.array(part))

    def bucket_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc_a": z, "doc_b": z})
        h = g["h"].to_numpy().astype(np.int64)
        doc = g["doc_id"].to_numpy().astype(np.int64)
        order = np.lexsort((doc, h))
        h_s, d_s = h[order], doc[order]
        bounds = np.flatnonzero(np.r_[True, h_s[1:] != h_s[:-1], True])
        sizes = np.diff(bounds)
        out_a, out_b = [], []
        for bi in np.flatnonzero((sizes >= 2) & (sizes <= WINNOW_DF_CAP)):
            lo, hi = bounds[bi], bounds[bi + 1]
            ids = d_s[lo:hi]  # per-doc-distinct upstream -> unique here
            i, j = np.triu_indices(len(ids), k=1)
            out_a.append(ids[i])
            out_b.append(ids[j])
        if not out_a:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc_a": z, "doc_b": z})
        return pa.table({"doc_a": pa.array(np.concatenate(out_a)),
                         "doc_b": pa.array(np.concatenate(out_b))})

    def pair_part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "doc_a" not in b.column_names:
            return pa.table({"doc_a": pa.array([], type=pa.int64()),
                             "doc_b": pa.array([], type=pa.int64()),
                             "part": pa.array([], type=pa.int64())})
        a = b["doc_a"].to_numpy().astype(np.int64).view(np.uint64)
        bb = b["doc_b"].to_numpy().astype(np.int64).view(np.uint64)
        part = (((a * gold) ^ bb) % np.uint64(N_DEDUP_PARTS)).astype(np.int64)
        return pa.table({"doc_a": b["doc_a"], "doc_b": b["doc_b"],
                         "part": pa.array(part)})

    def count_shared(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc_a": z, "doc_b": z, "n_shared": z})
        a = g["doc_a"].to_numpy().astype(np.int64)
        b_ = g["doc_b"].to_numpy().astype(np.int64)
        order = np.lexsort((b_, a))
        a_s, b_s = a[order], b_[order]
        starts = np.flatnonzero(
            np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])]
        )
        n = np.diff(np.r_[starts, len(a_s)]).astype(np.int64)
        keep = n >= WINNOW_MIN_SHARED
        return pa.table({"doc_a": pa.array(a_s[starts][keep]),
                         "doc_b": pa.array(b_s[starts][keep]),
                         "n_shared": pa.array(n[keep])})

    return (
        ds.map_batches(fp_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .map_batches(pair_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(count_shared, batch_format="pyarrow")
    )


# --- Best-survivor policy over normalized groups -------------------------------


def best_survivor_dedup(sf_dir: str):
    """Normalized dedup with the PRODUCTION survivor policy: within each
    normalized group keep the doc with the MOST characters (ties to the
    smallest doc_id), not the smallest id — the "keep the richest copy"
    rule a curation pipeline actually wants when variants differ in
    formatting.  Uses length(text) computed on both sides (not the
    stored n_chars) so the contract is self-contained.

    The SHARED _hash_min_fold layout (one row per (batch, hash)
    shuffles, crc32 coarse partitions, ONE lexsort fold per part) in
    ranked mode: the rank key (n_chars DESC, doc_id ASC) rides both the
    per-batch pre-combine and the per-part fold, and the normalization
    + plant come from the same _norm_keys normalized_dedup uses — the
    three dedup policies cannot drift apart.  The planted mutants
    ("\\t" + upper + two spaces) are LONGER than their originals, so on
    every planted group this policy provably picks a different survivor
    than normalized_dedup's min-id rule."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    folded = _hash_min_fold(
        ds, lambda b: _norm_keys(b, with_len=True), counts=True, ranked=True
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return pa.table({
                "survivor": pa.array([], type=pa.int64()),
                "n_chars": pa.array([], type=pa.int64()),
                "n_docs": pa.array([], type=pa.int64()),
            })
        return pa.table({
            "survivor": t["doc_id"].cast(pa.int64()),
            "n_chars": t["rank"].cast(pa.int64()),
            "n_docs": t["n_docs"].cast(pa.int64()),
        })

    return (
        folded.map_batches(finalize, batch_format="pyarrow")
        .sort("survivor")
    )


# ---------------------------------------------------------------------------
# Per-source dedup reporting (thirteenth session).  The raw documents
# table has no exact duplicates below sf0.1, so both queries plant
# deterministic cross-source duplicates (doc_id < N_PLANT_XSRC
# duplicated at + PLANT_XSRC_OFFSET with IDENTICAL text under the
# synthetic source PLANT_XSRC_SOURCE); the oracle mirrors the plant
# with a UNION ALL, so the per-source accounting and the cross-source
# matrix are provably non-vacuous at every scale.

N_PLANT_XSRC = 10
PLANT_XSRC_OFFSET = 1_000_000
PLANT_XSRC_SOURCE = "planted"


def _plant_xsrc_batch(b: pa.Table) -> pa.Table:
    """Append this batch's planted exact cross-source duplicates."""
    ids = b["doc_id"].to_numpy().astype(np.int64)
    base = pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": b["text"],
        "source": b["source"],
    })
    m = ids < N_PLANT_XSRC
    if not m.any():
        return base
    dup = b.filter(pa.array(m))
    dup = pa.table({
        "doc_id": pa.array(
            dup["doc_id"].to_numpy().astype(np.int64) + PLANT_XSRC_OFFSET
        ),
        "text": dup["text"],
        "source": pa.array([PLANT_XSRC_SOURCE] * dup.num_rows,
                           type=pa.string()),
    })
    return pa.concat_tables([base, dup.cast(base.schema)])


def dedup_rate_by_source(sf_dir: str):
    """Per-source exact-dedup accounting: how many documents each
    source contributes, how many SURVIVE byte-exact dedup (min doc_id
    per md5(text) group), and the removed count + exact permille — the
    report a curation pipeline reads to see which sources feed it
    duplicates.

    Layout mirrors _hash_min_fold (per-batch survivor pre-combine,
    crc32(h) % N_DEDUP_PARTS coarse partitions, one lexsort
    run-boundary fold per part — a hash never spans parts) with the
    survivor's SOURCE carried through the fold; the per-source totals
    are one separate partial pass.  Both ends are bounded (one row per
    source), so only survivor candidates shuffle."""
    import zlib

    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])

    def totals(b: pa.Table) -> pa.Table:
        b = _plant_xsrc_batch(b)
        src = b["source"].to_numpy(zero_copy_only=False).astype(object)
        su, counts = np.unique(src, return_counts=True)
        return pa.table({
            "source": pa.array(su.tolist(), type=pa.string()),
            "n": pa.array(counts.astype(np.int64)),
        })

    tot_rows = (
        ds.map_batches(totals, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("n", alias_name="n_docs"))
        .take_all()  # bounded: one row per source
    )

    def cand(b: pa.Table) -> pa.Table:
        b = _plant_xsrc_batch(b)
        hs = np.asarray([_md5(t) for t in b["text"].to_pylist()],
                        dtype=object)
        ids = b["doc_id"].to_numpy().astype(np.int64)
        src = b["source"].to_numpy(zero_copy_only=False).astype(object)
        order = np.lexsort((ids, hs))
        h_s, i_s, s_s = hs[order], ids[order], src[order]
        starts = np.flatnonzero(np.r_[True, h_s[1:] != h_s[:-1]])
        part = np.asarray(
            [zlib.crc32(h.encode()) % N_DEDUP_PARTS
             for h in h_s[starts]],
            dtype=np.int64,
        )
        return pa.table({
            "h": pa.array(h_s[starts], type=pa.string()),
            "doc_id": pa.array(i_s[starts]),
            "src": pa.array(s_s[starts].tolist(), type=pa.string()),
            "part": pa.array(part),
        })

    def surv_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"source": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        hs = np.asarray(g["h"].to_pylist(), dtype=object)
        ids = g["doc_id"].to_numpy().astype(np.int64)
        src = np.asarray(g["src"].to_pylist(), dtype=object)
        order = np.lexsort((ids, hs))
        h_s, s_s = hs[order], src[order]
        starts = np.flatnonzero(np.r_[True, h_s[1:] != h_s[:-1]])
        su, counts = np.unique(s_s[starts].astype(str),
                               return_counts=True)
        return pa.table({
            "source": pa.array(su, type=pa.string()),
            "n": pa.array(counts.astype(np.int64)),
        })

    surv_rows = (
        ds.map_batches(cand, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(surv_fold, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n", alias_name="n_survivors"))
        .take_all()  # bounded: one row per source
    )

    tot = {str(r["source"]): int(r["n_docs"]) for r in tot_rows}
    surv = {str(r["source"]): int(r["n_survivors"]) for r in surv_rows}
    srcs = sorted(tot)
    n_docs = np.array([tot[s] for s in srcs], dtype=np.int64)
    n_surv = np.array([surv.get(s, 0) for s in srcs], dtype=np.int64)
    removed = n_docs - n_surv
    return pa.table({
        "source": pa.array(srcs, type=pa.string()),
        "n_docs": pa.array(n_docs, type=pa.int64()),
        "n_survivors": pa.array(n_surv, type=pa.int64()),
        "n_removed": pa.array(removed, type=pa.int64()),
        "removed_permille": pa.array(1000 * removed // n_docs,
                                     type=pa.int64()),
    })


def cross_source_dup_matrix(sf_dir: str):
    """Which sources copy from which: for every exact-duplicate group
    (md5(text)) spanning >= 2 DISTINCT sources, one count per unordered
    source pair — the provenance matrix of a multi-source crawl.

    Layout: per-batch distinct (h, source) partials with the crc32
    coarse-part tag (a hash never spans parts); per part one lexsort
    dedups (h, source) globally and enumerates within-run source pairs
    with a run-offset loop bounded by the SOURCE cardinality (sources
    per hash <= n_sources, tiny) — sources within a run are sorted, so
    source_a < source_b by construction; <= n_sources^2 count partials
    per part reach the bounded final groupby."""
    import zlib

    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])

    def pairs_partial(b: pa.Table) -> pa.Table:
        b = _plant_xsrc_batch(b)
        hs = np.asarray([_md5(t) for t in b["text"].to_pylist()],
                        dtype=object)
        src = b["source"].to_numpy(zero_copy_only=False).astype(object)
        key = np.char.add(np.char.add(hs.astype(str), "|"),
                          src.astype(str))
        _, first = np.unique(key, return_index=True)
        part = np.asarray(
            [zlib.crc32(h.encode()) % N_DEDUP_PARTS
             for h in hs[first]],
            dtype=np.int64,
        )
        return pa.table({
            "h": pa.array(hs[first], type=pa.string()),
            "src": pa.array(src[first].tolist(), type=pa.string()),
            "part": pa.array(part),
        })

    empty = pa.table({
        "source_a": pa.array([], type=pa.string()),
        "source_b": pa.array([], type=pa.string()),
        "n": pa.array([], type=pa.int64()),
    })

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        hs = np.asarray(g["h"].to_pylist(), dtype=object)
        src = np.asarray(g["src"].to_pylist(), dtype=str)
        order = np.lexsort((src, hs))
        h_s, s_s = hs[order], src[order]
        # global distinct within the part (batches overlap)
        keep = np.r_[True, (h_s[1:] != h_s[:-1]) | (s_s[1:] != s_s[:-1])]
        h_s, s_s = h_s[keep], s_s[keep]
        if len(h_s) == 0:
            return empty
        new = np.r_[True, h_s[1:] != h_s[:-1]]
        run = np.cumsum(new) - 1
        run_len = np.bincount(run)
        max_len = int(run_len.max())
        pa_, pb_ = [], []
        for d in range(1, max_len):
            i = np.flatnonzero(run[:-d] == run[d:])
            if len(i):
                pa_.append(s_s[i])
                pb_.append(s_s[i + d])
        if not pa_:
            return empty
        sa = np.concatenate(pa_)
        sb = np.concatenate(pb_)
        pair = np.char.add(np.char.add(sa, "|"), sb)
        pu, counts = np.unique(pair, return_counts=True)
        split = np.char.partition(pu, "|")
        return pa.table({
            "source_a": pa.array(split[:, 0], type=pa.string()),
            "source_b": pa.array(split[:, 2], type=pa.string()),
            "n": pa.array(counts.astype(np.int64)),
        })

    rows = (
        ds.map_batches(pairs_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .take_all()  # bounded: <= n_sources^2 rows per part
    )
    counts: dict[tuple[str, str], int] = {}
    for r in rows:
        k = (str(r["source_a"]), str(r["source_b"]))
        counts[k] = counts.get(k, 0) + int(r["n"])
    keys = sorted(counts)
    return pa.table({
        "source_a": pa.array([k[0] for k in keys], type=pa.string()),
        "source_b": pa.array([k[1] for k in keys], type=pa.string()),
        "n_dup_groups": pa.array([counts[k] for k in keys],
                                 type=pa.int64()),
    })


# CDC (content-defined chunking) cross-doc duplicate detection — the
# chunk-level scale path the containment/ngram families document
# (FastCDC-flavored; public technique).  Boundaries are CONTENT-defined
# (a word starts a new chunk when md5(word) % CDC_GEAR_MOD == 0), so an
# insertion early in a doc shifts chunk starts only until the next
# boundary word — unlike fixed-width windows, duplicated passages
# re-align and hash identically.  G=8 on the fixture corpus: ~7 chunks
# per ~56-word doc, 322/316 cross-doc duplicate chunks at sf0.001/0.01
# (measured non-vacuous before wiring, the item-48 lesson).
CDC_GEAR_MOD = 8


def _cdc_chunks_batch(b: pa.Table):
    """Shared CDC chunker: (chunk md5 hexes, doc_id, chunk index,
    n_words) arrays for a documents batch — ONE definition consumed by
    cdc_chunk_dups AND doc_stitch_candidates so the boundary rule
    cannot drift between them (the band-generation lesson).  A word
    CLOSES its chunk when md5(word) % CDC_GEAR_MOD == 0 (little-endian
    contract: exclusive prefix count == the SQL 1-PRECEDING window);
    per-chunk md5 is inherent, everything around it vectorized."""
    import pyarrow.compute as pc

    from prlib_ray.stages.text_analysis import _flat_words

    words, doc_of, _ = _flat_words(b)
    ne = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
    w = words.to_numpy(zero_copy_only=False)[ne]
    d = doc_of[ne]
    z = np.zeros(0, dtype=np.int64)
    if not len(w):
        return [], z, z, z
    uniq, inv = np.unique(w, return_inverse=True)
    ub = np.fromiter(
        (
            int.from_bytes(
                hashlib.md5(u.encode()).digest()[:8], "little"
            ) % CDC_GEAR_MOD
            for u in uniq
        ),
        dtype=np.int64,
        count=len(uniq),
    )
    flag = ub[inv] == 0
    # exclusive prefix count of boundary words per doc: word j opens
    # chunk c = #flags among the doc's words strictly before j (the
    # global cumsum shift leaks across docs but the per-doc start
    # offset subtraction cancels it)
    starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
    cs = np.cumsum(np.r_[False, flag[:-1]].astype(np.int64))
    cid = cs - np.repeat(cs[starts], np.diff(np.r_[starts, len(d)]))
    new = np.r_[True, (d[1:] != d[:-1]) | (cid[1:] != cid[:-1])]
    cstart = np.flatnonzero(new)
    cend = np.r_[cstart[1:], len(d)]
    did = b["doc_id"].to_numpy().astype(np.int64)
    texts = [" ".join(w[s:e]) for s, e in zip(cstart, cend)]
    ch = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return (ch, did[d[cstart]], cid[cstart].astype(np.int64),
            (cend - cstart).astype(np.int64))


def cdc_chunk_dups(sf_dir: str):
    """Inventory of chunk texts appearing in >= 2 DISTINCT documents:
    (chunk_hash, n_docs, n_occ, min_doc, n_words), sorted by hash.

    Physical plan: one map_batches pass computes boundary flags with a
    single unique-word md5 gather (the little-endian bucket contract
    shared with QualityClassifier / dsir_select), chunk ids as a
    per-doc exclusive prefix sum, and emits (chunk md5, doc_id,
    n_words) rows pre-combined per batch; rows co-locate by
    crc32(hash) % N_DEDUP_PARTS (a hash lives in exactly ONE part, so
    per-part distinct-doc counting is globally exact) and one lexsort
    run-boundary fold per part filters to n_docs >= 2.  The per-chunk
    md5 is inherently per-string (like fingerprint_md5); everything
    around it is vectorized.  At 100 TB: rows are (16-byte hex, int64,
    int64) triples, one coarse shuffle, no caps."""
    import zlib

    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def chunks(b: pa.Table) -> pa.Table:
        ch, did, cid, nw = _cdc_chunks_batch(b)
        return pa.table({
            "ch": pa.array(ch, type=pa.string()),
            "doc_id": pa.array(did),
            "n_words": pa.array(nw),
            "part": pa.array(
                np.asarray([zlib.crc32(c.encode()) % N_DEDUP_PARTS
                            for c in ch], dtype=np.int64)),
        })

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({
                "chunk_hash": pa.array([], type=pa.string()),
                "n_docs": z, "n_occ": z, "min_doc": z, "n_words": z})
        ch = np.asarray(g["ch"].to_pylist(), dtype=object)
        doc = g["doc_id"].to_numpy().astype(np.int64)
        nw = g["n_words"].to_numpy().astype(np.int64)
        o = np.lexsort((doc, ch))
        ch, doc, nw = ch[o], doc[o], nw[o]
        new = np.r_[True, ch[1:] != ch[:-1]]
        gid = np.cumsum(new) - 1
        n_occ = np.bincount(gid).astype(np.int64)
        # distinct docs per hash: within a run, rows sorted by doc —
        # count doc changes
        dnew = new | np.r_[True, doc[1:] != doc[:-1]]
        n_docs = np.bincount(gid[dnew]).astype(np.int64)
        min_doc = doc[new]
        keep = n_docs >= 2
        return pa.table({
            "chunk_hash": pa.array(ch[new][keep], type=pa.string()),
            "n_docs": pa.array(n_docs[keep]),
            "n_occ": pa.array(n_occ[keep]),
            "min_doc": pa.array(min_doc[keep]),
            "n_words": pa.array(nw[new][keep]),
        })

    return (
        ds.map_batches(chunks, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("part").map_groups(fold, batch_format="pyarrow")
        .sort("chunk_hash")
    )


# Entity resolution: the classic three-stage record-linkage pipeline
# (Hernandez-Stolfo blocking -> distance verify -> transitive closure)
# composed END-TO-END from the registry's own disciplines — the
# composition a production linkage job actually runs, not a new kernel.
# Threshold measured before wiring: same-key SNM pairs on the fixture
# sit at near_permille 7-12, different-key at >= 617, so 100 separates
# cleanly (non-vacuous at every sf without planting).
ER_MATCH_PERMILLE = 100


def entity_resolution(sf_dir: str):
    """(doc_id, entity_id) for every document in at least one verified
    match: SNM candidates (sorted_neighborhood_pairs — exact global
    windowing, no global sort) -> exact Levenshtein verify with the
    integer 1000*dist//max(len) <= ER_MATCH_PERMILLE rule -> min-label
    propagation to fixpoint (_propagate_min_labels, the convergence-
    guarded CC machinery).  entity_id = component-minimum doc_id.

    The verify stage attaches texts to candidate pairs via two
    Dataset.joins (the _verify_pairs layout — the text side is
    corpus-sized, so it is NEVER broadcast), then runs the vectorized
    row-DP per pair; pair volume is O(N * SNM_WINDOW), linear."""
    import ray.data as rd

    cand = sorted_neighborhood_pairs(sf_dir)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    npart = _join_partitions()

    def rename(col):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({"doc_id": b["doc_id"], f"t_{col}": b["text"]})
        return f

    joined = _attach(
        _attach(
            cand, docs.map_batches(rename("a"), batch_format="pyarrow"),
            "doc_a", num_partitions=npart,
        ).repartition(npart),
        docs.map_batches(rename("b"), batch_format="pyarrow"),
        "doc_b", num_partitions=npart,
    )

    def verify(b: pa.Table) -> pa.Table:
        ta = b["t_a"].to_pylist()
        tb = b["t_b"].to_pylist()
        dist = np.empty(len(ta), dtype=np.int64)
        mx = np.empty(len(ta), dtype=np.int64)
        for k in range(len(ta)):  # per-pair DP, inherent (vectorized rows)
            dist[k] = _levenshtein(ta[k], tb[k])
            mx[k] = max(len(ta[k]), len(tb[k]))
        keep = (mx > 0) & (1000 * dist <= ER_MATCH_PERMILLE * mx)
        return pa.table({
            "doc_a": b["doc_a"].filter(pa.array(keep)),
            "doc_b": b["doc_b"].filter(pa.array(keep)),
        })

    matched = joined.map_batches(verify, batch_format="pyarrow")
    labels = _propagate_min_labels(matched)
    if isinstance(labels, pa.Table):  # no matches anywhere
        return pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "entity_id": pa.array([], type=pa.int64()),
        })
    return labels.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"],
                            "entity_id": b["label"]}),
        batch_format="pyarrow",
    ).sort("doc_id")


def doc_stitch_candidates(sf_dir: str):
    """Shard-boundary stitching candidates: (doc_tail, doc_head,
    chunk_hash) pairs where doc_tail's LAST CDC chunk equals doc_head's
    FIRST — the signature a crawl leaves when one logical page is split
    across two fetched records (tail of one == head of the next).
    Content-defined boundaries make the match insertion-tolerant for
    the same reason cdc_chunk_dups' are.

    Plan: the shared _cdc_chunks_batch chunker (one definition with the
    dup inventory — the rule cannot drift) emits per doc only its FIRST
    (cid == 0) and LAST chunk rows tagged by side — 2 tiny rows per doc
    regardless of length; rows co-locate by crc32(hash), and one
    lexsort run pass per part expands tail x head matches
    (grouped-arange, no pair loop).  Self-pairs drop (a one-chunk doc
    is its own head AND tail)."""
    import zlib

    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def ends(b: pa.Table) -> pa.Table:
        ch, did, cid, _ = _cdc_chunks_batch(b)
        if not len(ch):
            return pa.table({
                "ch": pa.array([], type=pa.string()),
                "doc_id": pa.array([], type=pa.int64()),
                "side": pa.array([], type=pa.int64()),
                "part": pa.array([], type=pa.int64()),
            })
        cha = np.asarray(ch, dtype=object)
        first = cid == 0
        # a doc's chunks are contiguous and cid increases: the last row
        # of each doc run is its last chunk
        last = np.r_[did[1:] != did[:-1], True]
        sel = np.concatenate([np.flatnonzero(first),
                              np.flatnonzero(last)])
        side = np.concatenate([
            np.zeros(int(first.sum()), dtype=np.int64),   # 0 = head
            np.ones(int(last.sum()), dtype=np.int64),     # 1 = tail
        ])
        chs = cha[sel]
        return pa.table({
            "ch": pa.array(list(chs), type=pa.string()),
            "doc_id": pa.array(did[sel]),
            "side": pa.array(side),
            "part": pa.array(
                np.asarray([zlib.crc32(c.encode()) % N_DEDUP_PARTS
                            for c in chs], dtype=np.int64)),
        })

    def match(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc_tail": z, "doc_head": z,
                             "chunk_hash": pa.array([], type=pa.string())})
        ch = np.asarray(g["ch"].to_pylist(), dtype=object)
        doc = g["doc_id"].to_numpy().astype(np.int64)
        side = g["side"].to_numpy().astype(np.int64)
        o = np.lexsort((doc, side, ch))
        ch, doc, side = ch[o], doc[o], side[o]
        new = np.r_[True, ch[1:] != ch[:-1]]
        starts = np.flatnonzero(new)
        lens = np.diff(np.r_[starts, len(ch)])
        # per hash run: heads (side 0) sort before tails (side 1)
        n_heads = np.add.reduceat((side == 0).astype(np.int64), starts)
        n_tails = lens - n_heads
        # expand tails x heads per run
        t_idx = np.flatnonzero(side == 1)
        tails = np.repeat(doc[t_idx], np.repeat(n_heads, n_tails))
        h_counts = np.repeat(n_heads, n_tails)
        h_base = np.repeat(starts, n_tails)
        # head index arithmetic: heads occupy [start, start+n_heads)
        total = int(h_counts.sum())
        if total == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc_tail": z, "doc_head": z,
                             "chunk_hash": pa.array([], type=pa.string())})
        off = np.cumsum(h_counts) - h_counts
        pos = np.arange(total) - np.repeat(off, h_counts)
        heads = doc[np.repeat(h_base, h_counts) + pos]
        chh = ch[np.repeat(h_base, h_counts)]
        keep = tails != heads
        return pa.table({
            "doc_tail": pa.array(tails[keep]),
            "doc_head": pa.array(heads[keep]),
            "chunk_hash": pa.array(chh[keep], type=pa.string()),
        })

    return (
        ds.map_batches(ends, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part").map_groups(match, batch_format="pyarrow")
        .sort(["doc_tail", "doc_head"])
    )


def ngram_novelty(sf_dir: str):
    """Per-document novelty: of the doc's DISTINCT 3-word shingles, how
    many appear in NO other document (corpus df == 1), as an exact
    permille — the curation signal separating genuinely novel text from
    recombinations of corpus boilerplate (complements dup_ngram_fraction,
    which is intra-doc).  Docs with no shingles stay in the output at
    permille 0 (a curation signal must rule on every doc).

    Plan: the shared _blobify_batch substrate explodes to (sid, doc)
    postings; df folds in sid-hash parts (a sid lives in ONE part —
    globally exact, the prefix_filter_join layout minus the prefix);
    per-doc novel counts fold back in doc-hash parts; the final
    permille attaches on a pruned doc_id scan so zero-shingle docs
    surface.  Three coarse int64 shuffles, no caps, no driver state."""
    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    blob = ds.map_batches(
        _blobify_batch, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def explode(b: pa.Table) -> pa.Table:
        return _pf_explode_batch(b, with_n=False)

    def df_fold(g: pa.Table) -> pa.Table:
        # postings are distinct (doc, sid) by blobify construction, so
        # run length per sid IS its document frequency
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc": z, "novel": z, "part2": z})
        sid = g["sid"].to_numpy().astype(np.int64)
        doc = g["doc"].to_numpy().astype(np.int64)
        o = np.argsort(sid, kind="stable")
        sid, doc = sid[o], doc[o]
        starts = np.flatnonzero(np.r_[True, sid[1:] != sid[:-1]])
        lens = np.diff(np.r_[starts, len(sid)])
        novel = np.repeat(lens == 1, lens)
        return pa.table({
            "doc": pa.array(doc),
            "novel": pa.array(novel.astype(np.int64)),
            "part2": pa.array((doc % N_PF_PARTS).astype(np.int64)),
        })

    def doc_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc_id": z, "n_shingles": z, "n_novel": z})
        doc = g["doc"].to_numpy().astype(np.int64)
        nv = g["novel"].to_numpy().astype(np.int64)
        o = np.argsort(doc, kind="stable")
        doc, nv = doc[o], nv[o]
        new = np.r_[True, doc[1:] != doc[:-1]]
        gid = np.cumsum(new) - 1
        tot = np.bincount(gid).astype(np.int64)
        won = int_bincount(gid, nv)
        return pa.table({"doc_id": pa.array(doc[new]),
                         "n_shingles": pa.array(tot),
                         "n_novel": pa.array(won)})

    counts = (
        blob.map_batches(explode, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby("part").map_groups(df_fold, batch_format="pyarrow")
        .groupby("part2").map_groups(doc_fold, batch_format="pyarrow")
    )

    npart = _join_partitions()
    all_docs = blob.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"]}),
        batch_format="pyarrow",
    )
    joined = all_docs.join(
        counts, "left_outer", num_partitions=npart, on=("doc_id",),
    )

    def finish(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy().astype(np.int64)
        ns = b["n_shingles"].to_numpy(zero_copy_only=False)
        nv = b["n_novel"].to_numpy(zero_copy_only=False)
        ns = np.where(np.isnan(ns.astype(np.float64)), 0, ns).astype(np.int64)
        nv = np.where(np.isnan(nv.astype(np.float64)), 0, nv).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(did),
            "n_shingles": pa.array(ns),
            "n_novel": pa.array(nv),
            "novelty_permille": pa.array(
                1000 * nv // np.maximum(ns, 1)),
        })

    return joined.map_batches(
        finish, batch_format="pyarrow"
    ).sort("doc_id")


def split_no_leakage(sf_dir: str):
    """Leakage-FREE train/val/test assignment: the split key is the
    near-dup CLUSTER label (minhash CC fixpoint), not the doc — every
    verified near-duplicate pair lands in the same split by
    construction, turning split_leakage's AUDIT into a guarantee.
    Singletons keep label = own doc_id.  The split rule is the shared
    relational.split_of contract applied to the label (one rule, it
    cannot drift from split_assign/split_leakage).

    Output (doc_id, label, split) for every document.  Plan: the
    convergence-guarded label propagation over verified pairs (tiny),
    then ONE left-outer Dataset.join onto the pruned doc scan —
    cluster labels never funnel through the driver."""
    import ray.data as rd
    from ray.data import from_arrow

    from prlib_ray.relational import split_of

    labels = dedup_clusters_minhash(sf_dir)
    if isinstance(labels, pa.Table):
        labels_ds = from_arrow(labels)
    else:
        labels_ds = labels
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    npart = _join_partitions()
    joined = docs.join(labels_ds, "left_outer", num_partitions=npart,
                       on=("doc_id",))

    def finish(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy().astype(np.int64)
        lab = b["label"].to_numpy(zero_copy_only=False)
        lab = np.where(np.isnan(lab.astype(np.float64)), did,
                       lab).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(did),
            "label": pa.array(lab),
            "split": pa.array(split_of(lab), type=pa.string()),
        })

    return joined.map_batches(finish, batch_format="pyarrow").sort("doc_id")


DEDUP_CURVE_TAUS = (50, 60, 70, 80, 90, 100)  # Jaccard thresholds, pct


def dedup_threshold_curve(sf_dir: str):
    """How aggressive would near-dup removal be at each threshold: the
    number of doc pairs with J >= tau for every tau in
    DEDUP_CURVE_TAUS — the knob-setting curve a curation run consults
    before committing to a threshold.  Built on prefix_filter_join's
    COMPLETE J >= 0.5 pair set, so every tau >= 50 is exact (an
    LSH-based curve would under-count by its miss rate).  Output
    (tau_pct, n_pairs), one bounded row per tau."""
    pairs = prefix_filter_join(sf_dir)
    tbl = pairs if isinstance(pairs, pa.Table) else None

    def fold(b: pa.Table) -> pa.Table:
        inter = b["inter"].to_numpy().astype(np.int64)
        uni = b["uni"].to_numpy().astype(np.int64)
        taus = np.asarray(DEDUP_CURVE_TAUS, dtype=np.int64)
        n = (100 * inter[None, :] >= taus[:, None] * uni[None, :]).sum(
            axis=1).astype(np.int64)
        return pa.table({"tau_pct": pa.array(taus), "n": pa.array(n)})

    if tbl is not None:
        part_iter = [fold(tbl)]
    else:
        part_iter = pairs.map_batches(
            fold, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow")
    acc = {int(t): 0 for t in DEDUP_CURVE_TAUS}
    for p in part_iter:  # bounded: len(taus) rows per batch
        for t, n in zip(p["tau_pct"].to_pylist(), p["n"].to_pylist()):
            acc[int(t)] += int(n)
    taus = sorted(acc)
    return pa.table({
        "tau_pct": pa.array(np.asarray(taus, dtype=np.int64)),
        "n_pairs": pa.array(np.asarray([acc[t] for t in taus],
                                       dtype=np.int64)),
    })
