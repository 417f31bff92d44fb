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


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def exact_dedup(sf_dir: str):
    """Exact dedup: md5(text) -> groupby(hash) -> min(doc_id) survives."""
    import ray.data as rd
    from ray.data.aggregate import Min

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def add_hash(b: pa.Table) -> pa.Table:
        hs = [_md5(t) for t in b["text"].to_pylist()]
        return pa.table(
            {"h": pa.array(hs, type=pa.string()), "doc_id": b["doc_id"]}
        )

    return (
        ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="doc_id"))
    )


def _shingles(text: str, k: int = 3) -> set[str]:
    words = [w for w in text.split(" ") if w != ""]
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


MAX_PAIR_ID = 300  # bounded id range for the exact all-pairs oracle query


def ngram_jaccard_pairs(sf_dir: str):
    """Exact n-gram Jaccard near-dup pairs over doc_id < MAX_PAIR_ID.

    Decision is pure integer arithmetic (5*inter >= union, union > 0 —
    i.e. Jaccard >= 0.2), so the DuckDB oracle matches bit-for-bit.
    All-pairs is the *baseline*; the scale path is minhash_lsh_dedup.
    """
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = ds.map_batches(
        lambda b: b.filter(pa.array(b["doc_id"].to_numpy() < MAX_PAIR_ID)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    rows = ds.take_all()  # bounded: < MAX_PAIR_ID rows by construction
    docs = sorted((r["doc_id"], _shingles(r["text"])) for r in rows)
    out_a, out_b, out_i, out_u = [], [], [], []
    for i in range(len(docs)):
        ida, sa = docs[i]
        for j in range(i + 1, len(docs)):
            idb, sb = docs[j]
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if union > 0 and 5 * inter >= union:
                out_a.append(ida)
                out_b.append(idb)
                out_i.append(inter)
                out_u.append(union)
    return pa.table(
        {
            "doc_a": pa.array(out_a, type=pa.int64()),
            "doc_b": pa.array(out_b, type=pa.int64()),
            "inter": pa.array(out_i, type=pa.int64()),
            "uni": pa.array(out_u, type=pa.int64()),
        }
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


def _minhash(sids: np.ndarray) -> np.ndarray:
    """64 permutation minima via (a*x+b) mod 2^61-1 (object-int math to
    avoid overflow; N_HASH x |shingles| kept small per call)."""
    if len(sids) == 0:
        return np.full(N_HASH, MERSENNE, dtype=np.int64)
    x = sids.astype(object)[None, :]
    a = _A.astype(object)[:, None]
    b = _B.astype(object)[:, None]
    vals = (a * x + b) % MERSENNE
    return np.array(vals.min(axis=1).tolist(), dtype=np.int64)


def minhash_lsh_dedup(sf_dir: str, *, jaccard_threshold: float = 0.5):
    """MinHash+LSH near-dup detection, the web-scale layout:

    1. map_batches: per doc -> 64 minhashes -> 16 band signatures ->
       explode to (band, sig, doc_id) rows
    2. groupby(band, sig): buckets with >1 doc emit candidate pairs
    3. exact-Jaccard verification of the (small) candidate set
    Returns verified pairs (doc_a, doc_b) with integer (inter, uni).
    """
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_bands(b: pa.Table) -> pa.Table:
        ids, bands, sigs = [], [], []
        for did, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            mh = _minhash(_shingle_ids(t))
            rows = N_HASH // N_BANDS
            for band in range(N_BANDS):
                seg = mh[band * rows : (band + 1) * rows]
                sig = hashlib.md5(seg.tobytes()).hexdigest()
                ids.append(did)
                bands.append(band)
                sigs.append(sig)
        return pa.table(
            {
                "band": pa.array(bands, type=pa.int32()),
                "sig": pa.array(sigs, type=pa.string()),
                "doc_id": pa.array(ids, type=pa.int64()),
            }
        )

    bands = ds.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(g):
        import pandas as pd

        ids = sorted(g["doc_id"].tolist())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"doc_a": a, "doc_b": b})

    cand = (
        bands.groupby(["band", "sig"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    cand = cand.drop_duplicates().astype(np.int64) if len(cand) else cand
    if len(cand) == 0:
        return pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "inter": pa.array([], type=pa.int64()),
                "uni": pa.array([], type=pa.int64()),
            }
        )
    # verify: gather only candidate docs (small set) and compute exact Jaccard
    need = set(cand["doc_a"]) | set(cand["doc_b"])
    docs = ds.map_batches(
        lambda b: b.filter(
            pa.array(np.isin(b["doc_id"].to_numpy(), np.fromiter(need, dtype=np.int64)))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    sh = {r["doc_id"]: _shingles(r["text"]) for r in docs}
    thr_num = int(jaccard_threshold * 100)
    out_a, out_b, out_i, out_u = [], [], [], []
    for da, db in sorted(zip(cand["doc_a"], cand["doc_b"])):
        sa, sb = sh[da], sh[db]
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        if union > 0 and 100 * inter >= thr_num * union:
            out_a.append(int(da))
            out_b.append(int(db))
            out_i.append(inter)
            out_u.append(union)
    return pa.table(
        {
            "doc_a": pa.array(out_a, type=pa.int64()),
            "doc_b": pa.array(out_b, type=pa.int64()),
            "inter": pa.array(out_i, type=pa.int64()),
            "uni": pa.array(out_u, type=pa.int64()),
        }
    )


def simhash_hamming_dedup(sf_dir: str, *, max_hamming: int = 8):
    """SimHash near-dup pairs: 4x16-bit band buckets (a pair within
    hamming distance <= 16/band-count must collide on some band for
    moderate distances) -> candidate pairs -> exact hamming verification.

    Probabilistic candidate generation (banding misses pairs whose
    differing bits spread across all 4 bands) -> rows-only check;
    pytest pins determinism and the verification predicate."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sigs = ds.map_batches(
        simhash_batch, batch_format="pyarrow", zero_copy_batch=True
    )

    def to_bands(b: pa.Table) -> pa.Table:
        h = b["simhash"].to_numpy().astype(np.int64)
        u = h.view(np.uint64) if h.dtype == np.int64 else h
        ids, bands, keys = [], [], []
        for did, v in zip(b["doc_id"].to_pylist(), u.tolist()):
            v &= (1 << 64) - 1
            for band in range(4):
                ids.append(did)
                bands.append(band)
                keys.append((v >> (band * 16)) & 0xFFFF)
        return pa.table(
            {
                "band": pa.array(bands, type=pa.int32()),
                "key": pa.array(keys, type=pa.int32()),
                "doc_id": pa.array(ids, type=pa.int64()),
            }
        )

    bands = sigs.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(g):
        import pandas as pd

        ids = sorted(set(g["doc_id"].tolist()))
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"doc_a": a, "doc_b": b})

    cand = (
        bands.groupby(["band", "key"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(cand) == 0:
        return pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "hamming": pa.array([], type=pa.int64()),
            }
        )
    cand = cand.drop_duplicates().astype(np.int64)
    need = sorted(set(cand["doc_a"]) | set(cand["doc_b"]))
    sig_rows = sigs.map_batches(
        lambda b: b.filter(
            pa.array(np.isin(b["doc_id"].to_numpy(), np.asarray(need)))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    sig_of = {r["doc_id"]: int(r["simhash"]) & ((1 << 64) - 1) for r in sig_rows}
    out_a, out_b, out_h = [], [], []
    for da, db in sorted(zip(cand["doc_a"], cand["doc_b"])):
        ham = bin(sig_of[int(da)] ^ sig_of[int(db)]).count("1")
        if ham <= max_hamming:
            out_a.append(int(da))
            out_b.append(int(db))
            out_h.append(ham)
    return pa.table(
        {
            "doc_a": pa.array(out_a, type=pa.int64()),
            "doc_b": pa.array(out_b, type=pa.int64()),
            "hamming": pa.array(out_h, type=pa.int64()),
        }
    )


# --- SimHash -----------------------------------------------------------------

def simhash_batch(batch: pa.Table) -> pa.Table:
    """64-bit SimHash over distinct-word md5 hashes (stable across workers).

    Emitted as int64 (bit 63 wraps negative) plus the 16-hex string for
    readability; pytest pins golden values — no SQL oracle (bit twiddling
    is impractical to mirror in SQL).
    """
    texts = batch["text"].to_pylist()
    out = []
    for t in texts:
        words = {w for w in t.split(" ") if w != ""}
        acc = np.zeros(64, dtype=np.int64)
        for w in sorted(words):
            h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
            for bit in range(64):
                acc[bit] += 1 if (h >> bit) & 1 else -1
        val = 0
        for bit in range(64):
            if acc[bit] > 0:
                val |= 1 << bit
        out.append(val - (1 << 64) if val >= (1 << 63) else val)  # plain ints
    arr = np.array(out, dtype=np.int64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "simhash": pa.array(arr),
            "simhash_hex": pa.array(
                [format(v & ((1 << 64) - 1), "016x") for v in out], type=pa.string()
            ),
        }
    )
