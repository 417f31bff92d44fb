"""Similarity search over the embeddings table (list<float> column).

* ``ann_neighbor_counts`` — per-vector count of near neighbors by
  *quantized-integer cosine*: q = floor(v*1000+0.5) per element; the
  decision cos >= t becomes  dot > 0  AND  dot^2 * 10000 >= t2 * |qa|^2 *
  |qb|^2  in exact (arbitrary-precision) integer arithmetic, so a DuckDB
  oracle matches bit-for-bit.  Bounded id range: the all-pairs form is
  the *baseline*; the LSH-bucketed form is the scale path.
* ``ann_bruteforce_topk`` — exact-integer cosine top-k per query vector
  against a broadcast query matrix (numpy int matmul per batch) — the
  production baseline.  The rank key is score = floor(sign(dot) * dot^2
  * 10^4 / (|q|^2 * |x|^2)) over the same x1000 quantization (monotone
  in cosine, ties broken by vec_id), all int64-exact, so a DuckDB
  oracle matches bit-for-bit.
* ``ann_lsh_topk`` — random-hyperplane LSH buckets -> top-k within
  bucket; the scale path for 10^9+ vectors.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from prlib_ray.blocks import note_bounded_input

MAX_ANN_ID = 300
COS_T2 = 6400  # cos >= 0.8  ->  t^2 * 10000 = 6400

# Planted near-duplicates: the sf fixtures are read-only and contain NO
# >=0.95-cosine pair (max pairwise cosine ~0.51), which made the
# dedup_embedding driver rows vacuously green (0 == 0 rows).  Both dedup
# queries therefore AUGMENT their input deterministically: each vector
# with vec_id < N_PLANT is duplicated at vec_id + PLANT_OFFSET with an
# identical embedding (quantized cosine exactly 1.0), and the DuckDB
# oracle mirrors the augmentation with a UNION ALL — the pair path now
# does real, oracle-checked work at every scale.
N_PLANT = 10
PLANT_OFFSET = 1_000_000


def _quantize(vecs: list[list[float]]) -> list[np.ndarray]:
    return [np.floor(np.asarray(v, dtype=np.float64) * 1000.0 + 0.5).astype(np.int64)
            for v in vecs]


def _low_id_seed_matrix(ds, n: int):
    """(quantized seed matrix, seed vec_ids) for the ``vec_id < n``
    rows of an embeddings Dataset — the shared deterministic-seed fetch
    (dedup_semantic / pq_codes / cluster_balance all use the same
    contract; one definition so it cannot drift).  A bounded
    dimension take: <= n rows reach the driver."""
    seeds = ds.map_batches(
        lambda b: b.filter(pa.array(b["vec_id"].to_numpy() < n)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    seeds.sort(key=lambda r: r["vec_id"])
    S = np.stack(_quantize([list(r["embedding"]) for r in seeds]))
    ids = np.array([r["vec_id"] for r in seeds], dtype=np.int64)
    return S, ids


def _plant_dup_batch(b: pa.Table) -> pa.Table:
    """Append the planted duplicates for this batch's low-id vectors."""
    ids = b["vec_id"].to_numpy().astype(np.int64)
    m = ids < N_PLANT
    if not m.any():
        return b
    dup = b.filter(pa.array(m))
    dup = dup.set_column(
        dup.schema.get_field_index("vec_id"),
        "vec_id",
        pa.array(dup["vec_id"].to_numpy().astype(np.int64) + PLANT_OFFSET,
                 type=pa.int64()),
    )
    if b.schema.field("vec_id").type != pa.int64():
        b = b.set_column(
            b.schema.get_field_index("vec_id"), "vec_id",
            pa.array(ids, type=pa.int64()),
        )
    return pa.concat_tables([b, dup])


def _mul_u64(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Full 128-bit product of two uint64 arrays as (hi, lo) limbs —
    standard 32-bit limb decomposition, no intermediate overflow."""
    mask = np.uint64(0xFFFFFFFF)
    s32 = np.uint64(32)
    a_hi, a_lo = a >> s32, a & mask
    b_hi, b_lo = b >> s32, b & mask
    ll = a_lo * b_lo
    cross = a_lo * b_hi + (ll >> s32)          # < 2^64
    cross2 = a_hi * b_lo + (cross & mask)      # < 2^64
    lo = (cross2 << s32) | (ll & mask)
    hi = a_hi * b_hi + (cross >> s32) + (cross2 >> s32)
    return hi, lo


def _exact_cos_mask(dot: np.ndarray, na: np.ndarray, nb: np.ndarray,
                    t2: int) -> np.ndarray:
    """Vectorized EXACT decision  dot > 0  AND  dot^2 * 10^4 >= t2*na*nb
    in two-limb uint64 arithmetic (the products exceed int64; the old
    path did one Python big-int compare per candidate).

    Validity envelope: dot, na, nb < 2^54/100 and na*nb*t2 < 2^128 —
    satisfied for quantized embeddings up to ~10^5 dims.  Byte-identical
    to the arbitrary-precision formula (property-tested)."""
    dot = dot.astype(np.int64)
    pos = dot > 0
    d100 = (np.where(pos, dot, 0) * 100).astype(np.uint64)
    lhs_hi, lhs_lo = _mul_u64(d100, d100)      # (100*dot)^2 == dot^2 * 10^4
    m_hi, m_lo = _mul_u64(na.astype(np.uint64), nb.astype(np.uint64))
    t2u = np.uint64(t2)
    # (m_hi, m_lo) * t2  with t2 < 2^32: per-limb small multiply + carry
    lo2_hi, lo2_lo = _mul_u64(m_lo, np.full_like(m_lo, t2u))
    rhs_lo = lo2_lo
    rhs_hi = m_hi * t2u + lo2_hi
    ge = (lhs_hi > rhs_hi) | ((lhs_hi == rhs_hi) & (lhs_lo >= rhs_lo))
    return pos & ge


def ann_neighbor_counts(sf_dir: str):
    """Count, per vector (id < MAX_ANN_ID), the other vectors in range with
    quantized cosine >= 0.8.  Exact integer decision, oracle-backed."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    note_bounded_input("ann_neighbor_counts", ds.count(), "MAX_ANN_ID", MAX_ANN_ID)
    ds = ds.map_batches(
        lambda b: b.filter(pa.array(b["vec_id"].to_numpy() < MAX_ANN_ID)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    rows = ds.take_all()
    rows.sort(key=lambda r: r["vec_id"])
    ids = [int(r["vec_id"]) for r in rows]
    qs = _quantize([list(r["embedding"]) for r in rows])
    norms = [int(q @ q) for q in qs]
    n = len(ids)
    counts = [0] * n
    for i in range(n):
        for j in range(i + 1, n):
            dot = int(qs[i] @ qs[j])
            if dot > 0 and dot * dot * 10000 >= COS_T2 * norms[i] * norms[j]:
                counts[i] += 1
                counts[j] += 1
    return pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "n_neighbors": pa.array(counts, type=pa.int64()),
        }
    )


def embedding_near_dup_pairs(sf_dir: str, *, t2: int = 9025):
    """Embedding near-duplicate pairs: quantized cosine >= 0.95 (t2/10000)
    over vec_id < MAX_ANN_ID, AUGMENTED with the planted duplicates
    (see _plant_dup_batch) — exact hugeint decision, oracle-backed with
    a matching UNION ALL in the SQL."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    note_bounded_input("dedup_embedding", ds.count(), "MAX_ANN_ID", MAX_ANN_ID)
    ds = ds.map_batches(
        lambda b: _plant_dup_batch(
            b.filter(pa.array(b["vec_id"].to_numpy() < MAX_ANN_ID))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    rows = ds.take_all()
    rows.sort(key=lambda r: r["vec_id"])
    ids = [int(r["vec_id"]) for r in rows]
    qs = _quantize([list(r["embedding"]) for r in rows])
    norms = [int(q @ q) for q in qs]
    out_a, out_b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            dot = int(qs[i] @ qs[j])
            if dot > 0 and dot * dot * 10000 >= t2 * norms[i] * norms[j]:
                out_a.append(ids[i])
                out_b.append(ids[j])
    return pa.table(
        {
            "vec_a": pa.array(out_a, type=pa.int64()),
            "vec_b": pa.array(out_b, type=pa.int64()),
        }
    )


def embedding_centroids(sf_dir: str):
    """Grouped VECTOR aggregate: per label, the element-wise sum of the
    quantized embeddings + member count (centroid = sum_q/n downstream).

    Partial+final combiner over a list<float> column: each batch
    reduces to one (label x dim) integer matrix (numpy add.at), the
    final groupby moves only ~labels x dim tiny rows.  Quantized-int
    sums are exact in any order -> DuckDB oracle matches bit-for-bit."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    def partial(b: pa.Table) -> pa.Table:
        labels = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(labels) == 0:
            return pa.table({
                "label": pa.array([], type=pa.int64()),
                "pos": pa.array([], type=pa.int64()),
                "sum_q": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
            })
        mat = np.asarray(b["embedding"].to_pylist(), dtype=np.float64)
        q = np.floor(mat * 1000.0 + 0.5).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        dim = q.shape[1]
        sums = np.zeros((len(uniq), dim), dtype=np.int64)
        np.add.at(sums, inv, q)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, dim)),
                "pos": pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64),
                                        len(uniq))),
                "sum_q": pa.array(sums.reshape(-1)),
                "n": pa.array(np.repeat(counts, dim)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["label", "pos"])
        .aggregate(
            Sum("sum_q", alias_name="sum_q"),
            Sum("n", alias_name="n_vecs"),
        )
    )


def embedding_near_dup_lsh(sf_dir: str, *, t2: int = 9025,
                           n_bands: int = 6, planes_per_band: int = 8):
    """Embedding near-dup pairs, the SCALE path of ``dedup_embedding``:
    BANDED hyperplane LSH (n_bands independent plane sets; a pair is a
    candidate if it collides in ANY band — at cos >= 0.95 the per-band
    collision odds are ~0.43, so 6 bands catch ~96%) generates
    candidates with the shared hot-bucket guard; the quantized integer
    vectors hash-join back onto the pairs; the exact hugeint cosine
    decision (dot^2 * 10000 >= t2 * |a|^2 * |b|^2) verifies each
    candidate — the same fully-distributed layout as MinHash dedup.

    Probabilistic candidate generation -> rows-only; pytest pins that
    every emitted pair is in the exact all-pairs baseline and measures
    recall."""
    import ray.data as rd

    from prlib_ray.stages.dedup import _join_partitions, _pairs_from_buckets

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(_plant_dup_batch, batch_format="pyarrow",
                  zero_copy_batch=True)

    def blobify(b: pa.Table) -> pa.Table:
        vecs = b["embedding"].to_pylist()
        qs = _quantize(vecs)
        return pa.table(
            {
                "doc_id": b["vec_id"],  # shared pair machinery keys on doc_id
                "qb": pa.array([q.tobytes() for q in qs],
                               type=pa.large_binary()),
                "nq": pa.array([int(q @ q) for q in qs], type=pa.int64()),
            }
        )

    blob = emb.map_batches(
        blobify, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    total_planes = n_bands * planes_per_band

    def sig(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"band": pa.array([], type=pa.int32()),
                             "bucket": pa.array([], type=pa.int64()),
                             "doc_id": pa.array([], type=pa.int64())})
        mat = np.stack([
            np.frombuffer(x, dtype=np.int64) for x in b["qb"].to_pylist()
        ])
        n = len(mat)
        bands_col = np.repeat(
            np.arange(n_bands, dtype=np.int32)[None, :], n, axis=0
        ).reshape(-1)
        buckets = _band_buckets(mat, n_bands, planes_per_band)
        return pa.table(
            {
                "band": pa.array(bands_col),
                "bucket": pa.array(buckets.reshape(-1)),
                "doc_id": pa.array(
                    np.repeat(
                        b["doc_id"].to_numpy().astype(np.int64), n_bands
                    )
                ),
            }
        )

    bands = blob.map_batches(sig, batch_format="pyarrow", zero_copy_batch=True)
    cand = _pairs_from_buckets(bands, ["band", "bucket"])
    if cand.count() == 0:
        return pa.table({"vec_a": pa.array([], type=pa.int64()),
                         "vec_b": pa.array([], type=pa.int64())})

    def rename(b: pa.Table, col: str) -> pa.Table:
        return pa.table({"doc_id": b["doc_id"], f"qb_{col}": b["qb"],
                         f"nq_{col}": b["nq"]})

    npart = _join_partitions()
    joined = cand.join(
        blob.map_batches(lambda b: rename(b, "a"), batch_format="pyarrow"),
        "inner", num_partitions=npart, on=("doc_a",), right_on=("doc_id",),
    ).repartition(npart).join(  # coalesce empty partitions between joins
        blob.map_batches(lambda b: rename(b, "b"), batch_format="pyarrow"),
        "inner", num_partitions=npart, on=("doc_b",), right_on=("doc_id",),
    )

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"vec_a": pa.array([], type=pa.int64()),
                             "vec_b": pa.array([], type=pa.int64())})
        qa = b["qb_a"].to_pylist()
        qb_ = b["qb_b"].to_pylist()
        # all vectors share one dim: stack both sides into matrices and
        # take row dots in one vectorized pass; the (dot^2*10^4 >=
        # t2*na*nb) decision runs in exact two-limb uint64 arithmetic
        # (_exact_cos_mask) — no Python big-int loop per candidate
        va = np.frombuffer(b"".join(qa), dtype=np.int64).reshape(b.num_rows, -1)
        vb = np.frombuffer(b"".join(qb_), dtype=np.int64).reshape(b.num_rows, -1)
        dot = np.einsum("ij,ij->i", va, vb)
        keep = _exact_cos_mask(
            dot,
            b["nq_a"].to_numpy().astype(np.int64),
            b["nq_b"].to_numpy().astype(np.int64),
            t2,
        )
        k = pa.array(keep)
        return pa.table({"vec_a": b["doc_a"].filter(k),
                         "vec_b": b["doc_b"].filter(k)})

    verified = joined.map_batches(verify, batch_format="pyarrow").materialize()
    if verified.count() == 0:
        # keep the output schema stable for empty results (an empty
        # Dataset's pandas conversion loses column names)
        return pa.table({"vec_a": pa.array([], type=pa.int64()),
                         "vec_b": pa.array([], type=pa.int64())})
    return verified.sort(["vec_a", "vec_b"])


# SemDedup seed count: cluster count scales with the corpus in
# production (k ~ n / target_cluster_size keeps per-cluster pairwise
# work constant); 8 deterministic seeds keep the bounded oracle baseline
# SQL-expressible.
N_SEM_SEEDS = 8


def dedup_semantic(sf_dir: str, *, t2: int = 9025):
    """SemDedup (Abbas et al. 2023 shape): assign every vector to its
    max-dot centroid, then mark within-cluster near-duplicates — only
    same-cluster pairs are ever compared, which is the whole point of
    the method at scale (pairwise work is per-cluster, not corpus²).

    Centroids here are the N_SEM_SEEDS lowest-id vectors (deterministic,
    so the DuckDB oracle can recompute the assignment); assignment is a
    broadcast int64 matmul per batch with argmax ties to the smallest
    centroid id; the within-cluster survivor pass reuses the exact
    two-limb hugeint cosine decision (_exact_cos_mask).  Bounded input
    (vec_id < MAX_ANN_ID, plus the planted duplicates) keeps the
    all-pairs SQL mirror tractable — the oracle-backed BASELINE of the
    family whose scale paths are dedup_embedding_lsh / ann_ivf_topk.
    Output: (vec_id, cluster, keep) with keep=0 iff a lower-id
    same-cluster vector has quantized cosine >= sqrt(t2/10000)."""
    import pandas as pd
    import ray
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    S, _ = _low_id_seed_matrix(ds, N_SEM_SEEDS)
    ref = ray.put(S)

    note_bounded_input("dedup_semantic", ds.count(), "MAX_ANN_ID", MAX_ANN_ID)
    bounded = ds.map_batches(
        lambda b: _plant_dup_batch(
            b.filter(pa.array(b["vec_id"].to_numpy() < MAX_ANN_ID))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def assign(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], type=pa.int64()),
                 "cluster": pa.array([], type=pa.int64()),
                 "q": pa.array([], type=pa.list_(pa.int64()))}
            )
        S = ray.get(ref)
        Q = np.stack(_quantize(b["embedding"].to_pylist()))
        dots = Q @ S.T
        # argmax keeps the FIRST maximal column -> smallest centroid id
        # wins ties (the oracle's ORDER BY dot DESC, cid ASC)
        cid = np.argmax(dots, axis=1).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(
                    b["vec_id"].to_numpy().astype(np.int64)
                ),
                "cluster": pa.array(cid),
                # ship the already-quantized ints through the shuffle,
                # not the raw floats (no second _quantize pass)
                "q": pa.array(list(Q), type=pa.list_(pa.int64())),
            }
        )

    def per_cluster(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"vec_id": z, "cluster": z, "keep": z})
        ids = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        V = np.asarray(g["q"].to_pylist(), dtype=np.int64)[order]
        D = V @ V.T
        n2 = np.einsum("ij,ij->i", V, V)
        iu, ju = np.triu_indices(len(ids), k=1)
        mask = _exact_cos_mask(D[iu, ju], n2[iu], n2[ju], t2)
        keep = np.ones(len(ids), dtype=np.int64)
        keep[np.unique(ju[mask])] = 0  # a lower-id near-dup exists
        cl = g["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "cluster": pa.array(cl[order]),
                "keep": pa.array(keep),
            }
        )

    # cluster-key cardinality is BOUNDED (N_SEM_SEEDS), so the native
    # groupby is fine here — the per-key cost lesson applies to
    # corpus-scaled keys only
    return (
        bounded.map_batches(assign, batch_format="pyarrow",
                            zero_copy_batch=True)
        .groupby("cluster")
        .map_groups(per_cluster, batch_format="pyarrow")
    )


# Product quantization (Jégou et al. 2011 shape): the vector-compression
# layer a 10^9-vector ANN index stores instead of raw floats.  dim-64
# vectors split into N_PQ_SUB subspaces; each subvector is replaced by
# the id of its nearest codeword.  Codebooks are the quantized
# subvectors of the N_PQ_CODES lowest-id vectors (deterministic, so the
# DuckDB oracle recomputes them); production would k-means-train them
# like ann_ivf_topk's centroids.
N_PQ_SUB = 8
N_PQ_CODES = 16


def pq_codes(sf_dir: str):
    """Per (vector, subspace): the nearest codeword id and the exact
    integer squared L2 distance to it (the reconstruction-error term).
    Ties break to the smallest code on both sides (np.argmin first-min
    == SQL row_number dist ASC, code ASC).

    Broadcast codebook tensor + one batched integer einsum per batch —
    embarrassingly parallel, no shuffle; 8 small int rows per vector
    replace 64 floats (the 32x compression PQ exists for)."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    full, seed_ids = _low_id_seed_matrix(ds, N_PQ_CODES)
    dim = full.shape[1]
    sub_dim = dim // N_PQ_SUB
    # Codes are the seeds' VEC_IDS (the oracle's `vec_id AS code`), not
    # positions — with a short corpus or gaps below N_PQ_CODES the two
    # numberings differ.  Positions are vec_id-sorted, so the argmin's
    # first-min tie-break still picks the smallest code.
    n_codes = len(seed_ids)  # short-corpus guard: fewer rows than N_PQ_CODES
    # (sub, code, sub_dim)
    cb = full.reshape(n_codes, N_PQ_SUB, sub_dim).transpose(1, 0, 2)
    ref = ray.put((cb, seed_ids))

    def assign(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if b.num_rows == 0:
            return pa.table({"vec_id": z, "sub": z, "code": z, "dist": z})
        cb, seed_ids = ray.get(ref)
        Q = np.stack(_quantize(b["embedding"].to_pylist()))
        n = Q.shape[0]
        Qs = Q.reshape(n, N_PQ_SUB, sub_dim)
        # (n, sub, code): exact int squared L2 per candidate codeword
        diff = Qs[:, :, None, :] - cb[None, :, :, :]
        d2 = np.einsum("nskd,nskd->nsk", diff, diff)
        pos = np.argmin(d2, axis=2).astype(np.int64)  # first min = smallest id
        code = seed_ids[pos]
        dist = np.take_along_axis(d2, pos[:, :, None], axis=2)[:, :, 0]
        ids = b["vec_id"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, N_PQ_SUB)),
                "sub": pa.array(
                    np.tile(np.arange(N_PQ_SUB, dtype=np.int64), n)
                ),
                "code": pa.array(code.reshape(-1)),
                "dist": pa.array(dist.reshape(-1).astype(np.int64)),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)


# ADC query-path parameters: trained codebooks (PQ is useless untrained
# on isotropic data — measured recall@5 0.16 with seed codebooks vs
# 0.90 with trained ones + re-rank), bounded training sample, and an
# exact re-rank over the ADC shortlist (the standard IVFADC+re-rank
# production layout).
N_ADC_CODES = 64
ADC_TRAIN_N = 512
ADC_SHORTLIST = 50


PQ_ITERS = 8


def _train_pq_codebooks(train: np.ndarray, n_codes: int,
                        iters: int = PQ_ITERS) -> np.ndarray:
    """Deterministic per-subspace INTEGER Lloyd k-means: init = the
    first n_codes subvectors in vec_id order; assignment by exact
    integer squared L2 (argmin ties -> smallest code); re-centering at
    the per-dimension FLOOR-mean of members (numpy floor_divide ==
    SQL's mod-trick floor division); empty clusters keep their previous
    centroid.  Centroids stay int64 through EVERY iteration, so the
    whole training loop mirrors in DuckDB as unrolled CTEs (the
    ann_ivf_topk convention).  Returns (N_PQ_SUB, n_codes, sub_dim)."""
    dim = train.shape[1]
    sub_dim = dim // N_PQ_SUB
    n_codes = min(n_codes, len(train))  # tiny-corpus guard
    out = np.empty((N_PQ_SUB, n_codes, sub_dim), dtype=np.int64)
    for s in range(N_PQ_SUB):
        sub = train[:, s * sub_dim:(s + 1) * sub_dim]
        C = sub[:n_codes].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(2)
            a = np.argmin(d2, axis=1)
            new = C.copy()
            for c in range(n_codes):
                m = a == c
                if m.any():
                    new[c] = np.floor_divide(sub[m].sum(axis=0), m.sum())
            C = new
        out[s] = C
    return out


def ann_pq_adc_topk(sf_dir: str, *, k: int = 5, n_queries: int = 10,
                    shortlist: int = ADC_SHORTLIST):
    """PQ asymmetric-distance top-k with exact re-rank (the query path
    a 10^9-vector compressed index runs): per query, a (subspace x
    codeword) integer L2 lookup table prices every vector with
    N_PQ_SUB table gathers; the global ADC shortlist (top
    ``shortlist`` by approx distance, deterministic under any
    batching) is then re-ranked by the EXACT quantized L2 — measured
    recall@5 0.90 while exact distances run on only ~10% of the
    corpus.

    Codebooks are integer-Lloyd-trained on the ADC_TRAIN_N lowest-id
    vectors (a bounded sample take, ann_ivf_topk's training
    convention).  Training, assignment, ADC pricing and re-rank are
    all exact integer arithmetic, so the FULL query path mirrors in
    SQL — oracle-backed bit-for-bit (oracles_data.ANN_PQ_ADC, the
    unrolled-iteration CTE chain); recall additionally pinned in
    pytest.  Codes are recomputed per batch because the fixture stores
    raw vectors; a production index scans a written pq_codes table.
    Ranking: exact d2 ASC, vec_id ASC; self excluded."""
    import ray
    import ray.data as rd

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    low = sorted(
        emb.map_batches(
            lambda b: b.filter(pa.array(
                b["vec_id"].to_numpy() < max(ADC_TRAIN_N, n_queries)
            )),
            batch_format="pyarrow", zero_copy_batch=True,
        ).take_all(),
        key=lambda r: r["vec_id"],
    )
    full = np.stack(_quantize([list(r["embedding"]) for r in low]))
    dim = full.shape[1]
    sub_dim = dim // N_PQ_SUB
    cb = _train_pq_codebooks(full, N_ADC_CODES)
    n_queries = min(n_queries, len(low))  # short-corpus guard
    qids = np.array([r["vec_id"] for r in low[:n_queries]], dtype=np.int64)
    qs = full[:n_queries]
    qsub = qs.reshape(n_queries, N_PQ_SUB, sub_dim)
    qdiff = qsub[:, :, None, :] - cb[None, :, :, :]
    lut = np.einsum("qskd,qskd->qsk", qdiff, qdiff)  # (q, sub, code)
    ref = ray.put((qids, qs, lut, cb))

    def local_topk(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if b.num_rows == 0:
            return pa.table({"query_id": z, "vec_id": z,
                             "adc_dist": z, "d2": z})
        ids_q, qs, lut, cb = ray.get(ref)
        vids = b["vec_id"].to_numpy().astype(np.int64)
        Q = np.stack(_quantize(b["embedding"].to_pylist()))
        n = Q.shape[0]
        Qs = Q.reshape(n, N_PQ_SUB, sub_dim)
        diff = Qs[:, :, None, :] - cb[None, :, :, :]
        d2c = np.einsum("nskd,nskd->nsk", diff, diff)
        codes = np.argmin(d2c, axis=2)  # (n, sub)
        approx = lut[:, np.arange(N_PQ_SUB)[None, :], codes].sum(axis=2)
        out_q, out_v, out_a, out_d = [], [], [], []
        for qi in range(len(ids_q)):
            mask = vids != ids_q[qi]
            d = approx[qi][mask]
            order = np.lexsort((vids[mask], d))[:shortlist]
            sel = np.flatnonzero(mask)[order]
            # exact quantized L2, but only for the local shortlist
            ex = ((Q[sel] - qs[qi][None, :]) ** 2).sum(1)
            out_q.extend([int(ids_q[qi])] * len(sel))
            out_v.extend(vids[sel].tolist())
            out_a.extend(d[order].astype(np.int64).tolist())
            out_d.extend(ex.astype(np.int64).tolist())
        return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                         "vec_id": pa.array(out_v, type=pa.int64()),
                         "adc_dist": pa.array(out_a, type=pa.int64()),
                         "d2": pa.array(out_d, type=pa.int64())})

    local = emb.map_batches(local_topk, batch_format="pyarrow",
                            zero_copy_batch=True)

    def merge(g: pa.Table) -> pa.Table:
        # global ADC shortlist first (deterministic: a global order
        # statistic — the global top-R is always inside the union of
        # per-batch top-Rs), exact re-rank second
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"query_id": z, "vec_id": z, "d2": z})
        a = g["adc_dist"].to_numpy().astype(np.int64)
        v = g["vec_id"].to_numpy().astype(np.int64)
        o = np.lexsort((v, a))[:shortlist]
        g = g.take(o)
        d2 = g["d2"].to_numpy().astype(np.int64)
        v2 = g["vec_id"].to_numpy().astype(np.int64)
        o2 = np.lexsort((v2, d2))[:k]
        return g.take(o2).select(["query_id", "vec_id", "d2"])

    return local.groupby("query_id").map_groups(merge, batch_format="pyarrow")


BF_SCORE_SCALE = 10_000  # score = floor(sign*cos^2 * SCALE), int64-exact


def _check_score_bounds(qn: np.ndarray, xn: np.ndarray) -> None:
    """Raise before the integer-score arithmetic can wrap: by
    Cauchy-Schwarz |dot*|dot||*SCALE <= na*nb*SCALE, so the whole score
    pipeline is int64-safe iff max(na)*max(nb)*SCALE < 2^63.  The check
    multiplies PYTHON ints — a numpy int64 product would itself wrap
    and fail open in exactly the regime it guards."""
    if (int(qn.max(initial=0)) * int(xn.max(initial=0))
            > (1 << 63) // BF_SCORE_SCALE - 1):
        raise OverflowError(
            "integer cosine score would overflow int64; lower the "
            "quantization scale for this embedding range"
        )


def _int_cosine_scores(qmat: np.ndarray, qn: np.ndarray,
                       mat: np.ndarray, xn: np.ndarray) -> np.ndarray:
    """(nq, nx) int64 score matrix: floor(dot*|dot|*SCALE/(|q|²*|x|²)),
    zero where either norm is zero — THE integer cosine score contract
    mirrored by the SQL scored/ranked CTEs.  One definition; every
    query path (brute force, IVF lists, LSH buckets, kNN audit)
    composes it so a scale/rounding change cannot desynchronize them."""
    _check_score_bounds(qn, xn)
    dots = qmat @ mat.T
    s2 = dots * np.abs(dots) * BF_SCORE_SCALE
    d = qn[:, None] * xn[None, :]
    return np.where(d > 0, np.floor_divide(s2, np.maximum(d, 1)), 0)


def _broadcast_exact_topk(sf_dir: str, *, k: int, n_queries: int,
                          exclude: str):
    """Shared broadcast exact-top-k plan — ONE definition of the anchor
    fetch, local top-k, rank key and merge (ann_bruteforce_topk /
    hard_negatives) so the score/tie contract cannot drift between
    them or from the SQL scored/ranked CTEs that mirror both.

    The first ``n_queries`` vectors broadcast once (ray.put) with their
    norms (and labels when needed); each batch computes
    ``_int_cosine_scores`` against them and emits its local top-k under
    the candidate mask; a final per-query merge keeps the global k.
    ``exclude="self"`` masks the anchor row itself;
    ``exclude="same_label"`` masks every row sharing the anchor's label
    (which also drops the anchor).  Rank = (score DESC, vec_id ASC)."""
    import ray
    import ray.data as rd

    with_labels = exclude == "same_label"
    cols = ["vec_id", "embedding"] + (["label"] if with_labels else [])
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=cols)
    qrows = sorted(
        emb.map_batches(
            lambda b: b.filter(pa.array(b["vec_id"].to_numpy() < n_queries)),
            batch_format="pyarrow", zero_copy_batch=True,
        ).take_all(),
        key=lambda r: r["vec_id"],
    )
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qlab = (np.array([r["label"] for r in qrows], dtype=np.int64)
            if with_labels else None)
    qmat = np.stack(_quantize([list(r["embedding"]) for r in qrows]))
    qn = (qmat * qmat).sum(axis=1)  # |q|^2, int64
    ref = ray.put((qids, qlab, qmat, qn))

    def local_topk(b: pa.Table) -> pa.Table:
        ids_q, lab_q, qm, qnorm = ray.get(ref)
        empty = pa.table({"query_id": pa.array([], type=pa.int64()),
                          "vec_id": pa.array([], type=pa.int64()),
                          "score": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        vids = b["vec_id"].to_numpy()
        vlab = (b["label"].to_numpy().astype(np.int64)
                if with_labels else None)
        mat = np.stack(_quantize(b["embedding"].to_pylist()))
        xn = (mat * mat).sum(axis=1)  # |x|^2, int64
        score = _int_cosine_scores(qm, qnorm, mat, xn)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(ids_q)):
            s = score[qi]
            mask = (vlab != lab_q[qi]) if with_labels else (vids != ids_q[qi])
            if not mask.any():
                continue
            order = np.lexsort((vids[mask], -s[mask]))[:k]
            sel = np.flatnonzero(mask)[order]
            out_q.extend([int(ids_q[qi])] * len(sel))
            out_v.extend(vids[sel].tolist())
            out_s.extend(s[mask][order].tolist())
        return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                         "vec_id": pa.array(out_v, type=pa.int64()),
                         "score": pa.array(out_s, type=pa.int64())})

    local = emb.map_batches(local_topk, batch_format="pyarrow",
                            zero_copy_batch=True)

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"query_id": z, "vec_id": z, "score": z})
        s = g["score"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((v, -s))[:k]
        return g.take(o)

    return local.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def ann_bruteforce_topk(sf_dir: str, *, k: int = 5, n_queries: int = 10):
    """Brute-force top-k: the first ``n_queries`` vectors are the query
    matrix, broadcast once (ray.put); each batch computes an integer
    matmul against it and emits its local top-k; a final tiny pass merges.

    The rank key is int64-exact end-to-end: with q = floor(v*1000+0.5),
    score = floor(dot * |dot| * 10^4 / (|a|^2 * |b|^2)) — sign-preserving
    squared cosine at 1e-4 resolution, monotone in cosine, ties broken by
    vec_id asc.  Cauchy-Schwarz bounds |dot*|dot||*10^4 <= na*nb*10^4,
    which fits int64 for this corpus (|v| <= ~0.7, dim 64 -> na < 2^25);
    a guard raises rather than silently overflowing."""
    return _broadcast_exact_topk(sf_dir, k=k, n_queries=n_queries,
                                 exclude="self")


IVF_ITERS = 5
# Operating point (round 4, dialed with the ann_recall_audit telemetry +
# a (n_centroids, nprobe) sweep at sf0.001/sf0.01): nprobe 4 -> 8 lifts
# recall@5 vs brute force 0.82 -> 0.90 (sf0.001) and 0.70 -> 0.80
# (sf0.01) for a probe fraction of 8/32 = 25% of lists; 64 centroids
# measured WORSE at equal probe fraction on this corpus (0.74-0.82) —
# the lists get too thin for k=5.  The pytest floor is 0.7 (parity with
# the LSH path).  Production scales n_centroids ~ sqrt(corpus) and
# re-dials nprobe by the same audit query.
IVF_N_CENTROIDS = 32
IVF_NPROBE = 8
IVF_TRAIN_N = 256
IVF_N_QUERIES = 10


def _int_centroid_scores(x_q: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(n, k) int64 assignment keys: floor(dot*|dot|*1e4 / |c|^2).
    The per-vector |x|^2 factor is constant across centroids, so this
    ranks centroids exactly like the full integer cosine score; the
    Cauchy-Schwarz overflow guard is shared with the score contract."""
    cn = (cents * cents).sum(axis=1)
    xn = (x_q * x_q).sum(axis=1)
    _check_score_bounds(cn, xn)
    dots = x_q @ cents.T
    s2 = dots * np.abs(dots) * BF_SCORE_SCALE
    d = cn[None, :]
    return np.where(d > 0, np.floor_divide(s2, np.maximum(d, 1)), 0)


def _train_centroids(train_q: np.ndarray, n_centroids: int,
                     iters: int = IVF_ITERS) -> np.ndarray:
    """Deterministic INTEGER Lloyd (spherical-by-construction): init =
    the first ``n_centroids`` quantized vectors; each round assigns by
    the integer cosine key (_int_centroid_scores, argmax ties to the
    smallest centroid) and re-centers every non-empty cluster at the
    per-dimension FLOOR-mean of its members (numpy floor_divide ==
    SQL's mod-trick floor division); an emptied cluster keeps its
    previous centroid.  Every step is int64-exact, so the whole
    training loop — not just the query path — mirrors in DuckDB
    (unrolled iterations)."""
    cents = train_q[:n_centroids].copy()
    for _ in range(iters):
        assign = np.argmax(_int_centroid_scores(train_q, cents), axis=1)
        new = cents.copy()
        for c in range(n_centroids):
            m = assign == c
            if m.any():
                new[c] = np.floor_divide(train_q[m].sum(axis=0), m.sum())
        cents = new
    return cents


def ann_ivf_topk(sf_dir: str, *, k: int = 5, n_queries: int = IVF_N_QUERIES,
                 n_centroids: int = IVF_N_CENTROIDS, nprobe: int = IVF_NPROBE,
                 train_n: int = IVF_TRAIN_N):
    """IVF-style ANN, the second scale path: TRAINED centroids
    (deterministic spherical k-means over the first ``train_n`` vectors,
    see _train_centroids) partition the corpus into inverted lists via
    ``groupby(centroid)``; each query probes its ``nprobe`` nearest
    lists only.

    Distributed shape: centroids + query matrix broadcast once
    (``ray.put``); assignment is a numpy matmul per batch; the inverted
    lists are the groupby buckets (expected population n/n_centroids —
    scale n_centroids with corpus size to bound per-list work, which is
    LINEAR in list size); per-bucket top-k merges in a tiny final pass.

    Round 3: training, assignment, probing and ranking are ALL
    int64-exact (integer Lloyd, floor-mean centroids, the shared
    integer cosine keys), so the entire index — training loop included
    — mirrors in DuckDB as unrolled iteration CTEs; recall < 1 vs
    brute force by design, but the probe itself is exactly oracled."""
    import ray
    import ray.data as rd

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    head = sorted(
        emb.map_batches(
            lambda b: b.filter(
                pa.array(
                    b["vec_id"].to_numpy() < max(train_n, n_queries)
                )
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        ).take_all(),
        key=lambda r: r["vec_id"],
    )
    mat = np.stack(_quantize([list(r["embedding"]) for r in head]))
    n_centroids = min(n_centroids, len(mat))  # tiny-corpus guard
    nprobe = min(nprobe, n_centroids)
    cents = _train_centroids(mat, n_centroids)
    qids = np.array([r["vec_id"] for r in head[:n_queries]], dtype=np.int64)
    qmat = mat[:n_queries]
    qn = (qmat * qmat).sum(axis=1)
    # each query's probed centroid lists (integer key, tie -> smallest id)
    qsc = _int_centroid_scores(qmat, cents)
    probes = {
        int(qids[i]): set(
            np.lexsort((np.arange(n_centroids), -qsc[i]))[:nprobe].tolist()
        )
        for i in range(len(qids))
    }
    ref = ray.put((cents, qids, qmat, qn, probes))

    def assign(b: pa.Table) -> pa.Table:
        c, _, _, _, _ = ray.get(ref)
        if b.num_rows == 0:
            return pa.table({"centroid": pa.array([], type=pa.int32()),
                             "vec_id": b["vec_id"], "embedding": b["embedding"]})
        m = np.stack(_quantize(b["embedding"].to_pylist()))
        # argmax of the integer cosine key, ties -> smallest centroid
        bucket = np.argmax(_int_centroid_scores(m, c), axis=1).astype(np.int32)
        return pa.table({"centroid": pa.array(bucket),
                         "vec_id": b["vec_id"], "embedding": b["embedding"]})

    assigned = emb.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)

    def list_topk(g: pa.Table) -> pa.Table:
        zt = pa.table({"query_id": pa.array([], type=pa.int64()),
                       "vec_id": pa.array([], type=pa.int64()),
                       "score": pa.array([], type=pa.int64())})
        if g.num_rows == 0:
            return zt
        _, qids_, qmat_, qn_, probes_ = ray.get(ref)
        bucket = int(g["centroid"][0].as_py())
        active = [i for i, q in enumerate(qids_) if bucket in probes_[int(q)]]
        if not active:
            return zt
        vids = g["vec_id"].to_numpy(zero_copy_only=False)
        m = np.stack(_quantize(g["embedding"].to_pylist()))
        xn = (m * m).sum(axis=1)
        score = _int_cosine_scores(qmat_[active], qn_[active], m, xn)
        out = []
        for row, qi in enumerate(active):
            qid = int(qids_[qi])
            mask = vids != qid
            order = np.lexsort((vids[mask], -score[row][mask]))[:k]
            sel = np.flatnonzero(mask)[order]
            for idx in sel:
                out.append((qid, int(vids[idx]), int(score[row][idx])))
        if not out:
            return zt
        q_, v_, s_ = zip(*out)
        return pa.table({"query_id": pa.array(q_, type=pa.int64()),
                         "vec_id": pa.array(v_, type=pa.int64()),
                         "score": pa.array(s_, type=pa.int64())})

    local = assigned.groupby("centroid").map_groups(list_topk, batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"query_id": z, "vec_id": z, "score": z})
        s = g["score"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((v, -s))[:k]
        return g.take(o)

    return local.groupby("query_id").map_groups(merge, batch_format="pyarrow")


ANN_LSH_BANDS = 32       # independent plane sets (OR-construction)
ANN_LSH_PLANES = 6       # planes per band -> 64 buckets per band
# Operating point re-measured after the round-3 switch to integer
# md5-derived hyperplanes (which made the whole probe SQL-mirrorable):
# recall@5 = 0.76 vs brute force probing 32 of 32*64 = 2048 buckets
# (1.6% — same probe fraction as the round-2 point, the band count
# doubled to absorb the draw variance of the hash-derived planes;
# measured sweep: 16 bands 0.54, 24 bands 0.70, 32 bands 0.76).
# Production scales planes_per_band with log2(corpus) to keep
# per-bucket populations flat; recall then rides on the band count.


PLANE_SCALE = 1_000_000  # integer hyperplane weights in [-SCALE, SCALE]

_PLANE_CACHE: dict[tuple[int, int], np.ndarray] = {}


def _band_planes(dim: int, n_bands: int, planes_per_band: int) -> np.ndarray:
    """Deterministic INTEGER hyperplanes, identical on every worker and
    expressible in SQL: w(p, d) = md5_number_upper('plane:p:d') %
    (2*PLANE_SCALE+1) - PLANE_SCALE (DuckDB's md5_number_upper is the
    little-endian uint64 of md5 digest[:8] — the same value hashlib
    reads below).  Uniform-cube directions instead of gaussian: for
    sign-LSH the direction distribution only needs symmetry, and the
    integer weights make every bucket bit an exact int64 dot sign on
    BOTH sides of the oracle."""
    key = (n_bands * planes_per_band, dim)
    w = _PLANE_CACHE.get(key)
    if w is None:
        n_planes = n_bands * planes_per_band
        w = np.zeros((n_planes, dim), dtype=np.int64)
        # Irwin-Hall n=4: the sum of four uniform draws is close enough
        # to gaussian to restore the rotation-invariance sign-LSH needs
        # (a single cube-uniform draw measured recall 0.50 vs 0.74 —
        # diagonal-biased directions); each draw is one md5, so the SQL
        # side reproduces the weights with four md5_number_upper calls
        for p in range(n_planes):
            for d in range(dim):
                acc = 0
                for r in range(4):
                    h = int.from_bytes(
                        hashlib.md5(f"plane:{p}:{d}:{r}".encode()).digest()[:8],
                        "little",
                    )
                    acc += h % (PLANE_SCALE + 1)
                # each draw is uniform on [0, S]: subtracting 2S centers
                # the 4-draw sum symmetrically on [-2S, 2S]
                w[p, d] = acc - 2 * PLANE_SCALE
        _PLANE_CACHE[key] = w
    return w


def _band_buckets(qmat: np.ndarray, n_bands: int,
                  planes_per_band: int) -> np.ndarray:
    """(n, n_bands) int64 bucket signatures from a QUANTIZED int64
    matrix — bit i of a band = (integer dot with plane i) > 0, exact
    (|dot| <= dim * 1000-scale-entry * PLANE_SCALE < 2^63)."""
    planes = _band_planes(qmat.shape[1], n_bands, planes_per_band)
    bits = (qmat @ planes.T) > 0
    buckets = np.zeros((len(qmat), n_bands), dtype=np.int64)
    for band in range(n_bands):
        for i in range(planes_per_band):
            buckets[:, band] |= (
                bits[:, band * planes_per_band + i].astype(np.int64) << i
            )
    return buckets


def ann_lsh_topk(sf_dir: str, *, k: int = 5, n_queries: int = 10,
                 n_bands: int = ANN_LSH_BANDS,
                 planes_per_band: int = ANN_LSH_PLANES):
    """Scale-path ANN: BANDED random-hyperplane LSH (OR-construction,
    the same layout the near-dup LSH paths use).  Each vector lands in
    one bucket per band; a query probes exactly its own bucket in each
    band — n_bands of n_bands*2^planes buckets (1.6% at the defaults).

    Physical plan: the query bucket signatures broadcast (ray.put); the
    corpus-side explode FILTERS to rows whose (band, bucket) is probed
    by some query — only candidate rows (~a quarter of the corpus at
    the defaults) ever shuffle into the groupby — then each probed
    bucket scans its own members linearly.  A vector reached through
    two bands yields duplicate (query, vec) rows; the final merge
    drops them before taking k.

    Bucketing AND ranking are integer-exact (md5-derived integer
    hyperplanes over the x1000 quantization; the bruteforce score
    contract floor(dot*|dot|*1e4/(na*nb))), so the whole probe —
    candidate generation included — has an exact DuckDB oracle even
    though recall < 1 vs brute force (the oracle mirrors the same
    buckets)."""
    import ray
    import ray.data as rd

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    qrows = sorted(
        emb.map_batches(
            lambda b: b.filter(pa.array(b["vec_id"].to_numpy() < n_queries)),
            batch_format="pyarrow", zero_copy_batch=True,
        ).take_all(),
        key=lambda r: r["vec_id"],
    )
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qmat = np.stack(_quantize([list(r["embedding"]) for r in qrows]))
    qn = (qmat * qmat).sum(axis=1)  # |q|^2, int64
    qbuck = _band_buckets(qmat, n_bands, planes_per_band)  # (nq, n_bands)
    # probed (band, bucket) pairs as one sorted composite-key array:
    # membership inside the explode is a vectorized searchsorted
    probe_keys = np.unique(
        np.arange(n_bands, dtype=np.int64)[None, :] * (1 << planes_per_band)
        + qbuck
    )
    ref = ray.put((qids, qmat, qn, qbuck, probe_keys))

    def explode(b: pa.Table) -> pa.Table:
        _, _, _, _, pk = ray.get(ref)
        if b.num_rows == 0:
            mat = np.zeros((0, 1), dtype=np.int64)
        else:
            mat = np.stack(_quantize(b["embedding"].to_pylist()))
        if len(mat) == 0:
            return pa.table({"band": pa.array([], type=pa.int32()),
                             "bucket": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "embedding": b["embedding"]})
        buckets = _band_buckets(mat, n_bands, planes_per_band)
        comp = (np.arange(n_bands, dtype=np.int64)[None, :]
                * (1 << planes_per_band) + buckets)
        idx = np.searchsorted(pk, comp)
        probed = (idx < len(pk)) & (pk[np.minimum(idx, len(pk) - 1)] == comp)
        rows, bands_of = np.nonzero(probed)  # only candidate rows shuffle
        out = b.take(pa.array(rows))
        return pa.table(
            {
                "band": pa.array(bands_of.astype(np.int32)),
                "bucket": pa.array(buckets[rows, bands_of]),
                "vec_id": pa.array(
                    out["vec_id"].to_numpy().astype(np.int64)
                ),
                "embedding": out["embedding"],
            }
        )

    exploded = emb.map_batches(explode, batch_format="pyarrow",
                               zero_copy_batch=True)

    def bucket_topk(g: pa.Table) -> pa.Table:
        zt = pa.table({"query_id": pa.array([], type=pa.int64()),
                       "vec_id": pa.array([], type=pa.int64()),
                       "score": pa.array([], type=pa.int64())})
        if g.num_rows == 0:
            return zt
        qids_, qmat_, qn_, qbuck_, _ = ray.get(ref)
        band = int(g["band"][0].as_py())
        bucket = int(g["bucket"][0].as_py())
        active = np.flatnonzero(qbuck_[:, band] == bucket)
        if len(active) == 0:
            return zt
        vids = g["vec_id"].to_numpy(zero_copy_only=False)
        mat = np.stack(_quantize(g["embedding"].to_pylist()))
        xn = (mat * mat).sum(axis=1)
        score = _int_cosine_scores(qmat_[active], qn_[active], mat, xn)
        out = []
        for row, qi in enumerate(active):
            qid = int(qids_[qi])
            mask = vids != qid
            order = np.lexsort((vids[mask], -score[row][mask]))[:k]
            sel = np.flatnonzero(mask)[order]
            for idx in sel:
                out.append((qid, int(vids[idx]), int(score[row][idx])))
        if not out:
            return zt
        q_, v_, s_ = zip(*out)
        return pa.table({"query_id": pa.array(q_, type=pa.int64()),
                         "vec_id": pa.array(v_, type=pa.int64()),
                         "score": pa.array(s_, type=pa.int64())})

    local = exploded.groupby(["band", "bucket"]).map_groups(
        bucket_topk, batch_format="pyarrow"
    )

    def merge(g: pa.Table) -> pa.Table:
        # a vector reached via two bands appears twice, same score
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"query_id": z, "vec_id": z, "score": z})
        v = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        first = np.zeros(len(v), dtype=bool)
        first[np.unique(v, return_index=True)[1]] = True
        g = g.take(np.flatnonzero(first))
        s = g["score"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((v, -s))[:k]
        return g.take(o)

    return local.groupby("query_id").map_groups(merge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# kNN label agreement — the label-noise audit (Confident-Learning /
# kNN-consistency shape): a vector whose exact nearest neighbors
# disagree with its own label is a mislabeled-sample candidate, the
# standard pruning signal for labeled training data.

KNN_AGREE_K = 5
# exact all-pairs kNN broadcasts the reference matrix once AND each
# batch allocates (batch × corpus) int64 score intermediates, so the
# gate must reflect the per-TASK memory, not just the driver fold:
# KNN_BATCH × MAX × 8 B × ~4 live arrays ≈ 0.5 GiB per task at these
# settings.  Past the gate the quadratic exact audit is the wrong
# tool — run the IVF-bucketed per-list variant (ann_ivf machinery).
KNN_BROADCAST_MAX = 1 << 16
KNN_BATCH = 256


def knn_label_agreement(sf_dir: str, *, k: int = KNN_AGREE_K):
    """For EVERY vector: its ``k`` exact nearest neighbors under the
    shared integer cosine score (score DESC, vec_id ASC ties, self
    excluded), how many share the vector's label (``n_same``) and a
    majority verdict (``agree`` = n_same*2 > k, as int64 for oracle
    parity).

    Scale plan: the reference side (ids, quantized matrix, norms,
    labels) is folded from pruned-column batch partials and broadcast
    ONCE via ray.put; each batch is one integer matmul + a fully
    vectorized composite-key top-k (score*2^32 - vec_id — no per-row
    Python loop).  Exact all-pairs is inherently quadratic, so a gate
    raises past KNN_BROADCAST_MAX vectors, where the IVF inverted-list
    layout (ann_ivf_topk) is the approximate scale path."""
    import ray
    import ray.data as rd

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
    )
    n_vecs = emb.count()  # parquet metadata only
    if n_vecs > KNN_BROADCAST_MAX:
        raise ValueError(
            f"knn_label_agreement is the exact quadratic audit and "
            f"broadcasts the corpus matrix; {n_vecs} vectors exceeds "
            f"KNN_BROADCAST_MAX={KNN_BROADCAST_MAX} — use the "
            "IVF-bucketed variant at this scale"
        )

    def pack(b: pa.Table) -> pa.Table:
        # per-batch partial: quantize once in the workers so the driver
        # fold only concatenates small int arrays
        if b.num_rows == 0:
            return pa.table({
                "vec_id": pa.array([], type=pa.int64()),
                "q": pa.array([], type=pa.list_(pa.int64())),
                "label": pa.array([], type=pa.int64()),
            })
        ids = b["vec_id"].to_numpy().astype(np.int64)
        mat = np.stack(_quantize(b["embedding"].to_pylist()))
        return pa.table({
            "vec_id": pa.array(ids),
            "q": pa.array(list(mat), type=pa.list_(pa.int64())),
            "label": pa.array(
                b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
            ),
        })

    rows = emb.map_batches(pack, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    if not rows:  # 0-vector corpus: empty result, same as the oracle
        return pa.table({
            "vec_id": pa.array([], type=pa.int64()),
            "label": pa.array([], type=pa.int64()),
            "n_same": pa.array([], type=pa.int64()),
            "agree": pa.array([], type=pa.int64()),
        })
    rows.sort(key=lambda r: r["vec_id"])
    ref_ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    if int(ref_ids.max()) >= (1 << 32):
        # the composite ranking key packs vec_id into the low 32 bits;
        # fail loudly rather than silently corrupting the order
        raise ValueError(
            "knn_label_agreement's composite rank key requires "
            "vec_id < 2^32; remap ids before the audit"
        )
    ref_mat = np.stack([np.asarray(r["q"], dtype=np.int64) for r in rows])
    ref_lab = np.array([r["label"] for r in rows], dtype=np.int64)
    ref_norm = (ref_mat * ref_mat).sum(axis=1)
    ref = ray.put((ref_ids, ref_mat, ref_lab, ref_norm))

    def agree_batch(b: pa.Table) -> pa.Table:
        ids_r, mat_r, lab_r, nrm_r = ray.get(ref)
        empty = pa.table({
            "vec_id": pa.array([], type=pa.int64()),
            "label": pa.array([], type=pa.int64()),
            "n_same": pa.array([], type=pa.int64()),
            "agree": pa.array([], type=pa.int64()),
        })
        if b.num_rows == 0:
            return empty
        vids = b["vec_id"].to_numpy().astype(np.int64)
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = np.stack(_quantize(b["embedding"].to_pylist()))
        xn = (mat * mat).sum(axis=1)
        score = _int_cosine_scores(mat, xn, mat_r, nrm_r)
        # composite key: score DESC then vec_id ASC, one int64 — score
        # is in [-SCALE, SCALE] so score << 32 never collides with the
        # subtracted id (ids are < 2^32 by the quantize contract)
        key = (score << np.int64(32)) - ids_r[None, :]
        # self-mask sentinel must survive the argpartition's negation:
        # -int64.min wraps back to int64.min and ranks self FIRST; real
        # keys are bounded by |SCALE|*2^32 + id < 2^46, so -2^62 is
        # safely below every candidate and negates exactly
        key[vids[:, None] == ids_r[None, :]] = -(np.int64(1) << np.int64(62))
        kk = min(k, key.shape[1] - 1)
        top = np.argpartition(-key, kk - 1, axis=1)[:, :kk] if kk > 0 \
            else np.empty((len(vids), 0), dtype=np.int64)
        n_same = (
            np.take_along_axis(
                np.broadcast_to(lab_r[None, :], key.shape), top, axis=1
            ) == lab[:, None]
        ).sum(axis=1).astype(np.int64)
        return pa.table({
            "vec_id": pa.array(vids),
            "label": pa.array(lab),
            "n_same": pa.array(n_same),
            "agree": pa.array((n_same * 2 > k).astype(np.int64)),
        })

    return emb.map_batches(agree_batch, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=KNN_BATCH)


def cluster_balance(sf_dir: str):
    """Per (cluster, label) vector counts under the deterministic
    N_SEM_SEEDS centroid assignment — the embedding-space class-balance
    audit a curation pipeline runs before sampling per cluster (are the
    labels concentrated in a few regions, or spread?).

    Assignment reuses dedup_semantic's contract exactly (argmax integer
    dot, ties to the smallest centroid id) but over the FULL embeddings
    table: unlike SemDedup there is no pairwise stage, so the linear
    SQL mirror needs no bounded subset.  Per batch: one broadcast int64
    matmul + a bincount over (cluster, label) codes; only
    <= N_SEM_SEEDS * n_labels partial rows per batch reach the bounded
    final groupby."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
    )
    S, _ = _low_id_seed_matrix(ds, N_SEM_SEEDS)
    ref = ray.put(S)

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "cluster": pa.array([], type=pa.int64()),
            "label": pa.array([], type=pa.int64()),
            "n_vecs": pa.array([], type=pa.int64()),
        })
        if b.num_rows == 0:
            return empty
        S = ray.get(ref)
        Q = np.stack(_quantize(b["embedding"].to_pylist()))
        # first-max argmax == the oracle's ORDER BY dot DESC, cid ASC
        cid = np.argmax(Q @ S.T, axis=1).astype(np.int64)
        lab = b["label"].to_numpy().astype(np.int64)
        lu, linv = np.unique(lab, return_inverse=True)
        key = cid * len(lu) + linv
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "cluster": pa.array((uk // len(lu)).astype(np.int64)),
            "label": pa.array(lu[uk % len(lu)]),
            "n_vecs": pa.array(cnt.astype(np.int64)),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["cluster", "label"])
        .aggregate(Sum("n_vecs", alias_name="n_vecs"))
        .sort(["cluster", "label"])
    )


OUTLIER_K = 20


def embedding_outliers(sf_dir: str, *, k: int = OUTLIER_K):
    """The OUTLIER_K vectors FARTHEST from their own assigned centroid
    — the prune-candidate list an embedding-curation pass reviews
    (likely mislabeled, noise, or out-of-distribution points).

    Assignment reuses dedup_semantic's exact contract (argmax integer
    DOT against the N_SEM_SEEDS lowest-id seeds, ties to the smallest
    centroid id — note dot, not cosine: the assignment contract).  The
    outlier score is the SHARED integer cosine score (_int_cosine_scores)
    between the vector and its assigned centroid; rank = (score ASC,
    vec_id ASC).  Per batch one broadcast matmul serves both assignment
    and scoring; each batch emits its local bottom-k, and <= k * batches
    candidate rows merge on the driver (the hot_keys bounded pattern)."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    S, _ = _low_id_seed_matrix(ds, N_SEM_SEEDS)
    sn = (S * S).sum(axis=1)
    ref = ray.put((S, sn))

    def local_bottomk(b: pa.Table) -> pa.Table:
        empty = pa.table({"vec_id": pa.array([], type=pa.int64()),
                          "cluster": pa.array([], type=pa.int64()),
                          "score": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        S_, sn_ = ray.get(ref)
        ids = b["vec_id"].to_numpy().astype(np.int64)
        Q = np.stack(_quantize(b["embedding"].to_pylist()))
        qn = (Q * Q).sum(axis=1)
        # first-max argmax == the oracle's ORDER BY dot DESC, cid ASC
        cid = np.argmax(Q @ S_.T, axis=1).astype(np.int64)
        scores = _int_cosine_scores(S_, sn_, Q, qn)  # (seeds, batch)
        sc = scores[cid, np.arange(len(ids))]
        o = np.lexsort((ids, sc))[:k]
        return pa.table({"vec_id": pa.array(ids[o]),
                         "cluster": pa.array(cid[o]),
                         "score": pa.array(sc[o])})

    cand = ds.map_batches(
        local_bottomk, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    ids = np.asarray([r["vec_id"] for r in cand], dtype=np.int64)
    cl = np.asarray([r["cluster"] for r in cand], dtype=np.int64)
    sc = np.asarray([r["score"] for r in cand], dtype=np.int64)
    o = np.lexsort((ids, sc))[:k]
    return pa.table({"vec_id": pa.array(ids[o]),
                     "cluster": pa.array(cl[o]),
                     "score": pa.array(sc[o])})


def label_centroid_affinity(sf_dir: str):
    """Pairwise integer-cosine affinity between per-label SUM centroids
    — the "are these classes' embedding regions near each other?" audit
    a curation pipeline runs before merging or rebalancing label
    taxonomies.  cosine(sum) == cosine(mean), so using the un-divided
    component SUMS keeps every number an exact integer while reporting
    the same geometry as mean centroids.

    Plan: one pruned pass folds per-batch (label, dim, sum) int64
    partials (<= n_labels * DIM rows per batch) -> bounded Ray-native
    groupby Sum over n_labels * DIM keys -> the n_labels^2 pairwise
    scores are computed from that bounded table in exact Python-int
    arithmetic (component sums can reach 1000 * rows-per-label, so dot
    products of sums overflow int64 long before the corpus is large;
    the final table is tiny, the vectors never shuffle).  Score is the
    shared BF contract: floor(dot * |dot| * 1e4 / (na * nb))."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if b.num_rows == 0:
            return pa.table({"label": z, "i": z, "s": z})
        lab = b["label"].to_numpy().astype(np.int64)
        Q = np.stack(_quantize(b["embedding"].to_pylist()))
        lu, linv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(lu), Q.shape[1]), dtype=np.int64)
        np.add.at(sums, linv, Q)
        dim = Q.shape[1]
        return pa.table({
            "label": pa.array(np.repeat(lu, dim)),
            "i": pa.array(np.tile(np.arange(dim, dtype=np.int64), len(lu))),
            "s": pa.array(sums.ravel()),
        })

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["label", "i"])
        .aggregate(Sum("s", alias_name="s"))
        .take_all()  # bounded: n_labels * DIM rows
    )
    cents: dict[int, dict[int, int]] = {}
    for r in rows:
        cents.setdefault(int(r["label"]), {})[int(r["i"])] = int(r["s"])
    labels = sorted(cents)
    dim = 1 + max((i for d in cents.values() for i in d), default=0)
    vec = {l: [cents[l].get(i, 0) for i in range(dim)] for l in labels}
    # exact python-int norms and dots over the bounded centroid table
    norm = {l: sum(v * v for v in vec[l]) for l in labels}
    la, lb, aff = [], [], []
    for x in range(len(labels)):
        for y in range(x + 1, len(labels)):
            a, b = labels[x], labels[y]
            va, vb = vec[a], vec[b]
            n = min(len(va), len(vb))
            dot = sum(va[i] * vb[i] for i in range(n))
            den = norm[a] * norm[b]
            score = 0 if den == 0 else (dot * abs(dot) * BF_SCORE_SCALE) // den
            la.append(a)
            lb.append(b)
            aff.append(score)
    return pa.table({
        "label_a": pa.array(la, type=pa.int64()),
        "label_b": pa.array(lb, type=pa.int64()),
        "affinity": pa.array(aff, type=pa.int64()),
    })


HN_QUERIES = 10  # first vec_ids are the anchors (the BF oracle baseline)
HN_K = 5


def hard_negatives(sf_dir: str, *, k: int = HN_K, n_queries: int = HN_QUERIES):
    """Contrastive hard-negative mining: for each anchor vector, the k
    nearest vectors with a DIFFERENT label — the highest-similarity
    wrong-class examples a contrastive trainer wants in the batch.

    Rides _broadcast_exact_topk (ann_bruteforce_topk's plan — one
    definition, the contracts cannot drift) with the candidate mask
    flipped from vec_id != anchor to label != anchor's label (which
    also excludes the anchor itself).  The rank key is the shared
    integer score contract, ties to vec_id asc."""
    return _broadcast_exact_topk(sf_dir, k=k, n_queries=n_queries,
                                 exclude="same_label")


def label_norm_quantiles(sf_dir: str):
    """Per-label embedding-norm spectrum: exact p50/p90 of the integer
    SQUARED norm |q|^2 (the x1000 quantization every scoring path
    shares) plus the vector count — the norm-outlier audit a curation
    pass reads before cosine-normalizing or pruning a class (a label
    whose p90 dwarfs its p50 hides scaling bugs or outliers).

    Label cardinality is BOUNDED, so the Ray-native per-label
    map_groups is the right plan (segment_price_quantiles' shape);
    ranks follow the shared _exact_pctiles convention — value at
    sorted index floor(p*(n-1)/100) under (norm, vec_id) order,
    mirrored in SQL by row_number."""
    import pandas as pd
    import ray.data as rd

    from prlib_ray.relational import _exact_pctiles

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
    )

    def norms(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"label": z, "n2": z, "vec_id": z})
        Q = np.stack(_quantize(b["embedding"].to_pylist()))
        return pa.table({
            "label": pa.array(b["label"].to_numpy().astype(np.int64)),
            "n2": pa.array((Q * Q).sum(axis=1)),
            "vec_id": pa.array(b["vec_id"].to_numpy().astype(np.int64)),
        })

    def quant(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"label": z, "p50_norm2": z,
                             "p90_norm2": z, "n_vecs": z})
        (p50, p90), n = _exact_pctiles(
            g["n2"].to_numpy().astype(np.int64),
            g["vec_id"].to_numpy().astype(np.int64),
        )
        return pa.table({
            "label": pa.array([int(g["label"][0].as_py())],
                              type=pa.int64()),
            "p50_norm2": pa.array([int(p50)], type=pa.int64()),
            "p90_norm2": pa.array([int(p90)], type=pa.int64()),
            "n_vecs": pa.array([int(n)], type=pa.int64()),
        })

    return (
        ds.map_batches(norms, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("label")
        .map_groups(quant, batch_format="pyarrow")
        .sort("label")
    )


TRUNC_DIM = 16  # matryoshka audit: first-16-of-64 dims


def ann_dim_truncation_audit(sf_dir: str, *, k: int = 5,
                             n_queries: int = 10,
                             trunc_dim: int = TRUNC_DIM):
    """Matryoshka-style dimension-truncation audit: per query, how much
    of the exact FULL-dimension top-k survives when both queries and
    corpus are truncated to the first ``trunc_dim`` dimensions — the
    measurement that decides whether a cheaper truncated index is safe.

    ONE corpus scan computes BOTH score matrices per batch (the shared
    `_int_cosine_scores` integer contract at full and truncated dims —
    the truncated variant is the same contract over a prefix slice, so
    the SQL mirror is the same CTE chain over ``i <= trunc_dim``); each
    batch emits its local top-k per (variant, query); the driver merges
    the bounded candidates (<= 2 * n_queries * k per batch) and counts
    the per-query overlap.  recall_permille = 1000 * overlap // k,
    exact integers end-to-end."""
    import ray
    import ray.data as rd

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    qrows = sorted(
        emb.map_batches(
            lambda b: b.filter(
                pa.array(b["vec_id"].to_numpy() < n_queries)),
            batch_format="pyarrow", zero_copy_batch=True,
        ).take_all(),
        key=lambda r: r["vec_id"],
    )
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qm = np.stack(_quantize([list(r["embedding"]) for r in qrows]))
    qt = qm[:, :trunc_dim]
    ref = ray.put((qids, qm, (qm * qm).sum(axis=1),
                   qt, (qt * qt).sum(axis=1)))

    def local_topk(b: pa.Table) -> pa.Table:
        ids_q, qm_, qn_, qt_, qtn_ = ray.get(ref)
        empty = pa.table({
            "variant": pa.array([], type=pa.int8()),
            "query_id": pa.array([], type=pa.int64()),
            "vec_id": pa.array([], type=pa.int64()),
            "score": pa.array([], type=pa.int64()),
        })
        if b.num_rows == 0:
            return empty
        vids = b["vec_id"].to_numpy()
        mat = np.stack(_quantize(b["embedding"].to_pylist()))
        mt = mat[:, :trunc_dim]
        s_full = _int_cosine_scores(qm_, qn_, mat,
                                    (mat * mat).sum(axis=1))
        s_trunc = _int_cosine_scores(qt_, qtn_, mt,
                                     (mt * mt).sum(axis=1))
        out_var, out_q, out_v, out_s = [], [], [], []
        for variant, score in ((0, s_full), (1, s_trunc)):
            for qi in range(len(ids_q)):
                s = score[qi]
                mask = vids != ids_q[qi]
                if not mask.any():
                    continue
                order = np.lexsort((vids[mask], -s[mask]))[:k]
                sel = np.flatnonzero(mask)[order]
                out_var.extend([variant] * len(sel))
                out_q.extend([int(ids_q[qi])] * len(sel))
                out_v.extend(vids[sel].tolist())
                out_s.extend(s[mask][order].tolist())
        return pa.table({
            "variant": pa.array(out_var, type=pa.int8()),
            "query_id": pa.array(out_q, type=pa.int64()),
            "vec_id": pa.array(out_v, type=pa.int64()),
            "score": pa.array(out_s, type=pa.int64()),
        })

    rows = emb.map_batches(local_topk, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    # bounded driver merge: per (variant, query) global top-k by the
    # shared (score DESC, vec_id ASC) rank, then per-query overlap
    var = np.array([r["variant"] for r in rows], dtype=np.int64)
    qid = np.array([r["query_id"] for r in rows], dtype=np.int64)
    vid = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    sc = np.array([r["score"] for r in rows], dtype=np.int64)
    tops: dict[tuple[int, int], set] = {}
    for v in (0, 1):
        for q in qids:
            m = (var == v) & (qid == q)
            order = np.lexsort((vid[m], -sc[m]))[:k]
            tops[(v, int(q))] = set(vid[m][order].tolist())
    overlap = np.array(
        [len(tops[(0, int(q))] & tops[(1, int(q))]) for q in qids],
        dtype=np.int64,
    )
    return pa.table({
        "query_id": pa.array(qids, type=pa.int64()),
        "n_overlap": pa.array(overlap, type=pa.int64()),
        "recall_permille": pa.array(1000 * overlap // k,
                                    type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# MMR diversified retrieval

MMR_K = 5          # picks
MMR_CAND = 24      # relevance shortlist size (bounded greedy input)
MMR_REL_W = 7      # objective = MMR_REL_W*rel - MMR_DIV_W*max_sim
MMR_DIV_W = 3      # (both terms on the shared integer score scale)


def mmr_diversified_topk(sf_dir: str):
    """Maximal-marginal-relevance retrieval: MMR_K vectors balancing
    relevance to the anchor (vec_id 0) against redundancy with what is
    already selected — the diversity-aware top-k a RAG / dataset-
    sampling pipeline runs instead of plain ANN when near-duplicate
    hits waste the context budget.

    Every number is exact on the shared integer cosine contract
    (_int_cosine_scores), so the greedy argmax sequence — including
    ties (objective DESC, vec_id ASC) — mirrors bit-for-bit in SQL as
    MMR_K unrolled selection CTEs.  objective = MMR_REL_W*rel -
    MMR_DIV_W*max(sim to selected); the first pick maximizes pure
    relevance (empty selected set -> diversity term 0).

    Physical plan: the anchor broadcasts once; per batch one integer
    matmul + local top-MMR_CAND (score DESC, vec_id ASC) bounds the
    driver merge at MMR_CAND * n_blocks rows, and the candidate VECTORS
    ride along in the same bounded rows (no second corpus scan); the
    greedy loop runs driver-side over the MMR_CAND x MMR_CAND pairwise
    score matrix — O(K * C) integer ops on a constant-size problem,
    exactly like search_topk's bounded merge.  At 100 TB only the ONE
    shortlist scan is corpus-sized."""
    import ray
    import ray.data as rd

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    Q, qids = _low_id_seed_matrix(emb, 1)
    qn = (Q * Q).sum(axis=1)
    ref = ray.put((Q, qn))

    def local_topc(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "vec_id": pa.array([], type=pa.int64()),
            "rel": pa.array([], type=pa.int64()),
            "embedding": pa.array([], type=pa.list_(pa.float32())),
        })
        if b.num_rows == 0:
            return empty
        qm, qnorm = ray.get(ref)
        vids = b["vec_id"].to_numpy().astype(np.int64)
        mat = np.stack(_quantize(b["embedding"].to_pylist()))
        xn = (mat * mat).sum(axis=1)
        s = _int_cosine_scores(qm, qnorm, mat, xn)[0]
        mask = vids != 0  # the anchor never retrieves itself
        if not mask.any():
            return empty
        order = np.lexsort((vids[mask], -s[mask]))[:MMR_CAND]
        sel = np.flatnonzero(mask)[order]
        ecol = b["embedding"]
        if isinstance(ecol, pa.ChunkedArray):
            ecol = ecol.combine_chunks()
        # the candidate VECTORS ride along (<= MMR_CAND rows per block),
        # so no second corpus scan is needed to fetch them
        return pa.table({"vec_id": pa.array(vids[sel]),
                         "rel": pa.array(s[mask][order]),
                         "embedding": ecol.take(pa.array(sel))})

    cands = emb.map_batches(local_topc, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    cid = np.asarray([c["vec_id"] for c in cands], dtype=np.int64)
    crel = np.asarray([c["rel"] for c in cands], dtype=np.int64)
    o = np.lexsort((cid, -crel))[:MMR_CAND]
    cid, crel = cid[o], crel[o]

    rmat = np.stack(_quantize([list(cands[i]["embedding"]) for i in o]))
    rn = (rmat * rmat).sum(axis=1)
    pair = _int_cosine_scores(rmat, rn, rmat, rn)  # (C, C) int64
    pos = {int(v): i for i, v in enumerate(cid)}

    rel_of = dict(zip(cid.tolist(), crel.tolist()))
    remaining = cid.tolist()
    out_rank, out_id, out_rel, out_obj = [], [], [], []
    selected: list[int] = []
    for t in range(1, MMR_K + 1):
        if not remaining:
            break
        best = None
        for v in remaining:  # MMR_CAND-bounded: constant-size loop
            if selected:
                ms = max(int(pair[pos[v], pos[s]]) for s in selected)
            else:
                ms = 0
            obj = MMR_REL_W * rel_of[v] - MMR_DIV_W * ms
            key = (-obj, v)
            if best is None or key < best[0]:
                best = (key, v, obj)
        _, v, obj = best
        remaining.remove(v)
        selected.append(v)
        out_rank.append(t)
        out_id.append(v)
        out_rel.append(rel_of[v])
        out_obj.append(obj)
    return pa.table({
        "rank": pa.array(out_rank, type=pa.int64()),
        "vec_id": pa.array(out_id, type=pa.int64()),
        "rel": pa.array(out_rel, type=pa.int64()),
        "obj": pa.array(out_obj, type=pa.int64()),
    })


# Greedy k-center coreset (farthest-point traversal — the classic
# 2-approximation; public technique): diversity-based data pruning, the
# selection rule coreset/active-learning pipelines run over embedding
# spaces.  K small by design (centers broadcast; distances recompute
# per round so the pipeline stays stateless and streaming).
K_CENTER = 8


def kcenter_coreset(sf_dir: str):
    """The K_CENTER greedy farthest-point centers over the embeddings
    table: center 0 = min vec_id (deterministic seed), center t =
    argmax over points of min squared distance to the chosen set
    (ties -> smaller vec_id).  Output (round, vec_id, dist2) — dist2
    is the selection distance, the k-center radius certificate each
    round tightens.  All arithmetic is exact int64 on the shared
    floor(v*1000+0.5) quantization, so the oracle mirrors with
    K_CENTER-1 unrolled MATERIALIZED rounds (the IVF-training oracle
    discipline).

    Physical plan: one streaming scan per round (K scans total); each
    batch computes min-distance to the broadcast center matrix
    ((n,1,64)-(1,k,64) squared-sum, one matmul-shaped kernel) and
    emits ONE local-winner row carrying its embedding, so the global
    argmax is a bounded one-row-per-batch driver fold and the next
    center's vector needs NO second scan."""
    import ray.data as rd
    from ray.data.aggregate import Min

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()

    c0 = int(ds.aggregate(Min("vec_id"))["min(vec_id)"])

    def seed_row(b: pa.Table) -> pa.Table:
        keep = b["vec_id"].to_numpy() == c0
        return b.filter(pa.array(keep))

    seed = ds.map_batches(
        seed_row, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    C = [np.stack(_quantize([list(seed[0]["embedding"])]))[0]]
    out_round = [0]
    out_id = [c0]
    out_d2 = [0]

    for t in range(1, K_CENTER):
        Cm = np.stack(C)

        def winner(b: pa.Table, Cm=Cm) -> pa.Table:
            ids = b["vec_id"].to_numpy().astype(np.int64)
            if not len(ids):
                return pa.table({
                    "vec_id": pa.array([], type=pa.int64()),
                    "d2": pa.array([], type=pa.int64()),
                    "embedding": pa.array([], type=pa.list_(pa.float64())),
                })
            Q = np.stack(_quantize(b["embedding"].to_pylist()))
            diff = Q[:, None, :] - Cm[None, :, :]
            d2 = np.einsum("nkd,nkd->nk", diff, diff).min(axis=1)
            # local winner: max d2, tie -> min vec_id
            k = np.lexsort((ids, -d2))[0]
            return pa.table({
                "vec_id": pa.array([ids[k]]),
                "d2": pa.array([int(d2[k])]),
                "embedding": pa.array([b["embedding"][k].as_py()]),
            })

        parts = ds.map_batches(
            winner, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()  # bounded: one row per batch
        best = min(parts, key=lambda r: (-int(r["d2"]), int(r["vec_id"])))
        C.append(np.stack(_quantize([list(best["embedding"])]))[0])
        out_round.append(t)
        out_id.append(int(best["vec_id"]))
        out_d2.append(int(best["d2"]))

    return pa.table({
        "round": pa.array(np.asarray(out_round, dtype=np.int64)),
        "vec_id": pa.array(np.asarray(out_id, dtype=np.int64)),
        "dist2": pa.array(np.asarray(out_d2, dtype=np.int64)),
    })


ANN_AUDIT_K = 5  # the one k both the audit engine and its oracle use


def ann_recall_audit(sf_dir: str, *, k: int = ANN_AUDIT_K):
    """Index-quality evaluation: per query, how many of the trained IVF
    index's top-k survive against the exact brute-force top-k
    (recall@k as an exact permille) — the audit a production ANN
    deployment runs before trusting an index, composed from the two
    existing paths so the comparison can never drift from what the
    registry actually serves.  Both inputs are bounded top-k results
    (n_queries x k rows); the overlap fold is driver-side by
    construction, not a funnel."""
    bf = ann_bruteforce_topk(sf_dir, k=k)
    ivf = ann_ivf_topk(sf_dir, k=k)
    bfd = bf.to_pandas() if hasattr(bf, "to_pandas") else bf
    ivd = ivf.to_pandas() if hasattr(ivf, "to_pandas") else ivf
    bset = set(zip(bfd["query_id"], bfd["vec_id"]))
    qids = np.sort(bfd["query_id"].unique()).astype(np.int64)
    hit = {int(q): 0 for q in qids}
    for q, v in zip(ivd["query_id"], ivd["vec_id"]):
        if (q, v) in bset:
            hit[int(q)] += 1
    n = np.asarray([hit[int(q)] for q in qids], dtype=np.int64)
    return pa.table({
        "query_id": pa.array(qids),
        "n_overlap": pa.array(n),
        "recall_permille": pa.array(1000 * n // k),
    })
