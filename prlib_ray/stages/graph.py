"""Distributed graph analytics over the document corpus.

The web-curation signal family the registry lacked: link-graph
centrality (PageRank is the canonical quality prior a web-scale
pipeline attaches to crawled pages before sampling — the CommonCrawl /
harmonic-centrality discipline).  The fixtures carry no link table, so
the graph SYNTHESIZES deterministically from doc ids in pure mod
arithmetic (the partsupp discipline applied to an edge table), mirrored
1:1 by the oracle's CTEs — doc ids are contiguous 0..N-1 in every
fixture, so the affine targets form a CLOSED node set (no dangling
mass).

Everything is exact int64: ranks start at PR_SCALE, each iteration is

    r[v] <- PR_BASE + sum over in-edges (u -> v) of
            (PR_DAMP_NUM * r[u]) // (PR_DAMP_DEN * outdeg(u))

with floor division on both engines (all values non-negative, so
DuckDB's truncating ``//`` equals numpy's floor).  PR_ITERS is a fixed
unrolled count — the oracle mirrors each iteration as a MATERIALIZED
CTE (the IVF-training lesson: DuckDB re-expands non-materialized
iteration chains exponentially).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

PR_ITERS = 3          # unrolled power-iteration count (oracle mirrors each)
PR_SCALE = 1_000_000  # initial rank mass per node
PR_DAMP_NUM = 85      # damping 0.85 as an exact integer ratio
PR_DAMP_DEN = 100
PR_BASE = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // PR_DAMP_DEN  # 150_000
# out-edges of node i: deg(i) = 1 + i % 3 targets (i*m_j + a_j) % N for
# j < deg(i).  Affine maps keep in-degree near-uniform (a bijection per
# j whenever gcd(m_j, N) == 1); duplicate targets count as parallel
# edges on both engines.
PR_MULT = (17, 29, 41)
PR_ADD = (7, 13, 19)
PR_TOPK = 20
N_PR_PARTS = 32       # coarse dst-hash partitions per iteration fold

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def iter_out_edges(ids: np.ndarray, n_docs: int):
    """Yield (j, live_mask, dst) per affine arm — THE one engine-side
    definition of the synthesized closed graph (deg(i) = 1 + i % 3,
    dst = (i*m_j + a_j) % N), consumed by pagerank_docs AND
    anchor_text_stats so the 'same graph' contract cannot drift; the
    SQL twin is oracles_prep._edge_arms_sql."""
    deg = 1 + ids % 3
    for j, (m, a) in enumerate(zip(PR_MULT, PR_ADD)):
        live = deg > j
        yield j, live, (ids[live] * m + a) % n_docs


def _pr_contribs(n_docs: int):
    """Per-batch edge explosion: (node, r) rank rows -> (dst, contrib,
    part) contribution rows plus one (node, 0) self row per node so
    zero-in-edge nodes persist through the fold."""

    def contribs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "node": pa.array([], type=pa.int64()),
                "c": pa.array([], type=pa.int64()),
                "part": pa.array([], type=pa.int64()),
            })
        node = b["node"].to_numpy().astype(np.int64)
        r = b["r"].to_numpy().astype(np.int64)
        deg = 1 + node % 3
        # per-edge contribution: same value for every out-edge of node
        c = (PR_DAMP_NUM * r) // (PR_DAMP_DEN * deg)
        dst_parts = [node]
        c_parts = [np.zeros(len(node), dtype=np.int64)]  # self rows
        for _, live, dst in iter_out_edges(node, n_docs):
            dst_parts.append(dst)
            c_parts.append(c[live])
        dst = np.concatenate(dst_parts)
        cc = np.concatenate(c_parts)
        part = ((dst.view(np.uint64) * _GOLD)
                % np.uint64(N_PR_PARTS)).astype(np.int64)
        return pa.table({
            "node": pa.array(dst),
            "c": pa.array(cc),
            "part": pa.array(part),
        })

    return contribs


def _pr_fold(g: pd.DataFrame) -> pd.DataFrame:
    """Per coarse partition (a node's contributions all land in its
    hash partition): r_next[v] = PR_BASE + sum(contribs to v)."""
    if len(g) == 0:
        return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                             "r": pd.Series([], dtype=np.int64)})
    node = g["node"].to_numpy().astype(np.int64)
    c = g["c"].to_numpy().astype(np.int64)
    o = np.argsort(node, kind="stable")
    node, c = node[o], c[o]
    starts = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
    sums = np.add.reduceat(c, starts)
    return pd.DataFrame({
        "node": node[starts],
        "r": PR_BASE + sums,
    })


def pagerank_ranks(sf_dir: str):
    """The full (node, r) rank Dataset after PR_ITERS power iterations —
    the reusable inner computation of pagerank_docs, also consumed as
    the crawl-quality PRIOR by pipelines.curate.web_curate."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n_docs = ds.count()  # parquet metadata only — no scan

    def init(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b["doc_id"],
            "r": pa.array(
                np.full(b.num_rows, PR_SCALE, dtype=np.int64)),
        })

    ranks = ds.map_batches(init, batch_format="pyarrow",
                           zero_copy_batch=True)
    for _ in range(PR_ITERS):
        ranks = (
            ranks.map_batches(_pr_contribs(n_docs), batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby("part")
            .map_groups(_pr_fold, batch_format="pandas")
        )
    return ranks


def pagerank_docs(sf_dir: str):
    """Integer PageRank over the synthesized doc link graph; top-PR_TOPK
    pages by (rank DESC, doc_id ASC) — the crawl-quality prior.

    Physical plan per iteration (edges never materialize as a table —
    they regenerate from node ids in closed form, so only rank rows and
    (dst, contrib) int64 pairs ever shuffle): map_batches explodes each
    node's out-edge contributions tagged with hash(dst) % N_PR_PARTS,
    one coarse groupby co-locates every in-edge of a node, one
    vectorized sort + reduceat per part folds r_next.  PR_ITERS
    iterations chain lazily = 2*PR_ITERS narrow/shuffle stages; the
    final top-k is per-batch local top-k -> a <= PR_TOPK * n_blocks
    driver merge (no global sort).  At 10^12 nodes the same plan holds:
    per-iteration shuffle payload is 2 int64 columns x |E|, the fold is
    linear per part, and nothing is ever driver-materialized except the
    bounded top-k candidates.  int64 bound: r <= PR_BASE +
    0.85 * max_indeg * max(r); the affine edge maps keep in-degree <=
    len(PR_MULT) * max_j gcd(PR_MULT[j], N), far from the 2^63 / 85
    overflow point at any realistic N."""
    ranks = pagerank_ranks(sf_dir)

    def local_top(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"node": pa.array([], type=pa.int64()),
                             "r": pa.array([], type=pa.int64())})
        node = b["node"].to_numpy().astype(np.int64)
        r = b["r"].to_numpy().astype(np.int64)
        o = np.lexsort((node, -r))[:PR_TOPK]
        return pa.table({"node": pa.array(node[o]), "r": pa.array(r[o])})

    cands = ranks.map_batches(
        local_top, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # bounded: <= PR_TOPK rows per block
    node = np.asarray([c["node"] for c in cands], dtype=np.int64)
    r = np.asarray([c["r"] for c in cands], dtype=np.int64)
    o = np.lexsort((node, -r))[:PR_TOPK]
    return pa.table({
        "doc_id": pa.array(node[o]),
        "pr": pa.array(r[o]),
    })


# ---------------------------------------------------------------------------
# anchor-text aggregation (the inbound-link signal)

ANCHOR_WORDS = 5      # an edge's anchor text = first K space-split parts
N_ANCHOR_PARTS = 32   # coarse dst-hash partitions for the inbound fold


def anchor_text_stats(sf_dir: str):
    """Per target page: inbound-link count, distinct linking sources and
    total anchor-text chars — the WARC-style anchor aggregation a web
    pipeline runs to enrich each page with how OTHERS describe it (a
    ranking/quality feature next to the PageRank prior).  Same
    synthesized closed graph as pagerank_docs; an edge's anchor text is
    the first ANCHOR_WORDS space-split parts of the SOURCE doc joined
    by ' ' (chars measured in place — anchor text itself never
    shuffles).

    Physical plan: one documents scan explodes each doc's out-edges as
    (dst, src, anchor_len) int64 rows plus a (doc, -1, 0) presence row
    so zero-inlink pages emit a zero row; coarse dst-hash partitions
    co-locate every in-edge of a page; per part ONE lexsort (node, src)
    + run-boundary pass folds count / distinct-src / char sum.  Output
    streams one row per page (a transform — nothing funnels to the
    driver).  At 10^12 pages the shuffle payload is 3 int64 columns x
    (|E| + N)."""
    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    n_docs = ds.count()  # parquet metadata only

    def edges(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "node": pa.array([], type=pa.int64()),
                "src": pa.array([], type=pa.int64()),
                "alen": pa.array([], type=pa.int64()),
                "part": pa.array([], type=pa.int64()),
            })
        ids = b["doc_id"].to_numpy().astype(np.int64)
        texts = b["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lv = pc.split_pattern(texts, pattern=" ")
        if isinstance(lv, pa.ChunkedArray):
            lv = lv.combine_chunks()
        woff = lv.offsets.to_numpy().astype(np.int64)
        wlen = pc.utf8_length(lv.values).to_numpy().astype(np.int64)
        cum = np.r_[0, np.cumsum(wlen)]
        nw = np.diff(woff)
        m = np.minimum(ANCHOR_WORDS, nw)
        alen = cum[woff[:-1] + m] - cum[woff[:-1]] + (m - 1)
        dst_parts = [ids]
        src_parts = [np.full(len(ids), -1, dtype=np.int64)]
        len_parts = [np.zeros(len(ids), dtype=np.int64)]
        for _, live, dst in iter_out_edges(ids, n_docs):
            dst_parts.append(dst)
            src_parts.append(ids[live])
            len_parts.append(alen[live])
        dst = np.concatenate(dst_parts)
        part = ((dst.view(np.uint64) * _GOLD)
                % np.uint64(N_ANCHOR_PARTS)).astype(np.int64)
        return pa.table({
            "node": pa.array(dst),
            "src": pa.array(np.concatenate(src_parts)),
            "alen": pa.array(np.concatenate(len_parts)),
            "part": pa.array(part),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("doc_id", "n_inlinks", "n_sources", "sum_anchor_chars")
        if len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        node = g["node"].to_numpy().astype(np.int64)
        src = g["src"].to_numpy().astype(np.int64)
        alen = g["alen"].to_numpy().astype(np.int64)
        o = np.lexsort((src, node))
        node, src, alen = node[o], src[o], alen[o]
        starts = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
        real = (src >= 0).astype(np.int64)
        n_in = np.add.reduceat(real, starts)
        # distinct src per node: (node, src) run boundaries, presence
        # rows (src == -1) excluded
        new_pair = np.r_[True, (node[1:] != node[:-1])
                         | (src[1:] != src[:-1])]
        distinct = np.add.reduceat((new_pair & (src >= 0)).astype(np.int64),
                                   starts)
        tot = np.add.reduceat(alen, starts)
        return pd.DataFrame({
            "doc_id": node[starts],
            "n_inlinks": n_in,
            "n_sources": distinct,
            "sum_anchor_chars": tot,
        })

    return (
        ds.map_batches(edges, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
    )


def pagerank_mass_audit(sf_dir: str):
    """Per-iteration telemetry of the PageRank computation: total rank
    mass, max rank and node count after every iteration 0..PR_ITERS —
    the no-silent-iteration discipline (lsh_bucket_stats' role for the
    banding pipeline): a power iteration that diverges, loses mass to a
    partitioning bug or collapses onto one node is visible in this
    bounded report before anyone consumes the ranks.

    Physical plan: the SAME iteration kernel as pagerank_ranks
    (_pr_contribs/_pr_fold — shared code, not a re-implementation);
    each iteration's rank Dataset is materialized (it feeds BOTH the
    next iteration and its own bounded aggregate — without pinning, the
    audit fork would re-execute the whole prefix), then reduces via
    per-batch (sum, max, n) partials to ONE row per iteration.  At
    10^12 nodes the materialization is the audit's cost — run it on a
    sampled node range there; the per-iteration report stays 3 int64s.
    int64 bound: total mass <= ~N * PR_SCALE * (1/(1-damp)) — beyond
    ~10^12 nodes move the sum to two int64 limbs (conv_stats' trick)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n_docs = ds.count()

    def init(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b["doc_id"],
            "r": pa.array(np.full(b.num_rows, PR_SCALE, dtype=np.int64)),
        })

    ranks = ds.map_batches(init, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    def stats(ranks_ds, it: int) -> dict:
        def partial(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                z = pa.array([], type=pa.int64())
                return pa.table({"s": z, "m": z, "n": z})
            r = b["r"].to_numpy().astype(np.int64)
            return pa.table({
                "s": pa.array([int(r.sum())]),
                "m": pa.array([int(r.max())]),
                "n": pa.array([len(r)]),
            })

        rows = ranks_ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()  # bounded: one row per block
        return {
            "iteration": it,
            "total_mass": sum(int(r["s"]) for r in rows),
            "max_rank": max(int(r["m"]) for r in rows),
            "n_nodes": sum(int(r["n"]) for r in rows),
        }

    out = [stats(ranks, 0)]
    for t in range(1, PR_ITERS + 1):
        ranks = (
            ranks.map_batches(_pr_contribs(n_docs), batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby("part")
            .map_groups(_pr_fold, batch_format="pandas")
            .materialize()
        )
        out.append(stats(ranks, t))
    return pa.table({
        "iteration": pa.array([o["iteration"] for o in out],
                              type=pa.int64()),
        "total_mass": pa.array([o["total_mass"] for o in out],
                               type=pa.int64()),
        "max_rank": pa.array([o["max_rank"] for o in out],
                             type=pa.int64()),
        "n_nodes": pa.array([o["n_nodes"] for o in out], type=pa.int64()),
    })
