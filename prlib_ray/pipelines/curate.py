"""End-to-end corpus-curation funnel: the pipeline a training-data team
actually runs before spending GPU-hours — quality gate, then exact
dedup, then boilerplate drop — with per-source funnel accounting
(how many documents and tokens each stage kept, per source).

Stages, each reusing an already-oracled operator:

1. **Gopher quality gate** (text_analysis.gopher_quality_batch) — a doc
   enters the funnel only if it passes the published rule bounds.
2. **Exact-text dedup** — among passing docs, the minimum doc_id per
   text survives (md5-truncated uint64 groups; equal texts always
   collide, the repo's pinned convention).  The raw fixtures contain no
   exact dups, so the input is deterministically AUGMENTED (every
   doc_id % PLANT_MOD == 0 doc re-appears at +PLANT_OFFSET with the
   same text/source), mirrored by a UNION ALL in the oracle — the
   dedup stage does real, checked work at every scale.
3. **Heavy-boilerplate drop** (corpus_stats.segment_stats over the
   augmented corpus) — survivors whose duplicate-segment percentage is
   >= HEAVY_PCT are dropped (the C4 removal rule applied at document
   granularity).

Physical plan: the per-doc base table (ints + source, never text) is
materialized ONCE; every funnel stage emits tiny per-source partial
rows that union into a single bounded-key groupby — no driver-side
materialization, no corpus-scale shuffle beyond the two coarse-
partition folds the component operators already do.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from prlib_ray.stages.corpus_stats import N_CORPUS_PARTS, segment_stats
from prlib_ray.stages.text_analysis import gopher_quality_batch

from prlib_ray.blocks import int_bincount

HEAVY_PCT = 50          # drop survivors with removed_pct >= this
PLANT_MOD = 50          # every doc_id % 50 == 0 gets an exact duplicate
PLANT_OFFSET = 1_000_000

FUNNEL_COLS = ("n_docs", "n_gopher", "n_dedup", "n_final", "tokens_final")


def _plant_doc_batch(b: pa.Table) -> pa.Table:
    """Append the deterministic exact-duplicate docs for this batch."""
    ids = b["doc_id"].to_numpy().astype(np.int64)
    if b.schema.field("doc_id").type != pa.int64():
        b = b.set_column(
            b.schema.get_field_index("doc_id"), "doc_id",
            pa.array(ids, type=pa.int64()),
        )
    m = ids % PLANT_MOD == 0
    if not m.any():
        return b
    dup = b.filter(pa.array(m))
    dup = dup.set_column(
        dup.schema.get_field_index("doc_id"), "doc_id",
        pa.array(ids[m] + PLANT_OFFSET, type=pa.int64()),
    )
    return pa.concat_tables([b, dup])


def _by_source(src, values: dict[str, np.ndarray]) -> pa.Table:
    """Per-source integer sums as a funnel-shaped partial table —
    absent funnel columns are zero, so partials from different stages
    union and Sum-aggregate into one result."""
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    d = pc.dictionary_encode(src)
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    srcs = d.dictionary
    n = len(srcs)
    out: dict[str, object] = {"source": srcs}
    for name in FUNNEL_COLS:
        v = values.get(name)
        if v is None:
            out[name] = pa.array(np.zeros(n, dtype=np.int64))
        else:
            out[name] = pa.array(
                int_bincount(codes, v, minlength=n)
            )
    return pa.table(out)


def _empty_funnel() -> pa.Table:
    z = pa.array([], type=pa.int64())
    return pa.table(
        {"source": pa.array([], type=pa.string()),
         **{c: z for c in FUNNEL_COLS}}
    )


def _base_batch(b: pa.Table) -> pa.Table:
    """Per-doc funnel inputs: gopher verdict + token count + the
    md5-truncated text-group key.  Text never leaves this stage."""
    if b.num_rows == 0:
        z = pa.array([], type=pa.int64())
        return pa.table(
            {"doc_id": z, "source": pa.array([], type=pa.string()),
             "n_words": z, "passes": z,
             "h": pa.array([], type=pa.uint64()), "hpart": z}
        )
    q = gopher_quality_batch(b)
    texts = b["text"].to_pylist()
    h = np.fromiter(
        (int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
         for t in texts),
        dtype=np.uint64,
        count=len(texts),
    )
    return pa.table(
        {
            "doc_id": pa.array(b["doc_id"].to_numpy().astype(np.int64)),
            "source": b["source"],
            "n_words": q["n_words"],
            "passes": q["passes"],
            "h": pa.array(h),
            "hpart": pa.array((h % np.uint64(N_CORPUS_PARTS)).astype(np.int64)),
        }
    )


def curate_corpus(sf_dir: str):
    """The funnel: per source, documents entering, passing the Gopher
    gate, surviving exact dedup, and surviving the boilerplate drop —
    plus the final surviving token count.  One row per source."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    aug = docs.map_batches(
        _plant_doc_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    # doc-keyed ints + source only; consumed by two stages -> one pass
    # over the text, materialized once
    base = aug.map_batches(
        _base_batch, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # Every funnel-partial UDF returns ARROW so all three streams union
    # into one uniform block type (mixed pandas/arrow blocks crash the
    # final output iterator; round 4 flipped the uniform type from
    # pandas to Arrow when the group folds went Arrow-native); the
    # map_groups-derived streams are repartition-coalesced first because
    # sparse sort partitions emit schema-less empty blocks that BYPASS
    # map UDFs (the repo-wide empty-block lesson,
    # tests/test_edge_corpus.py).
    def s1(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _empty_funnel()
        return _by_source(
            b["source"],
            {"n_docs": np.ones(b.num_rows, dtype=np.int64),
             "n_gopher": b["passes"].to_numpy().astype(np.int64)},
        )

    p1 = base.map_batches(s1, batch_format="pyarrow", zero_copy_batch=True)

    # stage 2: min doc_id per text-hash among passing docs, one
    # vectorized pass per coarse hash partition
    passing = base.map_batches(
        lambda b: b.filter(pc.equal(b["passes"], 1)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def surv_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc_id": z,
                             "source": pa.array([], type=pa.string()),
                             "n_words": z, "tag": z, "dpart": z})
        h = g["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, h))
        first = np.r_[True, h[order][1:] != h[order][:-1]]
        sel = order[first]
        srcs = np.asarray(g["source"].to_pylist(), dtype=object)
        nw = g["n_words"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids[sel]),
                "source": pa.array(srcs[sel], type=pa.string()),
                "n_words": pa.array(nw[sel]),
                "tag": pa.array(np.zeros(len(sel), dtype=np.int64)),
                "dpart": pa.array(ids[sel] % N_CORPUS_PARTS),
            }
        )

    survivors = (
        passing.groupby("hpart")
        .map_groups(surv_fold, batch_format="pyarrow")
        .materialize()
        .repartition(8)  # coalesce the sparse sort partitions' empties
    )

    def s2(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _empty_funnel()
        return _by_source(
            b["source"], {"n_dedup": np.ones(b.num_rows, dtype=np.int64)}
        )

    p2 = survivors.map_batches(s2, batch_format="pyarrow")

    # stage 3: heavy-boilerplate doc ids from the (augmented) segment
    # accounting, anti-joined against the survivors per doc partition
    def heavy_rows(b: pa.Table) -> pa.Table:
        m = b["removed_pct"].to_numpy(zero_copy_only=False) >= HEAVY_PCT
        ids = b["doc_id"].to_numpy(
            zero_copy_only=False).astype(np.int64)[m]
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "source": pa.array([""] * len(ids), type=pa.string()),
                "n_words": pa.array(np.zeros(len(ids), dtype=np.int64)),
                "tag": pa.array(np.ones(len(ids), dtype=np.int64)),
                "dpart": pa.array(ids % N_CORPUS_PARTS),
            }
        )

    heavy = (
        segment_stats(aug)
        .repartition(8)
        .map_batches(heavy_rows, batch_format="pyarrow")
    )

    def anti(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty_funnel()
        tag = g["tag"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (tag == 0) & ~np.isin(ids, ids[tag == 1])
        if not keep.any():
            return _empty_funnel()
        kept = g.take(np.flatnonzero(keep))
        return _by_source(
            kept["source"],
            {"n_final": np.ones(kept.num_rows, dtype=np.int64),
             "tokens_final": kept["n_words"].to_numpy(
                 zero_copy_only=False).astype(np.int64)},
        )

    p3 = (
        survivors.union(heavy)
        .groupby("dpart")
        .map_groups(anti, batch_format="pyarrow")
    )

    return (
        p1.union(p2)
        .union(p3)
        .groupby("source")
        .aggregate(*[Sum(c, alias_name=c) for c in FUNNEL_COLS])
    )


# ---------------------------------------------------------------------------
# web-curation funnel: graph signals feeding the quality gate

WEB_PRIOR_MIN = 1_000_000   # keep iff pagerank r >= initial mass PR_SCALE
WEB_MIN_INLINKS = 2         # and >= this many inbound links
N_WEB_PARTS = 32


def web_curate(sf_dir: str):
    """The web-corpus curation funnel: per source, documents entering,
    passing the Gopher gate, carrying a PageRank prior >= WEB_PRIOR_MIN,
    and also having >= WEB_MIN_INLINKS inbound links — the
    CommonCrawl-style pipeline where LINK-GRAPH signals (centrality,
    in-degree) gate alongside content quality.  One row per source.

    Physical plan: three int-row streams union into ONE coarse id-hash
    shuffle — (id, passes, source) from the text scan, (id, r) from
    pagerank_ranks (the shared iterative kernel), and per-batch
    pre-combined (dst, count) in-edge partials from a doc_id-only scan
    (edges regenerate in closed form via graph.iter_out_edges; no
    second text read, no anchor-char work).  Per part ONE lexsort
    (id, kind) resolves every doc's (passes, r, n_inlinks) — the id's
    rows are adjacent, kind 0/1 lead the run — and folds per-source
    counts; <= 4 * sources rows per part reach the bounded final
    groupby.  Thresholds were measured for a real split before wiring
    (sf0.001: 500 -> 208 gopher -> prior/inlink cuts below that)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from prlib_ray.stages.graph import iter_out_edges, pagerank_ranks

    gold = np.uint64(0x9E3779B97F4A7C15)

    def tag_part(ids: np.ndarray) -> np.ndarray:
        return ((ids.view(np.uint64) * gold)
                % np.uint64(N_WEB_PARTS)).astype(np.int64)

    def empty_stream() -> pa.Table:
        z = pa.array([], type=pa.int64())
        return pa.table({"id": z, "kind": z, "a": z,
                         "src": pa.array([], type=pa.string()),
                         "part": z})

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def base(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty_stream()
        ids = b["doc_id"].to_numpy().astype(np.int64)
        q = gopher_quality_batch(b)
        return pa.table({
            "id": pa.array(ids),
            "kind": pa.array(np.zeros(len(ids), dtype=np.int64)),
            "a": q["passes"],
            "src": b["source"],
            "part": pa.array(tag_part(ids)),
        })

    def rank_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty_stream()
        ids = b["node"].to_numpy().astype(np.int64)
        return pa.table({
            "id": pa.array(ids),
            "kind": pa.array(np.ones(len(ids), dtype=np.int64)),
            "a": b["r"],
            "src": pa.array([""] * len(ids), type=pa.string()),
            "part": pa.array(tag_part(ids)),
        })

    ids_only = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    n_docs = ids_only.count()  # parquet metadata only

    def inlink_partials(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty_stream()
        ids = b["doc_id"].to_numpy().astype(np.int64)
        dst = np.concatenate(
            [d for _, _, d in iter_out_edges(ids, n_docs)])
        u, c = np.unique(dst, return_counts=True)
        return pa.table({
            "id": pa.array(u),
            "kind": pa.array(np.full(len(u), 2, dtype=np.int64)),
            "a": pa.array(c.astype(np.int64)),
            "src": pa.array([""] * len(u), type=pa.string()),
            "part": pa.array(tag_part(u)),
        })

    stream = (
        docs.map_batches(base, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            pagerank_ranks(sf_dir).map_batches(
                rank_rows, batch_format="pyarrow", zero_copy_batch=True),
            ids_only.map_batches(
                inlink_partials, batch_format="pyarrow",
                zero_copy_batch=True),
        )
    )

    def fold(g: pa.Table) -> pa.Table:
        cols = ("source", "n_docs", "n_gopher", "n_prior", "n_final")
        if g.num_rows == 0:
            return pa.table({
                "source": pa.array([], type=pa.string()),
                **{c: pa.array([], type=pa.int64()) for c in cols[1:]},
            })
        ids = g["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kind = g["kind"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = g["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.asarray(g["src"].to_pylist(), dtype=object)
        o = np.lexsort((kind, ids))
        ids, kind, a, src = ids[o], kind[o], a[o], src[o]
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        assert (kind[starts] == 0).all() and (kind[starts + 1] == 1).all()
        passes = a[starts]
        r = a[starts + 1]
        n_in = np.add.reduceat(a * (kind == 2), starts)
        prior = (passes == 1) & (r >= WEB_PRIOR_MIN)
        final = prior & (n_in >= WEB_MIN_INLINKS)
        uniq, codes = np.unique(src[starts], return_inverse=True)
        nsrc = len(uniq)
        # masked integer bincounts (never float weights= — the repo's
        # 2^53 exactness rule)
        return pa.table({
            "source": pa.array(uniq, type=pa.string()),
            "n_docs": pa.array(
                np.bincount(codes, minlength=nsrc).astype(np.int64)),
            "n_gopher": pa.array(np.bincount(
                codes[passes == 1], minlength=nsrc).astype(np.int64)),
            "n_prior": pa.array(np.bincount(
                codes[prior], minlength=nsrc).astype(np.int64)),
            "n_final": pa.array(np.bincount(
                codes[final], minlength=nsrc).astype(np.int64)),
        })

    out = (
        stream.groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_gopher", alias_name="n_gopher"),
                   Sum("n_prior", alias_name="n_prior"),
                   Sum("n_final", alias_name="n_final"))
        .sort("source")
    )
    return out
