"""Block substrate: turn text -> flat block arrays + windowed statistics.

This is the engine's analogue of the reference's shared image kernels
(/root/reference/src/imageLibCommon.cpp): every threshold-family stage
splits a document's text into *blocks* and computes local windowed
mean/variance of a per-block integer feature.  The windowed sums are
computed with prefix sums over a flat array — the direct analogue of the
reference's integral-image trick (binarizeSauvola.cpp:72: `cv::integral`)
— so a whole Arrow batch of documents is processed in O(total blocks)
numpy work with no per-row Python math.

Edge policy: windows are *clamped* to the document's block range
(ROWS BETWEEN p PRECEDING AND f FOLLOWING semantics), the analogue of the
reference's BORDER_REPLICATE padding (binarizeSauvola.cpp:65).  This is
deliberately chosen to coincide with SQL window-frame semantics so every
stage has an exact DuckDB oracle.

Float determinism contract (required for value-hash oracle parity):
features are int64; window sums are exact integers; means/variances are
derived with the exact same IEEE-754 float64 expressions the oracle SQL
uses (`avg(x)`, `avg(x*x) - avg(x)*avg(x)`, `sqrt(greatest(v, 0))`).
Integer sums stay far below 2^53, so accumulation order cannot change
the result.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

__all__ = [
    "BlockFrame",
    "split_words_blocks",
    "split_line_blocks",
    "window_mean_var",
    "window_sum",
    "doc_broadcast",
    "join_kept",
    "int_bincount",
]


_BOUND_LOG = None
_BOUND_SEEN: set[str] = set()


def note_bounded_input(op: str, n_total: int, bound_name: str,
                       bound_value: int) -> bool:
    """Loud-truncation discipline for the bounded all-pairs oracle
    baselines (ann_neighbor_counts / embedding_near_dup_pairs /
    the _bounded_candidate_pairs family): fixture ids are dense from 0,
    so an input with more rows than the id bound necessarily has rows
    outside it.  Emits a warning (once per op name per process) naming
    the bound and the scale-path twin's existence — the observable-cap
    discipline `_pair_indices` uses, applied to the driver-side
    baselines.  The check itself runs at every query construction
    (n_total is a parquet-metadata count, no extra scan).  Returns True
    iff the input was truncated (so callers/tests can assert on it)."""
    global _BOUND_LOG
    if n_total <= bound_value:
        return False
    if op in _BOUND_SEEN:
        return True
    _BOUND_SEEN.add(op)
    if _BOUND_LOG is None:
        import logging

        _BOUND_LOG = logging.getLogger("prlib_ray.bounded")
    _BOUND_LOG.warning(
        "%s: input has %d rows but this exact baseline is bounded to "
        "ids < %s=%d; rows outside the bound are ignored — run the "
        "scale-path twin (LSH / prefix-filter / IVF) for full coverage",
        op, n_total, bound_name, bound_value)
    return True


def int_bincount(idx, weights, minlength: int = 0) -> np.ndarray:
    """Exact int64 grouped sum — a drop-in for
    ``np.bincount(idx, weights=...)`` at the exact-integer fold sites.

    ``np.bincount`` accumulates *weights* in float64, so grouped sums
    >= 2^53 silently lose exactness, which would break the engine's
    exact-integer oracle contracts at 10^12-row scale.  This
    accumulates on an int64 array instead: when ``idx`` is already
    sorted (the common case — these folds derive group ids as
    ``cumsum(run_boundaries)`` over lexsorted keys) one
    ``np.add.reduceat`` pass, exact and O(n); otherwise one stable
    argsort first.
    """
    idx = np.asarray(idx, dtype=np.int64)
    w = np.asarray(weights)
    if w.dtype != np.int64:
        w = w.astype(np.int64)
    n = int(minlength)
    if idx.size:
        n = max(n, int(idx.max()) + 1)
    out = np.zeros(n, dtype=np.int64)
    if idx.size == 0:
        return out
    if np.all(idx[:-1] <= idx[1:]):
        s_idx, s_w = idx, w
    else:
        o = np.argsort(idx, kind="stable")
        s_idx, s_w = idx[o], w[o]
    if s_idx[0] < 0:
        # np.bincount raises on negatives; Python-style negative
        # indexing here would silently corrupt other groups' sums
        raise ValueError("int_bincount: negative group ids")
    starts = np.flatnonzero(np.r_[True, s_idx[1:] != s_idx[:-1]])
    out[s_idx[starts]] = np.add.reduceat(s_w, starts)
    return out


@dataclass
class BlockFrame:
    """Flat block representation of a batch of documents.

    ``doc_offsets[d]:doc_offsets[d+1]`` is the block index range of
    document d; ``blocks`` holds the block strings — either a Python
    list or a ``pa.StringArray`` (the Arrow tokenizer keeps them in
    Arrow so downstream joins stay vectorized; call
    ``block_strings()`` when Python strings are genuinely needed);
    ``x`` the per-block integer feature (default: character length).
    """

    doc_offsets: np.ndarray  # int64, shape (ndocs + 1,)
    blocks: "list[str] | pa.StringArray"
    x: np.ndarray  # int64, shape (nblocks,)

    def block_strings(self) -> list[str]:
        """Block texts as a Python list (materialized once, cached)."""
        if not isinstance(self.blocks, list):
            self.blocks = self.blocks.to_pylist()
        return self.blocks

    @property
    def ndocs(self) -> int:
        return len(self.doc_offsets) - 1

    @property
    def nblocks(self) -> int:
        return len(self.x)  # x is always aligned; blocks may be elided
        # by stats-only frames

    def doc_of_block(self) -> np.ndarray:
        """int64 doc index per block (np.repeat over offsets)."""
        counts = np.diff(self.doc_offsets)
        return np.repeat(np.arange(self.ndocs, dtype=np.int64), counts)

    def block_idx_within_doc(self) -> np.ndarray:
        """0-based block index within each document."""
        starts = np.repeat(self.doc_offsets[:-1], np.diff(self.doc_offsets))
        return np.arange(self.nblocks, dtype=np.int64) - starts


def split_words_blocks(
    texts: "list[str] | pa.Array | pa.ChunkedArray", words_per_block: int
) -> BlockFrame:
    """Split each text on single spaces into blocks of ``words_per_block``.

    SQL-parity contract (see prlib_ray/oracles.py): words =
    ``string_split(text, ' ')`` (empties preserved), 1-based word index i,
    block id = (i-1) // words_per_block, block text = words re-joined
    with ' '.  Empty text still yields one (empty) block, matching
    ``string_split('', ' ') = ['']``.

    Fully Arrow: ``pc.split_pattern`` + offsets math (the technique
    proven in boilerplate._extract_batch_arrow) — word/block boundaries,
    the char-length feature and the block texts are all computed without
    a Python loop.  ``blocks`` stays a ``pa.StringArray``; kept-block
    joining (join_kept) consumes it in Arrow directly.
    """
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        arr = texts.combine_chunks()
    elif isinstance(texts, pa.Array):
        arr = texts
    else:
        arr = pa.array(texts, type=pa.string())
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    lv = pc.split_pattern(arr, pattern=" ")
    if isinstance(lv, pa.ChunkedArray):
        lv = lv.combine_chunks()
    word_offs = lv.offsets.to_numpy().astype(np.int64)  # (ndocs+1,)
    words = lv.values
    nw = np.diff(word_offs)  # words per doc (>= 1: '' splits to [''])
    nb = (nw + words_per_block - 1) // words_per_block
    doc_offsets = np.concatenate(([0], np.cumsum(nb, dtype=np.int64)))
    nblocks = int(doc_offsets[-1])
    # per-block word ranges [w_start, w_end): contiguous and partitioning
    # the flat word array (last block of doc d ends where doc d+1 starts)
    b_in_doc = np.arange(nblocks, dtype=np.int64) - np.repeat(
        doc_offsets[:-1], nb
    )
    w_start = np.repeat(word_offs[:-1], nb) + b_in_doc * words_per_block
    w_end = np.minimum(
        w_start + words_per_block, np.repeat(word_offs[1:], nb)
    )
    # x = char length of the re-joined block: sum of word char lengths
    # plus the (k-1) single-space separators
    wlen = pc.utf8_length(words).to_numpy().astype(np.int64)
    csum = np.concatenate(([0], np.cumsum(wlen, dtype=np.int64)))
    x = csum[w_end] - csum[w_start] + (w_end - w_start - 1)
    block_list = pa.ListArray.from_arrays(
        pa.array(np.concatenate((w_start, [word_offs[-1]])), type=pa.int32()),
        words,
    )
    blocks_arr = pc.binary_join(block_list, " ")
    if isinstance(blocks_arr, pa.ChunkedArray):
        blocks_arr = blocks_arr.combine_chunks()
    return BlockFrame(doc_offsets=doc_offsets, blocks=blocks_arr, x=x)


def split_line_blocks(texts: list[str]) -> BlockFrame:
    """Split each text on newlines: one block per line (transcript turns)."""
    offsets = np.empty(len(texts) + 1, dtype=np.int64)
    offsets[0] = 0
    blocks: list[str] = []
    for d, t in enumerate(texts):
        lines = t.split("\n")
        blocks.extend(lines)
        offsets[d + 1] = len(blocks)
    x = np.fromiter((len(b) for b in blocks), dtype=np.int64, count=len(blocks))
    return BlockFrame(doc_offsets=offsets, blocks=blocks, x=x)


def _window_bounds(
    frame: BlockFrame, preceding: int, following: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-block inclusive flat index bounds of the clamped window."""
    counts = np.diff(frame.doc_offsets)
    starts = np.repeat(frame.doc_offsets[:-1], counts)
    ends = np.repeat(frame.doc_offsets[1:], counts) - 1  # inclusive
    idx = np.arange(frame.nblocks, dtype=np.int64)
    lo = np.maximum(starts, idx - preceding)
    hi = np.minimum(ends, idx + following)
    return lo, hi


def window_sum(
    values: np.ndarray, frame: BlockFrame, preceding: int, following: int
) -> tuple[np.ndarray, np.ndarray]:
    """Exact windowed sum + count of an int64 array over clamped frames."""
    lo, hi = _window_bounds(frame, preceding, following)
    csum = np.concatenate(([0], np.cumsum(values, dtype=np.int64)))
    return csum[hi + 1] - csum[lo], (hi - lo + 1)


def window_mean_var(
    frame: BlockFrame, preceding: int, following: int, values: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Clamped-window mean, population variance and stddev of the feature.

    Bit-identical to the oracle SQL
    ``avg(x) OVER w``, ``avg(x*x) OVER w - avg(x) OVER w * avg(x) OVER w``
    (clipped at 0), ``sqrt(...)`` with
    ``w = (PARTITION BY doc ORDER BY idx ROWS BETWEEN p PRECEDING AND f FOLLOWING)``.
    """
    x = frame.x if values is None else values
    s, cnt = window_sum(x, frame, preceding, following)
    s2, _ = window_sum(x * x, frame, preceding, following)
    cnt_f = cnt.astype(np.float64)
    mean = s.astype(np.float64) / cnt_f
    var = s2.astype(np.float64) / cnt_f - mean * mean
    var = np.maximum(var, 0.0)
    return mean, var, np.sqrt(var)


def doc_broadcast(
    values: np.ndarray, frame: BlockFrame, op: str
) -> np.ndarray:
    """Per-document aggregate of ``values`` broadcast back to every block.

    op in {"min", "max", "sum", "mean"}.  The reference's "global"
    statistics are per-image, i.e. per-document here (binarizeWolfJolion
    needs global min intensity / max stddev: binarizeWolfJolion.cpp:114-130).
    """
    counts = np.diff(frame.doc_offsets)
    out = np.empty(frame.ndocs, dtype=np.float64)
    if op in ("min", "max"):
        ufunc = np.minimum if op == "min" else np.maximum
        agg = ufunc.reduceat(values.astype(np.float64), frame.doc_offsets[:-1])
        # reduceat on an empty doc slice returns values[offset]; docs always
        # have >= 1 block by construction, so no fixup needed.
        out = agg
    elif op == "sum":
        csum = np.concatenate(([0], np.cumsum(values, dtype=np.float64)))
        out = csum[frame.doc_offsets[1:]] - csum[frame.doc_offsets[:-1]]
    elif op == "mean":
        if values.dtype == np.int64:
            csum = np.concatenate(([0], np.cumsum(values, dtype=np.int64)))
            sums = (csum[frame.doc_offsets[1:]] - csum[frame.doc_offsets[:-1]]).astype(
                np.float64
            )
        else:
            csum = np.concatenate(([0], np.cumsum(values, dtype=np.float64)))
            sums = csum[frame.doc_offsets[1:]] - csum[frame.doc_offsets[:-1]]
        out = sums / counts.astype(np.float64)
    else:  # pragma: no cover
        raise ValueError(f"unknown op {op!r}")
    return np.repeat(out, counts)


def join_kept(
    frame: BlockFrame, keep: np.ndarray, sep: str = "\n"
) -> list[str]:
    """Join each document's kept blocks with ``sep`` (order preserved).

    SQL parity: ``coalesce(string_agg(block, chr(10) ORDER BY bidx)
    FILTER (WHERE keep), '')`` — a doc with no kept blocks yields ''.

    When the frame's blocks are a ``pa.StringArray`` (the Arrow
    tokenizer path), the join is filter + ListArray + binary_join —
    no per-doc Python.
    """
    blocks = frame.blocks
    offs = frame.doc_offsets
    if not isinstance(blocks, list):
        import pyarrow.compute as pc

        kept_vals = blocks.filter(pa.array(keep))
        doc = frame.doc_of_block()
        kept_counts = np.bincount(doc[keep], minlength=frame.ndocs)
        loffs = np.concatenate(([0], np.cumsum(kept_counts, dtype=np.int64)))
        lst = pa.ListArray.from_arrays(
            pa.array(loffs, type=pa.int32()), kept_vals
        )
        return pc.binary_join(lst, sep).to_pylist()
    out: list[str] = []
    for d in range(frame.ndocs):
        lo, hi = offs[d], offs[d + 1]
        out.append(sep.join(blocks[i] for i in range(lo, hi) if keep[i]))
    return out


def md5_ladder_positions(payloads, m: int, depth: int,
                         prefix1: bytes, prefix2: bytes) -> np.ndarray:
    """(len(payloads), depth) hash positions in [0, m): the shared
    Kirsch-Mitzenmacher double-hash ladder used by every probabilistic
    membership/count structure (relational._bloom_positions,
    corpus_stats._cms_positions).

    h1 / h2 = big-endian uint64 of md5(prefix + payload)[:8] — the
    md5_number_upper byteswap contract (oracles_data._byteswap8) —
    and BOTH pre-reduce mod m before the ``h1 + j*h2`` ladder so
    j * (h2 % m) stays far below 2^64: DuckDB HUGEINT never wraps, so
    the engine must not wrap either.  ``payloads`` must be a sequence
    (it is iterated twice)."""
    import hashlib

    mm = np.uint64(m)
    h1 = np.fromiter(
        (int.from_bytes(hashlib.md5(prefix1 + p).digest()[:8], "big")
         for p in payloads),
        dtype=np.uint64, count=len(payloads),
    ) % mm
    h2 = np.fromiter(
        (int.from_bytes(hashlib.md5(prefix2 + p).digest()[:8], "big")
         for p in payloads),
        dtype=np.uint64, count=len(payloads),
    ) % mm
    j = np.arange(depth, dtype=np.uint64)
    return ((h1[:, None] + j[None, :] * h2[:, None]) % mm).astype(np.int64)
