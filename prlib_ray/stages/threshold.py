"""Threshold family: PRLib's binarization ops as block keep/drop rules.

Reference semantics (all in /root/reference/src/binarizations/): compute a
per-pixel threshold from local windowed statistics and emit a binary
mask (`outputImage = input > thresholds`, binarizeSauvola.cpp:122).  The
family members share one skeleton — grayscale, integral image, local
mean/std (binarizeSauvola.cpp:72-118) — and differ only in the threshold
formula.

Here the document's text is split into blocks; the per-block integer
feature x (char length by default — "ink density") is thresholded
against statistics of a clamped window of neighboring blocks; kept
blocks are re-joined into ``clean_text``.  The integral image becomes a
prefix sum over the flat block array (prlib_ray/blocks.py), so each
Arrow batch is O(total blocks) of numpy work.

Every rule is written so an exact DuckDB oracle exists: integer features,
window sums < 2^53 (exact in float64 in any accumulation order), and the
same IEEE expression tree on both sides (see prlib_ray/oracles.py).

Execution shape: stateless ``ds.map_batches(fn, batch_format="pyarrow")``
— one task per block of rows, no shuffle (window statistics live inside
one document).  The reference's "global" statistics (WolfJolion/Feng
minima: binarizeWolfJolion.cpp:114-130) are per-*image*, i.e. per-
document here, so they too stay inside the map.  A corpus-global variant
(aggregate-then-broadcast) is provided by ``binarize_wolf_global``.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

from prlib_ray.blocks import (
    BlockFrame,
    doc_broadcast,
    join_kept,
    split_words_blocks,
    window_mean_var,
    window_sum,
)

# Default analogue parameters.  Reference defaults: windowSize=101 px,
# k=0.01 (binarizeSauvola.h:43-47); our window unit is blocks.
WORDS_PER_BLOCK = 12
PRECEDING = 2
FOLLOWING = 2
SAUVOLA_R = 128.0


# ---------------------------------------------------------------------------
# Keep rules.  Each takes the frame + windowed stats and returns a bool mask.
# ---------------------------------------------------------------------------

def _rule_sauvola(frame: BlockFrame, m, v, s, p) -> np.ndarray:
    # t = m * (1 + k*(s/R - 1))   (binarizeSauvola.cpp:112-118, R=128)
    k = p.get("k", 0.01)
    t = m * (1.0 + k * (s / SAUVOLA_R - 1.0))
    return frame.x > t


def _rule_niblack(frame: BlockFrame, m, v, s, p) -> np.ndarray:
    # t = m + k*s   (binarizeNiblack.cpp:107-108)
    k = p.get("k", 0.25)
    return frame.x > m + k * s


def _rule_nick(frame: BlockFrame, m, v, s, p) -> np.ndarray:
    # t = m + k*sqrt(s^2 + m^2)   (binarizeNICK.cpp:121-126, k default -0.01)
    k = p.get("k", -0.125)
    return frame.x > m + k * np.sqrt(s * s + m * m)


def _rule_wolf(frame: BlockFrame, m, v, s, p) -> np.ndarray:
    # t = m + k*(s/s_max - 1)*(m - min_x); s_max, min_x per document
    # (binarizeWolfJolion.cpp:114-130 — "global" = whole image = one doc).
    k = p.get("k", 0.5)
    s_max = np.maximum(doc_broadcast(s, frame, "max"), 1e-9)
    x_min = doc_broadcast(frame.x.astype(np.float64), frame, "min")
    t = m + k * (s / s_max - 1.0) * (m - x_min)
    return frame.x > t


def _rule_feng(frame: BlockFrame, m, v, s, p) -> np.ndarray:
    # t = (1-a1)*m + k1*p2*(m - min_x) + k2*p2*min_x with p2 = (s/Rs)^2,
    # Rs = per-doc max s (binarizeFeng.cpp:110-143, gamma fixed to 2 so the
    # power is a plain square — exact in both numpy and SQL).
    a1 = p.get("alpha1", 0.75)
    k1 = p.get("k1", 0.25)
    k2 = p.get("k2", 0.04)
    rs = np.maximum(doc_broadcast(s, frame, "max"), 1e-9)
    x_min = doc_broadcast(frame.x.astype(np.float64), frame, "min")
    p2 = (s / rs) * (s / rs)
    t = (1.0 - a1) * m + k1 * p2 * (m - x_min) + k2 * p2 * x_min
    return frame.x > t


def _rule_pure_adaptive(frame: BlockFrame, m, v, s, p) -> np.ndarray:
    # bare adaptiveThreshold mean-C (binarizePureAdaptive.cpp:55-60).
    # Integer-exact form: cnt*x > sum - C*cnt  <=>  x > mean - C.
    c = p.get("shift", 2)
    sm, cnt = window_sum(frame.x, frame, p["preceding"], p["following"])
    return cnt * frame.x > sm - c * cnt


def _gaussian_weighted_sum(frame: BlockFrame, radius: int, weights: list[int]):
    """Integer binomial-weighted window sum with clamped edges.

    weights is the full kernel (len 2*radius+1), e.g. [1,4,6,4,1].
    Returns (sum of w*x, sum of w) restricted to in-document neighbors.
    """
    counts = np.diff(frame.doc_offsets)
    starts = np.repeat(frame.doc_offsets[:-1], counts)
    ends = np.repeat(frame.doc_offsets[1:], counts) - 1
    idx = np.arange(frame.nblocks, dtype=np.int64)
    wx = np.zeros(frame.nblocks, dtype=np.int64)
    wt = np.zeros(frame.nblocks, dtype=np.int64)
    for off in range(-radius, radius + 1):
        w = weights[off + radius]
        j = idx + off
        ok = (j >= starts) & (j <= ends)
        jc = np.clip(j, 0, frame.nblocks - 1)
        wx += np.where(ok, frame.x[jc] * w, 0)
        wt += np.where(ok, w, 0)
    return wx, wt


def _rule_pure_adaptive_gaussian(frame: BlockFrame, m, v, s, p) -> np.ndarray:
    # adaptiveThreshold Gaussian-C: x > weighted_mean - C, integer-exact:
    # wt*x > wx - C*wt.
    c = p.get("shift", 2)
    radius = p.get("preceding", PRECEDING)
    weights = _binomial(radius)
    wx, wt = _gaussian_weighted_sum(frame, radius, weights)
    return wt * frame.x > wx - c * wt


def _binomial(radius: int) -> list[int]:
    row = [1]
    for _ in range(2 * radius):
        row = [1] + [row[i] + row[i + 1] for i in range(len(row) - 1)] + [1]
    return row


def _median_window(frame: BlockFrame, radius: int = 1) -> np.ndarray:
    """Windowed median of x (medianBlur analogue), clamped edges.

    Exact parity with DuckDB `median(x) OVER (... ROWS BETWEEN radius
    PRECEDING AND radius FOLLOWING)`: median of an even count is the
    mean of the two middle values (a .5-exact float).

    radius=1 (the only radius the rules use) is fully vectorized:
    median-of-3 = a+b+c-min-max over shifted arrays, doc-edge windows of
    2 are the .5-exact pair mean — no per-block Python.
    """
    x = frame.x
    n = frame.nblocks
    if radius != 1:  # pragma: no cover - generic fallback, unused by rules
        counts = np.diff(frame.doc_offsets)
        starts = np.repeat(frame.doc_offsets[:-1], counts)
        ends = np.repeat(frame.doc_offsets[1:], counts) - 1
        idx = np.arange(n, dtype=np.int64)
        lo = np.maximum(starts, idx - radius)
        hi = np.minimum(ends, idx + radius)
        out = np.empty(n, dtype=np.float64)
        for i in range(n):
            w = np.sort(x[lo[i] : hi[i] + 1])
            k = len(w)
            out[i] = (
                float(w[k // 2]) if k % 2
                else (float(w[k // 2 - 1]) + float(w[k // 2])) / 2.0
            )
        return out
    if n == 0:
        return np.empty(0, dtype=np.float64)
    doc = frame.doc_of_block()
    has_prev = np.zeros(n, dtype=bool)
    has_prev[1:] = doc[1:] == doc[:-1]
    has_next = np.zeros(n, dtype=bool)
    has_next[:-1] = doc[:-1] == doc[1:]
    pv = np.empty(n, dtype=np.int64)
    pv[0] = 0
    pv[1:] = x[:-1]
    nx = np.empty(n, dtype=np.int64)
    nx[-1] = 0
    nx[:-1] = x[1:]
    out = x.astype(np.float64)  # singleton windows: the value itself
    both = has_prev & has_next
    a, b, c = pv[both], x[both], nx[both]
    mx = np.maximum(np.maximum(a, b), c)
    mn = np.minimum(np.minimum(a, b), c)
    out[both] = (a + b + c - mx - mn).astype(np.float64)
    left = ~has_prev & has_next  # first block of a >=2-block doc
    out[left] = (x[left] + nx[left]) / 2.0
    right = has_prev & ~has_next  # last block
    out[right] = (pv[right] + x[right]) / 2.0
    return out


def _rule_at(frame: BlockFrame, m, v, s, p) -> np.ndarray:
    # medianBlur -> adaptiveThreshold mean (binarizeAT.cpp:54-65).
    c = p.get("shift", 2)
    med = _median_window(frame, 1)
    sm, cnt = window_sum(frame.x, frame, p["preceding"], p["following"])
    mean = sm.astype(np.float64) / cnt.astype(np.float64)
    return med > mean - float(c)


def _rule_agt(frame: BlockFrame, m, v, s, p) -> np.ndarray:
    # medianBlur -> adaptiveThreshold Gaussian (binarizeAGT.cpp:33-60).
    c = p.get("shift", 2)
    radius = p.get("preceding", PRECEDING)
    med = _median_window(frame, 1)
    wx, wt = _gaussian_weighted_sum(frame, radius, _binomial(radius))
    wmean = wx.astype(np.float64) / wt.astype(np.float64)
    return med > wmean - float(c)


def _rule_gat(frame: BlockFrame, m, v, s, p) -> np.ndarray:
    # GaussianBlur -> adaptiveThreshold mean (binarizeGAT.cpp:33-68).
    # Integer-exact: compare wt*cnt*x against cnt*wx - ... keep float but
    # exact: gaussian-smoothed value g = wx/wt vs window mean - C.
    c = p.get("shift", 2)
    radius = 1
    wx, wt = _gaussian_weighted_sum(frame, radius, _binomial(radius))
    g = wx.astype(np.float64) / wt.astype(np.float64)
    sm, cnt = window_sum(frame.x, frame, p["preceding"], p["following"])
    mean = sm.astype(np.float64) / cnt.astype(np.float64)
    return g > mean - float(c)


def _rule_mokji(frame: BlockFrame, m, v, s, p) -> np.ndarray:
    # Global threshold from the co-occurrence of adjacent (pixel, neighbour)
    # pairs with edge magnitude >= minEdgeMagnitude (binarizeMokji.cpp:55-93).
    # Analogue: T = mean of (x_i + x_{i+1})/2 over adjacent in-doc pairs with
    # |x_i - x_{i+1}| >= minEdge; fallback to doc mean when no edge pairs.
    min_edge = p.get("min_edge", 5)
    x = frame.x
    counts = np.diff(frame.doc_offsets)
    doc = frame.doc_of_block()
    nxt_same_doc = np.zeros(frame.nblocks, dtype=bool)
    nxt_same_doc[:-1] = doc[:-1] == doc[1:]
    diff = np.zeros(frame.nblocks, dtype=np.int64)
    diff[:-1] = np.abs(x[:-1] - x[1:])
    is_edge = nxt_same_doc & (diff >= min_edge)
    pair_val = np.zeros(frame.nblocks, dtype=np.float64)
    pair_val[:-1] = (x[:-1] + x[1:]) / 2.0
    # per-doc sums over edge pairs
    edge_sum = np.zeros(frame.ndocs, dtype=np.float64)
    edge_cnt = np.zeros(frame.ndocs, dtype=np.int64)
    np.add.at(edge_sum, doc[is_edge], pair_val[is_edge])
    np.add.at(edge_cnt, doc[is_edge], 1)
    # fallback: doc mean
    csum = np.concatenate(([0], np.cumsum(x, dtype=np.int64)))
    doc_sum = csum[frame.doc_offsets[1:]] - csum[frame.doc_offsets[:-1]]
    doc_mean = doc_sum.astype(np.float64) / counts.astype(np.float64)
    thr = np.where(edge_cnt > 0, edge_sum / np.maximum(edge_cnt, 1), doc_mean)
    return x > np.repeat(thr, counts)


def _rule_fbcitb(frame: BlockFrame, m, v, s, p) -> np.ndarray:
    # FBCITB composite: Canny-edge path OR local-variance path
    # (binarizeFBCITB.cpp:164-236: edges || variance map -> contours -> keep).
    # Analogue: keep if the block sits on an "edge" (|x - prev_x| > E) or in
    # a high-variance window (v > V).
    #
    # The reference's OPERATIONS flag enum (binarizeFBCITB.h:39-51) selects
    # which detection paths run; mirrored by the ``paths`` param:
    # "both" (default) | "edge" | "var" — flag-driven operator fusion
    # stays config, not code (registered as binarize_fbcitb_edges /
    # binarize_fbcitb_var query variants).
    e = p.get("edge", 8)
    vmin = p.get("var_min", 9.0)
    paths = p.get("paths", "both")
    x = frame.x
    doc = frame.doc_of_block()
    prev_diff = np.zeros(frame.nblocks, dtype=np.int64)
    prev_diff[1:] = np.abs(x[1:] - x[:-1])
    same = np.zeros(frame.nblocks, dtype=bool)
    same[1:] = doc[1:] == doc[:-1]
    prev_diff = np.where(same, prev_diff, 0)
    edge_keep = prev_diff > e
    var_keep = v > vmin
    if paths == "edge":
        return edge_keep
    if paths == "var":
        return var_keep
    return edge_keep | var_keep


def _rule_cococlust(frame: BlockFrame, m, v, s, p) -> np.ndarray:
    # COCOCLUST: cluster by color distance T_S, keep text-like clusters
    # (binarizeCOCOCLUST.cpp:41-448).  Analogue: sequential single-link
    # segmentation — a new segment starts when |x - prev_x| > T_S; keep the
    # blocks of segments whose mean x exceeds the doc mean x.
    t_s = p.get("t_s", 10)
    x = frame.x
    doc = frame.doc_of_block()
    jump = np.zeros(frame.nblocks, dtype=np.int64)
    jump[1:] = (np.abs(x[1:] - x[:-1]) > t_s).astype(np.int64)
    new_doc = np.ones(frame.nblocks, dtype=np.int64)
    new_doc[1:] = (doc[1:] != doc[:-1]).astype(np.int64)
    seg_break = np.maximum(jump, new_doc)
    seg_id = np.cumsum(seg_break)  # global segment id, unique across docs
    nseg = seg_id[-1] + 1 if frame.nblocks else 0
    seg_sum = np.zeros(nseg, dtype=np.int64)
    seg_cnt = np.zeros(nseg, dtype=np.int64)
    np.add.at(seg_sum, seg_id, x)
    np.add.at(seg_cnt, seg_id, 1)
    # seg id 0 is unused (first block always breaks); guard the divide
    seg_mean = seg_sum.astype(np.float64) / np.maximum(seg_cnt, 1).astype(np.float64)
    doc_mean = doc_broadcast(x.astype(np.int64), frame, "mean")
    return seg_mean[seg_id] > doc_mean


def _rule_local_variances(frame: BlockFrame, m, v, s, p) -> np.ndarray:
    # binarizeByLocalVariances (binarizeByLocalVariances.cpp:53-95): local
    # variance map, per-image min/max, keep where
    # var >= max(varCoeff*(vmax - vmin) + vmin, minVar).
    var_coeff = p.get("var_coeff", 0.125)  # exact binary fraction
    min_var = p.get("min_var", 4.0)
    vmin = doc_broadcast(v, frame, "min")
    vmax = doc_broadcast(v, frame, "max")
    thr = np.maximum(var_coeff * (vmax - vmin) + vmin, min_var)
    return v >= thr


def _rule_local_otsu(frame: BlockFrame, m, v, s, p) -> np.ndarray:
    # binarizeLocalOtsu (binarizeLocalOtsu.cpp:80-161): per-contour-bbox Otsu.
    # Analogue: regions of `region_blocks` consecutive blocks; per region an
    # exact Otsu threshold over the integer features (maximize between-class
    # variance w0*w1*(mu0-mu1)^2, tie-break smallest t); keep x > t.
    region_blocks = p.get("region_blocks", 5)
    bidx = frame.block_idx_within_doc()
    doc = frame.doc_of_block()
    region = bidx // region_blocks
    # global region key
    key = doc * (1 << 32) + region
    n = frame.nblocks
    if n == 0:
        return np.zeros(0, dtype=bool)
    x = frame.x
    # Vectorized per-region Otsu via segment-sorted prefix sums: sort all
    # blocks by (region, x); inside each segment the ascending prefix
    # (n0, s0) at each last-occurrence-of-a-distinct-value position IS
    # the class-0 statistic for candidate threshold t = that value.  The
    # score expression matches _otsu_threshold term-for-term (same IEEE
    # tree), and "first max in ascending-t order" = smallest winning t.
    order = np.lexsort((x, key))
    xs = x[order]
    ks = key[order]
    new_seg = np.empty(n, dtype=bool)
    new_seg[0] = True
    new_seg[1:] = ks[1:] != ks[:-1]
    seg_starts = np.flatnonzero(new_seg)
    seg_id = np.cumsum(new_seg) - 1  # 0-based segment per sorted pos
    nseg = len(seg_starts)
    seg_counts = np.diff(np.append(seg_starts, n))
    csum = np.cumsum(xs, dtype=np.int64)
    base = np.concatenate(([0], csum))[seg_starts]
    s0 = csum - base[seg_id]  # inclusive prefix sum within segment
    n0 = np.arange(n, dtype=np.int64) - seg_starts[seg_id] + 1
    seg_len = seg_counts[seg_id]
    seg_tot = (csum[seg_starts + seg_counts - 1] - base)[seg_id]
    n1 = seg_len - n0
    s1 = seg_tot - s0
    # candidate = last sorted position of each distinct value, with a
    # nonempty upper class (splitting at the max is excluded)
    last_of_val = np.empty(n, dtype=bool)
    last_of_val[-1] = True
    last_of_val[:-1] = (xs[1:] != xs[:-1]) | new_seg[1:]
    cand = last_of_val & (n1 > 0)
    score = np.full(n, -1.0)
    if cand.any():
        mu0 = s0[cand] / n0[cand]
        mu1 = s1[cand] / n1[cand]
        score[cand] = n0[cand] * n1[cand] * (mu0 - mu1) * (mu0 - mu1)
    seg_max = np.maximum.reduceat(score, seg_starts)
    # first (ascending-t) candidate achieving the segment max wins
    win = cand & (score == seg_max[seg_id])
    widx = np.flatnonzero(win)
    t_best = xs[seg_starts + seg_counts - 1].astype(np.float64)  # default:
    # single-distinct-value segment -> t = the value (nothing exceeds)
    if len(widx):
        first_seg, first_pos = np.unique(seg_id[widx], return_index=True)
        t_best[first_seg] = xs[widx[first_pos]].astype(np.float64)
    keep = np.zeros(n, dtype=bool)
    keep[order] = xs > t_best[seg_id]
    return keep


def _otsu_threshold(vals: np.ndarray) -> float:
    """Exact Otsu over a small integer sample.

    Candidates are the distinct values; classes are (x <= t) vs (x > t);
    score = n0*n1*(mu0 - mu1)^2 (monotone transform of the classic
    w0*w1*(mu0-mu1)^2); the smallest maximizing t wins.  Mirrored 1:1 by
    the oracle SQL (prlib_ray/oracles.py::LOCAL_OTSU_SQL).
    """
    uniq = np.unique(vals)
    if len(uniq) == 1:
        return float(uniq[0])  # all equal -> nothing exceeds t
    best_t = float(uniq[0])
    best_score = -1.0
    n = len(vals)
    tot = int(vals.sum())
    for t in uniq[:-1]:  # splitting at the max puts everything in class 0
        mask = vals <= t
        n0 = int(mask.sum())
        n1 = n - n0
        s0 = int(vals[mask].sum())
        mu0 = s0 / n0
        mu1 = (tot - s0) / n1
        score = n0 * n1 * (mu0 - mu1) * (mu0 - mu1)
        if score > best_score:
            best_score = score
            best_t = float(t)
    return best_t


def _rule_native_adaptive(frame: BlockFrame, m, v, s, p) -> np.ndarray:
    # binarizeNativeAdaptive (binarizeNativeAdaptive.cpp:89-96): median blur,
    # adaptiveThreshold with block size auto-derived from the image diagonal,
    # optional bilateral post-pass.  Analogue: median smooth, mean-C with
    # window radius = max(1, nblocks//8) per doc, then a morphological
    # cleanup: a kept block with both in-doc neighbors dropped is dropped.
    c = p.get("shift", 2)
    counts = np.diff(frame.doc_offsets)
    radius_per_doc = np.maximum(1, counts // 8)
    radius = np.repeat(radius_per_doc, counts)
    med = _median_window(frame, 1)
    # variable-radius clamped window mean via prefix sums
    starts = np.repeat(frame.doc_offsets[:-1], counts)
    ends = np.repeat(frame.doc_offsets[1:], counts) - 1
    idx = np.arange(frame.nblocks, dtype=np.int64)
    lo = np.maximum(starts, idx - radius)
    hi = np.minimum(ends, idx + radius)
    csum = np.concatenate(([0], np.cumsum(frame.x, dtype=np.int64)))
    sm = csum[hi + 1] - csum[lo]
    cnt = hi - lo + 1
    mean = sm.astype(np.float64) / cnt.astype(np.float64)
    keep = med > mean - float(c)
    # bilateral-ish cleanup: isolated keeps die
    doc = frame.doc_of_block()
    prev_keep = np.zeros_like(keep)
    prev_keep[1:] = keep[:-1] & (doc[1:] == doc[:-1])
    next_keep = np.zeros_like(keep)
    next_keep[:-1] = keep[1:] & (doc[:-1] == doc[1:])
    has_prev = np.zeros(frame.nblocks, dtype=bool)
    has_prev[1:] = doc[1:] == doc[:-1]
    has_next = np.zeros(frame.nblocks, dtype=bool)
    has_next[:-1] = doc[:-1] == doc[1:]
    isolated = keep & (has_prev | has_next) & ~prev_keep & ~next_keep
    return keep & ~isolated


RULES: dict[str, Callable] = {
    "sauvola": _rule_sauvola,
    "niblack": _rule_niblack,
    "nick": _rule_nick,
    "wolf": _rule_wolf,
    "feng": _rule_feng,
    "pure_adaptive": _rule_pure_adaptive,
    "pure_adaptive_gaussian": _rule_pure_adaptive_gaussian,
    "at": _rule_at,
    "agt": _rule_agt,
    "gat": _rule_gat,
    "mokji": _rule_mokji,
    "fbcitb": _rule_fbcitb,
    "cococlust": _rule_cococlust,
    "local_variances": _rule_local_variances,
    "local_otsu": _rule_local_otsu,
    "native_adaptive": _rule_native_adaptive,
}


def binarize_batch(
    batch: pa.Table,
    rule: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_block: int = WORDS_PER_BLOCK,
    preceding: int = PRECEDING,
    following: int = FOLLOWING,
    **params,
) -> pa.Table:
    """Apply one threshold rule to a batch of documents -> (id, clean_text)."""
    if batch.num_rows == 0:
        return pa.table(
            {id_col: batch[id_col], "clean_text": pa.array([], type=pa.string())}
        )
    frame = split_words_blocks(batch[text_col], words_per_block)
    m, v, s = window_mean_var(frame, preceding, following)
    params = dict(params)
    params.setdefault("preceding", preceding)
    params.setdefault("following", following)
    keep = RULES[rule](frame, m, v, s, params)
    clean = join_kept(frame, keep)
    return pa.table(
        {
            id_col: batch[id_col],
            "clean_text": pa.array(clean, type=pa.string()),
        }
    )


def binarize(ds, rule: str, **kw):
    """Dataset-level stage: stateless zero-copy Arrow map, no shuffle."""
    return ds.map_batches(
        lambda b: binarize_batch(b, rule, **kw),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def binarize_wolf_global(ds, *, k: float = 0.5, text_col: str = "text",
                         id_col: str = "doc_id",
                         words_per_block: int = WORDS_PER_BLOCK,
                         preceding: int = PRECEDING,
                         following: int = FOLLOWING):
    """Corpus-global WolfJolion: aggregate-then-broadcast pattern.

    Demonstrates the scale pattern SURVEY §2.1 calls for: a first pass
    computes the corpus-wide min block feature and max windowed stddev
    (partial per batch, tiny final reduce), which are then broadcast into
    the stateless threshold map — instead of a per-batch or per-doc
    estimate.  Two passes over the data, no shuffle of the data itself.
    """
    import ray

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            # empty read-task / repartitioned block: no partial row (a
            # min()/max() of an empty frame would raise)
            return pa.table({
                "x_min": pa.array([], type=pa.int64()),
                "s_max": pa.array([], type=pa.float64()),
            })
        frame = split_words_blocks(b[text_col], words_per_block)
        _, _, s = window_mean_var(frame, preceding, following)
        return pa.table({
            "x_min": pa.array([int(frame.x.min())], type=pa.int64()),
            "s_max": pa.array([float(s.max())], type=pa.float64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    x_min = float(min((p["x_min"] for p in parts), default=0))
    s_max = max(1e-9, max((p["s_max"] for p in parts), default=0.0))
    ref = ray.put((x_min, s_max))

    def apply(b: pa.Table) -> pa.Table:
        gx_min, gs_max = ray.get(ref)
        frame = split_words_blocks(b[text_col], words_per_block)
        m, v, s = window_mean_var(frame, preceding, following)
        t = m + k * (s / gs_max - 1.0) * (m - gx_min)
        keep = frame.x > t
        return pa.table({
            id_col: b[id_col],
            "clean_text": pa.array(join_kept(frame, keep), type=pa.string()),
        })

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)
