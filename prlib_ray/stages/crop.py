"""Border-detection family (reference: src/border_detection/*) — find the
main-content region of a document and slice to it.

``documentContour`` (autoCrop.cpp:43-131) finds the document quadrangle
(candidate scoring: area >= 5% of the image, autoCropUtils.cpp:198-235);
``autoCrop`` (autoCrop.cpp:133-175) warps/crops to it; the Hough variant
(houghLine.cpp:177-257) finds the region from line separators.

Analogue: the content region is the contiguous island of content blocks
(feature >= an absolute floor) with the largest character mass; the crop
keeps blocks from island start..end.  The reference's minArea gate maps
to `20 * island_chars >= doc_chars` (>= 5%, exact integer arithmetic).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from prlib_ray.blocks import BlockFrame, split_words_blocks

CONTENT_FLOOR = 20  # a block with >= this many chars is "content"


def _islands(frame: BlockFrame, content: np.ndarray | None = None):
    """Per doc: winning island (start_bidx, end_bidx, island_sum, doc_sum).

    Islands are maximal runs of consecutive content blocks; winner has the
    largest character sum, ties -> earliest.  (-1, -1) when no content
    block exists.  ``content`` overrides the default mask (the retry
    loop passes a dilated mask).
    """
    x = frame.x
    offs = frame.doc_offsets
    n = frame.nblocks
    start = np.full(frame.ndocs, -1, dtype=np.int64)
    end = np.full(frame.ndocs, -1, dtype=np.int64)
    isum = np.zeros(frame.ndocs, dtype=np.int64)
    if content is None:
        content = x >= CONTENT_FLOOR
    csum = np.concatenate(([0], np.cumsum(x, dtype=np.int64)))
    dsum = csum[offs[1:]] - csum[offs[:-1]]
    if n == 0 or not content.any():
        return start, end, isum, dsum
    # vectorized run detection: a run starts at a content block whose
    # in-document predecessor is not content
    doc = frame.doc_of_block()
    prev_c = np.zeros(n, dtype=bool)
    prev_c[1:] = content[:-1] & (doc[1:] == doc[:-1])
    run_start_mask = content & ~prev_c
    cpos = np.flatnonzero(content)
    rid = np.cumsum(run_start_mask)[cpos] - 1  # run id per content block
    first = np.ones(len(cpos), dtype=bool)
    first[1:] = rid[1:] != rid[:-1]
    last = np.zeros(len(cpos), dtype=bool)
    last[:-1] = rid[1:] != rid[:-1]
    last[-1] = True
    run_s = cpos[first]
    run_e = cpos[last]
    run_sum = np.add.reduceat(x[cpos], np.flatnonzero(first))
    run_doc = doc[run_s]
    # winner per doc: largest sum, ties -> earliest start (= the strictly
    # -greater scan of the scalar version)
    order = np.lexsort((run_s, -run_sum, run_doc))
    docs_sorted = run_doc[order]
    pick = np.ones(len(order), dtype=bool)
    pick[1:] = docs_sorted[1:] != docs_sorted[:-1]
    win = order[pick]
    wd = run_doc[win]
    start[wd] = run_s[win] - offs[wd]
    end[wd] = run_e[win] - offs[wd]
    isum[wd] = run_sum[win]
    return start, end, isum, dsum


def document_contour_batch(batch: pa.Table, *, words_per_block: int = 12) -> pa.Table:
    """Emit the winning content-region span per document (geometry IR)."""
    frame = split_words_blocks(batch["text"].to_pylist(), words_per_block)
    start, end, isum, dsum = _islands(frame)
    # minArea gate (autoCropUtils.cpp:224-235): island must hold >= 5% of mass
    ok = (start >= 0) & (20 * isum >= dsum)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "span_start": pa.array(np.where(ok, start, -1), type=pa.int64()),
            "span_end": pa.array(np.where(ok, end, -1), type=pa.int64()),
        }
    )


def _dilate(content: np.ndarray, frame: BlockFrame) -> np.ndarray:
    """One in-document dilation of the content mask (a block adjacent to
    a content block becomes content) — the retry loop's growing-kernel
    morphology (autoCrop.cpp:107-128)."""
    doc = frame.doc_of_block()
    prev_c = np.zeros_like(content)
    prev_c[1:] = content[:-1] & (doc[1:] == doc[:-1])
    next_c = np.zeros_like(content)
    next_c[:-1] = content[1:] & (doc[:-1] == doc[1:])
    return content | prev_c | next_c


def document_contour_retry_batch(
    batch: pa.Table, *, words_per_block: int = 12, max_retries: int = 2
) -> pa.Table:
    """documentContour WITH the reference's morphology retry loop
    (autoCrop.cpp:105-128): when no valid contour passes the minArea
    gate, dilate the edge image and retry, up to 2 times with a growing
    kernel.  Analogue: re-scan islands over an iteratively dilated
    content mask; the first pass whose winning island clears the 5% mass
    gate wins; all passes fail -> (-1, -1)."""
    frame = split_words_blocks(batch["text"], words_per_block)
    content = frame.x >= CONTENT_FLOOR
    span_s = np.full(frame.ndocs, -1, dtype=np.int64)
    span_e = np.full(frame.ndocs, -1, dtype=np.int64)
    found = np.zeros(frame.ndocs, dtype=bool)
    n_retries = np.zeros(frame.ndocs, dtype=np.int64)
    for attempt in range(max_retries + 1):
        start, end, isum, dsum = _islands(frame, content)
        ok = (start >= 0) & (20 * isum >= dsum) & ~found
        span_s[ok] = start[ok]
        span_e[ok] = end[ok]
        n_retries[ok] = attempt
        found |= ok
        if found.all() or attempt == max_retries:
            break
        content = _dilate(content, frame)
    n_retries[~found] = -1
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "span_start": pa.array(span_s, type=pa.int64()),
            "span_end": pa.array(span_e, type=pa.int64()),
            "n_retries": pa.array(n_retries, type=pa.int64()),
        }
    )


def check_rectangle_batch(batch: pa.Table, *, words_per_block: int = 12) -> pa.Table:
    """Quadrangle-validity helper family analogue (autoCropUtils.cpp:58-365:
    CheckRectangle side-ratio >= 0.85, corner angles >= 160deg, area
    window; cropVerticesOrdering canonical corner order).

    The winning island's validity gates, all exact integer arithmetic:
    * area_ok  — island holds >= 5% of the document's character mass
      (the minArea gate, autoCropUtils.cpp:224-235)
    * side_ok  — the island's first and last block lengths (the two
      "parallel sides") within ratio 0.85: 100*min >= 85*max
      (CheckRectangle side-ratio, autoCropUtils.cpp:198-222)
    * angle_ok — no interior corner sharper than half a side: every
      adjacent in-island length jump satisfies 2*|dx| <= max block len
      (the >=160deg straight-corner check)
    * quad_ok  — all three (isQuadrangle)
    Span endpoints are emitted canonically ordered (start <= end), the
    cropVerticesOrdering analogue."""
    frame = split_words_blocks(batch["text"], words_per_block)
    start, end, isum, dsum = _islands(frame)
    x = frame.x
    offs = frame.doc_offsets
    has = start >= 0
    area_ok = has & (20 * isum >= dsum)
    side_ok = np.zeros(frame.ndocs, dtype=bool)
    angle_ok = np.zeros(frame.ndocs, dtype=bool)
    for d in np.flatnonzero(has):
        lo = int(offs[d] + start[d])
        hi = int(offs[d] + end[d])  # inclusive
        xf, xl = int(x[lo]), int(x[hi])
        side_ok[d] = 100 * min(xf, xl) >= 85 * max(xf, xl)
        seg = x[lo : hi + 1]
        mx = int(seg.max())
        adj = np.abs(np.diff(seg))
        angle_ok[d] = len(adj) == 0 or int(2 * adj.max()) <= mx
    quad_ok = area_ok & side_ok & angle_ok
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "span_start": pa.array(np.where(has, start, -1), type=pa.int64()),
            "span_end": pa.array(np.where(has, end, -1), type=pa.int64()),
            "area_ok": pa.array(area_ok),
            "side_ok": pa.array(side_ok),
            "angle_ok": pa.array(angle_ok),
            "quad_ok": pa.array(quad_ok),
        }
    )


def autocrop_batch(batch: pa.Table, *, words_per_block: int = 12) -> pa.Table:
    """documentContour + warpCrop: slice text to the winning island; when no
    valid region is found the document passes through uncropped (the
    reference returns false and leaves output = input)."""
    from prlib_ray.blocks import join_kept

    frame = split_words_blocks(batch["text"], words_per_block)
    start, end, isum, dsum = _islands(frame)
    ok = (start >= 0) & (20 * isum >= dsum)
    bidx = frame.block_idx_within_doc()
    doc = frame.doc_of_block()
    # keep = the winning window for gated docs, everything otherwise —
    # the whole crop is one Arrow filter + binary_join (join_kept)
    keep = np.where(
        ok[doc], (bidx >= start[doc]) & (bidx <= end[doc]), True
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "clean_text": pa.array(join_kept(frame, keep), type=pa.string()),
        }
    )


def hough_region_batch(batch: pa.Table, *, words_per_block: int = 12) -> pa.Table:
    """findHoughLineContour analogue (houghLine.cpp:177-257): the region
    strictly between the first and last separator-run blocks (----/====/
    ____); fewer than 2 separator blocks -> full text."""
    import pyarrow.compute as pc

    from prlib_ray.blocks import join_kept

    frame = split_words_blocks(batch["text"], words_per_block)
    blocks = frame.blocks
    if isinstance(blocks, list):
        blocks = pa.array(blocks, type=pa.string())
    is_sep = pc.match_substring_regex(
        blocks, pattern="-{4,}|={4,}|_{4,}"
    ).to_numpy(zero_copy_only=False)
    n = frame.nblocks
    doc = frame.doc_of_block()
    idx = np.arange(n, dtype=np.int64)
    # per-doc first/last separator flat index, vectorized
    first = np.full(frame.ndocs, -1, dtype=np.int64)
    last = np.full(frame.ndocs, -1, dtype=np.int64)
    sp = np.flatnonzero(is_sep)
    if len(sp):
        sd = doc[sp]
        f_mask = np.ones(len(sp), dtype=bool)
        f_mask[1:] = sd[1:] != sd[:-1]
        first[sd[f_mask]] = sp[f_mask]
        l_mask = np.zeros(len(sp), dtype=bool)
        l_mask[:-1] = sd[1:] != sd[:-1]
        l_mask[-1] = True
        last[sd[l_mask]] = sp[l_mask]
    # docs with >= 2 separators and a nonempty strict interior keep only
    # the blocks strictly between them; everything else passes through
    nsep = np.bincount(doc[is_sep], minlength=frame.ndocs)
    gated = (nsep >= 2) & (last - first > 1)
    keep = np.where(gated[doc], (idx > first[doc]) & (idx < last[doc]), True)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "clean_text": pa.array(join_kept(frame, keep), type=pa.string()),
        }
    )


def resize_batch(batch: pa.Table, *, max_words: int = 60) -> pa.Table:
    """resize (resize.cpp:33-58): bound document size before expensive
    stages — keep the first ``max_words`` words (one split_pattern +
    clipped list offsets + binary_join, no per-doc Python)."""
    import pyarrow.compute as pc

    arr = batch["text"]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    lv = pc.split_pattern(arr, pattern=" ")
    if isinstance(lv, pa.ChunkedArray):
        lv = lv.combine_chunks()
    offs = lv.offsets.to_numpy().astype(np.int64)
    clipped_ends = np.minimum(offs[:-1] + max_words, offs[1:])
    nw = np.diff(offs)
    keep = np.arange(int(offs[-1]), dtype=np.int64) - np.repeat(
        offs[:-1], nw
    ) < max_words
    kept = lv.values.filter(pa.array(keep))
    new_offs = np.concatenate(
        ([0], np.cumsum(clipped_ends - offs[:-1], dtype=np.int64))
    )
    lst = pa.ListArray.from_arrays(pa.array(new_offs, type=pa.int32()), kept)
    return pa.table(
        {"doc_id": batch["doc_id"], "clean_text": pc.binary_join(lst, " ")}
    )


def split_page_batch(batch: pa.Table) -> pa.Table:
    """splitPage bug-compat: the reference is marked "PLEASE DON'T USE IT
    SINCE IT'S WIP!" and returns a zero stub (splitPage.cpp:35,78) — the
    document passes through unchanged."""
    return pa.table({"doc_id": batch["doc_id"], "clean_text": batch["text"]})
