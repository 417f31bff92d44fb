"""Morphological post-pass (reference: the dilate/erode ``morphIters``
epilogue every binarization runs, binarizeSauvola.cpp:125-134).

On a keep/drop block mask, one morphological *close* iteration =
dilate (a dropped block between two kept in-document neighbors becomes
kept) then erode (a kept block between two dropped neighbors is
dropped).  Iterated ``morph_iters`` times, exactly like the reference's
loop.  Pure integer/boolean logic -> exact SQL oracle via lag/lead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from prlib_ray.blocks import join_kept, split_words_blocks, window_mean_var
from prlib_ray.stages.threshold import PRECEDING, FOLLOWING, RULES, WORDS_PER_BLOCK


def _neighbors(keep: np.ndarray, doc: np.ndarray):
    prev_k = np.zeros_like(keep)
    prev_k[1:] = keep[:-1] & (doc[1:] == doc[:-1])
    next_k = np.zeros_like(keep)
    next_k[:-1] = keep[1:] & (doc[:-1] == doc[1:])
    return prev_k, next_k


def morph_close(keep: np.ndarray, doc: np.ndarray, iters: int) -> np.ndarray:
    for _ in range(iters):
        prev_k, next_k = _neighbors(keep, doc)
        keep = keep | (prev_k & next_k)        # dilate: fill 1-gaps
        prev_k, next_k = _neighbors(keep, doc)
        keep = keep & (prev_k | next_k | _isolated_ok(keep, doc))  # erode
    return keep


def _isolated_ok(keep: np.ndarray, doc: np.ndarray) -> np.ndarray:
    """Single-block documents have no neighbors; erosion keeps them."""
    counts_mask = np.zeros_like(keep)
    # a block with no in-doc neighbor at all (doc of size 1)
    has_prev = np.zeros(len(keep), dtype=bool)
    has_prev[1:] = doc[1:] == doc[:-1]
    has_next = np.zeros(len(keep), dtype=bool)
    has_next[:-1] = doc[:-1] == doc[1:]
    counts_mask = ~(has_prev | has_next)
    return counts_mask


def binarize_morph_batch(batch: pa.Table, rule: str = "sauvola",
                         morph_iters: int = 2) -> pa.Table:
    """Threshold rule + ``morph_iters`` close iterations (the reference's
    default epilogue)."""
    if batch.num_rows == 0:
        return pa.table({"doc_id": batch["doc_id"],
                         "clean_text": pa.array([], type=pa.string())})
    frame = split_words_blocks(batch["text"], WORDS_PER_BLOCK)
    m, v, s = window_mean_var(frame, PRECEDING, FOLLOWING)
    keep = RULES[rule](frame, m, v, s,
                       {"preceding": PRECEDING, "following": FOLLOWING})
    keep = morph_close(keep, frame.doc_of_block(), morph_iters)
    return pa.table({
        "doc_id": batch["doc_id"],
        "clean_text": pa.array(join_kept(frame, keep), type=pa.string()),
    })
