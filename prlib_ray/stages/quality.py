"""Detector family (reference: src/detectors/*) — per-document quality flags.

Bug-compat contract (SURVEY §2.6): the reference's ``isBlurred`` /
``isGlared`` are stubs that ALWAYS return false
(blurDetection.cpp:85-89, glareDetection.cpp:27-30) while the focus-
measure helpers are fully implemented (LAPM cpp:32-47, LAPV cpp:50-60,
TENG cpp:63-73, GLVN cpp:76-83).  We reproduce exactly that: all four
scores are computed as columns, and the flag column is constant false —
score, never drop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from prlib_ray.blocks import split_words_blocks


def blur_scores_batch(batch: pa.Table, *, words_per_block: int = 12) -> pa.Table:
    """Four focus measures over the block-feature sequence:

    * lapm = mean |x[i-1] - 2x[i] + x[i+1]|        (modified Laplacian)
    * lapv = population variance of that Laplacian (LAPV)
    * teng = mean ((x[i+1] - x[i-1])^2)            (gradient energy)
    * glvn = var(x)/mean(x)                        (normalized variance)

    Interior blocks only for lapm/lapv/teng; documents with < 3 blocks
    score 0.0.  Integer sums -> exact float64 (oracle contract).
    """
    frame = split_words_blocks(batch["text"], words_per_block)
    x = frame.x
    doc = frame.doc_of_block()
    nd = frame.ndocs
    counts = np.diff(frame.doc_offsets)

    interior = np.zeros(frame.nblocks, dtype=bool)
    if frame.nblocks >= 3:
        interior[1:-1] = (doc[1:-1] == doc[:-2]) & (doc[1:-1] == doc[2:])
    lap = np.zeros(frame.nblocks, dtype=np.int64)
    grad = np.zeros(frame.nblocks, dtype=np.int64)
    if frame.nblocks >= 3:
        lap[1:-1] = x[:-2] - 2 * x[1:-1] + x[2:]
        grad[1:-1] = x[2:] - x[:-2]

    def doc_sum(vals: np.ndarray, mask: np.ndarray) -> np.ndarray:
        out = np.zeros(nd, dtype=np.int64)
        np.add.at(out, doc[mask], vals[mask])
        return out

    n_int = np.zeros(nd, dtype=np.int64)
    np.add.at(n_int, doc[interior], 1)
    safe_n = np.maximum(n_int, 1).astype(np.float64)

    lapm = doc_sum(np.abs(lap), interior).astype(np.float64) / safe_n
    lap_mean = doc_sum(lap, interior).astype(np.float64) / safe_n
    lap_sq = doc_sum(lap * lap, interior).astype(np.float64) / safe_n
    lapv = np.maximum(lap_sq - lap_mean * lap_mean, 0.0)
    teng = doc_sum(grad * grad, interior).astype(np.float64) / safe_n

    csum = np.concatenate(([0], np.cumsum(x, dtype=np.int64)))
    s = (csum[frame.doc_offsets[1:]] - csum[frame.doc_offsets[:-1]]).astype(np.float64)
    csum2 = np.concatenate(([0], np.cumsum(x * x, dtype=np.int64)))
    s2 = (csum2[frame.doc_offsets[1:]] - csum2[frame.doc_offsets[:-1]]).astype(
        np.float64
    )
    mean = s / counts.astype(np.float64)
    var = np.maximum(s2 / counts.astype(np.float64) - mean * mean, 0.0)
    glvn = np.where(mean > 0.0, var / np.where(mean > 0.0, mean, 1.0), 0.0)

    zero = n_int == 0
    lapm[zero] = 0.0
    lapv[zero] = 0.0
    teng[zero] = 0.0

    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lapm": pa.array(lapm, type=pa.float64()),
            "lapv": pa.array(lapv, type=pa.float64()),
            "teng": pa.array(teng, type=pa.float64()),
            "glvn": pa.array(glvn, type=pa.float64()),
            "is_blurred": pa.array(np.zeros(batch.num_rows, dtype=bool)),
        }
    )


def glare_scores_batch(batch: pa.Table) -> pa.Table:
    """isGlared analogue: glare = an overexposed run — here the longest
    unbroken token (base64/binary dump detection).  Flag constant false
    (glareDetection.cpp:27-30 stub)."""
    import pyarrow.compute as pc

    arr = batch["text"]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    lv = pc.split_pattern(arr, pattern=" ")
    if isinstance(lv, pa.ChunkedArray):
        lv = lv.combine_chunks()
    offs = lv.offsets.to_numpy().astype(np.int64)
    wlen = pc.utf8_length(lv.values).to_numpy().astype(np.int64)
    # per-doc max token length in one reduceat (every doc has >= 1 word)
    max_run = np.maximum.reduceat(wlen, offs[:-1]) if len(wlen) else wlen
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "max_token_len": pa.array(max_run, type=pa.int64()),
            "is_glared": pa.array(np.zeros(batch.num_rows, dtype=bool)),
        }
    )
