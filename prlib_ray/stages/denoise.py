"""Denoise / deblur family (reference: src/denoise/*, src/deblur/*)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from prlib_ray.blocks import join_kept, split_words_blocks, window_mean_var


def _out(batch: pa.Table, clean, id_col: str = "doc_id") -> pa.Table:
    return pa.table({id_col: batch[id_col], "clean_text": clean})


def denoise_salt_pepper_batch(batch: pa.Table) -> pa.Table:
    """denoiseSaltPepper (denoiseSaltPepper.cpp:32-35, iterated medianBlur):
    remove isolated corrupt characters — C0 controls, DEL, U+FFFD."""
    t = pc.replace_substring_regex(
        batch["text"],
        pattern="[\x00-\x08\x0b\x0c\x0e-\x1f\x7f�]",
        replacement="",
    )
    return _out(batch, t)


def denoise_nlm_batch(batch: pa.Table, *, words_per_block: int = 12) -> pa.Table:
    """fastNlMeansDenoising analogue (denoiseNLM.cpp:29-32): patch-similarity
    noise removal — drop a block exactly duplicating any of the previous 3
    blocks of the same document (near-duplicate garbage runs)."""
    texts = batch["text"].to_pylist()
    frame = split_words_blocks(texts, words_per_block)
    blocks = np.array(frame.block_strings(), dtype=object)
    doc = frame.doc_of_block()
    keep = np.ones(frame.nblocks, dtype=bool)
    for lag in (1, 2, 3):
        dup = np.zeros(frame.nblocks, dtype=bool)
        dup[lag:] = (blocks[lag:] == blocks[:-lag]) & (doc[lag:] == doc[:-lag])
        keep &= ~dup
    return _out(batch, pa.array(join_kept(frame, keep), type=pa.string()))


def basic_deblur_batch(batch: pa.Table) -> pa.Table:
    """Unsharp mask analogue (basicDeblur.cpp:49-65): re-sharpen soft-wrapped
    text — rejoin hyphen-split words ("exam- ple" -> "example")."""
    t = pc.replace_substring_regex(
        batch["text"], pattern="([a-z])- ", replacement="\\1"
    )
    return _out(batch, t)


def kuwahara_batch(batch: pa.Table, *, words_per_block: int = 12) -> pa.Table:
    """Anisotropic Kuwahara (kuwaharaFilter.cpp:138-402): edge-preserving
    smoothing — each block's feature becomes the mean of whichever side
    window (left incl. self vs right incl. self, radius 2) has the lower
    variance, preserving block-boundary edges."""
    texts = batch["text"].to_pylist()
    frame = split_words_blocks(texts, words_per_block)
    ml, vl, _ = _one_sided(frame, preceding=2, following=0)
    mr, vr, _ = _one_sided(frame, preceding=0, following=2)
    smoothed = np.where(vl <= vr, ml, mr)
    return pa.table(
        {
            "doc_id": _repeat_ids(batch["doc_id"], frame),
            "bidx": pa.array(frame.block_idx_within_doc(), type=pa.int64()),
            "smoothed": pa.array(smoothed, type=pa.float64()),
        }
    )


def wiener_batch(batch: pa.Table, *, words_per_block: int = 12) -> pa.Table:
    """Wiener deconvolution analogue (wienerFilter.cpp:158-200): invert the
    blur kernel — restored feature = 2*x - window mean (exact inverse of a
    mean blur in expectation), emitted as a per-block restoration score."""
    texts = batch["text"].to_pylist()
    frame = split_words_blocks(texts, words_per_block)
    m, _, _ = window_mean_var(frame, 2, 2)
    restored = 2.0 * frame.x.astype(np.float64) - m
    return pa.table(
        {
            "doc_id": _repeat_ids(batch["doc_id"], frame),
            "bidx": pa.array(frame.block_idx_within_doc(), type=pa.int64()),
            "restored": pa.array(restored, type=pa.float64()),
        }
    )


def _one_sided(frame, preceding: int, following: int):
    return window_mean_var(frame, preceding, following)


def _repeat_ids(ids: pa.ChunkedArray, frame) -> pa.Array:
    counts = np.diff(frame.doc_offsets)
    vals = np.repeat(ids.to_numpy(zero_copy_only=False), counts)
    return pa.array(vals, type=pa.int64())
