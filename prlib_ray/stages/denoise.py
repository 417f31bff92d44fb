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
    frame = split_words_blocks(batch["text"], words_per_block)
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
    frame = split_words_blocks(batch["text"], words_per_block)
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
    frame = split_words_blocks(batch["text"], words_per_block)
    m, _, _ = window_mean_var(frame, 2, 2)
    restored = 2.0 * frame.x.astype(np.float64) - m
    return pa.table(
        {
            "doc_id": _repeat_ids(batch["doc_id"], frame),
            "bidx": pa.array(frame.block_idx_within_doc(), type=pa.int64()),
            "restored": pa.array(restored, type=pa.float64()),
        }
    )


class KuwaharaIterated:
    """Actor-pool Kuwahara with the reference's two missing pieces:

    * ``iterations`` (kuwaharaFilter.cpp:164-166: the filter re-runs on
      its own output ``iterations`` times)
    * once-per-worker precomputed state (cpp:34 ``div_circle_initialize``
      builds the sector-weight tables once per process) — here the
      one-sided window geometry per radius, built in ``__init__``.

    Each iteration smooths the integer feature to the lower-variance
    side-window mean and re-quantizes with floor(m + 0.5) so every
    iteration's input stays integer-exact (the SQL oracle mirrors the
    identical nested expression, see oracles_ext.KUWAHARA_ITERATED).
    """

    def __init__(self, iterations: int = 2, radius: int = 2,
                 words_per_block: int = 12):
        self.iterations = iterations
        self.words_per_block = words_per_block
        # per-worker precomputed window geometry (the div_circle analogue):
        # (preceding, following) pairs of the two competing sectors
        self.sectors = ((radius, 0), (0, radius))

    def __call__(self, batch: pa.Table) -> pa.Table:
        frame = split_words_blocks(batch["text"], self.words_per_block)
        cur = frame.x
        (lp, lf), (rp, rf) = self.sectors
        for _ in range(self.iterations):
            ml, vl, _ = window_mean_var(frame, lp, lf, values=cur)
            mr, vr, _ = window_mean_var(frame, rp, rf, values=cur)
            sel = np.where(vl <= vr, ml, mr)
            cur = np.floor(sel + 0.5).astype(np.int64)
        return pa.table(
            {
                "doc_id": _repeat_ids(batch["doc_id"], frame),
                "bidx": pa.array(frame.block_idx_within_doc(), type=pa.int64()),
                "smoothed_q": pa.array(cur, type=pa.int64()),
            }
        )


def kuwahara_iterated(sf_dir: str, *, iterations: int = 2):
    """Driver query: KuwaharaIterated as an actor pool (stateful stage
    pattern: setup in __init__ once per actor, work in __call__)."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    pool = max(2, int(ncpu * 2 // 3))  # leave producer headroom
    return ds.map_batches(
        KuwaharaIterated,
        fn_constructor_kwargs={"iterations": iterations},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
        concurrency=(1, pool),
        num_cpus=1,
    )


def _one_sided(frame, preceding: int, following: int):
    return window_mean_var(frame, preceding, following)


def _repeat_ids(ids: pa.ChunkedArray, frame) -> pa.Array:
    counts = np.diff(frame.doc_offsets)
    vals = np.repeat(ids.to_numpy(zero_copy_only=False), counts)
    return pa.array(vals, type=pa.int64())
