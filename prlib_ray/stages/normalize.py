"""Normalization family (reference: src/background*, src/balance/*).

Character/whitespace canonicalization — the analogue of background
normalization, white balance and gamma LUTs.  All stateless
``map_batches`` over Arrow; string kernels are pyarrow.compute (RE2 —
the same regex engine DuckDB uses, which is what makes the oracles
byte-exact).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from prlib_ray.blocks import join_kept, split_words_blocks, window_sum
from prlib_ray.functions import textfns


def _out(batch: pa.Table, clean, id_col: str = "doc_id") -> pa.Table:
    return pa.table({id_col: batch[id_col], "clean_text": clean})


def background_normalization_batch(batch: pa.Table) -> pa.Table:
    """pixBackgroundNormSimple analogue (backgroundNormalization.cpp:51):
    canonicalize whitespace runs to uniform background."""
    t = pc.replace_substring_regex(batch["text"], pattern="[ \t\r\n]+", replacement=" ")
    return _out(batch, pc.utf8_trim(t, characters=" \t\r\n"))


def clean_background_batch(batch: pa.Table) -> pa.Table:
    """pixCleanBackgroundToWhite analogue (cleanBackgroundToWhite.cpp:54):
    force non-content to pure background — drop invisible chars, collapse
    blank-line runs."""
    t = batch["text"]
    for ch in textfns.INVISIBLE:
        t = pc.replace_substring(t, pattern=ch, replacement="")
    t = pc.replace_substring_regex(t, pattern="\n{3,}", replacement="\n\n")
    return _out(batch, t)


def gamma_correction_batch(batch: pa.Table) -> pa.Table:
    """LUT-based folding (gammaCorrection.cpp:65-97): curly quotes, dashes,
    ellipsis, NBSP -> canonical ASCII, applied as a fixed replace chain."""
    t = batch["text"]
    for a, b in textfns.FOLD_PAIRS:
        t = pc.replace_substring(t, pattern=a, replacement=b)
    return _out(batch, t)


def color_balance_batch(batch: pa.Table) -> pa.Table:
    """Two-space normalization (balanceColor.cpp:52-87: BGR gamma then HSV
    saturation gamma): byte-level fold then token-level lowercase."""
    t = batch["text"]
    for a, b in textfns.FOLD_PAIRS:
        t = pc.replace_substring(t, pattern=a, replacement=b)
    return _out(batch, pc.utf8_lower(t))


def correct_nuil_batch(batch: pa.Table, *, words_per_block: int = 12) -> pa.Table:
    """Non-uniform illumination correction (correctNUIL.cpp:40-52: per-channel
    auto-invert + blackhat): section-dependent casing drift — a block is
    lowercased when its 3-block window holds more uppercase than lowercase
    letters."""
    frame = split_words_blocks(batch["text"], words_per_block)
    barr = (
        frame.blocks
        if isinstance(frame.blocks, (pa.Array, pa.ChunkedArray))
        else pa.array(frame.blocks, type=pa.string())
    )
    n_up = pc.count_substring_regex(barr, pattern="[A-Z]").to_numpy().astype(np.int64)
    n_lo = pc.count_substring_regex(barr, pattern="[a-z]").to_numpy().astype(np.int64)
    up_w, _ = window_sum(n_up, frame, 1, 1)
    lo_w, _ = window_sum(n_lo, frame, 1, 1)
    flip = up_w > lo_w
    # selective lowercase, all-Arrow: if_else over the flip mask
    frame.blocks = pc.if_else(pa.array(flip), pc.utf8_lower(barr), barr)
    keep = np.ones(frame.nblocks, dtype=bool)
    return _out(batch, pa.array(join_kept(frame, keep), type=pa.string()))


def simple_white_balance_batch(batch: pa.Table) -> pa.Table:
    """Percentile-clip stretch (balanceSimpleWhite.cpp:53-97): per doc, words
    longer than the 95th-percentile word length (k-th smallest with
    k = ceil(19n/20), integer arithmetic to stay float-free) are truncated
    to that length."""
    arr = batch["text"]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    lv = pc.split_pattern(arr, pattern=" ")
    if isinstance(lv, pa.ChunkedArray):
        lv = lv.combine_chunks()
    offs = lv.offsets.to_numpy().astype(np.int64)
    words = lv.values
    nw = np.diff(offs)
    wlen = pc.utf8_length(words).to_numpy().astype(np.int64)
    doc_of_word = np.repeat(np.arange(len(nw), dtype=np.int64), nw)
    # per-doc k-th smallest length, k = ceil(19n/20) (exact integer 95th
    # percentile): one global (doc, len) sort + segment offset math
    order = np.lexsort((wlen, doc_of_word))
    k = (19 * nw + 19) // 20
    clip_doc = wlen[order[offs[:-1] + k - 1]]
    clip_w = clip_doc[doc_of_word]
    need = wlen > clip_w
    if need.any():
        # truncate only the over-percentile words (typically ~5%) in
        # Python — codepoint slicing matches utf8_length counting — and
        # permute them back into the flat word array
        idx = np.flatnonzero(need)
        keep_idx = np.flatnonzero(~need)
        trunc = pa.array(
            [w[:c] for w, c in zip(
                words.take(pa.array(idx)).to_pylist(), clip_w[idx]
            )],
            type=pa.string(),
        )
        merged = pa.concat_arrays([trunc, words.take(pa.array(keep_idx))])
        perm = np.empty(len(words), dtype=np.int64)
        perm[np.concatenate([idx, keep_idx])] = np.arange(len(words))
        words = merged.take(pa.array(perm))
    lst = pa.ListArray.from_arrays(pa.array(offs, type=pa.int32()), words)
    return _out(batch, pc.binary_join(lst, " "))


def gray_world_balance(ds, *, id_col: str = "doc_id"):
    """grayWorldWhiteBalance (balanceGrayWorldWhite.cpp:37-57): rescale each
    channel (here: language group) to the common mean.

    Scale pattern: partial (lang, sum, cnt) per batch inside map_batches ->
    tiny groupby on the partials -> broadcast the means dict via ray.put ->
    stateless map emits scaled = x * global_mean / lang_mean.  No shuffle
    of the data itself.
    """
    import ray

    def partial(b: pa.Table) -> pa.Table:
        lens = pc.utf8_length(b["text"])
        tb = pa.table({"lang": b["lang"], "len": lens})
        import pyarrow.compute as _pc

        g = tb.group_by("lang").aggregate([("len", "sum"), ("len", "count")])
        return g

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    sums: dict[str, int] = {}
    cnts: dict[str, int] = {}
    for row in parts:
        sums[row["lang"]] = sums.get(row["lang"], 0) + row["len_sum"]
        cnts[row["lang"]] = cnts.get(row["lang"], 0) + row["len_count"]
    total = sum(sums.values())
    n = sum(cnts.values())
    gmean = total / n
    lang_means = {k: sums[k] / cnts[k] for k in sums}
    ref = ray.put((gmean, lang_means))

    def apply(b: pa.Table) -> pa.Table:
        gm, lm = ray.get(ref)
        lens = pc.utf8_length(b["text"]).to_numpy().astype(np.int64)
        # per-distinct-lang mean lookup, then one vectorized expression
        # with the identical left-to-right IEEE tree (len * gm / mean)
        import pandas as pd

        inv, uniq = pd.factorize(np.asarray(b["lang"].to_pylist(), dtype=object))
        means = np.fromiter((lm[c] for c in uniq), dtype=np.float64,
                            count=len(uniq))
        scaled = lens * gm / means[inv]
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "balanced_len": pa.array(scaled, type=pa.float64()),
            }
        )

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)
