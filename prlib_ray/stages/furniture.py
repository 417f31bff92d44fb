"""Artifact-removal family (reference: src/removeDots.cpp, removeHolePunch.cpp,
removeLines.cpp) — furniture and separator removal."""

from __future__ import annotations



import pyarrow as pa
import pyarrow.compute as pc


def remove_lines_batch(batch: pa.Table) -> pa.Table:
    """removeLines (removeLines.cpp:52-75): morph-open H/V line isolation ->
    subtract.  Analogue: strip separator runs ----/====/____ (>=4 chars)."""
    t = pc.replace_substring_regex(
        batch["text"], pattern="-{4,}|={4,}|_{4,}", replacement=""
    )
    return pa.table({"doc_id": batch["doc_id"], "clean_text": t})


def remove_dots_batch(batch: pa.Table) -> pa.Table:
    """removeDots (removeDots.cpp:33-96).  Bug-compat: the reference's final
    fill is commented out — it only *marks* keypoints (cpp:91-95).  We
    likewise detect stray single-punctuation tokens and emit a count,
    leaving the text untouched."""
    n = pc.count_substring_regex(batch["text"], pattern=" [.,;:!?*•] ")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_dots": pc.cast(n, pa.int64()),
            "clean_text": batch["text"],
        }
    )


def remove_hole_punch_batch(batch: pa.Table) -> pa.Table:
    """removeHolePunch (removeHolePunch.cpp:50-92): blobs are removed only
    within the 10% border margin (cpp:66-84).  Analogue: the recurring
    marker token 'dup' is dropped only when it sits in the first or last
    ceil(10%) of a document's words; identical tokens mid-document stay."""
    import numpy as np

    arr = batch["text"]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    lv = pc.split_pattern(arr, pattern=" ")
    if isinstance(lv, pa.ChunkedArray):
        lv = lv.combine_chunks()
    offs = lv.offsets.to_numpy().astype(np.int64)
    words = lv.values
    nw = np.diff(offs)
    doc = np.repeat(np.arange(len(nw), dtype=np.int64), nw)
    i1 = np.arange(len(words), dtype=np.int64) - np.repeat(offs[:-1], nw) + 1
    margin = (nw + 9) // 10  # exact ceil(n/10), no float
    is_dup = pc.equal(words, "dup").to_numpy(zero_copy_only=False)
    border = (i1 <= margin[doc]) | (i1 > (nw - margin)[doc])
    keep = ~(is_dup & border)
    kept = words.filter(pa.array(keep))
    kept_counts = np.bincount(doc[keep], minlength=len(nw))
    lst = pa.ListArray.from_arrays(
        pa.array(np.concatenate(([0], np.cumsum(kept_counts))),
                 type=pa.int32()),
        kept,
    )
    return pa.table(
        {"doc_id": batch["doc_id"], "clean_text": pc.binary_join(lst, " ")}
    )
