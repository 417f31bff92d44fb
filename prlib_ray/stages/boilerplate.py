"""Per-turn main-content extraction: the flagship fused stage.

This is the composition the north star describes — the reference's
binarize -> denoise -> artifact-removal -> crop chain as one per-turn
text-cleaning pass:

1. char folding (gammaCorrection LUT analogue)
2. salt-pepper char strip (denoiseSaltPepper)
3. hyphen-wrap rejoin (basicDeblur)
4. line blocks + per-line features (imageLibCommon feature kernels)
5. furniture rules: separator runs (removeLines), link farms / nav /
   cookie / copyright chrome (removeHolePunch-style recurring furniture)
6. Sauvola windowed threshold on content density over surviving lines
   (binarizeSauvola: t = m*(1 + k*(s/R - 1)), window=5 lines, k=0.2,
   R=128; clamped edge policy)
7. spans: char ranges of every line in the cleaned source, kind in
   {content, furniture, boilerplate}

``extract_turn`` is the straight-line scalar oracle; ``ExtractTurns`` is
the Ray actor-pool stage (regexes compiled once per actor in __init__,
vectorized over a batch in __call__).  Both share the same code path, so
distributed output == straight-line golden by construction; the tests
assert that equality under arbitrary partitioning.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from prlib_ray.schema import SPAN_TYPE

FOLD_PAIRS = (
    ("‘", "'"), ("’", "'"), ("“", '"'), ("”", '"'),
    ("–", "-"), ("—", "-"), ("…", "..."), (" ", " "),
)
SALT_PEPPER = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f�]")
HYPHEN_WRAP = re.compile(r"([a-z])- ")
SEPARATOR_LINE = re.compile(r"^[-=_]{4,}$")
LINK = re.compile(r"<a\b[^>]*>|</a>|https?://[^ \n]+")
ALNUM = re.compile(r"[A-Za-z0-9]")
PIPE_NAV = re.compile(r" \| ")
FURNITURE_MARKERS = ("cookie", "cookies", "(c) ", "all rights reserved")

SAUVOLA_K = 0.2
SAUVOLA_R = 128.0
WINDOW = 2  # lines each side


def _clean_source(text: str) -> str:
    for a, b in FOLD_PAIRS:
        text = text.replace(a, b)
    text = SALT_PEPPER.sub("", text)
    return HYPHEN_WRAP.sub(r"\1", text)


def _line_kind(line: str) -> str:
    """Rule-based furniture classification (pre-threshold)."""
    if SEPARATOR_LINE.match(line):
        return "furniture"
    low = line.lower()
    if any(m in low for m in FURNITURE_MARKERS):
        return "furniture"
    if len(PIPE_NAV.findall(line)) >= 3:
        return "furniture"
    link_chars = sum(len(m) for m in LINK.findall(line))
    if 2 * link_chars > len(line):
        return "furniture"
    return "candidate"


def extract_turn(text: str) -> tuple[str, list[dict]]:
    """Straight-line single-turn extraction (the golden oracle path)."""
    src = _clean_source(text)
    lines = src.split("\n")
    kinds = [_line_kind(ln) for ln in lines]
    x = np.array(
        [len(ALNUM.findall(ln)) if k == "candidate" else 0
         for ln, k in zip(lines, kinds)],
        dtype=np.int64,
    )
    cand = [i for i, k in enumerate(kinds) if k == "candidate"]
    keep = np.zeros(len(lines), dtype=bool)
    if cand:
        xv = x[cand].astype(np.float64)
        n = len(cand)
        m = np.empty(n)
        s = np.empty(n)
        for j in range(n):
            lo, hi = max(0, j - WINDOW), min(n, j + WINDOW + 1)
            w = xv[lo:hi]
            mu = w.sum() / len(w)
            var = max((w * w).sum() / len(w) - mu * mu, 0.0)
            m[j] = mu
            s[j] = var ** 0.5
        t = m * (1.0 + SAUVOLA_K * (s / SAUVOLA_R - 1.0))
        for j, i in enumerate(cand):
            keep[i] = xv[j] > t[j]
    spans = []
    pos = 0
    kept_lines = []
    for i, ln in enumerate(lines):
        kind = "content" if keep[i] else (
            "furniture" if kinds[i] == "furniture" else "boilerplate"
        )
        spans.append({"start": pos, "end": pos + len(ln), "kind": kind})
        if keep[i]:
            kept_lines.append(ln)
        pos += len(ln) + 1
    return "\n".join(kept_lines), spans


def _byte_class_counts(values: pa.StringArray, table: np.ndarray) -> np.ndarray:
    """Per-string count of bytes whose class indicator is 1.

    For ASCII character classes this equals the regex per-*char* count on
    any UTF-8 input (continuation/multibyte bytes are >= 0x80 and never in
    the class) — a pure-numpy replacement for count_substring_regex."""
    values = values.combine_chunks() if isinstance(values, pa.ChunkedArray) else values
    off = np.frombuffer(values.buffers()[1], dtype=np.int32)[
        values.offset : values.offset + len(values) + 1
    ].astype(np.int64)
    data = np.frombuffer(values.buffers()[2], dtype=np.uint8)
    ind = table[data]
    csum = np.concatenate(([0], np.cumsum(ind, dtype=np.int64)))
    return csum[off[1:]] - csum[off[:-1]]


def _byte_lens(values: pa.StringArray) -> np.ndarray:
    values = values.combine_chunks() if isinstance(values, pa.ChunkedArray) else values
    off = np.frombuffer(values.buffers()[1], dtype=np.int32)[
        values.offset : values.offset + len(values) + 1
    ].astype(np.int64)
    return off[1:] - off[:-1]


_ALNUM_TABLE = np.zeros(256, dtype=np.int64)
for _c in (list(range(48, 58)) + list(range(65, 91)) + list(range(97, 123))):
    _ALNUM_TABLE[_c] = 1
_SEP_TABLE = np.zeros(256, dtype=np.int64)
for _c in (ord("-"), ord("="), ord("_")):
    _SEP_TABLE[_c] = 1


# one probe pattern covering every char the clean chain can touch; rows
# without a hit skip the whole 10-kernel chain (most rows, most corpora)
_CLEAN_PROBE = (
    "[‘’“”–—… \x00-\x08\x0b\x0c\x0e-\x1f\x7f�]|[a-z]- "
)


def _clean_chain(arr: pa.Array) -> pa.Array:
    import pyarrow.compute as pc

    for a, b in FOLD_PAIRS:
        arr = pc.replace_substring(arr, pattern=a, replacement=b)
    arr = pc.replace_substring_regex(
        arr, pattern="[\x00-\x08\x0b\x0c\x0e-\x1f\x7f�]", replacement=""
    )
    return pc.replace_substring_regex(
        arr, pattern="([a-z])- ", replacement="\\1"
    )


def _furniture_mask(
    values: pa.StringArray, char_lens: np.ndarray, byte_lens: np.ndarray
) -> np.ndarray:
    """Vectorized furniture-rule classifier over a flat line array.

    Exactly ``_line_kind(line) == "furniture"`` per line (the scalar
    rules above), shared by the flagship kernel and the exact-integer
    oracle twin so the two can never drift."""
    import pyarrow.compute as pc

    nline = len(values)
    sep_cnt = _byte_class_counts(values, _SEP_TABLE)
    is_sep = (sep_cnt == byte_lens) & (byte_lens >= 4)

    is_marker = np.zeros(nline, dtype=bool)
    for m in ("cookie", "(c) ", "all rights reserved"):
        is_marker |= pc.match_substring(
            values, pattern=m, ignore_case=True
        ).to_numpy(zero_copy_only=False)
    n_pipes = pc.count_substring(values, pattern=" | ").to_numpy().astype(np.int64)

    # link chars: run the (expensive) link regex only on probed lines
    probe = (
        pc.match_substring(values, pattern="http").to_numpy(zero_copy_only=False)
        | pc.match_substring(values, pattern="<a").to_numpy(zero_copy_only=False)
        | pc.match_substring(values, pattern="</a").to_numpy(zero_copy_only=False)
    )
    link_chars = np.zeros(nline, dtype=np.int64)
    pidx = np.flatnonzero(probe)
    if len(pidx):
        sub = values.take(pa.array(pidx))
        delinked = pc.replace_substring_regex(
            sub, pattern="<a\\b[^>]*>|</a>|https?://[^ \n]+", replacement=""
        )
        link_chars[pidx] = char_lens[pidx] - pc.utf8_length(delinked).to_numpy()

    return is_sep | is_marker | (n_pipes >= 3) | (2 * link_chars > char_lens)


def _extract_batch_arrow(texts_arr: pa.Array, *, with_spans: bool = True):
    """Fully-Arrow batch kernel: identical output to ``extract_turn``
    per row (tests pin it), but every per-line operation is an Arrow
    kernel, a byte-table numpy pass over the string buffers, or a
    prefix-sum window — no per-line Python.

    Returns (clean_text: StringArray, spans: ListArray[SPAN_TYPE] | None
    when ``with_spans`` is False — skipping span construction in
    pipelines that drop them saves a full struct/list materialization)."""
    import pyarrow.compute as pc

    from prlib_ray.blocks import BlockFrame, window_mean_var

    if isinstance(texts_arr, pa.ChunkedArray):
        texts_arr = texts_arr.combine_chunks()
    hit = pc.match_substring_regex(texts_arr, pattern=_CLEAN_PROBE).to_numpy(
        zero_copy_only=False
    )
    hidx = np.flatnonzero(hit)
    if len(hidx) == len(hit):
        cleaned_arr = _clean_chain(texts_arr)
    elif len(hidx) == 0:
        cleaned_arr = texts_arr
    else:
        nidx = np.flatnonzero(~hit)
        processed = _clean_chain(texts_arr.take(pa.array(hidx)))
        untouched = texts_arr.take(pa.array(nidx))
        merged = pa.concat_arrays(
            [processed.combine_chunks() if isinstance(processed, pa.ChunkedArray)
             else processed, untouched]
        )
        perm = np.empty(len(hit), dtype=np.int64)
        perm[np.concatenate([hidx, nidx])] = np.arange(len(hit))
        cleaned_arr = merged.take(pa.array(perm))
    if isinstance(cleaned_arr, pa.ChunkedArray):
        cleaned_arr = cleaned_arr.combine_chunks()

    # split into the flat line array (list<string> offsets + values)
    lv = pc.split_pattern(cleaned_arr, pattern="\n")
    if isinstance(lv, pa.ChunkedArray):
        lv = lv.combine_chunks()
    doc_offsets = lv.offsets.to_numpy().astype(np.int64)
    values = lv.values
    nline = len(values)
    ndocs = len(lv)

    char_lens = pc.utf8_length(values).to_numpy().astype(np.int64)
    byte_lens = _byte_lens(values)

    # separator lines: every byte in [-=_], length >= 4 (all-ASCII by
    # construction, so byte length == char length for matches)
    furniture = _furniture_mask(values, char_lens, byte_lens)

    alnum = _byte_class_counts(values, _ALNUM_TABLE)
    candidate = ~furniture
    x = np.where(candidate, alnum, 0)

    # candidate-only sub-frame per turn for the windowed threshold
    counts = np.diff(doc_offsets)
    doc = np.repeat(np.arange(ndocs, dtype=np.int64), counts)
    cand_idx = np.flatnonzero(candidate)
    keep = np.zeros(nline, dtype=bool)
    if len(cand_idx):
        cand_counts = np.bincount(doc[cand_idx], minlength=ndocs)
        cand_offsets = np.concatenate(([0], np.cumsum(cand_counts)))
        sub = BlockFrame(
            doc_offsets=cand_offsets.astype(np.int64),
            blocks=[],  # unused for stats
            x=x[cand_idx],
        )
        m, _, s = window_mean_var(sub, WINDOW, WINDOW)
        t = m * (1.0 + SAUVOLA_K * (s / SAUVOLA_R - 1.0))
        keep[cand_idx] = x[cand_idx].astype(np.float64) > t

    # spans: vectorized char-offset construction (skipped when dropped)
    spans = None
    if with_spans:
        step = char_lens + 1
        glob = np.concatenate(([0], np.cumsum(step)))
        doc_base = np.repeat(glob[doc_offsets[:-1]], counts)
        starts = (glob[:-1] - doc_base).astype(np.int32)
        ends = (starts + char_lens).astype(np.int32)
        kind_np = np.where(
            keep, "content", np.where(furniture, "furniture", "boilerplate")
        )
        struct = pa.StructArray.from_arrays(
            [
                pa.array(starts, type=pa.int32()),
                pa.array(ends, type=pa.int32()),
                pa.array(kind_np, type=pa.string()),
            ],
            names=["start", "end", "kind"],
        )
        spans = pa.ListArray.from_arrays(
            pa.array(doc_offsets, type=pa.int32()), struct
        )

    # clean_text: kept lines re-joined per doc, all in Arrow
    keep_pa = pa.array(keep)
    kept_values = values.filter(keep_pa)
    kept_counts = np.bincount(doc[keep], minlength=ndocs)
    kept_offsets = np.concatenate(([0], np.cumsum(kept_counts)))
    kept_list = pa.ListArray.from_arrays(
        pa.array(kept_offsets, type=pa.int32()), kept_values
    )
    clean = pc.binary_join(kept_list, "\n")
    return clean, spans


def _extract_batch_vectorized(texts: list[str]) -> tuple[list[str], list[list[dict]]]:
    """List-in/list-out wrapper over the Arrow kernel (test surface)."""
    clean, spans = _extract_batch_arrow(pa.array(texts, type=pa.string()))
    return clean.to_pylist(), spans.to_pylist()


def extract_turns_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task form of the extract stage (same kernel)."""
    col = batch["text"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    clean, spans = _extract_batch_arrow(col)
    out = batch.drop_columns(["text"]).append_column("clean_text", clean)
    return out.append_column("spans", spans.cast(SPAN_TYPE))


def extract_turns_batch_nospans(batch: pa.Table) -> pa.Table:
    """Span-free fast path (pipelines that drop spans skip building them)."""
    col = batch["text"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    clean, _ = _extract_batch_arrow(col, with_spans=False)
    return batch.drop_columns(["text"]).append_column("clean_text", clean)


def _binary_from_flat(flat: np.ndarray, row_offsets: np.ndarray) -> pa.Array:
    """Zero-copy-ish BinaryArray: row i's value = flat[row_offsets[i]:
    row_offsets[i+1]] serialized — one buffer, no per-row Python."""
    item = flat.dtype.itemsize
    offs = (row_offsets * item).astype(np.int32)
    return pa.Array.from_buffers(
        pa.binary(), len(row_offsets) - 1,
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(flat.tobytes())],
    )


# span kind codes for the packed (join-safe) representation
_KIND_CODES = ("content", "furniture", "boilerplate")


def extract_turns_batch_packed_spans(batch: pa.Table) -> pa.Table:
    """Spans as three PLAIN BINARY columns (packed int32 starts/ends +
    uint8 kind codes): Acero hash joins reject every list-typed payload
    column, so this is the spans representation that survives the
    meta_via='join' path; unpack_spans_batch restores list<struct>
    after the join."""
    import pyarrow.compute as pc

    col = batch["text"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    clean, spans = _extract_batch_arrow(col, with_spans=True)
    # repack the list<struct> parts into flat buffers
    struct = spans.values
    loffs = spans.offsets.to_numpy().astype(np.int64)
    starts = struct.field("start").to_numpy().astype(np.int32)
    ends = struct.field("end").to_numpy().astype(np.int32)
    kind_idx = pc.index_in(
        struct.field("kind"), value_set=pa.array(_KIND_CODES)
    ).to_numpy(zero_copy_only=False).astype(np.uint8)
    out = batch.drop_columns(["text"]).append_column("clean_text", clean)
    out = out.append_column("spans_start_bin", _binary_from_flat(starts, loffs))
    out = out.append_column("spans_end_bin", _binary_from_flat(ends, loffs))
    return out.append_column("spans_kind_bin", _binary_from_flat(kind_idx, loffs))


def unpack_spans_batch(batch: pa.Table) -> pa.Table:
    """Inverse of the packed representation: rebuild the spans
    list<struct> column from the three binary columns (one flat
    concat + one offsets pass, no per-row Python)."""
    from prlib_ray.schema import SPAN_TYPE

    def flat(col, dtype):
        """(values restricted to this array's rows, list offsets)."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        off = np.frombuffer(col.buffers()[1], dtype=np.int32)[
            col.offset : col.offset + len(col) + 1
        ].astype(np.int64)
        vals = np.frombuffer(col.buffers()[2], dtype=dtype)
        item = np.dtype(dtype).itemsize
        lo = off[0] // item
        n = int((off[-1] - off[0]) // item)
        return vals[lo : lo + n], (off - off[0]) // item

    starts, loffs = flat(batch["spans_start_bin"], np.int32)
    ends, _ = flat(batch["spans_end_bin"], np.int32)
    kinds, _ = flat(batch["spans_kind_bin"], np.uint8)
    kind_arr = pa.array(np.asarray(_KIND_CODES, dtype=object)[kinds],
                        type=pa.string())
    struct = pa.StructArray.from_arrays(
        [pa.array(starts, type=pa.int32()),
         pa.array(ends, type=pa.int32()), kind_arr],
        names=["start", "end", "kind"],
    )
    spans = pa.ListArray.from_arrays(
        pa.array(loffs, type=pa.int32()), struct
    ).cast(SPAN_TYPE)
    out = batch.drop_columns(
        ["spans_start_bin", "spans_end_bin", "spans_kind_bin"]
    )
    return out.append_column("spans", spans)


class ExtractTurns:
    """Actor-pool stage: compiled patterns live once per actor.

    (The per-turn window statistics stay inside a turn, so this stage is
    embarrassingly parallel — no shuffle.)
    """

    def __init__(self):
        # once-per-actor init (a real DOM parser / model load goes here)
        self.n_processed = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.n_processed += batch.num_rows
        return extract_turns_batch(batch)


# ---------------------------------------------------------------------------
# exact-integer extraction twin (the oracle-backed driver query)
#
# The flagship's per-turn keep decision is float Sauvola
# (binarizeSauvola.cpp:64-101 analogue): xv > m*(1 + k*(s/R - 1)) with
# k=0.2, R=128 over the clamped candidate window.  Multiplying through by
# 640*n and squaring (both sides non-negative once D > 0) turns it into
# pure integer arithmetic a SQL engine can mirror bit-for-bit:
#
#   m = S/n,  s^2 = (n*Q - S^2)/n^2        (S, Q = window sum / sum-sq)
#   keep  <=>  640*n*xv > 512*S + S*s
#         <=>  D > 0  AND  n^2*D^2 > S^2*(n*Q - S^2),   D = 640*n*xv - 512*S
#
# With the alnum count clamped at EXACT_XMAX = 10^4 and the window <= 5
# lines, every product fits int64 (S <= 5e4, Q <= 5e8: the RHS tops out
# at 6.25e18 < 2^63); DuckDB runs the same inequality in HUGEINT.
#
# The input transcript is synthesized DETERMINISTICALLY from documents
# (so the oracle can rebuild it in SQL): each doc is one turn of
# conv_id = doc_id % EXACT_NCONV; its words chunk into lines of
# EXACT_LINE_WORDS; four furniture plants keyed on doc_id mods make every
# furniture rule non-vacuous at every sf (the dedup_embedding lesson).
# ---------------------------------------------------------------------------

EXACT_NCONV = 37
EXACT_LINE_WORDS = 8
EXACT_XMAX = 10_000  # alnum clamp keeping n^2*D^2 and S^2*(nQ-S^2) in int64
EXACT_CONTENT_BASE = 10  # content line_no offset (plants sit outside it)
# (doc_id modulus, line_no, text) — each plant fires a DIFFERENT rule:
# separator run / pipe nav / link farm / copyright chrome
EXACT_PLANTS = (
    (2, 0, "===="),
    (3, 1, "home | products | about | contact | login"),
    (5, 10**6, "see https://tracker.example/click?id=12345 now"),
    (7, 10**6 + 1, "(c) 2024 all rights reserved"),
)


def _exact_line_frame(batch: pa.Table):
    """Steps 1-4 of the exact-extraction kernel, shared by the per-turn
    emitters (extract_exact_batch, extract_spans_batch): the
    deterministic transcript's line table in (doc, line_no) order with
    per-line furniture flags and Sauvola keep decisions.  Returns None
    on an empty batch, else (ids, ldoc, lines, char_lens, furniture,
    keep)."""
    import pyarrow.compute as pc

    from prlib_ray.blocks import BlockFrame, window_sum

    ids_col = batch["doc_id"]
    if isinstance(ids_col, pa.ChunkedArray):
        ids_col = ids_col.combine_chunks()
    texts = batch["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    ids = ids_col.to_numpy(zero_copy_only=False).astype(np.int64)
    ndocs = len(ids)
    if ndocs == 0:
        return None

    # 1. words -> content lines of EXACT_LINE_WORDS (SQL: GROUP BY
    #    doc_id, (i-1)//8 + string_agg ORDER BY i)
    lv = pc.split_pattern(texts, pattern=" ")
    if isinstance(lv, pa.ChunkedArray):
        lv = lv.combine_chunks()
    woff = lv.offsets.to_numpy().astype(np.int64)
    words = lv.values
    nw = np.diff(woff)  # >= 1 always: split of '' is ['']
    nl = (nw + EXACT_LINE_WORDS - 1) // EXACT_LINE_WORDS
    # content line_nos live in [EXACT_CONTENT_BASE, 10^6); a doc would
    # need ~8M words to collide with the tail plants
    assert int(nl.max()) < 10**6 - EXACT_CONTENT_BASE
    line_doc = np.repeat(np.arange(ndocs, dtype=np.int64), nl)
    nl_starts = np.concatenate(([0], np.cumsum(nl)))
    line_rank = np.arange(nl_starts[-1], dtype=np.int64) - np.repeat(
        nl_starts[:-1], nl
    )
    starts = woff[:-1][line_doc] + EXACT_LINE_WORDS * line_rank
    offsets32 = np.append(starts, woff[-1]).astype(np.int32)
    content_lines = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets32, type=pa.int32()), words),
        " ",
    )
    if isinstance(content_lines, pa.ChunkedArray):
        content_lines = content_lines.combine_chunks()
    n_content_lines = len(content_lines)

    # 2. assemble the full (doc, line_no)-ordered line table: content +
    #    the four deterministic furniture plants
    doc_parts = [line_doc]
    lno_parts = [EXACT_CONTENT_BASE + line_rank]
    src_parts = [np.arange(n_content_lines, dtype=np.int64)]
    for k, (mod, lno, _txt) in enumerate(EXACT_PLANTS):
        hit = np.flatnonzero(ids % mod == 0)
        doc_parts.append(hit)
        lno_parts.append(np.full(len(hit), lno, dtype=np.int64))
        src_parts.append(np.full(len(hit), n_content_lines + k, dtype=np.int64))
    doc_all = np.concatenate(doc_parts)
    lno_all = np.concatenate(lno_parts)
    src_all = np.concatenate(src_parts)
    perm = np.lexsort((lno_all, doc_all))
    pool = pa.concat_arrays(
        [content_lines, pa.array([t for _, _, t in EXACT_PLANTS], type=pa.string())]
    )
    lines = pool.take(pa.array(src_all[perm]))
    ldoc = doc_all[perm]

    # 3. per-line features + the shared furniture rules
    char_lens = pc.utf8_length(lines).to_numpy().astype(np.int64)
    byte_lens = _byte_lens(lines)
    furniture = _furniture_mask(lines, char_lens, byte_lens)
    alnum = _byte_class_counts(lines, _ALNUM_TABLE)
    xv = np.minimum(alnum, EXACT_XMAX)

    # 4. the exact-integer Sauvola decision over candidate windows
    cand = ~furniture
    cidx = np.flatnonzero(cand)
    keep = np.zeros(len(ldoc), dtype=bool)
    if len(cidx):
        ccounts = np.bincount(ldoc[cidx], minlength=ndocs)
        coff = np.concatenate(([0], np.cumsum(ccounts))).astype(np.int64)
        frame = BlockFrame(doc_offsets=coff, blocks=[], x=xv[cidx])
        x_c = xv[cidx]
        s, n = window_sum(x_c, frame, WINDOW, WINDOW)
        q, _ = window_sum(x_c * x_c, frame, WINDOW, WINDOW)
        d = 640 * n * x_c - 512 * s
        keep[cidx] = (d > 0) & ((n * n) * (d * d) > (s * s) * (n * q - s * s))
    return ids, ldoc, lines, char_lens, furniture, keep


def extract_exact_batch(batch: pa.Table) -> pa.Table:
    """documents (doc_id, text) -> per-turn exact extraction rows.

    Embarrassingly parallel (per-turn windows never cross rows): one
    map_batches, no shuffle.  Output: (conv_id, turn_idx, clean_text,
    n_content, n_furniture, n_boilerplate) — the driver's value hash
    checks the extracted text itself, i.e. per-turn text equality."""
    import pyarrow.compute as pc

    empty = pa.table(
        {
            "conv_id": pa.array([], type=pa.int64()),
            "turn_idx": pa.array([], type=pa.int64()),
            "clean_text": pa.array([], type=pa.string()),
            "n_content": pa.array([], type=pa.int64()),
            "n_furniture": pa.array([], type=pa.int64()),
            "n_boilerplate": pa.array([], type=pa.int64()),
        }
    )
    frame = _exact_line_frame(batch)
    if frame is None:
        return empty
    ids, ldoc, lines, _char_lens, furniture, keep = frame
    ndocs = len(ids)
    cand = ~furniture

    # 5. per-turn outputs: kept lines re-join in (doc, line_no) order
    kept_vals = lines.filter(pa.array(keep))
    kcounts = np.bincount(ldoc[keep], minlength=ndocs)
    koff = np.concatenate(([0], np.cumsum(kcounts))).astype(np.int32)
    clean = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(koff, type=pa.int32()), kept_vals), "\n"
    )
    n_furn = np.bincount(ldoc[furniture], minlength=ndocs)
    n_boiler = np.bincount(ldoc[cand & ~keep], minlength=ndocs)
    return pa.table(
        {
            "conv_id": pa.array(ids % EXACT_NCONV, type=pa.int64()),
            "turn_idx": pa.array(ids // EXACT_NCONV, type=pa.int64()),
            "clean_text": clean,
            "n_content": pa.array(kcounts.astype(np.int64), type=pa.int64()),
            "n_furniture": pa.array(n_furn.astype(np.int64), type=pa.int64()),
            "n_boilerplate": pa.array(n_boiler.astype(np.int64), type=pa.int64()),
        }
    )


def extract_spans_batch(batch: pa.Table) -> pa.Table:
    """documents (doc_id, text) -> one row per KEPT line: the SPANS
    view of the exact extraction (SURVEY §1.2's spans column as flat
    driver-hashable rows).  (conv_id, turn_idx, span_idx, span_start,
    span_end): span_idx ranks kept lines in line_no order within the
    turn; span_start/span_end are CHARACTER offsets of the line inside
    the turn's clean_text ('\n'-joined), so span_start = sum of prior
    kept line lengths + one separator each and span_end - span_start =
    the line's char length.  Shares _exact_line_frame with
    extract_exact_batch — the decisions cannot drift.  Embarrassingly
    parallel: one map_batches, no shuffle, text never leaves the
    batch."""
    empty = pa.table({
        "conv_id": pa.array([], type=pa.int64()),
        "turn_idx": pa.array([], type=pa.int64()),
        "span_idx": pa.array([], type=pa.int64()),
        "span_start": pa.array([], type=pa.int64()),
        "span_end": pa.array([], type=pa.int64()),
    })
    frame = _exact_line_frame(batch)
    if frame is None:
        return empty
    ids, ldoc, _lines, char_lens, _furniture, keep = frame
    ndocs = len(ids)
    kdoc = ldoc[keep]
    klen = char_lens[keep]
    if len(kdoc) == 0:
        return empty
    kcounts = np.bincount(kdoc, minlength=ndocs)
    koff = np.concatenate(([0], np.cumsum(kcounts))).astype(np.int64)
    span_idx = np.arange(len(kdoc), dtype=np.int64) - np.repeat(
        koff[:-1], kcounts)
    # grouped exclusive prefix sum of (len + 1): global prefix minus the
    # group's base (prev at the group's first element)
    prev = np.concatenate(([0], np.cumsum(klen + 1)[:-1]))
    # zero-kept docs repeat 0 times, but their koff can point one past
    # the last row — clip before the (unused) gather
    base = prev[np.minimum(koff[:-1], len(kdoc) - 1)]
    start = prev - np.repeat(base, kcounts)
    return pa.table({
        "conv_id": pa.array(ids[kdoc] % EXACT_NCONV, type=pa.int64()),
        "turn_idx": pa.array(ids[kdoc] // EXACT_NCONV, type=pa.int64()),
        "span_idx": pa.array(span_idx),
        "span_start": pa.array(start),
        "span_end": pa.array(start + klen),
    })
