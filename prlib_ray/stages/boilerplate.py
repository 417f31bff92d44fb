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


def _extract_batch_vectorized(texts: list[str]) -> tuple[list[str], list[list[dict]]]:
    """Vectorized batch implementation of ``extract_turn`` — identical
    output, but all regex work runs as RE2 Arrow kernels over the flat
    line array and the window statistics use the prefix-sum machinery
    (tests pin vectorized == scalar)."""
    import pyarrow.compute as pc

    from prlib_ray.blocks import BlockFrame, split_line_blocks, window_mean_var

    cleaned_arr = pa.array(texts, type=pa.string())
    for a, b in FOLD_PAIRS:
        cleaned_arr = pc.replace_substring(cleaned_arr, pattern=a, replacement=b)
    cleaned_arr = pc.replace_substring_regex(
        cleaned_arr, pattern="[\x00-\x08\x0b\x0c\x0e-\x1f\x7f�]", replacement=""
    )
    cleaned_arr = pc.replace_substring_regex(
        cleaned_arr, pattern="([a-z])- ", replacement="\\1"
    )
    srcs = cleaned_arr.to_pylist()
    frame = split_line_blocks(srcs)
    lines = pa.array(frame.blocks, type=pa.string())
    nline = len(frame.blocks)

    lens = frame.x
    is_sep = pc.match_substring_regex(lines, pattern="^[-=_]{4,}$").to_numpy(
        zero_copy_only=False
    )
    low = pc.utf8_lower(lines)
    is_marker = np.zeros(nline, dtype=bool)
    for m in ("cookie", "(c) ", "all rights reserved"):
        is_marker |= pc.match_substring(low, pattern=m).to_numpy(
            zero_copy_only=False
        )
    n_pipes = pc.count_substring(lines, pattern=" | ").to_numpy().astype(np.int64)
    delinked = pc.replace_substring_regex(
        lines, pattern="<a\\b[^>]*>|</a>|https?://[^ \n]+", replacement=""
    )
    link_chars = lens - pc.utf8_length(delinked).to_numpy().astype(np.int64)
    furniture = is_sep | is_marker | (n_pipes >= 3) | (2 * link_chars > lens)

    alnum = pc.count_substring_regex(
        lines, pattern="[A-Za-z0-9]"
    ).to_numpy().astype(np.int64)
    candidate = ~furniture
    x = np.where(candidate, alnum, 0)

    # candidate-only sub-frame per turn for the windowed threshold
    counts = np.diff(frame.doc_offsets)
    doc = np.repeat(np.arange(frame.ndocs, dtype=np.int64), counts)
    cand_idx = np.flatnonzero(candidate)
    cand_doc = doc[cand_idx]
    cand_counts = np.bincount(cand_doc, minlength=frame.ndocs)
    cand_offsets = np.concatenate(([0], np.cumsum(cand_counts)))
    keep = np.zeros(nline, dtype=bool)
    if len(cand_idx):
        sub = BlockFrame(
            doc_offsets=cand_offsets.astype(np.int64),
            blocks=[""] * len(cand_idx),  # blocks unused for stats
            x=x[cand_idx],
        )
        m, _, s = window_mean_var(sub, WINDOW, WINDOW)
        t = m * (1.0 + SAUVOLA_K * (s / SAUVOLA_R - 1.0))
        keep[cand_idx] = x[cand_idx].astype(np.float64) > t

    cleans, span_lists = [], []
    offs = frame.doc_offsets
    blocks = frame.blocks
    for d in range(frame.ndocs):
        lo, hi = int(offs[d]), int(offs[d + 1])
        pos = 0
        spans = []
        kept = []
        for i in range(lo, hi):
            ln = blocks[i]
            kind = "content" if keep[i] else (
                "furniture" if furniture[i] else "boilerplate"
            )
            spans.append({"start": pos, "end": pos + len(ln), "kind": kind})
            if keep[i]:
                kept.append(ln)
            pos += len(ln) + 1
        cleans.append("\n".join(kept))
        span_lists.append(spans)
    return cleans, span_lists


def extract_turns_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task form of the extract stage (same kernel)."""
    texts = batch["text"].to_pylist()
    cleans, span_lists = _extract_batch_vectorized(texts)
    out = batch.drop_columns(["text"]).append_column(
        "clean_text", pa.array(cleans, type=pa.string())
    )
    return out.append_column("spans", pa.array(span_lists, type=SPAN_TYPE))


class ExtractTurns:
    """Actor-pool stage: compiled patterns live once per actor.

    (The per-turn window statistics stay inside a turn, so this stage is
    embarrassingly parallel — no shuffle.)
    """

    def __init__(self):
        # once-per-actor init (a real DOM parser / model load goes here)
        self.n_processed = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        cleans, span_lists = _extract_batch_vectorized(texts)
        self.n_processed += len(texts)
        out = batch.drop_columns(["text"]).append_column(
            "clean_text", pa.array(cleans, type=pa.string())
        )
        return out.append_column("spans", pa.array(span_lists, type=SPAN_TYPE))
