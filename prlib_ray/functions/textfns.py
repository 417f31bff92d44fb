"""Shared scalar text kernels (the reference's imageLibCommon analogue).

All patterns are RE2-compatible (no backreference *matching*, explicit
ASCII character classes instead of ``\\s``/``\\w``) so every kernel has a
byte-exact DuckDB ``regexp_replace`` mirror; module-level compilation =
once per worker process.
"""

from __future__ import annotations

import re

# --- whitespace / background -------------------------------------------------
# Explicit class, NOT \s: Python's \s is unicode-wide, RE2's is ASCII —
# the explicit class is identical on both sides.
WS_RUN = re.compile(r"[ \t\r\n]+")
STRIP_CHARS = " \t\r\n"

# invisible characters (cleanBackgroundToWhite analogue): zero-width space,
# zero-width non-joiner/joiner, BOM, soft hyphen
INVISIBLE = ("​", "‌", "‍", "﻿", "­")
BLANK_RUN = re.compile(r"\n{3,}")

# --- salt & pepper (denoiseSaltPepper analogue) ------------------------------
# isolated corrupt characters: C0 controls (except \t\n\r), DEL, U+FFFD
SALT_PEPPER = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f�]")

# --- separators (removeLines analogue) ---------------------------------------
SEPARATOR_RUN = re.compile(r"-{4,}|={4,}|_{4,}")

# --- stray tokens (removeDots analogue) --------------------------------------
DOT_TOKEN = re.compile(r" [.,;:!?*•] ")

# --- wrapped-line rejoin (basicDeblur analogue) ------------------------------
HYPHEN_WRAP = re.compile(r"([a-z])- ")

# --- char folding LUT (gammaCorrection analogue) -----------------------------
# Ordered pairs; the DuckDB mirror is the same replace() chain in the same
# order (prlib_ray/oracles_ext.py::_FOLD_SQL).
FOLD_PAIRS = (
    ("‘", "'"),
    ("’", "'"),
    ("“", '"'),
    ("”", '"'),
    ("–", "-"),
    ("—", "-"),
    ("…", "..."),
    (" ", " "),
)

# --- skeletonization (thinning analogue) -------------------------------------
NON_ALNUM_SPACE = re.compile(r"[^a-z0-9 ]")
NON_ALPHA_SPACE = re.compile(r"[^a-z ]")
SPACE_RUN = re.compile(r" +")

UPPER = re.compile(r"[A-Z]")
LOWER_RE = re.compile(r"[a-z]")


def normalize_whitespace(t: str) -> str:
    """backgroundNormalization analogue; SQL: trim(regexp_replace(t,'[ \\t\\r\\n]+',' ','g'),' \\t\\r\\n')."""
    return WS_RUN.sub(" ", t).strip(STRIP_CHARS)


def clean_background(t: str) -> str:
    """cleanBackgroundToWhite analogue: drop invisibles, collapse blank runs."""
    for ch in INVISIBLE:
        t = t.replace(ch, "")
    return BLANK_RUN.sub("\n\n", t)


def remove_salt_pepper(t: str) -> str:
    return SALT_PEPPER.sub("", t)


def remove_separator_runs(t: str) -> str:
    return SEPARATOR_RUN.sub("", t)


def rejoin_wrapped(t: str) -> str:
    return HYPHEN_WRAP.sub(r"\1", t)


def fold_chars(t: str) -> str:
    for a, b in FOLD_PAIRS:
        t = t.replace(a, b)
    return t


def skeleton_zhang_suen(t: str) -> str:
    """Markup -> minimal plain-text skeleton, iterate-to-fixpoint style."""
    t = NON_ALNUM_SPACE.sub("", t.lower())
    return SPACE_RUN.sub(" ", t).strip(" ")


def skeleton_guo_hall(t: str) -> str:
    t = NON_ALPHA_SPACE.sub("", t.lower())
    return SPACE_RUN.sub(" ", t).strip(" ")
