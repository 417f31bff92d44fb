"""Thinning family (reference: src/thinning/thinZhangSuen.cpp,
thinGuoHall.cpp) — reduce to a minimal skeleton.

The reference iterates a 2-subiteration neighborhood rule to fixpoint
(thinZhangSuen.cpp:57-108).  The transcript analogue strips all markup
down to a plain-text skeleton; the two variants differ in the survival
rule exactly as the reference's two thinning rules do.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _skeleton(batch: pa.Table, pattern: str) -> pa.Table:
    t = pc.utf8_lower(batch["text"])
    t = pc.replace_substring_regex(t, pattern=pattern, replacement="")
    t = pc.replace_substring_regex(t, pattern=" +", replacement=" ")
    t = pc.utf8_trim(t, characters=" ")
    return pa.table({"doc_id": batch["doc_id"], "clean_text": t})


def thin_zhang_suen_batch(batch: pa.Table) -> pa.Table:
    """Zhang-Suen rule: survivors are lowercase alphanumerics + space."""
    return _skeleton(batch, "[^a-z0-9 ]")


def thin_guo_hall_batch(batch: pa.Table) -> pa.Table:
    """Guo-Hall rule: stricter — survivors are lowercase letters + space."""
    return _skeleton(batch, "[^a-z ]")
