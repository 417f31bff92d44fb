"""Arrow schemas for the transcript data model.

Mirrors the reference's fixed, runtime-checked data model (one document =
one ``cv::Mat``; every op validates its input type, e.g.
/root/reference/src/binarizations/binarizeSauvola.cpp:38-47).  Here the
document is one *turn row* of a conversation table; whole-document ops
(deskew/crop analogues) act on a *conversation group*.
"""

from __future__ import annotations

import pyarrow as pa

# Input table (authoritative shape from BASELINE.json `input_hint`).
TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Span column: the geometry IR (reference: contour quadrangles,
# src/border_detection/autoCropUtils.h:49-79) — derived coordinate
# structures pointing back into the turn's text.
SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("start", pa.int32()),
            ("end", pa.int32()),
            ("kind", pa.string()),
        ]
    )
)

# Output adds columns instead of mutating (reference's in/out-param style).
EXTRACTED_SCHEMA = pa.schema(
    list(TRANSCRIPT_SCHEMA)
    + [
        ("clean_text", pa.string()),
        ("spans", SPAN_TYPE),
    ]
)

ROLES = ("user", "assistant", "system", "tool")
