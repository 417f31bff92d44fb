"""Oracles for the morphological post-pass, warpCrop, and the
compareImages-style extraction-equality join."""

from __future__ import annotations

from prlib_ray.oracles import _BLOCKS_CTE, _rule_parts, _select_clean, binarize_sql


def binarize_morph_sql(rule: str = "sauvola", morph_iters: int = 2) -> str:
    """Threshold keep-rule + iterated close (dilate then erode) via
    lag/lead CTE chains — the exact mirror of morphology.morph_close.
    Works for EVERY rule via the shared _rule_parts decomposition (the
    reference runs the epilogue after every windowed binarization with
    per-op iteration defaults, e.g. binarizeSauvola.cpp:125-134)."""
    rule_ctes, keep0, source = _rule_parts(rule)
    ctes = [f"k0 AS (SELECT doc_id, bidx, block, ({keep0}) AS k FROM {source})"]
    cur = "k0"
    for i in range(morph_iters):
        d = f"d{i}"
        e = f"e{i}"
        ctes.append(f"""
{d} AS (
    SELECT doc_id, bidx, block,
           (k OR (coalesce(lag(k) OVER w, FALSE)
                  AND coalesce(lead(k) OVER w, FALSE))) AS k
    FROM {cur} WINDOW w AS (PARTITION BY doc_id ORDER BY bidx)
)""")
        ctes.append(f"""
{e} AS (
    SELECT doc_id, bidx, block,
           (k AND (coalesce(lag(k) OVER w, FALSE)
                   OR coalesce(lead(k) OVER w, FALSE)
                   OR (lag(k) OVER w IS NULL AND lead(k) OVER w IS NULL))) AS k
    FROM {d} WINDOW w AS (PARTITION BY doc_id ORDER BY bidx)
)""")
        cur = e
    body = ",".join(ctes)
    return f"WITH {_BLOCKS_CTE}{rule_ctes},{body}\n{_select_clean('k', cur)}"


WARP_CROP = None  # built below


def warp_crop_sql() -> str:
    """warpCrop strict slice: text cropped exactly to the detected span;
    '' when no valid contour (no full-text fallback)."""
    from prlib_ray.oracles_ext import _ISLANDS_CTE

    return f"""
WITH {_ISLANDS_CTE},
gated AS (
    SELECT doc_id, s, e FROM winner WHERE 20 * isum >= dsum
)
SELECT f.doc_id,
       coalesce(string_agg(f.block, chr(10) ORDER BY f.bidx)
                FILTER (WHERE g.s IS NOT NULL AND f.bidx BETWEEN g.s AND g.e),
                '') AS clean_text
FROM feat f LEFT JOIN gated g ON f.doc_id = g.doc_id
GROUP BY f.doc_id ORDER BY f.doc_id"""


def warp_crop_points_sql() -> str:
    """warpCrop(points): slice only when the full quadrangle-validity
    gate stack passes (area AND side-ratio AND straight-corner — the
    CheckRectangle pipeline), else ''."""
    from prlib_ray.oracles_ext import CHECK_RECTANGLE

    return f"""
WITH gates AS ({CHECK_RECTANGLE}
)
SELECT f.doc_id,
       coalesce(string_agg(f.block, chr(10) ORDER BY f.bidx)
                FILTER (WHERE g.quad_ok AND f.bidx BETWEEN g.span_start
                        AND g.span_end),
                '') AS clean_text
FROM (
    WITH {_BLOCKS_CTE}
    SELECT doc_id, bidx, block FROM feat
) f JOIN gates g ON f.doc_id = g.doc_id
GROUP BY f.doc_id ORDER BY f.doc_id"""


def compare_extractions_sql() -> str:
    """compareImages analogue (utils.cpp:37-86): exact-equality metric of
    two operator outputs, joined per document."""
    a = binarize_sql("sauvola")
    b = binarize_sql("niblack")
    return f"""
WITH a AS ({a}),
b AS ({b})
SELECT a.doc_id, (a.clean_text = b.clean_text) AS equal
FROM a JOIN b ON a.doc_id = b.doc_id
ORDER BY a.doc_id"""


def compare_fraction_sql() -> str:
    """compareImages full semantics: per-doc equal-line counts; shape
    mismatch (different line counts) -> n_eq 0 (the reference returns
    0.0 on size/type mismatch, utils.cpp:52-60)."""
    a = binarize_sql("sauvola")
    b = binarize_sql("niblack")
    return f"""
WITH a AS ({a}),
b AS ({b}),
sa AS (
    SELECT doc_id, unnest(string_split(clean_text, chr(10))) AS ln,
           generate_subscripts(string_split(clean_text, chr(10)), 1) AS i
    FROM a
),
sb AS (
    SELECT doc_id, unnest(string_split(clean_text, chr(10))) AS ln,
           generate_subscripts(string_split(clean_text, chr(10)), 1) AS i
    FROM b
),
ca AS (SELECT doc_id, count(*) AS na FROM sa GROUP BY doc_id),
cb AS (SELECT doc_id, count(*) AS nb FROM sb GROUP BY doc_id),
eq AS (
    SELECT sa.doc_id, count(*) FILTER (WHERE sa.ln = sb.ln) AS ne
    FROM sa JOIN sb ON sa.doc_id = sb.doc_id AND sa.i = sb.i
    GROUP BY sa.doc_id
)
SELECT ca.doc_id,
       CAST(CASE WHEN ca.na = cb.nb THEN coalesce(eq.ne, 0) ELSE 0 END
            AS BIGINT) AS n_eq,
       CAST(greatest(ca.na, cb.nb) AS BIGINT) AS n_lines
FROM ca JOIN cb ON ca.doc_id = cb.doc_id
LEFT JOIN eq ON ca.doc_id = eq.doc_id
ORDER BY ca.doc_id"""
