"""DuckDB oracle SQL for the normalize/denoise/furniture/quality/thinning/
crop families.  Same exactness contract as prlib_ray/oracles.py.

Note on escapes: DuckDB standard strings do NOT process backslash escapes,
so ``'[ \\t\\r\\n]+'`` reaches RE2 as backslash escapes (RE2 resolves
them); literal control characters for non-regex args are built with
``chr()``.
"""

from __future__ import annotations

from prlib_ray.oracles import _BLOCKS_CTE

WS = "' ' || chr(9) || chr(13) || chr(10)"

BACKGROUND_NORMALIZATION = f"""
SELECT doc_id,
       trim(regexp_replace(text, '[ \t\r\n]+', ' ', 'g'), {WS}) AS clean_text
FROM documents ORDER BY doc_id"""

CLEAN_BACKGROUND = """
SELECT doc_id,
       regexp_replace(
         replace(replace(replace(replace(replace(text,
           '​', ''), '‌', ''), '‍', ''), '﻿', ''), '­', ''),
         '\n{3,}', chr(10) || chr(10), 'g') AS clean_text
FROM documents ORDER BY doc_id"""

_FOLD = ("replace(replace(replace(replace(replace(replace(replace(replace(text,"
         " '‘', ''''), '’', ''''), '“', '\"'), '”', '\"'),"
         " '–', '-'), '—', '-'), '…', '...'), ' ', ' ')")

GAMMA_CORRECTION = f"""
SELECT doc_id, {_FOLD} AS clean_text FROM documents ORDER BY doc_id"""

COLOR_BALANCE = f"""
SELECT doc_id, lower({_FOLD}) AS clean_text FROM documents ORDER BY doc_id"""

CORRECT_NUIL = f"""
WITH {_BLOCKS_CTE},
cnt AS (
    SELECT doc_id, bidx, block,
           len(regexp_extract_all(block, '[A-Z]')) AS n_up,
           len(regexp_extract_all(block, '[a-z]')) AS n_lo
    FROM feat
),
w AS (
    SELECT *, sum(n_up) OVER win AS up_w, sum(n_lo) OVER win AS lo_w
    FROM cnt
    WINDOW win AS (PARTITION BY doc_id ORDER BY bidx
                   ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN up_w > lo_w THEN lower(block) ELSE block END,
                           chr(10) ORDER BY bidx), '') AS clean_text
FROM w GROUP BY doc_id ORDER BY doc_id"""

SIMPLE_WHITE_BALANCE = """
WITH words AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM documents
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY length(w)) AS rn,
           count(*) OVER (PARTITION BY doc_id) AS n
    FROM words
),
clip AS (
    SELECT doc_id, max(length(w)) FILTER (WHERE rn <= (19 * n + 19) // 20) AS c
    FROM ranked GROUP BY doc_id
)
SELECT r.doc_id,
       coalesce(string_agg(left(r.w, c.c), ' ' ORDER BY r.i), '') AS clean_text
FROM ranked r JOIN clip c ON r.doc_id = c.doc_id
GROUP BY r.doc_id ORDER BY r.doc_id"""

GRAY_WORLD = """
WITH lens AS (
    SELECT doc_id, lang, length(text) AS x FROM documents
),
agg AS (
    SELECT *, avg(x) OVER () AS gm, avg(x) OVER (PARTITION BY lang) AS lm FROM lens
)
SELECT doc_id, x * gm / lm AS balanced_len FROM agg ORDER BY doc_id"""

DENOISE_SALT_PEPPER = """
SELECT doc_id,
       regexp_replace(text, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f�]',
                      '', 'g') AS clean_text
FROM documents ORDER BY doc_id"""

DENOISE_NLM = f"""
WITH {_BLOCKS_CTE},
lagged AS (
    SELECT *,
           coalesce(block = lag(block, 1) OVER dw, FALSE)
        OR coalesce(block = lag(block, 2) OVER dw, FALSE)
        OR coalesce(block = lag(block, 3) OVER dw, FALSE) AS dup
    FROM feat
    WINDOW dw AS (PARTITION BY doc_id ORDER BY bidx)
)
SELECT doc_id,
       coalesce(string_agg(block, chr(10) ORDER BY bidx)
                FILTER (WHERE NOT dup), '') AS clean_text
FROM lagged GROUP BY doc_id ORDER BY doc_id"""

BASIC_DEBLUR = """
SELECT doc_id, regexp_replace(text, '([a-z])- ', '\\1', 'g') AS clean_text
FROM documents ORDER BY doc_id"""

KUWAHARA = f"""
WITH {_BLOCKS_CTE},
sides AS (
    SELECT doc_id, bidx,
           avg(x) OVER wl AS ml,
           greatest(avg(x*x) OVER wl - (avg(x) OVER wl) * (avg(x) OVER wl),
                    CAST(0.0 AS DOUBLE)) AS vl,
           avg(x) OVER wr AS mr,
           greatest(avg(x*x) OVER wr - (avg(x) OVER wr) * (avg(x) OVER wr),
                    CAST(0.0 AS DOUBLE)) AS vr
    FROM feat
    WINDOW wl AS (PARTITION BY doc_id ORDER BY bidx
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
           wr AS (PARTITION BY doc_id ORDER BY bidx
                  ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING)
)
SELECT doc_id, bidx, CASE WHEN vl <= vr THEN ml ELSE mr END AS smoothed
FROM sides ORDER BY doc_id, bidx"""

WIENER = f"""
WITH {_BLOCKS_CTE}
SELECT doc_id, bidx, CAST(2.0 AS DOUBLE) * x - m AS restored
FROM win ORDER BY doc_id, bidx"""

REMOVE_LINES = """
SELECT doc_id, regexp_replace(text, '-{4,}|={4,}|_{4,}', '', 'g') AS clean_text
FROM documents ORDER BY doc_id"""

REMOVE_DOTS = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, ' [.,;:!?*•] ')) AS BIGINT) AS n_dots,
       text AS clean_text
FROM documents ORDER BY doc_id"""

REMOVE_HOLE_PUNCH = """
WITH words AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM documents
),
marked AS (
    SELECT *, count(*) OVER (PARTITION BY doc_id) AS n FROM words
)
SELECT doc_id,
       coalesce(string_agg(w, ' ' ORDER BY i)
                FILTER (WHERE NOT (w = 'dup'
                                   AND (i <= (n + 9) // 10 OR i > n - (n + 9) // 10))),
                '') AS clean_text
FROM marked GROUP BY doc_id ORDER BY doc_id"""

BLUR_SCORES = f"""
WITH {_BLOCKS_CTE},
nbr AS (
    SELECT doc_id, bidx, x,
           lag(x)  OVER dw AS px,
           lead(x) OVER dw AS nx
    FROM feat
    WINDOW dw AS (PARTITION BY doc_id ORDER BY bidx)
),
lap AS (
    SELECT doc_id, bidx, x,
           CASE WHEN px IS NOT NULL AND nx IS NOT NULL THEN px - 2 * x + nx END AS l,
           CASE WHEN px IS NOT NULL AND nx IS NOT NULL THEN nx - px END AS g
    FROM nbr
),
agg AS (
    SELECT doc_id,
           count(l) AS n_int,
           sum(abs(l)) AS sl, sum(l) AS ssl, sum(l * l) AS sll,
           sum(g * g) AS sgg,
           sum(x) AS sx, sum(x * x) AS sxx, count(*) AS nb
    FROM lap GROUP BY doc_id
)
SELECT doc_id,
       CASE WHEN n_int > 0 THEN CAST(sl AS DOUBLE) / n_int ELSE CAST(0.0 AS DOUBLE) END AS lapm,
       CASE WHEN n_int > 0 THEN greatest(
                CAST(sll AS DOUBLE) / n_int
              - (CAST(ssl AS DOUBLE) / n_int) * (CAST(ssl AS DOUBLE) / n_int),
                CAST(0.0 AS DOUBLE))
            ELSE CAST(0.0 AS DOUBLE) END AS lapv,
       CASE WHEN n_int > 0 THEN CAST(sgg AS DOUBLE) / n_int ELSE CAST(0.0 AS DOUBLE) END AS teng,
       CASE WHEN CAST(sx AS DOUBLE) / nb > CAST(0.0 AS DOUBLE)
            THEN greatest(CAST(sxx AS DOUBLE) / nb
                          - (CAST(sx AS DOUBLE) / nb) * (CAST(sx AS DOUBLE) / nb),
                          CAST(0.0 AS DOUBLE)) / (CAST(sx AS DOUBLE) / nb)
            ELSE CAST(0.0 AS DOUBLE) END AS glvn,
       FALSE AS is_blurred
FROM agg ORDER BY doc_id"""

GLARE_SCORES = """
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
)
SELECT doc_id, max(length(w)) AS max_token_len, FALSE AS is_glared
FROM words GROUP BY doc_id ORDER BY doc_id"""

THIN_ZHANG_SUEN = """
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                           ' +', ' ', 'g'), ' ') AS clean_text
FROM documents ORDER BY doc_id"""

THIN_GUO_HALL = """
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z ]', '', 'g'),
                           ' +', ' ', 'g'), ' ') AS clean_text
FROM documents ORDER BY doc_id"""

_ISLANDS_CTE = f"""
{_BLOCKS_CTE},
content AS (
    SELECT *, (x >= 20) AS c FROM feat
),
grp AS (
    SELECT *, bidx - row_number() OVER (PARTITION BY doc_id, c ORDER BY bidx) AS gid
    FROM content
),
islands AS (
    SELECT doc_id, min(bidx) AS s, max(bidx) AS e, sum(x) AS isum
    FROM grp WHERE c GROUP BY doc_id, gid
),
docsum AS (
    SELECT doc_id, sum(x) AS dsum FROM feat GROUP BY doc_id
),
winner AS (
    SELECT i.doc_id, i.s, i.e, i.isum, d.dsum
    FROM islands i JOIN docsum d ON i.doc_id = d.doc_id
    QUALIFY row_number() OVER (PARTITION BY i.doc_id
                               ORDER BY i.isum DESC, i.s ASC) = 1
)"""

DOCUMENT_CONTOUR = f"""
WITH {_ISLANDS_CTE}
SELECT d.doc_id,
       CASE WHEN w.s IS NOT NULL AND 20 * w.isum >= w.dsum THEN w.s ELSE -1 END AS span_start,
       CASE WHEN w.s IS NOT NULL AND 20 * w.isum >= w.dsum THEN w.e ELSE -1 END AS span_end
FROM documents d LEFT JOIN winner w ON d.doc_id = w.doc_id
ORDER BY d.doc_id"""

AUTOCROP = f"""
WITH {_ISLANDS_CTE},
gated AS (
    SELECT doc_id, s, e FROM winner WHERE 20 * isum >= dsum
)
SELECT f.doc_id,
       coalesce(string_agg(f.block, chr(10) ORDER BY f.bidx)
                FILTER (WHERE g.s IS NULL OR f.bidx BETWEEN g.s AND g.e),
                '') AS clean_text
FROM feat f LEFT JOIN gated g ON f.doc_id = g.doc_id
GROUP BY f.doc_id ORDER BY f.doc_id"""

HOUGH_REGION = f"""
WITH {_BLOCKS_CTE},
seps AS (
    SELECT doc_id,
           min(bidx) FILTER (WHERE regexp_matches(block, '-{{4,}}|={{4,}}|_{{4,}}')) AS fs,
           max(bidx) FILTER (WHERE regexp_matches(block, '-{{4,}}|={{4,}}|_{{4,}}')) AS ls,
           count(*) FILTER (WHERE regexp_matches(block, '-{{4,}}|={{4,}}|_{{4,}}')) AS ns
    FROM feat GROUP BY doc_id
)
SELECT f.doc_id,
       coalesce(string_agg(f.block, chr(10) ORDER BY f.bidx)
                FILTER (WHERE s.ns < 2 OR s.ls - s.fs <= 1
                        OR (f.bidx > s.fs AND f.bidx < s.ls)),
                '') AS clean_text
FROM feat f JOIN seps s ON f.doc_id = s.doc_id
GROUP BY f.doc_id ORDER BY f.doc_id"""

RESIZE = """
WITH words AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM documents
)
SELECT doc_id,
       coalesce(string_agg(w, ' ' ORDER BY i) FILTER (WHERE i <= 60), '') AS clean_text
FROM words GROUP BY doc_id ORDER BY doc_id"""

SPLIT_PAGE = """
SELECT doc_id, text AS clean_text FROM documents ORDER BY doc_id"""
