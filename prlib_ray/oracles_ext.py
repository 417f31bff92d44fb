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

def _retry_pass(src: str, suffix: str) -> str:
    """One islands pass over a named content-mask CTE (doc_id, bidx,
    block, x, c) -> winner{suffix}."""
    return f"""
grp{suffix} AS (
    SELECT *, bidx - row_number() OVER (PARTITION BY doc_id, c ORDER BY bidx) AS gid
    FROM {src}
),
islands{suffix} AS (
    SELECT doc_id, min(bidx) AS s, max(bidx) AS e, sum(x) AS isum
    FROM grp{suffix} WHERE c GROUP BY doc_id, gid
),
winner{suffix} AS (
    SELECT i.doc_id, i.s, i.e, i.isum, d.dsum
    FROM islands{suffix} i JOIN docsum d ON i.doc_id = d.doc_id
    QUALIFY row_number() OVER (PARTITION BY i.doc_id
                               ORDER BY i.isum DESC, i.s ASC) = 1
)"""


def _dilate_cte(src: str, dst: str) -> str:
    return f"""
{dst} AS (
    SELECT doc_id, bidx, block, x,
           (c OR coalesce(lag(c) OVER w, FALSE)
              OR coalesce(lead(c) OVER w, FALSE)) AS c
    FROM {src} WINDOW w AS (PARTITION BY doc_id ORDER BY bidx)
)"""


_OK = "w{n}.s IS NOT NULL AND 20 * w{n}.isum >= w{n}.dsum"

DOCUMENT_CONTOUR_RETRY = f"""
WITH {_BLOCKS_CTE},
docsum AS (
    SELECT doc_id, sum(x) AS dsum FROM feat GROUP BY doc_id
),
c0 AS (SELECT doc_id, bidx, block, x, (x >= 20) AS c FROM feat),{_dilate_cte('c0', 'c1')},{_dilate_cte('c1', 'c2')},{_retry_pass('c0', '0')},{_retry_pass('c1', '1')},{_retry_pass('c2', '2')}
SELECT d.doc_id,
       CAST(CASE WHEN {_OK.format(n=0)} THEN w0.s
                 WHEN {_OK.format(n=1)} THEN w1.s
                 WHEN {_OK.format(n=2)} THEN w2.s ELSE -1 END AS BIGINT) AS span_start,
       CAST(CASE WHEN {_OK.format(n=0)} THEN w0.e
                 WHEN {_OK.format(n=1)} THEN w1.e
                 WHEN {_OK.format(n=2)} THEN w2.e ELSE -1 END AS BIGINT) AS span_end,
       CAST(CASE WHEN {_OK.format(n=0)} THEN 0
                 WHEN {_OK.format(n=1)} THEN 1
                 WHEN {_OK.format(n=2)} THEN 2 ELSE -1 END AS BIGINT) AS n_retries
FROM documents d
LEFT JOIN winner0 w0 ON d.doc_id = w0.doc_id
LEFT JOIN winner1 w1 ON d.doc_id = w1.doc_id
LEFT JOIN winner2 w2 ON d.doc_id = w2.doc_id
ORDER BY d.doc_id"""

CHECK_RECTANGLE = f"""
WITH {_ISLANDS_CTE},
island_blocks AS (
    SELECT w.doc_id, f.bidx, f.x, w.s, w.e, w.isum, w.dsum,
           lag(f.x) OVER (PARTITION BY w.doc_id ORDER BY f.bidx) AS prev_x
    FROM winner w JOIN feat f
      ON f.doc_id = w.doc_id AND f.bidx BETWEEN w.s AND w.e
),
gates AS (
    SELECT doc_id,
           max(s) AS s, max(e) AS e, max(isum) AS isum, max(dsum) AS dsum,
           max(CASE WHEN bidx = s THEN x END) AS xf,
           max(CASE WHEN bidx = e THEN x END) AS xl,
           max(x) AS mx,
           max(abs(x - prev_x)) FILTER (WHERE prev_x IS NOT NULL) AS max_adj
    FROM island_blocks GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(g.s, -1) AS BIGINT) AS span_start,
       CAST(coalesce(g.e, -1) AS BIGINT) AS span_end,
       coalesce(20 * g.isum >= g.dsum, FALSE) AS area_ok,
       coalesce(100 * least(g.xf, g.xl) >= 85 * greatest(g.xf, g.xl), FALSE) AS side_ok,
       coalesce(coalesce(2 * g.max_adj <= g.mx, TRUE) AND g.s IS NOT NULL, FALSE) AS angle_ok,
       coalesce((20 * g.isum >= g.dsum)
                AND (100 * least(g.xf, g.xl) >= 85 * greatest(g.xf, g.xl))
                AND coalesce(2 * g.max_adj <= g.mx, TRUE), FALSE) AS quad_ok
FROM documents d LEFT JOIN gates g ON d.doc_id = g.doc_id
ORDER BY d.doc_id"""

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


def _kuwahara_iter_sql(iterations: int = 2) -> str:
    """Nested-CTE mirror of denoise.KuwaharaIterated: each iteration is
    one-sided window mean/var (CURRENT ROW inclusive), lower-variance
    side wins, floor(m + 0.5) re-quantization keeps every iteration's
    input integer (exact window sums on both sides)."""
    ctes = ["it0 AS (SELECT doc_id, bidx, x FROM feat)"]
    for i in range(1, iterations + 1):
        ctes.append(f"""
s{i} AS (
    SELECT doc_id, bidx,
           avg(x) OVER lw AS ml,
           greatest(avg(x*x) OVER lw - avg(x) OVER lw * avg(x) OVER lw,
                    CAST(0.0 AS DOUBLE)) AS vl,
           avg(x) OVER rw AS mr,
           greatest(avg(x*x) OVER rw - avg(x) OVER rw * avg(x) OVER rw,
                    CAST(0.0 AS DOUBLE)) AS vr
    FROM it{i-1}
    WINDOW lw AS (PARTITION BY doc_id ORDER BY bidx
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
           rw AS (PARTITION BY doc_id ORDER BY bidx
                  ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING)
)""")
        ctes.append(f"""
it{i} AS (
    SELECT doc_id, bidx,
           CAST(floor((CASE WHEN vl <= vr THEN ml ELSE mr END)
                      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS x
    FROM s{i}
)""")
    body = ",".join(ctes)
    return f"""
WITH {_BLOCKS_CTE},{body}
SELECT doc_id, bidx, x AS smoothed_q FROM it{iterations}
ORDER BY doc_id, bidx"""


KUWAHARA_ITERATED = _kuwahara_iter_sql(2)
