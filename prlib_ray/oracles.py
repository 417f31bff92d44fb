"""DuckDB oracle SQL mirrors for every SQL-expressible operator.

The driver runs each ``queries()[name](sf_dir)`` Ray pipeline AND the
matching SQL here side-by-side and compares row count, schema and an
order-insensitive value hash.  Therefore each SQL string must be an
*exact* mirror — same expression tree, same literals, same integer/float
promotion — of the numpy implementation (see the float-determinism
contract in prlib_ray/blocks.py).

Conventions shared by both sides:

* words  = ``string_split(text, ' ')`` (empties preserved), 1-based idx i
* blocks = words grouped by ``(i-1) // words_per_block``, re-joined by ' '
* x      = ``length(block)`` (int)
* window = ``ROWS BETWEEN p PRECEDING AND f FOLLOWING`` per doc (clamped),
  the BORDER-clamp edge policy documented in prlib_ray/blocks.py
* m, v, s = ``avg(x)``, ``greatest(avg(x*x) - avg(x)*avg(x), 0)``, ``sqrt(v)``
* clean_text = kept blocks joined with chr(10); '' when none kept
"""

from __future__ import annotations

WORDS_PER_BLOCK = 12
PRECEDING = 2
FOLLOWING = 2

# Shared skeleton: documents -> blocks -> windowed stats.
_BLOCKS_CTE = f"""
words AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM documents
),
blocks AS (
    SELECT doc_id,
           CAST((i - 1) // {WORDS_PER_BLOCK} AS BIGINT) AS bidx,
           string_agg(w, ' ' ORDER BY i) AS block
    FROM words GROUP BY doc_id, (i - 1) // {WORDS_PER_BLOCK}
),
feat AS (
    SELECT doc_id, bidx, block, length(block) AS x FROM blocks
),
win AS (
    SELECT doc_id, bidx, block, x,
           avg(x) OVER w AS m,
           greatest(avg(x*x) OVER w - (avg(x) OVER w) * (avg(x) OVER w),
                    CAST(0.0 AS DOUBLE)) AS v,
           sqrt(greatest(avg(x*x) OVER w - (avg(x) OVER w) * (avg(x) OVER w),
                         CAST(0.0 AS DOUBLE))) AS s,
           sum(x) OVER w AS sm,
           count(*) OVER w AS cnt
    FROM feat
    WINDOW w AS (PARTITION BY doc_id ORDER BY bidx
                 ROWS BETWEEN {PRECEDING} PRECEDING AND {FOLLOWING} FOLLOWING)
)"""

_GAUSS_CTE = """
gw AS (
    SELECT *,
           coalesce(lag(x, 2)  OVER dw, 0) * 1
         + coalesce(lag(x, 1)  OVER dw, 0) * 4
         + x * 6
         + coalesce(lead(x, 1) OVER dw, 0) * 4
         + coalesce(lead(x, 2) OVER dw, 0) * 1 AS wx,
           6 + (CASE WHEN lag(x, 2)  OVER dw IS NULL THEN 0 ELSE 1 END)
             + (CASE WHEN lag(x, 1)  OVER dw IS NULL THEN 0 ELSE 4 END)
             + (CASE WHEN lead(x, 1) OVER dw IS NULL THEN 0 ELSE 4 END)
             + (CASE WHEN lead(x, 2) OVER dw IS NULL THEN 0 ELSE 1 END) AS wt
    FROM win
    WINDOW dw AS (PARTITION BY doc_id ORDER BY bidx)
)"""

_MED_CTE = """
med3 AS (
    SELECT *, median(x) OVER (PARTITION BY doc_id ORDER BY bidx
                              ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS med
    FROM win
)"""


def _select_clean(keep_expr: str, source: str) -> str:
    return f"""
SELECT doc_id,
       coalesce(string_agg(block, chr(10) ORDER BY bidx)
                FILTER (WHERE {keep_expr}), '') AS clean_text
FROM {source}
GROUP BY doc_id
ORDER BY doc_id"""


def _rule_parts(rule: str) -> tuple[str, str, str]:
    """(extra_ctes, keep_expr, source_cte) for one threshold rule.

    ``extra_ctes`` is appended after the shared block/window skeleton;
    ``keep_expr`` evaluates the rule's keep decision over ``source_cte``
    (which always exposes doc_id, bidx, block).  Shared by the plain
    binarize oracles and the morph-epilogue oracles."""
    if rule == "sauvola":
        keep = ("x > m * (CAST(1.0 AS DOUBLE) + CAST(0.01 AS DOUBLE) * "
                "(s / CAST(128.0 AS DOUBLE) - CAST(1.0 AS DOUBLE)))")
        return "", keep, "win"
    if rule == "niblack":
        return "", "x > m + CAST(0.25 AS DOUBLE) * s", "win"
    if rule == "nick":
        return "", "x > m + CAST(-0.125 AS DOUBLE) * sqrt(s * s + m * m)", "win"
    if rule == "wolf":
        cte = """
docagg AS (
    SELECT *,
           greatest(max(s) OVER (PARTITION BY doc_id), CAST(1e-9 AS DOUBLE)) AS s_max,
           CAST(min(x) OVER (PARTITION BY doc_id) AS DOUBLE) AS x_min
    FROM win
)"""
        keep = ("x > m + CAST(0.5 AS DOUBLE) * (s / s_max - CAST(1.0 AS DOUBLE))"
                " * (m - x_min)")
        return "," + cte, keep, "docagg"
    if rule == "feng":
        cte = """
docagg AS (
    SELECT *,
           greatest(max(s) OVER (PARTITION BY doc_id), CAST(1e-9 AS DOUBLE)) AS rs,
           CAST(min(x) OVER (PARTITION BY doc_id) AS DOUBLE) AS x_min
    FROM win
)"""
        keep = (
            "x > (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)) * m"
            " + CAST(0.25 AS DOUBLE) * ((s / rs) * (s / rs)) * (m - x_min)"
            " + CAST(0.04 AS DOUBLE) * ((s / rs) * (s / rs)) * x_min"
        )
        return "," + cte, keep, "docagg"
    if rule == "pure_adaptive":
        return "", "cnt * x > sm - 2 * cnt", "win"
    if rule == "pure_adaptive_gaussian":
        return "," + _GAUSS_CTE, "wt * x > wx - 2 * wt", "gw"
    if rule == "at":
        return "," + _MED_CTE, "med > m - CAST(2.0 AS DOUBLE)", "med3"
    if rule == "agt":
        cte = """
medgw AS (
    SELECT *, median(x) OVER (PARTITION BY doc_id ORDER BY bidx
                              ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS med
    FROM gw
)"""
        keep = "med > CAST(wx AS DOUBLE) / wt - CAST(2.0 AS DOUBLE)"
        return "," + _GAUSS_CTE + "," + cte, keep, "medgw"
    if rule == "gat":
        cte = """
g1 AS (
    SELECT *,
           coalesce(lag(x, 1)  OVER dw, 0) * 1
         + x * 2
         + coalesce(lead(x, 1) OVER dw, 0) * 1 AS gx,
           2 + (CASE WHEN lag(x, 1)  OVER dw IS NULL THEN 0 ELSE 1 END)
             + (CASE WHEN lead(x, 1) OVER dw IS NULL THEN 0 ELSE 1 END) AS gt
    FROM win
    WINDOW dw AS (PARTITION BY doc_id ORDER BY bidx)
)"""
        return "," + cte, "CAST(gx AS DOUBLE) / gt > m - CAST(2.0 AS DOUBLE)", "g1"
    if rule == "mokji":
        cte = """
pairs AS (
    SELECT *, lead(x) OVER (PARTITION BY doc_id ORDER BY bidx) AS nx FROM win
),
thr AS (
    SELECT doc_id,
           CASE WHEN count(*) FILTER (WHERE nx IS NOT NULL AND abs(x - nx) >= 5) > 0
                THEN avg((x + nx) / CAST(2.0 AS DOUBLE))
                     FILTER (WHERE nx IS NOT NULL AND abs(x - nx) >= 5)
                ELSE avg(x) END AS t
    FROM pairs GROUP BY doc_id
),
joined AS (
    SELECT p.*, thr.t FROM pairs p JOIN thr USING (doc_id)
)"""
        return "," + cte, "x > t", "joined"
    if rule in ("fbcitb", "fbcitb_edges"):
        cte = """
edges AS (
    SELECT *, coalesce(abs(x - lag(x) OVER (PARTITION BY doc_id ORDER BY bidx)), 0) AS pd
    FROM win
)"""
        keep = ("pd > 8" if rule == "fbcitb_edges"
                else "pd > 8 OR v > CAST(9.0 AS DOUBLE)")
        return "," + cte, keep, "edges"
    if rule == "fbcitb_var":
        # OPERATIONS flag: variance path only (binarizeFBCITB.h:39-51)
        return "", "v > CAST(9.0 AS DOUBLE)", "win"
    if rule == "cococlust":
        cte = """
brk AS (
    SELECT *, CASE WHEN lag(x) OVER dw IS NULL THEN 1
                   WHEN abs(x - lag(x) OVER dw) > 10 THEN 1 ELSE 0 END AS b
    FROM win WINDOW dw AS (PARTITION BY doc_id ORDER BY bidx)
),
seg AS (
    SELECT *, sum(b) OVER (PARTITION BY doc_id ORDER BY bidx
                           ROWS UNBOUNDED PRECEDING) AS sid
    FROM brk
),
segstats AS (
    SELECT *, avg(x) OVER (PARTITION BY doc_id, sid) AS seg_mean,
              avg(x) OVER (PARTITION BY doc_id) AS doc_mean
    FROM seg
)"""
        return "," + cte, "seg_mean > doc_mean", "segstats"
    if rule in ("local_variances", "local_variances_nofilter"):
        # the "_nofilter" reference variant
        # (binarizeByLocalVariancesWithoutFilters, cpp:143-292) drops the
        # pre/post filter passes and lowers minVar to 10
        min_var = "10.0" if rule.endswith("nofilter") else "4.0"
        cte = """
vagg AS (
    SELECT *, min(v) OVER (PARTITION BY doc_id) AS vmin,
              max(v) OVER (PARTITION BY doc_id) AS vmax
    FROM win
)"""
        keep = ("v >= greatest(CAST(0.125 AS DOUBLE) * (vmax - vmin) + vmin, "
                f"CAST({min_var} AS DOUBLE))")
        return "," + cte, keep, "vagg"
    if rule == "local_otsu":
        cte = """
feat2 AS (SELECT doc_id, bidx, block, x, bidx // 5 AS region FROM win),
cand AS (SELECT DISTINCT doc_id, region, x AS t FROM feat2),
scored AS (
    SELECT f.doc_id, f.region, c.t,
           count(*) FILTER (WHERE f.x <= c.t) AS n0,
           count(*) FILTER (WHERE f.x >  c.t) AS n1,
           sum(f.x) FILTER (WHERE f.x <= c.t) AS s0,
           sum(f.x) FILTER (WHERE f.x >  c.t) AS s1
    FROM feat2 f JOIN cand c ON f.doc_id = c.doc_id AND f.region = c.region
    GROUP BY f.doc_id, f.region, c.t
),
best AS (
    SELECT doc_id, region, t,
           n0 * n1 * (CAST(s0 AS DOUBLE) / n0 - CAST(s1 AS DOUBLE) / n1)
                   * (CAST(s0 AS DOUBLE) / n0 - CAST(s1 AS DOUBLE) / n1) AS score
    FROM scored WHERE n1 > 0
),
pick AS (
    SELECT doc_id, region, t FROM best
    QUALIFY row_number() OVER (PARTITION BY doc_id, region
                               ORDER BY score DESC, t ASC) = 1
),
decided AS (
    SELECT f.doc_id, f.bidx, f.block, f.x,
           CASE WHEN p.t IS NULL THEN FALSE ELSE f.x > p.t END AS keepb
    FROM feat2 f LEFT JOIN pick p ON f.doc_id = p.doc_id AND f.region = p.region
)"""
        return "," + cte, "keepb", "decided"
    if rule == "native_adaptive":
        cte = """
docn AS (
    SELECT *, greatest(1, (count(*) OVER (PARTITION BY doc_id)) // 8) AS r
    FROM win
),
vmean AS (
    SELECT a.doc_id, a.bidx, a.block, a.x, a.r,
           avg(b.x) AS vm
    FROM docn a JOIN docn b
      ON a.doc_id = b.doc_id AND b.bidx BETWEEN a.bidx - a.r AND a.bidx + a.r
    GROUP BY a.doc_id, a.bidx, a.block, a.x, a.r
),
k1 AS (
    SELECT *, median(x) OVER w3 AS med,
           (median(x) OVER w3 > vm - CAST(2.0 AS DOUBLE)) AS keep1
    FROM vmean
    WINDOW w3 AS (PARTITION BY doc_id ORDER BY bidx
                  ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
),
k2 AS (
    SELECT *, lag(keep1)  OVER (PARTITION BY doc_id ORDER BY bidx) AS pk,
              lead(keep1) OVER (PARTITION BY doc_id ORDER BY bidx) AS nk
    FROM k1
)"""
        keep = ("keep1 AND NOT ((pk IS NOT NULL OR nk IS NOT NULL) "
                "AND coalesce(pk, FALSE) = FALSE AND coalesce(nk, FALSE) = FALSE)")
        return "," + cte, keep, "k2"
    raise KeyError(rule)


def binarize_sql(rule: str) -> str:
    """Oracle SQL for prlib_ray.stages.threshold.RULES[rule]."""
    ctes, keep, source = _rule_parts(rule)
    return f"WITH {_BLOCKS_CTE}{ctes}\n{_select_clean(keep, source)}"


def wolf_global_sql() -> str:
    """Corpus-global WolfJolion: min/max over the whole table, not per doc."""
    cte = """
gagg AS (
    SELECT *,
           greatest(max(s) OVER (), CAST(1e-9 AS DOUBLE)) AS s_max,
           CAST(min(x) OVER () AS DOUBLE) AS x_min
    FROM win
)"""
    keep = ("x > m + CAST(0.5 AS DOUBLE) * (s / s_max - CAST(1.0 AS DOUBLE))"
            " * (m - x_min)")
    return f"WITH {_BLOCKS_CTE},{cte}\n{_select_clean(keep, 'gagg')}"
