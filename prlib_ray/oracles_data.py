"""DuckDB oracles for the training-data operator families (dedup, text
analysis, similarity, multimodal plumbing)."""

from __future__ import annotations

from prlib_ray.stages.text_analysis import (
    GOPHER_MAX_MEAN_LEN,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_MEAN_LEN,
    GOPHER_MIN_STOP,
    GOPHER_MIN_WORDS,
    GOPHER_STOPWORDS,
    LANG_MARKERS,
    STOPWORDS,
)
from prlib_ray.stages.similarity import N_PQ_CODES, N_PQ_SUB
from prlib_ray.stages import dedup as _dd

EXACT_DEDUP = """
SELECT md5(text) AS h, min(doc_id) AS doc_id
FROM documents GROUP BY text ORDER BY h"""

NGRAM_JACCARD = """
WITH sub AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
words AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM sub
),
nz AS (
    SELECT doc_id, w, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
    FROM words WHERE w <> ''
),
sh AS (
    SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
    FROM nz a
    JOIN nz b ON a.doc_id = b.doc_id AND b.j = a.j + 1
    JOIN nz c ON a.doc_id = c.doc_id AND c.j = a.j + 2
),
ds AS (SELECT DISTINCT doc_id, s FROM sh),
sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
inter AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS c
    FROM ds x JOIN ds y ON x.s = y.s AND x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id
)
SELECT i.doc_a, i.doc_b,
       CAST(i.c AS BIGINT) AS inter,
       CAST(sa.n + sb.n - i.c AS BIGINT) AS uni
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE sa.n + sb.n - i.c > 0 AND 5 * i.c >= sa.n + sb.n - i.c
ORDER BY i.doc_a, i.doc_b"""

# prefix_filter_join has COMPLETE recall (AllPairs/PPJoin prefix bound),
# so unlike NGRAM_JACCARD the oracle runs UNBOUNDED over the whole
# documents table: every J >= 0.5 shingle pair, exactly.
PREFIX_FILTER = """
WITH words AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM documents
),
nz AS (
    SELECT doc_id, w, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
    FROM words WHERE w <> ''
),
sh AS (
    SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
    FROM nz a
    JOIN nz b ON a.doc_id = b.doc_id AND b.j = a.j + 1
    JOIN nz c ON a.doc_id = c.doc_id AND c.j = a.j + 2
),
ds AS (SELECT DISTINCT doc_id, s FROM sh),
sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
inter AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS c
    FROM ds x JOIN ds y ON x.s = y.s AND x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id
)
SELECT i.doc_a, i.doc_b,
       CAST(i.c AS BIGINT) AS inter,
       CAST(sa.n + sb.n - i.c AS BIGINT) AS uni
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE sa.n + sb.n - i.c > 0 AND 2 * i.c >= sa.n + sb.n - i.c
ORDER BY i.doc_a, i.doc_b"""

def _containment_pairs_sql() -> str:
    """Mirror of dedup.containment_pairs: the Jaccard mirror's shingle
    CTEs over the plant-augmented sub table, with the asymmetric
    2*inter >= least(n_a, n_b) decision."""
    from prlib_ray.stages import dedup as dd

    return f"""
WITH sub AS (
    SELECT doc_id, text FROM documents WHERE doc_id < {dd.MAX_PAIR_ID}
    UNION ALL
    SELECT doc_id + {dd.PLANT_CONTAIN_OFFSET},
           array_to_string(list_slice(string_split(text, ' '), 1,
                           {dd.CONTAIN_SNIPPET_WORDS}), ' ')
    FROM documents WHERE doc_id < {dd.N_PLANT_CONTAIN}
),
words AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM sub
),
nz AS (
    SELECT doc_id, w, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
    FROM words WHERE w <> ''
),
sh AS (
    SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
    FROM nz a
    JOIN nz b ON a.doc_id = b.doc_id AND b.j = a.j + 1
    JOIN nz c ON a.doc_id = c.doc_id AND c.j = a.j + 2
),
ds AS (SELECT DISTINCT doc_id, s FROM sh),
sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
inter AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS c
    FROM ds x JOIN ds y ON x.s = y.s AND x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id
)
SELECT i.doc_a, i.doc_b,
       CAST(i.c AS BIGINT) AS inter,
       CAST(sa.n AS BIGINT) AS n_a,
       CAST(sb.n AS BIGINT) AS n_b
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE least(sa.n, sb.n) > 0 AND 2 * i.c >= least(sa.n, sb.n)
ORDER BY i.doc_a, i.doc_b"""


CONTAINMENT_PAIRS = _containment_pairs_sql()


def _snm_rank_ctes(*, with_text: bool) -> str:
    """The SNM blocking-key + global-rank CTEs (k, r) — ONE definition
    composed by SORTED_NEIGHBORHOOD and ENTITY_RESOLUTION so the
    blocking rule cannot drift between the candidate generator and the
    pipeline built on it (review finding / band-generation lesson)."""
    from prlib_ray.stages import dedup as dd

    t = "text, " if with_text else ""
    return f"""k AS (
    SELECT doc_id, {t}
           md5(lower(array_to_string(
               list_slice(string_split(text, ' '), 1,
                          {dd.SNM_KEY_WORDS}), ' '))) AS h
    FROM documents
),
r AS (
    SELECT doc_id, {t}h,
           row_number() OVER (ORDER BY h, doc_id) - 1 AS rn
    FROM k
)"""


def _sorted_neighborhood_sql() -> str:
    """Mirror of dedup.sorted_neighborhood_pairs: row_number over the
    (blocking key, doc_id) order, self-joined on rank distance."""
    from prlib_ray.stages import dedup as dd

    return f"""
WITH {_snm_rank_ctes(with_text=False)}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(b.rn - a.rn AS BIGINT) AS dist,
       CAST(CASE WHEN a.h = b.h THEN 1 ELSE 0 END AS BIGINT) AS key_equal
FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND {dd.SNM_WINDOW}
ORDER BY doc_a, doc_b"""


SORTED_NEIGHBORHOOD = _sorted_neighborhood_sql()


TOKEN_COUNT = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens
FROM documents ORDER BY doc_id"""

# mirrors text_analysis.SUBWORD_PATTERN (RE2 in DuckDB too)
TOKEN_COUNT_SUBWORD = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]'))
            AS BIGINT) AS n_subword_tokens
FROM documents ORDER BY doc_id"""

# mirrors text_analysis.repetition_stats_batch; LEFT JOIN keeps docs
# with zero non-empty words (Ray emits zeros for them via bincount)
REPETITION_STATS = """
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
freq AS (
    SELECT doc_id, w, count(*) AS c FROM words WHERE w <> ''
    GROUP BY doc_id, w
),
agg AS (
    SELECT doc_id, sum(c) AS n_words, count(*) AS n_distinct,
           max(c) AS top_count
    FROM freq GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
       CAST(coalesce(a.n_distinct, 0) AS BIGINT) AS n_distinct,
       CAST(coalesce(a.top_count, 0) AS BIGINT) AS top_count,
       CAST((100 * coalesce(a.top_count, 0))
            // greatest(coalesce(a.n_words, 0), 1) AS BIGINT) AS rep_pct
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id"""

_STOP_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)

QUALITY_SCORE = f"""
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
agg AS (
    SELECT doc_id,
           count(*) FILTER (WHERE w <> '') AS n_words,
           count(*) FILTER (WHERE w IN ({_STOP_LIST})) AS n_stop
    FROM words GROUP BY doc_id
)
SELECT d.doc_id, a.n_words, a.n_stop,
       CAST(len(regexp_extract_all(d.text, '[.,;:!?]')) AS BIGINT) AS n_punct,
       (100 * a.n_stop) // greatest(a.n_words, 1) AS score_pct
FROM documents d JOIN agg a ON d.doc_id = a.doc_id ORDER BY d.doc_id"""


_GOPHER_STOP_LIST = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)

# mirrors text_analysis.gopher_quality_batch: the published Gopher rule
# bounds as pure integer comparisons.  Every doc yields >=1 split token
# (string_split('') = ['']), so the GROUP BY covers all docs — no outer
# join needed; empty-word docs get n_words=0 and fail the word-count
# rule, exactly like the Ray side.
GOPHER_QUALITY = f"""
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
agg AS (
    SELECT doc_id,
           count(*) FILTER (WHERE w <> '') AS n_words,
           COALESCE(sum(length(w)) FILTER (WHERE w <> ''), 0)
               AS sum_word_len,
           count(*) FILTER (WHERE regexp_matches(w, '[A-Za-z]'))
               AS n_alpha,
           count(*) FILTER (WHERE w IN ({_GOPHER_STOP_LIST})) AS n_stop
    FROM words GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(sum_word_len AS BIGINT) AS sum_word_len,
       CAST(n_alpha AS BIGINT) AS n_alpha,
       CAST(n_stop AS BIGINT) AS n_stop,
       CAST(CASE WHEN n_words >= {GOPHER_MIN_WORDS}
                  AND n_words <= {GOPHER_MAX_WORDS}
                  AND {GOPHER_MIN_MEAN_LEN} * n_words <= sum_word_len
                  AND sum_word_len <= {GOPHER_MAX_MEAN_LEN} * n_words
                  AND 5 * n_alpha >= 4 * n_words
                  AND n_stop >= {GOPHER_MIN_STOP}
             THEN 1 ELSE 0 END AS BIGINT) AS passes
FROM agg ORDER BY doc_id"""


def _lang_id_sql() -> str:
    langs = sorted(LANG_MARKERS)
    counts = ",\n           ".join(
        "count(*) FILTER (WHERE w IN ({})) AS c_{}".format(
            ", ".join(f"'{m}'" for m in LANG_MARKERS[c]), c
        )
        for c in langs
    )
    # argmax with ties -> lexicographically smallest code: the CASE chain in
    # ascending order with >= comparisons picks the first maximal element,
    # matching Python's max() over the sorted language list.
    cases = []
    for i, c in enumerate(langs[:-1]):
        conds = " AND ".join(f"c_{c} >= c_{o}" for o in langs[i + 1 :])
        cases.append(f"WHEN {conds} THEN '{c}'")
    case_sql = "CASE " + " ".join(cases) + f" ELSE '{langs[-1]}' END"
    return f"""
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
agg AS (
    SELECT doc_id,
           {counts}
    FROM words GROUP BY doc_id
)
SELECT doc_id, {case_sql} AS lang_pred FROM agg ORDER BY doc_id"""


LANG_ID = _lang_id_sql()

# mirrors text_analysis.lang_agreement: the declared lang column vs the
# LANG_ID heuristic, folded per source with an integer percentage
LANG_AGREEMENT = f"""
WITH p AS ({LANG_ID})
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN d.lang = p.lang_pred THEN 1 ELSE 0 END)
            AS BIGINT) AS n_agree,
       CAST((100 * sum(CASE WHEN d.lang = p.lang_pred THEN 1 ELSE 0 END))
            // greatest(count(*), 1) AS BIGINT) AS agree_pct
FROM documents d JOIN p USING (doc_id)
GROUP BY d.source ORDER BY d.source"""

FINGERPRINT = """
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                               ' +', ' ', 'g'), ' ')) AS fp
FROM documents ORDER BY doc_id"""

# 64-bit SimHash, bit-exact mirror of stages/dedup.simhash_batch: per-doc
# DISTINCT non-empty words, per-bit majority vote over each word's md5
# digest[:8].  Python reads the 8 bytes BIG-endian (digest[:8][::-1]
# unpacked little); DuckDB's md5_number_upper() is the LITTLE-endian
# uint64 of the same 8 bytes, so bit b of the Python value is bit
# ((7 - b//8)*8 + b%8) of md5_number_upper — a pure index remap.  Bit 63
# wraps negative in the engine's int64 view; mirrored with the explicit
# 2^63 fold.  Docs with no non-empty words hash to 0 (LEFT JOIN).
def _simhash_vals_ctes() -> str:
    """ONE definition of the SimHash signature CTE chain (words -> nw
    -> bits -> vals(doc_id, v)), composed by both the SIMHASH oracle
    and the SIMHASH_HAMMING banding oracle."""
    return """
WITH simwords AS (
    SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
    FROM documents
),
simnw AS (
    SELECT doc_id, count(*) AS n FROM simwords WHERE w <> ''
    GROUP BY doc_id
),
simbits AS (
    SELECT wo.doc_id, b.b,
           count(*) FILTER (
               ((md5_number_upper(wo.w) >> ((7 - b.b // 8) * 8 + b.b % 8))
                & 1) = 1
           ) AS cnt
    FROM simwords wo CROSS JOIN (SELECT unnest(range(64)) AS b) b
    WHERE wo.w <> ''
    GROUP BY wo.doc_id, b.b
),
simvals AS (
    SELECT simbits.doc_id,
           sum(CASE WHEN 2 * simbits.cnt > simnw.n
                    THEN (1::HUGEINT << simbits.b) ELSE 0 END) AS v
    FROM simbits JOIN simnw ON simbits.doc_id = simnw.doc_id
    GROUP BY simbits.doc_id
)"""


SIMHASH = _simhash_vals_ctes() + """
SELECT d.doc_id,
       CAST(CASE WHEN COALESCE(v, 0) >= 9223372036854775808
                 THEN COALESCE(v, 0) - 18446744073709551616
                 ELSE COALESCE(v, 0) END AS BIGINT) AS simhash,
       lpad(lower(hex(COALESCE(v, 0)::UBIGINT)), 16, '0') AS simhash_hex
FROM documents d LEFT JOIN simvals ON d.doc_id = simvals.doc_id
ORDER BY d.doc_id"""

# winnowing: polynomial k-gram rolling hash (k=5, base 31, mod 1e9+7),
# position selected when its hash equals the trailing-4-window min.
WINNOW = """
WITH pos AS (
    SELECT doc_id, text, unnest(generate_series(1, length(text) - 4)) AS p
    FROM documents WHERE length(text) >= 5
),
h AS (
    SELECT doc_id, p,
           (ascii(substr(text, CAST(p AS INTEGER), 1)) * 923521
          + ascii(substr(text, CAST(p AS INTEGER) + 1, 1)) * 29791
          + ascii(substr(text, CAST(p AS INTEGER) + 2, 1)) * 961
          + ascii(substr(text, CAST(p AS INTEGER) + 3, 1)) * 31
          + ascii(substr(text, CAST(p AS INTEGER) + 4, 1))) % 1000000007 AS hv
    FROM pos
),
sel AS (
    SELECT doc_id, hv,
           min(hv) OVER (PARTITION BY doc_id ORDER BY p
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS wmin
    FROM h
)
SELECT DISTINCT doc_id, CAST(hv AS BIGINT) AS h
FROM sel WHERE hv = wmin ORDER BY doc_id, h"""

ANN_NEIGHBOR_COUNTS = """
WITH sub AS (
    SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300
),
q AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) AS i,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS qv
    FROM sub
),
norms AS (SELECT vec_id, sum(qv * qv) AS nn FROM q GROUP BY vec_id),
dots AS (
    SELECT a.vec_id AS va, b.vec_id AS vb, sum(a.qv * b.qv) AS dot
    FROM q a JOIN q b ON a.i = b.i AND a.vec_id < b.vec_id
    GROUP BY a.vec_id, b.vec_id
),
hits AS (
    SELECT va, vb
    FROM dots
    JOIN norms na ON dots.va = na.vec_id
    JOIN norms nb ON dots.vb = nb.vec_id
    WHERE dot > 0
      AND CAST(dot AS HUGEINT) * dot * 10000 >= 6400 * CAST(na.nn AS HUGEINT) * nb.nn
),
cnt AS (
    SELECT vec_id, CAST(count(*) AS BIGINT) AS n_neighbors FROM (
        SELECT va AS vec_id FROM hits UNION ALL SELECT vb AS vec_id FROM hits
    ) GROUP BY vec_id
)
SELECT s.vec_id, coalesce(c.n_neighbors, 0) AS n_neighbors
FROM sub s LEFT JOIN cnt c ON s.vec_id = c.vec_id ORDER BY s.vec_id"""

# brute-force integer-cosine top-5 per query (mirror of
# similarity.ann_bruteforce_topk): score = floor(dot*|dot|*10^4 /
# (na*nb)) over the x1000 quantization — HUGEINT-exact, floor division
# spelled out with the mod trick (DuckDB // truncates toward zero;
# Python floor_divide floors).  Ties break by vec_id asc; zero-norm
# vectors score 0.
def _scored_ranked_ctes(dots_cte: str, suffix: str = "") -> str:
    """ONE definition of the integer-score + ranking CTEs (the engine's
    floor(dot*|dot|*1e4/(na*nb)) contract, mod-trick floor division,
    score DESC / vec_id ASC row numbers), composed by ANN_BRUTEFORCE,
    the LSH probe oracle, KNN_LABEL_AGREEMENT and the dim-truncation
    audit.  Expects CTEs ``{dots_cte}(query_id, vec_id, dot)`` and
    ``norms{suffix}(vec_id, nn)`` in scope; ``suffix`` renames the
    emitted scored/ranked CTEs so two chains can coexist in one
    query."""
    return f""",
scored{suffix} AS (
    SELECT d.query_id, d.vec_id,
           CASE WHEN na.nn * nb.nn = 0 THEN 0
                ELSE CAST((s2x - (((s2x % dd) + dd) % dd)) / dd AS BIGINT)
           END AS score
    FROM (
        SELECT query_id, vec_id, dot,
               CAST(dot AS HUGEINT) * abs(dot) * 10000 AS s2x
        FROM {dots_cte}
    ) d
    JOIN norms{suffix} na ON d.query_id = na.vec_id
    JOIN norms{suffix} nb ON d.vec_id = nb.vec_id,
    LATERAL (SELECT CAST(na.nn AS HUGEINT) * nb.nn AS dd) x
),
ranked{suffix} AS (
    SELECT query_id, vec_id, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, vec_id ASC) AS rn
    FROM scored{suffix}
)"""


def _score_rank_tail(dots_cte: str) -> str:
    """Top-5 final select over the shared scored/ranked CTE chain."""
    return _scored_ranked_ctes(dots_cte) + """
SELECT query_id, vec_id, score FROM ranked WHERE rn <= 5
ORDER BY query_id, vec_id"""


ANN_BRUTEFORCE = """
WITH q AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) AS i,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS qv
    FROM embeddings
),
norms AS (SELECT vec_id, sum(qv * qv) AS nn FROM q GROUP BY vec_id),
dots AS (
    SELECT a.vec_id AS query_id, b.vec_id AS vec_id, sum(a.qv * b.qv) AS dot
    FROM q a JOIN q b ON a.i = b.i AND a.vec_id < 10 AND b.vec_id <> a.vec_id
    GROUP BY a.vec_id, b.vec_id
)""" + _score_rank_tail("dots")

# mirrors similarity.knn_label_agreement: every vector is a query, the
# 5 exact nearest neighbors under the SAME integer score contract
# (shared scored/ranked CTEs — the oracle cannot desynchronize from the
# brute-force ranking), n_same = neighbors sharing the query's label,
# agree = strict majority (n_same*2 > 5)
KNN_LABEL_AGREEMENT = """
WITH q AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) AS i,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS qv
    FROM embeddings
),
norms AS (SELECT vec_id, sum(qv * qv) AS nn FROM q GROUP BY vec_id),
dots AS (
    SELECT a.vec_id AS query_id, b.vec_id AS vec_id, sum(a.qv * b.qv) AS dot
    FROM q a JOIN q b ON a.i = b.i AND b.vec_id <> a.vec_id
    GROUP BY a.vec_id, b.vec_id
)""" + _scored_ranked_ctes("dots") + """
SELECT e.vec_id,
       CAST(e.label AS BIGINT) AS label,
       CAST(coalesce(sum(CASE WHEN CAST(ne.label AS BIGINT)
                                   = CAST(e.label AS BIGINT)
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_same,
       CAST(CASE WHEN coalesce(sum(CASE WHEN CAST(ne.label AS BIGINT)
                                             = CAST(e.label AS BIGINT)
                                   THEN 1 ELSE 0 END), 0) * 2 > 5
            THEN 1 ELSE 0 END AS BIGINT) AS agree
FROM embeddings e
LEFT JOIN ranked r ON r.query_id = e.vec_id AND r.rn <= 5
LEFT JOIN embeddings ne ON r.vec_id = ne.vec_id
GROUP BY e.vec_id, e.label
ORDER BY e.vec_id"""

# sub mirrors similarity._plant_dup_batch: vectors with vec_id < 10 are
# duplicated at vec_id + 1000000 with identical embeddings, so the pair
# path provably does work (the raw fixture has no >=0.95-cosine pair and
# the check was vacuously 0 == 0 before round 3)
EMBEDDING_NEAR_DUP = """
WITH sub AS (
    SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300
    UNION ALL
    SELECT vec_id + 1000000 AS vec_id, embedding
    FROM embeddings WHERE vec_id < 10
),
q AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) AS i,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS qv
    FROM sub
),
norms AS (SELECT vec_id, sum(qv * qv) AS nn FROM q GROUP BY vec_id),
dots AS (
    SELECT a.vec_id AS va, b.vec_id AS vb, sum(a.qv * b.qv) AS dot
    FROM q a JOIN q b ON a.i = b.i AND a.vec_id < b.vec_id
    GROUP BY a.vec_id, b.vec_id
)
SELECT va AS vec_a, vb AS vec_b
FROM dots
JOIN norms na ON dots.va = na.vec_id
JOIN norms nb ON dots.vb = nb.vec_id
WHERE dot > 0
  AND CAST(dot AS HUGEINT) * dot * 10000 >= 9025 * CAST(na.nn AS HUGEINT) * nb.nn
ORDER BY vec_a, vec_b"""

# mirrors similarity.pq_codes: codebook = quantized subvectors of the
# N_PQ_CODES lowest-id vectors; per (vector, subspace) the argmin exact
# integer squared L2 with ties to the smallest code.  Constants
# interpolated from the implementation so they cannot desynchronize;
# the subvector width derives from the row's own embedding length.
PQ_CODES = f"""
WITH q AS (
    SELECT vec_id,
           (generate_subscripts(embedding, 1) - 1)
               // (len(embedding) // {N_PQ_SUB}) AS sub,
           (generate_subscripts(embedding, 1) - 1)
               % (len(embedding) // {N_PQ_SUB}) AS pos,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS qv
    FROM embeddings
),
cb AS (SELECT vec_id AS code, sub, pos, qv AS cv FROM q
       WHERE vec_id < {N_PQ_CODES}),
d AS (
    SELECT q.vec_id, q.sub, cb.code,
           sum((q.qv - cb.cv) * (q.qv - cb.cv)) AS dist
    FROM q JOIN cb ON q.sub = cb.sub AND q.pos = cb.pos
    GROUP BY q.vec_id, q.sub, cb.code
)
SELECT vec_id,
       CAST(sub AS BIGINT) AS sub,
       CAST(code AS BIGINT) AS code,
       CAST(dist AS BIGINT) AS dist
FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                                 ORDER BY dist ASC, code ASC) AS rn
    FROM d
) WHERE rn = 1
ORDER BY vec_id, sub"""

# mirrors similarity.dedup_semantic: centroid = the N_SEM_SEEDS lowest-id
# vectors; assignment = argmax integer dot with ties to the smallest
# centroid id (row_number ORDER BY dot DESC, cid ASC == numpy's
# first-max argmax); keep=0 iff a lower-id SAME-CLUSTER vector clears
# the exact hugeint cosine-0.95 decision.  Same bounded+planted input
# as EMBEDDING_NEAR_DUP.
DEDUP_SEMANTIC = """
WITH sub AS (
    SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300
    UNION ALL
    SELECT vec_id + 1000000 AS vec_id, embedding
    FROM embeddings WHERE vec_id < 10
),
q AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) AS i,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS qv
    FROM sub
),
seeds AS (SELECT vec_id AS cid, i, qv AS sv FROM q WHERE vec_id < 8),
cdots AS (
    SELECT q.vec_id, s.cid, sum(q.qv * s.sv) AS dot
    FROM q JOIN seeds s USING (i) GROUP BY q.vec_id, s.cid
),
assign AS (
    SELECT vec_id, cid AS cluster FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dot DESC, cid ASC) AS rn
        FROM cdots
    ) WHERE rn = 1
),
norms AS (SELECT vec_id, sum(qv * qv) AS nn FROM q GROUP BY vec_id),
pairdots AS (
    SELECT a.vec_id AS va, b.vec_id AS vb, sum(a.qv * b.qv) AS dot
    FROM q a
    JOIN q b ON a.i = b.i AND a.vec_id < b.vec_id
    JOIN assign ca ON ca.vec_id = a.vec_id
    JOIN assign cb ON cb.vec_id = b.vec_id AND ca.cluster = cb.cluster
    GROUP BY a.vec_id, b.vec_id
),
dups AS (
    SELECT DISTINCT vb FROM pairdots
    JOIN norms na ON pairdots.va = na.vec_id
    JOIN norms nb ON pairdots.vb = nb.vec_id
    WHERE dot > 0
      AND CAST(dot AS HUGEINT) * dot * 10000
          >= 9025 * CAST(na.nn AS HUGEINT) * nb.nn
)
SELECT a.vec_id,
       CAST(a.cluster AS BIGINT) AS cluster,
       CAST(CASE WHEN d.vb IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM assign a LEFT JOIN dups d ON a.vec_id = d.vb
ORDER BY a.vec_id"""

# normalize_whitespace -> remove_lines -> thin_zhang_suen, composed
# exactly as build_pipeline chains the batch functions
PIPELINE_CHAIN = """
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(
           regexp_replace(
               trim(regexp_replace(text, '[ \t\r\n]+', ' ', 'g'),
                    ' ' || chr(9) || chr(13) || chr(10)),
               '-{4,}|={4,}|_{4,}', '', 'g')
       ), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'), ' ') AS clean_text
FROM documents ORDER BY doc_id"""

MULTIMODAL_DECODE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
       CAST(octet_length(encode(text)) % 480 AS BIGINT) AS height,
       CAST((octet_length(encode(text)) + 1023) // 1024 AS BIGINT) AS n_frames
FROM documents ORDER BY doc_id"""


# connected components over the exact near-dup pairs: recursive
# transitive closure, label = min reachable doc (mirrors the
# attach-larger-root union-find in dedup.dedup_cc_clusters)
DEDUP_CC_CLUSTERS = """
WITH RECURSIVE base AS (
WITH sub AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
words AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM sub
),
nz AS (
    SELECT doc_id, w, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
    FROM words WHERE w <> ''
),
sh AS (
    SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
    FROM nz a
    JOIN nz b ON a.doc_id = b.doc_id AND b.j = a.j + 1
    JOIN nz c ON a.doc_id = c.doc_id AND c.j = a.j + 2
),
ds AS (SELECT DISTINCT doc_id, s FROM sh),
sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
inter AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS c
    FROM ds x JOIN ds y ON x.s = y.s AND x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id
)
SELECT i.doc_a, i.doc_b,
       CAST(i.c AS BIGINT) AS inter,
       CAST(sa.n + sb.n - i.c AS BIGINT) AS uni
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE sa.n + sb.n - i.c > 0 AND 5 * i.c >= sa.n + sb.n - i.c
),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM base
    UNION ALL
    SELECT doc_b, doc_a FROM base
),
nodes AS (SELECT DISTINCT a FROM edges),
reach(a, b) AS (
    SELECT a, a FROM nodes
    UNION
    SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id
FROM reach GROUP BY a ORDER BY doc_id"""

DEDUP_SURVIVORS = """
WITH RECURSIVE base AS (
WITH sub AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
words AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM sub
),
nz AS (
    SELECT doc_id, w, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
    FROM words WHERE w <> ''
),
sh AS (
    SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
    FROM nz a
    JOIN nz b ON a.doc_id = b.doc_id AND b.j = a.j + 1
    JOIN nz c ON a.doc_id = c.doc_id AND c.j = a.j + 2
),
ds AS (SELECT DISTINCT doc_id, s FROM sh),
sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
inter AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS c
    FROM ds x JOIN ds y ON x.s = y.s AND x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id
)
SELECT i.doc_a, i.doc_b,
       CAST(i.c AS BIGINT) AS inter,
       CAST(sa.n + sb.n - i.c AS BIGINT) AS uni
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE sa.n + sb.n - i.c > 0 AND 5 * i.c >= sa.n + sb.n - i.c
),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM base
    UNION ALL
    SELECT doc_b, doc_a FROM base
),
nodes AS (SELECT DISTINCT a FROM edges),
reach(a, b) AS (
    SELECT a, a FROM nodes
    UNION
    SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
clusters AS (
    SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
)
SELECT d.doc_id FROM documents d
LEFT JOIN clusters c ON d.doc_id = c.doc_id
WHERE d.doc_id < 300 AND (c.doc_id IS NULL OR c.cluster_id = d.doc_id)
ORDER BY d.doc_id"""


EMBEDDING_CENTROIDS = """
WITH q AS (
    SELECT label,
           generate_subscripts(embedding, 1) AS pos,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS qv
    FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, CAST(pos AS BIGINT) AS pos,
       CAST(sum(qv) AS BIGINT) AS sum_q, CAST(count(*) AS BIGINT) AS n_vecs
FROM q GROUP BY label, pos ORDER BY label, pos"""

MULTIMODAL_RESIZE = """
WITH meta AS (
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n,
           CAST(octet_length(encode(text)) % 640 AS BIGINT) AS w,
           CAST(octet_length(encode(text)) % 480 AS BIGINT) AS h
    FROM documents
),
geo AS (
    SELECT doc_id, n, w, h, greatest(w, h) AS m FROM meta
)
SELECT doc_id,
       CAST(CASE WHEN m > 256 THEN (w * 256) // greatest(m, 1) ELSE w END AS BIGINT) AS out_w,
       CAST(CASE WHEN m > 256 THEN (h * 256) // greatest(m, 1) ELSE h END AS BIGINT) AS out_h,
       CAST(least(n, greatest(
            (CASE WHEN m > 256 THEN (w * 256) // greatest(m, 1) ELSE w END)
          * (CASE WHEN m > 256 THEN (h * 256) // greatest(m, 1) ELSE h END), 1)) AS BIGINT) AS out_bytes
FROM geo ORDER BY doc_id"""

MULTIMODAL_FRAME_SAMPLE = """
WITH meta AS (
    SELECT doc_id,
           CAST((octet_length(encode(text)) + 1023) // 1024 AS BIGINT) AS n_frames
    FROM documents
)
SELECT doc_id, CAST(unnest(range(0, n_frames, 4)) AS BIGINT) AS frame_idx
FROM meta ORDER BY doc_id, frame_idx"""


# mirrors dedup.incremental_dedup: new-crawl docs (source id >= 10)
# surviving the anti-join against the old snapshot's head fingerprints
# (md5 of the first 5 space-split words; DuckDB md5 == hashlib md5 on
# the same utf-8 string)
INCREMENTAL_DEDUP = """
WITH fp AS (
    SELECT doc_id,
           CAST(substr(source, 4) AS BIGINT) AS src,
           md5(array_to_string(list_slice(string_split(text, ' '), 1, 5),
               ' ')) AS f
    FROM documents
)
SELECT d.doc_id, d.f
FROM fp d
WHERE d.src >= 10
  AND d.f NOT IN (SELECT f FROM fp WHERE src < 10)
ORDER BY d.doc_id"""


# mirrors dedup.corpus_diff: distinct head fingerprints classified as
# added (new crawl only), removed (old snapshot only), common (both)
CORPUS_DIFF = """
WITH fp AS (
    SELECT DISTINCT
           md5(array_to_string(list_slice(string_split(text, ' '), 1, 5),
               ' ')) AS f,
           CAST(substr(source, 4) AS BIGINT) >= 10 AS is_new
    FROM documents
),
o AS (SELECT DISTINCT f FROM fp WHERE NOT is_new),
n AS (SELECT DISTINCT f FROM fp WHERE is_new)
SELECT 'added' AS status,
       CAST((SELECT count(*) FROM n WHERE f NOT IN (SELECT f FROM o))
            AS BIGINT) AS n_fingerprints
UNION ALL
SELECT 'removed',
       CAST((SELECT count(*) FROM o WHERE f NOT IN (SELECT f FROM n))
            AS BIGINT)
UNION ALL
SELECT 'common',
       CAST((SELECT count(*) FROM o WHERE f IN (SELECT f FROM n))
            AS BIGINT)"""


# --- MinHash+LSH family: the banding itself mirrored in SQL -----------------
#
# Made possible by two engine contracts: (a) shingle ids are the
# BIG-endian uint64 of md5(shingle)[:8] — DuckDB's md5_number_upper() is
# the LITTLE-endian read of the same bytes, so an 8-byte swap recovers
# the engine's id exactly; (b) band signatures are md5 of the ':'-joined
# DECIMAL minhash values (dedup._bands_from_blob_batch), i.e.
# md5(string_agg(mh, ':' ORDER BY h)) in SQL.  The (a*x+b) mod (2^61-1)
# permutations run in HUGEINT (a, x < 2^61 so a*x < 2^122 fits), the
# hot-bucket cap (> LSH_BUCKET_CAP members -> sorted-neighborhood pairs
# within rank distance <= cap) is a row_number window, and verification
# is the exact shingle-id-set intersection.  Empty-shingle docs minhash
# to the modulus itself (np.full(..., MERSENNE)) — the LEFT JOIN +
# COALESCE mirrors that.

def _byteswap8(expr: str) -> str:
    """SQL for the big-endian uint64 of the little-endian ``expr``."""
    parts = [
        f"((({expr} >> {8 * j}) & 255)::HUGEINT << {8 * (7 - j)})"
        for j in range(8)
    ]
    return "(" + " + ".join(parts) + ")"


def _minhash_banding_ctes() -> str:
    """The shared banding prefix — CTE chain from the raw documents up
    to 'sig(doc_id, band, sg)' and 'sid(doc_id, id)'.  ONE definition
    composed by both the pairs oracle and the bucket-stats oracle, so
    the stats can never desynchronize from the pairs they describe."""
    from prlib_ray.stages.dedup import _A, _B, MERSENNE

    vals = ",\n           ".join(
        f"({h},{int(a)},{int(b)})" for h, (a, b) in enumerate(zip(_A, _B))
    )
    swap = _byteswap8("md5_number_upper(s)")
    return f"""
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM documents
),
nz AS (
    SELECT doc_id, w, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
    FROM words WHERE w <> ''
),
sh AS (
    SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
    FROM nz a JOIN nz b ON a.doc_id = b.doc_id AND b.j = a.j + 1
              JOIN nz c ON a.doc_id = c.doc_id AND c.j = a.j + 2
),
sid AS (SELECT doc_id, {swap} AS id FROM sh),
params(h, a, b) AS (VALUES {vals}),
mh0 AS (
    SELECT doc_id, p.h,
           min((p.a::HUGEINT * (id % {MERSENNE}) + p.b) % {MERSENNE}) AS mh
    FROM sid CROSS JOIN params p GROUP BY doc_id, p.h
),
mh AS (
    SELECT d.doc_id, p.h, COALESCE(m.mh, {MERSENNE}) AS mh
    FROM (SELECT doc_id FROM documents) d
    CROSS JOIN params p
    LEFT JOIN mh0 m ON m.doc_id = d.doc_id AND m.h = p.h
),
sig AS (
    SELECT doc_id, h // 4 AS band,
           md5(string_agg(CAST(mh AS BIGINT)::VARCHAR, ':' ORDER BY h)) AS sg
    FROM mh GROUP BY doc_id, h // 4
)"""


def _minhash_pairs_body() -> str:
    """CTE body producing the verified MinHash+LSH near-dup pairs
    (doc_a, doc_b, inter, uni) — the exact mirror of
    dedup.minhash_lsh_dedup; banding prefix shared with the
    bucket-stats oracle via _minhash_banding_ctes()."""
    from prlib_ray.stages.dedup import LSH_BUCKET_CAP

    return _minhash_banding_ctes() + f""",
member AS (
    SELECT band, sg, doc_id,
           row_number() OVER (PARTITION BY band, sg ORDER BY doc_id) AS rn,
           count(*) OVER (PARTITION BY band, sg) AS sz
    FROM sig
),
cand AS (
    SELECT DISTINCT ma.doc_id AS doc_a, mb.doc_id AS doc_b
    FROM member ma JOIN member mb
      ON ma.band = mb.band AND ma.sg = mb.sg AND ma.rn < mb.rn
    WHERE ma.sz <= {LSH_BUCKET_CAP} OR mb.rn - ma.rn <= {LSH_BUCKET_CAP}
),
sizes AS (SELECT doc_id, count(*) AS n FROM sid GROUP BY doc_id),
ix AS (
    SELECT cd.doc_a AS pa, cd.doc_b AS pb, count(*) AS nc
    FROM cand cd
    JOIN sid x ON x.doc_id = cd.doc_a
    JOIN sid y ON y.doc_id = cd.doc_b AND y.id = x.id
    GROUP BY cd.doc_a, cd.doc_b
)
SELECT cd.doc_a, cd.doc_b,
       CAST(COALESCE(ix.nc, 0) AS BIGINT) AS inter,
       CAST(COALESCE(sa.n, 0) + COALESCE(sb.n, 0) - COALESCE(ix.nc, 0)
            AS BIGINT) AS uni
FROM cand cd
LEFT JOIN ix ON cd.doc_a = ix.pa AND cd.doc_b = ix.pb
LEFT JOIN sizes sa ON cd.doc_a = sa.doc_id
LEFT JOIN sizes sb ON cd.doc_b = sb.doc_id
WHERE COALESCE(sa.n, 0) + COALESCE(sb.n, 0) - COALESCE(ix.nc, 0) > 0
  AND 100 * COALESCE(ix.nc, 0)
      >= 50 * (COALESCE(sa.n, 0) + COALESCE(sb.n, 0) - COALESCE(ix.nc, 0))"""


MINHASH_LSH = _minhash_pairs_body() + "\nORDER BY cd.doc_a, cd.doc_b"

# connected components over the SQL-mirrored minhash pairs: same
# recursive transitive-closure shape as DEDUP_CC_CLUSTERS, so the
# distributed min-label propagation (dedup._propagate_min_labels) has an
# exact oracle — the fixpoint of min-label propagation IS the component
# minimum.
CLUSTERS_MINHASH = f"""
WITH RECURSIVE base AS (
{_minhash_pairs_body()}
),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM base
    UNION ALL
    SELECT doc_b, doc_a FROM base
),
nodes AS (SELECT DISTINCT a FROM edges),
reach(a, b) AS (
    SELECT a, a FROM nodes
    UNION
    SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS label
FROM reach GROUP BY a ORDER BY doc_id"""


def _lsh_bucket_stats_sql() -> str:
    """Bucket-population histogram over the SAME banding CTEs (stats can
    never desynchronize from the pairs: one SQL definition, sliced)."""
    from prlib_ray.stages.dedup import LSH_BUCKET_CAP

    return f"""{_minhash_banding_ctes()}
SELECT CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(max(c) AS BIGINT) AS max_bucket,
       CAST(sum(CASE WHEN c > {LSH_BUCKET_CAP} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_capped
FROM (SELECT band, sg, count(*) AS c FROM sig GROUP BY band, sg)"""


LSH_BUCKET_STATS = _lsh_bucket_stats_sql()

# SimHash banding + hamming verification, mirrored end-to-end: the
# signature CTE is the SIMHASH oracle's, bands are 16-bit slices of the
# uint64 value, the hot-bucket cap orders by (signature, doc_id) —
# exactly dedup._pairs_from_buckets(order_col="simhash") — and the
# verification is bit_count(xor(...)) <= 8 (two's-complement BIGINT bits
# == the engine's uint64 view).
SIMHASH_HAMMING = _simhash_vals_ctes() + """,
sigs AS (
    SELECT d.doc_id, COALESCE(v, 0) AS v
    FROM documents d LEFT JOIN simvals ON d.doc_id = simvals.doc_id
),
member AS (
    SELECT band.band, (sigs.v >> (16 * band.band)) & 65535 AS key,
           sigs.doc_id, sigs.v,
           row_number() OVER (
               PARTITION BY band.band, (sigs.v >> (16 * band.band)) & 65535
               ORDER BY sigs.v, sigs.doc_id
           ) AS rn,
           count(*) OVER (
               PARTITION BY band.band, (sigs.v >> (16 * band.band)) & 65535
           ) AS sz
    FROM sigs CROSS JOIN (SELECT unnest(range(4)) AS band) band
),
cand AS (
    SELECT DISTINCT least(ma.doc_id, mb.doc_id) AS doc_a,
           greatest(ma.doc_id, mb.doc_id) AS doc_b
    FROM member ma JOIN member mb
      ON ma.band = mb.band AND ma.key = mb.key AND ma.rn < mb.rn
    WHERE ma.sz <= 64 OR mb.rn - ma.rn <= 64
)
SELECT cd.doc_a, cd.doc_b,
       CAST(bit_count(xor(
           CAST(CASE WHEN sa.v >= 9223372036854775808
                     THEN sa.v - 18446744073709551616 ELSE sa.v END AS BIGINT),
           CAST(CASE WHEN sb.v >= 9223372036854775808
                     THEN sb.v - 18446744073709551616 ELSE sb.v END AS BIGINT)
       )) AS BIGINT) AS hamming
FROM cand cd
JOIN sigs sa ON cd.doc_a = sa.doc_id
JOIN sigs sb ON cd.doc_b = sb.doc_id
WHERE bit_count(xor(
          CAST(CASE WHEN sa.v >= 9223372036854775808
                    THEN sa.v - 18446744073709551616 ELSE sa.v END AS BIGINT),
          CAST(CASE WHEN sb.v >= 9223372036854775808
                    THEN sb.v - 18446744073709551616 ELSE sb.v END AS BIGINT)
      )) <= 8
ORDER BY cd.doc_a, cd.doc_b"""


# --- Hyperplane-LSH family: the bucketing itself mirrored in SQL ------------
#
# Round-3 engine contract: hyperplane weights are INTEGERS derived from
# md5 (Irwin-Hall sum of four uniform draws, similarity._band_planes),
# vectors quantize x1000, and a bucket bit is (integer dot > 0) — so the
# candidate generation, not just the verification, reproduces in DuckDB.

def _planes_cte(n_planes: int) -> str:
    """CTE 'planes(p, d, w)' — md5-derived Irwin-Hall integer weights,
    byte-identical to similarity._band_planes."""
    from prlib_ray.stages.similarity import PLANE_SCALE

    draws = " + ".join(
        f"(md5_number_upper('plane:' || pp.p::VARCHAR || ':' || "
        f"dd.d::VARCHAR || ':{r}') % {PLANE_SCALE + 1})"
        for r in range(4)
    )
    return f"""planes AS (
    SELECT pp.p, dd.d,
           CAST({draws} AS BIGINT) - {2 * PLANE_SCALE} AS w
    FROM (SELECT unnest(range({n_planes})) AS p) pp
    CROSS JOIN (SELECT unnest(range(
        (SELECT max(len(embedding)) FROM embeddings))) AS d) dd
)"""


def _bucket_ctes(planes_per_band: int, src: str) -> str:
    """CTEs 'pdots' + 'buck(vec_id, band, bucket)' over quantized
    vectors in CTE ``src`` (columns vec_id, i (1-based), qv).  The band
    count is implicit in the planes CTE's row count (band = p //
    planes_per_band)."""
    return f"""pdots AS (
    SELECT s.vec_id, pl.p, sum(s.qv * pl.w) AS dp
    FROM {src} s JOIN planes pl ON s.i - 1 = pl.d
    GROUP BY s.vec_id, pl.p
),
buck AS (
    SELECT vec_id, p // {planes_per_band} AS band,
           sum(CASE WHEN dp > 0
                    THEN (1::BIGINT << (p % {planes_per_band}))
                    ELSE 0 END) AS bucket
    FROM pdots GROUP BY vec_id, p // {planes_per_band}
)"""


def _ann_lsh_topk_sql() -> str:
    from prlib_ray.stages.similarity import ANN_LSH_BANDS, ANN_LSH_PLANES

    n_planes = ANN_LSH_BANDS * ANN_LSH_PLANES
    return f"""
WITH q AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) AS i,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5)
                AS BIGINT) AS qv
    FROM embeddings
),
{_planes_cte(n_planes)},
{_bucket_ctes(ANN_LSH_PLANES, "q")},
cand AS (
    SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS vec_id
    FROM buck qb JOIN buck cb
      ON qb.band = cb.band AND qb.bucket = cb.bucket
    WHERE qb.vec_id < 10 AND cb.vec_id <> qb.vec_id
),
norms AS (SELECT vec_id, sum(qv * qv) AS nn FROM q GROUP BY vec_id),
cdots AS (
    SELECT c.query_id, c.vec_id, sum(a.qv * b.qv) AS dot
    FROM cand c
    JOIN q a ON a.vec_id = c.query_id
    JOIN q b ON b.vec_id = c.vec_id AND b.i = a.i
    GROUP BY c.query_id, c.vec_id
)""" + _score_rank_tail("cdots")


ANN_LSH_TOPK = _ann_lsh_topk_sql()


def _embedding_lsh_sql() -> str:
    from prlib_ray.stages.dedup import LSH_BUCKET_CAP

    n_bands, planes_per_band = 6, 8  # embedding_near_dup_lsh defaults
    return f"""
WITH sub AS (
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000 AS vec_id, embedding
    FROM embeddings WHERE vec_id < 10
),
q AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) AS i,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5)
                AS BIGINT) AS qv
    FROM sub
),
{_planes_cte(n_bands * planes_per_band)},
{_bucket_ctes(planes_per_band, "q")},
member AS (
    SELECT band, bucket, vec_id,
           row_number() OVER (PARTITION BY band, bucket
                              ORDER BY vec_id) AS rn,
           count(*) OVER (PARTITION BY band, bucket) AS sz
    FROM buck
),
cand AS (
    SELECT DISTINCT ma.vec_id AS vec_a, mb.vec_id AS vec_b
    FROM member ma JOIN member mb
      ON ma.band = mb.band AND ma.bucket = mb.bucket AND ma.rn < mb.rn
    WHERE ma.sz <= {LSH_BUCKET_CAP} OR mb.rn - ma.rn <= {LSH_BUCKET_CAP}
),
norms AS (SELECT vec_id, sum(qv * qv) AS nn FROM q GROUP BY vec_id),
cdots AS (
    SELECT c.vec_a, c.vec_b, sum(a.qv * b.qv) AS dot
    FROM cand c
    JOIN q a ON a.vec_id = c.vec_a
    JOIN q b ON b.vec_id = c.vec_b AND b.i = a.i
    GROUP BY c.vec_a, c.vec_b
)
SELECT cd.vec_a, cd.vec_b
FROM cdots cd
JOIN norms na ON cd.vec_a = na.vec_id
JOIN norms nb ON cd.vec_b = nb.vec_id
WHERE dot > 0
  AND CAST(dot AS HUGEINT) * dot * 10000
      >= 9025 * CAST(na.nn AS HUGEINT) * nb.nn
ORDER BY cd.vec_a, cd.vec_b"""


EMBEDDING_LSH = _embedding_lsh_sql()


def _quality_classifier_sql() -> str:
    """Mirror of text_analysis.QualityClassifier: hashed-feature linear
    model with md5-derived integer weights, recomputed inline (bucket =
    md5_number_upper(word) % B; weight = md5_number_upper('qw:'||bucket)
    % R - R//2).  Docs with no non-empty words score 0."""
    from prlib_ray.stages.text_analysis import (
        QCLF_BUCKETS,
        QCLF_WEIGHT_RANGE,
    )

    return f"""
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
sc AS (
    SELECT doc_id,
           sum(CAST(md5_number_upper(
                   'qw:' || (md5_number_upper(w) % {QCLF_BUCKETS})::VARCHAR
               ) % {QCLF_WEIGHT_RANGE} AS BIGINT)
               - {QCLF_WEIGHT_RANGE // 2}) AS s
    FROM words WHERE w <> '' GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(s, 0) AS BIGINT) AS clf_score,
       CAST(CASE WHEN COALESCE(s, 0) > 0 THEN 1 ELSE 0 END AS BIGINT)
           AS clf_pass
FROM documents d LEFT JOIN sc USING (doc_id)
ORDER BY d.doc_id"""


QUALITY_CLASSIFIER = _quality_classifier_sql()


def _dsir_select_sql() -> str:
    """Mirror of text_analysis.dsir_select: hashed-unigram bucket
    histograms target-vs-raw, Laplace-smoothed exact-integer weights
    ((tgt+1)*SCALE)//(raw+1), per-doc token-instance score, ranked by
    score*SCALE//n_tokens.  md5_number_upper(w) is the little-endian
    read of md5(w)[:8] — the engine's bucket hash exactly (the
    QUALITY_CLASSIFIER contract)."""
    from prlib_ray.stages.text_analysis import (
        DSIR_BUCKETS,
        DSIR_SCALE,
        DSIR_TARGET_SOURCE,
        DSIR_TOP_K,
    )

    return f"""
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
tok AS (
    SELECT n.doc_id, d.source,
           CAST(md5_number_upper(w) % {DSIR_BUCKETS} AS BIGINT) AS b
    FROM words n JOIN documents d USING (doc_id) WHERE w <> ''
),
cnt AS (
    SELECT b,
           sum(CASE WHEN source = '{DSIR_TARGET_SOURCE}'
               THEN 1 ELSE 0 END) AS tgt,
           sum(CASE WHEN source <> '{DSIR_TARGET_SOURCE}'
               THEN 1 ELSE 0 END) AS raw
    FROM tok GROUP BY b
),
wt AS (
    SELECT b, CAST(((tgt + 1) * {DSIR_SCALE}) // (raw + 1) AS BIGINT)
              AS wgt
    FROM cnt
),
sc AS (
    SELECT t.doc_id,
           CAST(sum(w.wgt) AS BIGINT) AS score,
           CAST(count(*) AS BIGINT) AS n_tokens
    FROM tok t JOIN wt w USING (b)
    WHERE t.source <> '{DSIR_TARGET_SOURCE}'
    GROUP BY t.doc_id
)
SELECT doc_id, score, n_tokens,
       CAST((score * {DSIR_SCALE}) // n_tokens AS BIGINT) AS score_pt
FROM sc
ORDER BY score_pt DESC, doc_id
LIMIT {DSIR_TOP_K}"""


DSIR_SELECT = _dsir_select_sql()


def _cdc_chunk_dups_sql() -> str:
    """Mirror of dedup.cdc_chunk_dups: content-defined chunk boundaries
    (word opens a new chunk when md5_number_upper(w) % G == 0 — the
    little-endian md5 contract), chunk id = exclusive prefix count of
    boundary words per doc, chunk hash = md5 of the ' '-joined chunk,
    inventory of hashes in >= 2 distinct docs."""
    from prlib_ray.stages.dedup import CDC_GEAR_MOD

    return f"""
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM documents
),
nz AS (
    SELECT doc_id, w, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
    FROM words WHERE w <> ''
),
fl AS (
    SELECT doc_id, w, j,
           CASE WHEN md5_number_upper(w) % {CDC_GEAR_MOD} = 0
                THEN 1 ELSE 0 END AS f
    FROM nz
),
ck AS (
    SELECT doc_id, w, j,
           COALESCE(sum(f) OVER (PARTITION BY doc_id ORDER BY j
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
    FROM fl
),
chunks AS (
    SELECT doc_id, c, md5(string_agg(w, ' ' ORDER BY j)) AS ch,
           count(*) AS nw
    FROM ck GROUP BY doc_id, c
)
SELECT ch AS chunk_hash,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occ,
       CAST(min(doc_id) AS BIGINT) AS min_doc,
       CAST(min(nw) AS BIGINT) AS n_words
FROM chunks GROUP BY ch HAVING count(DISTINCT doc_id) >= 2
ORDER BY chunk_hash"""


CDC_CHUNK_DUPS = _cdc_chunk_dups_sql()


def _ngram_novelty_sql() -> str:
    """Mirror of dedup.ngram_novelty: distinct 3-word shingles per doc,
    novel = corpus df == 1, exact permille; zero-shingle docs at 0."""
    return """
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM documents
),
nz AS (
    SELECT doc_id, w, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
    FROM words WHERE w <> ''
),
sh AS (
    SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
    FROM nz a JOIN nz b ON a.doc_id = b.doc_id AND b.j = a.j + 1
              JOIN nz c ON a.doc_id = c.doc_id AND c.j = a.j + 2
),
df AS (SELECT s, count(*) AS n FROM sh GROUP BY s),
per AS (
    SELECT sh.doc_id,
           count(*) AS n_shingles,
           sum(CASE WHEN df.n = 1 THEN 1 ELSE 0 END) AS n_novel
    FROM sh JOIN df USING (s) GROUP BY sh.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(per.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(COALESCE(per.n_novel, 0) AS BIGINT) AS n_novel,
       CAST(1000 * COALESCE(per.n_novel, 0)
            // greatest(COALESCE(per.n_shingles, 0), 1) AS BIGINT)
           AS novelty_permille
FROM documents d LEFT JOIN per USING (doc_id)
ORDER BY d.doc_id"""


NGRAM_NOVELTY = _ngram_novelty_sql()


def _dedup_threshold_curve_sql() -> str:
    """Mirror of dedup.dedup_threshold_curve: the PREFIX_FILTER pair
    body as a subquery, counted per threshold."""
    from prlib_ray.stages.dedup import DEDUP_CURVE_TAUS

    taus = ", ".join(str(t) for t in DEDUP_CURVE_TAUS)
    return f"""
WITH p AS MATERIALIZED ({PREFIX_FILTER}),
t AS (SELECT unnest(ARRAY[{taus}]) AS tau_pct)
SELECT CAST(t.tau_pct AS BIGINT) AS tau_pct,
       CAST(count(p.doc_a) FILTER (
            WHERE 100 * p.inter >= t.tau_pct * p.uni) AS BIGINT)
           AS n_pairs
FROM t LEFT JOIN p ON TRUE
GROUP BY t.tau_pct ORDER BY t.tau_pct"""


DEDUP_THRESHOLD_CURVE = _dedup_threshold_curve_sql()


def _split_no_leakage_sql() -> str:
    """Mirror of dedup.split_no_leakage: the CLUSTERS_MINHASH labels as
    a subquery, COALESCE singletons to their own doc_id, the shared
    two-hex-char split rule applied to the LABEL."""
    return f"""
SELECT d.doc_id,
       CAST(COALESCE(l.label, d.doc_id) AS BIGINT) AS label,
       CASE WHEN substring(md5(CAST(COALESCE(l.label, d.doc_id)
                                    AS VARCHAR)), 1, 2) < 'fa'
            THEN 'train'
            WHEN substring(md5(CAST(COALESCE(l.label, d.doc_id)
                                    AS VARCHAR)), 1, 2) < 'fd'
            THEN 'val' ELSE 'test' END AS split
FROM documents d LEFT JOIN ({CLUSTERS_MINHASH}) l USING (doc_id)
ORDER BY d.doc_id"""


SPLIT_NO_LEAKAGE = _split_no_leakage_sql()


def _data_factory_sql() -> str:
    """Mirror of dataset_prep.data_factory: the four stage oracles
    composed verbatim as subqueries (survivors, Gopher gate, token
    counts, cluster-keyed splits) — one definition per stage, shared
    with the standalone queries."""
    return f"""
WITH surv AS MATERIALIZED (SELECT doc_id FROM ({EXACT_DEDUP})),
gp AS MATERIALIZED (SELECT doc_id, passes FROM ({GOPHER_QUALITY})),
tok AS MATERIALIZED (SELECT doc_id, n_tokens FROM ({TOKEN_COUNT})),
sp AS MATERIALIZED (SELECT doc_id, split FROM ({SPLIT_NO_LEAKAGE}))
SELECT sp.split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tok.n_tokens) AS BIGINT) AS n_tokens
FROM surv
JOIN gp USING (doc_id)
JOIN tok USING (doc_id)
JOIN sp USING (doc_id)
WHERE gp.passes = 1
GROUP BY sp.split ORDER BY sp.split"""


DATA_FACTORY = _data_factory_sql()


def _ann_recall_audit_sql() -> str:
    """Mirror of similarity.ann_recall_audit: the BF and IVF oracle
    bodies composed as subqueries, overlap counted per query (LEFT
    JOIN keeps zero-overlap queries); k interpolates from the shared
    similarity.ANN_AUDIT_K so engine and oracle cannot diverge."""
    from prlib_ray.stages.similarity import ANN_AUDIT_K

    return f"""
WITH bf AS MATERIALIZED ({ANN_BRUTEFORCE}),
ivf AS MATERIALIZED ({ANN_IVF_TOPK}),
o AS (
    SELECT bf.query_id, count(*) AS n
    FROM bf JOIN ivf ON bf.query_id = ivf.query_id
                    AND bf.vec_id = ivf.vec_id
    GROUP BY bf.query_id
),
q AS (SELECT DISTINCT query_id FROM bf)
SELECT q.query_id,
       CAST(COALESCE(o.n, 0) AS BIGINT) AS n_overlap,
       CAST(1000 * COALESCE(o.n, 0) // {ANN_AUDIT_K} AS BIGINT) AS recall_permille
FROM q LEFT JOIN o USING (query_id)
ORDER BY q.query_id"""



def _entity_resolution_sql() -> str:
    """Mirror of dedup.entity_resolution: the SORTED_NEIGHBORHOOD pair
    CTE filtered by DuckDB levenshtein() under the same integer
    permille rule, closed transitively by the CLUSTERS_MINHASH
    recursive shape; entity_id = component minimum."""
    from prlib_ray.stages import dedup as dd

    return f"""
WITH RECURSIVE {_snm_rank_ctes(with_text=True)},
p AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND {dd.SNM_WINDOW}
    WHERE greatest(len(a.text), len(b.text)) > 0
      AND 1000 * levenshtein(a.text, b.text)
          <= {dd.ER_MATCH_PERMILLE} * greatest(len(a.text), len(b.text))
),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM p
    UNION ALL
    SELECT doc_b, doc_a FROM p
),
nodes AS (SELECT DISTINCT a FROM edges),
reach(a, b) AS (
    SELECT a, a FROM nodes
    UNION
    SELECT r2.a, e.b FROM reach r2 JOIN edges e ON r2.b = e.a
)
SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS entity_id
FROM reach GROUP BY a ORDER BY doc_id"""


ENTITY_RESOLUTION = _entity_resolution_sql()


def _doc_stitch_sql() -> str:
    """Mirror of dedup.doc_stitch_candidates over the CDC chunk CTEs:
    last-chunk-of-a == first-chunk-of-b, a <> b."""
    from prlib_ray.stages.dedup import CDC_GEAR_MOD

    return f"""
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM documents
),
nz AS (
    SELECT doc_id, w, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
    FROM words WHERE w <> ''
),
fl AS (
    SELECT doc_id, w, j,
           CASE WHEN md5_number_upper(w) % {CDC_GEAR_MOD} = 0
                THEN 1 ELSE 0 END AS f
    FROM nz
),
ck AS (
    SELECT doc_id, w, j,
           COALESCE(sum(f) OVER (PARTITION BY doc_id ORDER BY j
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
    FROM fl
),
chunks AS (
    SELECT doc_id, c, md5(string_agg(w, ' ' ORDER BY j)) AS ch
    FROM ck GROUP BY doc_id, c
),
fst AS (
    SELECT doc_id, ch FROM (
        SELECT doc_id, ch,
               row_number() OVER (PARTITION BY doc_id ORDER BY c) AS rn
        FROM chunks) WHERE rn = 1
),
lst AS (
    SELECT doc_id, ch FROM (
        SELECT doc_id, ch,
               row_number() OVER (PARTITION BY doc_id ORDER BY c DESC) AS rn
        FROM chunks) WHERE rn = 1
)
SELECT a.doc_id AS doc_tail, b.doc_id AS doc_head, a.ch AS chunk_hash
FROM lst a JOIN fst b ON a.ch = b.ch AND a.doc_id <> b.doc_id
ORDER BY doc_tail, doc_head"""


DOC_STITCH = _doc_stitch_sql()


def _kcenter_sql() -> str:
    """Mirror of similarity.kcenter_coreset: K_CENTER-1 unrolled
    MATERIALIZED greedy rounds (the IVF-training oracle discipline) —
    per round, the farthest point from the chosen set (min squared
    int64 distance on the shared floor(v*1000+0.5) quantization),
    ties to the smaller vec_id."""
    from prlib_ray.stages.similarity import K_CENTER

    parts = ["""
WITH emb AS MATERIALIZED (
    SELECT vec_id, i, CAST(floor(e * 1000 + 0.5) AS BIGINT) AS v
    FROM (SELECT vec_id, unnest(embedding) AS e,
                 generate_subscripts(embedding, 1) AS i FROM embeddings)
),
c0 AS (SELECT min(vec_id) AS cid FROM embeddings),
d0 AS MATERIALIZED (
    SELECT a.vec_id, sum((a.v - b.v) * (a.v - b.v)) AS d2
    FROM emb a JOIN emb b ON a.i = b.i AND b.vec_id = (SELECT cid FROM c0)
    GROUP BY a.vec_id
)"""]
    for t in range(1, K_CENTER):
        parts.append(f""",
p{t} AS MATERIALIZED (
    SELECT vec_id, d2 FROM d{t - 1} ORDER BY d2 DESC, vec_id LIMIT 1
)""")
        if t < K_CENTER - 1:
            parts.append(f""",
n{t} AS MATERIALIZED (
    SELECT a.vec_id, sum((a.v - b.v) * (a.v - b.v)) AS d2
    FROM emb a JOIN emb b ON a.i = b.i
                         AND b.vec_id = (SELECT vec_id FROM p{t})
    GROUP BY a.vec_id
),
d{t} AS MATERIALIZED (
    SELECT d{t - 1}.vec_id, least(d{t - 1}.d2, n{t}.d2) AS d2
    FROM d{t - 1} JOIN n{t} USING (vec_id)
)""")
    sel = ["SELECT CAST(0 AS BIGINT) AS round, "
           "CAST((SELECT cid FROM c0) AS BIGINT) AS vec_id, "
           "CAST(0 AS BIGINT) AS dist2"]
    for t in range(1, K_CENTER):
        sel.append(f"SELECT CAST({t} AS BIGINT), CAST(vec_id AS BIGINT), "
                   f"CAST(d2 AS BIGINT) FROM p{t}")
    return ("".join(parts) + "\n" + "\nUNION ALL\n".join(sel)
            + "\nORDER BY round")


KCENTER_CORESET = _kcenter_sql()


def _bpe_chain_ctes() -> str:
    """The shared BPE merge-round CTE chain (wf -> sym0 -> pc/sym 1..M)
    — ONE definition composed by the train oracle AND the encode
    oracle, so the two cannot desynchronize (the band-generation
    lesson): per round, the QUALIFY winner (max weighted pair count,
    ties lexicographic) and the greedy-left merge application via the
    gaps-and-islands parity (overlapping candidate chains merge at
    even offsets — exactly _bpe_apply_merge's rule)."""
    from prlib_ray.stages.text_analysis import BPE_MERGES

    parts = ["""
WITH wf AS MATERIALIZED (
    SELECT w, count(*) AS f FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ) WHERE w <> '' GROUP BY w
),
sym0 AS MATERIALIZED (
    SELECT w AS wid, i, s, f FROM (
        SELECT w, f,
               unnest(regexp_split_to_array(w, '')) AS s,
               generate_subscripts(regexp_split_to_array(w, ''), 1) AS i
        FROM wf
    )
)"""]
    for t in range(1, BPE_MERGES + 1):
        p = t - 1
        parts.append(f""",
pc{t} AS MATERIALIZED (
    SELECT l, r, CAST(sum(f) AS BIGINT) AS cnt FROM (
        SELECT s AS l,
               lead(s) OVER (PARTITION BY wid ORDER BY i) AS r,
               f
        FROM sym{p}
    ) WHERE r IS NOT NULL
    GROUP BY l, r
    QUALIFY row_number() OVER (ORDER BY sum(f) DESC, l, r) = 1
),
mg{t} AS MATERIALIZED (
    SELECT wid, i, s, f,
           CASE WHEN s = (SELECT l FROM pc{t})
                 AND lead(s) OVER (PARTITION BY wid ORDER BY i)
                     = (SELECT r FROM pc{t})
                THEN 1 ELSE 0 END AS cand
    FROM sym{p}
),
tk{t} AS MATERIALIZED (
    SELECT wid, i, s, f, cand,
           CASE WHEN cand = 1 AND
                (rnk - min(rnk) OVER (PARTITION BY wid, cand, grp)) % 2 = 0
                THEN 1 ELSE 0 END AS take
    FROM (
        SELECT wid, i, s, f, cand,
               row_number() OVER (PARTITION BY wid ORDER BY i) AS rnk,
               row_number() OVER (PARTITION BY wid ORDER BY i)
                 - row_number() OVER (PARTITION BY wid, cand ORDER BY i)
                 AS grp
        FROM mg{t}
    )
),
sym{t} AS MATERIALIZED (
    SELECT wid,
           row_number() OVER (PARTITION BY wid ORDER BY i) AS i,
           CASE WHEN take = 1
                THEN s || (SELECT r FROM pc{t}) ELSE s END AS s,
           f
    FROM (
        SELECT wid, i, s, f, take,
               lag(take) OVER (PARTITION BY wid ORDER BY i) AS ptake
        FROM tk{t}
    ) WHERE ptake IS NULL OR ptake = 0
)""")
    return "".join(parts)


def _bpe_train_sql() -> str:
    from prlib_ray.stages.text_analysis import BPE_MERGES

    sel = [
        f"SELECT CAST({t} AS BIGINT) AS round, l AS left_sym, "
        f"r AS right_sym, cnt AS pair_count FROM pc{t}"
        for t in range(1, BPE_MERGES + 1)
    ]
    return _bpe_chain_ctes() + "\n" + "\nUNION ALL\n".join(sel) \
        + "\nORDER BY round"


def _bpe_token_count_sql() -> str:
    """Mirror of text_analysis.bpe_token_count: per-word symbol counts
    from the shared chain's final state, summed over each doc's word
    instances (docs with no non-empty words count 0)."""
    from prlib_ray.stages.text_analysis import BPE_MERGES

    return _bpe_chain_ctes() + f""",
wl AS (SELECT wid AS w, count(*) AS n_sym FROM sym{BPE_MERGES} GROUP BY wid),
dw AS (
    SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ) WHERE w <> ''
)
SELECT d.doc_id,
       CAST(COALESCE(sum(wl.n_sym), 0) AS BIGINT) AS n_bpe_tokens
FROM documents d
LEFT JOIN dw ON d.doc_id = dw.doc_id
LEFT JOIN wl ON dw.w = wl.w
GROUP BY d.doc_id ORDER BY d.doc_id"""


BPE_TRAIN = _bpe_train_sql()
BPE_TOKEN_COUNT = _bpe_token_count_sql()


def _ann_ivf_topk_sql() -> str:
    """Mirror of similarity.ann_ivf_topk INCLUDING the training loop:
    IVF_ITERS integer-Lloyd iterations unrolled as CTE stages (assign =
    row_number over the integer cosine key, re-center = per-dimension
    floor-mean via the mod trick, emptied cluster keeps its previous
    centroid through the LEFT JOIN COALESCE), then corpus assignment,
    nprobe probing and the shared integer-score ranking tail."""
    from prlib_ray.stages.similarity import (
        BF_SCORE_SCALE,
        IVF_ITERS,
        IVF_N_CENTROIDS,
        IVF_N_QUERIES,
        IVF_NPROBE,
        IVF_TRAIN_N,
    )

    train_n, n_queries, n_centroids, nprobe = (
        IVF_TRAIN_N, IVF_N_QUERIES, IVF_N_CENTROIDS, IVF_NPROBE)
    score = (
        "CASE WHEN n.nn = 0 THEN 0 ELSE CAST((s2x - (((s2x % ddn) + ddn) "
        "% ddn)) / ddn AS BIGINT) END"
    )
    its = []
    for t in range(IVF_ITERS):
        its.append(f""",
nc{t} AS MATERIALIZED (SELECT c, sum(v * v) AS nn FROM c{t} GROUP BY c),
sc{t} AS MATERIALIZED (
    SELECT d.vec_id, d.c, {score} AS score
    FROM (
        SELECT tr.vec_id, ct.c,
               CAST(sum(tr.qv * ct.v) AS HUGEINT)
                   * abs(sum(tr.qv * ct.v)) * {BF_SCORE_SCALE} AS s2x
        FROM train tr JOIN c{t} ct ON tr.i = ct.i
        GROUP BY tr.vec_id, ct.c
    ) d
    JOIN nc{t} n ON d.c = n.c,
    LATERAL (SELECT CAST(n.nn AS HUGEINT) AS ddn) x
),
asg{t} AS MATERIALIZED (
    SELECT vec_id, c FROM (
        SELECT vec_id, c, row_number() OVER (
            PARTITION BY vec_id ORDER BY score DESC, c ASC) AS rn
        FROM sc{t}
    ) WHERE rn = 1
),
upd{t} AS MATERIALIZED (
    SELECT g.c, g.i,
           CAST((g.s - (((g.s % g.n) + g.n) % g.n)) / g.n AS BIGINT) AS v
    FROM (
        SELECT a.c, tr.i, sum(tr.qv) AS s, count(*) AS n
        FROM asg{t} a JOIN train tr ON tr.vec_id = a.vec_id
        GROUP BY a.c, tr.i
    ) g
),
c{t + 1} AS MATERIALIZED (
    SELECT ct.c, ct.i, COALESCE(u.v, ct.v) AS v
    FROM c{t} ct LEFT JOIN upd{t} u ON ct.c = u.c AND ct.i = u.i
)""")
    cf = f"c{IVF_ITERS}"
    return f"""
WITH q AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) AS i,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5)
                AS BIGINT) AS qv
    FROM embeddings
),
train AS MATERIALIZED (SELECT * FROM q WHERE vec_id < {train_n}),
c0 AS MATERIALIZED (
    SELECT dr - 1 AS c, i, qv AS v FROM (
        SELECT t.*, dense_rank() OVER (ORDER BY vec_id) AS dr FROM train t
    ) WHERE dr <= {n_centroids}
){"".join(its)},
ncf AS (SELECT c, sum(v * v) AS nn FROM {cf} GROUP BY c),
scf AS MATERIALIZED (
    SELECT d.vec_id, d.c, {score} AS score
    FROM (
        SELECT qq.vec_id, ct.c,
               CAST(sum(qq.qv * ct.v) AS HUGEINT)
                   * abs(sum(qq.qv * ct.v)) * {BF_SCORE_SCALE} AS s2x
        FROM q qq JOIN {cf} ct ON qq.i = ct.i
        GROUP BY qq.vec_id, ct.c
    ) d
    JOIN ncf n ON d.c = n.c,
    LATERAL (SELECT CAST(n.nn AS HUGEINT) AS ddn) x
),
asgf AS (
    SELECT vec_id, c FROM (
        SELECT vec_id, c, row_number() OVER (
            PARTITION BY vec_id ORDER BY score DESC, c ASC) AS rn
        FROM scf
    ) WHERE rn = 1
),
qry AS (
    SELECT vec_id FROM (
        SELECT DISTINCT vec_id FROM train
    ) ranked QUALIFY dense_rank() OVER (ORDER BY vec_id) <= {n_queries}
),
probes AS (
    SELECT vec_id AS query_id, c FROM (
        SELECT s.vec_id, s.c, row_number() OVER (
            PARTITION BY s.vec_id ORDER BY s.score DESC, s.c ASC) AS rn
        FROM scf s JOIN qry ON s.vec_id = qry.vec_id
    ) WHERE rn <= {nprobe}
),
cand AS (
    SELECT DISTINCT p.query_id, af.vec_id
    FROM probes p JOIN asgf af ON af.c = p.c
    WHERE af.vec_id <> p.query_id
),
norms AS (SELECT vec_id, sum(qv * qv) AS nn FROM q GROUP BY vec_id),
cdots AS (
    SELECT cd.query_id, cd.vec_id, sum(a.qv * b.qv) AS dot
    FROM cand cd
    JOIN q a ON a.vec_id = cd.query_id
    JOIN q b ON b.vec_id = cd.vec_id AND b.i = a.i
    GROUP BY cd.query_id, cd.vec_id
)""" + _score_rank_tail("cdots")


ANN_IVF_TOPK = _ann_ivf_topk_sql()
# defined above; evaluated here because it composes ANN_IVF_TOPK
ANN_RECALL_AUDIT = _ann_recall_audit_sql()


def _ann_pq_adc_sql() -> str:
    """Mirror of similarity.ann_pq_adc_topk INCLUDING the per-subspace
    integer-Lloyd codebook training (PQ_ITERS iterations unrolled; the
    subspace is a column, so one CTE chain trains all N_PQ_SUB books at
    once), then the ADC lookup-table pricing, the global shortlist by
    (approx asc, vec asc) and the exact-L2 re-rank."""
    from prlib_ray.stages.similarity import (
        ADC_SHORTLIST,
        ADC_TRAIN_N,
        N_ADC_CODES,
        N_PQ_SUB,
        PQ_ITERS,
    )

    its = []
    for t in range(PQ_ITERS):
        its.append(f""",
d2_{t} AS MATERIALIZED (
    SELECT sv.vec_id, sv.s, cb.code,
           sum((sv.qv - cb.v) * (sv.qv - cb.v)) AS d2
    FROM trsub sv JOIN pq{t} cb ON sv.s = cb.s AND sv.pos = cb.pos
    GROUP BY sv.vec_id, sv.s, cb.code
),
asg_{t} AS MATERIALIZED (
    SELECT vec_id, s, code FROM (
        SELECT vec_id, s, code, row_number() OVER (
            PARTITION BY vec_id, s ORDER BY d2 ASC, code ASC) AS rn
        FROM d2_{t}
    ) WHERE rn = 1
),
upd_{t} AS MATERIALIZED (
    SELECT g.s, g.code, g.pos,
           CAST((g.sm - (((g.sm % g.n) + g.n) % g.n)) / g.n AS BIGINT) AS v
    FROM (
        SELECT a.s, a.code, sv.pos, sum(sv.qv) AS sm, count(*) AS n
        FROM asg_{t} a
        JOIN trsub sv ON sv.vec_id = a.vec_id AND sv.s = a.s
        GROUP BY a.s, a.code, sv.pos
    ) g
),
pq{t + 1} AS MATERIALIZED (
    SELECT cb.s, cb.code, cb.pos, COALESCE(u.v, cb.v) AS v
    FROM pq{t} cb
    LEFT JOIN upd_{t} u ON cb.s = u.s AND cb.code = u.code
                       AND cb.pos = u.pos
)""")
    pqf = f"pq{PQ_ITERS}"
    return f"""
WITH q AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) AS i,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5)
                AS BIGINT) AS qv
    FROM embeddings
),
subq AS MATERIALIZED (
    SELECT vec_id,
           (i - 1) // ((SELECT max(i) FROM q) // {N_PQ_SUB}) AS s,
           (i - 1) % ((SELECT max(i) FROM q) // {N_PQ_SUB}) AS pos,
           qv
    FROM q
),
trsub AS MATERIALIZED (SELECT * FROM subq WHERE vec_id < {ADC_TRAIN_N}),
pq0 AS MATERIALIZED (
    SELECT s, dr - 1 AS code, pos, qv AS v FROM (
        SELECT t.*, dense_rank() OVER (ORDER BY vec_id) AS dr FROM trsub t
    ) WHERE dr <= {N_ADC_CODES}
){"".join(its)},
codes AS MATERIALIZED (
    SELECT vec_id, s, code FROM (
        SELECT sv.vec_id, sv.s, cb.code, row_number() OVER (
            PARTITION BY sv.vec_id, sv.s
            ORDER BY sum((sv.qv - cb.v) * (sv.qv - cb.v)) ASC, cb.code ASC
        ) AS rn
        FROM subq sv JOIN {pqf} cb ON sv.s = cb.s AND sv.pos = cb.pos
        GROUP BY sv.vec_id, sv.s, cb.code
    ) WHERE rn = 1
),
qry AS (
    SELECT vec_id FROM (SELECT DISTINCT vec_id FROM trsub) ranked
    QUALIFY dense_rank() OVER (ORDER BY vec_id) <= 10
),
lut AS MATERIALIZED (
    SELECT qs.vec_id AS query_id, qs.s, cb.code,
           sum((qs.qv - cb.v) * (qs.qv - cb.v)) AS d2
    FROM subq qs JOIN qry ON qs.vec_id = qry.vec_id
    JOIN {pqf} cb ON qs.s = cb.s AND qs.pos = cb.pos
    GROUP BY qs.vec_id, qs.s, cb.code
),
approx AS MATERIALIZED (
    SELECT l.query_id, c.vec_id, sum(l.d2) AS adc
    FROM codes c JOIN lut l ON c.s = l.s AND c.code = l.code
    WHERE c.vec_id <> l.query_id
    GROUP BY l.query_id, c.vec_id
),
short AS (
    SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id, row_number() OVER (
            PARTITION BY query_id ORDER BY adc ASC, vec_id ASC) AS rn
        FROM approx
    ) WHERE rn <= {ADC_SHORTLIST}
),
exact AS (
    SELECT sh.query_id, sh.vec_id,
           sum((a.qv - b.qv) * (a.qv - b.qv)) AS d2
    FROM short sh
    JOIN q a ON a.vec_id = sh.query_id
    JOIN q b ON b.vec_id = sh.vec_id AND b.i = a.i
    GROUP BY sh.query_id, sh.vec_id
)
SELECT query_id, vec_id, CAST(d2 AS BIGINT) AS d2 FROM (
    SELECT query_id, vec_id, d2, row_number() OVER (
        PARTITION BY query_id ORDER BY d2 ASC, vec_id ASC) AS rn
    FROM exact
) WHERE rn <= 5
ORDER BY query_id, vec_id"""


ANN_PQ_ADC = _ann_pq_adc_sql()


# mirrors dedup._plant_norm_batch: doc_id < 10 duplicated at +1000000
# with a leading tab, UPPER case and trailing spaces — the normalization
# (lower -> collapse \s+ -> trim) provably collapses each mutant back
# onto its original (the fixtures are pure ASCII, so lower(upper(x)) ==
# lower(x)); RE2 \s on both sides (DuckDB regexp_replace is RE2, as is
# pyarrow replace_substring_regex)
NORMALIZED_DEDUP = f"""
WITH aug AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {_dd.PLANT_NORM_OFFSET} AS doc_id,
           chr(9) || upper(text) || '  ' AS text
    FROM documents WHERE doc_id < {_dd.N_PLANT_NORM}
),
n AS (
    SELECT doc_id,
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS nt
    FROM aug
)
SELECT md5(nt) AS h, min(doc_id) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_docs
FROM n GROUP BY nt ORDER BY h"""

# mirrors dedup.split_leakage: the NORMALIZED_DEDUP plant plus a second
# mutant set at +SL_PLANT_OFFSET2 (whose md5 splits cross), normalized
# groups of >= 2 docs, then the DISTINCT-split self-join pair contract
# (a.split <= b.split lexicographically)
SPLIT_LEAKAGE = f"""
WITH aug AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {_dd.PLANT_NORM_OFFSET} AS doc_id,
           chr(9) || upper(text) || '  ' AS text
    FROM documents WHERE doc_id < {_dd.N_PLANT_NORM}
    UNION ALL
    SELECT doc_id + {_dd.SL_PLANT_OFFSET2} AS doc_id,
           chr(10) || text || ' ' || chr(9) AS text
    FROM documents WHERE doc_id < {_dd.N_PLANT_NORM}
),
n AS (
    SELECT doc_id,
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS nt
    FROM aug
),
g AS (
    SELECT md5(nt) AS h,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'fa'
                     THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'fd'
                     THEN 'val'
                ELSE 'test' END AS split
    FROM n
),
sz AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
d AS (SELECT DISTINCT h, split FROM g JOIN sz USING (h))
SELECT a.split AS split_a, b.split AS split_b,
       CAST(count(*) AS BIGINT) AS n_groups
FROM d a JOIN d b ON a.h = b.h AND a.split <= b.split
GROUP BY 1, 2 ORDER BY split_a, split_b"""

# MOSS-style shared-fingerprint pairs over the WINNOW selection: global
# df-cap (stop fingerprints, > 20 docs dropped) then pairs sharing >= 3
# retained fingerprints; (doc_id, h) is distinct per doc upstream so
# count(*) per pair IS the shared-fingerprint count
WINNOW_PAIRS = f"""
WITH fp AS ({WINNOW}),
keep AS (
    SELECT s.doc_id, s.h
    FROM fp s JOIN (
        SELECT h FROM fp GROUP BY h HAVING count(*) <= {_dd.WINNOW_DF_CAP}
    ) d USING (h)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM keep a JOIN keep b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= {_dd.WINNOW_MIN_SHARED}
ORDER BY doc_a, doc_b"""


def sem_assignment_ctes() -> str:
    """The ONE SQL mirror of the integer dot-argmax assignment contract
    (dedup_semantic / cluster_balance / embedding_outliers /
    cluster_top_terms): CTEs q(vec_id, i, qv), seeds(cid, i, sv) and
    assign(vec_id, cid, dot).  Composed by every consumer so the
    quantization/tie contract cannot diverge between oracles."""
    from prlib_ray.stages.similarity import N_SEM_SEEDS

    return f"""WITH q AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) AS i,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5)
                AS BIGINT) AS qv
    FROM embeddings
),
seeds AS (SELECT vec_id AS cid, i, qv AS sv FROM q
          WHERE vec_id < {N_SEM_SEEDS}),
cdots AS (
    SELECT q.vec_id, s.cid, sum(q.qv * s.sv) AS dot
    FROM q JOIN seeds s USING (i) GROUP BY q.vec_id, s.cid
),
assign AS (
    SELECT vec_id, cid, dot FROM (
        SELECT vec_id, cid, dot,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dot DESC, cid ASC) AS rn
        FROM cdots
    ) WHERE rn = 1
)"""


def _cluster_balance_sql() -> str:
    """Mirror of similarity.cluster_balance: the shared assignment CTEs
    over the FULL embeddings table, grouped by (cluster, label)."""
    return sem_assignment_ctes() + """
SELECT CAST(a.cid AS BIGINT) AS cluster,
       CAST(e.label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM assign a JOIN embeddings e USING (vec_id)
GROUP BY 1, 2 ORDER BY 1, 2"""


CLUSTER_BALANCE = _cluster_balance_sql()


def _embedding_outliers_sql() -> str:
    """Mirror of similarity.embedding_outliers: the SHARED assignment
    CTEs plus the shared integer-cosine score of each vector against
    its ASSIGNED centroid (same mod-trick exact floor as
    _scored_ranked_ctes); bottom-K by (score ASC, vec_id ASC)."""
    from prlib_ray.stages.similarity import OUTLIER_K

    return sem_assignment_ctes() + f""",
norms AS (SELECT vec_id, sum(qv * qv) AS nn FROM q GROUP BY vec_id),
snorm AS (SELECT cid, sum(sv * sv) AS sn FROM seeds GROUP BY cid),
scored AS (
    SELECT a.vec_id, a.cid,
           CASE WHEN n.nn * s.sn = 0 THEN 0
                ELSE CAST((s2x - (((s2x % dd) + dd) % dd)) / dd AS BIGINT)
           END AS score
    FROM (SELECT vec_id, cid,
                 CAST(dot AS HUGEINT) * abs(dot) * 10000 AS s2x
          FROM assign) a
    JOIN norms n ON n.vec_id = a.vec_id
    JOIN snorm s ON s.cid = a.cid,
    LATERAL (SELECT CAST(n.nn AS HUGEINT) * s.sn AS dd) x
)
SELECT vec_id, CAST(cid AS BIGINT) AS cluster, score
FROM scored ORDER BY score ASC, vec_id ASC LIMIT {OUTLIER_K}"""


EMBEDDING_OUTLIERS = _embedding_outliers_sql()


# mirrors similarity.label_centroid_affinity: per-label component SUMS
# of the x1000-quantized embeddings (cosine(sum) == cosine(mean), all
# integers), then the shared BF score floor(dot*|dot|*1e4/(na*nb)) per
# unordered label pair via the mod-trick exact floor division.
# SCALE LIMIT (oracle only): s2x = dot*|dot|*1e4 overflows HUGEINT once
# per-label component sums reach ~4.5e7 (~45k rows per label at the
# x1000 quantization) — the ENGINE side is exact Python ints and has no
# such ceiling; fixtures top out ~200 rows/label (s2x ~1e29 << 1.7e38)
LABEL_CENTROID_AFFINITY = """
WITH q AS (
    SELECT CAST(label AS BIGINT) AS label,
           generate_subscripts(embedding, 1) AS i,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5)
                AS BIGINT) AS qv
    FROM embeddings
),
c AS (SELECT label, i, sum(qv) AS s FROM q GROUP BY 1, 2),
n AS (SELECT label, sum(CAST(s AS HUGEINT) * s) AS nn FROM c GROUP BY 1),
p AS (
    SELECT a.label AS label_a, b.label AS label_b,
           sum(CAST(a.s AS HUGEINT) * b.s) AS dot
    FROM c a JOIN c b ON a.i = b.i AND a.label < b.label
    GROUP BY 1, 2
)
SELECT p.label_a, p.label_b,
       CASE WHEN na.nn * nb.nn = 0 THEN 0
            ELSE CAST((s2x - (((s2x % dd) + dd) % dd)) / dd AS BIGINT)
       END AS affinity
FROM (SELECT label_a, label_b, dot,
             CAST(dot AS HUGEINT) * abs(dot) * 10000 AS s2x
      FROM p) p
JOIN n na ON p.label_a = na.label
JOIN n nb ON p.label_b = nb.label,
LATERAL (SELECT na.nn * nb.nn AS dd) x
ORDER BY label_a, label_b"""


# mirrors dedup.best_survivor_dedup: the normalized groups (same plant +
# normalization as NORMALIZED_DEDUP) with the production survivor policy
# — keep the LONGEST variant, ties to the smallest doc_id; length is
# computed on both sides (not the stored n_chars)
BEST_SURVIVOR_DEDUP = f"""
WITH aug AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {_dd.PLANT_NORM_OFFSET} AS doc_id,
           chr(9) || upper(text) || '  ' AS text
    FROM documents WHERE doc_id < {_dd.N_PLANT_NORM}
),
n AS (
    SELECT doc_id, length(text) AS ln,
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS nt
    FROM aug
),
r AS (
    SELECT doc_id, ln, nt,
           row_number() OVER (PARTITION BY nt
                              ORDER BY ln DESC, doc_id ASC) AS rn,
           count(*) OVER (PARTITION BY nt) AS n_docs
    FROM n
)
SELECT doc_id AS survivor, CAST(ln AS BIGINT) AS n_chars,
       CAST(n_docs AS BIGINT) AS n_docs
FROM r WHERE rn = 1 ORDER BY survivor"""


def _corpus_validate_sql() -> str:
    """Mirror of corpus_stats.corpus_validate: the planted corruptions
    (NULL text / empty text / off-by-one n_chars / duplicated id) via
    UNION ALLs; constants interpolate from the implementation module."""
    from prlib_ray.stages import corpus_stats as _cs

    return f"""
WITH aug AS (
    SELECT doc_id, text, n_chars FROM documents
    UNION ALL
    SELECT doc_id + {_cs.VAL_NULL_OFFSET}, NULL, n_chars
    FROM documents WHERE doc_id < {_cs.N_PLANT_VAL}
    UNION ALL
    SELECT doc_id + {_cs.VAL_EMPTY_OFFSET}, '', 0
    FROM documents WHERE doc_id < {_cs.N_PLANT_VAL}
    UNION ALL
    SELECT doc_id + {_cs.VAL_MISMATCH_OFFSET}, text, n_chars + 1
    FROM documents WHERE doc_id < {_cs.N_PLANT_VAL}
    UNION ALL
    SELECT doc_id, text, n_chars
    FROM documents WHERE doc_id < {_cs.N_PLANT_VAL}
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (text IS NULL) AS BIGINT) AS n_null_text,
       CAST(count(*) FILTER (text = '') AS BIGINT) AS n_empty_text,
       CAST(count(*) FILTER (n_chars != length(text)) AS BIGINT)
           AS n_len_mismatch,
       CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) AS n_dup_ids
FROM aug"""


CORPUS_VALIDATE = _corpus_validate_sql()


def _hard_negatives_sql() -> str:
    """Mirror of similarity.hard_negatives: the shared scored/ranked CTE
    chain restricted to wrong-class candidates (label inequality also
    drops the anchor itself); constants interpolate from the module."""
    from prlib_ray.stages.similarity import HN_QUERIES

    return f"""
WITH q AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) AS i,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS qv
    FROM embeddings
),
norms AS (SELECT vec_id, sum(qv * qv) AS nn FROM q GROUP BY vec_id),
lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
dots AS (
    SELECT a.vec_id AS query_id, b.vec_id AS vec_id, sum(a.qv * b.qv) AS dot
    FROM q a JOIN q b ON a.i = b.i AND a.vec_id < {HN_QUERIES}
    JOIN lab la ON la.vec_id = a.vec_id
    JOIN lab lb ON lb.vec_id = b.vec_id
    WHERE la.label <> lb.label
    GROUP BY a.vec_id, b.vec_id
)""" + _score_rank_tail("dots")


HARD_NEGATIVES = _hard_negatives_sql()


# mirrors similarity.label_norm_quantiles: the shared x1000 quantized
# squared norm, per-label row_number (norm, vec_id) rank convention
LABEL_NORM_QUANTILES = """
WITH q AS (
    SELECT vec_id,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5)
                AS BIGINT) AS qv
    FROM embeddings
),
norms AS (SELECT vec_id, sum(qv * qv) AS n2 FROM q GROUP BY vec_id),
j AS (
    SELECT CAST(e.label AS BIGINT) AS label, n.n2, n.vec_id
    FROM norms n JOIN embeddings e USING (vec_id)
),
t AS (
    SELECT label, n2,
           row_number() OVER (PARTITION BY label
                              ORDER BY n2, vec_id) AS rn,
           count(*) OVER (PARTITION BY label) AS n
    FROM j
)
SELECT label,
       CAST(max(CASE WHEN rn = 1 + (50 * (n - 1)) // 100 THEN n2 END)
            AS BIGINT) AS p50_norm2,
       CAST(max(CASE WHEN rn = 1 + (90 * (n - 1)) // 100 THEN n2 END)
            AS BIGINT) AS p90_norm2,
       CAST(max(n) AS BIGINT) AS n_vecs
FROM t GROUP BY label ORDER BY label"""


# mirrors dedup.dedup_rate_by_source: the plant interpolates from the
# implementation constants so the two sides cannot desynchronize
def _dedup_rate_sql() -> str:
    n, off, src = (_dd.N_PLANT_XSRC, _dd.PLANT_XSRC_OFFSET,
                   _dd.PLANT_XSRC_SOURCE)
    return f"""
WITH aug AS (
    SELECT doc_id, text, source FROM documents
    UNION ALL
    SELECT doc_id + {off}, text, '{src}' FROM documents
    WHERE doc_id < {n}
),
s AS (SELECT md5(text) AS h, min(doc_id) AS keep FROM aug GROUP BY 1),
tot AS (SELECT source, count(*) AS n_docs FROM aug GROUP BY 1),
surv AS (
    SELECT a.source, count(*) AS n_survivors
    FROM aug a JOIN s ON a.doc_id = s.keep
    GROUP BY 1
)
SELECT t.source,
       CAST(t.n_docs AS BIGINT) AS n_docs,
       CAST(COALESCE(surv.n_survivors, 0) AS BIGINT) AS n_survivors,
       CAST(t.n_docs - COALESCE(surv.n_survivors, 0) AS BIGINT)
           AS n_removed,
       CAST((1000 * (t.n_docs - COALESCE(surv.n_survivors, 0)))
            // t.n_docs AS BIGINT) AS removed_permille
FROM tot t LEFT JOIN surv ON surv.source = t.source
ORDER BY t.source"""


DEDUP_RATE_BY_SOURCE = _dedup_rate_sql()


# mirrors dedup.cross_source_dup_matrix
def _xsrc_matrix_sql() -> str:
    n, off, src = (_dd.N_PLANT_XSRC, _dd.PLANT_XSRC_OFFSET,
                   _dd.PLANT_XSRC_SOURCE)
    return f"""
WITH aug AS (
    SELECT doc_id, text, source FROM documents
    UNION ALL
    SELECT doc_id + {off}, text, '{src}' FROM documents
    WHERE doc_id < {n}
),
g AS (SELECT DISTINCT md5(text) AS h, source FROM aug)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_dup_groups
FROM g a JOIN g b ON a.h = b.h AND a.source < b.source
GROUP BY 1, 2 ORDER BY 1, 2"""


CROSS_SOURCE_DUP_MATRIX = _xsrc_matrix_sql()


# mirrors similarity.ann_dim_truncation_audit: the truncated chain is
# the SAME shared scored/ranked contract over the first TRUNC_DIM
# coordinates (generate_subscripts is 1-based, so i <= TRUNC_DIM);
# overlap joins the two rn<=k sets per query
def _dim_truncation_sql() -> str:
    from prlib_ray.stages.similarity import TRUNC_DIM

    k, nq, td = 5, 10, TRUNC_DIM
    return f"""
WITH q AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) AS i,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5)
                AS BIGINT) AS qv
    FROM embeddings
),
norms AS (SELECT vec_id, sum(qv * qv) AS nn FROM q GROUP BY vec_id),
dots AS (
    SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
           sum(a.qv * b.qv) AS dot
    FROM q a JOIN q b ON a.i = b.i AND a.vec_id < {nq}
                     AND b.vec_id <> a.vec_id
    GROUP BY a.vec_id, b.vec_id
)""" + _scored_ranked_ctes("dots") + f""",
qt AS (SELECT vec_id, i, qv FROM q WHERE i <= {td}),
normst AS (SELECT vec_id, sum(qv * qv) AS nn FROM qt GROUP BY vec_id),
dotst AS (
    SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
           sum(a.qv * b.qv) AS dot
    FROM qt a JOIN qt b ON a.i = b.i AND a.vec_id < {nq}
                       AND b.vec_id <> a.vec_id
    GROUP BY a.vec_id, b.vec_id
)""" + _scored_ranked_ctes("dotst", "t") + f"""
SELECT r.query_id,
       CAST(count(t.vec_id) AS BIGINT) AS n_overlap,
       CAST((1000 * count(t.vec_id)) // {k} AS BIGINT)
           AS recall_permille
FROM ranked r
LEFT JOIN rankedt t ON t.query_id = r.query_id
                   AND t.vec_id = r.vec_id AND t.rn <= {k}
WHERE r.rn <= {k}
GROUP BY r.query_id ORDER BY r.query_id"""


ANN_DIM_TRUNCATION = _dim_truncation_sql()


def _sql_lit(s: str) -> str:
    """An exact DuckDB string expression for arbitrary text: printable
    ASCII runs as quoted literals, everything else (and quotes) as
    chr() codepoints — no escaping or encoding games.  Shared by every
    oracle that interpolates implementation-module plant text."""
    parts = []
    run = ""
    for ch in s:
        if 32 <= ord(ch) < 127 and ch != "'":
            run += ch
        else:
            if run:
                parts.append(f"'{run}'")
                run = ""
            parts.append(f"chr({ord(ch)})")
    if run:
        parts.append(f"'{run}'")
    return " || ".join(parts) if parts else "''"


def _extract_kept_ctes() -> str:
    """WITH-clause body (words .. kept) of the exact-extraction mirror,
    shared by EXTRACT_TURNS_EXACT and EXTRACT_TURN_SPANS (the engine
    twin of the sharing is boilerplate._exact_line_frame).

    Rebuilds the deterministic transcript (word-chunked lines + the four
    furniture plants), applies the SAME furniture rules, and decides the
    Sauvola keep per candidate window in HUGEINT:
    D = 640*n*xv - 512*S;  keep <=> D > 0 AND n^2*D^2 > S^2*(n*Q - S^2).
    Every constant interpolates from the implementation module so a knob
    change cannot silently desynchronize the mirror."""
    from prlib_ray.stages import boilerplate as bp

    plants = "\n".join(
        f"  UNION ALL SELECT doc_id, CAST({lno} AS BIGINT) AS line_no, "
        f"{_sql_lit(txt)} AS line FROM documents WHERE doc_id % {mod} = 0"
        for (mod, lno, txt) in bp.EXACT_PLANTS
    )
    return f"""
WITH words AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents
),
content_lines AS (
  SELECT doc_id,
         CAST({bp.EXACT_CONTENT_BASE} + (i - 1) // {bp.EXACT_LINE_WORDS}
              AS BIGINT) AS line_no,
         string_agg(w, ' ' ORDER BY i) AS line
  FROM words GROUP BY doc_id, (i - 1) // {bp.EXACT_LINE_WORDS}
),
lines AS (
  SELECT * FROM content_lines
{plants}
),
feat AS (
  SELECT doc_id, line_no, line,
         (regexp_matches(line, '^[-=_]{{4,}}$')
          OR position('cookie' IN lower(line)) > 0
          OR position('(c) ' IN lower(line)) > 0
          OR position('all rights reserved' IN lower(line)) > 0
          OR (length(line) - length(replace(line, ' | ', ''))) // 3 >= 3
          OR 2 * (length(line) - length(regexp_replace(line,
                 '<a\\b[^>]*>|</a>|https?://[^ \\n]+', '', 'g')))
               > length(line)
         ) AS furniture,
         LEAST(length(regexp_replace(line, '[^A-Za-z0-9]', '', 'g')),
               {bp.EXACT_XMAX}) AS xv
  FROM lines
),
cand AS (
  SELECT doc_id, line_no, line, CAST(xv AS HUGEINT) AS xv,
         CAST(COUNT(*) OVER w AS HUGEINT) AS n,
         CAST(SUM(xv) OVER w AS HUGEINT) AS s,
         CAST(SUM(xv * xv) OVER w AS HUGEINT) AS q
  FROM feat WHERE NOT furniture
  WINDOW w AS (PARTITION BY doc_id ORDER BY line_no
               ROWS BETWEEN {bp.WINDOW} PRECEDING AND {bp.WINDOW} FOLLOWING)
),
kept AS (
  SELECT doc_id, line_no, line
  FROM (SELECT *, 640 * n * xv - 512 * s AS d FROM cand)
  WHERE d > 0 AND n * n * d * d > s * s * (n * q - s * s)
)"""


def _extract_turns_exact_sql() -> str:
    """The per-turn extraction mirror: the shared kept-line chain + the
    per-doc string_agg / count tail."""
    from prlib_ray.stages import boilerplate as bp

    return f"""{_extract_kept_ctes()},
per_doc AS (
  SELECT d.doc_id,
         COALESCE(k.clean_text, '') AS clean_text,
         COALESCE(k.n_content, 0) AS n_content
  FROM documents d
  LEFT JOIN (SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no)
                    AS clean_text, COUNT(*) AS n_content
             FROM kept GROUP BY doc_id) k USING (doc_id)
),
furn AS (
  SELECT doc_id,
         COUNT(*) FILTER (WHERE furniture) AS n_furniture,
         COUNT(*) FILTER (WHERE NOT furniture) AS n_cand
  FROM feat GROUP BY doc_id
)
SELECT p.doc_id % {bp.EXACT_NCONV} AS conv_id,
       p.doc_id // {bp.EXACT_NCONV} AS turn_idx,
       p.clean_text,
       CAST(p.n_content AS BIGINT) AS n_content,
       CAST(f.n_furniture AS BIGINT) AS n_furniture,
       CAST(f.n_cand - p.n_content AS BIGINT) AS n_boilerplate
FROM per_doc p JOIN furn f USING (doc_id)
"""


EXTRACT_TURNS_EXACT = _extract_turns_exact_sql()


def _extract_turn_spans_sql() -> str:
    """Mirror of boilerplate.extract_spans_batch: the shared kept-line
    chain + per-kept-line rank and character offsets into the turn's
    '\\n'-joined clean_text (exclusive prefix sum of length + 1 over
    prior kept lines in line_no order)."""
    from prlib_ray.stages import boilerplate as bp

    return f"""{_extract_kept_ctes()},
span AS (
  SELECT doc_id,
         row_number() OVER w - 1 AS span_idx,
         COALESCE(SUM(length(line) + 1) OVER (
             PARTITION BY doc_id ORDER BY line_no
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS span_start,
         length(line) AS len
  FROM kept
  WINDOW w AS (PARTITION BY doc_id ORDER BY line_no)
)
SELECT doc_id % {bp.EXACT_NCONV} AS conv_id,
       doc_id // {bp.EXACT_NCONV} AS turn_idx,
       CAST(span_idx AS BIGINT) AS span_idx,
       CAST(span_start AS BIGINT) AS span_start,
       CAST(span_start + len AS BIGINT) AS span_end
FROM span
"""


EXTRACT_TURN_SPANS = _extract_turn_spans_sql()


def _unicode_dedup_sql() -> str:
    """NFC-fold dedup mirror.  The decomposed plant suffix is rebuilt
    with chr() codepoints so the SQL text stays ASCII-safe; both plants
    interpolate from the implementation constants."""
    from prlib_ray.stages import dedup as dd

    nfc = _sql_lit(dd.UNI_SUFFIX_NFC)
    nfd = _sql_lit(dd.UNI_SUFFIX_NFD)
    return f"""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + {dd.PLANT_UNI_OFFSET_NFC}, text || {nfc}
  FROM documents WHERE doc_id < {dd.N_PLANT_NORM}
  UNION ALL SELECT doc_id + {dd.PLANT_UNI_OFFSET_NFD}, text || {nfd}
  FROM documents WHERE doc_id < {dd.N_PLANT_NORM}
)
SELECT md5(nfc_normalize(text)) AS h,
       min(doc_id) AS doc_id,
       count(*) AS n_docs
FROM aug GROUP BY 1
"""


UNICODE_DEDUP = _unicode_dedup_sql()


def _edit_distance_sql() -> str:
    """Candidate pairs = NGRAM_JACCARD's exact CTE chain over the
    edit-plant-augmented bounded corpus; distances via levenshtein()
    (char-level — equal to the engine's byte DP on this ASCII corpus)."""
    from prlib_ray.stages import dedup as dd

    return f"""
WITH base AS (SELECT doc_id, text FROM documents
              WHERE doc_id < {dd.MAX_PAIR_ID}),
aug AS (
  SELECT doc_id, text FROM base
  UNION ALL
  SELECT doc_id + {dd.PLANT_EDIT_OFFSET},
         '{dd.EDIT_VARIANT_WORD}' ||
         substr(text, length(string_split(text, ' ')[1]) + 1)
  FROM base WHERE doc_id < {dd.N_PLANT_EDIT}
),
words AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM aug
),
nz AS (
    SELECT doc_id, w, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
    FROM words WHERE w <> ''
),
sh AS (
    SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
    FROM nz a
    JOIN nz b ON a.doc_id = b.doc_id AND b.j = a.j + 1
    JOIN nz c ON a.doc_id = c.doc_id AND c.j = a.j + 2
),
ds AS (SELECT DISTINCT doc_id, s FROM sh),
sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
inter AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS c
    FROM ds x JOIN ds y ON x.s = y.s AND x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id
),
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sizes sa ON i.doc_a = sa.doc_id
  JOIN sizes sb ON i.doc_b = sb.doc_id
  WHERE sa.n + sb.n - i.c > 0 AND 5 * i.c >= sa.n + sb.n - i.c
)
SELECT p.doc_a, p.doc_b,
       CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS dist,
       CAST(1000 * levenshtein(ta.text, tb.text)
            // greatest(length(ta.text), length(tb.text), 1)
            AS BIGINT) AS near_permille
FROM pairs p
JOIN aug ta ON ta.doc_id = p.doc_a
JOIN aug tb ON tb.doc_id = p.doc_b
"""


EDIT_DISTANCE_PAIRS = _edit_distance_sql()


def _utf8_hygiene_sql() -> str:
    """Per-source mojibake audit mirror: plants, RE2 patterns and the
    replacement-char literal all interpolate from the implementation
    module (patterns are RE2 on BOTH sides — pyarrow and DuckDB)."""
    from prlib_ray.stages import text_analysis as ta

    n = ta.N_PLANT_HYG
    plant = "\n".join(
        f"  UNION ALL SELECT source, text || {_sql_lit(sfx)} "
        f"FROM documents WHERE doc_id < {n}"
        for sfx in (ta.HYG_SUFFIX_CTRL, ta.HYG_SUFFIX_REPL,
                    ta.HYG_SUFFIX_ACC)
    )
    return f"""
WITH aug AS (
  SELECT source, text FROM documents
{plant}
)
SELECT source, count(*) AS n_docs,
  CAST(sum(CASE WHEN regexp_matches(text, '{ta.HYG_CTRL_RE}')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl,
  CAST(sum(CASE WHEN position({_sql_lit(ta.HYG_SUFFIX_REPL)} IN text) > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_repl,
  CAST(sum(CASE WHEN regexp_matches(text, '{ta.HYG_NONASCII_RE}')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_nonascii
FROM aug GROUP BY source ORDER BY source
"""


UTF8_HYGIENE = _utf8_hygiene_sql()


def _mmr_diversified_sql() -> str:
    """Mirror of similarity.mmr_diversified_topk: the shared scored/
    ranked chain picks the MMR_CAND relevance shortlist vs anchor
    vec_id 0, a second (suffix 'p') chain scores candidate pairs, and
    MMR_K unrolled selection CTEs replay the greedy argmax — objective
    DESC, vec_id ASC, first pick pure relevance."""
    from prlib_ray.stages.similarity import (MMR_CAND, MMR_DIV_W, MMR_K,
                                             MMR_REL_W)

    steps = [f"""
s1 AS (SELECT CAST(1 AS BIGINT) AS rank, vec_id, rel,
              CAST({MMR_REL_W} AS BIGINT) * rel AS obj
       FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
sel1 AS (SELECT vec_id FROM s1)"""]
    for t in range(2, MMR_K + 1):
        steps.append(f"""
s{t} AS (SELECT CAST({t} AS BIGINT) AS rank, c.vec_id, c.rel,
              {MMR_REL_W} * c.rel - {MMR_DIV_W} * (
                  SELECT max(p.score) FROM scoredp p
                  WHERE p.query_id = c.vec_id
                    AND p.vec_id IN (SELECT vec_id FROM sel{t - 1})
              ) AS obj
       FROM cand c
       WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{t - 1})
       ORDER BY obj DESC, c.vec_id LIMIT 1),
sel{t} AS (SELECT vec_id FROM sel{t - 1}
           UNION ALL SELECT vec_id FROM s{t})""")
    union = "\nUNION ALL ".join(
        f"SELECT * FROM s{t}" for t in range(1, MMR_K + 1))
    return ("""
WITH q AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) AS i,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS qv
    FROM embeddings
),
norms AS (SELECT vec_id, sum(qv * qv) AS nn FROM q GROUP BY vec_id),
dots AS (
    SELECT a.vec_id AS query_id, b.vec_id AS vec_id, sum(a.qv * b.qv) AS dot
    FROM q a JOIN q b ON a.i = b.i AND a.vec_id = 0 AND b.vec_id <> 0
    GROUP BY a.vec_id, b.vec_id
)"""
        + _scored_ranked_ctes("dots")
        + f""",
cand AS MATERIALIZED (
    SELECT vec_id, score AS rel FROM ranked WHERE rn <= {MMR_CAND}),
normsp AS (SELECT * FROM norms),
qc AS MATERIALIZED (
    -- restrict to shortlist vectors BEFORE the pairwise self-join
    -- (joining the full unnested table first is corpus-quadratic)
    SELECT q.* FROM q JOIN cand ON cand.vec_id = q.vec_id),
pd AS (
    SELECT a.vec_id AS query_id, b.vec_id AS vec_id, sum(a.qv * b.qv) AS dot
    FROM qc a JOIN qc b ON a.i = b.i AND a.vec_id <> b.vec_id
    GROUP BY a.vec_id, b.vec_id
)"""
        + _scored_ranked_ctes("pd", suffix="p")
        + ","
        + ",".join(steps)
        + f"""
SELECT rank, vec_id, rel, obj FROM ({union}) ORDER BY rank""")


MMR_DIVERSIFIED = _mmr_diversified_sql()


def _conv_extract_digest_sql() -> str:
    """Mirror of dataset_prep.conv_extract_digest: the per-turn
    extraction mirror (EXTRACT_TURNS_EXACT) wrapped in an ORDERED
    string_agg + md5 per conversation — SQL checks the same
    stable-turn-ordering digest the engine computes."""
    return f"""
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(length(string_agg(clean_text, chr(10) ORDER BY turn_idx))
            AS BIGINT) AS n_chars,
       md5(string_agg(clean_text, chr(10) ORDER BY turn_idx)) AS digest
FROM ({EXTRACT_TURNS_EXACT}) t
GROUP BY conv_id ORDER BY conv_id"""


CONV_EXTRACT_DIGEST = _conv_extract_digest_sql()
