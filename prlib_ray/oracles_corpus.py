"""DuckDB oracles for the corpus-statistics operators
(stages/corpus_stats.py).

Tokenization is the module's shared convention: split on single
spaces; empty tokens are dropped for the word/term ops and retained
inside n-gram windows (the same convention as oracles_prep's
decontamination 3-grams).  The Ray side operates on md5-derived window
hashes; equal windows always collide, so the string-gram SQL here is
the exact mirror (the collision assumption is pinned by a brute-force
test, tests/test_corpus_stats.py).

Shared rule constants (segment width, dup thresholds, gopher bounds,
plant knobs) interpolate from the implementation modules so the
oracles cannot silently desynchronize from the pipelines.
"""

from prlib_ray.pipelines.curate import HEAVY_PCT, PLANT_MOD, PLANT_OFFSET
from prlib_ray.stages.corpus_stats import (
    IDF_SCALE,
    SEARCH_K,
    SEARCH_TERMS,
    SEG_DUP_MIN,
    SEG_WIDTH,
)
from prlib_ray.stages.text_analysis import (
    GOPHER_MAX_MEAN_LEN,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_MEAN_LEN,
    GOPHER_MIN_STOP,
    GOPHER_MIN_WORDS,
    GOPHER_STOPWORDS,
)

_STOPS = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)

# mirrors corpus_stats.unigram_freq_score: corpus-wide word counts
# joined back per occurrence; docs with no non-empty words drop out
UNIGRAM_FREQ_SCORE = """
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
nz AS (SELECT doc_id, w FROM words WHERE w <> ''),
vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM nz GROUP BY w)
SELECT n.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(v.c) AS BIGINT) AS freq_sum,
       CAST(min(v.c) AS BIGINT) AS min_freq
FROM nz n JOIN vocab v USING (w)
GROUP BY n.doc_id ORDER BY n.doc_id"""

# mirrors corpus_stats.tfidf_top_term: argmax of tf/df per doc (N is a
# per-corpus constant, so maximizing tf/df maximizes tf-idf), ties by
# the lexically smallest term.  tf*1.0/df is the same IEEE double
# division the Ray side evaluates on exact-int operands.
TFIDF_TOP_TERM = """
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
nz AS (SELECT doc_id, w FROM words WHERE w <> ''),
tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
       FROM nz GROUP BY doc_id, w),
df AS (SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       FROM nz GROUP BY w),
s AS (
    SELECT tf.doc_id, tf.w, tf.tf, df.df,
           row_number() OVER (PARTITION BY tf.doc_id
                              ORDER BY tf.tf * 1.0 / df.df DESC, tf.w ASC)
               AS rn
    FROM tf JOIN df USING (w)
)
SELECT doc_id, w AS term, tf, df FROM s WHERE rn = 1 ORDER BY doc_id"""

# mirrors corpus_stats.dup_ngram_fraction: 8-word windows inside one
# doc (NULL-propagating || drops the short tails exactly like the Ray
# side's same-doc mask); a window is duplicated iff its gram occurs in
# >= 2 distinct docs; counts are WINDOW occurrences, not distinct grams
DUP_NGRAM_FRACTION = """
WITH words AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM documents
),
ng AS (
    SELECT doc_id,
           w || ' ' || lead(w, 1) OVER p || ' ' || lead(w, 2) OVER p
             || ' ' || lead(w, 3) OVER p || ' ' || lead(w, 4) OVER p
             || ' ' || lead(w, 5) OVER p || ' ' || lead(w, 6) OVER p
             || ' ' || lead(w, 7) OVER p AS g
    FROM words WINDOW p AS (PARTITION BY doc_id ORDER BY i)
),
v AS (SELECT doc_id, g FROM ng WHERE g IS NOT NULL),
dup AS (
    SELECT g FROM v GROUP BY g HAVING count(DISTINCT doc_id) >= 2
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(CASE WHEN g IN (SELECT g FROM dup) THEN 1 ELSE 0 END)
            AS BIGINT) AS dup_windows,
       CAST((100 * sum(CASE WHEN g IN (SELECT g FROM dup) THEN 1 ELSE 0
                       END))
            // greatest(count(*), 1) AS BIGINT) AS dup_pct
FROM v GROUP BY doc_id ORDER BY doc_id"""

# mirrors corpus_stats.dup_substring_fraction: every 40-character
# window inside a document (substr/length are CHARACTER-based, the same
# code-point counting as the Ray side's utf-32 decode); a window is
# duplicated iff its exact text occurs in >= 2 distinct docs.  Docs
# shorter than 40 chars yield an empty generate_series list and drop
# out, exactly like the Ray side's same-doc window mask.
DUP_SUBSTRING_FRACTION = """
WITH pos AS (
    SELECT doc_id, text,
           unnest(generate_series(1, length(text) - 39)) AS gs
    FROM documents
),
w AS (SELECT doc_id, substr(text, CAST(gs AS INTEGER), 40) AS s
      FROM pos),
dup AS (
    SELECT s FROM w GROUP BY s HAVING count(DISTINCT doc_id) >= 2
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(CASE WHEN s IN (SELECT s FROM dup) THEN 1 ELSE 0 END)
            AS BIGINT) AS dup_windows,
       CAST((100 * sum(CASE WHEN s IN (SELECT s FROM dup) THEN 1 ELSE 0
                       END))
            // greatest(count(*), 1) AS BIGINT) AS dup_pct
FROM w GROUP BY doc_id ORDER BY doc_id"""

# mirrors pipelines/curate.curate_corpus: the three-stage funnel over
# the deterministically augmented corpus (every doc_id % PLANT_MOD == 0
# doc duplicated at +PLANT_OFFSET — the UNION ALL below).  Stage bodies
# are re-compositions of GOPHER_QUALITY and SEGMENT_DEDUP with the SAME
# interpolated constants; the dedup stage groups passing docs by exact
# TEXT (the Ray side's md5-truncated uint64 groups collide exactly on
# equal texts).
CURATE_CORPUS = f"""
WITH docs AS (
    SELECT doc_id, text, source FROM documents
    UNION ALL
    SELECT doc_id + {PLANT_OFFSET} AS doc_id, text, source FROM documents
    WHERE doc_id % {PLANT_MOD} = 0
),
words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM docs
),
agg AS (
    SELECT doc_id,
           count(*) FILTER (WHERE w <> '') AS n_words,
           COALESCE(sum(length(w)) FILTER (WHERE w <> ''), 0)
               AS sum_word_len,
           count(*) FILTER (WHERE regexp_matches(w, '[A-Za-z]'))
               AS n_alpha,
           count(*) FILTER (WHERE w IN ({_STOPS})) AS n_stop
    FROM words GROUP BY doc_id
),
g AS (
    SELECT d.doc_id, d.source, d.text, a.n_words,
           CASE WHEN a.n_words >= {GOPHER_MIN_WORDS}
                 AND a.n_words <= {GOPHER_MAX_WORDS}
                 AND {GOPHER_MIN_MEAN_LEN} * a.n_words <= a.sum_word_len
                 AND a.sum_word_len <= {GOPHER_MAX_MEAN_LEN} * a.n_words
                 AND 5 * a.n_alpha >= 4 * a.n_words
                 AND a.n_stop >= {GOPHER_MIN_STOP}
            THEN 1 ELSE 0 END AS passes
    FROM docs d JOIN agg a USING (doc_id)
),
surv AS (
    SELECT min(doc_id) AS doc_id FROM g WHERE passes = 1 GROUP BY text
),
wi AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM docs
),
seg AS (
    SELECT doc_id, (i - 1) // {SEG_WIDTH} AS s,
           string_agg(w, ' ' ORDER BY i) AS sg,
           count(*) AS cnt
    FROM wi GROUP BY doc_id, (i - 1) // {SEG_WIDTH}
),
v AS (SELECT doc_id, sg FROM seg WHERE cnt = {SEG_WIDTH}),
dup AS (SELECT sg FROM v GROUP BY sg
        HAVING count(*) >= {SEG_DUP_MIN}),
heavy AS (
    SELECT doc_id FROM v GROUP BY doc_id
    HAVING (100 * sum(CASE WHEN sg IN (SELECT sg FROM dup)
                           THEN 1 ELSE 0 END))
           // greatest(count(*), 1) >= {HEAVY_PCT}
),
fin AS (
    SELECT s.doc_id FROM surv s
    WHERE s.doc_id NOT IN (SELECT doc_id FROM heavy)
)
SELECT g.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(g.passes) AS BIGINT) AS n_gopher,
       CAST(count(s.doc_id) AS BIGINT) AS n_dedup,
       CAST(count(f.doc_id) AS BIGINT) AS n_final,
       CAST(COALESCE(sum(g.n_words) FILTER (WHERE f.doc_id IS NOT NULL), 0)
            AS BIGINT) AS tokens_final
FROM g
LEFT JOIN surv s ON g.doc_id = s.doc_id
LEFT JOIN fin f ON g.doc_id = f.doc_id
GROUP BY g.source ORDER BY g.source"""

# mirrors corpus_stats.build_inverted_index: one posting per distinct
# (term, doc) with tf and the term's document frequency
INVERTED_INDEX = """
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
nz AS (SELECT doc_id, w FROM words WHERE w <> ''),
tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
       FROM nz GROUP BY doc_id, w),
df AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY w)
SELECT tf.w AS term, tf.doc_id, tf.tf, df.df
FROM tf JOIN df USING (w) ORDER BY term, doc_id"""

# mirrors corpus_stats.search_topk: fixed-keyword retrieval with
# integer idf weights (IDF_SCALE // df), ties to the smallest doc_id
_TERMS = ", ".join(f"'{t}'" for t in SEARCH_TERMS)

SEARCH_TOPK = f"""
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
tf AS (
    SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
    FROM words WHERE w IN ({_TERMS}) GROUP BY doc_id, w
),
df AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY w),
sc AS (
    SELECT tf.doc_id,
           CAST(sum(tf.tf * ({IDF_SCALE} // df.df)) AS BIGINT) AS score
    FROM tf JOIN df USING (w) GROUP BY tf.doc_id
)
SELECT doc_id, score FROM sc
ORDER BY score DESC, doc_id ASC LIMIT {SEARCH_K}"""

# mirrors corpus_stats.segment_dedup: disjoint SEG_WIDTH-word segments
# (empty tokens retained inside a segment, the <SEG_WIDTH-token tail
# dropped via HAVING cnt = SEG_WIDTH); a segment is removed when its
# exact text occurs >= SEG_DUP_MIN times corpus-wide (total occurrences
# — thrice in one doc also trips).  string_agg(w, ' ' ORDER BY i) is
# unambiguous because split tokens cannot contain the separator.
SEGMENT_DEDUP = f"""
WITH words AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM documents
),
seg AS (
    SELECT doc_id, (i - 1) // {SEG_WIDTH} AS s,
           string_agg(w, ' ' ORDER BY i) AS g,
           count(*) AS cnt
    FROM words GROUP BY doc_id, (i - 1) // {SEG_WIDTH}
),
v AS (SELECT doc_id, g FROM seg WHERE cnt = {SEG_WIDTH}),
dup AS (SELECT g FROM v GROUP BY g HAVING count(*) >= {SEG_DUP_MIN})
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(sum(CASE WHEN g IN (SELECT g FROM dup) THEN 1 ELSE 0 END)
            AS BIGINT) AS removed_segments,
       CAST((100 * sum(CASE WHEN g IN (SELECT g FROM dup) THEN 1 ELSE 0
                       END))
            // greatest(count(*), 1) AS BIGINT) AS removed_pct
FROM v GROUP BY doc_id ORDER BY doc_id"""


# mirrors corpus_stats.bigram_lm_score: a corpus-trained bigram table —
# term(g) = floor(LM_SCALE * c2(w1,w2) / c1(w1)) with c1 = total
# corpus occurrences of w1 — summed over each doc's bigram OCCURRENCES
# (pure positive integers; DuckDB // truncation == numpy floor here).
# Docs with < 2 non-empty words drop out (inner-join semantics).
from prlib_ray.stages.corpus_stats import LM_SCALE  # noqa: E402

BIGRAM_LM_SCORE = f"""
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM documents
),
nz AS (
    SELECT doc_id, w,
           row_number() OVER (PARTITION BY doc_id ORDER BY i) AS pos
    FROM words WHERE w <> ''
),
bg AS (
    SELECT a.doc_id, a.w || ' ' || b.w AS g, a.w AS w1
    FROM nz a JOIN nz b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
c1 AS (SELECT w, count(*) AS c1 FROM nz GROUP BY w),
c2 AS (SELECT g, w1, count(*) AS c2 FROM bg GROUP BY g, w1),
term AS (
    SELECT c2.g, ({LM_SCALE} * c2.c2) // c1.c1 AS t
    FROM c2 JOIN c1 ON c2.w1 = c1.w
)
SELECT bg.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(t) AS BIGINT) AS lm_score
FROM bg JOIN term USING (g)
GROUP BY bg.doc_id ORDER BY bg.doc_id"""


# mirrors corpus_stats.source_overlap: distinct (source, word) pairs,
# pairwise shared-word counts over ordered (string <) source pairs,
# zero-pairs kept via the cnt cross join, wordless sources absent.
SOURCE_OVERLAP = """
WITH toks AS (
    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
ws AS (SELECT DISTINCT source, w FROM toks WHERE w <> ''),
cnt AS (SELECT source, count(*) AS n FROM ws GROUP BY source),
sh AS (
    SELECT a.source AS s1, b.source AS s2, count(*) AS n
    FROM ws a JOIN ws b ON a.w = b.w AND a.source < b.source
    GROUP BY a.source, b.source
)
SELECT ca.source AS s1, cb.source AS s2,
       CAST(COALESCE(sh.n, 0) AS BIGINT) AS shared,
       CAST(ca.n AS BIGINT) AS n1, CAST(cb.n AS BIGINT) AS n2
FROM cnt ca
JOIN cnt cb ON ca.source < cb.source
LEFT JOIN sh ON sh.s1 = ca.source AND sh.s2 = cb.source
ORDER BY s1, s2"""


def _vocab_oov_sql() -> str:
    """Mirror of corpus_stats.vocab_oov_rate: top-OOV_VOCAB words by
    (count DESC, word ASC), per-source token/OOV counts over nonempty
    words; the V interpolates from the implementation module."""
    from prlib_ray.stages.corpus_stats import OOV_VOCAB

    return f"""
WITH toks AS (
    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
nz AS (SELECT source, w FROM toks WHERE w <> ''),
cnt AS (SELECT w, count(*) AS n FROM nz GROUP BY w),
vocab AS (SELECT w FROM cnt ORDER BY n DESC, w LIMIT {OOV_VOCAB})
SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(*) FILTER (WHERE w NOT IN (SELECT w FROM vocab))
            AS BIGINT) AS n_oov
FROM nz GROUP BY source ORDER BY source"""


VOCAB_OOV_RATE = _vocab_oov_sql()


def _source_minhash_sql() -> str:
    """Mirror of corpus_stats.source_minhash_jaccard: the dedup family's
    proven (a*x+b) mod (2^61-1) HUGEINT permutation chain (see
    oracles_data._minhash_banding_ctes) keyed by source over the
    big-endian md5 word ids; every word-having source pair appears,
    n_match counts seed agreements."""
    from prlib_ray.oracles_data import _byteswap8
    from prlib_ray.stages.dedup import _A, _B, MERSENNE

    vals = ",\n           ".join(
        f"({h},{int(a)},{int(b)})" for h, (a, b) in enumerate(zip(_A, _B))
    )
    swap = _byteswap8("md5_number_upper(g)")
    return f"""
WITH words AS (
    SELECT source, doc_id, unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM documents
),
nz AS (
    SELECT source, doc_id, w,
           row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
    FROM words WHERE w <> ''
),
ws AS (
    SELECT DISTINCT a.source, a.w || ' ' || b.w AS g
    FROM nz a JOIN nz b ON a.doc_id = b.doc_id AND b.j = a.j + 1
),
sid AS (SELECT source, {swap} AS id FROM ws),
params(h, a, b) AS (VALUES {vals}),
mh AS (
    SELECT source, p.h,
           min((p.a::HUGEINT * (id % {MERSENNE}) + p.b) % {MERSENNE}) AS mh
    FROM sid CROSS JOIN params p GROUP BY source, p.h
)
SELECT a.source AS s1, b.source AS s2,
       CAST(count(*) FILTER (WHERE a.mh = b.mh) AS BIGINT) AS n_match
FROM mh a JOIN mh b ON a.h = b.h AND a.source < b.source
GROUP BY a.source, b.source ORDER BY s1, s2"""


SOURCE_MINHASH_JACCARD = _source_minhash_sql()


def _cms_word_frequency_sql() -> str:
    """Exact mirror of corpus_stats.cms_word_frequency: the same md5
    double-hash positions (bloom's byteswap contract, pre-reduced mod W
    so the j*h2 ladder cannot wrap), the full D x W counter table as a
    (j, pos) group-by, and min-over-rows estimates for the exact top-K
    words (count DESC, word ASC ties)."""
    from prlib_ray.oracles_data import _byteswap8
    from prlib_ray.stages.corpus_stats import CMS_D, CMS_TOP, CMS_W

    h1 = _byteswap8("md5_number_upper('cm1:' || w)")
    h2 = _byteswap8("md5_number_upper('cm2:' || w)")
    return f"""
WITH words AS (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
wc AS (
    SELECT w, CAST(count(*) AS BIGINT) AS n
    FROM words WHERE w != '' GROUP BY w
),
h AS (
    SELECT w, n, {h1} % {CMS_W} AS h1, {h2} % {CMS_W} AS h2 FROM wc
),
js AS (SELECT unnest(generate_series(0, {CMS_D - 1})) AS j),
counter AS (
    SELECT j.j AS j, (h.h1 + j.j * h.h2) % {CMS_W} AS pos, sum(h.n) AS c
    FROM h CROSS JOIN js j GROUP BY 1, 2
),
top AS (SELECT w, n, h1, h2 FROM h ORDER BY n DESC, w ASC LIMIT {CMS_TOP}),
est AS (
    SELECT t.w, t.n, min(c.c) AS n_est
    FROM top t CROSS JOIN js j
    JOIN counter c ON c.j = j.j AND c.pos = (t.h1 + j.j * t.h2) % {CMS_W}
    GROUP BY 1, 2
)
SELECT w, n AS n_exact, CAST(n_est AS BIGINT) AS n_est
FROM est ORDER BY w"""


CMS_WORD_FREQUENCY = _cms_word_frequency_sql()


# mirrors corpus_stats.length_rank_transform: n_smaller == rank()-1
# (strictly-shorter count under ties)
LENGTH_RANK_TRANSFORM = """
SELECT doc_id, n_chars,
       CAST(rank() OVER (ORDER BY n_chars) - 1 AS BIGINT) AS n_smaller
FROM documents ORDER BY doc_id"""


def _pmi_top_pairs_sql() -> str:
    """Mirror of corpus_stats.pmi_top_pairs: top-V vocab (the VOCAB_OOV
    head contract), DISTINCT doc-word presence, pair co-occurrence via
    self-join, score = floor(n_ab * N * SCALE / (n_a * n_b)) in HUGEINT
    (all positive, so // truncation == floor); constants interpolate
    from the implementation module."""
    from prlib_ray.stages.corpus_stats import (PMI_K, PMI_MIN_COOC,
                                               PMI_SCALE, PMI_VOCAB)

    return f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
nz AS (SELECT doc_id, w FROM toks WHERE w <> ''),
cnt AS (SELECT w, count(*) AS n FROM nz GROUP BY w),
vocab AS (SELECT w FROM cnt ORDER BY n DESC, w LIMIT {PMI_VOCAB}),
d AS (SELECT DISTINCT doc_id, w FROM nz JOIN vocab USING (w)),
df AS (SELECT w, count(*) AS n FROM d GROUP BY w),
nn AS (SELECT count(*) AS n FROM documents),
pairs AS (
    SELECT a.w AS wa, b.w AS wb, CAST(count(*) AS BIGINT) AS n_ab
    FROM d a JOIN d b ON a.doc_id = b.doc_id AND a.w < b.w
    GROUP BY 1, 2 HAVING count(*) >= {PMI_MIN_COOC}
)
SELECT p.wa, p.wb, p.n_ab,
       CAST((CAST(p.n_ab AS HUGEINT) * (SELECT n FROM nn) * {PMI_SCALE})
            // (CAST(fa.n AS HUGEINT) * fb.n) AS BIGINT) AS score
FROM pairs p
JOIN df fa ON fa.w = p.wa
JOIN df fb ON fb.w = p.wb
ORDER BY score DESC, p.wa, p.wb LIMIT {PMI_K}"""


PMI_TOP_PAIRS = _pmi_top_pairs_sql()


def _tokenizer_budget_sql() -> str:
    """Mirror of corpus_stats.tokenizer_budget_curve: the vocab head
    contract (count DESC, word ASC row_number) cut at each candidate
    size; OOV tokens = total minus the head's count mass, OOV types =
    distinct words beyond the head."""
    from prlib_ray.stages.corpus_stats import TOK_CURVE_SIZES

    vals = ", ".join(f"({v})" for v in TOK_CURVE_SIZES)
    return f"""
WITH toks AS (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
nz AS (SELECT w FROM toks WHERE w <> ''),
cnt AS (SELECT w, count(*) AS n FROM nz GROUP BY w),
ranked AS (SELECT w, n, row_number() OVER (ORDER BY n DESC, w) AS rn
           FROM cnt),
tot AS (SELECT count(*) AS n_tok, count(DISTINCT w) AS n_typ FROM nz),
sizes(v) AS (VALUES {vals})
SELECT CAST(s.v AS BIGINT) AS vocab_size,
       CAST((SELECT n_tok FROM tot)
            - coalesce((SELECT sum(n) FROM ranked WHERE rn <= s.v), 0)
            AS BIGINT) AS n_oov_tokens,
       CAST(greatest((SELECT n_typ FROM tot) - s.v, 0) AS BIGINT)
           AS n_oov_types
FROM sizes s ORDER BY vocab_size"""


TOKENIZER_BUDGET_CURVE = _tokenizer_budget_sql()


def _source_word_lift_sql() -> str:
    """Mirror of corpus_stats.source_word_lift: exact integer lift
    floor(n_sw * N * SCALE / (n_s * n_w)) in HUGEINT (all positive, //
    truncation == floor), per-source row_number (score DESC, w ASC) cut
    at K; constants interpolate from the implementation module."""
    from prlib_ray.stages.corpus_stats import LIFT_K, LIFT_SCALE

    return f"""
WITH toks AS (
    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
nz AS (SELECT source, w FROM toks WHERE w <> ''),
n_sw AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
         FROM nz GROUP BY 1, 2),
n_w AS (SELECT w, count(*) AS c FROM nz GROUP BY w),
n_s AS (SELECT source, count(*) AS c FROM nz GROUP BY source),
nn AS (SELECT count(*) AS c FROM nz),
scored AS (
    SELECT sw.source, sw.w, sw.c AS n_sw,
           CAST((CAST(sw.c AS HUGEINT) * (SELECT c FROM nn)
                 * {LIFT_SCALE})
                // (CAST(ns.c AS HUGEINT) * nw.c) AS BIGINT) AS score
    FROM n_sw sw
    JOIN n_w nw USING (w)
    JOIN n_s ns USING (source)
),
ranked AS (
    SELECT source, w, n_sw, score,
           row_number() OVER (PARTITION BY source
                              ORDER BY score DESC, w ASC) AS rn
    FROM scored
)
SELECT source, w, n_sw, score FROM ranked WHERE rn <= {LIFT_K}
ORDER BY source, w"""


SOURCE_WORD_LIFT = _source_word_lift_sql()


def _cluster_top_terms_sql() -> str:
    """Mirror of corpus_stats.cluster_top_terms: the SHARED assignment
    CTEs (oracles_data.sem_assignment_ctes — one definition across
    oracles) INNER-join documents on vec_id = doc_id, then the
    SOURCE_WORD_LIFT scoring CTEs keyed by cluster."""
    from prlib_ray.oracles_data import sem_assignment_ctes
    from prlib_ray.stages.corpus_stats import LIFT_K, LIFT_SCALE

    return sem_assignment_ctes() + f""",
toks AS (
    SELECT a.cid AS cluster,
           unnest(string_split(d.text, ' ')) AS w
    FROM assign a JOIN documents d ON d.doc_id = a.vec_id
),
nz AS (SELECT cluster, w FROM toks WHERE w <> ''),
n_sw AS (SELECT cluster, w, CAST(count(*) AS BIGINT) AS c
         FROM nz GROUP BY 1, 2),
n_w AS (SELECT w, count(*) AS c FROM nz GROUP BY w),
n_s AS (SELECT cluster, count(*) AS c FROM nz GROUP BY cluster),
nn AS (SELECT count(*) AS c FROM nz),
scored AS (
    SELECT sw.cluster, sw.w, sw.c AS n_cw,
           CAST((CAST(sw.c AS HUGEINT) * (SELECT c FROM nn)
                 * {LIFT_SCALE})
                // (CAST(ns.c AS HUGEINT) * nw.c) AS BIGINT) AS score
    FROM n_sw sw
    JOIN n_w nw USING (w)
    JOIN n_s ns USING (cluster)
),
ranked AS (
    SELECT cluster, w, n_cw, score,
           row_number() OVER (PARTITION BY cluster
                              ORDER BY score DESC, w ASC) AS rn
    FROM scored
)
SELECT CAST(cluster AS BIGINT) AS cluster, w, n_cw, score
FROM ranked WHERE rn <= {LIFT_K} ORDER BY cluster, w"""


CLUSTER_TOP_TERMS = _cluster_top_terms_sql()


# Merkle-style corpus digest: per-source sorted-content-hash leaves +
# one root (mirror of corpus_stats.corpus_merkle; 'leaf:'||source
# sorts identically to source since the prefix is constant).
CORPUS_MERKLE = """
WITH leaves AS (
    SELECT source,
           md5(string_agg(md5(text), '' ORDER BY md5(text))) AS h
    FROM documents GROUP BY source
)
SELECT 'leaf:' || source AS node, h AS hash FROM leaves
UNION ALL
-- COALESCE pins the zero-leaf corpus to md5('') on both sides: the
-- engine's driver fold also emits root = md5('') over no leaves,
-- while a bare string_agg over zero rows would yield md5(NULL) = NULL
SELECT 'root', md5(COALESCE(string_agg(h, '' ORDER BY source), ''))
FROM leaves
ORDER BY node"""


def _token_budget_fill_sql() -> str:
    """Mirror of corpus_stats.token_budget_fill: the same closed-form
    water level via window prefix sums (m* = max feasible rank, cap
    from a scalar subquery)."""
    from prlib_ray.stages.corpus_stats import TOKEN_BUDGET_PERMILLE

    return f"""
WITH tok AS (
    SELECT source,
           CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+')))
                AS BIGINT) AS t
    FROM documents GROUP BY source
),
tot AS (SELECT sum(t) AS total, count(*) AS k FROM tok),
bud AS (SELECT total * {TOKEN_BUDGET_PERMILLE} // 1000 AS b FROM tot),
s AS (
    SELECT source, t,
           row_number() OVER (ORDER BY t, source) AS rn,
           sum(t) OVER (ORDER BY t, source
                        ROWS UNBOUNDED PRECEDING) AS pf
    FROM tok
),
m AS (
    SELECT COALESCE(max(rn), 0) AS m, COALESCE(max(pf), 0) AS pm
    FROM (SELECT rn, pf FROM s, tot, bud
          WHERE pf + (k - rn) * t <= b
          QUALIFY row_number() OVER (ORDER BY rn DESC) = 1)
),
cap AS (
    SELECT CASE WHEN m.m >= tot.k THEN NULL
                ELSE (bud.b - m.pm) // (tot.k - m.m) END AS c
    FROM m, tot, bud
)
SELECT s.source, s.t AS n_tokens,
       CAST(CASE WHEN cap.c IS NULL THEN s.t
                 ELSE least(s.t, cap.c) END AS BIGINT) AS allocated
FROM s, cap
ORDER BY s.source"""


TOKEN_BUDGET_FILL = _token_budget_fill_sql()
