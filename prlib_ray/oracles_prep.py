"""DuckDB oracles for the dataset-prep operators (stages/dataset_prep.py).

Every constant here must stay in lockstep with its stage: same salts,
moduli, n-gram size, token pattern, budget and chunking rules.
"""

# mirrors dataset_prep.mix_sources: keep iff the 4-hex md5 prefix sorts
# below the source's threshold ('g' > any hex char -> rate 1.0);
# thresholds cycle by the numeric source suffix mod 4
MIX_SOURCES = """
WITH d AS (
    SELECT source,
           substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 4) AS h,
           CAST(substr(source, 4) AS INTEGER) % 4 AS k
    FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN h < (CASE k WHEN 0 THEN 'g' WHEN 1 THEN 'c000'
                                WHEN 2 THEN '8000' ELSE '4000' END)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM d GROUP BY source ORDER BY source"""

# mirrors dataset_prep.shuffle_head: seeded epoch order = md5 of the
# salted doc id, first K ranked
SHUFFLE_HEAD = """
WITH h AS (
    SELECT doc_id,
           md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS h
    FROM documents
)
SELECT CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS rank, doc_id, h
FROM h ORDER BY h LIMIT 100"""

# mirrors dataset_prep.sample_per_source: per-source seeded shuffle,
# first K ranked (md5 is collision-free on these ids, so the order —
# and therefore rank — is total)
SAMPLE_PER_SOURCE = """
WITH h AS (
    SELECT source, doc_id,
           md5('sample:' || CAST(doc_id AS VARCHAR)) AS h
    FROM documents
),
r AS (
    SELECT source, doc_id, h,
           row_number() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM h
)
SELECT source, CAST(rn AS BIGINT) AS rank, doc_id, h
FROM r WHERE rn <= 10 ORDER BY source, rank"""

# mirrors dataset_prep.decontaminate: benchmark = doc_id % 97 == 0;
# a training doc is contaminated iff it shares any 3-word n-gram (split
# on single spaces, windows inside one doc) with the benchmark slice.
# NULL-propagating || drops the <3-word tails exactly like the Ray
# side's same-doc window mask.
DECONTAMINATE = """
WITH words AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM documents
),
ng AS (
    SELECT doc_id,
           w || ' ' || lead(w, 1) OVER p || ' ' || lead(w, 2) OVER p AS g
    FROM words WINDOW p AS (PARTITION BY doc_id ORDER BY i)
),
v AS (SELECT doc_id, g FROM ng WHERE g IS NOT NULL),
bench AS (SELECT DISTINCT g FROM v WHERE doc_id % 97 = 0),
conta AS (
    SELECT DISTINCT doc_id FROM v
    WHERE doc_id % 97 <> 0 AND g IN (SELECT g FROM bench)
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(c.doc_id) AS BIGINT) AS n_contaminated
FROM documents d LEFT JOIN conta c ON d.doc_id = c.doc_id
WHERE d.doc_id % 97 <> 0
GROUP BY d.source ORDER BY d.source"""

# mirrors dataset_prep.pack_sequences: global token stream in doc_id
# order, PACK_BUDGET=256-token bins, running-sum window = the exact
# prefix the Ray side computes distributed
PACK_SEQUENCES = """
WITH t AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
               AS ntok
    FROM documents
),
c AS (
    SELECT doc_id, ntok,
           COALESCE(SUM(ntok) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS tok_start
    FROM t
)
SELECT doc_id,
       CAST(tok_start AS BIGINT) AS tok_start,
       CAST(tok_start // 256 AS BIGINT) AS first_bin,
       CAST(CASE WHEN ntok = 0 THEN 0
                 ELSE (tok_start + ntok - 1) // 256 - tok_start // 256 + 1
            END AS BIGINT) AS n_bins
FROM c ORDER BY doc_id"""

# mirrors dataset_prep.chunk_tokens: overlapping 128-token windows at
# stride 96; greatest(0, ·) makes the trunc-vs-floor division question
# moot for short docs (both sides land on one chunk)
CHUNK_TOKENS = """
WITH t AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
               AS ntok
    FROM documents
),
n AS (
    SELECT doc_id, ntok,
           CASE WHEN ntok = 0 THEN 0
                ELSE 1 + greatest(0, (ntok - 128 + 95) // 96)
           END AS nc
    FROM t
),
sel AS (
    SELECT doc_id, ntok,
           unnest(generate_series(0, CAST(nc - 1 AS BIGINT))) AS i
    FROM n WHERE nc > 0
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(i * 96 AS BIGINT) AS tok_lo,
       CAST(least(i * 96 + 128, ntok) AS BIGINT) AS tok_hi
FROM sel ORDER BY doc_id, chunk_idx"""

# mirrors dataset_prep.pii_scan, including the deterministic PII
# augmentation (the raw corpus has no PII-shaped strings — without the
# planted tails this check would be vacuous); RE2 both sides, email
# stripped before phone in the redaction-length pass
PII_SCAN = """
WITH a AS (
    SELECT source,
           text
           || CASE WHEN doc_id % 7 = 0
                   THEN ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com now'
                   ELSE '' END
           || CASE WHEN doc_id % 11 = 0 THEN ' call 555-0199' ELSE '' END
               AS t
    FROM documents
),
m AS (
    SELECT source,
           CAST(len(regexp_extract_all(t, '[A-Za-z0-9._]+@[A-Za-z0-9.]+'))
                AS BIGINT) AS ne,
           CAST(len(regexp_extract_all(t, '555-[0-9]{4}')) AS BIGINT) AS np,
           CAST(length(t) - length(
                regexp_replace(
                    regexp_replace(t, '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '', 'g'),
                    '555-[0-9]{4}', '', 'g')) AS BIGINT) AS nr
    FROM a
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN ne + np > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_docs_with_pii,
       CAST(sum(ne) AS BIGINT) AS n_email,
       CAST(sum(np) AS BIGINT) AS n_phone,
       CAST(sum(nr) AS BIGINT) AS n_chars_redacted
FROM m GROUP BY source ORDER BY source"""

# mirrors dataset_prep.length_filter_p95: exact p95 = token count at
# 0-based sorted index (95*(N-1))//100
LENGTH_FILTER_P95 = """
WITH t AS (
    SELECT source,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
               AS ntok
    FROM documents
),
p AS (
    SELECT min(ntok) AS p95 FROM (
        SELECT ntok,
               row_number() OVER (ORDER BY ntok) AS rn,
               count(*) OVER () AS n
        FROM t
    ) WHERE rn = 1 + (95 * (n - 1)) // 100
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN ntok > (SELECT p95 FROM p) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_long,
       CAST((SELECT p95 FROM p) AS BIGINT) AS p95_tokens
FROM t GROUP BY source ORDER BY source"""

# mirrors dataset_prep.source_term_stats: per-source vocabulary profile
SOURCE_TERM_STATS = """
WITH words AS (
    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
tc AS (
    SELECT source, w, count(*) AS c FROM words WHERE w <> ''
    GROUP BY source, w
)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n_words,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(max(c) AS BIGINT) AS top_count
FROM tc GROUP BY source ORDER BY source"""


# mirrors dataset_prep.weighted_sample: smallest-K integer priority keys
# floor(h32 * 10^6 / n_chars); h32 = first 8 md5-hex chars as uint32
# (CAST('0x…' AS UBIGINT)); pure int64 arithmetic on both sides
WEIGHTED_SAMPLE = """
WITH t AS (
    SELECT doc_id, n_chars,
           CAST(CAST('0x' || substr(md5('wsample:' ||
                    CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT) AS BIGINT)
             * 1000000 // greatest(n_chars, 1) AS key
    FROM documents
)
SELECT CAST(row_number() OVER (ORDER BY key, doc_id) AS BIGINT) AS rank,
       doc_id, key, CAST(n_chars AS BIGINT) AS n_chars
FROM t ORDER BY key, doc_id LIMIT 100"""


# mirrors dataset_prep.frequent_ngrams: 3-word grams (empty tokens kept
# inside windows, NULL-propagating || drops short tails) occurring at
# least FREQ_NGRAM_T (=5) times corpus-wide
FREQUENT_NGRAMS = """
WITH words AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM documents
),
ng AS (
    SELECT doc_id,
           w || ' ' || lead(w, 1) OVER p || ' ' || lead(w, 2) OVER p AS g
    FROM words WINDOW p AS (PARTITION BY doc_id ORDER BY i)
),
v AS (SELECT g FROM ng WHERE g IS NOT NULL)
SELECT g AS gram, CAST(count(*) AS BIGINT) AS n_count
FROM v GROUP BY g HAVING count(*) >= 5
ORDER BY gram"""


# mirrors dataset_prep.heavy_hitter_words: the Misra-Gries sketch is a
# candidate generator with NO false negatives above the threshold, and
# the rescan replaces estimates with exact counts — so the oracle is a
# plain GROUP BY ... HAVING count >= total_words // MG_T_DIV.
from prlib_ray.stages.dataset_prep import MG_T_DIV  # noqa: E402

HEAVY_HITTER_WORDS = f"""
WITH words AS (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
nz AS (SELECT w FROM words WHERE w <> '')
SELECT w, CAST(count(*) AS BIGINT) AS n
FROM nz GROUP BY w
HAVING count(*) >= (SELECT count(*) FROM nz) // {MG_T_DIV}
ORDER BY w"""


# mirrors dataset_prep.pii_redact: same augmentation, email replaced
# BEFORE phone (order is contractual); n_redacted_chars is pii_scan's
# removal metric (''-replacement length delta) so the paired ops
# cross-check; md5 of the [EMAIL]/[PHONE]-token text proves the
# transform byte-exact
PII_REDACT = """
WITH a AS (
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 7 = 0
                   THEN ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com now'
                   ELSE '' END
           || CASE WHEN doc_id % 11 = 0 THEN ' call 555-0199' ELSE '' END
               AS t
    FROM documents
),
r AS (
    SELECT doc_id, t,
           regexp_replace(
               regexp_replace(t, '[A-Za-z0-9._]+@[A-Za-z0-9.]+',
                              '[EMAIL]', 'g'),
               '555-[0-9]{4}', '[PHONE]', 'g') AS red,
           regexp_replace(
               regexp_replace(t, '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '', 'g'),
               '555-[0-9]{4}', '', 'g') AS gone
    FROM a
)
SELECT doc_id,
       CAST(length(t) - length(gone) AS BIGINT) AS n_redacted_chars,
       md5(red) AS redacted_md5
FROM r ORDER BY doc_id"""


def _snapshot_diff_sql() -> str:
    """Mirror of dataset_prep.snapshot_diff: the two snapshots as CTEs
    over the SAME mod rules (constants interpolate from the stage
    module so a rule change cannot desynchronize the mirror), a FULL
    OUTER JOIN on id, status by presence + md5 equality."""
    from prlib_ray.oracles_data import _sql_lit
    from prlib_ray.stages.dataset_prep import (
        SNAP_ADDED_MOD, SNAP_ADDED_RES, SNAP_CHANGED_MOD, SNAP_CHANGED_RES,
        SNAP_REMOVED_MOD, SNAP_REMOVED_RES, SNAP_REMOVED_OFF,
        SNAP_REV_SUFFIX)

    return f"""
WITH newv AS (
    SELECT doc_id AS id, source,
           md5(CASE WHEN doc_id % {SNAP_CHANGED_MOD} = {SNAP_CHANGED_RES}
                    THEN text || {_sql_lit(SNAP_REV_SUFFIX)}
                    ELSE text END) AS h
    FROM documents
),
oldv AS (
    SELECT doc_id AS id, source, md5(text) AS h FROM documents
    WHERE doc_id % {SNAP_ADDED_MOD} <> {SNAP_ADDED_RES}
    UNION ALL
    SELECT doc_id + {SNAP_REMOVED_OFF} AS id, source, md5(text) AS h
    FROM documents WHERE doc_id % {SNAP_REMOVED_MOD} = {SNAP_REMOVED_RES}
),
j AS (
    SELECT coalesce(n.source, o.source) AS source,
           CASE WHEN o.id IS NULL THEN 'added'
                WHEN n.id IS NULL THEN 'removed'
                WHEN n.h <> o.h THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM newv n FULL OUTER JOIN oldv o ON n.id = o.id
)
SELECT source, status, CAST(count(*) AS BIGINT) AS n
FROM j GROUP BY 1, 2 ORDER BY 1, 2"""


SNAPSHOT_DIFF = _snapshot_diff_sql()


def _edge_arms_sql(*, with_deg: bool) -> str:
    """THE one SQL definition of the synthesized closed link graph
    (deg(i) = 1 + i %% 3, dst = (i*m_j + a_j) %% N), consumed by the
    PageRank AND anchor-text mirrors; the engine twin is
    graph.iter_out_edges.  Expects a CTE ``nn(n)`` in scope."""
    from prlib_ray.stages.graph import PR_ADD, PR_MULT

    deg = "1 + doc_id % 3 AS deg,\n           " if with_deg else ""
    arms = []
    for j, (m, a) in enumerate(zip(PR_MULT, PR_ADD)):
        where = f"\n    WHERE doc_id % 3 >= {j}" if j else ""
        arms.append(
            f"SELECT doc_id AS src, {deg}"
            f"(doc_id * {m} + {a}) % (SELECT n FROM nn) AS dst\n"
            f"    FROM documents{where}"
        )
    return "\n    UNION ALL\n    ".join(arms)


def _pagerank_ctes() -> tuple[str, str]:
    """(WITH-clause body, final rank CTE name) of the PageRank mirror —
    the synthesized closed link graph as an edge CTE (constants
    interpolate from the stage module), PR_ITERS unrolled MATERIALIZED
    iteration CTEs (DuckDB re-expands a non-materialized chain
    exponentially — the IVF-training lesson), floor division exact on
    both engines (all values non-negative).  Composed by PAGERANK_DOCS
    and the web_curate funnel mirror."""
    from prlib_ray.stages.graph import (
        PR_BASE, PR_DAMP_DEN, PR_DAMP_NUM, PR_ITERS, PR_SCALE)

    edges = _edge_arms_sql(with_deg=True)
    iters = []
    for t in range(1, PR_ITERS + 1):
        iters.append(f"""
r{t} AS MATERIALIZED (
    SELECT d.doc_id AS node,
           CAST({PR_BASE} + coalesce(
               SUM(({PR_DAMP_NUM} * r.r) // ({PR_DAMP_DEN} * e.deg)), 0)
               AS BIGINT) AS r
    FROM documents d
    LEFT JOIN e ON e.dst = d.doc_id
    LEFT JOIN r{t - 1} r ON r.node = e.src
    GROUP BY d.doc_id
)""")
    body = f"""
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
e AS MATERIALIZED (
    {edges}
),
r0 AS MATERIALIZED (
    SELECT doc_id AS node, CAST({PR_SCALE} AS BIGINT) AS r FROM documents
),{",".join(iters)}"""
    return body, f"r{PR_ITERS}"


def _pagerank_docs_sql() -> str:
    """Mirror of stages/graph.pagerank_docs: the shared rank chain +
    the (rank DESC, doc_id ASC) top-k tail."""
    from prlib_ray.stages.graph import PR_TOPK

    body, final = _pagerank_ctes()
    return f"""{body}
SELECT node AS doc_id, r AS pr FROM {final}
ORDER BY pr DESC, doc_id ASC LIMIT {PR_TOPK}"""


PAGERANK_DOCS = _pagerank_docs_sql()


def _conv_structure_audit_sql() -> str:
    """Mirror of dataset_prep.conv_structure_audit: the same transcript
    synthesis (conv = doc_id % EXACT_NCONV, turn order = doc_id) and the
    same md5-hex role rule; adjacency via LAG over the conv window."""
    from prlib_ray.stages.boilerplate import EXACT_NCONV
    from prlib_ray.stages.dataset_prep import (
        CONV_ROLE_B1, CONV_ROLE_B2, CONV_ROLE_SALT)

    return f"""
WITH t AS (
    SELECT doc_id % {EXACT_NCONV} AS conv_id, doc_id,
           CASE WHEN substr(md5('{CONV_ROLE_SALT}'
                             || CAST(doc_id AS VARCHAR)), 1, 2)
                     < '{CONV_ROLE_B1}' THEN 0
                WHEN substr(md5('{CONV_ROLE_SALT}'
                             || CAST(doc_id AS VARCHAR)), 1, 2)
                     < '{CONV_ROLE_B2}' THEN 1
                ELSE 2 END AS role,
           length(text) AS chars
    FROM documents
),
a AS (
    SELECT conv_id, role, chars,
           CASE WHEN role = lag(role) OVER
                (PARTITION BY conv_id ORDER BY doc_id)
                THEN 1 ELSE 0 END AS v
    FROM t
)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(v) AS BIGINT) AS n_role_violations,
       CAST(sum(CASE WHEN role = 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_tool_turns,
       CAST(sum(chars) AS BIGINT) AS total_chars,
       CAST(max(chars) AS BIGINT) AS max_turn_chars
FROM a GROUP BY conv_id ORDER BY conv_id"""


CONV_STRUCTURE_AUDIT = _conv_structure_audit_sql()


def _anchor_text_stats_sql() -> str:
    """Mirror of stages/graph.anchor_text_stats: the same edge CTE as
    PAGERANK_DOCS joined to each SOURCE's anchor length (first
    ANCHOR_WORDS space-split parts re-joined by ' '), LEFT JOIN so
    zero-inlink pages emit a zero row."""
    from prlib_ray.stages.graph import ANCHOR_WORDS

    edges = _edge_arms_sql(with_deg=False)
    return f"""
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
a AS (
    SELECT doc_id,
           CAST(length(array_to_string(
               string_split(text, ' ')[1:{ANCHOR_WORDS}], ' '))
               AS BIGINT) AS alen
    FROM documents
),
e AS (
    {edges}
),
g AS (
    SELECT e.dst,
           CAST(count(*) AS BIGINT) AS n_inlinks,
           CAST(count(DISTINCT e.src) AS BIGINT) AS n_sources,
           CAST(sum(a.alen) AS BIGINT) AS sum_anchor_chars
    FROM e JOIN a ON a.doc_id = e.src
    GROUP BY e.dst
)
SELECT d.doc_id,
       coalesce(g.n_inlinks, 0) AS n_inlinks,
       coalesce(g.n_sources, 0) AS n_sources,
       coalesce(g.sum_anchor_chars, 0) AS sum_anchor_chars
FROM documents d LEFT JOIN g ON g.dst = d.doc_id
ORDER BY d.doc_id"""


ANCHOR_TEXT_STATS = _anchor_text_stats_sql()


def _web_curate_sql() -> str:
    """Mirror of pipelines/curate.web_curate: the shared PageRank rank
    chain (_pagerank_ctes — the 'same graph' contract), in-edge counts
    straight off ITS e CTE (parallel edges count, exactly like the
    engine's per-batch edge partials), the Gopher pass expression with
    interpolated rule constants, and the per-source funnel."""
    from prlib_ray.oracles_data import _GOPHER_STOP_LIST
    from prlib_ray.pipelines.curate import WEB_MIN_INLINKS, WEB_PRIOR_MIN
    from prlib_ray.stages.text_analysis import (
        GOPHER_MAX_MEAN_LEN, GOPHER_MAX_WORDS, GOPHER_MIN_MEAN_LEN,
        GOPHER_MIN_STOP, GOPHER_MIN_WORDS)

    body, final = _pagerank_ctes()
    return f"""{body},
inl AS (SELECT dst, CAST(count(*) AS BIGINT) AS n_in FROM e GROUP BY dst),
w2 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
a2 AS (
    SELECT doc_id,
           count(*) FILTER (WHERE w <> '') AS n_words,
           COALESCE(sum(length(w)) FILTER (WHERE w <> ''), 0)
               AS sum_word_len,
           count(*) FILTER (WHERE regexp_matches(w, '[A-Za-z]'))
               AS n_alpha,
           count(*) FILTER (WHERE w IN ({_GOPHER_STOP_LIST})) AS n_stop
    FROM w2 GROUP BY doc_id
),
gg AS (
    SELECT doc_id,
           CASE WHEN n_words >= {GOPHER_MIN_WORDS}
                 AND n_words <= {GOPHER_MAX_WORDS}
                 AND {GOPHER_MIN_MEAN_LEN} * n_words <= sum_word_len
                 AND sum_word_len <= {GOPHER_MAX_MEAN_LEN} * n_words
                 AND 5 * n_alpha >= 4 * n_words
                 AND n_stop >= {GOPHER_MIN_STOP}
            THEN 1 ELSE 0 END AS passes
    FROM a2
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(gg.passes) AS BIGINT) AS n_gopher,
       CAST(sum(CASE WHEN gg.passes = 1 AND rr.r >= {WEB_PRIOR_MIN}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_prior,
       CAST(sum(CASE WHEN gg.passes = 1 AND rr.r >= {WEB_PRIOR_MIN}
                      AND coalesce(inl.n_in, 0) >= {WEB_MIN_INLINKS}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_final
FROM documents d
JOIN gg ON gg.doc_id = d.doc_id
JOIN {final} rr ON rr.node = d.doc_id
LEFT JOIN inl ON inl.dst = d.doc_id
GROUP BY d.source ORDER BY d.source"""


WEB_CURATE = _web_curate_sql()


def _pagerank_mass_audit_sql() -> str:
    """Mirror of stages/graph.pagerank_mass_audit: one aggregate row per
    iteration CTE of the SHARED rank chain (r0 included)."""
    from prlib_ray.stages.graph import PR_ITERS

    body, _ = _pagerank_ctes()
    arms = "\nUNION ALL ".join(
        f"SELECT CAST({t} AS BIGINT) AS iteration,"
        f" CAST(sum(r) AS BIGINT) AS total_mass,"
        f" CAST(max(r) AS BIGINT) AS max_rank,"
        f" CAST(count(*) AS BIGINT) AS n_nodes FROM r{t}"
        for t in range(0, PR_ITERS + 1))
    return f"""{body}
SELECT * FROM ({arms}) ORDER BY iteration"""


PAGERANK_MASS_AUDIT = _pagerank_mass_audit_sql()


def _crawl_frontier_depth_sql() -> str:
    """Mirror of stages/graph.crawl_frontier_depth: the shared edge
    arms, the deterministic seed set, and BFS_ITERS unrolled
    MATERIALIZED min-merge hops — each hop expands ONLY the frontier
    (d = t-1), the same provably-equivalent restriction the engine
    uses, so both sides compute the identical plan."""
    from prlib_ray.stages.graph import BFS_ITERS, BFS_SEED_MOD

    edges = _edge_arms_sql(with_deg=False)
    iters = []
    for t in range(1, BFS_ITERS + 1):
        iters.append(f"""
d{t} AS MATERIALIZED (
    SELECT node, MIN(d) AS d FROM (
        SELECT node, d FROM d{t - 1}
        UNION ALL
        SELECT e.dst AS node, CAST({t} AS BIGINT) AS d
        FROM e JOIN d{t - 1} f ON e.src = f.node AND f.d = {t - 1}
    ) u
    GROUP BY node
)""")
    return f"""
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
e AS MATERIALIZED (
    {edges}
),
d0 AS MATERIALIZED (
    SELECT doc_id AS node, CAST(0 AS BIGINT) AS d FROM documents
    WHERE doc_id % {BFS_SEED_MOD} = 0
),{",".join(iters)}
SELECT node AS doc_id, d AS depth FROM d{BFS_ITERS}
"""


CRAWL_FRONTIER_DEPTH = _crawl_frontier_depth_sql()


def _indegree_histogram_sql() -> str:
    """Mirror of stages/graph.indegree_histogram: LEFT JOIN keeps
    zero-in-degree pages (count(e.src) = 0), parallel edges count."""
    edges = _edge_arms_sql(with_deg=False)
    return f"""
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
e AS MATERIALIZED (
    {edges}
),
ind AS MATERIALIZED (
    SELECT d.doc_id, CAST(count(e.src) AS BIGINT) AS indeg
    FROM documents d LEFT JOIN e ON e.dst = d.doc_id
    GROUP BY d.doc_id
)
SELECT indeg, CAST(count(*) AS BIGINT) AS n_nodes
FROM ind GROUP BY indeg
"""


INDEGREE_HISTOGRAM = _indegree_histogram_sql()


def _link_reciprocity_sql() -> str:
    """Mirror of stages/graph.link_reciprocity over DISTINCT directed
    edges: total, self-loops, and unordered pairs present in both
    directions (counted once per pair via src < dst)."""
    edges = _edge_arms_sql(with_deg=False)
    return f"""
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
e AS MATERIALIZED (
    {edges}
),
ed AS MATERIALIZED (SELECT DISTINCT src, dst FROM e)
SELECT
    CAST((SELECT count(*) FROM ed) AS BIGINT) AS n_edges_distinct,
    CAST((SELECT count(*) FROM ed WHERE src = dst) AS BIGINT)
        AS n_self_loops,
    CAST((SELECT count(*) FROM ed a
          JOIN ed b ON a.src = b.dst AND a.dst = b.src
          WHERE a.src < a.dst) AS BIGINT) AS n_reciprocal
"""


LINK_RECIPROCITY = _link_reciprocity_sql()


def _closure_arms_sql() -> str:
    """THE one SQL definition of the planted triangle-closure arm
    (engine twin: stages/graph.iter_closure_edges): every doc with
    id %% TRI_PLANT_MOD == 0 contributes the directed 3-cycle chords
    (i, i+1), (i+1, i+2), (i, i+2) mod N.  Expects ``nn(n)`` in
    scope."""
    from prlib_ray.stages.graph import TRI_PLANT_MOD

    w = f"FROM documents WHERE doc_id % {TRI_PLANT_MOD} = 0"
    n = "(SELECT n FROM nn)"
    return (
        f"SELECT doc_id AS src, (doc_id + 1) % {n} AS dst\n    {w}"
        f"\n    UNION ALL\n    "
        f"SELECT (doc_id + 1) % {n} AS src, (doc_id + 2) % {n} AS dst"
        f"\n    {w}"
        f"\n    UNION ALL\n    "
        f"SELECT doc_id AS src, (doc_id + 2) % {n} AS dst\n    {w}"
    )


def _triangle_count_sql() -> str:
    """Mirror of stages/graph.triangle_count: shared affine arms UNION
    the planted closure arm, canonicalized to distinct undirected
    (lo < hi) edges; wedges = per-lo higher-neighbor pairs; triangles
    via the ordered (x<y<z) triple join."""
    edges = _edge_arms_sql(with_deg=False)
    closure = _closure_arms_sql()
    return f"""
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
e AS MATERIALIZED (
    {edges}
    UNION ALL
    {closure}
),
eu AS MATERIALIZED (
    SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
    FROM e WHERE src <> dst
)
SELECT
    CAST((SELECT count(*) FROM eu) AS BIGINT) AS n_edges,
    CAST((SELECT coalesce(sum((c * (c - 1)) // 2), 0)
          FROM (SELECT count(*) AS c FROM eu GROUP BY lo) t)
        AS BIGINT) AS n_wedges,
    CAST((SELECT count(*) FROM eu a
          JOIN eu b ON b.lo = a.lo AND b.hi > a.hi
          JOIN eu c ON c.lo = a.hi AND c.hi = b.hi) AS BIGINT)
        AS n_triangles
"""


TRIANGLE_COUNT = _triangle_count_sql()


def _hits_scores_sql() -> str:
    """Mirror of stages/graph.hits_scores: HITS_ITERS unrolled
    MATERIALIZED (authority, hub) rounds over the shared edge arms —
    authority gathers hubs over in-edges, hub gathers authorities over
    out-edges; LEFT JOINs keep edge-less nodes at 0."""
    from prlib_ray.stages.graph import HITS_ITERS, HITS_SCALE, HITS_TOPK

    edges = _edge_arms_sql(with_deg=False)
    iters = []
    for t in range(1, HITS_ITERS + 1):
        iters.append(f"""
a{t} AS MATERIALIZED (
    SELECT d.doc_id AS node,
           CAST(coalesce(SUM(h.h), 0) AS BIGINT) AS a
    FROM documents d
    LEFT JOIN e ON e.dst = d.doc_id
    LEFT JOIN h{t - 1} h ON h.node = e.src
    GROUP BY d.doc_id
),
h{t} AS MATERIALIZED (
    SELECT d.doc_id AS node,
           CAST(coalesce(SUM(a.a), 0) AS BIGINT) AS h
    FROM documents d
    LEFT JOIN e ON e.src = d.doc_id
    LEFT JOIN a{t} a ON a.node = e.dst
    GROUP BY d.doc_id
)""")
    return f"""
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
e AS MATERIALIZED (
    {edges}
),
h0 AS MATERIALIZED (
    SELECT doc_id AS node, CAST({HITS_SCALE} AS BIGINT) AS h
    FROM documents
),{",".join(iters)}
SELECT a.node AS doc_id, a.a AS authority, h.h AS hub
FROM a{HITS_ITERS} a JOIN h{HITS_ITERS} h USING (node)
ORDER BY a.a DESC, a.node ASC
LIMIT {HITS_TOPK}
"""


HITS_SCORES = _hits_scores_sql()
