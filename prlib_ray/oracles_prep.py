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
