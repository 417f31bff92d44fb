"""Corpus-statistics operators: oracle parity, broadcast-vs-join layout
equality, and the window-hash collision assumption pinned against a
string-tuple brute force."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def registry():
    from prlib_ray.api import build_queries

    return build_queries()


CASES = ["unigram_freq_score", "tfidf_top_term", "dup_ngram_fraction",
         "segment_dedup", "curate_corpus", "dup_substring_fraction",
         "build_inverted_index", "search_topk", "bigram_lm_score",
         "source_overlap", "source_minhash_jaccard", "vocab_oov_rate",
         "cms_word_frequency", "length_rank_transform", "pmi_top_pairs",
         "tokenizer_budget_curve", "source_word_lift",
         "cluster_top_terms"]


def _cmp(df, odf, name):
    cols = sorted(df.columns)
    assert cols == sorted(odf.columns), f"{name}: schema"
    a = df[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    for c in cols:
        x, y = a[c], b[c]
        if x.dtype != y.dtype:
            x, y = x.astype(str), y.astype(str)
        assert x.equals(y), f"{name}: column {c}"


@pytest.mark.parametrize("name", CASES)
def test_corpus_matches_oracle(name, con, registry, ray_session, sf_dir):
    queries, sql = registry
    df = queries[name](sf_dir).to_pandas()
    _cmp(df, con.execute(sql[name]).df(), name)


@pytest.mark.parametrize(
    "op", ["unigram_freq_score", "tfidf_top_term", "bigram_lm_score"]
)
def test_broadcast_join_layouts_byte_equal(op, ray_session, sf_dir):
    """The size-gated vocabulary attach must give identical results in
    the broadcast and distributed-join layouts."""
    from prlib_ray.stages import corpus_stats

    fn = getattr(corpus_stats, op)
    a = fn(sf_dir, via="broadcast").to_pandas()
    b = fn(sf_dir, via="join").to_pandas()
    cols = sorted(a.columns)
    assert cols == sorted(b.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    # join path may emit different int dtypes from pandas groupby
    for c in cols:
        x, y = a[c], b[c]
        if x.dtype != y.dtype:
            x, y = x.astype(str), y.astype(str)
        assert x.equals(y), f"{op}/{c}"


def test_window_ids_match_string_tuple_brute_force():
    """Equal 8-word windows always collide under the md5-word-hash
    positional combine, and the fixture corpus produces no cross-gram
    collisions — so the uint64 id space is an exact mirror of string
    8-grams on this data."""
    from prlib_ray.stages.corpus_stats import DUP_NGRAM, _window_ids

    texts = [
        "a b c d e f g h i j",
        "z y a b c d e f g h",  # shares the a..h window
        "one two three four five six seven eight",
        "",
        "short text",
        "a b c d e f g h",  # exactly one window, equal to doc 0's first
    ]
    tbl = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    g, d = _window_ids(tbl)

    # brute force: string tuples
    grams, docs = [], []
    for i, t in enumerate(texts):
        w = t.split(" ")
        for j in range(len(w) - DUP_NGRAM + 1):
            grams.append(tuple(w[j : j + DUP_NGRAM]))
            docs.append(i)
    assert len(g) == len(grams)
    assert list(d) == docs
    # id equality == tuple equality, pairwise
    for i in range(len(g)):
        for j in range(i + 1, len(g)):
            assert (g[i] == g[j]) == (grams[i] == grams[j]), (i, j)


def test_dup_ngram_counts_on_constructed_corpus(ray_session, tmp_path):
    """A corpus with one shared 8-gram between two docs and one doc of
    pure repetition gets exactly the hand-computed window counts."""
    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    texts = [
        f"intro {shared} outro",  # 3 windows, 1 dup (the shared one)
        f"{shared}",  # 1 window, dup
        "unique u2 u3 u4 u5 u6 u7 u8 u9",  # 2 windows, 0 dup
        "tiny",  # no windows -> absent from output
    ]
    pq.write_table(
        pa.table({"doc_id": [0, 1, 2, 3], "text": texts}),
        tmp_path / "documents.parquet",
    )
    from prlib_ray.stages.corpus_stats import dup_ngram_fraction

    df = (
        dup_ngram_fraction(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert df["doc_id"].tolist() == [0, 1, 2]
    assert df["n_windows"].tolist() == [3, 1, 2]
    assert df["dup_windows"].tolist() == [1, 1, 0]
    assert df["dup_pct"].tolist() == [33, 100, 0]


def test_segment_ids_match_string_tuple_brute_force():
    """Disjoint SEG_WIDTH-token segments: id equality must mirror
    string-tuple equality exactly (equal segments always collide,
    positions matter, empty tokens retained, <SEG_WIDTH tails and
    segment-less docs dropped)."""
    from prlib_ray.stages.corpus_stats import SEG_WIDTH, _segment_ids

    texts = [
        "a b c d e f g h x",       # 2 full segments + 1-token tail
        "a b c d",                 # equals doc 0's first segment
        "b a c d",                 # same words, different order
        "a  b c d e",              # empty token inside the segment
        "",                        # 1 empty token -> no segment
        "one two three",           # 3 tokens -> no segment
        "é ü 中文 🙂 tail",          # unicode segment + tail
    ]
    tbl = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    g, d = _segment_ids(tbl)

    grams, docs = [], []
    for i, t in enumerate(texts):
        w = t.split(" ")
        for j in range(0, len(w) - SEG_WIDTH + 1, SEG_WIDTH):
            grams.append(tuple(w[j : j + SEG_WIDTH]))
            docs.append(i)
    assert len(g) == len(grams)
    assert list(d) == docs
    for i in range(len(g)):
        for j in range(i + 1, len(g)):
            assert (g[i] == g[j]) == (grams[i] == grams[j]), (i, j)


def test_char_window_ids_match_string_brute_force():
    """SUBSTR_LEN-char window ids: id equality mirrors exact substring
    equality (unicode code points counted like DuckDB substr/length,
    spaces included, short docs yield nothing)."""
    from prlib_ray.stages.corpus_stats import SUBSTR_LEN, _char_window_ids

    pad = "x" * (SUBSTR_LEN - 4)
    texts = [
        f"abcd{pad}tail one",          # several windows
        f"abcd{pad}",                  # exactly one window == doc 0's first
        f"dcba{pad}",                  # same chars, different order
        "short",                       # < SUBSTR_LEN -> nothing
        "",                            # empty -> nothing
        "é ü 中文 🙂" + pad,             # unicode code points count as 1 char
    ]
    tbl = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    g, d = _char_window_ids(tbl)

    grams, docs = [], []
    for i, t in enumerate(texts):
        for j in range(len(t) - SUBSTR_LEN + 1):
            grams.append(t[j : j + SUBSTR_LEN])
            docs.append(i)
    assert len(g) == len(grams)
    assert list(d) == docs
    for i in range(len(g)):
        for j in range(i + 1, len(g)):
            assert (g[i] == g[j]) == (grams[i] == grams[j]), (i, j)


def test_gopher_quality_matches_naive_python():
    """The vectorized rule inputs equal a per-doc straight-line
    recomputation (including empty docs and unicode word lengths)."""
    from prlib_ray.stages.text_analysis import (
        GOPHER_STOPWORDS,
        gopher_quality_batch,
    )

    texts = [
        "the quick brown fox and that dog have fun with it",
        "",
        "  double  spaces  ",
        "é ü 中文 the the of of 123 !!!",
        "x " * 60,
    ]
    tbl = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = gopher_quality_batch(tbl).to_pandas().set_index("doc_id")
    import re

    for i, t in enumerate(texts):
        words = [w for w in t.split(" ") if w != ""]
        assert out.loc[i, "n_words"] == len(words)
        assert out.loc[i, "sum_word_len"] == sum(len(w) for w in words)
        assert out.loc[i, "n_alpha"] == sum(
            1 for w in words if re.search("[A-Za-z]", w)
        )
        assert out.loc[i, "n_stop"] == sum(
            1 for w in words if w in GOPHER_STOPWORDS
        )


def test_segment_dedup_constructed_corpus(ray_session, tmp_path):
    """Hand-computed C4 accounting: a segment occurring 3x corpus-wide
    (twice in one doc + once in another) is removed everywhere, a 2x
    segment is kept, <SEG_WIDTH tails never count, and segment-less
    docs are absent from the output."""
    texts = [
        "a b c d a b c d x",   # 2 full segments (both "a b c d") + tail
        "a b c d p q r s",     # "a b c d" (3rd occurrence) + "p q r s"
        "p q r s t u v w",     # "p q r s" (only 2x total) + "t u v w"
        "x y z",               # no full segment -> absent
    ]
    pq.write_table(
        pa.table({"doc_id": [0, 1, 2, 3], "text": texts}),
        tmp_path / "documents.parquet",
    )
    from prlib_ray.stages.corpus_stats import segment_dedup

    df = (
        segment_dedup(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert df["doc_id"].tolist() == [0, 1, 2]
    assert df["n_segments"].tolist() == [2, 2, 2]
    assert df["removed_segments"].tolist() == [2, 1, 0]
    assert df["removed_pct"].tolist() == [100, 50, 0]


def test_curate_funnel_is_monotone_and_nonvacuous(registry, ray_session,
                                                  sf_dir):
    """Each funnel stage can only shrink the corpus, and on the fixtures
    every stage does real work (gopher gate rejects, the planted dups
    dedup away, at least one heavy-boilerplate doc drops)."""
    queries, _ = registry
    df = queries["curate_corpus"](sf_dir).to_pandas()
    t = df[["n_docs", "n_gopher", "n_dedup", "n_final"]].sum()
    assert t["n_docs"] > t["n_gopher"] > t["n_dedup"] > t["n_final"] > 0
    assert (df["n_docs"] >= df["n_gopher"]).all()
    assert (df["n_gopher"] >= df["n_dedup"]).all()
    assert (df["n_dedup"] >= df["n_final"]).all()
    assert df.loc[df["n_final"] > 0, "tokens_final"].gt(0).all()


def test_unigram_min_freq_is_corpus_global(ray_session, tmp_path):
    """min_freq must reflect CORPUS-wide counts, not per-batch counts —
    a word appearing once in each of two docs has corpus frequency 2."""
    pq.write_table(
        pa.table(
            {
                "doc_id": [0, 1, 2],
                "text": ["common rare1", "common rare1", "common"],
            }
        ),
        tmp_path / "documents.parquet",
    )
    from prlib_ray.stages.corpus_stats import unigram_freq_score

    df = (
        unigram_freq_score(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # corpus counts: common=3, rare1=2
    assert df["n_words"].tolist() == [2, 2, 1]
    assert df["freq_sum"].tolist() == [5, 5, 3]
    assert df["min_freq"].tolist() == [2, 2, 3]


def test_source_overlap_constructed_corpus(ray_session, tmp_path):
    """Pair counts on a corpus with hand-countable vocab overlap,
    including a zero-overlap pair (kept, shared=0) and a wordless
    source (absent — oracle parity with the cnt cross join)."""
    pq.write_table(
        pa.table(
            {
                "doc_id": [0, 1, 2, 3, 4],
                "text": ["alpha beta gamma", "beta gamma delta",
                         "epsilon zeta", "alpha  beta", ""],
                "source": ["s1", "s2", "s3", "s1", "s_empty"],
            }
        ),
        tmp_path / "documents.parquet",
    )
    from prlib_ray.stages.corpus_stats import source_overlap

    df = source_overlap(str(tmp_path)).to_pandas()
    got = {
        (r.s1, r.s2): (r.shared, r.n1, r.n2) for r in df.itertuples()
    }
    # vocab: s1 = {alpha, beta, gamma}, s2 = {beta, gamma, delta},
    # s3 = {epsilon, zeta}; s_empty has no words -> absent
    assert got == {
        ("s1", "s2"): (2, 3, 3),
        ("s1", "s3"): (0, 3, 2),
        ("s2", "s3"): (0, 3, 2),
    }


def test_vocab_oov_tie_boundary(ray_session, tmp_path, monkeypatch):
    """The top-V cut breaks count ties by word ASC: with V=2 and counts
    {a:2, b:2, c:2, z:1}, the frozen vocab is {a, b} — c is OOV despite
    tying the boundary count."""
    from prlib_ray.stages import corpus_stats as cs

    pq.write_table(
        pa.table({
            "doc_id": [0, 1],
            "text": ["a b c z", "c b a"],
            "source": ["s1", "s2"],
        }),
        tmp_path / "documents.parquet",
    )
    monkeypatch.setattr(cs, "OOV_VOCAB", 2)
    df = cs.vocab_oov_rate(str(tmp_path)).to_pandas()
    got = {r.source: (int(r.n_tokens), int(r.n_oov))
           for r in df.itertuples()}
    assert got == {"s1": (4, 2), "s2": (3, 1)}  # c (+z for s1) are OOV


def test_source_minhash_estimates_bigram_jaccard(con, registry,
                                                 ray_session, sf_dir):
    """The 64-seed sketch estimate tracks the EXACT per-pair bigram
    Jaccard: per-pair error within 4 sigma of the minhash variance
    bound, mean error within ~sigma.  (Parity with the SQL mirror is
    the separate oracle test; this pins that the estimator measures
    the right quantity.)"""
    queries, _ = registry
    df = queries["source_minhash_jaccard"](sf_dir).to_pandas()
    exact = con.execute("""
WITH words AS (
    SELECT source, doc_id, unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM documents
),
nz AS (SELECT source, doc_id, w,
              row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
       FROM words WHERE w <> ''),
bg AS (SELECT DISTINCT a.source, a.w || ' ' || b.w AS g
       FROM nz a JOIN nz b ON a.doc_id = b.doc_id AND b.j = a.j + 1),
cnt AS (SELECT source, count(*) AS n FROM bg GROUP BY source),
sh AS (SELECT a.source AS s1, b.source AS s2, count(*) AS n
       FROM bg a JOIN bg b ON a.g = b.g AND a.source < b.source
       GROUP BY 1, 2)
SELECT ca.source AS s1, cb.source AS s2,
       COALESCE(sh.n, 0)::DOUBLE
           / (ca.n + cb.n - COALESCE(sh.n, 0)) AS j
FROM cnt ca JOIN cnt cb ON ca.source < cb.source
LEFT JOIN sh ON sh.s1 = ca.source AND sh.s2 = cb.source
""").df()
    m = df.merge(exact, on=["s1", "s2"])
    assert len(m) == len(df) > 0
    err = (m["n_match"] / 64.0 - m["j"]).abs()
    # sigma = sqrt(J(1-J)/64) <= 0.0625
    assert err.max() <= 4 * 0.0625, err.max()
    assert err.mean() <= 0.0625, err.mean()


def test_cms_collisions_and_parity_constructed(ray_session, tmp_path):
    """The fixture vocabulary (31 words) cannot collide in a 4x1024
    sketch, so the driver row's estimate tail is exact-but-vacuous.
    This corpus packs 5,000 distinct words into the sketch (load ~5
    per cell per row), forcing real collisions: estimates must stay
    conservative (n_est >= n_exact for every word), at least one word
    must actually over-count, and the whole report must still match
    the SQL mirror bit-for-bit THROUGH the collisions."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from prlib_ray.oracles_corpus import CMS_WORD_FREQUENCY
    from prlib_ray.stages.corpus_stats import cms_word_frequency

    rng = np.random.RandomState(7)
    vocab = [f"tok{i}" for i in range(5000)]
    docs = []
    for d in range(50):
        picks = rng.choice(5000, size=400)
        words = [vocab[i] for i in picks]
        # make the top deterministic: a head word dominates per doc
        words += [f"head{d % 7}"] * 50
        docs.append(" ".join(words))
    pq_.write_table(
        pa.table({
            "doc_id": pa.array(range(len(docs)), type=pa.int64()),
            "text": pa.array(docs),
        }),
        tmp_path / "documents.parquet",
    )
    df = (cms_word_frequency(str(tmp_path)).to_pandas()
          .sort_values("w").reset_index(drop=True))
    assert (df.n_est >= df.n_exact).all()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    odf = (con.execute(CMS_WORD_FREQUENCY).df()
           .sort_values("w").reset_index(drop=True))
    assert df.w.tolist() == odf.w.tolist()
    assert df.n_exact.tolist() == odf.n_exact.astype(int).tolist()
    assert df.n_est.tolist() == odf.n_est.astype(int).tolist()
    # the collision path genuinely fired somewhere in the full sketch:
    # the oracle's own counter table over-counts at this load, and the
    # engine matched it cell-for-cell above; assert the load is real
    n_over = int((df.n_est > df.n_exact).sum())
    assert n_over >= 1, "no collision at load ~5/cell — sketch too wide?"


def test_length_rank_ties_constructed(ray_session, tmp_path):
    """Tied lengths share a strictly-smaller count (rank()-1 semantics)
    and the CDF boundaries are exact on a hand-built spectrum."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from prlib_ray.stages.corpus_stats import length_rank_transform

    lens = [5, 5, 7, 9, 9, 9, 12]
    pq_.write_table(
        pa.table({
            "doc_id": pa.array(range(len(lens)), type=pa.int64()),
            "text": pa.array(["x" * n for n in lens]),
            "n_chars": pa.array(lens, type=pa.int64()),
        }),
        tmp_path / "documents.parquet",
    )
    df = (length_rank_transform(str(tmp_path)).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    assert df.n_smaller.tolist() == [0, 0, 2, 3, 3, 3, 6]


def test_pmi_scores_constructed(ray_session, tmp_path):
    """Pins the PMI contract on a corpus with a perfectly-associated
    pair (cat+dog always together: ratio 2.0), an independent pair
    (cat+x: ratio 1.0), a mid pair (x+y) and an under-threshold pair
    (fish+x co-occurs once < PMI_MIN_COOC — absent)."""
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    texts = ["cat dog x", "cat dog x", "cat dog", "fish x", "x y",
             "y x"]
    pq2.write_table(
        pa2.table({
            "doc_id": pa2.array(range(len(texts)), type=pa2.int64()),
            "text": pa2.array(texts, type=pa2.string()),
        }),
        tmp_path / "documents.parquet",
    )
    from prlib_ray.stages.corpus_stats import pmi_top_pairs

    df = pmi_top_pairs(str(tmp_path)).to_pandas()
    rows = list(zip(df["wa"], df["wb"], df["n_ab"], df["score"]))
    # df: cat 3, dog 3, x 5, y 2, fish 1; N = 6
    assert rows == [
        ("cat", "dog", 3, 2_000_000),   # 3*6e6/(3*3): perfect
        ("x", "y", 2, 1_200_000),       # 2*6e6/(5*2)
        ("cat", "x", 2, 800_000),       # 2*6e6/(3*5)
        ("dog", "x", 2, 800_000),
    ]


def test_tokenizer_budget_curve_constructed(ray_session, tmp_path):
    """Hand-computed OOV curve: 5 word types with counts 5/3/2/1/1
    (ties at count 1 break word-ASC into the head), checked at sizes
    that straddle the type count — beyond it both OOV columns are 0."""
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    texts = ["a a a b c", "a a b d b", "c e"]
    # counts: a=5, b=3, c=2, d=1, e=1 ; total 12 tokens, 5 types
    pq2.write_table(
        pa2.table({
            "doc_id": pa2.array(range(3), type=pa2.int64()),
            "text": pa2.array(texts, type=pa2.string()),
        }),
        tmp_path / "documents.parquet",
    )
    from prlib_ray.stages.corpus_stats import tokenizer_budget_curve

    df = tokenizer_budget_curve(
        str(tmp_path), sizes=(1, 2, 4, 8)
    ).to_pandas()
    assert df["vocab_size"].tolist() == [1, 2, 4, 8]
    # V=1 head {a}: 12-5=7 oov; V=2 {a,b}: 4; V=4 {a,b,c,d}: 1; V=8: 0
    assert df["n_oov_tokens"].tolist() == [7, 4, 1, 0]
    assert df["n_oov_types"].tolist() == [4, 3, 1, 0]


def test_source_word_lift_constructed(ray_session, tmp_path):
    """Hand-computed lift: a word exclusive to a small source gets the
    maximal lift N/n_s, a uniform word sits at ~1.0, and the top-k cut
    ranks (score DESC, word ASC)."""
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    # srcA: 4 tokens, srcB: 4 tokens; N = 8; n_w: rare 1, com 3, x 1,
    # bee 3.  Exclusive words hit the max lift N/n_s = 2.0 -> 20000;
    # srcB's lone 'com' (1*8/(4*3)) sits at 0.67 -> 6666.
    texts = ["rare com com x", "bee bee bee com"]
    pq2.write_table(
        pa2.table({
            "doc_id": pa2.array([0, 1], type=pa2.int64()),
            "text": pa2.array(texts, type=pa2.string()),
            "source": pa2.array(["srcA", "srcB"], type=pa2.string()),
        }),
        tmp_path / "documents.parquet",
    )
    from prlib_ray.stages.corpus_stats import source_word_lift

    df = source_word_lift(str(tmp_path), k=2).to_pandas()
    rows = list(zip(df["source"], df["w"], df["n_sw"], df["score"]))
    # srcA's exclusive words tie at 2.0, word ASC picks the order
    assert rows == [
        ("srcA", "rare", 1, 20000),
        ("srcA", "x", 1, 20000),
        ("srcB", "bee", 3, 20000),
        ("srcB", "com", 1, 6666),
    ]


def test_cluster_top_terms_constructed(ray_session, tmp_path):
    """Cross-modal semantics: non-seed vectors 8/9 assign to seed 0's
    direction so cluster 0 aggregates docs {0, 8, 9}; a doc with NO
    embedding row ('ghost') drops entirely (inner-join parity); the
    lift tie (apple/banana both 2.4x) breaks word-ASC."""
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.stages.corpus_stats import cluster_top_terms

    # ids 0-7 are seeds (each assigns to itself: distinct directions);
    # ids 8, 9 point along seed 0's axis with larger norm -> cluster 0
    def axis(i, scale=1.0):
        v = [0.0] * 8
        v[i] = scale
        return v

    emb = [axis(i) for i in range(8)] + [axis(0, 2.0), axis(0, 3.0)]
    pq2.write_table(
        pa2.table({
            "vec_id": pa2.array(range(10), type=pa2.int64()),
            "embedding": pa2.array(emb, type=pa2.list_(pa2.float32())),
        }),
        tmp_path / "embeddings.parquet",
    )
    texts = {0: "apple apple", 8: "apple banana", 9: "apple",
             99: "ghost"}
    for i in range(1, 8):
        texts[i] = "zebra"
    ids = sorted(texts)
    pq2.write_table(
        pa2.table({
            "doc_id": pa2.array(ids, type=pa2.int64()),
            "text": pa2.array([texts[i] for i in ids],
                              type=pa2.string()),
        }),
        tmp_path / "documents.parquet",
    )
    df = cluster_top_terms(str(tmp_path)).to_pandas()
    assert "ghost" not in set(df["w"])
    c0 = df[df["cluster"] == 0].reset_index(drop=True)
    rows = list(zip(c0["w"], c0["n_cw"], c0["score"]))
    # cluster 0: 5 tokens; apple 4*12/(5*4), banana 1*12/(5*1) — tie
    assert rows == [("apple", 4, 24000), ("banana", 1, 24000)]
    z = df[df["w"] == "zebra"]
    assert set(z["cluster"]) == set(range(1, 8))
    assert (z["score"] == 17142).all()  # 1*12/(1*7) -> floor
