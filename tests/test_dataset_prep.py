"""Dataset-prep operators: oracle parity + structural invariants
(packing conservation, decontamination brute-force, shuffle determinism,
mixing rate bounds)."""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con


@pytest.fixture(scope="module")
def registry():
    from prlib_ray.api import build_queries

    return build_queries()


PREP_CASES = ["mix_sources", "shuffle_head", "decontaminate",
              "pack_sequences", "chunk_tokens", "pii_scan", "pii_redact",
              "source_term_stats", "length_filter_p95",
              "sample_per_source", "heavy_hitter_words", "snapshot_diff",
              "conv_structure_audit", "pagerank_docs",
              "anchor_text_stats", "web_curate",
              "conv_extract_digest", "pagerank_mass_audit",
              "crawl_frontier_depth", "indegree_histogram",
              "link_reciprocity", "triangle_count",
              "extract_turn_spans", "hits_scores"]


@pytest.mark.parametrize("name", PREP_CASES)
def test_prep_matches_oracle(name, con, registry, ray_session, sf_dir):
    queries, sql = registry
    out = queries[name](sf_dir)
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    odf = con.execute(sql[name]).df()
    cols = sorted(df.columns)
    assert cols == sorted(odf.columns)
    a = df[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    for c in cols:
        x, y = a[c], b[c]
        if x.dtype != y.dtype:
            x, y = x.astype(str), y.astype(str)
        assert x.equals(y), f"{name}: column {c}"


def test_pack_sequences_is_exact_global_prefix_sum(ray_session, sf_dir):
    """The distributed two-level prefix sum must equal the straight-line
    single-threaded cumsum over doc_id order, and packing must conserve
    tokens (each doc's bin span covers exactly its tokens)."""
    import re

    from prlib_ray.stages.dataset_prep import PACK_BUDGET, pack_sequences

    t = pq.read_table(sf_dir + "/documents.parquet",
                      columns=["doc_id", "text"])
    ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
    pat = re.compile("[A-Za-z0-9]+")
    ntok = np.asarray(
        [len(pat.findall(s)) for s in t["text"].to_pylist()], dtype=np.int64
    )
    o = np.argsort(ids)
    ids, ntok = ids[o], ntok[o]
    starts = np.cumsum(ntok) - ntok

    df = pack_sequences(sf_dir).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert np.array_equal(df["doc_id"].to_numpy(), ids)
    assert np.array_equal(df["tok_start"].to_numpy(), starts)
    assert np.array_equal(df["first_bin"].to_numpy(), starts // PACK_BUDGET)
    last = np.where(ntok > 0, (starts + ntok - 1) // PACK_BUDGET,
                    starts // PACK_BUDGET)
    nb = np.where(ntok > 0, last - starts // PACK_BUDGET + 1, 0)
    assert np.array_equal(df["n_bins"].to_numpy(), nb)
    # conservation: the stream ends at the total token count
    assert starts[-1] + ntok[-1] == int(ntok.sum())


def test_decontaminate_matches_bruteforce_strings(ray_session, sf_dir):
    """The hashed-n-gram probe must agree with literal string-tuple
    matching (guards the 64-bit combine against semantic drift)."""
    from prlib_ray.stages.dataset_prep import (DECON_BENCH_MOD, DECON_NGRAM,
                                               decontaminate)

    t = pq.read_table(sf_dir + "/documents.parquet",
                      columns=["doc_id", "text", "source"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    srcs = t["source"].to_pylist()

    def grams(s):
        w = s.split(" ")
        return {
            tuple(w[i:i + DECON_NGRAM])
            for i in range(len(w) - DECON_NGRAM + 1)
        }

    bench = set()
    for i, s in zip(ids, texts):
        if i % DECON_BENCH_MOD == 0:
            bench |= grams(s)
    expected = {}
    for i, s, src in zip(ids, texts, srcs):
        if i % DECON_BENCH_MOD == 0:
            continue
        nd, nc = expected.get(src, (0, 0))
        expected[src] = (nd + 1, nc + (1 if grams(s) & bench else 0))

    df = decontaminate(sf_dir).to_pandas()
    got = {
        r.source: (int(r.n_docs), int(r.n_contaminated))
        for r in df.itertuples()
    }
    assert got == expected
    assert sum(c for _, c in got.values()) > 0, "vacuous fixture"


def test_shuffle_head_deterministic_and_ranked(ray_session, sf_dir):
    from prlib_ray.stages.dataset_prep import (SHUFFLE_K, SHUFFLE_SALT,
                                               shuffle_head)

    a = shuffle_head(sf_dir).to_pandas()
    b = shuffle_head(sf_dir).to_pandas()
    assert a.equals(b)
    assert list(a["rank"]) == list(range(1, len(a) + 1))
    assert a["doc_id"].is_unique
    assert len(a) == min(
        SHUFFLE_K, pq.read_metadata(sf_dir + "/documents.parquet").num_rows
    )
    # the hash column really is the salted md5, and ranks follow it
    hs = [
        hashlib.md5((SHUFFLE_SALT + str(int(i))).encode()).hexdigest()
        for i in a["doc_id"]
    ]
    assert list(a["h"]) == hs
    assert list(a["h"]) == sorted(a["h"])


def test_chunk_tokens_covers_stream(ray_session, sf_dir):
    """Chunks must tile each doc: first window starts at 0, the last
    reaches n_tokens, and consecutive windows overlap by exactly
    WINDOW - STRIDE (except a shorter final window)."""
    from prlib_ray.stages.dataset_prep import (CHUNK_STRIDE, CHUNK_WINDOW,
                                               chunk_tokens)

    df = chunk_tokens(sf_dir).to_pandas().sort_values(
        ["doc_id", "chunk_idx"]).reset_index(drop=True)
    assert (df["tok_hi"] > df["tok_lo"]).all()
    for doc_id, g in df.groupby("doc_id"):
        lo = g["tok_lo"].to_numpy()
        hi = g["tok_hi"].to_numpy()
        assert lo[0] == 0
        assert np.array_equal(
            lo, np.arange(len(g), dtype=np.int64) * CHUNK_STRIDE
        )
        # every token index < max(hi) is inside some window
        assert (hi[:-1] - lo[1:] >= 0).all() or len(g) == 1
        assert (hi[:-1] == lo[:-1] + CHUNK_WINDOW).all()


def test_pii_scan_plants_are_found(ray_session, sf_dir):
    from prlib_ray.stages.dataset_prep import (PII_EMAIL_MOD, PII_PHONE_MOD,
                                               pii_scan)

    t = pq.read_table(sf_dir + "/documents.parquet", columns=["doc_id"])
    ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
    df = pii_scan(sf_dir).to_pandas()
    assert int(df["n_email"].sum()) == int((ids % PII_EMAIL_MOD == 0).sum())
    assert int(df["n_phone"].sum()) == int((ids % PII_PHONE_MOD == 0).sum())
    assert int(df["n_docs"].sum()) == len(ids)
    assert int(df["n_docs_with_pii"].sum()) > 0
    assert (df["n_chars_redacted"] > 0).any()


def test_pii_redact_order_is_contractual(ray_session, tmp_path):
    """Email-before-phone replacement is part of the contract: on a
    text where the two patterns overlap ('x@555-0199.com' — the email
    regex eats 'x@555', leaving '-0199.com', so the phone never fires),
    the result differs from phone-first; the md5 must equal the
    straight-line re.sub in the contractual order."""
    import hashlib
    import re

    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.stages.dataset_prep import (PII_EMAIL_PATTERN,
                                               PII_PHONE_PATTERN, pii_redact)

    # doc_ids avoid the %7/%11 plants so texts stay exactly as written
    texts = ["x@555-0199.com ok", "plain doc", "a@b.com and 555-1234"]
    ids = [1, 2, 3]
    pq2.write_table(
        pa2.table({"doc_id": pa2.array(ids, type=pa2.int64()),
                   "text": pa2.array(texts, type=pa2.string())}),
        tmp_path / "documents.parquet",
    )
    df = pii_redact(str(tmp_path)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    for i, t in enumerate(texts):
        red = re.sub(PII_PHONE_PATTERN, "[PHONE]",
                     re.sub(PII_EMAIL_PATTERN, "[EMAIL]", t))
        gone = re.sub(PII_PHONE_PATTERN, "",
                      re.sub(PII_EMAIL_PATTERN, "", t))
        assert df.loc[i, "redacted_md5"] == hashlib.md5(
            red.encode()).hexdigest()
        # the removal metric (pii_scan's red accounting), never negative
        assert df.loc[i, "n_redacted_chars"] == len(t) - len(gone)
    # and the overlap case really is order-sensitive
    phone_first = re.sub(PII_EMAIL_PATTERN, "[EMAIL]",
                         re.sub(PII_PHONE_PATTERN, "[PHONE]", texts[0]))
    email_first = re.sub(PII_PHONE_PATTERN, "[PHONE]",
                         re.sub(PII_EMAIL_PATTERN, "[EMAIL]", texts[0]))
    assert phone_first != email_first


def test_mix_sources_rates(ray_session, sf_dir):
    from prlib_ray.stages.dataset_prep import mix_sources

    df = mix_sources(sf_dir).to_pandas()
    assert (df["n_kept"] <= df["n_total"]).all()
    for r in df.itertuples():
        k = int(r.source[3:]) % 4
        if k == 0:  # rate 1.0 sources keep everything
            assert r.n_kept == r.n_total
        else:  # sampled sources must actually drop something at 25 docs
            assert r.n_kept < r.n_total


def test_weighted_sample_matches_straight_line(ray_session, sf_dir):
    """Distributed local-top-K + driver fold == the straight-line
    single-pass integer-key selection."""
    import hashlib as hl

    import pyarrow.parquet as pq2

    from prlib_ray.stages.dataset_prep import (
        WSAMPLE_K,
        WSAMPLE_SALT,
        WSAMPLE_SCALE,
        weighted_sample,
    )

    t = pq2.read_table(f"{sf_dir}/documents.parquet",
                       columns=["doc_id", "n_chars"])
    rows = []
    for did, nc in zip(t["doc_id"].to_pylist(), t["n_chars"].to_pylist()):
        h32 = int(hl.md5((WSAMPLE_SALT + str(did)).encode()).hexdigest()[:8],
                  16)
        rows.append((h32 * WSAMPLE_SCALE // max(nc, 1), did, nc))
    rows.sort()
    expect = rows[:WSAMPLE_K]

    df = weighted_sample(sf_dir).to_pandas()
    assert df["rank"].tolist() == list(range(1, len(expect) + 1))
    assert df["doc_id"].tolist() == [r[1] for r in expect]
    assert df["key"].tolist() == [r[0] for r in expect]
    # weight bias sanity: sampled docs skew long
    assert df["n_chars"].mean() > t["n_chars"].to_pandas().mean()


def test_incremental_dedup_planted_collisions(ray_session, tmp_path):
    """New-crawl docs sharing a head fingerprint with the old snapshot
    are dropped; within-new collisions do NOT drop (pure anti-join
    against the old side)."""
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    head = "alpha beta gamma delta epsilon"
    docs = [
        # old snapshot (src < 10)
        (0, "src0", f"{head} old tail one"),
        (1, "src5", "totally different old document text here"),
        # new crawl (src >= 10)
        (2, "src10", f"{head} new tail should drop"),  # collides with 0
        (3, "src11", "fresh unseen content survives fine"),
        (4, "src12", "duplicate new head duplicate new head x"),
        (5, "src13", "duplicate new head duplicate new head y"),  # same
        # head as 4 — both survive (old side never saw it)
    ]
    pq2.write_table(
        pa2.table(
            {
                "doc_id": [d[0] for d in docs],
                "source": [d[1] for d in docs],
                "text": [d[2] for d in docs],
            }
        ),
        tmp_path / "documents.parquet",
    )
    from prlib_ray.stages.dedup import incremental_dedup

    out = (
        incremental_dedup(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["doc_id"].tolist() == [3, 4, 5]


def test_frequent_ngrams_matches_brute_force(ray_session, tmp_path):
    """Threshold heavy-hitters == the straight-line string-tuple count,
    including gram-string reconstruction (double spaces preserved) and
    sub-threshold exclusion."""
    import collections

    import pyarrow as pa2
    import pyarrow.parquet as pq2

    texts = [
        "the quick fox " * 3,          # repeated within one doc
        "the quick fox jumps over",    # and across docs
        "a  b c a  b c a  b c",        # double-space tokens inside grams
        "unique words here only once",
        "the quick fox again",
    ]
    pq2.write_table(
        pa2.table({"doc_id": list(range(len(texts))), "text": texts}),
        tmp_path / "documents.parquet",
    )
    from prlib_ray.stages.dataset_prep import (
        DECON_NGRAM,
        FREQ_NGRAM_T,
        frequent_ngrams,
    )

    counts = collections.Counter()
    for t in texts:
        w = t.split(" ")
        for i in range(len(w) - DECON_NGRAM + 1):
            counts[" ".join(w[i : i + DECON_NGRAM])] += 1
    expect = {g: n for g, n in counts.items() if n >= FREQ_NGRAM_T}

    df = frequent_ngrams(str(tmp_path)).to_pandas()
    got = dict(zip(df["gram"], df["n_count"]))
    assert got == expect
    assert len(expect) > 0  # non-vacuous: the fixture plants >=T grams


def test_heavy_hitter_words_sketch_properties(ray_session, sf_dir):
    """The Misra-Gries path: (a) exact equality with a brute-force count
    at the real capacity; (b) STILL exact with the capacity squeezed to
    barely-legal (the truncation actually fires, the no-false-negative
    guarantee carries the winners through); (c) an illegal
    threshold/capacity combination raises instead of silently missing
    items."""
    import collections

    import pyarrow.parquet as pq2

    from prlib_ray.stages import dataset_prep as dp

    t = pq2.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    counts = collections.Counter()
    for txt in t["text"].to_pylist():
        counts.update(w for w in txt.split(" ") if w)
    n_total = sum(counts.values())
    thr = n_total // dp.MG_T_DIV
    expect = {w: c for w, c in counts.items() if c >= thr}

    df = dp.heavy_hitter_words(sf_dir).to_pandas()
    assert dict(zip(df["w"], df["n"])) == expect
    assert 0 < len(expect) < len(counts)  # a real split on the fixture

    # squeeze the capacity so per-batch truncation genuinely fires but
    # the guarantee T > 2n/(K+1) still holds -> result must not change
    k_min = 2 * n_total // max(thr, 1) + 2
    assert k_min < dp.MG_K  # the squeeze is real
    df2 = dp.heavy_hitter_words(sf_dir, k=k_min).to_pandas()
    assert dict(zip(df2["w"], df2["n"])) == expect

    # below the legal capacity the op must refuse, not under-report
    with pytest.raises(ValueError, match="cannot guarantee"):
        dp.heavy_hitter_words(sf_dir, k=2)


def test_heavy_hitter_words_tiny_corpus_exact_fallback(ray_session,
                                                       tmp_path):
    """A corpus too small for ANY legal sketch threshold (T floors to 0)
    must return the oracle-defined exact answer — every word — instead
    of raising; the SQL oracle defines a result for all inputs."""
    import collections

    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.stages import dataset_prep as dp

    texts = ["tiny corpus of very few words",
             "tiny again", ""]  # n_total << MG_T_DIV -> threshold 0
    pq2.write_table(
        pa2.table({"doc_id": list(range(len(texts))), "text": texts}),
        tmp_path / "documents.parquet",
    )
    counts = collections.Counter(
        w for t in texts for w in t.split(" ") if w
    )
    df = dp.heavy_hitter_words(str(tmp_path)).to_pandas()
    assert dict(zip(df["w"], df["n"])) == dict(counts)
    # the squeezed-capacity call takes the same fallback (no capacity
    # could guarantee T=0, so an explicit tiny k is not a caller error)
    df2 = dp.heavy_hitter_words(str(tmp_path), k=2).to_pandas()
    assert dict(zip(df2["w"], df2["n"])) == dict(counts)


def test_corpus_diff_planted(ray_session, tmp_path):
    """added/removed/common counts on a constructed pair of snapshots."""
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    h1 = "alpha beta gamma delta epsilon"   # common (both sides)
    h2 = "one two three four five"          # removed (old only)
    h3 = "six seven eight nine ten"         # added (new only, twice)
    docs = [
        (0, "src0", f"{h1} old"),
        (1, "src1", f"{h2} old"),
        (2, "src10", f"{h1} new"),
        (3, "src11", f"{h3} new a"),
        (4, "src12", f"{h3} new b"),  # same added fingerprint: counted once
    ]
    pq2.write_table(
        pa2.table(
            {"doc_id": [d[0] for d in docs],
             "source": [d[1] for d in docs],
             "text": [d[2] for d in docs]}
        ),
        tmp_path / "documents.parquet",
    )
    from prlib_ray.stages.dedup import corpus_diff

    df = corpus_diff(str(tmp_path)).to_pandas()
    got = dict(zip(df["status"], df["n_fingerprints"]))
    assert got == {"added": 1, "removed": 1, "common": 1}


def test_snapshot_diff_constructed(ray_session, tmp_path):
    """Per-id FULL OUTER reconciliation vs an independent dict-based
    brute force on ids 0..45: pins that added wins over changed when
    both rules hit (id 38: % 7 == 3 AND % 11 == 5), that a removed
    clone coexists with its changed base (id 27: % 11 == 5 AND
    % 13 == 1), and the per-source breakdown."""
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.stages.dataset_prep import (
        SNAP_ADDED_MOD, SNAP_ADDED_RES, SNAP_CHANGED_MOD, SNAP_CHANGED_RES,
        SNAP_REMOVED_MOD, SNAP_REMOVED_RES, snapshot_diff)

    ids = list(range(46))
    src = ["srcA" if i % 2 == 0 else "srcB" for i in ids]
    txt = [f"document body {i}" for i in ids]
    pq2.write_table(
        pa2.table({"doc_id": pa2.array(ids, type=pa2.int64()),
                   "text": txt, "source": src}),
        tmp_path / "documents.parquet")

    # independent brute force over the same mod rules
    want: dict[tuple[str, str], int] = {}
    for i in ids:
        if i % SNAP_ADDED_MOD == SNAP_ADDED_RES:
            st = "added"          # absent from OLD entirely
        elif i % SNAP_CHANGED_MOD == SNAP_CHANGED_RES:
            st = "changed"        # both sides, text revised in NEW
        else:
            st = "unchanged"
        want[(src[i], st)] = want.get((src[i], st), 0) + 1
        if i % SNAP_REMOVED_MOD == SNAP_REMOVED_RES:
            # the stale clone exists ONLY in OLD
            k = (src[i], "removed")
            want[k] = want.get(k, 0) + 1

    # the overlap cases are live in this id range
    assert 38 % SNAP_ADDED_MOD == SNAP_ADDED_RES
    assert 38 % SNAP_CHANGED_MOD == SNAP_CHANGED_RES
    assert 27 % SNAP_CHANGED_MOD == SNAP_CHANGED_RES
    assert 27 % SNAP_REMOVED_MOD == SNAP_REMOVED_RES

    df = snapshot_diff(str(tmp_path)).to_pandas()
    got = {(r.source, r.status): int(r.n) for r in df.itertuples()}
    assert got == want


def test_pagerank_docs_constructed(ray_session, tmp_path):
    """Integer PageRank on a 12-node synthesized graph must equal the
    straight-line per-edge reference (same floor arithmetic, same
    (rank DESC, id ASC) top-k order), and the rank spread must be real
    (the graph is non-regular, so ranks cannot all be equal)."""
    import pyarrow as pa2

    from prlib_ray.stages.graph import (
        PR_ADD, PR_BASE, PR_DAMP_DEN, PR_DAMP_NUM, PR_ITERS, PR_MULT,
        PR_SCALE, PR_TOPK, pagerank_docs)

    n = 12
    pq.write_table(pa2.table({
        "doc_id": pa2.array(list(range(n)), type=pa2.int64()),
        "text": pa2.array(["x"] * n, type=pa2.string()),
    }), tmp_path / "documents.parquet")

    r = np.full(n, PR_SCALE, dtype=np.int64)
    for _ in range(PR_ITERS):
        nxt = np.full(n, PR_BASE, dtype=np.int64)
        for i in range(n):
            deg = 1 + i % 3
            c = (PR_DAMP_NUM * r[i]) // (PR_DAMP_DEN * deg)
            for j in range(deg):
                nxt[(i * PR_MULT[j] + PR_ADD[j]) % n] += c
        r = nxt
    o = np.lexsort((np.arange(n), -r))[:PR_TOPK]

    out = pagerank_docs(str(tmp_path)).to_pandas()
    assert np.array_equal(out["doc_id"].to_numpy(), o)
    assert np.array_equal(out["pr"].to_numpy(), r[o])
    assert out["pr"].nunique() > 1  # non-regular graph -> real spread


def test_conv_structure_audit_constructed(ray_session, tmp_path):
    """Per-conversation metrics on a hand corpus must equal an
    independent per-turn brute force (same md5 role rule, doc_id turn
    order), including at least one adjacent same-role violation."""
    import pyarrow as pa2

    from prlib_ray.stages.boilerplate import EXACT_NCONV
    from prlib_ray.stages.dataset_prep import (
        CONV_ROLE_B1, CONV_ROLE_B2, CONV_ROLE_SALT, conv_structure_audit)

    n = 120  # > EXACT_NCONV so conversations have multi-turn runs
    texts = [f"turn {i} " + "w" * (i % 7) for i in range(n)]
    pq.write_table(pa2.table({
        "doc_id": pa2.array(list(range(n)), type=pa2.int64()),
        "text": pa2.array(texts, type=pa2.string()),
    }), tmp_path / "documents.parquet")

    def role(i: int) -> int:
        h = hashlib.md5(f"{CONV_ROLE_SALT}{i}".encode()).hexdigest()[:2]
        return 0 if h < CONV_ROLE_B1 else (1 if h < CONV_ROLE_B2 else 2)

    convs: dict[int, list[int]] = {}
    for i in range(n):
        convs.setdefault(i % EXACT_NCONV, []).append(i)
    want = {}
    for c, ids in convs.items():
        roles = [role(i) for i in ids]  # ids already ascending
        chars = [len(texts[i]) for i in ids]
        viol = sum(1 for a, b in zip(roles, roles[1:]) if a == b)
        want[c] = (len(ids), viol, sum(1 for x in roles if x == 2),
                   sum(chars), max(chars))
    assert sum(v[1] for v in want.values()) > 0  # violations non-vacuous

    out = conv_structure_audit(str(tmp_path)).to_pandas()
    assert list(out["conv_id"]) == sorted(want)
    for _, row in out.iterrows():
        assert want[int(row["conv_id"])] == (
            int(row["n_turns"]), int(row["n_role_violations"]),
            int(row["n_tool_turns"]), int(row["total_chars"]),
            int(row["max_turn_chars"]))


def test_anchor_text_stats_constructed(ray_session, tmp_path):
    """n = 17 makes the first affine arm degenerate (17*i % 17 == 0, so
    every arm-0 edge lands on node 7): the engine must equal the
    per-edge brute force including multi-inlink concentration AND
    zero-inlink nodes emitting (0, 0, 0) rows."""
    import pyarrow as pa2

    from prlib_ray.stages.graph import (ANCHOR_WORDS, PR_ADD, PR_MULT,
                                        anchor_text_stats)

    n = 17
    texts = [" ".join(f"w{i}x{j}" for j in range(i % 9)) for i in range(n)]
    pq.write_table(pa2.table({
        "doc_id": pa2.array(list(range(n)), type=pa2.int64()),
        "text": pa2.array(texts, type=pa2.string()),
    }), tmp_path / "documents.parquet")

    def alen(s: str) -> int:
        return len(" ".join(s.split(" ")[:ANCHOR_WORDS]))

    want = {i: [0, set(), 0] for i in range(n)}
    for i in range(n):
        for j in range(1 + i % 3):
            d = (i * PR_MULT[j] + PR_ADD[j]) % n
            want[d][0] += 1
            want[d][1].add(i)
            want[d][2] += alen(texts[i])
    assert any(v[0] == 0 for v in want.values())  # zero-inlink exists
    assert any(v[0] > len(v[1]) for v in want.values())  # parallel edges

    out = (anchor_text_stats(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(out["doc_id"]) == list(range(n))
    for _, r in out.iterrows():
        w = want[int(r["doc_id"])]
        assert (int(r["n_inlinks"]), int(r["n_sources"]),
                int(r["sum_anchor_chars"])) == (w[0], len(w[1]), w[2])


def test_web_curate_cross_checks_components(registry, ray_session, sf_dir):
    """The funnel's stage totals must equal the standalone operators it
    composes: n_gopher == gopher_quality's pass count, n_prior == the
    passing docs whose pagerank_ranks rank clears the prior threshold,
    n_final additionally requires the anchor_text_stats inlink floor —
    and every stage weakly reduces per source with a strict reduction
    in total (non-vacuous gates)."""
    queries, _ = registry
    df = queries["web_curate"](sf_dir).to_pandas()
    assert (df["n_docs"] >= df["n_gopher"]).all()
    assert (df["n_gopher"] >= df["n_prior"]).all()
    assert (df["n_prior"] >= df["n_final"]).all()
    tot = df[["n_docs", "n_gopher", "n_prior", "n_final"]].sum()
    assert tot["n_docs"] > tot["n_gopher"] > tot["n_prior"] > tot["n_final"]

    from prlib_ray.pipelines.curate import WEB_MIN_INLINKS, WEB_PRIOR_MIN
    from prlib_ray.stages.graph import anchor_text_stats, pagerank_ranks

    g = queries["gopher_quality"](sf_dir).to_pandas()
    assert int(tot["n_gopher"]) == int(g["passes"].sum())
    ranks = pagerank_ranks(sf_dir).to_pandas().set_index("node")["r"]
    passing = set(g[g["passes"] == 1]["doc_id"])
    prior = {d for d in passing if int(ranks.loc[d]) >= WEB_PRIOR_MIN}
    assert int(tot["n_prior"]) == len(prior)
    inl = anchor_text_stats(sf_dir).to_pandas().set_index("doc_id")
    final = {d for d in prior
             if int(inl.loc[d, "n_inlinks"]) >= WEB_MIN_INLINKS}
    assert int(tot["n_final"]) == len(final)


def test_conv_extract_digest_detects_misordering(ray_session, sf_dir):
    """The digest is the ordering check: recomputing it from the
    per-turn extraction rows in the CORRECT order reproduces it, and
    swapping any two turns of a multi-turn conversation changes it."""
    import hashlib as _h

    from prlib_ray.stages.boilerplate import extract_exact_batch
    from prlib_ray.stages.dataset_prep import conv_extract_digest

    t = pq.read_table(sf_dir + "/documents.parquet",
                      columns=["doc_id", "text"])
    rows = extract_exact_batch(t).to_pandas()
    out = conv_extract_digest(sf_dir).to_pandas().set_index("conv_id")
    swapped = 0
    for conv, g in rows.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        texts = list(g["clean_text"])
        want = _h.md5("\n".join(texts).encode()).hexdigest()
        assert out.loc[conv, "digest"] == want
        assert int(out.loc[conv, "n_turns"]) == len(texts)
        if len(texts) >= 2 and texts[0] != texts[1]:
            bad = _h.md5(
                "\n".join([texts[1], texts[0]] + texts[2:]).encode()
            ).hexdigest()
            assert bad != want
            swapped += 1
    assert swapped > 0  # the misordering check really fired


def test_pagerank_mass_audit_invariants(registry, ray_session, sf_dir):
    """The audit's whole point: node count is conserved through every
    iteration, total mass moves only by bounded floor loss (mass at
    t+1 is within N of damped mass + base mass), and the final max
    equals pagerank_docs' top rank."""
    queries, _ = registry
    from prlib_ray.stages.graph import (PR_BASE, PR_DAMP_DEN, PR_DAMP_NUM,
                                        PR_ITERS)

    df = queries["pagerank_mass_audit"](sf_dir).to_pandas()
    assert list(df["iteration"]) == list(range(PR_ITERS + 1))
    n = df["n_nodes"].iloc[0]
    assert (df["n_nodes"] == n).all()
    for t in range(1, PR_ITERS + 1):
        prev = int(df["total_mass"].iloc[t - 1])
        cur = int(df["total_mass"].iloc[t])
        ideal = n * PR_BASE + PR_DAMP_NUM * prev // PR_DAMP_DEN
        # floor division loses < 1 per EDGE (<= 3 per node) plus the
        # damped-mass rounding; never gains
        assert ideal - 4 * n <= cur <= ideal
    top = queries["pagerank_docs"](sf_dir).to_pandas()
    assert int(df["max_rank"].iloc[-1]) == int(top["pr"].max())


def _tiny_docs(tmp_path, n):
    import pyarrow as pa2

    pq.write_table(pa2.table({
        "doc_id": pa2.array(list(range(n)), type=pa2.int64()),
        "text": pa2.array(["x"] * n, type=pa2.string()),
    }), tmp_path / "documents.parquet")


def _brute_edges(n, closure=False):
    """Straight-line directed edge list of the synthesized graph."""
    from prlib_ray.stages.graph import PR_ADD, PR_MULT, TRI_PLANT_MOD

    out = []
    for i in range(n):
        for j in range(1 + i % 3):
            out.append((i, (i * PR_MULT[j] + PR_ADD[j]) % n))
    if closure:
        for i in range(0, n, TRI_PLANT_MOD):
            out += [(i, (i + 1) % n), ((i + 1) % n, (i + 2) % n),
                    (i, (i + 2) % n)]
    return out


def test_crawl_frontier_depth_constructed(ray_session, tmp_path):
    """BFS depths on a 200-node graph (3 seeds) must equal a
    straight-line BFS, with a real multi-level frontier."""
    from prlib_ray.stages.graph import (BFS_ITERS, BFS_SEED_MOD,
                                        crawl_frontier_depth)

    n = 200
    _tiny_docs(tmp_path, n)
    out_adj = {}
    for u, v in _brute_edges(n):
        out_adj.setdefault(u, []).append(v)
    depth = {s: 0 for s in range(0, n, BFS_SEED_MOD)}
    frontier = sorted(depth)
    for t in range(1, BFS_ITERS + 1):
        nxt = []
        for u in frontier:
            for v in out_adj.get(u, ()):
                if v not in depth:
                    depth[v] = t
                    nxt.append(v)
        frontier = nxt

    df = crawl_frontier_depth(str(tmp_path)).to_pandas()
    got = dict(zip(df["doc_id"], df["depth"]))
    assert got == depth
    assert len(set(depth.values())) == BFS_ITERS + 1  # real frontier


def test_triangle_count_constructed(ray_session, tmp_path):
    """The wedge-join census on a 70-node graph must equal the
    straight-line adjacency-set count, with planted triangles > 0."""
    from prlib_ray.stages.graph import triangle_count

    n = 70
    _tiny_docs(tmp_path, n)
    eu = {(min(u, v), max(u, v))
          for u, v in _brute_edges(n, closure=True) if u != v}
    adj = {}
    for u, v in eu:
        adj.setdefault(u, set()).add(v)
    wedges = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())
    tri = 0
    for u, s in adj.items():
        sl = sorted(s)
        for i in range(len(sl)):
            for k in range(i + 1, len(sl)):
                if sl[k] in adj.get(sl[i], ()):
                    tri += 1

    df = triangle_count(str(tmp_path)).to_pandas()
    assert int(df["n_edges"].iloc[0]) == len(eu)
    assert int(df["n_wedges"].iloc[0]) == wedges
    assert int(df["n_triangles"].iloc[0]) == tri
    assert tri > 0  # the planted closure arm fired


def test_reciprocity_and_indegree_constructed(ray_session, tmp_path):
    """Reciprocity census + in-degree histogram on a 60-node graph
    must equal the straight-line sets."""
    from prlib_ray.stages.graph import indegree_histogram, link_reciprocity

    n = 60
    _tiny_docs(tmp_path, n)
    edges = _brute_edges(n)
    ed = set(edges)
    n_self = sum(1 for u, v in ed if u == v)
    n_recip = sum(1 for u, v in ed if u < v and (v, u) in ed)

    df = link_reciprocity(str(tmp_path)).to_pandas()
    assert int(df["n_edges_distinct"].iloc[0]) == len(ed)
    assert int(df["n_self_loops"].iloc[0]) == n_self
    assert int(df["n_reciprocal"].iloc[0]) == n_recip

    indeg = np.zeros(n, dtype=int)
    for _, v in edges:  # parallel edges count (multiplicity)
        indeg[v] += 1
    want = {d: int(c) for d, c in
            zip(*np.unique(indeg, return_counts=True))}
    hf = indegree_histogram(str(tmp_path)).to_pandas()
    got = dict(zip(hf["indeg"], hf["n_nodes"]))
    assert got == want
    assert len(got) > 1  # non-regular in-degree


def test_extract_turn_spans_reconstruct(registry, ray_session, sf_dir):
    """Spans must tile each turn's clean_text exactly: n_spans ==
    n_content, consecutive spans separated by exactly one '\\n' char,
    last span_end == len(clean_text), and each span slices the kept
    line it describes."""
    queries, _ = registry
    sp = queries["extract_turn_spans"](sf_dir).to_pandas()
    ex = queries["extract_turns_exact"](sf_dir).to_pandas()
    clean = {(r.conv_id, r.turn_idx): r.clean_text for r in ex.itertuples()}
    n_content = {(r.conv_id, r.turn_idx): int(r.n_content)
                 for r in ex.itertuples()}

    got_counts: dict = {}
    checked_slices = 0
    for key, g in sp.groupby(["conv_id", "turn_idx"]):
        g = g.sort_values("span_idx")
        got_counts[key] = len(g)
        txt = clean[key]
        starts = g["span_start"].to_numpy()
        ends = g["span_end"].to_numpy()
        assert starts[0] == 0
        assert (starts[1:] == ends[:-1] + 1).all()  # one '\n' between
        assert ends[-1] == len(txt)
        for s, e in zip(starts, ends):
            assert "\n" not in txt[s:e]  # a span is exactly one line
            checked_slices += 1
    for key, n in n_content.items():
        assert got_counts.get(key, 0) == n
    assert checked_slices > 100  # non-vacuous


def test_hits_scores_constructed(ray_session, tmp_path):
    """Integer HITS on a 90-node graph must equal the straight-line
    scatter/gather reference (same unrolled rounds, same (authority
    DESC, id ASC) top-k), with a real authority spread."""
    from prlib_ray.stages.graph import (HITS_ITERS, HITS_SCALE, HITS_TOPK,
                                        hits_scores)

    n = 90
    _tiny_docs(tmp_path, n)
    edges = _brute_edges(n)
    src = np.array([u for u, _ in edges], dtype=np.int64)
    dst = np.array([v for _, v in edges], dtype=np.int64)
    h = np.full(n, HITS_SCALE, dtype=np.int64)
    for _ in range(HITS_ITERS):
        a = np.zeros(n, dtype=np.int64)
        np.add.at(a, dst, h[src])
        h = np.zeros(n, dtype=np.int64)
        np.add.at(h, src, a[dst])
    o = np.lexsort((np.arange(n), -a))[:HITS_TOPK]

    out = hits_scores(str(tmp_path)).to_pandas()
    assert np.array_equal(out["doc_id"].to_numpy(), o)
    assert np.array_equal(out["authority"].to_numpy(), a[o])
    assert np.array_equal(out["hub"].to_numpy(), h[o])
    # real spread across the graph (the top-k itself may tie-plateau)
    assert len(np.unique(a)) > 1 and len(np.unique(h)) > 1
