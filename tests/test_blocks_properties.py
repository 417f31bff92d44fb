"""Property tests (hypothesis) for the block substrate — the layer every
oracle-exactness guarantee rests on."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from prlib_ray.blocks import (
    BlockFrame,
    join_kept,
    split_words_blocks,
    window_mean_var,
    window_sum,
)

texts_strategy = st.lists(
    st.text(
        alphabet=st.sampled_from("ab -=_xyz0189"),
        max_size=60,
    ),
    min_size=1,
    max_size=8,
)


@given(texts=texts_strategy, wpb=st.integers(1, 5))
@settings(max_examples=60, deadline=None)
def test_split_words_blocks_roundtrip(texts, wpb):
    """Rejoining every block with spaces reproduces the exact input text."""
    frame = split_words_blocks(texts, wpb)
    offs = frame.doc_offsets
    for d, t in enumerate(texts):
        blocks = frame.block_strings()[offs[d] : offs[d + 1]]
        assert " ".join(blocks) == t


@given(texts=texts_strategy, wpb=st.integers(1, 4),
       prec=st.integers(0, 3), foll=st.integers(0, 3))
@settings(max_examples=60, deadline=None)
def test_window_stats_match_naive(texts, wpb, prec, foll):
    """Prefix-sum window stats == brute-force per-block computation."""
    frame = split_words_blocks(texts, wpb)
    m, v, s = window_mean_var(frame, prec, foll)
    offs = frame.doc_offsets
    x = frame.x
    for d in range(frame.ndocs):
        lo, hi = offs[d], offs[d + 1]
        for i in range(lo, hi):
            w = x[max(lo, i - prec) : min(hi, i + foll + 1)].astype(np.float64)
            mu = w.sum() / len(w)
            var = max((w * w).sum() / len(w) - mu * mu, 0.0)
            assert m[i] == mu
            assert v[i] == var
            assert s[i] == np.sqrt(var)


@given(texts=texts_strategy, wpb=st.integers(1, 4))
@settings(max_examples=40, deadline=None)
def test_window_sum_counts(texts, wpb):
    frame = split_words_blocks(texts, wpb)
    sm, cnt = window_sum(frame.x, frame, 10**6, 10**6)
    # an unbounded window covers exactly the document
    offs = frame.doc_offsets
    for d in range(frame.ndocs):
        lo, hi = offs[d], offs[d + 1]
        assert (cnt[lo:hi] == hi - lo).all()
        assert (sm[lo:hi] == frame.x[lo:hi].sum()).all()


@given(texts=texts_strategy, wpb=st.integers(1, 4), seed=st.integers(0, 99))
@settings(max_examples=40, deadline=None)
def test_join_kept_subset(texts, wpb, seed):
    frame = split_words_blocks(texts, wpb)
    rng = np.random.RandomState(seed)
    keep = rng.rand(frame.nblocks) < 0.5
    out = join_kept(frame, keep)
    offs = frame.doc_offsets
    for d in range(frame.ndocs):
        expected = "\n".join(
            frame.block_strings()[i] for i in range(offs[d], offs[d + 1]) if keep[i]
        )
        assert out[d] == expected


@given(texts=texts_strategy)
@settings(max_examples=40, deadline=None)
def test_extract_turn_vectorized_equals_scalar(texts):
    """The Arrow kernel and the scalar golden path agree on arbitrary
    (adversarial) inputs, not just the synthesized fixtures."""
    from prlib_ray.stages.boilerplate import (
        _extract_batch_vectorized,
        extract_turn,
    )

    cleans, spans = _extract_batch_vectorized(texts)
    for i, t in enumerate(texts):
        c, sp = extract_turn(t)
        assert c == cleans[i]
        assert sp == spans[i]


# ---------------------------------------------------------------------------
# run-boundary kernels (reassemble.py) vs per-group brute force


events_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),        # user_id (few users -> collisions)
        st.integers(0, 50),       # ts (as int; duplicates likely)
        st.integers(0, 1_000),    # event_id (may duplicate across users)
    ),
    min_size=1,
    max_size=60,
)


def _frame(rows):
    import pandas as pd

    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id"])
    # event ids unique within the frame (the table's real invariant)
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    return df.sample(frac=1.0, random_state=7).reset_index(drop=True)


@given(rows=events_strategy)
@settings(max_examples=60, deadline=None)
def test_runs_directions_match_per_group_brute_force(rows):
    """_runs + _directions over a user-lexsorted frame == the per-user
    scan the old per-group implementation did."""
    from prlib_ray.stages.reassemble import _directions, _runs

    g = _frame(rows)
    user = g["user_id"].to_numpy().astype(np.int64)
    ts = g["ts"].to_numpy().astype(np.int64)
    eid = g["event_id"].to_numpy().astype(np.int64)
    order = np.lexsort((eid, user))
    u_s, t_s = user[order], ts[order]
    run, starts, lens = _runs(u_s)
    d = _directions(u_s, t_s, run, starts, lens)
    got = dict(zip(u_s[starts].tolist(), d.tolist()))

    expect = {}
    for uid, grp in g.groupby("user_id"):
        grp = grp.sort_values("event_id", kind="mergesort")
        t = grp["ts"].to_numpy()
        if len(t) < 2:
            expect[int(uid)] = 1
        else:
            inc = int((t[1:] >= t[:-1]).sum())
            expect[int(uid)] = 1 if inc >= (len(t) - 1) - inc else -1
    assert got == expect


@given(rows=events_strategy, gap=st.integers(1, 20))
@settings(max_examples=60, deadline=None)
def test_sessionize_kernel_matches_per_user(rows, gap):
    """The coarse sessionize pass == per-user sorted gap counting."""
    from prlib_ray.stages.reassemble import _runs

    g = _frame(rows)
    user = g["user_id"].to_numpy().astype(np.int64)
    ts = g["ts"].to_numpy().astype(np.int64)
    order = np.lexsort((ts, user))
    u_s, t_s = user[order], ts[order]
    run, starts, lens = _runs(u_s)
    n = np.ones(len(starts), dtype=np.int64)
    if len(u_s) > 1:
        same = u_s[1:] == u_s[:-1]
        gapped = (t_s[1:] - t_s[:-1] > gap) & same
        n += np.bincount(run[1:][same], weights=gapped[same],
                         minlength=len(starts)).astype(np.int64)
    got = dict(zip(u_s[starts].tolist(), n.tolist()))

    expect = {}
    for uid, grp in g.groupby("user_id"):
        t = np.sort(grp["ts"].to_numpy())
        expect[int(uid)] = 1 + int((np.diff(t) > gap).sum())
    assert got == expect


@given(
    weights=st.lists(st.integers(0, 10_000), min_size=1, max_size=80),
    k=st.integers(1, 10),
)
@settings(max_examples=60, deadline=None)
def test_weighted_sample_local_topk_merge_is_lossless(weights, k):
    """Merging per-chunk top-K candidate sets can never change the
    global top-K under the (key, doc_id) order — the invariant the
    distributed weighted_sample relies on."""
    import hashlib

    ids = np.arange(len(weights), dtype=np.int64)
    w = np.maximum(np.asarray(weights, dtype=np.int64), 1)
    h32 = np.asarray(
        [int(hashlib.md5(f"wsample:{i}".encode()).hexdigest()[:8], 16)
         for i in ids],
        dtype=np.int64,
    )
    key = (h32 * 1_000_000) // w
    full = np.lexsort((ids, key))[:k]

    # split into arbitrary chunks, take per-chunk top-k, merge
    chunks = np.array_split(np.arange(len(ids)), 3)
    cand_i, cand_k = [], []
    for c in chunks:
        if len(c) == 0:
            continue
        o = np.lexsort((ids[c], key[c]))[:k]
        cand_i.append(ids[c][o])
        cand_k.append(key[c][o])
    ci = np.concatenate(cand_i)
    ck = np.concatenate(cand_k)
    o = np.lexsort((ci, ck))[:k]
    assert ci[o].tolist() == ids[full].tolist()


@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1,
             max_size=400),
    st.integers(min_value=2, max_value=8),
    st.integers(min_value=1, max_value=6),
)
@settings(max_examples=80, deadline=None)
def test_mg_two_level_no_false_negatives(stream, k, n_chunks):
    """The Misra-Gries guarantee heavy_hitter_words relies on: after
    per-batch truncation AND an arbitrary sequence of bounded fold
    merges (_mg_merge), every item with true count > 2n/(k+1) is still
    in the candidate set — for ANY stream and ANY chunking (the
    mergeable-summaries bound does not grow with merge count)."""
    import collections

    from prlib_ray.stages.dataset_prep import _mg_merge, _mg_truncate

    words = np.asarray([f"w{x}" for x in stream], dtype=object)
    n = len(words)
    true = collections.Counter(words.tolist())

    # level 1: per-batch unique+truncate (what sketch_partial does)
    acc: list[str] = []
    for chunk in np.array_split(words, min(n_chunks, n)):
        if len(chunk) == 0:
            continue
        uniq, cnt = np.unique(chunk, return_counts=True)
        kw, kc = _mg_truncate(uniq, cnt.astype(np.int64), k)
        # level 2: sequential bounded fold merge (the AggregateFn path)
        acc = _mg_merge(acc, kw, kc, k)

    assert len(acc) <= k  # the memory bound itself
    survivors = {s.split(":", 1)[1] for s in acc}
    bound = 2 * n / (k + 1)
    for w, c in true.items():
        if c > bound:
            assert w in survivors, (w, c, bound, sorted(survivors))
