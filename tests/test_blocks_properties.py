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
