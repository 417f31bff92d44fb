"""Property tests for the twentieth-session kernels: the BPE greedy
merge pass, the CDC chunker, and the prefix-filter completeness bound —
each checked against a straight-line per-word Python reference."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from prlib_ray.stages.dedup import CDC_GEAR_MOD, _cdc_chunks_batch
from prlib_ray.stages.text_analysis import _bpe_apply_merge

words_strategy = st.lists(
    st.text(alphabet=st.sampled_from("aabbc"), min_size=1, max_size=10),
    min_size=1,
    max_size=12,
)


def _ref_merge(word: str | list[str], left: str, right: str) -> list[str]:
    syms = list(word) if isinstance(word, str) else word
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@given(words=words_strategy,
       left=st.sampled_from("abc"), right=st.sampled_from("abc"))
@settings(max_examples=120, deadline=None)
def test_bpe_apply_merge_matches_greedy(words, left, right):
    lens = np.fromiter(map(len, words), dtype=np.int64, count=len(words))
    sym = np.array(list("".join(words)), dtype=object)
    wid = np.repeat(np.arange(len(words), dtype=np.int64), lens)
    owid, osym = _bpe_apply_merge(wid, sym, left, right)
    got = [list(osym[owid == k]) for k in range(len(words))]
    ref = [_ref_merge(w, left, right) for w in words]
    assert got == ref


texts_strategy = st.lists(
    st.text(alphabet=st.sampled_from("ab c d "), max_size=40),
    min_size=1,
    max_size=6,
)


def _ref_chunks(text: str) -> list[str]:
    words = [w for w in text.split(" ") if w != ""]
    out, cur = [], []
    for w in words:
        cur.append(w)
        if int.from_bytes(
            hashlib.md5(w.encode()).digest()[:8], "little"
        ) % CDC_GEAR_MOD == 0:
            out.append(" ".join(cur))
            cur = []
    if cur:
        out.append(" ".join(cur))
    return out


@given(texts=texts_strategy)
@settings(max_examples=80, deadline=None)
def test_cdc_chunker_matches_per_word_reference(texts):
    b = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    ch, did, cid, nw = _cdc_chunks_batch(b)
    got: dict[int, list[str]] = {}
    for h, d in zip(ch, did):
        got.setdefault(int(d), []).append(h)
    for i, t in enumerate(texts):
        ref = [hashlib.md5(c.encode()).hexdigest() for c in _ref_chunks(t)]
        assert got.get(i, []) == ref, (i, t)
    # chunk word counts tile the doc's word count
    for i, t in enumerate(texts):
        total = sum(int(n) for n, d in zip(nw, did) if int(d) == i)
        assert total == len([w for w in t.split(" ") if w != ""])


@given(
    sets=st.lists(
        st.frozensets(st.integers(0, 30), min_size=1, max_size=12),
        min_size=2,
        max_size=8,
    )
)
@settings(max_examples=80, deadline=None)
def test_prefix_bound_complete_for_half_jaccard(sets):
    """The AllPairs prefix length p = n - ceil(n/2) + 1 is a complete
    filter at J >= 1/2: for every qualifying pair, the global-order
    smallest common element lies in BOTH prefixes (the invariant
    prefix_filter_join's candidate generation rests on)."""
    # global order: ascending integer (stands in for the (df, sid) order
    # — any total order satisfies the bound)
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            inter = len(a & b)
            uni = len(a | b)
            if uni == 0 or 2 * inter < uni:
                continue
            sa = sorted(a)
            sb = sorted(b)
            pa_ = len(sa) - (len(sa) + 1) // 2 + 1
            pb_ = len(sb) - (len(sb) + 1) // 2 + 1
            m = min(a & b)
            assert m in sa[:pa_], (a, b)
            assert m in sb[:pb_], (a, b)
