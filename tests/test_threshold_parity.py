"""Threshold family: numpy implementation must exactly match the DuckDB oracle.

This is the repo-local version of the driver's correctness gate: every
rule's ``clean_text`` must be byte-identical per doc_id.
"""

from __future__ import annotations

import duckdb
import pyarrow.parquet as pq
import pytest

from prlib_ray.oracles import binarize_sql
from prlib_ray.stages.threshold import RULES, binarize_batch


@pytest.fixture(scope="module")
def docs(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con


@pytest.mark.parametrize("rule", sorted(RULES))
def test_rule_matches_oracle(rule, docs, con):
    mine = (
        binarize_batch(docs, rule)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    oracle = con.execute(binarize_sql(rule)).df().sort_values("doc_id").reset_index(drop=True)
    assert len(mine) == len(oracle)
    assert mine["clean_text"].equals(oracle["clean_text"]), (
        f"{rule}: {(mine['clean_text'] != oracle['clean_text']).sum()} diffs"
    )


def test_batch_split_invariance(docs):
    """Result must not depend on how rows are batched (pure per-doc op)."""
    whole = binarize_batch(docs, "sauvola").to_pandas()
    n = len(docs)
    parts = [
        binarize_batch(docs.slice(0, n // 3), "sauvola"),
        binarize_batch(docs.slice(n // 3, n // 3), "sauvola"),
        binarize_batch(docs.slice(2 * (n // 3)), "sauvola"),
    ]
    import pandas as pd

    split = pd.concat([p.to_pandas() for p in parts], ignore_index=True)
    assert whole.equals(split)


def test_vectorized_local_otsu_matches_scalar_reference():
    """The segment-sorted prefix-sum Otsu must agree with the scalar
    per-region _otsu_threshold spec on randomized block features."""
    import numpy as np

    from prlib_ray.blocks import BlockFrame
    from prlib_ray.stages.threshold import _otsu_threshold, _rule_local_otsu

    rng = np.random.RandomState(11)
    for trial in range(20):
        ndocs = rng.randint(1, 8)
        counts = rng.randint(1, 23, size=ndocs)
        offs = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
        x = rng.randint(0, 12, size=int(offs[-1])).astype(np.int64)
        frame = BlockFrame(doc_offsets=offs, blocks=[], x=x)
        got = _rule_local_otsu(frame, None, None, None, {"region_blocks": 5})
        # scalar reference: per (doc, region) threshold then x > t
        want = np.zeros(len(x), dtype=bool)
        bidx = frame.block_idx_within_doc()
        doc = frame.doc_of_block()
        for d in range(ndocs):
            for r in range(int(bidx[offs[d + 1] - 1] // 5) + 1):
                sel = np.flatnonzero((doc == d) & (bidx // 5 == r))
                if len(sel):
                    t = _otsu_threshold(x[sel])
                    want[sel] = x[sel] > t
        assert (got == want).all(), f"trial {trial} differs"
