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
