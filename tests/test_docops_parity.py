"""Doc-op families (normalize/denoise/furniture/quality/thinning/crop):
batch functions must exactly match their DuckDB oracles."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from prlib_ray.api_ext import _DOC_OPS


@pytest.fixture(scope="module")
def docs(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con


@pytest.mark.parametrize("name,fn,sql", _DOC_OPS, ids=[n for n, _, _ in _DOC_OPS])
def test_doc_op_matches_oracle(name, fn, sql, docs, con):
    mine = fn(docs).to_pandas()
    sort_cols = [c for c in ("doc_id", "bidx") if c in mine.columns]
    mine = mine.sort_values(sort_cols).reset_index(drop=True)
    oracle = (
        con.execute(sql).df()[mine.columns.tolist()]
        .sort_values(sort_cols)
        .reset_index(drop=True)
    )
    assert len(mine) == len(oracle)
    for c in mine.columns:
        a, b = mine[c], oracle[c]
        if a.dtype != b.dtype:
            a, b = a.astype(str), b.astype(str)
        assert a.equals(b), f"{name}: column {c} differs"


def test_edge_cases_no_crash():
    """Empty text, single word, huge doc — every op stays total."""
    tbl = pa.table(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["", "word", "a  b", "x " * 2000],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [0] * 4,
        }
    )
    for name, fn, _ in _DOC_OPS:
        out = fn(tbl)
        assert out.num_rows >= 4 or name in ("denoise_kuwahara", "wiener_filter"), name
