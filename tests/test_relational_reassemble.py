"""Reassembly + relational core vs DuckDB oracles, through live Ray."""

from __future__ import annotations

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

CASES = [
    "reassemble_events",
    "find_angle",
    "find_orientation",
    "rotate",
    "deskew",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_local_supplier",
    "orders_by_segment",
    "top_orders",
    "distinct_event_types",
    "events_hourly_window",
    "sessionize",
    "asof_latest_order",
    "top_orders_per_segment",
    "range_join_recent_orders",
    "set_ops_users_customers",
    "embedding_centroids",
    "dedup_cc_clusters",
    "dedup_survivors",
]


def test_hll_relative_error(ray_session, sf_dir):
    """HLL approx distinct within the sketch's expected error of the
    exact distinct-user count (m=4096 -> sigma ~1.6%; bound at 5%)."""
    import duckdb

    from prlib_ray.relational import approx_distinct_users

    approx = approx_distinct_users(sf_dir)["approx_distinct"][0].as_py()
    exact = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()[0]
    assert abs(approx - exact) <= max(0.05 * exact, 2), (approx, exact)


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def registry():
    from prlib_ray.api import build_queries

    return build_queries()


@pytest.mark.parametrize("name", CASES)
def test_matches_oracle(name, con, registry, ray_session, sf_dir):
    queries, sql = registry
    out = queries[name](sf_dir)
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    odf = con.execute(sql[name]).df()
    cols = sorted(df.columns)
    assert cols == sorted(odf.columns), f"{name}: schema mismatch"
    a = df[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b), f"{name}: rowcount {len(a)} vs {len(b)}"
    for c in cols:
        x, y = a[c], b[c]
        if x.dtype != y.dtype:
            x, y = x.astype(str), y.astype(str)
        assert x.equals(y), f"{name}: column {c} differs"


def _normalize(res):
    import pandas as pd

    if hasattr(res, "to_pandas") and not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    return res.sort_values(list(res.columns)).reset_index(drop=True)


@pytest.mark.parametrize("fn_name", ["asof_latest_order",
                                     "range_join_recent_orders"])
def test_probe_join_partitioned_equals_broadcast(ray_session, sf_dir, fn_name):
    """The co-partitioned (10^12-row) layout must produce the exact
    integers of the broadcast layout."""
    from prlib_ray import relational as rel

    fn = getattr(rel, fn_name)
    bc = _normalize(fn(sf_dir, via="broadcast"))
    part = _normalize(fn(sf_dir, via="partitioned"))
    assert bc.equals(part), f"{fn_name}: partitioned != broadcast"


def test_probe_join_auto_gate(ray_session, sf_dir, monkeypatch):
    """via='auto' flips to the partitioned layout above the row-count
    threshold and stays exact."""
    from prlib_ray import relational as rel

    base = _normalize(rel.asof_latest_order(sf_dir, via="broadcast"))
    monkeypatch.setattr(rel, "FACT_BROADCAST_MAX_ROWS", 1)
    auto = _normalize(rel.asof_latest_order(sf_dir))  # now partitioned
    assert base.equals(auto)
