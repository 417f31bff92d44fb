"""Reassembly + relational core vs DuckDB oracles, through live Ray."""

from __future__ import annotations

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

CASES = [
    "bloom_semi_join",
    "orders_with_late_items",
    "fulfillment_latency",
    "user_path_topk",
    "basket_part_pairs",
    "customer_running_total",
    "q14_promo_revenue",
    "q13_custdist",
    "q18_large_orders",
    "q10_returned_revenue",
    "trade_volume",
    "q17_small_quantity",
    "q15_top_supplier",
    "global_sales_opportunity",
    "q19_disjunctive_revenue",
    "q21_waiting_suppliers",
    "q8_market_share",
    "q11_important_stock",
    "q20_excess_parts",
    "q16_supplier_cnt",
    "column_drift_tvd",
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q12_shipmode_priority",
    "q4_order_priority",
    "profile_columns",
    "utf8_hygiene",
    "price_rank_ntile",
    "pareto_orders",
    "rolling_active_users",
    "followed_within",
    "price_zscore_outliers",
    "fk_orphan_audit",
    "brand_supplier_counts",
    "user_stickiness",
    "key_skew_profile",
    "hot_keys",
    "props_field_stats",
    "funnel_conversion",
    "retention_cohorts",
    "interarrival_profile",
    "reassemble_events",
    "find_angle",
    "find_orientation",
    "rotate",
    "deskew",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_local_supplier",
    "orders_by_segment",
    "sales_rollup",
    "top_orders",
    "distinct_event_types",
    "events_hourly_window",
    "sessionize",
    "rolling_event_window",
    "event_transitions",
    "sampled_quantiles",
    "asof_latest_order",
    "top_orders_per_segment",
    "range_join_recent_orders",
    "set_ops_users_customers",
    "embedding_centroids",
    "dedup_cc_clusters",
    "dedup_survivors",
]


def test_rolling_window_peers_and_boundaries(ray_session, tmp_path):
    """RANGE-window semantics on constructed events: equal-timestamp
    peers count each other, the window is CLOSED at exactly -1h, events
    past the hour fall out, and users never see each other."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(3_600_000_000, "us")
    rows = [
        # user 1: t0, a peer at t0, one at exactly t0+1h (includes both
        # earlier), one at t0+2h+1us (window has only itself)
        (0, 1, base, 1.00),
        (1, 1, base, 2.00),
        (2, 1, base + h, 4.00),
        (3, 1, base + 2 * h + np.timedelta64(1, "us"), 8.00),
        # user 2: inside user 1's time range but isolated from it
        (4, 2, base, 16.00),
    ]
    pq.write_table(
        pa.table({
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "ts": pa.array([r[2].astype("datetime64[us]").item()
                            for r in rows],
                           type=pa.timestamp("us")),
            "value": pa.array([r[3] for r in rows], type=pa.float64()),
        }),
        tmp_path / "events.parquet",
    )
    from prlib_ray.relational import rolling_event_window

    df = (
        rolling_event_window(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert df["trailing_count"].tolist() == [2, 2, 3, 1, 1]
    assert df["trailing_cents"].tolist() == [300, 300, 700, 800, 1600]


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
                                     "range_join_recent_orders",
                                     "trade_volume",
                                     "global_sales_opportunity",
                                     "customers_without_orders"])
def test_probe_join_partitioned_equals_broadcast(ray_session, sf_dir, fn_name):
    """The co-partitioned (10^12-row) layout must produce the exact
    integers of the broadcast layout."""
    from prlib_ray import relational as rel

    fn = getattr(rel, fn_name)
    bc = _normalize(fn(sf_dir, via="broadcast"))
    part = _normalize(fn(sf_dir, via="partitioned"))
    assert bc.equals(part), f"{fn_name}: partitioned != broadcast"


def test_trade_volume_auto_gate(ray_session, sf_dir, monkeypatch):
    """trade_volume's via='auto' flips to the fully co-partitioned
    dimension attach above the summed dimension row-count threshold and
    stays exact."""
    from prlib_ray import relational as rel

    base = _normalize(rel.trade_volume(sf_dir, via="broadcast"))
    monkeypatch.setattr(rel, "FACT_BROADCAST_MAX_ROWS", 1)
    auto = _normalize(rel.trade_volume(sf_dir))  # now partitioned
    assert base.equals(auto)


def test_probe_join_auto_gate(ray_session, sf_dir, monkeypatch):
    """via='auto' flips to the partitioned layout above the row-count
    threshold and stays exact."""
    from prlib_ray import relational as rel

    base = _normalize(rel.asof_latest_order(sf_dir, via="broadcast"))
    monkeypatch.setattr(rel, "FACT_BROADCAST_MAX_ROWS", 1)
    auto = _normalize(rel.asof_latest_order(sf_dir))  # now partitioned
    assert base.equals(auto)


def test_fk_orphan_audit_auto_gate(ray_session, sf_dir, monkeypatch):
    """fk_orphan_audit's via='auto' flips from the no-shuffle broadcast
    anti-probe to the one-shuffle edge-tagged copart layout above the
    summed parent row-count threshold, byte-equal."""
    from prlib_ray import relational as rel

    base = _normalize(rel.fk_orphan_audit(sf_dir, via="broadcast"))
    cop = _normalize(rel.fk_orphan_audit(sf_dir, via="copart"))
    assert base.equals(cop)
    monkeypatch.setattr(rel, "FACT_BROADCAST_MAX_ROWS", 1)
    auto = _normalize(rel.fk_orphan_audit(sf_dir))  # now copart
    assert base.equals(auto)


def test_skew_profile_and_hot_keys_constructed(ray_session, tmp_path):
    """Bucket histogram and top-K on hand-built group sizes, including
    a count tie at the K boundary (broken by the smaller user_id)."""
    import numpy as np
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    # user u repeated sizes[u] times; sizes chosen to straddle buckets:
    # 1 -> bucket 0, 2/3 -> bucket 1, 4..7 -> bucket 2, 8 -> bucket 3
    sizes = {1: 1, 2: 2, 3: 3, 4: 4, 5: 7, 6: 8}
    users = np.concatenate(
        [np.full(n, u, dtype=np.int64) for u, n in sizes.items()]
    )
    ts = np.arange(len(users), dtype=np.int64).astype("datetime64[us]")
    pq2.write_table(
        pa2.table(
            {
                "event_id": pa2.array(range(len(users)), type=pa2.int64()),
                "ts": pa2.array(ts),
                "user_id": pa2.array(users),
                "event_type": pa2.array(["a"] * len(users)),
                "value": pa2.array([0.0] * len(users)),
                "props": pa2.array([""] * len(users)),
            }
        ),
        tmp_path / "events.parquet",
    )
    from prlib_ray.relational import hot_keys, key_skew_profile

    prof = key_skew_profile(str(tmp_path)).to_pandas()
    got = {
        int(r.bucket): (int(r.n_keys), int(r.n_rows))
        for r in prof.itertuples()
    }
    assert got == {0: (1, 1), 1: (2, 5), 2: (2, 11), 3: (1, 8)}

    hk = hot_keys(str(tmp_path)).to_pandas()
    # n DESC, user_id ASC: 8(u6), 7(u5), 4(u4), 3(u3), 2(u2), 1(u1)
    assert hk["user_id"].tolist() == [6, 5, 4, 3, 2, 1]
    assert hk["n_rows"].tolist() == [8, 7, 4, 3, 2, 1]


def test_props_field_stats_constructed(ray_session, tmp_path):
    """Extraction semantics on hand-built props: unparsable rows count
    in n_events but not n_with_k, negatives flow through sum/min, an
    int64-overflowing k mirrors TRY_CAST (NULL, not a crash) — leading
    zeros included — NULL event_type folds into '', and a type whose
    every row is unparsable gets NULL stats, not sentinels."""
    import pandas as pd
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    pq2.write_table(
        pa2.table(
            {
                "event_type": pa2.array(
                    ["a", "a", "a", "a", "b", "b", None, "c",
                     "d", "d", "d"]
                ),
                "props": pa2.array(
                    ['{"k": 5}', '{"k": -7}', "garbage",
                     '{"k": 99999999999999999999}',       # > int64: NULL
                     "", '{"k": 12}',
                     '{"k": 3}',                          # NULL type -> ''
                     "no k here",                         # all-NULL type
                     '{"k": 0009223372036854775807}',     # == max: casts
                     '{"k": -9223372036854775808}',       # == min: casts
                     '{"k": 9223372036854775808}']        # max+1: NULL
                ),
            }
        ),
        tmp_path / "events.parquet",
    )
    from prlib_ray.relational import props_field_stats

    df = props_field_stats(str(tmp_path)).to_pandas()
    rows = {
        r.event_type: (r.n_events, r.n_with_k, r.sum_k, r.min_k, r.max_k)
        for r in df.itertuples()
    }
    # small-int types: exact values (the overflow row counts in
    # n_events only — TRY_CAST semantics, not a crash)
    assert rows["a"] == (4, 2, -2, -7, 5)
    assert rows["b"] == (2, 1, 12, 12, 12)
    assert rows[""] == (1, 1, 3, 3, 3)
    # all-unparsable type: NULL stats, never sentinels
    c = rows["c"]
    assert c[:2] == (1, 0) and all(pd.isna(v) for v in c[2:])
    # int64 boundary: max and min cast (leading zeros included),
    # max+1 does not — count-level asserts (value columns go float64
    # in pandas once any NULL exists, so boundary values aren't
    # losslessly comparable here; the oracle parity test covers them)
    assert rows["d"][:2] == (3, 2)


def test_funnel_conversion_constructed(ray_session, tmp_path):
    """Strict earliest-event chaining: a click AT the first view's
    timestamp or BEFORE it never counts; the purchase must follow the
    first QUALIFYING click, not any click."""
    import numpy as np
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    base = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1_000_000, "us")  # 1 second
    rows = [
        # user 1: full funnel in order -> counts at every stage
        (1, base, "view"), (1, base + s, "click"),
        (1, base + 2 * s, "purchase"),
        # user 2: click at EXACTLY the first view's ts (strict > fails),
        # then nothing -> stage 1 only
        (2, base, "view"), (2, base, "click"),
        # user 3: click BEFORE the view, purchase after the view but
        # with no qualifying click -> stage 1 only
        (3, base, "click"), (3, base + s, "view"),
        (3, base + 2 * s, "purchase"),
        # user 4: purchase between view and the qualifying click ->
        # stages 1+2 (the purchase precedes the chained click)
        (4, base, "view"), (4, base + s, "purchase"),
        (4, base + 2 * s, "click"),
        # user 5: never views -> no stage
        (5, base, "click"), (5, base + s, "purchase"),
    ]
    pq2.write_table(
        pa2.table({
            "event_id": pa2.array(range(len(rows)), type=pa2.int64()),
            "ts": pa2.array([r[1].astype("datetime64[us]").item()
                             for r in rows], type=pa2.timestamp("us")),
            "user_id": pa2.array([r[0] for r in rows], type=pa2.int64()),
            "event_type": pa2.array([r[2] for r in rows]),
            "value": pa2.array([0.0] * len(rows)),
            "props": pa2.array([""] * len(rows)),
        }),
        tmp_path / "events.parquet",
    )
    from prlib_ray.relational import funnel_conversion

    df = funnel_conversion(str(tmp_path)).to_pandas()
    assert df["stage"].tolist() == [1, 2, 3]
    assert df["event_type"].tolist() == ["view", "click", "purchase"]
    assert df["n_users"].tolist() == [4, 2, 1]


def test_funnel_conversion_no_funnel_events(ray_session, tmp_path):
    """A corpus with zero funnel-type events still reports one row per
    stage with zero counts (parity with the SQL VALUES oracle)."""
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    pq2.write_table(
        pa2.table({
            "event_id": pa2.array([0, 1], type=pa2.int64()),
            "ts": pa2.array([0, 1], type=pa2.timestamp("us")),
            "user_id": pa2.array([1, 2], type=pa2.int64()),
            "event_type": pa2.array(["login", "scroll"]),
            "value": pa2.array([0.0, 0.0]),
            "props": pa2.array(["", ""]),
        }),
        tmp_path / "events.parquet",
    )
    from prlib_ray.relational import funnel_conversion

    df = funnel_conversion(str(tmp_path)).to_pandas()
    assert df["stage"].tolist() == [1, 2, 3]
    assert df["n_users"].tolist() == [0, 0, 0]


def test_retention_cohorts_constructed(ray_session, tmp_path):
    """Cohorts are first-ACTIVE-day; offsets count exact-day returns
    (several events on one day count once; a return on a non-offset day
    counts toward nothing; cohort-offset cells with no returners are
    absent, mirroring the oracle's inner join)."""
    import numpy as np
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    day = np.timedelta64(86_400_000_000, "us")
    h = np.timedelta64(5, "h")
    base = np.datetime64("2024-01-01T00:00:00", "us")
    rows = [
        # user 1: days 0 (twice), 1, 7
        (1, base), (1, base + h), (1, base + day), (1, base + 7 * day),
        # user 2: day 0 only
        (2, base),
        # user 3: cohort day 2; returns on days 3 / 5 / 9 (offsets
        # 1 / 3 / 7) and on day 6 (matches no offset)
        (3, base + 2 * day), (3, base + 3 * day), (3, base + 5 * day),
        (3, base + 6 * day), (3, base + 9 * day),
    ]
    pq2.write_table(
        pa2.table({
            "event_id": pa2.array(range(len(rows)), type=pa2.int64()),
            "ts": pa2.array([r[1].astype("datetime64[us]").item()
                             for r in rows], type=pa2.timestamp("us")),
            "user_id": pa2.array([r[0] for r in rows], type=pa2.int64()),
            "event_type": pa2.array(["view"] * len(rows)),
            "value": pa2.array([0.0] * len(rows)),
            "props": pa2.array([""] * len(rows)),
        }),
        tmp_path / "events.parquet",
    )
    from prlib_ray.relational import DAY_US, retention_cohorts

    df = retention_cohorts(str(tmp_path)).to_pandas()
    d0 = int(base.astype(np.int64) // DAY_US)
    got = {
        (int(r.cohort_day), int(r.day_offset)): int(r.n_users)
        for r in df.itertuples()
    }
    assert got == {
        (d0, 0): 2, (d0, 1): 1, (d0, 7): 1,
        (d0 + 2, 0): 1, (d0 + 2, 1): 1, (d0 + 2, 3): 1, (d0 + 2, 7): 1,
    }


def test_retention_cohorts_pre1970_floor(ray_session, tmp_path):
    """Day bucketing FLOORS on negative epochs on BOTH sides: numpy //
    floors, and the oracle uses an explicit float floor (DuckDB integer
    // truncates toward zero and would disagree) — a 1969 event lands
    in day -1, not day 0, and both sides say so."""
    import duckdb as dd
    import numpy as np
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    rows = [
        # user 9: cohort day -1 (1969-12-31 noon), returns next day
        (9, np.datetime64("1969-12-31T12:00:00", "us")),
        (9, np.datetime64("1970-01-01T12:00:00", "us")),
    ]
    pq2.write_table(
        pa2.table({
            "event_id": pa2.array(range(len(rows)), type=pa2.int64()),
            "ts": pa2.array([r[1].astype("datetime64[us]").item()
                             for r in rows], type=pa2.timestamp("us")),
            "user_id": pa2.array([r[0] for r in rows], type=pa2.int64()),
            "event_type": pa2.array(["view"] * len(rows)),
            "value": pa2.array([0.0] * len(rows)),
            "props": pa2.array([""] * len(rows)),
        }),
        tmp_path / "events.parquet",
    )
    from prlib_ray.oracles_rel import RETENTION_COHORTS
    from prlib_ray.relational import retention_cohorts

    df = retention_cohorts(str(tmp_path)).to_pandas()
    got = {(int(r.cohort_day), int(r.day_offset)): int(r.n_users)
           for r in df.itertuples()}
    assert got == {(-1, 0): 1, (-1, 1): 1}

    con = dd.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    odf = con.execute(RETENTION_COHORTS).df()
    ogot = {(int(r.cohort_day), int(r.day_offset)): int(r.n_users)
            for r in odf.itertuples()}
    assert ogot == got


def test_bloom_semi_join_planted_fp_and_empty_build(ray_session, tmp_path):
    """Constructed bloom behavior: (a) a non-member key CHOSEN so all its
    positions collide with build-set bits passes the filter (n_pass >
    n_true — the FP tail is real and flows through the survivor join);
    (b) true members always pass (no false negatives); (c) a segment
    with zero build keys passes nothing but keeps per-status totals."""
    import numpy as np
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import (
        BLOOM_BITS_PER_KEY, _bloom_positions, bloom_semi_join,
    )

    build = np.arange(1, 41, dtype=np.int64)  # 40 member keys
    m = 1 << max(BLOOM_BITS_PER_KEY * len(build) - 1, 63).bit_length()
    bits = set(_bloom_positions(build, m).reshape(-1).tolist())
    # deterministic FP hunt: first non-member key whose every position
    # is already set (md5 is fixed, so this key is stable)
    fp_key = None
    for k in range(1000, 200000):
        if all(p in bits for p in _bloom_positions(
                np.asarray([k], dtype=np.int64), m)[0]):
            fp_key = k
            break
    assert fp_key is not None, "no FP key below 200k — widen the scan"
    # a non-member that does NOT pass (first miss)
    tn_key = next(
        k for k in range(1000, 200000)
        if not all(p in bits for p in _bloom_positions(
            np.asarray([k], dtype=np.int64), m)[0])
    )
    pq2.write_table(pa2.table({
        "c_custkey": pa2.array(build.tolist() + [fp_key, tn_key],
                               type=pa2.int64()),
        "c_mktsegment": pa2.array(["BUILDING"] * len(build)
                                  + ["OTHER", "OTHER"]),
    }), tmp_path / "customer.parquet")
    ok = [1, 2, fp_key, tn_key]
    pq2.write_table(pa2.table({
        "o_orderkey": pa2.array(range(len(ok)), type=pa2.int64()),
        "o_custkey": pa2.array(ok, type=pa2.int64()),
        "o_orderstatus": pa2.array(["O"] * len(ok)),
    }), tmp_path / "orders.parquet")

    df = bloom_semi_join(str(tmp_path)).to_pandas()
    row = df[df.o_orderstatus == "O"].iloc[0]
    assert int(row.n_orders) == 4
    assert int(row.n_true) == 2       # both members pass (no false neg)
    assert int(row.n_pass) == 3       # + the planted FP, not the miss

    empty = bloom_semi_join(str(tmp_path), segment="NOSUCH").to_pandas()
    row = empty[empty.o_orderstatus == "O"].iloc[0]
    assert (int(row.n_orders), int(row.n_pass), int(row.n_true)) == (4, 0, 0)


def test_interarrival_profile_buckets(ray_session, tmp_path):
    """Constructed gap spectrum: sub-second gaps land in bucket -1,
    exact powers of two land in their own bucket (closed at 2^k),
    equal-timestamp ties contribute a zero gap, and gaps never cross
    user boundaries."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1_000_000, "us")
    half = np.timedelta64(500_000, "us")
    rows = [
        # user 1: gaps 0.5s (bucket -1), 1s (bucket 0), 3s (bucket 1)
        (1, base),
        (1, base + half),
        (1, base + half + s),
        (1, base + half + 4 * s),
        # user 2: one 1024s gap (bucket 10); the cross-user "gap" from
        # user 1's last event must NOT be counted
        (2, base),
        (2, base + 1024 * s),
        # user 3: equal-timestamp tie (gap 0 -> bucket -1), then 2s
        (3, base + 7 * s),
        (3, base + 7 * s),
        (3, base + 9 * s),
    ]
    pq.write_table(
        pa.table({
            "event_id": pa.array(range(len(rows)), type=pa.int64()),
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1].astype("datetime64[us]").item()
                            for r in rows], type=pa.timestamp("us")),
        }),
        tmp_path / "events.parquet",
    )
    from prlib_ray.relational import interarrival_profile

    df = interarrival_profile(str(tmp_path)).to_pandas()
    got = dict(zip(df.bucket.astype(int), df.n_gaps.astype(int)))
    assert got == {-1: 2, 0: 1, 1: 2, 10: 1}


def test_orders_with_late_items_constructed(ray_session, tmp_path):
    """EXISTS semantics on hand-built facts: an order with two late
    items counts ONCE, exactly +60 days is NOT late (strict >), +60
    days +1us is, orphan lineitems drop, and an order with no
    lineitems never counts."""
    import numpy as np
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    base = np.datetime64("2024-01-01T00:00:00", "us")
    day = np.timedelta64(86_400_000_000, "us")
    us = np.timedelta64(1, "us")

    def ts(x):
        return x.astype("datetime64[us]").item()

    pq2.write_table(pa2.table({
        "o_orderkey": pa2.array([1, 2, 3, 4, 5], type=pa2.int64()),
        "o_orderdate": pa2.array([ts(base)] * 5, type=pa2.timestamp("us")),
        "o_orderpriority": pa2.array(["1-URGENT", "1-URGENT", "2-HIGH",
                                      "2-HIGH", "3-LOW"]),
    }), tmp_path / "orders.parquet")
    li = [
        (1, base + 61 * day),        # late
        (1, base + 90 * day),        # late again -> still one order
        (2, base + 60 * day),        # boundary: NOT late (strict >)
        (3, base + 60 * day + us),   # 1us past boundary: late
        (4, base + 5 * day),         # on time
        (99, base + 300 * day),      # orphan key: dropped
        # order 5 has no lineitems
    ]
    pq2.write_table(pa2.table({
        "l_orderkey": pa2.array([k for k, _ in li], type=pa2.int64()),
        "l_shipdate": pa2.array([ts(t) for _, t in li],
                                type=pa2.timestamp("us")),
    }), tmp_path / "lineitem.parquet")

    from prlib_ray.relational import orders_with_late_items

    df = orders_with_late_items(str(tmp_path)).to_pandas()
    got = dict(zip(df.o_orderpriority, df.n_orders.astype(int)))
    assert got == {"1-URGENT": 1, "2-HIGH": 1}


def test_fulfillment_latency_buckets_constructed(ray_session, tmp_path):
    """Bucket contract on hand-built facts: -2 for a negative gap, -1
    same-day (including 23h59m), 0 for [1, 2) days, 2 for [4, 8) days,
    and orphan lineitems drop."""
    import numpy as np
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    base = np.datetime64("2024-01-01T00:00:00", "us")
    day = np.timedelta64(86_400_000_000, "us")
    hour = np.timedelta64(3_600_000_000, "us")

    def ts(x):
        return x.astype("datetime64[us]").item()

    pq2.write_table(pa2.table({
        "o_orderkey": pa2.array([1, 2, 3, 4, 5], type=pa2.int64()),
        "o_orderdate": pa2.array([ts(base)] * 5, type=pa2.timestamp("us")),
    }), tmp_path / "orders.parquet")
    li = [
        (1, base - 1 * hour),        # negative gap -> bucket -2
        (1, base + 23 * hour),       # same day -> -1
        (2, base + 1 * day),         # exactly 1 day -> bucket 0
        (3, base + 5 * day),         # [4, 8) -> bucket 2
        (4, base + 7 * day + hour),  # still [4, 8) -> bucket 2
        (99, base + 2 * day),        # orphan -> dropped
    ]
    pq2.write_table(pa2.table({
        "l_orderkey": pa2.array([k for k, _ in li], type=pa2.int64()),
        "l_shipdate": pa2.array([ts(t) for _, t in li],
                                type=pa2.timestamp("us")),
    }), tmp_path / "lineitem.parquet")
    from prlib_ray.relational import fulfillment_latency

    df = fulfillment_latency(str(tmp_path)).to_pandas()
    rows = dict(zip(df["bucket"], df["n_items"]))
    assert rows == {-2: 1, -1: 1, 0: 1, 2: 2}


def test_user_path_topk_constructed(ray_session, tmp_path):
    """Entry-path semantics on hand-built events: only the first
    PATH_PREFIX_LEN events count (user 1's 4th event is ignored),
    equal timestamps order by event_id, users in DIFFERENT coarse
    parts sharing a path merge, and ties rank path-ASC."""
    import numpy as np
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import user_path_topk
    from prlib_ray.stages.reassemble import N_REASSEMBLE_PARTS

    base = 1_700_000_000_000_000  # us epoch
    # users 1 and 1 + N_REASSEMBLE_PARTS land in different parts but
    # share the path a>b>c; user 2 has a same-ts tie ordered by
    # event_id; user 3 has only 2 events (short path b>a)
    rows = [
        (10, base + 1, 1, "a"), (11, base + 2, 1, "b"),
        (12, base + 3, 1, "c"), (13, base + 4, 1, "zzz"),  # cut
        (20, base + 1, 1 + N_REASSEMBLE_PARTS, "a"),
        (21, base + 2, 1 + N_REASSEMBLE_PARTS, "b"),
        (22, base + 3, 1 + N_REASSEMBLE_PARTS, "c"),
        (30, base + 5, 2, "b"), (31, base + 5, 2, "a"),  # tie: 30<31
        (32, base + 6, 2, "c"),
        (40, base + 1, 3, "b"), (41, base + 2, 3, "a"),
    ]
    pq2.write_table(pa2.table({
        "event_id": pa2.array([r[0] for r in rows], type=pa2.int64()),
        "ts": pa2.array(
            [np.datetime64(r[1], "us").item() for r in rows],
            type=pa2.timestamp("us"),
        ),
        "user_id": pa2.array([r[2] for r in rows], type=pa2.int64()),
        "event_type": pa2.array([r[3] for r in rows], type=pa2.string()),
    }), tmp_path / "events.parquet")

    df = user_path_topk(str(tmp_path)).to_pandas()
    rows_out = list(zip(df["path"], df["n_users"]))
    assert rows_out == [("a>b>c", 2), ("b>a", 1), ("b>a>c", 1)]


def test_basket_part_pairs_constructed(ray_session, tmp_path):
    """Support semantics on hand-built baskets: a duplicated lineitem
    (same order, same part twice) counts ONCE; a part pair supported
    by two orders beats singletons; under-threshold pairs (support 1)
    drop; part_a < part_b by key."""
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import basket_part_pairs

    li = [
        (1, 100), (1, 200), (1, 200),   # basket 1: {100, 200} (dup row)
        (2, 100), (2, 200),             # basket 2: {100, 200}
        (3, 100), (3, 300),             # {100, 300} -> support 1 each
        (4, 300),                       # singleton basket
    ]
    pq2.write_table(pa2.table({
        "l_orderkey": pa2.array([a for a, _ in li], type=pa2.int64()),
        "l_partkey": pa2.array([b for _, b in li], type=pa2.int64()),
    }), tmp_path / "lineitem.parquet")

    df = basket_part_pairs(str(tmp_path)).to_pandas()
    rows = list(zip(df["part_a"], df["part_b"], df["support"]))
    assert rows == [(100, 200, 2)]


def test_customer_running_total_constructed(ray_session, tmp_path):
    """Cumulative frame on hand-built orders: same-date ties order by
    orderkey, runs reset per customer, and customers in different
    coarse parts never mix."""
    import numpy as np
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import customer_running_total

    base = np.datetime64("2024-01-01T00:00:00", "us")
    day = np.timedelta64(86_400_000_000, "us")

    def ts(x):
        return x.astype("datetime64[us]").item()

    #            ok  ck  date        price
    rows = [
        (5, 1, base + 1 * day, 10.00),   # ck1 #2 (later date)
        (2, 1, base, 5.00),              # ck1 #1 (earliest)
        (9, 1, base + 1 * day, 2.50),    # same date as ok5 -> ok asc: 5 then 9
        (3, 2, base, 100.00),            # ck2 #1
    ]
    pq2.write_table(pa2.table({
        "o_orderkey": pa2.array([r[0] for r in rows], type=pa2.int64()),
        "o_custkey": pa2.array([r[1] for r in rows], type=pa2.int64()),
        "o_orderdate": pa2.array([ts(r[2]) for r in rows],
                                 type=pa2.timestamp("us")),
        "o_totalprice": pa2.array([r[3] for r in rows],
                                  type=pa2.float64()),
    }), tmp_path / "orders.parquet")

    df = (customer_running_total(str(tmp_path)).to_pandas()
          .sort_values("o_orderkey").reset_index(drop=True))
    got = {int(r.o_orderkey): (int(r.running_cents), int(r.order_seq))
           for r in df.itertuples()}
    assert got == {2: (500, 1), 5: (1500, 2), 9: (1750, 3),
                   3: (10000, 1)}


def test_q14_promo_revenue_constructed(ray_session, tmp_path):
    """Promo-share semantics on hand-built facts: only in-window
    lineitems count (boundary: HI is exclusive, LO inclusive), the
    promo flag is exact string equality, unknown-part lineitems drop,
    and the permille floors."""
    import numpy as np
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import Q14_LO, q14_promo_revenue

    lo = np.datetime64(Q14_LO, "us")
    day = np.timedelta64(86_400_000_000, "us")

    def ts(x):
        return x.astype("datetime64[us]").item()

    pq2.write_table(pa2.table({
        "p_partkey": pa2.array([1, 2, 3], type=pa2.int64()),
        "p_type": pa2.array(["PROMO", "STANDARD", "PROMO large"]),
    }), tmp_path / "part.parquet")
    li = [
        (1, lo, 1.00, 0.0),             # promo, in window: 100 cents
        (2, lo + day, 2.00, 0.5),       # standard, in: 100 cents
        (1, lo - day, 9.00, 0.0),       # before LO -> out
        (1, lo + 30 * day, 9.00, 0.0),  # exactly HI -> out (exclusive)
        (3, lo, 9.00, 0.0),             # 'PROMO large' != 'PROMO': not promo
        (99, lo, 9.00, 0.0),            # unknown part -> drops
    ]
    pq2.write_table(pa2.table({
        "l_partkey": pa2.array([r[0] for r in li], type=pa2.int64()),
        "l_shipdate": pa2.array([ts(r[1]) for r in li],
                                type=pa2.timestamp("us")),
        "l_extendedprice": pa2.array([r[2] for r in li],
                                     type=pa2.float64()),
        "l_discount": pa2.array([r[3] for r in li], type=pa2.float64()),
    }), tmp_path / "lineitem.parquet")

    t = q14_promo_revenue(str(tmp_path))
    assert t["promo_cents"][0].as_py() == 100
    assert t["total_cents"][0].as_py() == 100 + 100 + 900
    assert t["promo_permille"][0].as_py() == (1000 * 100) // 1100


def test_brand_supplier_counts_constructed(ray_session, tmp_path):
    """COUNT-DISTINCT semantics on hand-built facts: the same supplier
    shipping the same (brand, size) through DIFFERENT parts counts
    once; different suppliers accumulate; unknown-part lineitems
    drop."""
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import brand_supplier_counts

    pq2.write_table(pa2.table({
        "p_partkey": pa2.array([1, 2, 3], type=pa2.int64()),
        "p_brand": pa2.array(["B1", "B1", "B2"]),
        "p_size": pa2.array([5, 5, 9], type=pa2.int32()),
    }), tmp_path / "part.parquet")
    li = [
        (1, 100),  # (B1, 5) via part 1
        (2, 100),  # same supplier, same (B1, 5) via part 2 -> once
        (1, 200),  # second supplier for (B1, 5)
        (3, 100),  # (B2, 9)
        (99, 300),  # unknown part -> drops
    ]
    pq2.write_table(pa2.table({
        "l_partkey": pa2.array([a for a, _ in li], type=pa2.int64()),
        "l_suppkey": pa2.array([b for _, b in li], type=pa2.int64()),
    }), tmp_path / "lineitem.parquet")

    df = brand_supplier_counts(str(tmp_path)).to_pandas()
    rows = set(zip(df["brand"], df["size"], df["n_suppliers"]))
    assert rows == {("B1", 5, 2), ("B2", 9, 1)}


def test_user_stickiness_constructed(ray_session, tmp_path):
    """DAU/WAU semantics on hand-built events: a user active twice the
    same day counts once in that day's DAU; active on two days of one
    week counts twice in dau_sum but once in WAU; the week boundary at
    day 7 splits; permille floors."""
    import numpy as np
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import user_stickiness

    day_us = 86_400_000_000
    #            user  day
    acts = [
        (1, 0), (1, 0),   # same day twice -> one DAU credit
        (1, 1),           # second day, same week
        (2, 1),
        (1, 7),           # next week
    ]
    rows = [(i, u, d * day_us + i) for i, (u, d) in enumerate(acts)]
    pq2.write_table(pa2.table({
        "event_id": pa2.array([r[0] for r in rows], type=pa2.int64()),
        "user_id": pa2.array([r[1] for r in rows], type=pa2.int64()),
        "ts": pa2.array(
            [np.datetime64(r[2], "us").item() for r in rows],
            type=pa2.timestamp("us"),
        ),
    }), tmp_path / "events.parquet")

    df = user_stickiness(str(tmp_path)).to_pandas()
    got = {int(r.week): (int(r.wau), int(r.dau_sum),
                         int(r.stickiness_permille))
           for r in df.itertuples()}
    # week 0: days {0: {1}, 1: {1, 2}} -> dau_sum 3, wau 2,
    # 1000*3 // 14 = 214; week 1: one user one day -> 1000 // 7 = 142
    assert got == {0: (2, 3, 214), 1: (1, 1, 142)}


def test_q13_custdist_constructed(ray_session, tmp_path):
    """Q13 LEFT-JOIN semantics on hand-built facts: a customer with no
    orders lands in the 0 bucket; excluded-status orders do not count
    (a customer with ONLY excluded orders also lands in 0); equal
    counts histogram together."""
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import CUSTDIST_EXCLUDE_STATUS, q13_custdist

    pq2.write_table(pa2.table({
        "c_custkey": pa2.array([1, 2, 3, 4], type=pa2.int64()),
    }), tmp_path / "customer.parquet")
    x = CUSTDIST_EXCLUDE_STATUS
    orders = [
        (1, "O"), (1, "O"),  # cust 1: 2 counted orders
        (2, "O"), (2, x),    # cust 2: 1 counted (one excluded)
        (3, x),              # cust 3: only excluded -> 0 bucket
        # cust 4: no orders at all -> 0 bucket
    ]
    pq2.write_table(pa2.table({
        "o_custkey": pa2.array([c for c, _ in orders], type=pa2.int64()),
        "o_orderstatus": pa2.array([s for _, s in orders]),
    }), tmp_path / "orders.parquet")

    df = q13_custdist(str(tmp_path)).to_pandas()
    got = dict(zip(df["n_orders"], df["n_customers"]))
    assert got == {0: 2, 1: 1, 2: 1}


def test_q18_large_orders_constructed(ray_session, tmp_path):
    """Q18 threshold semantics on hand-built facts: the quantity fold
    is exact across lineitems, the threshold is strict (>), orphan
    lineitems drop, orders without lineitems drop (inner-join parity),
    and the top-k orders by (price DESC, key ASC) with k smaller than
    the survivor count truncates deterministically."""
    import numpy as np
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import q18_large_orders

    ts = np.datetime64("1995-06-01", "us").item()
    pq2.write_table(pa2.table({
        "o_orderkey": pa2.array([10, 20, 30, 40], type=pa2.int64()),
        "o_orderdate": pa2.array([ts] * 4, type=pa2.timestamp("us")),
        "o_totalprice": pa2.array([5.0, 7.0, 7.0, 1.0], type=pa2.float64()),
    }), tmp_path / "orders.parquet")
    li = [
        (10, 2.0), (10, 1.5),  # 350 cents > 300 -> survives
        (20, 3.0), (20, 0.01),  # 301 > 300 -> survives
        (30, 3.0),             # exactly 300: strict > -> drops
        (99, 9.0),             # orphan lineitem -> drops
        # order 40: no lineitems -> drops
    ]
    pq2.write_table(pa2.table({
        "l_orderkey": pa2.array([k for k, _ in li], type=pa2.int64()),
        "l_quantity": pa2.array([q for _, q in li], type=pa2.float64()),
    }), tmp_path / "lineitem.parquet")

    t = q18_large_orders(str(tmp_path), min_qty_cents=300, k=10)
    df = t.to_pandas()
    got = list(zip(df["o_orderkey"], df["o_totalprice_cents"],
                   df["sum_qty_cents"]))
    # price DESC, key ASC: order 20 (700c) before 10 (500c)
    assert got == [(20, 700, 301), (10, 500, 350)]
    # k=1 truncates to the single highest-price survivor
    t1 = q18_large_orders(str(tmp_path), min_qty_cents=300, k=1)
    assert t1["o_orderkey"].to_pylist() == [20]


def test_q17_small_quantity_constructed(ray_session, tmp_path):
    """Q17 correlated-threshold semantics on hand-built facts: the 20%
    boundary is STRICT (a row at exactly 0.2*avg drops), single-row
    parts can never qualify (qty < 0.2*qty is false), and the revenue
    fold is exact cents."""
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import q17_small_quantity

    li = [
        # part 1: quantities 1, 9 -> avg 5, threshold 1 < 0.2*5 = 1?
        # strict: 1 < 1 false -> neither qualifies
        (1, 1.0, 10.0), (1, 9.0, 20.0),
        # part 2: quantities 1, 99 -> avg 50; 1 < 10 -> the 1 qualifies
        (2, 1.0, 7.0), (2, 99.0, 40.0),
        # part 3: single row -> never qualifies
        (3, 1.0, 99.0),
    ]
    pq2.write_table(pa2.table({
        "l_partkey": pa2.array([r[0] for r in li], type=pa2.int64()),
        "l_quantity": pa2.array([r[1] for r in li], type=pa2.float64()),
        "l_extendedprice": pa2.array([r[2] for r in li],
                                     type=pa2.float64()),
    }), tmp_path / "lineitem.parquet")

    t = q17_small_quantity(str(tmp_path))
    assert t["small_qty_revenue_cents"][0].as_py() == 700
    assert t["n_small_lineitems"][0].as_py() == 1


def test_q15_top_supplier_tie_complete(ray_session, tmp_path):
    """Q15 argmax semantics on hand-built facts: BOTH suppliers tied at
    the global max return (tie-complete), a lower total does not, and
    out-of-window lineitems never count."""
    import numpy as np
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import Q15_START, q15_top_supplier

    start = np.datetime64(Q15_START, "us")
    before = (start - np.timedelta64(1, "D")).astype(
        "datetime64[us]").item()
    inside = start.item()
    li = [
        (100, 5.0, inside), (100, 5.0, inside),   # supp 100: 1000 cents
        (200, 10.0, inside),                      # supp 200: 1000 -> tie
        (300, 9.0, inside),                       # supp 300: 900 -> loses
        (300, 50.0, before),                      # out of window
    ]
    pq2.write_table(pa2.table({
        "l_suppkey": pa2.array([r[0] for r in li], type=pa2.int64()),
        "l_extendedprice": pa2.array([r[1] for r in li],
                                     type=pa2.float64()),
        "l_discount": pa2.array([0.0] * len(li), type=pa2.float64()),
        "l_shipdate": pa2.array([r[2] for r in li],
                                type=pa2.timestamp("us")),
    }), tmp_path / "lineitem.parquet")
    pq2.write_table(pa2.table({
        "s_suppkey": pa2.array([100, 200, 300], type=pa2.int64()),
        "s_name": pa2.array(["SA", "SB", "SC"]),
    }), tmp_path / "supplier.parquet")

    df = q15_top_supplier(str(tmp_path)).to_pandas()
    got = list(zip(df["s_suppkey"], df["s_name"],
                   df["total_revenue_cents"]))
    assert got == [(100, "SA", 1000), (200, "SB", 1000)]


def test_q21_waiting_suppliers_constructed(ray_session, tmp_path):
    """Q21 quantifier semantics on hand-built facts: only 'F' orders
    count, the order needs >= 2 DISTINCT suppliers, EXACTLY ONE of
    them late (two late suppliers disqualify the order), a supplier
    late on several lineitems of one order counts once, orphan
    lineitems drop, and the top-k fold orders (numwait DESC,
    suppkey ASC)."""
    import numpy as np
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import q21_waiting_suppliers

    base = np.datetime64("1995-01-01", "us")
    late = (base + np.timedelta64(100, "D")).item()   # > 60 days
    ontime = (base + np.timedelta64(10, "D")).item()
    pq2.write_table(pa2.table({
        "o_orderkey": pa2.array([1, 2, 3, 4, 5], type=pa2.int64()),
        "o_orderdate": pa2.array([base.item()] * 5,
                                 type=pa2.timestamp("us")),
        "o_orderstatus": pa2.array(["F", "F", "F", "O", "F"]),
    }), tmp_path / "orders.parquet")
    li = [
        # order 1: supp 7 late (twice -> one count), supp 8 on time
        (1, 7, late), (1, 7, late), (1, 8, ontime),
        # order 2: both suppliers late -> disqualified (n_late = 2)
        (2, 7, late), (2, 8, late),
        # order 3: single supplier late -> disqualified (n_supp = 1)
        (3, 7, late),
        # order 4: would qualify but status 'O' -> drops
        (4, 9, late), (4, 8, ontime),
        # order 5: supp 9 late, supp 7 on time -> counts for 9
        (5, 9, late), (5, 7, ontime),
        # orphan lineitem -> drops
        (99, 9, late),
    ]
    pq2.write_table(pa2.table({
        "l_orderkey": pa2.array([r[0] for r in li], type=pa2.int64()),
        "l_suppkey": pa2.array([r[1] for r in li], type=pa2.int64()),
        "l_shipdate": pa2.array([r[2] for r in li],
                                type=pa2.timestamp("us")),
    }), tmp_path / "lineitem.parquet")
    pq2.write_table(pa2.table({
        "s_suppkey": pa2.array([7, 8, 9], type=pa2.int64()),
        "s_name": pa2.array(["s7", "s8", "s9"]),
    }), tmp_path / "supplier.parquet")

    t = q21_waiting_suppliers(str(tmp_path)).to_pandas()
    got = dict(zip(t["s_suppkey"], t["numwait"]))
    assert got == {7: 1, 9: 1}
    assert set(t["s_name"]) == {"s7", "s9"}
    # k=1 truncates at (numwait DESC, suppkey ASC): the tie at 1
    # resolves to suppkey 7
    t1 = q21_waiting_suppliers(str(tmp_path), k=1)
    assert t1["s_suppkey"].to_pylist() == [7]


def test_q21_missing_supplier_drops_before_topk(ray_session, tmp_path):
    """The winner-name attach is an INNER join: a waiting suppkey with
    no supplier row drops BEFORE the top-k cut, so the next supplier
    fills the slot (oracle JOIN-then-LIMIT parity)."""
    import numpy as np
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import q21_waiting_suppliers

    base = np.datetime64("1995-01-01", "us")
    late = (base + np.timedelta64(100, "D")).item()
    ontime = (base + np.timedelta64(10, "D")).item()
    # suppliers 7 and 9 each wait on one order; 7 < 9 so 7 would win
    # k=1 — but 7 has NO supplier row, so 9 must fill the slot
    pq2.write_table(pa2.table({
        "o_orderkey": pa2.array([1, 2], type=pa2.int64()),
        "o_orderdate": pa2.array([base.item()] * 2,
                                 type=pa2.timestamp("us")),
        "o_orderstatus": pa2.array(["F", "F"]),
    }), tmp_path / "orders.parquet")
    li = [(1, 7, late), (1, 8, ontime), (2, 9, late), (2, 8, ontime)]
    pq2.write_table(pa2.table({
        "l_orderkey": pa2.array([r[0] for r in li], type=pa2.int64()),
        "l_suppkey": pa2.array([r[1] for r in li], type=pa2.int64()),
        "l_shipdate": pa2.array([r[2] for r in li],
                                type=pa2.timestamp("us")),
    }), tmp_path / "lineitem.parquet")
    pq2.write_table(pa2.table({
        "s_suppkey": pa2.array([8, 9], type=pa2.int64()),
        "s_name": pa2.array(["s8", "s9"]),
    }), tmp_path / "supplier.parquet")

    t = q21_waiting_suppliers(str(tmp_path), k=1).to_pandas()
    assert t["s_suppkey"].tolist() == [9]
    assert t["s_name"].tolist() == ["s9"]


def test_q8_market_share_constructed(ray_session, tmp_path):
    """Q8 share semantics on hand-built facts: the share is integer
    floor permille, out-of-region customers don't contribute to either
    sum, and the target's own revenue counts in the total."""
    import numpy as np
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import TRADE_START, q8_market_share

    ship = np.datetime64(TRADE_START, "us") + np.timedelta64(30, "D")
    pq2.write_table(pa2.table({
        "r_regionkey": pa2.array([0, 1], type=pa2.int64()),
        "r_name": pa2.array(["IN", "OUT"]),
    }), tmp_path / "region.parquet")
    pq2.write_table(pa2.table({
        "n_nationkey": pa2.array([0, 1, 2], type=pa2.int64()),
        "n_name": pa2.array(["TGT", "OTH", "FAR"]),
        "n_regionkey": pa2.array([0, 0, 1], type=pa2.int64()),
    }), tmp_path / "nation.parquet")
    pq2.write_table(pa2.table({
        "s_suppkey": pa2.array([7, 8], type=pa2.int64()),
        "s_nationkey": pa2.array([0, 1], type=pa2.int64()),  # 7=TGT
    }), tmp_path / "supplier.parquet")
    pq2.write_table(pa2.table({
        "c_custkey": pa2.array([1, 2], type=pa2.int64()),
        "c_nationkey": pa2.array([1, 2], type=pa2.int64()),  # 1 in, 2 out
    }), tmp_path / "customer.parquet")
    pq2.write_table(pa2.table({
        "o_orderkey": pa2.array([10, 20], type=pa2.int64()),
        "o_custkey": pa2.array([1, 2], type=pa2.int64()),
    }), tmp_path / "orders.parquet")
    li = [
        # order 10 (in-region cust): TGT supplier 1.00, OTH supplier 2.00
        (10, 7, 1.00), (10, 8, 2.00),
        # order 20 (out-of-region): huge TGT revenue that must NOT count
        (20, 7, 999.00),
    ]
    pq2.write_table(pa2.table({
        "l_orderkey": pa2.array([r[0] for r in li], type=pa2.int64()),
        "l_suppkey": pa2.array([r[1] for r in li], type=pa2.int64()),
        "l_extendedprice": pa2.array([r[2] for r in li],
                                     type=pa2.float64()),
        "l_discount": pa2.array([0.0] * len(li), type=pa2.float64()),
        "l_shipdate": pa2.array([ship.item()] * len(li),
                                type=pa2.timestamp("us")),
    }), tmp_path / "lineitem.parquet")

    t = q8_market_share(str(tmp_path), region="IN",
                        nation="TGT").to_pandas()
    assert t["target_rev_cents"].tolist() == [100]
    assert t["total_rev_cents"].tolist() == [300]
    # floor permille: 1000*100//300 = 333
    assert t["share_permille"].tolist() == [333]


def test_followed_within_boundaries(ray_session, tmp_path):
    """Window-edge semantics on constructed events: equal timestamps
    are NOT 'after', exactly +1h IS in the window (closed right edge),
    past the hour is out, users never see each other, same-type pairs
    count (but never an event with itself), and every qualifying
    (a, b) pair counts — not distinct users."""
    import numpy as np
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import followed_within

    base = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(3_600_000_000, "us")
    rows = [
        # user 1: A at t0; B at t0 (equal — excluded), B at t0+1h
        # (edge — counts), B at t0+1h+1us (out)
        (1, "A", base),
        (1, "B", base),
        (1, "B", base + h),
        (1, "B", base + h + np.timedelta64(1, "us")),
        # user 2: B 1 min after user 1's A — isolated (no cross-user)
        (2, "B", base + np.timedelta64(60, "s")),
        # user 3: two A's 1 min apart -> one (A, A) pair, and the
        # pair (earlier A -> later A) only (no self, no backwards)
        (3, "A", base),
        (3, "A", base + np.timedelta64(60, "s")),
    ]
    pq2.write_table(pa2.table({
        "user_id": pa2.array([r[0] for r in rows], type=pa2.int64()),
        "event_type": pa2.array([r[1] for r in rows]),
        "ts": pa2.array([r[2].astype("datetime64[us]").item()
                         for r in rows], type=pa2.timestamp("us")),
    }), tmp_path / "events.parquet")

    df = followed_within(str(tmp_path)).to_pandas()
    got = {(r.trigger_type, r.target_type): r.n_pairs
           for r in df.itertuples()}
    # user 1: A->B edge pair only (equal-ts and past-hour excluded);
    # user 3: A->A once; user 1's B at t0 -> B at t0+1h is also a
    # B->B pair (edge), B t0+1h -> +1us pair is B->B within window
    assert got[("A", "B")] == 1
    assert got[("A", "A")] == 1
    assert got[("B", "B")] == 2
    assert ("B", "A") not in got


def test_price_zscore_outliers_exact_boundary(ray_session, tmp_path):
    """The z-score compare is strict and exact: a 9-vs-4 two-value
    status sits EXACTLY on 4*(n*x-s)^2 == 9*(n*ss - s^2) for the
    minority rows (algebra: 4m^2 = 9mk at m=9, k=4), so ZERO outliers;
    a 5-vs-1 layout puts the single far value beyond 1.5 sigma."""
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import price_zscore_outliers

    rows = []
    # status E: nine at 1.00, four at 3.00 -> minority exactly AT the
    # boundary (strict > means not outliers), majority well inside
    rows += [("E", 1.00)] * 9 + [("E", 3.00)] * 4
    # status G: five at 1.00, one at 9.99 -> 4*25 > 9*5 for the one
    rows += [("G", 1.00)] * 5 + [("G", 9.99)]
    pq2.write_table(pa2.table({
        "o_orderstatus": pa2.array([r[0] for r in rows]),
        "o_totalprice": pa2.array([r[1] for r in rows],
                                  type=pa2.float64()),
    }), tmp_path / "orders.parquet")

    t = price_zscore_outliers(str(tmp_path)).to_pandas()
    got = {r.o_orderstatus: (r.n_orders, r.n_outliers)
           for r in t.itertuples()}
    assert got == {"E": (13, 0), "G": (6, 1)}


def test_fk_orphan_audit_finds_real_orphans(ray_session, tmp_path):
    """Beyond the planted negative keys, REAL orphans count too: a
    lineitem referencing an unknown order/part/supplier and an order
    referencing an unknown customer each surface on their edge."""
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import FK_PLANT_ORPHANS, fk_orphan_audit

    pq2.write_table(pa2.table({
        "o_orderkey": pa2.array([1, 2], type=pa2.int64()),
        "o_custkey": pa2.array([10, 99], type=pa2.int64()),  # 99 orphan
    }), tmp_path / "orders.parquet")
    pq2.write_table(pa2.table({
        "c_custkey": pa2.array([10], type=pa2.int64()),
    }), tmp_path / "customer.parquet")
    pq2.write_table(pa2.table({
        "p_partkey": pa2.array([5], type=pa2.int64()),
    }), tmp_path / "part.parquet")
    pq2.write_table(pa2.table({
        "s_suppkey": pa2.array([7], type=pa2.int64()),
    }), tmp_path / "supplier.parquet")
    li = [
        (1, 5, 7),    # all parents exist
        (99, 5, 7),   # unknown order
        (1, 99, 7),   # unknown part
        (1, 5, 99),   # unknown supplier
    ]
    pq2.write_table(pa2.table({
        "l_orderkey": pa2.array([r[0] for r in li], type=pa2.int64()),
        "l_partkey": pa2.array([r[1] for r in li], type=pa2.int64()),
        "l_suppkey": pa2.array([r[2] for r in li], type=pa2.int64()),
    }), tmp_path / "lineitem.parquet")

    t = fk_orphan_audit(str(tmp_path)).to_pandas()
    got = {r.fk_edge: (r.n_rows, r.n_orphans) for r in t.itertuples()}
    p = FK_PLANT_ORPHANS
    assert got == {
        "lineitem->orders": (4 + p, 1 + p),
        "lineitem->part": (4 + p, 1 + p),
        "lineitem->supplier": (4 + p, 1 + p),
        "orders->customer": (2 + p, 1 + p),
    }


def _write_ps_dims(tmp_path, partkeys, suppkeys=(5,), nation_region=0):
    """Minimal dimension set for the synthesized-partsupp family: one
    region named Q11_REGION, one nation in it, suppliers in that
    nation, and the given partkeys."""
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import Q11_REGION

    pq2.write_table(pa2.table({
        "r_regionkey": pa2.array([nation_region], type=pa2.int64()),
        "r_name": pa2.array([Q11_REGION]),
    }), tmp_path / "region.parquet")
    pq2.write_table(pa2.table({
        "n_nationkey": pa2.array([0], type=pa2.int64()),
        "n_name": pa2.array(["NATION_0"]),
        "n_regionkey": pa2.array([nation_region], type=pa2.int64()),
    }), tmp_path / "nation.parquet")
    pq2.write_table(pa2.table({
        "s_suppkey": pa2.array(list(suppkeys), type=pa2.int64()),
        "s_name": pa2.array([f"S{k}" for k in suppkeys]),
        "s_nationkey": pa2.array([0] * len(suppkeys), type=pa2.int64()),
        "s_acctbal": pa2.array([0.0] * len(suppkeys), type=pa2.float64()),
    }), tmp_path / "supplier.parquet")
    pq2.write_table(pa2.table({
        "p_partkey": pa2.array(list(partkeys), type=pa2.int64()),
        "p_name": pa2.array([f"P{k}" for k in partkeys]),
    }), tmp_path / "part.parquet")


def _ps_value(p, n_supp=1):
    """Straight-line per-part stock value under the synthesis contract."""
    from prlib_ray.relational import (
        PS_AVAIL_MOD, PS_COST_BASE, PS_COST_MOD, PS_PER_PART,
    )

    return sum(
        ((p * 29 + k * 37) % PS_COST_MOD + PS_COST_BASE)
        * ((p * 13 + k * 17) % PS_AVAIL_MOD + 1)
        for k in range(PS_PER_PART)
    )


def test_q11_strict_above_mean_boundary(ray_session, tmp_path):
    """Two parts with IDENTICAL synthesized rows (partkey delta =
    lcm(30, 99000) repeats every mod pattern; one supplier makes the
    suppkey constant): each part's value equals the mean exactly, and
    the strict > keeps neither.  Adding a third, higher-value part
    makes it the only survivor."""
    from prlib_ray.relational import q11_important_stock

    # equal pair only: value * 2 == total -> empty result
    _write_ps_dims(tmp_path, [1, 99001])
    assert q11_important_stock(str(tmp_path)).count() == 0

    v1, v2 = _ps_value(1), _ps_value(2)
    assert v2 != v1  # constructed split is real
    _write_ps_dims(tmp_path, [1, 99001, 2])
    df = q11_important_stock(str(tmp_path)).to_pandas()
    if v2 > v1:
        assert list(df["ps_partkey"]) == [2] and int(df["value_cents"]) == v2
    else:
        assert sorted(df["ps_partkey"]) == [1, 99001]


def test_q20_excess_boundary_and_orphans(ray_session, tmp_path):
    """Q20 semantics on hand-built facts: exactly-half availqty is NOT
    excess (strict >), pairs with no shipments drop, and a supplier's
    count sums once per excess (part, supplier) pair."""
    import numpy as np
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import (
        PS_AVAIL_MOD, PS_SUPP_A, PS_SUPP_B, Q20_YEAR, q20_excess_parts,
    )

    # one supplier (suppkey 5) so every synthesized row lands on it
    partkeys = [1, 2, 3]  # part 3 gets no shipments -> drops
    _write_ps_dims(tmp_path, partkeys)
    avail = {
        (p, k): (p * 13 + k * 17) % PS_AVAIL_MOD + 1
        for p in partkeys for k in range(4)
    }
    # per (part, supplier=5): total avail across the 4 synth rows that
    # all hit suppkey 5; shipped qty compares per (part, supp) pair on
    # EACH row, so pick quantities against the per-row avail of k=0
    ts = np.datetime64(Q20_YEAR[0], "us").item()
    rows = [
        # part 1: ship exactly 2*avail(1,0) units -> 200*a == qty_cents
        # on the k=0 row; rows k=1..3 with different avail still compare
        (1, 5, 2.0 * avail[(1, 0)]),
        # part 2: ship almost nothing -> all four rows are excess
        (2, 5, 0.01),
    ]
    pq2.write_table(pa2.table({
        "l_partkey": pa2.array([r[0] for r in rows], type=pa2.int64()),
        "l_suppkey": pa2.array([r[1] for r in rows], type=pa2.int64()),
        "l_quantity": pa2.array([r[2] for r in rows], type=pa2.float64()),
        "l_shipdate": pa2.array([ts] * len(rows), type=pa2.timestamp("us")),
    }), tmp_path / "lineitem.parquet")

    df = q20_excess_parts(str(tmp_path)).to_pandas()
    # expected: for part 1, the 4 synth rows compare against the SAME
    # shipped total (they share (part, supp)); k=0 is the exact
    # boundary (not excess), others excess iff 200*avail > qty
    qty1 = round(2.0 * avail[(1, 0)] * 100)
    exc1 = sum(1 for k in range(4) if 200 * avail[(1, k)] > qty1)
    assert exc1 < 4  # the boundary row really is excluded
    want = exc1 + 4  # part 2: all four rows excess; part 3: dropped
    assert list(df["s_suppkey"]) == [5]
    assert int(df["n_excess_parts"]) == want


def test_q12_strict_date_boundaries(ray_session, tmp_path):
    """Q12 on hand-built facts: a lineitem whose synthesized commit
    offset is <= 0 fails ship < commit strictly; receipt-year window is
    half-open; orphan lineitems drop; priority split counted per LINE.
    Expectations recomputed from the same synthesis formulas."""
    import numpy as np
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import (
        Q12_CHECK_MODES, Q12_HIGH_PRIOS, Q12_MODES, Q12_YEAR,
        q12_shipmode_priority,
    )

    ship = np.datetime64("1997-06-01", "us")
    rows = [(10, ln) for ln in range(1, 8)] + [(99, 1)]  # 99 = orphan
    pq2.write_table(pa2.table({
        "l_orderkey": pa2.array([r[0] for r in rows], type=pa2.int64()),
        "l_linenumber": pa2.array([r[1] for r in rows], type=pa2.int64()),
        "l_shipdate": pa2.array([ship.item()] * len(rows),
                                type=pa2.timestamp("us")),
    }), tmp_path / "lineitem.parquet")
    pq2.write_table(pa2.table({
        "o_orderkey": pa2.array([10], type=pa2.int64()),
        "o_orderdate": pa2.array([ship.item()], type=pa2.timestamp("us")),
        "o_orderpriority": pa2.array(["1-URGENT"]),
    }), tmp_path / "orders.parquet")

    start = np.datetime64(Q12_YEAR[0], "us")
    end = np.datetime64(Q12_YEAR[1], "us")
    want: dict[str, int] = {}
    for ok, ln in rows[:-1]:  # orphan excluded by the join
        mode = Q12_MODES[(ok * 5 + ln * 3) % 4]
        commit = ship + np.timedelta64(((ok + ln * 7) % 45 - 10), "D")
        receipt = ship + np.timedelta64(((ok * 2 + ln) % 30 + 1), "D")
        if (mode in Q12_CHECK_MODES and commit < receipt and ship < commit
                and start <= receipt < end):
            want[mode] = want.get(mode, 0) + 1
    assert want  # the constructed case really exercises survivors

    df = q12_shipmode_priority(str(tmp_path)).to_pandas()
    got = dict(zip(df["l_shipmode"], df["high_line_count"]))
    assert got == want  # all lines are 1-URGENT -> high counts only
    assert (df["low_line_count"] == 0).all()
    assert "1-URGENT" in Q12_HIGH_PRIOS


def test_q9_orphans_and_profit_sign(ray_session, tmp_path):
    """Q9 on hand-built facts: lineitems with no order drop, pairs
    outside the name-filtered partsupp drop, and the exact profit
    (100*rev - cost*qty, 1e-4-dollar units) matches a straight-line
    recomputation — including a negative-profit (loss) row."""
    import numpy as np
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import (
        PS_COST_BASE, PS_COST_MOD, PS_SUPP_A, PS_SUPP_B, q9_product_profit,
    )

    _write_ps_dims(tmp_path, [1, 2], suppkeys=[5, 6, 7, 8])
    # part 1 named 'cold ...' (in Q9_NAME_WORDS), part 2 'blue' (not)
    pq2.write_table(pa2.table({
        "p_partkey": pa2.array([1, 2], type=pa2.int64()),
        "p_name": pa2.array(["cold widget", "blue widget"]),
    }), tmp_path / "part.parquet")

    # synthesized suppkeys of part 1: 5 + (1*7 + k*131) % 4
    sks = [5 + (1 * PS_SUPP_A + k * PS_SUPP_B) % 4 for k in range(4)]
    costs = {5 + (1 * PS_SUPP_A + k * PS_SUPP_B) % 4:
             (1 * 29 + k * 37) % PS_COST_MOD + PS_COST_BASE
             for k in range(4)}
    sk = sks[0]
    ts = np.datetime64("1996-03-01", "us").item()
    pq2.write_table(pa2.table({
        "o_orderkey": pa2.array([10], type=pa2.int64()),
        "o_orderdate": pa2.array([ts], type=pa2.timestamp("us")),
    }), tmp_path / "orders.parquet")
    li = [
        (10, 1, sk, 50.0, 0.1, 100.0),   # matches -> big qty: a LOSS
        (10, 2, sk, 50.0, 0.1, 1.0),     # part 2 filtered out by name
        (99, 1, sk, 50.0, 0.1, 1.0),     # orphan order -> drops
        (10, 1, 9, 50.0, 0.1, 1.0),      # suppkey 9 not synthesized
    ]
    pq2.write_table(pa2.table({
        "l_orderkey": pa2.array([r[0] for r in li], type=pa2.int64()),
        "l_partkey": pa2.array([r[1] for r in li], type=pa2.int64()),
        "l_suppkey": pa2.array([r[2] for r in li], type=pa2.int64()),
        "l_extendedprice": pa2.array([r[3] for r in li]),
        "l_discount": pa2.array([r[4] for r in li]),
        "l_quantity": pa2.array([r[5] for r in li]),
        "l_shipdate": pa2.array([ts] * len(li), type=pa2.timestamp("us")),
    }), tmp_path / "lineitem.parquet")

    df = q9_product_profit(str(tmp_path)).to_pandas()
    rev = int(np.floor(50.0 * 0.9 * 100 + 0.5))
    want = 100 * rev - costs[sk] * 10_000
    assert want < 0  # the constructed row really is a loss
    assert len(df) == 1
    assert df["n_name"][0] == "NATION_0" and int(df["o_year"][0]) == 1996
    assert int(df["profit_x100_cents"][0]) == want


def test_q2_size_region_and_min_winner(ray_session, tmp_path):
    """Q2 semantics on hand-built dims: the size subset filters parts,
    out-of-region offers drop, and the per-part winner is the exact
    min-cost in-region offer (straight-line recompute).  Two suppliers
    alternate by (p + k) parity under the synthesis, so each part keeps
    exactly 2 of its 4 offers."""
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import (
        PS_COST_BASE, PS_COST_MOD, PS_PER_PART, Q2_REGION, Q2_SIZE_MOD,
        q2_min_cost_supplier,
    )

    pq2.write_table(pa2.table({
        "r_regionkey": pa2.array([0, 1], type=pa2.int64()),
        "r_name": pa2.array([Q2_REGION, "ELSEWHERE"]),
    }), tmp_path / "region.parquet")
    pq2.write_table(pa2.table({
        "n_nationkey": pa2.array([0, 1], type=pa2.int64()),
        "n_name": pa2.array(["NATION_0", "NATION_1"]),
        "n_regionkey": pa2.array([0, 1], type=pa2.int64()),
    }), tmp_path / "nation.parquet")
    # suppkey 5 in-region, 6 out: smin=5, n_supp=2, so offer (p, k)
    # lands on suppkey 5 + (p*7 + k*131) % 2 == 5 + (p + k) % 2
    pq2.write_table(pa2.table({
        "s_suppkey": pa2.array([5, 6], type=pa2.int64()),
        "s_name": pa2.array(["S5", "S6"]),
        "s_nationkey": pa2.array([0, 1], type=pa2.int64()),
        "s_acctbal": pa2.array([0.0, 0.0], type=pa2.float64()),
    }), tmp_path / "supplier.parquet")
    # part 12 fails the size filter; 10 (even) keeps k in {0, 2};
    # 11 (odd) keeps k in {1, 3}
    pq2.write_table(pa2.table({
        "p_partkey": pa2.array([10, 11, 12], type=pa2.int64()),
        "p_name": pa2.array(["P10", "P11", "P12"]),
        "p_size": pa2.array([Q2_SIZE_MOD, 2 * Q2_SIZE_MOD,
                             Q2_SIZE_MOD + 1], type=pa2.int64()),
    }), tmp_path / "part.parquet")

    def cost(p, k):
        return (p * 29 + k * 37) % PS_COST_MOD + PS_COST_BASE

    df = (q2_min_cost_supplier(str(tmp_path)).to_pandas()
          .sort_values("ps_partkey").reset_index(drop=True))
    assert list(df["ps_partkey"]) == [10, 11]
    assert list(df["ps_suppkey"]) == [5, 5]  # only the in-region supplier
    want = {10: min(cost(10, k) for k in (0, 2)),
            11: min(cost(11, k) for k in (1, 3))}
    assert {int(r.ps_partkey): int(r.cost_cents)
            for r in df.itertuples()} == want
    assert PS_PER_PART == 4  # the parity argument above relies on it


def test_profile_columns_semantics(ray_session, tmp_path):
    """Column profiler on hand-built orders: planted NULLs (keys 0/97/
    101 trigger the mod rules), n_distinct under duplicates, numeric —
    not lexicographic — min/max formatting (keys 9 vs 10), the cents
    view and the epoch-us view."""
    import numpy as np
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import profile_columns

    base = np.datetime64("2024-03-01T00:00:00", "us").item()
    keys = [0, 9, 10, 97, 101, 202]
    pq2.write_table(pa2.table({
        "o_orderkey": pa2.array(keys, type=pa2.int64()),
        # duplicates: only 3 distinct custkeys BEFORE the null plant;
        # key 0 and 101 null out (0 % 101 == 0), leaving {7, 8}
        "o_custkey": pa2.array([7, 7, 8, 8, 7, 8], type=pa2.int64()),
        "o_orderstatus": pa2.array(["O", "F", "O", "P", "F", "O"]),
        "o_totalprice": pa2.array([1.005, 2.0, 3.5, 2.0, 9.99, 3.5]),
        "o_orderdate": pa2.array([base] * 6, type=pa2.timestamp("us")),
        "o_orderpriority": pa2.array(
            ["1-URGENT", "5-LOW", "5-LOW", "3-MEDIUM", "1-URGENT",
             "2-HIGH"]),
    }), tmp_path / "orders.parquet")

    df = (profile_columns(str(tmp_path)).to_pandas()
          .set_index("col"))
    assert (df["n_rows"] == 6).all()
    # null plants: custkey nulls at keys 0, 101 AND 202 (all % 101 == 0);
    # priority at 0 and 97
    assert int(df.loc["o_custkey", "n_null"]) == 3
    assert int(df.loc["o_orderpriority", "n_null"]) == 2
    assert int(df.loc["o_orderkey", "n_null"]) == 0
    # distinct excludes nulls: custkey keeps {7, 8} (0/101/202 nulled)
    assert int(df.loc["o_custkey", "n_distinct"]) == 2
    assert int(df.loc["o_orderkey", "n_distinct"]) == 6
    assert int(df.loc["o_totalprice", "n_distinct"]) == 4
    assert int(df.loc["o_orderdate", "n_distinct"]) == 1
    # priority distinct after nulling keys 0 ('1-URGENT') and 97
    # ('3-MEDIUM'): {5-LOW, 5-LOW, 1-URGENT, 2-HIGH} -> 3
    assert int(df.loc["o_orderpriority", "n_distinct"]) == 3
    # numeric min/max formatting: min is '0', max '202' — NOT the
    # lexicographic '9'
    assert df.loc["o_orderkey", "min_s"] == "0"
    assert df.loc["o_orderkey", "max_s"] == "202"
    # cents view under the SHARED IEEE expression: 1.005 is really
    # 1.00499999..., so floor(x*100 + 0.5) = 100 on BOTH sides — the
    # parity contract is the expression tree, not decimal arithmetic
    assert df.loc["o_totalprice", "min_s"] == "100"
    assert df.loc["o_totalprice", "max_s"] == "999"
    # epoch-us view (integer micros, not timestamp text)
    us = int(np.datetime64("2024-03-01T00:00:00", "us").astype(np.int64))
    assert df.loc["o_orderdate", "min_s"] == str(us)
    # string min/max bytewise
    assert df.loc["o_orderstatus", "min_s"] == "F"
    assert df.loc["o_orderstatus", "max_s"] == "P"
    # nulled values can't win min/max: priority min is '1-URGENT'
    # (key 0's instance is nulled but key 9... the surviving rows
    # still include 1-URGENT at key 101)
    assert df.loc["o_orderpriority", "min_s"] == "1-URGENT"
    assert df.loc["o_orderpriority", "max_s"] == "5-LOW"


def test_utf8_hygiene_flags(ray_session, tmp_path):
    """Hygiene audit on hand-built documents: a control char flags
    n_ctrl only, U+FFFD flags repl AND nonascii, an accent flags
    nonascii only, \\t and \\n do NOT flag, and REAL dirt surfaces
    beyond the plants (doc_id >= N_PLANT_HYG)."""
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.stages.text_analysis import N_PLANT_HYG, utf8_hygiene

    rows = [
        (N_PLANT_HYG + 1, "clean ascii text", "a"),
        (N_PLANT_HYG + 2, "tabs\tand\nnewlines are fine", "a"),
        (N_PLANT_HYG + 3, "bell \x07 inside", "a"),       # ctrl only
        (N_PLANT_HYG + 4, "lossy � decode", "b"),     # repl + nonascii
        (N_PLANT_HYG + 5, "caf\xe9 au lait", "b"),         # nonascii only
        (N_PLANT_HYG + 6, "del \x7f char", "b"),           # ctrl only
    ]
    pq2.write_table(pa2.table({
        "doc_id": pa2.array([r[0] for r in rows], type=pa2.int64()),
        "text": pa2.array([r[1] for r in rows], type=pa2.string()),
        "source": pa2.array([r[2] for r in rows], type=pa2.string()),
    }), tmp_path / "documents.parquet")

    df = utf8_hygiene(str(tmp_path)).to_pandas().set_index("source")
    assert int(df.loc["a", "n_docs"]) == 3
    assert int(df.loc["a", "n_ctrl"]) == 1      # bell; \t\n don't count
    assert int(df.loc["a", "n_repl"]) == 0
    assert int(df.loc["a", "n_nonascii"]) == 0
    assert int(df.loc["b", "n_docs"]) == 3
    assert int(df.loc["b", "n_ctrl"]) == 1      # DEL
    assert int(df.loc["b", "n_repl"]) == 1
    assert int(df.loc["b", "n_nonascii"]) == 2  # U+FFFD and é


def test_price_rank_ntile_semantics(ray_session, tmp_path):
    """Rank/NTILE on hand-built orders: n = 13 with B = 10 (q = 1,
    r = 3 — the first three deciles get 2 rows), a cents tie broken by
    orderkey, and prices spanning several range partitions; the engine
    must equal DuckDB's row_number/ntile on the same frame."""
    import duckdb as _dd
    import numpy as np
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import (NTILE_BUCKETS, RANK_RANGE_STEP,
                                      price_rank_ntile)

    # two ties at 25.00; values spread over > 4 range parts
    prices = [25.0, 25.0, 13.0, 99_000.0, 47_000.0, 5.0, 230_000.0,
              230_000.5, 18_000.0, 310_000.0, 1.0, 47_000.0, 0.5]
    keys = list(range(100, 100 + len(prices)))
    pq2.write_table(pa2.table({
        "o_orderkey": pa2.array(keys, type=pa2.int64()),
        "o_totalprice": pa2.array(prices, type=pa2.float64()),
    }), tmp_path / "orders.parquet")

    cents = np.floor(np.asarray(prices) * 100.0 + 0.5).astype(np.int64)
    assert len(np.unique(cents // RANK_RANGE_STEP)) >= 4
    assert NTILE_BUCKETS == 10 and len(prices) % NTILE_BUCKETS != 0

    df = (price_rank_ntile(str(tmp_path)).to_pandas()
          .sort_values("o_orderkey").reset_index(drop=True))
    con = _dd.connect()
    want = con.execute(f"""
        WITH c AS (SELECT * FROM read_parquet(
            '{tmp_path / "orders.parquet"}'))
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
               CAST(row_number() OVER w - 1 AS BIGINT) AS rnk,
               CAST(ntile({NTILE_BUCKETS}) OVER w - 1 AS BIGINT) AS tile
        FROM c WINDOW w AS (ORDER BY cents, o_orderkey)
        ORDER BY o_orderkey""").df()
    for c in ("o_orderkey", "cents", "rnk", "tile"):
        assert np.array_equal(df[c].to_numpy(), want[c].to_numpy()), c
    # the tie at 25.00 resolves by orderkey: key 100 ranks before 101
    tie = df.set_index("o_orderkey")
    assert tie.loc[100, "rnk"] + 1 == tie.loc[101, "rnk"]
    # equi-depth: first r deciles hold q+1 rows, the rest q
    sizes = df.groupby("tile").size()
    q, r = divmod(len(prices), NTILE_BUCKETS)
    assert all(int(sizes.get(t, 0)) == (q + 1 if t < r else q)
               for t in range(NTILE_BUCKETS))


def test_pareto_orders_semantics(ray_session, tmp_path):
    """Skyline on a hand frame pins the dominance contract: an exact
    duplicate pair both survive (neither strictly improves), a
    same-price/older row and a same-date/cheaper row are dominated,
    and the engine equals the O(n^2) strict-somewhere brute force."""
    import numpy as np
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import pareto_orders

    rows = [  # (key, price, date)
        (1, 100.00, "1995-01-01"),   # frontier (max price)
        (2, 100.00, "1995-01-01"),   # exact duplicate -> also frontier
        (3, 100.00, "1994-06-01"),   # same price, older -> dominated
        (4, 50.00, "1996-01-01"),    # frontier (most recent)
        (5, 49.99, "1996-01-01"),    # same date, cheaper -> dominated
        (6, 75.00, "1995-06-01"),    # frontier (middle of the staircase)
        (7, 74.00, "1995-05-01"),    # dominated by 6 on both axes
    ]
    pq2.write_table(pa2.table({
        "o_orderkey": pa2.array([r[0] for r in rows], type=pa2.int64()),
        "o_totalprice": pa2.array([r[1] for r in rows], type=pa2.float64()),
        "o_orderdate": pa2.array(
            [np.datetime64(r[2], "us") for r in rows],
            type=pa2.timestamp("us")),
    }), tmp_path / "orders.parquet")

    out = pareto_orders(str(tmp_path)).to_pandas()
    assert list(out["o_orderkey"]) == [1, 2, 4, 6]

    cents = np.asarray([int(r[1] * 100 + 0.5) for r in rows])
    ts = np.asarray([np.datetime64(r[2], "us").astype(np.int64)
                     for r in rows])
    brute = [rows[i][0] for i in range(len(rows))
             if not any((cents[j] >= cents[i]) and (ts[j] >= ts[i])
                        and (cents[j] > cents[i] or ts[j] > ts[i])
                        for j in range(len(rows)))]
    assert list(out["o_orderkey"]) == sorted(brute)


def test_rolling_active_users_semantics(ray_session, tmp_path):
    """Hand events pin the trailing-window contract: a day-0-only user
    drops out exactly at day W, a gap == W leaves adjacent coverage
    (the split deltas cancel), quiet days still report trailing
    actives, and the engine equals the per-day brute force."""
    import numpy as np
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from prlib_ray.relational import ROLLING_DAU_WINDOW as W
    from prlib_ray.relational import rolling_active_users

    day0 = np.datetime64("2024-03-01", "us")
    DAY = np.timedelta64(86_400_000_000, "us")
    events = [
        (1, 0), (1, 0),          # user 1: day 0 only (dup event)
        (2, 0), (2, W),          # user 2: gap == W -> adjacent coverage
        (35, 3),                 # user 35: same part as 3 (mod 32)
        (3, 2), (3, 20),         # user 3: two disjoint intervals
    ]
    pq2.write_table(pa2.table({
        "user_id": pa2.array([u for u, _ in events], type=pa2.int64()),
        "ts": pa2.array([day0 + d * DAY for _, d in events],
                        type=pa2.timestamp("us")),
    }), tmp_path / "events.parquet")

    out = rolling_active_users(str(tmp_path)).to_pandas()
    base = int(day0.astype("datetime64[D]").astype(int))
    days = {int(r.day) - base + 0: int(r.n_active)
            for r in out.itertuples()}
    # observed span = day 0 .. 20
    assert sorted(days) == list(range(0, 21))
    by_user = {1: [0], 2: [0, W], 35: [3], 3: [2, 20]}
    for d in range(0, 21):
        brute = sum(1 for ds_ in by_user.values()
                    if any(d - (W - 1) <= x <= d for x in ds_))
        assert days[d] == brute, (d, days[d], brute)
    # the pinned edge: user 1 counts on day W-1 but not on day W (the
    # only membership change at day W — user 2's re-up was already
    # counted via day 0, so the curve drops by exactly one)
    assert days[W - 1] == 4 and days[W] == 3
    # user 2's adjacent coverage never dips between day 0 and day 2W-1
    # (handled via brute force above); quiet day 15 still reports u3? no:
    # u3's day-2 window ended at day 8; day 15 has zero actives
    assert days[15] == 0
