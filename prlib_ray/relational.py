"""Relational core: the engine's generic query operators over the star
schema — scans with pruning, broadcast hash joins, partial+final
aggregation, sort/limit, distinct, windowed and as-of operators.

These are the "relational-operator summary" ops of SURVEY §2.7: every
shuffle is minimized (aggregate partials inside ``map_batches``, small
sides broadcast via ``ray.put``), mirroring how the pipeline must behave
at 100 TB.

Float determinism: money values are converted per row to integer cents
with ``floor(x * 100 + 0.5)`` — the identical IEEE expression DuckDB
evaluates — so all sums are exact int64 in any accumulation order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from prlib_ray.blocks import int_bincount

CUTOFF = "1996-01-01"

# Broadcast-vs-partitioned gate for the fact-side joins (as-of / range
# join): below this many order rows the per-customer index broadcasts via
# ray.put; above it the events and orders co-partition by customer hash
# and probe inside map_groups (no driver materialization of a fact
# table).  Module-level so tests can force the partitioned path.
FACT_BROADCAST_MAX_ROWS = 2_000_000


def _cents(arr: np.ndarray) -> np.ndarray:
    return np.floor(arr * 100.0 + 0.5).astype(np.int64)


def _collect_columns(ds, cols: list[str]) -> dict[str, np.ndarray]:
    """Driver-side fold of a (small) Dataset's columns into numpy arrays.

    The scan/filter/prune all ran DISTRIBUTED; only the pruned result
    columns come back (one batched ray.get of the block refs) — the
    pattern for deriving a broadcast side without a driver-side
    pd.read_parquet of the table."""
    import pyarrow as _pa
    import ray

    tables = [t for t in ray.get(list(ds.to_arrow_refs())) if t.num_rows]
    if not tables:
        return {c: np.zeros(0, dtype=np.int64) for c in cols}
    big = _pa.concat_tables([t.select(cols) for t in tables])
    return {c: big[c].to_numpy(zero_copy_only=False) for c in cols}


def _collect_columns_parallel(
    specs: dict[str, tuple],
) -> dict[str, dict[str, np.ndarray]]:
    """Fold several INDEPENDENT small Datasets concurrently.

    Each _collect_columns blocks the calling thread on its own streaming
    execution; sequential calls pay one executor round-trip each.
    Overlapping them from driver threads collapses K rounds into ~1 —
    the build-side latency fix for multi-dimension joins (q5)."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max(1, len(specs))) as ex:
        futs = {
            name: ex.submit(_collect_columns, ds, cols)
            for name, (ds, cols) in specs.items()
        }
        return {name: f.result() for name, f in futs.items()}


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: filtered scan -> per-batch partial aggregate ->
    tiny final groupby.  Demonstrates the partial+final (combiner)
    aggregation pattern — the shuffle moves one row per (batch x group),
    not per input row."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    cutoff = np.datetime64(CUTOFF, "us")
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
        # predicate pushed into the parquet scan: row groups outside the
        # date range never leave storage (the in-map mask stays as the
        # semantic source of truth; it is a no-op on pre-filtered rows)
        filter=(pc.field("l_shipdate") <= pa.scalar(cutoff)),
    )

    def partial(b: pa.Table) -> pa.Table:
        mask = pc.less_equal(b["l_shipdate"], pa.scalar(cutoff))
        b = b.filter(mask)
        qty = b["l_quantity"].to_numpy()
        price = b["l_extendedprice"].to_numpy()
        disc = b["l_discount"].to_numpy()
        t = pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "qty_cents": pa.array(_cents(qty), type=pa.int64()),
                "base_cents": pa.array(_cents(price), type=pa.int64()),
                "disc_cents": pa.array(
                    _cents(price * (1.0 - disc)), type=pa.int64()
                ),
                "one": pa.array(np.ones(len(qty), dtype=np.int64)),
            }
        )
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_cents", "sum"), ("base_cents", "sum"),
             ("disc_cents", "sum"), ("one", "sum")]
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_cents_sum", alias_name="sum_qty_cents"),
            Sum("base_cents_sum", alias_name="sum_base_cents"),
            Sum("disc_cents_sum", alias_name="sum_disc_cents"),
            Sum("one_sum", alias_name="count_order"),
        )
    )
    return agg


def q3_top_orders(sf_dir: str):
    """TPC-H Q3 shape: two semi-joins (customer segment filter, orders
    date filter) folded into the lineitem scan, partial aggregate, global
    top-10 with a deterministic tie-break.

    Scale design (no driver-side fact materialization anywhere):
    * the BUILDING custkeys come from a DISTRIBUTED pruned/filtered scan
      of customer; only the key column folds back (bloom/semi-join
      stand-in, sorted for vectorized searchsorted probes);
    * qualifying orders are computed distributed (pruned scan + pushdown
      date filter + broadcast-key semi-join in map_batches); ONE fold
      brings back the (orderkey, orderdate) pair — the lineitem
      semi-join broadcast set plus the date needed for the final attach
      (searchsorted on the 10 winning keys, driver-side) — so no
      {orderkey: date} dict of a fact table ever exists and the whole
      query is three execution rounds, not five."""
    import ray
    import ray.data as rd

    cutoff = np.datetime64(CUTOFF, "us")
    cust_ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey"],
        filter=(pc.field("c_mktsegment") == pa.scalar("BUILDING")),
    )
    ckeys = np.sort(
        _collect_columns(cust_ds, ["c_custkey"])["c_custkey"].astype(np.int64)
    )
    ckeys_ref = ray.put(ckeys)

    ord_ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") < pa.scalar(cutoff)),
    )

    def semi_cust(b: pa.Table) -> pa.Table:
        ck = ray.get(ckeys_ref)
        b = b.filter(pc.less(b["o_orderdate"], pa.scalar(cutoff)))
        k = b["o_custkey"].to_numpy().astype(np.int64)
        idx = np.searchsorted(ck, k)
        ok = (idx < len(ck)) & (ck[np.minimum(idx, len(ck) - 1)] == k)
        b = b.filter(pa.array(ok))
        return pa.table(
            {"o_orderkey": b["o_orderkey"], "o_orderdate": b["o_orderdate"]}
        )

    # qualifying orders: ONE distributed pass folds back the pruned
    # (orderkey, orderdate) pair — the semi-join broadcast set plus the
    # 8 bytes/key needed for the final date attach, so no separate
    # materialize + date-probe execution rounds exist
    qual_cols = _collect_columns(
        ord_ds.map_batches(
            semi_cust, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["o_orderkey", "o_orderdate"],
    )
    order = np.argsort(qual_cols["o_orderkey"].astype(np.int64))
    okeys = qual_cols["o_orderkey"].astype(np.int64)[order]
    odates = qual_cols["o_orderdate"][order]
    ref = ray.put(okeys)

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate") > pa.scalar(cutoff)),  # scan pushdown
    )

    def partial(b: pa.Table) -> pa.Table:
        okeys = ray.get(ref)
        mask_ship = pc.greater(b["l_shipdate"], pa.scalar(cutoff))
        b = b.filter(mask_ship)
        k = b["l_orderkey"].to_numpy().astype(np.int64)
        idx = np.searchsorted(okeys, k)
        ok = (idx < len(okeys)) & (okeys[np.minimum(idx, len(okeys) - 1)] == k)
        b = b.filter(pa.array(ok))
        price = b["l_extendedprice"].to_numpy()
        disc = b["l_discount"].to_numpy()
        t = pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "rev": pa.array(_cents(price * (1.0 - disc)), type=pa.int64()),
            }
        )
        t = t.group_by("l_orderkey").aggregate([("rev", "sum")])
        return t.append_column(
            "part", pa.array(t["l_orderkey"].to_numpy() % 64)
        )

    # Final fold + top-10 per ORDER-side coarse partition (order-key
    # cardinality is fact-scale, so Ray's per-key aggregate and the
    # global sort are both avoided): one lexsort run-boundary revenue
    # sum per part, local top-10, then the <= 64*10 survivors rank on
    # the driver.  A key never spans parts, and per-part top-10 cannot
    # lose a global top-10 row.
    def fold_topk(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"l_orderkey": z, "revenue_cents": z})
        k = g["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = g["rev_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(k, kind="stable")
        k_s, r_s = k[order], r[order]
        new = np.r_[True, k_s[1:] != k_s[:-1]]
        run = np.cumsum(new) - 1
        rev = int_bincount(run, r_s)
        keys_u = k_s[new]
        o = np.lexsort((keys_u, -rev))[:10]
        return pa.table(
            {"l_orderkey": pa.array(keys_u[o]),
             "revenue_cents": pa.array(rev[o])}
        )

    survivors = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(fold_topk, batch_format="pyarrow")
        .take_all()  # <= 640 rows: per-part winners, not a fact side
    )
    sk = np.array([r["l_orderkey"] for r in survivors], dtype=np.int64)
    sr = np.array([r["revenue_cents"] for r in survivors], dtype=np.int64)
    o = np.lexsort((sk, -sr))[:10]
    top = [
        {"l_orderkey": int(sk[i]), "revenue_cents": int(sr[i])} for i in o
    ]
    # date attach: searchsorted into the already-folded qualifying-order
    # arrays, driver-side, on exactly the 10 winning rows
    win_keys = np.array([r["l_orderkey"] for r in top], dtype=np.int64)
    pos = np.searchsorted(okeys, win_keys)
    win_dates = odates[pos]
    return pa.table(
        {
            "l_orderkey": pa.array(win_keys, type=pa.int64()),
            "revenue_cents": pa.array(
                [r["revenue_cents"] for r in top], type=pa.int64()
            ),
            "o_orderdate": pa.array(win_dates, type=pa.timestamp("us")),
        }
    )


def q5_local_supplier(sf_dir: str):
    """TPC-H Q5 shape: five broadcast dimension lookups folded into one
    lineitem map, grouped by nation.  Only the tiny partials shuffle."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    # every lookup side is built from a DISTRIBUTED pruned scan; only the
    # two needed columns fold back to the driver (orders is a fact table
    # — at the 100-TB design point the o_orderkey->o_custkey map becomes
    # a co-partitioned join like _probe_join's; the folded-array form is
    # the broadcast stand-in the fixtures' scale permits).  The four
    # folds are independent, so they execute CONCURRENTLY — one
    # executor round of wall clock instead of four.
    folds = _collect_columns_parallel(
        {
            "nation": (
                rd.read_parquet(f"{sf_dir}/nation.parquet",
                                columns=["n_nationkey", "n_name"]),
                ["n_nationkey", "n_name"],
            ),
            "supplier": (
                rd.read_parquet(f"{sf_dir}/supplier.parquet",
                                columns=["s_suppkey", "s_nationkey"]),
                ["s_suppkey", "s_nationkey"],
            ),
            "customer": (
                rd.read_parquet(f"{sf_dir}/customer.parquet",
                                columns=["c_custkey", "c_nationkey"]),
                ["c_custkey", "c_nationkey"],
            ),
            "orders": (
                rd.read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"]),
                ["o_orderkey", "o_custkey"],
            ),
        }
    )
    nation, supplier = folds["nation"], folds["supplier"]
    customer, orders = folds["customer"], folds["orders"]

    def _sorted_lookup(keys, vals):
        k = np.asarray(keys, dtype=np.int64)
        v = np.asarray(vals, dtype=np.int64)
        order = np.argsort(k, kind="stable")
        return k[order], v[order]

    # broadcast side = sorted (key, value) arrays: each dimension lookup
    # inside the map is one vectorized searchsorted over the batch
    ok_k, ok_v = _sorted_lookup(orders["o_orderkey"], orders["o_custkey"])
    ck_k, ck_v = _sorted_lookup(customer["c_custkey"], customer["c_nationkey"])
    sk_k, sk_v = _sorted_lookup(supplier["s_suppkey"], supplier["s_nationkey"])
    nat_arr = np.empty(int(nation["n_nationkey"].max()) + 1, dtype=object)
    nat_arr[nation["n_nationkey"].astype(np.int64)] = nation["n_name"]
    ref = ray.put((ok_k, ok_v, ck_k, ck_v, sk_k, sk_v, nat_arr))

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def _gather(keys, vals, probe):
        """probe -> (value, found) via searchsorted on the sorted keys."""
        idx = np.searchsorted(keys, probe)
        safe = np.minimum(idx, len(keys) - 1)
        found = (idx < len(keys)) & (keys[safe] == probe)
        return vals[safe], found

    def partial(b: pa.Table) -> pa.Table:
        ok_k, ok_v, ck_k, ck_v, sk_k, sk_v, nn = ray.get(ref)
        okeys = b["l_orderkey"].to_numpy().astype(np.int64)
        skeys = b["l_suppkey"].to_numpy().astype(np.int64)
        price = b["l_extendedprice"].to_numpy()
        disc = b["l_discount"].to_numpy()
        cust, has_o = _gather(ok_k, ok_v, okeys)
        cnat, has_c = _gather(ck_k, ck_v, cust)
        snat, has_s = _gather(sk_k, sk_v, skeys)
        mask = has_o & has_c & has_s & (cnat == snat)
        names = nn[snat[mask]]
        rev = _cents(price[mask] * (1.0 - disc[mask]))
        t = pa.table(
            {
                "n_name": pa.array(names, type=pa.string()),
                "rev": pa.array(rev, type=pa.int64()),
            }
        )
        return t.group_by("n_name").aggregate([("rev", "sum")])

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_name")
        .aggregate(Sum("rev_sum", alias_name="revenue_cents"))
    )


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape: pure filtered scan + global sum — the minimal
    predicate-pushdown + single-aggregate pipeline (one partial row per
    batch, no grouped shuffle at all)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    cutoff = np.datetime64(CUTOFF, "us")
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
        filter=(
            (pc.field("l_shipdate") < pa.scalar(cutoff))
            & (pc.field("l_discount") >= pa.scalar(0.05))
            & (pc.field("l_discount") <= pa.scalar(0.07))
            & (pc.field("l_quantity") < pa.scalar(24.0))
        ),  # full predicate pushed into the scan
    )

    def partial(b: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                pc.less(b["l_shipdate"], pa.scalar(cutoff)),
                pc.greater_equal(b["l_discount"], pa.scalar(0.05)),
            ),
            pc.and_(
                pc.less_equal(b["l_discount"], pa.scalar(0.07)),
                pc.less(b["l_quantity"], pa.scalar(24.0)),
            ),
        )
        b = b.filter(mask)
        price = b["l_extendedprice"].to_numpy()
        disc = b["l_discount"].to_numpy()
        rev = _cents(price * disc)
        return pa.table(
            {
                "rev": pa.array([int(rev.sum())], type=pa.int64()),
                "n": pa.array([b.num_rows], type=pa.int64()),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    return pa.table(
        {
            "revenue_cents": pa.array(
                [sum(p["rev"] for p in parts)], type=pa.int64()
            ),
            "n_items": pa.array([sum(p["n"] for p in parts)], type=pa.int64()),
        }
    )


def _segment_lookup(sf_dir: str):
    """Broadcast-side customer->segment lookup: sorted custkey array +
    parallel segment-CODE array + the code->name table.  Probes are one
    vectorized searchsorted + integer gather per batch (the q5 pattern) —
    no per-row Python dict access.  Built from a DISTRIBUTED pruned scan
    (customer is a dimension; only the two columns fold back)."""
    import ray.data as rd

    cust_ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    cols = _collect_columns(cust_ds, ["c_custkey", "c_mktsegment"])
    keys = cols["c_custkey"].astype(np.int64)
    names, codes = np.unique(cols["c_mktsegment"].astype(object), return_inverse=True)
    order = np.argsort(keys, kind="stable")
    return keys[order], codes[order].astype(np.int64), names.astype(object)


def _seg_of(keys: np.ndarray, codes: np.ndarray, probe: np.ndarray) -> np.ndarray:
    """probe custkeys -> segment codes (all customers exist by FK)."""
    return codes[np.searchsorted(keys, probe)]


def orders_by_segment(sf_dir: str):
    """Broadcast dimension join + grouped aggregate (counts + cents).
    The segment lookup is sorted-array searchsorted + a dictionary-coded
    gather — vectorized end to end."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    ref = ray.put(_segment_lookup(sf_dir))

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(b: pa.Table) -> pa.Table:
        keys, codes, names = ray.get(ref)
        seg_codes = _seg_of(keys, codes, b["o_custkey"].to_numpy().astype(np.int64))
        t = pa.table(
            {
                "c_mktsegment": pa.array(names[seg_codes], type=pa.string()),
                "cents": pa.array(
                    _cents(b["o_totalprice"].to_numpy()), type=pa.int64()
                ),
                "one": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )
        return t.group_by("c_mktsegment").aggregate(
            [("cents", "sum"), ("one", "sum")]
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_mktsegment")
        .aggregate(
            Sum("cents_sum", alias_name="sum_total_cents"),
            Sum("one_sum", alias_name="n_orders"),
        )
    )


def top_orders(sf_dir: str):
    """Global sort + limit with deterministic tie-break (no arithmetic —
    the doubles pass through untouched, so hashes agree)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    return ds.sort(
        ["o_totalprice", "o_orderkey"], descending=[True, False]
    ).limit(20)


def distinct_event_types(sf_dir: str):
    """Distinct (shuffle dedup) over a low-cardinality column."""
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
    return ds.groupby("event_type").aggregate(Count(alias_name="n"))


def events_hourly(sf_dir: str):
    """Tumbling-window aggregate: 1-hour buckets keyed by event_type.
    Ray Data has no event-time windows; the bucket key is computed in the
    map (epoch_us // 3.6e9) and aggregated partial+final.  The final
    fold runs per HOUR-side coarse partition (one vectorized pandas
    groupby per part) — (type, hour) key counts grow with the time span
    and Ray's aggregate pays per-key cost (the dup_ngram_fraction
    lesson); a (type, hour) key never spans parts."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy()
        hour = us // 3_600_000_000
        t = pa.table(
            {
                "event_type": b["event_type"],
                "hour": pa.array(hour, type=pa.int64()),
                "cents": pa.array(_cents(b["value"].to_numpy()), type=pa.int64()),
                "one": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )
        t = t.group_by(["event_type", "hour"]).aggregate(
            [("cents", "sum"), ("one", "sum")]
        )
        return t.append_column(
            "part", pa.array(t["hour"].to_numpy() % 32)
        )

    def final_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"event_type": pa.array([], type=pa.string()),
                             "hour": z, "sum_value_cents": z,
                             "n_events": z})
        et = np.asarray(g["event_type"].to_pylist(), dtype=object)
        hr = g["hour"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = g["cents_sum"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        ones = g["one_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, ei = np.unique(et, return_inverse=True)
        o = np.lexsort((hr, ei))
        new = np.r_[True, (ei[o][1:] != ei[o][:-1])
                    | (hr[o][1:] != hr[o][:-1])]
        starts = np.flatnonzero(new)
        sel = o[starts]
        return pa.table({
            "event_type": pa.array(et[sel], type=pa.string()),
            "hour": pa.array(hr[sel]),
            "sum_value_cents": pa.array(np.add.reduceat(cents[o], starts)),
            "n_events": pa.array(np.add.reduceat(ones[o], starts)),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(final_fold, batch_format="pyarrow")
    )


def events_late_by_watermark(sf_dir: str, *, lateness_min: int = 10):
    """Watermark semantics, deterministically: scanning each
    event_type's stream in event_id (arrival) order, the watermark
    before event i is max(ts of earlier arrivals) - allowed_lateness;
    an arrival with ts below that watermark is LATE (would be dropped /
    side-channeled by a streaming engine).  Emits per-type late counts.

    Vectorized per group: running max via np.maximum.accumulate over
    the arrival order — no per-event Python."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "ts"]
    )
    late_us = np.timedelta64(lateness_min * 60 * 1_000_000, "us")

    def count_late(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"event_type": pa.array([], type=pa.string()),
                             "n_late": z, "n_events": z})
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(eid, kind="stable")
        ts = g["ts"].to_numpy(zero_copy_only=False)[o]
        run_max = np.maximum.accumulate(ts)
        late = np.zeros(len(ts), dtype=bool)
        late[1:] = ts[1:] < run_max[:-1] - late_us  # first arrival never late
        return pa.table(
            {
                "event_type": pa.array([g["event_type"][0].as_py()],
                                       type=pa.string()),
                "n_late": pa.array([int(late.sum())], type=pa.int64()),
                "n_events": pa.array([len(ts)], type=pa.int64()),
            }
        )

    return ds.groupby("event_type").map_groups(count_late, batch_format="pyarrow")


HOP_US = 1_800_000_000  # 30 min hop, 60 min window = 2 hops


def events_hopping_window(sf_dir: str):
    """Hopping (sliding) window aggregate: 1-hour windows every 30 min —
    each event lands in exactly 2 windows (size = 2 x hop).  The fan-out
    is a vectorized duplicate inside the per-batch partial (2 rows per
    event BEFORE the combiner collapses them to one row per
    (type, window) per batch), so the shuffle stays tiny."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy()
        ws1 = (us // HOP_US) * HOP_US
        cents = _cents(b["value"].to_numpy())
        types = b["event_type"]
        t = pa.table(
            {
                "event_type": pa.concat_arrays(
                    [types.combine_chunks(), types.combine_chunks()]
                ) if isinstance(types, pa.ChunkedArray) else pa.concat_arrays(
                    [types, types]
                ),
                "win_start": pa.array(
                    np.concatenate([ws1, ws1 - HOP_US]), type=pa.int64()
                ),
                "cents": pa.array(np.concatenate([cents, cents])),
                "one": pa.array(np.ones(2 * b.num_rows, dtype=np.int64)),
            }
        )
        return t.group_by(["event_type", "win_start"]).aggregate(
            [("cents", "sum"), ("one", "sum")]
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "win_start"])
        .aggregate(
            Sum("cents_sum", alias_name="sum_value_cents"),
            Sum("one_sum", alias_name="n_events"),
        )
    )


def sessionize(sf_dir: str):
    """Session windows: per user, a new session starts after a >30min gap.

    Users hash into coarse partitions (reassemble.N_REASSEMBLE_PARTS) and
    one lexsort + run-boundary pass counts every user's sessions — never
    a per-user Ray group (measured 11.8 s -> ~1 s at 1,500 users; at
    10^6+ users per-key grouping is a scale-killer)."""
    import ray.data as rd

    from prlib_ray.stages.reassemble import _runs

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    gap = np.timedelta64(30 * 60 * 1_000_000, "us")

    def sess(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"user_id": z, "n_sessions": z})
        user = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g["ts"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, user))
        u_s, t_s = user[order], ts[order]
        run, starts, lens = _runs(u_s)
        n = np.ones(len(starts), dtype=np.int64)
        if len(u_s) > 1:
            same = u_s[1:] == u_s[:-1]
            gapped = (t_s[1:] - t_s[:-1] > gap) & same
            # exact int64 (bincount of the gap positions, not a
            # float-weighted sum)
            n += np.bincount(run[1:][gapped],
                             minlength=len(starts)).astype(np.int64)
        return pa.table({"user_id": pa.array(u_s[starts]),
                         "n_sessions": pa.array(n)})

    return (
        ds.map_batches(_add_user_part, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("part")
        .map_groups(sess, batch_format="pyarrow")
    )


HOUR_US = 3_600_000_000


def _add_user_part(b: pa.Table) -> pa.Table:
    """Coarse user-partition column — the ONE layout sessionize,
    rolling_event_window and event_transitions share (a scheme change
    here changes all three together)."""
    from prlib_ray.stages.reassemble import N_REASSEMBLE_PARTS

    u = b["user_id"].to_numpy().astype(np.int64)
    return b.append_column("part", pa.array(u % N_REASSEMBLE_PARTS))


def _exact_pctiles(vals: np.ndarray, tiebreak: np.ndarray,
                   pcts=(50, 90)) -> tuple[list[int], int]:
    """Exact percentile values at sorted index floor(p*(n-1)/100) under
    a deterministic (vals, tiebreak) lexsort — the single rank
    convention every quantile oracle mirrors (row_number OVER
    (ORDER BY val, tiebreak))."""
    order = np.lexsort((tiebreak, vals))
    s = vals[order]
    n = len(s)
    return [int(s[(p * (n - 1)) // 100]) for p in pcts], n


def rolling_event_window(sf_dir: str):
    """Trailing time-window aggregate: per event, the SAME USER's event
    count and integer-cents value sum over the trailing hour (RANGE
    window semantics — equal-timestamp peers are included) — the
    rate-limiting / feature-engineering window a streaming pipeline
    keeps per key.

    Users hash into coarse partitions (sessionize's layout); one
    lexsort per part, then the per-user trailing windows for the WHOLE
    part resolve with two global searchsorted calls on a per-run
    offset-composite axis (run_index * span + relative_ts, span >
    ts-range + window, so windows can never bleed across users) and a
    prefix-sum gather — no per-user Ray group, no per-event loop.
    int64 envelope: runs_per_part * span must stay < 2^63 (at 10^5+
    users per part with multi-year ranges, raise the part count)."""
    import ray.data as rd

    from prlib_ray.stages.reassemble import _runs

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )

    def roll(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"event_id": z, "trailing_count": z,
                             "trailing_cents": z})
        user = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # same IEEE rounding expression as the oracle's
        # floor(value * 100 + 0.5)
        cents = np.floor(
            g["value"].to_numpy(zero_copy_only=False).astype(np.float64)
            * 100.0 + 0.5
        ).astype(np.int64)
        order = np.lexsort((ts, user))
        u, t, e, c = user[order], ts[order], eid[order], cents[order]
        run, starts, _ = _runs(u)
        rel = t - t.min()
        span = int(rel.max()) + HOUR_US + 2
        shifted = run * span + rel
        lo = np.searchsorted(shifted, shifted - HOUR_US, side="left")
        hi = np.searchsorted(shifted, shifted, side="right")
        pref = np.r_[0, np.cumsum(c)]
        return pa.table(
            {
                "event_id": pa.array(e),
                "trailing_count": pa.array((hi - lo).astype(np.int64)),
                "trailing_cents": pa.array(pref[hi] - pref[lo]),
            }
        )

    return (
        ds.map_batches(_add_user_part, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("part")
        .map_groups(roll, batch_format="pyarrow")
    )


# Deterministic sample rate for sampled_quantiles: first md5-hex byte
# < 0x0d keeps ~5.1% of rows.  The rate is the scale knob — at 10^12
# events lower it so each type's sample still sorts in one worker (or
# swap the final sort for length_filter_p95's histogram pattern).
SQUANT_HEX_LT = "0d"


def sampled_quantiles(sf_dir: str):
    """Approximate quantiles via a DETERMINISTIC sample: keep events
    whose md5('squant:' || id) hex prefix is below SQUANT_HEX_LT
    (~5%), then per event type the EXACT p50/p90 integer cents of the
    sample (segment_price_quantiles' rank convention, event_id
    tie-break).  Sampling makes it approximate-with-guarantees at
    scale; determinism keeps the DuckDB oracle value-hash exact —
    unlike a t-digest, every byte is reproducible.

    Rows drop at the scan (only the sample shuffles); the per-type
    fold is a bounded-key groupby."""
    import hashlib

    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
    )

    def sample(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        empty = pa.table(
            {"event_type": pa.array([], type=pa.string()),
             "cents": z, "event_id": z}
        )
        if b.num_rows == 0:
            return empty
        ids = b["event_id"].to_numpy().astype(np.int64)
        keep = np.fromiter(
            (hashlib.md5(f"squant:{i}".encode()).hexdigest()[:2]
             < SQUANT_HEX_LT for i in ids),
            dtype=bool,
            count=len(ids),
        )
        if not keep.any():
            return empty
        k = pa.array(keep)
        cents = np.floor(
            b["value"].to_numpy(zero_copy_only=False)[keep].astype(np.float64)
            * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "event_type": b["event_type"].filter(k),
                "cents": pa.array(cents),
                "event_id": pa.array(ids[keep]),
            }
        )

    def qtile(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"event_type": pa.array([], type=pa.string()),
                             "p50_cents": z, "p90_cents": z,
                             "n_sample": z})
        (p50, p90), n = _exact_pctiles(
            g["cents"].to_numpy(zero_copy_only=False).astype(np.int64),
            g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
        return pa.table(
            {
                "event_type": pa.array([g["event_type"][0].as_py()],
                                       type=pa.string()),
                "p50_cents": pa.array([int(p50)], type=pa.int64()),
                "p90_cents": pa.array([int(p90)], type=pa.int64()),
                "n_sample": pa.array([int(n)], type=pa.int64()),
            }
        )

    return (
        ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .map_groups(qtile, batch_format="pyarrow")
    )


def sales_rollup(sf_dir: str):
    """Multi-grain rollup (GROUPING SETS): order counts and exact cents
    at four grains — (segment, nation), (segment), (nation) and the
    grand total — from ONE pass over orders.  Each batch pre-aggregates
    only the FINEST grain (composite seg*|nations|+nation bincount);
    because count/cents are distributive, the three coarser grains
    derive from the finest's tiny final table (<= |seg| x |nations|
    rows, a bounded driver fold — the q3 merge pattern), so the rollup
    costs one shuffle of dimension-bounded rows, not four scans."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    looks = _collect_columns_parallel(
        {
            "cust": (
                rd.read_parquet(
                    f"{sf_dir}/customer.parquet",
                    columns=["c_custkey", "c_mktsegment", "c_nationkey"],
                ),
                ["c_custkey", "c_mktsegment", "c_nationkey"],
            ),
            "nat": (
                rd.read_parquet(
                    f"{sf_dir}/nation.parquet",
                    columns=["n_nationkey", "n_name"],
                ),
                ["n_nationkey", "n_name"],
            ),
        }
    )
    cust, nat = looks["cust"], looks["nat"]
    keys = cust["c_custkey"].astype(np.int64)
    seg_names, segc = np.unique(
        cust["c_mktsegment"].astype(object), return_inverse=True
    )
    natk = cust["c_nationkey"].astype(np.int64)
    order = np.argsort(keys, kind="stable")
    nat_names = np.empty(
        int(nat["n_nationkey"].astype(np.int64).max()) + 1, dtype=object
    )
    nat_names[nat["n_nationkey"].astype(np.int64)] = nat["n_name"]
    n_nat = len(nat_names)
    ref = ray.put((keys[order], segc[order].astype(np.int64), natk[order]))

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if b.num_rows == 0:
            return pa.table({"sn": z, "n": z, "cents": z})
        keys, segc, natk = ray.get(ref)
        i = np.searchsorted(keys, b["o_custkey"].to_numpy().astype(np.int64))
        sn = segc[i] * n_nat + natk[i]
        cents = _cents(b["o_totalprice"].to_numpy())
        uniq, inv = np.unique(sn, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        tot = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(tot, inv, cents)
        return pa.table(
            {"sn": pa.array(uniq), "n": pa.array(cnt), "cents": pa.array(tot)}
        )

    fine = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("sn")
        .aggregate(Sum("n", alias_name="n"), Sum("cents", alias_name="cents"))
        .take_all()  # <= |segments| x |nations| bounded rows
    )
    sn = np.array([int(r["sn"]) for r in fine], dtype=np.int64)
    n = np.array([int(r["n"]) for r in fine], dtype=np.int64)
    c = np.array([int(r["cents"]) for r in fine], dtype=np.int64)
    seg_i, nat_i = sn // n_nat, sn % n_nat
    out_s, out_n, out_cnt, out_c = [], [], [], []

    def emit(s, na, cnt, cents):
        out_s.append(s)
        out_n.append(na)
        out_cnt.append(int(cnt))
        out_c.append(int(cents))

    for si, ni, cnt, cents in zip(seg_i, nat_i, n, c):
        emit(seg_names[si], nat_names[ni], cnt, cents)
    for si in np.unique(seg_i):
        m = seg_i == si
        emit(seg_names[si], "(all)", n[m].sum(), c[m].sum())
    for ni in np.unique(nat_i):
        m = nat_i == ni
        emit("(all)", nat_names[ni], n[m].sum(), c[m].sum())
    emit("(all)", "(all)", n.sum(), c.sum())
    return pa.table(
        {
            "seg": pa.array(out_s, type=pa.string()),
            "nation": pa.array(out_n, type=pa.string()),
            "n_orders": pa.array(out_cnt, type=pa.int64()),
            "cents": pa.array(out_c, type=pa.int64()),
        }
    )


def event_transitions(sf_dir: str):
    """Markov transition counts: how often event type A is immediately
    followed by type B within one user's (ts, event_id)-ordered stream
    — the sequence-mining primitive behind funnel analysis and
    next-event models.

    Users hash into coarse partitions; one lexsort + adjacent-pair
    bincount per part (types dictionary-coded, composite prev*K+next
    keys); the final fold moves only (type, type, n) rows — type-pair
    cardinality is BOUNDED, so the native groupby Sum is fine."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    def pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"prev": pa.array([], type=pa.string()),
                             "event_type": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        user = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts, user))
        u = user[order]
        # Arrow dictionary-encode (C hash table) replaces the
        # object-array np.unique sort; code order is irrelevant
        denc = pc.dictionary_encode(g["event_type"].combine_chunks())
        codes = denc.indices.to_numpy(
            zero_copy_only=False).astype(np.int64)[order]
        uniq = np.asarray(denc.dictionary.to_pylist(), dtype=object)
        k = len(uniq)
        same = u[1:] == u[:-1]
        key = codes[:-1][same] * k + codes[1:][same]
        cnt = np.bincount(key, minlength=k * k).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "prev": pa.array(uniq[nz // k], type=pa.string()),
                "event_type": pa.array(uniq[nz % k], type=pa.string()),
                "n": pa.array(cnt[nz]),
            }
        )

    return (
        ds.map_batches(_add_user_part, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("part")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["prev", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


def set_ops_users_customers(sf_dir: str):
    """Set operations: |distinct event users ∩ customer keys|,
    |users ∖ customers|, |customers ∖ users| — one row of exact counts.

    Physical plan: the distinct user set reduces per batch (np.unique
    partials), the customer key side broadcasts sorted; both set
    differences are searchsorted membership tests — no shuffle."""
    import ray
    import ray.data as rd

    cust = _collect_columns(
        rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"]),
        ["c_custkey"],
    )
    ckeys = np.sort(cust["c_custkey"].astype(np.int64))
    ref = ray.put(ckeys)

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    n_parts = 64  # coarse distinct partitions (each user in exactly one)

    def partial(b: pa.Table) -> pa.Table:
        u = np.unique(b["user_id"].to_numpy().astype(np.int64))
        part = ((u.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                % np.uint64(n_parts)).astype(np.int32)
        return pa.table({"part": pa.array(part), "user_id": pa.array(u)})

    def part_counts(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"n_users": z, "n_inter": z})
        # exact per-part distinct + membership vs the broadcast keys;
        # parts partition the user space, so the per-part counts sum to
        # the global answer — the coarse-partition distinct layout (no
        # driver fold of the user set)
        ck = ray.get(ref)
        u = np.unique(g["user_id"].to_numpy(zero_copy_only=False))
        idx = np.searchsorted(ck, u)
        in_cust = (idx < len(ck)) & (ck[np.minimum(idx, len(ck) - 1)] == u)
        return pa.table(
            {"n_users": pa.array([len(u)], type=pa.int64()),
             "n_inter": pa.array([int(in_cust.sum())], type=pa.int64())}
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(part_counts, batch_format="pyarrow")
        .take_all()
    )
    n_users = int(sum(r["n_users"] for r in counts))
    n_inter = int(sum(r["n_inter"] for r in counts))
    ck = ray.get(ref)
    return pa.table(
        {
            "n_intersect": pa.array([n_inter], type=pa.int64()),
            "n_users_only": pa.array([n_users - n_inter], type=pa.int64()),
            "n_customers_only": pa.array([len(ck) - n_inter], type=pa.int64()),
        }
    )


HLL_P = 12  # 4096 registers; rel. error ~1.04/sqrt(m) ~ 1.6%


def approx_distinct_users(sf_dir: str):
    """HyperLogLog distinct-user sketch — the mergeable-sketch pattern:
    each batch reduces to a 2^12-register maxima vector (one tiny row),
    registers fold with elementwise max in any order, the estimate is
    computed once at the end (standard alpha_m bias correction +
    linear-counting small-range correction).

    Approximate by design -> rows-only driver check; pytest bounds the
    relative error against the exact distinct count."""
    import hashlib

    import ray.data as rd

    m = 1 << HLL_P

    def partial(b: pa.Table) -> pa.Table:
        regs = np.zeros(m, dtype=np.uint8)
        u = np.unique(b["user_id"].to_numpy().astype(np.int64))
        # md5-based 64-bit hash: stable across workers, no seed deps
        hs = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(int(x).to_bytes(8, "big")).digest()[:8], "big"
                )
                for x in u
            ),
            dtype=np.uint64,
            count=len(u),
        )
        reg_idx = (hs >> np.uint64(64 - HLL_P)).astype(np.int64)
        rest = hs << np.uint64(HLL_P)  # remaining 64-HLL_P bits, top-aligned
        # rank = leading zeros of `rest` + 1 (capped by the field width)
        lz = np.full(len(hs), 64 - HLL_P, dtype=np.uint8)
        nz = rest != 0
        # float log2 is unsafe at 64 bits; count leading zeros with the
        # standard shift-normalize halving steps, vectorized
        v = rest[nz]
        acc = np.zeros(v.shape, dtype=np.uint64)
        for s_bits in (32, 16, 8, 4, 2, 1):
            mask = v < (np.uint64(1) << np.uint64(64 - s_bits))
            acc += np.where(mask, np.uint64(s_bits), np.uint64(0))
            v = np.where(mask, v << np.uint64(s_bits), v)
        lz[nz] = acc.astype(np.uint8)
        rank = np.minimum(lz + 1, 64 - HLL_P + 1).astype(np.uint8)
        np.maximum.at(regs, reg_idx, rank)
        return pa.table({"regs": pa.array([regs.tobytes()], type=pa.large_binary())})

    parts = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    regs = np.zeros(m, dtype=np.uint8)
    for r in parts:
        regs = np.maximum(regs, np.frombuffer(r["regs"], dtype=np.uint8))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.float64(2.0) ** (-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # linear counting, small-range
    return pa.table({"approx_distinct": pa.array([int(round(est))],
                                                 type=pa.int64())})


def top_orders_per_segment(sf_dir: str, *, k: int = 3):
    """Window-function shape: rank() OVER (PARTITION BY segment ORDER BY
    totalprice DESC) <= k.  Physical plan: per-batch local top-k per
    segment inside map_batches (a combiner — only k rows per (batch x
    segment) shuffle), then a tiny per-segment merge.  Deterministic
    tie-break (totalprice DESC, orderkey ASC); the doubles pass through
    untouched so hashes agree."""
    import ray
    import ray.data as rd

    seg_ref = ray.put(_segment_lookup(sf_dir))

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def local_topk(b: pa.Table) -> pa.Table:
        skeys, scodes, names = ray.get(seg_ref)
        seg_codes = _seg_of(
            skeys, scodes, b["o_custkey"].to_numpy().astype(np.int64)
        )
        keys = b["o_orderkey"].to_numpy().astype(np.int64)
        price = b["o_totalprice"].to_numpy()
        # vectorized per-segment top-k: global (price desc, key asc)
        # order, then a stable re-sort by segment keeps that order
        # within each segment; rank-within-segment = position - segment
        # start, computed from run boundaries — no per-row Python loop
        order = np.lexsort((keys, -price))
        by_seg = np.argsort(seg_codes[order], kind="stable")
        rows = order[by_seg]
        segs_r = seg_codes[rows]
        is_start = np.r_[True, segs_r[1:] != segs_r[:-1]]
        starts = np.flatnonzero(is_start)
        run_id = np.cumsum(is_start) - 1
        rank = np.arange(len(rows)) - starts[run_id]
        keep = rows[rank < k]
        return pa.table(
            {
                "c_mktsegment": pa.array(
                    names[seg_codes[keep]], type=pa.string()
                ),
                "o_orderkey": pa.array(keys[keep], type=pa.int64()),
                "o_totalprice": pa.array(price[keep], type=pa.float64()),
            }
        )

    local = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g
        tp = g["o_totalprice"].to_numpy(zero_copy_only=False)
        ok = g["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((ok, -tp))[:k]
        return g.take(o)

    return local.groupby("c_mktsegment").map_groups(merge, batch_format="pyarrow")


# --- as-of / range join: shared probe kernels + size-gated layouts ----------
#
# Both queries probe a per-customer time-sorted order index.  The index
# is represented as three GLOBAL arrays sorted by (custkey, date[, key])
# — a customer's slice is found with two searchsorteds — which works
# identically whether the arrays cover the whole table (broadcast path)
# or one co-partition (partitioned path).  The probe itself is one
# vectorized searchsorted per DISTINCT customer in the probe set.

N_COPART = 64  # co-partitions for the fact-fact probe layout


def _copart_tag(key: np.ndarray) -> np.ndarray:
    """part = hash(key) % N_COPART via the golden-ratio multiplier —
    the ONE definition of the fact-fact co-partition layout (both sides
    of every co-partitioned join must use it or keys stop co-locating:
    _probe_join and orders_with_late_items)."""
    gold = np.uint64(0x9E3779B97F4A7C15)
    return ((key.view(np.uint64) * gold) % np.uint64(N_COPART)).astype(np.int32)


def _sum_by_key(k: np.ndarray, v: np.ndarray):
    """(unique_keys, per-key int64 sums) — the vectorized sum-by-key of
    the coarse-partition final folds (one np.unique + np.add.at pass;
    NOT a per-key groupby().aggregate(), which pays per-key scheduling
    on pandas blocks — NOTES_r3 item 65)."""
    ku, inv = np.unique(k, return_inverse=True)
    tot = np.zeros(len(ku), dtype=np.int64)
    np.add.at(tot, inv, v)
    return ku, tot


def _asof_probe_sorted(ev_key, ev_ts, ock, ot, oid) -> np.ndarray:
    """latest oid with ot <= ev_ts among rows of the same key; -1 if none.
    (ock, ot, oid) must be lexsorted by (ock, ot, oid) — ties resolve to
    the max orderkey of the max qualifying date."""
    out = np.full(len(ev_key), -1, dtype=np.int64)
    order = np.argsort(ev_key, kind="stable")
    uniq, starts = np.unique(ev_key[order], return_index=True)
    bounds = np.append(starts, len(ev_key))
    olo = np.searchsorted(ock, uniq, side="left")
    ohi = np.searchsorted(ock, uniq, side="right")
    for i in range(len(uniq)):
        if olo[i] == ohi[i]:
            continue
        rows = order[bounds[i]:bounds[i + 1]]
        dates = ot[olo[i]:ohi[i]]
        keys = oid[olo[i]:ohi[i]]
        j = np.searchsorted(dates, ev_ts[rows], side="right")
        sel = j > 0
        out[rows[sel]] = keys[j[sel] - 1]
    return out


def _range_probe_sorted(ev_key, ev_ts, span, ock, ot) -> np.ndarray:
    """count of rows with same key and ot in [ev_ts - span, ev_ts]."""
    out = np.zeros(len(ev_key), dtype=np.int64)
    order = np.argsort(ev_key, kind="stable")
    uniq, starts = np.unique(ev_key[order], return_index=True)
    bounds = np.append(starts, len(ev_key))
    olo = np.searchsorted(ock, uniq, side="left")
    ohi = np.searchsorted(ock, uniq, side="right")
    for i in range(len(uniq)):
        if olo[i] == ohi[i]:
            continue
        rows = order[bounds[i]:bounds[i + 1]]
        dates = ot[olo[i]:ohi[i]]
        r = np.searchsorted(dates, ev_ts[rows], side="right")
        left = np.searchsorted(dates, ev_ts[rows] - span, side="left")
        out[rows] = r - left
    return out


def _orders_sorted_arrays(tbl: pa.Table, with_keys: bool):
    """(ock, ot[, oid]) lexsorted by (custkey, date[, orderkey])."""
    ck = tbl["o_custkey"].to_numpy().astype(np.int64)
    t = tbl["o_orderdate"].cast(pa.int64()).to_numpy()
    if with_keys:
        oid = tbl["o_orderkey"].to_numpy().astype(np.int64)
        order = np.lexsort((oid, t, ck))
        return ck[order], t[order], oid[order]
    order = np.lexsort((t, ck))
    return ck[order], t[order], None


def _probe_join(sf_dir: str, *, with_keys: bool, out_col: str,
                probe, via: str = "auto"):
    """Shared physical plan for as-of / range join.

    via="broadcast": the orders index (pruned columns only, scanned
    DISTRIBUTED, folded to sorted arrays) ships once via ray.put and
    every events batch probes it — right for order sides that fit a
    worker heap.  via="partitioned": events and orders co-partition by
    hash(customer) (one groupby — no driver materialization of either
    fact table) and the same probe kernel runs per co-partition — the
    10^12-row layout.  via="auto" (default) picks by the orders row
    count vs FACT_BROADCAST_MAX_ROWS.  Both paths produce identical
    integers (pytest asserts equality)."""
    import ray
    import ray.data as rd

    cols = ["o_custkey", "o_orderdate"] + (["o_orderkey"] if with_keys else [])
    ord_ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=cols)
    if via == "auto":
        # parquet count comes from file metadata — no scan
        via = ("broadcast" if ord_ds.count() <= FACT_BROADCAST_MAX_ROWS
               else "partitioned")
    ev_ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    if via == "broadcast":
        arrs = _collect_columns(ord_ds, cols)
        tbl = pa.table({c: pa.array(arrs[c]) for c in cols})
        ock, ot, oid = _orders_sorted_arrays(tbl, with_keys)
        ref = ray.put((ock, ot, oid))

        def lookup(b: pa.Table) -> pa.Table:
            ock_, ot_, oid_ = ray.get(ref)
            users = b["user_id"].to_numpy().astype(np.int64)
            ts = b["ts"].cast(pa.int64()).to_numpy()
            vals = probe(users, ts, ock_, ot_, oid_)
            return pa.table(
                {"event_id": b["event_id"],
                 out_col: pa.array(vals, type=pa.int64())}
            )

        return ev_ds.map_batches(
            lookup, batch_format="pyarrow", zero_copy_batch=True
        )

    # partitioned: normalize both sides to (key, t, id, side), tag with
    # part = _copart_tag(key), one hash shuffle co-locates each
    # customer's events AND orders, then the probe kernel runs per part.

    def ev_norm(b: pa.Table) -> pa.Table:
        key = b["user_id"].to_numpy().astype(np.int64)
        part = _copart_tag(key)
        return pa.table(
            {
                "part": pa.array(part),
                "key": pa.array(key),
                "t": pa.array(b["ts"].cast(pa.int64()).to_numpy()),
                "id": pa.array(b["event_id"].to_numpy().astype(np.int64)),
                "side": pa.array(np.ones(b.num_rows, dtype=np.int8)),
            }
        )

    def ord_norm(b: pa.Table) -> pa.Table:
        key = b["o_custkey"].to_numpy().astype(np.int64)
        part = _copart_tag(key)
        oid = (b["o_orderkey"].to_numpy().astype(np.int64) if with_keys
               else np.zeros(b.num_rows, dtype=np.int64))
        return pa.table(
            {
                "part": pa.array(part),
                "key": pa.array(key),
                "t": pa.array(b["o_orderdate"].cast(pa.int64()).to_numpy()),
                "id": pa.array(oid),
                "side": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
            }
        )

    both = ev_ds.map_batches(
        ev_norm, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        ord_ds.map_batches(ord_norm, batch_format="pyarrow", zero_copy_batch=True)
    )

    def probe_group(g: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if g.num_rows == 0:
            return pa.table({"event_id": z, out_col: z})
        side = g["side"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = g["t"].to_numpy(zero_copy_only=False).astype(np.int64)
        gid = g["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        om = side == 0
        em = side == 1
        if not em.any():
            return pa.table({"event_id": z, out_col: z})
        ock_, ot_, oid_ = key[om], t[om], gid[om]
        order = np.lexsort((oid_, ot_, ock_))
        vals = probe(key[em], t[em],
                     ock_[order], ot_[order], oid_[order])
        return pa.table(
            {"event_id": pa.array(gid[em]),
             out_col: pa.array(vals, type=pa.int64())}
        )

    out = both.groupby("part").map_groups(probe_group, batch_format="pyarrow")

    def fix_schema(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "event_id" not in b.column_names:
            return pa.table({"event_id": pa.array([], type=pa.int64()),
                             out_col: pa.array([], type=pa.int64())})
        return pa.table({"event_id": b["event_id"].cast(pa.int64()),
                         out_col: b[out_col].cast(pa.int64())})

    return out.map_batches(fix_schema, batch_format="pyarrow")


def range_join_recent_orders(sf_dir: str, *, days: int = 7, via: str = "auto"):
    """Range (interval) join: per event, how many orders of the same
    customer fall in [ts - days, ts].  Size-gated physical plan: the
    per-customer sorted date index broadcasts when the order side is
    small, else events/orders co-partition by customer hash and the same
    searchsorted probe runs per partition (see _probe_join)."""
    span = days * 86_400_000_000  # us

    def probe(users, ts, ock, ot, oid):
        return _range_probe_sorted(users, ts, span, ock, ot)

    return _probe_join(sf_dir, with_keys=False, out_col="n_recent_orders",
                       probe=probe, via=via)


def asof_latest_order(sf_dir: str, *, via: str = "auto"):
    """As-of join: for each event, the latest order of the same customer
    with o_orderdate <= ts (ties -> max orderkey; -1 if none).  Same
    size-gated broadcast/co-partitioned plan as the range join."""

    def probe(users, ts, ock, ot, oid):
        return _asof_probe_sorted(users, ts, ock, ot, oid)

    return _probe_join(sf_dir, with_keys=True, out_col="latest_orderkey",
                       probe=probe, via=via)


def split_of(ids: np.ndarray) -> np.ndarray:
    """The ONE split-assignment rule (split_assign_counts' contract,
    shared with dedup.split_leakage so the two can never drift): first
    md5 hex byte of str(doc_id), < 0xfa train, < 0xfd val, else test.
    Two-hex-char lexicographic compare == numeric compare on the first
    hash byte, so DuckDB's md5() mirrors it exactly."""
    import hashlib

    h2 = [hashlib.md5(str(int(i)).encode()).hexdigest()[:2] for i in ids]
    return np.asarray(
        ["train" if h < "fa" else ("val" if h < "fd" else "test")
         for h in h2],
        dtype=object,
    )


def split_assign_counts(sf_dir: str):
    """Deterministic train/val/test split assignment — the dataset-prep
    op every training pipeline runs before tokenization.  split =
    first md5 hex byte of str(doc_id): < 0xfa train (~250/256), < 0xfd
    val, else test.  The two-hex-char LEXICOGRAPHIC compare equals the
    numeric compare (fixed-width lowercase hex), so DuckDB's md5()
    mirrors it exactly.  Per-batch partial counts -> tiny final groupby
    (no shuffle of the rows themselves)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def partial(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy().astype(np.int64)
        splits = split_of(ids)
        t = pa.table(
            {
                "split": pa.array(splits, type=pa.string()),
                "one": pa.array(np.ones(len(ids), dtype=np.int64)),
            }
        )
        return t.group_by("split").aggregate([("one", "sum")])

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("split")
        .aggregate(Sum("one_sum", alias_name="n_docs"))
    )


CWO_CUTOFF = "2001-01-01"


def customers_without_orders(sf_dir: str, *, via: str = "auto"):
    """Windowed anti-join: per market segment, customers with NO order on
    or after CWO_CUTOFF (lapsed customers — the churn query).  The date
    filter is pushed to the parquet scan, so only recent row groups
    leave storage.

    SIZE-GATED like global_sales_opportunity: via="broadcast" ships the
    distinct recent-order custkeys (per-batch unique + driver fold,
    sorted, ray.put) and anti-probes with one searchsorted per batch —
    right while the customer dimension bounds the key set;
    via="partitioned" co-partitions customers and recent-order custkeys
    by hash(custkey) % N_COPART and runs the same probe per part (the
    10^9-customer layout).  via="auto" gates on the customer row count
    (parquet metadata).  Both layouts produce identical integers
    (pytest asserts equality)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    cutoff = np.datetime64(CWO_CUTOFF, "us")
    ord_ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= pa.scalar(cutoff)),
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    if via == "auto":
        via = ("broadcast" if cust.count() <= FACT_BROADCAST_MAX_ROWS
               else "partitioned")

    if via == "broadcast":

        def uniq(b: pa.Table) -> pa.Table:
            b = b.filter(
                pc.greater_equal(b["o_orderdate"], pa.scalar(cutoff)))
            return pa.table(
                {"k": pa.array(np.unique(
                    b["o_custkey"].to_numpy().astype(np.int64)))}
            )

        have = np.unique(
            _collect_columns(
                ord_ds.map_batches(uniq, batch_format="pyarrow",
                                   zero_copy_batch=True),
                ["k"],
            )["k"]
        )
        ref = ray.put(have)

        def partial(b: pa.Table) -> pa.Table:
            hk = ray.get(ref)
            k = b["c_custkey"].to_numpy().astype(np.int64)
            b = b.filter(pa.array(_anti_probe(hk, k)))
            t = pa.table(
                {
                    "c_mktsegment": b["c_mktsegment"],
                    "one": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                }
            )
            return t.group_by("c_mktsegment").aggregate([("one", "sum")])

        partials = cust.map_batches(partial, batch_format="pyarrow",
                                    zero_copy_batch=True)
    else:

        def o_norm(b: pa.Table) -> pa.Table:
            b = b.filter(
                pc.greater_equal(b["o_orderdate"], pa.scalar(cutoff)))
            k = np.unique(b["o_custkey"].to_numpy().astype(np.int64))
            return pa.table({
                "part": pa.array(_copart_tag(k)), "key": pa.array(k),
                "seg": pa.array([""] * len(k), type=pa.string()),
                "side": pa.array(np.zeros(len(k), dtype=np.int8)),
            })

        def c_norm(b: pa.Table) -> pa.Table:
            k = b["c_custkey"].to_numpy().astype(np.int64)
            return pa.table({
                "part": pa.array(_copart_tag(k)), "key": pa.array(k),
                "seg": b["c_mktsegment"],
                "side": pa.array(np.ones(b.num_rows, dtype=np.int8)),
            })

        def fold(g: pa.Table) -> pa.Table:
            side = g["side"].to_numpy(zero_copy_only=False)
            key = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
            c_mask = side == 1
            if not c_mask.any():
                return pa.table({
                    "c_mktsegment": pa.array([], type=pa.string()),
                    "one_sum": pa.array([], type=pa.int64()),
                })
            have = np.unique(key[side == 0])
            keep = _anti_probe(have, key[c_mask])
            seg = np.asarray(g["seg"].to_pylist(), dtype=object)[c_mask][keep]
            su, counts = np.unique(seg, return_counts=True)
            return pa.table({
                "c_mktsegment": pa.array(su, type=pa.string()),
                "one_sum": pa.array(counts.astype(np.int64)),
            })

        partials = (
            ord_ds.map_batches(o_norm, batch_format="pyarrow",
                               zero_copy_batch=True)
            .union(cust.map_batches(c_norm, batch_format="pyarrow",
                                    zero_copy_batch=True))
            .groupby("part")
            .map_groups(fold, batch_format="pyarrow")
        )

    return (
        partials
        .groupby("c_mktsegment")
        .aggregate(Sum("one_sum", alias_name="n_no_order"))
    )


def segment_price_quantiles(sf_dir: str):
    """Exact grouped quantiles: per market segment, the order-total
    cents at the 50th and 90th percentile, deterministic tie-break by
    orderkey — value at sorted index floor(q*(n-1)) (mirrored in SQL
    with row_number over (cents, orderkey)).  Physical plan: segment
    attach via the broadcast searchsorted lookup, then one map_groups
    per segment (5 groups; at higher group cardinality this becomes the
    coarse-partition pattern)."""
    import ray
    import ray.data as rd

    ref = ray.put(_segment_lookup(sf_dir))

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def attach(b: pa.Table) -> pa.Table:
        keys, codes, names = ray.get(ref)
        seg = _seg_of(keys, codes, b["o_custkey"].to_numpy().astype(np.int64))
        return pa.table(
            {
                "c_mktsegment": pa.array(names[seg], type=pa.string()),
                "cents": pa.array(_cents(b["o_totalprice"].to_numpy())),
                "o_orderkey": pa.array(
                    b["o_orderkey"].to_numpy().astype(np.int64)
                ),
            }
        )

    def quant(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"c_mktsegment": pa.array([], type=pa.string()),
                             "p50_cents": z, "p90_cents": z, "n_orders": z})
        (p50, p90), n = _exact_pctiles(
            g["cents"].to_numpy(zero_copy_only=False),
            g["o_orderkey"].to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                "c_mktsegment": pa.array([g["c_mktsegment"][0].as_py()],
                                         type=pa.string()),
                "p50_cents": pa.array([int(p50)], type=pa.int64()),
                "p90_cents": pa.array([int(p90)], type=pa.int64()),
                "n_orders": pa.array([int(n)], type=pa.int64()),
            }
        )

    return (
        ds.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_mktsegment")
        .map_groups(quant, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# shuffle-key skew profiling — the report every wide groupby/join over
# 100 TB should consult BEFORE it runs (hot keys decide salting)

HOT_KEYS_K = 10
_POW2 = (np.int64(1) << np.arange(63, dtype=np.int64))


def _user_count_partial(b: pa.Table) -> pa.Table:
    """Per-batch (user_id, n, part) count partial — the pre-combine so
    only per-batch-distinct users shuffle, never event rows."""
    from prlib_ray.stages.reassemble import N_REASSEMBLE_PARTS

    z = pa.array([], type=pa.int64())
    if b.num_rows == 0:
        return pa.table({"user_id": z, "n": z, "part": z})
    u = b["user_id"].to_numpy().astype(np.int64)
    uu, cnt = np.unique(u, return_counts=True)
    return pa.table(
        {
            "user_id": pa.array(uu),
            "n": pa.array(cnt.astype(np.int64)),
            "part": pa.array(uu % N_REASSEMBLE_PARTS),
        }
    )


def _fold_user_totals(g: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Exact per-user totals within one coarse partition: one stable
    lexsort + run-boundary reduceat (no per-key group anywhere)."""
    u = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(u, kind="stable")
    u, n = u[o], n[o]
    first = np.r_[True, u[1:] != u[:-1]]
    return u[first], np.add.reduceat(n, np.flatnonzero(first))


def key_skew_profile(sf_dir: str):
    """Group-size skew histogram over events.user_id: for each
    power-of-two bucket (floor(log2 of the key's row count)), how many
    keys and how many rows land there.  A flat profile shuffles
    cleanly; rows piling into the top buckets say "salt these keys"
    (the flagship's mega-thread salting is the response this report
    triggers).

    Plan: per-batch count partials -> coarse user partitions -> one
    lexsort fold per part -> per-part bucket histogram -> bounded
    (<= 63-key) final groupby.  Event rows never shuffle; the bucket
    is integer-exact (searchsorted over powers of two == DuckDB's
    length(format('{:b}', n)) - 1)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def bucket_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"bucket": z, "n_keys": z, "n_rows": z})
        _, tot = _fold_user_totals(g)
        bucket = np.searchsorted(_POW2, tot, side="right") - 1
        keys = np.bincount(bucket, minlength=64)
        # exact int64 sums: float-weighted bincount would round past
        # 2^53 rows per (part, bucket), breaking the integer oracle
        rows_ = np.zeros(64, dtype=np.int64)
        np.add.at(rows_, bucket, tot)
        nz = np.flatnonzero(keys)
        return pa.table(
            {
                "bucket": pa.array(nz.astype(np.int64)),
                "n_keys": pa.array(keys[nz].astype(np.int64)),
                "n_rows": pa.array(rows_[nz]),
            }
        )

    return (
        ds.map_batches(_user_count_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("part")
        .map_groups(bucket_fold, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n_keys", alias_name="n_keys"),
                   Sum("n_rows", alias_name="n_rows"))
        .sort("bucket")
    )


def hot_keys(sf_dir: str):
    """The HOT_KEYS_K hottest shuffle keys (user_id, n_rows) — largest
    counts first, ties to the smaller user_id; the named-key companion
    to key_skew_profile's histogram.

    Per-part local top-K over the same count partials, <= K * parts
    candidate rows merge on the driver (the q3 / search_topk bounded-
    merge pattern)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def local_topk(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"user_id": z, "n_rows": z})
        u, tot = _fold_user_totals(g)
        o = np.lexsort((u, -tot))[:HOT_KEYS_K]
        return pa.table(
            {"user_id": pa.array(u[o]), "n_rows": pa.array(tot[o])}
        )

    cand = (
        ds.map_batches(_user_count_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("part")
        .map_groups(local_topk, batch_format="pyarrow")
    ).take_all()
    u = np.asarray([r["user_id"] for r in cand], dtype=np.int64)
    n = np.asarray([r["n_rows"] for r in cand], dtype=np.int64)
    o = np.lexsort((u, -n))[:HOT_KEYS_K]
    return pa.table(
        {"user_id": pa.array(u[o]), "n_rows": pa.array(n[o])}
    )


# ---------------------------------------------------------------------------
# semi-structured extraction: the events.props JSON column

# pyarrow extract_regex requires a NAMED group; the oracle's DuckDB
# pattern is identical but for the (?P<k> ) name (group semantics match)
PROPS_K_RE = r'"k"\s*:\s*(?P<k>-?\d+)'
_PROPS_SENTINEL = np.int64(1) << np.int64(62)


def props_field_stats(sf_dir: str):
    """Parse the JSON ``props`` column's ``k`` field and aggregate per
    event_type: total events, events with a parsable k, and exact
    sum/min/max of k — the semi-structured-extraction primitive every
    event pipeline needs (no Python json.loads loop anywhere).

    Plan: one RE2 ``extract_regex`` pass per batch + a vectorized
    per-(batch, event_type) partial (dictionary codes, add.at /
    minimum.at — exact int64), then a Ray-native groupby over the
    BOUNDED event-type key set.  Raw rows never shuffle; only
    <= n_types partial rows per batch do.  A type whose every props
    row is unparsable keeps sentinel min/max (documented; sum and
    counts stay exact) — the fixtures always parse."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "event_type": pa.array([], type=pa.string()),
            "n_events": pa.array([], type=pa.int64()),
            "n_with_k": pa.array([], type=pa.int64()),
            "sum_k": pa.array([], type=pa.int64()),
            "min_k": pa.array([], type=pa.int64()),
            "max_k": pa.array([], type=pa.int64()),
        })
        if b.num_rows == 0:
            return empty
        et = b["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        # NULL event_type folds into '' on BOTH sides (the oracle
        # coalesces) — dictionary codes must never carry a null index
        et = pc.fill_null(et, "")
        d = pc.dictionary_encode(et)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_types = len(d.dictionary)
        ex = pc.extract_regex(b["props"], PROPS_K_RE)
        kstr = pc.struct_field(ex, 0)
        valid = pc.is_valid(kstr).to_numpy(zero_copy_only=False)
        k = np.zeros(b.num_rows, dtype=np.int64)
        if valid.any():
            # mirror TRY_CAST: a matched integer that overflows int64
            # becomes invalid (NULL), not a crash.  Strip sign and
            # leading zeros, then length/lexicographic boundary compare
            # (equal-length digit strings order numerically).
            sub = pc.drop_null(kstr)
            negs = pc.starts_with(sub, "-").to_numpy(zero_copy_only=False)
            digits = pc.replace_substring_regex(sub, r"^-?0*", "")
            L = pc.utf8_length(digits).to_numpy(zero_copy_only=False)
            dstr = np.asarray(digits.to_pylist(), dtype=object)
            bound = np.where(negs, "9223372036854775808",
                             "9223372036854775807")
            fits = (L < 19) | ((L == 19) & (dstr <= bound))
            vpos = np.flatnonzero(valid)
            valid = np.zeros(b.num_rows, dtype=bool)
            valid[vpos[fits]] = True
            if fits.any():
                k[valid] = np.asarray(
                    pc.cast(sub.filter(pa.array(fits)),
                            pa.int64()).to_numpy(zero_copy_only=False),
                    dtype=np.int64,
                )
        n_ev = np.bincount(codes, minlength=n_types).astype(np.int64)
        n_k = np.bincount(codes[valid], minlength=n_types).astype(np.int64)
        s = np.zeros(n_types, dtype=np.int64)
        np.add.at(s, codes[valid], k[valid])
        mn = np.full(n_types, _PROPS_SENTINEL, dtype=np.int64)
        mx = np.full(n_types, -_PROPS_SENTINEL, dtype=np.int64)
        np.minimum.at(mn, codes[valid], k[valid])
        np.maximum.at(mx, codes[valid], k[valid])
        # a type with no parsable k in this partial contributes NULL
        # sum/min/max (like SQL aggregates over an empty group); the
        # final Min/Max/Sum ignore nulls, so a type that never parses
        # anywhere ends NULL — exactly the oracle's value
        nok = n_k == 0
        return pa.table({
            "event_type": d.dictionary,
            "n_events": pa.array(n_ev),
            "n_with_k": pa.array(n_k),
            "sum_k": pa.array(s, mask=nok),
            "min_k": pa.array(mn, mask=nok),
            "max_k": pa.array(mx, mask=nok),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("n_with_k", alias_name="n_with_k"),
            Sum("sum_k", alias_name="sum_k"),
            Min("min_k", alias_name="min_k"),
            Max("max_k", alias_name="max_k"),
        )
        .sort("event_type")
    )


# ---------------------------------------------------------------------------
# ordered funnel conversion — the product-analytics primitive

FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_conversion(sf_dir: str):
    """Ordered funnel over the event stream: how many users performed
    'view', then 'click' strictly after their FIRST view, then
    'purchase' strictly after that first qualifying click (earliest-
    event chaining, the standard funnel semantics).

    Plan: funnel-type rows only (filtered per batch at the scan) hash
    into the shared coarse user partitions (_add_user_part — each user
    lands wholly in one part), then ONE lexsort + run-boundary pass
    per part chains the three stage minima fully vectorized
    (sentinel + minimum.reduceat per stage — no per-user loop); only
    3 count rows per part reach the final bounded groupby."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from prlib_ray.stages.reassemble import _runs

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    stages = list(FUNNEL_STAGES)

    def prep(b: pa.Table) -> pa.Table:
        et = b["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        keep = pc.is_in(et, value_set=pa.array(stages))
        b = b.filter(keep)
        if b.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], type=pa.int64()),
                "t": pa.array([], type=pa.int64()),
                "stage": pa.array([], type=pa.int64()),
                "part": pa.array([], type=pa.int64()),
            })
        et = b["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        st = np.zeros(b.num_rows, dtype=np.int64)
        for i, name in enumerate(stages):
            st[pc.equal(et, name).to_numpy(zero_copy_only=False)] = i
        u = b["user_id"].to_numpy().astype(np.int64)
        from prlib_ray.stages.reassemble import N_REASSEMBLE_PARTS
        t = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "t": pa.array(t),
            "stage": pa.array(st),
            "part": pa.array(u % N_REASSEMBLE_PARTS),
        })

    INF = np.iinfo(np.int64).max

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"stage": z,
                             "event_type": pa.array([], type=pa.string()),
                             "n_users": z})
        u = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = g["t"].to_numpy(zero_copy_only=False).astype(np.int64)
        st = g["stage"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((t, u))
        u, t, st = u[order], t[order], st[order]
        run, starts, _ = _runs(u)
        # chain the three stage minima: m_{k} = per-user min t of
        # stage-k rows strictly after m_{k-1} (sentinel INF = absent).
        # Stage 0 admits EVERY timestamp, pre-1970 negatives included
        # (the oracle's min(ts) has no epoch restriction); int64.min is
        # NaT's encoding, which both sides exclude.
        prev = np.full(len(t), np.iinfo(np.int64).min, dtype=np.int64)
        ns = []
        for k in range(len(stages)):
            cand = np.where((st == k) & (t > prev), t, INF)
            mk = np.minimum.reduceat(cand, starts)
            ns.append(int((mk < INF).sum()))
            prev = mk[run]
        return pa.table({
            "stage": pa.array(np.arange(1, len(stages) + 1,
                                        dtype=np.int64)),
            "event_type": pa.array(stages, type=pa.string()),
            "n_users": pa.array(ns, type=pa.int64()),
        })

    agg = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .groupby(["stage", "event_type"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    ).take_all()  # bounded: <= len(stages) rows
    # a corpus with NO funnel-type events produces zero parts and an
    # empty aggregate; the report (like the SQL VALUES oracle) always
    # has one row per stage, zero-count included
    got = {int(r["stage"]): int(r["n_users"]) for r in agg}
    return pa.table({
        "stage": pa.array(range(1, len(stages) + 1), type=pa.int64()),
        "event_type": pa.array(stages, type=pa.string()),
        "n_users": pa.array(
            [got.get(i, 0) for i in range(1, len(stages) + 1)],
            type=pa.int64(),
        ),
    })


# --- Cohort retention ---------------------------------------------------------

RETENTION_OFFSETS = (0, 1, 3, 7)
DAY_US = 86_400_000_000


def retention_cohorts(sf_dir: str):
    """Cohort retention: users cohort by their FIRST active day (utc
    day = epoch_us // DAY_US, the events_hourly_window bucket rule one
    grain up), and each cohort reports how many of its users were
    active again exactly ``offset`` days later (offsets 0/1/3/7; the
    day-0 row is the cohort size) — the growth-analytics operator every
    event warehouse runs daily.

    Plan: per-batch DISTINCT (user, day) partials hash into the shared
    coarse user partitions (each user wholly in one part); per part ONE
    lexsort + run-boundary pass finds every user's cohort day, and all
    users' cohort+offset membership probes resolve with one global
    searchsorted per offset on a run-composite axis (run*span + day —
    rolling_event_window's trick, no per-user loop); <= cohorts*offsets
    tiny count rows per part reach the final bounded groupby."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from prlib_ray.stages.reassemble import N_REASSEMBLE_PARTS, _runs

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    max_off = max(RETENTION_OFFSETS)

    empty = pa.table({
        "user_id": pa.array([], type=pa.int64()),
        "day": pa.array([], type=pa.int64()),
        "part": pa.array([], type=pa.int64()),
    })

    def prep(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        u = b["user_id"].to_numpy().astype(np.int64)
        # numpy // FLOORS; the oracle mirrors it with a float floor
        # (exact for |epoch_us| < 2^53, i.e. through year ~2255), so
        # pre-1970 negative epochs agree on both sides
        d = (b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
             // DAY_US)
        order = np.lexsort((d, u))
        u_s, d_s = u[order], d[order]
        first = np.r_[True, (u_s[1:] != u_s[:-1]) | (d_s[1:] != d_s[:-1])]
        u_u, d_u = u_s[first], d_s[first]
        return pa.table({
            "user_id": pa.array(u_u),
            "day": pa.array(d_u),
            "part": pa.array(u_u % N_REASSEMBLE_PARTS),
        })

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"cohort_day": z, "day_offset": z,
                             "n_users": z})
        u = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = g["day"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        # cross-batch distinct within the part
        first = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1])]
        u, d = u[first], d[first]
        run, starts, _ = _runs(u)
        cohort = d[starts]  # sorted within run -> first day = min
        rel = d - d.min()
        span = int(rel.max()) + max_off + 2
        axis = run * span + rel
        out_c, out_o, out_n = [], [], []
        for off in RETENTION_OFFSETS:
            # each user's cohort position on the composite axis is
            # axis[starts]; the probe is that plus the offset
            target = axis[starts] + off
            pos = np.searchsorted(axis, target, side="left")
            hit = axis[np.minimum(pos, len(axis) - 1)] == target
            hc = np.sort(cohort[hit])
            if len(hc) == 0:
                continue
            b_ = np.flatnonzero(np.r_[True, hc[1:] != hc[:-1]])
            out_c.append(hc[b_])
            out_o.append(np.full(len(b_), off, dtype=np.int64))
            out_n.append(np.diff(np.r_[b_, len(hc)]).astype(np.int64))
        if not out_c:
            z = pa.array([], type=pa.int64())
            return pa.table({"cohort_day": z, "day_offset": z,
                             "n_users": z})
        return pa.table({
            "cohort_day": pa.array(np.concatenate(out_c)),
            "day_offset": pa.array(np.concatenate(out_o)),
            "n_users": pa.array(np.concatenate(out_n)),
        })

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .groupby(["cohort_day", "day_offset"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi-join: the scale path for a semi-join whose build-side
# key set is too large to broadcast raw.  The filter compresses n keys to
# ~BLOOM_BITS_PER_KEY bits each; probes that pass the bloom (true members
# plus a deterministic false-positive tail) then settle membership with an
# EXACT Dataset.join on the already-reduced survivor stream — the
# production bloom-join plan (prefilter, then join only what survived).

BLOOM_K = 3              # probes per key (Kirsch-Mitzenmacher double hashing)
BLOOM_BITS_PER_KEY = 8   # m = next_pow2(8 * n_keys): ~3% FP at K=3
BLOOM_SEGMENT = "BUILDING"
N_BLOOM_PARTS = 32       # coarse position-range partitions for the bitmap fold


def _bloom_positions(keys: np.ndarray, m: int) -> np.ndarray:
    """(len(keys), BLOOM_K) int64 bit positions for integer keys via the
    shared md5 double-hash ladder (blocks.md5_ladder_positions — the
    'bf1:'/'bf2:' + str(k) contract, mirrored in SQL through
    oracles_data._byteswap8 of md5_number_upper)."""
    from prlib_ray.blocks import md5_ladder_positions

    payloads = [b"%d" % int(k) for k in keys]
    return md5_ladder_positions(payloads, m, BLOOM_K, b"bf1:", b"bf2:")


def bloom_semi_join(sf_dir: str, *, segment: str = BLOOM_SEGMENT):
    """Per order status: total orders, orders passing a bloom filter built
    over the BLOOM_SEGMENT customers' keys, and the exact member count
    among the passers (so n_pass - n_true is the observable FP tail).

    Plan: (1) count build keys with a pruned filtered scan (c_custkey is
    the customer PK, so count == distinct count) and size
    m = next_pow2(BLOOM_BITS_PER_KEY * n) >= 64 — the SQL mirror computes
    the same m from count(*); (2) per-batch distinct positions ->
    coarse position-RANGE partitions -> one packbits sub-bitmap blob per
    part -> the driver concatenates N_BLOOM_PARTS blobs into the m-bit
    set (m/8 bytes broadcast once via ray.put — never the raw keys);
    (3) probe orders in one map_batches pass emitting per-batch grouped
    survivor partials (o_custkey, status, n) plus one per-status total
    row under the custkey = -1 sentinel (order custkeys are positive;
    asserted); (4) n_true = survivors JOIN build keys (exact, on the
    bloom-reduced stream), n_pass / n_orders = bounded per-status sums.
    Order rows never shuffle; only survivor partials do."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from prlib_ray.stages.dedup import _join_partitions

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        filter=(pc.field("c_mktsegment") == segment),
    )
    n_keys = int(cust.count())
    m = 1 << max(BLOOM_BITS_PER_KEY * n_keys - 1, 63).bit_length()
    seg_len = -(-m // N_BLOOM_PARTS)

    def build_partial(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        empty = pa.table({"pos": z, "part": z})
        if b.num_rows == 0:
            return empty
        b = b.filter(pc.equal(b["c_mktsegment"], segment))
        if b.num_rows == 0:
            return empty
        k = b["c_custkey"].to_numpy().astype(np.int64)
        pos = np.unique(_bloom_positions(k, m))
        return pa.table({"pos": pa.array(pos), "part": pa.array(pos // seg_len)})

    def bitmap_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"part": pa.array([], type=pa.int64()),
                             "blob": pa.array([], type=pa.binary())})
        part = int(g["part"][0].as_py())
        lo = part * seg_len
        ln = min(seg_len, m - lo)
        bits = np.zeros(ln, dtype=bool)
        pos = g["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
        bits[pos - lo] = True
        return pa.table(
            {"part": pa.array([part], type=pa.int64()),
             "blob": pa.array([np.packbits(bits).tobytes()],
                              type=pa.binary())}
        )

    blob_rows = (
        cust.map_batches(build_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby("part")
        .map_groups(bitmap_fold, batch_format="pyarrow")
    ).take_all()
    full = np.zeros(m, dtype=bool)
    for r in blob_rows:
        part = int(r["part"])
        lo = part * seg_len
        ln = min(seg_len, m - lo)
        full[lo:lo + ln] = np.unpackbits(
            np.frombuffer(r["blob"], dtype=np.uint8), count=ln
        ).astype(bool)
    bitset_ref = ray.put(np.packbits(full))

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderstatus"]
    )

    def probe(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "o_custkey": pa.array([], type=pa.int64()),
            "o_orderstatus": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
        })
        if b.num_rows == 0:
            return empty
        bitset = ray.get(bitset_ref)
        k = b["o_custkey"].to_numpy().astype(np.int64)
        assert k.min() >= 0, "custkey sentinel -1 needs non-negative keys"
        st = b["o_orderstatus"]
        if isinstance(st, pa.ChunkedArray):
            st = st.combine_chunks()
        d = pc.dictionary_encode(st)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        statuses = d.dictionary
        n_st = len(statuses)
        ku, inv = np.unique(k, return_inverse=True)
        pos = _bloom_positions(ku, m)
        # packbits is big-endian within the byte: bit i lives at byte
        # i>>3, mask 1 << (7 - i%8)
        bit = (bitset[pos >> 3] >> (7 - (pos & 7)).astype(np.uint8)) & 1
        passk = bit.all(axis=1)
        pass_row = passk[inv]
        tot = np.bincount(codes, minlength=n_st).astype(np.int64)
        out_k = [np.full(n_st, -1, dtype=np.int64)]
        out_s = [np.arange(n_st, dtype=np.int64)]
        out_n = [tot]
        if pass_row.any():
            # survivor partial: grouped per (custkey, status) so only
            # distinct pairs shuffle into the exact join
            key = inv[pass_row] * n_st + codes[pass_row]
            uk, cnt = np.unique(key, return_counts=True)
            out_k.append(ku[uk // n_st])
            out_s.append(uk % n_st)
            out_n.append(cnt.astype(np.int64))
        scode = np.concatenate(out_s)
        return pa.table({
            "o_custkey": pa.array(np.concatenate(out_k)),
            "o_orderstatus": pc.take(statuses, pa.array(scode)),
            "n": pa.array(np.concatenate(out_n)),
        })

    partials = orders.map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    totals = (
        partials.filter(expr="o_custkey < 0")
        .groupby("o_orderstatus")
        .aggregate(Sum("n", alias_name="n_orders"))
    ).take_all()
    survivors = partials.filter(expr="o_custkey >= 0")
    n_pass_rows = (
        survivors.groupby("o_orderstatus")
        .aggregate(Sum("n", alias_name="n_pass"))
    ).take_all()
    n_true: dict[str, int] = {}
    if n_pass_rows:
        build_keys = cust.map_batches(
            lambda b: pa.table(
                {"bk": pa.array(np.unique(
                    b.filter(pc.equal(b["c_mktsegment"], segment))
                    ["c_custkey"].to_numpy().astype(np.int64)))}
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        true_rows = (
            survivors.join(build_keys, "inner",
                           num_partitions=_join_partitions(),
                           on=("o_custkey",), right_on=("bk",))
            .groupby("o_orderstatus")
            .aggregate(Sum("n", alias_name="n_true"))
        ).take_all()
        n_true = {r["o_orderstatus"]: int(r["n_true"]) for r in true_rows}
    n_pass = {r["o_orderstatus"]: int(r["n_pass"]) for r in n_pass_rows}
    sts = sorted(r["o_orderstatus"] for r in totals)
    return pa.table({
        "o_orderstatus": pa.array(sts, type=pa.string()),
        "n_orders": pa.array(
            [int(next(r["n_orders"] for r in totals
                      if r["o_orderstatus"] == s)) for s in sts],
            type=pa.int64()),
        "n_pass": pa.array([n_pass.get(s, 0) for s in sts], type=pa.int64()),
        "n_true": pa.array([n_true.get(s, 0) for s in sts], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# inter-arrival profile: the event-stream cadence report (what sampling
# window / sessionization gap / watermark is right for this corpus).


def interarrival_profile(sf_dir: str):
    """Histogram of per-user inter-event gaps in power-of-two-second
    buckets: bucket -1 = sub-second (gap floors to 0 s), bucket k =
    floor(log2(gap_seconds)).  Gaps are between consecutive events of
    ONE user ordered by ts; the gap multiset is tie-order invariant
    (equal timestamps contribute the same gaps in any order), so no
    tie-break column is needed on either side.

    Plan: pruned (user_id, ts) read -> the shared coarse user
    partitions (sessionize's layout; rows must co-locate because one
    user's stream spans batches) -> ONE lexsort + run-boundary diff
    per part -> per-part exact int64 bucket histogram -> bounded
    (<= 64-key) final groupby.  The bucket is integer-exact:
    searchsorted over 2^k == DuckDB length(format('{:b}', s)) - 1."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if b.num_rows == 0:
            return pa.table({"user_id": z, "ts_us": z, "part": z})
        u = b["user_id"].to_numpy().astype(np.int64)
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        from prlib_ray.stages.reassemble import N_REASSEMBLE_PARTS

        return pa.table({
            "user_id": pa.array(u),
            "ts_us": pa.array(ts),
            "part": pa.array(u % N_REASSEMBLE_PARTS),
        })

    def fold(g: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if g.num_rows == 0:
            return pa.table({"bucket": z, "n_gaps": z})
        u = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = g["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((t, u))
        u, t = u[o], t[o]
        same = u[1:] == u[:-1]
        if not same.any():
            return pa.table({"bucket": z, "n_gaps": z})
        gap_s = (t[1:] - t[:-1])[same] // 1_000_000
        bucket = np.searchsorted(_POW2, gap_s, side="right") - 1
        bk, cnt = np.unique(bucket, return_counts=True)
        return pa.table({"bucket": pa.array(bk.astype(np.int64)),
                         "n_gaps": pa.array(cnt.astype(np.int64))})

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n_gaps", alias_name="n_gaps"))
        .sort("bucket")
    )


# ---------------------------------------------------------------------------
# correlated-EXISTS semi-join between two FACT tables (TPC-H Q4 shape):
# count orders, by priority, having at least one lineitem shipped more
# than LATE_SHIP_DAYS after the order date.

LATE_SHIP_DAYS = 60


def _copart_two_fact_union(left_ds, right_ds, *, left_key, left_t,
                           right_key, right_t, left_extra=(),
                           right_extra=()):
    """(part, key, t, [extra...], side) union of two FACT tables
    co-partitioned by _copart_tag(key) — the ONE definition of the
    fact-fact co-location layout (orders_with_late_items /
    fulfillment_latency / q21_waiting_suppliers), so the partition
    scheme and the column shape cannot drift between consumers.
    ``left_extra`` is a list of (out_name, src_col) STRING columns
    carried on the left side only; ``right_extra`` the same for INT64
    columns on the right side (each null-filled on the other side so
    the union schemas match)."""

    def l_norm(b: pa.Table) -> pa.Table:
        key = b[left_key].to_numpy().astype(np.int64)
        cols = {"part": pa.array(_copart_tag(key)), "key": pa.array(key),
                "t": pa.array(b[left_t].cast(pa.int64()).to_numpy())}
        for name, src in left_extra:
            cols[name] = b[src]
        for name, _ in right_extra:
            cols[name] = pa.nulls(b.num_rows, pa.int64())
        cols["side"] = pa.array(np.zeros(b.num_rows, dtype=np.int8))
        return pa.table(cols)

    def r_norm(b: pa.Table) -> pa.Table:
        key = b[right_key].to_numpy().astype(np.int64)
        cols = {"part": pa.array(_copart_tag(key)), "key": pa.array(key),
                "t": pa.array(b[right_t].cast(pa.int64()).to_numpy())}
        for name, _ in left_extra:
            cols[name] = pa.nulls(b.num_rows, pa.string())
        for name, src in right_extra:
            cols[name] = b[src].cast(pa.int64())
        cols["side"] = pa.array(np.ones(b.num_rows, dtype=np.int8))
        return pa.table(cols)

    return left_ds.map_batches(
        l_norm, batch_format="pyarrow", zero_copy_batch=True
    ).union(right_ds.map_batches(
        r_norm, batch_format="pyarrow", zero_copy_batch=True
    ))


def _sorted_key_attach(ok: np.ndarray, lk: np.ndarray):
    """Exact-match attach of right-side rows onto sorted left keys:
    (osort, ok_sorted, pos, hit) — osort sorts the left arrays, pos is
    each right row's index into the SORTED left side, hit masks exact
    matches (orphans False).  The shared probe idiom of the fact-fact
    copart consumers."""
    osort = np.argsort(ok, kind="stable")
    ok_s = ok[osort]
    pos = np.searchsorted(ok_s, lk)
    pos = np.minimum(pos, len(ok_s) - 1)
    hit = ok_s[pos] == lk
    return osort, ok_s, pos, hit


def orders_with_late_items(sf_dir: str, *, days: int = LATE_SHIP_DAYS):
    """Per-priority count of orders with >= 1 late-shipped lineitem
    (l_shipdate > o_orderdate + days).  The predicate is CORRELATED —
    each lineitem's lateness depends on its own order's date — so
    unlike bloom_semi_join's dimension build side, BOTH sides are fact
    tables and neither may broadcast or reach the driver.

    Plan: both facts co-partition by hash(orderkey) % N_COPART (the
    _probe_join layout — one hash shuffle, no driver materialization);
    per part, orders sort by key once, lineitems find their order via
    searchsorted (exact-match guarded: orphan lineitems drop), the
    any-late flag folds per order with np.logical_or.at, and only
    <= n_priorities count rows per part reach the bounded final
    groupby."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    span = days * 86_400_000_000  # us; both date columns are timestamps

    ord_ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    li_ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    both = _copart_two_fact_union(
        ord_ds, li_ds,
        left_key="o_orderkey", left_t="o_orderdate",
        right_key="l_orderkey", right_t="l_shipdate",
        left_extra=(("prio", "o_orderpriority"),),
    )

    def fold(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "o_orderpriority": pa.array([], type=pa.string()),
            "n_orders": pa.array([], type=pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        side = g["side"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = g["t"].to_numpy(zero_copy_only=False).astype(np.int64)
        o_mask = side == 0
        l_mask = ~o_mask
        if not o_mask.any() or not l_mask.any():
            return empty
        lk = key[l_mask]
        lt = t[l_mask]
        osort, ok, pos, hit = _sorted_key_attach(key[o_mask], lk)
        # orphan lineitems drop
        ot = t[o_mask][osort]
        late = np.zeros(len(ok), dtype=bool)
        lm = hit & (lt > ot[pos] + span)
        np.logical_or.at(late, pos[lm], True)
        if not late.any():
            return empty
        prio = np.asarray(g["prio"].to_pylist(),
                          dtype=object)[o_mask][osort][late]
        uniq, cnt = np.unique(prio, return_counts=True)
        return pa.table({"o_orderpriority": pa.array(uniq,
                                                     type=pa.string()),
                         "n_orders": pa.array(cnt.astype(np.int64))})

    return (
        both.groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
        .sort("o_orderpriority")
    )


def fulfillment_latency(sf_dir: str):
    """Order-to-ship latency histogram: for every lineitem, the gap
    l_shipdate - o_orderdate in whole days, bucketed power-of-two
    (bucket -1 = same day, k = floor(log2(gap_days)), -2 = anomalous
    negative gap — counted, never silently dropped).  The logistics
    SLA report over two FACT tables: like orders_with_late_items the
    date is correlated per order, so neither side broadcasts — both
    co-partition by hash(orderkey) % N_COPART, per part one sort +
    searchsorted attaches each lineitem's order date (orphans drop),
    and <= 66 bucket-count rows per part reach the bounded final
    groupby.  Bucket contract shared with interarrival_profile
    (searchsorted over 2^k == SQL length(format-bin) - 1)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    day_us = 86_400_000_000

    ord_ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    li_ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    both = _copart_two_fact_union(
        ord_ds, li_ds,
        left_key="o_orderkey", left_t="o_orderdate",
        right_key="l_orderkey", right_t="l_shipdate",
    )

    def fold(g: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        empty = pa.table({"bucket": z, "n": z})
        if g.num_rows == 0:
            return empty
        side = g["side"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = g["t"].to_numpy(zero_copy_only=False).astype(np.int64)
        o_mask = side == 0
        l_mask = ~o_mask
        if not o_mask.any() or not l_mask.any():
            return empty
        lk = key[l_mask]
        lt = t[l_mask]
        osort, ok, pos, hit = _sorted_key_attach(key[o_mask], lk)
        # orphan lineitems drop
        ot = t[o_mask][osort]
        gap_us = lt[hit] - ot[pos[hit]]
        neg = gap_us < 0
        gap_days = gap_us[~neg] // day_us
        bucket = np.searchsorted(_POW2, gap_days, side="right") - 1
        bu, cnt = np.unique(bucket, return_counts=True)
        if neg.any():
            bu = np.r_[np.int64(-2), bu]
            cnt = np.r_[int(neg.sum()), cnt]
        return pa.table({"bucket": pa.array(bu.astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    return (
        both.groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n_items"))
        .sort("bucket")
    )


PATH_TOPK = 10        # paths reported (n_users DESC, path ASC)
PATH_PREFIX_LEN = 3   # entry path = the user's first N events


def user_path_topk(sf_dir: str, *, k: int = PATH_TOPK,
                   prefix: int = PATH_PREFIX_LEN):
    """Entry-path analysis: each user's FIRST ``prefix`` event types
    joined with '>' ((ts, event_id) order — deterministic under ties),
    then the k most common entry paths by user count — the
    product-analytics drilldown behind funnel_conversion (which only
    checks one fixed chain).  FULL paths measured near-unique per user
    on the fixtures (every count 1 — a vacuous ranking, the item-48
    lesson), so the contract is the bounded prefix, which is also what
    onboarding analyses actually read.

    Plan: events hash into the shared coarse user partitions
    (_add_user_part — a user never spans parts); per part ONE lexsort
    orders every user's stream, a position mask keeps the first
    ``prefix`` rows per user, and a pandas groupby join builds the
    path strings (per-user string building is inherent, like per-doc
    md5), pre-combined to (path, n) rows; paths re-partition by path
    hash (a path can occur in many user parts) where a second fold
    sums and emits its local top-k; <= k * parts rows merge on the
    driver."""
    import zlib

    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({
            "user_id": b["user_id"],
            "ts": pa.array(b["ts"].cast(pa.int64()).to_numpy()),
            "event_id": b["event_id"],
            "event_type": b["event_type"],
        })
        return _add_user_part(t)

    def paths(g: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if g.num_rows == 0:
            return pa.table({"path": pa.array([], type=pa.string()),
                             "n": z, "ppart": z})
        u = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g["ts"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(g["event_type"].to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, u))
        u_s = u[order]
        new = np.r_[True, u_s[1:] != u_s[:-1]]
        starts = np.flatnonzero(new)
        run = np.cumsum(new) - 1
        pos = np.arange(len(u_s)) - starts[run]
        keep = pos < prefix
        # per-user prefix join — inherent per-user string building
        # (like per-doc md5); kept rows stay (u, pos)-sorted
        et_k = et[order][keep]
        bounds = np.r_[np.flatnonzero(np.r_[True, run[keep][1:]
                                            != run[keep][:-1]]), len(et_k)]
        p = np.asarray(
            [">".join(et_k[s:e]) for s, e in zip(bounds[:-1], bounds[1:])],
            dtype=object,
        )
        pu, cnt = np.unique(p, return_counts=True)
        part = np.asarray(
            [zlib.crc32(s.encode()) % N_COPART for s in pu],
            dtype=np.int64,
        )
        return pa.table({"path": pa.array(pu, type=pa.string()),
                         "n": pa.array(cnt.astype(np.int64)),
                         "ppart": pa.array(part)})

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"path": pa.array([], type=pa.string()),
                             "n_users": pa.array([], type=pa.int64())})
        p = np.asarray(g["path"].to_pylist(), dtype=object)
        n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((p,))
        p_s, n_s = p[order], n[order]
        new = np.r_[True, p_s[1:] != p_s[:-1]]
        gid = np.cumsum(new) - 1
        tot = int_bincount(gid, n_s)
        pu = p_s[new]
        o2 = np.lexsort((pu, -tot))[:k]
        return pa.table({"path": pa.array(pu[o2], type=pa.string()),
                         "n_users": pa.array(tot[o2])})

    cand = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(paths, batch_format="pyarrow")
        .groupby("ppart")
        .map_groups(fold, batch_format="pyarrow")
    ).take_all()
    if not cand:
        return pa.table({"path": pa.array([], type=pa.string()),
                         "n_users": pa.array([], type=pa.int64())})
    p = np.asarray([r["path"] for r in cand], dtype=object)
    n = np.asarray([r["n_users"] for r in cand], dtype=np.int64)
    o = np.lexsort((p, -n))[:k]
    return pa.table({"path": pa.array(p[o].tolist(), type=pa.string()),
                     "n_users": pa.array(n[o])})


BASKET_F = 64   # pair universe: top-F parts by basket count
BASKET_K = 15   # pairs reported (support DESC, part_a ASC, part_b ASC)
BASKET_MIN_SUPPORT = 2


def _distinct_rows2(a: np.ndarray, b: np.ndarray):
    """Distinct (a, b) int64 pairs via ONE lexsort + boundary mask —
    measured several times faster than np.unique(axis=0)'s void-record
    sort on fact-table batches; no overflow-prone key packing."""
    if len(a) == 0:  # np.r_[True, empty] mask pitfall
        return a, b
    order = np.lexsort((b, a))
    a_s, b_s = a[order], b[order]
    keep = np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])]
    return a_s[keep], b_s[keep]


def basket_part_pairs(sf_dir: str, *, k: int = BASKET_K):
    """Market-basket mining over lineitem: the k most-co-purchased part
    pairs (support = baskets/orders containing BOTH) among the top
    BASKET_F parts by basket count — the Apriori first two levels, the
    classic association-rules workload.

    Unlike pmi_top_pairs' documents, a basket spans MANY rows that can
    land in different batches, so presence must co-locate first:
    the distinct (order, part) dataset MATERIALIZES ONCE (the
    cms/tokenizer one-scan discipline — lineitem is the largest table,
    never read it twice) and feeds both pass 1 — the per part-hash
    fold into exact basket counts (a part lives in one partition) with
    a bounded top-F merge — and pass 2, which re-partitions the in-F
    rows by ORDER hash, builds each partition's basket×F presence
    matrix, and one B.T @ B matmul yields all pair supports —
    <= F(F+1)/2 rows per partition into a bounded groupby; the <= F^2
    final rows rank on the driver."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def distinct_pairs(b: pa.Table) -> pa.Table:
        ok, pk = _distinct_rows2(
            b["l_orderkey"].to_numpy().astype(np.int64),
            b["l_partkey"].to_numpy().astype(np.int64),
        )
        return pa.table({"ok": pa.array(ok), "pk": pa.array(pk),
                         "part": pa.array((pk % N_COPART).astype(np.int64))})

    dp = ds.map_batches(distinct_pairs, batch_format="pyarrow",
                        zero_copy_batch=True).materialize()

    def df_fold(g: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if g.num_rows == 0:
            return pa.table({"pk": z, "n": z})
        _, pk_d = _distinct_rows2(
            g["ok"].to_numpy(zero_copy_only=False).astype(np.int64),
            g["pk"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
        pku, cnt = np.unique(pk_d, return_counts=True)
        o = np.lexsort((pku, -cnt))[:BASKET_F]
        return pa.table({"pk": pa.array(pku[o]),
                         "n": pa.array(cnt[o].astype(np.int64))})

    cand = (
        dp.groupby("part")
        .map_groups(df_fold, batch_format="pyarrow")
    ).take_all()
    pks = np.asarray([r["pk"] for r in cand], dtype=np.int64)
    ns = np.asarray([r["n"] for r in cand], dtype=np.int64)
    o = np.lexsort((pks, -ns))[:BASKET_F]
    top = np.sort(pks[o])

    def in_f(b: pa.Table) -> pa.Table:
        ok = b["ok"].to_numpy().astype(np.int64)
        pk = b["pk"].to_numpy().astype(np.int64)
        pos = np.searchsorted(top, pk)
        pos = np.minimum(pos, len(top) - 1)
        m = top[pos] == pk
        return pa.table({"ok": pa.array(ok[m]),
                         "rank": pa.array(pos[m].astype(np.int64)),
                         "part": pa.array((ok[m] % N_COPART).astype(np.int64))})

    def pair_fold(g: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if g.num_rows == 0:
            return pa.table({"i": z, "j": z, "n": z})
        ok_d, rk_d = _distinct_rows2(
            g["ok"].to_numpy(zero_copy_only=False).astype(np.int64),
            g["rank"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
        oku, inv = np.unique(ok_d, return_inverse=True)
        B = np.zeros((len(oku), len(top)), dtype=np.int64)
        B[inv, rk_d] = 1
        C = B.T @ B
        iu, ju = np.triu_indices(len(top), k=1)
        nz = C[iu, ju] > 0
        return pa.table({"i": pa.array(iu[nz].astype(np.int64)),
                         "j": pa.array(ju[nz].astype(np.int64)),
                         "n": pa.array(C[iu, ju][nz])})

    folded = (
        dp.map_batches(in_f, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(pair_fold, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("n", alias_name="n"))
    ).take_all()
    out = [(int(top[r["i"]]), int(top[r["j"]]), int(r["n"]))
           for r in folded if int(r["n"]) >= BASKET_MIN_SUPPORT]
    out.sort(key=lambda t: (-t[2], t[0], t[1]))
    out = out[:k]
    return pa.table({
        "part_a": pa.array([t[0] for t in out], type=pa.int64()),
        "part_b": pa.array([t[1] for t in out], type=pa.int64()),
        "support": pa.array([t[2] for t in out], type=pa.int64()),
    })


def customer_running_total(sf_dir: str):
    """Cumulative-sum window transform: per order, the customer's
    running order-total cents and 1-based order sequence number, in
    (o_orderdate, o_orderkey) order — SUM/ROW_NUMBER OVER (PARTITION BY
    custkey ORDER BY ...), the lifetime-value feature every churn model
    reads.  The one window-function shape the registry lacked: a
    cumulative ORDER-BY frame (rolling_event_window is a trailing RANGE
    frame, pack_sequences a global unpartitioned prefix sum).

    Customers hash into N_COPART coarse partitions (a customer never
    spans parts); per part ONE lexsort + a run-boundary-adjusted
    cumsum resolves every customer's running series — no per-customer
    group, no per-row loop.  Output is one row per order (a transform,
    not an aggregate), so nothing ever funnels to the driver."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def prep(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].to_numpy().astype(np.int64)
        return pa.table({
            "part": pa.array(_copart_tag(ck)),
            "ck": pa.array(ck),
            "ok": pa.array(b["o_orderkey"].to_numpy().astype(np.int64)),
            "d": pa.array(b["o_orderdate"].cast(pa.int64()).to_numpy()),
            "cents": pa.array(_cents(b["o_totalprice"].to_numpy())),
        })

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"o_orderkey": z, "o_custkey": z,
                             "running_cents": z, "order_seq": z})
        ck = g["ck"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = g["ok"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = g["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = g["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ok, d, ck))
        ck_s, ok_s, c_s = ck[order], ok[order], c[order]
        new = np.r_[True, ck_s[1:] != ck_s[:-1]]
        starts = np.flatnonzero(new)
        run = np.cumsum(new) - 1
        cum = np.cumsum(c_s)
        base = np.r_[np.int64(0), cum[starts[1:] - 1]][run]
        seq = np.arange(len(ck_s), dtype=np.int64) - starts[run] + 1
        return pa.table({
            "o_orderkey": pa.array(ok_s),
            "o_custkey": pa.array(ck_s),
            "running_cents": pa.array(cum - base),
            "order_seq": pa.array(seq),
        })

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
    )


Q14_LO, Q14_HI = "1995-09-01", "1995-10-01"


def q14_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape: the promotion-revenue share of one ship-date
    month — promo_permille = 1000 * promo_cents // total_cents, both
    sums exact int64 under the shared per-row disc-price cents contract
    (floor(price*(1-disc)*100+0.5), the Q1/Q3 IEEE expression tree).

    part is nominally a dimension, but the join runs on the fact-fact
    co-partition layout anyway (both sides hash by partkey through the
    shared _copart_tag, per part one _sorted_key_attach) — the plan
    that still holds when the part catalog is itself huge; the date
    filter pushes into the parquet scan so only the window's row
    groups leave storage."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    lo = np.datetime64(Q14_LO, "us")
    hi = np.datetime64(Q14_HI, "us")
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=((pc.field("l_shipdate") >= pa.scalar(lo))
                & (pc.field("l_shipdate") < pa.scalar(hi))),
    )
    part_ds = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )

    def part_norm(b: pa.Table) -> pa.Table:
        key = b["p_partkey"].to_numpy().astype(np.int64)
        promo = pc.equal(b["p_type"], "PROMO").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({"part": pa.array(_copart_tag(key)),
                         "key": pa.array(key),
                         "v": pa.array(promo),
                         "side": pa.array(np.zeros(b.num_rows,
                                                   dtype=np.int8))})

    def li_norm(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].cast(pa.int64()).to_numpy()
        m = (ship >= lo.astype(np.int64)) & (ship < hi.astype(np.int64))
        key = b["l_partkey"].to_numpy().astype(np.int64)[m]
        price = b["l_extendedprice"].to_numpy()[m]
        disc = b["l_discount"].to_numpy()[m]
        return pa.table({"part": pa.array(_copart_tag(key)),
                         "key": pa.array(key),
                         "v": pa.array(_cents(price * (1.0 - disc))),
                         "side": pa.array(np.ones(len(key),
                                                  dtype=np.int8))})

    both = part_ds.map_batches(
        part_norm, batch_format="pyarrow", zero_copy_batch=True
    ).union(li.map_batches(
        li_norm, batch_format="pyarrow", zero_copy_batch=True
    ))

    def fold(g: pa.Table) -> pa.Table:
        zero = pa.table({
            "promo_cents": pa.array([0], type=pa.int64()),
            "total_cents": pa.array([0], type=pa.int64()),
        })
        if g.num_rows == 0:
            return zero
        side = g["side"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = g["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        p_mask = side == 0
        l_mask = ~p_mask
        if not p_mask.any() or not l_mask.any():
            return zero
        lk = key[l_mask]
        rev = v[l_mask]
        osort, pk, pos, hit = _sorted_key_attach(key[p_mask], lk)
        # lineitems with an unknown part drop (inner-join parity)
        promo = v[p_mask][osort]
        total = int(rev[hit].sum())
        pro = int((rev[hit] * promo[pos[hit]]).sum())
        return pa.table({
            "promo_cents": pa.array([pro], type=pa.int64()),
            "total_cents": pa.array([total], type=pa.int64()),
        })

    agg = (
        both.groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .aggregate(Sum("promo_cents", alias_name="p"),
                   Sum("total_cents", alias_name="t"))
    )
    pro, tot = int(agg["p"] or 0), int(agg["t"] or 0)
    return pa.table({
        "promo_cents": pa.array([pro], type=pa.int64()),
        "total_cents": pa.array([tot], type=pa.int64()),
        "promo_permille": pa.array(
            [0 if tot == 0 else (1000 * pro) // tot], type=pa.int64()
        ),
    })


def brand_supplier_counts(sf_dir: str):
    """TPC-H Q16 shape: per (p_brand, p_size), the number of DISTINCT
    suppliers that shipped such parts — grouped COUNT(DISTINCT) across
    a fact-dimension join, the shape whose naive global distinct is an
    all-to-all shuffle.

    Plan: lineitem and part co-partition by partkey (the shared
    _sorted_key_attach probe attaches brand/size to each lineitem;
    orphans drop); each partition emits its DISTINCT (brand, size,
    supplier) triples pre-combined, which re-partition by SUPPLIER
    hash — a triple lives in exactly one supplier partition, so a
    per-part drop_duplicates is globally exact and only (brand, size,
    1-per-distinct-supplier) count partials reach the crc32(brand)
    coarse final fold (<= brands x sizes rows per part, one lexsort +
    bincount pass — NOT a per-key groupby().aggregate())."""
    import ray.data as rd

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )
    part_ds = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )

    def part_norm(b: pa.Table) -> pa.Table:
        key = b["p_partkey"].to_numpy().astype(np.int64)
        return pa.table({
            "part": pa.array(_copart_tag(key)), "key": pa.array(key),
            "brand": b["p_brand"],
            "size": pa.array(b["p_size"].to_numpy().astype(np.int64)),
            "supp": pa.array(np.full(b.num_rows, -1, dtype=np.int64)),
            "side": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
        })

    def li_norm(b: pa.Table) -> pa.Table:
        key = b["l_partkey"].to_numpy().astype(np.int64)
        return pa.table({
            "part": pa.array(_copart_tag(key)), "key": pa.array(key),
            "brand": pa.nulls(b.num_rows, pa.string()),
            "size": pa.array(np.full(b.num_rows, -1, dtype=np.int64)),
            "supp": pa.array(b["l_suppkey"].to_numpy().astype(np.int64)),
            "side": pa.array(np.ones(b.num_rows, dtype=np.int8)),
        })

    both = part_ds.map_batches(
        part_norm, batch_format="pyarrow", zero_copy_batch=True
    ).union(li.map_batches(
        li_norm, batch_format="pyarrow", zero_copy_batch=True
    ))

    def attach(g: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        empty = pa.table({
            "brand": pa.array([], type=pa.string()),
            "size": z, "supp": z, "spart": z,
        })
        if g.num_rows == 0:
            return empty
        side = g["side"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        p_mask = side == 0
        l_mask = ~p_mask
        if not p_mask.any() or not l_mask.any():
            return empty
        lk = key[l_mask]
        osort, pk, pos, hit = _sorted_key_attach(key[p_mask], lk)
        # lineitems with an unknown part drop
        brand = np.asarray(g["brand"].to_pylist(), dtype=object)[p_mask][osort]
        size = g["size"].to_numpy(
            zero_copy_only=False).astype(np.int64)[p_mask][osort]
        supp = g["supp"].to_numpy(
            zero_copy_only=False).astype(np.int64)[l_mask]
        b_h, s_h, u_h = brand[pos[hit]], size[pos[hit]], supp[hit]
        # distinct (brand, size, supp): brand determined by the part key,
        # so (size, supp) + brand codes dedup in one lexsort pass
        _, bc = np.unique(b_h, return_inverse=True)
        o = np.lexsort((u_h, s_h, bc))
        bc_s, s_s, u_s = bc[o], s_h[o], u_h[o]
        keep = np.r_[True, (bc_s[1:] != bc_s[:-1]) | (s_s[1:] != s_s[:-1])
                     | (u_s[1:] != u_s[:-1])]
        sel = o[keep]
        return pa.table({
            "brand": pa.array(b_h[sel], type=pa.string()),
            "size": pa.array(s_h[sel]),
            "supp": pa.array(u_h[sel]),
            "spart": pa.array((u_h[sel] % N_COPART).astype(np.int64)),
        })

    def count_fold(g: pa.Table) -> pa.Table:
        import zlib

        z = pa.array([], type=pa.int64())
        if g.num_rows == 0:
            return pa.table({"brand": pa.array([], type=pa.string()),
                             "size": z, "n": z, "bpart": z})
        brand = np.asarray(g["brand"].to_pylist(), dtype=object)
        size = g["size"].to_numpy(zero_copy_only=False).astype(np.int64)
        supp = g["supp"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, bc = np.unique(brand, return_inverse=True)
        o = np.lexsort((supp, size, bc))
        bc_s, s_s, u_s = bc[o], size[o], supp[o]
        keep = np.r_[True, (bc_s[1:] != bc_s[:-1]) | (s_s[1:] != s_s[:-1])
                     | (u_s[1:] != u_s[:-1])]
        # distinct triples, then per-(brand, size) counts in the same
        # sorted order
        bg, sg = bc_s[keep], s_s[keep]
        new = np.r_[True, (bg[1:] != bg[:-1]) | (sg[1:] != sg[:-1])]
        starts = np.flatnonzero(new)
        n = np.diff(np.r_[starts, len(bg)]).astype(np.int64)
        sel = o[keep][starts]
        bsel = brand[sel]
        # coarse final partition by brand (a (brand, size) group lives in
        # exactly one bpart) — Ray's groupby().aggregate() pays per-KEY
        # scheduling on the ~brands*sizes grouped keys (measured 12.6 s
        # of this query's 20 s at sf0.1); one vectorized fold per coarse
        # part is the repo-standard fix (user_path_topk, corpus_stats)
        bpart = np.asarray(
            [zlib.crc32(s.encode()) % N_COPART for s in bsel],
            dtype=np.int64,
        )
        return pa.table({"brand": pa.array(bsel, type=pa.string()),
                         "size": pa.array(size[sel]),
                         "n": pa.array(n),
                         "bpart": pa.array(bpart)})

    def final_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"brand": pa.array([], type=pa.string()),
                             "size": z, "n_suppliers": z})
        brand = np.asarray(g["brand"].to_pylist(), dtype=object)
        size = g["size"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((size, brand))
        b_s, s_s, n_s = brand[order], size[order], n[order]
        new = np.r_[True, (b_s[1:] != b_s[:-1]) | (s_s[1:] != s_s[:-1])]
        gid = np.cumsum(new) - 1
        tot = int_bincount(gid, n_s)
        return pa.table({"brand": pa.array(b_s[new], type=pa.string()),
                         "size": pa.array(s_s[new]),
                         "n_suppliers": pa.array(tot)})

    return (
        both.groupby("part")
        .map_groups(attach, batch_format="pyarrow")
        .groupby("spart")
        .map_groups(count_fold, batch_format="pyarrow")
        .groupby("bpart")
        .map_groups(final_fold, batch_format="pyarrow")
        .sort(["brand", "size"])
    )


def user_stickiness(sf_dir: str):
    """DAU/WAU stickiness per week: for every epoch week (day // 7,
    day = epoch_us // 86400e6 — the events_hourly bucket convention),
    the distinct weekly actives, the sum of daily actives, and
    stickiness_permille = 1000 * dau_sum // (7 * wau) — the engagement
    ratio every growth dashboard tracks.

    Plan: per-batch DISTINCT (user, day) pre-combine -> shared coarse
    user partitions (a user lives in one part, so per-part distincts
    are globally exact); each part emits bounded (day, n) and (week, n)
    partials; the day/week key space is calendar-bounded, so the final
    fold is a tiny driver merge (no per-key Ray group for ~10^3
    keys)."""
    import ray.data as rd

    day_us = 86_400_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def prep(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy().astype(np.int64)
        d = b["ts"].cast(pa.int64()).to_numpy() // day_us
        ud, dd = _distinct_rows2(u, d)
        t = pa.table({"user_id": pa.array(ud), "day": pa.array(dd)})
        return _add_user_part(t)

    def fold(g: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        if g.num_rows == 0:
            return pa.table({"kind": z, "key": z, "n": z})
        ud, dd = _distinct_rows2(
            g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            g["day"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
        days, dn = np.unique(dd, return_counts=True)
        uw, ww = _distinct_rows2(ud, dd // 7)
        weeks, wn = np.unique(ww, return_counts=True)
        return pa.table({
            "kind": pa.array(np.r_[np.zeros(len(days), dtype=np.int64),
                                   np.ones(len(weeks), dtype=np.int64)]),
            "key": pa.array(np.r_[days, weeks]),
            "n": pa.array(np.r_[dn, wn].astype(np.int64)),
        })

    rows = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
    ).take_all()
    dau: dict[int, int] = {}
    wau: dict[int, int] = {}
    for r in rows:
        tgt = dau if r["kind"] == 0 else wau
        k = int(r["key"])
        tgt[k] = tgt.get(k, 0) + int(r["n"])
    dau_sum: dict[int, int] = {}
    for d, n in dau.items():
        w = d // 7
        dau_sum[w] = dau_sum.get(w, 0) + n
    weeks = sorted(wau)
    return pa.table({
        "week": pa.array(weeks, type=pa.int64()),
        "wau": pa.array([wau[w] for w in weeks], type=pa.int64()),
        "dau_sum": pa.array([dau_sum[w] for w in weeks], type=pa.int64()),
        "stickiness_permille": pa.array(
            [(1000 * dau_sum[w]) // (7 * wau[w]) for w in weeks],
            type=pa.int64(),
        ),
    })


# ---------------------------------------------------------------------------
# TPC-H Q13 / Q18 / Q10 / Q7 shapes (twelfth session)

CUSTDIST_EXCLUDE_STATUS = "F"  # the Q13 comment-filter analogue


def q13_custdist(sf_dir: str):
    """TPC-H Q13 shape: the distribution of customers by order count —
    counting only non-'F' orders (the Q13 comment-exclusion analogue) —
    INCLUDING the zero-order bucket from the LEFT side of the customer
    join.

    Plan: the orders scan is pruned to (custkey, status) with the
    status filter applied in-batch; per-batch (custkey, n) pre-combine;
    custkey-hash coarse partitions fold each customer's total order
    count AND the part-local histogram in one lexsort pass (a custkey
    never lives in two parts, so per-part histograms sum exactly);
    only <= N_COPART * max_count histogram rows reach the bounded
    final groupby.  The zero bucket is customer-side arithmetic —
    (metadata-only customer row count) - (distinct custkeys holding
    orders) — assembled on the bounded result, so NEITHER fact table
    ever reaches the driver."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ord_ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderstatus"],
        filter=(pc.field("o_orderstatus")
                != pa.scalar(CUSTDIST_EXCLUDE_STATUS)),
    )
    n_customers_total = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).count()  # metadata-only

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.invert(pc.equal(b["o_orderstatus"],
                               pa.scalar(CUSTDIST_EXCLUDE_STATUS)))
        )
        k = b["o_custkey"].to_numpy().astype(np.int64)
        ku, inv = np.unique(k, return_inverse=True)
        n = np.bincount(inv, minlength=len(ku)).astype(np.int64)
        return pa.table({
            "custkey": pa.array(ku), "n": pa.array(n),
            "part": pa.array(_copart_tag(ku)),
        })

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"n_orders": z, "n_customers": z})
        k = g["custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(k, kind="stable")
        k_s, n_s = k[order], n[order]
        new = np.r_[True, k_s[1:] != k_s[:-1]]
        run = np.cumsum(new) - 1
        tot = int_bincount(run, n_s)
        v, c = np.unique(tot, return_counts=True)
        return pa.table({"n_orders": pa.array(v.astype(np.int64)),
                         "n_customers": pa.array(c.astype(np.int64))})

    hist = (
        ord_ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .groupby("n_orders")
        .aggregate(Sum("n_customers", alias_name="n_customers"))
        .take_all()  # bounded: one row per distinct per-customer count
    )
    counts = {int(r["n_orders"]): int(r["n_customers"]) for r in hist}
    n_zero = n_customers_total - sum(counts.values())
    if n_zero > 0:
        counts[0] = n_zero
    keys = sorted(counts)
    return pa.table({
        "n_orders": pa.array(keys, type=pa.int64()),
        "n_customers": pa.array([counts[k] for k in keys],
                                type=pa.int64()),
    })


Q18_MIN_QTY_CENTS = 270 * 100  # sum(l_quantity) > 270 (p99 of order sums)
Q18_TOPK = 100


def q18_large_orders(sf_dir: str, *, min_qty_cents: int = Q18_MIN_QTY_CENTS,
                     k: int = Q18_TOPK):
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds a
    threshold, with their order columns attached — top-k by
    (o_totalprice DESC, o_orderkey ASC).

    Both sides are FACT tables keyed by orderkey, so they co-partition
    by hash(orderkey) % N_COPART (the _copart_tag discipline); per part
    one sort + searchsorted groups every lineitem under its order
    (orphan lineitems drop, orders with no lineitems sum to zero and
    fail the threshold — inner-join parity), the quantity fold is one
    exact int64 np.add.at, and the survivor rows carry their order
    columns OUT OF the same part (both sides are already co-located, so
    no second join exists).  Per-part local top-k bounds the driver
    merge at N_COPART * k rows."""
    import ray.data as rd

    ord_ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_totalprice"],
    )
    li_ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )

    def o_norm(b: pa.Table) -> pa.Table:
        key = b["o_orderkey"].to_numpy().astype(np.int64)
        return pa.table({
            "part": pa.array(_copart_tag(key)), "key": pa.array(key),
            "a": pa.array(_cents(b["o_totalprice"].to_numpy())),
            "b": pa.array(b["o_orderdate"].cast(pa.int64()).to_numpy()),
            "side": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
        })

    def l_norm(b: pa.Table) -> pa.Table:
        key = b["l_orderkey"].to_numpy().astype(np.int64)
        return pa.table({
            "part": pa.array(_copart_tag(key)), "key": pa.array(key),
            "a": pa.array(_cents(b["l_quantity"].to_numpy())),
            "b": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
            "side": pa.array(np.ones(b.num_rows, dtype=np.int8)),
        })

    both = ord_ds.map_batches(
        o_norm, batch_format="pyarrow", zero_copy_batch=True
    ).union(li_ds.map_batches(
        l_norm, batch_format="pyarrow", zero_copy_batch=True
    ))

    _z = pa.array([], type=pa.int64())
    empty = pa.table({
        "o_orderkey": _z,
        "o_orderdate_us": _z,
        "o_totalprice_cents": _z,
        "sum_qty_cents": _z,
    })

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        side = g["side"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = g["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        o_mask = side == 0
        l_mask = ~o_mask
        if not o_mask.any() or not l_mask.any():
            return empty
        lk = key[l_mask]
        osort, ok, pos, hit = _sorted_key_attach(key[o_mask], lk)
        # orphan lineitems drop
        qty = np.zeros(len(ok), dtype=np.int64)
        np.add.at(qty, pos[hit], a[l_mask][hit])
        big = qty > min_qty_cents
        if not big.any():
            return empty
        price = a[o_mask][osort][big]
        date = g["b"].to_numpy(
            zero_copy_only=False).astype(np.int64)[o_mask][osort][big]
        keys = ok[big]
        top = np.lexsort((keys, -price))[:k]
        return pa.table({
            "o_orderkey": pa.array(keys[top]),
            "o_orderdate_us": pa.array(date[top]),
            "o_totalprice_cents": pa.array(price[top]),
            "sum_qty_cents": pa.array(qty[big][top]),
        })

    survivors = (
        both.groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .take_all()  # <= N_COPART * k per-part winners
    )
    keys = np.array([r["o_orderkey"] for r in survivors], dtype=np.int64)
    price = np.array([r["o_totalprice_cents"] for r in survivors],
                     dtype=np.int64)
    date = np.array([r["o_orderdate_us"] for r in survivors],
                    dtype=np.int64)
    qty = np.array([r["sum_qty_cents"] for r in survivors], dtype=np.int64)
    top = np.lexsort((keys, -price))[:k]
    return pa.table({
        "o_orderkey": pa.array(keys[top], type=pa.int64()),
        "o_orderdate": pa.array(date[top], type=pa.int64()).cast(
            pa.timestamp("us")
        ),
        "o_totalprice_cents": pa.array(price[top], type=pa.int64()),
        "sum_qty_cents": pa.array(qty[top], type=pa.int64()),
    })


Q10_START = "1996-01-01"   # one-quarter order window, non-vacuous at
Q10_END = "1996-04-01"     # every sf (40 qualifying customers at sf0.001)
Q10_TOPK = 20


def q10_returned_revenue(sf_dir: str, *, k: int = Q10_TOPK):
    """TPC-H Q10 shape: the top-k customers by revenue lost to returned
    items (l_returnflag = 'R') on orders placed in one quarter, with the
    customer dimension (name, account balance, nation) attached to the
    winners.

    Plan: orders (pruned to key/custkey, date filter pushed down AND
    re-applied in-batch) and 'R' lineitems (revenue pre-folded to exact
    cents per row) co-partition by hash(orderkey) % N_COPART; per part
    one sort + searchsorted attaches each lineitem's custkey (orphans —
    orders outside the window — drop), and an exact int64 np.add.at
    folds revenue per custkey.  Customer keys span order-hash parts, so
    the (custkey, rev) partials re-fold through custkey-hash coarse
    partitions with a per-part local top-k; the driver merges
    <= N_COPART * k rows and attaches the customer/nation dimensions to
    exactly k winners via a key-filtered pruned scan (never the fact
    path)."""
    import ray.data as rd

    start = np.datetime64(Q10_START, "us")
    end = np.datetime64(Q10_END, "us")

    ord_ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(
            (pc.field("o_orderdate") >= pa.scalar(start))
            & (pc.field("o_orderdate") < pa.scalar(end))
        ),
    )
    li_ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_returnflag"],
        filter=(pc.field("l_returnflag") == pa.scalar("R")),
    )

    def o_norm(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.greater_equal(b["o_orderdate"], pa.scalar(start)),
                    pc.less(b["o_orderdate"], pa.scalar(end)))
        )
        key = b["o_orderkey"].to_numpy().astype(np.int64)
        return pa.table({
            "part": pa.array(_copart_tag(key)), "key": pa.array(key),
            "a": pa.array(b["o_custkey"].to_numpy().astype(np.int64)),
            "side": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
        })

    def l_norm(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["l_returnflag"], pa.scalar("R")))
        key = b["l_orderkey"].to_numpy().astype(np.int64)
        rev = _cents(
            b["l_extendedprice"].to_numpy()
            * (1.0 - b["l_discount"].to_numpy())
        )
        return pa.table({
            "part": pa.array(_copart_tag(key)), "key": pa.array(key),
            "a": pa.array(rev),
            "side": pa.array(np.ones(b.num_rows, dtype=np.int8)),
        })

    both = ord_ds.map_batches(
        o_norm, batch_format="pyarrow", zero_copy_batch=True
    ).union(li_ds.map_batches(
        l_norm, batch_format="pyarrow", zero_copy_batch=True
    ))

    def fold(g: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        empty = pa.table({"custkey": z, "rev": z, "cpart": z})
        if g.num_rows == 0:
            return empty
        side = g["side"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = g["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        o_mask = side == 0
        l_mask = ~o_mask
        if not o_mask.any() or not l_mask.any():
            return empty
        lk = key[l_mask]
        osort, ok, pos, hit = _sorted_key_attach(key[o_mask], lk)
        # lineitems of out-of-window orders drop
        if not hit.any():
            return empty
        ck = a[o_mask][osort][pos[hit]]
        rev = a[l_mask][hit]
        ku, inv = np.unique(ck, return_inverse=True)
        r = np.zeros(len(ku), dtype=np.int64)
        np.add.at(r, inv, rev)
        return pa.table({"custkey": pa.array(ku), "rev": pa.array(r),
                         "cpart": pa.array(_copart_tag(ku))})

    def fold_topk(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"custkey": z, "rev": z})
        ckey = g["custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = g["rev"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ckey, kind="stable")
        k_s, r_s = ckey[order], rev[order]
        new = np.r_[True, k_s[1:] != k_s[:-1]]
        run = np.cumsum(new) - 1
        tot = np.zeros(int(run[-1]) + 1, dtype=np.int64)
        np.add.at(tot, run, r_s)
        keys_u = k_s[new]
        top = np.lexsort((keys_u, -tot))[:k]
        return pa.table({"custkey": pa.array(keys_u[top]),
                         "rev": pa.array(tot[top])})

    survivors = (
        both.groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .groupby("cpart")
        .map_groups(fold_topk, batch_format="pyarrow")
        .take_all()  # <= N_COPART * k per-part winners
    )
    ckeys = np.array([r["custkey"] for r in survivors], dtype=np.int64)
    revs = np.array([r["rev"] for r in survivors], dtype=np.int64)

    # dimension attach is an INNER join in the oracle: a custkey with
    # no customer row must drop BEFORE the top-k cut (the next customer
    # fills the slot) — candidates are bounded (<= N_COPART * k), so
    # one key-filtered pruned scan covers them all
    cust = _collect_columns(
        rd.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
            filter=(pc.field("c_custkey").isin(
                pa.array(np.sort(ckeys), type=pa.int64()))),
        ),
        ["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    )
    nat = _collect_columns(
        rd.read_parquet(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]),
        ["n_nationkey", "n_name"],
    )
    csort = np.argsort(cust["c_custkey"].astype(np.int64))
    ckeys_s = cust["c_custkey"].astype(np.int64)[csort]
    idx = np.searchsorted(ckeys_s, ckeys)
    known = (idx < len(ckeys_s)) & (
        ckeys_s[np.minimum(idx, max(len(ckeys_s) - 1, 0))] == ckeys
    ) if len(ckeys_s) else np.zeros(len(ckeys), dtype=bool)
    ckeys, revs = ckeys[known], revs[known]
    top = np.lexsort((ckeys, -revs))[:k]
    win_keys, win_rev = ckeys[top], revs[top]
    cpos = csort[np.searchsorted(ckeys_s, win_keys)]
    nkey = cust["c_nationkey"].astype(np.int64)[cpos]
    nsort = np.argsort(nat["n_nationkey"].astype(np.int64))
    npos = nsort[np.searchsorted(
        nat["n_nationkey"].astype(np.int64)[nsort], nkey)]
    return pa.table({
        "c_custkey": pa.array(win_keys, type=pa.int64()),
        "c_name": pa.array(cust["c_name"][cpos].astype(object).tolist(),
                           type=pa.string()),
        "revenue_cents": pa.array(win_rev, type=pa.int64()),
        "c_acctbal_cents": pa.array(
            _cents(cust["c_acctbal"][cpos].astype(np.float64)),
            type=pa.int64(),
        ),
        "n_name": pa.array(nat["n_name"][npos].astype(object).tolist(),
                           type=pa.string()),
    })


TRADE_START = "1995-01-01"  # Q7's two shipping years
TRADE_END = "1997-01-01"


def trade_volume(sf_dir: str, *, via: str = "auto"):
    """TPC-H Q7 shape: revenue by (supplier nation, customer nation,
    ship year) over two shipping years — the cross-nation trade-volume
    matrix.

    Plan: the lineitem->orders custkey attach is always the fact-fact
    copart layout (hash(orderkey) % N_COPART, one shuffle).  The
    supplier/customer dimension attach is SIZE-GATED like the as-of
    join: via="broadcast" ships the sorted (key, nationkey) arrays
    once via ray.put and probes by searchsorted inside the stage-1
    fold — right while both dimensions fit a worker heap;
    via="partitioned" runs two further co-partition stages (rows
    re-tag by hash(suppkey), then hash(custkey), each joined against
    the correspondingly-partitioned dimension scan) — the layout for a
    10^9-customer design point where no dimension broadcasts.
    via="auto" (default) picks by the summed dimension row counts
    (parquet metadata — no scan) vs FACT_BROADCAST_MAX_ROWS.  Both
    paths produce identical integers (pytest asserts equality).  Each
    final part emits <= 25 * 25 * n_years composite-code partials;
    nation-name attach happens once on the bounded final table."""
    import ray
    import ray.data as rd

    start = np.datetime64(TRADE_START, "us")
    end = np.datetime64(TRADE_END, "us")

    supp_ds = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                              columns=["s_suppkey", "s_nationkey"])
    cust_ds = rd.read_parquet(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_nationkey"])
    if via == "auto":
        via = ("broadcast"
               if supp_ds.count() + cust_ds.count()
               <= FACT_BROADCAST_MAX_ROWS else "partitioned")

    if via == "broadcast":
        supp = _collect_columns(supp_ds, ["s_suppkey", "s_nationkey"])
        ssort = np.argsort(supp["s_suppkey"].astype(np.int64))
        supp_ref = ray.put((supp["s_suppkey"].astype(np.int64)[ssort],
                            supp["s_nationkey"].astype(np.int64)[ssort]))
        cust = _collect_columns(cust_ds, ["c_custkey", "c_nationkey"])
        csort = np.argsort(cust["c_custkey"].astype(np.int64))
        cust_ref = ray.put((cust["c_custkey"].astype(np.int64)[csort],
                            cust["c_nationkey"].astype(np.int64)[csort]))

    ord_ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    li_ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"],
        filter=(
            (pc.field("l_shipdate") >= pa.scalar(start))
            & (pc.field("l_shipdate") < pa.scalar(end))
        ),
    )

    def o_norm(b: pa.Table) -> pa.Table:
        key = b["o_orderkey"].to_numpy().astype(np.int64)
        z = np.zeros(b.num_rows, dtype=np.int64)
        return pa.table({
            "part": pa.array(_copart_tag(key)), "key": pa.array(key),
            "a": pa.array(b["o_custkey"].to_numpy().astype(np.int64)),
            "b": pa.array(z), "c": pa.array(z),
            "side": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
        })

    def l_norm(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.greater_equal(b["l_shipdate"], pa.scalar(start)),
                    pc.less(b["l_shipdate"], pa.scalar(end)))
        )
        key = b["l_orderkey"].to_numpy().astype(np.int64)
        rev = _cents(
            b["l_extendedprice"].to_numpy()
            * (1.0 - b["l_discount"].to_numpy())
        )
        year = b["l_shipdate"].to_numpy().astype("datetime64[Y]")
        year = year.astype(np.int64) + 1970
        return pa.table({
            "part": pa.array(_copart_tag(key)), "key": pa.array(key),
            "a": pa.array(b["l_suppkey"].to_numpy().astype(np.int64)),
            "b": pa.array(rev), "c": pa.array(year),
            "side": pa.array(np.ones(b.num_rows, dtype=np.int8)),
        })

    both = ord_ds.map_batches(
        o_norm, batch_format="pyarrow", zero_copy_batch=True
    ).union(li_ds.map_batches(
        l_norm, batch_format="pyarrow", zero_copy_batch=True
    ))

    def _code_fold(sn, cn, year, rev) -> pa.Table:
        # composite (snat, cnat, year) code: nationkeys < 2^10,
        # years < 2^12 — bounded key space, one bincount-free fold.
        # fpart coarse-partitions the final fold (a code lives in
        # exactly one fpart) — groupby("code").aggregate() would pay
        # per-KEY scheduling on ~nations^2*years pandas-block keys (the
        # brand_supplier_counts lesson: 12.6 s of a 20 s query), where
        # one vectorized pass per coarse part is ~free.  Partition on
        # the cust-nation bits (code >> 12), NOT code % 8: the low 12
        # bits are the year, and a 2-year window would land everything
        # in 2 of the 8 parts
        code = ((sn << np.int64(22)) | (cn << np.int64(12))) | year
        cu, r = _sum_by_key(code, rev)
        return pa.table({"code": pa.array(cu), "rev": pa.array(r),
                         "fpart": pa.array((cu >> np.int64(12))
                                           % np.int64(8))})

    _zi = pa.array([], type=pa.int64())
    _code_empty = pa.table({"code": _zi, "rev": _zi, "fpart": _zi})

    def _split_attach(g: pa.Table):
        """Split a co-partition into (left, fact) and attach the left
        side's `a` column onto fact rows via the shared sorted probe;
        returns (attached, fact_a, fact_b, fact_c) hit-filtered, or
        None when either side is empty or nothing matches."""
        if g.num_rows == 0:
            return None
        side = g["side"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        o_mask = side == 0
        l_mask = ~o_mask
        if not o_mask.any() or not l_mask.any():
            return None
        lk = key[l_mask]
        osort, ok, pos, hit = _sorted_key_attach(key[o_mask], lk)
        # orphan fact rows drop (oracle inner-join parity)
        if not hit.any():
            return None
        a = g["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        attached = a[o_mask][osort][pos[hit]]
        la = a[l_mask][hit]
        lb = g["b"].to_numpy(
            zero_copy_only=False).astype(np.int64)[l_mask][hit]
        lc = g["c"].to_numpy(
            zero_copy_only=False).astype(np.int64)[l_mask][hit]
        return attached, la, lb, lc

    if via == "broadcast":

        def fold(g: pa.Table) -> pa.Table:
            import ray as _ray

            hitrow = _split_attach(g)
            if hitrow is None:
                return _code_empty
            ck, sk, rev, year = hitrow
            skeys, snat = _ray.get(supp_ref)
            ckeys, cnat = _ray.get(cust_ref)
            sn = snat[np.searchsorted(skeys, sk)]
            cn = cnat[np.searchsorted(ckeys, ck)]
            return _code_fold(sn, cn, year, rev)

        coded = both.groupby("part").map_groups(fold,
                                                batch_format="pyarrow")
    else:
        # Stage 1 (orderkey copart): attach custkey, emit raw
        # (ck, sk, year, rev) rows — cardinality is fact-scale, so no
        # pre-fold is possible before the nation attach.
        _row_empty = pa.table({
            c: _zi for c in ("ck", "sk", "year", "rev")
        })

        def fold1(g: pa.Table) -> pa.Table:
            hitrow = _split_attach(g)
            if hitrow is None:
                return _row_empty
            ck, sk, rev, year = hitrow
            return pa.table({
                "ck": pa.array(ck),
                "sk": pa.array(sk),
                "year": pa.array(year),
                "rev": pa.array(rev),
            })

        rows1 = both.groupby("part").map_groups(fold1,
                                                batch_format="pyarrow")

        # Stage 2 (suppkey copart): attach s_nationkey.
        def s_norm(b: pa.Table) -> pa.Table:
            key = b["s_suppkey"].to_numpy().astype(np.int64)
            z = np.zeros(b.num_rows, dtype=np.int64)
            return pa.table({
                "part": pa.array(_copart_tag(key)), "key": pa.array(key),
                "a": pa.array(b["s_nationkey"].to_numpy().astype(np.int64)),
                "b": pa.array(z), "c": pa.array(z),
                "side": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
            })

        def retag_sk(b: pa.Table) -> pa.Table:
            key = b["sk"].to_numpy().astype(np.int64)
            return pa.table({
                "part": pa.array(_copart_tag(key)), "key": pa.array(key),
                "a": pa.array(b["ck"].to_numpy().astype(np.int64)),
                "b": pa.array(b["rev"].to_numpy().astype(np.int64)),
                "c": pa.array(b["year"].to_numpy().astype(np.int64)),
                "side": pa.array(np.ones(b.num_rows, dtype=np.int8)),
            })

        def fold2(g: pa.Table) -> pa.Table:
            hitrow = _split_attach(g)
            if hitrow is None:
                return pa.table({
                    c: _zi for c in ("ck", "snat", "year", "rev")
                })
            snat, ck, rev, year = hitrow
            return pa.table({
                "ck": pa.array(ck),
                "snat": pa.array(snat),
                "year": pa.array(year),
                "rev": pa.array(rev),
            })

        rows2 = (
            rows1.map_batches(retag_sk, batch_format="pyarrow")
            .union(supp_ds.map_batches(s_norm, batch_format="pyarrow",
                                       zero_copy_batch=True))
            .groupby("part")
            .map_groups(fold2, batch_format="pyarrow")
        )

        # Stage 3 (custkey copart): attach c_nationkey, fold to the
        # bounded composite code per part.
        def c_norm(b: pa.Table) -> pa.Table:
            key = b["c_custkey"].to_numpy().astype(np.int64)
            z = np.zeros(b.num_rows, dtype=np.int64)
            return pa.table({
                "part": pa.array(_copart_tag(key)), "key": pa.array(key),
                "a": pa.array(b["c_nationkey"].to_numpy().astype(np.int64)),
                "b": pa.array(z), "c": pa.array(z),
                "side": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
            })

        def retag_ck(b: pa.Table) -> pa.Table:
            key = b["ck"].to_numpy().astype(np.int64)
            return pa.table({
                "part": pa.array(_copart_tag(key)), "key": pa.array(key),
                "a": pa.array(b["snat"].to_numpy().astype(np.int64)),
                "b": pa.array(b["rev"].to_numpy().astype(np.int64)),
                "c": pa.array(b["year"].to_numpy().astype(np.int64)),
                "side": pa.array(np.ones(b.num_rows, dtype=np.int8)),
            })

        def fold3(g: pa.Table) -> pa.Table:
            hitrow = _split_attach(g)
            if hitrow is None:
                return _code_empty
            cn, sn, rev, year = hitrow
            return _code_fold(sn, cn, year, rev)

        coded = (
            rows2.map_batches(retag_ck, batch_format="pyarrow")
            .union(cust_ds.map_batches(c_norm, batch_format="pyarrow",
                                       zero_copy_batch=True))
            .groupby("part")
            .map_groups(fold3, batch_format="pyarrow")
        )

    def _final_code_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"code": z, "revenue_cents": z})
        cu, r = _sum_by_key(
            g["code"].to_numpy(zero_copy_only=False).astype(np.int64),
            g["rev"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
        return pa.table({"code": pa.array(cu),
                         "revenue_cents": pa.array(r)})

    agg = (
        coded.groupby("fpart")
        .map_groups(_final_code_fold, batch_format="pyarrow")
        .take_all()  # bounded: <= nations^2 * n_years rows
    )
    nat = _collect_columns(
        rd.read_parquet(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]),
        ["n_nationkey", "n_name"],
    )
    nsort = np.argsort(nat["n_nationkey"].astype(np.int64))
    nkeys = nat["n_nationkey"].astype(np.int64)[nsort]
    nnames = nat["n_name"][nsort].astype(object)
    code = np.array([r["code"] for r in agg], dtype=np.int64)
    rev = np.array([r["revenue_cents"] for r in agg], dtype=np.int64)
    sn = code >> np.int64(22)
    cn = (code >> np.int64(12)) & np.int64(0x3FF)
    year = code & np.int64(0xFFF)
    snm = nnames[np.searchsorted(nkeys, sn)].astype(str)
    cnm = nnames[np.searchsorted(nkeys, cn)].astype(str)
    order = np.lexsort((year, cnm, snm))
    return pa.table({
        "supp_nation": pa.array(snm[order].tolist(), type=pa.string()),
        "cust_nation": pa.array(cnm[order].tolist(), type=pa.string()),
        "year": pa.array(year[order], type=pa.int64()),
        "revenue_cents": pa.array(rev[order], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# TPC-H Q17 / Q15 / Q22 shapes (thirteenth session)


def q17_small_quantity(sf_dir: str):
    """TPC-H Q17 shape: revenue held in SMALL-quantity lineitems —
    rows whose quantity is below 20% of their part's average quantity.
    The classic correlated scalar subquery (per-key AVG joined back to
    the same fact).

    Plan: ONE partkey-hash co-partition of lineitem puts every row of a
    part next to its own aggregate: per coarse part one lexsort folds
    exact per-key (sum_qty_cents, n) AND evaluates the row predicate in
    place — the correlated subquery costs one shuffle, not two passes
    over storage.  The 20%-of-average compare stays exact integer
    arithmetic: qty < 0.2 * avg  <=>  5 * qty_cents * n < sum_qty_cents
    (mirrored literally in the oracle, so float averages never enter).
    Each part emits ONE (total, count) partial; the driver folds
    <= N_COPART rows."""
    import ray.data as rd

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def norm(b: pa.Table) -> pa.Table:
        key = b["l_partkey"].to_numpy().astype(np.int64)
        return pa.table({
            "part": pa.array(_copart_tag(key)), "key": pa.array(key),
            "qc": pa.array(_cents(b["l_quantity"].to_numpy())),
            "pc": pa.array(_cents(b["l_extendedprice"].to_numpy())),
        })

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            zero = pa.array([0], type=pa.int64())
            return pa.table({"total": zero, "n": zero})
        k = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        qc = g["qc"].to_numpy(zero_copy_only=False).astype(np.int64)
        pcents = g["pc"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(k, kind="stable")
        k_s, q_s, p_s = k[order], qc[order], pcents[order]
        new = np.r_[True, k_s[1:] != k_s[:-1]]
        run = np.cumsum(new) - 1
        nrun = int(run[-1]) + 1 if len(run) else 0
        sumq = np.zeros(nrun, dtype=np.int64)
        np.add.at(sumq, run, q_s)
        n = np.bincount(run, minlength=nrun).astype(np.int64)
        small = 5 * q_s * n[run] < sumq[run]
        return pa.table({
            "total": pa.array([int(p_s[small].sum())], type=pa.int64()),
            "n": pa.array([int(small.sum())], type=pa.int64()),
        })

    parts = (
        li.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .take_all()  # <= N_COPART one-row partials
    )
    return pa.table({
        "small_qty_revenue_cents": pa.array(
            [sum(int(r["total"]) for r in parts)], type=pa.int64()),
        "n_small_lineitems": pa.array(
            [sum(int(r["n"]) for r in parts)], type=pa.int64()),
    })


Q15_START = "1996-01-01"  # Q15's one-quarter revenue window
Q15_END = "1996-04-01"


def q15_top_supplier(sf_dir: str):
    """TPC-H Q15 shape: the supplier(s) with the MAXIMUM total revenue
    over one shipping quarter — tie-COMPLETE (every supplier achieving
    the global max returns, like the reference view + WHERE total =
    (SELECT max)).

    Plan: pruned+filtered lineitem scan; per-batch (suppkey, rev)
    pre-combine; suppkey-hash coarse partitions hold each supplier's
    COMPLETE exact-cents total, so each part can emit only its local
    maximum row(s) — ties included; the driver folds <= N_COPART * ties
    candidates, takes the global max, and attaches s_name to the
    winners alone via a key-filtered pruned scan."""
    import ray.data as rd

    start = np.datetime64(Q15_START, "us")
    end = np.datetime64(Q15_END, "us")
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=(
            (pc.field("l_shipdate") >= pa.scalar(start))
            & (pc.field("l_shipdate") < pa.scalar(end))
        ),
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.greater_equal(b["l_shipdate"], pa.scalar(start)),
                    pc.less(b["l_shipdate"], pa.scalar(end)))
        )
        k = b["l_suppkey"].to_numpy().astype(np.int64)
        rev = _cents(
            b["l_extendedprice"].to_numpy()
            * (1.0 - b["l_discount"].to_numpy())
        )
        ku, inv = np.unique(k, return_inverse=True)
        r = np.zeros(len(ku), dtype=np.int64)
        np.add.at(r, inv, rev)
        return pa.table({
            "part": pa.array(_copart_tag(ku)), "key": pa.array(ku),
            "rev": pa.array(r),
        })

    def fold_max(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"key": z, "rev": z})
        k = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = g["rev"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(k, kind="stable")
        k_s, r_s = k[order], rev[order]
        new = np.r_[True, k_s[1:] != k_s[:-1]]
        run = np.cumsum(new) - 1
        tot = np.zeros(int(run[-1]) + 1, dtype=np.int64)
        np.add.at(tot, run, r_s)
        keys_u = k_s[new]
        m = tot.max()
        win = tot == m  # the part's local max, ties included
        return pa.table({"key": pa.array(keys_u[win]),
                         "rev": pa.array(tot[win])})

    cand = (
        li.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("part")
        .map_groups(fold_max, batch_format="pyarrow")
        .take_all()  # <= N_COPART * per-part ties
    )
    empty = pa.table({
        "s_suppkey": pa.array([], type=pa.int64()),
        "s_name": pa.array([], type=pa.string()),
        "total_revenue_cents": pa.array([], type=pa.int64()),
    })
    if not cand:
        return empty
    keys = np.array([r["key"] for r in cand], dtype=np.int64)
    revs = np.array([r["rev"] for r in cand], dtype=np.int64)
    m = revs.max()
    win = revs == m
    wkeys = np.sort(keys[win])
    supp = _collect_columns(
        rd.read_parquet(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"],
            filter=(pc.field("s_suppkey").isin(
                pa.array(wkeys, type=pa.int64()))),
        ),
        ["s_suppkey", "s_name"],
    )
    # name attach mirrors the oracle's JOIN-after-max: the max is taken
    # over ALL suppliers, then winners without a supplier row drop (the
    # runner-up does NOT get promoted — a missing unique max yields an
    # empty result, like WHERE rev = (SELECT MAX..) joined to supplier)
    skeys = supp["s_suppkey"].astype(np.int64)
    ssort = np.argsort(skeys)
    skeys_s = skeys[ssort]
    idx = np.searchsorted(skeys_s, wkeys)
    known = (idx < len(skeys_s)) & (
        skeys_s[np.minimum(idx, max(len(skeys_s) - 1, 0))] == wkeys
    ) if len(skeys_s) else np.zeros(len(wkeys), dtype=bool)
    wkeys, pos = wkeys[known], ssort[idx[known]]
    return pa.table({
        "s_suppkey": pa.array(wkeys, type=pa.int64()),
        "s_name": pa.array(supp["s_name"][pos].astype(object).tolist(),
                           type=pa.string()),
        "total_revenue_cents": pa.array(np.full(len(wkeys), m),
                                        type=pa.int64()),
    })


def _anti_probe(have_sorted: np.ndarray, k: np.ndarray) -> np.ndarray:
    """True where k is ABSENT from the sorted key array — the shared
    anti-join probe of the lapsed-customer queries."""
    if len(have_sorted) == 0:
        return np.ones(len(k), dtype=bool)
    idx = np.searchsorted(have_sorted, k)
    has = (idx < len(have_sorted)) & (
        have_sorted[np.minimum(idx, len(have_sorted) - 1)] == k
    )
    return ~has


def global_sales_opportunity(sf_dir: str, *, via: str = "auto"):
    """TPC-H Q22 shape: per nation (the phone-prefix analogue), the
    count and total balance of RICH LAPSED customers — balance above
    the global average of positive balances, and no order since
    CWO_CUTOFF.  Combines a global scalar subquery with a windowed
    anti-join.

    Plan: the two global scalars (n_pos, sum_pos_cents) fold from
    per-batch integer partials (two int64s reach the driver).  The
    anti-join side is SIZE-GATED: via="broadcast" ships the distinct
    recent-order custkeys (distributed unique, then ray.put) and one
    customer pass probes them — right while the customer dimension
    bounds the key set into a worker heap; via="partitioned"
    co-partitions customers and recent-order custkeys by
    hash(custkey) % N_COPART and runs the same anti-probe per part —
    the 10^9-customer layout where nothing broadcasts.  via="auto"
    (default) gates on the customer row count (parquet metadata, the
    true upper bound of the broadcast key set).  Both filters stay
    exact integers (bal_cents * n_pos > sum_pos_cents); per-nation
    partials reach a bounded (25-key) final groupby; nation names
    attach on the bounded result.  Both layouts produce identical
    integers (pytest asserts equality)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    cutoff = np.datetime64(CWO_CUTOFF, "us")
    ord_ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= pa.scalar(cutoff)),
    )
    cust_path = f"{sf_dir}/customer.parquet"
    cust_ds = rd.read_parquet(
        cust_path, columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )
    if via == "auto":
        via = ("broadcast" if cust_ds.count() <= FACT_BROADCAST_MAX_ROWS
               else "partitioned")

    def pos_partial(b: pa.Table) -> pa.Table:
        cents = _cents(b["c_acctbal"].to_numpy())
        posmask = cents > 0
        return pa.table({
            "n_pos": pa.array([int(posmask.sum())], type=pa.int64()),
            "sum_pos": pa.array([int(cents[posmask].sum())],
                                type=pa.int64()),
        })

    scal = (
        rd.read_parquet(cust_path, columns=["c_acctbal"])
        .map_batches(pos_partial, batch_format="pyarrow",
                     zero_copy_batch=True)
        .take_all()
    )
    n_pos = sum(int(r["n_pos"]) for r in scal)
    sum_pos = sum(int(r["sum_pos"]) for r in scal)

    def _nation_partial(cents, nat):
        """(nationkey, count, balance-sum) partial over the kept rows —
        shared by both layouts so the fold cannot drift."""
        ku, inv = np.unique(nat, return_inverse=True)
        n = np.bincount(inv, minlength=len(ku)).astype(np.int64)
        s = np.zeros(len(ku), dtype=np.int64)
        np.add.at(s, inv, cents)
        return ku, n, s

    if via == "broadcast":

        def uniq(b: pa.Table) -> pa.Table:
            b = b.filter(
                pc.greater_equal(b["o_orderdate"], pa.scalar(cutoff)))
            return pa.table({"k": pa.array(
                np.unique(b["o_custkey"].to_numpy().astype(np.int64)))})

        have = np.unique(
            _collect_columns(
                ord_ds.map_batches(uniq, batch_format="pyarrow",
                                   zero_copy_batch=True),
                ["k"],
            )["k"]
        )
        ref = ray.put(have)

        def partial(b: pa.Table) -> pa.Table:
            hk = ray.get(ref)
            k = b["c_custkey"].to_numpy().astype(np.int64)
            cents = _cents(b["c_acctbal"].to_numpy())
            keep = _anti_probe(hk, k) & (cents * n_pos > sum_pos)
            nk = b["c_nationkey"].to_numpy().astype(np.int64)[keep]
            ku, n, s = _nation_partial(cents[keep], nk)
            return pa.table({
                "nationkey": pa.array(ku), "n": pa.array(n),
                "s": pa.array(s),
            })

        partials = cust_ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True)
    else:
        # co-partition by hash(custkey): order keys (side 0, pre-uniqued
        # per batch) next to customer rows (side 1); anti-probe per part
        def o_norm(b: pa.Table) -> pa.Table:
            b = b.filter(
                pc.greater_equal(b["o_orderdate"], pa.scalar(cutoff)))
            k = np.unique(b["o_custkey"].to_numpy().astype(np.int64))
            z = np.zeros(len(k), dtype=np.int64)
            return pa.table({
                "part": pa.array(_copart_tag(k)), "key": pa.array(k),
                "nat": pa.array(z), "cents": pa.array(z),
                "side": pa.array(np.zeros(len(k), dtype=np.int8)),
            })

        def c_norm(b: pa.Table) -> pa.Table:
            k = b["c_custkey"].to_numpy().astype(np.int64)
            return pa.table({
                "part": pa.array(_copart_tag(k)), "key": pa.array(k),
                "nat": pa.array(
                    b["c_nationkey"].to_numpy().astype(np.int64)),
                "cents": pa.array(_cents(b["c_acctbal"].to_numpy())),
                "side": pa.array(np.ones(b.num_rows, dtype=np.int8)),
            })

        def fold(g: pa.Table) -> pa.Table:
            z = pa.array([], type=pa.int64())
            empty = pa.table({"nationkey": z, "n": z, "s": z})
            if g.num_rows == 0:
                return empty
            side = g["side"].to_numpy(zero_copy_only=False)
            key = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
            c_mask = side == 1
            if not c_mask.any():
                return empty
            have = np.unique(key[side == 0])
            k = key[c_mask]
            cents = g["cents"].to_numpy(
                zero_copy_only=False).astype(np.int64)[c_mask]
            keep = _anti_probe(have, k) & (cents * n_pos > sum_pos)
            nk = g["nat"].to_numpy(
                zero_copy_only=False).astype(np.int64)[c_mask][keep]
            ku, n, s = _nation_partial(cents[keep], nk)
            return pa.table({"nationkey": pa.array(ku),
                             "n": pa.array(n), "s": pa.array(s)})

        partials = (
            ord_ds.map_batches(o_norm, batch_format="pyarrow",
                               zero_copy_batch=True)
            .union(cust_ds.map_batches(c_norm, batch_format="pyarrow",
                                       zero_copy_batch=True))
            .groupby("part")
            .map_groups(fold, batch_format="pyarrow")
        )

    agg = (
        partials
        .groupby("nationkey")
        .aggregate(Sum("n", alias_name="n_customers"),
                   Sum("s", alias_name="acctbal_cents"))
        .take_all()  # bounded: <= 25 nations
    )
    nat = _collect_columns(
        rd.read_parquet(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]),
        ["n_nationkey", "n_name"],
    )
    nsort = np.argsort(nat["n_nationkey"].astype(np.int64))
    nkeys = nat["n_nationkey"].astype(np.int64)[nsort]
    nnames = nat["n_name"][nsort].astype(object)
    nk = np.array([r["nationkey"] for r in agg], dtype=np.int64)
    nn = np.array([r["n_customers"] for r in agg], dtype=np.int64)
    ss = np.array([r["acctbal_cents"] for r in agg], dtype=np.int64)
    names = nnames[np.searchsorted(nkeys, nk)].astype(str)
    order = np.argsort(names, kind="stable")
    return pa.table({
        "n_name": pa.array(names[order].tolist(), type=pa.string()),
        "n_customers": pa.array(nn[order], type=pa.int64()),
        "acctbal_cents": pa.array(ss[order], type=pa.int64()),
    })


# TPC-H Q19 shape: three (brand, size-range, quantity-range) disjuncts
Q19_DISJUNCTS = (
    ("Brand#1", 1, 5, 1, 11),     # (brand, size_lo, size_hi, qty_lo, qty_hi)
    ("Brand#2", 1, 10, 10, 20),
    ("Brand#3", 1, 15, 20, 30),
)


def q19_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 shape: total discounted revenue from lineitems
    satisfying ANY of three conjunctive (brand, size-range,
    quantity-range) disjuncts — the multi-attribute OR predicate that
    spans a join (brand/size live on part, quantity on lineitem), so
    no single-side filter pushdown can evaluate it.

    Plan: the partkey co-partition attaches a per-part DISJUNCT
    BITMASK (which disjuncts this part's brand+size could satisfy —
    3 bits packed into one int64 on the dimension side) to each
    lineitem; the row predicate is then one vectorized AND of the
    attached mask with the row's quantity-range bits.  Quantity bounds
    compare in exact cents (BETWEEN is inclusive on both ends,
    mirrored literally).  Each part emits one revenue partial; the
    driver folds <= N_COPART rows."""
    import ray.data as rd

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"],
    )
    part_ds = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand",
                                           "p_size"]
    )

    def part_norm(b: pa.Table) -> pa.Table:
        key = b["p_partkey"].to_numpy().astype(np.int64)
        brand = b["p_brand"].to_numpy(zero_copy_only=False).astype(str)
        size = b["p_size"].to_numpy().astype(np.int64)
        mask = np.zeros(b.num_rows, dtype=np.int64)
        for bit, (br, slo, shi, _, _) in enumerate(Q19_DISJUNCTS):
            mask |= ((brand == br) & (size >= slo)
                     & (size <= shi)).astype(np.int64) << bit
        return pa.table({"part": pa.array(_copart_tag(key)),
                         "key": pa.array(key),
                         "v": pa.array(mask),
                         "w": pa.array(np.zeros(b.num_rows,
                                                dtype=np.int64)),
                         "side": pa.array(np.zeros(b.num_rows,
                                                   dtype=np.int8))})

    def li_norm(b: pa.Table) -> pa.Table:
        key = b["l_partkey"].to_numpy().astype(np.int64)
        qc = _cents(b["l_quantity"].to_numpy())
        qmask = np.zeros(b.num_rows, dtype=np.int64)
        for bit, (_, _, _, qlo, qhi) in enumerate(Q19_DISJUNCTS):
            qmask |= ((qc >= 100 * qlo)
                      & (qc <= 100 * qhi)).astype(np.int64) << bit
        rev = _cents(
            b["l_extendedprice"].to_numpy()
            * (1.0 - b["l_discount"].to_numpy())
        )
        return pa.table({"part": pa.array(_copart_tag(key)),
                         "key": pa.array(key),
                         "v": pa.array(qmask),
                         "w": pa.array(rev),
                         "side": pa.array(np.ones(b.num_rows,
                                                  dtype=np.int8))})

    both = part_ds.map_batches(
        part_norm, batch_format="pyarrow", zero_copy_batch=True
    ).union(li.map_batches(
        li_norm, batch_format="pyarrow", zero_copy_batch=True
    ))

    def fold(g: pa.Table) -> pa.Table:
        zero = pa.array([0], type=pa.int64())
        empty = pa.table({"revenue_cents": zero, "n_lineitems": zero})
        if g.num_rows == 0:
            return empty
        side = g["side"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = g["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        p_mask = side == 0
        l_mask = ~p_mask
        if not p_mask.any() or not l_mask.any():
            return empty
        lk = key[l_mask]
        osort, pk, pos, hit = _sorted_key_attach(key[p_mask], lk)
        # lineitems with an unknown part drop (inner-join parity)
        pmask = v[p_mask][osort][pos[hit]]
        qmask = v[l_mask][hit]
        rev = g["w"].to_numpy(
            zero_copy_only=False).astype(np.int64)[l_mask][hit]
        keep = (pmask & qmask) != 0
        return pa.table({
            "revenue_cents": pa.array([int(rev[keep].sum())],
                                      type=pa.int64()),
            "n_lineitems": pa.array([int(keep.sum())], type=pa.int64()),
        })

    parts = (
        both.groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .take_all()  # <= N_COPART one-row partials
    )
    return pa.table({
        "revenue_cents": pa.array(
            [sum(int(r["revenue_cents"]) for r in parts)],
            type=pa.int64()),
        "n_lineitems": pa.array(
            [sum(int(r["n_lineitems"]) for r in parts)],
            type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# TPC-H Q21 shape: suppliers who kept orders waiting.  The reference
# query's l_receiptdate/l_commitdate columns don't exist on this
# lineitem, so "late" is the repo's shared lateness contract
# (l_shipdate > o_orderdate + LATE_SHIP_DAYS, orders_with_late_items).

Q21_TOPK = 10


def q21_waiting_suppliers(sf_dir: str, *, k: int = Q21_TOPK,
                          days: int = LATE_SHIP_DAYS):
    """Suppliers who kept multi-supplier orders waiting: for each
    finished ('F') order with lineitems from >= 2 distinct suppliers
    where EXACTLY ONE supplier shipped late, that supplier gets one
    "waiting" count; top-k suppliers by (numwait DESC, suppkey ASC)
    with names.  The classic EXISTS + NOT-EXISTS self-join on the fact
    table — but every quantifier is scoped to ONE order, so the whole
    predicate evaluates inside a single orderkey co-partition.

    Plan: both facts co-partition by hash(orderkey) % N_COPART
    (_copart_two_fact_union — the orders side pre-filtered to 'F',
    lineitems carry l_suppkey as a right_extra).  Per part: one
    searchsorted attaches each lineitem's order date (orphans and
    non-'F' orders drop), then ONE lexsort by (orderkey, suppkey)
    yields both quantifiers as run-boundary counts — distinct
    suppliers per order, distinct LATE suppliers per order (a pair is
    late if ANY of its rows is late: np.logical_or.at over pair run
    ids) — and the unique late supplier of each qualifying order is
    the late pair whose order qualifies.  Only <= n_suppliers
    (suppkey, numwait) partial rows leave each part; the final
    groupby is dimension-bounded, the top-k fold and the winner-name
    attach (key-filtered pruned scan) mirror q15/q10."""
    import ray.data as rd

    span = days * 86_400_000_000  # us

    ord_ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderstatus"],
        filter=(pc.field("o_orderstatus") == pa.scalar("F")),
    )

    def _keep_f(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["o_orderstatus"], pa.scalar("F")))
        return b.select(["o_orderkey", "o_orderdate"])

    ord_ds = ord_ds.map_batches(_keep_f, batch_format="pyarrow",
                                zero_copy_batch=True)
    li_ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_suppkey"],
    )

    both = _copart_two_fact_union(
        ord_ds, li_ds,
        left_key="o_orderkey", left_t="o_orderdate",
        right_key="l_orderkey", right_t="l_shipdate",
        right_extra=(("sk", "l_suppkey"),),
    )

    def fold(g: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        empty = pa.table({"s_suppkey": z, "numwait": z, "spart": z})
        if g.num_rows == 0:
            return empty
        side = g["side"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = g["t"].to_numpy(zero_copy_only=False).astype(np.int64)
        o_mask = side == 0
        l_mask = ~o_mask
        if not o_mask.any() or not l_mask.any():
            return empty
        lk = key[l_mask]
        lt = t[l_mask]
        sk = g["sk"].to_numpy(
            zero_copy_only=False).astype(np.int64)[l_mask]
        osort, ok, pos, hit = _sorted_key_attach(key[o_mask], lk)
        # lineitems of non-'F' / unknown orders drop
        ot = t[o_mask][osort]
        lk, lt, sk = lk[hit], lt[hit], sk[hit]
        if len(lk) == 0:
            return empty
        late = lt > ot[pos[hit]] + span
        # one lexsort gives both per-order quantifiers as run counts
        order = np.lexsort((sk, lk))
        lk_s, sk_s, late_s = lk[order], sk[order], late[order]
        new_pair = np.r_[True, (lk_s[1:] != lk_s[:-1])
                         | (sk_s[1:] != sk_s[:-1])]
        pair_run = np.cumsum(new_pair) - 1
        n_pairs = int(pair_run[-1]) + 1
        pair_late = np.zeros(n_pairs, dtype=bool)
        np.logical_or.at(pair_late, pair_run[late_s], True)
        pair_ok = lk_s[new_pair]          # each pair's orderkey
        pair_sk = sk_s[new_pair]          # each pair's suppkey
        new_ord = np.r_[True, pair_ok[1:] != pair_ok[:-1]]
        ord_run = np.cumsum(new_ord) - 1
        n_ord = int(ord_run[-1]) + 1
        n_supp = np.bincount(ord_run, minlength=n_ord)
        n_late = np.bincount(ord_run[pair_late], minlength=n_ord)
        ord_ok = (n_supp >= 2) & (n_late == 1)
        waiting = pair_sk[pair_late & ord_ok[ord_run]]
        if len(waiting) == 0:
            return empty
        wk, cnt = np.unique(waiting, return_counts=True)
        # spart = suppkey % 8 coarse-partitions the final fold (a
        # supplier lives in exactly one spart): groupby(s_suppkey)
        # .aggregate() would pay per-KEY scheduling on n_suppliers
        # pandas-block keys (the brand_supplier_counts lesson)
        return pa.table({"s_suppkey": pa.array(wk.astype(np.int64)),
                         "numwait": pa.array(cnt.astype(np.int64)),
                         "spart": pa.array((wk % 8).astype(np.int64))})

    def final_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"s_suppkey": z, "numwait": z})
        ku, tot = _sum_by_key(
            g["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64),
            g["numwait"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
        return pa.table({"s_suppkey": pa.array(ku),
                         "numwait": pa.array(tot)})

    totals = (
        both.groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .groupby("spart")
        .map_groups(final_fold, batch_format="pyarrow")
        .take_all()  # dimension-bounded: <= n_suppliers rows
    )
    empty = pa.table({
        "s_suppkey": pa.array([], type=pa.int64()),
        "s_name": pa.array([], type=pa.string()),
        "numwait": pa.array([], type=pa.int64()),
    })
    if not totals:
        return empty
    keys = np.array([r["s_suppkey"] for r in totals], dtype=np.int64)
    nw = np.array([r["numwait"] for r in totals], dtype=np.int64)
    # name attach is an INNER join in the oracle: a suppkey with no
    # supplier row drops BEFORE the top-k cut (the next supplier fills
    # the slot), so mask to known suppliers first — candidates are
    # dimension-bounded, so one key-filtered pruned scan covers them
    supp = _collect_columns(
        rd.read_parquet(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"],
            filter=(pc.field("s_suppkey").isin(
                pa.array(np.sort(keys), type=pa.int64()))),
        ),
        ["s_suppkey", "s_name"],
    )
    skeys = supp["s_suppkey"].astype(np.int64)
    psort = np.argsort(skeys)
    skeys_s = skeys[psort]
    idx = np.searchsorted(skeys_s, keys)
    known = (idx < len(skeys_s)) & (
        skeys_s[np.minimum(idx, max(len(skeys_s) - 1, 0))] == keys
    ) if len(skeys_s) else np.zeros(len(keys), dtype=bool)
    keys, nw, idx = keys[known], nw[known], idx[known]
    if len(keys) == 0:
        return empty
    top = np.lexsort((keys, -nw))[:k]     # numwait DESC, suppkey ASC
    wkeys, wnw, widx = keys[top], nw[top], idx[top]
    names = supp["s_name"][psort].astype(object)[widx]
    return pa.table({
        "s_suppkey": pa.array(wkeys, type=pa.int64()),
        "s_name": pa.array(names.tolist(), type=pa.string()),
        "numwait": pa.array(wnw, type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: national market share.  Reuses the trade_volume
# kernel wholesale — the share is a BOUNDED post-fold of the
# (supp_nation, cust_nation, year) matrix, so the distributed work
# (orderkey copart + size-gated dimension attach) is ONE shared
# implementation with Q7.  Window = the shared TRADE ship-date window.

Q8_REGION = "ASIA"        # customer region under audit
Q8_NATION = "NATION_8"    # target supplier nation


def q8_market_share(sf_dir: str, *, via: str = "auto",
                    region: str = Q8_REGION, nation: str = Q8_NATION):
    """Per ship year: the target nation's suppliers' share of all
    revenue delivered to the audited region's customers —
    share_permille = 1000 * target_rev // total_rev, exact integers.

    Plan: trade_volume's distributed fold produces the bounded
    (supp_nation, cust_nation, year) revenue matrix (<= nations^2 *
    n_years rows); the region membership of each cust_nation and the
    per-year conditional sums are driver arithmetic on that bounded
    result, so Q8 adds ZERO distributed stages beyond Q7's.  Years
    with no region revenue drop (mirrored by HAVING in the oracle)."""
    import ray.data as rd

    tv = trade_volume(sf_dir, via=via)
    nat = _collect_columns(
        rd.read_parquet(f"{sf_dir}/nation.parquet",
                        columns=["n_name", "n_regionkey"]),
        ["n_name", "n_regionkey"],
    )
    reg = _collect_columns(
        rd.read_parquet(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"]),
        ["r_regionkey", "r_name"],
    )
    rkey = {int(k): str(n) for k, n in
            zip(reg["r_regionkey"], reg["r_name"])}
    in_region = {str(n) for n, k in zip(nat["n_name"], nat["n_regionkey"])
                 if rkey.get(int(k)) == region}

    cn = np.asarray(tv["cust_nation"].to_pylist(), dtype=object)
    sn = np.asarray(tv["supp_nation"].to_pylist(), dtype=object)
    yr = tv["year"].to_numpy().astype(np.int64)
    rev = tv["revenue_cents"].to_numpy().astype(np.int64)
    keep = np.asarray([c in in_region for c in cn], dtype=bool)
    sn, yr, rev = sn[keep], yr[keep], rev[keep]
    empty = pa.table({
        "year": pa.array([], type=pa.int64()),
        "target_rev_cents": pa.array([], type=pa.int64()),
        "total_rev_cents": pa.array([], type=pa.int64()),
        "share_permille": pa.array([], type=pa.int64()),
    })
    if len(yr) == 0:
        return empty
    yu, inv = np.unique(yr, return_inverse=True)
    tot = np.zeros(len(yu), dtype=np.int64)
    np.add.at(tot, inv, rev)
    tgt = np.zeros(len(yu), dtype=np.int64)
    tmask = sn == nation
    np.add.at(tgt, inv[tmask], rev[tmask])
    pos = tot > 0  # HAVING parity: no-revenue years drop
    yu, tot, tgt = yu[pos], tot[pos], tgt[pos]
    return pa.table({
        "year": pa.array(yu, type=pa.int64()),
        "target_rev_cents": pa.array(tgt, type=pa.int64()),
        "total_rev_cents": pa.array(tot, type=pa.int64()),
        "share_permille": pa.array(1000 * tgt // tot, type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# temporal followed-by pair counts (MATCH_RECOGNIZE / funnel-window
# shape): for every ordered event-type pair (A, B), how often a user's
# B event lands strictly after an A event but within the window — the
# time-constrained generalization of event_transitions (which only
# counts ADJACENT steps).


def followed_within(sf_dir: str, *, window_us: int = HOUR_US):
    """Count, per ordered (trigger_type, target_type) pair, the
    user-local occurrences of target strictly after trigger within
    ``window_us`` ((t, t + W] — equal timestamps are NOT 'after',
    matching the oracle's b.ts > a.ts).

    Plan: users hash into coarse partitions (sessionize's layout); per
    part ONE lexsort by (user, ts) builds the run-offset composite axis
    (rolling_event_window's trick: run * span + rel with span >
    ts-range + W, so windows never bleed across users), then each of
    the <= n_types target types costs TWO global searchsorted calls on
    its sorted composite subset — per-row window counts bincount into
    the (trigger, target) matrix by the trigger's dictionary code.  No
    per-user group, no per-event loop, no self-join: the oracle's
    fact-fact self-join becomes n_types vectorized passes per part.
    Only <= n_types^2 count partials leave each part; the final
    groupby is types^2-bounded."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from prlib_ray.stages.reassemble import _runs

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"],
    )

    def fold(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "trigger_type": pa.array([], type=pa.string()),
            "target_type": pa.array([], type=pa.string()),
            "n_pairs": pa.array([], type=pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        user = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        et = np.asarray(g["event_type"].to_pylist(), dtype=object)
        order = np.lexsort((ts, user))
        u, t, e = user[order], ts[order], et[order]
        types, codes = np.unique(e, return_inverse=True)
        run, starts, _ = _runs(u)
        rel = t - t.min()
        span = int(rel.max()) + window_us + 2
        comp = run * span + rel
        k = len(types)
        mat = np.zeros((k, k), dtype=np.int64)
        for b_code in range(k):
            cb = comp[codes == b_code]  # sorted subset of a sorted axis
            if len(cb) == 0:
                continue
            lo = np.searchsorted(cb, comp, side="right")
            hi = np.searchsorted(cb, comp + window_us, side="right")
            np.add.at(mat[:, b_code], codes, hi - lo)
        ti, bi = np.nonzero(mat)
        if len(ti) == 0:
            return empty
        return pa.table({
            "trigger_type": pa.array(types[ti], type=pa.string()),
            "target_type": pa.array(types[bi], type=pa.string()),
            "n_pairs": pa.array(mat[ti, bi]),
        })

    return (
        ds.map_batches(_add_user_part, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .groupby(["trigger_type", "target_type"])
        .aggregate(Sum("n_pairs", alias_name="n_pairs"))
        .sort(["trigger_type", "target_type"])
    )


# ---------------------------------------------------------------------------
# exact distributed variance outliers: feature-normalization stats are
# the canonical second-moment need of a training pipeline, and float
# accumulation would desynchronize from any SQL mirror — so the second
# moment accumulates EXACTLY (hi/lo int64 limbs, conv_stats' trick) and
# the z-score compare is exact 128-bit integer arithmetic on both
# sides.

ZSCORE_NUM = 3  # threshold = 3/2 sigma (2 sigma is vacuous on the
ZSCORE_DEN = 2  # fixtures' uniform-ish prices: max |z| ~ sqrt(3) < 2)


def price_zscore_outliers(sf_dir: str):
    """Per order status: order count and how many orders' total price
    deviates from the status mean by MORE than 1.5 sigma (population),
    decided exactly:  |x - mean| > 1.5*sigma
    <=>  4*(n*x - s)^2 > 9*(n*ss - s^2)  — all integers, strictly >.

    Plan: pass 1 folds per-batch (status, n, sum, sumsq_hi, sumsq_lo)
    partials — x^2 fits int64 (prices < 2^31 cents) but its SUM does
    not, so the square accumulates in 32-bit hi/lo limbs and the
    driver reassembles exact python ints from <= n_statuses rows per
    batch.  Pass 2 probes with the broadcast per-status constants:
    the LHS squares in two-limb uint64 (similarity's _mul_u64), the
    RHS is a 128-bit python int split into limbs — no floats anywhere.
    int64 envelope: n * max_price_cents < 2^62 (10^10 orders per
    status at 10^9-cent prices overflows; shard the status first).
    Oracle: DuckDB HUGEINT mirrors the identical inequality."""
    import ray.data as rd

    from prlib_ray.stages.similarity import _mul_u64

    mask32 = np.int64(0xFFFFFFFF)

    def stats_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "st": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
            "s": pa.array([], type=pa.int64()),
            "ss_hi": pa.array([], type=pa.int64()),
            "ss_lo": pa.array([], type=pa.int64()),
        })
        if b.num_rows == 0:
            return empty
        st = b["o_orderstatus"]
        if isinstance(st, pa.ChunkedArray):
            st = st.combine_chunks()
        d = pc.dictionary_encode(st)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(d.dictionary)
        xc = _cents(b["o_totalprice"].to_numpy())
        p = xc * xc  # < 2^63: prices < 2^31 cents
        n = np.bincount(codes, minlength=k).astype(np.int64)
        s = np.zeros(k, dtype=np.int64)
        np.add.at(s, codes, xc)
        hi = np.zeros(k, dtype=np.int64)
        np.add.at(hi, codes, p >> np.int64(32))
        lo = np.zeros(k, dtype=np.int64)
        np.add.at(lo, codes, p & mask32)
        return pa.table({
            "st": d.dictionary, "n": pa.array(n), "s": pa.array(s),
            "ss_hi": pa.array(hi), "ss_lo": pa.array(lo),
        })

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_totalprice"],
    )
    rows = ds.map_batches(stats_partial, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    # exact python-int fold of <= n_statuses * n_batches tiny rows
    agg: dict[str, list[int]] = {}
    for r in rows:
        a = agg.setdefault(r["st"], [0, 0, 0])
        a[0] += int(r["n"])
        a[1] += int(r["s"])
        a[2] += (int(r["ss_hi"]) << 32) + int(r["ss_lo"])
    consts = {}
    u64 = np.uint64(0xFFFFFFFFFFFFFFFF)
    for st, (n, s, ss) in agg.items():
        rhs = (ZSCORE_NUM * ZSCORE_NUM) * (n * ss - s * s)  # >= 0
        consts[st] = (n, s, np.uint64(rhs >> 64),
                      np.uint64(rhs & int(u64)))

    def probe(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "st": pa.array([], type=pa.string()),
            "n_out": pa.array([], type=pa.int64()),
        })
        if b.num_rows == 0:
            return empty
        st = b["o_orderstatus"]
        if isinstance(st, pa.ChunkedArray):
            st = st.combine_chunks()
        d = pc.dictionary_encode(st)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dic = d.dictionary.to_pylist()
        xc = _cents(b["o_totalprice"].to_numpy())
        n_arr = np.asarray([consts[s][0] for s in dic], dtype=np.int64)
        s_arr = np.asarray([consts[s][1] for s in dic], dtype=np.int64)
        rhs_hi = np.asarray([consts[s][2] for s in dic], dtype=np.uint64)
        rhs_lo = np.asarray([consts[s][3] for s in dic], dtype=np.uint64)
        dd = n_arr[codes] * xc - s_arr[codes]          # |d| < 2^62
        a2 = (np.abs(dd) << np.int64(1)).astype(np.uint64)  # 2|d|
        lhs_hi, lhs_lo = _mul_u64(a2, a2)              # 4*d^2
        out = (lhs_hi > rhs_hi[codes]) | (
            (lhs_hi == rhs_hi[codes]) & (lhs_lo > rhs_lo[codes])
        )
        k = len(dic)
        cnt = np.zeros(k, dtype=np.int64)
        np.add.at(cnt, codes[out], 1)
        return pa.table({"st": d.dictionary, "n_out": pa.array(cnt)})

    out_rows = ds.map_batches(probe, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
    n_out: dict[str, int] = {}
    for r in out_rows:
        n_out[r["st"]] = n_out.get(r["st"], 0) + int(r["n_out"])
    sts = sorted(agg)
    return pa.table({
        "o_orderstatus": pa.array(sts, type=pa.string()),
        "n_orders": pa.array([agg[s][0] for s in sts], type=pa.int64()),
        "n_outliers": pa.array([n_out.get(s, 0) for s in sts],
                               type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# referential-integrity pre-flight: orphan counts for every FK edge a
# pipeline join relies on.  The fixtures are FK-intact, so the audit
# AUGMENTS each fact with deterministic orphan rows (negative keys),
# UNION-ALL-mirrored in the oracle — the dedup_embedding lesson: a
# 0 == 0 driver row proves nothing.

FK_PLANT_ORPHANS = 3  # planted orphan rows per audited edge


def fk_orphan_audit(sf_dir: str, *, via: str = "auto"):
    """Per FK edge (lineitem->orders, lineitem->part,
    lineitem->supplier, orders->customer): total fact rows and how
    many reference a missing parent key.

    Two size-gated physical plans (the _probe_join discipline;
    ``via="auto"`` picks by total parent rows vs
    FACT_BROADCAST_MAX_ROWS):

    * broadcast (parents fit): the four sorted parent-key arrays are
      folded from DISTRIBUTED pruned scans (_collect_columns_parallel
      — no driver pd.read_parquet) and ray.put once; each fact scan
      anti-probes its FK columns per batch and emits (edge, n_rows,
      n_orphans) partials — NO shuffle at all (measured 6.5 s -> 1.6 s
      at sf0.1/32cpu vs the copart plan: the coarse groupby sort was
      ~5 s of the total on ~1.1M distinct-key rows).  The planted
      orphans (negative keys, never in any parent) are added
      arithmetically per edge.
    * copart (parents outgrow broadcast, the 10^12-row shape): ALL
      FOUR edges flow through ONE edge-tagged union + ONE coarse
      key-hash shuffle — each fact scan pre-combines to DISTINCT
      (edge, key, n) partials per batch (lineitem scans its three FK
      columns ONCE; orders serves as edge-0 parent AND edge-3 fact in
      one scan), key-hash coarse partitions co-locate fact keys with
      the same edge's parent keys, one lexsort + one sorted
      _anti_probe per edge run per part; <= n_edges rows per part.

    Each fact is augmented with FK_PLANT_ORPHANS deterministic
    negative-key rows so the audit is non-vacuous on FK-intact data
    (mirrored in SQL via UNION ALL).  Both layouts are byte-equal
    (pinned in pytest, gate flip included)."""
    import ray.data as rd

    edge_names = ["lineitem->orders", "lineitem->part",
                  "lineitem->supplier", "orders->customer"]
    parents = [("orders", "o_orderkey"), ("part", "p_partkey"),
               ("supplier", "s_suppkey"), ("customer", "c_custkey")]

    if via == "auto":
        import pyarrow.parquet as _pq

        total_parent = sum(
            _pq.read_metadata(f"{sf_dir}/{t}.parquet").num_rows
            for t, _ in parents)
        via = ("broadcast" if total_parent <= FACT_BROADCAST_MAX_ROWS
               else "copart")

    if via == "broadcast":
        import ray

        got = _collect_columns_parallel({
            t: (rd.read_parquet(f"{sf_dir}/{t}.parquet", columns=[pk]),
                [pk])
            for t, pk in parents
        })
        par = tuple(np.sort(got[t][pk].astype(np.int64))
                    for t, pk in parents)
        ref = ray.put(par)

        def probe(cols: list[tuple[str, int]]):
            def fn(b: pa.Table) -> pa.Table:
                par = ray.get(ref)
                eids, nr, no = [], [], []
                for col, eid in cols:
                    k = b[col].to_numpy().astype(np.int64)
                    miss = _anti_probe(par[eid], k)
                    eids.append(eid)
                    nr.append(len(k))
                    no.append(int(miss.sum()))
                return pa.table({
                    "edge": pa.array(eids, type=pa.int64()),
                    "n_rows": pa.array(nr, type=pa.int64()),
                    "n_orphans": pa.array(no, type=pa.int64()),
                })

            return fn

        rows = (
            rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_orderkey", "l_partkey", "l_suppkey"],
            ).map_batches(
                probe([("l_orderkey", 0), ("l_partkey", 1),
                       ("l_suppkey", 2)]),
                batch_format="pyarrow", zero_copy_batch=True,
            ).union(
                rd.read_parquet(
                    f"{sf_dir}/orders.parquet", columns=["o_custkey"]
                ).map_batches(
                    probe([("o_custkey", 3)]),
                    batch_format="pyarrow", zero_copy_batch=True,
                )
            ).take_all()  # bounded: <= n_edges rows per batch
        )
        out_n = [FK_PLANT_ORPHANS] * 4   # plants: always orphan rows
        out_orph = [FK_PLANT_ORPHANS] * 4
        for r in rows:
            out_n[int(r["edge"])] += int(r["n_rows"])
            out_orph[int(r["edge"])] += int(r["n_orphans"])
        order = np.argsort(np.asarray(edge_names, dtype=object))
        return pa.table({
            "fk_edge": pa.array([edge_names[i] for i in order],
                                type=pa.string()),
            "n_rows": pa.array([out_n[i] for i in order],
                               type=pa.int64()),
            "n_orphans": pa.array([out_orph[i] for i in order],
                                  type=pa.int64()),
        })

    def tagged(cols: list[tuple[str, int, int]]):
        """One scan -> (part, key, n, side, edge) rows for each
        (column, edge_id, side) role the table plays."""

        def fn(b: pa.Table) -> pa.Table:
            parts_, keys_, ns_, sides_, edges_ = [], [], [], [], []
            for col, eid, side in cols:
                k = b[col].to_numpy().astype(np.int64)
                if side == 1:  # fact: pre-combine to distinct (key, n)
                    k, cnt = np.unique(k, return_counts=True)
                    n = cnt.astype(np.int64)
                else:
                    n = np.zeros(len(k), dtype=np.int64)
                parts_.append(_copart_tag(k))
                keys_.append(k)
                ns_.append(n)
                sides_.append(np.full(len(k), side, dtype=np.int8))
                edges_.append(np.full(len(k), eid, dtype=np.int8))
            return pa.table({
                "part": pa.array(np.concatenate(parts_)),
                "key": pa.array(np.concatenate(keys_)),
                "n": pa.array(np.concatenate(ns_)),
                "side": pa.array(np.concatenate(sides_)),
                "edge": pa.array(np.concatenate(edges_)),
            })

        return fn

    def scan(table: str, cols: list[tuple[str, int, int]]):
        return rd.read_parquet(
            f"{sf_dir}/{table}.parquet", columns=[c for c, _, _ in cols]
        ).map_batches(tagged(cols), batch_format="pyarrow",
                      zero_copy_batch=True)

    plant_keys = np.tile(
        -np.arange(1, FK_PLANT_ORPHANS + 1, dtype=np.int64), 4)
    plant_edges = np.repeat(np.arange(4, dtype=np.int8),
                            FK_PLANT_ORPHANS)
    plant = rd.from_arrow(pa.table({
        "part": pa.array(_copart_tag(plant_keys)),
        "key": pa.array(plant_keys),
        "n": pa.array(np.ones(len(plant_keys), dtype=np.int64)),
        "side": pa.array(np.ones(len(plant_keys), dtype=np.int8)),
        "edge": pa.array(plant_edges),
    }))

    both = scan("lineitem", [("l_orderkey", 0, 1), ("l_partkey", 1, 1),
                             ("l_suppkey", 2, 1)]).union(
        scan("orders", [("o_orderkey", 0, 0), ("o_custkey", 3, 1)]),
        scan("part", [("p_partkey", 1, 0)]),
        scan("supplier", [("s_suppkey", 2, 0)]),
        scan("customer", [("c_custkey", 3, 0)]),
        plant,
    )

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"edge": z, "n_rows": z, "n_orphans": z})
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        side = g["side"].to_numpy(zero_copy_only=False).astype(np.int64)
        edge = g["edge"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((side, key, edge))
        key, n, side, edge = key[o], n[o], side[o], edge[o]
        starts = np.flatnonzero(np.r_[True, edge[1:] != edge[:-1]])
        ends = np.r_[starts[1:], len(edge)]
        rows = []
        for st, en in zip(starts, ends):  # <= 4 edge runs
            ek, en_, es = key[st:en], n[st:en], side[st:en]
            have = ek[es == 0]  # already key-sorted within the run
            fk_keys, fn = ek[es == 1], en_[es == 1]
            miss = _anti_probe(have, fk_keys)
            rows.append((int(edge[st]), int(fn.sum()),
                         int(fn[miss].sum())))
        return pa.table({
            "edge": pa.array([r[0] for r in rows], type=pa.int64()),
            "n_rows": pa.array([r[1] for r in rows], type=pa.int64()),
            "n_orphans": pa.array([r[2] for r in rows],
                                  type=pa.int64()),
        })

    parts = (
        both.groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .take_all()  # <= 4 x N_COPART one-row partials
    )
    out_n = [0] * 4
    out_orph = [0] * 4
    for r in parts:
        out_n[int(r["edge"])] += int(r["n_rows"])
        out_orph[int(r["edge"])] += int(r["n_orphans"])
    order = np.argsort(np.asarray(edge_names, dtype=object))
    return pa.table({
        "fk_edge": pa.array([edge_names[i] for i in order],
                            type=pa.string()),
        "n_rows": pa.array([out_n[i] for i in order], type=pa.int64()),
        "n_orphans": pa.array([out_orph[i] for i in order],
                              type=pa.int64()),
    })


# --- synthesized partsupp dimension (Q2 / Q11 / Q20 family) --------------------

# The fixtures carry no partsupp table, so these shapes synthesize it
# DETERMINISTICALLY from part x a supplier-count scalar in pure mod
# arithmetic — the plant discipline applied to a whole dimension; the
# oracle rebuilds the identical table from the same CTE (every constant
# interpolates from here).  Thresholds were measured on the fixtures
# BEFORE wiring (item-48 lesson): availqty % 30 gives Q20 a real
# 153/285 excess split; Q11's above-mean rule keeps 34/80 parts.
PS_PER_PART = 4
PS_SUPP_A, PS_SUPP_B = 7, 131       # suppkey = smin + (p*7 + k*131) % S
PS_AVAIL_MOD = 30                    # availqty = (p*13 + k*17) % 30 + 1
PS_AVAIL_A, PS_AVAIL_B = 13, 17
PS_COST_MOD, PS_COST_BASE = 99_000, 1_000  # cost cents in [1000, 100000)
PS_COST_A, PS_COST_B = 29, 37       # cost = (p*29 + k*37) % mod + base
Q11_REGION = "ASIA"
Q20_YEAR = ("1997-01-01", "1998-01-01")


def _ps_synth(p: np.ndarray, k: np.ndarray, smin: int, n_supp: int):
    """(ps_suppkey, ps_availqty, ps_cost_cents) for partsupp rows
    (p, k) — the ONE synthesis site.  _partsupp_ds (q11/q20), q2, q9
    and the oracle CTE (oracles_rel._ps_cte) all derive from these
    formulas/constants, so a knob change cannot desynchronize them."""
    sk = smin + (p * PS_SUPP_A + k * PS_SUPP_B) % max(n_supp, 1)
    avail = (p * PS_AVAIL_A + k * PS_AVAIL_B) % PS_AVAIL_MOD + 1
    cost = (p * PS_COST_A + k * PS_COST_B) % PS_COST_MOD + PS_COST_BASE
    return sk, avail, cost


def _supp_key_scalars(sf_dir: str) -> tuple[int, int]:
    """(smin, n_supp) from ONE pruned scan: count is parquet-metadata-
    only, min is a single-column aggregate job."""
    import ray.data as rd
    from ray.data.aggregate import Min

    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey"])
    n_supp = int(supp.count())
    smin = int(supp.aggregate(Min("s_suppkey"))["min(s_suppkey)"])
    return smin, n_supp


def _partsupp_ds(sf_dir: str):
    """Synthesized partsupp as a streamed Dataset: PS_PER_PART rows per
    part, columns (ps_partkey, ps_suppkey, ps_availqty, ps_cost_cents)."""
    import ray.data as rd

    smin, n_supp = _supp_key_scalars(sf_dir)
    part = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"])

    def synth(b: pa.Table) -> pa.Table:
        p = np.repeat(b["p_partkey"].to_numpy().astype(np.int64),
                      PS_PER_PART)
        k = np.tile(np.arange(PS_PER_PART, dtype=np.int64), b.num_rows)
        sk, avail, cost = _ps_synth(p, k, smin, n_supp)
        return pa.table({
            "ps_partkey": pa.array(p),
            "ps_suppkey": pa.array(sk),
            "ps_availqty": pa.array(avail),
            "ps_cost_cents": pa.array(cost),
        })

    return part.map_batches(synth, batch_format="pyarrow",
                            zero_copy_batch=True)


def _region_suppkeys(sf_dir: str, region: str) -> np.ndarray:
    """Sorted suppkeys whose nation sits in ``region`` — a bounded
    dimension chain (supplier -> nation -> region), folded from pruned
    distributed scans.  Broadcast side; at a design point where the
    supplier table itself is fact-sized, re-tag by hash(suppkey)
    against the partitioned supplier scan instead (the trade_volume
    via="partitioned" layout — machinery exists, shared gate metric)."""
    import ray.data as rd

    nat = _collect_columns(
        rd.read_parquet(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"]),
        ["n_nationkey", "n_regionkey"])
    reg = rd.read_parquet(f"{sf_dir}/region.parquet").take_all()
    want_rk = {int(r["r_regionkey"]) for r in reg if r["r_name"] == region}
    want_nations = set(
        int(nk) for nk, rk in zip(nat["n_nationkey"], nat["n_regionkey"])
        if int(rk) in want_rk
    )
    supp = _collect_columns(
        rd.read_parquet(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]),
        ["s_suppkey", "s_nationkey"])
    keys = supp["s_suppkey"].astype(np.int64)
    mask = np.isin(supp["s_nationkey"].astype(np.int64),
                   np.asarray(sorted(want_nations), dtype=np.int64))
    return np.sort(keys[mask])


def q11_important_stock(sf_dir: str):
    """TPC-H Q11 shape over the synthesized partsupp: per-part stock
    value (cost * availqty) held by one region's suppliers, keeping the
    parts STRICTLY above the mean part value — the global-scalar +
    per-key-fold discipline (Q22's shape over a synthesized dimension).

    Plan: partsupp streams off the part scan, the in-region suppkey set
    broadcasts once (sorted array + searchsorted — dimension-sized),
    per-part values fold in coarse hash partitions (partkey-scale keys:
    the item-65 discipline), and the two global scalars (total value,
    part count) aggregate off the SAME materialized fold, so the
    threshold pass is one more map_batches — no second scan.  The
    above-mean compare is exact integers: value * n_parts > total."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    keys_ref = ray.put(_region_suppkeys(sf_dir, Q11_REGION))
    ps = _partsupp_ds(sf_dir)

    def norm(b: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        sk = b["ps_suppkey"].to_numpy().astype(np.int64)
        pos = np.searchsorted(keys, sk)
        pos = np.minimum(pos, max(len(keys) - 1, 0))
        hit = (keys[pos] == sk) if len(keys) else np.zeros(len(sk), bool)
        pk = b["ps_partkey"].to_numpy().astype(np.int64)[hit]
        val = (b["ps_cost_cents"].to_numpy().astype(np.int64)[hit]
               * b["ps_availqty"].to_numpy().astype(np.int64)[hit])
        return pa.table({
            "part": pa.array(_copart_tag(pk)),
            "key": pa.array(pk),
            "v": pa.array(val),
        })

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"ps_partkey": z, "value_cents": z})
        ku, tot = _sum_by_key(
            g["key"].to_numpy(zero_copy_only=False).astype(np.int64),
            g["v"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
        return pa.table({"ps_partkey": pa.array(ku),
                         "value_cents": pa.array(tot)})

    pv = (
        ps.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .materialize()
    )
    n_parts = int(pv.count())
    total = int(pv.aggregate(Sum("value_cents"))["sum(value_cents)"] or 0)
    # int64 guard for the strict above-mean compare (the oracle runs it
    # in HUGEINT; the engine must not wrap)
    assert n_parts == 0 or total < (1 << 63) // max(n_parts, 1)

    def thresh(b: pa.Table) -> pa.Table:
        v = b["value_cents"].to_numpy().astype(np.int64)
        m = v * n_parts > total
        return b.filter(pa.array(m))

    return pv.map_batches(thresh, batch_format="pyarrow",
                          zero_copy_batch=True)


def q20_excess_parts(sf_dir: str):
    """TPC-H Q20 shape: suppliers holding EXCESS stock — synthesized
    partsupp pairs whose availqty exceeds half the quantity actually
    shipped for that (part, supplier) in Q20_YEAR.  The correlated
    scalar subquery spans partsupp x lineitem on a COMPOSITE key, so
    both sides co-partition by hash(packed key) (the
    orders_with_late_items layout with key = partkey << 32 | suppkey);
    pairs with no shipments drop (the classic inner-correlation
    semantics).  Per part: one _sum_by_key over the lineitem side, one
    _sorted_key_attach probe, <= suppliers-per-part (suppkey, n)
    partial rows out; a second coarse fold sums per supplier (supplier-
    scale keys — the item-65 discipline).  Excess is exact integers:
    2 * 100 * availqty > qty_cents."""
    import ray.data as rd

    start = np.datetime64(Q20_YEAR[0], "us")
    end = np.datetime64(Q20_YEAR[1], "us")
    ps = _partsupp_ds(sf_dir)
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        filter=(
            (pc.field("l_shipdate") >= pa.scalar(start))
            & (pc.field("l_shipdate") < pa.scalar(end))
        ),
    )

    def pack(pk: np.ndarray, sk: np.ndarray) -> np.ndarray:
        assert (pk >= 0).all() and pk.max(initial=0) < (1 << 31)
        assert (sk >= 0).all() and sk.max(initial=0) < (1 << 32)
        return (pk << 32) | sk

    def ps_norm(b: pa.Table) -> pa.Table:
        key = pack(b["ps_partkey"].to_numpy().astype(np.int64),
                   b["ps_suppkey"].to_numpy().astype(np.int64))
        return pa.table({
            "part": pa.array(_copart_tag(key)), "key": pa.array(key),
            "t": pa.array(b["ps_availqty"].to_numpy().astype(np.int64)),
            "side": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
        })

    def li_norm(b: pa.Table) -> pa.Table:
        key = pack(b["l_partkey"].to_numpy().astype(np.int64),
                   b["l_suppkey"].to_numpy().astype(np.int64))
        return pa.table({
            "part": pa.array(_copart_tag(key)), "key": pa.array(key),
            "t": pa.array(_cents(b["l_quantity"].to_numpy())),
            "side": pa.array(np.ones(b.num_rows, dtype=np.int8)),
        })

    both = ps.map_batches(
        ps_norm, batch_format="pyarrow", zero_copy_batch=True
    ).union(li.map_batches(
        li_norm, batch_format="pyarrow", zero_copy_batch=True
    ))

    def fold(g: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        empty = pa.table({"spart": z, "s_suppkey": z, "n": z})
        if g.num_rows == 0:
            return empty
        side = g["side"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = g["t"].to_numpy(zero_copy_only=False).astype(np.int64)
        pm = side == 0
        lm = side == 1
        if not pm.any() or not lm.any():
            return empty
        lk, lsum = _sum_by_key(key[lm], t[lm])
        ok, avail = key[pm], t[pm]
        pos = np.searchsorted(lk, ok)
        pos = np.minimum(pos, len(lk) - 1)
        hit = lk[pos] == ok
        excess = hit & (200 * avail > lsum[pos])
        if not excess.any():
            return empty
        sk = (ok[excess] & ((1 << 32) - 1)).astype(np.int64)
        su, sn = _sum_by_key(sk, np.ones(len(sk), dtype=np.int64))
        return pa.table({
            "spart": pa.array(_copart_tag(su).astype(np.int64)),
            "s_suppkey": pa.array(su),
            "n": pa.array(sn),
        })

    def final(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"s_suppkey": z, "n_excess_parts": z})
        ku, tot = _sum_by_key(
            g["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64),
            g["n"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
        return pa.table({"s_suppkey": pa.array(ku),
                         "n_excess_parts": pa.array(tot)})

    return (
        both.groupby("part").map_groups(fold, batch_format="pyarrow")
        .groupby("spart").map_groups(final, batch_format="pyarrow")
        .map_batches(lambda b: b.select(["s_suppkey", "n_excess_parts"]),
                     batch_format="pyarrow")
    )


Q2_REGION = "EUROPE"
Q2_SIZE_MOD = 5  # part subset: p_size % 5 == 0 (39/200 parts at sf0.001)
Q9_NAME_WORDS = ("cold", "small")  # part filter: first name word

# Q16 constants, measured non-vacuous on the fixtures before wiring
# (item-48 lesson): 28 groups at sf0.001 / 223 at sf0.01; the
# complaint-supplier synthesis rule (no s_comment column exists) keeps
# the NOT IN exclusion set non-empty at every sf (1 of 10 / 8 of 100).
Q16_EXCL_BRAND = "Brand#13"
Q16_EXCL_TYPE_PREFIX = "MEDIUM"
Q16_SIZES = (1, 4, 9, 14, 23, 36, 45, 49)
Q16_COMPLAINT_MOD = 13  # "Customer Complaints" suppliers: suppkey % 13 == 0


def q16_supplier_cnt(sf_dir: str):
    """TPC-H Q16 proper (parts/supplier relationship — tpch/queries/16.sql
    shape), completing the sweep at 22/22: per (p_brand, p_type, p_size)
    in the filtered part subset, the number of DISTINCT partsupp
    suppliers, EXCLUDING the complaint-supplier set via NOT IN.  The
    reference's s_comment LIKE filter synthesizes as suppkey %
    Q16_COMPLAINT_MOD == 0 (mirrored in the oracle's subquery), and the
    exclusion set reaches probes as a scan-derived broadcast — a real
    anti-join against the supplier dimension, not an inlined predicate.

    Plan: partsupp is SYNTHESIZED from the part scan (_ps_synth), so the
    part<->partsupp join is free — each filtered part row emits its own
    PS_PER_PART supplier rows with brand/type/size already in hand (zero
    copart shuffle, unlike brand_supplier_counts' lineitem side); the
    complaint exclusion is one sorted-array searchsorted per batch;
    per-batch DISTINCT (brand, type, size, supp) quads pre-combine, then
    re-partition by SUPPLIER hash (a quad lives in exactly one supplier
    part, so per-part drop_duplicates is globally exact); bounded
    (brand, type, size, n) count partials fold in coarse brand-hash
    parts — never a per-key groupby().aggregate()."""
    import ray
    import ray.data as rd
    import pyarrow.compute as pc

    smin, n_supp = _supp_key_scalars(sf_dir)
    # the NOT IN side: complaint suppkeys from a pruned supplier scan
    # (dimension-sized — broadcast; at a fact-sized supplier, re-tag by
    # hash(suppkey) instead, the trade_volume via="partitioned" layout)
    supp = _collect_columns(
        rd.read_parquet(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey"]),
        ["s_suppkey"])
    sk_all = supp["s_suppkey"].astype(np.int64)
    complaints_ref = ray.put(
        np.sort(sk_all[sk_all % Q16_COMPLAINT_MOD == 0]))

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
    )

    def synth(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.not_equal(b["p_brand"], Q16_EXCL_BRAND),
            pc.invert(pc.starts_with(b["p_type"], Q16_EXCL_TYPE_PREFIX)),
        )
        m = pc.and_(m, pc.is_in(
            b["p_size"],
            value_set=pa.array(Q16_SIZES, type=b["p_size"].type)))
        t = b.filter(m)
        pk = np.repeat(t["p_partkey"].to_numpy().astype(np.int64),
                       PS_PER_PART)
        k = np.tile(np.arange(PS_PER_PART, dtype=np.int64), t.num_rows)
        sk, _, _ = _ps_synth(pk, k, smin, n_supp)
        bad = ray.get(complaints_ref)
        pos = np.searchsorted(bad, sk)
        pos = np.minimum(pos, max(len(bad) - 1, 0))
        keep = ~((bad[pos] == sk) if len(bad)
                 else np.zeros(len(sk), bool))
        brand = np.repeat(np.asarray(t["p_brand"].to_pylist(),
                                     dtype=object), PS_PER_PART)[keep]
        ptype = np.repeat(np.asarray(t["p_type"].to_pylist(),
                                     dtype=object), PS_PER_PART)[keep]
        size = np.repeat(t["p_size"].to_numpy().astype(np.int64),
                         PS_PER_PART)[keep]
        sku = sk[keep]
        # distinct quads via per-column codes + one lexsort (the fold
        # pattern); brand/type are per-part attributes so the codes
        # dedup exactly
        _, bc = np.unique(brand, return_inverse=True)
        _, tc = np.unique(ptype, return_inverse=True)
        o = np.lexsort((sku, size, tc, bc))
        if len(o):
            kd = np.r_[True,
                       (bc[o][1:] != bc[o][:-1])
                       | (tc[o][1:] != tc[o][:-1])
                       | (size[o][1:] != size[o][:-1])
                       | (sku[o][1:] != sku[o][:-1])]
        else:
            kd = np.zeros(0, dtype=bool)
        sel = o[kd]
        # explicit schema: an all-filtered batch must not emit
        # null-typed empty string columns into the block union
        return pa.table({
            "p_brand": pa.array(brand[sel], type=pa.string()),
            "p_type": pa.array(ptype[sel], type=pa.string()),
            "p_size": pa.array(size[sel], type=pa.int64()),
            "supp": pa.array(sku[sel], type=pa.int64()),
            "spart": pa.array((sku[sel] % N_COPART).astype(np.int64)),
        })

    def count_fold(g: pa.Table) -> pa.Table:
        import zlib

        z = pa.array([], type=pa.int64())
        if g.num_rows == 0:
            return pa.table({"p_brand": pa.array([], type=pa.string()),
                             "p_type": pa.array([], type=pa.string()),
                             "p_size": z, "n": z, "bpart": z})
        brand = np.asarray(g["p_brand"].to_pylist(), dtype=object)
        ptype = np.asarray(g["p_type"].to_pylist(), dtype=object)
        size = g["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        supp = g["supp"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, bc = np.unique(brand, return_inverse=True)
        _, tc = np.unique(ptype, return_inverse=True)
        o = np.lexsort((supp, size, tc, bc))
        b_s, t_s, s_s, u_s = bc[o], tc[o], size[o], supp[o]
        keep = np.r_[True, (b_s[1:] != b_s[:-1]) | (t_s[1:] != t_s[:-1])
                     | (s_s[1:] != s_s[:-1]) | (u_s[1:] != u_s[:-1])]
        # distinct quads, then per-(brand, type, size) counts in the
        # same sorted order
        bg, tg, sg = b_s[keep], t_s[keep], s_s[keep]
        new = np.r_[True, (bg[1:] != bg[:-1]) | (tg[1:] != tg[:-1])
                    | (sg[1:] != sg[:-1])]
        starts = np.flatnonzero(new)
        n = np.diff(np.r_[starts, len(bg)]).astype(np.int64)
        sel = o[keep][starts]
        bsel = brand[sel]
        bpart = np.asarray(
            [zlib.crc32(s.encode()) % N_COPART for s in bsel],
            dtype=np.int64)
        return pa.table({"p_brand": pa.array(bsel, type=pa.string()),
                         "p_type": pa.array(ptype[sel],
                                            type=pa.string()),
                         "p_size": pa.array(size[sel]),
                         "n": pa.array(n),
                         "bpart": pa.array(bpart)})

    def final_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"p_brand": pa.array([], type=pa.string()),
                             "p_type": pa.array([], type=pa.string()),
                             "p_size": z, "supplier_cnt": z})
        brand = np.asarray(g["p_brand"].to_pylist(), dtype=object)
        ptype = np.asarray(g["p_type"].to_pylist(), dtype=object)
        size = g["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, bc = np.unique(brand, return_inverse=True)
        _, tc = np.unique(ptype, return_inverse=True)
        order = np.lexsort((size, tc, bc))
        b_s, t_s, s_s, n_s = bc[order], tc[order], size[order], n[order]
        new = np.r_[True, (b_s[1:] != b_s[:-1]) | (t_s[1:] != t_s[:-1])
                    | (s_s[1:] != s_s[:-1])]
        gid = np.cumsum(new) - 1
        tot = int_bincount(gid, n_s)
        sel = order[new]
        return pa.table({"p_brand": pa.array(brand[sel],
                                             type=pa.string()),
                         "p_type": pa.array(ptype[sel],
                                            type=pa.string()),
                         "p_size": pa.array(size[sel]),
                         "supplier_cnt": pa.array(tot)})

    return (
        part.map_batches(synth, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby("spart").map_groups(count_fold, batch_format="pyarrow")
        .groupby("bpart").map_groups(final_fold, batch_format="pyarrow")
        .sort(["p_brand", "p_type", "p_size"])
    )


def q2_min_cost_supplier(sf_dir: str):
    """TPC-H Q2 shape: for each part in the size subset, the CHEAPEST
    in-region supplier offer from the synthesized partsupp.  The
    correlated per-part MIN resolves inside one coarse partkey
    partition (q17's discipline): per part one lexsort by (key, cost,
    suppkey) and the run boundary IS the winner — deterministic even
    under cost ties (suppkey ASC), mirroring the oracle's row_number.
    Output streams one row per qualifying part."""
    import ray
    import ray.data as rd

    keys_ref = ray.put(_region_suppkeys(sf_dir, Q2_REGION))
    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_size"])
    smin, n_supp = _supp_key_scalars(sf_dir)

    def synth(b: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        sz = b["p_size"].to_numpy().astype(np.int64)
        pk0 = b["p_partkey"].to_numpy().astype(np.int64)[sz % Q2_SIZE_MOD == 0]
        p = np.repeat(pk0, PS_PER_PART)
        k = np.tile(np.arange(PS_PER_PART, dtype=np.int64), len(pk0))
        sk, _, cost = _ps_synth(p, k, smin, n_supp)
        pos = np.searchsorted(keys, sk)
        pos = np.minimum(pos, max(len(keys) - 1, 0))
        hit = (keys[pos] == sk) if len(keys) else np.zeros(len(sk), bool)
        return pa.table({
            "part": pa.array(_copart_tag(p[hit])),
            "key": pa.array(p[hit]),
            "sk": pa.array(sk[hit]),
            "cost": pa.array(cost[hit]),
        })

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"ps_partkey": z, "ps_suppkey": z,
                             "cost_cents": z})
        k = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = g["sk"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = g["cost"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((sk, c, k))
        k_s = k[order]
        first = np.r_[True, k_s[1:] != k_s[:-1]]
        return pa.table({
            "ps_partkey": pa.array(k_s[first]),
            "ps_suppkey": pa.array(sk[order][first]),
            "cost_cents": pa.array(c[order][first]),
        })

    return (
        part.map_batches(synth, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part").map_groups(fold, batch_format="pyarrow")
        .map_batches(
            lambda b: b.select(["ps_partkey", "ps_suppkey", "cost_cents"]),
            batch_format="pyarrow")
    )


def q9_product_profit(sf_dir: str):
    """TPC-H Q9 shape: profit by (supplier nation, order year) for the
    Q9_NAME_WORDS part subset — the heaviest join chain in the repo:
    lineitem x orders (orderkey) AND lineitem x partsupp (composite
    partkey|suppkey), both fact-sized, plus the supplier dimension.

    Plan: TWO chained co-partitions, each stage pre-combining so the
    second shuffle moves (pair, year) partials, not lineitems:
      stage A  hash(orderkey): attach the order year to every lineitem
               (sorted probe, orphans drop), pre-combine per
               (packed pk|sk, year) the rev_cents / qty_cents sums;
      stage B  hash(packed key): attach the synthesized ps_cost_cents
               (pairs outside the part subset drop — the name-filter
               semantics), probe s_nationkey from the broadcast
               supplier dimension, emit <= nations x years
               composite-code partials into a bounded final fold.
    Profit stays exact integers in 10^-4-dollar units:
    profit_x100_cents = 100 * rev_cents - cost_cents * qty_cents."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    supp_ds = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                              columns=["s_suppkey", "s_nationkey"])
    supp = _collect_columns(supp_ds, ["s_suppkey", "s_nationkey"])
    skeys_all = supp["s_suppkey"].astype(np.int64)
    if not len(skeys_all):
        raise ValueError("q9 synthesis needs >= 2 suppliers for unique "
                         "(part, supp) keys")
    # scalars derive from the collected dimension — no extra Ray jobs
    n_supp = len(skeys_all)
    smin = int(skeys_all.min())
    ssort = np.argsort(skeys_all)
    supp_ref = ray.put((skeys_all[ssort],
                        supp["s_nationkey"].astype(np.int64)[ssort]))

    def _row(part, key, c1, c2, c3, side):
        return pa.table({
            "part": pa.array(part), "key": pa.array(key),
            "c1": pa.array(c1), "c2": pa.array(c2), "c3": pa.array(c3),
            "side": pa.array(side),
        })

    # ---- stage A: orderkey copart (orders + lineitem) -------------------
    ord_ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])
    li_ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount", "l_quantity"],
    )

    def o_norm(b: pa.Table) -> pa.Table:
        key = b["o_orderkey"].to_numpy().astype(np.int64)
        yr = (b["o_orderdate"].to_numpy().astype("datetime64[Y]")
              .astype(np.int64) + 1970)
        z = np.zeros(b.num_rows, dtype=np.int64)
        return _row(_copart_tag(key), key, yr, z, z,
                    np.zeros(b.num_rows, dtype=np.int8))

    def l_norm(b: pa.Table) -> pa.Table:
        key = b["l_orderkey"].to_numpy().astype(np.int64)
        pk = b["l_partkey"].to_numpy().astype(np.int64)
        sk = b["l_suppkey"].to_numpy().astype(np.int64)
        assert (pk < (1 << 31)).all() and (sk < (1 << 32)).all()
        rev = _cents(b["l_extendedprice"].to_numpy()
                     * (1.0 - b["l_discount"].to_numpy()))
        qty = _cents(b["l_quantity"].to_numpy())
        return _row(_copart_tag(key), key, (pk << 32) | sk, rev, qty,
                    np.ones(b.num_rows, dtype=np.int8))

    stage_a = ord_ds.map_batches(
        o_norm, batch_format="pyarrow", zero_copy_batch=True
    ).union(li_ds.map_batches(
        l_norm, batch_format="pyarrow", zero_copy_batch=True
    ))

    def fold_a(g: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        empty = pa.table({
            "part": z, "key": z, "c1": z, "c2": z, "c3": z,
            "side": pa.array([], type=pa.int8()),
        })
        if g.num_rows == 0:
            return empty
        side = g["side"].to_numpy(zero_copy_only=False)
        om, lm = side == 0, side == 1
        if not om.any() or not lm.any():
            return empty
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        c1 = g["c1"].to_numpy(zero_copy_only=False).astype(np.int64)
        osort, ok_s, pos, hit = _sorted_key_attach(key[om], key[lm])
        yr = c1[om][osort][pos][hit]
        packed = c1[lm][hit]
        rev = g["c2"].to_numpy(
            zero_copy_only=False).astype(np.int64)[lm][hit]
        qty = g["c3"].to_numpy(
            zero_copy_only=False).astype(np.int64)[lm][hit]
        # pre-combine per (pair, year): one lexsort + run sums
        order = np.lexsort((yr, packed))
        p_s, y_s = packed[order], yr[order]
        new = np.r_[True, (p_s[1:] != p_s[:-1]) | (y_s[1:] != y_s[:-1])]
        run = np.cumsum(new) - 1
        n = int(run[-1]) + 1 if len(run) else 0
        rsum = np.zeros(n, dtype=np.int64)
        qsum = np.zeros(n, dtype=np.int64)
        np.add.at(rsum, run, rev[order])
        np.add.at(qsum, run, qty[order])
        kk, yy = p_s[new], y_s[new]
        return pa.table({
            "part": pa.array(_copart_tag(kk).astype(np.int64)),
            "key": pa.array(kk),
            "c1": pa.array(yy), "c2": pa.array(rsum),
            "c3": pa.array(qsum),
            "side": pa.array(np.ones(n, dtype=np.int8)),
        })

    pairs = stage_a.groupby("part").map_groups(fold_a,
                                               batch_format="pyarrow")

    # ---- stage B: composite-key copart (pairs + synthesized partsupp) ---
    part_ds = rd.read_parquet(f"{sf_dir}/part.parquet",
                              columns=["p_partkey", "p_name"])

    # Q9's fold probes lineitem pairs against a UNIQUE (part, supp) key;
    # the SQL mirror joins every matching partsupp row.  The synthesis
    # yields distinct suppkeys per part iff n_supp divides none of
    # 131*{1,2,3} — loud guard instead of a silent engine/SQL divergence.
    if n_supp > 1:
        assert all(PS_SUPP_B * d % n_supp != 0 for d in (1, 2, 3)), n_supp
    else:
        raise ValueError("q9 synthesis needs >= 2 suppliers for unique "
                         "(part, supp) keys")

    def ps_norm(b: pa.Table) -> pa.Table:
        first = pc.list_element(
            pc.split_pattern(b["p_name"], pattern=" "), 0)
        m = pc.is_in(first, value_set=pa.array(list(Q9_NAME_WORDS)))
        pk0 = b["p_partkey"].to_numpy().astype(np.int64)[
            m.to_numpy(zero_copy_only=False)]
        p = np.repeat(pk0, PS_PER_PART)
        k = np.tile(np.arange(PS_PER_PART, dtype=np.int64), len(pk0))
        sk, _, cost = _ps_synth(p, k, smin, n_supp)
        assert (p < (1 << 31)).all() and (sk < (1 << 32)).all()
        key = (p << 32) | sk
        z = np.zeros(len(key), dtype=np.int64)
        return _row(_copart_tag(key), key, cost, z, z,
                    np.zeros(len(key), dtype=np.int8))

    stage_b = part_ds.map_batches(
        ps_norm, batch_format="pyarrow", zero_copy_batch=True
    ).union(pairs)

    def fold_b(g: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        empty = pa.table({"code": z, "profit": z})
        if g.num_rows == 0:
            return empty
        side = g["side"].to_numpy(zero_copy_only=False)
        psm, prm = side == 0, side == 1
        if not psm.any() or not prm.any():
            return empty
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        c1 = g["c1"].to_numpy(zero_copy_only=False).astype(np.int64)
        osort, ok_s, pos, hit = _sorted_key_attach(key[psm], key[prm])
        cost = c1[psm][osort][pos][hit]
        yr = c1[prm][hit]
        rev = g["c2"].to_numpy(
            zero_copy_only=False).astype(np.int64)[prm][hit]
        qty = g["c3"].to_numpy(
            zero_copy_only=False).astype(np.int64)[prm][hit]
        sk = (key[prm][hit] & ((1 << 32) - 1)).astype(np.int64)
        skeys, snat = ray.get(supp_ref)
        if not len(skeys):
            return empty
        spos = np.searchsorted(skeys, sk)
        spos = np.minimum(spos, len(skeys) - 1)
        shit = skeys[spos] == sk
        profit = 100 * rev - cost * qty
        code = snat[spos][shit] * 10_000 + yr[shit]
        cu, ptot = _sum_by_key(code, profit[shit])
        return pa.table({"code": pa.array(cu), "profit": pa.array(ptot)})

    folded = (
        stage_b.groupby("part").map_groups(fold_b, batch_format="pyarrow")
        .groupby("code").aggregate(Sum("profit"))  # bounded: nations*years
        .take_all()
    )
    # bounded name attach
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_name"]).take_all()
    names = {int(r["n_nationkey"]): r["n_name"] for r in nat}
    by_code = {int(r["code"]): int(r["sum(profit)"]) for r in folded}
    # inner-JOIN-nation parity: a supplier nationkey absent from the
    # nation dimension DROPS (like every other join in this function)
    codes = sorted(c for c in by_code if c // 10_000 in names)
    return pa.table({
        "n_name": pa.array([names[c // 10_000] for c in codes],
                           type=pa.string()),
        "o_year": pa.array([c % 10_000 for c in codes], type=pa.int64()),
        "profit_x100_cents": pa.array([by_code[c] for c in codes],
                                      type=pa.int64()),
    })


Q4_QUARTER = ("1997-07-01", "1997-10-01")  # one populated quarter


def q4_order_priority(sf_dir: str):
    """TPC-H Q4 shape: per order priority, how many orders placed in
    one quarter have AT LEAST ONE late lineitem (commitdate <
    receiptdate) — the EXISTS semi-join counted per group.  The
    commit/receipt dates synthesize exactly as in Q12 (the same
    mirrored mod arithmetic — see q12_shipmode_priority; one
    definition would ideally be shared, but the two predicates filter
    different subsets so each norm inlines the same two lines, with
    the SQL twins likewise both derived from _q12_li_synth_sql).

    Plan: the orders scan filters the quarter and carries
    o_orderpriority; the lineitem scan keeps only late rows and
    pre-combines to DISTINCT orderkeys per batch; both co-partition by
    _copart_tag(orderkey); per part one sorted-membership probe marks
    existing orders and folds <= 5 (priority, n) partials into the
    bounded final sum."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    qstart = np.datetime64(Q4_QUARTER[0], "us").astype(np.int64)
    qend = np.datetime64(Q4_QUARTER[1], "us").astype(np.int64)
    ord_ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate",
                                      "o_orderpriority"])
    li_ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_linenumber",
                                     "l_shipdate"])

    def o_norm(b: pa.Table) -> pa.Table:
        d = b["o_orderdate"].cast(pa.int64()).to_numpy()
        keep = (d >= qstart) & (d < qend)
        return b.filter(pa.array(keep))

    def li_norm(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy().astype(np.int64)
        ln = b["l_linenumber"].to_numpy().astype(np.int64)
        ship = b["l_shipdate"].cast(pa.int64()).to_numpy()
        commit = ship + ((ok + ln * 7) % 45 - 10) * _DAY_US
        receipt = ship + ((ok * 2 + ln) % 30 + 1) * _DAY_US
        late = np.unique(ok[commit < receipt])  # per-batch pre-combine
        return pa.table({
            "l_orderkey": pa.array(late),
            "z": pa.array(np.zeros(len(late), dtype=np.int64)),
        })

    both = _copart_two_fact_union(
        ord_ds.map_batches(o_norm, batch_format="pyarrow",
                           zero_copy_batch=True),
        li_ds.map_batches(li_norm, batch_format="pyarrow",
                          zero_copy_batch=True),
        left_key="o_orderkey", left_t="o_orderdate",
        right_key="l_orderkey", right_t="z",
        left_extra=(("prio", "o_orderpriority"),),
    )

    def fold(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "o_orderpriority": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        side = g["side"].to_numpy(zero_copy_only=False)
        om, lm = side == 0, side == 1
        if not om.any() or not lm.any():
            return empty
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        late = np.unique(key[lm])
        okeys = key[om]
        idx = np.searchsorted(late, okeys)
        ex = (idx < len(late)) & (late[np.minimum(idx, len(late) - 1)]
                                  == okeys)
        prio = np.asarray(g["prio"].to_pylist(), dtype=object)[om][ex]
        if len(prio) == 0:
            return empty
        vals, counts = np.unique(prio.astype(str), return_counts=True)
        return pa.table({
            "o_orderpriority": pa.array(vals, type=pa.string()),
            "n": pa.array(counts.astype(np.int64)),
        })

    rows = (
        both.groupby("part").map_groups(fold, batch_format="pyarrow")
        .groupby("o_orderpriority").aggregate(Sum("n"))  # <= 5 keys
        .take_all()
    )
    rows.sort(key=lambda r: r["o_orderpriority"])
    return pa.table({
        "o_orderpriority": pa.array(
            [r["o_orderpriority"] for r in rows], type=pa.string()),
        "order_count": pa.array([int(r["sum(n)"]) for r in rows],
                                  type=pa.int64()),
    })


Q12_MODES = ("MAIL", "SHIP", "RAIL", "AIR")
Q12_CHECK_MODES = ("MAIL", "SHIP")
Q12_YEAR = ("1997-01-01", "1998-01-01")
Q12_HIGH_PRIOS = ("1-URGENT", "2-HIGH")
_DAY_US = 86_400_000_000


def q12_shipmode_priority(sf_dir: str):
    """TPC-H Q12 shape: late-vs-committed shipping discipline per ship
    mode.  The fixtures' lineitem has no shipmode/commitdate/receiptdate,
    so all three synthesize deterministically from (orderkey, linenumber)
    in mirrored mod arithmetic (the partsupp discipline):
      mode        = Q12_MODES[(ok*5 + ln*3) % 4]
      commitdate  = shipdate + ((ok + ln*7) % 45 - 10) days
      receiptdate = shipdate + ((ok*2 + ln) % 30 + 1) days
    Predicates (ship < commit < receipt, receipt in Q12_YEAR, mode in
    Q12_CHECK_MODES) filter INSIDE the lineitem norm — only qualifying
    rows enter the orderkey copart; the fold attaches o_orderpriority
    (sorted probe, orphans drop) and emits <= 4 (mode, high) count
    partials per part into the bounded final fold."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    start = np.datetime64(Q12_YEAR[0], "us").astype(np.int64)
    end = np.datetime64(Q12_YEAR[1], "us").astype(np.int64)
    ord_ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate",
                                      "o_orderpriority"])
    li_ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_linenumber",
                                     "l_shipdate"])
    check = [Q12_MODES.index(m) for m in Q12_CHECK_MODES]

    def li_norm(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy().astype(np.int64)
        ln = b["l_linenumber"].to_numpy().astype(np.int64)
        ship = b["l_shipdate"].cast(pa.int64()).to_numpy()
        mode = (ok * 5 + ln * 3) % 4
        commit = ship + ((ok + ln * 7) % 45 - 10) * _DAY_US
        receipt = ship + ((ok * 2 + ln) % 30 + 1) * _DAY_US
        keep = ((commit < receipt) & (ship < commit)
                & (receipt >= start) & (receipt < end)
                & np.isin(mode, check))
        return pa.table({
            "l_orderkey": pa.array(ok[keep]),
            "mode": pa.array(mode[keep]),
        })

    both = _copart_two_fact_union(
        ord_ds,
        li_ds.map_batches(li_norm, batch_format="pyarrow",
                          zero_copy_batch=True),
        left_key="o_orderkey", left_t="o_orderdate",
        right_key="l_orderkey", right_t="mode",
        left_extra=(("prio", "o_orderpriority"),),
    )

    def fold(g: pa.Table) -> pa.Table:
        z = pa.array([], type=pa.int64())
        empty = pa.table({"mode": z, "high": z, "n": z})
        if g.num_rows == 0:
            return empty
        side = g["side"].to_numpy(zero_copy_only=False)
        om, lm = side == 0, side == 1
        if not om.any() or not lm.any():
            return empty
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        osort, ok_s, pos, hit = _sorted_key_attach(key[om], key[lm])
        prio = np.asarray(g["prio"].to_pylist(),
                          dtype=object)[om][osort][pos][hit]
        mode = g["t"].to_numpy(
            zero_copy_only=False).astype(np.int64)[lm][hit]
        high = np.isin(prio, np.asarray(Q12_HIGH_PRIOS, dtype=object))
        code = mode * 2 + high.astype(np.int64)
        cu, n = _sum_by_key(code, np.ones(len(code), dtype=np.int64))
        return pa.table({"mode": pa.array(cu // 2),
                         "high": pa.array(cu % 2), "n": pa.array(n)})

    rows = (
        both.groupby("part").map_groups(fold, batch_format="pyarrow")
        .groupby(["mode", "high"]).aggregate(Sum("n"))  # <= 8 keys
        .take_all()
    )
    agg: dict[int, list[int]] = {}
    for r in rows:
        agg.setdefault(int(r["mode"]), [0, 0])[int(r["high"])] = int(
            r["sum(n)"])
    modes = sorted(agg)
    return pa.table({
        "l_shipmode": pa.array([Q12_MODES[m] for m in modes],
                               type=pa.string()),
        "high_line_count": pa.array([agg[m][1] for m in modes],
                                    type=pa.int64()),
        "low_line_count": pa.array([agg[m][0] for m in modes],
                                   type=pa.int64()),
    })


# --- column profiling (Deequ/dbt-style pre-flight) ----------------------------

# The fixtures are NULL-free, so the profiler plants NULLs
# deterministically (CASE-mirrored in the oracle) to keep the null
# accounting non-vacuous at every sf.
PROFILE_NULL_MOD_CK = 101  # o_custkey NULL where o_orderkey % 101 == 0
PROFILE_NULL_MOD_PR = 97   # o_orderpriority NULL where o_orderkey % 97 == 0
PROFILE_DISTINCT_PARTS = 32

# (col_id, name, kind): profiled columns of orders.  Numeric columns
# profile an integer VIEW — keys as-is, totalprice in floor(x*100+0.5)
# cents, orderdate in epoch-us — and format min/max as decimal strings;
# string columns compare bytewise (binary collation on both sides).
_PROFILE_COLS = (
    (0, "o_orderkey", "int"),
    (1, "o_custkey", "int"),
    (2, "o_orderstatus", "str"),
    (3, "o_totalprice", "cents"),
    (4, "o_orderdate", "ts"),
    (5, "o_orderpriority", "str"),
)


def profile_columns(sf_dir: str):
    """Per-column profile of orders: n_rows / n_null / EXACT n_distinct
    / min / max — the pre-flight audit a pipeline runs before trusting
    keys, join cardinalities or value ranges (corpus_validate's
    relational sibling).

    Plan: one full-width scan (reading every column is the point of a
    profiler) feeds two partial streams:
      counts — 6 tiny (col, n, n_null) rows per batch into a 6-key
        Ray-native aggregate;
      distinct — per-batch DISTINCT (col, value) pairs (the exact-
        profile cost: each distinct value ships once per batch), coarse
        value-hash partitions (vi % P numeric, crc32 % P strings — a
        value lives in exactly one part), each of the <= 6*P bounded
        groups reducing to one (col, n_distinct, min, max) row: min/max
        over a column == min/max over its distinct set.  The driver
        folds <= 6*P + 6 rows.
    At 10^12 rows exact distinct is the honest cost of an exact
    profile; the scale path for distinct counts alone is the HLL op
    (approx_distinct_users).  String distincts use dictionary_encode /
    pandas C hash tables (NOTES item 43), never object-array sorts."""
    import zlib

    import ray.data as rd
    from ray.data.aggregate import Sum

    P = PROFILE_DISTINCT_PARTS
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet")

    def _views(b: pa.Table):
        """Per column: (null mask, int view or None, string values or
        None) after the deterministic NULL plant."""
        okey = b["o_orderkey"].to_numpy().astype(np.int64)
        out = {}
        for cid, name, kind in _PROFILE_COLS:
            if name == "o_custkey":
                nulls = okey % PROFILE_NULL_MOD_CK == 0
            elif name == "o_orderpriority":
                nulls = okey % PROFILE_NULL_MOD_PR == 0
            else:
                nulls = np.zeros(len(okey), dtype=bool)
            if kind == "int":
                vi = b[name].to_numpy().astype(np.int64)
            elif kind == "cents":
                vi = _cents(b[name].to_numpy())
            elif kind == "ts":
                vi = b[name].to_numpy().astype("datetime64[us]").astype(
                    np.int64)
            else:
                out[cid] = (nulls, None, b[name])
                continue
            out[cid] = (nulls, vi, None)
        return out

    def counts(b: pa.Table) -> pa.Table:
        views = _views(b)
        n = b.num_rows
        return pa.table({
            "col": pa.array([cid for cid, _, _ in _PROFILE_COLS],
                            type=pa.int64()),
            "n": pa.array([n] * len(_PROFILE_COLS), type=pa.int64()),
            "n_null": pa.array(
                [int(views[cid][0].sum()) for cid, _, _ in _PROFILE_COLS],
                type=pa.int64()),
        })

    def distinct(b: pa.Table) -> pa.Table:
        views = _views(b)
        gpart, vs, vi = [], [], []
        for cid, _, kind in _PROFILE_COLS:
            nulls, iv, sv = views[cid]
            if iv is not None:
                u = np.unique(iv[~nulls])
                gpart.append(cid * P + (u % P))
                vs.append(u.astype("U21"))
                vi.append(u)
            else:
                u = pc.unique(pc.drop_null(
                    sv.filter(pa.array(~nulls)))).to_pylist()
                gpart.append(np.array(
                    [cid * P + zlib.crc32(s.encode()) % P for s in u],
                    dtype=np.int64))
                vs.append(np.array(u, dtype=object))
                vi.append(np.zeros(len(u), dtype=np.int64))
        return pa.table({
            "gpart": pa.array(np.concatenate(gpart), type=pa.int64()),
            "vs": pa.array(np.concatenate(vs).astype(object),
                           type=pa.string()),
            "vi": pa.array(np.concatenate(vi), type=pa.int64()),
        })

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            s = pa.array([], type=pa.string())
            return pa.table({"col": z, "nd": z, "mini": z, "maxi": z,
                             "mins": s, "maxs": s})
        # gpart carries the column id; values within one group belong
        # to exactly one column
        cid = int(g["gpart"][0].as_py()) // P
        kind = _PROFILE_COLS[cid][2]
        one = pa.array([cid], type=pa.int64())
        if kind == "str":
            u = np.unique(np.asarray(g["vs"].to_pylist(), dtype=object))
            return pa.table({
                "col": one, "nd": pa.array([len(u)], type=pa.int64()),
                "mini": pa.array([0], type=pa.int64()),
                "maxi": pa.array([0], type=pa.int64()),
                "mins": pa.array([u[0]], type=pa.string()),
                "maxs": pa.array([u[-1]], type=pa.string()),
            })
        vi = np.unique(g["vi"].to_numpy(zero_copy_only=False))
        return pa.table({
            "col": one, "nd": pa.array([len(vi)], type=pa.int64()),
            "mini": pa.array([int(vi.min())], type=pa.int64()),
            "maxi": pa.array([int(vi.max())], type=pa.int64()),
            "mins": pa.array([""], type=pa.string()),
            "maxs": pa.array([""], type=pa.string()),
        })

    cnt_rows = (
        ds.map_batches(counts, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("col").aggregate(Sum("n"), Sum("n_null"))  # 6 keys
        .take_all()
    )
    dis_rows = (
        ds.map_batches(distinct, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("gpart").map_groups(fold, batch_format="pyarrow")
        .take_all()  # bounded: <= 6 * PROFILE_DISTINCT_PARTS rows
    )

    by_col = {int(r["col"]): r for r in cnt_rows}
    prof: dict[int, dict] = {}
    for r in dis_rows:
        cid = int(r["col"])
        p = prof.setdefault(cid, {"nd": 0, "mini": None, "maxi": None,
                                  "mins": None, "maxs": None})
        p["nd"] += int(r["nd"])
        if _PROFILE_COLS[cid][2] == "str":
            s_lo, s_hi = r["mins"], r["maxs"]
            p["mins"] = s_lo if p["mins"] is None else min(p["mins"], s_lo)
            p["maxs"] = s_hi if p["maxs"] is None else max(p["maxs"], s_hi)
        else:
            lo, hi = int(r["mini"]), int(r["maxi"])
            p["mini"] = lo if p["mini"] is None else min(p["mini"], lo)
            p["maxi"] = hi if p["maxi"] is None else max(p["maxi"], hi)

    names, n_rows, n_null, n_distinct, min_s, max_s = [], [], [], [], [], []
    for cid, name, kind in _PROFILE_COLS:
        c = by_col[cid]
        p = prof.get(cid, {"nd": 0, "mini": None, "maxi": None,
                           "mins": None, "maxs": None})
        names.append(name)
        n_rows.append(int(c["sum(n)"]))
        n_null.append(int(c["sum(n_null)"]))
        n_distinct.append(p["nd"])
        if kind == "str":
            min_s.append(p["mins"])
            max_s.append(p["maxs"])
        else:
            min_s.append(None if p["mini"] is None else str(p["mini"]))
            max_s.append(None if p["maxi"] is None else str(p["maxi"]))
    return pa.table({
        "col": pa.array(names, type=pa.string()),
        "n_rows": pa.array(n_rows, type=pa.int64()),
        "n_null": pa.array(n_null, type=pa.int64()),
        "n_distinct": pa.array(n_distinct, type=pa.int64()),
        "min_s": pa.array(min_s, type=pa.string()),
        "max_s": pa.array(max_s, type=pa.string()),
    })


# ---------------------------------------------------------------------------
# exact global rank / NTILE via ordered range partitions (no global sort)

NTILE_BUCKETS = 10
# range part = cents // RANK_RANGE_STEP: ordered, disjoint value
# intervals, so per-part local ranks + the exclusive prefix of part
# counts compose the EXACT global rank.  2^20 cents (~$10.5k) over the
# fixtures' ~$500k price ceiling gives ~48 parts — bounded by the VALUE
# range, not the row count.  In production the split points would come
# from a quantile sketch (cf. sampled_quantiles) to equalize part sizes
# under skew; a fixed step keeps this deterministic.
RANK_RANGE_STEP = 1 << 20


def price_rank_ntile(sf_dir: str):
    """Every order's exact global price rank and NTILE decile — the
    equi-depth bucketing a curation pipeline uses to stratify by a
    corpus-relative value instead of absolute thresholds, over a column
    whose value cardinality ~ row count (where length_rank_transform's
    bounded-histogram broadcast cannot work).

    The classic global-sort query WITHOUT a global sort: rows partition
    by ordered value RANGE (equal keys share a part; parts are disjoint
    intervals), a bounded (part, count) fold prefix-sums on the driver
    into per-part exclusive offsets, and each part independently
    lexsorts (cents, orderkey) — global_rank = part offset + local
    rank.  NTILE follows from the rank in closed form (first n % B
    buckets get one extra row).  Only the bounded count fold and the
    offsets broadcast leave the parts; no all-to-all sort exchange."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_totalprice"])

    def tag(b: pa.Table) -> pa.Table:
        cents = _cents(b["o_totalprice"].to_numpy())
        return pa.table({
            "o_orderkey": b["o_orderkey"].cast(pa.int64()),
            "cents": pa.array(cents),
            "rpart": pa.array(cents // RANK_RANGE_STEP),
        })

    tagged = ds.map_batches(tag, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    def count_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"rpart": z, "c": z})
        ku, tot = _sum_by_key(b["rpart"].to_numpy().astype(np.int64),
                              np.ones(b.num_rows, dtype=np.int64))
        return pa.table({"rpart": pa.array(ku), "c": pa.array(tot)})

    rows = tagged.map_batches(count_partial, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
    pk = np.asarray([r["rpart"] for r in rows], dtype=np.int64)
    pc_ = np.asarray([r["c"] for r in rows], dtype=np.int64)
    ku, tot = _sum_by_key(pk, pc_)  # ku sorted ascending (np.unique)
    offsets = dict(zip(
        ku.tolist(),
        np.concatenate(([0], np.cumsum(tot)[:-1])).tolist(),
    ))
    n_total = int(tot.sum())
    q, r = divmod(n_total, NTILE_BUCKETS)
    ref = ray.put(offsets)

    def rank_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"o_orderkey": z, "cents": z,
                             "rnk": z, "tile": z})
        off = ray.get(ref)[int(g["rpart"][0].as_py())]
        keys = g["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = g["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((keys, cents))
        n = len(keys)
        rnk = np.empty(n, dtype=np.int64)
        rnk[o] = off + np.arange(n, dtype=np.int64)
        cut = r * (q + 1)
        tile = np.where(rnk < cut, rnk // (q + 1),
                        r + (rnk - cut) // max(q, 1))
        return pa.table({"o_orderkey": pa.array(keys),
                         "cents": pa.array(cents),
                         "rnk": pa.array(rnk),
                         "tile": pa.array(tile.astype(np.int64))})

    return tagged.groupby("rpart").map_groups(rank_fold,
                                              batch_format="pyarrow")


def _skyline_2d(cents: np.ndarray, ts: np.ndarray) -> np.ndarray:
    """Indices of the 2D Pareto frontier maximizing (cents, ts).

    Dominance is strict-somewhere: x dominates o iff x.cents >= o.cents
    AND x.ts >= o.ts AND (x.cents > o.cents OR x.ts > o.ts) — exact
    duplicates never dominate each other, so all copies of a frontier
    point survive (the SQL NOT EXISTS mirror keeps them too).
    Vectorized: sort by (cents DESC, ts DESC), group rows by distinct
    cents; a row survives iff its ts equals its group's max AND that
    max strictly exceeds the running max over all strictly-greater-cents
    groups."""
    if len(cents) == 0:
        return np.zeros(0, dtype=np.int64)
    o = np.lexsort((-ts, -cents))
    cs, dy = cents[o], ts[o]
    new_grp = np.r_[True, cs[1:] != cs[:-1]]
    gidx = np.cumsum(new_grp) - 1
    gmax = dy[np.flatnonzero(new_grp)]  # ts DESC within a cents group
    prev = np.r_[np.iinfo(np.int64).min,
                 np.maximum.accumulate(gmax)[:-1]]
    keep = (gmax[gidx] > prev[gidx]) & (dy == gmax[gidx])
    return o[keep]


def pareto_orders(sf_dir: str):
    """The Pareto frontier of orders maximizing (price, recency) — the
    multi-objective dominance (skyline) query shape: an order is on the
    frontier iff no other order is at least as expensive AND at least
    as recent with one strict improvement.  Exact integers both sides:
    price in IEEE cents, recency as epoch microseconds.

    Physical plan: dominance is global but SUBSET-STABLE — a point
    dominated anywhere is dominated by a point that survives every
    local skyline containing it, so per-batch local skylines lose no
    frontier point; the bounded union re-runs the SAME kernel on the
    driver.  The 2D frontier is bounded by the value cardinality of one
    axis (here #distinct order dates, ~2.4k over TPC-H's 7-year span)
    and local skylines of near-random data are far smaller (O(log n)
    expected), so the driver merge is tiny at any corpus size; at 100 TB
    the plan is one streaming scan + a KB-scale fold."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderdate"],
    )

    def local_sky(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "o_orderkey": pa.array([], type=pa.int64()),
            "cents": pa.array([], type=pa.int64()),
            "ts_us": pa.array([], type=pa.int64()),
        })
        if b.num_rows == 0:
            return empty
        key = b["o_orderkey"].to_numpy().astype(np.int64)
        cents = _cents(b["o_totalprice"].to_numpy())
        ts = b["o_orderdate"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        k = _skyline_2d(cents, ts)
        return pa.table({
            "o_orderkey": pa.array(key[k]),
            "cents": pa.array(cents[k]),
            "ts_us": pa.array(ts[k]),
        })

    cands = ds.map_batches(
        local_sky, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # bounded: <= #distinct dates per block survive
    key = np.asarray([c["o_orderkey"] for c in cands], dtype=np.int64)
    cents = np.asarray([c["cents"] for c in cands], dtype=np.int64)
    ts = np.asarray([c["ts_us"] for c in cands], dtype=np.int64)
    k = _skyline_2d(cents, ts)
    o = np.argsort(key[k], kind="stable")
    k = k[o]
    return pa.table({
        "o_orderkey": pa.array(key[k]),
        "cents": pa.array(cents[k]),
        "ts_us": pa.array(ts[k]),
    })


ROLLING_DAU_WINDOW = 7  # trailing-window width in utc days


def rolling_active_users(sf_dir: str):
    """Trailing-7-day active users for EVERY utc day in the observed
    span — the rolling-DAU curve growth dashboards plot.  A sliding
    COUNT(DISTINCT) is the classic hard distributed window: the naive
    form re-counts a 7-day self-join per day.  Here it is exact with
    ONE pass and a bounded fold via interval-coverage deltas: a user
    contributes to day d iff they have activity in [d-6, d], i.e. their
    coverage is the union of [day, day+W-1] over their distinct
    activity days — merged intervals per user emit just (+1 at start,
    -1 past end) delta rows, and the global prefix sum over days IS the
    distinct count (a user's merged intervals never overlap, so they
    never double-count).

    Physical plan: per-batch DISTINCT (user, day) partials hash into
    the shared coarse user partitions (a user lives in one part, so
    per-part interval merging is globally exact); per part ONE lexsort
    + run-boundary pass merges intervals (gap > W starts a new one —
    gap == W is adjacent coverage and merges freely: the split deltas
    would cancel) and bincounts deltas per day; <= 2 * span day-delta
    rows per part plus two span-marker rows reach the driver, which
    prefix-sums <= span values.  At 10^12 events the shuffle payload is
    distinct (user, day) int64 pairs and the driver fold is bounded by
    the calendar, not the corpus.  The day bucket FLOORS (the
    retention_cohorts contract)."""
    import ray.data as rd

    from prlib_ray.stages.reassemble import N_REASSEMBLE_PARTS

    W = ROLLING_DAU_WINDOW
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], type=pa.int64()),
                "day": pa.array([], type=pa.int64()),
                "part": pa.array([], type=pa.int64()),
            })
        u = b["user_id"].to_numpy().astype(np.int64)
        day = np.floor_divide(
            b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
            _DAY_US)
        pair = np.unique(np.stack([u, day], axis=1), axis=0)
        return pa.table({
            "user_id": pa.array(pair[:, 0]),
            "day": pa.array(pair[:, 1]),
            "part": pa.array(pair[:, 0] % N_REASSEMBLE_PARTS),
        })

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"day": z, "delta": z, "kind": z})
        u = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = g["day"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((d, u))
        u, d = u[o], d[o]
        # cross-batch duplicate (user, day) pairs collapse here (a user
        # lives in exactly one part, so this distinct is globally exact)
        keep = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1])]
        u, d = u[keep], d[keep]
        # merged coverage intervals: new one at a user boundary or a
        # gap > W (gap == W is adjacent coverage: [d, d+W-1], [d+W, ...])
        new = np.r_[True, (u[1:] != u[:-1]) | (d[1:] - d[:-1] > W)]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(d)] - 1
        s_day = d[starts]                # +1 at interval start
        e_day = d[ends] + W              # -1 one past interval end
        lo, hi = int(d.min()), int(d.max())
        base = lo
        width = (hi + W) - base + 1
        deltas = np.zeros(width, dtype=np.int64)
        np.add.at(deltas, s_day - base, 1)
        np.add.at(deltas, e_day - base, -1)
        nz = np.flatnonzero(deltas)
        return pa.table({
            "day": pa.array(np.r_[base + nz, lo, hi]),
            "delta": pa.array(np.r_[deltas[nz], 0, 0]),
            "kind": pa.array(np.r_[np.zeros(len(nz), dtype=np.int64),
                                   1, 2]),
        })

    rows = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .take_all()  # bounded: <= (2*span + 2) rows per part
    )
    empty_out = pa.table({"day": pa.array([], type=pa.int64()),
                          "n_active": pa.array([], type=pa.int64())})
    if not rows:
        return empty_out  # no events at all: the oracle is empty too
    day = np.asarray([r["day"] for r in rows], dtype=np.int64)
    delta = np.asarray([r["delta"] for r in rows], dtype=np.int64)
    kind = np.asarray([r["kind"] for r in rows], dtype=np.int64)
    lo = int(day[kind == 1].min())
    hi = int(day[kind == 2].max())
    width = (hi + W) - lo + 1
    acc = np.zeros(width, dtype=np.int64)
    m = kind == 0
    np.add.at(acc, day[m] - lo, delta[m])
    curve = np.cumsum(acc)[: hi - lo + 1]  # report observed days only
    return pa.table({
        "day": pa.array(lo + np.arange(hi - lo + 1, dtype=np.int64)),
        "n_active": pa.array(curve),
    })


# Drift-audit constants: equal-width integer bins over price CENTS
# (floor(x*100+0.5) — the repo's exact-cents convention), halves split
# at a fixed date (fixture dates span 1995..2001, so 1998-01-01 puts
# mass on both sides at every sf).
DRIFT_BINS = 10
DRIFT_SPLIT_DATE = "1998-01-01"


def column_drift_tvd(sf_dir: str):
    """Distribution-drift audit (the Evidently/Deequ-style check a
    training pipeline runs between snapshot halves): per equal-width
    bin of o_totalprice cents, row counts and permille shares for the
    before/after halves of DRIFT_SPLIT_DATE plus the absolute permille
    gap — total variation distance = sum(abs_diff_permille) / 2, all
    exact integers (floor shares; no floats anywhere).

    Plan: pass 1 is a pruned Min/Max aggregate on the cents column
    (aggregate-then-broadcast, the grayWorld pattern); pass 2 emits
    per-batch (bin, side) bincount partials — 2 x DRIFT_BINS int64 per
    batch, a calendar-bounded driver merge (the user_stickiness
    discipline).  Two streaming scans, no shuffle at all."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min

    day_split = np.datetime64(DRIFT_SPLIT_DATE, "us").astype(np.int64)

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_totalprice", "o_orderdate"],
    )

    def cents(b: pa.Table) -> pa.Table:
        c = np.floor(
            b["o_totalprice"].to_numpy() * 100 + 0.5
        ).astype(np.int64)
        d = b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({"c": pa.array(c), "d": d})

    cds = ds.map_batches(
        cents, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    agg = cds.aggregate(Min("c"), Max("c"))
    lo, hi = int(agg["min(c)"]), int(agg["max(c)"])
    span = hi - lo + 1

    def partial(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy()
        side = (b["d"].to_numpy() >= day_split).astype(np.int64)
        bins = np.minimum((c - lo) * DRIFT_BINS // span, DRIFT_BINS - 1)
        nb = np.bincount(bins[side == 0], minlength=DRIFT_BINS)
        na = np.bincount(bins[side == 1], minlength=DRIFT_BINS)
        return pa.table({
            "bin": pa.array(np.arange(DRIFT_BINS, dtype=np.int64)),
            "nb": pa.array(nb.astype(np.int64)),
            "na": pa.array(na.astype(np.int64)),
        })

    nb = np.zeros(DRIFT_BINS, dtype=np.int64)
    na = np.zeros(DRIFT_BINS, dtype=np.int64)
    for part in cds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        k = part["bin"].to_numpy()
        np.add.at(nb, k, part["nb"].to_numpy())
        np.add.at(na, k, part["na"].to_numpy())
    tb, ta = max(int(nb.sum()), 1), max(int(na.sum()), 1)
    sb = 1000 * nb // tb
    sa = 1000 * na // ta
    return pa.table({
        "bin": pa.array(np.arange(DRIFT_BINS, dtype=np.int64)),
        "n_before": pa.array(nb),
        "n_after": pa.array(na),
        "share_before_permille": pa.array(sb),
        "share_after_permille": pa.array(sa),
        "abs_diff_permille": pa.array(np.abs(sb - sa)),
    })
