"""DuckDB oracles for the reassembly family (events-table deskew ops) and
the relational core.  Money sums use the identical
``floor(x * 100 + 0.5)`` cents expression as the Ray side, making every
aggregate an exact int64."""

from __future__ import annotations

REASSEMBLE_EVENTS = """
SELECT user_id, event_id,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
FROM events ORDER BY user_id, event_id"""

_DIR_CTE = """
flags AS (
    SELECT user_id, event_id, ts,
           CASE WHEN ts >= lag(ts) OVER w THEN 1 ELSE 0 END AS incflag,
           CASE WHEN lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS firstflag
    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
),
dirs AS (
    SELECT user_id,
           CASE WHEN sum(CASE WHEN firstflag = 0 THEN incflag ELSE 0 END) * 2
                     >= sum(1 - firstflag)
                THEN 1 ELSE -1 END AS direction
    FROM flags GROUP BY user_id
)"""

FIND_ANGLE_EVENTS = f"""
WITH {_DIR_CTE}
SELECT user_id, CAST(direction AS BIGINT) AS direction FROM dirs ORDER BY user_id"""

FIND_ORIENTATION_EVENTS = """
SELECT user_id,
       CAST(CASE WHEN arg_min(ts, event_id) > arg_max(ts, event_id)
            THEN 180 ELSE 0 END AS BIGINT) AS orientation
FROM events GROUP BY user_id ORDER BY user_id"""

ROTATE_EVENTS = """
WITH o AS (
    SELECT user_id, event_id,
           row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
           count(*) OVER (PARTITION BY user_id) AS n,
           first_value(ts) OVER (PARTITION BY user_id ORDER BY event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS fts,
           last_value(ts) OVER (PARTITION BY user_id ORDER BY event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lts
    FROM events
)
SELECT user_id, event_id,
       CASE WHEN fts > lts THEN n - rn + 1 ELSE rn END AS seq
FROM o ORDER BY user_id, event_id"""

DESKEW_EVENTS = f"""
WITH {_DIR_CTE},
ranked AS (
    SELECT user_id, event_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
           count(*) OVER (PARTITION BY user_id) AS n
    FROM events
)
SELECT r.user_id, r.event_id,
       CASE WHEN d.direction = 1 THEN r.rn ELSE r.n - r.rn + 1 END AS seq
FROM ranked r JOIN dirs d ON r.user_id = d.user_id
ORDER BY r.user_id, r.event_id"""

_CENTS = "CAST(floor({expr} * 100 + 0.5) AS BIGINT)"

Q1 = f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum({_CENTS.format(expr='l_quantity')}) AS BIGINT) AS sum_qty_cents,
       CAST(sum({_CENTS.format(expr='l_extendedprice')}) AS BIGINT) AS sum_base_cents,
       CAST(sum({_CENTS.format(expr='l_extendedprice * (1.0 - l_discount)')}) AS BIGINT) AS sum_disc_cents,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1996-01-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""

Q3 = f"""
SELECT l.l_orderkey,
       CAST(sum({_CENTS.format(expr='l.l_extendedprice * (1.0 - l.l_discount)')}) AS BIGINT) AS revenue_cents,
       o.o_orderdate
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1996-01-01'
  AND l.l_shipdate > TIMESTAMP '1996-01-01'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue_cents DESC, l.l_orderkey
LIMIT 10"""

Q5 = f"""
SELECT n.n_name,
       CAST(sum({_CENTS.format(expr='l.l_extendedprice * (1.0 - l.l_discount)')}) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE c.c_nationkey = s.s_nationkey
GROUP BY n.n_name ORDER BY n.n_name"""

Q6 = f"""
SELECT CAST(sum({_CENTS.format(expr='l_extendedprice * l_discount')}) AS BIGINT) AS revenue_cents,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24"""

ORDERS_BY_SEGMENT = f"""
SELECT c.c_mktsegment,
       CAST(sum({_CENTS.format(expr='o.o_totalprice')}) AS BIGINT) AS sum_total_cents,
       count(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"""

TOP_ORDERS = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"""

DISTINCT_EVENT_TYPES = """
SELECT event_type, count(*) AS n FROM events GROUP BY event_type
ORDER BY event_type"""

EVENTS_HOURLY = f"""
SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
       CAST(sum({_CENTS.format(expr='value')}) AS BIGINT) AS sum_value_cents,
       count(*) AS n_events
FROM events GROUP BY event_type, hour ORDER BY event_type, hour"""

SESSIONIZE = """
WITH d AS (
    SELECT user_id,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS brk
    FROM events
)
SELECT user_id, CAST(1 + sum(brk) AS BIGINT) AS n_sessions
FROM d GROUP BY user_id ORDER BY user_id"""

# mirrors relational.rolling_event_window: trailing-hour RANGE window
# per user (equal-ts peers included — the searchsorted side='right'
# bound); the value sum is exact int cents via the shared IEEE
# floor(value*100 + 0.5) quantization
ROLLING_EVENT_WINDOW = """
SELECT event_id,
       CAST(count(*) OVER w AS BIGINT) AS trailing_count,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w
            AS BIGINT) AS trailing_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY event_id"""

# mirrors relational.sales_rollup: GROUPING SETS over (segment, nation)
# with '(all)' coalesce at the rolled-up grains
SALES_ROLLUP = """
SELECT coalesce(c.c_mktsegment, '(all)') AS seg,
       coalesce(n.n_name, '(all)') AS nation,
       CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS cents
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY GROUPING SETS ((c.c_mktsegment), (n.n_name),
                        (c.c_mktsegment, n.n_name), ())
ORDER BY seg, nation"""

# mirrors relational.sampled_quantiles: deterministic ~5% md5-threshold
# sample, then segment_price_quantiles' exact rank convention per type
SAMPLED_QUANTILES = """
WITH s AS (
    SELECT event_type,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           event_id
    FROM events
    WHERE substr(md5('squant:' || CAST(event_id AS VARCHAR)), 1, 2) < '0d'
),
t AS (
    SELECT event_type, cents,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY cents, event_id) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM s
)
SELECT event_type,
       CAST(max(CASE WHEN rn = 1 + (50 * (n - 1)) // 100 THEN cents END)
            AS BIGINT) AS p50_cents,
       CAST(max(CASE WHEN rn = 1 + (90 * (n - 1)) // 100 THEN cents END)
            AS BIGINT) AS p90_cents,
       CAST(max(n) AS BIGINT) AS n_sample
FROM t GROUP BY event_type ORDER BY event_type"""

# mirrors relational.event_transitions: adjacent (prev, next) type
# pairs within one user's (ts, event_id)-ordered stream
EVENT_TRANSITIONS = """
WITH s AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
    FROM events
)
SELECT prev, event_type, CAST(count(*) AS BIGINT) AS n
FROM s WHERE prev IS NOT NULL
GROUP BY prev, event_type ORDER BY prev, event_type"""

ASOF_LATEST_ORDER = """
SELECT e.event_id,
       coalesce((SELECT o.o_orderkey FROM orders o
                 WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
                 ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1),
                -1) AS latest_orderkey
FROM events e ORDER BY e.event_id"""


TOP_ORDERS_PER_SEGMENT = """
SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
QUALIFY row_number() OVER (PARTITION BY c.c_mktsegment
                           ORDER BY o.o_totalprice DESC, o.o_orderkey ASC) <= 3
ORDER BY c.c_mktsegment, o.o_totalprice DESC, o.o_orderkey"""

RANGE_JOIN_RECENT_ORDERS = """
SELECT e.event_id,
       CAST(count(o.o_orderdate) AS BIGINT) AS n_recent_orders
FROM events e LEFT JOIN orders o
  ON o.o_custkey = e.user_id
 AND o.o_orderdate <= e.ts
 AND o.o_orderdate >= e.ts - INTERVAL 7 DAY
GROUP BY e.event_id ORDER BY e.event_id"""

SET_OPS_USERS_CUSTOMERS = """
WITH u AS (SELECT DISTINCT user_id FROM events),
c AS (SELECT DISTINCT c_custkey FROM customer)
SELECT CAST((SELECT count(*) FROM u JOIN c ON u.user_id = c.c_custkey) AS BIGINT)
           AS n_intersect,
       CAST((SELECT count(*) FROM u
             WHERE user_id NOT IN (SELECT c_custkey FROM c)) AS BIGINT)
           AS n_users_only,
       CAST((SELECT count(*) FROM c
             WHERE c_custkey NOT IN (SELECT user_id FROM u)) AS BIGINT)
           AS n_customers_only"""


EVENTS_HOPPING = f"""
WITH t AS (
    SELECT event_type, epoch_us(ts) AS us, value FROM events
),
w AS (
    SELECT event_type, (us // 1800000000) * 1800000000 AS ws, value FROM t
    UNION ALL
    SELECT event_type, (us // 1800000000) * 1800000000 - 1800000000 AS ws, value
    FROM t
)
SELECT event_type, CAST(ws AS BIGINT) AS win_start,
       CAST(sum({_CENTS.format(expr='value')}) AS BIGINT) AS sum_value_cents,
       count(*) AS n_events
FROM w GROUP BY event_type, ws ORDER BY event_type, ws"""

EVENTS_LATE_WATERMARK = """
WITH w AS (
    SELECT event_type, ts,
           max(ts) OVER (PARTITION BY event_type ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
    FROM events
)
SELECT event_type,
       CAST(count(*) FILTER (WHERE wm IS NOT NULL
                             AND ts < wm - INTERVAL 10 MINUTE) AS BIGINT) AS n_late,
       count(*) AS n_events
FROM w GROUP BY event_type ORDER BY event_type"""


# mirrors relational.split_assign_counts: two-hex-char lexicographic
# compare on lowercase md5 == numeric compare on the first hash byte
SPLIT_ASSIGN = """
SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'fa' THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'fd' THEN 'val'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1 ORDER BY split"""

CUSTOMERS_WITHOUT_ORDERS = """
SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_no_order
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"""

# exact grouped quantiles with the Ray side's index rule: value at
# 0-based sorted index (q*(n-1))//100, ties broken by orderkey
SEGMENT_PRICE_QUANTILES = f"""
WITH base AS (
    SELECT c.c_mktsegment AS seg,
           {_CENTS.format(expr='o.o_totalprice')} AS cents,
           o.o_orderkey AS ok
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
t AS (
    SELECT seg, cents,
           row_number() OVER (PARTITION BY seg ORDER BY cents, ok) AS rn,
           count(*) OVER (PARTITION BY seg) AS n
    FROM base
)
SELECT seg AS c_mktsegment,
       CAST(max(CASE WHEN rn = 1 + (50 * (n - 1)) // 100 THEN cents END)
            AS BIGINT) AS p50_cents,
       CAST(max(CASE WHEN rn = 1 + (90 * (n - 1)) // 100 THEN cents END)
            AS BIGINT) AS p90_cents,
       CAST(max(n) AS BIGINT) AS n_orders
FROM t GROUP BY seg ORDER BY seg"""


# mirrors relational.key_skew_profile: floor(log2(count)) == the binary
# digit count minus one (exact integer arithmetic on both sides)
KEY_SKEW_PROFILE = """
WITH g AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
SELECT CAST(length(format('{:b}', n)) - 1 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(n) AS BIGINT) AS n_rows
FROM g GROUP BY 1 ORDER BY bucket"""


# mirrors relational.hot_keys: n DESC, user_id ASC — the same total
# order the per-part local top-K + driver merge selects under
HOT_KEYS = """
WITH g AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
SELECT user_id, CAST(n AS BIGINT) AS n_rows
FROM g ORDER BY n DESC, user_id LIMIT 10"""


# mirrors relational.props_field_stats: the SAME RE2 pattern via
# regexp_extract (NOT a json path — the oracle must mirror the engine's
# extraction semantics exactly); regexp_extract yields '' on no match
# and TRY_CAST('') is NULL, so n_with_k / sum / min / max see only
# parsable rows, like the engine's validity mask
PROPS_FIELD_STATS = r"""
WITH x AS (
    SELECT coalesce(event_type, '') AS event_type,
           TRY_CAST(regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1)
                    AS BIGINT) AS k
    FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(k) AS BIGINT) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k
FROM x GROUP BY event_type ORDER BY event_type"""


# mirrors relational.funnel_conversion: earliest-event chaining with
# strict ts ordering (t1 = first view; t2 = first click AFTER t1;
# t3 = first purchase AFTER t2); the count rows use the same 1-based
# stage numbers and stage names as the engine's bounded output
FUNNEL_CONVERSION = """
WITH t1 AS (
    SELECT user_id, min(ts) AS ts1 FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
t2 AS (
    SELECT e.user_id, min(e.ts) AS ts2
    FROM events e JOIN t1 ON e.user_id = t1.user_id
    WHERE e.event_type = 'click' AND e.ts > t1.ts1 GROUP BY e.user_id
),
t3 AS (
    SELECT e.user_id, min(e.ts) AS ts3
    FROM events e JOIN t2 ON e.user_id = t2.user_id
    WHERE e.event_type = 'purchase' AND e.ts > t2.ts2 GROUP BY e.user_id
)
SELECT * FROM (VALUES
    (CAST(1 AS BIGINT), 'view', (SELECT CAST(count(*) AS BIGINT) FROM t1)),
    (CAST(2 AS BIGINT), 'click', (SELECT CAST(count(*) AS BIGINT) FROM t2)),
    (CAST(3 AS BIGINT), 'purchase', (SELECT CAST(count(*) AS BIGINT) FROM t3))
) AS v(stage, event_type, n_users)
ORDER BY stage"""


# mirrors relational.retention_cohorts: cohort = first active utc day;
# day_offset rows count the cohort's users active exactly that many
# days later (offset 0 = cohort size).  The day bucket FLOORS like
# numpy // (DuckDB integer // truncates toward zero, which diverges on
# pre-1970 negative epochs): floor of a double quotient is exact here
# since |epoch_us| < 2^53 through year ~2255 and the quotient's
# distance to an integer (>= 1/86400000000) exceeds rounding error
RETENTION_COHORTS = """
WITH ud AS (
    SELECT DISTINCT user_id,
           CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0)
                AS BIGINT) AS day
    FROM events
),
coh AS (SELECT user_id, min(day) AS cohort FROM ud GROUP BY user_id)
SELECT c.cohort AS cohort_day, CAST(o.off AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM coh c
JOIN (VALUES (0), (1), (3), (7)) o(off) ON true
JOIN ud ON ud.user_id = c.user_id AND ud.day = c.cohort + o.off
GROUP BY 1, 2
ORDER BY 1, 2"""


def _bloom_semi_join_sql() -> str:
    """Exact mirror of relational.bloom_semi_join: same md5 double-hash
    positions (big-endian read of md5_number_upper via the byteswap), the
    same m = next_pow2(BLOOM_BITS_PER_KEY * n_keys) >= 64 computed from
    count(*) (1 << bit_length, with bit_length as the binary-format
    length), and the all-K-positions-matched pass rule.  Constants
    interpolate from the implementation module so a knob change cannot
    silently desynchronize the mirror."""
    from prlib_ray.oracles_data import _byteswap8
    from prlib_ray.relational import (
        BLOOM_BITS_PER_KEY, BLOOM_K, BLOOM_SEGMENT,
    )

    js = ", ".join(f"({j})" for j in range(BLOOM_K))
    h1b = _byteswap8("md5_number_upper('bf1:' || CAST(bk.k AS VARCHAR))")
    h2b = _byteswap8("md5_number_upper('bf2:' || CAST(bk.k AS VARCHAR))")
    h1o = _byteswap8("md5_number_upper('bf1:' || CAST(o.o_custkey AS VARCHAR))")
    h2o = _byteswap8("md5_number_upper('bf2:' || CAST(o.o_custkey AS VARCHAR))")
    return f"""
WITH bk AS (
    SELECT c_custkey AS k FROM customer WHERE c_mktsegment = '{BLOOM_SEGMENT}'
),
mm AS (
    SELECT 1::HUGEINT << length(format('{{:b}}',
           greatest({BLOOM_BITS_PER_KEY} * count(*) - 1, 63))) AS m
    FROM bk
),
js(j) AS (VALUES {js}),
pos AS (
    SELECT DISTINCT ({h1b} % m + j * ({h2b} % m)) % m AS p
    FROM bk CROSS JOIN mm CROSS JOIN js
),
probe AS (
    SELECT o.o_orderkey, ({h1o} % m + j * ({h2o} % m)) % m AS p
    FROM orders o CROSS JOIN mm CROSS JOIN js
),
passed AS (
    SELECT probe.o_orderkey
    FROM probe LEFT JOIN pos ON pos.p = probe.p
    GROUP BY probe.o_orderkey HAVING count(pos.p) = {BLOOM_K}
)
SELECT o.o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(*) FILTER (WHERE o.o_orderkey IN
            (SELECT o_orderkey FROM passed)) AS BIGINT) AS n_pass,
       CAST(count(*) FILTER (WHERE o.o_orderkey IN
            (SELECT o_orderkey FROM passed)
            AND o.o_custkey IN (SELECT k FROM bk)) AS BIGINT) AS n_true
FROM orders o GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus"""


BLOOM_SEMI_JOIN = _bloom_semi_join_sql()


# mirrors relational.interarrival_profile: per-user consecutive-event
# gaps (tie-order-invariant multiset), integer seconds, power-of-two
# buckets via the format-bin bit-length trick (bucket -1 = sub-second)
INTERARRIVAL_PROFILE = """
WITH g AS (
    SELECT epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts) AS gap_us
    FROM events
),
b AS (
    SELECT CASE WHEN gap_us < 1000000 THEN -1
                ELSE length(format('{:b}', gap_us // 1000000)) - 1
           END AS bucket
    FROM g WHERE gap_us IS NOT NULL
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_gaps
FROM b GROUP BY bucket ORDER BY bucket"""


def _orders_with_late_items_sql() -> str:
    """Mirror of relational.orders_with_late_items: correlated EXISTS
    between two fact tables; the day span interpolates from the
    implementation constant so they cannot desynchronize."""
    from prlib_ray.relational import LATE_SHIP_DAYS

    return f"""
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL {LATE_SHIP_DAYS} DAY
)
GROUP BY 1 ORDER BY 1"""


ORDERS_WITH_LATE_ITEMS = _orders_with_late_items_sql()


# mirrors relational.fulfillment_latency: inner join on orderkey (orphan
# lineitems drop), whole-day floor (gap_us >= 0 so // == floor), pow2
# bucket via the shared format-bin trick; negative gaps -> bucket -2
FULFILLMENT_LATENCY = """
WITH j AS (
    SELECT epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate) AS gap_us
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
b AS (
    SELECT CASE WHEN gap_us < 0 THEN -2
                WHEN gap_us // 86400000000 = 0 THEN -1
                ELSE length(format('{:b}', gap_us // 86400000000)) - 1
           END AS bucket
    FROM j
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_items
FROM b GROUP BY 1 ORDER BY bucket"""

def _user_path_sql() -> str:
    """Mirror of relational.user_path_topk: per-user row_number in
    (ts, event_id) order cut at the prefix, string_agg in the same
    order, path counts, top-K by (n_users DESC, path ASC)."""
    from prlib_ray.relational import PATH_PREFIX_LEN, PATH_TOPK

    return f"""
WITH r AS (
    SELECT user_id, event_type, ts, event_id,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM events
),
p AS (
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS path
    FROM r WHERE rn <= {PATH_PREFIX_LEN} GROUP BY user_id
),
c AS (SELECT path, CAST(count(*) AS BIGINT) AS n_users
      FROM p GROUP BY path)
SELECT path, n_users FROM c
ORDER BY n_users DESC, path LIMIT {PATH_TOPK}"""


USER_PATH_TOPK = _user_path_sql()


def _basket_pairs_sql() -> str:
    """Mirror of relational.basket_part_pairs: top-F parts by DISTINCT
    basket count (n DESC, partkey ASC), pair support via the distinct
    (order, part) self-join, threshold + top-K (support DESC, part_a,
    part_b); constants interpolate from the implementation module."""
    from prlib_ray.relational import (BASKET_F, BASKET_K,
                                      BASKET_MIN_SUPPORT)

    return f"""
WITH d AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
           FROM lineitem),
df AS (SELECT pk, count(*) AS n FROM d GROUP BY pk),
top AS (SELECT pk FROM df ORDER BY n DESC, pk LIMIT {BASKET_F}),
dt AS (SELECT ok, pk FROM d JOIN top USING (pk)),
pairs AS (
    SELECT a.pk AS part_a, b.pk AS part_b,
           CAST(count(*) AS BIGINT) AS support
    FROM dt a JOIN dt b ON a.ok = b.ok AND a.pk < b.pk
    GROUP BY 1, 2 HAVING count(*) >= {BASKET_MIN_SUPPORT}
)
SELECT part_a, part_b, support FROM pairs
ORDER BY support DESC, part_a, part_b LIMIT {BASKET_K}"""


BASKET_PART_PAIRS = _basket_pairs_sql()


# mirrors relational.customer_running_total: cumulative frame in
# (o_orderdate, o_orderkey) order per customer over exact cents
CUSTOMER_RUNNING_TOTAL = f"""
WITH b AS (
    SELECT o_orderkey, o_custkey, o_orderdate,
           {_CENTS.format(expr='o_totalprice')} AS cents
    FROM orders
)
SELECT o_orderkey, o_custkey,
       CAST(sum(cents) OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey)
            AS BIGINT) AS running_cents,
       CAST(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey)
            AS BIGINT) AS order_seq
FROM b ORDER BY o_orderkey"""


def _q14_sql() -> str:
    """Mirror of relational.q14_promo_revenue: the shared per-row
    disc-price cents contract, promo flag via p_type = 'PROMO', exact
    integer permille (all positive, // truncation == floor)."""
    from prlib_ray.relational import Q14_HI, Q14_LO

    cents = _CENTS.format(expr="l.l_extendedprice * (1.0 - l.l_discount)")
    return f"""
WITH j AS (
    SELECT {cents} AS rev,
           CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END AS promo
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '{Q14_LO}'
      AND l.l_shipdate < TIMESTAMP '{Q14_HI}'
),
s AS (SELECT coalesce(sum(rev * promo), 0) AS p,
             coalesce(sum(rev), 0) AS t FROM j)
SELECT CAST(p AS BIGINT) AS promo_cents,
       CAST(t AS BIGINT) AS total_cents,
       CAST(CASE WHEN t = 0 THEN 0 ELSE (1000 * p) // t END AS BIGINT)
           AS promo_permille
FROM s"""


Q14_PROMO_REVENUE = _q14_sql()


# mirrors relational.brand_supplier_counts: inner join (orphans drop),
# global distinct triples, bounded group count
BRAND_SUPPLIER_COUNTS = """
WITH j AS (
    SELECT p.p_brand AS brand, CAST(p.p_size AS BIGINT) AS size,
           l.l_suppkey AS supp
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
d AS (SELECT DISTINCT brand, size, supp FROM j)
SELECT brand, size, CAST(count(*) AS BIGINT) AS n_suppliers
FROM d GROUP BY 1, 2 ORDER BY brand, size"""


# mirrors relational.user_stickiness: the events_hourly epoch-bucket
# convention (// truncation == floor for the fixtures' positive epochs)
USER_STICKINESS = """
WITH d AS (
    SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
    FROM events
),
dau AS (SELECT day, count(*) AS n FROM d GROUP BY day),
w AS (SELECT DISTINCT user_id, day // 7 AS week FROM d),
wau AS (SELECT week, count(*) AS n FROM w GROUP BY week),
ds AS (SELECT day // 7 AS week, sum(n) AS dau_sum FROM dau GROUP BY 1)
SELECT CAST(wau.week AS BIGINT) AS week,
       CAST(wau.n AS BIGINT) AS wau,
       CAST(ds.dau_sum AS BIGINT) AS dau_sum,
       CAST((1000 * ds.dau_sum) // (7 * wau.n) AS BIGINT)
           AS stickiness_permille
FROM wau JOIN ds USING (week) ORDER BY week"""


# mirrors relational.q13_custdist: LEFT JOIN so zero-order customers
# land in the 0 bucket; the status exclusion interpolates from the
# implementation constant so the two sides cannot desynchronize
def _q13_sql() -> str:
    from prlib_ray.relational import CUSTDIST_EXCLUDE_STATUS as _X

    return f"""
WITH per AS (
    SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderstatus <> '{_X}'
    GROUP BY 1
)
SELECT CAST(n_orders AS BIGINT) AS n_orders,
       CAST(count(*) AS BIGINT) AS n_customers
FROM per GROUP BY 1 ORDER BY 1"""


Q13_CUSTDIST = _q13_sql()


# mirrors relational.q18_large_orders: quantity folds through the SAME
# cents contract as every money column (exact int64 in any order);
# orders without lineitems and orphan lineitems both drop (inner join)
def _q18_sql() -> str:
    from prlib_ray.relational import Q18_MIN_QTY_CENTS as _T
    from prlib_ray.relational import Q18_TOPK as _K

    return f"""
WITH s AS (
    SELECT l_orderkey,
           SUM({_CENTS.format(expr='l_quantity')}) AS sum_qty_cents
    FROM lineitem GROUP BY 1
    HAVING SUM({_CENTS.format(expr='l_quantity')}) > {_T}
)
SELECT o.o_orderkey, o.o_orderdate,
       {_CENTS.format(expr='o.o_totalprice')} AS o_totalprice_cents,
       CAST(s.sum_qty_cents AS BIGINT) AS sum_qty_cents
FROM s JOIN orders o ON o.o_orderkey = s.l_orderkey
ORDER BY o_totalprice_cents DESC, o.o_orderkey LIMIT {_K}"""


Q18_LARGE_ORDERS = _q18_sql()


# mirrors relational.q10_returned_revenue: returned-item revenue per
# customer inside the order window, top-k by (revenue DESC, custkey
# ASC), dimensions attached to the winners only
def _q10_sql() -> str:
    from prlib_ray.relational import Q10_END, Q10_START
    from prlib_ray.relational import Q10_TOPK as _K

    return f"""
WITH rev AS (
    SELECT o.o_custkey AS ck,
           SUM({_CENTS.format(expr='l.l_extendedprice * (1.0 - l.l_discount)')})
               AS revenue_cents
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '{Q10_START}'
      AND o.o_orderdate <  TIMESTAMP '{Q10_END}'
    GROUP BY 1
),
top AS (
    SELECT * FROM rev ORDER BY revenue_cents DESC, ck LIMIT {_K}
)
SELECT c.c_custkey, c.c_name,
       CAST(t.revenue_cents AS BIGINT) AS revenue_cents,
       {_CENTS.format(expr='c.c_acctbal')} AS c_acctbal_cents,
       n.n_name
FROM top t
JOIN customer c ON c.c_custkey = t.ck
JOIN nation n ON n.n_nationkey = c.c_nationkey
ORDER BY t.revenue_cents DESC, c.c_custkey"""


Q10_RETURNED_REVENUE = _q10_sql()


# mirrors relational.trade_volume: the Q7 cross-nation revenue matrix
# over two shipping years; year() == the engine's datetime64[Y] read
def _trade_sql() -> str:
    from prlib_ray.relational import TRADE_END, TRADE_START

    return f"""
WITH j AS (
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS year,
           {_CENTS.format(expr='l.l_extendedprice * (1.0 - l.l_discount)')}
               AS rev
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '{TRADE_START}'
      AND l.l_shipdate <  TIMESTAMP '{TRADE_END}'
)
SELECT supp_nation, cust_nation, year,
       CAST(sum(rev) AS BIGINT) AS revenue_cents
FROM j GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""


TRADE_VOLUME = _trade_sql()


# mirrors relational.q17_small_quantity: the correlated 20%-of-average
# predicate stays exact integer arithmetic on BOTH sides —
# qty < 0.2*avg  <=>  5*qty_cents*n < sum_qty_cents — so float division
# can never desynchronize the two engines
Q17_SMALL_QUANTITY = f"""
WITH pa AS (
    SELECT l_partkey,
           SUM({_CENTS.format(expr='l_quantity')}) AS sumq,
           COUNT(*) AS n
    FROM lineitem GROUP BY 1
)
SELECT CAST(COALESCE(SUM({_CENTS.format(expr='l.l_extendedprice')}), 0)
            AS BIGINT) AS small_qty_revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_small_lineitems
FROM lineitem l JOIN pa ON pa.l_partkey = l.l_partkey
WHERE 5 * {_CENTS.format(expr='l.l_quantity')} * pa.n < pa.sumq"""


# mirrors relational.q15_top_supplier: tie-COMPLETE global argmax
def _q15_sql() -> str:
    from prlib_ray.relational import Q15_END, Q15_START

    return f"""
WITH r AS (
    SELECT l_suppkey,
           SUM({_CENTS.format(expr='l_extendedprice * (1.0 - l_discount)')})
               AS rev
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q15_START}'
      AND l_shipdate <  TIMESTAMP '{Q15_END}'
    GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, CAST(r.rev AS BIGINT) AS total_revenue_cents
FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.rev = (SELECT MAX(rev) FROM r)
ORDER BY s.s_suppkey"""


Q15_TOP_SUPPLIER = _q15_sql()


# mirrors relational.global_sales_opportunity: the positive-balance
# average compare is exact integers (bal_cents * n_pos > sum_pos_cents)
# and 'positive' means positive CENTS on both sides
def _q22_sql() -> str:
    from prlib_ray.relational import CWO_CUTOFF

    bal = _CENTS.format(expr='c_acctbal')
    return f"""
WITH g AS (
    SELECT COUNT(*) AS n_pos, SUM({bal}) AS sum_pos
    FROM customer WHERE {bal} > 0
),
act AS (
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '{CWO_CUTOFF}'
)
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM({_CENTS.format(expr='c.c_acctbal')}) AS BIGINT)
           AS acctbal_cents
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
LEFT JOIN act ON act.o_custkey = c.c_custkey
WHERE act.o_custkey IS NULL
  AND {_CENTS.format(expr='c.c_acctbal')} * (SELECT n_pos FROM g)
      > (SELECT sum_pos FROM g)
GROUP BY 1 ORDER BY 1"""


GLOBAL_SALES_OPPORTUNITY = _q22_sql()


# mirrors relational.q19_disjunctive_revenue: the OR-of-conjuncts
# interpolates from the implementation's disjunct table; quantity
# bounds compare in exact cents, BETWEEN inclusive both ends
def _q19_sql() -> str:
    from prlib_ray.relational import Q19_DISJUNCTS

    qc = _CENTS.format(expr='l.l_quantity')
    ors = " OR ".join(
        f"(p.p_brand = '{br}' AND p.p_size BETWEEN {slo} AND {shi}"
        f" AND {qc} BETWEEN {100 * qlo} AND {100 * qhi})"
        for br, slo, shi, qlo, qhi in Q19_DISJUNCTS
    )
    return f"""
SELECT CAST(COALESCE(SUM(
           {_CENTS.format(expr='l.l_extendedprice * (1.0 - l.l_discount)')}
       ), 0) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE {ors}"""


Q19_DISJUNCTIVE_REVENUE = _q19_sql()


# mirrors relational.q21_waiting_suppliers: every quantifier of the
# EXISTS + NOT-EXISTS self-join is scoped to one order, so the SQL
# states them as per-order aggregates — COUNT(DISTINCT supplier) >= 2,
# exactly one DISTINCT LATE supplier — which is the same predicate the
# per-part run-boundary kernel evaluates; "late" is the repo's shared
# lateness contract (l_shipdate > o_orderdate + LATE_SHIP_DAYS)
def _q21_sql() -> str:
    from prlib_ray.relational import LATE_SHIP_DAYS, Q21_TOPK

    return f"""
WITH j AS (
    SELECT l.l_orderkey AS ok, l.l_suppkey AS sk,
           (l.l_shipdate > o.o_orderdate
            + INTERVAL {LATE_SHIP_DAYS} DAY) AS late
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
),
per AS (
    SELECT ok,
           COUNT(DISTINCT sk) AS n_supp,
           COUNT(DISTINCT CASE WHEN late THEN sk END) AS n_late,
           MIN(CASE WHEN late THEN sk END) AS late_supp
    FROM j GROUP BY ok
)
SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per JOIN supplier s ON s.s_suppkey = per.late_supp
WHERE per.n_supp >= 2 AND per.n_late = 1
GROUP BY 1, 2
ORDER BY numwait DESC, s.s_suppkey
LIMIT {Q21_TOPK}"""


Q21_WAITING_SUPPLIERS = _q21_sql()


# mirrors relational.q8_market_share: the region-filtered conditional
# share of the SAME trade matrix (shared ship-date window); the share
# is exact integer permille (1000 * tgt // tot) on both sides, and
# HAVING drops no-revenue years like the implementation's tot > 0 mask
def _q8_sql() -> str:
    from prlib_ray.relational import (Q8_NATION, Q8_REGION, TRADE_END,
                                      TRADE_START)

    return f"""
WITH j AS (
    SELECT ns.n_name AS supp_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS year,
           {_CENTS.format(expr='l.l_extendedprice * (1.0 - l.l_discount)')}
               AS rev
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = nc.n_regionkey
    WHERE l.l_shipdate >= TIMESTAMP '{TRADE_START}'
      AND l.l_shipdate <  TIMESTAMP '{TRADE_END}'
      AND r.r_name = '{Q8_REGION}'
)
SELECT year,
       CAST(SUM(CASE WHEN supp_nation = '{Q8_NATION}' THEN rev
                     ELSE 0 END) AS BIGINT) AS target_rev_cents,
       CAST(SUM(rev) AS BIGINT) AS total_rev_cents,
       CAST(1000 * SUM(CASE WHEN supp_nation = '{Q8_NATION}' THEN rev
                            ELSE 0 END) // SUM(rev) AS BIGINT)
           AS share_permille
FROM j GROUP BY 1 HAVING SUM(rev) > 0 ORDER BY 1"""


Q8_MARKET_SHARE = _q8_sql()


# mirrors relational.followed_within: the window is (a.ts, a.ts + W]
# — strictly after, inclusive right edge — and the pair count is the
# raw fact-fact self-join cardinality (every (A-event, B-event) pair
# in window counts, not distinct users)
def _followed_within_sql() -> str:
    from prlib_ray.relational import HOUR_US

    return f"""
SELECT a.event_type AS trigger_type, b.event_type AS target_type,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM events a
JOIN events b
  ON b.user_id = a.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL {HOUR_US // 1_000_000} SECOND
GROUP BY 1, 2 ORDER BY 1, 2"""


FOLLOWED_WITHIN = _followed_within_sql()


# mirrors relational.price_zscore_outliers: the same integer
# inequality 4*(n*x - s)^2 > 9*(n*ss - s^2) in HUGEINT (DuckDB's
# SUM(BIGINT) is already HUGEINT-exact), strictly > on both sides
def _zscore_sql() -> str:
    from prlib_ray.relational import ZSCORE_DEN, ZSCORE_NUM

    xc = _CENTS.format(expr='o_totalprice')
    num2 = ZSCORE_NUM * ZSCORE_NUM
    den2 = ZSCORE_DEN * ZSCORE_DEN
    return f"""
WITH x AS (SELECT o_orderstatus, {xc} AS xc FROM orders),
st AS (
    SELECT o_orderstatus, COUNT(*) AS n, SUM(xc) AS s,
           SUM(xc * xc) AS ss
    FROM x GROUP BY 1
)
SELECT x.o_orderstatus,
       CAST(st.n AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN
                {den2} * (CAST(st.n AS HUGEINT) * xc - st.s)
                       * (CAST(st.n AS HUGEINT) * xc - st.s)
              > {num2} * (CAST(st.n AS HUGEINT) * st.ss
                          - CAST(st.s AS HUGEINT) * st.s)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM x JOIN st USING (o_orderstatus)
GROUP BY 1, 2 ORDER BY 1"""


PRICE_ZSCORE_OUTLIERS = _zscore_sql()


# mirrors relational.fk_orphan_audit: LEFT-JOIN orphan counts per FK
# edge, with the SAME deterministic negative-key plants UNION-ALLed in
# (the fixtures are FK-intact; without plants the row is a vacuous
# 0 == 0)
def _fk_audit_sql() -> str:
    from prlib_ray.relational import FK_PLANT_ORPHANS

    plants = " UNION ALL ".join(
        f"SELECT {-i} AS k" for i in range(1, FK_PLANT_ORPHANS + 1)
    )
    edges = [
        ("lineitem->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem->supplier", "lineitem", "l_suppkey",
         "supplier", "s_suppkey"),
        ("orders->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
    ]
    parts = []
    for rel_name, fact, fk, parent, pk in edges:
        parts.append(f"""
SELECT '{rel_name}' AS fk_edge,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_orphans
FROM (SELECT {fk} AS k FROM {fact} UNION ALL {plants}) f
LEFT JOIN {parent} p ON p.{pk} = f.k""")
    return " UNION ALL ".join(parts) + " ORDER BY fk_edge"


FK_ORPHAN_AUDIT = _fk_audit_sql()


def _ps_cte() -> str:
    """The synthesized-partsupp CTE — rebuilds relational._partsupp_ds
    bit-for-bit from the same interpolated constants."""
    from prlib_ray import relational as rel

    return f"""ps AS (
  SELECT p_partkey AS ps_partkey,
         (SELECT min(s_suppkey) FROM supplier)
           + (p_partkey * {rel.PS_SUPP_A} + k * {rel.PS_SUPP_B})
             % (SELECT count(*) FROM supplier) AS ps_suppkey,
         (p_partkey * {rel.PS_AVAIL_A} + k * {rel.PS_AVAIL_B})
           % {rel.PS_AVAIL_MOD} + 1 AS ps_availqty,
         (p_partkey * {rel.PS_COST_A} + k * {rel.PS_COST_B})
           % {rel.PS_COST_MOD} + {rel.PS_COST_BASE} AS ps_cost_cents
  FROM part CROSS JOIN
       (SELECT unnest(generate_series(0, {rel.PS_PER_PART - 1})) AS k) ks
)"""


def _q11_sql() -> str:
    from prlib_ray import relational as rel

    return f"""
WITH {_ps_cte()},
flt AS (
  SELECT ps.ps_partkey, ps.ps_availqty, ps.ps_cost_cents FROM ps
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = '{rel.Q11_REGION}'
),
pv AS (
  SELECT ps_partkey, SUM(ps_cost_cents * ps_availqty) AS value_cents
  FROM flt GROUP BY ps_partkey
),
tot AS (SELECT SUM(value_cents) AS t, COUNT(*) AS np FROM pv)
SELECT ps_partkey, CAST(value_cents AS BIGINT) AS value_cents
FROM pv, tot WHERE value_cents * np > t
"""


def _q20_sql() -> str:
    from prlib_ray import relational as rel

    return f"""
WITH {_ps_cte()},
ship AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS qty_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{rel.Q20_YEAR[0]}'
    AND l_shipdate < TIMESTAMP '{rel.Q20_YEAR[1]}'
  GROUP BY l_partkey, l_suppkey
),
ex AS (
  SELECT ps.ps_suppkey FROM ps
  JOIN ship sh ON sh.l_partkey = ps.ps_partkey
              AND sh.l_suppkey = ps.ps_suppkey
  WHERE 200 * ps.ps_availqty > sh.qty_cents
)
SELECT ps_suppkey AS s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_excess_parts
FROM ex GROUP BY ps_suppkey
"""


def _q16_sql() -> str:
    """TPC-H Q16 proper over the synthesized partsupp: filtered part
    subset x distinct suppliers, complaint suppliers excluded via a
    real NOT IN subquery (the synthesis rule mirrors
    relational.Q16_COMPLAINT_MOD — no s_comment column exists)."""
    from prlib_ray import relational as rel

    sizes = ", ".join(str(s) for s in rel.Q16_SIZES)
    return f"""
WITH {_ps_cte()}
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM ps JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> '{rel.Q16_EXCL_BRAND}'
  AND p_type NOT LIKE '{rel.Q16_EXCL_TYPE_PREFIX}%'
  AND p_size IN ({sizes})
  AND ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier
    WHERE s_suppkey % {rel.Q16_COMPLAINT_MOD} = 0)
GROUP BY p_brand, p_type, p_size
ORDER BY p_brand, p_type, p_size"""


Q11_IMPORTANT_STOCK = _q11_sql()
Q20_EXCESS_PARTS = _q20_sql()
Q16_SUPPLIER_CNT = _q16_sql()


def _column_drift_sql() -> str:
    """Mirror of relational.column_drift_tvd: exact-cents equal-width
    bins over the global [min, max], permille floor shares per half."""
    from prlib_ray import relational as rel

    b = rel.DRIFT_BINS
    return f"""
WITH pr AS (
    SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
           CASE WHEN o_orderdate < TIMESTAMP '{rel.DRIFT_SPLIT_DATE}'
                THEN 0 ELSE 1 END AS side
    FROM orders
),
mm AS (SELECT min(c) AS lo, max(c) - min(c) + 1 AS span FROM pr),
bn AS (
    SELECT least((c - lo) * {b} // span, {b - 1}) AS bin, side
    FROM pr, mm
),
g AS (
    SELECT bin,
           sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS nb,
           sum(side) AS na
    FROM bn GROUP BY bin
),
t AS (SELECT greatest(sum(nb), 1) AS tb, greatest(sum(na), 1) AS ta FROM g),
bins AS (SELECT unnest(generate_series(0, {b - 1})) AS bin)
SELECT CAST(bins.bin AS BIGINT) AS bin,
       CAST(COALESCE(g.nb, 0) AS BIGINT) AS n_before,
       CAST(COALESCE(g.na, 0) AS BIGINT) AS n_after,
       CAST(1000 * COALESCE(g.nb, 0) // t.tb AS BIGINT)
           AS share_before_permille,
       CAST(1000 * COALESCE(g.na, 0) // t.ta AS BIGINT)
           AS share_after_permille,
       CAST(abs(1000 * COALESCE(g.nb, 0) // t.tb
                - 1000 * COALESCE(g.na, 0) // t.ta) AS BIGINT)
           AS abs_diff_permille
FROM bins LEFT JOIN g ON bins.bin = g.bin, t
ORDER BY bin"""


COLUMN_DRIFT_TVD = _column_drift_sql()


def _q2_sql() -> str:
    from prlib_ray import relational as rel

    return f"""
WITH {_ps_cte()},
sub AS (
  SELECT ps.* FROM ps JOIN part p ON p.p_partkey = ps.ps_partkey
  WHERE p.p_size % {rel.Q2_SIZE_MOD} = 0
),
flt AS (
  SELECT sub.* FROM sub
  JOIN supplier s ON s.s_suppkey = sub.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = '{rel.Q2_REGION}'
),
rk AS (
  SELECT ps_partkey, ps_suppkey, ps_cost_cents,
         row_number() OVER (PARTITION BY ps_partkey
                            ORDER BY ps_cost_cents, ps_suppkey) AS rn
  FROM flt
)
SELECT ps_partkey, ps_suppkey, CAST(ps_cost_cents AS BIGINT) AS cost_cents
FROM rk WHERE rn = 1
"""


def _q9_sql() -> str:
    from prlib_ray import relational as rel

    words = ", ".join(f"'{w}'" for w in rel.Q9_NAME_WORDS)
    return f"""
WITH {_ps_cte()},
flt AS (
  SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_cost_cents FROM ps
  JOIN part p ON p.p_partkey = ps.ps_partkey
  WHERE split_part(p.p_name, ' ', 1) IN ({words})
),
li AS (
  SELECT l_orderkey, l_partkey, l_suppkey,
         CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
              AS BIGINT) AS rev_cents,
         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_cents
  FROM lineitem
),
j AS (
  SELECT s.s_nationkey, year(o.o_orderdate) AS yr,
         100 * li.rev_cents - f.ps_cost_cents * li.qty_cents AS profit
  FROM li
  JOIN flt f ON f.ps_partkey = li.l_partkey
            AND f.ps_suppkey = li.l_suppkey
  JOIN orders o ON o.o_orderkey = li.l_orderkey
  JOIN supplier s ON s.s_suppkey = li.l_suppkey
)
SELECT n.n_name, CAST(yr AS BIGINT) AS o_year,
       CAST(SUM(profit) AS BIGINT) AS profit_x100_cents
FROM j JOIN nation n ON n.n_nationkey = j.s_nationkey
GROUP BY n.n_name, yr
"""


Q2_MIN_COST_SUPPLIER = _q2_sql()
Q9_PRODUCT_PROFIT = _q9_sql()


def _q12_sql() -> str:
    from prlib_ray import relational as rel

    modes = ", ".join(f"'{m}'" for m in rel.Q12_MODES)
    check = ", ".join(f"'{m}'" for m in rel.Q12_CHECK_MODES)
    highs = ", ".join(f"'{p}'" for p in rel.Q12_HIGH_PRIOS)
    return f"""
WITH li AS (
  SELECT l_orderkey,
         [{modes}][(l_orderkey * 5 + l_linenumber * 3) % 4 + 1] AS shipmode,
         l_shipdate,
         l_shipdate + INTERVAL ((l_orderkey + l_linenumber * 7) % 45 - 10)
           DAY AS commitdate,
         l_shipdate + INTERVAL ((l_orderkey * 2 + l_linenumber) % 30 + 1)
           DAY AS receiptdate
  FROM lineitem
),
flt AS (
  SELECT li.shipmode, o.o_orderpriority
  FROM li JOIN orders o ON o.o_orderkey = li.l_orderkey
  WHERE li.shipmode IN ({check})
    AND li.commitdate < li.receiptdate
    AND li.l_shipdate < li.commitdate
    AND li.receiptdate >= TIMESTAMP '{rel.Q12_YEAR[0]}'
    AND li.receiptdate < TIMESTAMP '{rel.Q12_YEAR[1]}'
)
SELECT shipmode AS l_shipmode,
       CAST(SUM(CASE WHEN o_orderpriority IN ({highs})
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ({highs})
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM flt GROUP BY shipmode
"""


Q12_SHIPMODE_PRIORITY = _q12_sql()


def _q4_sql() -> str:
    """Mirror of relational.q4_order_priority: the Q12 synthesis's
    commit/receipt dates, an EXISTS semi-join counted per priority."""
    from prlib_ray import relational as rel

    return f"""
WITH li AS (
  SELECT l_orderkey,
         l_shipdate + INTERVAL ((l_orderkey + l_linenumber * 7) % 45 - 10)
           DAY AS commitdate,
         l_shipdate + INTERVAL ((l_orderkey * 2 + l_linenumber) % 30 + 1)
           DAY AS receiptdate
  FROM lineitem
)
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{rel.Q4_QUARTER[0]}'
  AND o.o_orderdate < TIMESTAMP '{rel.Q4_QUARTER[1]}'
  AND EXISTS (SELECT 1 FROM li
              WHERE li.l_orderkey = o.o_orderkey
                AND li.commitdate < li.receiptdate)
GROUP BY o.o_orderpriority
"""


Q4_ORDER_PRIORITY = _q4_sql()


def _profile_columns_sql() -> str:
    """Per-column profile mirror: the NULL plant, the integer views
    (cents / epoch-us) and the column list all interpolate from
    relational._PROFILE_COLS so the two sides cannot drift."""
    from prlib_ray import relational as rel

    view_expr = {
        "int": "{c}",
        "cents": "CAST(floor({c} * 100 + 0.5) AS BIGINT)",
        "ts": "epoch_us({c})",
        "str": "{c}",
    }
    vcols = ",\n         ".join(
        view_expr[kind].format(c=name) + f" AS c{cid}"
        for cid, name, kind in rel._PROFILE_COLS
    )
    branches = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS col, count(*) AS n_rows,\n"
        f"       count(*) - count(c{cid}) AS n_null,\n"
        f"       count(DISTINCT c{cid}) AS n_distinct,\n"
        f"       CAST(min(c{cid}) AS VARCHAR) AS min_s,\n"
        f"       CAST(max(c{cid}) AS VARCHAR) AS max_s\nFROM v"
        for cid, name, kind in rel._PROFILE_COLS
    )
    return f"""
WITH aug AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % {rel.PROFILE_NULL_MOD_CK} = 0
              THEN NULL ELSE o_custkey END AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate,
         CASE WHEN o_orderkey % {rel.PROFILE_NULL_MOD_PR} = 0
              THEN NULL ELSE o_orderpriority END AS o_orderpriority
  FROM orders
), v AS (
  SELECT {vcols}
  FROM aug
)
{branches}
"""


PROFILE_COLUMNS = _profile_columns_sql()


def _price_rank_ntile_sql() -> str:
    """Mirror of relational.price_rank_ntile: row_number()-1 under the
    unique (cents, orderkey) composite order and 0-based ntile; the
    bucket count interpolates from the implementation module."""
    from prlib_ray.relational import NTILE_BUCKETS

    return f"""
WITH c AS (
    SELECT o_orderkey, {_CENTS.format(expr='o_totalprice')} AS cents
    FROM orders
)
SELECT o_orderkey, cents,
       CAST(row_number() OVER w - 1 AS BIGINT) AS rnk,
       CAST(ntile({NTILE_BUCKETS}) OVER w - 1 AS BIGINT) AS tile
FROM c WINDOW w AS (ORDER BY cents, o_orderkey)
ORDER BY o_orderkey"""


PRICE_RANK_NTILE = _price_rank_ntile_sql()


# mirrors relational.pareto_orders: strict-somewhere dominance over
# (IEEE cents, epoch microseconds) — the NOT EXISTS skyline
PARETO_ORDERS = f"""
WITH t AS (
    SELECT o_orderkey,
           {_CENTS.format(expr='o_totalprice')} AS cents,
           epoch_us(o_orderdate) AS ts_us
    FROM orders
)
SELECT o.o_orderkey, o.cents, o.ts_us FROM t o
WHERE NOT EXISTS (
    SELECT 1 FROM t x
    WHERE x.cents >= o.cents AND x.ts_us >= o.ts_us
      AND (x.cents > o.cents OR x.ts_us > o.ts_us)
)
ORDER BY o.o_orderkey"""


def _rolling_active_users_sql() -> str:
    """Mirror of relational.rolling_active_users: trailing-W-day
    COUNT(DISTINCT user) for every day in the observed span; the day
    bucket floors (the retention_cohorts contract)."""
    from prlib_ray.relational import ROLLING_DAU_WINDOW

    return f"""
WITH ud AS (
    SELECT DISTINCT user_id,
           CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0)
                AS BIGINT) AS day
    FROM events
),
span AS (SELECT min(day) AS lo, max(day) AS hi FROM ud),
days AS (SELECT unnest(generate_series(lo, hi)) AS day FROM span)
SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS n_active
FROM days d
LEFT JOIN ud u ON u.day BETWEEN d.day - {ROLLING_DAU_WINDOW - 1} AND d.day
GROUP BY d.day ORDER BY d.day"""


ROLLING_ACTIVE_USERS = _rolling_active_users_sql()
