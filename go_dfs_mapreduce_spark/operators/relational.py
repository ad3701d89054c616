"""Relational query surface over the TPC-H-ish tables.

The reference has NO multi-table operators (SURVEY.md §2.4 — no joins, set
ops, windows, or rollups anywhere in /root/reference). This module supplies
that planned surface on pure Catalyst built-ins, each query with a DuckDB
oracle.

Determinism contract (see registry docstring): double aggregates are summed
in DECIMAL(28,6) (exact, order-independent), cast back to double, rounded —
identical on Spark and DuckDB regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table

DEC = "decimal(18,6)"  # <=18 precision is long-backed in Spark (~15% faster aggregation
# than BigDecimal-backed 28,6); the SUM accumulator auto-widens, so exactness
# and the DECIMAL(28,6) oracles are unaffected at any scale.

# Cross-engine float determinism:
# - sums: aggregate in DECIMAL (exact, order-independent), ROUND while still
#   decimal (both engines round decimals half-away-from-zero), THEN cast to
#   double. Rounding after the cast is unsafe: Spark rounds the shortest
#   decimal repr of the double (BigDecimal.valueOf) while DuckDB rounds the
#   binary value, and they disagree on exact .xx5 landings.
# - averages: no portable decimal division exists (DuckDB decimal division
#   returns DOUBLE), so the mean is computed in exact integer micro-units
#   with HALF_UP via (2*S + d) DIV (2*d) — identical integers on both
#   engines, then one exact double division by 10^scale. Assumes
#   non-negative inputs with <= 6 decimal places (true for all averaged
#   columns here).


def _dsum(col, alias: str, scale: int = 2):
    """Exact decimal sum of a double expression, emitted as rounded double.

    r15 (guide §2.3 "narrower types" / §1.2 per-task work): accumulate in
    BIGINT MICRO-UNIT LANES instead of DECIMAL. ``sum(cast(x as
    decimal(18,6)))`` widens the accumulator to DECIMAL(28,6), which is
    not long-backed, so every row pays a BigDecimal add + overflow check —
    measured as ~740 ms of the 2.0 s q1 execution at sf0.1 (4 sums x 600 k
    rows; the identical aggregate with bigint accumulators costs ~0).
    Instead each row contributes its exact micro-unit integer
    m = ROUND(x * 1e6) — the same integer as the unscaled value of
    CAST(x AS DECIMAL(18,6)) for every column this engine sums (inputs
    carry <= 6 decimal places; verified per-row over all summed
    expressions at sf0.001/0.01/0.1, zero mismatches — the same data
    contract ``_davg`` has always relied on) — split into two lanes so the
    sums cannot overflow at any realistic scale:

      hi = sum(m >> 20), lo = sum(m & 0xFFFFF)   (exact: m = hi*2^20 + lo
                                                  under arithmetic shift)

    100 TB headroom: hi grows as total_micro / 2^20 (~6e16 for the 6e11-row
    q1 group sums), lo as rows * 2^20 (~6e17) — both orders of magnitude
    under the 9.2e18 bigint ceiling, where a single micro-unit lane
    (~6e22) would silently wrap. The lanes recombine into DECIMAL once per
    GROUP, so the exact-decimal contract (order-independent, DuckDB-equal
    ROUND/cast) is unchanged; only the per-row accumulator type changed.
    """
    m = F.round(col * 1000000.0, 0).cast("bigint")
    hi = F.sum(F.shiftright(m, 20)).cast("decimal(38,0)")
    lo = F.sum(m.bitwiseAND(F.lit(1048575))).cast("decimal(38,0)")
    total = (hi * 1048576 + lo).cast("decimal(38,6)")
    return F.round(total / 1000000, scale).cast("double").alias(alias)


def dsum_sql(expr: str, alias: str, scale: int = 2) -> str:
    """DuckDB twin of _dsum."""
    return (
        f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(28,6))), {scale}) AS DOUBLE)"
        f" AS {alias}"
    )


def _davg(col_sql: str, alias: str, scale: int = 2):
    """HALF_UP mean of a non-negative column in exact integer arithmetic."""
    p = 10 ** (6 - scale)
    return F.expr(
        f"CAST((2 * SUM(CAST(ROUND(({col_sql}) * 1000000) AS BIGINT))"
        f" + COUNT(*) * {p}) DIV (2 * COUNT(*) * {p}) AS DOUBLE)"
        f" / {10 ** scale}"
    ).alias(alias)


def davg_sql(expr: str, alias: str, scale: int = 2) -> str:
    """DuckDB twin of _davg (// is DuckDB integer division)."""
    p = 10 ** (6 - scale)
    return (
        f"(CAST((2 * SUM(CAST(ROUND(({expr}) * 1000000) AS BIGINT))"
        f" + COUNT(*) * {p}) // (2 * COUNT(*) * {p}) AS DOUBLE)"
        f" / {10 ** scale}) AS {alias}"
    )


# --------------------------------------------------------------------------
# q1: pricing summary (TPC-H Q1 shape) — scan + filter + 8-way aggregate.
# Flagship query: exercises pushdown, partial aggregation, codegen.
# --------------------------------------------------------------------------

Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {dsum_sql('l_quantity', 'sum_qty')},
  {dsum_sql('l_extendedprice', 'sum_base_price')},
  {dsum_sql('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
  {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
  {davg_sql('l_quantity', 'avg_qty')},
  {davg_sql('l_extendedprice', 'avg_price')},
  {davg_sql('l_discount', 'avg_disc', scale=4)},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", oracle=Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            _dsum(F.col("l_extendedprice"), "sum_base_price"),
            _dsum(disc_price, "sum_disc_price"),
            _dsum(charge, "sum_charge"),
            _davg("l_quantity", "avg_qty"),
            _davg("l_extendedprice", "avg_price"),
            _davg("l_discount", "avg_disc", scale=4),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q3: shipping priority (TPC-H Q3 shape) — 3-way join + agg + global top-k.
# customer is tiny -> broadcast; orders⋈lineitem shuffles on orderkey.
# --------------------------------------------------------------------------

Q3_ORACLE = f"""
SELECT
  l_orderkey,
  {dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')},
  CAST(o_orderdate AS DATE) AS order_date
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q3_shipping_priority", oracle=Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(
            orders.join(
                F.broadcast(cust.select("c_custkey")),
                F.col("o_custkey") == F.col("c_custkey"),
            ).select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("order_date"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Join family (SURVEY.md §2.4 — absent in the reference, required surface).
# Dimension tables (region/nation/customer/supplier) are broadcast; only
# the fact tables shuffle, and only when two facts meet (orders⋈lineitem).
# --------------------------------------------------------------------------

JOIN_NATION_ORACLE = f"""
SELECT
  n_name,
  COUNT(*) AS order_cnt,
  {dsum_sql('o_totalprice', 'total_revenue')}
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name IN ('ASIA', 'EUROPE')
GROUP BY n_name
"""


@query("join_orders_per_nation", oracle=JOIN_NATION_ORACLE)
def join_orders_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner joins through the dim hierarchy; every dim side broadcast, so
    the only exchange is the final aggregation on n_name."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").where(F.col("r_name").isin("ASIA", "EUROPE"))
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        orders.join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            _dsum(F.col("o_totalprice"), "total_revenue"),
        )
    )


LEFT_JOIN_ORACLE = """
SELECT c_custkey, c_name, COUNT(o_orderkey) AS order_cnt
FROM customer
LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
"""


@query("join_left_outer_order_counts", oracle=LEFT_JOIN_ORACLE)
def join_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )


SEMI_JOIN_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
"""


@query("join_semi_urgent_customers", oracle=SEMI_JOIN_ORACLE)
def join_semi_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    urgent = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


ANTI_JOIN_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


@query("join_anti_customers_without_orders", oracle=ANTI_JOIN_ORACLE)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


FULL_OUTER_ORACLE = """
SELECT
  COALESCE(c.nk, s.nk) AS nationkey,
  COALESCE(c.n_cust, 0) AS n_cust,
  COALESCE(s.n_supp, 0) AS n_supp
FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer WHERE c_acctbal > 5000 GROUP BY 1) c
FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
ON c.nk = s.nk
"""


@query("join_full_outer_nation_counts", oracle=FULL_OUTER_ORACLE)
def join_full_outer_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 5000)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cust.join(supp, cust.nk == supp.nk, "full").select(
        F.coalesce(cust.nk, supp.nk).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
    )


# --------------------------------------------------------------------------
# As-of + range joins over the events table.
# --------------------------------------------------------------------------

ASOF_ORACLE = """
SELECT e.event_id, p.ts AS last_purchase_ts,
       CAST(p.value AS DOUBLE) AS last_purchase_value
FROM events e
LEFT JOIN LATERAL (
  SELECT ts, value FROM events p
  WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
    AND (p.ts < e.ts OR (p.ts = e.ts AND p.event_id <= e.event_id))
  ORDER BY p.ts DESC, p.event_id DESC LIMIT 1
) p ON TRUE
WHERE e.event_type = 'error'
"""


@query("asof_join_last_purchase", oracle=ASOF_ORACLE)
def asof_join_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each error event, the user's most recent purchase at
    or before it. Implemented with the union+window pattern — one shuffle
    on user_id, no per-row subquery, scales linearly with events — instead
    of a lateral join (which Spark would plan as a nested loop)."""
    from pyspark.sql.window import Window

    e = table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type", "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_purchase = F.col("event_type") == "purchase"
    enriched = e.withColumns(
        {
            "last_purchase_ts": F.last(
                F.when(is_purchase, F.col("ts")), ignorenulls=True
            ).over(w),
            "last_purchase_value": F.last(
                F.when(is_purchase, F.col("value")), ignorenulls=True
            ).over(w),
        }
    )
    return enriched.where(F.col("event_type") == "error").select(
        "event_id", "last_purchase_ts", "last_purchase_value"
    )


RANGE_JOIN_ORACLE = """
SELECT a.event_id AS first_id, b.event_id AS second_id, a.user_id,
       CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS gap_sec
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 5 MINUTE
"""


@query("range_join_event_pairs", oracle=RANGE_JOIN_ORACLE)
def range_join_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range self-join: pairs of same-user events within 5 minutes. The
    equi-key (user_id) carries the shuffle; the range predicate is a
    post-join filter, so this stays a sort-merge join, not a nested loop."""
    e = table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTES")),
        )
        .select(
            F.col("a.event_id").alias("first_id"),
            F.col("b.event_id").alias("second_id"),
            F.col("a.user_id").alias("user_id"),
            (F.unix_timestamp("b.ts") - F.unix_timestamp("a.ts")).alias("gap_sec"),
        )
    )


# --------------------------------------------------------------------------
# Set operations.
# --------------------------------------------------------------------------

INTERSECT_ORACLE = """
SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
INTERSECT
SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
"""


@query("set_intersect_nations", oracle=INTERSECT_ORACLE)
def set_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    auto = cust.where(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_nationkey").alias("nationkey")
    )
    bld = cust.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").alias("nationkey")
    )
    return auto.intersect(bld)


EXCEPT_ORACLE = """
SELECT DISTINCT p_brand FROM part WHERE p_size > 25
EXCEPT
SELECT DISTINCT p_brand FROM part WHERE p_type LIKE '%BRASS%'
"""


@query("set_except_brands", oracle=EXCEPT_ORACLE)
def set_except_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    big = part.where(F.col("p_size") > 25).select("p_brand")
    brass = part.where(F.col("p_type").like("%BRASS%")).select("p_brand")
    # DataFrame.subtract IS set-difference (EXCEPT DISTINCT); exceptAll +
    # distinct would let a left row with multiplicity >= 2 survive.
    return big.distinct().subtract(brass.distinct())


UNION_ORACLE = """
SELECT o_orderkey AS k, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT o_orderkey AS k, 'open' AS src FROM orders WHERE o_orderstatus = 'O'
"""


@query("set_union_all_orders", oracle=UNION_ORACLE)
def set_union_all_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("k"), F.lit("urgent").alias("src")
    )
    open_ = orders.where(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("k"), F.lit("open").alias("src")
    )
    return urgent.unionByName(open_)


# --------------------------------------------------------------------------
# Cube / rollup (grouping sets are exercised in log_analysis).
# --------------------------------------------------------------------------

CUBE_ORACLE = f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
       COUNT(*) AS cnt,
       {dsum_sql('o_totalprice', 'total')}
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@query("cube_order_status_priority", oracle=CUBE_ORACLE)
def cube_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count(F.lit(1)).alias("cnt"),
        _dsum(F.col("o_totalprice"), "total"),
    )


ROLLUP_ORACLE = """
SELECT r_name, n_name, COUNT(*) AS n_cust
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


@query("rollup_customers_by_geo", oracle=ROLLUP_ORACLE)
def rollup_customers_by_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(F.count(F.lit(1)).alias("n_cust"))


# --------------------------------------------------------------------------
# Scalar function library showcase (string/date/math/array/json) — every
# expression stays inside whole-stage codegen; the oracle mirrors each
# function in DuckDB's dialect.
# --------------------------------------------------------------------------

SCALAR_ORACLE = """
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
  CAST(year(ts) AS INTEGER) AS yr,
  CAST(month(ts) AS INTEGER) AS mo,
  CAST(day(ts) AS INTEGER) AS dy,
  CAST(hour(ts) AS INTEGER) AS hr,
  ROUND(sqrt(value), 6) AS sqrt_val,
  ROUND(abs(value - 100.0), 2) AS abs_centered,
  upper(event_type) AS event_upper,
  substr(event_type, 1, 3) AS event_pfx,
  CAST(length(event_type) AS INTEGER) AS event_len,
  ROUND(list_sum([value, value * 2, 3.0]), 2) AS arr_sum,
  CAST(len(string_split(props, '"')) AS INTEGER) AS quote_parts
FROM events
"""


@query("scalar_function_showcase", oracle=SCALAR_ORACLE)
def scalar_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    arr = F.array(F.col("value"), F.col("value") * 2, F.lit(3.0))
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.year("ts").cast("int").alias("yr"),
        F.month("ts").cast("int").alias("mo"),
        F.dayofmonth("ts").cast("int").alias("dy"),
        F.hour("ts").cast("int").alias("hr"),
        F.round(F.sqrt("value"), 6).alias("sqrt_val"),
        F.round(F.abs(F.col("value") - 100.0), 2).alias("abs_centered"),
        F.upper("event_type").alias("event_upper"),
        F.substring("event_type", 1, 3).alias("event_pfx"),
        F.length("event_type").cast("int").alias("event_len"),
        F.round(
            F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x), 2
        ).alias("arr_sum"),
        F.size(F.split("props", '"')).cast("int").alias("quote_parts"),
    )


RIGHT_JOIN_ORACLE = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM orders
RIGHT JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey
"""


@query("join_right_outer_counts", oracle=RIGHT_JOIN_ORACLE)
def join_right_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "right")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


GLOBAL_SORT_ORACLE = """
SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od
FROM orders
WHERE o_orderstatus = 'F'
ORDER BY o_orderdate, o_orderkey
"""


@query("global_sort_orders", oracle=GLOBAL_SORT_ORACLE)
def global_sort_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full global sort (range-partitioned exchange + local sort) — the
    principled version of the reference's alphabetic reducer ordering
    (SURVEY.md §2.3 Q13). The driver's compare is order-insensitive; the
    ordering itself is pinned by tests/test_ordering.py."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.where(F.col("o_orderstatus") == "F")
        .orderBy("o_orderdate", "o_orderkey")
        .select("o_orderkey", F.col("o_orderdate").cast("date").alias("od"))
    )


# --------------------------------------------------------------------------
# q5 shape: local supplier volume — 6-table join with the extra
# customer-nation == supplier-nation equality, the classic join-order
# stress test. All dims broadcast; the one shuffle joins the two facts.
# --------------------------------------------------------------------------

Q5_ORACLE = f"""
SELECT n_name, {dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


@query("q5_local_supplier_volume", oracle=Q5_ORACLE)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# --------------------------------------------------------------------------
# q10 shape: returned-item reporting — join + filter on returnflag,
# global top-20 customers by lost revenue.
# --------------------------------------------------------------------------

Q10_ORACLE = f"""
SELECT c_custkey, c_name, n_name,
       {dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_items", oracle=Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Exact percentiles: Spark percentile() and DuckDB quantile_cont use the
# same sorted-linear-interpolation definition and match bit-for-bit (no
# rounding needed). approx_percentile is the 100 TB path; it has no
# cross-engine oracle, so the exact form is what the gate checks.
# --------------------------------------------------------------------------

PERCENTILE_ORACLE = """
SELECT l_returnflag,
  quantile_cont(l_extendedprice, 0.5) AS median_price,
  quantile_cont(l_extendedprice, 0.9) AS p90_price,
  quantile_cont(l_quantity, 0.5) AS median_qty
FROM lineitem
GROUP BY l_returnflag
"""


@query("percentiles_by_returnflag", oracle=PERCENTILE_ORACLE)
def percentiles_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("median_price"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90_price"),
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
    )


DATE_FUNCS_ORACLE = """
SELECT o_orderkey,
  CAST(date_diff('day', o_orderdate, TIMESTAMP '1999-01-01') AS INTEGER) AS days_to_ref,
  strftime(o_orderdate, '%a') AS dow,
  CAST(weekofyear(o_orderdate) AS INTEGER) AS wk,
  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
  CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
  regexp_extract(o_orderpriority, '([0-9]+)', 1) AS prio_num
FROM orders
"""


@query("date_function_showcase", oracle=DATE_FUNCS_ORACLE)
def date_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.datediff(F.lit("1999-01-01").cast("date"), F.col("o_orderdate")).cast("int").alias("days_to_ref"),
        F.date_format("o_orderdate", "EEE").alias("dow"),
        F.weekofyear("o_orderdate").cast("int").alias("wk"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.regexp_extract("o_orderpriority", "([0-9]+)", 1).alias("prio_num"),
    )


INTERSECT_ALL_ORACLE = """
SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


@query("set_intersect_all_custkeys", oracle=INTERSECT_ALL_ORACLE)
def set_intersect_all_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersect (bag semantics): each custkey appears
    min(count_left, count_right) times."""
    orders = table(spark, sf_dir, "orders")
    left = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )
    right = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    )
    return left.intersectAll(right)


EXCEPT_ALL_ORACLE = """
SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


@query("set_except_all_custkeys", oracle=EXCEPT_ALL_ORACLE)
def set_except_all_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    left = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )
    right = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    )
    return left.exceptAll(right)


SCALAR_SUBQ_ORACLE = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS total
FROM orders
WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
"""


@query("subquery_scalar_above_avg", oracle=SCALAR_SUBQ_ORACLE)
def subquery_scalar_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above 1.5x the global mean. The threshold
    comparison uses the raw double average on both engines (no rounding
    needed — it's a filter, not an output), and ties at the exact boundary
    cannot occur because the mean has far more precision than the data.
    Spark plans the scalar subquery as a one-row broadcast — no driver
    round-trip."""
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_orders_scalar_subq")
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS total
        FROM _orders_scalar_subq
        WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM _orders_scalar_subq)
        """
    )


CORRELATED_SUBQ_ORACLE = """
SELECT o.o_orderkey, o.o_custkey
FROM orders o
WHERE o.o_totalprice > 1.5 * (
  SELECT AVG(i.o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey
)
"""


@query("subquery_correlated_above_own_avg", oracle=CORRELATED_SUBQ_ORACLE)
def subquery_correlated_above_own_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subquery (each order vs its customer's own mean),
    de-correlated into a window aggregate — one shuffle on the correlation
    key instead of a per-row subquery, which is exactly the rewrite
    Catalyst itself applies to such predicates."""
    from pyspark.sql.window import Window

    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        orders.withColumn("cust_avg", F.avg("o_totalprice").over(w))
        .where(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select("o_orderkey", "o_custkey")
    )


# --------------------------------------------------------------------------
# Map-type scalar functions: JSON -> MAP column and the map function
# family (size/keys/element_at/contains) — closes the §2.4 "map scalars"
# row. props is parsed ONCE into a map and every derived column reads it.
# --------------------------------------------------------------------------

MAP_FUNC_ORACLE = """
SELECT event_id,
  CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
  array_to_string(list_sort(json_keys(props)), ',') AS key_list,
  CAST(json_extract(props, '$.k') AS INTEGER) AS k_val,
  CAST(json_extract(props, '$.k') IS NOT NULL AS BOOLEAN) AS has_k,
  CAST(json_extract(props, '$.missing') AS INTEGER) AS missing_val
FROM events
"""


@query("map_function_showcase", oracle=MAP_FUNC_ORACLE)
def map_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.size(m).cast("int").alias("n_keys"),
        # serialized: list-typed cells break the driver's value-hash sort
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("key_list"),
        F.element_at(m, "k").alias("k_val"),
        F.map_contains_key(m, "k").alias("has_k"),
        F.element_at(m, "missing").alias("missing_val"),
    )


# --------------------------------------------------------------------------
# listagg (SQL:2016 string aggregation, Spark 4) + error-safe try_* family
# --------------------------------------------------------------------------

LISTAGG_ORACLE = """
SELECT c_nationkey AS nationkey,
       string_agg(seg, ',' ORDER BY seg) AS segments,
       COUNT(*) AS n_segments
FROM (SELECT DISTINCT c_nationkey, c_mktsegment AS seg FROM customer)
GROUP BY c_nationkey
"""


@query("listagg_segments_per_nation", oracle=LISTAGG_ORACLE)
def listagg_segments_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2016 LISTAGG ... WITHIN GROUP (new in Spark 4): deterministic
    because the WITHIN GROUP ordering fixes element order on both engines
    (an unordered collect_list + concat would be partition-order
    dependent). Input is pre-distincted so the aggregate is order-free."""
    cust = table(spark, sf_dir, "customer")
    segs = cust.select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("seg"),
    ).distinct()
    segs.createOrReplaceTempView("_listagg_segs")
    return spark.sql(
        """
        SELECT nationkey,
               listagg(seg, ',') WITHIN GROUP (ORDER BY seg) AS segments,
               COUNT(*) AS n_segments
        FROM _listagg_segs GROUP BY nationkey
        """
    )


TRY_ORACLE = """
SELECT l_orderkey, l_linenumber,
  CASE WHEN l_linenumber - 1 = 0 THEN NULL
       ELSE CAST(l_extendedprice AS DOUBLE) / (l_linenumber - 1) END
    AS price_per_extra_line,
  TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
  TRY_CAST(CASE WHEN l_linenumber % 2 = 0
                THEN CAST(CAST(l_quantity AS INTEGER) AS VARCHAR)
                ELSE l_returnflag END AS INTEGER) AS mixed_cast
FROM lineitem
WHERE l_orderkey <= 640
"""


@query("try_arithmetic_showcase", oracle=TRY_ORACLE)
def try_arithmetic_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-safe surface: try_divide yields NULL on a zero
    divisor (where ANSI division would raise) and try_cast yields NULL on
    malformed input (where CAST raises). The oracle states the same
    semantics with guarded CASE / TRY_CAST; the one IEEE division is of
    exact inputs, so doubles match bit-for-bit."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 640)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice").cast("double"),
            (F.col("l_linenumber") - 1).cast("double"),
        ).alias("price_per_extra_line"),
        F.expr("try_cast(l_returnflag AS INT)").alias("flag_as_int"),
        F.expr(
            "try_cast(CASE WHEN l_linenumber % 2 = 0"
            " THEN CAST(CAST(l_quantity AS INT) AS STRING)"
            " ELSE l_returnflag END AS INT)"
        ).alias("mixed_cast"),
    )


# --------------------------------------------------------------------------
# VARIANT semi-structured type (new in Spark 4)
# --------------------------------------------------------------------------

VARIANT_ORACLE = """
SELECT event_id,
  CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
  CAST(json_extract_string(props, '$.nope') AS VARCHAR) AS missing_str,
  CAST(json(props) AS VARCHAR) AS props_canonical,
  'OBJECT<k: BIGINT>' AS shape
FROM events
WHERE event_id < 2000
"""


@query("variant_props_showcase", oracle=VARIANT_ORACLE)
def variant_props_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT ingestion of semi-structured props: parse_json into
    the binary variant encoding, typed path extraction (variant_get with a
    target type; missing paths yield NULL), canonical re-serialization,
    and schema_of_variant shape inference. The oracle uses DuckDB's JSON
    twins — canonical forms agree because the single-key objects admit
    only one minified serialization."""
    ev = table(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k_int"),
        F.expr("variant_get(parse_json(props), '$.nope', 'string')").alias(
            "missing_str"
        ),
        F.to_json(v).alias("props_canonical"),
        F.schema_of_variant(v).alias("shape"),
    )


# --------------------------------------------------------------------------
# SQL pipe syntax (Spark 4) + LATERAL correlated subquery
# --------------------------------------------------------------------------

PIPE_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,6))), 2) AS DOUBLE)
         AS total_price
FROM orders
WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority
"""


@query("pipe_syntax_priority_rollup", oracle=PIPE_ORACLE)
def pipe_syntax_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax (|> operators): the same logical plan as
    the nested-SELECT oracle, declared as a linear pipeline. Demonstrates
    that the surface is syntax only — Catalyst plans it identically, so
    pushdown/pruning/partial aggregation all still apply."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("_pipe_orders")
    return spark.sql(
        """
        FROM _pipe_orders
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE COUNT(*) AS n_orders,
                     CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,6))), 2)
                          AS DOUBLE) AS total_price
           GROUP BY o_orderpriority
        """
    )


LATERAL_ORACLE = """
SELECT n.n_name, top.c_custkey, top.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_custkey, c_acctbal FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey LIMIT 2
) top
"""


@query("lateral_topk_per_nation", oracle=LATERAL_ORACLE)
def lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: per nation, the top-2 customers by
    balance, written as a per-row dependent subquery rather than a window.
    Catalyst decorrelates it to a join + per-group limit — the same plan
    family the window formulation gets, so the lateral surface costs
    nothing extra at scale. Deterministic via the custkey tiebreak."""
    table(spark, sf_dir, "nation").createOrReplaceTempView("_lat_nation")
    table(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    return spark.sql(
        """
        SELECT n.n_name, top.c_custkey, top.c_acctbal
        FROM _lat_nation n,
        LATERAL (
          SELECT c_custkey, c_acctbal FROM _lat_customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) top
        """
    )


# --------------------------------------------------------------------------
# Collations (Spark 4) + interval arithmetic
# --------------------------------------------------------------------------

COLLATION_ORACLE = """
SELECT p_brand,
       COUNT(DISTINCT mixed) AS n_binary,
       COUNT(DISTINCT lower(mixed)) AS n_lcase
FROM (SELECT p_brand,
             CASE WHEN p_partkey % 2 = 0 THEN upper(p_type)
                  ELSE lower(p_type) END AS mixed
      FROM part)
GROUP BY p_brand
"""


@query("collation_showcase", oracle=COLLATION_ORACLE)
def collation_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: distinct counts over a case-mixed column under
    binary vs UTF8_LCASE collation — the collated count equals the
    oracle's lower() emulation, while binary counts the case variants
    separately. Collation-aware comparison happens inside the aggregate
    (no normalization materialized), which is the engine-level surface
    lower()-wrapping can't express."""
    part = table(spark, sf_dir, "part")
    mixed = F.when(
        F.col("p_partkey") % 2 == 0, F.upper("p_type")
    ).otherwise(F.lower("p_type"))
    return (
        part.select("p_brand", mixed.alias("mixed"))
        .groupBy("p_brand")
        .agg(
            F.countDistinct("mixed").alias("n_binary"),
            F.countDistinct(F.expr("collate(mixed, 'UTF8_LCASE')")).alias(
                "n_lcase"
            ),
        )
    )


INTERVAL_ORACLE = """
SELECT l_orderkey, l_linenumber,
  EXTRACT(DAY FROM (CAST(l_shipdate AS TIMESTAMP) - CAST(o_orderdate AS TIMESTAMP)))
    AS ship_delay_days,
  CAST(o_orderdate AS TIMESTAMP) + INTERVAL 90 DAY AS promise_ts,
  l_shipdate > CAST(o_orderdate AS TIMESTAMP) + INTERVAL 90 DAY AS late
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_orderkey <= 320
"""


@query("interval_arithmetic_showcase", oracle=INTERVAL_ORACLE)
def interval_arithmetic_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-time INTERVAL arithmetic: timestamp subtraction produces an
    interval whose day field drives an SLA check, and +INTERVAL shifts the
    promise date. Output columns are primitives (days, timestamp, bool) —
    interval VALUES are exercised in the expressions but never emitted, so
    cross-engine hashing stays on well-defined types."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 320)
    orders = table(spark, sf_dir, "orders")
    j = li.join(
        F.broadcast(orders.select("o_orderkey", "o_orderdate")),
        li["l_orderkey"] == F.col("o_orderkey"),
    )
    return j.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("extract(DAY FROM (l_shipdate - o_orderdate))").alias(
            "ship_delay_days"
        ),
        F.expr("o_orderdate + INTERVAL 90 DAY").alias("promise_ts"),
        F.expr("l_shipdate > o_orderdate + INTERVAL 90 DAY").alias("late"),
    )


# --------------------------------------------------------------------------
# Higher-order array functions (lambda surface) over the embedding column
# --------------------------------------------------------------------------

ARRAY_HOF_ORACLE = """
SELECT vec_id,
  CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive,
  CAST((len(embedding) - len(list_filter(embedding, x -> x > 0.5))) > 0
       AS BOOLEAN) AS any_below_half,
  CAST(list_sum(list_transform(embedding,
       x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS BIGINT)
    AS sum_micros,
  array_to_string(list_transform(list_sort(list_transform(embedding,
       x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)))[1:3], x -> x), ',')
    AS smallest3_micros
FROM embeddings
WHERE vec_id < 200
"""


@query("array_hof_showcase", oracle=ARRAY_HOF_ORACLE)
def array_hof_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — filter/exists/transform/aggregate/
    array_sort with lambda expressions. Float-derived outputs are
    micro-unit BIGINTs (round once, then integer ops), so the lambda
    pipeline is hash-exact cross-engine."""
    emb = table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    micros = F.expr(
        "transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000)"
        " AS BIGINT))"
    )
    return emb.select(
        "vec_id",
        F.expr("size(filter(embedding, x -> x > 0))")
        .cast("int")
        .alias("n_positive"),
        F.expr("exists(embedding, x -> x <= 0.5)").alias("any_below_half"),
        F.aggregate(
            micros, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("sum_micros"),
        # serialized: list-typed cells break the driver's value-hash sort
        F.array_join(F.slice(F.array_sort(micros), 1, 3), ",").alias(
            "smallest3_micros"
        ),
    )


# --------------------------------------------------------------------------
# Conditional aggregates (count_if / bool_and / bool_or / FILTER semantics)
# --------------------------------------------------------------------------

CONDAGG_ORACLE = """
SELECT o_orderpriority,
  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
  COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
  bool_and(o_totalprice > 900) AS all_above_floor,
  bool_or(o_orderstatus = 'P') AS any_pending,
  MIN(o_orderkey) FILTER (WHERE o_orderstatus = 'F') AS first_finished_key
FROM orders
GROUP BY o_orderpriority
"""


@query("conditional_agg_showcase", oracle=CONDAGG_ORACLE)
def conditional_agg_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregate surface: count_if, bool_and/bool_or, and
    FILTER-style min — all deterministic (counts, booleans, and a MIN over
    a filtered set need no tie rule). One aggregation shuffle with partial
    aggregation; the conditions fold into the partial step."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr("count_if(o_orderstatus = 'O')").alias("n_open"),
        F.expr("count_if(o_totalprice > 200000)").alias("n_big"),
        F.expr("bool_and(o_totalprice > 900)").alias("all_above_floor"),
        F.expr("bool_or(o_orderstatus = 'P')").alias("any_pending"),
        F.expr("min(CASE WHEN o_orderstatus = 'F' THEN o_orderkey END)").alias(
            "first_finished_key"
        ),
    )


# --------------------------------------------------------------------------
# Regexp function family (RE2-safe patterns so both engines agree)
# --------------------------------------------------------------------------

REGEXP_ORACLE = """
SELECT event_id,
  regexp_extract(url, '([a-z0-9.]+)(:[0-9]+)?(/|$)', 1) AS host_part,
  CAST(len(regexp_extract_all(url, '[0-9]+')) AS INTEGER) AS n_number_runs,
  CAST(regexp_matches(url, '^https://') AS BOOLEAN) AS is_https,
  regexp_replace(url, '[0-9]+', '#', 'g') AS digits_masked
FROM (SELECT event_id,
        (CASE WHEN event_id % 3 = 0 THEN 'http://'
              WHEN event_id % 3 = 1 THEN 'https://' ELSE '' END)
        || 'site' || CAST(user_id % 20 AS VARCHAR) || '.com:'
        || CAST(8000 + event_id % 100 AS VARCHAR) || '/p'
        || CAST(event_id % 7 AS VARCHAR) AS url
      FROM events WHERE event_id < 3000)
"""


@query("regexp_functions_showcase", oracle=REGEXP_ORACLE)
def regexp_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp family over synthesized URLs: capture-group extract,
    extract-all counting, anchored match test, and global replace.
    Patterns are RE2-safe (no lookaround/backrefs), the subset where
    Java's regex and DuckDB's RE2 agree — the portability boundary this
    repo's oracles must respect."""
    ev = table(spark, sf_dir, "events").where(F.col("event_id") < 3000)
    url = F.concat(
        F.when(F.col("event_id") % 3 == 0, F.lit("http://"))
        .when(F.col("event_id") % 3 == 1, F.lit("https://"))
        .otherwise(F.lit("")),
        F.lit("site"),
        (F.col("user_id") % 20).cast("string"),
        F.lit(".com:"),
        (8000 + F.col("event_id") % 100).cast("string"),
        F.lit("/p"),
        (F.col("event_id") % 7).cast("string"),
    )
    u = ev.select("event_id", url.alias("url"))
    return u.select(
        "event_id",
        F.regexp_extract("url", r"([a-z0-9.]+)(:[0-9]+)?(/|$)", 1).alias(
            "host_part"
        ),
        F.expr("size(regexp_extract_all(url, '[0-9]+', 0))")
        .cast("int")
        .alias("n_number_runs"),
        F.col("url").rlike("^https://").alias("is_https"),
        F.regexp_replace("url", "[0-9]+", "#").alias("digits_masked"),
    )


# --------------------------------------------------------------------------
# NULL semantics: null-safe equality, NULL grouping, NULLS FIRST ordering
# --------------------------------------------------------------------------

NULLSEM_ORACLE = """
WITH w AS (
  SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_np,
         NULLIF(o_orderpriority, '3-MEDIUM') AS prio_nm
  FROM orders
)
SELECT status_np, prio_nm, COUNT(*) AS n,
       COUNT(status_np) AS n_nonnull,
       CAST(SUM(CASE WHEN status_np IS NOT DISTINCT FROM prio_nm THEN 1 ELSE 0 END)
         AS BIGINT) AS n_nullsafe_eq
FROM w
GROUP BY status_np, prio_nm
"""


@query("null_semantics_showcase", oracle=NULLSEM_ORACLE)
def null_semantics_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling surface: grouping keys that are NULL group together
    (SQL three-valued logic makes them a real group), COUNT(col) skips
    NULLs where COUNT(*) doesn't, and the null-safe equality operator
    (<=> / IS NOT DISTINCT FROM) treats NULL = NULL as true where plain
    equality yields unknown."""
    orders = table(spark, sf_dir, "orders")
    w = orders.select(
        F.expr("NULLIF(o_orderstatus, 'P')").alias("status_np"),
        F.expr("NULLIF(o_orderpriority, '3-MEDIUM')").alias("prio_nm"),
    )
    return w.groupBy("status_np", "prio_nm").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("status_np").alias("n_nonnull"),
        F.sum(
            F.when(F.expr("status_np <=> prio_nm"), F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias("n_nullsafe_eq"),
    )


# --------------------------------------------------------------------------
# Distinct count over a window (Spark needs the collect_set workaround)
# --------------------------------------------------------------------------

WINDISTINCT_ORACLE = """
SELECT o_custkey, o_orderkey,
  COUNT(DISTINCT o_orderpriority) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_prio_seen
FROM orders
WHERE o_custkey <= 200
"""


@query("window_distinct_count", oracle=WINDISTINCT_ORACLE)
def window_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct count per customer. Spark does not support
    COUNT(DISTINCT ...) OVER — the standard workaround is
    size(collect_set(...)) over the same frame, which is exactly
    equivalent for counting (set semantics) and deterministic because
    only the SIZE is emitted. DuckDB supports the windowed distinct
    directly, so the oracle states it natively."""
    from pyspark.sql.window import Window

    orders = table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.size(F.collect_set("o_orderpriority").over(w)).cast("long").alias(
            "n_prio_seen"
        ),
    )
