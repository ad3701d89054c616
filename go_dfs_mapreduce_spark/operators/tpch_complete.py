"""The remaining TPC-H access patterns — completes all 22 query shapes.

With tpch_more.py (q6/7/9/14/16/18/19/22) and relational.py (q1/2/3/5/10)
this module closes the suite: q4, q8, q11, q12, q13, q15, q17, q20, q21.
The reference has no relational surface at all (SURVEY.md §2.4); these are
north-star coverage, adapted to the driver's column subset (no
commitdate/receiptdate/shipmode/partsupp/comment):

- q4  : EXISTS-correlated priority count (late-ship proxy: l_shipdate more
        than 30 days after o_orderdate)
- q8  : national market share — conditional-share ratio over an 8-way join
- q11 : important stock — group HAVING > fraction-of-total scalar subquery
        (partsupp value proxied by lineitem volume from two nations)
- q12 : priority class counts by line status (shipmode proxied by
        l_linestatus)
- q13 : customer order-count distribution (outer join + two-level agg)
- q15 : top supplier by window revenue (argmax via scalar-max join)
- q17 : small-quantity brand revenue (correlated per-part mean, the
        0.2*avg cutoff done in EXACT arithmetic: 5*qty*cnt < sum)
- q20 : suppliers shipping significant volume of 'red' parts in a region
        (nested semi-join chain)
- q21 : suppliers who were the ONLY late shipper on a multi-supplier
        order (EXISTS + NOT EXISTS double correlation)

Determinism: every float aggregate is an exact DECIMAL sum cast to double
(one IEEE op), ratios are one IEEE division of two exact decimals, and the
q17 mean cutoff is an exact integer/decimal comparison — both engines
produce bit-identical values (registry.py contract).

Scale notes: dims (part, supplier, nation, region, customer at these
shapes) broadcast; every fact-side aggregate is partial-aggregated before
its join; the EXISTS/NOT-EXISTS correlations compile to semi/anti joins on
the fact key — no correlated re-scans, no cartesian products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table
from .relational import DEC, _dsum, dsum_sql

# --------------------------------------------------------------------------
# q4: order priority checking. EXISTS(lineitem shipped >30 days after the
# order date) — the correlated EXISTS compiles to one left-semi join with
# the extra non-equi conjunct, no re-scan per order.
# --------------------------------------------------------------------------

Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""


@query("q4_order_priority", oracle=Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")),
            "left_semi",
        )
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


# --------------------------------------------------------------------------
# q8: national market share — share of one nation's suppliers in a region's
# customer volume for one part type, by order year. The ratio is ONE IEEE
# division of two exact decimal sums.
# --------------------------------------------------------------------------

Q8_REGION = "ASIA"
Q8_NATION = "NATION_5"
Q8_TYPE = "STANDARD"

Q8_ORACLE = f"""
WITH base AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)) AS volume,
         ns.n_name AS supp_nation
  FROM lineitem
  JOIN orders    ON l_orderkey = o_orderkey
  JOIN customer  ON o_custkey = c_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region    ON nc.n_regionkey = r_regionkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN part      ON l_partkey = p_partkey
  WHERE r_name = '{Q8_REGION}' AND p_type = '{Q8_TYPE}'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = '{Q8_NATION}' THEN volume
                     ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
       / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM base GROUP BY o_year
"""


@query("q8_market_share", oracle=Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").where(F.col("r_name") == Q8_REGION)
    part = table(spark, sf_dir, "part").where(F.col("p_type") == Q8_TYPE)
    nc = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    ns = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    volume = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    zero = F.lit(0).cast(DEC)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nc), cust.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(region), F.col("c_rkey") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), supp.s_nationkey == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == Q8_NATION, volume).otherwise(zero))
                .cast("double")
                / F.sum(volume).cast("double")
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# q11: important stock — per-part volume from two nations' suppliers,
# kept when above a fraction of the grand total (scalar subquery in
# HAVING). The one-row total broadcasts; the fact aggregates once.
# --------------------------------------------------------------------------

Q11_NATIONS = ("NATION_3", "NATION_4")
Q11_FRACTION = 0.001

Q11_ORACLE = f"""
WITH val AS (
  SELECT l_partkey, CAST(l_extendedprice * l_quantity AS DECIMAL(28,6)) AS v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name IN ('{Q11_NATIONS[0]}', '{Q11_NATIONS[1]}')
),
tot AS (SELECT SUM(v) AS t FROM val)
SELECT l_partkey AS partkey, CAST(SUM(v) AS DOUBLE) AS part_value
FROM val, tot
GROUP BY l_partkey, t
HAVING CAST(SUM(v) AS DOUBLE) > CAST(t AS DOUBLE) * {Q11_FRACTION}
"""


@query("q11_important_stock", oracle=Q11_ORACLE)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").where(F.col("n_name").isin(*Q11_NATIONS))
    val = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * F.col("l_quantity")).cast(DEC).alias("v"),
        )
    )
    per_part = val.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum("v").alias("pv")
    )
    total = per_part.agg(F.sum("pv").alias("t"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("pv").cast("double") > F.col("t").cast("double") * Q11_FRACTION)
        .select("partkey", F.col("pv").cast("double").alias("part_value"))
    )


# --------------------------------------------------------------------------
# q12: priority classes by line status (shipmode proxied by l_linestatus)
# — conditional counts after a fact-fact join pre-filtered on the scan.
# --------------------------------------------------------------------------

Q12_ORACLE = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
"""


@query("q12_priority_lines", oracle=Q12_ORACLE)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# q13: customer order-count distribution. The priority filter lives in the
# JOIN condition (not WHERE) so customers whose orders are all excluded
# still appear with c_count = 0 — the outer-join subtlety q13 exists to
# exercise.
# --------------------------------------------------------------------------

Q13_EXCLUDED = "4-NOT SPECIFIED"

Q13_ORACLE = f"""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '{Q13_EXCLUDED}'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


@query("q13_order_count_dist", oracle=Q13_ORACLE)
def q13_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != Q13_EXCLUDED),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# q15: top supplier — argmax against a scalar MAX over the same grouped
# revenue (exact decimal equality, so ties surface identically on both
# engines). The revenue aggregate is computed once and reused.
# --------------------------------------------------------------------------

Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS rv
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rv AS DOUBLE) AS total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE rv = (SELECT MAX(rv) FROM rev)
"""


@query("q15_top_supplier", oracle=Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)).alias("rv")
        )
    )
    mx = rev.agg(F.max("rv").alias("mx"))
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("rv") == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", F.col("rv").cast("double").alias("total_revenue"))
    )


# --------------------------------------------------------------------------
# q17: small-quantity revenue. The 0.2*avg correlated cutoff is done in
# EXACT arithmetic — l_quantity < 0.2 * (sum/cnt)  ⟺  5*qty*cnt < sum —
# so no division, no float comparison, identical row sets on both engines.
# --------------------------------------------------------------------------

Q17_BRAND = "Brand#5"
Q17_MAX_SIZE = 15

Q17_ORACLE = f"""
WITH agg AS (
  SELECT l_partkey AS a_partkey,
         SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sq,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN agg  ON l_partkey = a_partkey
WHERE p_brand = '{Q17_BRAND}' AND p_size < {Q17_MAX_SIZE}
  AND CAST(l_quantity AS DECIMAL(18,6)) * 5 * cnt < sq
"""


@query("q17_small_qty_revenue", oracle=Q17_ORACLE)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(
        (F.col("p_brand") == Q17_BRAND) & (F.col("p_size") < Q17_MAX_SIZE)
    )
    agg = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("sq"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(agg, li.l_partkey == F.col("a_partkey"))
        .where(F.col("l_quantity").cast(DEC) * 5 * F.col("cnt") < F.col("sq"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# q20: suppliers who shipped a significant volume of 'red' parts in 1996,
# restricted to one region — a semi-join chain; every step prunes before
# the next join.
# --------------------------------------------------------------------------

Q20_REGION = "EUROPE"
Q20_MIN_QTY = 300

Q20_ORACLE = f"""
WITH redparts AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
qty AS (
  SELECT l_suppkey
  FROM lineitem JOIN redparts ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > {Q20_MIN_QTY}
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q20_REGION}'
  AND s_suppkey IN (SELECT l_suppkey FROM qty)
"""


@query("q20_red_part_shippers", oracle=Q20_ORACLE)
def q20_red_part_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    redparts = table(spark, sf_dir, "part").where(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").where(F.col("r_name") == Q20_REGION)
    qty = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(redparts), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("sq"))
        .where(F.col("sq") > Q20_MIN_QTY)
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(F.broadcast(qty), supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


# --------------------------------------------------------------------------
# q21: suppliers who kept orders waiting — the supplier was LATE (shipped
# >60 days after the order date) on a finished multi-supplier order where
# NO other supplier was late. EXISTS ⇒ left-semi, NOT EXISTS ⇒ left-anti,
# both on the order key with a supplier-inequality conjunct.
# --------------------------------------------------------------------------

Q21_ORACLE = """
WITH ls AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
SELECT s_name, COUNT(*) AS numwait
FROM late w
JOIN supplier ON w.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM ls
              WHERE ls.l_orderkey = w.l_orderkey AND ls.l_suppkey <> w.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late x
                  WHERE x.l_orderkey = w.l_orderkey AND x.l_suppkey <> w.l_suppkey)
GROUP BY s_name
"""


@query("q21_waiting_suppliers", oracle=Q21_ORACLE)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    supp = table(spark, sf_dir, "supplier")
    ls = li.select("l_orderkey", "l_suppkey").distinct()
    late = (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    w = late.alias("w")
    others = ls.alias("o")
    other_late = late.alias("x")
    return (
        w.join(
            others,
            (F.col("w.l_orderkey") == F.col("o.l_orderkey"))
            & (F.col("w.l_suppkey") != F.col("o.l_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("w.l_orderkey") == F.col("x.l_orderkey"))
            & (F.col("w.l_suppkey") != F.col("x.l_suppkey")),
            "left_anti",
        )
        .join(F.broadcast(supp), F.col("w.l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
