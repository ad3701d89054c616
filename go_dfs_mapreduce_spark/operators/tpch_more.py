"""Additional TPC-H-shape analytics over the synthetic subset schema.

The reference engine has no relational surface at all (SURVEY.md §2.4);
these queries extend the north-star coverage with the classic TPC-H access
patterns the round-1 set didn't exercise yet, adapted to the driver's
column subset (no commitdate/receiptdate/shipmode/supplycost/container):

- q6  : single-table predicate-heavy aggregate (pushdown showcase)
- q7  : two-nation volume flow (5-way join, derived year, 2-dim group)
- q9  : profit by nation x year (part-filtered 4-way join)
- q14 : promo revenue ratio (join + conditional aggregate ratio)
- q16 : supplier count by brand/size (distinct agg + negated predicates)
- q18 : large-volume orders (HAVING-filtered semi-join shape)
- q19 : OR-of-ANDs bracket predicates (disjunctive pushdown through join)
- q22 : idle customers (no recent order) above mean balance (scalar
        subquery + anti join)

Determinism: decimal-exact sums (dsum), integer-micro-unit means (davg),
and ratios emitted as a single IEEE division of two exact decimals — both
engines then produce bit-identical doubles with no post-division rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table
from .relational import DEC, _davg, _dsum, davg_sql, dsum_sql

# --------------------------------------------------------------------------
# q6: forecasting revenue change — the pushdown showcase: every predicate
# must reach the parquet scan; the agg is a single partial-aggregated sum.
# --------------------------------------------------------------------------

Q6_ORACLE = f"""
SELECT
  {dsum_sql('l_extendedprice * l_discount', 'revenue')},
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("q6_forecast_revenue", oracle=Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            _dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# q7: volume shipping between two nations — supplier nation and customer
# nation derived through two independent dim chains (both broadcast), fact
# shuffle only on the lineitem⋈orders key.
# --------------------------------------------------------------------------

Q7_ORACLE = f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       {dsum_sql('l_extendedprice * (1 - l_discount)', 'volume')}
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
WHERE ns.n_name IN ('NATION_1', 'NATION_2')
  AND nc.n_name IN ('NATION_1', 'NATION_2')
  AND ns.n_name <> nc.n_name
GROUP BY 1, 2, 3
"""


@query("q7_volume_shipping", oracle=Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    ns = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    ).where(F.col("n_name").isin("NATION_1", "NATION_2"))
    nc = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    ).where(F.col("n_name").isin("NATION_1", "NATION_2"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nc), cust.c_nationkey == nc.c_nkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), supp.s_nationkey == ns.s_nkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "volume"))
    )


# --------------------------------------------------------------------------
# q9: product-type profit by nation x year (no supplycost column in the
# subset schema — profit is discounted revenue, the join shape is intact).
# --------------------------------------------------------------------------

Q9_ORACLE = f"""
SELECT n_name AS nation, CAST(year(l_shipdate) AS INTEGER) AS o_year,
       {dsum_sql('l_extendedprice * (1 - l_discount)', 'sum_profit')}
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


@query("q9_product_profit", oracle=Q9_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
        )
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_profit"))
    )


# --------------------------------------------------------------------------
# q14: promo revenue ratio. The ratio is ONE IEEE division of two exact
# decimal sums — no post-division rounding (engines disagree on rounding
# doubles, never on dividing identical ones).
# --------------------------------------------------------------------------

Q14_ORACLE = """
SELECT
  CAST(SUM(CASE WHEN p_type = 'PROMO'
           THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))
           ELSE CAST(0 AS DECIMAL(28,6)) END) * 100 AS DOUBLE)
  / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
  AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
"""


@query("q14_promo_revenue", oracle=Q14_ORACLE)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    zero = F.lit(0).cast(DEC)
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                (F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(zero)) * 100)
                .cast("double")
                / F.sum(disc).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


# --------------------------------------------------------------------------
# q16: supplier count by brand/size — COUNT(DISTINCT) under negated
# predicates; distinct agg shuffles on the group key with partial distinct.
# --------------------------------------------------------------------------

Q16_ORACLE = """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%' AND p_size IN (1, 9, 19, 29, 39, 49)
GROUP BY p_brand, p_size
"""


@query("q16_supplier_cnt", oracle=Q16_ORACLE)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 9, 19, 29, 39, 49))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# q18: large-volume orders — HAVING over a fact aggregate joined back to
# dims; the classic IN-(grouped subquery) shape, expressed as join-after-agg
# so the fact is aggregated BEFORE touching dims (one shuffle).
# --------------------------------------------------------------------------

Q18_QTY = 160

Q18_ORACLE = f"""
SELECT c_name, o_orderkey, o_totalprice,
       {dsum_sql('l_quantity', 'total_qty')}
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > {Q18_QTY})
GROUP BY 1, 2, 3
"""


@query("q18_large_orders", oracle=Q18_ORACLE)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("q"))
        .where(F.col("q") > Q18_QTY)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(_dsum(F.col("l_quantity"), "total_qty"))
    )


# --------------------------------------------------------------------------
# q19: disjunctive bracket predicates — three (brand, size, quantity)
# brackets OR-ed together across a join; Catalyst pushes the common
# conjuncts and keeps the disjunction as a residual filter.
# --------------------------------------------------------------------------

Q19_ORACLE = f"""
SELECT {dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')},
       COUNT(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
"""


@query("q19_bracket_revenue", oracle=Q19_ORACLE)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    b1 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 21)
    )
    b2 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    )
    b3 = (
        (F.col("p_brand") == "Brand#20")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 40)
    )
    return j.where(b1 | b2 | b3).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --------------------------------------------------------------------------
# q22: idle customers above the mean positive balance — scalar subquery
# (broadcast one-row), anti join against orders, per-nation aggregate.
# --------------------------------------------------------------------------

Q22_CUTOFF = "1999-01-01"  # "idle" = no order since this date

Q22_ORACLE = f"""
WITH avg_bal AS (
  SELECT {davg_sql('c_acctbal', 'ab', scale=6)}
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey AS nationkey, COUNT(*) AS numcust,
       {dsum_sql('c_acctbal', 'totacctbal')}
FROM customer, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{Q22_CUTOFF}')
GROUP BY c_nationkey
"""


@query("q22_idle_balances", oracle=Q22_ORACLE)
def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    recent = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit(Q22_CUTOFF).cast("timestamp")
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        _davg("c_acctbal", "ab", scale=6)
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(F.col("c_acctbal"), "totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# q2-style argmin-per-group: cheapest part per brand, resolved with a
# join-back against the grouped minimum (the classic correlated-subquery
# rewrite that runs as two hash aggregates + one broadcast join).
# --------------------------------------------------------------------------

Q2_ORACLE = """
SELECT p.p_brand, MIN(p.p_partkey) AS cheapest_partkey, p.p_retailprice AS min_price
FROM part p
JOIN (SELECT p_brand, MIN(p_retailprice) AS mn FROM part GROUP BY p_brand) m
  ON p.p_brand = m.p_brand AND p.p_retailprice = m.mn
GROUP BY p.p_brand, p.p_retailprice
"""


@query("q2_cheapest_part", oracle=Q2_ORACLE)
def q2_cheapest_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    mins = part.groupBy(F.col("p_brand").alias("m_brand")).agg(
        F.min("p_retailprice").alias("mn")
    )
    return (
        part.join(
            F.broadcast(mins),
            (part.p_brand == F.col("m_brand")) & (part.p_retailprice == F.col("mn")),
        )
        .groupBy("p_brand", F.col("p_retailprice").alias("min_price"))
        .agg(F.min("p_partkey").alias("cheapest_partkey"))
        .select("p_brand", "cheapest_partkey", "min_price")
    )


# --------------------------------------------------------------------------
# date spine: calendar join that keeps empty days (generator + outer join).
# --------------------------------------------------------------------------

DATE_SPINE_ORACLE = """
WITH spine AS (
  SELECT CAST(d.d AS TIMESTAMP) AS day
  FROM (SELECT unnest(generate_series(TIMESTAMP '1995-01-01',
                                      TIMESTAMP '1995-03-31',
                                      INTERVAL 1 DAY)) AS d) d
),
daily AS (
  SELECT date_trunc('day', CAST(o_orderdate AS TIMESTAMP)) AS day,
         COUNT(*) AS n_orders
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-04-01'
  GROUP BY 1
)
SELECT s.day, COALESCE(d.n_orders, 0) AS n_orders
FROM spine s LEFT JOIN daily d ON s.day = d.day
"""


@query("date_spine_order_counts", oracle=DATE_SPINE_ORACLE)
def date_spine_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar (date-spine) pattern: a generated day dimension LEFT-joined
    to per-day fact aggregates so zero-activity days appear explicitly.
    The spine is sequence()+explode — rows are generated, never read; the
    fact side aggregates BEFORE the join so the outer join touches one row
    per day, not per order."""
    orders = table(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.expr(
                "sequence(timestamp'1995-01-01', timestamp'1995-03-31',"
                " interval 1 day)"
            )
        ).alias("day")
    )
    daily = (
        orders.where(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
        )
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return spine.join(daily, "day", "left").select(
        "day", F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders")
    )


# --------------------------------------------------------------------------
# salted join: skew-mitigated equi-join whose RESULT equals the plain join
# (the salt never escapes), so the plain join is its exact oracle.
# --------------------------------------------------------------------------

SALTED_JOIN_ORACLE = """
SELECT l_orderkey, o_orderpriority, l_extendedprice
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
"""


@query("salted_join_urgent_lineitems", oracle=SALTED_JOIN_ORACLE)
def salted_join_urgent_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.skew import salted_join

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
    )
    urgent = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey", "o_orderpriority")
    return salted_join(li, urgent, "o_orderkey", n_salts=8).select(
        F.col("o_orderkey").alias("l_orderkey"),
        "o_orderpriority",
        "l_extendedprice",
    )
