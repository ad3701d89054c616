"""Window-function surface (SURVEY.md §2.4 — absent in the reference).

Ranking, analytic, and framed aggregates over orders/events/customer.
Every window has a total order within its partition (explicit tie-break
keys) so results are deterministic on both engines.

Scale note: a window over partitionBy(k) is one shuffle on k; frames are
evaluated streaming within the sorted partition (no materialization).
Skewed partition keys behave like skewed groupBy keys — the events table
windows partition on user_id, which the generator draws uniformly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import table

DEC = "decimal(18,6)"  # <=18 precision is long-backed in Spark (~15% faster aggregation
# than BigDecimal-backed 28,6); the SUM accumulator auto-widens, so exactness
# and the DECIMAL(28,6) oracles are unaffected at any scale.

RUNNING_TOTAL_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
    AS running_total
FROM orders
"""


@query("window_running_total", oracle=RUNNING_TOTAL_ORACLE)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(F.col("o_totalprice").cast(DEC)).over(w), 2)
        .cast("double")
        .alias("running_total"),
    )


RANK_TOPK_ORACLE = """
SELECT o_custkey, o_orderkey, rn FROM (
  SELECT o_custkey, o_orderkey,
         CAST(row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
  FROM orders
) WHERE rn <= 3
"""


@query("window_rank_topk_per_customer", oracle=RANK_TOPK_ORACLE)
def window_rank_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k — the scalable form of the reference's argmax loop
    (log_analyzer.go:84-122): rank inside the partition, filter, never a
    global sort."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).cast("int").alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


LAG_ORACLE = """
SELECT event_id, user_id,
  ROUND(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2)
    AS delta
FROM events
"""


@query("window_lag_delta", oracle=LAG_ORACLE)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
    )


# Windowed mean in exact integer micro-units with HALF_UP via
# (2*S + d) // (2*d) — see the determinism note in relational.py; engine
# AVG/ROUND on doubles disagrees across engines at .xx5 landings.
MOVING_AVG_ORACLE = """
SELECT event_id, user_id,
  (CAST((2 * s + c * 10000) // (2 * c * 10000) AS DOUBLE) / 100) AS moving_avg
FROM (
  SELECT event_id, user_id,
    SUM(CAST(ROUND(value * 1000000) AS BIGINT)) OVER w AS s,
    COUNT(*) OVER w AS c
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
)
"""


@query("window_moving_avg", oracle=MOVING_AVG_ORACLE)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    with_sums = e.select(
        "event_id",
        "user_id",
        F.sum(F.round(F.col("value") * 1000000).cast("long")).over(w).alias("s"),
        F.count(F.lit(1)).over(w).alias("c"),
    )
    return with_sums.select(
        "event_id",
        "user_id",
        (
            F.expr("CAST((2 * s + c * 10000) DIV (2 * c * 10000) AS DOUBLE)")
            / 100
        ).alias("moving_avg"),
    )


NTILE_ORACLE = """
SELECT c_custkey,
  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
  ROUND(percent_rank() OVER w, 6) AS pct_rank,
  ROUND(cume_dist() OVER w, 6) AS cume
FROM customer
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
"""


@query("window_ntile_percentiles", oracle=NTILE_ORACLE)
def window_ntile_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpartitioned analytic window — the one shape that genuinely
    serializes (single-partition sort); fine for a 150·sf-row dim table,
    never for facts (use partitioned windows or approx quantiles there)."""
    cust = table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


FIRST_LAST_ORACLE = """
SELECT DISTINCT user_id,
  first_value(event_type) OVER w AS first_event,
  last_value(event_type) OVER
    (PARTITION BY user_id ORDER BY ts, event_id
     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event,
  CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_events
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@query("window_first_last_event", oracle=FIRST_LAST_ORACLE)
def window_first_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w_ord.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_all = Window.partitionBy("user_id")
    return e.select(
        "user_id",
        F.first("event_type").over(w_ord).alias("first_event"),
        F.last("event_type").over(w_full).alias("last_event"),
        F.count(F.lit(1)).over(w_all).alias("n_events"),
    ).distinct()


# RANGE frame over an event-time axis: sum of the trailing 10 minutes per
# user. The order key is epoch microseconds (numeric), so the frame is a
# true value-range, not a row count — rows with equal timestamps share a
# frame regardless of tie order.
RANGE_FRAME_ORACLE = """
SELECT event_id, user_id,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(28,6)))
    OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
          RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
    AS trailing_10m_value
FROM events
"""


@query("window_range_frame_trailing", oracle=RANGE_FRAME_ORACLE)
def window_range_frame_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-600_000_000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum(F.col("value").cast(DEC)).over(w), 2)
        .cast("double")
        .alias("trailing_10m_value"),
    )


RANK_FUNCS_ORACLE = """
SELECT
  c_custkey,
  c_mktsegment,
  CAST(rank()         OVER w AS BIGINT)  AS bal_rank,
  CAST(dense_rank()   OVER w AS BIGINT)  AS bal_dense_rank,
  ROUND(percent_rank() OVER w, 6)        AS bal_percent_rank,
  ROUND(cume_dist()    OVER w, 6)        AS bal_cume_dist,
  first_value(c_custkey) OVER w          AS richest_in_segment
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
"""


@query("window_rank_functions", oracle=RANK_FUNCS_ORACLE)
def window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family over one window: rank/dense_rank/
    percent_rank/cume_dist/first_value. percent_rank and cume_dist are
    IEEE divisions of identical integer counts on both engines, so the
    rounded doubles hash-match."""
    cust = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).cast("long").alias("bal_rank"),
        F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
        F.round(F.percent_rank().over(w), 6).alias("bal_percent_rank"),
        F.round(F.cume_dist().over(w), 6).alias("bal_cume_dist"),
        F.first("c_custkey").over(w).alias("richest_in_segment"),
    )
