"""Time-series analytics over the events table.

Two shapes every metrics pipeline needs, both pure window/join Catalyst
plans with DuckDB oracles:

- events_locf_resample : regularize an irregular event stream onto an
  hourly grid with last-observation-carried-forward gap fill — generated
  (user x hour) spine LEFT-joined to per-hour samples, then an
  ignore-nulls window ``last`` forward-fills. The standard resample
  before any time-series model.
- funnel_signup_conversion : classic ordered funnel (signup -> click ->
  purchase): per-user first-touch timestamps, stage reached = how deep
  the strictly-increasing prefix goes. One groupBy of conditional mins —
  no joins, no self-scans.

Scale notes: the spine is generated (sequence+explode), never read; its
row count is users x grid points — intended output volume. The funnel is
a single partial-aggregated pass over events. Samples aggregate BEFORE
the spine join, so the outer join touches one row per (user, hour).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import table

LOCF_START = "2024-01-01 00:00:00"
LOCF_END = "2024-01-07 23:00:00"  # inclusive hourly grid, first week

LOCF_ORACLE = f"""
WITH users AS (SELECT DISTINCT user_id FROM events),
spine AS (
  SELECT u.user_id, g.h AS hour
  FROM users u,
       unnest(generate_series(TIMESTAMP '{LOCF_START}',
                              TIMESTAMP '{LOCF_END}',
                              INTERVAL 1 HOUR)) g(h)
),
samples AS (
  SELECT user_id, date_trunc('hour', ts) AS hour, MAX(value) AS sample
  FROM events
  WHERE ts < TIMESTAMP '{LOCF_END}' + INTERVAL 1 HOUR
  GROUP BY 1, 2
)
SELECT s.user_id, s.hour,
       LAST_VALUE(p.sample IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
FROM spine s LEFT JOIN samples p
  ON s.user_id = p.user_id AND s.hour = p.hour
"""


@query("events_locf_resample", oracle=LOCF_ORACLE)
def events_locf_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    users = events.select("user_id").distinct()
    spine = users.crossJoin(
        spark.range(1).select(
            F.explode(
                F.expr(
                    f"sequence(timestamp'{LOCF_START}', timestamp'{LOCF_END}',"
                    " interval 1 hour)"
                )
            ).alias("hour")
        )
    )
    samples = (
        events.where(
            F.col("ts")
            < F.lit(LOCF_END).cast("timestamp") + F.expr("INTERVAL 1 HOUR")
        )
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.max("value").alias("sample"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return spine.join(samples, ["user_id", "hour"], "left").select(
        "user_id",
        "hour",
        F.last("sample", ignorenulls=True).over(w).alias("value_locf"),
    )


FUNNEL_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(CASE
         WHEN t_signup IS NULL THEN 0
         WHEN t_click IS NULL OR t_click <= t_signup THEN 1
         WHEN t_purchase IS NULL OR t_purchase <= t_click THEN 2
         ELSE 3
       END AS INTEGER) AS funnel_stage
FROM firsts
"""


@query("funnel_signup_conversion", oracle=FUNNEL_ORACLE)
def funnel_signup_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: stage 1 = signed up, 2 = clicked strictly after
    signup, 3 = purchased strictly after that click. First-touch times
    come from one conditional-min aggregate (partial-aggregated; the
    whole funnel is a single shuffle of 3 timestamps per user)."""
    events = table(spark, sf_dir, "events")

    def first_of(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    firsts = events.groupBy("user_id").agg(
        first_of("signup").alias("t_signup"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    stage = (
        F.when(F.col("t_signup").isNull(), 0)
        .when(
            F.col("t_click").isNull() | (F.col("t_click") <= F.col("t_signup")), 1
        )
        .when(
            F.col("t_purchase").isNull() | (F.col("t_purchase") <= F.col("t_click")),
            2,
        )
        .otherwise(3)
    )
    return firsts.select("user_id", stage.cast("int").alias("funnel_stage"))


# --------------------------------------------------------------------------
# Linear-interpolation resample (the other canonical gap-fill mode)
# --------------------------------------------------------------------------

INTERP_ORACLE = f"""
WITH users AS (SELECT DISTINCT user_id FROM events),
spine AS (
  SELECT u.user_id, g.h AS hour
  FROM users u,
       unnest(generate_series(TIMESTAMP '{LOCF_START}',
                              TIMESTAMP '{LOCF_END}',
                              INTERVAL 1 HOUR)) g(h)
),
samples AS (
  SELECT user_id, date_trunc('hour', ts) AS hour, MAX(value) AS sample
  FROM events
  WHERE ts < TIMESTAMP '{LOCF_END}' + INTERVAL 1 HOUR
  GROUP BY 1, 2
),
j AS (
  SELECT s.user_id, s.hour, p.sample,
    LAST_VALUE(p.sample IGNORE NULLS) OVER (
      PARTITION BY s.user_id ORDER BY s.hour
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    LAST_VALUE(CASE WHEN p.sample IS NOT NULL THEN s.hour END IGNORE NULLS)
      OVER (PARTITION BY s.user_id ORDER BY s.hour
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
    FIRST_VALUE(p.sample IGNORE NULLS) OVER (
      PARTITION BY s.user_id ORDER BY s.hour
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    FIRST_VALUE(CASE WHEN p.sample IS NOT NULL THEN s.hour END IGNORE NULLS)
      OVER (PARTITION BY s.user_id ORDER BY s.hour
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
  FROM spine s LEFT JOIN samples p
    ON s.user_id = p.user_id AND s.hour = p.hour
)
SELECT user_id, hour,
  CASE WHEN sample IS NOT NULL THEN sample
       WHEN pv IS NOT NULL AND nv IS NOT NULL
       THEN pv + (nv - pv) * (CAST(epoch(hour) - epoch(ph) AS DOUBLE)
                              / CAST(epoch(nh) - epoch(ph) AS DOUBLE))
       ELSE NULL END AS value_interp
FROM j
"""


@query("events_linear_resample", oracle=INTERP_ORACLE)
def events_linear_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill on the hourly grid: observed hours
    keep their sample, interior gaps interpolate between the bracketing
    observations, and points outside the observed range stay NULL (strict
    interpolation — LOCF is the other operator). The interpolation
    formula is written with the identical operation order on both engines
    (pv + (nv - pv) * (int-epoch delta / int-epoch delta)), so the IEEE
    doubles match bit-for-bit with no rounding step. Same
    one-shuffle-on-user shape as LOCF: both direction windows share the
    spine-join partitioning."""
    events = table(spark, sf_dir, "events")
    users = events.select("user_id").distinct()
    spine = users.crossJoin(
        spark.range(1).select(
            F.explode(
                F.expr(
                    f"sequence(timestamp'{LOCF_START}', timestamp'{LOCF_END}',"
                    " interval 1 hour)"
                )
            ).alias("hour")
        )
    )
    samples = (
        events.where(
            F.col("ts")
            < F.lit(LOCF_END).cast("timestamp") + F.expr("INTERVAL 1 HOUR")
        )
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.max("value").alias("sample"))
    )
    back = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hour = F.when(F.col("sample").isNotNull(), F.col("hour"))
    j = (
        spine.join(samples, ["user_id", "hour"], "left")
        .withColumn("pv", F.last("sample", ignorenulls=True).over(back))
        .withColumn("ph", F.last(obs_hour, ignorenulls=True).over(back))
        .withColumn("nv", F.first("sample", ignorenulls=True).over(fwd))
        .withColumn("nh", F.first(obs_hour, ignorenulls=True).over(fwd))
    )
    frac = F.expr(
        "CAST(unix_timestamp(hour) - unix_timestamp(ph) AS DOUBLE)"
        " / CAST(unix_timestamp(nh) - unix_timestamp(ph) AS DOUBLE)"
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * frac
    return j.select(
        "user_id",
        "hour",
        F.when(F.col("sample").isNotNull(), F.col("sample"))
        .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp)
        .alias("value_interp"),
    )


# --------------------------------------------------------------------------
# Recursive CTE (Spark 4): nonlinear integer recurrence over order chains
# --------------------------------------------------------------------------

RECURSIVE_BALANCE_ORACLE = """
WITH RECURSIVE base AS (
  SELECT o_custkey AS c,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS seq,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
acc AS (
  SELECT c, seq, cents AS bal FROM base WHERE seq = 1
  UNION ALL
  SELECT b.c, b.seq, (a.bal * 101) // 100 + b.cents
  FROM acc a JOIN base b ON b.c = a.c AND b.seq = a.seq + 1
)
SELECT c AS o_custkey,
       CAST(MAX(seq) AS BIGINT) AS n_orders,
       CAST(ARG_MAX(bal, seq) AS BIGINT) AS final_balance_cents
FROM acc GROUP BY c
"""


@query("recursive_compound_balance", oracle=RECURSIVE_BALANCE_ORACLE)
def recursive_compound_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 recursive CTE (UNION ALL recursion) driving a NONLINEAR
    integer recurrence: walking each customer's orders in (date, key)
    order, ``bal_n = floor(bal_{n-1} * 101 / 100) + cents_n`` — 1%
    compounding with integer floor between steps. The floor makes the
    recurrence inexpressible as any window aggregate (no prefix-sum
    decomposition exists), which is exactly the class of computation
    recursive CTEs earn their keep on; contrast dedup_clusters, whose
    CYCLIC reachability cannot terminate under Spark 4.1's
    UNION-ALL-only recursion and stays a driver loop (dedup.py).

    Scale shape: recursion depth = the longest per-customer chain (25
    here; bounded by orders-per-customer, not corpus size), and every
    step is one hash join keyed on (customer, seq) — each iteration
    touches only rows that advanced, so total work is O(total orders).
    All arithmetic is integer cents — bit-identical on both engines."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("_rec_orders")
    return spark.sql(
        """
        WITH RECURSIVE base AS (
          SELECT o_custkey AS c,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS seq,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
          FROM _rec_orders
        ),
        acc AS (
          SELECT c, seq, cents AS bal FROM base WHERE seq = 1
          UNION ALL
          SELECT b.c, b.seq, (a.bal * 101) DIV 100 + b.cents
          FROM acc a JOIN base b ON b.c = a.c AND b.seq = a.seq + 1
        )
        SELECT c AS o_custkey,
               CAST(MAX(seq) AS BIGINT) AS n_orders,
               CAST(MAX_BY(bal, seq) AS BIGINT) AS final_balance_cents
        FROM acc GROUP BY c
        """
    )
