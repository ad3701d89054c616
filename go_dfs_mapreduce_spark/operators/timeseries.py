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
