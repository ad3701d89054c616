"""Semantic tests for the incremental-maintenance operators.

The oracle gate proves value equality vs DuckDB; these pin the MERGE /
SCD2 / rollup-merge *semantics* directly (the properties a user relies
on), so a refactor that kept hash equality by changing both sides would
still be caught.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from go_dfs_mapreduce_spark.operators.incremental import (
    _INSERT_OFFSET,
    incremental_rollup_merge,
    merge_upsert_orders,
    scd2_user_status,
)
from go_dfs_mapreduce_spark.tables import table

from conftest import SF_SMOKE


def test_merge_applies_cdc_ops(spark):
    orders = table(spark, SF_SMOKE, "orders")
    merged = merge_upsert_orders(spark, SF_SMOKE)
    m = merged.agg(
        F.sum(F.when(F.col("o_orderkey") % 10 == 0, 1).otherwise(0)).alias(
            "deleted_still_there"
        ),
        F.sum(
            F.when(F.col("o_orderkey") >= _INSERT_OFFSET, 1).otherwise(0)
        ).alias("inserted"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    o = orders.agg(
        F.sum(F.when(F.col("o_orderkey") % 10 == 0, 1).otherwise(0)).alias(
            "dels"
        ),
        F.sum(F.when(F.col("o_orderkey") % 10 == 3, 1).otherwise(0)).alias(
            "ins"
        ),
        F.count(F.lit(1)).alias("n"),
    ).first()
    # deletes removed, inserts added, everything else kept
    assert m.deleted_still_there == 0
    assert m.inserted == o.ins
    assert m.n == o.n - o.dels + o.ins
    # updated rows carry the new status and a strictly raised price
    upd = (
        merged.where((F.col("o_orderkey") % 10).isin(1, 2))
        .where(F.col("o_orderkey") < _INSERT_OFFSET)
    )
    assert upd.where(F.col("o_orderstatus") != "U").count() == 0
    joined = upd.join(
        orders.select("o_orderkey", "o_totalprice"), "o_orderkey"
    ).where(F.col("price") <= F.col("o_totalprice"))
    assert joined.count() == 0


def test_scd2_intervals_tile_each_user_timeline(spark):
    hist = scd2_user_status(spark, SF_SMOKE)
    # exactly one open (current) interval per user
    open_per_user = hist.groupBy("user_id").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_open")
    )
    assert open_per_user.where(F.col("n_open") != 1).count() == 0
    # intervals are disjoint and contiguous: valid_to of version v equals
    # valid_from of version v+1 (lead construction), and valid_from is
    # strictly increasing per user
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("version")
    bad = (
        hist.withColumn("next_from", F.lead("valid_from").over(w))
        .where(F.col("valid_to").isNotNull())
        .where(
            (F.col("valid_to") != F.col("next_from"))
            | (F.col("valid_from") >= F.col("valid_to"))
        )
    )
    # valid_from == valid_to can only happen when consecutive DIFFERENT
    # event types share one timestamp; the (ts, event_id) tiebreak makes
    # the order deterministic but the interval zero-width — allowed.
    assert bad.where(F.col("valid_from") > F.col("valid_to")).count() == 0
    assert bad.where(F.col("valid_to") != F.col("next_from")).count() == 0
    # adjacent versions never carry the same attribute value (runs are
    # maximal)
    same = (
        hist.withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
        .where(F.col("event_type") == F.col("next_type"))
    )
    assert same.count() == 0


def test_rollup_merge_equals_direct_recompute(spark):
    merged = incremental_rollup_merge(spark, SF_SMOKE)
    events = table(spark, SF_SMOKE, "events")
    micro = "CAST(CAST(ROUND(value * 1000000) AS BIGINT) AS DECIMAL(38,0))"
    direct = events.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.sum(F.expr(micro)).cast("double") / F.lit(1000000.0))
        .cast("double")
        .alias("value_sum"),
    )
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
