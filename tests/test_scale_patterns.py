"""Scale-pattern tests: salting correctness, bucketed-join shuffle
elision — the plan-level evidence behind SCALE.md's claims."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_dfs_mapreduce_spark.functions.skew import salted_count
from go_dfs_mapreduce_spark.plans import audit_plan
from go_dfs_mapreduce_spark.sources.bucketing import cobucketed_join, write_bucketed
from go_dfs_mapreduce_spark.tables import table


def test_salted_count_matches_plain_groupby(spark, sf_dir):
    from go_dfs_mapreduce_spark.functions.text import exploded_words

    docs = table(spark, sf_dir, "documents")
    words = exploded_words(docs, "text")
    plain = {r.word: r.cnt for r in
             words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    salted = {r.word: r.cnt for r in salted_count(words, "word", n_salts=8).collect()}
    assert salted == plain


def test_bucketed_join_elides_shuffle(spark, sf_dir, tmp_path):
    # NB: warehouse dir is a static conf, set in session.py
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try:
        orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        li = table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
        )
        write_bucketed(orders, "b_orders", "o_orderkey", 8)
        write_bucketed(li, "b_lineitem", "o_orderkey", 8)

        bucketed = cobucketed_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        a_bucketed = audit_plan(bucketed)

        plain = orders.join(li, ["o_orderkey"])
        a_plain = audit_plan(plain)

        assert a_plain["n_exchanges"] >= 2, "unbucketed join should shuffle both sides"
        assert a_bucketed["n_exchanges"] == 0, a_bucketed["plan"][:2000]
        # and the join result is identical either way
        assert bucketed.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
