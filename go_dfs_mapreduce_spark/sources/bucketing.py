"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the orders⋈lineitem class of join dominates shuffle volume.
Bucketing both fact tables by the join key at write time ships the shuffle
once (at ingest) and amortizes it over every subsequent join:
``bucketBy(n, key).sortBy(key)`` + ``saveAsTable`` → Spark's scan reports
the bucketing, and SortMergeJoin elides both Exchange nodes.

tests/test_scale_patterns.py proves the property at the plan level: the same
join has 2 Exchanges unbucketed and 0 bucketed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table_name: str, key: str, n_buckets: int = 16
) -> None:
    (
        df.write.format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .saveAsTable(table_name)
    )


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
