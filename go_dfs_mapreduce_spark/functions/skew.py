"""Skew mitigation: two-stage (salted) aggregation.

For Zipf-skewed keys (exactly what word counts over natural text produce),
a single groupBy(key) sends every occurrence of a hot key to one reducer.
Salting splits each key into `n_salts` sub-keys for a first partial
aggregate, then combines partials in a second, tiny aggregate — bounding
any single task's share of a hot key to 1/n_salts.

Spark's map-side partial aggregation already does this when the upstream
operator preserves partitioning, which is why the idiomatic wordcount
doesn't salt. The utility exists for the shapes where partial aggregation
can't engage (e.g. directly after a wide transform or with
spark.sql.aggregate partial disabled) and as the documented pattern for
AQE-resistant *semantic* skew (SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame, key: str | Column, n_salts: int = 8, count_alias: str = "cnt"
) -> DataFrame:
    """groupBy(key).count() computed via salt -> partial -> combine."""
    key_col = F.col(key) if isinstance(key, str) else key
    salted = df.select(
        key_col.alias("_key"),
        F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts)).alias("_salt"),
    )
    partial = salted.groupBy("_key", "_salt").agg(
        F.count(F.lit(1)).alias("_partial")
    )
    return (
        partial.groupBy("_key")
        .agg(F.sum("_partial").alias(count_alias))
        .withColumnRenamed("_key", key if isinstance(key, str) else "key")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Inner equi-join with hot-key salting: the big (skewed) side gets a
    random-ish salt per row; the small side is replicated ``n_salts``
    times so every (key, salt) bucket finds its match. Splits one hot
    key's rows across ``n_salts`` tasks — the manual fallback for joins
    where AQE's size-based skew split can't engage (e.g. the skew is in a
    *derived* key AQE can't see, or the join sits upstream of the
    materialization AQE rebalances). Result set is EXACTLY the plain
    join's (salt columns never escape), which is what makes it
    oracle-checkable."""
    salt = F.pmod(
        F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts)
    )
    big_s = big.withColumn("_salt", salt)
    small_r = small.join(
        F.broadcast(
            big.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    joined = big_s.join(small_r, [key, "_salt"])
    return joined.drop("_salt")
