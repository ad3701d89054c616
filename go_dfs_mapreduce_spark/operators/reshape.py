"""Reshaping operators: pivot, unpivot, grouped array aggregation.

Not present in the reference (its only output shape is KV text lines) but
part of any complete analytics surface. Oracles use portable formulations:
pivot = COUNT(CASE ...) per fixed category (the category list is pinned so
the schema is deterministic — at scale you never let pivot infer columns
with an extra pass), unpivot = UNION ALL, array agg = sorted distinct
lists on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

PIVOT_ORACLE = f"""
SELECT user_id,
  {', '.join(f"COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}" for t in EVENT_TYPES)}
FROM events
GROUP BY user_id
"""


@query("pivot_event_counts", oracle=PIVOT_ORACLE)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    df = (
        e.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    # COUNT over an empty pivot cell is NULL in Spark but 0 in SQL COUNT(CASE)
    return df.na.fill(0, EVENT_TYPES)


UNPIVOT_ORACLE = """
SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
UNION ALL
SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value FROM customer
"""


@query("unpivot_customer_metrics", oracle=UNPIVOT_ORACLE)
def unpivot_customer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return cust.unpivot(
        ["c_custkey"], ["acctbal", "nationkey"], "metric", "value"
    )


ARRAY_AGG_ORACLE = """
SELECT source,
  array_to_string(list_sort(list_distinct(list(lang))), ',') AS langs,
  COUNT(*) AS n_docs
FROM documents
GROUP BY source
"""


@query("array_agg_langs_per_source", oracle=ARRAY_AGG_ORACLE)
def array_agg_langs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The grouped-array aggregate is the operator under test; the sorted
    # array is serialized to CSV because the driver's order-insensitive
    # value hash canonicalizes via pandas sort, which cannot order
    # list-typed cells (round-2 driver failure: unhashable type 'list').
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.array_join(F.array_sort(F.collect_set("lang")), ",").alias("langs"),
        F.count(F.lit(1)).alias("n_docs"),
    )
