"""User-defined-function surface (SURVEY.md §2.4 last row: UDF/UDAF/UDTF).

The reference's only extension point is the compiled plugin pair
F_map/F_reduce (cn/mr_actions.go:146-168) — a UDTF-like flatMap plus a
partition-wide UDAF — which operators/mr_parity.py reproduces. This module
shows the *idiomatic* Spark extension points, each oracle-checked:

- pandas_udf scalar (Arrow-vectorized)             -> udf_price_tier
- applyInPandas grouped UDAF                        -> udaf_customer_stats
- explode-of-expression UDTF shape stays in
  operators/wordcount.py (native explode beats a Python UDTF)

Both run Python; both are Arrow-batched. The oracle twins recompute the
same logic in SQL, proving the UDFs are semantically transparent — which
is exactly the property that lets you swap them for native expressions
when profiling says so.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..registry import query
from ..tables import table


@pandas_udf(T.StringType())
def price_tier(total: pd.Series) -> pd.Series:
    """Vectorized scalar UDF: banding logic on order totals."""
    return pd.cut(
        total,
        bins=[-float("inf"), 50_000, 150_000, float("inf")],
        labels=["low", "mid", "high"],
    ).astype(str)


UDF_TIER_ORACLE = """
SELECT o_orderkey,
  CASE WHEN o_totalprice <= 50000 THEN 'low'
       WHEN o_totalprice <= 150000 THEN 'mid'
       ELSE 'high' END AS tier
FROM orders
"""


@query("udf_price_tier", oracle=UDF_TIER_ORACLE)
def udf_price_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.select("o_orderkey", price_tier("o_totalprice").alias("tier"))


STATS_SCHEMA = T.StructType(
    [
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("n_customers", T.LongType()),
        T.StructField("max_bal", T.DoubleType()),
        T.StructField("min_bal", T.DoubleType()),
        T.StructField("bal_range", T.DoubleType()),
    ]
)


def _nation_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    bal = pdf["c_acctbal"]
    return pd.DataFrame(
        {
            "c_nationkey": [int(pdf["c_nationkey"].iloc[0])],
            "n_customers": [len(pdf)],
            "max_bal": [round(float(bal.max()), 2)],
            "min_bal": [round(float(bal.min()), 2)],
            "bal_range": [round(float(bal.max()) - float(bal.min()), 2)],
        }
    )


UDAF_STATS_ORACLE = """
SELECT c_nationkey,
  COUNT(*) AS n_customers,
  ROUND(MAX(c_acctbal), 2) AS max_bal,
  ROUND(MIN(c_acctbal), 2) AS min_bal,
  ROUND(MAX(c_acctbal) - MIN(c_acctbal), 2) AS bal_range
FROM customer
GROUP BY c_nationkey
"""


@query("udaf_customer_stats", oracle=UDAF_STATS_ORACLE)
def udaf_customer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped UDAF via applyInPandas — min/max are order-insensitive, and
    python round() equals SQL ROUND for these exactly-representable
    comparisons, so the oracle matches despite the Python path."""
    cust = table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").applyInPandas(_nation_stats, STATS_SCHEMA)


# --------------------------------------------------------------------------
# Python UDTF (Spark 3.5+ table function API)
# --------------------------------------------------------------------------

UDTF_TOKENS_ORACLE = """
SELECT d.doc_id, g.i - 1 AS pos, t[g.i] AS token
FROM (SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS t
      FROM documents WHERE doc_id < 50) d,
     range(1, 4) g(i)
WHERE len(t) >= g.i AND t[g.i] <> ''
"""


@query("udtf_first_tokens", oracle=UDTF_TOKENS_ORACLE)
def udtf_first_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real @udtf API (the third leg of UDF/UDAF/UDTF): a Python table
    function emitting (pos, token) rows per document, invoked via LATERAL
    in SQL. DECLARED Python surface — the plan carries a Python UDTF
    stage by design (the idiomatic equivalent is posexplode, used
    everywhere else); restricted to a small doc slice so the gate cost
    stays trivial."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, token: string")
    class FirstTokens:
        def eval(self, text: str, n: int):
            if text is None:
                return  # oracle's string_split(NULL) also yields no rows
            toks = str(text).lower().split()
            for i, t in enumerate(toks[: int(n)]):
                yield i, t

    spark.udtf.register("first_tokens", FirstTokens)
    table(spark, sf_dir, "documents").where(F.col("doc_id") < 50).select(
        "doc_id", "text"
    ).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM _udtf_docs d, LATERAL first_tokens(d.text, 3) t
        """
    )
