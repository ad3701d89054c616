"""Decompose the per-job floor on this box (r15, guide §1).

Measures, on an idle box, the steady-state cost of:
  a) a 1-task job                  (spark.range(1).count())
  b) a trivial noop write          (range(1) -> noop)
  c) a 32-partition shuffle query  (range groupBy) under
       - default AQE coalesce (parallelismFirst=true)
       - size-based coalesce  (parallelismFirst=false, advisory 64m)
  d) a window query over orders (sf0.1) under both coalesce policies

The point: headline queries at sf0.1 are 2-5 jobs x a few hundred ms while
their real compute is tens of ms; whatever the floor decomposes into is the
dominant bench term and the thing to shrink WITHOUT local-only constants.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def timeit(fn, reps=7):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append((time.time() - t0) * 1000)
    return statistics.median(ts), min(ts)


def run(parallelism_first: str):
    from pyspark.sql import SparkSession

    from go_dfs_mapreduce_spark.session import get_spark

    extra = {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": parallelism_first,
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    }
    spark = get_spark("floor_probe", extra_conf=extra)
    print(
        "parallelismFirst =",
        spark.conf.get("spark.sql.adaptive.coalescePartitions.parallelismFirst"),
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    # warmups
    spark.range(1).count()
    spark.range(1).write.mode("overwrite").format("noop").save()

    m, lo = timeit(lambda: spark.range(1).count())
    print(f"a) range(1).count():            med {m:6.0f} ms  min {lo:6.0f} ms")

    m, lo = timeit(
        lambda: spark.range(1).write.mode("overwrite").format("noop").save()
    )
    print(f"b) range(1) noop write:         med {m:6.0f} ms  min {lo:6.0f} ms")

    def shuffle_q():
        (
            spark.range(0, 1_000_000, 1, 32)
            .groupBy((F.col("id") % 1000).alias("k"))
            .count()
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    shuffle_q()
    m, lo = timeit(shuffle_q)
    print(f"c) 1M-row shuffle agg noop:     med {m:6.0f} ms  min {lo:6.0f} ms")

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))

    def window_q():
        from pyspark.sql import Window

        w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
        (
            orders.withColumn("rk", F.row_number().over(w))
            .where("rk <= 3")
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    window_q()
    m, lo = timeit(window_q)
    print(f"d) orders window top-3 noop:    med {m:6.0f} ms  min {lo:6.0f} ms")
    spark.stop()


if __name__ == "__main__":
    for pf in sys.argv[1:] or ["true", "false"]:
        run(pf)
