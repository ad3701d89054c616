"""Round-16 stage breakdown probe for graph_common_neighbors_topk.

Times sub-plans of the wedge pipeline with the noop sink (guide §1.4)
so the wall can be attributed: wedge generation (self-join + packed
projection), + exchange, + aggregation, + anti-join/top-k tail.

Usage: python tools/cn_probe_r16.py [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def timed(spark, label, df, reps):
    outs = []
    for i in range(reps):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"{label}:{i}")
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        outs.append(time.time() - t0)
    print(f"{label:<44} med={statistics.median(outs):7.2f}s min={min(outs):7.2f}s")
    return statistics.median(outs)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.operators import graph as G
    from go_dfs_mapreduce_spark.session import get_spark

    spark = get_spark("cn_probe_r16")
    edges = G._edges(spark, args.sf_dir)

    deg = G._degrees(edges)
    hubs = deg.where(F.col("d") > G.CN_APEX_CAP).select("pk")
    fwd = edges.join(
        F.broadcast(hubs.withColumnRenamed("pk", "u")), "u", "left_anti"
    ).select(F.col("u").alias("apex"), F.col("v").alias("nb"))
    rev = edges.join(
        F.broadcast(hubs.withColumnRenamed("pk", "v")), "v", "left_anti"
    ).select(F.col("v").alias("apex"), F.col("u").alias("nb"))
    adj = fwd.unionAll(rev)
    a, b = adj.alias("a"), adj.alias("b")
    packed = F.expr("a.nb * 4294967296 + b.nb")
    wedges = a.join(
        b, (F.col("a.apex") == F.col("b.apex")) & (F.col("a.nb") < F.col("b.nb"))
    ).select(packed.alias("pk2"))

    cores = spark.sparkContext.defaultParallelism
    print(f"defaultParallelism={cores}")
    n_edges = edges.count()
    n_wedges = wedges.count()
    print(f"edges={n_edges}  wedges={n_wedges}")

    reps = args.reps
    timed(spark, "1. wedges only (join+pack, no agg)", wedges, reps)
    timed(
        spark,
        "2. + repartition(4x) only (no agg)",
        wedges.repartition(4 * cores, "pk2"),
        reps,
    )
    agg = (
        wedges.repartition(4 * cores, "pk2")
        .groupBy("pk2")
        .agg(F.count(F.lit(1)).alias("cn"))
        .where(F.col("cn") >= G.CN_MIN_CN)
    )
    timed(spark, "3. + groupBy.count + cn>=2 (r15 shape)", agg, reps)
    timed(spark, "4. full query (r15 shape)", G.graph_common_neighbors_topk(spark, args.sf_dir), reps)
    spark.stop()


if __name__ == "__main__":
    main()
