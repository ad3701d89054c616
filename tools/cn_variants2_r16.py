"""Round-16 common_neighbors variant A/B, round 2 (after SHJ won round 1).

Arms (full query, noop sink, cache cleared per rep, interleaved):
  B  SHJ + repartition(4P) + hash agg            (round-1 winner)
  E  SHJ + repartition(4P) + sortWithinPartitions + SortAggregate
     (spark.sql.execution.replaceHashWithSortAgg=true: radix sort of
      8-byte keys + streaming count replaces the double hash pass)
  F  SHJ + repartition(8P) + hash agg            (smaller per-task maps)
  G  SHJ + repartition(8P) + fastmap capacity 20

Usage: python tools/cn_variants2_r16.py [--reps 4]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def build(spark, sf_dir, parts_factor: int, sort_agg: bool):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.operators import graph as G

    edges = G._edges(spark, sf_dir)
    deg = G._degrees(edges)
    hubs = deg.where(F.col("d") > G.CN_APEX_CAP).select("pk")
    fwd = edges.join(
        F.broadcast(hubs.withColumnRenamed("pk", "u")), "u", "left_anti"
    ).select(F.col("u").alias("apex"), F.col("v").alias("nb"))
    rev = edges.join(
        F.broadcast(hubs.withColumnRenamed("pk", "v")), "v", "left_anti"
    ).select(F.col("v").alias("apex"), F.col("u").alias("nb"))
    adj = fwd.unionAll(rev)
    a = adj.alias("a")
    b = adj.hint("SHUFFLE_HASH").alias("b")
    packed = F.expr("a.nb * 4294967296 + b.nb")
    wedge_parts = parts_factor * spark.sparkContext.defaultParallelism
    w0 = (
        a.join(b, (F.col("a.apex") == F.col("b.apex")) & (F.col("a.nb") < F.col("b.nb")))
        .select(packed.alias("pk2"))
        .repartition(wedge_parts, "pk2")
    )
    if sort_agg:
        w0 = w0.sortWithinPartitions("pk2")
    pairs = (
        w0.groupBy("pk2")
        .agg(F.count(F.lit(1)).alias("cn"))
        .where(F.col("cn") >= G.CN_MIN_CN)
        .select(
            F.shiftright("pk2", 32).alias("p1"),
            (F.col("pk2") % F.lit(1 << 32)).alias("p2"),
            "cn",
        )
    )
    nonedges = pairs.join(
        edges, (pairs.p1 == edges.u) & (pairs.p2 == edges.v), "left_anti"
    )
    topk = (
        nonedges.select(
            F.col("p1").alias("part_a"),
            F.col("p2").alias("part_b"),
            F.col("cn").alias("common_neighbors"),
        )
        .orderBy(F.desc("common_neighbors"), "part_a", "part_b")
        .limit(G.CN_TOPK)
    )
    w = Window.orderBy(F.desc("common_neighbors"), "part_a", "part_b")
    return topk.withColumn("rank", F.row_number().over(w).cast("int"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    from go_dfs_mapreduce_spark.session import get_spark

    spark = get_spark("cn_variants2_r16")

    D = {
        "spark.sql.execution.replaceHashWithSortAgg": "false",
        "spark.sql.codegen.aggregate.fastHashMap.capacityBit": "16",
    }
    ARMS = [
        ("B_shj_4P_hash", dict(parts_factor=4, sort_agg=False), D),
        (
            "E_shj_4P_sortagg",
            dict(parts_factor=4, sort_agg=True),
            {**D, "spark.sql.execution.replaceHashWithSortAgg": "true"},
        ),
        ("F_shj_8P_hash", dict(parts_factor=8, sort_agg=False), D),
        (
            "G_shj_8P_fastmap",
            dict(parts_factor=8, sort_agg=False),
            {**D, "spark.sql.codegen.aggregate.fastHashMap.capacityBit": "20"},
        ),
    ]

    smoke = "/root/testdata/sf0.001"
    for name, kw, conf in ARMS:
        for k, v in conf.items():
            spark.conf.set(k, v)
        build(spark, smoke, **kw).write.mode("overwrite").format("noop").save()

    results = {name: [] for name, _, _ in ARMS}
    for rep in range(args.reps):
        for name, kw, conf in ARMS:
            for k, v in conf.items():
                spark.conf.set(k, v)
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name}:{rep}")
            t0 = time.time()
            build(spark, args.sf_dir, **kw).write.mode("overwrite").format(
                "noop"
            ).save()
            results[name].append(time.time() - t0)
    for k, v in D.items():
        spark.conf.set(k, v)

    print(f"{'arm':<22} {'med_s':>8} {'min_s':>8}")
    for name, _, _ in ARMS:
        r = results[name]
        print(f"{name:<22} {statistics.median(r):>8.2f} {min(r):>8.2f}")

    ref = sorted(map(tuple, build(spark, args.sf_dir, parts_factor=4, sort_agg=False).collect()))
    for name, kw, conf in ARMS[1:]:
        for k, v in conf.items():
            spark.conf.set(k, v)
        got = sorted(map(tuple, build(spark, args.sf_dir, **kw).collect()))
        print(f"equal[{name}] = {got == ref}")
    spark.stop()


if __name__ == "__main__":
    main()
