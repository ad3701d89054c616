"""Round-16 common_neighbors variant A/B, round 3.

Arms (full query, noop sink, cache cleared per rep, interleaved):
  B  SHJ + guard-per-wedge pack (r15 CASE/raise_error on every wedge row)
  H  SHJ + guard moved to the 2.4M-row adjacency (148M wedge rows pack
     with a bare multiply+add; every wedge nb passes through adj, so the
     guard still fires in-plan the moment an id is out of range)
  I  H + explicit F.broadcast on the non-edge anti-join's edge side

Usage: python tools/cn_variants3_r16.py [--reps 5]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

GUARD = (
    "CASE WHEN nb BETWEEN 0 AND 2147483647 THEN nb "
    "ELSE raise_error('common_neighbors_topk: node id outside "
    "[0, 2^31) breaks the packed pair key (negative ids mispack "
    "under shiftright/%); widen to a two-column key') END"
)


def build(spark, sf_dir, guard_on_adj: bool, bc_anti: bool):
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
    if guard_on_adj:
        adj = adj.select("apex", F.expr(GUARD).alias("nb"))
        packed = F.expr("a.nb * 4294967296 + b.nb")
    else:
        packed = F.expr(
            "CASE WHEN a.nb BETWEEN 0 AND 2147483647 "
            "AND b.nb BETWEEN 0 AND 2147483647 "
            "THEN a.nb * 4294967296 + b.nb "
            "ELSE raise_error('common_neighbors_topk: node id outside "
            "[0, 2^31) breaks the packed pair key (negative ids mispack "
            "under shiftright/%); widen to a two-column key') END"
        )
    a = adj.alias("a")
    b = adj.hint("SHUFFLE_HASH").alias("b")
    wedge_parts = 4 * spark.sparkContext.defaultParallelism
    pairs = (
        a.join(b, (F.col("a.apex") == F.col("b.apex")) & (F.col("a.nb") < F.col("b.nb")))
        .select(packed.alias("pk2"))
        .repartition(wedge_parts, "pk2")
        .groupBy("pk2")
        .agg(F.count(F.lit(1)).alias("cn"))
        .where(F.col("cn") >= G.CN_MIN_CN)
        .select(
            F.shiftright("pk2", 32).alias("p1"),
            (F.col("pk2") % F.lit(1 << 32)).alias("p2"),
            "cn",
        )
    )
    anti_side = F.broadcast(edges) if bc_anti else edges
    nonedges = pairs.join(
        anti_side, (pairs.p1 == edges.u) & (pairs.p2 == edges.v), "left_anti"
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
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from go_dfs_mapreduce_spark.session import get_spark

    spark = get_spark("cn_variants3_r16")

    ARMS = [
        ("B_guard_wedge", dict(guard_on_adj=False, bc_anti=False)),
        ("H_guard_adj", dict(guard_on_adj=True, bc_anti=False)),
        ("I_guard_adj_bc", dict(guard_on_adj=True, bc_anti=True)),
    ]

    smoke = "/root/testdata/sf0.001"
    for name, kw in ARMS:
        build(spark, smoke, **kw).write.mode("overwrite").format("noop").save()

    results = {name: [] for name, _ in ARMS}
    for rep in range(args.reps):
        for name, kw in ARMS:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name}:{rep}")
            t0 = time.time()
            build(spark, args.sf_dir, **kw).write.mode("overwrite").format(
                "noop"
            ).save()
            results[name].append(time.time() - t0)

    print(f"{'arm':<22} {'med_s':>8} {'min_s':>8}")
    for name, _ in ARMS:
        r = results[name]
        print(f"{name:<22} {statistics.median(r):>8.2f} {min(r):>8.2f}")

    ref = sorted(map(tuple, build(spark, args.sf_dir, guard_on_adj=False, bc_anti=False).collect()))
    for name, kw in ARMS[1:]:
        got = sorted(map(tuple, build(spark, args.sf_dir, **kw).collect()))
        print(f"equal[{name}] = {got == ref}")
    spark.stop()


if __name__ == "__main__":
    main()
