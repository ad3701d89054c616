"""Round-16 interleaved variant A/B for graph_common_neighbors_topk.

Arms (full query, noop sink, cache cleared per rep, arms alternating):
  A  ctrl: r15 shape (SMJ wedge self-join + repartition(4P, pk2) + groupBy)
  B  SHUFFLE_HASH hint on the wedge self-join (no sort, no match buffering)
  C  B + codegen fast-hash-map sized to the agg's real cardinality
     (capacityBit 20) + fast map for the final agg too (partialOnly=false)
  D  C + repartition(2P) instead of 4P

Each arm's output is checked row-identical against ctrl once at the end.

Usage: python tools/cn_variants_r16.py [--reps 4]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def build(spark, sf_dir, shj: bool, parts_factor: int):
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
    b = (adj.hint("SHUFFLE_HASH") if shj else adj).alias("b")
    packed = F.expr(
        "CASE WHEN a.nb BETWEEN 0 AND 2147483647 "
        "AND b.nb BETWEEN 0 AND 2147483647 "
        "THEN a.nb * 4294967296 + b.nb "
        "ELSE raise_error('common_neighbors_topk: node id outside "
        "[0, 2^31) breaks the packed pair key (negative ids mispack "
        "under shiftright/%); widen to a two-column key') END"
    )
    wedge_parts = parts_factor * spark.sparkContext.defaultParallelism
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

    spark = get_spark("cn_variants_r16")

    FASTMAP = {
        "spark.sql.codegen.aggregate.fastHashMap.capacityBit": "20",
        "spark.sql.codegen.aggregate.map.twolevel.partialOnly": "false",
    }
    DEFAULTS = {
        "spark.sql.codegen.aggregate.fastHashMap.capacityBit": "16",
        "spark.sql.codegen.aggregate.map.twolevel.partialOnly": "true",
    }

    ARMS = [
        ("A_ctrl_r15", dict(shj=False, parts_factor=4), DEFAULTS),
        ("B_shj", dict(shj=True, parts_factor=4), DEFAULTS),
        ("C_shj_fastmap", dict(shj=True, parts_factor=4), FASTMAP),
        ("D_shj_fastmap_2P", dict(shj=True, parts_factor=2), FASTMAP),
    ]

    # warmup each arm once at sf0.001
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
    for k, v in DEFAULTS.items():
        spark.conf.set(k, v)

    print(f"{'arm':<22} {'med_s':>8} {'min_s':>8}")
    for name, _, _ in ARMS:
        r = results[name]
        print(f"{name:<22} {statistics.median(r):>8.2f} {min(r):>8.2f}")

    # output equality vs ctrl
    ref = sorted(map(tuple, build(spark, args.sf_dir, shj=False, parts_factor=4).collect()))
    for name, kw, conf in ARMS[1:]:
        for k, v in conf.items():
            spark.conf.set(k, v)
        got = sorted(map(tuple, build(spark, args.sf_dir, **kw).collect()))
        print(f"equal[{name}] = {got == ref}")
    spark.stop()


if __name__ == "__main__":
    main()
