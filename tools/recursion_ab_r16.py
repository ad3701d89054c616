"""Round-16 A/B: k-step-per-level recursion for recursive_compound_balance.

The r15 residual (~5.6 s) is depth-25 UnionLoop per-level join/stage
machinery. Idea (VERDICT r15 item 4, generalized): precompute each
position's NEXT k-1 cents values with lead() in the same window pass that
ranks the orders, so one join per level advances the recurrence k steps —
depth ceil(24/k) instead of 24, still exactly one join per level.

Arms: k=1 (current shape), k=2, k=4, k=6 — interleaved, noop sink,
cache cleared per rep; sorted-output equality vs k=1 checked at the end.

Usage: python tools/recursion_ab_r16.py [--reps 4]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def build(spark, sf_dir, k: int):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.tables import table

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cols = [
        F.col("o_custkey").alias("c"),
        F.row_number().over(w).alias("seq"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    ]
    cols += [
        F.lead(
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"), j
        ).over(w).alias(f"d{j}")
        for j in range(1, k)
    ]
    base = table(spark, sf_dir, "orders").select(*cols).cache()
    base.count()
    view = f"_rec_base_k{k}"
    base.createOrReplaceTempView(view)

    # step expressions: bal_0 = step(a.bal, b.cents); bal_j = step(bal_{j-1}, d_j)
    bal = ["(a.bal * 101) DIV 100 + b.cents"]
    for j in range(1, k):
        bal.append(f"(({bal[j-1]}) * 101) DIV 100 + b.d{j}")
    if k == 1:
        seq_expr = "b.seq"
        bal_expr = bal[0]
    else:
        seq_parts = " ".join(
            f"WHEN b.d{j} IS NOT NULL THEN b.seq + {j}"
            for j in range(k - 1, 0, -1)
        )
        seq_expr = f"CASE {seq_parts} ELSE b.seq END"
        bal_parts = " ".join(
            f"WHEN b.d{j} IS NOT NULL THEN {bal[j]}"
            for j in range(k - 1, 0, -1)
        )
        bal_expr = f"CASE {bal_parts} ELSE {bal[0]} END"

    return spark.sql(
        f"""
        WITH RECURSIVE acc AS (
          SELECT c, seq, cents AS bal FROM {view} WHERE seq = 1
          UNION ALL
          SELECT a.c, {seq_expr} AS seq, {bal_expr} AS bal
          FROM acc a JOIN {view} b ON b.c = a.c AND b.seq = a.seq + 1
        )
        SELECT c AS o_custkey,
               CAST(MAX(seq) AS BIGINT) AS n_orders,
               CAST(MAX_BY(bal, seq) AS BIGINT) AS final_balance_cents
        FROM acc GROUP BY c
        """
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--ks", default="1,2,4,6")
    args = ap.parse_args()

    from go_dfs_mapreduce_spark.session import get_spark

    spark = get_spark("recursion_ab_r16")
    ks = [int(x) for x in args.ks.split(",")]

    smoke = "/root/testdata/sf0.001"
    for k in ks:
        build(spark, smoke, k).write.mode("overwrite").format("noop").save()

    results = {k: [] for k in ks}
    for rep in range(args.reps):
        for k in ks:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"rec_k{k}:{rep}")
            t0 = time.time()
            build(spark, args.sf_dir, k).write.mode("overwrite").format(
                "noop"
            ).save()
            results[k].append(time.time() - t0)

    print(f"{'arm':<10} {'med_s':>8} {'min_s':>8}")
    for k in ks:
        r = results[k]
        print(f"k={k:<8} {statistics.median(r):>8.2f} {min(r):>8.2f}")

    ref = sorted(map(tuple, build(spark, args.sf_dir, 1).collect()))
    for k in ks[1:]:
        got = sorted(map(tuple, build(spark, args.sf_dir, k).collect()))
        print(f"equal[k={k}] = {got == ref}")
    spark.stop()


if __name__ == "__main__":
    main()
