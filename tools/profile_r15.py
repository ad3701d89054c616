"""Round-15 optimization profiler.

For each headline query: time (a) builder+planning (driver-side, Python +
Catalyst analysis) and (b) noop-sink execution, separately, over N reps;
optionally dump explain("formatted") to plans/r15/.

Usage:
    python tools/profile_r15.py [--sf-dir /root/testdata/sf0.1]
        [--reps 3] [--dump-plans plans/r15 --suffix before] [names...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "wordcount",
    "log_top_domains",
    "window_rank_topk_per_customer",
    "asof_join_last_purchase",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "stream_session_windows",
    "mr_wordcount",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dump-plans", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as mod
    from go_dfs_mapreduce_spark.session import get_spark
    from go_dfs_mapreduce_spark.tables import SMOKE_SF_DIR

    spark = get_spark("profile_r15")
    qs = mod.queries()
    names = args.names or [n for n in HEADLINE if n in qs]

    # same warm-up as bench.py: footers + codegen classes
    for t in ("region", "lineitem", "orders", "customer", "events",
              "documents", "embeddings"):
        spark.read.parquet(os.path.join(args.sf_dir, f"{t}.parquet")).count()
    for name in names:
        qs[name](spark, SMOKE_SF_DIR).write.mode("overwrite").format(
            "noop").save()

    print(f"{'query':34s} {'plan_ms':>8s} {'exec_ms':>9s} {'total_ms':>9s}")
    for name in names:
        plan_ts, exec_ts = [], []
        for _ in range(args.reps):
            spark.catalog.clearCache()
            t0 = time.time()
            df = qs[name](spark, args.sf_dir)
            # force analysis + physical planning without executing
            df._jdf.queryExecution().executedPlan()
            t1 = time.time()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.time()
            plan_ts.append((t1 - t0) * 1000)
            exec_ts.append((t2 - t1) * 1000)
        p = statistics.median(plan_ts)
        e = statistics.median(exec_ts)
        print(f"{name:34s} {p:8.0f} {e:9.0f} {p + e:9.0f}")
        if args.dump_plans:
            os.makedirs(args.dump_plans, exist_ok=True)
            df = qs[name](spark, args.sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"))
            with open(os.path.join(args.dump_plans,
                                   f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(txt)
    spark.stop()


if __name__ == "__main__":
    main()
