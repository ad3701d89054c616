"""Round-15: count Spark JOBS (and their stages/tasks) per headline query.

The floor probe (tools/floor_probe_r15.py) measured a 150-300 ms
scheduling floor PER JOB on this box; a query that runs J jobs pays J
floors before any data work. This probe attributes jobs to queries via a
per-query job group and reports jobs / stages / tasks alongside wall time,
so "which headline numbers are floor-bound?" is measured, not guessed.

Usage: python tools/jobcount_probe_r15.py [--sf-dir /root/testdata/sf0.1] [names...]
"""

from __future__ import annotations

import argparse
import os
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
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as mod
    from go_dfs_mapreduce_spark.session import get_spark
    from go_dfs_mapreduce_spark.tables import SMOKE_SF_DIR

    spark = get_spark("jobcount_probe_r15")
    sc = spark.sparkContext
    qs = mod.queries()
    names = args.names or [n for n in HEADLINE if n in qs]

    for t in ("region", "lineitem", "orders", "customer", "events",
              "documents", "embeddings"):
        spark.read.parquet(os.path.join(args.sf_dir, f"{t}.parquet")).count()
    for name in names:
        qs[name](spark, SMOKE_SF_DIR).write.mode("overwrite").format(
            "noop").save()

    tracker = sc.statusTracker()
    print(f"{'query':34s} {'jobs':>5s} {'stages':>7s} {'tasks':>6s} {'wall_ms':>8s}")
    for name in names:
        spark.catalog.clearCache()
        sc.setJobGroup(name, name)
        t0 = time.time()
        qs[name](spark, args.sf_dir).write.mode("overwrite").format(
            "noop").save()
        wall = (time.time() - t0) * 1000
        sc.setJobGroup("", "")
        job_ids = tracker.getJobIdsForGroup(name)
        n_stages = n_tasks = 0
        for jid in job_ids:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numCompletedTasks > 0:
                    n_stages += 1
                    n_tasks += si.numTasks
        print(f"{name:34s} {len(job_ids):5d} {n_stages:7d} {n_tasks:6d} {wall:8.0f}")
    spark.stop()


if __name__ == "__main__":
    main()
