"""Round-15 all-query triage: plan+exec time for EVERY registered query.

Times, for each ``queries()`` entry: (a) builder+analysis+physical planning
(driver-side) and (b) noop-sink execution, over N reps (median), and writes
one TSV row per query. This is the guide §1 "measure first" sweep that
ranks the non-headline families for optimization; the headline queries are
covered separately by tools/profile_r15.py.

Usage:
    python tools/triage_all_r15.py [--sf-dir /root/testdata/sf0.1]
        [--reps 2] [--out /tmp/triage_r15.tsv] [names...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time
import traceback

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default="/tmp/triage_r15.tsv")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as mod
    from go_dfs_mapreduce_spark.session import get_spark

    spark = get_spark("triage_r15")
    qs = mod.queries()
    names = args.names or list(qs)

    # warm scan footers + codegen once so rep medians measure steady state
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).count()

    import inspect

    with open(args.out, "w") as out:
        out.write("query\tmodule\tplan_ms\texec_ms\ttotal_ms\terr\n")
        for i, name in enumerate(names):
            fn = qs[name]
            m = inspect.getmodule(fn)
            modname = m.__name__.rsplit(".", 1)[-1] if m else "?"
            plan_ts, exec_ts, err = [], [], ""
            try:
                for _ in range(args.reps):
                    spark.catalog.clearCache()
                    spark.sparkContext.setJobDescription(f"triage:{name}")
                    t0 = time.time()
                    df = fn(spark, args.sf_dir)
                    df._jdf.queryExecution().executedPlan()
                    t1 = time.time()
                    df.write.mode("overwrite").format("noop").save()
                    t2 = time.time()
                    plan_ts.append((t1 - t0) * 1000)
                    exec_ts.append((t2 - t1) * 1000)
                p = statistics.median(plan_ts)
                e = statistics.median(exec_ts)
            except Exception as ex:  # noqa: BLE001 - triage must not abort
                p = statistics.median(plan_ts) if plan_ts else float("nan")
                e = statistics.median(exec_ts) if exec_ts else float("nan")
                err = f"{type(ex).__name__}: {ex}".split("\n")[0][:200]
                traceback.print_exc(limit=3)
            out.write(f"{name}\t{modname}\t{p:.0f}\t{e:.0f}\t{p + e:.0f}\t{err}\n")
            out.flush()
            print(f"[{i + 1}/{len(names)}] {name:44s} plan={p:7.0f} exec={e:8.0f} {err}",
                  flush=True)


if __name__ == "__main__":
    main()
