"""Round-16 A/B: streaming state-partition count for the *_live twins.

VERDICT r15 item 3: the stateful live twins cost ~7 s each; state-store
commit cost is per partition per micro-batch, and _run_live already
scopes shuffle partitions to 8. This A/B measures 8 (ctrl) vs a
size-derived lower count (trt) on representative twins — one plain
aggregation twin (tumbling), one applyInPandasWithState twin (zscore),
one heavy eventtime one (rate_limit_eventtime) — interleaved in one JVM.

Usage: python tools/live_parts_ab_r16.py [--reps 4] [--trt 2] [names...]
"""

from __future__ import annotations

import argparse
import functools
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

DEFAULT = [
    "stream_tumbling_counts_live",
    "stream_zscore_anomalies_live",
    "stream_rate_limit_eventtime_live",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--ctrl", type=int, default=8)
    ap.add_argument("--trt", type=int, default=2)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as mod
    from go_dfs_mapreduce_spark.operators import streaming_batch as sb
    from go_dfs_mapreduce_spark.session import get_spark

    spark = get_spark("live_parts_ab_r16")
    qs = mod.queries()
    names = args.names or DEFAULT

    real = sb._run_live

    def with_parts(n):
        @functools.wraps(real)
        def run(spark_, sf_dir, builder, prefix, shuffle_partitions=8, **kw):
            return real(spark_, sf_dir, builder, prefix,
                        shuffle_partitions=n, **kw)
        return run

    arms = [
        (f"ctrl{args.ctrl}", with_parts(args.ctrl)),
        (f"trt{args.trt}", with_parts(args.trt)),
    ]

    # warm at smoke scale, both arms (also materializes the split memo)
    smoke = "/root/testdata/sf0.001"
    for _, fn in arms:
        sb._run_live = fn
        for n in names:
            qs[n](spark, smoke).write.mode("overwrite").format("noop").save()

    results = {n: {a: [] for a, _ in arms} for n in names}
    # warm the sf-dir split memo once so rep 1 isn't charged the layout
    sb._run_live = real
    qs[names[0]](spark, args.sf_dir).write.mode("overwrite").format("noop").save()

    for rep in range(args.reps):
        for n in names:
            for aname, fn in arms:
                sb._run_live = fn
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"{n}:{aname}:{rep}")
                t0 = time.time()
                qs[n](spark, args.sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                results[n][aname].append(time.time() - t0)
    sb._run_live = real

    print(f"{'query':<40} {'ctrl8':>8} {'trt':>8} {'delta%':>7}")
    for n in names:
        c = results[n][arms[0][0]]
        t = results[n][arms[1][0]]
        cm, tm = statistics.median(c), statistics.median(t)
        print(f"{n:<40} {cm:>8.2f} {tm:>8.2f} {100*(tm-cm)/cm:>+6.1f}%")

    # output equality ctrl vs trt
    for n in names:
        sb._run_live = with_parts(args.ctrl)
        ref = sorted(map(tuple, qs[n](spark, args.sf_dir).collect()))
        sb._run_live = with_parts(args.trt)
        got = sorted(map(tuple, qs[n](spark, args.sf_dir).collect()))
        print(f"equal[{n}] = {got == ref}")
    sb._run_live = real
    spark.stop()


if __name__ == "__main__":
    main()
