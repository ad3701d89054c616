"""Round-16 driver plan-time profiler (VERDICT r15 item 5).

For each named query: median BUILDER time (the Python call that returns
the DataFrame — Python work + py4j traffic + Catalyst analysis), the
py4j send_command roundtrip count for one build, and the top Python
functions by cumulative time from cProfile.

Usage: python tools/plantime_profile_r16.py [--reps 3] name [name...]
"""

from __future__ import annotations

import argparse
import cProfile
import os
import pstats
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as mod
    from go_dfs_mapreduce_spark.session import get_spark

    spark = get_spark("plantime_r16")
    qs = mod.queries()

    for name in args.names:
        # warm: first build pays memo populates / derived builds
        qs[name](spark, args.sf_dir)
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            qs[name](spark, args.sf_dir)
            times.append(time.time() - t0)
        prof = cProfile.Profile()
        prof.enable()
        qs[name](spark, args.sf_dir)
        prof.disable()
        st = pstats.Stats(prof)
        n_cmd = 0
        for (fn, line, func), (cc, nc, tt, ct, callers) in st.stats.items():
            if func == "send_command" and "java_gateway" in fn:
                n_cmd = max(n_cmd, nc)
        print(f"\n=== {name}: builder med {statistics.median(times)*1000:.0f} ms"
              f" over {args.reps} reps; py4j send_command x{n_cmd}")
        st.sort_stats("cumulative")
        rows = [
            (ct, nc, f"{os.path.basename(fn)}:{line}:{func}")
            for (fn, line, func), (cc, nc, tt, ct, callers) in st.stats.items()
            if ct > 0.05 and "~" not in fn
        ]
        for ct, nc, label in sorted(rows, reverse=True)[: args.top]:
            print(f"  {ct:7.3f}s x{nc:<6} {label}")
    spark.stop()


if __name__ == "__main__":
    main()
