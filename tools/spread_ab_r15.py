"""Round-15 interleaved A/B: spread_scan vs identity per headline query.

Control arm monkeypatches every operator module's `spread_scan` binding to
identity; treatment arm restores the real helper. Arms alternate rep by
rep in ONE JVM (same warmth), cache cleared before every rep, noop sink
timing — the bench's own methodology (guide §1.4).

Usage: python tools/spread_ab_r15.py [--reps 6] [names...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

DEFAULT = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "wordcount",
    "log_top_domains",
    "window_rank_topk_per_customer",
    "stream_session_windows",
    "mr_wordcount",
]

PATCH_MODULES = [
    "go_dfs_mapreduce_spark.operators.wordcount",
    "go_dfs_mapreduce_spark.operators.log_analysis",
    "go_dfs_mapreduce_spark.operators.relational",
    "go_dfs_mapreduce_spark.operators.windows",
    "go_dfs_mapreduce_spark.operators.streaming_batch",
    "go_dfs_mapreduce_spark.operators.mr_parity",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import importlib

    import __spark_entry__ as mod
    from go_dfs_mapreduce_spark import tables
    from go_dfs_mapreduce_spark.session import get_spark

    spark = get_spark("spread_ab_r15")
    qs = mod.queries()
    names = args.names or [n for n in DEFAULT if n in qs]

    mods = [importlib.import_module(m) for m in PATCH_MODULES]
    real = tables.spread_scan
    identity = lambda spark, sf_dir, name, df: df  # noqa: E731

    def set_spread(fn) -> None:
        for m in mods:
            if hasattr(m, "spread_scan"):
                m.spread_scan = fn

    # warm codegen/footers at smoke scale, both arms
    from go_dfs_mapreduce_spark.tables import SMOKE_SF_DIR

    for arm in (identity, real):
        set_spread(arm)
        for n in names:
            qs[n](spark, SMOKE_SF_DIR).write.mode("overwrite").format(
                "noop"
            ).save()

    results: dict[str, dict[str, list[float]]] = {
        n: {"ctrl": [], "trt": []} for n in names
    }
    for rep in range(args.reps):
        for n in names:
            for key, arm in (("ctrl", identity), ("trt", real)):
                set_spread(arm)
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"{n}:{key}:{rep}")
                t0 = time.time()
                qs[n](spark, args.sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                results[n][key].append((time.time() - t0) * 1000)
    set_spread(real)

    print(f"{'query':<34} {'ctrl_med':>9} {'trt_med':>9} {'ctrl_min':>9} {'trt_min':>9} {'delta%':>7}")
    for n in names:
        c = results[n]["ctrl"]
        t = results[n]["trt"]
        cm, tm = statistics.median(c), statistics.median(t)
        print(
            f"{n:<34} {cm:>9.0f} {tm:>9.0f} {min(c):>9.0f} {min(t):>9.0f}"
            f" {100 * (tm - cm) / cm:>+6.1f}%"
        )
    spark.stop()


if __name__ == "__main__":
    main()
