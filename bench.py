"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Execution uses the noop sink so timing covers scan+compute+shuffle without
driver-side collect cost (top-k queries are tiny anyway). Each query is
timed over 3 reps and the MEDIAN is reported: local[32] task scheduling
has measured per-query noise up to ~4 sd on sub-second plans (SCALE.md
"mr_wordcount bench variance"), and the median of 3 is the cheapest
outlier-robust estimator of steady-state latency. The Spark data cache
is CLEARED before every rep, so operators that deliberately persist
shared subframes (LSH shingle arrays, IVF cells — SCALE.md) are timed
doing their complete pipeline each rep; session-cache reuse wins are
reported separately in SCALE.md, never folded into these numbers.
SPARK_GRAFT_BENCH_REPS overrides the per-query rep count (default 3)
for drift-disposition runs that want a wider median window; the driver
contract (plain `python bench.py`) is unchanged.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

# one representative per operator family (SURVEY.md §2) — correctness for
# every registered query is the driver's CORRECTNESS gate; bench tracks
# throughput of the load-bearing shapes.
HEADLINE = [
    "q1_pricing_summary",        # scan + 8-way aggregate
    "q3_shipping_priority",      # 3-way join + agg + top-k
    "wordcount",                 # explode + hash aggregate
    "log_top_domains",           # string normalization + top-k
    "window_rank_topk_per_customer",  # partitioned window
    "asof_join_last_purchase",   # union+window as-of join
    "dedup_minhash_lsh",         # shingle/minhash/band/verify joins
    "ann_cosine_topk",           # broadcast-join vector scoring
    "stream_session_windows",    # session windows (batch twin)
    "mr_wordcount",              # MR-parity layer (Arrow/pandas path)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as mod
    from go_dfs_mapreduce_spark.session import get_spark

    spark = get_spark("bench")
    qs = mod.queries()
    names = [n for n in HEADLINE if n in qs]

    # warm up the JVM + parquet footers of every input with tiny actions
    # (timings then measure query work, not first-touch JVM/footers)
    for t in ("region", "lineitem", "orders", "customer", "events", "documents", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    # ... and the whole-stage-codegen classes: running each headline plan
    # once at sf0.001 compiles the identical generated code (codegen cache
    # keys on source, which is scale-independent), so the timed sf runs
    # measure query work, not first-execution janino compilation (~2.5 s
    # on the 8-aggregate q1 alone). A long-lived cluster's executors are
    # exactly this warm.
    from go_dfs_mapreduce_spark.tables import SMOKE_SF_DIR

    for name in names:
        qs[name](spark, SMOKE_SF_DIR).write.mode("overwrite").format(
            "noop"
        ).save()

    n_reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3") or "3")
    timings: dict[str, float] = {}
    for name in names:
        reps = []
        for _ in range(n_reps):
            spark.catalog.clearCache()
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            reps.append(time.time() - t0)
        timings[name] = round(statistics.median(reps), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
