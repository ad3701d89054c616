"""Graph-operator scaling probe (SCALE.md evidence).

Times the graph family (triangle counts, common-neighbor top-k,
PageRank) at two scale factors with cache cleared per rep (so every rep
pays the full edge-list materialization) after a codegen warm-up, and
reports graph size (nodes/edges/wedges under each operator's bound)
plus median wall seconds as one JSON line per (query, sf).

Usage: python tools/graph_scale_probe.py [sf_dir ...]
       (default: /root/testdata/sf0.01 /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from go_dfs_mapreduce_spark.session import get_spark  # noqa: E402

WARM_SF = "/root/testdata/sf0.001"
REPS = 3


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark("graph-scale-probe")

    from go_dfs_mapreduce_spark.operators.graph import (
        _degrees,
        _edges,
        graph_common_neighbors_topk,
        graph_triangle_counts,
        pagerank_parts_2iter,
    )

    fns = (graph_triangle_counts, graph_common_neighbors_topk, pagerank_parts_2iter)
    # codegen warm-up: identical generated classes. Prefer the tiny smoke
    # SF; on hosts without it, warm on the first probed dir instead (the
    # warm run's timings are discarded either way).
    warm_dir = WARM_SF if os.path.isdir(WARM_SF) else sf_dirs[0]
    for fn in fns:
        fn(spark, warm_dir).write.mode("overwrite").format("noop").save()

    for sf_dir in sf_dirs:
        spark.catalog.clearCache()
        deg = _degrees(_edges(spark, sf_dir))
        size = deg.agg(
            F.count(F.lit(1)).alias("nodes"),
            (F.sum("d") / 2).cast("long").alias("edges"),
            F.max("d").alias("max_deg"),
            F.sum(F.expr("d * (d - 1) div 2")).alias("full_wedges"),
        ).collect()[0]
        for fn in fns:
            reps = []
            for _ in range(REPS):
                spark.catalog.clearCache()
                t0 = time.time()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                reps.append(time.time() - t0)
            print(
                json.dumps(
                    {
                        "query": fn.__name__,
                        "sf_dir": sf_dir,
                        "nodes": size["nodes"],
                        "edges": size["edges"],
                        "max_degree": size["max_deg"],
                        "full_wedges": size["full_wedges"],
                        "median_sec": round(statistics.median(reps), 2),
                    }
                )
            )
    spark.stop()


if __name__ == "__main__":
    main()
