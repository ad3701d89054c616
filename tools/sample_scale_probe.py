"""Priority-sampling scaling probe (SCALE.md evidence).

corpus_sample_weighted's claim is the streaming-sketch shape: one pruned
scan into TakeOrderedAndProject with an O(k) heap per task — zero
exchanges at any corpus size. This probe synthesizes documents tables of
N rows (same column shapes as the fixture: doc_id BIGINT, source VARCHAR,
n_chars BIGINT), times the operator end-to-end (noop sink, best of N
reps), and reports rows / wall seconds as one JSON line per N. The point
is the SLOPE: wall time must grow ~linearly with rows (scan-bound) with
no knee from shuffles or driver-side state.

Usage: python tools/sample_scale_probe.py [N ...]  (default: 1e6 1e7 5e7)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from go_dfs_mapreduce_spark.session import get_spark  # noqa: E402

REPS = 3


def build_docs(spark, n: int) -> str:
    out = tempfile.mkdtemp(prefix=f"sample_scale_n{n}_")
    (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), (F.col("id") % 5).cast("string")).alias(
                "source"
            ),
            (F.col("id") % 531 + 47).alias("n_chars"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "documents.parquet"))
    )
    return out


def main() -> None:
    ns = [int(float(a)) for a in sys.argv[1:]] or [1_000_000, 10_000_000, 50_000_000]
    spark = get_spark("sample-scale-probe")
    from go_dfs_mapreduce_spark.operators.llm_extras import (
        corpus_sample_weighted,
    )

    # codegen warm-up on the fixture
    corpus_sample_weighted(spark, "/root/testdata/sf0.001").write.mode(
        "overwrite"
    ).format("noop").save()
    for n in ns:
        d = build_docs(spark, n)
        try:
            def _run():
                t0 = time.monotonic()
                corpus_sample_weighted(spark, d).write.mode(
                    "overwrite"
                ).format("noop").save()
                return time.monotonic() - t0

            rows = corpus_sample_weighted(spark, d).count()
            wall = min(_run() for _ in range(REPS))
            print(
                json.dumps(
                    {"op": "corpus_sample_weighted", "rows_in": n,
                     "rows_out": rows, "wall_sec": round(wall, 2)}
                ),
                flush=True,
            )
        finally:
            # the synthesized datasets reach 50M rows; never leave
            # multi-GB temp dirs behind across probe runs
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
