"""BPE-training scaling probe (SCALE.md evidence, VERDICT r9 #2): the
per-merge overhead curve of the SEQUENTIAL count->winner->fold loop vs
the BATCHED top-m-disjoint variant, on the exact production code paths
(`_bpe_train_loop` / `_bpe_batched_loop`).

The sequential loop costs one persist+count+winner-checkpoint job pair
PER MERGE — fine for a 3-rule gate fixture, serialized death for a
30k-rule production vocabulary. The batched loop amortizes that fixed
cost over BPE_BATCH_M accepted merges per round. This probe measures
both curves so the ceiling is a number, not a guess: wall seconds and
seconds-per-learned-merge at 3/10/30 sequential merges and the
round-counts that learn comparable rule totals batched.

Usage: python tools/bpe_scale_probe.py [seq_merges ...] (default 3 10 30)
One JSON line per run: {"variant", "merges_requested", "rules_learned",
"rounds_or_steps", "wall_sec", "sec_per_rule"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from go_dfs_mapreduce_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    seq_counts = [int(a) for a in sys.argv[1:]] or [3, 10, 30]
    spark = get_spark("bpe-scale-probe")
    from go_dfs_mapreduce_spark.operators.textstats import (
        BPE_BATCH_M,
        _bpe_batched_loop,
        _bpe_train_loop,
    )

    # warm codegen/read paths once so the curves measure the loop, not
    # session start
    _bpe_train_loop(spark, "/root/testdata/sf0.001", 2).count()
    _bpe_batched_loop(spark, "/root/testdata/sf0.001", 1).count()

    for m in seq_counts:
        t0 = time.time()
        rules = _bpe_train_loop(spark, SF_DIR, m).count()
        wall = time.time() - t0
        print(
            json.dumps(
                {
                    "variant": "sequential",
                    "merges_requested": m,
                    "rules_learned": rules,
                    "rounds_or_steps": m,
                    "wall_sec": round(wall, 2),
                    "sec_per_rule": round(wall / max(rules, 1), 3),
                }
            ),
            flush=True,
        )
        # batched run sized to learn a comparable rule total
        rounds = max(1, (m + BPE_BATCH_M - 1) // BPE_BATCH_M)
        t0 = time.time()
        rules = _bpe_batched_loop(spark, SF_DIR, rounds).count()
        wall = time.time() - t0
        print(
            json.dumps(
                {
                    "variant": "batched",
                    "merges_requested": m,
                    "rules_learned": rules,
                    "rounds_or_steps": rounds,
                    "wall_sec": round(wall, 2),
                    "sec_per_rule": round(wall / max(rules, 1), 3),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
