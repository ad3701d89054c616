"""Multimodal decode-stage scaling probe (SCALE.md evidence).

The module's scale claim for every decode operator is the
embarrassingly-parallel Arrow shape: synthesize + decode inside
mapInPandas over a 1-column scan, features-only across the boundary,
zero exchanges — so wall time must scale linearly with document count
and saturate all cores. This probe times the two heaviest r13 decode
pipelines end-to-end on synthesized corpora of N docs:

- mjpeg: the full MJPEG-AVI feature op (container walk + per-frame
  baseline JPEG decode, 2-5 frames/doc).
- frames: the frame-fingerprint index builder (decode + canonical-pixel
  md5 per frame) — the front end of both frame-dedup queries.

Usage: python tools/multimodal_scale_probe.py [N ...]  (default: 2e3 1e4 5e4)
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

REPS = 2


def build_docs(spark, n: int) -> str:
    out = tempfile.mkdtemp(prefix=f"mm_scale_n{n}_")
    (
        spark.range(n)
        .select(F.col("id").alias("doc_id"))
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "documents.parquet"))
    )
    return out


def main() -> None:
    ns = [int(float(a)) for a in sys.argv[1:]] or [2_000, 10_000, 50_000]
    spark = get_spark("multimodal-scale-probe")
    from go_dfs_mapreduce_spark.operators.multimodal import (
        _build_frame_fps,
        multimodal_video_mjpeg,
    )

    ops = {
        "mjpeg": multimodal_video_mjpeg,
        # _build_frame_fps now takes a docs FRAME (append-delta reuse);
        # adapt to the probe's (spark, sf_dir) op signature
        "frames": lambda s, d: _build_frame_fps(
            s.read.parquet(os.path.join(d, "documents.parquet"))
        ),
    }
    # codegen + Arrow warmup on the smallest fixture
    for fn in ops.values():
        fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format(
            "noop"
        ).save()
    for n in ns:
        d = build_docs(spark, n)
        try:
            for name, fn in ops.items():
                def _run():
                    t0 = time.monotonic()
                    fn(spark, d).write.mode("overwrite").format("noop").save()
                    return time.monotonic() - t0

                wall = min(_run() for _ in range(REPS))
                print(
                    json.dumps(
                        {"op": name, "docs": n,
                         "docs_per_sec": round(n / wall),
                         "wall_sec": round(wall, 2)}
                    ),
                    flush=True,
                )
        finally:
            shutil.rmtree(d, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
