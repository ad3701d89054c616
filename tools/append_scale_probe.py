#!/usr/bin/env python
"""Append-vs-rebuild cost probe for the derived-warehouse additive-ingest
path (VERDICT r14 #6): lay a corpus down in two landings (standing corpus
+ ingest batch), then measure (a) the full band-index build over the
grown corpus — the compaction cost — against (b) the append publish
(hardlink standing generation + delta build over only the batch files).

Usage: python tools/append_scale_probe.py [sf_dir] [batch_pct]
       python tools/append_scale_probe.py --synthetic N [batch_pct]
       python tools/append_scale_probe.py --landings K --synthetic N
The synthetic mode builds an N-doc corpus of deterministic pseudo-text
(32 write partitions) so the append-vs-rebuild gap can be measured at
corpus sizes the parquet fixtures don't reach — the linearity evidence
for "per-ingest cost is the batch, not the corpus".

--landings K is the MULTI-GENERATION shape (the nightly-ingest story):
the corpus lands in K equal batches — generation 1 is the full build
over batch 1, then K-1 successive appends. Per-landing publish seconds
must stay FLAT as generations accumulate (each append hardlinks the
standing files and delta-builds one batch); the closing compact folds
the K-generation part-file pileup back to target-sized files.
Writes nothing outside a temp warehouse; prints one JSON line per shape.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = sys.argv[1:]
    landings = 0
    if argv and argv[0] == "--landings":
        landings = int(argv[1])
        argv = argv[2:]
    sys.argv = [sys.argv[0], *argv]
    synthetic = len(sys.argv) > 1 and sys.argv[1] == "--synthetic"
    if synthetic:
        synth_n = int(float(sys.argv[2]))
        batch_pct = int(sys.argv[3]) if len(sys.argv) > 3 else 10
        sf_dir = f"synthetic:{synth_n}"
    else:
        sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
        batch_pct = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    scratch = tempfile.mkdtemp(prefix="append_probe_")
    os.environ["SPARK_GRAFT_DERIVED_DIR"] = os.path.join(scratch, "wh")
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark import derived
    from go_dfs_mapreduce_spark.operators.dedup import (
        _doc_band_sigs,
        _doc_shingle_arrays,
    )
    from go_dfs_mapreduce_spark.session import get_spark

    spark = get_spark("append-probe")
    try:
        if synthetic:
            # deterministic pseudo-text: ~40 hashed words per doc, so the
            # shingle/minhash stages do real per-doc work at any N
            docs = (
                spark.range(synth_n)
                .select(F.col("id").alias("doc_id"))
                .withColumn(
                    "text",
                    F.expr(
                        "array_join(transform(sequence(0, 39), "
                        "i -> substr(md5(concat(cast(doc_id as string), "
                        "':', cast(i as string))), 1, 6)), ' ')"
                    ),
                )
                .repartition(32)
            )
        else:
            docs = spark.read.parquet(
                os.path.join(sf_dir, "documents.parquet")
            )
        n = docs.count()
        t = docs.agg(
            F.expr(f"percentile(doc_id, {1 - batch_pct / 100})")
        ).first()[0]
        corpus = os.path.join(scratch, "corpus")
        docdir = os.path.join(corpus, "documents.parquet")

        def full_build():
            return _doc_band_sigs(
                _doc_shingle_arrays(spark.read.parquet(docdir))
            )

        def delta_build(new_files):
            return _doc_band_sigs(
                _doc_shingle_arrays(spark.read.parquet(*new_files))
            )

        if landings:
            # multi-generation shape: K equal landings (doc_id ranges —
            # contiguous in synthetic mode, quantile-close otherwise),
            # one publish after each; per-landing seconds must stay flat
            per = []
            step = -(-n // landings)
            for i in range(landings):
                docs.where(
                    (F.col("doc_id") >= i * step)
                    & (F.col("doc_id") < (i + 1) * step)
                ).write.mode("append").parquet(docdir)
                t0 = time.time()
                derived.derived_table(
                    spark, corpus, "probe_band_idx", ("documents",),
                    full_build, delta_build=delta_build,
                )
                per.append(round(time.time() - t0, 2))
            latest = derived._latest_published(
                derived._default_base(), "probe_band_idx"
            )
            t0 = time.time()
            folded = derived.compact(spark, name="probe_band_idx")
            print(
                json.dumps(
                    {
                        "sf_dir": sf_dir,
                        "docs": n,
                        "landings": landings,
                        "per_landing_publish_s": per,
                        "generations": latest[1]["generations"],
                        "compact_s": round(time.time() - t0, 2),
                        "compact_files": (
                            f"{folded[0]['files_before']}->"
                            f"{folded[0]['files_after']}"
                            if folded
                            else None
                        ),
                    }
                )
            )
            return

        # landing 1: standing corpus -> generation 1 (full build)
        docs.where(F.col("doc_id") <= t).write.mode("overwrite").parquet(docdir)
        t0 = time.time()
        derived.derived_table(
            spark, corpus, "probe_band_idx", ("documents",), full_build,
            delta_build=delta_build,
        )
        gen1_s = time.time() - t0

        # landing 2: the ingest batch -> generation 2 (append path)
        docs.where(F.col("doc_id") > t).write.mode("append").parquet(docdir)
        t0 = time.time()
        derived.derived_table(
            spark, corpus, "probe_band_idx", ("documents",), full_build,
            delta_build=delta_build,
        )
        append_s = time.time() - t0

        # compaction baseline: full rebuild over the SAME grown corpus
        # (fresh name so the append basis can't shadow it)
        t0 = time.time()
        derived.derived_table(
            spark, corpus, "probe_band_idx_full", ("documents",), full_build,
        )
        rebuild_s = time.time() - t0

        base = derived._default_base()
        latest = derived._latest_published(base, "probe_band_idx")

        # fold the appended generations back (the small-file control)
        t0 = time.time()
        folded = derived.compact(spark, name="probe_band_idx")
        compact_s = time.time() - t0
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "docs": n,
                    "batch_pct": batch_pct,
                    "gen1_full_build_s": round(gen1_s, 2),
                    "append_publish_s": round(append_s, 2),
                    "full_rebuild_s": round(rebuild_s, 2),
                    "speedup": round(rebuild_s / append_s, 2),
                    "generations": latest[1]["generations"],
                    "compact_s": round(compact_s, 2),
                    "compact_files": (
                        f"{folded[0]['files_before']}->"
                        f"{folded[0]['files_after']}"
                        if folded
                        else None
                    ),
                }
            )
        )
    finally:
        spark.stop()
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
