"""Dedup corpus-scaling probe (SCALE.md evidence).

Builds a scaled corpus from sf0.1 documents — K copies with per-copy
token ROTATION (so copies are NOT near-duplicates of each other and the
shingle vocabulary stays realistic) plus a 5% slice of synthesized TRUE
near-dups (last token dropped) so the verified-pair count grows with the
corpus — then times dedup_minhash_lsh end-to-end (warm codegen, noop
sink, best of N) and reports docs / candidate-verified pairs / wall
seconds as one JSON line per K.

Usage: python tools/dedup_scale_probe.py [K ...]   (default: 1 4 10)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from go_dfs_mapreduce_spark.session import get_spark  # noqa: E402
from go_dfs_mapreduce_spark.tables import table  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 2


def build_corpus(spark, k: int) -> str:
    """Write the K-times-scaled corpus as <tmp>/documents.parquet."""
    docs = table(spark, BASE_SF, "documents").select("doc_id", "text")
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    copies = []
    for c in range(k):
        toks = F.expr("split(text, ' ')")
        rotated = F.when(
            F.size(toks) > c,
            F.concat_ws(
                " ",
                F.expr(f"slice(split(text, ' '), {c + 1}, size(split(text, ' ')))"),
                F.expr(f"slice(split(text, ' '), 1, {c})"),
            ),
        ).otherwise(F.col("text"))
        copies.append(
            docs.select(
                (F.col("doc_id") + F.lit(c * n)).alias("doc_id"),
                rotated.alias("text"),
            )
        )
    corpus = copies[0]
    for df in copies[1:]:
        corpus = corpus.unionByName(df)
    # 5% synthesized near-dups: same text minus its last token, new ids
    near = corpus.where(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + F.lit(k * n)).alias("doc_id"),
        F.expr(
            "concat_ws(' ', slice(split(text, ' '), 1,"
            " greatest(size(split(text, ' ')) - 1, 1)))"
        ).alias("text"),
    )
    corpus = corpus.unionByName(near)
    out = tempfile.mkdtemp(prefix=f"dedup_scale_k{k}_")
    corpus.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    return out


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark("dedup-scale-probe")
    from go_dfs_mapreduce_spark.operators.dedup import dedup_minhash_lsh

    # codegen warmup on the smallest fixture
    dedup_minhash_lsh(spark, "/root/testdata/sf0.001").write.mode(
        "overwrite"
    ).format("noop").save()
    for k in ks:
        d = build_corpus(spark, k)
        n_docs = spark.read.parquet(os.path.join(d, "documents.parquet")).count()
        pairs = dedup_minhash_lsh(spark, d).count()

        def _cold_run():
            # the pipeline persists its shingle arrays (dedup.py); drop
            # them so every timed rep pays the corpus stage end-to-end —
            # otherwise the walls here measure warm-cache work and the
            # corpus-bound stage silently leaves the timed region
            spark.catalog.clearCache()
            dedup_minhash_lsh(spark, d).write.mode("overwrite").format(
                "noop"
            ).save()

        wall = min(_timed(_cold_run) for _ in range(REPS))
        print(json.dumps({"k": k, "docs": n_docs, "pairs": pairs,
                          "wall_sec": round(wall, 2)}), flush=True)
    spark.stop()


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


if __name__ == "__main__":
    main()
