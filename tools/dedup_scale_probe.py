"""Dedup corpus-scaling probe (SCALE.md evidence).

Builds a scaled corpus from sf0.1 documents — K copies with per-copy
token ROTATION (so copies are NOT near-duplicates of each other and the
shingle vocabulary stays realistic) plus a 5% slice of synthesized TRUE
near-dups (last token dropped) so the verified-pair count grows with the
corpus — then times dedup_minhash_lsh end-to-end (warm codegen, noop
sink, best of N) and reports docs / candidate-verified pairs / wall
seconds as one JSON line per K.

Usage: python tools/dedup_scale_probe.py [--ops minhash,minhash_inc,fuzzy,winnow,winnow_fast,span] [K ...]
       (defaults: --ops minhash, K = 1 4 10)

For fuzzy/winnow the line also carries the operator's skew diagnostics:
fuzzy -> prefix-block size distribution (the pair join is quadratic per
block), winnow -> fingerprint bucket fan-out and how many hot buckets
the WIN_MAX_DOC_FREQ cap drops (capped buckets generate zero pairs).
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


def _norm_col():
    return F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))


def _fuzzy_diag(spark, d: str) -> dict:
    """Prefix-block size distribution: the blocked join does |block|^2
    candidate work per block, so the max block is the skew lever."""
    from go_dfs_mapreduce_spark.operators.dedup import LEV_PREFIX

    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    sizes = (
        docs.select(F.substring(_norm_col(), 1, LEV_PREFIX).alias("k"))
        .groupBy("k")
        .count()
    )
    r = sizes.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.max("count").alias("max_block"),
        F.round(F.avg("count"), 2).alias("mean_block"),
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("cand_pairs"),
    ).collect()[0]
    return {
        "n_blocks": r["n_blocks"],
        "max_block": r["max_block"],
        "mean_block": float(r["mean_block"]),
        "cand_pairs": int(r["cand_pairs"]),
    }


def _winnow_diag(spark, d: str) -> dict:
    """Fingerprint bucket fan-out (poly selection — same distribution as
    md5 up to hash ties): max/mean docs per bucket and how many hot
    buckets the WIN_MAX_DOC_FREQ cap drops."""
    from go_dfs_mapreduce_spark.operators.dedup import (
        WIN_MAX_DOC_FREQ,
        _winnow_fast_kernel,
    )

    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    sel = docs.select("doc_id", _norm_col().alias("norm")).mapInPandas(
        _winnow_fast_kernel, "doc_id long, fp long"
    )
    sizes = sel.groupBy("fp").agg(F.count(F.lit(1)).alias("n"))
    r = sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("n").alias("max_bucket"),
        F.round(F.avg("n"), 2).alias("mean_bucket"),
        F.sum((F.col("n") > WIN_MAX_DOC_FREQ).cast("long")).alias("capped"),
    ).collect()[0]
    return {
        "n_buckets": r["n_buckets"],
        "max_bucket": r["max_bucket"],
        "mean_bucket": float(r["mean_bucket"]),
        "capped_buckets": int(r["capped"]),
    }


def _span_diag(spark, d: str) -> dict:
    """Linearity evidence for the span-dedup family (VERDICT r12 #8 /
    r13 #4): positional-shingle index size, shingles repeated across >=
    SPAN_DEDUP_MIN_DOCS docs, and positions the semi join flags — every
    stage's cardinality, so the no-quadratic-blowup claim is checkable
    against docs (index_rows ~ tokens, flagged <= index_rows, and no
    pair expansion exists to diverge)."""
    from go_dfs_mapreduce_spark.operators.dedup import (
        SPAN_DEDUP_MIN_DOCS,
        _pos_shingle_table,
    )

    pos_rows = _pos_shingle_table(spark, d).where(F.col("pos").isNotNull())
    rep = (
        pos_rows.groupBy("shingle")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.col("df") >= SPAN_DEDUP_MIN_DOCS)
    )
    flagged = pos_rows.join(rep.select("shingle"), "shingle", "left_semi")
    return {
        "index_rows": pos_rows.count(),
        "repeated_shingles": rep.count(),
        "flagged_positions": flagged.count(),
    }


def _cc_probe(spark, ns) -> None:
    """Round-count evidence for the star-rounds CC kernel: on an N-hop
    CHAIN (the diameter-pathological dup graph), plain min-label
    propagation needs N rounds; alternating large-star/small-star needs
    O(log N). Reports both measured round counts per N — propagation is
    run as a reference inline loop (capped) on the same edge list."""
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.operators.dedup import connected_components

    for n in ns:
        nodes = spark.range(n).select(F.col("id").alias("doc_id"))
        edges = spark.range(n - 1).select(
            F.col("id").alias("a"), (F.col("id") + 1).alias("b")
        )
        t0 = time.time()
        labels, star_rounds = connected_components(nodes, edges, max_rounds=64)
        ok = labels.where(F.col("cluster") != 0).count() == 0
        star_wall = time.time() - t0
        # reference: the r12 label-propagation loop, capped at 3x the
        # star count to keep the probe cheap — hitting the cap proves
        # the point (rounds grow with diameter)
        cap = star_rounds * 3
        sym = edges.union(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).localCheckpoint()
        lab = nodes.select(
            "doc_id", F.col("doc_id").alias("cluster")
        ).localCheckpoint()
        prop_rounds = 0
        for _ in range(cap):
            prop_rounds += 1
            msgs = sym.join(lab.withColumnRenamed("doc_id", "a"), "a").select(
                F.col("b").alias("doc_id"), "cluster"
            )
            new_lab = (
                lab.union(msgs)
                .groupBy("doc_id")
                .agg(F.min("cluster").alias("cluster"))
                .localCheckpoint()
            )
            changed = (
                new_lab.alias("n")
                .join(lab.alias("o"), "doc_id")
                .where(F.col("n.cluster") != F.col("o.cluster"))
                .count()
            )
            lab = new_lab
            if changed == 0:
                break
        print(
            json.dumps(
                {"op": "cc", "chain_n": n, "star_rounds": star_rounds,
                 "star_ok": ok, "star_wall_sec": round(star_wall, 2),
                 "propagation_rounds": prop_rounds,
                 "propagation_capped": prop_rounds >= cap}
            ),
            flush=True,
        )


def _cc_random_probe(spark, ns) -> None:
    """Star-rounds CC on BULK random graphs (the non-pathological case
    at probe scale): N nodes, 3N hash-derived random edges — a giant
    component plus fringe. Reports rounds + wall per N; rounds should
    stay single-digit as N grows 100x while per-round cost is the only
    thing scaling (two keyed aggregations + a distinct)."""
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.operators.dedup import connected_components

    for n in ns:
        nodes = spark.range(n).select(F.col("id").alias("doc_id"))
        edges = spark.range(3 * n).select(
            F.expr(f"cast(xxhash64(id, 17) % {n} as long)").alias("a"),
            F.expr(f"cast(xxhash64(id, 31) % {n} as long)").alias("b"),
        ).select(F.abs("a").alias("a"), F.abs("b").alias("b"))
        t0 = time.time()
        labels, rounds = connected_components(nodes, edges, max_rounds=64)
        n_comp = labels.select("cluster").distinct().count()
        wall = time.time() - t0
        print(
            json.dumps(
                {"op": "ccrand", "nodes": n, "edges": 3 * n,
                 "rounds": rounds, "components": n_comp,
                 "wall_sec": round(wall, 2)}
            ),
            flush=True,
        )


def main() -> None:
    args = sys.argv[1:]
    ops = ["minhash"]
    if args and args[0] == "--ops":
        ops = args[1].split(",")
        args = args[2:]
    ks = [int(a) for a in args] or [1, 4, 10]
    spark = get_spark("dedup-scale-probe")
    if ops == ["cc"]:
        _cc_probe(spark, ks if args else [256, 1024, 4096])
        spark.stop()
        return
    if ops == ["ccrand"]:
        _cc_random_probe(spark, ks if args else [100_000, 1_000_000, 10_000_000])
        spark.stop()
        return
    from go_dfs_mapreduce_spark.operators.dedup import (
        dedup_fuzzy_levenshtein,
        dedup_incremental_new_docs,
        dedup_minhash_lsh,
        span_dedup_plan,
        winnow_candidate_pairs,
        winnow_candidate_pairs_fast,
    )

    op_fns = {
        "minhash": (dedup_minhash_lsh, None),
        "fuzzy": (dedup_fuzzy_levenshtein, _fuzzy_diag),
        "winnow": (winnow_candidate_pairs, _winnow_diag),
        "winnow_fast": (winnow_candidate_pairs_fast, None),
        # span emits one PLAN row per doc, not pairs: "pairs" counts docs
        # with >= 1 removable span (n_spans > 0)
        "span": (
            lambda sp, dd: span_dedup_plan(sp, dd).where("n_spans > 0"),
            _span_diag,
        ),
        # the incremental ingest path over the PERSISTED band index —
        # pair work restricted to buckets the new batch touches; run
        # next to "minhash" at the same K for the full-vs-incremental
        # wall comparison (the stored-index amortization claim)
        "minhash_inc": (dedup_incremental_new_docs, None),
    }
    # codegen warmup on the smallest fixture
    for op in ops:
        op_fns[op][0](spark, "/root/testdata/sf0.001").write.mode(
            "overwrite"
        ).format("noop").save()
    for k in ks:
        d = build_corpus(spark, k)
        n_docs = spark.read.parquet(os.path.join(d, "documents.parquet")).count()
        for op in ops:
            fn, diag = op_fns[op]
            pairs = fn(spark, d).count()

            def _cold_run():
                # some pipelines persist intermediates (dedup.py); drop
                # them so every timed rep pays the corpus stage
                # end-to-end — otherwise the walls measure warm-cache
                # work and the corpus-bound stage leaves the timed region
                spark.catalog.clearCache()
                fn(spark, d).write.mode("overwrite").format("noop").save()

            wall = min(_timed(_cold_run) for _ in range(REPS))
            line = {"op": op, "k": k, "docs": n_docs, "pairs": pairs,
                    "wall_sec": round(wall, 2)}
            if diag is not None:
                line.update(diag(spark, d))
            print(json.dumps(line), flush=True)
    spark.stop()


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


if __name__ == "__main__":
    main()
