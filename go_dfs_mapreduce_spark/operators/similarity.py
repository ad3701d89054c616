"""Similarity search over the embeddings table (north-star surface).

- ann_cosine_topk : exact brute-force cosine top-k — the correctness
  baseline. Query set is broadcast; scoring is an exact-decimal array
  fold per pair (bit-identical across engines — decimal addition is
  order-free, so it matches the oracle's explode+SUM), ranking is a
  per-query window.
- ann_ivf_topk    : the scale path — IVF-style coarse quantization using
  per-label centroids (computed with exact decimal means), n_probe=2:
  each query searches only its 2 nearest clusters. Same decimal-exact
  arithmetic, so it also carries a full DuckDB oracle; its recall vs the
  brute-force baseline is asserted in tests/test_similarity.py.

At 100 TB the brute-force variant is the one you run per-query-batch as a
single broadcast join stage; IVF cuts the scored candidate set by the
cluster fan-out (here 2/10 labels ≈ 5x fewer scored pairs).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import table, table_row_count

N_QUERIES = 5  # vec_id < 5 are the query vectors
TOP_K = 5
N_PROBE = 2

DEC18 = "decimal(28,18)"


def _exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame[vec_id, label, i, v] — one row per vector dimension."""
    emb = table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("i", "vf")
    ).select("vec_id", "label", "i", F.col("vf").cast("double").alias("v"))


EXPLODED_DUCK = """
  SELECT vec_id, label, r.i AS i, CAST(embedding[r.i] AS DOUBLE) AS v
  FROM embeddings, range(1, 65) r(i)
"""

def _brute_oracle(n_queries: int) -> str:
    return f"""
WITH x AS ({EXPLODED_DUCK}),
norms AS (
  SELECT vec_id, SUM(CAST(v * v AS DECIMAL(28,18))) AS n2 FROM x GROUP BY vec_id
),
q AS (SELECT * FROM x WHERE vec_id < {n_queries}),
dots AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         SUM(CAST(q.v * c.v AS DECIMAL(28,18))) AS dot
  FROM q JOIN x c ON q.i = c.i AND q.vec_id <> c.vec_id
  GROUP BY 1, 2
),
cos AS (
  SELECT qid, cid,
         CAST(dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) AS c
  FROM dots JOIN norms nq ON qid = nq.vec_id JOIN norms nc ON cid = nc.vec_id
)
SELECT qid AS query_id, cid AS neighbor_id,
       CAST(rn AS INTEGER) AS rank, ROUND(c, 6) AS cosine
FROM (SELECT qid, cid, c,
             row_number() OVER (PARTITION BY qid ORDER BY c DESC, cid) AS rn
      FROM cos)
WHERE rn <= {TOP_K}
"""


ANN_TOPK_ORACLE = _brute_oracle(N_QUERIES)

# --- int8-quantized scan + exact rerank: the 4x-smaller-store brute ------

ANN_INT8_RERANK_R = 32  # stage-1 survivors per query (>> TOP_K)

# the ONE quantization rule, imported from its audit operator (r11
# review finding: four textual copies of FLOOR(v*127+0.5) would let the
# scheme drift out from under the 'same portable scheme' docstring claim)
from .llm_extras import int8_quantize_frag as _int8_quantize_frag  # noqa: E402

_I8Q_V = _int8_quantize_frag("v")

INT8_RERANK_ORACLE = f"""
WITH x AS ({EXPLODED_DUCK}),
qx AS (
  SELECT vec_id, i, CAST({_I8Q_V} AS BIGINT) AS qv FROM x
),
s1 AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid, SUM(q.qv * c.qv) AS int8_score
  FROM qx q JOIN qx c ON q.i = c.i AND q.vec_id <> c.vec_id
  WHERE q.vec_id < {N_QUERIES}
  GROUP BY 1, 2
),
cand AS (
  SELECT qid, cid, int8_score FROM (
    SELECT qid, cid, int8_score,
           row_number() OVER (PARTITION BY qid
                              ORDER BY int8_score DESC, cid) AS r1
    FROM s1) WHERE r1 <= {ANN_INT8_RERANK_R}
),
norms AS (
  SELECT vec_id, SUM(CAST(v * v AS DECIMAL(28,18))) AS n2 FROM x GROUP BY vec_id
),
dots AS (
  SELECT cand.qid, cand.cid, cand.int8_score,
         SUM(CAST(q.v * c.v AS DECIMAL(28,18))) AS dot
  FROM cand
  JOIN x q ON q.vec_id = cand.qid
  JOIN x c ON c.vec_id = cand.cid AND c.i = q.i
  GROUP BY 1, 2, 3
),
cos AS (
  SELECT qid, cid, int8_score,
         CAST(dot AS DOUBLE)
           / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) AS c
  FROM dots JOIN norms nq ON qid = nq.vec_id JOIN norms nc ON cid = nc.vec_id
)
SELECT qid AS query_id, cid AS neighbor_id, CAST(rn AS INTEGER) AS rank,
       ROUND(c, 6) AS cosine, CAST(int8_score AS BIGINT) AS int8_score
FROM (SELECT qid, cid, int8_score, c,
             row_number() OVER (PARTITION BY qid ORDER BY c DESC, cid) AS rn
      FROM cos)
WHERE rn <= {TOP_K}
"""

_Q8_EXPR = f"transform(embedding, v -> CAST({_I8Q_V} AS BIGINT))"


@query("ann_int8_rerank_topk", oracle=INT8_RERANK_ORACLE)
def ann_int8_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized-scan brute force: stage 1 scans the INT8 store (the
    4x-smaller projection ``embedding_quantize_int8`` audits — same
    portable FLOOR(v*127+0.5) scheme) and ranks every candidate by the
    pure-int64 quantized dot product, keeping the top
    ``ANN_INT8_RERANK_R`` per query; stage 2 re-scores ONLY those
    survivors with the exact-decimal cosine and emits the final top-k
    under the standard (cosine desc, cid) tie rule, tagging each row
    with its stage-1 score so the gate hash-checks BOTH stages.

    This is the production middle ground the crossover probe (SCALE.md
    r11) motivates: brute wins at probed scales but scans the full
    float store; the int8 scan reads a quarter of the bytes (the 100 TB
    lever - at 64 dims: 512 B of doubles -> 64 B of int8s per vector),
    while stage 2 touches float vectors for R rows per query only.
    Stage 1 is INTEGER arithmetic end to end - cross-engine agreement
    is unconditional, no BLAS-ulp caveat (int64 numpy matmul is exact)
    - so unlike the float fast arms this accelerated path carries a
    full-value oracle. Recall vs the exact brute is pinned in tests
    (int8 error ~4e-3 per dim reorders only near-ties; R = 32 >> k = 5
    absorbs them).

    Stage 1 runs as the ``ann_cosine_batch_fast`` map-side-combine
    shape (r11 verdict finding #2: the old formulation shuffled all
    n x q scored rows into the per-query window): each Arrow batch is
    scored against the broadcast-closure query matrix with one int64
    matmul and emits only its per-batch top-R partials under the exact
    (score desc, cid) tie rule, so the exchange carries ~R x |q| rows
    per batch instead of n x q total — top-R of unioned per-batch
    top-Rs IS the global top-R, exactness preserved. The quantized
    store itself is still built by the shared JVM quantization rule
    (``_Q8_EXPR``); the kernel consumes its int64 output untouched."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from .dedup import _dec_dot_expr

    emb = table(spark, sf_dir, "embeddings")
    i8 = emb.select("vec_id", F.expr(_Q8_EXPR).alias("q8"))
    qrows = i8.where(F.col("vec_id") < N_QUERIES).collect()  # bounded: |q|
    qids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    qmat = np.array([r.q8 for r in qrows], dtype=np.int64)

    part_schema = T.StructType(
        [
            T.StructField("qid", T.LongType()),
            T.StructField("cid", T.LongType()),
            T.StructField("int8_score", T.LongType()),
        ]
    )

    def partial(batches):
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy()
            mat = np.stack(pdf["q8"].to_numpy()).astype(np.int64)
            scores = mat @ qmat.T  # exact int64
            outs = []
            for j in range(len(qids)):
                col = scores[:, j]
                mask = ids != qids[j]
                cids, cj = ids[mask], col[mask]
                if not len(cids):
                    continue
                o = np.argsort(cids, kind="stable")
                o = o[np.argsort(-cj[o], kind="stable")][:ANN_INT8_RERANK_R]
                outs.append(
                    pd.DataFrame(
                        {
                            "qid": qids[j],
                            "cid": cids[o].astype("int64"),
                            "int8_score": cj[o],
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    partials = i8.mapInPandas(partial, part_schema)
    w1 = Window.partitionBy("qid").orderBy(
        F.desc("int8_score"), F.asc("cid")
    )
    cand = (
        partials.withColumn("r1", F.row_number().over(w1))
        .where(F.col("r1") <= ANN_INT8_RERANK_R)
        .select("qid", "cid", "int8_score")
    )
    ed = emb.select(
        "vec_id",
        "embedding",
        F.expr(_dec_dot_expr("embedding", "embedding")).alias("n2"),
    )
    q = ed.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("qn2"),
    )
    cos = (
        cand.join(ed.alias("c"), cand.cid == F.col("c.vec_id"))
        .join(F.broadcast(q), "qid")
        .select(
            "qid",
            "cid",
            "int8_score",
            (
                F.expr(_dec_dot_expr("q_emb", "c.embedding")).cast("double")
                / (
                    F.sqrt(F.col("qn2").cast("double"))
                    * F.sqrt(F.col("c.n2").cast("double"))
                )
            ).alias("c"),
        )
    )
    w2 = Window.partitionBy("qid").orderBy(F.desc("c"), F.asc("cid"))
    return (
        cos.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= TOP_K)
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("neighbor_id"),
            F.col("rn").cast("int").alias("rank"),
            F.round("c", 6).alias("cosine"),
            F.col("int8_score").cast("long").alias("int8_score"),
        )
    )


@query("ann_cosine_topk", oracle=ANN_TOPK_ORACLE)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-k, array-fold formulation (round 2):
    ONE broadcast join of the tiny query side against the streaming
    candidate scan, dot product and both norms as exact-decimal array
    folds per pair — no per-dimension explode, no aggregation exchange
    before the ranking window. Equals the oracle's explode+SUM because
    decimal addition is order-free."""
    return _brute_topk_impl(spark, sf_dir, N_QUERIES)


def _brute_topk_impl(
    spark: SparkSession, sf_dir: str, n_queries: int
) -> DataFrame:
    from .dedup import _dec_dot_expr
    from ..tables import spread_scan

    # the per-pair decimal dot folds below are the cost; Spark pipelines
    # them into the scan, and the gate corpus is one row group -> ONE task.
    # Spread the candidate scan to the session cores (no-op at real scale
    # where the file layout already yields >= cores splits) so the folds
    # run at full parallelism. Measured r15 (interleaved A/B, 6 reps,
    # sf0.1): median 1623 -> 952 ms, min 1176 -> 711 ms; rows unchanged
    # (round-robin repartition).
    emb = spread_scan(
        spark, sf_dir, "embeddings", table(spark, sf_dir, "embeddings")
    )
    ed = emb.select(
        "vec_id",
        "embedding",
        F.expr(_dec_dot_expr("embedding", "embedding")).alias("n2"),
    )
    q = ed.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("qn2"),
    )
    cos = (
        ed.alias("c")
        # query side is tiny -> broadcast it; the big side streams
        .join(F.broadcast(q), F.col("qid") != F.col("c.vec_id"))
        .select(
            "qid",
            F.col("c.vec_id").alias("cid"),
            (
                F.expr(_dec_dot_expr("q_emb", "c.embedding")).cast("double")
                / (
                    F.sqrt(F.col("qn2").cast("double"))
                    * F.sqrt(F.col("c.n2").cast("double"))
                )
            ).alias("c"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("c"), F.asc("cid"))
    return (
        cos.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("neighbor_id"),
            F.col("rn").cast("int").alias("rank"),
            F.round("c", 6).alias("cosine"),
        )
    )


# --- IVF: label-centroid coarse quantization, n_probe=2 -------------------

IVF_ORACLE = f"""
WITH x AS ({EXPLODED_DUCK}),
norms AS (
  SELECT vec_id, SUM(CAST(v * v AS DECIMAL(28,18))) AS n2 FROM x GROUP BY vec_id
),
cent AS (  -- per-label centroid, exact decimal mean per dimension
  SELECT label, i,
         CAST(SUM(CAST(v AS DECIMAL(28,18))) AS DOUBLE) / COUNT(*) AS cv
  FROM x GROUP BY label, i
),
q AS (SELECT * FROM x WHERE vec_id < {N_QUERIES}),
qc AS (  -- squared distance from each query to each centroid
  SELECT q.vec_id AS qid, cent.label,
         SUM(CAST((q.v - cent.cv) * (q.v - cent.cv) AS DECIMAL(28,18))) AS d2
  FROM q JOIN cent ON q.i = cent.i
  GROUP BY 1, 2
),
probe AS (
  SELECT qid, label FROM (
    SELECT qid, label,
           row_number() OVER (PARTITION BY qid ORDER BY CAST(d2 AS DOUBLE), label) AS rn
    FROM qc) WHERE rn <= {N_PROBE}
),
dots AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         SUM(CAST(q.v * c.v AS DECIMAL(28,18))) AS dot
  FROM q
  JOIN x c ON q.i = c.i AND q.vec_id <> c.vec_id
  JOIN probe p ON p.qid = q.vec_id AND p.label = c.label
  GROUP BY 1, 2
),
cos AS (
  SELECT qid, cid,
         CAST(dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) AS c
  FROM dots JOIN norms nq ON qid = nq.vec_id JOIN norms nc ON cid = nc.vec_id
)
SELECT qid AS query_id, cid AS neighbor_id,
       CAST(rn AS INTEGER) AS rank, ROUND(c, 6) AS cosine
FROM (SELECT qid, cid, c,
             row_number() OVER (PARTITION BY qid ORDER BY c DESC, cid) AS rn
      FROM cos)
WHERE rn <= {TOP_K}
"""


@query("ann_ivf_topk", oracle=IVF_ORACLE)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-expression formulation (round 2): norms, query-to-centroid
    distances, and candidate dot products are exact-decimal ARRAY folds
    (``_dec_dot_expr``/``_dec_sqdist_expr``) instead of posexplode ->
    per-dimension join -> decimal groupBy. Decimal addition is exact and
    order-free, so the fold equals the oracle's explode+SUM term-for-term
    — same equivalence the cell-blocked NN operator relies on — while the
    64x row inflation and its aggregation exchanges disappear from the
    plan. Only the (tiny) per-label centroid table is still built from
    exploded rows, then re-packed into ordered arrays."""
    from .dedup import _dec_dot_expr, _dec_sqdist_expr

    emb = table(spark, sf_dir, "embeddings")
    ed = emb.select(
        "vec_id",
        "label",
        "embedding",
        F.expr(_dec_dot_expr("embedding", "embedding")).alias("n2"),
    )
    # per-label centroid as an i-ordered DOUBLE array (explode only here:
    # |vectors| x 64 rows collapsing to |labels| rows)
    x = _exploded(spark, sf_dir)
    cent = (
        x.groupBy("label", "i")
        .agg(
            (F.sum(F.col("v").cast(DEC18)).cast("double") / F.count(F.lit(1))).alias(
                "cv"
            )
        )
        .groupBy("label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(i, cv))), s -> s.cv)"
            ).alias("cent_emb")
        )
    )
    q = ed.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("qn2"),
    )
    qc = q.crossJoin(F.broadcast(cent)).select(
        "qid",
        "q_emb",
        "qn2",
        "label",
        F.expr(_dec_sqdist_expr("q_emb", "cent_emb")).alias("d2"),
    )
    wp = Window.partitionBy("qid").orderBy(F.col("d2").cast("double"), F.col("label"))
    probe = (
        qc.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= N_PROBE)
        .select("qid", "q_emb", "qn2", "label")
    )
    # candidates = vectors in a probed label; probe (queries x n_probe
    # rows, carrying the query vector) broadcasts against the big side
    cos = (
        ed.alias("c")
        .join(
            F.broadcast(probe).alias("p"),
            (F.col("p.label") == F.col("c.label"))
            & (F.col("p.qid") != F.col("c.vec_id")),
        )
        .select(
            F.col("p.qid").alias("qid"),
            F.col("c.vec_id").alias("cid"),
            (
                F.expr(_dec_dot_expr("p.q_emb", "c.embedding")).cast("double")
                / (
                    F.sqrt(F.col("p.qn2").cast("double"))
                    * F.sqrt(F.col("c.n2").cast("double"))
                )
            ).alias("c"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("c"), F.asc("cid"))
    return (
        cos.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("neighbor_id"),
            F.col("rn").cast("int").alias("rank"),
            F.round("c", 6).alias("cosine"),
        )
    )


# --- LSH: signed-random-projection bucketing, OR of LSH_TABLES bands ------

LSH_TABLES = 8  # hash tables OR'd for candidates
LSH_BITS = 6    # bits per table -> 2^6 = 64 buckets/table
EMB_DIM = 64

# Deterministic Rademacher-style hyperplane entry for (table t, bit j,
# dim d): +1 / -1 from pure integer arithmetic both engines compute
# identically — each (t, j) gets its own multiplicative-hash multiplier
# so bit patterns are decorrelated (a plain linear d*p1+j*p2+t*p3 form
# makes bits cyclic shifts of one sequence; measured recall 0.32 vs
# 0.40 for this form at sf0.01, with TRUE Gaussian planes at 0.32 —
# i.e. this integer family is not the bottleneck, the corpus is).
# Production would draw seeded Gaussian planes; the gate needs plane
# entries the DuckDB oracle can reproduce exactly, and +/-1 signed
# projections are the standard SimHash/SRP family anyway.
_LSH_SIGN = (
    "(CASE WHEN (({d}) * ((7919 + 104729 * ({j}) + 1299709 * ({t})) % 9973))"
    " % 9973 < 4986 THEN 1.0 ELSE -1.0 END)"
)


def _lsh_sigs_expr(emb: str, bits: int = LSH_BITS) -> str:
    """Spark SQL expression: array of LSH_TABLES integer signatures for
    ``emb``. Per (t, j) the projection is an exact-decimal signed sum
    (the ``_dec_dot_expr`` discipline — order-free, so the sign the
    oracle sees is bit-identical); bit j of table t's signature is
    proj >= 0."""
    d = _LSH_SIGN.format(d="i + 1", j="j", t="t")
    proj = (
        f"aggregate(transform(sequence(0, {EMB_DIM - 1}), i -> "
        f"CAST({d} * CAST({emb}[i] AS DOUBLE) AS DECIMAL(28,18))), "
        "CAST(0 AS DECIMAL(30,18)), (pacc, e) -> CAST(pacc + e AS DECIMAL(30,18)))"
    )
    sig = (
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, j) -> "
        f"acc + IF({proj} >= 0, shiftleft(1L, j), 0L))"
    )
    return f"transform(sequence(0, {LSH_TABLES - 1}), t -> {sig})"


# --- calibrated signature width: bits as a function of corpus size -------
#
# The r9 ANN probe measured the fixed 6-bit family saturating at 50k
# vectors (64 buckets/table -> ~780 vectors per bucket -> pruning
# collapses toward all-pairs, multiprobe superlinear). The production
# rule SCALE.md recorded — bits ~ log2(n / target_bucket) — is applied
# here with PURE INTEGER threshold compares (no float log2: an
# exact-power-of-2 corpus would make ceil(log2(x)) engine-dependent at
# the last ulp). Both engines walk the identical precomputed integer
# thresholds: bits is the smallest b in [MIN, MAX] with
# n <= TARGET_BUCKET * 2^b, i.e. expected bucket width <= TARGET_BUCKET.

ANN_CAL_TARGET_BUCKET = 32  # target expected vectors per (table, bucket)
ANN_CAL_MIN_BITS = 4        # recall floor: never fewer than 16 buckets
ANN_CAL_MAX_BITS = 20       # 2^20 buckets/table ~ 33M-vector corpora


def calibrated_lsh_bits(n: int) -> int:
    """Smallest b in [ANN_CAL_MIN_BITS, ANN_CAL_MAX_BITS] such that
    n <= ANN_CAL_TARGET_BUCKET << b (expected bucket width <= target).
    500 vectors -> 4 bits, 2000 -> 6, 50k -> 11, 1M -> 15."""
    b = ANN_CAL_MIN_BITS
    while b < ANN_CAL_MAX_BITS and n > ANN_CAL_TARGET_BUCKET << b:
        b += 1
    return b


def _cal_bits_sql_case(n_expr: str) -> str:
    """DuckDB expression replaying ``calibrated_lsh_bits`` over the SAME
    integer thresholds (generated from the same constants, so the two
    derivations cannot drift apart)."""
    arms = " ".join(
        f"WHEN ({n_expr}) <= {ANN_CAL_TARGET_BUCKET << b} THEN {b}"
        for b in range(ANN_CAL_MIN_BITS, ANN_CAL_MAX_BITS)
    )
    return f"(CASE {arms} ELSE {ANN_CAL_MAX_BITS} END)"


def _lsh_oracle(multiprobe: bool) -> str:
    """DuckDB oracle for the LSH ANN pair; ``multiprobe`` also probes
    every Hamming-1 signature on the QUERY side (k=0 is the exact
    signature, k>=1 flips bit k-1)."""
    if multiprobe:
        cand = f"""
qsig AS (SELECT vec_id AS qid, t, sig FROM sigs WHERE vec_id < {N_QUERIES}),
probes AS (
  SELECT qid, t,
         CASE WHEN k.k = 0 THEN sig ELSE xor(sig, 1 << (k.k - 1)) END AS psig
  FROM qsig, range(0, {LSH_BITS + 1}) k(k)
),
cand AS (
  SELECT DISTINCT p.qid, c.vec_id AS cid
  FROM probes p JOIN sigs c ON c.t = p.t AND c.sig = p.psig
  WHERE c.vec_id <> p.qid
)"""
    else:
        cand = f"""
cand AS (  -- bucket-join candidates: same (table, signature), OR over tables
  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
  FROM sigs q JOIN sigs c ON q.t = c.t AND q.sig = c.sig
  WHERE q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
)"""
    return f"""
WITH x AS ({EXPLODED_DUCK}),
norms AS (
  SELECT vec_id, SUM(CAST(v * v AS DECIMAL(28,18))) AS n2 FROM x GROUP BY vec_id
),
projs AS (  -- signed projection per (vector, table, bit), exact decimal
  SELECT x.vec_id, t.t AS t, b.j AS j,
         SUM(CAST((CASE WHEN (x.i * ((7919 + 104729 * b.j + 1299709 * t.t) % 9973)) % 9973 < 4986
                        THEN 1.0 ELSE -1.0 END) * x.v AS DECIMAL(28,18))) AS proj
  FROM x, range(0, {LSH_TABLES}) t(t), range(0, {LSH_BITS}) b(j)
  GROUP BY 1, 2, 3
),
sigs AS (
  SELECT vec_id, t,
         SUM(CASE WHEN proj >= 0 THEN (1 << j) ELSE 0 END) AS sig
  FROM projs GROUP BY 1, 2
),
{cand},
dots AS (
  SELECT cand.qid, cand.cid,
         SUM(CAST(q.v * c.v AS DECIMAL(28,18))) AS dot
  FROM cand
  JOIN x q ON q.vec_id = cand.qid
  JOIN x c ON c.vec_id = cand.cid AND c.i = q.i
  GROUP BY 1, 2
),
cos AS (
  SELECT qid, cid,
         CAST(dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) AS c
  FROM dots JOIN norms nq ON qid = nq.vec_id JOIN norms nc ON cid = nc.vec_id
)
SELECT qid AS query_id, cid AS neighbor_id,
       CAST(rn AS INTEGER) AS rank, ROUND(c, 6) AS cosine
FROM (SELECT qid, cid, c,
             row_number() OVER (PARTITION BY qid ORDER BY c DESC, cid) AS rn
      FROM cos)
WHERE rn <= {TOP_K}
"""


LSH_ORACLE = _lsh_oracle(multiprobe=False)
LSH_MULTIPROBE_ORACLE = _lsh_oracle(multiprobe=True)


_SIGS_MEMO: dict[tuple[str, str], DataFrame] = {}
_CAL_SIGS_MEMOS: dict[int, dict[tuple[str, str], DataFrame]] = {}


def lsh_sig_table(
    spark: SparkSession, sf_dir: str, bits: int | None = None
) -> DataFrame:
    """DataFrame[vec_id, sigs] — the persisted LSH INDEX: every vector's
    ``LSH_TABLES`` signatures as a content-fingerprinted derived table
    (``derived.derived_table``, keyed to the embeddings table), the same
    pattern as the dedup shingle arrays and the graph edge list. The
    signature fold is the dominant cost of a cold LSH query (measured
    3.6 s of 7.5 s at sf0.1 — 48 exact-decimal projections x 64 dims per
    vector, BigDecimal-backed on the JVM), and it is a pure function of
    the corpus — exactly what a production SRP deployment materializes
    once per corpus version and serves lookups from. Memoized per
    (session, sf dir) so one gate sweep builds it at most once.

    ``bits=None`` is the legacy fixed-width (LSH_BITS) index; an
    explicit ``bits`` builds the calibrated-width index under its own
    derived-table name (widths are different physical indexes — the
    same way a production SRP deployment versions its index by its
    hyperparameters)."""
    from ..derived import derived_table
    from ..memo import session_memo

    b = LSH_BITS if bits is None else bits
    name = "embedding_lsh_sigs" if bits is None else f"embedding_lsh_sigs_cal{b}"
    memo = _SIGS_MEMO if bits is None else _CAL_SIGS_MEMOS.setdefault(b, {})

    def build() -> DataFrame:
        emb = table(spark, sf_dir, "embeddings")
        return emb.select(
            "vec_id", F.expr(_lsh_sigs_expr("embedding", b)).alias("sigs")
        )

    return session_memo(
        memo,
        spark,
        sf_dir,
        lambda: derived_table(spark, sf_dir, name, ("embeddings",), build),
    )


# --- bucketed signature index: the 100 TB read path (VERDICT r10 #3) -----

LSH_INDEX_BUCKETS = 1024
_PK_SHIFT = 16_777_216  # 2^24 > any sig at the ANN_CAL_MAX_BITS=20 ceiling
_BKT_BUILT: dict[tuple[str, str, int], str] = {}


def _pk_expr() -> str:
    """THE packed probe-key expression — one definition shared by the
    index writer and the probe filter (r11 review finding: the
    pk IN (...) prune is only semantically redundant while both sides
    compute pk byte-identically; a drifted copy would silently empty
    the opt-in bucketed candidate set)."""
    return f"CAST(t AS BIGINT) * {_PK_SHIFT} + CAST(sig AS BIGINT)"


def lsh_sig_bucketed(
    spark: SparkSession, sf_dir: str, bits: int | None = None
) -> DataFrame:
    """DataFrame[vec_id, t, sig, pk] — the EXPLODED signature index
    persisted BUCKETED and SORTED by the packed probe key
    ``pk = t * 2^24 + sig``, so a candidate lookup's literal
    ``pk IN (probe keys)`` filter prunes the index READ itself
    (SelectedBucketsCount in the scan) instead of streaming all
    n x LSH_TABLES signature rows through the join (the r10 verdict's
    #3 ask). Within each bucket ``sortBy(pk)`` keeps row groups
    pk-clustered, so parquet min/max stats prune further when probe
    keys outnumber buckets (the 64-query batch arm at small widths).

    At the 100 TB design point this is the serve-path shape: bucket
    count scales with the corpus (here 1024 — at fixture scale the
    files are tiny, but the PLAN is the one that matters), a single
    query probes LSH_TABLES x (bits+1) keys and reads only those
    buckets, and the index is versioned by (width, corpus fingerprint)
    exactly like ``lsh_sig_table``.

    Deliberately NOT ``session_memo``-persisted: caching the frame
    would serve the join from an InMemoryTableScan and silently bypass
    the bucketed file scan this table exists to provide; only the BUILD
    is memoized (catalog-table existence per session)."""
    import shutil

    from ..derived import _source_fingerprint

    b = LSH_BITS if bits is None else bits
    app = spark.sparkContext.applicationId
    key = (app, os.path.abspath(sf_dir), b)
    name = _BKT_BUILT.get(key)
    if name is None:
        fp = _source_fingerprint(sf_dir, ("embeddings",))
        kind = "fix" if bits is None else "cal"
        name = f"lsh_sigbkt_{kind}{b}_{fp}"
        if not spark.catalog.tableExists(name):
            # the in-memory catalog forgets tables across sessions while
            # their managed directories survive in the warehouse dir —
            # clear leftovers so saveAsTable never trips over a
            # non-empty location. Only UNREGISTERED directories are
            # GC'd: a same-prefix sibling still in this session's
            # catalog (same kind/bits, different corpus fingerprint) is
            # live and must survive (r11 review finding — the old
            # prefix-wide rmtree deleted data out from under it)
            wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
                "file:"
            )
            prefix = f"lsh_sigbkt_{kind}{b}_"
            if os.path.isdir(wh):
                for d in os.listdir(wh):
                    if d.startswith(prefix) and not spark.catalog.tableExists(d):
                        shutil.rmtree(os.path.join(wh, d), ignore_errors=True)
            rows = lsh_sig_table(spark, sf_dir, bits).select(
                "vec_id",
                F.posexplode("sigs").alias("t", "sig"),
            ).select(
                "vec_id",
                "t",
                "sig",
                F.expr(_pk_expr()).alias("pk"),
            )
            (
                rows.write.format("parquet")
                .bucketBy(LSH_INDEX_BUCKETS, "pk")
                .sortBy("pk")
                .mode("overwrite")
                .saveAsTable(name)
            )
        _BKT_BUILT[key] = name
    return spark.table(name)


@query("ann_lsh_topk", oracle=LSH_ORACLE)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via signed-random-projection LSH — the bucket-join
    scale path that needs NO per-label clustering (``ann_ivf_topk``'s
    sibling; together they are the brief's IVF-or-LSH pair). Every
    vector computes ``LSH_TABLES`` b-bit signatures IN-ROW (one array
    expression, no explode for hashing); candidates are pairs sharing a
    (table, signature) bucket in ANY table; only candidates are scored,
    with the same exact-decimal cosine and (cosine desc, cid) tie rule
    as the brute-force baseline. Recall vs that baseline is asserted in
    tests/test_llm_ops.py — with an honest floor: the synthetic corpus's
    true top-5 neighbors sit at cosine ~0.35 (near-isotropic vectors),
    where SRP's per-table collision probability (1 - theta/pi)^b is
    ~0.06, so measured recall ~0.4 at (8 tables, 6 bits) is the DATA's
    ceiling, not the operator's — true seeded Gaussian planes measure
    0.32 on the same corpus. On a real embedding corpus with neighbors
    at cosine 0.9 (theta ~26 deg, p ~0.86) the identical params give
    ~0.4 per table and ~98% over 8 tables. Multiprobe (also probing
    Hamming-1 signatures) is the standard recall lever when tables are
    memory-bound.

    Scale: the signature step is embarrassingly parallel map work; the
    bucket join shuffles |vectors| x LSH_TABLES signature rows — NOT the
    all-pairs grid — and per-bucket width is tunable by LSH_BITS, the
    same knob production SRP systems use. Hot buckets (vectors piling
    into one signature) would skew the join; the standard fix is
    salting the bucket id by a candidate-side shard, the same pattern as
    ``inverted_index_postings``' salted head."""
    return _lsh_topk_impl(spark, sf_dir, multiprobe=False)


@query("ann_lsh_multiprobe_topk", oracle=LSH_MULTIPROBE_ORACLE)
def ann_lsh_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ann_lsh_topk`` with Hamming-1 multiprobe: each QUERY signature
    also probes the ``LSH_BITS`` buckets one bit-flip away — the
    standard recall lever when adding tables is memory-bound (the index
    side stays exactly the same 8 signatures per vector; only the tiny
    query side fans out x(b+1)). Measured on this corpus: recall vs the
    brute-force baseline 0.40 -> 0.76 at sf0.01 and 0.48 -> 1.0 at
    sf0.1, with candidates growing ~3.5x (probed buckets overlap), never
    9x. The per-table collision probability for a true neighbor rises
    from p^b to p^b + b * p^(b-1) * (1-p) — at cosine 0.35 (p ~0.62)
    that is 0.057 -> 0.27 per table, i.e. the multiprobe family reaches
    on THIS corpus what the plain family only reaches on strong-neighbor
    data. Same exact-decimal scoring, same oracle discipline (DuckDB
    replays the bit flips with xor())."""
    return _lsh_topk_impl(spark, sf_dir, multiprobe=True)


# --- calibrated-width LSH: the r9 saturation finding, closed in code -----


def _lsh_cal_oracle(n_queries: int) -> str:
    """DuckDB oracle for the calibrated-width LSH family: the signature
    width is DERIVED IN SQL from the corpus row count via the same
    integer thresholds ``calibrated_lsh_bits`` walks (``_cal_bits_sql_
    case``), and emitted as the ``sig_bits`` column so the gate
    hash-checks the derivation itself. Projections materialize for all
    ANN_CAL_MAX_BITS bit positions and are masked to j < b — the
    oracle-side cost of keeping the SQL static while the width is
    dynamic."""
    case = _cal_bits_sql_case("(SELECT COUNT(*) FROM embeddings)")
    return f"""
WITH x AS ({EXPLODED_DUCK}),
nb AS (SELECT {case} AS b),
norms AS (
  SELECT vec_id, SUM(CAST(v * v AS DECIMAL(28,18))) AS n2 FROM x GROUP BY vec_id
),
projs AS (
  SELECT x.vec_id, t.t AS t, bb.j AS j,
         SUM(CAST((CASE WHEN (x.i * ((7919 + 104729 * bb.j + 1299709 * t.t) % 9973)) % 9973 < 4986
                        THEN 1.0 ELSE -1.0 END) * x.v AS DECIMAL(28,18))) AS proj
  FROM x, range(0, {LSH_TABLES}) t(t), range(0, {ANN_CAL_MAX_BITS}) bb(j), nb
  WHERE bb.j < nb.b
  GROUP BY 1, 2, 3
),
sigs AS (
  SELECT vec_id, t,
         SUM(CASE WHEN proj >= 0 THEN (1 << j) ELSE 0 END) AS sig
  FROM projs GROUP BY 1, 2
),
qsig AS (SELECT vec_id AS qid, t, sig FROM sigs WHERE vec_id < {n_queries}),
probes AS (
  SELECT qid, t,
         CASE WHEN k.k = 0 THEN sig ELSE xor(sig, 1 << (k.k - 1)) END AS psig
  FROM qsig, range(0, {ANN_CAL_MAX_BITS} + 1) k(k), nb
  WHERE k.k <= nb.b
),
cand AS (
  SELECT DISTINCT p.qid, c.vec_id AS cid
  FROM probes p JOIN sigs c ON c.t = p.t AND c.sig = p.psig
  WHERE c.vec_id <> p.qid
),
dots AS (
  SELECT cand.qid, cand.cid,
         SUM(CAST(q.v * c.v AS DECIMAL(28,18))) AS dot
  FROM cand
  JOIN x q ON q.vec_id = cand.qid
  JOIN x c ON c.vec_id = cand.cid AND c.i = q.i
  GROUP BY 1, 2
),
cos AS (
  SELECT qid, cid,
         CAST(dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) AS c
  FROM dots JOIN norms nq ON qid = nq.vec_id JOIN norms nc ON cid = nc.vec_id
)
SELECT qid AS query_id, cid AS neighbor_id,
       CAST(rn AS INTEGER) AS rank, ROUND(c, 6) AS cosine,
       (SELECT CAST(b AS INTEGER) FROM nb) AS sig_bits
FROM (SELECT qid, cid, c,
             row_number() OVER (PARTITION BY qid ORDER BY c DESC, cid) AS rn
      FROM cos)
WHERE rn <= {TOP_K}
"""


LSH_CALIBRATED_ORACLE = _lsh_cal_oracle(N_QUERIES)

N_BATCH_QUERIES = 64  # the index's crossover regime (r9 probe finding)

LSH_CAL_BATCH_ORACLE = _lsh_cal_oracle(N_BATCH_QUERIES)


def _calibrated_bits_for(spark: SparkSession, sf_dir: str) -> int:
    """The one calibration scalar: corpus row count -> signature width.
    A production deployment computes this once per corpus version when
    it materializes the signature index; the count is a metadata-cheap
    parquet scan, and the derivation is the same integer-threshold walk
    the oracle replays in SQL."""
    n = table_row_count(spark, sf_dir, "embeddings")
    return calibrated_lsh_bits(n)


@query("ann_lsh_calibrated_topk", oracle=LSH_CALIBRATED_ORACLE)
def ann_lsh_calibrated_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ann_lsh_multiprobe_topk`` with the signature width CALIBRATED to
    the corpus instead of pinned: bits = smallest b with expected bucket
    width n / 2^b <= ANN_CAL_TARGET_BUCKET (clamped to [4, 20]) — the
    log2(n/target_bucket) rule the r9 ANN probe recorded after measuring
    the fixed 6-bit family saturate at 50k vectors (64 buckets/table ->
    ~780 vectors/bucket -> candidate pruning collapses toward all-pairs
    and Hamming-1 multiprobe turns superlinear). Keeping bucket width
    constant as the corpus grows keeps the per-query candidate set
    O(tables x (bits+1) x target_bucket) — the index property that
    actually survives a 100x scale-up, at the standard SRP recall trade
    (more bits -> lower per-table collision probability, compensated by
    the Hamming-1 probes; tables are the orthogonal recall knob).

    The derivation is pure integer threshold compares on BOTH engines
    (no float log2 — an exact power-of-2 corpus would make ceil(log2(n))
    engine-dependent), the width used is emitted as ``sig_bits`` so the
    gate checks the derivation itself, and the calibrated signature
    index persists under a width-versioned derived-table name exactly
    like a production index versioned by its hyperparameters.

    Reference anchor: capacity-aware planning is the reference
    controller's chunk-placement rule (``cn/dfs_actions.go:41-93`` sizes
    placement to node capacity); this is the same rule applied to index
    geometry."""
    bits = _calibrated_bits_for(spark, sf_dir)
    return _lsh_topk_impl(
        spark, sf_dir, multiprobe=True, bits=bits, tag_bits=True
    )


@query("ann_lsh_batch_topk", oracle=LSH_CAL_BATCH_ORACLE)
def ann_lsh_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The calibrated LSH index serving a 64-QUERY BATCH (vec_id < 64) —
    the regime where an ANN index earns its keep. The r9 probe measured
    brute-force flat winning at 5-query batches (index overhead ~fixed,
    brute cost ~linear in queries); the crossover arrives as the batch
    grows because the index pays its signature/bucket cost ONCE per
    corpus version (persisted derived table) while brute re-scans all
    vectors per query. Same calibrated width, same Hamming-1 multiprobe,
    same exact-decimal scoring and (cosine desc, cid) tie rule; the A/B
    against ``ann_cosine_batch_topk`` at the same batch size is recorded
    in SCALE.md (tools/ann_scale_probe.py)."""
    bits = _calibrated_bits_for(spark, sf_dir)
    return _lsh_topk_impl(
        spark,
        sf_dir,
        multiprobe=True,
        bits=bits,
        n_queries=N_BATCH_QUERIES,
        tag_bits=True,
    )


@query("ann_cosine_batch_topk", oracle=_brute_oracle(N_BATCH_QUERIES))
def ann_cosine_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ann_cosine_topk`` at the 64-query batch size — the exact
    brute-force A/B partner of ``ann_lsh_batch_topk`` (same queries,
    same tie rule, exhaustive scoring). Registered so the crossover
    experiment's BOTH arms are gate-verified, not just timed."""
    return _brute_topk_impl(spark, sf_dir, N_BATCH_QUERIES)


def ann_lsh_batch_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ann_lsh_batch_topk`` with the candidate SCORING swapped from
    the exact-decimal fold to a per-query numpy kernel — the
    ``embedding_nn_cosine_fast`` convention (no oracle: BLAS summation
    order differs from exact decimal at the last ulp; equivalence to
    the gate-verified exact twin is asserted in tests/test_llm_ops.py).
    Candidate generation is byte-identical (shared
    ``_lsh_candidates``): calibrated width, Hamming-1 multiprobe, the
    persisted signature index. This is the production arm of the
    crossover A/B — the decimal fold exists for oracle portability, not
    for throughput, and the probe separates the index's pruning value
    from the scoring arithmetic's cost."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    bits = _calibrated_bits_for(spark, sf_dir)
    cand = _lsh_candidates(
        spark, sf_dir, multiprobe=True, bits=bits, n_queries=N_BATCH_QUERIES
    )
    emb = table(spark, sf_dir, "embeddings")
    ed = emb.select("vec_id", "embedding")
    q = ed.where(F.col("vec_id") < N_BATCH_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    rows = cand.join(ed, cand.cid == ed.vec_id).join(F.broadcast(q), "qid")

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("rank", T.IntegerType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def topk(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["qid"].iloc[0])
        ids = pdf["cid"].to_numpy()
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        qv = np.asarray(pdf["q_emb"].iloc[0], dtype=np.float64)
        cos = (mat @ qv) / (
            np.linalg.norm(mat, axis=1) * np.linalg.norm(qv)
        )
        # (cosine desc, cid asc) — sort by cid first, stable-sort by -cos
        o = np.argsort(ids, kind="stable")
        o = o[np.argsort(-cos[o], kind="stable")][:TOP_K]
        return pd.DataFrame(
            {
                "query_id": qid,
                "neighbor_id": ids[o].astype("int64"),
                "rank": np.arange(1, len(o) + 1, dtype="int32"),
                "cosine": np.round(cos[o], 6),
            }
        )

    return rows.groupBy("qid").applyInPandas(topk, out_schema)


def ann_cosine_batch_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ann_cosine_batch_topk`` as the production brute arm: one
    embeddings scan, each Arrow batch scored against the whole query
    matrix with ONE numpy matmul, per-batch partial top-k emitted
    (TOP_K x |queries| rows per batch), exact global top-k re-ranked
    JVM-side over the tiny partials — the map-side-combine shape for
    exhaustive scoring. The 64 x 64 query matrix rides into the kernel
    as a closure over a bounded 64-row collect (a constant-size scalar
    boundary, documented like the 1-row winner checkpoints — NOT a
    corpus-sized collect). No oracle (BLAS ulp); equivalence to the
    gate-verified exact twin is asserted in tests/test_llm_ops.py."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    emb = table(spark, sf_dir, "embeddings")
    qrows = (
        emb.where(F.col("vec_id") < N_BATCH_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    qids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    qmat = np.array([r.embedding for r in qrows], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)

    part_schema = T.StructType(
        [
            T.StructField("qid", T.LongType()),
            T.StructField("cid", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def partial(batches):
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy()
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            cos = (mat @ qmat.T) / np.outer(
                np.linalg.norm(mat, axis=1), qnorm
            )
            outs = []
            for j in range(len(qids)):
                col = cos[:, j]
                mask = ids != qids[j]
                cids, cj = ids[mask], col[mask]
                if not len(cids):
                    continue
                o = np.argsort(cids, kind="stable")
                o = o[np.argsort(-cj[o], kind="stable")][:TOP_K]
                outs.append(
                    pd.DataFrame(
                        {
                            "qid": qids[j],
                            "cid": cids[o].astype("int64"),
                            "cosine": cj[o],
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    partials = emb.select("vec_id", "embedding").mapInPandas(
        partial, part_schema
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc("cosine"), F.asc("cid")
    )
    return (
        partials.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("neighbor_id"),
            F.col("rn").cast("int").alias("rank"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


def _lsh_candidates(
    spark: SparkSession,
    sf_dir: str,
    multiprobe: bool,
    bits: int | None,
    n_queries: int,
    bucketed: bool | None = None,
) -> DataFrame:
    """DataFrame[qid, cid] — the DISTINCT bucket-join candidate pairs,
    shared by the exact-decimal rank path and the numpy fast scorer.
    Signatures come from the persisted index; the probe fan-out happens
    on the tiny broadcast query side.

    TWO physically different reads of the same index, same results
    (pinned by ``test_lsh_bucketed_candidates_match_unpruned``):

    - ``bucketed=False`` (the default): the exploded ARRAY index
      streams through the broadcast (t, sig) join — one scan stage at
      the session's parallelism. This is the measured winner at every
      fixture/probe scale: candidates for 5 queries at 100k vectors in
      0.8 s vs 5.5 s bucketed, 64 queries 0.67 s vs 23.7 s (r11
      decomposition, SCALE.md round 11), because the 1024-bucket scan
      pays ~1024 task launches against kilobyte files.
    - ``bucketed=True`` (opt-in; env ``SPARK_GRAFT_LSH_BUCKETED=1``):
      the BUCKETED index (``lsh_sig_bucketed``) scanned with the probe
      keys pushed down as a literal ``pk IN (...)`` filter — the plan
      shows ``SelectedBucketsCount: <probed> out of 1024`` (plan-pinned
      in tests). The filter is semantically redundant (join-key
      equality implies pk membership), so results are byte-identical.
      This is the 100 TB SERVE shape — a bucket there is ~128 MB and
      the pruned read skips real I/O, where at fixture scale it can
      only skip task launches it still has to schedule. The probe-key
      collect is a bounded constant-size closure (at most n_queries x
      LSH_TABLES x (bits+1) int64s), the ``ann_cosine_batch_fast``
      class."""
    b = LSH_BITS if bits is None else bits
    if bucketed is None:
        bucketed = os.environ.get(
            "SPARK_GRAFT_LSH_BUCKETED", ""
        ).lower() in ("1", "true", "yes")
    sigs_arr = lsh_sig_table(spark, sf_dir, bits).select(
        "vec_id", F.posexplode("sigs").alias("t", "sig")
    )
    qside = sigs_arr.where(F.col("vec_id") < n_queries)
    if multiprobe:
        # probe the exact bucket plus every Hamming-1 bucket — the
        # expansion happens on the tiny broadcast side only
        flips = ", ".join(f"sig ^ {1 << j}" for j in range(b))
        qsigs = qside.select(
            F.col("vec_id").alias("qid"),
            "t",
            F.explode(F.expr(f"array(sig, {flips})")).alias("sig"),
        )
    else:
        qsigs = qside.select(F.col("vec_id").alias("qid"), "t", "sig")
    if bucketed:
        probe_pks = sorted(
            r.pk
            for r in qsigs.select(F.expr(_pk_expr()).alias("pk"))
            .distinct()
            .collect()
        )
        sigs = lsh_sig_bucketed(spark, sf_dir, bits).where(
            F.col("pk").isin(probe_pks)
        )
    else:
        sigs = sigs_arr
    return (
        sigs.join(F.broadcast(qsigs), ["t", "sig"])
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("cid"))
        .distinct()
    )


def _lsh_topk_impl(
    spark: SparkSession,
    sf_dir: str,
    multiprobe: bool,
    bits: int | None = None,
    n_queries: int = N_QUERIES,
    tag_bits: bool = False,
) -> DataFrame:
    from .dedup import _dec_dot_expr

    b = LSH_BITS if bits is None else bits
    emb = table(spark, sf_dir, "embeddings")
    ed = emb.select(
        "vec_id",
        "embedding",
        F.expr(_dec_dot_expr("embedding", "embedding")).alias("n2"),
    )
    cand = _lsh_candidates(spark, sf_dir, multiprobe, bits, n_queries)
    # r15 (guide §2.5, the AQE flip side): the candidate pair set is BYTES-
    # small (83 k rows ~ a few MB at sf0.1), so AQE's size-based coalescing
    # collapses it to ONE post-shuffle partition — and the per-pair exact-
    # decimal dot below (interpreted HOF, 64 BigDecimal ops per pair) then
    # runs single-task while 31 cores idle. AQE cannot see downstream
    # compute weight, only bytes; the explicit repartition (which AQE
    # respects) restores compute parallelism. Measured at sf0.1: the
    # 64-query batch arm 3.7 s -> 1.1 s and multiprobe 0.55 -> 0.42 s,
    # while the plain 5-query arm's candidate set is small enough that
    # the exchange cost exceeded the scoring win (+0.1 s) — so only the
    # fan-out arms spread. The count scales with the session's cores,
    # not a local constant.
    if multiprobe or n_queries > N_QUERIES:
        cand = cand.repartition(spark.sparkContext.defaultParallelism)
    q = ed.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("qn2"),
    )
    cos = (
        cand.join(ed.alias("c"), cand.cid == F.col("c.vec_id"))
        .join(F.broadcast(q), "qid")
        .select(
            "qid",
            "cid",
            (
                F.expr(_dec_dot_expr("q_emb", "c.embedding")).cast("double")
                / (
                    F.sqrt(F.col("qn2").cast("double"))
                    * F.sqrt(F.col("c.n2").cast("double"))
                )
            ).alias("c"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("c"), F.asc("cid"))
    out = (
        cos.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("neighbor_id"),
            F.col("rn").cast("int").alias("rank"),
            F.round("c", 6).alias("cosine"),
        )
    )
    if tag_bits:
        # emit the width actually used so the gate hash-checks the
        # CALIBRATION DERIVATION itself, not just the neighbor sets
        out = out.withColumn("sig_bits", F.lit(b).cast("int"))
    return out


# --- fast path: per-block numpy matmul (no oracle — BLAS summation order
# differs from exact decimal at the last ulp; equivalence to the exact
# operator is asserted in tests/test_llm_ops.py instead) ------------------


def embedding_nn_cosine_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell nearest neighbor via one Arrow batch + numpy matmul per
    block — the throughput shape for the 100 TB path (measured ~10x faster
    than the decimal-exact join formulation at sf0.1). Same IVF-cell
    blocking as ``embedding_nn_cosine`` (``dedup.nn_cells``), same tie
    rule (cosine desc, then neighbor id asc)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from .dedup import nn_cells

    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("nn_vec_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def per_label(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            # a singleton cell has no neighbor; the exact operator drops
            # the row too (inner pair join)
            return pd.DataFrame(
                {"vec_id": [], "nn_vec_id": [], "cosine": []}
            ).astype({"vec_id": "int64", "nn_vec_id": "int64", "cosine": "float64"})
        ids = pdf["vec_id"].to_numpy()
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        sims = (mat @ mat.T) / np.outer(norms, norms)
        np.fill_diagonal(sims, -np.inf)
        order = np.argsort(ids, kind="stable")
        # ties on cosine broken by smaller neighbor id: argmax over columns
        # reordered by ascending id returns the first (smallest-id) maximum
        sims_sorted = sims[:, order]
        best = np.argmax(sims_sorted, axis=1)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "nn_vec_id": ids[order][best],
                "cosine": np.round(sims_sorted[np.arange(len(ids)), best], 6),
            }
        )

    emb = table(spark, sf_dir, "embeddings")
    cells = nn_cells(spark, sf_dir)
    return (
        emb.join(cells, "vec_id")
        .select("vec_id", "embedding", "cell")
        .groupBy("cell")
        .applyInPandas(per_label, out_schema)
    )


# --------------------------------------------------------------------------
# k-means (Lloyd's algorithm, 2 unrolled iterations, deterministic)
# --------------------------------------------------------------------------

K_CLUSTERS = 8

# Micro-unit quantization (the stats module's exactness pattern applied to
# vectors): every coordinate becomes ROUND(v * 1e6) AS BIGINT, so ALL
# k-means arithmetic — distances, centroid sums — is integer-exact and
# order-independent, and the only floating-point op per centroid
# coordinate is one IEEE division + round (deterministic on both engines).
_MICRO_ARR = (
    "transform(embedding, v -> "
    "cast(round(cast(v as double) * 1000000) as bigint))"
)


def _sqd_micro(a: str, b: str) -> str:
    """BIGINT squared euclidean distance between two micro-unit arrays.
    Bounds: |coord| <= ~1e6 for unit-scale embeddings, so a 64-dim sum of
    squared diffs tops out near 2^47 — far inside BIGINT."""
    return (
        f"aggregate(zip_with({a}, {b}, (p, q) -> (p - q) * (p - q)), "
        "cast(0 as bigint), (acc, e) -> acc + e)"
    )


KMEANS_ORACLE = f"""
WITH xm AS (
  SELECT vec_id, list_transform(embedding,
           v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS xm
  FROM embeddings
),
seeds AS (
  SELECT vec_id AS seed_id, xm AS sm FROM xm ORDER BY vec_id LIMIT {K_CLUSTERS}
),
d1 AS (
  SELECT x.vec_id, s.seed_id,
         CAST(list_sum(list_transform(range(1, len(x.xm) + 1),
              i -> (x.xm[i] - s.sm[i]) * (x.xm[i] - s.sm[i]))) AS BIGINT) AS d2
  FROM xm x CROSS JOIN seeds s
),
a1 AS (
  SELECT vec_id, seed_id AS cluster FROM (
    SELECT vec_id, seed_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, seed_id) AS rn
    FROM d1) t WHERE rn = 1
),
psum AS (
  SELECT a.cluster, r.i AS pos, SUM(x.xm[r.i]) AS s, COUNT(*) AS n
  FROM a1 a JOIN xm x USING (vec_id), range(1, 65) r(i)
  GROUP BY 1, 2
),
cent AS (
  SELECT cluster, pos,
         CAST(round(CAST(s AS DOUBLE) / n) AS BIGINT) AS cm
  FROM psum
),
carr AS (
  SELECT cluster, list(cm ORDER BY pos) AS cm FROM cent GROUP BY cluster
),
d2_ AS (
  SELECT x.vec_id, c.cluster,
         CAST(list_sum(list_transform(range(1, len(x.xm) + 1),
              i -> (x.xm[i] - c.cm[i]) * (x.xm[i] - c.cm[i]))) AS BIGINT) AS d2
  FROM xm x CROSS JOIN carr c
)
SELECT vec_id, cluster, d2 AS d2_micro FROM (
  SELECT vec_id, cluster, d2,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
  FROM d2_) t WHERE rn = 1
"""


@query("kmeans_embeddings", oracle=KMEANS_ORACLE)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations of k-means over the embeddings, fully
    deterministic: seeds are the K smallest vec_ids, assignment ties
    break to the smaller cluster id, and all arithmetic is micro-unit
    integer (``_MICRO_ARR``), so both engines compute bit-identical
    assignments. This is THE iterative-ML shape on the engine: each
    iteration is (broadcast centroids) x (one pass over vectors) ->
    per-cluster partial sums — at 100 TB the per-iteration cost is one
    scan + one |K x dims| aggregate, and more iterations are the same
    plan repeated (cf. dedup_clusters' bounded star-round fixpoint for the
    loop-until-converged variant).

    Plan shape: centroids stay driver-free (broadcast joins of K rows),
    assignment argmin is ``min_by`` with map-side partial aggregation,
    and the iter-1 assignment frame is persisted because BOTH the
    centroid-update branch and the iter-2 scoring branch consume it
    (ReuseExchange does not fire across differently-pruned subtrees —
    SCALE.md)."""
    emb = table(spark, sf_dir, "embeddings")
    xm = emb.select("vec_id", F.expr(_MICRO_ARR).alias("xm"))
    seeds = (
        xm.orderBy("vec_id")
        .limit(K_CLUSTERS)
        .select(F.col("vec_id").alias("seed_id"), F.col("xm").alias("sm"))
    )
    d1 = xm.crossJoin(F.broadcast(seeds)).select(
        "vec_id",
        "xm",
        "seed_id",
        F.expr(_sqd_micro("xm", "sm")).alias("d2"),
    )
    a1 = (
        d1.groupBy("vec_id")
        .agg(
            F.expr("min_by(seed_id, struct(d2, seed_id))").alias("cluster"),
            F.first("xm").alias("xm"),  # constant within the group
        )
        .persist()
    )
    a1.count()  # populate before the branches race (SCALE.md)
    cent = (
        a1.select("cluster", F.posexplode("xm").alias("pos", "v"))
        .groupBy("cluster", "pos")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "cluster",
            "pos",
            F.expr("cast(round(cast(s as double) / n) as bigint)").alias("cm"),
        )
    )
    carr = cent.groupBy("cluster").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, cm))), x -> x.cm)"
        ).alias("cm")
    )
    d2 = a1.select("vec_id", "xm").crossJoin(F.broadcast(carr)).select(
        "vec_id",
        "cluster",
        F.expr(_sqd_micro("xm", "cm")).alias("d2"),
    )
    best = d2.groupBy("vec_id").agg(
        F.min(F.struct("d2", "cluster")).alias("m")
    )
    return best.select(
        "vec_id",
        F.col("m.cluster").alias("cluster"),
        F.col("m.d2").alias("d2_micro"),
    )


# --------------------------------------------------------------------------
# ANN self-audit: IVF recall@k against the exact brute-force baseline
# --------------------------------------------------------------------------

ANN_RECALL_ORACLE = f"""
WITH exact AS ({ANN_TOPK_ORACLE}),
ivf AS ({IVF_ORACLE})
SELECT e.query_id,
       COUNT(*) AS n_exact,
       CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits,
       ROUND(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             * 1.0 / COUNT(*), 6) AS recall
FROM exact e
LEFT JOIN ivf i
  ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
GROUP BY e.query_id
"""


@query("ann_recall_audit", oracle=ANN_RECALL_ORACLE)
def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF scale path against the exact brute-force
    baseline, per query — the acceptance gate you run before trusting an
    approximate index with production retrieval (the same exact-vs-sketch
    twin discipline as distinct_sketch_audit). Composes the two
    registered operators, so the audit always measures the code that
    actually serves queries, not a reimplementation that could drift.

    Scale: both inputs end at k rows per query (k=5 here), so the audit
    itself joins two (|queries| x k)-sized frames — negligible next to
    the searches it compares. The brute-force side is the expensive one
    at 100 TB; run the audit on a query SAMPLE there (it is per-query
    embarrassingly parallel, and a few hundred queries bound recall
    tightly)."""
    exact = ann_cosine_topk(spark, sf_dir).alias("e")
    ivf = ann_ivf_topk(spark, sf_dir).alias("i")
    joined = exact.join(
        ivf,
        (F.col("e.query_id") == F.col("i.query_id"))
        & (F.col("e.neighbor_id") == F.col("i.neighbor_id")),
        "left",
    )
    hit = F.when(F.col("i.neighbor_id").isNotNull(), 1).otherwise(0)
    return joined.groupBy(F.col("e.query_id").alias("query_id")).agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.sum(hit).cast("long").alias("n_hits"),
        F.round(F.sum(hit) * 1.0 / F.count(F.lit(1)), 6).alias("recall"),
    )


# --------------------------------------------------------------------------
# Hard-negative mining (contrastive training-pair prep)
# --------------------------------------------------------------------------

N_ANCHORS = 5
NEG_K = 5
# the batched variant mines anchors [0, HN_BATCHED_ANCHORS) in
# HN_BATCH_SIZE-sized invocations of the same stage
HN_BATCHED_ANCHORS = 10
HN_BATCH_SIZE = 4


def _hard_neg_oracle(n_anchors: int) -> str:
    return f"""
WITH x AS ({EXPLODED_DUCK}),
norms AS (
  SELECT vec_id, SUM(CAST(v * v AS DECIMAL(28,18))) AS n2 FROM x GROUP BY vec_id
),
lab AS (SELECT DISTINCT vec_id, label FROM x),
q AS (SELECT * FROM x WHERE vec_id < {n_anchors}),
dots AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         SUM(CAST(q.v * c.v AS DECIMAL(28,18))) AS dot
  FROM q JOIN x c ON q.i = c.i AND q.vec_id <> c.vec_id
  GROUP BY 1, 2
),
cos AS (
  SELECT qid, cid, ql.label AS q_label, cl.label AS c_label,
         CAST(dot AS DOUBLE)
           / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) AS c
  FROM dots
  JOIN norms nq ON qid = nq.vec_id JOIN norms nc ON cid = nc.vec_id
  JOIN lab ql ON qid = ql.vec_id JOIN lab cl ON cid = cl.vec_id
),
pos AS (
  SELECT qid, MAX(c) AS pos_ceiling FROM cos
  WHERE q_label = c_label GROUP BY qid
)
SELECT anchor_id, neighbor_id, rank, cosine,
       ROUND(pos_ceiling, 6) AS pos_ceiling,
       raw_c < pos_ceiling AS is_semi_hard
FROM (
  SELECT cos.qid AS anchor_id, cos.cid AS neighbor_id,
         CAST(row_number() OVER (PARTITION BY cos.qid
                                 ORDER BY cos.c DESC, cos.cid) AS INTEGER)
           AS rank,
         ROUND(cos.c, 6) AS cosine, cos.c AS raw_c, pos.pos_ceiling
  FROM cos LEFT JOIN pos ON cos.qid = pos.qid
  WHERE cos.q_label <> cos.c_label
)
WHERE rank <= {NEG_K}
"""


HARD_NEG_ORACLE = _hard_neg_oracle(N_ANCHORS)


def _mine_hard_negatives(
    spark: SparkSession, sf_dir: str, lo: int, hi: int
) -> DataFrame:
    """One anchor-batch invocation of the mining stage: anchors with
    ``lo <= vec_id < hi`` against the full candidate scan. Every
    per-anchor quantity (positive ceiling, negative ranking) is
    independent across anchors, so a union of batch invocations is
    row-identical to one big invocation — the property
    tests/test_catalog_plans.py pins differentially."""
    from .dedup import _dec_dot_expr

    emb = table(spark, sf_dir, "embeddings")
    ed = emb.select(
        "vec_id",
        "label",
        "embedding",
        F.expr(_dec_dot_expr("embedding", "embedding")).alias("n2"),
    )
    q = ed.where(
        (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("qn2"),
    )
    cos = (
        ed.alias("c")
        .join(F.broadcast(q), F.col("qid") != F.col("c.vec_id"))
        .select(
            "qid",
            "q_label",
            F.col("c.vec_id").alias("cid"),
            F.col("c.label").alias("c_label"),
            (
                F.expr(_dec_dot_expr("q_emb", "c.embedding")).cast("double")
                / (
                    F.sqrt(F.col("qn2").cast("double"))
                    * F.sqrt(F.col("c.n2").cast("double"))
                )
            ).alias("c"),
        )
    )
    pos = (
        cos.where(F.col("q_label") == F.col("c_label"))
        .groupBy("qid")
        .agg(F.max("c").alias("pos_ceiling"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("c"), F.asc("cid"))
    return (
        cos.where(F.col("q_label") != F.col("c_label"))
        .join(F.broadcast(pos), "qid", "left")
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= NEG_K)
        .select(
            F.col("qid").alias("anchor_id"),
            F.col("cid").alias("neighbor_id"),
            "rank",
            F.round("c", 6).alias("cosine"),
            F.round("pos_ceiling", 6).alias("pos_ceiling"),
            (F.col("c") < F.col("pos_ceiling")).alias("is_semi_hard"),
        )
    )


@query("hard_negative_mining", oracle=HARD_NEG_ORACLE)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair mining: per anchor vector, the top-k
    HIGHEST-cosine candidates with a DIFFERENT label (hard negatives),
    each tagged with the anchor's same-label positive ceiling and the
    standard semi-hard flag (negative still below the best positive —
    the FaceNet semi-hard band a triplet-loss pipeline samples from).

    Plan shape mirrors ``ann_cosine_topk`` (the broadcast-anchor
    brute-force stage every mining pipeline bottoms out in): ONE
    broadcast join of the tiny anchor side against the streaming
    candidate scan, dot/norms as exact-decimal array folds per pair —
    order-free, so the oracle's explode+SUM agrees bit-for-bit — then
    one window per anchor over the negative stream and a kilobyte-sized
    positive-ceiling aggregate joined back broadcast. At 100 TB the
    candidate side streams; mining batches of anchors is repeated
    invocations of this same stage (or its IVF-pruned variant,
    ``ann_ivf_topk``). The semi-hard comparison uses the UNROUNDED
    doubles on both engines; outputs are rounded for display. An anchor
    whose label appears on no other vector has no positive ceiling: the
    LEFT join keeps its hard negatives with pos_ceiling / is_semi_hard
    NULL (an inner join would silently drop the anchor's entire row
    set — the wrong outcome for a mining pipeline)."""
    return _mine_hard_negatives(spark, sf_dir, 0, N_ANCHORS)


@query(
    "hard_negative_mining_batched",
    oracle=_hard_neg_oracle(HN_BATCHED_ANCHORS),
)
def hard_negative_mining_batched(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The anchor-batched invocation path ``hard_negative_mining``'s
    contract promises, made executable: anchors [0, {HN_BATCHED_ANCHORS})
    are mined as a loop of {HN_BATCH_SIZE}-anchor invocations of the SAME
    broadcast-join stage, results unioned.

    This is the 100 TB shape of mining: each invocation broadcasts one
    small anchor batch against the streaming candidate scan, so (a) the
    broadcast side stays kilobytes no matter how many total anchors the
    pipeline mines, and (b) the per-anchor ranking window fans the
    candidate stream across only batch_size partitions per invocation —
    the per-invocation skew bound the base operator's docstring declares.
    Each batch is an independent Spark job in production (they can run
    concurrently or checkpoint between batches); here the union IS the
    loop, and the driver gate proves the union is row-identical to one
    monolithic pass (the oracle scores all {HN_BATCHED_ANCHORS} anchors
    in one query). Per-anchor quantities (positive ceiling, negative
    rank) are anchor-local, so batching can never change a row."""
    batches = [
        _mine_hard_negatives(
            spark, sf_dir, lo, min(lo + HN_BATCH_SIZE, HN_BATCHED_ANCHORS)
        )
        for lo in range(0, HN_BATCHED_ANCHORS, HN_BATCH_SIZE)
    ]
    out = batches[0]
    for b in batches[1:]:
        out = out.unionByName(b)
    return out


# --------------------------------------------------------------------------
# Embedding-space outlier detection: distance to the label centroid
# --------------------------------------------------------------------------

OUTLIER_TOPK = 10

EMB_OUTLIER_ORACLE = f"""
WITH x AS ({EXPLODED_DUCK}),
s AS (
  SELECT label, i, SUM(CAST(v AS DECIMAL(28,18))) AS sv, COUNT(*) AS n
  FROM x GROUP BY label, i
),
m AS (SELECT label, i, CAST(sv AS DOUBLE) / n AS mu FROM s),
d AS (
  SELECT x.vec_id, x.label,
         SUM(CAST((x.v - m.mu) * (x.v - m.mu) AS DECIMAL(28,18))) AS d2
  FROM x JOIN m ON x.label = m.label AND x.i = m.i
  GROUP BY 1, 2
)
SELECT label, vec_id, CAST(rn AS INTEGER) AS rank,
       ROUND(CAST(d2 AS DOUBLE), 6) AS dist2
FROM (SELECT label, vec_id, d2,
             row_number() OVER (PARTITION BY label
                                ORDER BY d2 DESC, vec_id) AS rn
      FROM d)
WHERE rn <= {OUTLIER_TOPK}
"""


@query("embedding_outlier_topk", oracle=EMB_OUTLIER_ORACLE)
def embedding_outlier_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier mining: the ``OUTLIER_TOPK`` vectors
    FARTHEST from their label's centroid, per label — the curation
    primitive behind mislabel detection and embedding-drift triage
    (a point far from its own class center is a labeling error, an
    ambiguous document, or genuinely novel content worth human review).

    Determinism (the ann-family decimal discipline): per-dim centroid
    sums accumulate as exact DECIMAL(28,18) casts of identical doubles
    (order-free), the mean is ONE IEEE division per (label, dim), and
    each vector's squared distance folds IN-ROW over the broadcast
    centroid array as exact decimal addition of identical double
    products — ranked on the EXACT decimal before the final
    round-to-6 display cast, so both engines emit the identical top-k.

    Scale: one per-dim exchange bounded by |labels| x dims builds the
    centroids; the distance pass is a BROADCAST join (centroid table is
    |labels| rows) + an in-row fold — no per-dimension explode of the
    big side, no all-pairs anything; the ranking window partitions by
    label. 100 TB of vectors pays one scan and a labels-x-dims-sized
    exchange."""
    exp = _exploded(spark, sf_dir)
    s = exp.groupBy("label", "i").agg(
        F.sum(F.expr("CAST(v AS DECIMAL(28,18))")).alias("sv"),
        F.count(F.lit(1)).alias("n"),
    )
    m = s.select(
        "label", "i", (F.col("sv").cast("double") / F.col("n")).alias("mu")
    )
    cent = (
        m.groupBy("label")
        .agg(F.sort_array(F.collect_list(F.struct("i", "mu"))).alias("cm"))
        .select("label", F.expr("transform(cm, s -> s.mu)").alias("cent"))
    )
    from .dedup import _dec_sqdist_expr

    emb = table(spark, sf_dir, "embeddings")
    d = emb.join(F.broadcast(cent), "label").select(
        "label",
        "vec_id",
        F.expr(_dec_sqdist_expr("embedding", "cent")).alias("d2"),
    )
    w = Window.partitionBy("label").orderBy(F.desc("d2"), F.asc("vec_id"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= OUTLIER_TOPK)
        .select(
            "label",
            "vec_id",
            F.col("rn").cast("int").alias("rank"),
            F.round(F.col("d2").cast("double"), 6).alias("dist2"),
        )
    )


# --- calibrated IVF: cells ~ sqrt(n), the partition-count twin of the
# calibrated LSH width ------------------------------------------------------

IVF_CAL_MIN_EXP = 3   # >= 8 cells
IVF_CAL_MAX_EXP = 12  # <= 4096 cells
IVF_CAL_NPROBE = 4


def calibrated_ivf_cells(n: int) -> int:
    """Smallest power-of-two cell count k = 2^j in [8, 4096] with
    k^2 >= n — the classic IVF rule (cells ~ sqrt(n)) that keeps the
    per-query scored candidate set ~ n_probe * sqrt(n): 500 vectors ->
    32 cells, 2000 -> 64, 50k -> 256, 1M -> 1024."""
    j = IVF_CAL_MIN_EXP
    while j < IVF_CAL_MAX_EXP and (1 << (2 * j)) < n:
        j += 1
    return 1 << j


def _ivf_cells_sql_case(n_expr: str) -> str:
    """DuckDB twin of ``calibrated_ivf_cells`` over the same integer
    thresholds (n <= 4^j -> 2^j cells)."""
    arms = " ".join(
        f"WHEN ({n_expr}) <= {1 << (2 * j)} THEN {1 << j}"
        for j in range(IVF_CAL_MIN_EXP, IVF_CAL_MAX_EXP)
    )
    return f"(CASE {arms} ELSE {1 << IVF_CAL_MAX_EXP} END)"


IVF_CAL_ORACLE = f"""
WITH xm AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding,
           v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS xm
  FROM embeddings
),
ncells AS (SELECT {_ivf_cells_sql_case("(SELECT COUNT(*) FROM embeddings)")} AS k),
seeds AS MATERIALIZED (
  SELECT vec_id AS seed_id, xm AS sm
  FROM (SELECT vec_id, xm, ROW_NUMBER() OVER (ORDER BY vec_id) AS rk
        FROM xm) t, ncells
  WHERE rk <= ncells.k
),
d1 AS (
  SELECT x.vec_id, s.seed_id,
         CAST(list_sum(list_transform(range(1, len(x.xm) + 1),
              i -> (x.xm[i] - s.sm[i]) * (x.xm[i] - s.sm[i]))) AS BIGINT) AS d2
  FROM xm x CROSS JOIN seeds s
),
a1 AS MATERIALIZED (
  SELECT vec_id, seed_id AS cluster FROM (
    SELECT vec_id, seed_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, seed_id) AS rn
    FROM d1) t WHERE rn = 1
),
psum AS (
  SELECT a.cluster, r.i AS pos, SUM(x.xm[r.i]) AS s, COUNT(*) AS n
  FROM a1 a JOIN xm x USING (vec_id), range(1, 65) r(i)
  GROUP BY 1, 2
),
carr AS MATERIALIZED (
  SELECT cluster, list(CAST(round(CAST(s AS DOUBLE) / n) AS BIGINT)
                       ORDER BY pos) AS cm
  FROM psum GROUP BY cluster
),
d2_ AS (
  SELECT x.vec_id, c.cluster,
         CAST(list_sum(list_transform(range(1, len(x.xm) + 1),
              i -> (x.xm[i] - c.cm[i]) * (x.xm[i] - c.cm[i]))) AS BIGINT) AS d2
  FROM xm x CROSS JOIN carr c
),
a2 AS MATERIALIZED (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
    FROM d2_) t WHERE rn = 1
),
probe AS MATERIALIZED (
  SELECT qid, cluster FROM (
    SELECT q.vec_id AS qid, c.cluster,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
             CAST(list_sum(list_transform(range(1, len(q.xm) + 1),
                  i -> (q.xm[i] - c.cm[i]) * (q.xm[i] - c.cm[i]))) AS BIGINT),
             c.cluster) AS rn
    FROM (SELECT * FROM xm WHERE vec_id < {N_QUERIES}) q
    CROSS JOIN carr c) t
  WHERE rn <= {IVF_CAL_NPROBE}
),
x AS MATERIALIZED ({EXPLODED_DUCK}),
norms AS MATERIALIZED (
  SELECT vec_id, SUM(CAST(v * v AS DECIMAL(28,18))) AS n2 FROM x GROUP BY vec_id
),
cand AS (
  SELECT p.qid, a.vec_id AS cid
  FROM probe p JOIN a2 a ON a.cluster = p.cluster
  WHERE a.vec_id <> p.qid
),
dots AS (
  SELECT cand.qid, cand.cid,
         SUM(CAST(qx.v * cx.v AS DECIMAL(28,18))) AS dot
  FROM cand
  JOIN x qx ON qx.vec_id = cand.qid
  JOIN x cx ON cx.vec_id = cand.cid AND cx.i = qx.i
  GROUP BY 1, 2
),
cos AS (
  SELECT qid, cid,
         CAST(dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) AS c
  FROM dots JOIN norms nq ON qid = nq.vec_id JOIN norms nc ON cid = nc.vec_id
)
SELECT qid AS query_id, cid AS neighbor_id,
       CAST(rn AS INTEGER) AS rank, ROUND(c, 6) AS cosine,
       (SELECT CAST(k AS INTEGER) FROM ncells) AS n_cells
FROM (SELECT qid, cid, c,
             row_number() OVER (PARTITION BY qid ORDER BY c DESC, cid) AS rn
      FROM cos)
WHERE rn <= {TOP_K}
"""


_IVF_CENT_MEMOS: dict[int, dict[tuple[str, str], DataFrame]] = {}
_IVF_CELL_MEMOS: dict[int, dict[tuple[str, str], DataFrame]] = {}


def ivf_centroid_table(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """DataFrame[cluster, cm] — the calibrated IVF index's iter-2
    centroid arrays as a k-versioned persisted derived table (the
    ``lsh_sig_table`` pattern: the O(n * k) Lloyd build is offline
    index-build work, paid once per corpus version, never on the warm
    query path)."""
    from ..derived import derived_table
    from ..memo import session_memo

    def build() -> DataFrame:
        emb = table(spark, sf_dir, "embeddings")
        xm = emb.select("vec_id", F.expr(_MICRO_ARR).alias("xm"))
        seeds = (
            xm.orderBy("vec_id")
            .limit(k)
            .select(F.col("vec_id").alias("seed_id"), F.col("xm").alias("sm"))
        )
        d1 = xm.crossJoin(F.broadcast(seeds)).select(
            "vec_id",
            "xm",
            "seed_id",
            F.expr(_sqd_micro("xm", "sm")).alias("d2"),
        )
        a1 = d1.groupBy("vec_id").agg(
            F.expr("min_by(seed_id, struct(d2, seed_id))").alias("cluster"),
            F.first("xm").alias("xm"),
        )
        cent = (
            a1.select("cluster", F.posexplode("xm").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .select(
                "cluster",
                "pos",
                F.expr(
                    "cast(round(cast(s as double) / n) as bigint)"
                ).alias("cm"),
            )
        )
        return cent.groupBy("cluster").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, cm))),"
                " x -> x.cm)"
            ).alias("cm")
        )

    return session_memo(
        _IVF_CENT_MEMOS.setdefault(k, {}),
        spark,
        sf_dir,
        lambda: derived_table(
            spark, sf_dir, f"embedding_ivf_cents_k{k}", ("embeddings",), build
        ),
    )


def ivf_cell_table(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """DataFrame[vec_id, cluster] — every vector's iter-2 cell
    assignment against ``ivf_centroid_table``, as its own k-versioned
    persisted derived table."""
    from ..derived import derived_table
    from ..memo import session_memo

    def build() -> DataFrame:
        emb = table(spark, sf_dir, "embeddings")
        xm = emb.select("vec_id", F.expr(_MICRO_ARR).alias("xm"))
        carr = ivf_centroid_table(spark, sf_dir, k)
        d2 = xm.crossJoin(F.broadcast(carr)).select(
            "vec_id",
            "cluster",
            F.expr(_sqd_micro("xm", "cm")).alias("d2"),
        )
        return d2.groupBy("vec_id").agg(
            F.expr("min_by(cluster, struct(d2, cluster))").alias("cluster")
        )

    return session_memo(
        _IVF_CELL_MEMOS.setdefault(k, {}),
        spark,
        sf_dir,
        lambda: derived_table(
            spark, sf_dir, f"embedding_ivf_cells_k{k}", ("embeddings",), build
        ),
    )


@query("ann_ivf_calibrated_topk", oracle=IVF_CAL_ORACLE)
def ann_ivf_calibrated_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with the CELL COUNT calibrated to the corpus — the
    partition-geometry twin of ``ann_lsh_calibrated_topk``: k = smallest
    power-of-two with k^2 >= n (cells ~ sqrt(n), clamped [8, 4096]), so
    the per-query scored candidate set stays ~ n_probe * n / k =
    n_probe * sqrt(n) as the corpus grows, where the label-based
    ``ann_ivf_topk`` is pinned to 10 fixed cells (its per-query work is
    n/5 — linear in n). Cells come from two deterministic Lloyd
    iterations (the ``kmeans_embeddings`` recipe verbatim: smallest-k
    vec_id seeds, micro-unit integer distances, ties to the smaller
    cluster id), queries probe their ``IVF_CAL_NPROBE`` nearest
    centroids, and only vectors assigned to probed cells are scored —
    with the same exact-decimal cosine and tie rule as every ANN twin.
    The derived cell count is emitted as ``n_cells`` so the gate
    hash-checks the calibration (the sig_bits convention).

    Plan: the index (iter-2 centroids + cell assignment) is built ONCE
    per corpus version as persisted derived tables — the production
    offline-index pattern ``lsh_sig_table`` set; the O(n * k) = O(n^1.5)
    Lloyd build never rides on the query path warm (the r10 probe
    measured the inlined build growing 5.5 -> 22 s across a 25x
    corpus scale-up before this split). At query time: centroids and
    probe lists are K-row broadcasts; the candidate join is an
    equi-join on cluster id. 100x the vectors: k and n_probe absorb it
    as sqrt factors on the scored candidate count."""
    from .dedup import _dec_dot_expr

    emb = table(spark, sf_dir, "embeddings")
    n = table_row_count(spark, sf_dir, "embeddings")
    k = calibrated_ivf_cells(n)
    carr = ivf_centroid_table(spark, sf_dir, k)
    a2 = ivf_cell_table(spark, sf_dir, k)
    xm = emb.select("vec_id", F.expr(_MICRO_ARR).alias("xm"))
    qprobe_d = (
        xm.where(F.col("vec_id") < N_QUERIES)
        .crossJoin(F.broadcast(carr))
        .select(
            F.col("vec_id").alias("qid"),
            "cluster",
            F.expr(_sqd_micro("xm", "cm")).alias("d2"),
        )
    )
    wq = Window.partitionBy("qid").orderBy(F.asc("d2"), F.asc("cluster"))
    probe = (
        qprobe_d.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= IVF_CAL_NPROBE)
        .select("qid", "cluster")
    )
    ed = emb.select(
        "vec_id",
        "embedding",
        F.expr(_dec_dot_expr("embedding", "embedding")).alias("n2"),
    )
    q = ed.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("qn2"),
    )
    cand = (
        a2.join(F.broadcast(probe), "cluster")
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("cid"))
    )
    cos = (
        cand.join(ed.alias("c"), cand.cid == F.col("c.vec_id"))
        .join(F.broadcast(q), "qid")
        .select(
            "qid",
            "cid",
            (
                F.expr(_dec_dot_expr("q_emb", "c.embedding")).cast("double")
                / (
                    F.sqrt(F.col("qn2").cast("double"))
                    * F.sqrt(F.col("c.n2").cast("double"))
                )
            ).alias("c"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("c"), F.asc("cid"))
    return (
        cos.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("neighbor_id"),
            F.col("rn").cast("int").alias("rank"),
            F.round("c", 6).alias("cosine"),
            F.lit(k).cast("int").alias("n_cells"),
        )
    )


# --- recall audit for the CALIBRATED index family (r10) -------------------

CAL_RECALL_ORACLE = f"""
WITH exact AS ({_brute_oracle(N_QUERIES)}),
lshc AS ({LSH_CALIBRATED_ORACLE}),
ivfc AS ({IVF_CAL_ORACLE})
SELECT e.query_id,
       COUNT(*) AS n_exact,
       CAST(SUM(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS lsh_cal_hits,
       ROUND(SUM(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             * 1.0 / COUNT(*), 6) AS lsh_cal_recall,
       CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS ivf_cal_hits,
       ROUND(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             * 1.0 / COUNT(*), 6) AS ivf_cal_recall
FROM exact e
LEFT JOIN lshc l
  ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
LEFT JOIN ivfc i
  ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
GROUP BY e.query_id
"""


@query("ann_calibrated_recall_audit", oracle=CAL_RECALL_ORACLE)
def ann_calibrated_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of BOTH calibrated index paths (width-calibrated
    multiprobe LSH, sqrt-cell IVF) against the exact brute-force
    baseline in one per-query row — the acceptance gate for the r10
    index family, extending ``ann_recall_audit``'s exact-vs-approx twin
    discipline. Composes the three registered operators, so the audit
    measures the code that serves queries; the oracle composes their
    oracle SQL as CTEs, so the composition itself is gate-checked.

    Scale: all three inputs end at k rows per query; the audit joins
    (|queries| x k)-sized frames — negligible next to the searches. At
    100 TB run it on a query sample; per-query rows mean a recall
    regression localizes to the queries it hurt."""
    exact = ann_cosine_topk(spark, sf_dir).alias("e")
    lshc = ann_lsh_calibrated_topk(spark, sf_dir).alias("l")
    ivfc = ann_ivf_calibrated_topk(spark, sf_dir).alias("i")
    joined = (
        exact.join(
            lshc,
            (F.col("e.query_id") == F.col("l.query_id"))
            & (F.col("e.neighbor_id") == F.col("l.neighbor_id")),
            "left",
        )
        .join(
            ivfc,
            (F.col("e.query_id") == F.col("i.query_id"))
            & (F.col("e.neighbor_id") == F.col("i.neighbor_id")),
            "left",
        )
    )
    lhit = F.when(F.col("l.neighbor_id").isNotNull(), 1).otherwise(0)
    ihit = F.when(F.col("i.neighbor_id").isNotNull(), 1).otherwise(0)
    return joined.groupBy(F.col("e.query_id").alias("query_id")).agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.sum(lhit).cast("long").alias("lsh_cal_hits"),
        F.round(F.sum(lhit) * 1.0 / F.count(F.lit(1)), 6).alias(
            "lsh_cal_recall"
        ),
        F.sum(ihit).cast("long").alias("ivf_cal_hits"),
        F.round(F.sum(ihit) * 1.0 / F.count(F.lit(1)), 6).alias(
            "ivf_cal_recall"
        ),
    )


# --------------------------------------------------------------------------
# Product quantization (PQ) + ADC top-k (r11): the third leg of the
# production ANN triad after LSH and IVF — compress vectors to M
# codebook codes, score queries against the compressed corpus via
# asymmetric-distance lookup tables
# --------------------------------------------------------------------------

PQ_M = 8      # subspaces (64 dims -> 8 subvectors of 8)
PQ_DSUB = 8   # dims per subspace
PQ_K = 16     # codewords per subspace (a 4-bit code)

PQ_ADC_ORACLE = f"""
WITH xm AS (
  SELECT vec_id, list_transform(embedding,
           v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS xm
  FROM embeddings
),
sub AS (
  SELECT vec_id, r.m AS m,
         xm[CAST(r.m * {PQ_DSUB} + 1 AS INT) :
            CAST(r.m * {PQ_DSUB} + {PQ_DSUB} AS INT)] AS sv
  FROM xm, range(0, {PQ_M}) r(m)
),
seeds AS (
  SELECT m, vec_id AS code, sv AS cw FROM sub WHERE vec_id < {PQ_K}
),
d1 AS (
  SELECT s.vec_id, s.m, sd.code,
         CAST(list_sum(list_transform(range(1, {PQ_DSUB} + 1),
              i -> (s.sv[i] - sd.cw[i]) * (s.sv[i] - sd.cw[i]))) AS BIGINT) AS d2
  FROM sub s JOIN seeds sd ON sd.m = s.m
),
a1 AS (
  SELECT vec_id, m, code FROM (
    SELECT vec_id, m, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, code) AS rn
    FROM d1) t WHERE rn = 1
),
psum AS (
  SELECT a.m, a.code, r.i AS pos, SUM(s.sv[r.i]) AS ps, COUNT(*) AS n
  FROM a1 a JOIN sub s ON s.vec_id = a.vec_id AND s.m = a.m,
       range(1, {PQ_DSUB} + 1) r(i)
  GROUP BY 1, 2, 3
),
cb AS (
  SELECT m, code,
         list(CAST(round(CAST(ps AS DOUBLE) / n) AS BIGINT) ORDER BY pos) AS cw
  FROM psum GROUP BY m, code
),
enc AS (
  SELECT vec_id, m, code FROM (
    SELECT s.vec_id, s.m, c.code,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m ORDER BY
             CAST(list_sum(list_transform(range(1, {PQ_DSUB} + 1),
                  i -> (s.sv[i] - c.cw[i]) * (s.sv[i] - c.cw[i]))) AS BIGINT),
             c.code) AS rn
    FROM sub s JOIN cb c ON c.m = s.m) t WHERE rn = 1
),
lut AS (
  SELECT s.vec_id AS qid, s.m, c.code,
         CAST(list_sum(list_transform(range(1, {PQ_DSUB} + 1),
              i -> (s.sv[i] - c.cw[i]) * (s.sv[i] - c.cw[i]))) AS BIGINT) AS d2
  FROM sub s JOIN cb c ON c.m = s.m
  WHERE s.vec_id < {N_QUERIES}
),
adc AS (
  SELECT l.qid, e.vec_id AS cid, SUM(l.d2) AS adc_d2
  FROM enc e JOIN lut l ON l.m = e.m AND l.code = e.code
  WHERE e.vec_id <> l.qid
  GROUP BY 1, 2
)
SELECT qid AS query_id, cid AS neighbor_id, CAST(rn AS INTEGER) AS rank,
       CAST(adc_d2 AS BIGINT) AS adc_d2_micro
FROM (SELECT qid, cid, adc_d2,
             row_number() OVER (PARTITION BY qid ORDER BY adc_d2, cid) AS rn
      FROM adc)
WHERE rn <= {TOP_K}
"""


@query("pq_adc_topk", oracle=PQ_ADC_ORACLE)
def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN with asymmetric-distance (ADC) scoring —
    the third production index family after LSH and IVF (Jegou et al.,
    "Product Quantization for Nearest Neighbor Search", public): split
    each 64-dim vector into ``PQ_M`` = 8 subvectors, train a ``PQ_K`` =
    16-codeword codebook per subspace (one deterministic micro-int
    Lloyd refinement seeded by the smallest vec_ids — the
    ``kmeans_embeddings`` recipe per subspace), ENCODE every vector as
    8 four-bit codes, then score each query against the COMPRESSED
    corpus: per query, an 8 x 16-entry lookup table of exact integer
    subspace distances, and each candidate's estimated distance is the
    sum of 8 table lookups selected by its codes. Ranking is
    (adc_d2 asc, cid) — all integer, so the full training + encode +
    score pipeline carries a full-value oracle (every codebook
    coordinate, code assignment, and ADC distance is hash-checked
    through the SQL replay).

    Scale story: the encoded corpus is 8 x 4 bits = 4 BYTES per vector
    (128x smaller than the float64 store; the int8 store is 16x larger
    than this) — at 100 TB of embeddings the PQ codes fit hot storage
    outright. Scoring never touches raw vectors: one broadcast of the
    per-query LUT (M x K rows) joins the code table, an
    embarrassingly parallel scan of 4-byte payloads. Codebook training
    is the kmeans shape (broadcast seeds/centroids x one corpus pass
    per iteration); encode is one pass. The recall/compression
    trade (PQ_K, PQ_M) is the standard knob pair; IVF-PQ composition
    (route to cells, PQ-score within) follows from the registered IVF
    cell tables and this operator's LUT join.

    Honest recall floor (measured r11): recall@5 vs the exact brute is
    0.28 at sf0.001 AND sf0.01 — the same near-isotropic-corpus ceiling
    the LSH family documents (true neighbors sit at cosine ~0.35, and
    128x compression cannot keep them separable; on a real embedding
    corpus with neighbors at cosine ~0.9 the identical params recall
    far higher). Production PQ pairs the ADC scan with an exact rerank
    of the shortlist — the composition ``ann_int8_rerank_topk``
    demonstrates on the int8 store. A verbatim duplicate of a query
    shares the query's codes, so its ADC distance equals the query's
    OWN quantization distortion — the minimum any candidate can achieve
    (ADC is asymmetric: distances run query-to-codeword, never
    query-to-candidate) — and it must rank first (pinned in tests)."""
    enc, lut = _pq_codes_and_lut(spark, sf_dir, N_QUERIES)
    adc = (
        enc.join(F.broadcast(lut), ["m", "code"])
        .where(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", F.col("vec_id").alias("cid"))
        .agg(F.sum("d2").alias("adc_d2"))
    )
    w_q = Window.partitionBy("qid").orderBy("adc_d2", "cid")
    return (
        adc.withColumn("rn", F.row_number().over(w_q))
        .where(F.col("rn") <= TOP_K)
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("neighbor_id"),
            F.col("rn").cast("int").alias("rank"),
            F.col("adc_d2").cast("long").alias("adc_d2_micro"),
        )
    )


def _pq_sub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame[vec_id, m, sv] — every vector's micro-int subvectors."""
    emb = table(spark, sf_dir, "embeddings")
    xm = emb.select("vec_id", F.expr(_MICRO_ARR).alias("xm"))
    return xm.select(
        "vec_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {PQ_M - 1}),"
                f" m -> slice(xm, m * {PQ_DSUB} + 1, {PQ_DSUB}))"
            )
        ).alias("m", "sv"),
    )


_PQ_CB_MEMO: dict[tuple[str, str], DataFrame] = {}
_PQ_CODES_MEMO: dict[tuple[str, str], DataFrame] = {}


def pq_codebook_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame[m, code, cw] — the trained PQ codebooks as a persisted
    derived table (the ``ivf_centroid_table`` rule, applied per the r11
    quantized-family probe's finding: training inside the query was the
    dominant cost of both PQ arms at probe scale; a production
    deployment trains offline once per corpus version). One seeded
    Lloyd refinement per subspace, deterministic micro-int arithmetic,
    versioned by the (M, K) hyperparameters in the table name."""
    from ..derived import derived_table
    from ..memo import session_memo

    def build() -> DataFrame:
        sub = _pq_sub(spark, sf_dir)
        seeds = sub.where(F.col("vec_id") < PQ_K).select(
            "m", F.col("vec_id").alias("code"), F.col("sv").alias("cw")
        )
        d1 = sub.join(F.broadcast(seeds), "m").select(
            "vec_id", "m", "code", F.expr(_sqd_micro("sv", "cw")).alias("d2")
        )
        # argmin via min_by (map-side partial aggregation — the kmeans
        # recipe; r12: the row_number window formulation OOM'd the
        # 8 GiB probe harness at 500k x M rows, a sort exchange the
        # assignment never needed). min of struct(d2, code) IS the
        # (d2 asc, code) tie rule.
        a1 = d1.groupBy("vec_id", "m").agg(
            F.expr("min_by(code, struct(d2, code))").alias("code")
        )
        psum = (
            a1.join(sub, ["vec_id", "m"])
            .select("m", "code", F.posexplode("sv").alias("pos", "x"))
            .groupBy("m", "code", "pos")
            .agg(F.sum("x").alias("ps"), F.count(F.lit(1)).alias("n"))
        )
        return (
            psum.select(
                "m",
                "code",
                "pos",
                F.expr(
                    "CAST(round(CAST(ps AS DOUBLE) / n) AS BIGINT)"
                ).alias("cm"),
            )
            .groupBy("m", "code")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, cm))),"
                    " s -> s.cm)"
                ).alias("cw")
            )
        )

    return session_memo(
        _PQ_CB_MEMO,
        spark,
        sf_dir,
        lambda: derived_table(
            spark,
            sf_dir,
            f"embedding_pq_cb_m{PQ_M}k{PQ_K}",
            ("embeddings",),
            build,
        ),
    )


def pq_code_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame[vec_id, m, code] — the ENCODED corpus (every vector's
    M codes against ``pq_codebook_table``) as its own persisted derived
    table: this IS the production PQ index, 4 bits per (vector,
    subspace) on disk."""
    from ..derived import derived_table
    from ..memo import session_memo

    def build() -> DataFrame:
        sub = _pq_sub(spark, sf_dir)
        cb = pq_codebook_table(spark, sf_dir)
        return (
            sub.join(F.broadcast(cb), "m")
            .select(
                "vec_id",
                "m",
                "code",
                F.expr(_sqd_micro("sv", "cw")).alias("d2"),
            )
            .groupBy("vec_id", "m")
            .agg(F.expr("min_by(code, struct(d2, code))").alias("code"))
            .select("vec_id", "m", "code")
        )

    return session_memo(
        _PQ_CODES_MEMO,
        spark,
        sf_dir,
        lambda: derived_table(
            spark,
            sf_dir,
            f"embedding_pq_codes_m{PQ_M}k{PQ_K}",
            ("embeddings",),
            build,
        ),
    )


def _pq_codes_and_lut(spark: SparkSession, sf_dir: str, n_queries: int):
    """(enc DataFrame[vec_id, m, code], lut DataFrame[qid, m, code, d2])
    — the shared PQ serve-path machinery: the PERSISTED codebook and
    code tables (offline index work, r11 probe fix) plus the per-query
    ADC lookup tables, which are the only thing computed at query time
    (n_queries x M x K tiny rows). Used by ``pq_adc_topk`` (full-corpus
    code scan) and ``ivf_pq_topk`` (cell-routed scan)."""
    cb = pq_codebook_table(spark, sf_dir)
    enc = pq_code_table(spark, sf_dir)
    lut = (
        _pq_sub(spark, sf_dir)
        .where(F.col("vec_id") < n_queries)
        .join(F.broadcast(cb), "m")
        .select(
            F.col("vec_id").alias("qid"),
            "m",
            "code",
            F.expr(_sqd_micro("sv", "cw")).alias("d2"),
        )
    )
    return enc, lut


# --------------------------------------------------------------------------
# IVF-PQ (r11): the production composition — route each query to its
# nprobe nearest calibrated IVF cells, then ADC-score ONLY those cells'
# vectors against the PQ code table
# --------------------------------------------------------------------------

# the calibrated-IVF routing prefix (micro-int vectors, seeded 2-iter
# Lloyd centroids, cell assignment, nprobe query routing) shared by the
# raw-PQ composition below and the residual-PQ variant
_IVF_ROUTE_CTES = f"""
WITH xm AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding,
           v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS xm
  FROM embeddings
),
ncells AS (SELECT {_ivf_cells_sql_case("(SELECT COUNT(*) FROM embeddings)")} AS k),
seeds AS MATERIALIZED (
  SELECT vec_id AS seed_id, xm AS sm
  FROM (SELECT vec_id, xm, ROW_NUMBER() OVER (ORDER BY vec_id) AS rk
        FROM xm) t, ncells
  WHERE rk <= ncells.k
),
d1 AS (
  SELECT x.vec_id, s.seed_id,
         CAST(list_sum(list_transform(range(1, len(x.xm) + 1),
              i -> (x.xm[i] - s.sm[i]) * (x.xm[i] - s.sm[i]))) AS BIGINT) AS d2
  FROM xm x CROSS JOIN seeds s
),
a1 AS MATERIALIZED (
  SELECT vec_id, seed_id AS cluster FROM (
    SELECT vec_id, seed_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, seed_id) AS rn
    FROM d1) t WHERE rn = 1
),
psum AS (
  SELECT a.cluster, r.i AS pos, SUM(x.xm[r.i]) AS s, COUNT(*) AS n
  FROM a1 a JOIN xm x USING (vec_id), range(1, 65) r(i)
  GROUP BY 1, 2
),
carr AS MATERIALIZED (
  SELECT cluster, list(CAST(round(CAST(s AS DOUBLE) / n) AS BIGINT)
                       ORDER BY pos) AS cm
  FROM psum GROUP BY cluster
),
d2_ AS (
  SELECT x.vec_id, c.cluster,
         CAST(list_sum(list_transform(range(1, len(x.xm) + 1),
              i -> (x.xm[i] - c.cm[i]) * (x.xm[i] - c.cm[i]))) AS BIGINT) AS d2
  FROM xm x CROSS JOIN carr c
),
a2 AS MATERIALIZED (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
    FROM d2_) t WHERE rn = 1
),
probe AS MATERIALIZED (
  SELECT qid, cluster FROM (
    SELECT q.vec_id AS qid, c.cluster,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
             CAST(list_sum(list_transform(range(1, len(q.xm) + 1),
                  i -> (q.xm[i] - c.cm[i]) * (q.xm[i] - c.cm[i]))) AS BIGINT),
             c.cluster) AS rn
    FROM (SELECT * FROM xm WHERE vec_id < {N_QUERIES}) q
    CROSS JOIN carr c) t
  WHERE rn <= {IVF_CAL_NPROBE}
)"""

_IVF_PQ_CTE_BODY = f"""{_IVF_ROUTE_CTES},
sub AS MATERIALIZED (
  SELECT vec_id, r.m AS m,
         xm[CAST(r.m * {PQ_DSUB} + 1 AS INT) :
            CAST(r.m * {PQ_DSUB} + {PQ_DSUB} AS INT)] AS sv
  FROM xm, range(0, {PQ_M}) r(m)
),
pqseeds AS (
  SELECT m, vec_id AS code, sv AS cw FROM sub WHERE vec_id < {PQ_K}
),
pqd1 AS (
  SELECT s.vec_id, s.m, sd.code,
         CAST(list_sum(list_transform(range(1, {PQ_DSUB} + 1),
              i -> (s.sv[i] - sd.cw[i]) * (s.sv[i] - sd.cw[i]))) AS BIGINT) AS d2
  FROM sub s JOIN pqseeds sd ON sd.m = s.m
),
pqa1 AS (
  SELECT vec_id, m, code FROM (
    SELECT vec_id, m, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, code) AS rn
    FROM pqd1) t WHERE rn = 1
),
pqpsum AS (
  SELECT a.m, a.code, r.i AS pos, SUM(s.sv[r.i]) AS ps, COUNT(*) AS n
  FROM pqa1 a JOIN sub s ON s.vec_id = a.vec_id AND s.m = a.m,
       range(1, {PQ_DSUB} + 1) r(i)
  GROUP BY 1, 2, 3
),
cb AS MATERIALIZED (
  SELECT m, code,
         list(CAST(round(CAST(ps AS DOUBLE) / n) AS BIGINT) ORDER BY pos) AS cw
  FROM pqpsum GROUP BY m, code
),
enc AS MATERIALIZED (
  SELECT vec_id, m, code FROM (
    SELECT s.vec_id, s.m, c.code,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m ORDER BY
             CAST(list_sum(list_transform(range(1, {PQ_DSUB} + 1),
                  i -> (s.sv[i] - c.cw[i]) * (s.sv[i] - c.cw[i]))) AS BIGINT),
             c.code) AS rn
    FROM sub s JOIN cb c ON c.m = s.m) t WHERE rn = 1
),
lut AS MATERIALIZED (
  SELECT s.vec_id AS qid, s.m, c.code,
         CAST(list_sum(list_transform(range(1, {PQ_DSUB} + 1),
              i -> (s.sv[i] - c.cw[i]) * (s.sv[i] - c.cw[i]))) AS BIGINT) AS d2
  FROM sub s JOIN cb c ON c.m = s.m
  WHERE s.vec_id < {N_QUERIES}
),
cand AS (
  SELECT p.qid, a.vec_id AS cid
  FROM probe p JOIN a2 a ON a.cluster = p.cluster
  WHERE a.vec_id <> p.qid
),
adc AS (
  SELECT c.qid, c.cid, SUM(l.d2) AS adc_d2
  FROM cand c
  JOIN enc e ON e.vec_id = c.cid
  JOIN lut l ON l.qid = c.qid AND l.m = e.m AND l.code = e.code
  GROUP BY 1, 2
)"""

IVF_PQ_ORACLE = f"""{_IVF_PQ_CTE_BODY}
SELECT qid AS query_id, cid AS neighbor_id, CAST(rn AS INTEGER) AS rank,
       CAST(adc_d2 AS BIGINT) AS adc_d2_micro,
       (SELECT CAST(k AS INTEGER) FROM ncells) AS n_cells
FROM (SELECT qid, cid, adc_d2,
             row_number() OVER (PARTITION BY qid ORDER BY adc_d2, cid) AS rn
      FROM adc)
WHERE rn <= {TOP_K}
"""


@query("ivf_pq_topk", oracle=IVF_PQ_ORACLE)
def ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: the composition production vector stores actually run
    (FAISS's IndexIVFPQ shape, from the same public PQ paper) — route
    each query to its ``IVF_CAL_NPROBE`` nearest calibrated IVF cells
    (the persisted k ~ sqrt(n) index of ``ann_ivf_calibrated_topk``),
    then ADC-score ONLY those cells' vectors against the PQ code table
    (the shared ``_pq_codes_and_lut`` machinery of ``pq_adc_topk``).
    Candidate count per query is ~ nprobe * n/k = nprobe * sqrt(n)
    rows of 4-byte codes; everything stays integer, so the full
    route + train + encode + score pipeline is hash-checked through
    the SQL replay, with the cell-count derivation itself emitted as
    ``n_cells`` (the calibrated-family convention).

    Scale: this is THE 100 TB serve plan — the coarse index prunes the
    scan to nprobe cells (the IVF story), the fine index shrinks what
    those cells store and stream to 4 B/vector (the PQ story), and the
    two compose as one broadcast-probe join + one code-table join. The
    recall budget splits multiplicatively across routing (nprobe/k) and
    quantization (PQ_M x PQ_K); both knobs are the registered
    single-family operators' measured territory."""
    adc, k = _ivf_pq_adc(spark, sf_dir)
    w_q = Window.partitionBy("qid").orderBy("adc_d2", "cid")
    return (
        adc.withColumn("rn", F.row_number().over(w_q))
        .where(F.col("rn") <= TOP_K)
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("neighbor_id"),
            F.col("rn").cast("int").alias("rank"),
            F.col("adc_d2").cast("long").alias("adc_d2_micro"),
            F.lit(k).cast("int").alias("n_cells"),
        )
    )


# unexecuted ADC plans per (app, sf_dir, embeddings fingerprint) — the
# r15 reader-plan-memo rule (lazy plans only, nothing caches rows)
_IVF_PQ_ADC_MEMO: dict[tuple, tuple[DataFrame, int]] = {}


def _ivf_pq_adc(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, int]:
    """(adc DataFrame[qid, cid, adc_d2], n_cells) — the shared IVF-PQ
    scoring pipeline: calibrated-cell routing (broadcast probe against
    the persisted centroid/cell tables) followed by the broadcast-LUT
    ADC join over the persisted 4-byte code table. ``ivf_pq_topk`` cuts
    this to top-k directly; ``ivf_pq_rerank_topk`` keeps a wider
    shortlist and re-scores it exactly.

    r16 (guide §5 — the driver should do almost no work): the returned
    PLAN is memoized per (session, sf_dir, embeddings fingerprint) —
    cProfile showed the recall audit building this identical ~0.2 s
    lineage twice (once per composed consumer); the memo stores the
    unexecuted DataFrame only, every action still runs the full
    pipeline, and a corpus change misses via the fingerprint."""
    from ..derived import _source_fingerprint

    app = spark.sparkContext.applicationId
    key = (
        app,
        os.path.abspath(sf_dir),
        _source_fingerprint(sf_dir, ("embeddings",)),
    )
    hit = _IVF_PQ_ADC_MEMO.get(key)
    if hit is not None:
        return hit
    for stale in [k for k in _IVF_PQ_ADC_MEMO if k[0] != app]:
        del _IVF_PQ_ADC_MEMO[stale]
    n = table_row_count(spark, sf_dir, "embeddings")
    k = calibrated_ivf_cells(n)
    emb = table(spark, sf_dir, "embeddings")
    xm = emb.select("vec_id", F.expr(_MICRO_ARR).alias("xm"))
    carr = ivf_centroid_table(spark, sf_dir, k)
    cells = ivf_cell_table(spark, sf_dir, k)
    probe = (
        xm.where(F.col("vec_id") < N_QUERIES)
        .crossJoin(F.broadcast(carr))
        .select(
            F.col("vec_id").alias("qid"),
            "cluster",
            F.expr(_sqd_micro("xm", "cm")).alias("d2"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy("d2", "cluster")
            ),
        )
        .where(F.col("rn") <= IVF_CAL_NPROBE)
        .select("qid", "cluster")
    )
    cand = (
        cells.join(F.broadcast(probe), "cluster")
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("cid"))
    )
    enc, lut = _pq_codes_and_lut(spark, sf_dir, N_QUERIES)
    adc = (
        cand.join(enc, cand.cid == enc.vec_id)
        .join(F.broadcast(lut), ["qid", "m", "code"])
        .groupBy("qid", "cid")
        .agg(F.sum("d2").alias("adc_d2"))
    )
    _IVF_PQ_ADC_MEMO[key] = (adc, k)
    return adc, k


# --- IVF-PQ + exact rerank (r12): the complete FAISS serve composition ----

IVF_PQ_RERANK_R = 32  # ADC shortlist width per query (>> TOP_K)

def _rerank_suffix_sql(adc_cte: str) -> str:
    """The exact-rerank oracle tail over any (qid, cid, adc_d2) CTE:
    top-R shortlist by (adc asc, cid), exact-decimal cosine re-score,
    final top-k by (cosine desc, cid) — shared by the raw and residual
    IVF-PQ rerank compositions."""
    return f""",
short AS (
  SELECT qid, cid, adc_d2 FROM (
    SELECT qid, cid, adc_d2,
           row_number() OVER (PARTITION BY qid ORDER BY adc_d2, cid) AS r1
    FROM {adc_cte}) t WHERE r1 <= {IVF_PQ_RERANK_R}
),
xr AS ({EXPLODED_DUCK}),
normsr AS (
  SELECT vec_id, SUM(CAST(v * v AS DECIMAL(28,18))) AS n2
  FROM xr GROUP BY vec_id
),
dotsr AS (
  SELECT s.qid, s.cid, s.adc_d2,
         SUM(CAST(q.v * c.v AS DECIMAL(28,18))) AS dot
  FROM short s
  JOIN xr q ON q.vec_id = s.qid
  JOIN xr c ON c.vec_id = s.cid AND c.i = q.i
  GROUP BY 1, 2, 3
),
cosr AS (
  SELECT qid, cid, adc_d2,
         CAST(dot AS DOUBLE)
           / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) AS c
  FROM dotsr
  JOIN normsr nq ON qid = nq.vec_id
  JOIN normsr nc ON cid = nc.vec_id
)
SELECT qid AS query_id, cid AS neighbor_id, CAST(rn AS INTEGER) AS rank,
       ROUND(c, 6) AS cosine, CAST(adc_d2 AS BIGINT) AS adc_d2_micro,
       (SELECT CAST(k AS INTEGER) FROM ncells) AS n_cells
FROM (SELECT qid, cid, adc_d2, c,
             row_number() OVER (PARTITION BY qid ORDER BY c DESC, cid) AS rn
      FROM cosr)
WHERE rn <= {TOP_K}
"""


IVF_PQ_RERANK_ORACLE = f"{_IVF_PQ_CTE_BODY}{_rerank_suffix_sql('adc')}"


@query("ivf_pq_rerank_topk", oracle=IVF_PQ_RERANK_ORACLE)
def ivf_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with the exact-rerank stage — the COMPLETE production
    serve path (what a FAISS IndexIVFPQ deployment actually returns,
    per the same public PQ paper): route each query to its
    ``IVF_CAL_NPROBE`` calibrated cells and ADC-score those cells'
    4-byte codes (the shared ``_ivf_pq_adc`` pipeline of
    ``ivf_pq_topk``), keep the top ``IVF_PQ_RERANK_R`` = 32 shortlist
    per query by (adc_d2 asc, cid), then re-score ONLY those survivors
    with the exact-decimal cosine (the stage-2 shape proven in
    ``ann_int8_rerank_topk``) and emit the final top-k under the
    standard (cosine desc, cid) tie rule — each row tagged with its ADC
    distance so the gate hash-checks BOTH stages plus the cell-count
    derivation.

    This is the operator the r11 audit motivated: raw IVF-PQ recall
    reads 0.2-0.8 on this corpus because 4-byte codes can't separate
    near-ties; the rerank repairs exactly the within-shortlist ordering
    at the cost of touching R float vectors per query. Routing misses
    (true neighbor in an unprobed cell) remain — that residual is the
    measured gap between this operator's recall and 1.0 in
    ``ann_quantized_recall_audit``.

    Scale: stage 1 is the ivf_pq_topk plan verbatim (broadcast probe +
    code-table join over ~nprobe * sqrt(n) 4-byte rows); stage 2 joins
    an R-rows-per-query shortlist against the float store — R * |q|
    vector reads total, independent of corpus size. Integer ADC +
    decimal cosine end to end, so the composed pipeline keeps the
    family's full-value oracle."""
    adc, k = _ivf_pq_adc(spark, sf_dir)
    return _adc_rerank_tail(spark, sf_dir, adc, k)


def _adc_rerank_tail(
    spark: SparkSession, sf_dir: str, adc: DataFrame, k: int
) -> DataFrame:
    """The shared exact-rerank stage over any (qid, cid, adc_d2) ADC
    frame: top-``IVF_PQ_RERANK_R`` shortlist by (adc asc, cid), exact-
    decimal cosine re-score against the float store, final top-k by
    (cosine desc, cid) — used by the raw and residual IVF-PQ rerank
    compositions."""
    from .dedup import _dec_dot_expr

    w1 = Window.partitionBy("qid").orderBy("adc_d2", "cid")
    short = (
        adc.withColumn("r1", F.row_number().over(w1))
        .where(F.col("r1") <= IVF_PQ_RERANK_R)
        .select("qid", "cid", "adc_d2")
    )
    emb = table(spark, sf_dir, "embeddings")
    ed = emb.select(
        "vec_id",
        "embedding",
        F.expr(_dec_dot_expr("embedding", "embedding")).alias("n2"),
    )
    q = ed.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("qn2"),
    )
    cos = (
        short.join(ed.alias("c"), short.cid == F.col("c.vec_id"))
        .join(F.broadcast(q), "qid")
        .select(
            "qid",
            "cid",
            "adc_d2",
            (
                F.expr(_dec_dot_expr("q_emb", "c.embedding")).cast("double")
                / (
                    F.sqrt(F.col("qn2").cast("double"))
                    * F.sqrt(F.col("c.n2").cast("double"))
                )
            ).alias("c"),
        )
    )
    w2 = Window.partitionBy("qid").orderBy(F.desc("c"), F.asc("cid"))
    return (
        cos.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= TOP_K)
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("neighbor_id"),
            F.col("rn").cast("int").alias("rank"),
            F.round("c", 6).alias("cosine"),
            F.col("adc_d2").cast("long").alias("adc_d2_micro"),
            F.lit(k).cast("int").alias("n_cells"),
        )
    )


# --- recall audit for the quantized family (r11): int8 rerank, PQ, IVF-PQ
# vs the exact brute baseline, per query, the ann_calibrated_recall_audit
# convention ---------------------------------------------------------------

QUANT_RECALL_ORACLE = f"""
WITH exact AS ({_brute_oracle(N_QUERIES)}),
i8 AS ({INT8_RERANK_ORACLE}),
pq AS ({PQ_ADC_ORACLE}),
ipq AS ({IVF_PQ_ORACLE}),
ipqr AS ({IVF_PQ_RERANK_ORACLE})
SELECT e.query_id,
       COUNT(*) AS n_exact,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS int8_hits,
       ROUND(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             * 1.0 / COUNT(*), 6) AS int8_recall,
       CAST(SUM(CASE WHEN b.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS pq_hits,
       ROUND(SUM(CASE WHEN b.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             * 1.0 / COUNT(*), 6) AS pq_recall,
       CAST(SUM(CASE WHEN c.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS ivf_pq_hits,
       ROUND(SUM(CASE WHEN c.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             * 1.0 / COUNT(*), 6) AS ivf_pq_recall,
       CAST(SUM(CASE WHEN d.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS ivf_pq_rerank_hits,
       ROUND(SUM(CASE WHEN d.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             * 1.0 / COUNT(*), 6) AS ivf_pq_rerank_recall
FROM exact e
LEFT JOIN i8 a
  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
LEFT JOIN pq b
  ON b.query_id = e.query_id AND b.neighbor_id = e.neighbor_id
LEFT JOIN ipq c
  ON c.query_id = e.query_id AND c.neighbor_id = e.neighbor_id
LEFT JOIN ipqr d
  ON d.query_id = e.query_id AND d.neighbor_id = e.neighbor_id
GROUP BY e.query_id
"""


@query("ann_quantized_recall_audit", oracle=QUANT_RECALL_ORACLE)
def ann_quantized_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the FOUR quantized retrieval paths (int8 scan +
    exact rerank, full-scan PQ-ADC, IVF-routed PQ-ADC, and — new r12 —
    IVF-PQ + exact rerank) against the exact brute baseline in one
    per-query row — the acceptance gate for the quantized family, same
    convention as ``ann_calibrated_recall_audit``: the audit composes
    the registered operators (so it measures the code that serves
    queries) and its oracle composes their oracle SQL as CTEs (so the
    composition itself is gate-checked). Measured shape on this corpus
    (sf0.01): int8 1.0 on every query (error ~4e-3/dim, absorbed by the
    R=32 rerank), PQ 0.0-0.6 (mean 0.28 — the documented isotropy
    ceiling of 4-byte codes), IVF-PQ 0.2-0.8 — NOT bounded by full-scan
    PQ per query: routing removes candidates, and a removed FALSE
    positive (a far vector whose coarse quantization landed it a small
    ADC distance) can free a top-k slot a true neighbor then takes.
    The rerank column isolates the two recall-loss mechanisms: within
    the probed cells the exact rerank repairs ADC misordering entirely,
    so any residual miss is a ROUTING miss (true neighbor in an
    unprobed cell) — the r12 measurement reads ivf_pq_rerank >= ivf_pq
    on every query, with the remaining gap priced to nprobe/k alone.

    Scale: all five inputs end at k rows per query; the audit joins
    (|queries| x k)-sized frames — negligible next to the searches."""
    exact = ann_cosine_topk(spark, sf_dir).alias("e")
    i8 = ann_int8_rerank_topk(spark, sf_dir).alias("a")
    pq = pq_adc_topk(spark, sf_dir).alias("b")
    ipq = ivf_pq_topk(spark, sf_dir).alias("c")
    ipqr = ivf_pq_rerank_topk(spark, sf_dir).alias("d")
    joined = (
        exact.join(
            i8,
            (F.col("e.query_id") == F.col("a.query_id"))
            & (F.col("e.neighbor_id") == F.col("a.neighbor_id")),
            "left",
        )
        .join(
            pq,
            (F.col("e.query_id") == F.col("b.query_id"))
            & (F.col("e.neighbor_id") == F.col("b.neighbor_id")),
            "left",
        )
        .join(
            ipq,
            (F.col("e.query_id") == F.col("c.query_id"))
            & (F.col("e.neighbor_id") == F.col("c.neighbor_id")),
            "left",
        )
        .join(
            ipqr,
            (F.col("e.query_id") == F.col("d.query_id"))
            & (F.col("e.neighbor_id") == F.col("d.neighbor_id")),
            "left",
        )
    )
    ahit = F.when(F.col("a.neighbor_id").isNotNull(), 1).otherwise(0)
    bhit = F.when(F.col("b.neighbor_id").isNotNull(), 1).otherwise(0)
    chit = F.when(F.col("c.neighbor_id").isNotNull(), 1).otherwise(0)
    dhit = F.when(F.col("d.neighbor_id").isNotNull(), 1).otherwise(0)
    return joined.groupBy(F.col("e.query_id").alias("query_id")).agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.sum(ahit).cast("long").alias("int8_hits"),
        F.round(F.sum(ahit) * 1.0 / F.count(F.lit(1)), 6).alias(
            "int8_recall"
        ),
        F.sum(bhit).cast("long").alias("pq_hits"),
        F.round(F.sum(bhit) * 1.0 / F.count(F.lit(1)), 6).alias("pq_recall"),
        F.sum(chit).cast("long").alias("ivf_pq_hits"),
        F.round(F.sum(chit) * 1.0 / F.count(F.lit(1)), 6).alias(
            "ivf_pq_recall"
        ),
        F.sum(dhit).cast("long").alias("ivf_pq_rerank_hits"),
        F.round(F.sum(dhit) * 1.0 / F.count(F.lit(1)), 6).alias(
            "ivf_pq_rerank_recall"
        ),
    )


# --------------------------------------------------------------------------
# IVF-PQ with RESIDUAL encoding (r12): the FAISS-default variant of the
# composition — PQ trained on (vector - assigned-cell centroid) residuals,
# ADC lookup tables built per (query, probed cell)
# --------------------------------------------------------------------------

_PQRES_CB_MEMO: dict[tuple[str, str], DataFrame] = {}
_PQRES_CODES_MEMO: dict[tuple[str, str], DataFrame] = {}

_SLICE_SUB = (
    f"transform(sequence(0, {PQ_M - 1}),"
    f" m -> slice(rm, m * {PQ_DSUB} + 1, {PQ_DSUB}))"
)


def _res_sub(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """DataFrame[vec_id, cluster, m, sv] — every vector's RESIDUAL
    subvectors against its assigned calibrated cell's centroid (the
    quantity FAISS's IndexIVFPQ actually encodes: residual magnitudes
    shrink with cell radius, so the same 4-bit budget spends on a
    smaller ball)."""
    emb = table(spark, sf_dir, "embeddings")
    xm = emb.select("vec_id", F.expr(_MICRO_ARR).alias("xm"))
    res = (
        xm.join(ivf_cell_table(spark, sf_dir, k), "vec_id")
        .join(F.broadcast(ivf_centroid_table(spark, sf_dir, k)), "cluster")
        .select(
            "vec_id",
            "cluster",
            F.expr("zip_with(xm, cm, (p, q) -> p - q)").alias("rm"),
        )
    )
    return res.select(
        "vec_id",
        "cluster",
        F.posexplode(F.expr(_SLICE_SUB)).alias("m", "sv"),
    )


def pqres_codebook_table(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """DataFrame[m, code, cw] — PQ codebooks trained on RESIDUALS (one
    seeded Lloyd refinement per subspace, the ``pq_codebook_table``
    recipe applied to ``_res_sub``), persisted and versioned by the
    (M, K, cell-count) hyperparameters."""
    from ..derived import derived_table
    from ..memo import session_memo

    def build() -> DataFrame:
        sub = _res_sub(spark, sf_dir, k).select("vec_id", "m", "sv")
        seeds = sub.where(F.col("vec_id") < PQ_K).select(
            "m", F.col("vec_id").alias("code"), F.col("sv").alias("cw")
        )
        d1 = sub.join(F.broadcast(seeds), "m").select(
            "vec_id", "m", "code", F.expr(_sqd_micro("sv", "cw")).alias("d2")
        )
        # min_by argmin — see pq_codebook_table
        a1 = d1.groupBy("vec_id", "m").agg(
            F.expr("min_by(code, struct(d2, code))").alias("code")
        )
        psum = (
            a1.join(sub, ["vec_id", "m"])
            .select("m", "code", F.posexplode("sv").alias("pos", "x"))
            .groupBy("m", "code", "pos")
            .agg(F.sum("x").alias("ps"), F.count(F.lit(1)).alias("n"))
        )
        return (
            psum.select(
                "m",
                "code",
                "pos",
                F.expr(
                    "CAST(round(CAST(ps AS DOUBLE) / n) AS BIGINT)"
                ).alias("cm"),
            )
            .groupBy("m", "code")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, cm))),"
                    " s -> s.cm)"
                ).alias("cw")
            )
        )

    return session_memo(
        _PQRES_CB_MEMO,
        spark,
        sf_dir,
        lambda: derived_table(
            spark,
            sf_dir,
            f"embedding_pqres_cb_m{PQ_M}k{PQ_K}_c{k}",
            ("embeddings",),
            build,
        ),
    )


def pqres_code_table(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """DataFrame[vec_id, m, code] — the residual-ENCODED corpus against
    ``pqres_codebook_table``, persisted (4 bits per (vector, subspace)
    on disk — identical footprint to the raw-PQ index; only what the
    codes MEAN differs)."""
    from ..derived import derived_table
    from ..memo import session_memo

    def build() -> DataFrame:
        sub = _res_sub(spark, sf_dir, k).select("vec_id", "m", "sv")
        cb = pqres_codebook_table(spark, sf_dir, k)
        return (
            sub.join(F.broadcast(cb), "m")
            .select(
                "vec_id",
                "m",
                "code",
                F.expr(_sqd_micro("sv", "cw")).alias("d2"),
            )
            .groupBy("vec_id", "m")
            .agg(F.expr("min_by(code, struct(d2, code))").alias("code"))
            .select("vec_id", "m", "code")
        )

    return session_memo(
        _PQRES_CODES_MEMO,
        spark,
        sf_dir,
        lambda: derived_table(
            spark,
            sf_dir,
            f"embedding_pqres_codes_m{PQ_M}k{PQ_K}_c{k}",
            ("embeddings",),
            build,
        ),
    )


_RSUB_SLICE = (
    f"rm[CAST(r.m * {PQ_DSUB} + 1 AS INT) :"
    f" CAST(r.m * {PQ_DSUB} + {PQ_DSUB} AS INT)]"
)

_RD2 = (
    f"CAST(list_sum(list_transform(range(1, {PQ_DSUB} + 1),"
    " i -> (s.sv[i] - c.cw[i]) * (s.sv[i] - c.cw[i]))) AS BIGINT)"
)

_IVF_PQ_RESIDUAL_CTE_BODY = f"""{_IVF_ROUTE_CTES},
res AS MATERIALIZED (
  SELECT x.vec_id, a.cluster,
         list_transform(range(1, len(x.xm) + 1),
                        i -> x.xm[i] - c.cm[i]) AS rm
  FROM xm x JOIN a2 a USING (vec_id) JOIN carr c ON c.cluster = a.cluster
),
rsub AS MATERIALIZED (
  SELECT vec_id, cluster, r.m AS m, {_RSUB_SLICE} AS sv
  FROM res, range(0, {PQ_M}) r(m)
),
rseeds AS (
  SELECT m, vec_id AS code, sv AS cw FROM rsub WHERE vec_id < {PQ_K}
),
rd1 AS (
  SELECT s.vec_id, s.m, c.code, {_RD2} AS d2
  FROM rsub s JOIN rseeds c ON c.m = s.m
),
ra1 AS (
  SELECT vec_id, m, code FROM (
    SELECT vec_id, m, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, code) AS rn
    FROM rd1) t WHERE rn = 1
),
rpsum AS (
  SELECT a.m, a.code, r.i AS pos, SUM(s.sv[r.i]) AS ps, COUNT(*) AS n
  FROM ra1 a JOIN rsub s ON s.vec_id = a.vec_id AND s.m = a.m,
       range(1, {PQ_DSUB} + 1) r(i)
  GROUP BY 1, 2, 3
),
rcb AS MATERIALIZED (
  SELECT m, code,
         list(CAST(round(CAST(ps AS DOUBLE) / n) AS BIGINT) ORDER BY pos) AS cw
  FROM rpsum GROUP BY m, code
),
renc AS MATERIALIZED (
  SELECT vec_id, m, code FROM (
    SELECT s.vec_id, s.m, c.code,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                              ORDER BY {_RD2}, c.code) AS rn
    FROM rsub s JOIN rcb c ON c.m = s.m) t WHERE rn = 1
),
qres AS (
  SELECT p.qid, p.cluster,
         list_transform(range(1, len(q.xm) + 1),
                        i -> q.xm[i] - c.cm[i]) AS rm
  FROM probe p JOIN xm q ON q.vec_id = p.qid
  JOIN carr c ON c.cluster = p.cluster
),
qrsub AS (
  SELECT qid, cluster, r.m AS m, {_RSUB_SLICE} AS sv
  FROM qres, range(0, {PQ_M}) r(m)
),
rlut AS MATERIALIZED (
  SELECT s.qid, s.cluster, s.m, c.code, {_RD2} AS d2
  FROM qrsub s JOIN rcb c ON c.m = s.m
),
rcand AS (
  SELECT p.qid, p.cluster, a.vec_id AS cid
  FROM probe p JOIN a2 a ON a.cluster = p.cluster
  WHERE a.vec_id <> p.qid
),
radc AS (
  SELECT c.qid, c.cid, SUM(l.d2) AS adc_d2
  FROM rcand c
  JOIN renc e ON e.vec_id = c.cid
  JOIN rlut l ON l.qid = c.qid AND l.cluster = c.cluster
             AND l.m = e.m AND l.code = e.code
  GROUP BY 1, 2
)"""

IVF_PQ_RESIDUAL_ORACLE = f"""{_IVF_PQ_RESIDUAL_CTE_BODY}
SELECT qid AS query_id, cid AS neighbor_id, CAST(rn AS INTEGER) AS rank,
       CAST(adc_d2 AS BIGINT) AS adc_d2_micro,
       (SELECT CAST(k AS INTEGER) FROM ncells) AS n_cells
FROM (SELECT qid, cid, adc_d2,
             row_number() OVER (PARTITION BY qid ORDER BY adc_d2, cid) AS rn
      FROM radc)
WHERE rn <= {TOP_K}
"""

IVF_PQ_RESIDUAL_RERANK_ORACLE = (
    f"{_IVF_PQ_RESIDUAL_CTE_BODY}{_rerank_suffix_sql('radc')}"
)


@query("ivf_pq_residual_topk", oracle=IVF_PQ_RESIDUAL_ORACLE)
def ivf_pq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding — the variant FAISS's IndexIVFPQ
    runs BY DEFAULT (same public PQ paper, section on coarse+fine
    composition): the fine quantizer trains on ``x - centroid[cell]``
    residuals instead of raw vectors, so the 4-bit-per-subspace budget
    covers the cell's radius rather than the whole corpus diameter, and
    the ADC lookup tables become per-(query, probed-cell) — the query's
    OWN residual against that cell. Routing, cell tables, and the
    (adc asc, cid) tie rule are shared with ``ivf_pq_topk``; the
    residual codebooks and encoded corpus persist as their own
    cell-count-versioned derived tables (identical 4 B/vector
    footprint — only what the codes MEAN differs). Everything stays
    integer (residuals of micro-ints are ints), so the full
    route + residual-train + encode + serve pipeline carries a
    full-value oracle.

    Scale: the serve plan is ivf_pq_topk's with one more broadcast
    dimension — LUTs are nprobe x M x K tiny rows per query instead of
    M x K; the code-table join is unchanged. Measured recall@5 vs the
    exact brute (honest-floor convention): residual 0.40 vs raw 0.48
    at sf0.001, residual 0.44 vs raw 0.32 at sf0.01 — within family
    noise on this NEAR-ISOTROPIC corpus, where cell centroids carry
    little mass to subtract; on clustered real embeddings residual
    encoding is the production default for a reason, and the recall
    floor is pinned in tests."""
    adc, k = _ivf_pq_residual_adc(spark, sf_dir)
    w_q = Window.partitionBy("qid").orderBy("adc_d2", "cid")
    return (
        adc.withColumn("rn", F.row_number().over(w_q))
        .where(F.col("rn") <= TOP_K)
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("neighbor_id"),
            F.col("rn").cast("int").alias("rank"),
            F.col("adc_d2").cast("long").alias("adc_d2_micro"),
            F.lit(k).cast("int").alias("n_cells"),
        )
    )


def _ivf_pq_residual_adc(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, int]:
    """(adc DataFrame[qid, cid, adc_d2], n_cells) — the residual-encoded
    IVF-PQ scoring pipeline (cell routing, per-(query, probed-cell)
    residual LUTs, broadcast-LUT ADC join over the persisted residual
    code table); ``ivf_pq_residual_topk`` cuts it to top-k,
    ``ivf_pq_residual_rerank_topk`` reranks the wider shortlist."""
    n = table_row_count(spark, sf_dir, "embeddings")
    k = calibrated_ivf_cells(n)
    emb = table(spark, sf_dir, "embeddings")
    xm = emb.select("vec_id", F.expr(_MICRO_ARR).alias("xm"))
    carr = ivf_centroid_table(spark, sf_dir, k)
    cells = ivf_cell_table(spark, sf_dir, k)
    probe = (
        xm.where(F.col("vec_id") < N_QUERIES)
        .crossJoin(F.broadcast(carr))
        .select(
            F.col("vec_id").alias("qid"),
            "cluster",
            F.expr(_sqd_micro("xm", "cm")).alias("d2"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy("d2", "cluster")
            ),
        )
        .where(F.col("rn") <= IVF_CAL_NPROBE)
        .select("qid", "cluster")
    )
    qres = (
        probe.join(
            xm.where(F.col("vec_id") < N_QUERIES),
            probe.qid == F.col("vec_id"),
        )
        .join(F.broadcast(carr), "cluster")
        .select(
            "qid",
            "cluster",
            F.expr("zip_with(xm, cm, (p, q) -> p - q)").alias("rm"),
        )
    )
    rlut = (
        qres.select(
            "qid", "cluster", F.posexplode(F.expr(_SLICE_SUB)).alias("m", "sv")
        )
        .join(F.broadcast(pqres_codebook_table(spark, sf_dir, k)), "m")
        .select(
            "qid",
            "cluster",
            "m",
            "code",
            F.expr(_sqd_micro("sv", "cw")).alias("d2"),
        )
    )
    cand = (
        cells.join(F.broadcast(probe), "cluster")
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "cluster", F.col("vec_id").alias("cid"))
    )
    enc = pqres_code_table(spark, sf_dir, k)
    adc = (
        cand.join(enc, cand.cid == enc.vec_id)
        .join(F.broadcast(rlut), ["qid", "cluster", "m", "code"])
        .groupBy("qid", "cid")
        .agg(F.sum("d2").alias("adc_d2"))
    )
    return adc, k


@query("ivf_pq_residual_rerank_topk", oracle=IVF_PQ_RESIDUAL_RERANK_ORACLE)
def ivf_pq_residual_rerank_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Residual IVF-PQ + exact rerank — FAISS's LITERAL default serve
    path end to end (IndexIVFPQ trains on residuals AND deployments
    rerank the ADC shortlist): the residual composition's top
    ``IVF_PQ_RERANK_R`` shortlist per query re-scored with the
    exact-decimal cosine through the shared ``_adc_rerank_tail``, final
    top-k by (cosine desc, cid), every row carrying its ADC distance
    and the cell count. The oracle splices the residual CTE chain with
    the same rerank suffix the raw composition uses — one shared
    suffix, so the two compositions cannot drift apart textually.

    Scale: identical budget to ``ivf_pq_rerank_topk`` — stage 1 is the
    residual serve plan verbatim, stage 2 touches R float vectors per
    query regardless of corpus size."""
    adc, k = _ivf_pq_residual_adc(spark, sf_dir)
    return _adc_rerank_tail(spark, sf_dir, adc, k)
