"""Training-corpus preparation operators (north-star LLM-pipeline surface).

Four operators a large-scale training-data pipeline runs between raw text
and the tokenizer, all pure codegen expressions with DuckDB oracles:

- decontaminate_vs_benchmark : test-set decontamination — flag training
  docs sharing any 5-gram with a held-out benchmark slice. The real-world
  operation behind "n-gram overlap decontamination" in LLM data reports;
  same explode->semi-join shape as dedup, but asymmetric (corpus vs small
  eval set), so the benchmark side broadcasts.
- doc_chunking               : fixed-width token windows with stride
  (window=32, stride=16) — the packing step that turns documents into
  training sequences. Chunk math is integer-exact on both engines.
- distinctive_terms          : per-doc top-3 terms by a log-free tf-df
  score (tf * N / df — ONE IEEE division of exact integers, so rankings
  are bit-identical cross-engine; ln()-based idf is NOT portable).
- corpus_vocab_stats         : per-source token/vocab/doc-length profile —
  the corpus-balance dashboard numbers.

Scale notes: every operator is explode -> aggregate/join with partial
aggregation before any shuffle; the benchmark set in decontamination and
the doc-count scalar in distinctive_terms broadcast. Nothing touches
Python. Chunking multiplies rows by ~n/stride — at 100 TB that is the
INTENDED output volume (it feeds the trainer), not a blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import table
from .dedup import _NORM_DUCK, _NORM_SPARK, ngram_expr

# --------------------------------------------------------------------------
# Test-set decontamination: 5-gram overlap against a benchmark slice.
# --------------------------------------------------------------------------

DECON_N = 5  # n-gram width
BENCH_MAX_DOC = 25  # doc_id < 25 is the held-out "benchmark" slice

DECON_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM_DUCK}, ' ') AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, g.s FROM toks,
    unnest(list_transform(range(1, greatest(len(t) - {DECON_N - 2}, 1)),
           i -> array_to_string(t[i:i+{DECON_N - 1}], ' '))) g(s)
  WHERE len(t) >= {DECON_N}
),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < {BENCH_MAX_DOC}),
tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM sh GROUP BY doc_id)
SELECT sh.doc_id, COUNT(*) AS n_hits,
       CAST(COUNT(*) AS DOUBLE) / t.n_grams AS hit_ratio
FROM sh JOIN bench ON sh.s = bench.s
JOIN tot t ON sh.doc_id = t.doc_id
WHERE sh.doc_id >= {BENCH_MAX_DOC}
GROUP BY sh.doc_id, t.n_grams
"""


def _ngrams(spark: SparkSession, sf_dir: str, n: int) -> DataFrame:
    """DataFrame[doc_id, s] — distinct n-gram token shingles."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.expr(f"split({_NORM_SPARK}, ' ')").alias("t"))
        .select("doc_id", F.explode(F.expr(ngram_expr("t", n))).alias("s"))
        .distinct()
    )


@query("decontaminate_vs_benchmark", oracle=DECON_ORACLE)
def decontaminate_vs_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs contaminated by benchmark 5-grams. The benchmark
    shingle set is small by construction (it is the eval set), so it
    BROADCASTS to every executor — candidate detection costs one scan of
    the corpus shingles, no shuffle of the corpus side."""
    sh = _ngrams(spark, sf_dir, DECON_N)
    bench = sh.where(F.col("doc_id") < BENCH_MAX_DOC).select("s").distinct()
    train = sh.where(F.col("doc_id") >= BENCH_MAX_DOC)
    tot = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        train.join(F.broadcast(bench), "s", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return hits.join(tot, "doc_id").select(
        "doc_id",
        "n_hits",
        (F.col("n_hits").cast("double") / F.col("n_grams")).alias("hit_ratio"),
    )


# --------------------------------------------------------------------------
# Document chunking: fixed token windows with stride (training sequences).
# --------------------------------------------------------------------------

CHUNK_WINDOW = 32
CHUNK_STRIDE = 16

CHUNK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM_DUCK}, ' ') AS t FROM documents
)
SELECT doc_id, CAST(r.i AS INTEGER) AS chunk_idx,
       CAST(least({CHUNK_WINDOW}, len(t) - r.i * {CHUNK_STRIDE}) AS INTEGER) AS n_tokens,
       array_to_string(t[r.i * {CHUNK_STRIDE} + 1 :
                         least(r.i * {CHUNK_STRIDE} + {CHUNK_WINDOW}, len(t))],
                       ' ') AS chunk_text
FROM toks, unnest(range((len(t) + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE})) r(i)
"""


@query("doc_chunking", oracle=CHUNK_ORACLE)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents -> overlapping fixed-width token windows. One generated
    struct per chunk via transform+explode — row count multiplies by
    ~n_tokens/stride, which is the operator's purpose (these rows feed the
    trainer); no shuffle at all, the whole op is map-side."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.expr(f"split({_NORM_SPARK}, ' ')").alias("t")
    ).select(
        "doc_id",
        F.expr(
            f"""inline(transform(
  sequence(0, CAST((size(t) + {CHUNK_STRIDE} - 1) DIV {CHUNK_STRIDE} AS INT) - 1),
  i -> struct(
    CAST(i AS INT) AS chunk_idx,
    CAST(least({CHUNK_WINDOW}, size(t) - i * {CHUNK_STRIDE}) AS INT) AS n_tokens,
    array_join(slice(t, i * {CHUNK_STRIDE} + 1, {CHUNK_WINDOW}), ' ') AS chunk_text)))"""
        ),
    )


# --------------------------------------------------------------------------
# Distinctive terms: per-doc top-3 by log-free tf-df score.
# --------------------------------------------------------------------------

DISTINCTIVE_K = 3

DISTINCTIVE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, t.tk AS token FROM (
    SELECT doc_id, string_split({_NORM_DUCK}, ' ') AS toks FROM documents) d,
    unnest(toks) t(tk)
  WHERE t.tk <> ''
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf,
         CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score
  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
)
SELECT doc_id, token, tf, score, CAST(rnk AS INTEGER) AS rnk
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, token) AS rnk
      FROM scored)
WHERE rnk <= {DISTINCTIVE_K}
"""


@query("distinctive_terms", oracle=DISTINCTIVE_ORACLE)
def distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-k distinctive terms. Score is tf * N / df — ONE IEEE
    division of exact integers, deterministic on both engines, where a
    ln()-based idf would diverge in the last bit (Java Math.log vs libm).
    df comes from re-aggregating the tf table (already one row per
    doc-term), and the one-row doc count broadcasts."""
    docs = table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id", F.explode(F.expr(f"split({_NORM_SPARK}, ' ')")).alias("token")
        )
        .where(F.col("token") != "")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = tf.agg(F.count_distinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "token")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= DISTINCTIVE_K)
        .select("doc_id", "token", "tf", "score", "rnk")
    )


# --------------------------------------------------------------------------
# Corpus vocabulary profile per source.
# --------------------------------------------------------------------------

VOCAB_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, t.tk AS token FROM (
    SELECT doc_id, source, string_split({_NORM_DUCK}, ' ') AS toks
    FROM documents) d,
    unnest(toks) t(tk)
  WHERE t.tk <> ''
)
SELECT source,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS total_tokens,
       COUNT(DISTINCT token) AS vocab_size,
       CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT doc_id) AS avg_doc_tokens
FROM tok
GROUP BY source
"""


@query("corpus_vocab_stats", oracle=VOCAB_ORACLE)
def corpus_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus balance profile. Two distinct-counts and a plain
    count in one aggregate — Spark expands to one partial-aggregated
    multi-distinct plan; the mean is one IEEE division of exact counts."""
    docs = table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id",
            "source",
            F.explode(F.expr(f"split({_NORM_SPARK}, ' ')")).alias("token"),
        )
        .where(F.col("token") != "")
    )
    return tok.groupBy("source").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("total_tokens"),
        F.count_distinct("token").alias("vocab_size"),
        (F.count(F.lit(1)).cast("double") / F.count_distinct("doc_id")).alias(
            "avg_doc_tokens"
        ),
    )


# --------------------------------------------------------------------------
# Dedup reporting: per-source duplicate rates + cross-source overlap
# --------------------------------------------------------------------------

DEDUP_RATES_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, source, md5({_NORM_DUCK}) AS content_key FROM documents
),
canon AS (
  SELECT content_key, MIN(doc_id) AS canonical_doc FROM keyed GROUP BY content_key
)
SELECT k.source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN k.doc_id <> c.canonical_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN k.doc_id <> c.canonical_doc THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS drop_rate
FROM keyed k JOIN canon c ON k.content_key = c.content_key
GROUP BY k.source
"""


@query("dedup_rates_by_source", oracle=DEDUP_RATES_ORACLE)
def dedup_rates_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup dashboard: per source, how many documents the exact-dedup
    survivor rule (min doc_id per content key) would drop. One IEEE
    division of exact counts; the same hash-groupBy shape as dedup_exact
    with the survivor joined back to attribute drops to sources."""
    docs = table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id", "source", F.md5(F.expr(_NORM_SPARK)).alias("content_key")
    )
    canon = keyed.groupBy("content_key").agg(
        F.min("doc_id").alias("canonical_doc")
    )
    dropped = F.when(
        F.col("doc_id") != F.col("canonical_doc"), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        keyed.join(canon, "content_key")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(dropped).alias("n_dropped"),
            (F.sum(dropped).cast("double") / F.count(F.lit(1))).alias(
                "drop_rate"
            ),
        )
    )


OVERLAP_ORACLE = f"""
WITH sh AS (
  SELECT DISTINCT d.source, t.s AS shingle FROM (
    SELECT source, string_split({_NORM_DUCK}, ' ') AS toks FROM documents) d,
    unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) t(s)
)
SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared
FROM sh a JOIN sh b
  ON a.shingle = b.shingle AND a.source < b.source
GROUP BY 1, 2
"""


@query("corpus_overlap_matrix", oracle=OVERLAP_ORACLE)
def corpus_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: shared distinct 3-gram shingles
    per source pair. The self-join runs on the shingle key AFTER a
    per-source distinct, so its width is the number of sources sharing a
    shingle (bounded by |sources|), never a doc-level cross join; the
    pair aggregate is |sources|^2 rows at most."""
    docs = table(spark, sf_dir, "documents")
    sh = (
        docs.select(
            "source", F.expr(f"split({_NORM_SPARK}, ' ')").alias("toks")
        )
        .select(
            "source", F.explode(F.expr(ngram_expr("toks", 3))).alias("shingle")
        )
        .distinct()
    )
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


# --------------------------------------------------------------------------
# Tokenizer-design table: vocabulary coverage at count floors
# --------------------------------------------------------------------------
#
# "How much of the corpus does a vocabulary keep if it only admits tokens
# seen >= T times?" — the table a tokenizer/vocab designer reads before
# fixing a vocab size, and the dual of top-N coverage that stays
# aggregation-only at any scale: a top-N formulation needs a global rank
# over the vocabulary (a distributed-sort problem), while count floors
# need ONE conditional aggregate per floor over the vocab counts.

COVERAGE_FLOORS = (1, 10, 100, 1000)

_COV_CONDS_DUCK = ", ".join(
    f"COUNT(*) FILTER (WHERE c >= {t}) AS kv{t}, "
    f"CAST(SUM(c) FILTER (WHERE c >= {t}) AS BIGINT) AS cv{t}"
    for t in COVERAGE_FLOORS
)
_COV_UNION_DUCK = " UNION ALL ".join(
    f"SELECT {t} AS count_floor, CAST(kv{t} AS BIGINT) AS kept_vocab, "
    f"COALESCE(cv{t}, 0) AS covered_tokens, total FROM agg"
    for t in COVERAGE_FLOORS
)

VOCAB_COVERAGE_ORACLE = f"""
WITH tok AS (
  SELECT t.tk AS token FROM (
    SELECT string_split({_NORM_DUCK}, ' ') AS toks FROM documents) d,
    unnest(toks) t(tk)
  WHERE t.tk <> ''
),
vocab AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY 1),
agg AS (SELECT CAST(SUM(c) AS BIGINT) AS total, {_COV_CONDS_DUCK} FROM vocab)
SELECT count_floor, kept_vocab, covered_tokens,
       ROUND(CAST(covered_tokens AS DOUBLE) / CAST(total AS DOUBLE), 6)
         AS coverage
FROM ({_COV_UNION_DUCK})
"""


@query("vocab_coverage_thresholds", oracle=VOCAB_COVERAGE_ORACLE)
def vocab_coverage_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per count floor T: how many vocabulary types survive (c >= T) and
    what fraction of all corpus tokens they cover. coverage(T) is the
    retention a T-floored vocab buys; 1 - coverage is the OOV mass the
    tokenizer must byte-fall-back on.

    Plan: one token explode into a partial-aggregated vocab count, then
    ONE scalar aggregate computing every floor's (kept types, covered
    tokens) as conditional aggregates in a single pass — a |floors|-way
    ``stack`` unpivots the scalar row. No ranking, no second corpus
    pass, bounded output; the only corpus-sized exchange is the vocab
    count itself (shared shape with ``corpus_vocab_stats``). The ratio
    is one IEEE division of exact BIGINTs per row."""
    docs = table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            F.explode(F.expr(f"split({_NORM_SPARK}, ' ')")).alias("token")
        )
        .where(F.col("token") != "")
    )
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    agg = vocab.agg(
        F.sum("c").alias("total"),
        *[
            e
            for t in COVERAGE_FLOORS
            for e in (
                F.count_if(F.col("c") >= t).alias(f"kv{t}"),
                F.coalesce(
                    F.sum(F.when(F.col("c") >= t, F.col("c"))), F.lit(0)
                ).alias(f"cv{t}"),
            )
        ],
    )
    stack = ", ".join(
        f"CAST({t} AS INT), kv{t}, cv{t}" for t in COVERAGE_FLOORS
    )
    return agg.select(
        F.expr(
            f"stack({len(COVERAGE_FLOORS)}, {stack}) AS "
            "(count_floor, kept_vocab, covered_tokens)"
        ),
        "total",
    ).select(
        "count_floor",
        "kept_vocab",
        "covered_tokens",
        F.round(
            F.col("covered_tokens").cast("double")
            / F.col("total").cast("double"),
            6,
        ).alias("coverage"),
    )


# --------------------------------------------------------------------------
# Distribution drift: exact two-sample Kolmogorov-Smirnov between sources
# --------------------------------------------------------------------------

KS_DRIFT_ORACLE = """
WITH counts AS (
  SELECT source, n_chars AS v, COUNT(*) AS c FROM documents GROUP BY 1, 2
),
totals AS (SELECT source, SUM(c) AS n FROM counts GROUP BY 1),
vals AS (SELECT DISTINCT v FROM counts),
grid AS (
  SELECT t.source, vals.v, COALESCE(c.c, 0) AS c
  FROM totals t CROSS JOIN vals
  LEFT JOIN counts c ON c.source = t.source AND c.v = vals.v
),
cum AS (
  SELECT source, v,
         SUM(c) OVER (PARTITION BY source ORDER BY v) AS cum
  FROM grid
),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, a.v,
         ABS(a.cum * tb.n - b.cum * ta.n) AS num
  FROM cum a
  JOIN cum b ON a.v = b.v AND a.source < b.source
  JOIN totals ta ON ta.source = a.source
  JOIN totals tb ON tb.source = b.source
)
SELECT source_a, source_b,
       CAST(ta.n AS BIGINT) AS n_a, CAST(tb.n AS BIGINT) AS n_b,
       CAST(MAX(num) AS BIGINT) AS ks_num,
       ROUND(MAX(num) * 1.0 / (ta.n * tb.n), 6) AS ks_stat
FROM pairs
JOIN totals ta ON ta.source = pairs.source_a
JOIN totals tb ON tb.source = pairs.source_b
GROUP BY 1, 2, ta.n, tb.n
"""


@query("doc_length_ks_drift", oracle=KS_DRIFT_ORACLE)
def doc_length_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov statistic between every pair
    of sources' doc-length distributions — the drift monitor a training
    pipeline runs when a crawl snapshot or new source lands (KS over
    lengths is the cheap first-line distribution check before anything
    content-aware). The KS sup runs over INTEGER ECDF numerators:
    |cum_a * n_b - cum_b * n_a| is exact integer arithmetic, so the max
    is unambiguous and the single final division is the only IEEE op —
    no float-comparison tie hazards at the sup (the
    pmi/simpson rational-form discipline).

    Scale: one corpus scan collapses to a (source, length) histogram via
    a partial-aggregated groupBy — the ONLY corpus-sized stage. The
    ECDF grid is |sources| x |distinct lengths| rows and the pair sweep
    |pairs| x |lengths|; at 100 TB the same operator runs on a QUANTIZED
    length grid (floor(len/width)) to bound |lengths| — the statistic
    degrades gracefully to the binned KS every production drift monitor
    uses. The per-source cumulative window partitions by source (no
    global single-partition sort)."""
    docs = table(spark, sf_dir, "documents")
    counts = (
        docs.groupBy("source", F.col("n_chars").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = counts.groupBy("source").agg(F.sum("c").alias("n"))
    vals = counts.select("v").distinct()
    grid = (
        totals.crossJoin(F.broadcast(vals))
        .join(counts, ["source", "v"], "left")
        .select("source", "n", "v", F.coalesce("c", F.lit(0)).alias("c"))
    )
    w = Window.partitionBy("source").orderBy("v")
    cum = grid.select(
        "source", "n", "v", F.sum("c").over(w).alias("cum")
    )
    a, b = cum.alias("a"), cum.alias("b")
    pairs = a.join(
        b,
        (F.col("a.v") == F.col("b.v"))
        & (F.col("a.source") < F.col("b.source")),
    ).select(
        F.col("a.source").alias("source_a"),
        F.col("b.source").alias("source_b"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        F.abs(
            F.col("a.cum") * F.col("b.n") - F.col("b.cum") * F.col("a.n")
        ).alias("num"),
    )
    return (
        pairs.groupBy("source_a", "source_b", "n_a", "n_b")
        .agg(F.max("num").alias("ks_num"))
        .select(
            "source_a",
            "source_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("ks_num").cast("long").alias("ks_num"),
            F.round(
                F.col("ks_num") * 1.0 / (F.col("n_a") * F.col("n_b")), 6
            ).alias("ks_stat"),
        )
    )


# --------------------------------------------------------------------------
# Distribution drift #2: per-source chi-square vs the pooled histogram
# --------------------------------------------------------------------------

CHI2_BINS = 10

CHI2_DRIFT_ORACLE = f"""
WITH b AS (
  SELECT source,
         (n_chars - mn) * {CHI2_BINS} // (mx - mn + 1) AS bin
  FROM documents
  CROSS JOIN (SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx FROM documents)
),
obs AS (SELECT source, bin, COUNT(*) AS o FROM b GROUP BY 1, 2),
pooled AS (SELECT bin, COUNT(*) AS p FROM b GROUP BY 1),
srcn AS (SELECT source, COUNT(*) AS ns FROM b GROUP BY 1),
tot AS (SELECT COUNT(*) AS n FROM b),
grid AS (
  SELECT s.source, s.ns, p.bin, p.p, t.n, COALESCE(o.o, 0) AS o
  FROM srcn s CROSS JOIN pooled p CROSS JOIN tot t
  LEFT JOIN obs o ON o.source = s.source AND o.bin = p.bin
),
terms AS (
  SELECT source, ns,
         CAST(
           (o - CAST(ns AS DOUBLE) * p / n) * (o - CAST(ns AS DOUBLE) * p / n)
           / (CAST(ns AS DOUBLE) * p / n)
         AS DECIMAL(28,18)) AS term
  FROM grid
)
SELECT source,
       CAST(ns AS BIGINT) AS n_docs,
       CAST({CHI2_BINS} AS INTEGER) AS n_bins,
       ROUND(CAST(SUM(term) AS DOUBLE), 6) AS chi2
FROM terms GROUP BY source, ns
"""


@query("chi_square_source_drift", oracle=CHI2_DRIFT_ORACLE)
def chi_square_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square of each source's doc-length histogram against
    the pooled corpus expectation — the binned drift scan that pairs
    with ``doc_length_ks_drift``: KS ranks source PAIRS, chi-square
    flags each source against the whole (the per-source anomaly score a
    mixture rebalance reads). Bins are equal-width integer arithmetic
    ((len - min) * B // (max - min + 1)) so both engines bin
    identically; each (o - e)^2 / e term is a fixed sequence of IEEE
    ops on exact integers (deterministic on both engines) CAST to
    DECIMAL(28,18) before the SUM, so the per-source total is order-free
    — the ``_dec_dot_expr`` discipline applied to a statistic whose
    naive double SUM would hang on aggregation order.

    Scale: the corpus collapses to (source, bin) counts in one
    partial-aggregated groupBy — the only corpus-sized stage (the
    min/max scalar subquery broadcasts). The grid is |sources| x B rows.
    The in-filled LEFT JOIN matters for correctness at any scale: a
    source missing a populated bin still owes that bin's full expected
    count."""
    docs = table(spark, sf_dir, "documents")
    bounds = docs.agg(
        F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx")
    )
    b = docs.crossJoin(F.broadcast(bounds)).select(
        "source",
        F.expr(
            f"(n_chars - mn) * {CHI2_BINS} div (mx - mn + 1)"
        ).alias("bin"),
    )
    obs = b.groupBy("source", "bin").agg(F.count(F.lit(1)).alias("o"))
    pooled = b.groupBy("bin").agg(F.count(F.lit(1)).alias("p"))
    srcn = b.groupBy("source").agg(F.count(F.lit(1)).alias("ns"))
    tot = b.agg(F.count(F.lit(1)).alias("n"))
    grid = (
        srcn.crossJoin(F.broadcast(pooled))
        .crossJoin(F.broadcast(tot))
        .join(obs, ["source", "bin"], "left")
        .select(
            "source",
            "ns",
            "p",
            "n",
            F.coalesce("o", F.lit(0)).alias("o"),
        )
    )
    term = (
        "CAST((o - CAST(ns AS DOUBLE) * p / n) * (o - CAST(ns AS DOUBLE) * p / n)"
        " / (CAST(ns AS DOUBLE) * p / n) AS DECIMAL(28,18))"
    )
    return (
        grid.select("source", "ns", F.expr(term).alias("term"))
        .groupBy("source", "ns")
        .agg(F.sum("term").alias("chi2d"))
        .select(
            "source",
            F.col("ns").cast("long").alias("n_docs"),
            F.lit(CHI2_BINS).cast("int").alias("n_bins"),
            F.round(F.col("chi2d").cast("double"), 6).alias("chi2"),
        )
    )


# --------------------------------------------------------------------------
# HTML text extraction (boilerplate stripping)
# --------------------------------------------------------------------------
#
# The CommonCrawl-shaped step every web-scale text pipeline runs: pull the
# article text out of an HTML page, dropping nav/footer boilerplate. The
# fixture corpus is plain text, so — exactly like the multimodal
# synthesizers — the operator first builds a REAL HTML page around each
# document (title, nav boilerplate containing its own <p> to defeat naive
# all-paragraph extractors, the escaped body in the main div, a variable
# number of footer links), then extracts back with JVM regexp/replace
# expressions only. The oracle states the recovery contract directly:
# md5(extracted body) must equal md5(original text) — a hash proof of
# byte-exact extraction — plus the title, link count, and byte length.


def html_escape_expr(col: str) -> str:
    """HTML-escape as nested literal replaces — '&' FIRST (the inverse
    order of html_unescape_expr; swapping either order corrupts text
    containing literal entities like '&lt;')."""
    return (
        f"replace(replace(replace({col}, '&', '&amp;'),"
        f" '<', '&lt;'), '>', '&gt;')"
    )


def html_unescape_expr(col: str) -> str:
    """Inverse of html_escape_expr — '&amp;' LAST."""
    return (
        f"replace(replace(replace({col}, '&lt;', '<'),"
        f" '&gt;', '>'), '&amp;', '&')"
    )


HTML_EXTRACT_ORACLE = """
SELECT doc_id,
       'Doc ' || CAST(doc_id AS VARCHAR) AS title,
       CAST(doc_id % 4 AS INTEGER) AS n_links,
       md5(text) AS body_md5,
       CAST(octet_length(encode(text)) AS BIGINT) AS body_bytes
FROM documents
"""


@query("html_text_extraction", oracle=HTML_EXTRACT_ORACLE)
def html_text_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a real HTML page per document, then extract the article
    text back with pure JVM expressions: title from <title>, body from
    the main div (dotall regexp — the nav carries its own <p> so an
    all-paragraph extractor fails the hash), entity unescape in the
    inverse order of the escape, link count from the footer anchors. The
    oracle's md5(text) comparison makes this a byte-exact recovery
    proof: any escaping-order bug, greedy-regexp overrun into the
    footer, or boilerplate bleed-through changes the hash.

    Scale: one scan, all whole-stage-codegen string expressions (no
    Python anywhere) — at 100 TB this is the shape you want for the
    highest-volume stage of a web pipeline; a real corpus starts from a
    stored html column and runs the same extraction half unchanged."""
    docs = table(spark, sf_dir, "documents")
    esc = html_escape_expr("text")
    links = (
        "array_join(transform(array_repeat(1, CAST(doc_id % 4 AS INT)),"
        " (x, j) -> concat('<a href=\"https://example.com/', doc_id, '/',"
        " j, '\">more</a>')), '')"
    )
    html = (
        "concat('<html><head><title>Doc ', doc_id, '</title></head><body>',"
        " '<nav><p>Home | About</p></nav>',"
        f" '<div class=\"main\"><p>', {esc}, '</p></div>',"
        f" '<footer>', {links}, '</footer></body></html>')"
    )
    page = docs.select("doc_id", F.expr(html).alias("html"))
    body = (
        'regexp_extract(html, \'(?s)<div class="main"><p>(.*?)</p></div>\', 1)'
    )
    return page.selectExpr(
        "doc_id",
        "regexp_extract(html, '<title>(.*?)</title>', 1) AS title",
        "CAST(regexp_count(html, '<a href=') AS INT) AS n_links",
        f"md5({html_unescape_expr(body)}) AS body_md5",
        f"CAST(octet_length({html_unescape_expr(body)}) AS BIGINT) AS body_bytes",
    )
