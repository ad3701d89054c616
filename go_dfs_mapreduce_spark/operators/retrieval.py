"""Retrieval and LM-style scoring over the ``documents`` corpus.

The reference demonstrates the classic MapReduce retrieval primitives —
tokenized word counts and an inverted-index-style shuffle
(``example_plugins/word_count/word_count.go:1-46``); this module carries
those primitives to their modern LLM-data-pipeline endpoints:

- ``bm25_search_topk``: BM25 ranked retrieval for a fixed query over the
  corpus, the scoring function an inverted index exists to serve.
- ``unigram_freq_scores``: a CCNet-style unigram language-model quality
  proxy (mean token corpus-frequency + rare-token ratio), the filter a
  training-data pipeline runs before mixing.

Determinism contract (matches ``corpus_ops.distinctive_terms``): no
``ln()`` anywhere — Java ``Math.log`` and DuckDB's libm ``log`` can differ
in the last ulp, so every score is built from exact BIGINT arithmetic with
IEEE double divisions/multiplications applied in the same textual order on
both engines. BM25's ``k1 = 1.2, b = 0.75`` are folded into integer
coefficients (see below) so the only doubles are final casts of exact
integers; the Robertson idf is kept in its rational pre-log form
``(N - df + 0.5) / (df + 0.5)`` = ``(2N - 2df + 1) / (2df + 1)``.

Ranking caveat: the pre-log rational idf is a monotone transform of
log-idf PER TERM, so single-term rankings match textbook BM25 exactly —
but the SUM across query terms is not a monotone transform of the
log-idf sum, so multi-term rankings can diverge (rare terms weigh more
than log compression would give them). This is the deliberate price of
cross-engine bit-determinism; per-term order is preserved, the sum's
order is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table
from .dedup import _NORM_DUCK, _NORM_SPARK

# Clean token arrays, identical artifacts both engines: normalized text is
# trimmed + single-spaced, then the defensive empty-token filter keeps the
# empty-document edge case ([''] on both engines) out of dl / tf counts.
_TOKS_SPARK = f"filter(split({_NORM_SPARK}, ' '), x -> x <> '')"
_TOKS_DUCK = f"list_filter(string_split({_NORM_DUCK}, ' '), x -> x <> '')"

# --------------------------------------------------------------------------
# BM25 ranked retrieval (fixed 3-term query, top-k)
# --------------------------------------------------------------------------
#
# With k1 = 6/5 and b = 3/4, the per-term BM25 score
#
#   idf * tf*(k1+1) / (tf + k1*(1 - b) + k1*b*dl/avgdl),   avgdl = T/N
#
# multiplied through by 10*T becomes a ratio of exact integers:
#
#   tf_part  = 22*T*tf / (10*T*tf + 3*T + 9*dl*N)
#   idf_part = (2N - 2df + 1) / (2df + 1)
#
# (T = total corpus tokens, N = docs, dl = doc length, df = term doc-freq).
# Coefficient products stay exact BIGINTs; the tf/dl cross terms multiply
# AFTER the DOUBLE cast (see _bm25_term_sql — int64 would overflow at
# 100 TB), and both engines evaluate the identical fixed-order IEEE
# expression — bit-identical at any magnitude.

BM25_TERMS = ("spark", "hash", "merge")
BM25_K = 10


def _bm25_term_sql(t: str) -> str:
    """One query term's score; same text is fed to Spark and DuckDB.

    The per-coefficient products (22*T, 10*T, 3*T, 9*dl, 2*df...) stay
    exact BIGINTs (22*T fits int64 for any corpus below ~4*10^17
    tokens), but the tf/cross multiplications happen AFTER the cast to
    DOUBLE: at 100 TB, 22*T*tf can exceed 2^63 and integer arithmetic
    would overflow (DuckDB raises, ANSI Spark throws). IEEE double
    products round identically on both engines in this fixed textual
    order, so determinism survives any magnitude; below 2^53 the math
    is still exact."""
    return (
        f"(CAST(2 * n_docs - 2 * df_{t} + 1 AS DOUBLE)"
        f" / CAST(2 * df_{t} + 1 AS DOUBLE))"
        f" * ((CAST(22 * total_toks AS DOUBLE) * CAST(tf_{t} AS DOUBLE))"
        f" / (CAST(10 * total_toks AS DOUBLE) * CAST(tf_{t} AS DOUBLE)"
        f" + CAST(3 * total_toks AS DOUBLE)"
        f" + CAST(9 * dl AS DOUBLE) * CAST(n_docs AS DOUBLE)))"
    )


_BM25_SCORE_SQL = " + ".join(_bm25_term_sql(t) for t in BM25_TERMS)

BM25_ORACLE = f"""
WITH per_doc AS (
  SELECT doc_id, len(toks) AS dl,
         {', '.join(f"len(list_filter(toks, x -> x = '{t}')) AS tf_{t}"
                    for t in BM25_TERMS)}
  FROM (SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents)
),
corpus AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_toks,
         {', '.join(f"COUNT(*) FILTER (WHERE tf_{t} > 0) AS df_{t}"
                    for t in BM25_TERMS)}
  FROM per_doc
)
SELECT doc_id, CAST(dl AS BIGINT) AS dl,
       {', '.join(f"CAST(tf_{t} AS BIGINT) AS tf_{t}" for t in BM25_TERMS)},
       ROUND({_BM25_SCORE_SQL}, 6) AS bm25_score
FROM per_doc CROSS JOIN corpus
ORDER BY bm25_score DESC, doc_id
LIMIT {BM25_K}
"""


@query("bm25_search_topk", oracle=BM25_ORACLE)
def bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k for the fixed query ``spark hash merge``.

    Plan shape (the 100 TB story): per-doc tf/dl are in-row codegen array
    ops — no explode, no corpus-sized shuffle anywhere. The corpus
    statistics (N, T, one df per query term) are ONE scalar aggregate
    whose single row broadcasts back via cross join, and the final top-k
    lowers to TakeOrderedAndProject, so the full job is two scans of a
    two-column projection plus kilobytes of exchange. Scoring is the
    exact-rational BM25 derived in the module docstring — zero ``ln()``,
    every division a single IEEE op over exact BIGINTs, identical textual
    expression on both engines. Ties break on doc_id.

    Reference parity: the word_count plugin's tokenize-count-shuffle
    (``example_plugins/word_count/word_count.go:13-27``) is the map side
    of an inverted index; BM25 is the canonical consumer of that index.
    """
    docs = table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "doc_id",
        F.expr(f"size({_TOKS_SPARK})").cast("long").alias("dl"),
        *[
            F.expr(f"size(filter({_TOKS_SPARK}, x -> x = '{t}'))")
            .cast("long")
            .alias(f"tf_{t}")
            for t in BM25_TERMS
        ],
    )
    corpus = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_toks"),
        *[
            F.count_if(F.col(f"tf_{t}") > 0).alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )
    return (
        per_doc.join(F.broadcast(corpus))
        .select(
            "doc_id",
            "dl",
            *[f"tf_{t}" for t in BM25_TERMS],
            F.round(F.expr(_BM25_SCORE_SQL), 6).alias("bm25_score"),
        )
        .orderBy(F.desc("bm25_score"), F.asc("doc_id"))
        .limit(BM25_K)
    )


# --------------------------------------------------------------------------
# Unigram-LM quality proxy (CCNet-style filter, log-free)
# --------------------------------------------------------------------------
#
# CCNet ranks documents by LM perplexity; the cross-engine-deterministic
# analogue is the mean token corpus-frequency: sum over a doc's tokens of
# the corpus count c(w) is an exact BIGINT, and avg_rel_freq =
# sum_freq / (n_tokens * T) is one IEEE division. A token is "rare" when
# c(w)*200 < T (relative frequency < 0.5%, SF-stable), and a doc is
# flagged low-quality when rare tokens are >= 1% of it — both exact
# integer comparisons, no float thresholds.

RARE_DENOM = 200  # rare <=> c(w) * 200 < T
LOW_Q_PCT = 100  # low quality <=> rare_cnt * 100 >= n_tokens

UNIGRAM_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, t.tk AS token FROM (
    SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents) d,
    unnest(toks) t(tk)
),
vocab AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY 1),
corpus AS (SELECT CAST(SUM(c) AS BIGINT) AS total_toks FROM vocab)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(sum_freq AS BIGINT) AS sum_freq,
       ROUND(CAST(sum_freq AS DOUBLE)
             / (CAST(n_tokens AS DOUBLE) * CAST(total_toks AS DOUBLE)), 9)
         AS avg_rel_freq,
       ROUND(CAST(rare_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
         AS rare_ratio,
       rare_cnt * {LOW_Q_PCT} >= n_tokens AS low_quality
FROM (
  SELECT t.doc_id, COUNT(*) AS n_tokens,
         CAST(SUM(v.c) AS BIGINT) AS sum_freq,
         COUNT(*) FILTER (WHERE v.c * {RARE_DENOM} < c2.total_toks)
           AS rare_cnt
  FROM tok t JOIN vocab v USING (token) CROSS JOIN corpus c2
  GROUP BY t.doc_id
) CROSS JOIN corpus
"""


@query("unigram_freq_scores", oracle=UNIGRAM_ORACLE)
def unigram_freq_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc unigram-LM quality proxy: mean token corpus-frequency,
    rare-token ratio, and an exact-integer low-quality flag.

    Plan shape: one corpus-token explode feeding two hash aggregates —
    the vocabulary count (vocab-sized, broadcast back onto the token
    stream) and the per-doc rollup. The only corpus-sized exchange is the
    per-doc aggregate itself; the vocab and the 1-row total broadcast.
    The explicit ``broadcast(vocab)`` hint is the gate-scale choice and
    Spark honors it unconditionally — a deployment whose vocabulary
    outgrows the broadcast limit (1e8+ terms with counts is GBs) DROPS
    THE HINT, and since token is already the join key the planner falls
    back to a plain shuffled join; the hint is a knob, not a structural
    assumption (the SCALE.md convention). Determinism: both
    ratios divide exact BIGINTs once; the flag and the rare predicate
    compare integers — see the module docstring for why no ``ln()``.

    Empty documents contribute no tokens and are absent from the output
    on both engines (the group source is the token stream).
    """
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.expr(_TOKS_SPARK)).alias("token")
    )
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    corpus = vocab.agg(F.sum("c").alias("total_toks"))
    per_doc = (
        tok.join(F.broadcast(vocab), "token")
        .join(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("c").alias("sum_freq"),
            F.count_if(
                F.col("c") * RARE_DENOM < F.col("total_toks")
            ).alias("rare_cnt"),
        )
    )
    return per_doc.join(F.broadcast(corpus)).select(
        "doc_id",
        "n_tokens",
        "sum_freq",
        # each factor casts to DOUBLE BEFORE the product (same textual
        # order as the oracle): n_tokens * total_toks in BIGINT overflows
        # int64 for a ~4e5-token doc in a ~2.5e13-token (100 TB) corpus —
        # the same overflow discipline _bm25_term_sql applies to 22*T*tf
        F.round(
            F.col("sum_freq").cast("double")
            / (
                F.col("n_tokens").cast("double")
                * F.col("total_toks").cast("double")
            ),
            9,
        ).alias("avg_rel_freq"),
        F.round(
            F.col("rare_cnt").cast("double") / F.col("n_tokens").cast("double"), 6
        ).alias("rare_ratio"),
        (F.col("rare_cnt") * LOW_Q_PCT >= F.col("n_tokens")).alias("low_quality"),
    )


# --------------------------------------------------------------------------
# Inverted index (truncated posting lists)
# --------------------------------------------------------------------------

POSTINGS_HEAD = 32
# Phase-1 fan-out of the salted two-phase head (see the operator
# docstring). At 100 TB the knob is sized so (max term df) / SALT rows
# fit one task's sort buffer — e.g. a 1e9-doc stopword with a 1e6-row
# task budget wants SALT ~ 1024; the result is salt-invariant (the
# per-(token, salt) top-H is a superset of the global top-H), so the
# knob only moves work, never answers.
POSTINGS_SALT = 16

INVIDX_ORACLE = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, t.tk AS token FROM (
    SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents) d,
    unnest(toks) t(tk)
)
SELECT token, COUNT(*) AS df,
       array_to_string(
         list_transform(
           list_sort(list(doc_id))[1:{POSTINGS_HEAD}],
           d -> CAST(d AS VARCHAR)), ',') AS postings_head
FROM tok GROUP BY token
"""


@query("inverted_index_postings", oracle=INVIDX_ORACLE)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical MapReduce workload as one declarative aggregate:
    token -> document frequency + the first {POSTINGS_HEAD} doc ids of
    the sorted posting list (CSV — the gate hashes scalars, and a
    TRUNCATED head is also the honest at-scale shape: a stopword's full
    posting list is corpus-sized, which production indexes shard into
    delta-encoded blocks rather than materializing per row; df stays
    exact over the full list).

    Plan (the round-7 scale reshape — the previous single
    ``Window.partitionBy(token)`` pass put a stopword's entire
    corpus-sized posting set into ONE task's sort before the head filter
    could drop it, a guaranteed skew straggler at 100 TB):

    - ``df`` is a plain ``groupBy(token).count()`` — partial aggregation
      (map-side combine) fires, so a stopword contributes one partial
      row per map task instead of billions of rows into one reducer.
      (The old window count defeated partial aggregation entirely.)
    - the head is a SALTED TWO-PHASE top-{POSTINGS_HEAD}: phase 1 takes
      the per-(token, ``pmod(hash(doc_id), SALT)``) smallest
      {POSTINGS_HEAD} doc ids — every task sorts at most df/SALT rows —
      and phase 2 takes the global smallest {POSTINGS_HEAD} of the
      <= {POSTINGS_HEAD}*SALT phase-1 survivors per token, a bounded
      partition at any corpus size. No aggregation buffer ever holds
      more than {POSTINGS_HEAD} ids (a collect_set-then-slice
      formulation materializes the full corpus-sized posting array in
      one reduce buffer before truncating — the single-task OOM this
      shape exists to avoid), and no single task ever sorts a full
      posting list. df and the head are both token-keyed aggregates, so
      the final join reuses the token hash partitioning.

    Reference parity: this is
    ``example_plugins/word_count/word_count.go:13-27``'s shuffle with
    doc ids kept instead of summed away.
    """
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id", F.explode(F.expr(_TOKS_SPARK)).alias("token")
        )
        .distinct()
    )
    df_tbl = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    salted = tok.withColumn(
        "salt", F.pmod(F.hash("doc_id"), F.lit(POSTINGS_SALT))
    )
    w1 = Window.partitionBy("token", "salt").orderBy("doc_id")
    survivors = (
        salted.withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= POSTINGS_HEAD)
        .drop("rn", "salt")
    )
    w2 = Window.partitionBy("token").orderBy("doc_id")
    head = (
        survivors.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= POSTINGS_HEAD)
    )
    heads = head.groupBy("token").agg(
        F.array_join(
            F.expr(
                "transform(array_sort(collect_list(doc_id)),"
                " d -> cast(d as string))"
            ),
            ",",
        ).alias("postings_head"),
    )
    return df_tbl.join(heads, "token").select("token", "df", "postings_head")


# --------------------------------------------------------------------------
# RAG chunk retrieval: BM25 over overlapping token windows
# --------------------------------------------------------------------------
#
# The retrieval stage of a RAG pipeline scores CHUNKS, not documents: the
# corpus is split into overlapping fixed-width token windows (the same
# stride layout corpus_ops.doc_chunking feeds a trainer) and the exact-
# rational BM25 from the module header ranks them, with dl = chunk length
# and N/T/df computed over the chunk population. All per-chunk work is
# in-row array arithmetic on the generated chunk structs — the token
# stream is never exploded.

RAG_WINDOW = 32
RAG_STRIDE = 16
RAG_K = 10

RAG_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_DUCK} AS t FROM documents
),
chunks AS (
  SELECT doc_id, CAST(r.i AS INTEGER) AS chunk_idx,
         t[r.i * {RAG_STRIDE} + 1 :
           least(r.i * {RAG_STRIDE} + {RAG_WINDOW}, len(t))] AS ct
  FROM toks, unnest(range((len(t) + {RAG_STRIDE} - 1) // {RAG_STRIDE})) r(i)
),
per_doc AS (
  SELECT doc_id, chunk_idx, len(ct) AS dl,
         {', '.join(f"len(list_filter(ct, x -> x = '{t}')) AS tf_{t}"
                    for t in BM25_TERMS)}
  FROM chunks
),
corpus AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_toks,
         {', '.join(f"COUNT(*) FILTER (WHERE tf_{t} > 0) AS df_{t}"
                    for t in BM25_TERMS)}
  FROM per_doc
)
SELECT doc_id, chunk_idx, CAST(dl AS BIGINT) AS dl,
       ROUND({_BM25_SCORE_SQL}, 6) AS bm25_score
FROM per_doc CROSS JOIN corpus
ORDER BY bm25_score DESC, doc_id, chunk_idx
LIMIT {RAG_K}
"""


@query("rag_chunk_topk", oracle=RAG_ORACLE)
def rag_chunk_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{RAG_K} retrieval chunks for the fixed query ``spark hash
    merge`` — the RAG retrieval stage: ``doc_chunking``'s overlapping
    window layout scored with ``bm25_search_topk``'s exact-rational BM25,
    where a "document" is a {RAG_WINDOW}-token chunk (stride
    {RAG_STRIDE}) and the corpus statistics are chunk-population stats.

    Plan shape: chunks are generated IN-ROW (transform over a sequence +
    inline) with their dl and per-term tf computed on the sliced array
    inside the same projection — the map-side row multiply is the
    operator's purpose and the token stream is never exploded. The chunk
    stats are ONE scalar aggregate broadcast back, and the top-k lowers
    to TakeOrderedAndProject — per-task heaps, no global sort. Empty
    documents generate zero chunk rows on both engines (the dl > 0
    filter; DuckDB's range() is empty for len 0). Determinism: the
    identical fixed-order IEEE expression as bm25_search_topk; ties
    break on (doc_id, chunk_idx).

    Reference parity: the reference's chunked DFS layout feeding the MR
    scan (``cl/dfs_actions.go:27-215``'s Store chunker) is this same
    corpus-into-windows move;
    scoring the windows is what a retrieval consumer does with them.
    """
    docs = table(spark, sf_dir, "documents")
    tf_fields = ", ".join(
        f"size(filter(c.ct, x -> x = '{t}')) AS tf_{t}" for t in BM25_TERMS
    )
    per_chunk = docs.select(
        "doc_id", F.expr(_TOKS_SPARK).alias("t")
    ).select(
        "doc_id",
        # two nested transforms act as a let-binding: the inner one
        # slices each chunk's token array once (lambdas are pure
        # expressions — no subquery/let in Spark SQL), the outer one
        # folds that array into (dl, per-term tf) scalars in-row
        F.expr(
            f"""inline(filter(transform(
  transform(
    sequence(0, CAST(greatest((size(t) + {RAG_STRIDE} - 1) DIV {RAG_STRIDE} - 1,
                              0) AS INT)),
    i -> struct(CAST(i AS INT) AS chunk_idx,
                slice(t, i * {RAG_STRIDE} + 1, {RAG_WINDOW}) AS ct)),
  c -> struct(c.chunk_idx AS chunk_idx, size(c.ct) AS dl,
              {tf_fields})),
  s -> s.dl > 0))"""
        ),
    )
    corpus = per_chunk.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("long").alias("total_toks"),
        *[
            F.count_if(F.col(f"tf_{t}") > 0).alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )
    return (
        per_chunk.join(F.broadcast(corpus))
        .select(
            "doc_id",
            "chunk_idx",
            F.col("dl").cast("long").alias("dl"),
            F.round(F.expr(_BM25_SCORE_SQL), 6).alias("bm25_score"),
        )
        .orderBy(
            F.desc("bm25_score"), F.asc("doc_id"), F.asc("chunk_idx")
        )
        .limit(RAG_K)
    )


# --------------------------------------------------------------------------
# PMI collocations (adjacent-pair pointwise mutual information)
# --------------------------------------------------------------------------
#
# The collocation extractor every vocabulary/tokenizer pipeline runs:
# which adjacent token pairs co-occur far more often than chance? PMI =
# log[ p(xy) / (p(x) p(y)) ] with p(xy) = c(xy)/B, p(x) = c(x)/N; the
# score is kept in its PRE-LOG rational form
#
#   ratio = c(xy) * N * N / (B * c(x) * c(y))
#
# which ranks identically to PMI (log is monotone and this is a single
# ratio per pair, not a cross-term sum — unlike BM25 above, ranking is
# EXACTLY textbook here). Every factor casts to DOUBLE before any
# multiplication (int64 would overflow at 100 TB: N^2 alone is ~6e26 for
# a 2.5e13-token corpus), in the same textual order on both engines.
#
# Scale: two vocabulary-sized groupBys (pair counts, unigram counts) —
# both partial-aggregated; the unigram join is key-shuffled on the token
# (vocab-sized, NOT broadcast: a 100 TB corpus has hundreds of millions
# of distinct tokens); the two corpus scalars ride a 1-row broadcast
# cross join; the final top-k is TakeOrderedAndProject.

PMI_MIN_COUNT = 5  # ignore pairs seen fewer than this many times
PMI_K = 20

_PMI_RATIO_SQL = (
    "(CAST(cxy AS DOUBLE) * CAST(n_toks AS DOUBLE) * CAST(n_toks AS DOUBLE))"
    " / (CAST(n_bigrams AS DOUBLE) * CAST(cx AS DOUBLE)"
    " * CAST(cy AS DOUBLE))"
)

PMI_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_DUCK} AS t FROM documents
),
uni AS (
  SELECT u.tk AS token, COUNT(*) AS c
  FROM toks, unnest(t) u(tk) GROUP BY u.tk
),
pairs AS (
  SELECT t[i] AS w1, t[i+1] AS w2, COUNT(*) AS cxy
  FROM toks, unnest(range(1, greatest(len(t), 1))) r(i)
  GROUP BY t[i], t[i+1]
),
tot AS (
  SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM uni) AS n_toks,
         (SELECT CAST(SUM(cxy) AS BIGINT) FROM pairs) AS n_bigrams
),
scored AS (
  SELECT p.w1, p.w2, p.cxy, {_PMI_RATIO_SQL} AS ratio
  FROM pairs p
  JOIN uni u1 ON p.w1 = u1.token
  JOIN uni u2 ON p.w2 = u2.token
  CROSS JOIN tot,
  LATERAL (SELECT u1.c AS cx, u2.c AS cy) _
  WHERE p.cxy >= {PMI_MIN_COUNT}
)
SELECT w1, w2, cxy AS pair_count,
       ROUND(ratio, 6) AS pmi_ratio,
       CAST(rn AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (ORDER BY ratio DESC, w1, w2) AS rn
  FROM scored)
WHERE rn <= {PMI_K}
"""


@query("pmi_collocations", oracle=PMI_ORACLE)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k adjacent-token collocations by (pre-log rational) PMI.
    Pairs below ``PMI_MIN_COUNT`` occurrences are excluded — the standard
    guard against PMI's low-count explosion."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(F.expr(_TOKS_SPARK).alias("t"))
    uni = (
        toks.select(F.explode("t").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = (
        toks.select(
            F.explode(
                # NB: sequence(1, 0) is the DESCENDING [1, 0] in Spark, not
                # empty — a 0/1-token doc must short-circuit to array()
                # before indexing t[i] (ANSI mode throws on t[1] otherwise)
                F.expr(
                    "transform(if(size(t) < 2, array(), sequence(1, size(t) - 1)),"
                    " i -> struct(t[i-1] AS w1, t[i] AS w2))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("cxy"))
        .where(F.col("cxy") >= PMI_MIN_COUNT)
    )
    tot = uni.agg(F.sum("c").cast("long").alias("n_toks")).crossJoin(
        # n_bigrams must count ALL pairs, not just those past the guard;
        # sum(max(|t|-1, 0)) == the bigram-position count with no explode
        # (and no sequence(1, 0) = [1, 0] descending-range trap)
        toks.agg(
            F.sum(F.expr("greatest(size(t) - 1, 0)"))
            .cast("long")
            .alias("n_bigrams")
        )
    )
    scored = (
        pairs.join(uni.withColumnRenamed("token", "w1").withColumnRenamed("c", "cx"), "w1")
        .join(uni.withColumnRenamed("token", "w2").withColumnRenamed("c", "cy"), "w2")
        .join(F.broadcast(tot))
        .select("w1", "w2", "cxy", F.expr(_PMI_RATIO_SQL).alias("ratio"))
    )
    # top-k lowers to TakeOrderedAndProject (per-task heaps, no global
    # sort); rank is then derived by re-sorting only the K survivors as
    # one in-row array — no second unpartitioned window exchange
    topk = scored.orderBy(
        F.desc("ratio"), F.asc("w1"), F.asc("w2")
    ).limit(PMI_K)
    packed = topk.agg(
        F.expr(
            "array_sort(collect_list(struct(ratio, w1, w2, cxy)),"
            " (a, b) -> case"
            "   when a.ratio > b.ratio then -1 when a.ratio < b.ratio then 1"
            "   when a.w1 < b.w1 then -1 when a.w1 > b.w1 then 1"
            "   when a.w2 < b.w2 then -1 when a.w2 > b.w2 then 1 else 0 end)"
        ).alias("rows")
    )
    return packed.select(
        F.posexplode("rows").alias("pos", "r")
    ).select(
        F.col("r.w1").alias("w1"),
        F.col("r.w2").alias("w2"),
        F.col("r.cxy").alias("pair_count"),
        F.round("r.ratio", 6).alias("pmi_ratio"),
        (F.col("pos") + 1).cast("int").alias("rank"),
    )


# --------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25) and
# semantic (embedding-cosine) top-k lists
# --------------------------------------------------------------------------

RRF_C = 60  # the standard RRF constant (Cormack et al. 2009)
FUSE_CAND = 50  # per-system candidate list length
FUSION_TOPK = 10

RRF_ORACLE = f"""
WITH per_doc AS (
  SELECT doc_id, len(toks) AS dl,
         {', '.join(f"len(list_filter(toks, x -> x = '{t}')) AS tf_{t}"
                    for t in BM25_TERMS)}
  FROM (SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents)
),
corpus AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_toks,
         {', '.join(f"COUNT(*) FILTER (WHERE tf_{t} > 0) AS df_{t}"
                    for t in BM25_TERMS)}
  FROM per_doc
),
lex AS (
  SELECT doc_id, {_BM25_SCORE_SQL} AS s
  FROM per_doc CROSS JOIN corpus
  ORDER BY s DESC, doc_id LIMIT {FUSE_CAND}
),
lexr AS (
  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r_lex
  FROM lex
),
x AS (
  SELECT vec_id, r.i AS i, CAST(embedding[r.i] AS DOUBLE) AS v
  FROM embeddings, range(1, 65) r(i)
),
norms AS (
  SELECT vec_id, SUM(CAST(v * v AS DECIMAL(28,18))) AS n2 FROM x GROUP BY 1
),
dots AS (
  SELECT c.vec_id, SUM(CAST(q.v * c.v AS DECIMAL(28,18))) AS dot
  FROM x q JOIN x c ON q.i = c.i AND q.vec_id = 0
  GROUP BY 1
),
cosv AS (
  SELECT d.vec_id,
         CAST(dot AS DOUBLE)
           / (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(cn.n2 AS DOUBLE))) AS c
  FROM dots d
  JOIN norms cn ON cn.vec_id = d.vec_id
  JOIN norms qn ON qn.vec_id = 0
),
sem AS (SELECT vec_id, c FROM cosv ORDER BY c DESC, vec_id LIMIT {FUSE_CAND}),
semr AS (
  SELECT vec_id, row_number() OVER (ORDER BY c DESC, vec_id) AS r_sem
  FROM sem
)
SELECT COALESCE(lexr.doc_id, semr.vec_id) AS doc_id,
       CAST(r_lex AS BIGINT) AS r_lex,
       CAST(r_sem AS BIGINT) AS r_sem,
       ROUND(COALESCE(1.0 / ({RRF_C} + r_lex), 0.0)
             + COALESCE(1.0 / ({RRF_C} + r_sem), 0.0), 6) AS rrf_score
FROM lexr FULL JOIN semr ON lexr.doc_id = semr.vec_id
ORDER BY rrf_score DESC, doc_id
LIMIT {FUSION_TOPK}
"""


@query("rrf_fusion_topk", oracle=RRF_ORACLE)
def rrf_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (Cormack et al.
    2009): fuse the lexical BM25 top-``FUSE_CAND`` list with the
    semantic embedding-cosine top-``FUSE_CAND`` list (query = vector 0,
    document embeddings keyed by doc_id) through the standard
    ``1/(C + rank)`` sum — the way production RAG stacks combine a
    keyword index with a vector index, fused over the CANDIDATE LISTS
    rather than full-corpus rankings (full ranks would force a global
    single-partition sort; list fusion is how RRF is actually deployed,
    and it keeps every global structure result-sized).

    Plan: each system's candidate list lowers to a
    TakeOrderedAndProject (corpus-sized scans, constant-size output);
    ranks come from windows over the 50-row lists (result-sized — the
    one acceptable single-partition spot); the fusion is a full outer
    join of two 50-row frames. Determinism: ranks are exact ints off
    bit-identical IEEE scores (both scoring expressions are the
    registered BM25/cosine forms, textually identical on both engines);
    the RRF score is two IEEE divisions + one add in fixed order,
    rounded to 6; every ordering carries an id tiebreak. A list-absent
    system contributes 0 (its rank column stays NULL — emitted so the
    consumer can see which system found each doc)."""
    from .dedup import _dec_dot_expr

    docs = table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "doc_id",
        F.expr(f"size({_TOKS_SPARK})").cast("long").alias("dl"),
        *[
            F.expr(f"size(filter({_TOKS_SPARK}, x -> x = '{t}'))")
            .cast("long")
            .alias(f"tf_{t}")
            for t in BM25_TERMS
        ],
    )
    corpus = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_toks"),
        *[
            F.count_if(F.col(f"tf_{t}") > 0).alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )
    lex = (
        per_doc.join(F.broadcast(corpus))
        .select("doc_id", F.expr(_BM25_SCORE_SQL).alias("s"))
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(FUSE_CAND)
    )
    wl = Window.orderBy(F.desc("s"), F.asc("doc_id"))
    lexr = lex.select(
        "doc_id", F.row_number().over(wl).alias("r_lex")
    )
    emb = table(spark, sf_dir, "embeddings")
    ed = emb.select(
        "vec_id",
        "embedding",
        F.expr(_dec_dot_expr("embedding", "embedding")).alias("n2"),
    )
    q = ed.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("n2").alias("qn2")
    )
    cos = ed.crossJoin(F.broadcast(q)).select(
        "vec_id",
        (
            F.expr(_dec_dot_expr("q_emb", "embedding")).cast("double")
            / (
                F.sqrt(F.col("qn2").cast("double"))
                * F.sqrt(F.col("n2").cast("double"))
            )
        ).alias("c"),
    )
    sem = cos.orderBy(F.desc("c"), F.asc("vec_id")).limit(FUSE_CAND)
    ws = Window.orderBy(F.desc("c"), F.asc("vec_id"))
    semr = sem.select(
        "vec_id", F.row_number().over(ws).alias("r_sem")
    )
    fused = lexr.join(
        semr, lexr.doc_id == semr.vec_id, "full"
    ).select(
        F.coalesce(lexr.doc_id, semr.vec_id).alias("doc_id"),
        F.col("r_lex").cast("long").alias("r_lex"),
        F.col("r_sem").cast("long").alias("r_sem"),
        F.round(
            F.coalesce(1.0 / (RRF_C + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_C + F.col("r_sem")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(
        FUSION_TOPK
    )
