"""Further LLM-training-pipeline operators (north-star surface).

- embedding_quantize_int8 : symmetric int8 quantization of the embedding
  column + per-vector reconstruction-error stats. Everything is portable
  IEEE arithmetic: fixed scale 127 (values are bounded in (-1, 1)),
  half-up rounding spelled as FLOOR(x * 127 + 0.5) (floor of a double is
  engine-independent, unlike round-of-double), dequantization as q / 127.0
  (one IEEE division), and the error mean via exact integer pico-units
  (double->DECIMAL casts of tiny values are NOT cross-engine portable).
- bigram_topk             : order-preserving 2-gram counts over the
  normalized token stream (language-model statistics — NOT the distinct
  shingle set dedup uses), global top-k with deterministic ties.
- events_hier_rollup      : hypertable-style continuous-aggregate shape —
  aggregate ONCE at the fine granularity, derive the coarse level by
  re-aggregating the fine partials (exact decimal partials, rounded only
  at emit), so the daily rows are provably identical to a direct daily
  aggregate while the fact table is scanned a single time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import table

# --------------------------------------------------------------------------
# int8 quantization
# --------------------------------------------------------------------------

INT8_SCALE = 127


def int8_quantize_frag(v: str) -> str:
    """THE symmetric int8 quantization rule — one textual source of
    truth for every consumer on BOTH engines (this module's audit
    operator and its oracle, ``similarity.ann_int8_rerank_topk``'s scan
    expression and its oracle), so a scheme change (clamp, scale,
    rounding) lands everywhere or nowhere: half-up rounding spelled as
    FLOOR(x * 127 + 0.5) — floor of a double is engine-independent,
    unlike round-of-double. Callers cast the result to their width."""
    return f"FLOOR(CAST({v} AS DOUBLE) * {INT8_SCALE} + 0.5)"


QUANT_ORACLE = f"""
WITH x AS (
  SELECT vec_id, r.i AS i, CAST(embedding[r.i] AS DOUBLE) AS v
  FROM embeddings, range(1, 65) r(i)
),
q AS (
  SELECT vec_id, i, v,
         CAST({int8_quantize_frag('v')} AS INTEGER) AS qv
  FROM x
),
e AS (
  -- the mean goes through integer PICO-units (floor(x*1e12+0.5)): casting
  -- a tiny double to DECIMAL is NOT portable (Spark rounds the shortest
  -- repr, DuckDB the exact binary expansion — they split at digit 18),
  -- but double multiply + floor + integer sum is bit-identical everywhere
  SELECT vec_id, qv, abs(v - qv / 127.0) AS err,
         CAST(FLOOR(abs(v - qv / 127.0) * 1000000000000 + 0.5) AS BIGINT) AS err_pico
  FROM q
)
SELECT vec_id,
       CAST(SUM(qv) AS BIGINT) AS q_sum,
       MAX(err) AS max_abs_err,
       CAST(SUM(err_pico) AS DOUBLE) / 64 / 1000000000000.0 AS mean_abs_err
FROM e GROUP BY vec_id
"""


@query("embedding_quantize_int8", oracle=QUANT_ORACLE)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantize-then-audit: the at-scale preprocessing step that shrinks an
    embedding corpus 4x before ANN indexing. The emitted per-vector error
    stats are the quality gate a real pipeline alerts on."""
    emb = table(spark, sf_dir, "embeddings")
    x = emb.select("vec_id", F.posexplode("embedding").alias("i", "vf")).select(
        "vec_id", F.col("vf").cast("double").alias("v")
    )
    qv = F.expr(int8_quantize_frag("v")).cast("int")
    err = F.abs(F.col("v") - qv.cast("double") / 127.0)
    e = x.select(
        "vec_id",
        qv.alias("qv"),
        err.alias("err"),
        F.floor(err * 1000000000000 + 0.5).cast("long").alias("err_pico"),
    )
    return e.groupBy("vec_id").agg(
        F.sum("qv").cast("long").alias("q_sum"),
        F.max("err").alias("max_abs_err"),
        (F.sum("err_pico").cast("double") / 64 / 1000000000000.0).alias(
            "mean_abs_err"
        ),
    )


# --------------------------------------------------------------------------
# bigram language-model counts
# --------------------------------------------------------------------------

BIGRAM_K = 20

BIGRAM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS t
  FROM documents
),
bg AS (
  SELECT t[i] || ' ' || t[i+1] AS bigram
  FROM toks, unnest(range(1, greatest(len(t), 1))) r(i)
),
counts AS (SELECT bigram, COUNT(*) AS cnt FROM bg GROUP BY bigram)
SELECT bigram, cnt, CAST(rn AS INTEGER) AS rank FROM (
  SELECT bigram, cnt, row_number() OVER (ORDER BY cnt DESC, bigram) AS rn
  FROM counts)
WHERE rn <= {BIGRAM_K}
"""


@query("bigram_topk", oracle=BIGRAM_ORACLE)
def bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-preserving bigram counts (LM statistics). Unlike the dedup
    shingle builder this keeps duplicates — frequency is the signal. The
    count table is vocabulary-sized (billions of distinct bigrams at
    100 TB), so the top-k is taken with ``orderBy().limit(k)`` —
    TakeOrderedAndProject, per-task k-row heaps, no global sort and no
    single-partition window over the vocabulary — and only the surviving
    ≤k rows get the rank window (the ``graph_common_neighbors_topk``
    pattern)."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        F.expr("split(lower(trim(regexp_replace(text, '\\\\s+', ' '))), ' ')").alias("t")
    )
    from .dedup import ngram_expr

    bg = toks.select(F.explode(F.expr(ngram_expr("t", 2))).alias("bigram"))
    counts = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("cnt"))
    topk = counts.orderBy(F.desc("cnt"), F.asc("bigram")).limit(BIGRAM_K)
    w = Window.orderBy(F.desc("cnt"), F.asc("bigram"))
    return (
        topk.withColumn("rn", F.row_number().over(w))
        .select("bigram", "cnt", F.col("rn").cast("int").alias("rank"))
    )


# --------------------------------------------------------------------------
# hypertable-style hierarchical rollup
# --------------------------------------------------------------------------

HIER_ROLLUP_ORACLE = """
SELECT 'hour' AS granularity,
       date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w_start,
       event_type, COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE) AS total_value
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'day',
       date_trunc('day', CAST(ts AS TIMESTAMP)),
       event_type, COUNT(*),
       CAST(ROUND(SUM(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE)
FROM events GROUP BY 2, 3
"""


@query("events_hier_rollup", oracle=HIER_ROLLUP_ORACLE)
def events_hier_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate shape: ONE scan builds the hourly partials
    (counts + unrounded decimal sums); the daily level re-aggregates those
    partials instead of rescanning the fact table. Because the partials
    stay exact decimals until emit, the derived daily rows are bit-equal
    to a direct daily aggregate (the oracle computes it directly — the
    hash match IS the proof)."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("w_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,6)")).alias("_sum"),
    )
    hour_out = hourly.select(
        F.lit("hour").alias("granularity"),
        "w_start",
        "event_type",
        "n_events",
        F.round(F.col("_sum"), 2).cast("double").alias("total_value"),
    )
    daily = hourly.groupBy(
        F.date_trunc("day", F.col("w_start")).alias("w_start"),
        "event_type",
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("_sum").alias("_sum"),
    )
    day_out = daily.select(
        F.lit("day").alias("granularity"),
        "w_start",
        "event_type",
        "n_events",
        F.round(F.col("_sum"), 2).cast("double").alias("total_value"),
    )
    return hour_out.unionByName(day_out)


# --------------------------------------------------------------------------
# clean-corpus selection: the whole pipeline as ONE declarative plan
# --------------------------------------------------------------------------

from .dedup import DEDUP_EXACT_ORACLE, dedup_exact  # noqa: E402
from .textstats import (  # noqa: E402
    LANG_ID_ORACLE,
    QUALITY_ORACLE,
    lang_id_heuristic,
    text_quality_scores,
)

QUALITY_MIN = 0.6

CLEAN_CORPUS_ORACLE = f"""
WITH q AS ({QUALITY_ORACLE}),
l AS ({LANG_ID_ORACLE}),
d AS ({DEDUP_EXACT_ORACLE})
SELECT q.doc_id, q.n_tokens, q.quality_score, l.predicted_lang
FROM q
JOIN l ON q.doc_id = l.doc_id
WHERE q.quality_score >= {QUALITY_MIN}
  AND l.predicted_lang = 'en'
  AND q.doc_id IN (SELECT canonical_doc FROM d)
"""


@query("clean_corpus_selection", oracle=CLEAN_CORPUS_ORACLE)
def clean_corpus_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data curation end-to-end IN ONE PLAN: exact-dedup
    survivors ∩ quality gate ∩ language filter. Composing the operator
    builders keeps everything a single Catalyst plan — one scan of
    documents feeds all three branches, filters collapse, and the dedup
    survivor check is a semi-join, so at 100 TB this runs as one job
    instead of three materialized passes."""
    quality = text_quality_scores(spark, sf_dir)
    lang = lang_id_heuristic(spark, sf_dir).where(
        F.col("predicted_lang") == "en"
    ).select("doc_id", "predicted_lang")
    survivors = dedup_exact(spark, sf_dir).select(
        F.col("canonical_doc").alias("doc_id")
    )
    return (
        quality.where(F.col("quality_score") >= QUALITY_MIN)
        .join(lang, "doc_id")
        .join(survivors, "doc_id", "left_semi")
        .select("doc_id", "n_tokens", "quality_score", "predicted_lang")
    )


# --------------------------------------------------------------------------
# deterministic corpus sampling (hash-threshold, not TABLESAMPLE)
# --------------------------------------------------------------------------

SAMPLE_PCT = 10  # keep ~10% of docs

SAMPLE_ORACLE = f"""
SELECT doc_id, source, lang
FROM documents
WHERE ('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
      % 100 < {SAMPLE_PCT}
"""


@query("corpus_sample_hash", oracle=SAMPLE_ORACLE)
def corpus_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% corpus sample by md5-hash threshold on the key.
    Unlike TABLESAMPLE/df.sample (partition-order dependent, irreproducible
    across engines and runs), a hash threshold is a pure filter: it pushes
    into the scan, needs no shuffle or state, samples consistently across
    reruns AND across tables keyed by the same id — exactly what a
    training-data pipeline needs for holdout splits at 100 TB."""
    docs = table(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long") % 100
    return docs.where(bucket < SAMPLE_PCT).select("doc_id", "source", "lang")


STRAT_PER_GROUP = 20  # keep the 20 hash-smallest docs per language

STRAT_ORACLE = f"""
SELECT doc_id, lang, CAST(rn AS INTEGER) AS rank_in_lang
FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY ('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT,
                    doc_id) AS rn
  FROM documents)
WHERE rn <= {STRAT_PER_GROUP}
"""


@query("corpus_sample_stratified", oracle=STRAT_ORACLE)
def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified fixed-size sample: exactly N docs per language, chosen by
    hash order (deterministic, uniform within stratum). The window runs on
    the already-tiny (doc_id, lang, hash) projection; per-stratum top-N by
    hash is the scalable equivalent of per-group shuffling."""
    docs = table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "lang")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= STRAT_PER_GROUP)
        .select("doc_id", "lang", F.col("rn").cast("int").alias("rank_in_lang"))
    )


# --------------------------------------------------------------------------
# cluster-safe train/val split (leakage control)
# --------------------------------------------------------------------------

TRAIN_PCT = 90  # ~90/10 split by duplicate-cluster hash


def _cluster_split_oracle() -> str:
    from .dedup import DEDUP_CLUSTERS_ORACLE

    return f"""
WITH clusters AS ({DEDUP_CLUSTERS_ORACLE})
SELECT doc_id, cluster,
       CASE WHEN ('0x' || substr(md5('split:' || CAST(cluster AS VARCHAR)),
                  1, 8))::UBIGINT % 100 < {TRAIN_PCT}
            THEN 'train' ELSE 'val' END AS split
FROM clusters
"""


@query("cluster_safe_split", oracle=_cluster_split_oracle())
def cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-controlled holdout split: the split hash is taken on each
    document's DUPLICATE-CLUSTER id (dedup_clusters), not its doc id, so
    near-duplicates can never straddle train/val — the contamination mode
    a doc-id hash split silently permits (a val doc's 0.9-Jaccard twin in
    train is an eval leak). Same deterministic md5-threshold machinery as
    corpus_sample_hash, applied one level up the dedup pipeline; cost
    beyond dedup_clusters itself is one projection."""
    from .dedup import dedup_clusters

    cl = dedup_clusters(spark, sf_dir)
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("cluster").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    return cl.select(
        "doc_id",
        "cluster",
        F.when(bucket < TRAIN_PCT, F.lit("train"))
        .otherwise(F.lit("val"))
        .alias("split"),
    )


# --------------------------------------------------------------------------
# token-budget corpus selection (curate exactly-N-tokens subsets)
# --------------------------------------------------------------------------

TOKEN_BUDGET = 12_000  # ~44% of the sf0.01 corpus, ~4% of sf0.1
_N_BUDGET_BUCKETS = 256  # hash prefix buckets for the scalable cumsum


def _budget_oracle() -> str:
    from .dedup import _NORM_DUCK

    return f"""
WITH t AS (
  SELECT doc_id, len(string_split({_NORM_DUCK}, ' ')) AS n_tokens,
         ('0x' || substr(md5('budget:' || CAST(doc_id AS VARCHAR)),
          1, 8))::UBIGINT AS h
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY h, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM t
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM c WHERE cum_tokens <= {TOKEN_BUDGET}
"""


@query("token_budget_selection", oracle=_budget_oracle())
def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select documents in deterministic priority order until a token
    budget is exhausted — "give me a 500B-token subset" as one plan. The
    priority here is a uniform hash (swap in a quality score for curated
    subsets; the cutoff machinery is the operator).

    The oracle's naive form is a GLOBAL ordered cumulative sum — a
    single-partition window at 100 TB. This runs the scalable
    equivalent: docs group into 256 hash-prefix buckets (the prefix IS
    the leading sort key, so bucket order refines to the global order),
    per-bucket token totals roll up on 256 rows, each bucket learns the
    cumulative total BEFORE it (broadcast back), and the ordered window
    runs only WITHIN buckets — partition-parallel, identical output."""
    from .dedup import _NORM_SPARK

    docs = table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("budget:"), F.col("doc_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    t = docs.select(
        "doc_id",
        F.expr(f"size(split({_NORM_SPARK}, ' '))").cast("bigint").alias(
            "n_tokens"
        ),
        h.alias("h"),
    ).withColumn("bucket", F.expr(f"h DIV {(1 << 32) // _N_BUDGET_BUCKETS}"))
    btot = t.groupBy("bucket").agg(F.sum("n_tokens").alias("bt"))
    wb = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # 256 rows: the global window is metadata-sized by construction
    prior = btot.select(
        "bucket", (F.sum("bt").over(wb) - F.col("bt")).alias("cum_before")
    )
    ww = Window.partitionBy("bucket").orderBy("h", "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sel = (
        t.join(F.broadcast(prior), "bucket")
        .withColumn(
            "cum_tokens", F.col("cum_before") + F.sum("n_tokens").over(ww)
        )
        .where(F.col("cum_tokens") <= TOKEN_BUDGET)
    )
    return sel.select(
        "doc_id", "n_tokens", F.col("cum_tokens").cast("bigint").alias("cum_tokens")
    )


# --------------------------------------------------------------------------
# Curation verdicts: the keep/drop table composing the quality signals
# --------------------------------------------------------------------------

CURATE_MIN_QUALITY = 0.5  # compares the ROUNDED quality_score column
CURATE_MAX_DUP_TRI = 0.05
CURATE_MIN_FLUENCY = 29.0


def _curation_oracle() -> str:
    from .textstats import (
        BIGRAM_FLUENCY_ORACLE,
        GOPHER_ORACLE,
        QUALITY_ORACLE,
    )
    from .training_prep import REPETITION_ORACLE

    return f"""
WITH q AS ({QUALITY_ORACLE}),
g AS ({GOPHER_ORACLE}),
r AS ({REPETITION_ORACLE}),
f AS ({BIGRAM_FLUENCY_ORACLE})
SELECT q.doc_id,
  q.quality_score,
  g.passes_all AS gopher_pass,
  r.dup_trigram_ratio,
  f.mean_bigram_count,
  q.quality_score >= {CURATE_MIN_QUALITY} AS rule_quality,
  g.passes_all AS rule_gopher,
  COALESCE(r.dup_trigram_ratio <= {CURATE_MAX_DUP_TRI}, TRUE)
    AS rule_repetition,
  COALESCE(f.mean_bigram_count >= {CURATE_MIN_FLUENCY}, FALSE)
    AS rule_fluency,
  q.quality_score >= {CURATE_MIN_QUALITY}
  AND g.passes_all
  AND COALESCE(r.dup_trigram_ratio <= {CURATE_MAX_DUP_TRI}, TRUE)
  AND COALESCE(f.mean_bigram_count >= {CURATE_MIN_FLUENCY}, FALSE)
    AS keep
FROM q
JOIN g ON g.doc_id = q.doc_id
LEFT JOIN r ON r.doc_id = q.doc_id
LEFT JOIN f ON f.doc_id = q.doc_id
"""


@query("curation_verdicts", oracle=_curation_oracle())
def curation_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The final artifact of a curation pipeline: one keep/drop verdict
    per document with the PER-RULE breakdown, composing four registered
    quality signals — the heuristic score (``text_quality_scores``),
    the Gopher rule gate (``gopher_quality_rules``), within-doc
    repetition (``doc_repetition_scores``), and the corpus-LM fluency
    proxy (``bigram_fluency_scores``). Each rule thresholds an
    already-ROUNDED registered column (exact compares — no fresh float
    path), so the composite inherits the constituents' cross-engine
    determinism; the oracle literally composes their oracle SQL as
    CTEs, pinning the composition itself. Docs too short to score a
    signal default per the rule's semantics (no trigrams -> repetition
    passes; no bigrams -> fluency fails — absence of fluency EVIDENCE
    is a drop, absence of repetition evidence is not).

    Scale: four corpus-scan sub-plans joined on doc_id — each
    constituent is the registered operator's own plan (in-row
    projections plus the fluency pipeline's vocabulary exchanges); the
    verdict joins shuffle doc-keyed score rows, not corpus text. A
    deployment materializes this table per corpus version and every
    downstream sampler filters on ``keep``."""
    from .textstats import (
        bigram_fluency_scores,
        gopher_quality_rules,
        text_quality_scores,
    )
    from .training_prep import doc_repetition_scores

    q = text_quality_scores(spark, sf_dir).select("doc_id", "quality_score")
    g = gopher_quality_rules(spark, sf_dir).select(
        "doc_id", F.col("passes_all").alias("gopher_pass")
    )
    r = doc_repetition_scores(spark, sf_dir).select(
        "doc_id", "dup_trigram_ratio"
    )
    f = bigram_fluency_scores(spark, sf_dir).select(
        "doc_id", "mean_bigram_count"
    )
    j = (
        q.join(g, "doc_id")
        .join(r, "doc_id", "left")
        .join(f, "doc_id", "left")
    )
    rule_q = F.col("quality_score") >= CURATE_MIN_QUALITY
    rule_g = F.col("gopher_pass")
    rule_r = F.coalesce(
        F.col("dup_trigram_ratio") <= CURATE_MAX_DUP_TRI, F.lit(True)
    )
    rule_f = F.coalesce(
        F.col("mean_bigram_count") >= CURATE_MIN_FLUENCY, F.lit(False)
    )
    return j.select(
        "doc_id",
        "quality_score",
        "gopher_pass",
        "dup_trigram_ratio",
        "mean_bigram_count",
        rule_q.alias("rule_quality"),
        rule_g.alias("rule_gopher"),
        rule_r.alias("rule_repetition"),
        rule_f.alias("rule_fluency"),
        (rule_q & rule_g & rule_r & rule_f).alias("keep"),
    )


# --------------------------------------------------------------------------
# weighted sampling without replacement (priority sampling)
# --------------------------------------------------------------------------
#
# Duffield-Lund-Thorup priority sampling (JACM 2007): give row i priority
# q_i = w_i / u_i with u_i uniform in (0, 1], keep the k highest-priority
# rows, and estimate each kept row's weight as max(w_i, tau) where tau is
# the (k+1)-th priority. The estimator is unbiased for any subset-sum and
# near-optimal in variance — the standard way to keep a fixed-size
# weighted sample of an unbounded corpus. Unlike Efraimidis-Spirakis keys
# (u^(1/w) — a transcendental pow whose last ulp differs across libms),
# the priority needs ONE exact integer multiply and ONE correctly-rounded
# IEEE division, so Spark and DuckDB produce bit-identical doubles and the
# operator carries a full-value oracle.

WSAMPLE_K = 64  # fixed sample size


def _wsample_pri_spark() -> F.Column:
    """Priority q = w * 2^32 / (h + 1): h is the first 8 md5 hex digits of
    the salted doc key (u = (h+1)/2^32 uniform in (0,1], never 0), the
    multiply w * 2^32 stays exact (< 2^53 for any plausible doc length),
    and the single division is IEEE-correctly-rounded on both engines."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("wsamp:"), F.col("doc_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return (F.col("n_chars").cast("double") * F.lit(4294967296.0)) / (
        h + F.lit(1)
    ).cast("double")


WSAMPLE_ORACLE = f"""
WITH pri AS (
  SELECT doc_id, source, n_chars,
         CAST(n_chars AS DOUBLE) * 4294967296.0 /
         CAST(('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              + 1 AS DOUBLE) AS pri
  FROM documents),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY pri DESC, doc_id) AS rn FROM pri),
tau AS (
  SELECT coalesce(min(CASE WHEN rn = {WSAMPLE_K} + 1 THEN pri END), 0.0) AS tau
  FROM ranked WHERE rn <= {WSAMPLE_K} + 1)
SELECT doc_id, source, n_chars AS weight,
       CAST(rn AS INTEGER) AS sample_rank,
       greatest(CAST(n_chars AS DOUBLE), tau) AS est_weight
FROM ranked, tau
WHERE rn <= {WSAMPLE_K}
"""


@query("corpus_sample_weighted", oracle=WSAMPLE_ORACLE)
def corpus_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size weighted sample WITHOUT replacement (priority sampling,
    Duffield-Lund-Thorup): keep the 64 docs with the highest priority
    w/u (w = n_chars, u a deterministic md5 uniform), and attach the
    unbiased weight estimate max(w, tau) — summing est_weight over any
    subset of the sample estimates that subset's true total weight, which
    is what lets a curation pipeline audit token budgets from the sample
    alone. Complements the unweighted hash threshold (corpus_sample_hash)
    and the per-stratum top-N (corpus_sample_stratified): this is the
    length-proportional variant a token-budgeted mixture actually wants.

    Scale: the plan is scan -> project -> global top-(k+1), which Spark
    executes as TakeOrderedAndProject — each task keeps a k+1-row heap and
    only those partials cross to the driver; no shuffle, no global sort,
    no state proportional to the corpus. tau is then an unpartitioned
    window aggregate over the SAME 65-row limited frame (single lineage —
    a separate agg-and-broadcast branch would rescan the corpus twice; the
    single-partition WindowExec warning this trades for applies to 65
    rows). At 100 TB this is one pass at scan speed with O(k) memory per
    task — the property that makes priority sampling the streaming-sketch
    of choice for weighted samples."""
    docs = table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "source", "n_chars", _wsample_pri_spark().alias("pri"))
    topk1 = base.orderBy(F.col("pri").desc(), F.col("doc_id").asc()).limit(
        WSAMPLE_K + 1
    )
    w = Window.orderBy(F.col("pri").desc(), F.col("doc_id").asc())
    ranked = topk1.withColumn("rn", F.row_number().over(w))
    whole = Window.partitionBy()  # 65 rows: the k+1 cut, not the corpus
    tau = F.coalesce(
        F.min(F.when(F.col("rn") == WSAMPLE_K + 1, F.col("pri"))).over(whole),
        F.lit(0.0),
    )
    return (
        ranked.withColumn("tau", tau)
        .where(F.col("rn") <= WSAMPLE_K)
        .select(
            "doc_id",
            "source",
            F.col("n_chars").alias("weight"),
            F.col("rn").cast("int").alias("sample_rank"),
            F.greatest(F.col("n_chars").cast("double"), F.col("tau")).alias(
                "est_weight"
            ),
        )
    )


WSAMPLE_PER_LANG = 16  # fixed per-stratum sample size


WSAMPLE_STRAT_ORACLE = f"""
WITH pri AS (
  SELECT doc_id, lang, n_chars,
         CAST(n_chars AS DOUBLE) * 4294967296.0 /
         CAST(('0x' || substr(md5('wstrat:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              + 1 AS DOUBLE) AS pri
  FROM documents),
ranked AS (
  SELECT *, row_number() OVER (
           PARTITION BY lang ORDER BY pri DESC, doc_id) AS rn
  FROM pri),
tau AS (
  SELECT lang,
         coalesce(min(CASE WHEN rn = {WSAMPLE_PER_LANG} + 1 THEN pri END), 0.0)
           AS tau
  FROM ranked WHERE rn <= {WSAMPLE_PER_LANG} + 1 GROUP BY lang)
SELECT r.doc_id, r.lang, r.n_chars AS weight,
       CAST(r.rn AS INTEGER) AS rank_in_lang,
       greatest(CAST(r.n_chars AS DOUBLE), t.tau) AS est_weight
FROM ranked r JOIN tau t ON r.lang = t.lang
WHERE r.rn <= {WSAMPLE_PER_LANG}
"""


@query("corpus_sample_weighted_stratified", oracle=WSAMPLE_STRAT_ORACLE)
def corpus_sample_weighted_stratified(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The mixture-building primitive: a fixed-size priority sample PER
    LANGUAGE (16 docs each, weight = n_chars), so every stratum gets a
    length-proportional sample with its own Duffield-Lund-Thorup weight
    estimates — summing est_weight within a stratum estimates that
    language's true token mass from 16 rows, which is how a pipeline
    audits a sampling mixture without a second full scan. Same portable
    priority arithmetic as corpus_sample_weighted (one exact multiply,
    one IEEE division); per-stratum tau is the (k+1)-th priority within
    the language, 0.0 for strata smaller than k+1.

    Scale: rank <= k+1 over Window.partitionBy(lang) lets Spark plan a
    WindowGroupLimit — each task keeps a per-stratum (k+1)-row heap
    BEFORE the exchange, so only |langs| x (k+1) rows per task shuffle,
    not the corpus (the plan pin asserts the node). tau is a second
    per-lang window over the ALREADY-FILTERED (k+1)-per-stratum frame —
    same lineage, same partitioning (no new exchange, no second corpus
    scan; the flat sampler learned this the same way)."""
    docs = table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("wstrat:"), F.col("doc_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    pri = (F.col("n_chars").cast("double") * F.lit(4294967296.0)) / (
        h + F.lit(1)
    ).cast("double")
    base = docs.select("doc_id", "lang", "n_chars", pri.alias("pri"))
    w = Window.partitionBy("lang").orderBy(F.col("pri").desc(), F.col("doc_id").asc())
    ranked = base.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= WSAMPLE_PER_LANG + 1
    )
    per_lang = Window.partitionBy("lang")  # <= k+1 rows per stratum here
    tau = F.coalesce(
        F.min(
            F.when(F.col("rn") == WSAMPLE_PER_LANG + 1, F.col("pri"))
        ).over(per_lang),
        F.lit(0.0),
    )
    return (
        ranked.withColumn("tau", tau)
        .where(F.col("rn") <= WSAMPLE_PER_LANG)
        .select(
            "doc_id",
            "lang",
            F.col("n_chars").alias("weight"),
            F.col("rn").cast("int").alias("rank_in_lang"),
            F.greatest(F.col("n_chars").cast("double"), F.col("tau")).alias(
                "est_weight"
            ),
        )
    )
