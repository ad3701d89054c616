"""Text-analysis operators for LLM-data pipelines (north-star surface,
BASELINE.json): quality scoring, language-ID heuristic, token counting,
document fingerprinting — all pure column expressions (codegen, no UDFs),
each with a DuckDB oracle.

Determinism: every ratio is a double division of exact integers, and both
engines build token arrays with the same regex split, so artifacts (e.g. a
leading '' token on leading whitespace) are identical on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table

STOPWORDS = "'the','and','of','to','a','in','is','it'"

QUALITY_ORACLE = f"""
SELECT doc_id,
  CAST(n_tokens AS BIGINT) AS n_tokens,
  ROUND(punct_cnt * 1.0 / NULLIF(n_chars_txt, 0), 6) AS punct_ratio,
  ROUND(stop_cnt * 1.0 / NULLIF(n_tokens, 0), 6) AS stop_ratio,
  ROUND(alpha_cnt * 1.0 / NULLIF(n_chars_txt, 0), 6) AS alpha_ratio,
  ROUND(
    (alpha_cnt * 1.0 / NULLIF(n_chars_txt, 0)) * 0.5
    + LEAST(stop_cnt * 5.0 / NULLIF(n_tokens, 0), 1.0) * 0.3
    + LEAST(n_tokens / 100.0, 1.0) * 0.2, 6) AS quality_score
FROM (
  SELECT doc_id,
    length(text) AS n_chars_txt,
    len(string_split_regex(lower(text), '\\s+')) AS n_tokens,
    length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS punct_cnt,
    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_cnt,
    len(list_filter(string_split_regex(lower(text), '\\s+'),
        t -> t IN ({STOPWORDS}))) AS stop_cnt
  FROM documents
)
"""


@query("text_quality_scores", oracle=QUALITY_ORACLE)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), r"\s+")
    base = docs.select(
        "doc_id",
        F.length("text").alias("n_chars_txt"),
        F.size(toks).cast("long").alias("n_tokens"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", r"[^A-Za-z0-9\s]", ""))
        ).alias("punct_cnt"),
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")).alias("alpha_cnt"),
        F.size(
            F.expr(f"filter(split(lower(text), '\\\\s+'), t -> t IN ({STOPWORDS}))")
        ).alias("stop_cnt"),
    )
    nz = lambda c: F.nullif(F.col(c), F.lit(0))  # noqa: E731
    return base.select(
        "doc_id",
        "n_tokens",
        F.round(F.col("punct_cnt") * 1.0 / nz("n_chars_txt"), 6).alias("punct_ratio"),
        F.round(F.col("stop_cnt") * 1.0 / nz("n_tokens"), 6).alias("stop_ratio"),
        F.round(F.col("alpha_cnt") * 1.0 / nz("n_chars_txt"), 6).alias("alpha_ratio"),
        F.round(
            (F.col("alpha_cnt") * 1.0 / nz("n_chars_txt")) * 0.5
            + F.least(F.col("stop_cnt") * 5.0 / nz("n_tokens"), F.lit(1.0)) * 0.3
            + F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.2,
            6,
        ).alias("quality_score"),
    )


_MARKERS = {
    "en": "'the','and','of','to','a'",
    "de": "'der','die','und','das','ist'",
    "es": "'el','la','los','que','por'",
    "fr": "'le','les','des','et','une'",
}

_HITS_SPARK = {
    lang: f"size(filter(split(lower(text), '\\\\s+'), t -> t IN ({m})))"
    for lang, m in _MARKERS.items()
}
_HITS_DUCK = {
    lang: f"len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t IN ({m})))"
    for lang, m in _MARKERS.items()
}

_PREDICT_CASE = """
CASE
  WHEN h_en = 0 AND h_de = 0 AND h_es = 0 AND h_fr = 0 THEN 'unknown'
  WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr THEN 'en'
  WHEN h_de >= h_es AND h_de >= h_fr THEN 'de'
  WHEN h_es >= h_fr THEN 'es'
  ELSE 'fr'
END
"""

LANG_ID_ORACLE = f"""
SELECT doc_id, lang AS labeled_lang, {_PREDICT_CASE} AS predicted_lang
FROM (
  SELECT doc_id, lang,
    {_HITS_DUCK['en']} AS h_en,
    {_HITS_DUCK['de']} AS h_de,
    {_HITS_DUCK['es']} AS h_es,
    {_HITS_DUCK['fr']} AS h_fr
  FROM documents
)
"""


@query("lang_id_heuristic", oracle=LANG_ID_ORACLE)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID (n-gram-heuristic family). On the synthetic
    English-ish corpus nearly everything scores 'en' or 'unknown' — the
    point is the operator shape: per-language hit counts in one scan, then
    a deterministic argmax with a fixed tie order."""
    docs = table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.expr(_HITS_SPARK["en"]).alias("h_en"),
        F.expr(_HITS_SPARK["de"]).alias("h_de"),
        F.expr(_HITS_SPARK["es"]).alias("h_es"),
        F.expr(_HITS_SPARK["fr"]).alias("h_fr"),
    )
    return base.select(
        "doc_id", "labeled_lang", F.expr(_PREDICT_CASE).alias("predicted_lang")
    )


# BPE-ish pre-tokenizer: letter runs, digit runs, single non-space symbols.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

TOKEN_STATS_ORACLE = f"""
SELECT doc_id,
  CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS ws_tokens,
  CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT) AS bpe_tokens,
  ROUND(length(text) * 1.0 /
        NULLIF(len(regexp_extract_all(text, '{BPE_PATTERN}')), 0), 4)
    AS chars_per_bpe_token
FROM documents
"""


@query("token_stats", oracle=TOKEN_STATS_ORACLE)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    bpe = F.regexp_count("text", F.lit(BPE_PATTERN))
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
        F.round(F.length("text") * 1.0 / F.nullif(bpe, F.lit(0)), 4).alias(
            "chars_per_bpe_token"
        ),
    )


FINGERPRINT_ORACLE = """
SELECT doc_id,
  md5(norm) AS content_md5,
  CAST(('0x' || substr(md5(norm), 1, 15))::UBIGINT AS BIGINT) AS fingerprint60
FROM (
  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
  FROM documents
)
"""


@query("doc_fingerprint", oracle=FINGERPRINT_ORACLE)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized text plus a 60-bit
    integer fingerprint (first 15 hex digits) — md5 is the portable hash
    both engines agree on (Spark hash()/xxhash64 have no DuckDB twin)."""
    docs = table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    digest = F.md5(norm)
    return docs.select(
        "doc_id",
        digest.alias("content_md5"),
        F.conv(F.substring(digest, 1, 15), 16, 10).cast("long").alias("fingerprint60"),
    )


# --------------------------------------------------------------------------
# Language-ID evaluation: confusion matrix of labels vs heuristic predictions
# --------------------------------------------------------------------------

CONFUSION_ORACLE = f"""
SELECT labeled_lang, predicted_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(COUNT(*) * 1.0 /
             SUM(COUNT(*)) OVER (PARTITION BY labeled_lang), 6) AS row_ratio
FROM ({LANG_ID_ORACLE})
GROUP BY labeled_lang, predicted_lang
"""


@query("lang_id_confusion_matrix", oracle=CONFUSION_ORACLE)
def lang_id_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The evaluation table for the language-ID stage: (labeled,
    predicted) document counts plus each cell's share of its labeled-lang
    row — the classifier-audit dashboard a pipeline reads before trusting
    the lang gate in ``clean_corpus_selection`` / the training funnel.
    Composes the REGISTERED ``lang_id_heuristic`` (shared code, so the
    audit can never drift from the operator it audits — the
    ann/lsh_recall_audit convention).

    Scale: one corpus scan inside the composed query, one aggregation
    shuffle on the (labeled, predicted) pair, then a window over the
    <= |langs|+1 squared confusion cells — bounded output regardless of
    corpus size. The ratio is ONE IEEE division per cell over exact
    counts."""
    from pyspark.sql.window import Window

    cm = (
        lang_id_heuristic(spark, sf_dir)
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = Window.partitionBy("labeled_lang")
    return cm.select(
        "labeled_lang",
        "predicted_lang",
        "n_docs",
        F.round(
            F.col("n_docs") * 1.0 / F.sum("n_docs").over(w), 6
        ).alias("row_ratio"),
    )


# --------------------------------------------------------------------------
# Lexical diversity: type-token ratio + Gini-Simpson, rational-exact
# --------------------------------------------------------------------------

DIVERSITY_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
cnt AS (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY 1, 2),
agg AS (
  SELECT doc_id, SUM(c) AS n, COUNT(*) AS u, SUM(c * c) AS sumsq
  FROM cnt GROUP BY 1
)
SELECT d.doc_id,
  CAST(COALESCE(a.n, 0) AS BIGINT) AS n_tokens,
  CAST(COALESCE(a.u, 0) AS BIGINT) AS n_types,
  ROUND(a.u * 1.0 / NULLIF(a.n, 0), 6) AS type_token_ratio,
  ROUND((a.n * a.n - a.sumsq) * 1.0 / NULLIF(a.n * a.n, 0), 6)
    AS simpson_diversity
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


@query("token_diversity_scores", oracle=DIVERSITY_ORACLE)
def token_diversity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical diversity: type-token ratio and Gini-Simpson
    diversity 1 - sum(c_w^2)/n^2 — the repetition-collapse signal a
    training-data quality gate thresholds on (a doc whose tokens are one
    phrase looping scores near its TTR floor; natural prose sits near
    1). Deliberately Simpson rather than Shannon entropy: the statistic
    is a RATIONAL function of exact integer counts (one IEEE division at
    the end), so it is bit-identical across engines — entropy's
    sum-of-c*log2(c) terms would hang determinism on libm log2 agreeing
    between DuckDB and the JVM, the same trap ``pmi_collocations``
    dodges with its pre-log rational form.

    Scale: everything is IN-ROW on the token array (split, distinct,
    count-fold) — zero explode, zero shuffle; the whole operator is one
    codegen'd projection over the corpus scan. The count fold is
    O(types x tokens) per doc, the price of staying shuffle-free; the
    exploded groupBy twin (the oracle's shape) becomes preferable only
    when single docs are huge enough to dominate a task."""
    docs = table(spark, sf_dir, "documents")
    with_toks = docs.select(
        "doc_id",
        F.expr(
            "filter(split(lower(text), '\\\\s+'), x -> x <> '')"
        ).alias("t"),
    )
    sumsq = (
        "aggregate(transform(array_distinct(t),"
        " d -> CAST(size(filter(t, x -> x = d)) AS BIGINT)),"
        " CAST(0 AS BIGINT), (acc, c) -> acc + c * c)"
    )
    return with_toks.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("t")).cast("long").alias("n_types"),
        F.round(
            F.size(F.array_distinct("t"))
            * 1.0
            / F.nullif(F.size("t"), F.lit(0)),
            6,
        ).alias("type_token_ratio"),
        F.round(
            (F.size("t").cast("long") * F.size("t") - F.expr(sumsq))
            * 1.0
            / F.nullif(F.size("t").cast("long") * F.size("t"), F.lit(0)),
            6,
        ).alias("simpson_diversity"),
    )


# --------------------------------------------------------------------------
# BPE merge candidates: the first iteration of byte-pair-encoding training
# --------------------------------------------------------------------------

BPE_TOP_PAIRS = 20

BPE_MERGE_ORACLE = f"""
WITH tok AS (
  SELECT unnest(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
                            t -> length(t) >= 2)) AS t
  FROM documents
),
pairs AS (
  SELECT substr(t, CAST(i AS INT), 2) AS pair
  FROM tok, UNNEST(range(1, length(t))) AS u(i)
)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS pair_count
FROM pairs GROUP BY pair
ORDER BY pair_count DESC, pair
LIMIT {BPE_TOP_PAIRS}
"""


@query("bpe_merge_candidates", oracle=BPE_MERGE_ORACLE)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first iteration of BPE tokenizer training: count every adjacent
    character pair inside letter-run words across the corpus and rank the
    top merge candidates (highest count wins; ties break lexically so the
    merge choice is deterministic). Full BPE training iterates this step
    applying the winning merge each round — one iteration is the corpus-
    scan primitive the loop repeats, and the expensive part at scale.

    Scale design: the explode emits one row per character position, but
    the groupBy's MAP-SIDE partial hash aggregate combines them into the
    alphabet^2-bounded keyspace (<= 676 keys for [a-z]) before anything
    moves: the shuffle carries <= 676 rows per map partition regardless
    of corpus size, and the final top-K is a TakeOrderedAndProject over
    <= 676 totals. A 100 TB corpus pays one scan and a constant-width
    exchange. (The tempting alternative — folding each doc to distinct
    (pair, count) structs IN-ROW before exploding — is 60x SLOWER,
    measured: the fold is O(distinct x positions) string compares per
    document, re-doing exactly the combine the hash aggregate performs
    at codegen speed; A/B in SCALE.md round 8.)"""
    docs = table(spark, sf_dir, "documents")
    ps = (
        "flatten(transform("
        "filter(regexp_extract_all(lower(text), '[a-z]+', 0),"
        " t -> length(t) >= 2),"
        " t -> transform(sequence(1, length(t) - 1),"
        " i -> substring(t, i, 2))))"
    )
    return (
        docs.select(F.explode(F.expr(ps)).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(BPE_TOP_PAIRS)
    )


# --------------------------------------------------------------------------
# BPE training, three merges deep: count -> merge -> recount on the
# word-frequency table (the way real BPE trainers iterate)
# --------------------------------------------------------------------------

BPE_MERGES = 3

# adjacent symbol pairs of one word, weighted later by word frequency;
# CASE guards fully-merged 1-symbol words (sequence(1, 0) is DESCENDING
# in Spark — the pmi_collocations trap)
_BPE_PAIRS = (
    "CASE WHEN size(syms) < 2 THEN array() ELSE "
    "transform(sequence(1, size(syms) - 1),"
    " i -> struct(element_at(syms, i) AS s1, element_at(syms, i + 1) AS s2))"
    " END"
)

# greedy left-to-right merge application: fold the symbol array, merging
# (prev, cur) == (s1, s2) as we go — the fold handles shared-symbol runs
# ('a a a a' under winner (a,a) -> 'aa aa') correctly because a merged
# symbol no longer equals s1
_BPE_FOLD = (
    "aggregate(slice(syms, 2, size(syms) - 1), array(element_at(syms, 1)),"
    " (acc, x) -> IF(element_at(acc, -1) = s1 AND x = s2,"
    " concat(slice(acc, 1, size(acc) - 1), array(concat(s1, s2))),"
    " concat(acc, array(x))))"
)


def _bpe_top_pair(wdf: DataFrame) -> DataFrame:
    """Highest-count adjacent symbol pair of a (wcount, syms) vocab frame
    (ties break lexically — the deterministic-merge rule both BPE
    operators and their oracles share)."""
    return (
        wdf.select("wcount", F.explode(F.expr(_BPE_PAIRS)).alias("p"))
        .groupBy(F.col("p.s1").alias("s1"), F.col("p.s2").alias("s2"))
        .agg(F.sum("wcount").cast("long").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("s1"), F.asc("s2"))
        .limit(1)
    )


def _bpe_apply_merge(
    wdf: DataFrame, win: DataFrame, keep: tuple[str, ...] = ("wcount",)
) -> DataFrame:
    """Greedy left-to-right application of ONE winning merge to every
    word's symbol array (in-row fold; the 1-row winner rides in as a
    broadcast crossJoin — declarative, no driver collect)."""
    return wdf.crossJoin(F.broadcast(win.select("s1", "s2"))).select(
        *keep, F.expr(_BPE_FOLD).alias("syms")
    )


def _bpe_oracle() -> str:
    # the DuckDB twin: same vocab weighting; the greedy fold is a
    # recursive CTE advancing one symbol per step (list-accumulator
    # fold), the winner a 1-row CTE the next stage cross-joins
    def pairs(wtab: str) -> str:
        return f"""
  SELECT syms[CAST(i AS INT)] AS s1, syms[CAST(i AS INT) + 1] AS s2,
         SUM(wcount) AS cnt
  FROM {wtab}, UNNEST(range(1, len(syms))) AS u(i)
  GROUP BY 1, 2"""

    def fold(src: str, win: str, out: str) -> str:
        return f"""
f_{out} AS (
  SELECT wid, wcount, syms, 1 AS i, [syms[1]] AS acc FROM {src}
  UNION ALL
  SELECT f.wid, f.wcount, f.syms, f.i + 1,
    CASE WHEN f.acc[-1] = {win}.s1 AND f.syms[f.i + 1] = {win}.s2
         THEN list_append(f.acc[1:len(f.acc) - 1], {win}.s1 || {win}.s2)
         ELSE list_append(f.acc, f.syms[f.i + 1]) END
  FROM f_{out} f, {win} WHERE f.i < len(f.syms)
),
{out} AS MATERIALIZED (SELECT wid, wcount, acc AS syms FROM f_{out} WHERE i = len(syms))"""

    return f"""
WITH RECURSIVE
w0 AS (
  SELECT row_number() OVER () AS wid, COUNT(*) AS wcount,
         regexp_extract_all(w, '.') AS syms
  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        FROM documents)
  WHERE length(w) >= 2
  GROUP BY w
),
p1 AS ({pairs('w0')}),
win1 AS (SELECT s1, s2, cnt FROM p1 ORDER BY cnt DESC, s1, s2 LIMIT 1),
{fold('w0', 'win1', 'w1')},
p2 AS ({pairs('w1')}),
win2 AS (SELECT s1, s2, cnt FROM p2 ORDER BY cnt DESC, s1, s2 LIMIT 1),
{fold('w1', 'win2', 'w2')},
p3 AS ({pairs('w2')}),
win3 AS (SELECT s1, s2, cnt FROM p3 ORDER BY cnt DESC, s1, s2 LIMIT 1)
SELECT 1 AS merge_step, s1 AS left_sym, s2 AS right_sym,
       CAST(cnt AS BIGINT) AS pair_count FROM win1
UNION ALL
SELECT 2, s1, s2, CAST(cnt AS BIGINT) FROM win2
UNION ALL
SELECT 3, s1, s2, CAST(cnt AS BIGINT) FROM win3
"""


@query("bpe_train_merges", oracle=_bpe_oracle())
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, THREE merge iterations deep — the full
    count -> pick winner -> greedily re-merge -> recount loop (Sennrich
    et al. 2016), not just the first candidate table
    (``bpe_merge_candidates``). Each row is one learned merge rule with
    its corpus pair count at the time it was chosen; ties break
    lexically so the learned vocabulary is deterministic.

    Scale design — the three decisions that make this the 100 TB shape:

    - **Iterate on the word-frequency table, not the corpus**: the one
      corpus-sized stage is the initial ``groupBy(word).count()``
      (map-side combined); every merge iteration folds the DISTINCT
      vocabulary (pair counts weighted by word frequency — identical
      totals, |vocab|-sized work). Real BPE trainers do exactly this.
    - **Fully declarative loop**: winners are 1-row frames broadcast
      into the next iteration's fold (``crossJoin(broadcast(...))``) —
      no driver-side ``collect`` anywhere; winners materialize JVM-side
      (eager ``localCheckpoint`` of a 1-row frame), which also lets each
      vocab frame unpersist as soon as its two consumers are done.
    - **Per-iteration exchanges are alphabet-bounded**: pair-count
      groupBys partial-aggregate into the (current) symbol-pair
      keyspace; the greedy merge application is an in-row array fold
      (O(len^2) array copies on <= word-length arrays).

    The vocab frames feeding two consumers (winner + next fold) are
    persisted eagerly — ReuseExchange does not fire across
    differently-pruned subtrees (SCALE.md). More merges = the same plan
    repeated (the ``pagerank_parts_2iter`` fixed-iteration convention);
    a production trainer loops with a checkpoint every ~50 merges.

    Greedy-run correctness: folding left-to-right merges 'a a a a'
    under winner (a, a) into 'aa aa' (the merged symbol no longer
    equals s1), matching reference BPE; the DuckDB oracle replays the
    identical fold as a recursive CTE, so the gate hash-checks all
    three learned rules and their counts."""
    return _bpe_train_loop(spark, sf_dir, BPE_MERGES)


def _bpe_vocab_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(wcount, syms) word-frequency vocabulary — the frame every BPE
    iteration folds (the corpus is scanned exactly once)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("w")
        )
        .where(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wcount"))
        .select(
            "wcount", F.expr("regexp_extract_all(w, '.', 0)").alias("syms")
        )
    )


BPE_CKPT_EVERY = 10  # cut vocab-frame lineage every this many merges


def _bpe_train_loop(
    spark: SparkSession, sf_dir: str, n_merges: int
) -> DataFrame:
    """The sequential count -> winner -> re-merge loop, parameterized by
    merge count so tools/bpe_scale_probe.py can measure the per-merge
    overhead curve (VERDICT r9 #2) on the exact production code path.

    Every ``BPE_CKPT_EVERY`` merges the vocab frame is localCheckpointed
    instead of persisted — the 'checkpoint every ~N merges' production
    rule the docstring promised, now load-bearing: persist caches DATA
    but the logical plan still nests one ``_BPE_FOLD`` lambda per merge,
    and the r10 probe measured the un-cut chain OOM-ing the driver
    during plan processing near 30 merges. Checkpointed frames stay
    resident (vocab-sized, one per BPE_CKPT_EVERY merges) because later
    cached frames recompute through them on eviction."""
    w0 = _bpe_vocab_frame(spark, sf_dir)
    top_pair, apply_merge = _bpe_top_pair, _bpe_apply_merge

    out = []
    w, prev = w0, None
    prev_is_ckpt = False
    for step in range(1, n_merges + 1):
        # each vocab frame feeds two consumers (its winner aggregate and
        # the next fold); persist + eager count per the kmeans /
        # SCALE.md branch-race convention — the frames are vocab-sized.
        # Once this frame is materialized, the PREVIOUS one has no live
        # consumers left (its winner is checkpointed below, its fold is
        # this frame) — unpersist it so repeated invocations in a
        # long-lived session don't accrete cached vocab blocks.
        is_ckpt = step % BPE_CKPT_EVERY == 0
        if is_ckpt:
            w = w.localCheckpoint(eager=True)  # materialize + CUT lineage
        else:
            w = w.persist()
            w.count()
        if prev is not None and not prev_is_ckpt:
            prev.unpersist()
        prev_is_ckpt = is_ckpt
        # the winner is a 1-ROW frame: materialize it JVM-side and cut
        # its lineage (localCheckpoint, not a driver collect) so the
        # final union and the next fold stop referencing the persisted
        # vocab frame — that's what makes the unpersist above safe
        win = top_pair(w).localCheckpoint(eager=True)
        out.append(
            win.select(
                F.lit(step).alias("merge_step"),
                F.col("s1").alias("left_sym"),
                F.col("s2").alias("right_sym"),
                "pair_count",
            )
        )
        if step < n_merges:
            prev = w
            w = apply_merge(w, win)
    if not prev_is_ckpt:
        w.unpersist()  # last frame: winner checkpointed, no successor fold
    res = out[0]
    for nxt in out[1:]:
        res = res.unionAll(nxt)
    return res


# --------------------------------------------------------------------------
# Batched BPE training: top-m pairwise-disjoint merges per round — the
# standard trick that collapses a 30k-merge vocabulary from 30k sequential
# Spark jobs to ~30k/m rounds (VERDICT r9 #2)
# --------------------------------------------------------------------------

# merges accepted per round (pairwise-disjoint). r10 measured the width
# curve on the real corpus: m=8 trains ~2.7x more rules/second than m=4
# with zero downside until m=16, where disjointness binds (candidates
# skipped for symbol collisions stop the batch filling) — so 8 is the
# measured sweet spot, promoted per VERDICT r10 #6. The oracle re-derives
# from this constant (same head formula on both engines).
BPE_BATCH_M = 8
BPE_BATCH_ROUNDS = 3  # rounds trained -> up to M x ROUNDS learned rules
BPE_BATCH_CANDS = 16  # ranked candidates the greedy selector examines

# In-row greedy disjoint selection over the rank-ordered candidate head:
# a candidate is accepted iff none of its three symbols (s1, s2, and the
# merged s1||s2) collides with any accepted pair's three symbols — the
# conservative rule that makes simultaneous application order-independent
# (no accepted pair can produce, consume, or equal a symbol another
# accepted pair touches).
def _bpe_greedy_select(m: int) -> str:
    return f"""
aggregate(cands, CAST(array() AS array<struct<s1:string,s2:string,cnt:bigint>>),
 (acc, c) -> IF(size(acc) >= {m} OR exists(acc, a ->
      a.s1 IN (c.s1, c.s2, concat(c.s1, c.s2)) OR
      a.s2 IN (c.s1, c.s2, concat(c.s1, c.s2)) OR
      concat(a.s1, a.s2) IN (c.s1, c.s2, concat(c.s1, c.s2))),
   acc,
   concat(acc, array(named_struct('s1', c.s1, 's2', c.s2, 'cnt', c.cnt)))))
"""


_BPE_GREEDY_SELECT = _bpe_greedy_select(BPE_BATCH_M)

# One greedy left-to-right pass applying the WHOLE accepted batch: at most
# one pair can match any (prev, cur) position because accepted pairs are
# symbol-disjoint, so the single fold equals applying the m merges in any
# order.
_BPE_BATCH_FOLD = (
    "aggregate(slice(syms, 2, size(syms) - 1), array(element_at(syms, 1)),"
    " (acc, x) -> IF(exists(mp, p -> element_at(acc, -1) = p.s1 AND x = p.s2),"
    " concat(slice(acc, 1, size(acc) - 1),"
    " array(concat(element_at(acc, -1), x))),"
    " concat(acc, array(x))))"
)


def _bpe_batched_oracle(m: int = BPE_BATCH_M) -> str:
    """DuckDB twin of the batched trainer: per round, the same ranked
    candidate head, the same greedy disjoint selection (a recursive CTE
    walking ranks with a list-of-structs accumulator), and the same
    one-pass batch fold (recursive CTE matching the accepted list).

    Parameterized by the SAME ``m`` as ``_bpe_batched_loop`` with the
    SAME head-size formula (max(BPE_BATCH_CANDS, 4m)), so the twins
    stay derivationally aligned for any batch width — not just the
    registered default (the r10 review's latent-divergence finding)."""
    head = max(BPE_BATCH_CANDS, 4 * m)

    def pairs(wtab: str, out: str) -> str:
        return f"""
{out} AS MATERIALIZED (
  SELECT s1, s2, cnt, row_number() OVER (ORDER BY cnt DESC, s1, s2) AS rk
  FROM (SELECT syms[CAST(i AS INT)] AS s1, syms[CAST(i AS INT) + 1] AS s2,
               SUM(wcount) AS cnt
        FROM {wtab}, UNNEST(range(1, len(syms))) AS u(i)
        GROUP BY 1, 2)
)"""

    def select(cand: str, out: str) -> str:
        return f"""
sel_{out} AS (
  SELECT 0 AS i, CAST([] AS STRUCT(s1 VARCHAR, s2 VARCHAR, cnt BIGINT)[]) AS picks
  UNION ALL
  SELECT s.i + 1,
    CASE WHEN len(s.picks) >= {m} THEN s.picks
         WHEN len(list_filter(s.picks, a ->
              a.s1 IN (c.s1, c.s2, c.s1 || c.s2) OR
              a.s2 IN (c.s1, c.s2, c.s1 || c.s2) OR
              (a.s1 || a.s2) IN (c.s1, c.s2, c.s1 || c.s2))) > 0 THEN s.picks
         ELSE list_append(s.picks, {{'s1': c.s1, 's2': c.s2,
                                     'cnt': CAST(c.cnt AS BIGINT)}}) END
  FROM sel_{out} s JOIN {cand} c ON c.rk = s.i + 1
  WHERE s.i < {head}
),
{out} AS MATERIALIZED (SELECT picks FROM sel_{out} ORDER BY i DESC LIMIT 1)"""

    def fold(src: str, picks: str, out: str) -> str:
        return f"""
f_{out} AS (
  SELECT wid, wcount, syms, 1 AS i, [syms[1]] AS acc FROM {src}
  UNION ALL
  SELECT f.wid, f.wcount, f.syms, f.i + 1,
    CASE WHEN len(list_filter(p.picks, q ->
              f.acc[-1] = q.s1 AND f.syms[f.i + 1] = q.s2)) > 0
         THEN list_append(f.acc[1:len(f.acc) - 1],
                          f.acc[-1] || f.syms[f.i + 1])
         ELSE list_append(f.acc, f.syms[f.i + 1]) END
  FROM f_{out} f, {picks} p WHERE f.i < len(f.syms)
),
{out} AS MATERIALIZED (SELECT wid, wcount, acc AS syms FROM f_{out} WHERE i = len(syms))"""

    body = ["""
w0 AS MATERIALIZED (
  SELECT row_number() OVER () AS wid, COUNT(*) AS wcount,
         regexp_extract_all(w, '.') AS syms
  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        FROM documents)
  WHERE length(w) >= 2
  GROUP BY w
)"""]
    finals = []
    for r in range(1, BPE_BATCH_ROUNDS + 1):
        body.append(pairs(f"w{r - 1}", f"p{r}"))
        body.append(select(f"p{r}", f"picks{r}"))
        if r < BPE_BATCH_ROUNDS:
            body.append(fold(f"w{r - 1}", f"picks{r}", f"w{r}"))
        finals.append(
            f"SELECT {r} AS merge_round, q.s1 AS left_sym,"
            f" q.s2 AS right_sym, CAST(q.cnt AS BIGINT) AS pair_count"
            f" FROM picks{r}, UNNEST(picks{r}.picks) AS u(q)"
        )
    return (
        "WITH RECURSIVE "
        + ",".join(body)
        + "\n"
        + "\nUNION ALL\n".join(finals)
    )


@query("bpe_train_merges_batched", oracle=_bpe_batched_oracle())
def bpe_train_merges_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training with BATCHED merge acceptance — the standard trick
    that makes a production-size vocabulary trainable on Spark: per
    round, rank the adjacent-pair counts once, then accept the top
    ``BPE_BATCH_M`` PAIRWISE-DISJOINT pairs (greedy down the rank order,
    skipping any candidate that shares a symbol — produced, consumed, or
    merged — with an already-accepted pair) and apply them all in ONE
    fold pass. Disjointness makes the simultaneous application
    order-independent, so the batch is semantically a sequence of m
    ordinary BPE merges whose counts were read at round start; a 30k-
    merge vocabulary costs ~30k/m rounds instead of 30k sequential
    count->winner->fold job pairs (the r9 verdict's measured scale
    ceiling on the sequential loop — tools/bpe_scale_probe.py records
    both curves).

    Plan: identical skeleton to ``bpe_train_merges`` (iterate the
    DISTINCT-word vocab, alphabet-bounded pair exchanges, winners as
    eagerly-checkpointed tiny frames broadcast into the next fold, zero
    driver collects); the only new machinery is in-row — the greedy
    selection folds the constant-size ranked candidate head
    (``BPE_BATCH_CANDS`` rows) inside one row, and the batch fold
    matches (prev, cur) against the accepted array instead of one pair.
    The DuckDB oracle replays the selection AND the fold as recursive
    CTEs, so the gate hash-checks every accepted rule of every round."""
    return _bpe_batched_loop(spark, sf_dir, BPE_BATCH_ROUNDS)


def _bpe_batched_loop(
    spark: SparkSession, sf_dir: str, rounds: int, m: int = BPE_BATCH_M
) -> DataFrame:
    select_expr = (
        _BPE_GREEDY_SELECT if m == BPE_BATCH_M else _bpe_greedy_select(m)
    )
    w0 = _bpe_vocab_frame(spark, sf_dir)

    out = []
    w, prev = w0, None
    prev_is_ckpt = False
    for rnd in range(1, rounds + 1):
        # same periodic lineage cut as the sequential loop (one batch
        # fold nests per round; see _bpe_train_loop's docstring)
        is_ckpt = rnd % BPE_CKPT_EVERY == 0
        if is_ckpt:
            w = w.localCheckpoint(eager=True)
        else:
            w = w.persist()
            w.count()
        if prev is not None and not prev_is_ckpt:
            prev.unpersist()
        prev_is_ckpt = is_ckpt
        # ranked candidate head -> ONE ROW (negcnt makes array_sort's
        # ascending field order equal the (cnt desc, s1, s2) rank order)
        cands = (
            w.select("wcount", F.explode(F.expr(_BPE_PAIRS)).alias("p"))
            .groupBy(F.col("p.s1").alias("s1"), F.col("p.s2").alias("s2"))
            .agg(F.sum("wcount").cast("long").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("s1"), F.asc("s2"))
            .limit(max(BPE_BATCH_CANDS, 4 * m))
            .agg(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("cnt")).alias("negcnt"),
                            "s1",
                            "s2",
                            "cnt",
                        )
                    )
                ).alias("cands")
            )
        )
        picks = cands.select(
            F.expr(select_expr).alias("mp")
        ).localCheckpoint(eager=True)
        out.append(
            picks.select(F.explode("mp").alias("q")).select(
                F.lit(rnd).alias("merge_round"),
                F.col("q.s1").alias("left_sym"),
                F.col("q.s2").alias("right_sym"),
                F.col("q.cnt").alias("pair_count"),
            )
        )
        if rnd < rounds:
            prev = w
            w = w.crossJoin(F.broadcast(picks)).select(
                "wcount", F.expr(_BPE_BATCH_FOLD).alias("syms")
            )
    if not prev_is_ckpt:
        w.unpersist()
    res = out[0]
    for nxt in out[1:]:
        res = res.unionAll(nxt)
    return res


# --------------------------------------------------------------------------
# Corpus-LM fluency proxy: per-doc mean corpus frequency of its bigrams
# --------------------------------------------------------------------------

BIGRAM_FLUENCY_ORACLE = """
WITH t AS (
  SELECT doc_id,
    list_filter(list_transform(string_split_regex(lower(text), '\\s+'),
                x -> regexp_replace(x, '[^a-z0-9]+', '', 'g')),
                x -> x <> '') AS toks
  FROM documents
),
bg AS (
  SELECT doc_id,
         toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1] AS bigram
  FROM t, UNNEST(range(1, len(toks))) AS u(i)
),
g AS (SELECT bigram, COUNT(*) AS cnt FROM bg GROUP BY bigram)
SELECT bg.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
  CAST(SUM(g.cnt) AS BIGINT) AS sum_bigram_count,
  ROUND(SUM(g.cnt) * 1.0 / COUNT(*), 6) AS mean_bigram_count
FROM bg JOIN g USING (bigram)
GROUP BY bg.doc_id
"""


@query("bigram_fluency_scores", oracle=BIGRAM_FLUENCY_ORACLE)
def bigram_fluency_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-LM fluency proxy per document: the mean CORPUS
    frequency of the document's adjacent word bigrams. Natural prose
    reuses the corpus's common word transitions (high mean); gibberish,
    word salad, and heavily templated boilerplate sit at the
    distribution's tails — the signal a KenLM perplexity filter
    captures, reduced to exact integer statistics so the gate can
    hash-check it (log-space perplexity would accumulate engine-specific
    float error across every bigram; the mean-count form does ONE IEEE
    division per document).

    Plan: bigrams unfold in-row from the cleaned token array (the
    ``clean_tokens`` tokenizer, lowercased so the strip class is
    [^a-z0-9]); the global bigram table partial-aggregates into the
    bigram vocabulary; the doc join is an equi-join on the bigram key
    and the per-doc aggregate partial-aggregates again. Two
    vocabulary-bounded exchanges + one corpus-sized equi-join — the
    ``bpe_encode_corpus`` aggregate-join shape. Docs with < 2 tokens
    have no bigrams and drop on BOTH engines."""
    docs = table(spark, sf_dir, "documents")
    toks = (
        "filter(transform(split(lower(text), '\\\\s+'),"
        " x -> regexp_replace(x, '[^a-z0-9]+', '')), x -> x != '')"
    )
    grams = (
        "CASE WHEN size(t) < 2 THEN array() ELSE "
        "transform(sequence(1, size(t) - 1),"
        " i -> concat(element_at(t, i), ' ', element_at(t, i + 1))) END"
    )
    bg = (
        docs.select("doc_id", F.expr(toks).alias("t"))
        .select("doc_id", F.explode(F.expr(grams)).alias("bigram"))
    )
    g = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        bg.join(g, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("cnt").cast("long").alias("sum_bigram_count"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "sum_bigram_count",
            F.round(
                F.col("sum_bigram_count") * 1.0 / F.col("n_bigrams"), 6
            ).alias("mean_bigram_count"),
        )
    )


# --------------------------------------------------------------------------
# BPE encode: apply the trained merges to tokenize the corpus — the
# missing half of the tokenizer pipeline (train half above)
# --------------------------------------------------------------------------


def _bpe_enc_ctes() -> str:
    """DuckDB CTE body (to follow ``WITH RECURSIVE``) that trains
    ``BPE_MERGES`` merges on the corpus vocabulary and encodes every
    distinct word with them: ends with ``dw`` (doc_id, w, c) and ``enc``
    (w, n_toks). Shared by the ``bpe_encode_corpus`` oracle and the
    BPE-token packing oracle in ``training_prep``.

    Training here runs on the FULL word vocabulary (no length >= 2
    filter, unlike ``bpe_train_merges``'s w0) — the learned merges are
    provably identical because 1-symbol words contribute ZERO adjacent
    pairs to every count."""

    def fold(src: str, win: str, out: str) -> str:
        # recursive greedy fold, carrying the word itself as the key so
        # the encoded symbol count joins back to dw
        return f"""
f_{out} AS (
  SELECT w, wcount, syms, 1 AS i, [syms[1]] AS acc FROM {src}
  UNION ALL
  SELECT f.w, f.wcount, f.syms, f.i + 1,
    CASE WHEN f.acc[-1] = {win}.s1 AND f.syms[f.i + 1] = {win}.s2
         THEN list_append(f.acc[1:len(f.acc) - 1], {win}.s1 || {win}.s2)
         ELSE list_append(f.acc, f.syms[f.i + 1]) END
  FROM f_{out} f, {win} WHERE f.i < len(f.syms)
),
{out} AS (SELECT w, wcount, acc AS syms FROM f_{out} WHERE i = len(syms))"""

    def pairs(wtab: str) -> str:
        return f"""
  SELECT syms[CAST(i AS INT)] AS s1, syms[CAST(i AS INT) + 1] AS s2,
         SUM(wcount) AS cnt
  FROM {wtab}, UNNEST(range(1, len(syms))) AS u(i)
  GROUP BY 1, 2"""

    return f"""
dw AS (
  SELECT doc_id, w, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        FROM documents)
  GROUP BY doc_id, w
),
v0 AS (
  SELECT w, SUM(c) AS wcount, regexp_extract_all(w, '.') AS syms
  FROM dw GROUP BY w
),
pe1 AS ({pairs('v0')}),
wine1 AS (SELECT s1, s2 FROM pe1 ORDER BY cnt DESC, s1, s2 LIMIT 1),
{fold('v0', 'wine1', 'v1')},
pe2 AS ({pairs('v1')}),
wine2 AS (SELECT s1, s2 FROM pe2 ORDER BY cnt DESC, s1, s2 LIMIT 1),
{fold('v1', 'wine2', 'v2')},
pe3 AS ({pairs('v2')}),
wine3 AS (SELECT s1, s2 FROM pe3 ORDER BY cnt DESC, s1, s2 LIMIT 1),
{fold('v2', 'wine3', 'v3')},
enc AS (SELECT w, len(syms) AS n_toks FROM v3)"""


BPE_ENCODE_ORACLE = f"""
WITH RECURSIVE
{_bpe_enc_ctes()}
SELECT dw.doc_id,
  CAST(SUM(c) AS BIGINT) AS n_words,
  CAST(SUM(c * length(w)) AS BIGINT) AS n_chars,
  CAST(SUM(c * n_toks) AS BIGINT) AS n_bpe_tokens,
  ROUND(SUM(c * length(w)) * 1.0 / SUM(c * n_toks), 6) AS chars_per_token
FROM dw JOIN enc USING (w)
GROUP BY dw.doc_id
"""


def _bpe_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train ``BPE_MERGES`` merges on the corpus and encode every
    document with them: (doc_id, n_words, n_chars, n_bpe_tokens).
    Shared by ``bpe_encode_corpus`` and the BPE-token packing variant in
    ``training_prep``.

    The encode path never touches the corpus rows per merge: merges are
    learned AND applied on the DISTINCT word vocabulary (the
    ``bpe_train_merges`` iteration shape — persist / eager count /
    unpersist churn per step, winners as eager 1-row localCheckpoints),
    and the per-doc totals come from ONE equi-join of the per-doc word
    counts against the |vocab|-sized encode table. Training uses the
    full vocabulary including 1-char words — identical merges (1-symbol
    words have no adjacent pairs), and those words still need encoding."""
    docs = table(spark, sf_dir, "documents")
    docw = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("w"),
        )
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab0 = (
        docw.groupBy("w")
        .agg(F.sum("c").alias("wcount"))
        .select(
            "w", "wcount", F.expr("regexp_extract_all(w, '.', 0)").alias("syms")
        )
    )
    winners = []
    w, prev = vocab0, None
    for _step in range(BPE_MERGES):
        w = w.persist()
        w.count()
        if prev is not None:
            prev.unpersist()
        win = _bpe_top_pair(w).localCheckpoint(eager=True)
        winners.append(win)
        prev = w
        w = _bpe_apply_merge(w, win, keep=("w", "wcount"))
    prev.unpersist()  # final fold re-derives lazily from vocab0 lineage
    # re-apply the (now literal, checkpointed) winners lazily so the
    # returned plan depends on NO persisted frame — one vocab rebuild +
    # three in-row folds at evaluation time, nothing cached behind
    enc = vocab0
    for win in winners:
        enc = _bpe_apply_merge(enc, win, keep=("w", "wcount"))
    enc = enc.select("w", F.size("syms").alias("n_toks"))
    return docw.join(enc, "w").groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.sum(F.col("c") * F.length("w")).cast("long").alias("n_chars"),
        F.sum(F.col("c") * F.col("n_toks")).cast("long").alias("n_bpe_tokens"),
    )


@query("bpe_encode_corpus", oracle=BPE_ENCODE_ORACLE)
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus WITH the trained BPE vocabulary — the apply
    half of the tokenizer pipeline (``bpe_train_merges`` is the train
    half): learn ``BPE_MERGES`` merges, greedily apply them to every
    word, and emit per-document token accounting (word count, char
    count, BPE token count, chars-per-token compression) — the numbers
    a training-data pipeline bills against its real vocabulary instead
    of whitespace proxies.

    Scale design — why this encodes 100 TB without touching corpus rows
    per merge:

    - **Encode the vocabulary, not the corpus**: merges are learned and
      applied on the DISTINCT word table (|vocab| ~ millions, vs
      trillions of corpus positions); documents get their token counts
      through ONE equi-join of per-doc word counts against the encoded
      vocab — the aggregate-join shape, not a per-doc re-tokenize.
    - **Same alphabet-bounded exchanges as training**: each merge step's
      pair count partial-aggregates into the symbol-pair keyspace; the
      greedy application is an in-row array fold.
    - **Winners are literals at evaluation time** (eager 1-row
      localCheckpoints), so the returned plan is vocab scan -> 3 folds
      -> join -> aggregate with no persisted state left behind.

    Determinism: all counts are exact integers; ``chars_per_token`` is
    ONE IEEE division rounded to 6. The DuckDB oracle replays training
    (recursive-CTE folds) and encoding over the identical vocabulary,
    so the gate hash-checks every per-document count."""
    t = _bpe_doc_tokens(spark, sf_dir)
    return t.select(
        "doc_id",
        "n_words",
        "n_chars",
        "n_bpe_tokens",
        F.round(
            F.col("n_chars") * 1.0 / F.col("n_bpe_tokens"), 6
        ).alias("chars_per_token"),
    )


# --------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, appendix A1.1): the classic
# rule-based document gate, every statistic rational-exact
# --------------------------------------------------------------------------

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WLEN = 3.0
GOPHER_MAX_MEAN_WLEN = 10.0
GOPHER_MIN_ALPHA_RATIO = 0.8
GOPHER_MIN_STOP_DISTINCT = 2

GOPHER_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
),
s AS (
  SELECT doc_id,
    CAST(len(toks) AS BIGINT) AS n_words,
    ROUND(list_sum(list_transform(toks, x -> length(x))) * 1.0
          / NULLIF(len(toks), 0), 6) AS mean_word_len,
    ROUND(len(list_filter(toks, x -> regexp_matches(x, '^[a-z]+$'))) * 1.0
          / NULLIF(len(toks), 0), 6) AS alpha_word_ratio,
    CAST(len(list_distinct(list_filter(toks,
         x -> x IN ({STOPWORDS})))) AS BIGINT) AS n_stop_distinct
  FROM t
)
SELECT doc_id, n_words, mean_word_len, alpha_word_ratio, n_stop_distinct,
  n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
    AS rule_word_count,
  COALESCE(mean_word_len >= {GOPHER_MIN_MEAN_WLEN}
           AND mean_word_len <= {GOPHER_MAX_MEAN_WLEN}, FALSE)
    AS rule_mean_word_len,
  COALESCE(alpha_word_ratio >= {GOPHER_MIN_ALPHA_RATIO}, FALSE)
    AS rule_alpha_words,
  n_stop_distinct >= {GOPHER_MIN_STOP_DISTINCT} AS rule_stopwords,
  (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS})
  AND COALESCE(mean_word_len >= {GOPHER_MIN_MEAN_WLEN}
               AND mean_word_len <= {GOPHER_MAX_MEAN_WLEN}, FALSE)
  AND COALESCE(alpha_word_ratio >= {GOPHER_MIN_ALPHA_RATIO}, FALSE)
  AND n_stop_distinct >= {GOPHER_MIN_STOP_DISTINCT} AS passes_all
FROM s
"""


@query("gopher_quality_rules", oracle=GOPHER_ORACLE)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher rule-based quality gate (Rae et al. 2021, A1.1),
    adapted to the corpus's whitespace tokenization: word-count bounds,
    mean-word-length band, minimum fraction of purely-alphabetic words,
    and a minimum number of DISTINCT stopwords present (the
     'natural-language evidence' rule). Emits each statistic, each
    rule's verdict, and the conjunction — the audit table a curation
    pipeline thresholds and debugs against, complementing the scored
    (not ruled) ``text_quality_scores``.

    Determinism: every statistic is a rational of exact integer counts
    with ONE IEEE division rounded to 6 before any compare; rule
    verdicts compare the rounded values, so both engines gate
    identically (empty docs: NULL-ratio rules coalesce to FALSE).

    Scale: one corpus scan, everything in-row (token filter, length
    fold, distinct-stopword count over a <= 8-element intersection) —
    zero shuffles, zero joins; the operator is a single codegen'd
    projection like ``token_diversity_scores``."""
    docs = table(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        F.expr(
            "filter(split(lower(text), '\\\\s+'), x -> x <> '')"
        ).alias("toks"),
    ).select(
        "doc_id",
        F.size("toks").cast("long").alias("n_words"),
        F.round(
            F.expr(
                "aggregate(toks, CAST(0 AS BIGINT), (acc, x) -> acc + length(x))"
            )
            * 1.0
            / F.nullif(F.size("toks"), F.lit(0)),
            6,
        ).alias("mean_word_len"),
        F.round(
            F.size(F.expr("filter(toks, x -> x rlike '^[a-z]+$')"))
            * 1.0
            / F.nullif(F.size("toks"), F.lit(0)),
            6,
        ).alias("alpha_word_ratio"),
        F.size(
            F.array_distinct(
                F.expr(f"filter(toks, x -> x IN ({STOPWORDS}))")
            )
        )
        .cast("long")
        .alias("n_stop_distinct"),
    )
    r_wc = (F.col("n_words") >= GOPHER_MIN_WORDS) & (
        F.col("n_words") <= GOPHER_MAX_WORDS
    )
    r_mwl = F.coalesce(
        (F.col("mean_word_len") >= GOPHER_MIN_MEAN_WLEN)
        & (F.col("mean_word_len") <= GOPHER_MAX_MEAN_WLEN),
        F.lit(False),
    )
    r_alpha = F.coalesce(
        F.col("alpha_word_ratio") >= GOPHER_MIN_ALPHA_RATIO, F.lit(False)
    )
    r_stop = F.col("n_stop_distinct") >= GOPHER_MIN_STOP_DISTINCT
    return s.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "alpha_word_ratio",
        "n_stop_distinct",
        r_wc.alias("rule_word_count"),
        r_mwl.alias("rule_mean_word_len"),
        r_alpha.alias("rule_alpha_words"),
        r_stop.alias("rule_stopwords"),
        (r_wc & r_mwl & r_alpha & r_stop).alias("passes_all"),
    )
