"""Corpus scrubbing / extraction operators for LLM-data pipelines:
PII detection + redaction, URL/domain extraction, character-class
profiling, and robust length-outlier detection.

The synthetic documents are clean word soup, so the PII/URL operators
INJECT deterministic synthetic artifacts first (same expression in the
Spark pipeline and the DuckDB oracle — a pure function of doc_id), then
run the real detection/redaction logic. The detectors are what a
production pipeline runs; the injection is only the fixture. Everything
is JVM-side regex (codegen), no Python stages — at 100 TB these are
embarrassingly parallel scans whose cost is the regex engine, which is
exactly where Spark's whole-stage codegen wants it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table

# --- deterministic synthetic-PII fixture (Spark + DuckDB twins) -----------

_INJECT_SPARK = """
concat(
  text,
  CASE WHEN doc_id % 7 = 0
       THEN concat(' contact user', CAST(doc_id AS STRING), '@example.com for details')
       ELSE '' END,
  CASE WHEN doc_id % 11 = 0
       THEN concat(' call 555-0', CAST(doc_id % 100 AS STRING), ' soon')
       ELSE '' END,
  CASE WHEN doc_id % 5 = 0
       THEN concat(' visit https://site', CAST(doc_id % 13 AS STRING),
                   '.example.org/p/', CAST(doc_id AS STRING), ' today')
       ELSE '' END,
  CASE WHEN doc_id % 13 = 0
       THEN concat(' host 10.0.', CAST(doc_id % 256 AS STRING), '.',
                   CAST((doc_id * 7) % 256 AS STRING), ' up')
       ELSE '' END
)
"""

_INJECT_DUCK = """
text
|| CASE WHEN doc_id % 7 = 0
        THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com for details'
        ELSE '' END
|| CASE WHEN doc_id % 11 = 0
        THEN ' call 555-0' || CAST(doc_id % 100 AS VARCHAR) || ' soon'
        ELSE '' END
|| CASE WHEN doc_id % 5 = 0
        THEN ' visit https://site' || CAST(doc_id % 13 AS VARCHAR)
             || '.example.org/p/' || CAST(doc_id AS VARCHAR) || ' today'
        ELSE '' END
|| CASE WHEN doc_id % 13 = 0
        THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
             || CAST((doc_id * 7) % 256 AS VARCHAR) || ' up'
        ELSE '' END
"""

# Detector patterns — written with [.] instead of \\. so the same literal
# parses identically in Java regex (Spark codegen) and RE2 (DuckDB).
_EMAIL = "[a-z0-9]+@[a-z0-9]+[.][a-z0-9.]*[a-z]"
_PHONE = "555-[0-9]+"
_IPV4 = "[0-9]+[.][0-9]+[.][0-9]+[.][0-9]+"

PII_ORACLE = f"""
WITH injected AS (SELECT doc_id, {_INJECT_DUCK} AS t FROM documents),
redacted AS (
  SELECT doc_id, t,
    regexp_replace(
      regexp_replace(
        regexp_replace(t, '{_EMAIL}', '<EMAIL>', 'g'),
        '{_IPV4}', '<IP>', 'g'),
      '{_PHONE}', '<PHONE>', 'g') AS clean
  FROM injected
)
SELECT doc_id,
  CAST(len(regexp_extract_all(t, '{_EMAIL}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(t, '{_PHONE}')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(t, '{_IPV4}')) AS BIGINT) AS n_ips,
  CAST(length(clean) AS BIGINT) AS clean_len,
  md5(clean) AS clean_md5
FROM redacted
"""


@query("pii_scrub_redact", oracle=PII_ORACLE)
def pii_scrub_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect and redact emails / phone numbers / IPv4s: per-doc counts
    plus the md5 of the redacted text, so the gate pins the exact
    redaction output, not just the counts. Redaction order
    email -> ip -> phone is fixed (and the patterns are disjoint on the
    fixture, so order is presentation, not semantics)."""
    docs = table(spark, sf_dir, "documents")
    t = F.expr(_INJECT_SPARK)
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, _EMAIL, "<EMAIL>"), _IPV4, "<IP>"
        ),
        _PHONE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all({_INJECT_SPARK}, '{_EMAIL}', 0)"))
        .cast("long")
        .alias("n_emails"),
        F.size(F.expr(f"regexp_extract_all({_INJECT_SPARK}, '{_PHONE}', 0)"))
        .cast("long")
        .alias("n_phones"),
        F.size(F.expr(f"regexp_extract_all({_INJECT_SPARK}, '{_IPV4}', 0)"))
        .cast("long")
        .alias("n_ips"),
        F.length(clean).cast("long").alias("clean_len"),
        F.md5(clean.cast("binary")).alias("clean_md5"),
    )


URL_TOPK_ORACLE = f"""
WITH injected AS (SELECT doc_id, {_INJECT_DUCK} AS t FROM documents),
urls AS (
  SELECT u.url AS url FROM injected,
    unnest(regexp_extract_all(t, 'https?://[a-z0-9.]+[a-z0-9]')) u(url)
)
SELECT regexp_extract(url, '//([a-z0-9.]+)', 1) AS domain,
       COUNT(*) AS n_urls
FROM urls
GROUP BY 1
ORDER BY n_urls DESC, domain
LIMIT 10
"""


@query("url_extraction_topk", oracle=URL_TOPK_ORACLE)
def url_extraction_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract http(s) URLs, reduce to domains, top-10 by frequency with
    a deterministic name tiebreak — the crawl-frequency profile step of a
    web-corpus pipeline (TakeOrderedAndProject, no global sort)."""
    docs = table(spark, sf_dir, "documents")
    urls = docs.select(
        F.explode(
            F.expr(
                f"regexp_extract_all({_INJECT_SPARK},"
                " 'https?://[a-z0-9.]+[a-z0-9]', 0)"
            )
        ).alias("url")
    )
    return (
        urls.select(
            F.regexp_extract("url", "//([a-z0-9.]+)", 1).alias("domain")
        )
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_urls"))
        .orderBy(F.col("n_urls").desc(), "domain")
        .limit(10)
    )


CHAR_PROFILE_ORACLE = """
SELECT source,
  CAST(SUM(length(text)) AS BIGINT) AS n_chars_total,
  CAST(ROUND(SUM(length(regexp_replace(text, '[^a-z]', '', 'g'))) * 1.0
             / SUM(length(text)), 6) AS DOUBLE) AS alpha_ratio,
  CAST(ROUND(SUM(length(regexp_replace(text, '[^0-9]', '', 'g'))) * 1.0
             / SUM(length(text)), 6) AS DOUBLE) AS digit_ratio,
  CAST(ROUND(SUM(length(text) - length(replace(text, ' ', ''))) * 1.0
             / SUM(length(text)), 6) AS DOUBLE) AS space_ratio
FROM documents
GROUP BY source
"""


@query("char_class_profile", oracle=CHAR_PROFILE_ORACLE)
def char_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source character-class composition (alpha/digit/space ratios)
    — the cheap corpus-hygiene signal that catches binary spills, wrong
    decodings, and boilerplate floods before tokenization. Integer sums
    ratioed at the end, so the result is partition-order independent."""
    docs = table(spark, sf_dir, "documents")
    n = F.sum(F.length("text"))
    alpha = F.sum(F.length(F.regexp_replace("text", "[^a-z]", "")))
    digit = F.sum(F.length(F.regexp_replace("text", "[^0-9]", "")))
    space = F.sum(
        F.length("text") - F.length(F.regexp_replace("text", " ", ""))
    )
    r = lambda c: F.round(c * F.lit(1.0) / n, 6).cast("double")  # noqa: E731
    return docs.groupBy("source").agg(
        n.alias("n_chars_total"),
        r(alpha).alias("alpha_ratio"),
        r(digit).alias("digit_ratio"),
        r(space).alias("space_ratio"),
    )


LENGTH_OUTLIER_ORACLE = """
WITH bounds AS (
  SELECT source,
    quantile_cont(n_chars, 0.25) AS p25,
    quantile_cont(n_chars, 0.75) AS p75
  FROM documents GROUP BY source
)
SELECT d.doc_id, d.source, d.n_chars,
  CASE WHEN d.n_chars > b.p75 + 1.5 * (b.p75 - b.p25) THEN 'long'
       ELSE 'short' END AS outlier_kind
FROM documents d JOIN bounds b USING (source)
WHERE d.n_chars > b.p75 + 1.5 * (b.p75 - b.p25)
   OR d.n_chars < b.p25 - 1.5 * (b.p75 - b.p25)
"""


@query("length_outlier_docs", oracle=LENGTH_OUTLIER_ORACLE)
def length_outlier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence length outliers per source (beyond 1.5 IQR): the
    truncation/concatenation-artifact filter. Exact interpolated
    percentiles — Spark's percentile() and DuckDB's quantile_cont share
    the linear-interpolation definition on integers, so the fences are
    bit-identical doubles in both engines. One small aggregate (20
    sources) broadcast back onto the scan: no window over the corpus."""
    docs = table(spark, sf_dir, "documents")
    bounds = docs.groupBy("source").agg(
        F.expr("percentile(n_chars, 0.25)").alias("p25"),
        F.expr("percentile(n_chars, 0.75)").alias("p75"),
    )
    fence_hi = F.col("p75") + 1.5 * (F.col("p75") - F.col("p25"))
    fence_lo = F.col("p25") - 1.5 * (F.col("p75") - F.col("p25"))
    return (
        docs.join(F.broadcast(bounds), "source")
        .where((F.col("n_chars") > fence_hi) | (F.col("n_chars") < fence_lo))
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.when(F.col("n_chars") > fence_hi, F.lit("long"))
            .otherwise(F.lit("short"))
            .alias("outlier_kind"),
        )
    )


# --------------------------------------------------------------------------
# k-anonymity release audit
# --------------------------------------------------------------------------

K_ANON_MIN = 10  # groups smaller than this are re-identification risks

K_ANON_ORACLE = f"""
WITH sizes AS (
  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         CAST(FLOOR(value / 50) AS BIGINT) AS value_band,
         COUNT(*) AS k
  FROM events
  GROUP BY 1, 2, 3
)
SELECT k AS group_size,
       COUNT(*) AS n_groups,
       CAST(SUM(k) AS BIGINT) AS n_rows_at_risk
FROM sizes WHERE k < {K_ANON_MIN}
GROUP BY k
"""


@query("k_anonymity_audit", oracle=K_ANON_ORACLE)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-release governance gate: before events are shared as
    "anonymized", group by the quasi-identifier tuple a joiner could
    match on (event type, day, coarse value band) and report the
    re-identification risk histogram — for each group size below
    ``K_ANON_MIN``, how many groups and rows sit at that size. A
    release pipeline blocks (or generalizes the QI further) until this
    returns empty.

    Scale: one hash aggregate over the corpus to QI-group sizes, then a
    second aggregate over group-size cardinality (< K_ANON_MIN distinct
    values — bounded output by construction). No windows, no driver
    state; the QI aggregate is the same shuffle any release tabulation
    already pays."""
    ev = table(spark, sf_dir, "events")
    sizes = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.floor(F.col("value") / 50).cast("bigint").alias("value_band"),
    ).agg(F.count(F.lit(1)).alias("k"))
    return (
        sizes.where(F.col("k") < K_ANON_MIN)
        .groupBy(F.col("k").alias("group_size"))
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("k").cast("long").alias("n_rows_at_risk"),
        )
    )


# --------------------------------------------------------------------------
# URL canonicalization dedup: surface-form variants of the same resource
# --------------------------------------------------------------------------
#
# Web corpora cite the same resource under many surface forms — case
# variants, default ports, tracking parameters, fragments, trailing
# slashes. The fixture synthesizes one of four surface variants of a
# deterministic logical URL per document (pure function of doc_id, the
# scrubbing-module injection convention); the CANONICALIZER is the real
# logic: lowercase, strip fragment, strip utm_* tracking params, drop the
# https default port, drop the trailing slash. Same regex chain on both
# engines.

_RAW_URL_SPARK = """
CASE doc_id % 4
  WHEN 0 THEN concat('https://site', CAST(doc_id % 7 AS STRING),
              '.example.org/p/', CAST(doc_id % 25 AS STRING))
  WHEN 1 THEN concat('HTTPS://SITE', CAST(doc_id % 7 AS STRING),
              '.EXAMPLE.ORG:443/p/', CAST(doc_id % 25 AS STRING), '/')
  WHEN 2 THEN concat('https://site', CAST(doc_id % 7 AS STRING),
              '.example.org/p/', CAST(doc_id % 25 AS STRING),
              '?utm_source=feed&utm_campaign=x')
  ELSE concat('https://site', CAST(doc_id % 7 AS STRING),
              '.example.org/p/', CAST(doc_id % 25 AS STRING), '#section-2')
END
"""

_RAW_URL_DUCK = """
CASE doc_id % 4
  WHEN 0 THEN 'https://site' || CAST(doc_id % 7 AS VARCHAR)
              || '.example.org/p/' || CAST(doc_id % 25 AS VARCHAR)
  WHEN 1 THEN 'HTTPS://SITE' || CAST(doc_id % 7 AS VARCHAR)
              || '.EXAMPLE.ORG:443/p/' || CAST(doc_id % 25 AS VARCHAR) || '/'
  WHEN 2 THEN 'https://site' || CAST(doc_id % 7 AS VARCHAR)
              || '.example.org/p/' || CAST(doc_id % 25 AS VARCHAR)
              || '?utm_source=feed&utm_campaign=x'
  ELSE 'https://site' || CAST(doc_id % 7 AS VARCHAR)
       || '.example.org/p/' || CAST(doc_id % 25 AS VARCHAR) || '#section-2'
END
"""


def _canon_spark(url_expr: str) -> str:
    c = f"lower({url_expr})"
    c = f"regexp_replace({c}, '#.*$', '')"  # fragment
    c = f"regexp_replace({c}, '\\\\?utm_[^#]*$', '')"  # tracking params
    # https default port: anchored to the AUTHORITY so ':443/' inside a
    # path segment is never rewritten, and so both engines replace the
    # same single match (DuckDB without 'g' replaces only the first
    # occurrence; with the ^ anchor there IS at most one).
    c = f"regexp_replace({c}, '^(https://[^/]+):443/', '$1/')"
    return f"regexp_replace({c}, '/$', '')"  # trailing slash


def _canon_duck(url_expr: str) -> str:
    c = f"lower({url_expr})"
    c = f"regexp_replace({c}, '#.*$', '')"
    c = f"regexp_replace({c}, '\\?utm_[^#]*$', '')"
    c = f"regexp_replace({c}, '^(https://[^/]+):443/', '\\1/')"
    return f"regexp_replace({c}, '/$', '')"


URL_CANON_ORACLE = f"""
SELECT canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT raw_url) AS BIGINT) AS n_surface_forms
FROM (SELECT {_canon_duck(_RAW_URL_DUCK)} AS canonical_url,
             ({_RAW_URL_DUCK}) AS raw_url
      FROM documents)
GROUP BY canonical_url
"""


@query("url_canonical_dedup", oracle=URL_CANON_ORACLE)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup — the crawl-frontier / citation-dedup
    primitive: collapse surface-form variants (case, https default
    port, utm_* tracking parameters, fragments, trailing slashes) to
    one canonical URL and report how many documents and DISTINCT
    surface forms each canonical resource carried. In a crawl pipeline
    this table drives refetch suppression and citation counting;
    feeding ``n_surface_forms > 1`` groups into the text-dedup family
    catches mirrored content the URL alone proves duplicated.

    Plan: the canonicalizer is a fixed regex chain in whole-stage
    codegen (one scan, embarrassingly parallel); the aggregate is one
    exchange keyed by canonical URL with map-side combine, and the
    distinct-surface-form count partial-aggregates the same way. All
    counts exact integers."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.expr(_canon_spark(_RAW_URL_SPARK)).alias("canonical_url"),
            F.expr(_RAW_URL_SPARK).alias("raw_url"),
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("raw_url").cast("long").alias("n_surface_forms"),
        )
    )
