"""log_analyzer plugin semantics on DataFrames (SURVEY.md §2.3 Q7-Q12).

Reference: example_plugins/log_analyzer/log_analyzer.go — positional field
extraction with a <4-token guard (go:11-18), URL normalization (go:20-47),
one-pass multi-dimension tally (go:58-79), distinct counts (go:81-82),
top-10 domains / top-5 crawlers (go:84-122).

The driver tables carry no crawler log, so every query here runs over a
deterministic synthetic view built identically on Spark and DuckDB
(functions/url.py: crawler_logs / CRAWLER_LOGS_SQL, FIXTURES.md §2 shape).

Scale notes: normalization is pure string expressions (codegen, no UDF);
top-k is aggregate → TakeOrderedAndProject; the one-pass tally uses
GROUPING SETS so a single shuffle feeds both dimensions — the declarative
version of the reference's one-scan-three-hashmaps loop (go:58-79).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.url import CRAWLER_LOGS_SQL, crawler_logs, normalize_cols, normalize_sql
from ..registry import query
from ..tables import table


def _logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return crawler_logs(spark, table(spark, sf_dir, "events"))


def _norm_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return normalize_cols(_logs(spark, sf_dir))


_NORM_FROM = normalize_sql(CRAWLER_LOGS_SQL)


# --- Q7: positional field extraction with token-count guard ---------------

PARSE_ORACLE = f"""
SELECT
  toks[3] AS crawler,
  toks[4] AS url
FROM (
  SELECT string_split(ts_date || ' ' || ts_time || ' ' || crawler || ' ' || url, ' ') AS toks
  FROM ({CRAWLER_LOGS_SQL})
)
WHERE len(toks) >= 4
"""


@query("log_parse_fields", oracle=PARSE_ORACLE)
def log_parse_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebuild the raw log line, then extract tokens[2]/tokens[3] exactly as
    log_analyzer.go:11-18 (0-indexed there, 1-indexed in DuckDB)."""
    raw = _logs(spark, sf_dir).select(
        F.concat_ws(" ", "ts_date", "ts_time", "crawler", "url").alias("line")
    )
    toks = F.split(F.col("line"), " ")
    return (
        raw.select(toks.alias("toks"))
        .where(F.size("toks") >= 4)
        .select(F.col("toks")[2].alias("crawler"), F.col("toks")[3].alias("url"))
    )


# --- Q8: URL normalization -------------------------------------------------

NORM_ORACLE = f"""
SELECT event_id, crawler, domain, norm_url
FROM ({_NORM_FROM})
"""


@query("log_normalize_urls", oracle=NORM_ORACLE)
def log_normalize_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _norm_logs(spark, sf_dir).select("event_id", "crawler", "domain", "norm_url")


# --- Q11: distinct URL / domain counts ------------------------------------

DISTINCT_ORACLE = f"""
SELECT
  COUNT(DISTINCT norm_url) AS unique_urls,
  COUNT(DISTINCT domain) AS unique_domains
FROM ({_NORM_FROM})
"""


@query("log_distinct_counts", oracle=DISTINCT_ORACLE)
def log_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _norm_logs(spark, sf_dir).agg(
        F.countDistinct("norm_url").alias("unique_urls"),
        F.countDistinct("domain").alias("unique_domains"),
    )


# --- Q12: top-k ------------------------------------------------------------

TOP_DOMAINS_ORACLE = f"""
SELECT domain, COUNT(*) AS cnt
FROM ({_NORM_FROM})
GROUP BY domain
ORDER BY cnt DESC, domain
LIMIT 10
"""


@query("log_top_domains", oracle=TOP_DOMAINS_ORACLE)
def log_top_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _norm_logs(spark, sf_dir)
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("domain"))
        .limit(10)
    )


TOP_CRAWLERS_ORACLE = f"""
SELECT crawler, COUNT(*) AS cnt
FROM ({CRAWLER_LOGS_SQL})
GROUP BY crawler
ORDER BY cnt DESC, crawler
LIMIT 5
"""


@query("log_top_crawlers", oracle=TOP_CRAWLERS_ORACLE)
def log_top_crawlers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _logs(spark, sf_dir)
        .groupBy("crawler")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("crawler"))
        .limit(5)
    )


# --- Q10: one-pass multi-dimension tally (GROUPING SETS) ------------------

TALLY_ORACLE = f"""
SELECT
  CASE WHEN GROUPING(crawler) = 0 THEN 'crawler' ELSE 'domain' END AS dim,
  COALESCE(crawler, domain) AS key,
  COUNT(*) AS cnt
FROM ({_NORM_FROM})
GROUP BY GROUPING SETS ((crawler), (domain))
"""


@query("log_crawler_domain_tally", oracle=TALLY_ORACLE)
def log_crawler_domain_tally(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _norm_logs(spark, sf_dir)
    df.createOrReplaceTempView("_norm_logs_tally")
    return spark.sql(
        """
        SELECT
          CASE WHEN GROUPING(crawler) = 0 THEN 'crawler' ELSE 'domain' END AS dim,
          COALESCE(crawler, domain) AS key,
          COUNT(*) AS cnt
        FROM _norm_logs_tally
        GROUP BY GROUPING SETS ((crawler), (domain))
        """
    )
