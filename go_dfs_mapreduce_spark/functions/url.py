"""URL normalization matching log_analyzer's rules (SURVEY.md §2.3 Q8).

Reference (example_plugins/log_analyzer/log_analyzer.go:20-47):
  1. strip a leading ``http://`` / ``https://`` scheme,
  2. split host vs path at the first ``/``,
  3. truncate the path at the first ``#`` or ``?``,
  4. if the host has >1 dot and a non-numeric first label, drop one
     subdomain level (the first label),
  5. if the first label is numeric (an IP), strip a trailing ``:port``.

Implemented twice with *identical* semantics: as Spark Column expressions
(pure built-ins → codegen) and as a DuckDB SQL fragment for the oracles.

Because the driver's synthetic tables carry no URL column, the log-analyzer
query family synthesizes a deterministic crawler-log view from `events`
(same construction on both engines) — FIXTURES.md §2 shape: crawler id +
URL with scheme/subdomain/IP:port/query/fragment variety.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def normalize_cols(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add `domain` and `norm_url` columns to df (pure built-ins)."""
    u = F.regexp_replace(F.col(url_col), r"^https?://", "")
    host = F.substring_index(u, "/", 1)
    rest = F.when(F.instr(u, "/") > 0, F.substring(u, F.length(host) + 1, F.lit(2**30))).otherwise(F.lit(""))
    path = F.regexp_replace(rest, r"[#?].*$", "")
    first_label = F.substring_index(host, ".", 1)
    ndots = F.length(host) - F.length(F.replace(host, F.lit("."), F.lit("")))
    numeric_first = first_label.rlike(r"^[0-9]+$")
    stripped = F.when(
        (ndots > 1) & (~numeric_first),
        F.substring(host, F.length(first_label) + 2, F.lit(2**30)),
    ).otherwise(host)
    domain = F.when(numeric_first, F.regexp_replace(stripped, r":[0-9]+$", "")).otherwise(stripped)
    return df.withColumn("domain", domain).withColumn(
        "norm_url", F.concat(domain, path)
    )


# --- DuckDB twin ----------------------------------------------------------

def normalize_sql(from_clause: str, url_col: str = "url") -> str:
    """DuckDB fragment: SELECT *, domain, norm_url FROM ({from_clause}).

    Mirrors normalize_cols exactly. Uses chained CTEs for readability.
    """
    return f"""
  WITH _raw AS ({from_clause}),
  _u AS (
    SELECT *, regexp_replace({url_col}, '^https?://', '') AS _u FROM _raw
  ),
  _hp AS (
    SELECT *,
      split_part(_u, '/', 1) AS _host,
      CASE WHEN strpos(_u, '/') > 0
           THEN regexp_replace(substr(_u, length(split_part(_u, '/', 1)) + 1), '[#?].*$', '')
           ELSE '' END AS _path
    FROM _u
  ),
  _lbl AS (
    SELECT *,
      split_part(_host, '.', 1) AS _first,
      (length(_host) - length(replace(_host, '.', ''))) AS _ndots,
      regexp_matches(split_part(_host, '.', 1), '^[0-9]+$') AS _numeric
    FROM _hp
  ),
  _dom AS (
    SELECT *,
      CASE WHEN _numeric
           THEN regexp_replace(
                  CASE WHEN _ndots > 1 AND NOT _numeric
                       THEN substr(_host, length(_first) + 2) ELSE _host END,
                  ':[0-9]+$', '')
           ELSE CASE WHEN _ndots > 1 AND NOT _numeric
                     THEN substr(_host, length(_first) + 2) ELSE _host END
      END AS domain
    FROM _lbl
  )
  SELECT * EXCLUDE (_u, _host, _path, _first, _ndots, _numeric),
         domain, domain || _path AS norm_url
  FROM _dom
"""


# --- synthetic crawler-log view (shared by the log_analysis queries) ------

def crawler_logs(spark: SparkSession, events: DataFrame) -> DataFrame:
    """Deterministic crawler-log rows from `events` (both engines build the
    identical view; FIXTURES.md §2 shape)."""
    e = events
    host = (
        F.when(F.col("event_id") % 4 == 0, F.concat(F.lit("www.site"), (F.col("user_id") % 20).cast("string"), F.lit(".com")))
        .when(F.col("event_id") % 4 == 1, F.concat(F.lit("site"), (F.col("user_id") % 20).cast("string"), F.lit(".com")))
        .when(F.col("event_id") % 4 == 2, F.concat(F.lit("10.0."), (F.col("user_id") % 20).cast("string"), F.lit("."), (F.col("event_id") % 250).cast("string"), F.lit(":8080")))
        .otherwise(F.concat(F.lit("sub.blog.site"), (F.col("user_id") % 20).cast("string"), F.lit(".org")))
    )
    scheme = (
        F.when(F.col("event_id") % 3 == 0, F.lit("http://"))
        .when(F.col("event_id") % 3 == 1, F.lit("https://"))
        .otherwise(F.lit(""))
    )
    path = (
        F.when(F.col("event_id") % 5 == 0, F.lit(""))
        .when(F.col("event_id") % 5 == 1, F.lit("/index.html"))
        .when(F.col("event_id") % 5 == 2, F.concat(F.lit("/a/b?q="), (F.col("event_id") % 7).cast("string")))
        .when(F.col("event_id") % 5 == 3, F.lit("/p#frag"))
        .otherwise(F.lit("/x/y/z"))
    )
    return e.select(
        F.col("event_id"),
        F.date_format("ts", "yyyy-MM-dd").alias("ts_date"),
        F.date_format("ts", "HH:mm:ss").alias("ts_time"),
        F.col("event_type").alias("crawler"),
        F.concat(scheme, host, path).alias("url"),
    )


CRAWLER_LOGS_SQL = """
  SELECT
    event_id,
    strftime(ts, '%Y-%m-%d') AS ts_date,
    strftime(ts, '%H:%M:%S') AS ts_time,
    event_type AS crawler,
    (CASE WHEN event_id % 3 = 0 THEN 'http://'
          WHEN event_id % 3 = 1 THEN 'https://'
          ELSE '' END)
    || (CASE WHEN event_id % 4 = 0 THEN 'www.site' || CAST(user_id % 20 AS VARCHAR) || '.com'
             WHEN event_id % 4 = 1 THEN 'site' || CAST(user_id % 20 AS VARCHAR) || '.com'
             WHEN event_id % 4 = 2 THEN '10.0.' || CAST(user_id % 20 AS VARCHAR) || '.' || CAST(event_id % 250 AS VARCHAR) || ':8080'
             ELSE 'sub.blog.site' || CAST(user_id % 20 AS VARCHAR) || '.org' END)
    || (CASE WHEN event_id % 5 = 0 THEN ''
             WHEN event_id % 5 = 1 THEN '/index.html'
             WHEN event_id % 5 = 2 THEN '/a/b?q=' || CAST(event_id % 7 AS VARCHAR)
             WHEN event_id % 5 = 3 THEN '/p#frag'
             ELSE '/x/y/z' END) AS url
  FROM events
"""
