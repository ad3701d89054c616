"""MR-parity queries: the reference's two example jobs run through the
MapReduceJob layer (not the idiomatic DataFrame pipelines — those live in
operators/wordcount.py and operators/log_analysis.py; an internal
differential test in tests/test_mapreduce.py ties the two together).

mr_wordcount keeps the reference's artifacts on purpose: tokens that strip
to '' are counted (word_count.go:19-22 has no filter), and r_id exposes the
first-char-mod-26 parity partitioner (sn/mr_actions.go:226-229).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.url import crawler_logs
from ..mapreduce import MapReduceJob
from ..mapreduce.plugins import (
    LOG_ANALYZER_R,
    WORD_COUNT_R,
    log_analyzer_map,
    log_analyzer_reduce,
    word_count_map,
    word_count_reduce,
)
from ..registry import query
from ..tables import table


def _documents_as_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents rows as the reference's (file, line_number, line) input
    shape — each document is one text line of its own 'file'."""
    return table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("file"),
        F.lit(0).cast("long").alias("line_number"),
        F.col("text").alias("line"),
    )


MR_WORDCOUNT_ORACLE = """
WITH words AS (
  SELECT regexp_replace(t.tok, '[^a-zA-Z0-9]+', '', 'g') AS word
  FROM documents, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t(tok)
  WHERE length(trim(text)) > 0
)
SELECT
  CAST(CASE WHEN word = '' THEN 0 ELSE ascii(substr(word, 1, 1)) % 26 END AS INTEGER) AS r_id,
  printf('%-12s :: %4d', word, COUNT(*)) AS line
FROM words
GROUP BY word
"""


@query("mr_wordcount", oracle=MR_WORDCOUNT_ORACLE)
def mr_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word_count.go through the parity engine. The oracle can state global
    per-word counts because the parity partitioner never splits one word
    across reducers — per-partition sums == global sums (R=26,
    word_count.go:10)."""
    job = MapReduceJob(
        "mr_wordcount", word_count_map, word_count_reduce, r=WORD_COUNT_R
    )
    return job.run(_documents_as_lines(spark, sf_dir)).select("r_id", "line")


@query("mr_log_analyzer")  # no oracle: per-partition top-k summaries are
# not meaningfully ANSI-SQL-expressible (SURVEY.md §7.5 #1); covered by the
# pure-Python differential simulation in tests/test_mapreduce.py instead.
def mr_log_analyzer(spark: SparkSession, sf_dir: str) -> DataFrame:
    logs = crawler_logs(spark, table(spark, sf_dir, "events"))
    lines = logs.select(
        F.lit("crawler_logs").alias("file"),
        F.col("event_id").cast("long").alias("line_number"),
        F.concat_ws(" ", "ts_date", "ts_time", "crawler", "url").alias("line"),
    )
    job = MapReduceJob(
        "mr_log_analyzer", log_analyzer_map, log_analyzer_reduce, r=LOG_ANALYZER_R
    )
    return job.run(lines)
