"""word_count plugin semantics on DataFrames (SURVEY.md §2.3 Q1-Q6, Q13).

Reference: example_plugins/word_count/word_count.go — lowercase (go:13),
whitespace tokenize (go:13), regex strip to alnum (go:16), emit (token, "1")
(go:19-22), per-key sum in the reducer (go:26-41), formatted projection
'%-12s :: %4d' (go:44). Here the whole job is one declarative pipeline:
scan → codegen'd string expressions → explode → hash-aggregate with
map-side partial aggregation (what the reference's mapper-sort + k-way
merge + reducer hash map approximates by hand).

Scale note: groupBy on `word` is the only shuffle; partial aggregation
collapses the Zipf head before exchange, so skewed words (the reference's
known first-char hot-spot, SURVEY.md §7.5) do not hot-spot a reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import exploded_words, words_sql
from ..registry import query
from ..tables import table

WORDCOUNT_ORACLE = f"""
SELECT word, COUNT(*) AS cnt
FROM ({words_sql()})
GROUP BY word
"""


@query("wordcount", oracle=WORDCOUNT_ORACLE)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return exploded_words(docs, "text").groupBy("word").agg(
        F.count(F.lit(1)).alias("cnt")
    )


WORDCOUNT_FMT_ORACLE = f"""
SELECT printf('%-12s :: %4d', word, COUNT(*)) AS line
FROM ({words_sql()})
GROUP BY word
"""


@query("wordcount_fmt", oracle=WORDCOUNT_FMT_ORACLE)
def wordcount_fmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-exact formatted projection of word_count.go:44."""
    docs = table(spark, sf_dir, "documents")
    return (
        exploded_words(docs, "text")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.format_string("%-12s :: %4d", F.col("word"), F.col("cnt")).alias("line"))
    )


WORDCOUNT_TOPK_ORACLE = f"""
SELECT word, COUNT(*) AS cnt
FROM ({words_sql()})
GROUP BY word
ORDER BY cnt DESC, word
LIMIT 20
"""


@query("wordcount_topk", oracle=WORDCOUNT_TOPK_ORACLE)
def wordcount_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: aggregate then TakeOrderedAndProject (no full sort)."""
    docs = table(spark, sf_dir, "documents")
    return (
        exploded_words(docs, "text")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(20)
    )


DISTINCT_ORACLE = f"""
SELECT COUNT(DISTINCT word) AS distinct_words FROM ({words_sql()})
"""


@query("wordcount_distinct", oracle=DISTINCT_ORACLE)
def wordcount_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-key count (log_analyzer.go:81-82 pattern, on words):
    two-stage partial-distinct aggregation, no full shuffle of raw rows."""
    docs = table(spark, sf_dir, "documents")
    return exploded_words(docs, "text").agg(
        F.countDistinct("word").alias("distinct_words")
    )
