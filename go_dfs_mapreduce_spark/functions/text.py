"""Tokenization expressions matching the reference's word_count plugin.

Reference semantics (example_plugins/word_count/word_count.go:13-22):
lowercase the whole line, split on whitespace runs, strip every character
outside [a-zA-Z0-9] from each token, drop tokens that strip to ''.

All builders return Column expressions — no UDFs, so Catalyst keeps the
whole pipeline inside codegen and the explode is the only row-expander.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STRIP_PATTERN = "[^a-zA-Z0-9]+"


def clean_tokens(line: Column) -> Column:
    """Array of cleaned tokens for one text line (empties NOT yet removed —
    filter after explode so the pattern matches the reference exactly)."""
    return F.transform(
        F.split(F.lower(line), r"\s+"),
        lambda t: F.regexp_replace(t, STRIP_PATTERN, ""),
    )


def exploded_words(df, text_col: str) -> "F.DataFrame":
    """documents-style df -> one row per cleaned non-empty token (`word`)."""
    return (
        df.select(F.explode(clean_tokens(F.col(text_col))).alias("word"))
        .where(F.col("word") != "")
    )


def words_sql(table: str = "documents", col: str = "text") -> str:
    """DuckDB twin of exploded_words, as a FROM-able fragment."""
    return f"""
  SELECT word FROM (
    SELECT regexp_replace(t.tok, '[^a-zA-Z0-9]+', '', 'g') AS word
    FROM {table}, unnest(string_split_regex(lower({col}), '\\s+')) AS t(tok)
  ) WHERE word <> ''
"""
