"""go_dfs_mapreduce_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of ljendrusch/Go_DFS_MapReduce.

The reference (surveyed in SURVEY.md) is an HDFS-like chunked DFS plus a
plugin MapReduce engine. This package re-expresses its *capabilities* —
scan, tokenize, filter, group-aggregate, distinct, top-k, ordered output,
plus the full relational / streaming / LLM-data-pipeline surface required by
the north star — on idiomatic Spark DataFrame/SQL, letting Catalyst/Tungsten
pick physical strategies instead of hand-scheduling mappers/reducers.

Layers
------
- ``session``    : SparkSession factory tuned for scale (AQE, skew join, Arrow).
- ``tables``     : loaders for the driver's parquet tables.
- ``operators``  : DataFrame query pipelines (relational, text, dedup,
                   similarity, streaming-batch oracle twins).
- ``functions``  : reusable column-expression builders (URL normalization,
                   tokenization, vector math) — JVM-side, codegen-friendly.
- ``mapreduce``  : the MR-parity job API mirroring the reference's plugin
                   contract (F1-F9 in SURVEY.md §2.2).
- ``sources``    : ingestion/egress helpers (text/binary/parquet), the DFS
                   command analogs (store/retrieve/delete/ls).
- ``streaming``  : Structured Streaming surface (windows, watermark, state).
- ``plans``      : plan-inspection helpers (explain audits for pushdown,
                   broadcast, codegen coverage).
"""

__version__ = "0.1.0"
