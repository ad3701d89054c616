"""Lake-format interop: CSV / JSON-lines / ORC round-trips.

The reference engine's own formats are TXT/BIN chunk layouts (read and
written in place by sources/dfs_chunks.py); real data lakes additionally
land CSV, JSON-lines and ORC. Each query here writes a table OUT in the
format, reads it BACK with an explicit schema, and aggregates the re-read
copy — while the oracle aggregates the ORIGINAL parquet. A green row
therefore proves byte-fidelity of the whole write+read cycle (value
formatting, timestamp codecs, quoting/escaping), not merely that a reader
exists.

Design rules, which are exactly the 100 TB rules:
- Explicit schemas on every read — schema inference is a second full scan
  of the data and is nondeterministic under sampling; a production
  pipeline never pays it.
- ``mode=FAILFAST`` — silently null-ing malformed rows (the PERMISSIVE
  default) turns format drift into data corruption downstream.
- Timestamps cross text formats as explicit microsecond-precision
  strings: relying on a reader's default timestamp parse is the classic
  silent-truncation bug (millis vs micros).
- Doubles survive text round-trips because the JVM writes round-trippable
  decimal forms (Double.toString contract); aggregation still happens in
  exact DECIMAL after the round-trip so the gate's hash compare is
  order-independent.
- Writes go through the normal distributed writer (one file per
  partition). The scratch dir is collected-and-dropped per invocation —
  repeated gate sweeps must not accrete temp data.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

# exact-decimal money sum, rounded and cast like every other oracle pair
_DSUM = "CAST(ROUND(SUM(CAST({c} AS DECIMAL(28,6))), 2) AS DOUBLE)"


def _with_scratch(spark: SparkSession, prefix: str, build) -> DataFrame:
    """Run ``build(scratch_dir) -> DataFrame``, collect the (result-sized)
    frame, and remove the scratch even when the build/collect fails —
    repeated gate sweeps must never accrete temp data."""
    scratch = tempfile.mkdtemp(prefix=prefix)
    try:
        df = build(scratch)
        rows = df.collect()
        schema = df.schema
        return spark.createDataFrame(rows, schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


CSV_ORDERS_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,6))), 2) AS DOUBLE)
         AS total_price,
       MIN(CAST(o_orderdate AS TIMESTAMP)) AS first_order,
       MAX(CAST(o_orderdate AS TIMESTAMP)) AS last_order
FROM orders
GROUP BY o_orderstatus
"""


@query("csv_roundtrip_orders_agg", oracle=CSV_ORDERS_ORACLE)
def csv_roundtrip_orders_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> CSV (header, quoted) -> explicit-schema FAILFAST read ->
    per-status totals. The oracle reads the original parquet, so the hash
    match proves the CSV writer/reader cycle loses nothing: long keys,
    free-text priorities (quoting), round-trippable doubles, and
    microsecond timestamps carried as explicit strings."""

    def build(scratch: str) -> DataFrame:
        out = os.path.join(scratch, "orders_csv")
        table(spark, sf_dir, "orders").withColumn(
            "o_orderdate", F.date_format("o_orderdate", _TS_FMT)
        ).write.option("header", True).mode("overwrite").csv(out)
        back = (
            spark.read.schema(
                "o_orderkey long, o_custkey long, o_orderstatus string, "
                "o_totalprice double, o_orderdate string, o_orderpriority string"
            )
            .option("header", True)
            .option("mode", "FAILFAST")
            .csv(out)
            .withColumn("o_orderdate", F.to_timestamp("o_orderdate", _TS_FMT))
        )
        return back.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(_DSUM.format(c="o_totalprice")).alias("total_price"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )

    return _with_scratch(spark, "go_dfs_interop_csv_", build)


JSON_EVENTS_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE)
         AS total_value,
       MAX(CAST(ts AS TIMESTAMP)) AS last_ts
FROM events
GROUP BY event_type
"""


@query("json_roundtrip_events_agg", oracle=JSON_EVENTS_ORACLE)
def json_roundtrip_events_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> JSON lines -> explicit-schema FAILFAST read -> per-type
    rollup. ``props`` is itself a JSON string, so the round-trip also
    proves nested-quote escaping; timestamps cross as microsecond
    strings (see module docstring)."""

    def build(scratch: str) -> DataFrame:
        out = os.path.join(scratch, "events_json")
        table(spark, sf_dir, "events").withColumn(
            "ts", F.date_format("ts", _TS_FMT)
        ).write.mode("overwrite").json(out)
        back = (
            spark.read.schema(
                "event_id long, ts string, user_id long, event_type string, "
                "value double, props string"
            )
            .option("mode", "FAILFAST")
            .json(out)
            .withColumn("ts", F.to_timestamp("ts", _TS_FMT))
        )
        return back.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.expr(_DSUM.format(c="value")).alias("total_value"),
            F.max("ts").alias("last_ts"),
        )

    return _with_scratch(spark, "go_dfs_interop_json_", build)


ORC_LINEITEM_ORACLE = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_lines,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(28,6))), 2) AS DOUBLE)
         AS sum_qty,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,6))), 2) AS DOUBLE)
         AS sum_price
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


@query("orc_roundtrip_lineitem_agg", oracle=ORC_LINEITEM_ORACLE)
def orc_roundtrip_lineitem_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem -> ORC -> read -> q1-style totals. ORC is typed, so no
    string carriage is needed; the round-trip proves the engine's second
    columnar codec end-to-end (a lakehouse migration rarely gets to pick
    just one). The re-read aggregate benefits from the same column
    pruning as parquet — only 4 of 11 columns are decoded."""

    def build(scratch: str) -> DataFrame:
        out = os.path.join(scratch, "lineitem_orc")
        table(spark, sf_dir, "lineitem").write.mode("overwrite").orc(out)
        return (
            spark.read.orc(out)
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.expr(_DSUM.format(c="l_quantity")).alias("sum_qty"),
                F.expr(_DSUM.format(c="l_extendedprice")).alias("sum_price"),
            )
        )

    return _with_scratch(spark, "go_dfs_interop_orc_", build)


# --------------------------------------------------------------------------
# Sharded dataset export with a verified manifest — the training-data
# handoff artifact: N deterministic JSONL shards + per-shard content hash.
# --------------------------------------------------------------------------

N_SHARDS = 8

# md5-hash sharding: reproducible across engines/reruns and independent of
# partition order (same contract as corpus_sample_hash); doc_id % N would
# also work but hash sharding survives non-uniform id spaces.
_SHARD_SPARK = (
    "cast(conv(substr(md5(concat('shard:', cast(doc_id as string))), 1, 8),"
    f" 16, 10) as bigint) % {N_SHARDS}"
)
_SHARD_DUCK = (
    "('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT"
    f" % {N_SHARDS}"
)

EXPORT_MANIFEST_ORACLE = f"""
WITH sharded AS (
  SELECT doc_id, text, CAST({_SHARD_DUCK} AS BIGINT) AS shard FROM documents
)
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       md5(string_agg(md5(text), '' ORDER BY doc_id)) AS content_hash
FROM sharded
GROUP BY shard
"""


@query("dataset_export_manifest", oracle=EXPORT_MANIFEST_ORACLE)
def dataset_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export the document corpus as ``N_SHARDS`` hash-sharded JSONL
    directories (``partitionBy(shard)`` — the layout a training run
    consumes), then re-read the export and compute the manifest a
    dataset handoff publishes: per-shard doc count, char count, and a
    content hash (md5 over the doc-id-ordered concatenation of per-doc
    md5s). The oracle computes the same manifest from the ORIGINAL
    table, so a green row proves the distributed partitioned write and
    the JSONL text carriage lost nothing — manifest-verified export, not
    fire-and-forget.

    Scale: the write is one hash-partitioned distributed pass; the
    manifest aggregate shuffles doc-id-sized digests, never text. The
    order-sensitive concat inside each shard is bounded by shard size —
    at 100 TB shard count scales so per-shard digest lists stay
    memory-safe, or the rollup switches to an order-insensitive XOR of
    digests (same proof, no sort)."""

    def build(scratch: str) -> DataFrame:
        out = os.path.join(scratch, "corpus_jsonl")
        docs = table(spark, sf_dir, "documents").select(
            "doc_id", "text", F.expr(_SHARD_SPARK).alias("shard")
        )
        docs.write.partitionBy("shard").mode("overwrite").json(out)
        back = (
            spark.read.schema("doc_id long, text string, shard long")
            .option("mode", "FAILFAST")
            .json(out)
        )
        return (
            back.select(
                "shard",
                "doc_id",
                F.length("text").alias("n_chars"),
                F.md5(F.col("text").cast("binary")).alias("h"),
            )
            .groupBy("shard")
                .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("total_chars"),
                F.md5(
                    F.concat_ws(
                        "",
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("doc_id", "h"))
                            ),
                            lambda s: s.h,
                        ),
                    ).cast("binary")
                ).alias("content_hash"),
            )
        )

    return _with_scratch(spark, "go_dfs_export_", build)


# md5-prefix checksum of every props payload, summed per group: 60-bit
# prefixes reduced mod a prime so the int64 sum is exact on both engines
# (all operands non-negative — no %-on-negatives trap). Any reader/writer
# corruption of ANY props byte changes the group sum.
_PROPS_CK_MOD = 1_000_000_007

XML_EVENTS_ORACLE = f"""
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE)
         AS total_value,
       MAX(CAST(ts AS TIMESTAMP)) AS last_ts,
       CAST(SUM(('0x' || substr(md5(props), 1, 15))::UBIGINT
                % {_PROPS_CK_MOD}) AS BIGINT) AS props_checksum
FROM events
GROUP BY event_type
"""


@query("xml_roundtrip_events_agg", oracle=XML_EVENTS_ORACLE)
def xml_roundtrip_events_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> XML (Spark 4's NATIVE xml source — no spark-xml jar) ->
    explicit-schema FAILFAST read -> the JSON twin's rollup PLUS a
    per-group md5 checksum over every round-tripped ``props`` payload —
    the column the aggregate itself doesn't consume, so a reader/writer
    that mangles payload bytes (mis-unescaped entity, trimmed value)
    fails the gate instead of hiding behind an unchanged rollup (the
    r10 follow-up review's overstated-proof finding). The reader pins
    ``ignoreSurroundingSpaces=false``: the XML source's trim-by-default
    would silently alter whitespace-padded strings the oracle reads
    verbatim from parquet — the 'passes only by corpus luck' trap
    class. That same pin also makes EMPTY-STRING props round-trip
    byte-exactly (``<props></props>`` reads back as ``''``, not NULL —
    probed and pinned by
    ``test_xml_props_checksum_empty_string_parity``), so the checksum
    needs no NULLIF normalization: both engines hash md5('') for empty
    payloads. Timestamps cross as microsecond strings (module
    docstring). Fourth interchange format after CSV/JSON/ORC.

    Scale: identical shape to the JSON twin — write and read are both
    embarrassingly parallel over row groups."""

    def build(scratch: str) -> DataFrame:
        out = os.path.join(scratch, "events_xml")
        table(spark, sf_dir, "events").withColumn(
            "ts", F.date_format("ts", _TS_FMT)
        ).write.format("xml").option("rootTag", "events").option(
            "rowTag", "event"
        ).mode("overwrite").save(out)
        back = (
            spark.read.schema(
                "event_id long, ts string, user_id long, event_type string, "
                "value double, props string"
            )
            .format("xml")
            .option("rowTag", "event")
            .option("mode", "FAILFAST")
            .option("ignoreSurroundingSpaces", "false")
            .load(out)
            .withColumn("ts", F.to_timestamp("ts", _TS_FMT))
        )
        return back.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.expr(_DSUM.format(c="value")).alias("total_value"),
            F.max("ts").alias("last_ts"),
            F.sum(
                F.conv(F.substring(F.md5("props"), 1, 15), 16, 10).cast(
                    "long"
                )
                % _PROPS_CK_MOD
            )
            .cast("long")
            .alias("props_checksum"),
        )

    return _with_scratch(spark, "go_dfs_interop_xml_", build)
