"""Lake-format interop tests beyond the oracle gate: round-trip fidelity
as Spark itself computes it, and the FAILFAST contract actually failing
fast on malformed input."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_csv_roundtrip_agg_equals_direct(spark, sf_dir):
    """The aggregate over the CSV-round-tripped orders equals the same
    aggregate over the original parquet — doubles and microsecond
    timestamps survive the text carriage bit-for-bit."""
    from go_dfs_mapreduce_spark.operators.interop import (
        _DSUM,
        csv_roundtrip_orders_agg,
    )
    from go_dfs_mapreduce_spark.tables import table

    direct = {
        tuple(r)
        for r in table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(_DSUM.format(c="o_totalprice")).alias("total_price"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )
        .collect()
    }
    got = {tuple(r) for r in csv_roundtrip_orders_agg(spark, sf_dir).collect()}
    assert got == direct


def test_json_roundtrip_preserves_full_rowset(spark, sf_dir):
    """Row-level (not just aggregate-level) fidelity: every events row
    survives the JSON carriage, including the nested-JSON props string."""
    import shutil
    import tempfile

    from go_dfs_mapreduce_spark.operators.interop import _TS_FMT
    from go_dfs_mapreduce_spark.tables import table

    ev = table(spark, sf_dir, "events")
    scratch = tempfile.mkdtemp(prefix="go_dfs_test_json_")
    try:
        out = os.path.join(scratch, "ev")
        ev.withColumn("ts", F.date_format("ts", _TS_FMT)).write.mode(
            "overwrite"
        ).json(out)
        back = (
            spark.read.schema(
                "event_id long, ts string, user_id long, event_type string, "
                "value double, props string"
            )
            .option("mode", "FAILFAST")
            .json(out)
            .withColumn("ts", F.to_timestamp("ts", _TS_FMT))
        )
        assert {tuple(r) for r in back.collect()} == {
            tuple(r) for r in ev.collect()
        }
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def test_csv_failfast_raises_on_malformed(spark, tmp_path):
    """FAILFAST is load-bearing, not decorative: a row that cannot be
    parsed under the explicit schema aborts the read instead of passing
    silent nulls downstream."""
    p = tmp_path / "bad.csv"
    p.write_text("o_orderkey,o_totalprice\n1,10.5\nnot_a_number,oops\n")
    bad = (
        spark.read.schema("o_orderkey long, o_totalprice double")
        .option("header", True)
        .option("mode", "FAILFAST")
        .csv(str(p))
    )
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        bad.collect()


def test_interval_join_live_equals_batch_twin(spark, sf_dir):
    """The real-engine stream-stream interval join emits exactly the
    batch twin's row set under one AvailableNow batch."""
    from go_dfs_mapreduce_spark.operators.streaming_batch import (
        stream_interval_join,
        stream_interval_join_live,
    )

    batch = {tuple(r) for r in stream_interval_join(spark, sf_dir).collect()}
    live = {
        tuple(r) for r in stream_interval_join_live(spark, sf_dir).collect()
    }
    assert live == batch
    assert batch  # non-trivial on the smoke corpus


def test_first_occurrences_live_equals_batch_twin(spark, sf_dir):
    """The custom stateful operator through the real engine emits exactly
    the batch twin's rows under one AvailableNow batch."""
    from go_dfs_mapreduce_spark.operators.streaming_batch import (
        stream_first_occurrences,
        stream_first_occurrences_live,
    )

    batch = {
        tuple(r) for r in stream_first_occurrences(spark, sf_dir).collect()
    }
    live = {
        tuple(r)
        for r in stream_first_occurrences_live(spark, sf_dir).collect()
    }
    assert live == batch
    assert batch


def test_export_manifest_covers_whole_corpus(spark, sf_dir):
    """Conservation laws for the sharded export: every document lands in
    exactly one shard, char totals add up, and shard ids are in range."""
    from go_dfs_mapreduce_spark.operators.interop import (
        N_SHARDS,
        dataset_export_manifest,
    )
    from go_dfs_mapreduce_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_chars = docs.selectExpr("sum(length(text)) s").collect()[0].s
    rows = dataset_export_manifest(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.total_chars for r in rows) == n_chars
    assert all(0 <= r.shard < N_SHARDS for r in rows)
    assert len({r.content_hash for r in rows}) == len(rows)  # all distinct


def test_jsonl_carriage_survives_adversarial_text(spark, tmp_path):
    """The JSONL export codec (what dataset_export_manifest ships) must
    preserve hostile text exactly: embedded newlines, tabs, quotes,
    backslashes, control chars, non-BMP unicode, and empty strings."""
    nasty = [
        (0, ""),
        (1, 'quote " inside'),
        (2, "back\\slash and \t tab"),
        (3, "line\nbreak\r\nand CR"),
        (4, "unicode: é中\U0001f600 zero-width:​"),
        (5, "json-ish: {\"k\": [1, null]}"),
        (6, "trailing space  "),
        (7, "\x01control\x1f chars"),
    ]
    df = spark.createDataFrame(nasty, "doc_id long, text string")
    out = str(tmp_path / "nasty_jsonl")
    df.write.mode("overwrite").json(out)
    back = (
        spark.read.schema("doc_id long, text string")
        .option("mode", "FAILFAST")
        .json(out)
    )
    assert {(r.doc_id, r.text) for r in back.collect()} == set(nasty)


def test_xml_carriage_survives_adversarial_text(spark, tmp_path):
    """The native XML source must round-trip hostile payloads
    byte-exactly with ignoreSurroundingSpaces pinned off: XML-special
    characters (& < > \" '), CDATA-looking text, whitespace padding
    (the reader's trim-by-default would eat it), unicode, and JSON-ish
    braces. Empty strings are excluded: the XML wire format cannot
    distinguish an empty element from null — the documented format
    boundary (JSON carries them; the jsonl twin covers that case)."""
    nasty = [
        (1, "amp & lt < gt > quot \" apos '"),
        (2, "<![CDATA[ not actually cdata ]]>"),
        (3, "  leading and trailing  "),
        (4, "unicode: é中\U0001f600"),
        (5, 'json-ish: {"k": [1, null], "s": "v"}'),
        (6, "tab\tand spaces   inside"),
    ]
    df = spark.createDataFrame(nasty, "doc_id long, text string")
    out = str(tmp_path / "nasty_xml")
    df.write.format("xml").option("rootTag", "rows").option(
        "rowTag", "row"
    ).mode("overwrite").save(out)
    back = (
        spark.read.schema("doc_id long, text string")
        .format("xml")
        .option("rowTag", "row")
        .option("mode", "FAILFAST")
        .option("ignoreSurroundingSpaces", "false")
        .load(out)
    )
    assert {(r.doc_id, r.text) for r in back.collect()} == set(nasty)
