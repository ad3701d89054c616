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
    (the reader's trim-by-default would eat it), unicode, JSON-ish
    braces, AND the empty string: with ignoreSurroundingSpaces=false
    an empty element reads back as '' (only the DEFAULT trim collapses
    it to null — the r11 ADVICE probe)."""
    nasty = [
        (0, ""),
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


def test_xml_props_checksum_empty_string_parity(spark, tmp_path):
    """Round-11 ADVICE probe: the finding assumed '' reads back as NULL
    across the XML boundary, which holds only under the reader's
    DEFAULT whitespace trim. The registered query pins
    ``ignoreSurroundingSpaces=false``, and under that option
    ``<props></props>`` reads back as '' byte-exactly (probed: the
    writer emits an empty element, the non-trimming reader keeps it).
    So the checksum is computed over md5('') on BOTH engines with no
    normalization — this test pins that with a corpus that HAS
    empty-string props, which the driver tables may not."""
    import hashlib

    import duckdb

    from go_dfs_mapreduce_spark.operators.interop import (
        _PROPS_CK_MOD,
        _TS_FMT,
    )

    rows = [
        (1, "2024-01-01 00:00:00.000000", 10, "click", 1.0, ""),
        (2, "2024-01-01 00:00:01.000000", 11, "click", 2.0, "a=1"),
        (3, "2024-01-01 00:00:02.000000", 12, "click", 3.0, None),
        (4, "2024-01-01 00:00:03.000000", 13, "view", 4.0, ""),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    )
    out = str(tmp_path / "events_xml_empty")
    df.write.format("xml").option("rootTag", "events").option(
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
    )
    got = {
        r.event_type: r.ck
        for r in back.groupBy("event_type")
        .agg(
            F.sum(
                F.conv(F.substring(F.md5("props"), 1, 15), 16, 10).cast(
                    "long"
                )
                % 1_000_000_007
            )
            .cast("long")
            .alias("ck")
        )
        .collect()
    }
    # the oracle's plain md5(props) over the ORIGINAL (pre-XML) rows —
    # no NULLIF: '' survives the carriage under the pinned option
    con = duckdb.connect()
    oracle = {
        et: ck
        for et, ck in con.execute(
            "SELECT event_type, CAST(SUM(('0x' || substr("
            "md5(props), 1, 15))::UBIGINT % 1000000007) "
            "AS BIGINT) FROM (SELECT * FROM (VALUES "
            + ", ".join(
                "(%r, %s)" % (et, "NULL" if p is None else repr(p))
                for (_, _, _, et, _, p) in rows
            )
            + ") t(event_type, props)) GROUP BY event_type"
        ).fetchall()
    }
    assert got == oracle

    def ck(*payloads: bytes) -> int:
        return sum(
            int(hashlib.md5(p).hexdigest()[:15], 16) % _PROPS_CK_MOD
            for p in payloads
        )

    # 'click' checksums BOTH its empty-string and real payload (the
    # None row is skipped by SUM on both engines)
    assert got["click"] == ck(b"", b"a=1")
    # the all-empty-string 'view' group checksums md5('') — not NULL
    assert got["view"] == ck(b"")


def test_gif_lzw_oversized_stream_quarantined():
    """A crafted GIF whose LZW stream expands far past w*h must be
    rejected without materializing the blowup (round-11 ADVICE fix):
    _lzw_decode stops the moment output exceeds max_out, and the table
    stops growing at code 4096 per the spec."""
    from go_dfs_mapreduce_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
        decode_gif_pixels,
        make_gif_bytes,
    )

    # honest image decodes
    ok = make_gif_bytes(5, 4, 7)
    assert decode_gif_pixels(ok) is not None

    # encode far more indices than the 2x2 descriptor claims
    big = _lzw_encode([1, 2, 3, 0] * 5000)
    assert _lzw_decode(big, max_out=4) is None
    # and the unbounded call still works for honest streams
    small = _lzw_encode([1, 2, 3, 0])
    assert _lzw_decode(small, max_out=4) == [1, 2, 3, 0]
