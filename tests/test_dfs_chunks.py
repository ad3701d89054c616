"""go_dfs_text / go_dfs_bin custom sources: read the reference's storage
node chunk layout (``<file>_t<idx>`` / ``<file>_b<idx>`` + md5 sidecar
``...h``, sn/dfs_actions.go:20-32) in place, with per-chunk checksum
verify and replica failover."""

from __future__ import annotations

import hashlib
import os

import pytest

from go_dfs_mapreduce_spark.sources import register_dfs_sources

TEXT = (
    "the quick brown fox\n"
    "jumps over the lazy dog\n"
    "pack my box\n"
    "with five dozen liquor jugs\n"
)


def _write_chunk(node_dir, fname, ftype, idx, data: bytes, corrupt=False):
    """Lay a chunk down exactly as the reference storage node does:
    ``<file>_<t|b><idx>`` + 16-byte md5 sidecar ``...h``
    (sn/dfs_actions.go:20-32)."""
    os.makedirs(node_dir, exist_ok=True)
    tchar = {"TXT": "t", "BIN": "b"}[ftype]
    cfn = os.path.join(node_dir, f"{fname}_{tchar}{idx}")
    digest = hashlib.md5(data).digest()  # sidecar ALWAYS hashes true bytes
    if corrupt:
        data = b"X" + data[1:]
    with open(cfn, "wb") as fh:
        fh.write(data)
    with open(cfn + "h", "wb") as fh:
        fh.write(digest)


@pytest.fixture()
def nodes(spark, tmp_path):
    """Two 'storage node' dirs; doc.txt split into 2 newline-aligned TXT
    chunks replicated on both nodes, with node1's copy of chunk 0
    corrupted; blob.bin as one BIN chunk only on node2."""
    register_dfs_sources(spark)
    n1, n2 = str(tmp_path / "node1"), str(tmp_path / "node2")
    lines = TEXT.encode().split(b"\n")
    c0 = b"\n".join(lines[:2]) + b"\n"
    c1 = b"\n".join(lines[2:4]) + b"\n"
    _write_chunk(n1, "doc.txt", "TXT", 0, c0, corrupt=True)
    _write_chunk(n2, "doc.txt", "TXT", 0, c0)
    _write_chunk(n1, "doc.txt", "TXT", 1, c1)
    _write_chunk(n2, "doc.txt", "TXT", 1, c1)
    _write_chunk(n2, "blob.bin", "BIN", 0, bytes(range(256)))
    return n1, n2


def test_text_chunks_scan_with_per_chunk_line_numbers(spark, nodes):
    df = spark.read.format("go_dfs_text").load(",".join(nodes))
    rows = sorted(
        (r.chunk_idx, r.line_number, r.line) for r in df.collect()
    )
    assert rows == [
        (0, 0, "the quick brown fox"),
        (0, 1, "jumps over the lazy dog"),
        (1, 0, "pack my box"),
        (1, 1, "with five dozen liquor jugs"),
    ]
    assert df.rdd.getNumPartitions() == 2  # one partition per chunk
    assert {r.file for r in df.collect()} == {"doc.txt"}


def test_corrupt_replica_fails_over(spark, nodes):
    """node1's chunk 0 is corrupted: its md5 no longer matches the
    sidecar, so the task must fall back to node2's healthy replica —
    the retrieve failover semantics (cl/dfs_actions.go:369-495)."""
    n1, n2 = nodes
    got = (
        spark.read.format("go_dfs_text")
        .load(f"{n1},{n2}")
        .where("chunk_idx = 0")
        .count()
    )
    assert got == 2


def test_all_replicas_corrupt_fails_scan(spark, nodes):
    n1, _ = nodes
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as e:
        spark.read.format("go_dfs_text").load(n1).where("chunk_idx = 0").count()
    assert "checksum mismatch" in str(e.value) or isinstance(
        e.value, Py4JJavaError
    )


def test_verify_false_reads_corrupt_bytes(spark, nodes):
    n1, _ = nodes
    df = (
        spark.read.format("go_dfs_text")
        .option("verify", "false")
        .load(n1)
        .where("chunk_idx = 0 and line_number = 0")
    )
    assert df.collect()[0].line == "Xhe quick brown fox"


def test_bin_chunks(spark, nodes):
    df = spark.read.format("go_dfs_bin").load(",".join(nodes))
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].file == "blob.bin"
    assert bytes(rows[0].content) == bytes(range(256))


def test_file_option_filters_inventory(spark, nodes):
    df = (
        spark.read.format("go_dfs_text")
        .option("file", "nope.txt")
        .load(",".join(nodes))
    )
    assert df.count() == 0


def test_wordcount_over_chunk_source_matches_python(spark, nodes):
    """The F1 record shape feeds the same wordcount the MR layer runs:
    counts over the chunk source must equal a plain Python count."""
    from collections import Counter

    from pyspark.sql import functions as F

    df = spark.read.format("go_dfs_text").load(",".join(nodes))
    got = {
        (r.word, r.cnt)
        for r in df.select(
            F.explode(F.split(F.lower("line"), r"\s+")).alias("word")
        )
        .where("word != ''")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    want = set(Counter(TEXT.lower().split()).items())
    assert got == want


def test_write_roundtrip_reference_layout(spark, tmp_path):
    """df.write.format('go_dfs_text') must produce the reference's chunk
    layout (contiguous _t<idx> files + md5 sidecars, committed via
    chunks_tmp rename) that the reader — and the reference itself —
    can consume."""
    import hashlib as _h

    register_dfs_sources(spark)
    node = str(tmp_path / "node")
    lines = [f"line number {i}" for i in range(100)]
    df = spark.createDataFrame([(l,) for l in lines], "value string").repartition(4)
    df.write.format("go_dfs_text").option("file", "out.txt").mode("append").save(node)

    names = sorted(os.listdir(node))
    chunk_files = [n for n in names if not n.endswith("h") and n != "chunks_tmp"]
    assert chunk_files == [f"out.txt_t{i}" for i in range(len(chunk_files))]
    assert len(chunk_files) >= 2  # multiple partitions -> multiple chunks
    for cf in chunk_files:  # sidecar is the md5 of the true bytes
        with open(os.path.join(node, cf), "rb") as fh:
            data = fh.read()
        with open(os.path.join(node, cf + "h"), "rb") as fh:
            assert fh.read() == _h.md5(data).digest()
        assert data.endswith(b"\n")  # newline-aligned chunks
    assert os.listdir(os.path.join(node, "chunks_tmp")) == []

    back = spark.read.format("go_dfs_text").load(node)
    assert sorted(r.line for r in back.collect()) == sorted(lines)


def test_write_rejects_duplicate_and_honors_overwrite(spark, tmp_path):
    register_dfs_sources(spark)
    node = str(tmp_path / "node")
    df = spark.createDataFrame([("a",), ("b",)], "value string")
    df.write.format("go_dfs_text").option("file", "f.txt").mode("append").save(node)
    with pytest.raises(Exception) as e:
        df.write.format("go_dfs_text").option("file", "f.txt").mode("append").save(node)
    assert "already stored" in str(e.value)
    df2 = spark.createDataFrame([("c",)], "value string").coalesce(1)
    df2.write.format("go_dfs_text").option("file", "f.txt").mode(
        "overwrite"
    ).save(node)
    back = spark.read.format("go_dfs_text").load(node)
    assert [r.line for r in back.collect()] == ["c"]


def test_mr_job_runs_over_reference_chunk_layout(spark, tmp_path):
    """End-to-end parity flow: a MapReduceJob consumes data stored in the
    reference's own chunk layout through read_dfs_chunks_with_line_numbers
    and must produce the same counts as the identical job over a plain
    in-memory (file, line_number, line) frame — chunk names as file
    fields notwithstanding (F_map receives the chunk name exactly as the
    reference passes cn, sn/mr_actions.go:217)."""
    from go_dfs_mapreduce_spark.mapreduce import (
        MapReduceJob,
        read_dfs_chunks_with_line_numbers,
    )
    from go_dfs_mapreduce_spark.mapreduce import plugins

    register_dfs_sources(spark)
    node = str(tmp_path / "node")
    text = "alpha beta gamma\nbeta gamma\ngamma gamma alpha\n"
    lines = text.encode().split(b"\n")
    _write_chunk(node, "corpus.txt", "TXT", 0, b"\n".join(lines[:2]) + b"\n")
    _write_chunk(node, "corpus.txt", "TXT", 1, lines[2] + b"\n")

    df = read_dfs_chunks_with_line_numbers(spark, [node], file="corpus.txt")
    assert {r.file for r in df.select("file").distinct().collect()} == {
        "corpus.txt_t0",
        "corpus.txt_t1",
    }
    got = (
        MapReduceJob(
            "t_dfs_wc", plugins.word_count_map, plugins.word_count_reduce, r=26
        )
        .run(df)
        .collect()
    )
    plain = spark.createDataFrame(
        [(r.file, r.line_number, r.line) for r in df.collect()],
        "file string, line_number long, line string",
    )
    want = (
        MapReduceJob(
            "t_plain_wc", plugins.word_count_map, plugins.word_count_reduce, r=26
        )
        .run(plain)
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_bin_write_roundtrip(spark, tmp_path):
    """go_dfs_bin writer: one chunk per content row, contiguous indices,
    md5 sidecars; reader reassembles the same bytes in chunk order."""
    import hashlib as _h

    register_dfs_sources(spark)
    node = str(tmp_path / "node")
    blobs = [bytes([i]) * (100 + i) for i in range(5)]
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(blobs)], "seq long, content binary"
    )
    (
        df.repartitionByRange(2, "seq")
        .sortWithinPartitions("seq")
        .select("content")
        .write.format("go_dfs_bin")
        .option("file", "blob.bin")
        .mode("append")
        .save(node)
    )
    chunk_files = sorted(
        n for n in os.listdir(node) if "_b" in n and not n.endswith("h")
    )
    assert chunk_files == [f"blob.bin_b{i}" for i in range(5)]
    for cf in chunk_files:
        with open(os.path.join(node, cf), "rb") as fh:
            data = fh.read()
        with open(os.path.join(node, cf + "h"), "rb") as fh:
            assert fh.read() == _h.md5(data).digest()
    back = (
        spark.read.format("go_dfs_bin")
        .load(node)
        .orderBy("chunk_idx")
        .collect()
    )
    assert [bytes(r.content) for r in back] == blobs


def test_invalid_utf8_in_text_chunk_degrades_to_replacement(spark, tmp_path):
    """Go strings are arbitrary bytes; Spark strings are UTF-8. A TXT
    chunk with invalid UTF-8 must scan (U+FFFD replacement) rather than
    fail the whole read."""
    register_dfs_sources(spark)
    node = str(tmp_path / "node")
    _write_chunk(node, "weird.txt", "TXT", 0, b"ok line\nbad \xff\xfe line\n")
    rows = sorted(
        (r.line_number, r.line)
        for r in spark.read.format("go_dfs_text").load(node).collect()
    )
    assert rows[0] == (0, "ok line")
    assert rows[1][0] == 1 and "�" in rows[1][1]


def test_last_line_without_trailing_newline_not_dropped(spark, tmp_path):
    """bufio.Scanner yields a final non-newline-terminated line; the
    reader must too (a chunk at EOF without '\\n' keeps its last line)."""
    register_dfs_sources(spark)
    node = str(tmp_path / "node")
    _write_chunk(node, "tail.txt", "TXT", 0, b"first\nlast-no-nl")
    rows = sorted(
        (r.line_number, r.line)
        for r in spark.read.format("go_dfs_text").load(node).collect()
    )
    assert rows == [(0, "first"), (1, "last-no-nl")]


def test_exactly_one_trailing_cr_stripped(spark, tmp_path):
    """Go's dropCR removes exactly one \\r; 'x\\r\\r\\n' must scan as
    'x\\r', not 'x'."""
    register_dfs_sources(spark)
    node = str(tmp_path / "node")
    _write_chunk(node, "cr.txt", "TXT", 0, b"x\r\r\nplain\r\n")
    rows = sorted(
        (r.line_number, r.line)
        for r in spark.read.format("go_dfs_text").load(node).collect()
    )
    assert rows == [(0, "x\r"), (1, "plain")]


def test_reference_exact_layout_fixture(spark, tmp_path):
    """A directory laid out byte-for-byte as the reference storage node
    writes it (sn/dfs_actions.go:20-34: ``<file>_t<idx>``/``<file>_b<idx>``
    data files, ``...h`` md5 sidecars, a ``chunks_tmp`` scratch dir) must
    be consumed as-is — and names using any OTHER type encoding (e.g. an
    uppercase ``_TXT0``) must be ignored, not misparsed."""
    import hashlib as _h

    register_dfs_sources(spark)
    node = tmp_path / "node"
    (node / "chunks_tmp").mkdir(parents=True)
    txt = b"hello from the reference\nsecond line\n"
    (node / "mytext_t0").write_bytes(txt)
    (node / "mytext_t0h").write_bytes(_h.md5(txt).digest())
    blob = bytes(range(64))
    (node / "prog_b0").write_bytes(blob)
    (node / "prog_b0h").write_bytes(_h.md5(blob).digest())
    # foreign/legacy names: must not appear in any inventory
    (node / "legacy_TXT0").write_bytes(b"nope\n")
    (node / "legacy_TXT0h").write_bytes(_h.md5(b"nope\n").digest())

    rows = spark.read.format("go_dfs_text").load(str(node)).collect()
    assert sorted((r.file, r.line_number, r.line) for r in rows) == [
        ("mytext", 0, "hello from the reference"),
        ("mytext", 1, "second line"),
    ]
    brows = spark.read.format("go_dfs_bin").load(str(node)).collect()
    assert [(r.file, bytes(r.content)) for r in brows] == [("prog", blob)]


def test_export_names_parse_like_the_reference(spark, tmp_path):
    """Chunk names our writers emit must survive the reference's own
    parse: split at the LAST '_', single type char in {t, b}, the rest
    all digits (sn/struct.go:198-216, cl/dfs_actions.go:422-429)."""
    import re

    register_dfs_sources(spark)
    node = str(tmp_path / "node")
    df = spark.createDataFrame([("x",), ("y",)], "value string").repartition(2)
    df.write.format("go_dfs_text").option("file", "f_t1.txt").mode("append").save(node)
    data = [n for n in os.listdir(node) if n != "chunks_tmp" and not n.endswith("h")]
    for n in data:
        stem, _, tail = n.rpartition("_")
        assert stem == "f_t1.txt"
        assert tail[0] in ("t", "b")
        assert re.fullmatch(r"\d+", tail[1:]), n
        assert os.path.exists(os.path.join(node, n + "h"))


def test_fsck_reports_and_repairs(spark, nodes, tmp_path):
    """fsck detects the corrupt replica, deletes it on repair, and
    re-replicates from the healthy copy (controller cycle semantics,
    cn/struct.go:234-392); afterwards every replica verifies and the
    under-replicated BIN chunk gains a second copy."""
    from go_dfs_mapreduce_spark.sources.dfs_chunks import fsck

    n1, n2 = nodes
    before = {(r["file"], r["idx"]): r for r in fsck([n1, n2])}
    assert before[("doc.txt", 0)]["corrupt"] == 1  # node1's bad replica
    assert before[("doc.txt", 0)]["healthy"] == 1
    assert before[("blob.bin", 0)]["healthy"] == 1  # under-replicated

    after = {
        (r["file"], r["idx"]): r
        for r in fsck([n1, n2], repair=True, replicas=2)
    }
    assert after[("doc.txt", 0)]["repaired"] == 1
    assert after[("blob.bin", 0)]["repaired"] == 1

    final = {(r["file"], r["idx"]): r for r in fsck([n1, n2])}
    assert all(r["corrupt"] == 0 for r in final.values())
    assert final[("doc.txt", 0)]["healthy"] == 2
    assert final[("blob.bin", 0)]["healthy"] == 2
    # the repaired layout reads clean end-to-end
    assert spark.read.format("go_dfs_text").load(",".join(nodes)).count() == 4


def test_fsck_repair_with_trailing_slash_does_not_destroy_sole_replica(
    spark, tmp_path
):
    """Regression: dir aliases ('node/', './node') once made the node
    holding the only healthy replica look replica-less, and the repair
    copy then opened THE SAME FILE for writing — truncating the sole
    healthy copy before reading it. Aliased dirs must be a no-op here."""
    from go_dfs_mapreduce_spark.sources.dfs_chunks import fsck

    node = str(tmp_path / "node1")
    data = b"precious bytes\nmore precious bytes\n"
    _write_chunk(node, "only.txt", "TXT", 0, data)
    aliased = [node + "/", os.path.join(os.path.dirname(node), ".", "node1")]
    report = fsck(aliased, repair=True, replicas=2)
    assert report == [
        {
            "file": "only.txt",
            "ftype": "TXT",
            "idx": 0,
            "healthy": 1,
            "corrupt": 0,
            "missing_sidecar": 0,
            "repaired": 0,
        }
    ]
    with open(os.path.join(node, "only.txt_t0"), "rb") as fh:
        assert fh.read() == data  # sole replica untouched


def test_fsck_missing_sidecar_reported_separately_and_repaired(spark, tmp_path):
    """A data file with no sidecar is 'missing_sidecar', not 'corrupt'
    (the report keys the docstring promises); repair deletes it and
    re-replicates from a healthy copy."""
    from go_dfs_mapreduce_spark.sources.dfs_chunks import fsck

    n1, n2 = str(tmp_path / "n1"), str(tmp_path / "n2")
    data = b"good\nlines\n"
    _write_chunk(n1, "d.txt", "TXT", 0, data)
    os.makedirs(n2, exist_ok=True)
    with open(os.path.join(n2, "d.txt_t0"), "wb") as fh:
        fh.write(b"orphan bytes")  # no sidecar
    before = fsck([n1, n2])
    assert before[0]["missing_sidecar"] == 1
    assert before[0]["corrupt"] == 0
    assert before[0]["healthy"] == 1
    after = fsck([n1, n2], repair=True, replicas=2)
    assert after[0]["repaired"] == 1
    final = fsck([n1, n2])
    assert final[0] == {
        "file": "d.txt",
        "ftype": "TXT",
        "idx": 0,
        "healthy": 2,
        "corrupt": 0,
        "missing_sidecar": 0,
        "repaired": 0,
    }


def test_stream_tails_growing_chunk_directory(spark, tmp_path):
    """readStream over chunk dirs: run 1 consumes the chunks present;
    more chunks land (a new index for doc.txt AND a brand-new file);
    run 2 on the same checkpoint emits ONLY the new rows — the offset
    (per-file contiguous chunk count) survives restart."""
    register_dfs_sources(spark)
    node = str(tmp_path / "node")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    _write_chunk(node, "doc.txt", "TXT", 0, b"line a\nline b\n")

    def _drain():
        q = (
            spark.readStream.format("go_dfs_text")
            .load(node)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            (r.file, r.chunk_idx, r.line_number, r.line)
            for r in spark.read.parquet(sink).collect()
        )

    first = _drain()
    assert first == [("doc.txt", 0, 0, "line a"), ("doc.txt", 0, 1, "line b")]

    _write_chunk(node, "doc.txt", "TXT", 1, b"line c\n")
    _write_chunk(node, "new.txt", "TXT", 0, b"fresh\n")
    second = _drain()  # restart on the same checkpoint: only new chunks
    assert second == first + [
        ("doc.txt", 1, 0, "line c"),
        ("new.txt", 0, 0, "fresh"),
    ]


def test_bin_stream_tails_growing_chunk_directory(spark, tmp_path):
    """go_dfs_bin streaming twin: new BIN chunks appear between two
    checkpointed availableNow runs; only the new chunk rows are emitted."""
    register_dfs_sources(spark)
    node = str(tmp_path / "node")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    _write_chunk(node, "blob.bin", "BIN", 0, bytes([1, 2, 3]))

    def _drain():
        q = (
            spark.readStream.format("go_dfs_bin")
            .load(node)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            (r.file, r.chunk_idx, bytes(r.content))
            for r in spark.read.parquet(sink).collect()
        )

    assert _drain() == [("blob.bin", 0, bytes([1, 2, 3]))]
    _write_chunk(node, "blob.bin", "BIN", 1, bytes([4, 5]))
    assert _drain() == [
        ("blob.bin", 0, bytes([1, 2, 3])),
        ("blob.bin", 1, bytes([4, 5])),
    ]


def test_node_status_flatline_eviction_and_replication_report(tmp_path):
    """Controller maintenance-cycle semantics (cn/struct.go:53-187): a
    node with a fresh heartbeat is alive; silent past 22s is evicted and
    its replicas leave the live files map; chunks under the replica
    target surface in the report; a chunk stranded only on dead nodes
    shows live_replicas=0."""
    import json as _json
    import os as _os

    from go_dfs_mapreduce_spark.sources.membership import (
        node_status,
        touch_heartbeat,
    )

    n1, n2 = str(tmp_path / "n1"), str(tmp_path / "n2")
    _write_chunk(n1, "d.txt", "TXT", 0, b"x\n")
    _write_chunk(n2, "d.txt", "TXT", 0, b"x\n")
    _write_chunk(n2, "only2.bin", "BIN", 0, b"\x01\x02")

    hb1 = touch_heartbeat(n1)
    assert hb1["served"] == 1 and hb1["space"] > 0
    touch_heartbeat(n2)
    st = node_status([n1, n2], replicas=2)
    by_dir = {n["dir"]: n for n in st["nodes"]}
    assert by_dir[n1]["alive"] and by_dir[n2]["alive"]
    assert by_dir[n2]["served"] == 2 and by_dir[n2]["chunks"] == 2
    assert st["under_replicated"] == [
        {"file": "only2.bin", "ftype": "BIN", "idx": 0,
         "live_replicas": 1, "want": 2}
    ]

    # age n2's heartbeat past the flatline window -> evicted
    hb_path = _os.path.join(n2, ".heartbeat")
    hb = _json.load(open(hb_path))
    hb["epoch_ms"] -= 60_000
    _json.dump(hb, open(hb_path, "w"))
    st2 = node_status([n1, n2], replicas=2)
    by_dir = {n["dir"]: n for n in st2["nodes"]}
    assert by_dir[n1]["alive"] and not by_dir[n2]["alive"]
    under = {(u["file"], u["idx"]): u["live_replicas"]
             for u in st2["under_replicated"]}
    assert under[("d.txt", 0)] == 1  # n2's replica left the files map
    assert under[("only2.bin", 0)] == 0  # stranded on a dead node

    # migration mode: a reference-written dir (no .heartbeat) uses its
    # newest chunk mtime as the last-known heartbeat
    n3 = str(tmp_path / "n3")
    _write_chunk(n3, "ref.txt", "TXT", 0, b"y\n")
    st3 = node_status([n3], replicas=1)
    assert st3["nodes"][0]["alive"]  # just written -> fresh
    assert st3["under_replicated"] == []


def test_node_status_dir_aliases_do_not_fake_replicas(tmp_path):
    """Review regression: 'n1' and 'n1/' are ONE node — an aliased dir
    must not double-count the sole replica and hide under-replication."""
    from go_dfs_mapreduce_spark.sources.membership import (
        node_status,
        touch_heartbeat,
    )

    n1 = str(tmp_path / "n1")
    _write_chunk(n1, "solo.txt", "TXT", 0, b"x\n")
    touch_heartbeat(n1)
    st = node_status([n1, n1 + "/"], replicas=2)
    assert len(st["nodes"]) == 1
    assert st["under_replicated"] == [
        {"file": "solo.txt", "ftype": "TXT", "idx": 0,
         "live_replicas": 1, "want": 2}
    ]


def test_node_status_corrupt_heartbeat_is_silence(tmp_path):
    """A node that writes .heartbeat but corrupts it is SILENT — fresh
    chunk mtimes must not revive it (mtime fallback is only for dirs
    that never participate in the protocol)."""
    import os as _os

    from go_dfs_mapreduce_spark.sources.membership import node_status

    n1 = str(tmp_path / "n1")
    _write_chunk(n1, "d.txt", "TXT", 0, b"x\n")  # fresh mtime
    with open(_os.path.join(n1, ".heartbeat"), "w") as fh:
        fh.write("{not json")
    st = node_status([n1], replicas=1)
    assert not st["nodes"][0]["alive"]
    assert st["nodes"][0]["heartbeat_age_ms"] is None


def test_stream_offset_waits_for_sidecar(tmp_path):
    """Review regression: a data file whose md5 sidecar hasn't landed yet
    (the writer's data-then-sidecar window) must stay invisible to
    latestOffset instead of crashing the tail's read."""
    import hashlib as _h
    import os as _os

    from go_dfs_mapreduce_spark.sources.dfs_chunks import _TextStreamReader

    node = str(tmp_path / "node")
    _write_chunk(node, "doc.txt", "TXT", 0, b"a\n")
    # chunk 1: data file only, no sidecar yet
    with open(_os.path.join(node, "doc.txt_t1"), "wb") as fh:
        fh.write(b"b\n")
    rdr = _TextStreamReader({"path": node})
    assert rdr.latestOffset() == {"files": {"doc.txt": 1}}
    # sidecar lands -> chunk 1 becomes visible
    with open(_os.path.join(node, "doc.txt_t1h"), "wb") as fh:
        fh.write(_h.md5(b"b\n").digest())
    assert rdr.latestOffset() == {"files": {"doc.txt": 2}}


def test_cli_dfs_nodes_status(tmp_path, capsys):
    import json as _json

    from go_dfs_mapreduce_spark import cli

    n1 = str(tmp_path / "n1")
    _write_chunk(n1, "a.txt", "TXT", 0, b"z\n")
    rc = cli.main(
        ["dfs-nodes-status", n1, "--heartbeat", "--replicas", "1"]
    )
    out = capsys.readouterr().out
    assert rc == 0
    st = _json.loads(out)
    assert st["nodes"][0]["alive"] and st["under_replicated"] == []


def test_fsck_verify_runs_as_spark_tasks(spark, nodes):
    """With a session, the verify phase must execute as a Spark job over
    the replica inventory (one task per replica at deployment), and the
    report must equal the driver-loop result."""
    from go_dfs_mapreduce_spark.sources.dfs_chunks import fsck

    n1, n2 = nodes
    sc = spark.sparkContext
    sc.setJobGroup("fsck-verify-test", "fsck distributed verify")
    try:
        with_spark = fsck([n1, n2], spark=spark)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    jobs = sc.statusTracker().getJobIdsForGroup("fsck-verify-test")
    assert jobs, "fsck(spark=...) must run the verify phase as a Spark job"
    assert with_spark == fsck([n1, n2])


def test_stream_sink_appends_chunks_across_runs(spark, tmp_path):
    """writeStream into the chunk layout: run 1 appends chunks for the
    initial source files; new source data lands; run 2 on the same
    checkpoint appends ONLY the new lines as NEW chunks with CONTINUING
    indices — no rewrite, no duplication, sidecars verify, and the batch
    chunk reader sees one coherent growing file (what a reference
    consumer tailing the directory observes)."""
    import os

    from pyspark.sql import functions as F

    register_dfs_sources(spark)
    src = str(tmp_path / "src")
    node = str(tmp_path / "node")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    os.makedirs(node)

    def _produce(path_name, lines):
        spark.createDataFrame(
            [(ln,) for ln in lines], "line string"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, path_name)
        )

    def _drain():
        q = (
            spark.readStream.schema("line string")
            .option("pathGlobFilter", "*.parquet")
            .parquet(src + "/*")
            .writeStream.format("go_dfs_text")
            .option("checkpointLocation", ckpt)
            .option("file", "doc.txt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start(node)
        )
        q.awaitTermination()

    _produce("a", ["a1", "a2"])
    _drain()
    first = sorted(
        (r.chunk_idx, r.line)
        for r in spark.read.format("go_dfs_text").load(node).collect()
    )
    assert [ln for _, ln in first] == ["a1", "a2"]
    n_chunks_1 = 1 + max(ci for ci, _ in first)

    _produce("b", ["b1"])
    _drain()  # same checkpoint: only file b is new
    second = sorted(
        (r.chunk_idx, r.line)
        for r in spark.read.format("go_dfs_text").load(node).collect()
    )
    assert sorted(ln for _, ln in second) == ["a1", "a2", "b1"]
    # the new line landed in a NEW chunk index past run 1's chunks
    b_chunks = {ci for ci, ln in second if ln == "b1"}
    assert all(ci >= n_chunks_1 for ci in b_chunks)
    # contiguous indices overall
    assert {ci for ci, _ in second} == set(range(1 + max(ci for ci, _ in second)))
    # every chunk has a verifying sidecar (reader already verified; check disk)
    names = [e for e in os.listdir(node) if e.startswith("doc.txt_t") and not e.endswith("h")]
    assert names and all(os.path.exists(os.path.join(node, e + "h")) for e in names)


def test_stream_sink_replayed_batch_not_duplicated(spark, tmp_path):
    """A replayed micro-batch (same batchId re-committed after a crash
    between sink commit and offset commit) must not append its chunks
    twice: the state high-water-mark drops the replay's tmp files."""
    import os

    from go_dfs_mapreduce_spark.sources.dfs_chunks import (
        _ChunkCommit,
        _TextStreamWriter,
    )

    node = str(tmp_path / "node")
    os.makedirs(node)
    w = _TextStreamWriter({"path": node, "file": "doc.txt", "checkpointlocation": str(tmp_path / "ck")})

    def _fake_batch(lines, pid=0):
        # simulate the executor-side write() without a TaskContext
        import hashlib

        tmp_dir = os.path.join(node, "chunks_tmp")
        os.makedirs(tmp_dir, exist_ok=True)
        tmp_name = f"{w._job}_p{pid}"
        data = "".join(ln + "\n" for ln in lines).encode()
        with open(os.path.join(tmp_dir, tmp_name), "wb") as fh:
            fh.write(data)
        with open(os.path.join(tmp_dir, tmp_name + "h"), "wb") as fh:
            fh.write(hashlib.md5(data).digest())
        return _ChunkCommit(pid=pid, tmp_name=tmp_name)

    w.commit([_fake_batch(["x1"])], batchId=0)
    w.commit([_fake_batch(["y1"])], batchId=1)
    # replay of batch 1 (crash before offset commit): must be dropped
    w.commit([_fake_batch(["y1"])], batchId=1)
    register_dfs_sources(spark)
    rows = sorted(
        (r.chunk_idx, r.line)
        for r in spark.read.format("go_dfs_text").load(node).collect()
    )
    assert rows == [(0, "x1"), (1, "y1")]
    # tmp dir holds no leftovers from the dropped replay
    assert os.listdir(os.path.join(node, "chunks_tmp")) == []


def test_stream_sink_corrupt_state_fails_loudly(spark, tmp_path):
    """A corrupt batch high-water-mark must abort the commit (silent
    guessing could duplicate chunks) with an actionable message."""
    import os

    import pytest as _pytest

    from go_dfs_mapreduce_spark.sources.dfs_chunks import _TextStreamWriter

    node = str(tmp_path / "node")
    os.makedirs(node)
    w = _TextStreamWriter({"path": node, "file": "doc.txt", "checkpointlocation": str(tmp_path / "ck")})
    with open(w._state_path(), "w") as fh:
        fh.write("not json {")
    with _pytest.raises(RuntimeError, match="corrupt stream-sink state"):
        w.commit([], batchId=5)


def test_bin_stream_sink_appends_chunks_across_runs(spark, tmp_path):
    """BIN writeStream twin: each streamed row becomes one appended chunk
    with a continuing index; a second run on the same checkpoint appends
    only the new rows' chunks."""
    import os

    register_dfs_sources(spark)
    src = str(tmp_path / "src")
    node = str(tmp_path / "node")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    os.makedirs(node)

    def _produce(name, blobs):
        spark.createDataFrame(
            [(bytearray(b),) for b in blobs], "content binary"
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(src, name))

    def _drain():
        q = (
            spark.readStream.schema("content binary")
            .parquet(src + "/*")
            .writeStream.format("go_dfs_bin")
            .option("checkpointLocation", ckpt)
            .option("file", "blob.bin")
            .outputMode("append")
            .trigger(availableNow=True)
            .start(node)
        )
        q.awaitTermination()

    _produce("a", [b"\x00\x01", b"\xff" * 5])
    _drain()
    first = sorted(
        bytes(r.content)
        for r in spark.read.format("go_dfs_bin").load(node).collect()
    )
    assert first == sorted([b"\x00\x01", b"\xff" * 5])

    _produce("b", [b"new-bytes"])
    _drain()
    rows = spark.read.format("go_dfs_bin").load(node).collect()
    assert sorted(bytes(r.content) for r in rows) == sorted(
        [b"\x00\x01", b"\xff" * 5, b"new-bytes"]
    )
    assert {r.chunk_idx for r in rows} == {0, 1, 2}  # contiguous, no rewrite


def test_stream_sink_fresh_checkpoint_not_mistaken_for_replay(spark, tmp_path):
    """A DIFFERENT stream (its own checkpoint) writing the same node/file
    restarts batch numbering at 0 — its data must append, not be dropped
    as a 'replay' of the first stream's batch 0 (state is keyed by
    checkpointLocation)."""
    import os

    register_dfs_sources(spark)
    node = str(tmp_path / "node")
    os.makedirs(node)

    def _run_one(tag, lines):
        src = str(tmp_path / f"src_{tag}")
        os.makedirs(src)
        spark.createDataFrame(
            [(ln,) for ln in lines], "line string"
        ).coalesce(1).write.parquet(os.path.join(src, "d"))
        q = (
            spark.readStream.schema("line string")
            .parquet(src + "/*")
            .writeStream.format("go_dfs_text")
            .option("checkpointLocation", str(tmp_path / f"ck_{tag}"))
            .option("file", "feed.txt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start(node)
        )
        q.awaitTermination()

    _run_one("a", ["first"])
    _run_one("b", ["second"])  # fresh checkpoint, batch 0 again
    rows = spark.read.format("go_dfs_text").load(node).collect()
    assert sorted(r.line for r in rows) == ["first", "second"]


def test_stream_sink_mid_commit_crash_rolls_forward(spark, tmp_path):
    """A crash INSIDE commit (after the journal, after some renames, but
    before the state update) must not duplicate the batch: the replay
    completes the journaled renames and drops its own tmp files."""
    import hashlib
    import json as _json
    import os

    from go_dfs_mapreduce_spark.sources.dfs_chunks import (
        _ChunkCommit,
        _TextStreamWriter,
        chunk_name,
    )

    node = str(tmp_path / "node")
    os.makedirs(node)
    w = _TextStreamWriter({"path": node, "file": "doc.txt", "checkpointlocation": str(tmp_path / "ck")})
    tmp_dir = os.path.join(node, "chunks_tmp")
    os.makedirs(tmp_dir)

    def _tmp(name, lines):
        data = "".join(ln + "\n" for ln in lines).encode()
        with open(os.path.join(tmp_dir, name), "wb") as fh:
            fh.write(data)
        with open(os.path.join(tmp_dir, name + "h"), "wb") as fh:
            fh.write(hashlib.md5(data).digest())

    # batch 0 committed normally
    _tmp("job0_p0", ["a"])
    w.commit([_ChunkCommit(pid=0, tmp_name="job0_p0")], batchId=0)

    # simulate batch 1 crashing mid-commit: journal written, first of two
    # chunks renamed (data only — sidecar still pending), then crash
    _tmp("job1_p0", ["b"])
    _tmp("job1_p1", ["c"])
    _json.dump(
        {
            "batch": 1,
            "renames": [
                ["job1_p0", chunk_name("doc.txt", "TXT", 1)],
                ["job1_p1", chunk_name("doc.txt", "TXT", 2)],
            ],
        },
        open(w._state_path() + ".journal", "w"),
    )
    os.rename(
        os.path.join(tmp_dir, "job1_p0"),
        os.path.join(node, chunk_name("doc.txt", "TXT", 1)),
    )

    # replay of batch 1 arrives with ITS OWN fresh tmp files
    w2 = _TextStreamWriter({"path": node, "file": "doc.txt", "checkpointlocation": str(tmp_path / "ck")})
    _tmp("job2_p0", ["b"])
    _tmp("job2_p1", ["c"])
    w2.commit(
        [
            _ChunkCommit(pid=0, tmp_name="job2_p0"),
            _ChunkCommit(pid=1, tmp_name="job2_p1"),
        ],
        batchId=1,
    )

    rows = sorted(
        (r.chunk_idx, r.line)
        for r in spark.read.format("go_dfs_text").load(node).collect()
    )
    assert rows == [(0, "a"), (1, "b"), (2, "c")]  # no duplication
    assert os.listdir(tmp_dir) == []  # replay tmps dropped
    assert not os.path.exists(w._state_path() + ".journal")
    # and a further replay of batch 1 is now an ordinary no-op
    _tmp("job3_p0", ["b"])
    w2.commit([_ChunkCommit(pid=0, tmp_name="job3_p0")], batchId=1)
    assert len(spark.read.format("go_dfs_text").load(node).collect()) == 3


def test_stream_sink_failed_commit_abort_then_restart_recovers(spark, tmp_path):
    """A commit attempt that raises AFTER journaling (e.g. a clobber
    collision) is followed by Spark calling abort() on the same batch.
    abort must NOT delete tmp files the live journal references —
    otherwise the restarted query's journal roll-forward would silently
    lose the batch. With journal-aware abort, the restart completes the
    renames and the data survives."""
    import hashlib
    import json as _json
    import os

    from go_dfs_mapreduce_spark.sources.dfs_chunks import (
        _ChunkCommit,
        _TextStreamWriter,
        chunk_name,
    )

    node = str(tmp_path / "node")
    os.makedirs(node)
    w = _TextStreamWriter({"path": node, "file": "doc.txt", "checkpointlocation": str(tmp_path / "ck")})
    tmp_dir = os.path.join(node, "chunks_tmp")
    os.makedirs(tmp_dir)

    def _tmp(name, lines):
        data = "".join(ln + "\n" for ln in lines).encode()
        with open(os.path.join(tmp_dir, name), "wb") as fh:
            fh.write(data)
        with open(os.path.join(tmp_dir, name + "h"), "wb") as fh:
            fh.write(hashlib.md5(data).digest())

    _tmp("job0_p0", ["a"])
    w.commit([_ChunkCommit(pid=0, tmp_name="job0_p0")], batchId=0)

    # batch 1: journal written, zero renames done, then the commit raises
    # (simulated by leaving journal + tmps exactly as a raise would)
    _tmp("job1_p0", ["b"])
    _tmp("job1_p1", ["c"])
    msgs = [
        _ChunkCommit(pid=0, tmp_name="job1_p0"),
        _ChunkCommit(pid=1, tmp_name="job1_p1"),
    ]
    _json.dump(
        {
            "batch": 1,
            "renames": [
                ["job1_p0", chunk_name("doc.txt", "TXT", 1)],
                ["job1_p1", chunk_name("doc.txt", "TXT", 2)],
            ],
        },
        open(w._state_path() + ".journal", "w"),
    )
    # Spark aborts the failed batch — journaled tmps must survive
    w.abort(msgs, batchId=1)
    assert os.path.exists(os.path.join(tmp_dir, "job1_p0"))
    assert os.path.exists(os.path.join(tmp_dir, "job1_p1h"))

    # restart: replay of batch 1 with fresh tmps resumes the journal
    w2 = _TextStreamWriter({"path": node, "file": "doc.txt", "checkpointlocation": str(tmp_path / "ck")})
    _tmp("job2_p0", ["b"])
    _tmp("job2_p1", ["c"])
    w2.commit(
        [
            _ChunkCommit(pid=0, tmp_name="job2_p0"),
            _ChunkCommit(pid=1, tmp_name="job2_p1"),
        ],
        batchId=1,
    )
    rows = sorted(
        (r.chunk_idx, r.line)
        for r in spark.read.format("go_dfs_text").load(node).collect()
    )
    assert rows == [(0, "a"), (1, "b"), (2, "c")]
    assert os.listdir(tmp_dir) == []
    assert not os.path.exists(w._state_path() + ".journal")


def test_stream_sink_resume_refuses_over_lost_chunks(spark, tmp_path):
    """If a journaled rename's tmp AND final are both gone (the batch data
    was destroyed after journaling), the resumed commit must raise instead
    of advancing the high-water mark over silently-lost chunks."""
    import hashlib
    import json as _json
    import os

    import pytest as _pytest

    from go_dfs_mapreduce_spark.sources.dfs_chunks import (
        _ChunkCommit,
        _TextStreamWriter,
        chunk_name,
    )

    node = str(tmp_path / "node")
    os.makedirs(node)
    w = _TextStreamWriter({"path": node, "file": "doc.txt", "checkpointlocation": str(tmp_path / "ck")})
    tmp_dir = os.path.join(node, "chunks_tmp")
    os.makedirs(tmp_dir)
    data = b"a\n"
    with open(os.path.join(tmp_dir, "job0_p0"), "wb") as fh:
        fh.write(data)
    with open(os.path.join(tmp_dir, "job0_p0h"), "wb") as fh:
        fh.write(hashlib.md5(data).digest())
    w.commit([_ChunkCommit(pid=0, tmp_name="job0_p0")], batchId=0)

    # journal for batch 1 references a tmp that no longer exists and whose
    # final was never created — the data is gone
    _json.dump(
        {"batch": 1, "renames": [["gone_p0", chunk_name("doc.txt", "TXT", 1)]]},
        open(w._state_path() + ".journal", "w"),
    )
    w2 = _TextStreamWriter({"path": node, "file": "doc.txt", "checkpointlocation": str(tmp_path / "ck")})
    with _pytest.raises(RuntimeError, match="lost chunks"):
        w2.commit([_ChunkCommit(pid=0, tmp_name="")], batchId=1)
    # the high-water mark did NOT advance
    assert _json.load(open(w._state_path()))["last_batch"] == 0


def test_stream_sink_rejects_truncate_modes(spark, tmp_path):
    """complete/update output modes (truncate semantics) must fail loudly
    instead of silently appending every state snapshot."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    register_dfs_sources(spark)
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame([("x",)], "line string").write.parquet(
        os.path.join(src, "d")
    )
    agg = (
        spark.readStream.schema("line string")
        .parquet(src + "/*")
        .groupBy("line")
        .agg(F.count(F.lit(1)).cast("string").alias("n"))
        .select("n")
    )
    with _pytest.raises(Exception, match="append output mode"):
        q = (
            agg.writeStream.format("go_dfs_text")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .option("file", "feed.txt")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start(str(tmp_path / "node"))
        )
        q.awaitTermination()


def test_stream_sink_requires_checkpoint_option(tmp_path):
    """Without an explicit checkpointLocation option the replay state
    would collapse onto a shared key across streams — the sink refuses
    up front."""
    import os

    import pytest as _pytest

    from go_dfs_mapreduce_spark.sources.dfs_chunks import _TextStreamWriter

    node = str(tmp_path / "node")
    os.makedirs(node)
    with _pytest.raises(ValueError, match="checkpointLocation"):
        _TextStreamWriter({"path": node, "file": "doc.txt"})


def test_stream_sink_detects_concurrent_producer(spark, tmp_path):
    """Two live producers on one (node, file) must fail loudly at the
    index collision, never silently overwrite each other's chunks."""
    import hashlib
    import os

    import pytest as _pytest

    from go_dfs_mapreduce_spark.sources.dfs_chunks import (
        _ChunkCommit,
        _TextStreamWriter,
        chunk_name,
    )

    node = str(tmp_path / "node")
    os.makedirs(node)
    tmp_dir = os.path.join(node, "chunks_tmp")
    os.makedirs(tmp_dir)

    def _writer(tag):
        return _TextStreamWriter(
            {
                "path": node,
                "file": "doc.txt",
                "checkpointlocation": str(tmp_path / f"ck_{tag}"),
            }
        )

    def _tmp(name, line):
        data = (line + "\n").encode()
        with open(os.path.join(tmp_dir, name), "wb") as fh:
            fh.write(data)
        with open(os.path.join(tmp_dir, name + "h"), "wb") as fh:
            fh.write(hashlib.md5(data).digest())

    a, b = _writer("a"), _writer("b")
    # sequential producers are SAFE: B plans after A's commit and lands
    # on the next free index
    _tmp("a_p0", "from-a")
    _tmp("b_p0", "from-b")
    a.commit([_ChunkCommit(pid=0, tmp_name="a_p0")], batchId=0)
    b.commit([_ChunkCommit(pid=0, tmp_name="b_p0")], batchId=0)
    rows = sorted(
        (r.chunk_idx, r.line)
        for r in spark.read.format("go_dfs_text").load(node).collect()
    )
    assert rows == [(0, "from-a"), (1, "from-b")]

    # the true race: a third producer JOURNALED index 2 (planned before
    # another stream landed there), crashed, and now rolls forward — the
    # taken index must be refused, never overwritten
    import json as _json

    c = _writer("c")
    _tmp("c_p0", "from-c")
    _json.dump(
        {"batch": 0, "renames": [["c_p0", chunk_name("doc.txt", "TXT", 1)]]},
        open(c._state_path() + ".journal", "w"),
    )
    with _pytest.raises(RuntimeError, match="another producer"):
        c.commit([], batchId=0)
    # the incumbent chunk survives untouched
    with open(os.path.join(node, chunk_name("doc.txt", "TXT", 1)), "rb") as fh:
        assert fh.read() == b"from-b\n"


def test_jpeg_chunk_store_layout_and_idempotence(spark, sf_dir):
    """The stored-BIN decode twin's corpus store (VERDICT r13 #8):
    publishes record-packed BIN chunks with md5 sidecars in the
    reference layout, is idempotent per corpus fingerprint (second call
    reuses the published dir — no rebuild), and its scan decodes to
    exactly the synth twin's rows."""
    import os

    from go_dfs_mapreduce_spark.operators.multimodal import (
        JPEG_STORE_CHUNKS,
        _jpeg_chunk_store,
        multimodal_jpeg_metadata,
        multimodal_jpeg_metadata_stored,
    )

    node = _jpeg_chunk_store(spark, sf_dir)
    chunks = sorted(
        e for e in os.listdir(node) if e.startswith("jpegs_b") and not e.endswith("h")
    )
    assert len(chunks) == JPEG_STORE_CHUNKS
    for c in chunks:
        assert os.path.exists(os.path.join(node, c + "h"))  # md5 sidecar
    mtime = os.path.getmtime(node)
    assert _jpeg_chunk_store(spark, sf_dir) == node
    assert os.path.getmtime(node) == mtime  # no rebuild on reuse

    got = {
        tuple(r)
        for r in multimodal_jpeg_metadata_stored(spark, sf_dir).collect()
    }
    want = {
        tuple(r) for r in multimodal_jpeg_metadata(spark, sf_dir).collect()
    }
    assert got == want


def test_packed_bin_store_multichunk_corrupt_replica_failover(spark, tmp_path):
    """The stored-BIN posture at multi-chunk scale with induced
    corruption (VERDICT r14 #7): a record-packed BIN corpus laid down as
    8 chunks, replicated to a second node by fsck, then one replica of
    two different chunks corrupted — the scan must fail over PER CHUNK
    to the healthy replica (task-level, no global retry), and
    fsck --repair must delete the bad replicas and restore 2 healthy
    copies, after which the corrupt node alone serves the full corpus."""
    import pandas as pd
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.sources import register_dfs_sources
    from go_dfs_mapreduce_spark.sources.dfs_chunks import chunk_name, fsck

    register_dfs_sources(spark)
    n1, n2 = str(tmp_path / "n1"), str(tmp_path / "n2")
    os.makedirs(n2)
    n_chunks, n_docs = 8, 64

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        recs = []
        for i in sorted(int(x) for x in pdf["doc_id"]):
            payload = (b"%dpayload" % i) * 3
            recs.append(
                i.to_bytes(8, "big")
                + len(payload).to_bytes(4, "big")
                + payload
            )
        return pd.DataFrame({"content": [b"".join(recs)]})

    (
        spark.range(n_docs)
        .select(F.col("id").alias("doc_id"))
        .withColumn("bucket", F.col("doc_id") % n_chunks)
        .groupBy("bucket")
        .applyInPandas(pack, "content binary")
        .write.format("go_dfs_bin")
        .option("file", "corpus")
        .mode("overwrite")
        .save(n1)
    )

    def decode_ids(dirs: str) -> list[int]:
        df = spark.read.format("go_dfs_bin").load(dirs)
        assert df.rdd.getNumPartitions() == n_chunks  # one task per chunk
        ids = []
        for row in df.collect():
            b = bytes(row.content)
            off = 0
            while off < len(b):
                doc_id = int.from_bytes(b[off : off + 8], "big")
                ln = int.from_bytes(b[off + 8 : off + 12], "big")
                ids.append(doc_id)
                off += 12 + ln
        return sorted(ids)

    want = list(range(n_docs))
    assert decode_ids(n1) == want

    # replicate to n2 (controller maintenance), then corrupt ONE replica
    # of two different chunks on n1 — sidecars keep the TRUE digests
    fsck([n1, n2], repair=True, replicas=2, spark=spark)
    assert decode_ids(",".join((n1, n2))) == want
    corrupted = []
    for idx in (2, 5):
        p = os.path.join(n1, chunk_name("corpus", "BIN", idx))
        data = open(p, "rb").read()
        with open(p, "wb") as fh:
            fh.write(b"X" + data[1:])
        corrupted.append(p)
    # per-chunk failover: the n1 replica md5-mismatches, the scan task
    # falls through to n2's copy; every record still decodes
    assert decode_ids(",".join((n1, n2))) == want
    # repair: bad replicas deleted, healthy copies restored onto n1
    report = fsck([n1, n2], repair=True, replicas=2, spark=spark)
    bad = [r for r in report if r["corrupt"]]
    assert len(bad) == 2 and all(r["repaired"] == 1 for r in bad)
    for p in corrupted:
        assert os.path.exists(p)  # re-replicated copy is back
    assert decode_ids(n1) == want  # n1 alone is healthy again
