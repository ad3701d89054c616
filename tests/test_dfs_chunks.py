"""go_dfs_text / go_dfs_bin custom sources: read the reference's storage
node chunk layout (``<file>_<FTYPE><idx>`` + md5 sidecar ``...h``) in
place, with per-chunk checksum verify and replica failover."""

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
    os.makedirs(node_dir, exist_ok=True)
    cfn = os.path.join(node_dir, f"{fname}_{ftype}{idx}")
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
    layout (contiguous _TXT<idx> files + md5 sidecars, committed via
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
    assert chunk_files == [f"out.txt_TXT{i}" for i in range(len(chunk_files))]
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
        "corpus.txt_TXT0",
        "corpus.txt_TXT1",
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
        n for n in os.listdir(node) if "_BIN" in n and not n.endswith("h")
    )
    assert chunk_files == [f"blob.bin_BIN{i}" for i in range(5)]
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
