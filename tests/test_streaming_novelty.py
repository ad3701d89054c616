"""transformWithStateInPandas first-occurrence operator: streaming output
must equal the batch twin, and must be invariant to how the input is
split into micro-batches (the state-correctness property).

The streaming tests need ``google.protobuf`` (Spark's
transformWithState driver worker speaks protobuf to the state server)
and skip where it is missing; the batch-twin test always runs."""

from __future__ import annotations

import importlib.util
import os

import pytest

try:
    _HAS_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:  # no 'google' namespace package at all
    _HAS_PROTOBUF = False
needs_protobuf = pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithStateInPandas driver worker requires protobuf",
)

from go_dfs_mapreduce_spark.streaming import (
    first_occurrences_batch,
    first_occurrences_stream,
    read_events_stream,
)
from go_dfs_mapreduce_spark.tables import table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _run(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def test_batch_twin_is_first_arrival_per_user_type(spark, sf_dir):
    """Batch twin sanity (always runs): one row per (user_id, event_type),
    and each row's ts is the true minimum for that pair."""
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.streaming import first_occurrences_batch

    ev = table(spark, sf_dir, "events")
    got = first_occurrences_batch(ev)
    assert got.count() == ev.select("user_id", "event_type").distinct().count()
    mins = ev.groupBy("user_id", "event_type").agg(F.min("ts").alias("mn"))
    joined = got.join(mins, ["user_id", "event_type"])
    assert joined.where("first_ts != mn").count() == 0


@needs_protobuf
def test_first_occurrences_match_batch_single_batch(spark, sf_dir, tmp_path):
    d = tmp_path / "ev"
    d.mkdir()
    os.symlink(f"{sf_dir}/events.parquet", d / "events.parquet")
    got = _run(
        first_occurrences_stream(read_events_stream(spark, str(d), watermark=None)),
        "t_novel1",
    )
    want = first_occurrences_batch(table(spark, sf_dir, "events"))
    assert _rows(got) == _rows(want)
    assert want.count() > 0


@needs_protobuf
def test_first_occurrences_batching_invariant(spark, sf_dir, tmp_path):
    """Split the events into 3 arrival files processed one per
    micro-batch: emitted rows must be identical to the single-batch run —
    ListState survives across batches and never re-emits a seen type."""
    ev = table(spark, sf_dir, "events")
    src = tmp_path / "src"
    src.mkdir()
    # deterministic 3-way split by event_id, written as separate files
    import time

    now = time.time()
    for i in range(3):
        part = ev.where(f"event_id % 3 = {i}")
        pdir = tmp_path / f"b{i}"
        part.coalesce(1).write.parquet(str(pdir))
        files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
        assert len(files) == 1
        dst = src / f"{i}_{files[0]}"
        os.rename(pdir / files[0], dst)
        os.utime(dst, (now + 100 * i, now + 100 * i))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    got = _run(first_occurrences_stream(stream), "t_novel3")
    want = first_occurrences_batch(ev)
    assert _rows(got) == _rows(want)
