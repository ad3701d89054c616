"""tables.table must normalize the events ``ts`` column to TIMESTAMP no
matter how the driver's generator encoded it in parquet — the encoding has
already changed once between rounds (TIMESTAMP(NANOS) → timestamp[us] with
no zone, which Spark reads as TIMESTAMP_NTZ), and every downstream query,
window frame, and watermark is written against plain TIMESTAMP."""

from __future__ import annotations

import datetime as dt
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from go_dfs_mapreduce_spark.streaming import read_events_stream
from go_dfs_mapreduce_spark.tables import table

_ROWS = [
    (1, dt.datetime(2024, 1, 1, 0, 5, 30), 7, "click", 1.5, "{}"),
    (2, dt.datetime(2024, 1, 2, 12, 0, 0), 8, "purchase", 2.0, "{}"),
]


def _write_events(dirpath, ts_arrow_type):
    if ts_arrow_type == "nanos_as_long":
        ts = pa.array(
            [int(r[1].timestamp() * 1_000_000) * 1000 for r in _ROWS],
            pa.int64(),
        )
    else:
        ts = pa.array([r[1] for r in _ROWS], ts_arrow_type)
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
            "ts": ts,
            "user_id": pa.array([r[2] for r in _ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in _ROWS]),
            "value": pa.array([r[4] for r in _ROWS], pa.float64()),
            "props": pa.array([r[5] for r in _ROWS]),
        }
    )
    pq.write_table(t, f"{dirpath}/events.parquet")
    return str(dirpath)


_ENCODINGS = {
    # what the driver's generator emitted in rounds 1-2 (read via
    # spark.sql.legacy.parquet.nanosAsLong as bigint)
    "nanos_as_long": "nanos_as_long",
    # what it emits now: micros, no zone -> Spark TIMESTAMP_NTZ
    "micros_ntz": pa.timestamp("us"),
    # a UTC-zoned writer -> Spark TIMESTAMP directly
    "micros_utc": pa.timestamp("us", tz="UTC"),
}


@pytest.mark.parametrize("enc", sorted(_ENCODINGS))
def test_events_ts_normalized_to_timestamp(spark, tmp_path, enc):
    d = _write_events(tmp_path, _ENCODINGS[enc])
    df = table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = sorted(r.ts for r in df.select("ts").collect())
    assert got == [r[1] for r in _ROWS]


@pytest.mark.parametrize("enc", sorted(_ENCODINGS))
def test_events_stream_ts_matches_batch(spark, tmp_path, enc):
    """read_events_stream must probe the encoding and land on the same
    TIMESTAMP values the batch loader produces."""
    d = _write_events(tmp_path, _ENCODINGS[enc])
    stream = read_events_stream(spark, d, watermark=None)
    assert dict(stream.dtypes)["ts"] == "timestamp"
    q = (
        stream.writeStream.format("memory")
        .queryName(f"t_enc_{enc}")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.ts for r in spark.table(f"t_enc_{enc}").select("ts").collect())
    assert got == [r[1] for r in _ROWS]
    shutil.rmtree(tmp_path, ignore_errors=True)


# --- r15 scan-spread + metadata helpers ------------------------------------


def test_table_row_count_matches_count(spark):
    """Footer-metadata row count must equal a full count() for every
    driver table — the calibration scalars (SRP bits, IVF cells) are
    derived from it and a mismatch would silently change signatures."""
    from go_dfs_mapreduce_spark.tables import (
        SMOKE_SF_DIR,
        TABLE_NAMES,
        table,
        table_row_count,
    )

    for name in TABLE_NAMES:
        assert table_row_count(spark, SMOKE_SF_DIR, name) == table(
            spark, SMOKE_SF_DIR, name
        ).count(), name


def test_table_row_count_fallback_counts_non_parquet(spark, tmp_path):
    """Unreadable footers must fall back to count(), not crash or return
    a wrong constant."""
    import shutil

    from go_dfs_mapreduce_spark.tables import SMOKE_SF_DIR, table_row_count

    sf = tmp_path / "sf"
    sf.mkdir()
    shutil.copy(f"{SMOKE_SF_DIR}/region.parquet", sf / "region.parquet")
    # corrupt the footer magic so pyarrow refuses it but keep it listed
    p = sf / "nation.parquet"
    shutil.copy(f"{SMOKE_SF_DIR}/nation.parquet", p)
    good = table_row_count(spark, str(sf), "region")
    assert good == 5
    raw = p.read_bytes()
    p.write_bytes(raw[:-4] + b"XXXX")
    # fallback path: spark can't read it either, so expect an exception
    # from the count fallback — but NOT a silent wrong answer
    try:
        n = table_row_count(spark, str(sf), "nation")
    except Exception:
        n = None
    assert n is None or n >= 0


def test_spread_scan_noop_when_splits_cover_cores(spark, tmp_path):
    """spread_scan must add NO exchange when the file layout already
    yields >= cores scan splits (the real-scale posture): with
    maxPartitionBytes shrunk below the file size the estimate exceeds
    the core count and the plan must stay a bare scan."""
    from go_dfs_mapreduce_spark.tables import SMOKE_SF_DIR, spread_scan, table

    df = table(spark, SMOKE_SF_DIR, "documents")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1")
        out = spread_scan(spark, SMOKE_SF_DIR, "documents", df)
        assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    # and WITH the default split size the gate-scale single-row-group
    # file spreads to the session's core count
    spread = spread_scan(spark, SMOKE_SF_DIR, "documents", df)
    assert (
        spread.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )


def test_spread_frame_adds_exchange_only_when_underpartitioned(spark, sf_dir):
    """r15: spread_frame round-robins a few-partition frame to the core
    count and is an identity on frames that already have >= cores
    partitions (the any-real-scale case)."""
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.tables import spread_frame, table

    cores = spark.sparkContext.defaultParallelism
    ids = table(spark, sf_dir, "documents").select("doc_id")
    spread = spread_frame(ids)
    assert spread.rdd.getNumPartitions() == cores

    wide = spark.range(0, 1000, 1, cores + 4)
    assert spread_frame(wide) is wide


def test_heavy_decoders_spread_light_decoders_do_not(spark, sf_dir):
    """r15 measured split (guide §2.5): compressed-codec decoders (JPEG,
    MJPEG-AVI) pay per-payload Python work heavy enough to fund a spread
    exchange; trivial decoders (BMP, PCM envelope) measured SLOWER with
    it and must stay exchange-free."""
    from go_dfs_mapreduce_spark.operators.multimodal import (
        multimodal_audio_pcm,
        multimodal_pixels_bmp,
        multimodal_pixels_jpeg,
        multimodal_video_mjpeg,
    )
    from go_dfs_mapreduce_spark.plans.audit import audit_plan

    for q in (multimodal_pixels_jpeg, multimodal_video_mjpeg):
        a = audit_plan(q(spark, sf_dir))
        assert "RoundRobinPartitioning" in a["plan"], q.__name__
    for q in (multimodal_pixels_bmp, multimodal_audio_pcm):
        a = audit_plan(q(spark, sf_dir))
        assert "RoundRobinPartitioning" not in a["plan"], q.__name__
