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
