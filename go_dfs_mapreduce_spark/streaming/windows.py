"""Event-time windowing: tumbling / sliding / session, with watermarks.

The aggregation builders take ANY DataFrame (static or streaming) — the
batch oracle twins in operators/streaming_batch.py call the same functions
on the static events table, so the driver's DuckDB gate checks exactly the
logic the streaming queries run. That is the whole testing strategy for
the streaming surface (SURVEY.md §7.3 step 6): batch-checkable semantics,
streaming-verified mechanics.

Scale notes: windowed aggregations shuffle on (window, keys); state store
size is bounded by the watermark horizon. Session windows merge state per
key — the watermark is what lets Spark evict closed sessions, so
``session_agg`` requires one in append-mode production use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEC = "decimal(18,6)"  # <=18 precision is long-backed in Spark (~15% faster aggregation
# than BigDecimal-backed 28,6); the SUM accumulator auto-widens, so exactness
# and the DECIMAL(28,6) oracles are unaffected at any scale.

def _events_raw_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(
    spark: SparkSession, path: str, watermark: str | None = "10 minutes",
    options: dict | None = None,
) -> DataFrame:
    """events parquet as a file-source stream, with ``ts`` normalized to
    TIMESTAMP exactly like tables.table does for batch. The file source
    needs the schema up front, so a one-time batch read probes how this
    parquet encodes ``ts`` (nanos-as-long vs timestamp_ntz vs timestamp).
    ``path`` must be a DIRECTORY — the file stream source tracks arriving
    files under a base path; if it is still EMPTY at stream definition
    the probe cannot see a footer and the current generator encoding
    (timestamp_ntz) is assumed."""
    # same conf tables.table sets: lets the probe read nanos-encoded
    # parquet under ANY caller's session, not only ours
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        probed = dict(spark.read.parquet(path).dtypes).get("ts")
    except Exception:  # empty dir: UNABLE_TO_INFER_SCHEMA until files land
        probed = "timestamp_ntz"
    opts = options or {}
    if probed == "bigint":
        raw = (
            spark.readStream.schema(_events_raw_schema(T.LongType()))
            .options(**opts).parquet(path)
        )
        df = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif probed == "timestamp_ntz":
        raw = (
            spark.readStream.schema(_events_raw_schema(T.TimestampNTZType()))
            .options(**opts).parquet(path)
        )
        df = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        df = (
            spark.readStream.schema(_events_raw_schema(T.TimestampType()))
            .options(**opts).parquet(path)
        )
    if watermark:
        df = df.withWatermark("ts", watermark)
    return df


def _value_aggs():
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast(DEC)), 2).cast("double").alias("total_value"),
    ]


def tumbling_agg(events: DataFrame, width: str = "5 minutes") -> DataFrame:
    w = F.window("ts", width)
    return (
        events.groupBy(w, "event_type")
        .agg(*_value_aggs())
        .select(
            F.col("window.start").alias("w_start"),
            F.col("window.end").alias("w_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_agg(
    events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    w = F.window("ts", width, slide)
    return (
        events.groupBy(w, "user_id")
        .agg(*_value_aggs())
        .select(
            F.col("window.start").alias("w_start"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def session_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    w = F.session_window("ts", gap)
    return (
        events.groupBy(w, "user_id")
        .agg(*_value_aggs())
        .select(
            F.col("session_window.start").alias("s_start"),
            F.col("session_window.end").alias("s_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def throttle_dedup(events: DataFrame) -> DataFrame:
    """Event throttling: at most one record per (user_id, event_type,
    minute). Streaming uses ``dropDuplicatesWithinWatermark`` — state is
    evicted once the watermark passes the minute bucket, so memory is
    bounded by the watermark horizon regardless of stream length (the
    at-scale requirement). Because only the KEY columns are emitted, the
    result is survivor-independent: batch ``dropDuplicates`` (arbitrary
    survivor) and streaming first-arrival produce identical rows, which is
    what makes the batch twin oracle-able as a plain DISTINCT."""
    keyed = events.withColumn("w_minute", F.date_trunc("minute", F.col("ts")))
    keys = ["user_id", "event_type", "w_minute"]
    if keyed.isStreaming:
        deduped = keyed.dropDuplicatesWithinWatermark(keys)
    else:
        deduped = keyed.dropDuplicates(keys)
    return deduped.select(*keys)


def interval_join(
    left_events: DataFrame,
    right_events: DataFrame,
    interval: str = "10 minutes",
) -> DataFrame:
    """Stream-stream time-interval join: each purchase matched to the same
    user's clicks in the preceding ``interval`` (purchase attribution).

    Works on two streaming inputs or two static ones (the batch twin). In
    streaming mode both inputs must carry watermarks and the two-sided
    time bound is what lets Spark evict join state: click state older than
    ``interval`` past the watermark can never match a future purchase, so
    state is bounded by watermark horizon + interval — the stream-stream
    join contract at any scale. Output is append-only (no aggregation)."""
    p = left_events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    c = right_events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.expr(f"p_ts - INTERVAL {interval}"))
        & (F.col("c_ts") <= F.col("p_ts"))
    )
    return p.join(c, cond).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        F.col("p_ts").alias("purchase_ts"),
        F.col("c_ts").alias("click_ts"),
    )


def enrich_with_dim(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment: join the (possibly streaming) events side
    to a static dimension on user key. The static side broadcasts — in
    streaming mode Spark re-plans the broadcast per micro-batch, so dim
    updates between batches are picked up and NO stream state is kept
    (unlike stream-stream joins). Event-side columns only + inner join
    keeps the output append-only."""
    d = dim.select(
        F.col("c_custkey").alias("dim_key"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nationkey"),
    )
    return events.join(
        F.broadcast(d), events["user_id"] == d["dim_key"]
    ).select("event_id", "user_id", "event_type", "segment", "nationkey")


def run_available_now(
    stream_df: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming aggregation over all currently-available input
    (Trigger.AvailableNow) into an in-memory table; returns the result as a
    DataFrame. Test/diagnostic helper — production sinks use
    ``writeStream.format('parquet'/'kafka')`` with the same plan."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)
