"""Loaders for the driver's deterministic parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under /root/testdata/sf*/.

The reference's equivalent is its file registry (cn/struct.go:18-31) plus
`retrieve` (cl/dfs_actions.go:297-495); here a table is just a parquet path
and Spark's catalog/datasource machinery replaces the chunk registry.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Session-scoped memo of the LAZY reader DataFrames (r15, guide §1.2/§6):
# every `spark.read.parquet(path)` call builds a fresh InMemoryFileIndex and
# re-infers the schema from the footer — measured ~240 ms of driver-side
# time PER CALL at sf0.1, paid inside every query builder (a 3-table join
# paid it three times per invocation). The memo key carries the
# applicationId (a dead session's plans must not leak into a new one) and
# the source file's (size, mtime_ns), so a regenerated/appended corpus
# misses and re-reads. Values are unexecuted plans — every action still
# scans the parquet input; nothing here caches rows or results.
_READER_MEMO: dict[tuple, DataFrame] = {}


def _table_stat(path: str) -> tuple:
    """(size, mtime_ns) change token of a table path; directories token on
    the dir's own mtime (appends create/remove entries, bumping it)."""
    try:
        st = os.stat(path)
    except OSError:
        return (0, 0)
    return (st.st_size, st.st_mtime_ns)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = (spark.sparkContext.applicationId, os.path.abspath(path), _table_stat(path))
    cached = _READER_MEMO.get(key)
    if cached is not None:
        return cached
    for stale in [k for k in _READER_MEMO if k[:2] == key[:2] and k != key]:
        del _READER_MEMO[stale]
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark rejects by
        # default. The conf is runtime-settable, and setting it HERE (not
        # only in session.py) means the queries work under ANY caller's
        # SparkSession — including the grading driver's.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        from pyspark.sql import functions as F

        if ts_type == "bigint":
            # TIMESTAMP(NANOS) read as long (session.py nanosAsLong);
            # convert to microsecond timestamp with exact integer division
            # — the generator emits whole-microsecond values, so lossless.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # timestamp[us] with no zone reads as TIMESTAMP_NTZ under
            # Spark's inferTimestampNTZ default. Queries (and the round-1/2
            # green baselines) were written against TIMESTAMP; the cast
            # keeps the wall-clock fields, so rendered values still match
            # DuckDB's naive reading of the same parquet in any session tz.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _READER_MEMO[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def _parse_bytes(v: str) -> int:
    """Spark byte-size conf values: plain bytes ('134217728') or suffixed
    ('128m', '1g', '512k', optionally trailing 'b')."""
    s = v.strip().lower().removesuffix("b")
    mult = 1
    for suffix, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("t", 1 << 40)):
        if s.endswith(suffix):
            s, mult = s[: -1], m
            break
    return max(1, int(float(s) * mult))


def spread_scan(
    spark: SparkSession, sf_dir: str, name: str, df: DataFrame
) -> DataFrame:
    """Scale-adaptive spread for compute-heavy consumers of a table scan
    (r15, guide §2.5 "input skew: one huge unsplittable file ... repartition
    immediately after the read").

    The gate corpora are single-file, SINGLE-ROW-GROUP parquet — a row
    group is the unit of scan parallelism, so every downstream expression
    Spark pipelines into the scan (decimal array folds, md5 lanes, regexp)
    runs as ONE task while the other cores idle. When the table's byte
    size yields fewer scan splits than the session's cores, round-robin
    repartition to the core count so per-row compute AFTER the exchange
    runs at full parallelism. At any real scale the estimate (bytes /
    maxPartitionBytes) exceeds the core count and this is a NO-OP — no
    exchange is added on a 100 TB corpus; the cluster-scale spread is the
    file layout itself. The exchange only ever carries the pruned columns
    the consumer selected, and a round-robin repartition of a parquet scan
    is deterministic under task retry (stable input order + the built-in
    sort-before-repartition)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(path):
            size = sum(
                os.path.getsize(os.path.join(root, f))
                for root, _, files in os.walk(path)
                for f in files
                if not f.startswith(("_", "."))
            )
        else:
            size = os.path.getsize(path)
    except OSError:
        return df
    max_split = _parse_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    )
    cores = max(spark.sparkContext.defaultParallelism, 1)
    est_splits = max(1, (size + max_split - 1) // max_split)
    if est_splits >= cores:
        return df
    return df.repartition(cores)


def spread_frame(df: DataFrame) -> DataFrame:
    """Scale-adaptive spread for a compute-heavy Arrow/Python stage fed by
    an arbitrary (already pruned, few-column) frame — the ``spread_scan``
    idea for inputs that are not a direct table scan (r15, guide §2.5).

    The gate corpora are single-file, single-row-group parquet, so a
    ``select("doc_id").mapInPandas(...)`` decode chain runs as ONE task
    while the other cores idle. When the frame's input files yield fewer
    scan splits than the session's cores, round-robin repartition to the
    core count; at any real corpus scale the scan already has >= cores
    splits and this is a NO-OP. The exchange carries only the pruned
    columns (a doc_id per row for the decode chains), and a round-robin
    repartition of a deterministic scan is retry-safe (built-in
    sort-before-repartition).

    r16 (ADVICE r15): the split estimate comes from the frame's
    input-file METADATA (``inputFiles()`` + on-disk bytes /
    maxPartitionBytes — exactly ``spread_scan``'s arithmetic), not from
    ``df.rdd.getNumPartitions()``, which forced a driver-side physical
    planning + RDD conversion of the frame on every call and could
    disagree with the AQE-finalized runtime partition count. Every
    current caller feeds a pruned single-table scan, where the file
    estimate IS the scan's split count. A frame with no file inputs
    (in-memory fixtures in tests) is left untouched — its partitioning
    came from createDataFrame, not a collapsed file scan."""
    spark = df.sparkSession
    cores = max(spark.sparkContext.defaultParallelism, 1)
    files = df.inputFiles()
    size = 0
    for uri in files:
        p = uri.removeprefix("file:")
        try:
            size += os.path.getsize(p)
        except OSError:
            # non-local URI (hdfs/s3): size unknown here — spread, since
            # the only reason a caller opted in is a collapsed tiny scan,
            # and at real scale the estimate branch below never triggers
            # anyway (remote deployments pass >= cores splits)
            return df.repartition(cores)
    if not files:
        return df
    max_split = _parse_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    )
    est_splits = max(1, (size + max_split - 1) // max_split)
    return df.repartition(cores) if est_splits < cores else df


def table_row_count(spark: SparkSession, sf_dir: str, name: str) -> int:
    """EXACT row count of a table from parquet footer metadata — the
    num_rows every writer commits per file — with zero Spark jobs.

    Calibration scalars (SRP signature width, IVF cell count) need only
    |corpus|, and ``df.count()`` spends a whole scan job (~150-300 ms
    scheduling floor + scan) to learn what the footers already state
    (r15, guide §5: the driver should do almost no data work — this is
    metadata, not data). Falls back to ``count()`` for non-parquet or
    unreadable layouts. Memoized per (session, path, file stat) like the
    reader plans above, so repeated builder calls in one session don't
    re-walk footers."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = ("rowcount", os.path.abspath(path), _table_stat(path))
    hit = _ROWCOUNT_MEMO.get(key)
    if hit is not None:
        return hit
    n = -1
    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            n = 0
            for root, _, files in os.walk(path):
                for f in files:
                    if f.endswith(".parquet") and not f.startswith(("_", ".")):
                        n += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
        else:
            n = pq.ParquetFile(path).metadata.num_rows
    except Exception:
        n = -1
    if n < 0:
        n = table(spark, sf_dir, name).count()
    _ROWCOUNT_MEMO[key] = n
    return n


_ROWCOUNT_MEMO: dict[tuple, int] = {}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql can reference them."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
