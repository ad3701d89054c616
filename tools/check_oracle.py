"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, sorted column
names, and an order-insensitive multiset of normalized rows (exact match —
stricter than a tolerant compare, because the driver hashes values).

Usage:
    python tools/check_oracle.py [--sf-dir /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import datetime as dt
import decimal
import math
import os
import sys
import time
from collections import Counter

import duckdb

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def norm_value(v):
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr round-trip: exact doubles must match bit-for-bit
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_value(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def norm_rows(cols, rows):
    """Sort columns by name, normalize values, return multiset of tuples."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm_value(r[i]) for i in order) for r in rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--fast",
        action="store_true",
        help="skip the streaming-engine rows (*_live, the chunk "
        "source/sink streams, the foreachBatch upsert) — they run "
        "multi-batch micro-batch queries and dominate the full gate's "
        "wall clock (~2/3 of ~20 min at sf0.01). Inner-loop tier only: "
        "ALWAYS run the full gate before rotating a streaming query "
        "into the driver showcase.",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as mod
    from go_dfs_mapreduce_spark.session import get_spark

    qs = mod.queries()
    oracles = mod.oracle_sql()
    names = args.names or sorted(qs)
    if args.fast:
        slow = {
            "stream_dfs_chunk_tail",
            "stream_into_dfs_chunks",
            "stream_upsert_latest_state",
        }
        skipped = [
            n for n in names if n.endswith("_live") or n in slow
        ]
        names = [n for n in names if n not in set(skipped)]
        print(
            f"--fast: skipping {len(skipped)} streaming-engine queries: "
            + " ".join(sorted(skipped))
        )

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_noracle = 0
    for name in names:
        if name not in qs:
            print(f"  {name}: NOT REGISTERED")
            n_fail += 1
            continue
        t0 = time.time()
        try:
            df = qs[name](spark, args.sf_dir)
            s_cols = df.columns
            s_rows = df.collect()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        # Driver fidelity: the driver canonicalizes results by sorting a
        # pandas frame on every column, which raises "unhashable type" on
        # array/map/struct cells (observed in CORRECTNESS_r02). Flag any
        # complex-typed result column as a failure even though this
        # replica's tuple-normalization could compare it.
        complex_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if complex_cols:
            print(
                f"FAIL {name}: complex-typed result columns {complex_cols} "
                "(driver cannot hash these; serialize with array_join/to_json)"
            )
            n_fail += 1
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"  ok {name}: rows-only ({len(s_rows)} rows, {spark_t:.1f}s, no oracle)")
            n_noracle += 1
            continue
        try:
            rel = con.sql(oracles[name])
            # Driver fidelity: the driver fetches DuckDB results through
            # Arrow, where HUGEINT (e.g. SUM over BIGINT) arrives as
            # decimal128 -> Python Decimal -> float repr under norm_value,
            # diverging from Spark's LongType int. fetchall() returns plain
            # ints and is structurally blind to that class (the
            # dataset_export_manifest r4 driver-red); fetch via Arrow so the
            # replica sees the same types the driver hashes.
            tbl = rel.arrow()
            o_cols = list(tbl.column_names)
            o_cells = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
            o_rows = list(zip(*o_cells)) if o_cells else []
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue

        problems = []
        if len(s_rows) != len(o_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(o_rows)}")
        if sorted(s_cols) != sorted(o_cols):
            problems.append(f"cols spark={sorted(s_cols)} duckdb={sorted(o_cols)}")
        else:
            sm = norm_rows(s_cols, s_rows)
            om = norm_rows(o_cols, o_rows)
            if sm != om:
                only_s = list((sm - om).items())[:3]
                only_o = list((om - sm).items())[:3]
                problems.append(f"values differ; spark-only={only_s} duckdb-only={only_o}")
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows, spark {spark_t:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
