"""Explain-plan audits: machine-checkable assertions about the physical
plan — the habit the brief demands ("explain the plan and iterate until
it's the plan you'd want"). Used by tests/test_plans.py to pin down:

- predicate pushdown reached the parquet scan (PushedFilters non-empty)
- column pruning happened (ReadSchema only carries what's needed)
- small dims broadcast instead of shuffling (BroadcastHashJoin)
- no Python UDF in pipelines that are supposed to be codegen-only
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def audit_plan(df: DataFrame) -> dict:
    plan = formatted_plan(df)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "plan": plan,
        "n_broadcast_joins": plan.count("BroadcastHashJoin"),
        "n_sortmerge_joins": plan.count("SortMergeJoin"),
        "n_exchanges": plan.count("Exchange"),
        "pushed_filters": [p for p in pushed if p.strip()],
        "read_columns": sorted(
            {c.split(":")[0] for s in read_schemas for c in s.split(",") if c}
        ),
        "has_python_worker": "BatchEvalPython" in plan
        or "ArrowEvalPython" in plan
        or "MapInPandas" in plan
        or "FlatMapGroupsInPandas" in plan,
    }
