"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H-style pricing summary) on
the sf0.001 tables. ``queries()``/``oracle_sql()`` expose the full operator
registry built in :mod:`go_dfs_mapreduce_spark` (see SURVEY.md §2 for the
capability inventory each entry maps to).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from go_dfs_mapreduce_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs, _ = registry.collect()
    return qs["q1_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs, _ = registry.collect()
    return qs


def oracle_sql() -> dict[str, str]:
    _, oracles = registry.collect()
    return oracles
