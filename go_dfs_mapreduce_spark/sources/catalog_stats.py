"""Catalog statistics: CBO food.

At 100 TB the optimizer's join decisions are only as good as its size
estimates. For file-based scans Spark gets raw bytes from the file index
for free, but it CANNOT see through a filter: without column statistics a
``Filter`` node inherits its child's size, so a 1 %-selective dimension
filter still looks 100× too big and a cheap broadcast is planned as a
sort-merge join. ``ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS``
records row counts + per-column min/max/NDV in the catalog; with
``spark.sql.cbo.enabled`` the optimizer then scales filtered relations by
real selectivity and picks the strategy the data deserves.

``register_parquet_catalog`` + ``analyze_tables`` wire the driver's
parquet fixtures into the session catalog so the ANALYZE path is the
same one a production deployment runs nightly over its warehouse.
tests/test_catalog_plans.py::test_cbo_column_stats_flip_join_strategy
pins the decision flip at the plan level (and that results are
unchanged — stats steer the physical strategy, never the semantics).

The reference has no optimizer at all — plugin jobs hand-schedule their
data movement (cn/mr_actions.go:29-52); statistics-driven planning is
part of the §2.4 north-star surface the Spark engine adds.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)


def register_parquet_catalog(
    spark: SparkSession,
    db: str,
    sf_dir: str,
    tables: tuple[str, ...] = TPCH_TABLES,
) -> None:
    """Register ``sf_dir``'s parquet files as external catalog tables in
    database ``db`` (created if absent, table-by-table idempotent). The
    files are not copied — the catalog entry just gives ANALYZE a place
    to hang statistics."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    # listTables(db) also returns the session's GLOBAL temp views (e.g.
    # the CLI sql verb registers views named region/nation/...), which
    # would wrongly satisfy the idempotence check — count only real
    # tables that live in this database
    existing = {
        t.name for t in spark.catalog.listTables(db) if not t.isTemporary
    }
    for t in tables:
        if t not in existing:
            spark.sql(
                f"CREATE TABLE {db}.{t} USING parquet "
                f"LOCATION '{sf_dir}/{t}.parquet'"
            )


def analyze_tables(
    spark: SparkSession,
    db: str,
    tables: tuple[str, ...] = TPCH_TABLES,
    columns: bool = True,
) -> None:
    """Run ANALYZE over the catalog tables: row count + total size
    always; per-column min/max/NDV/null-count when ``columns`` (the
    stats CBO's filter-selectivity estimation needs). One scan per
    table; at warehouse scale this is the nightly stats job."""
    suffix = " FOR ALL COLUMNS" if columns else ""
    for t in tables:
        spark.sql(f"ANALYZE TABLE {db}.{t} COMPUTE STATISTICS{suffix}")
