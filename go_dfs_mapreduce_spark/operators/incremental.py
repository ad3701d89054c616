"""Incremental-maintenance operators: CDC MERGE, SCD Type 2, partial-agg
rollup merge.

The reference engine is batch-only (store → MR job → retrieve); a user
migrating a warehouse onto this engine also needs the three incremental
shapes every production pipeline hits, none of which the reference offers:

- merge_upsert_orders : MERGE INTO semantics (upsert + delete from a CDC
  change feed) expressed as one full-outer join — the copy-on-write plan
  Spark executes for table formats' MERGE. The change feed is derived
  deterministically from ``orders`` so the oracle can rebuild it.
- scd2_user_status : slowly-changing-dimension Type 2 history build —
  collapse each user's event_type stream into validity intervals
  [valid_from, valid_to) via gaps-and-islands (lag → change flag →
  running sum → island agg → lead). The standard dimension-history
  operator for auditable attribute changes.
- incremental_rollup_merge : incremental materialized-view maintenance —
  per-(day, event_type) partial aggregates computed separately for the
  settled base and a late-arriving delta window, then MERGED by summing
  partials. Proves the rollup's aggregates are associative, i.e. the
  view can be maintained by touching only delta partitions at 100 TB.

Scale notes: MERGE's one shuffle is the full-outer join on the merge key
(at deployment the base side is partition-pruned to touched partitions
first — ``Warehouse.overwrite_partitions`` is the matching writer).
SCD2 shuffles once on user_id; all three window passes reuse that
partitioning and a single (ts, event_id) sort order, and the island
aggregation is partial-aggregated before its exchange. The rollup merge
scans events ONCE (base/delta split is a grouping flag, not two reads);
stage 1 partials are map-side combined, stage 2 re-aggregates rows whose
count is bounded by |groups| x 2, independent of event volume. All money
/ value arithmetic is exact (DECIMAL or micro-unit integers) and cast to
DOUBLE only at the output boundary, per the registry determinism rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import table

# --- CDC MERGE -----------------------------------------------------------
# Change feed derived from orders by key residue (deterministic, so the
# DuckDB oracle rebuilds the identical feed):
#   key % 10 == 0     -> D (delete the base row)
#   key % 10 in (1,2) -> U (update: price * 1.10, status 'U')
#   key % 10 == 3     -> I (insert a new row under key + 100_000_000)
_INSERT_OFFSET = 100_000_000

MERGE_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
),
changes AS (
  SELECT CASE WHEN o_orderkey % 10 = 3
              THEN o_orderkey + {_INSERT_OFFSET} ELSE o_orderkey END AS k,
         o_custkey AS ch_custkey,
         CASE o_orderkey % 10 WHEN 0 THEN 'D' WHEN 3 THEN 'I' ELSE 'U' END AS op,
         CASE o_orderkey % 10
           WHEN 0 THEN NULL
           WHEN 3 THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(22,4))
           ELSE CAST(CAST(o_totalprice AS DECIMAL(18,2))
                     * CAST(1.10 AS DECIMAL(3,2)) AS DECIMAL(22,4))
         END AS new_price
  FROM orders WHERE o_orderkey % 10 <= 3
)
SELECT COALESCE(b.o_orderkey, c.k) AS o_orderkey,
       COALESCE(b.o_custkey, c.ch_custkey) AS o_custkey,
       CASE WHEN c.op = 'U' THEN 'U'
            WHEN c.op = 'I' THEN 'N'
            ELSE b.o_orderstatus END AS o_orderstatus,
       CASE WHEN c.op IN ('U', 'I') THEN CAST(c.new_price AS DOUBLE)
            ELSE CAST(b.price AS DOUBLE) END AS price
FROM base b FULL JOIN changes c ON b.o_orderkey = c.k
WHERE c.op IS NULL OR c.op <> 'D'
"""


def merge_changes(orders: DataFrame) -> DataFrame:
    """The derived CDC feed: DataFrame[k, ch_custkey, op, new_price]."""
    m = F.col("o_orderkey") % 10
    return orders.where(m <= 3).select(
        F.when(m == 3, F.col("o_orderkey") + _INSERT_OFFSET)
        .otherwise(F.col("o_orderkey"))
        .alias("k"),
        F.col("o_custkey").alias("ch_custkey"),
        F.when(m == 0, F.lit("D"))
        .when(m == 3, F.lit("I"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.when(m == 0, F.lit(None).cast("decimal(22,4)"))
        .when(m == 3, F.col("o_totalprice").cast("decimal(18,2)").cast("decimal(22,4)"))
        .otherwise(
            (
                F.col("o_totalprice").cast("decimal(18,2)")
                * F.lit("1.10").cast("decimal(3,2)")
            ).cast("decimal(22,4)")
        )
        .alias("new_price"),
    )


@query("merge_upsert_orders", oracle=MERGE_ORACLE)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO base USING changes ON key, as one full-outer join:
    matched+D rows drop, matched+U rows take the change's values,
    unmatched changes (I) insert, untouched base rows pass through.
    This is exactly the copy-on-write MERGE plan (one shuffle on the
    merge key); at deployment the base scan is partition-pruned to the
    partitions the feed touches and rewritten via
    ``Warehouse.overwrite_partitions``."""
    orders = table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    ).alias("b")
    ch = merge_changes(orders).alias("c")
    op = F.col("c.op")
    return (
        base.join(ch, F.col("b.o_orderkey") == F.col("c.k"), "full_outer")
        .where(op.isNull() | (op != "D"))
        .select(
            F.coalesce(F.col("b.o_orderkey"), F.col("c.k")).alias("o_orderkey"),
            F.coalesce(F.col("b.o_custkey"), F.col("c.ch_custkey")).alias(
                "o_custkey"
            ),
            F.when(op == "U", F.lit("U"))
            .when(op == "I", F.lit("N"))
            .otherwise(F.col("b.o_orderstatus"))
            .alias("o_orderstatus"),
            F.when(
                op.isin("U", "I"), F.col("c.new_price").cast("double")
            )
            .otherwise(F.col("b.price").cast("double"))
            .alias("price"),
        )
    )


# --- SCD Type 2 ----------------------------------------------------------

SCD2_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev IS DISTINCT FROM event_type THEN 1 ELSE 0 END
    AS chg
  FROM ordered
),
islands AS (
  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS UNBOUNDED PRECEDING) AS version
  FROM flagged
),
runs AS (
  SELECT user_id, CAST(version AS BIGINT) AS version,
         MIN(event_type) AS event_type, MIN(ts) AS valid_from
  FROM islands GROUP BY user_id, version
)
SELECT user_id, version, event_type, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version)
         AS valid_to,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version) IS NULL
         AS is_current
FROM runs
"""


@query("scd2_user_status", oracle=SCD2_ORACLE)
def scd2_user_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 history: collapse each user's event_type stream into
    validity intervals via gaps-and-islands. (ts, event_id) is a total
    order within a user, so versions are deterministic; event_type is
    constant within an island, so MIN() just surfaces it. One exchange
    on user_id feeds every window (same partition key, same sort); the
    island groupBy partial-aggregates runs before its exchange."""
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 0
        )
        .otherwise(1)
        .alias("chg"),
    )
    islands = flagged.select(
        "user_id",
        "ts",
        "event_type",
        F.sum("chg")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("version"),
    )
    runs = islands.groupBy("user_id", "version").agg(
        F.min("event_type").alias("event_type"),
        F.min("ts").alias("valid_from"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    lead_from = F.lead("valid_from").over(wv)
    return runs.select(
        "user_id",
        F.col("version").cast("bigint").alias("version"),
        "event_type",
        "valid_from",
        lead_from.alias("valid_to"),
        lead_from.isNull().alias("is_current"),
    )


# --- incremental rollup merge -------------------------------------------
# value is an arbitrary DOUBLE: exactness comes from micro-unit integers
# (ROUND(value * 1e6) as BIGINT; both engines round identically off the
# half-way measure-zero set — the stats module's established pattern),
# summed as DECIMAL(38,0) so the merge is order-independent. The output
# divides the exact micro total by 1e6 in DOUBLE (totals < 2^53, so the
# quotient is a single deterministic IEEE operation).

ROLLUP_MERGE_ORACLE = """
WITH cut AS (SELECT MAX(ts) - INTERVAL 7 DAY AS cutoff FROM events),
partials AS (
  SELECT CAST(ts AS DATE) AS day, event_type, ts >= cutoff AS is_delta,
         COUNT(*) AS n,
         SUM(CAST(CAST(ROUND(value * 1000000) AS BIGINT) AS DECIMAL(38,0)))
           AS vmicro
  FROM events, cut
  GROUP BY 1, 2, 3
)
SELECT day, event_type,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(CAST(SUM(vmicro) AS DOUBLE) / 1000000.0 AS DOUBLE) AS value_sum
FROM partials GROUP BY day, event_type
"""


@query("incremental_rollup_merge", oracle=ROLLUP_MERGE_ORACLE)
def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain a (day, event_type) rollup incrementally: partials for the
    settled base (ts < cutoff) and the hot last-7-days delta are computed
    independently, then merged by summing counts and exact micro-unit
    value totals. The oracle recomputes the rollup in one pass — hash
    equality IS the proof that merge(base_partial, delta_partial) ==
    recompute, i.e. the view needs only delta partitions touched on each
    refresh. One full scan (the base/delta split is a grouping flag, not
    two reads; the cutoff needs its own ts-column-pruned max pass,
    broadcast as one scalar), two map-side-combined aggregations;
    stage-2 input is <= 2 rows per group."""
    events = table(spark, sf_dir, "events")
    cut = events.agg(
        (F.max("ts") - F.expr("INTERVAL 7 DAY")).alias("cutoff")
    )
    micro = "CAST(CAST(ROUND(value * 1000000) AS BIGINT) AS DECIMAL(38,0))"
    partials = (
        events.crossJoin(F.broadcast(cut))
        .groupBy(
            F.col("ts").cast("date").alias("day"),
            "event_type",
            (F.col("ts") >= F.col("cutoff")).alias("is_delta"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr(micro)).alias("vmicro"),
        )
    )
    return partials.groupBy("day", "event_type").agg(
        F.sum("n").cast("bigint").alias("n_events"),
        (F.sum("vmicro").cast("double") / F.lit(1000000.0))
        .cast("double")
        .alias("value_sum"),
    )
