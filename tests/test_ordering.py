"""Global-sort ordering pin (the driver's hash compare is
order-insensitive, so the sortedness claim needs its own test)."""

from __future__ import annotations


def test_global_sort_is_actually_sorted(spark, sf_dir):
    from go_dfs_mapreduce_spark.operators.relational import global_sort_orders

    rows = [(r.od, r.o_orderkey) for r in global_sort_orders(spark, sf_dir).collect()]
    assert rows == sorted(rows)
    assert len(rows) > 0
