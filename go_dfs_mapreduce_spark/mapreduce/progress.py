"""Job progress reporting (SURVEY.md §2.2 F13).

The reference streams mapper/reducer completion counts to the client every
3 s over a long-lived TCP connection (cn/mr_actions.go:293-343). Spark
already tracks stages/tasks centrally; this helper surfaces the same
information as a polling callback without any network plumbing.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable

from pyspark.sql import SparkSession


def watch_progress(
    spark: SparkSession,
    callback: Callable[[dict], None],
    interval_s: float = 3.0,
) -> Callable[[], None]:
    """Start polling the status tracker; invoke ``callback`` with a
    progress dict every ``interval_s`` (the reference's 3 s cadence,
    cn/mr_actions.go:341). Returns a stop function."""
    tracker = spark.sparkContext.statusTracker()
    stop = threading.Event()
    # cumulative per-stage failure counts — the F14 surface: the reference
    # keeps mf/rf failure lists in its Job_map and prints them in every
    # update (cn/mr_actions.go:293-343); Spark's stage info is transient,
    # so the watcher accumulates failures across polls and keeps reporting
    # them after the stage leaves the active set
    stage_failures: dict[int, int] = {}

    def loop() -> None:
        while not stop.is_set():
            active = tracker.getActiveStageIds()
            report = {"active_stages": len(active), "stages": []}
            for sid in active:
                info = tracker.getStageInfo(sid)
                if info:
                    if info.numFailedTasks > 0:
                        stage_failures[sid] = max(
                            stage_failures.get(sid, 0), info.numFailedTasks
                        )
                    report["stages"].append(
                        {
                            "stage": sid,
                            "tasks": info.numTasks,
                            "completed": info.numCompletedTasks,
                            "failed": info.numFailedTasks,
                        }
                    )
            report["failed_tasks"] = sum(stage_failures.values())
            report["failures"] = [
                f"stage {sid}: {n} failed task(s)"
                for sid, n in sorted(stage_failures.items())
            ]
            callback(report)
            stop.wait(interval_s)

    t = threading.Thread(target=loop, daemon=True)
    t.start()

    def stopper() -> None:
        stop.set()
        t.join(timeout=interval_s + 1)

    return stopper
