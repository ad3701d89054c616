"""Mid-job per-reducer result pull (reference parity: the client fetches
each reducer's blob AS SOON AS that reducer finishes, not at job end —
`cl/mr_actions.go:138-219` opens one download per completed reducer while
others are still running; the storage node serves the blob from
`sn/mr_actions.go:510-544`).

The Spark-native twin rests on one plan fact shared by every reduce path
in ``MapReduceJob._plan``: **each r_id's rows live in exactly one output
partition** — the Arrow path is ``groupBy("r_id").applyInPandas`` (hash
exchange on r_id; a group is never split) and both lowered paths end in
a ``Window.partitionBy("r_id")`` rank forcing the same exchange. So the
driver pulls ONE RESULT PARTITION PER JOB (``sc.runJob(rdd, list, [p])``
— the mechanism behind ``toLocalIterator``, made partition-explicit) and
closes every reducer file in partition p at p's boundary: the reduce
work for partition p+1 has not run yet, so each blob is complete on disk
while later reducers are still pending — the reference's latency
profile. Partition-explicit pulls matter: a plain row iterator can only
detect "this reducer ended" by fetching the NEXT row, which would force
the next partition's reducers to run first.

``tests/test_cli.py::test_mr_streams_reducer_files_mid_job`` proves the
behavior the hard way — a reducer that refuses to produce until an
earlier reducer's pulled file exists still completes.

A reducer id reappearing after its file closed would mean the plan fact
broke (someone re-planned the reduce without r_id-keyed output); that is
a fail-loud error, never a silent mis-ordered file.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame


def stream_reducer_results(
    result: DataFrame,
    out_dir: str,
    on_complete: Callable[[int, str], None] | None = None,
) -> list[int]:
    """Write ``result`` (DataFrame[r_id, seq, line]) as one ``r{r_id}``
    file per reducer under ``out_dir``, pulling result partitions one
    job at a time and closing each reducer's file at its partition's
    end — the streamed mid-job pull. ``on_complete(r_id, path)`` fires
    at each close, while later reducers may still be running. Returns
    reducer ids in completion order (reducers with no output produce no
    file, matching the reference's empty-blob behavior)."""
    os.makedirs(out_dir, exist_ok=True)
    # narrow per-partition sort: groups become contiguous and seq-ordered
    # without an exchange, so partition-at-a-time laziness is preserved
    stream = result.sortWithinPartitions("r_id", "seq")
    sc = result.sparkSession.sparkContext
    rdd = stream.rdd
    done: list[int] = []
    cur_id: int | None = None
    cur_fh = None

    def _close() -> None:
        nonlocal cur_id, cur_fh
        if cur_fh is not None:
            cur_fh.close()
            done.append(cur_id)
            if on_complete is not None:
                on_complete(cur_id, os.path.join(out_dir, f"r{cur_id}"))
        cur_id, cur_fh = None, None

    try:
        for p in range(rdd.getNumPartitions()):
            # one Spark job per result partition; shuffle map output is
            # computed once and reused across these jobs
            for row in sc.runJob(rdd, lambda rows: list(rows), [p]):
                if row.r_id != cur_id:
                    if row.r_id in done:
                        raise RuntimeError(
                            f"reducer {row.r_id} reappeared after its "
                            "file closed: reduce output is no longer "
                            "r_id-partitioned (see module docstring)"
                        )
                    _close()
                    cur_id = int(row.r_id)
                    cur_fh = open(
                        os.path.join(out_dir, f"r{cur_id}"), "w"
                    )
                cur_fh.write(row.line + "\n")
            # partition boundary: every reducer in it is complete NOW —
            # never wait for the next partition's rows to learn that
            _close()
    finally:
        if cur_fh is not None:
            cur_fh.close()
    return done
