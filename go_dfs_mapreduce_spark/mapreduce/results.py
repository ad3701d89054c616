"""Mid-job per-reducer result pull (reference parity: the client fetches
each reducer's blob AS SOON AS that reducer finishes, not at job end —
`cl/mr_actions.go:138-219` opens one download per completed reducer while
others are still running; the storage node serves the blob from
`sn/mr_actions.go:510-544`).

The Spark-native twin exploits a plan fact of the HOT reduce paths in
``MapReduceJob._plan``: each r_id's rows live in exactly one output
partition — the Arrow path is ``groupBy("r_id").applyInPandas`` (hash
exchange on r_id; a group is never split) and the ``PerKeyIntSumFormat``
lowering ends in a ``Window.partitionBy("r_id")`` rank forcing the same
exchange. Where that holds, the driver pulls result partitions as
CONCURRENT single-partition jobs (``sc.runJob(rdd, list, [p])`` from a
bounded thread pool — the mechanism behind ``toLocalIterator``, made
partition-explicit and parallel) and writes every reducer file in a
partition the moment that partition's job returns. Reducers therefore
EXECUTE in parallel (the reference schedules all R reducers at once) and
each blob is complete on disk in reducer-finish order while stragglers
are still running — the reference's latency profile. Design points:

- Partition-explicit pulls: a plain row iterator can only detect "this
  reducer ended" by fetching the NEXT row, which would force another
  partition's reducers to run first. Sequential per-partition pulls fix
  that but serialize reducer execution (measured: a 6 s straggler in
  the first-drained partition delayed every other blob behind it); the
  bounded pool gives both properties.
- AQE partition coalescing is pinned OFF for the pull's plan: it would
  merge small reducers into one task, collapsing the per-reducer pull
  back into a batch (measured: a 6 s straggler delayed every blob to
  job end at gate sizes). At real output sizes coalescing is a no-op
  anyway — the advisory partition size keeps big reducers separate.
- Driver memory: each pull job STREAMS its partition's rows through the
  job-result socket (``sc.runJob`` minus its materializing ``list()`` —
  see ``_iter_partition``) and the writer appends each row to the
  reducer file as it arrives, so the PYTHON driver holds O(socket
  buffer) rows regardless of partition size or PULL_POOL. The JVM
  driver transiently unrolls each in-flight partition's serialized
  bytes before serving them (the same per-partition collect
  ``toLocalIterator`` does — Spark has no public single-partition lazy
  serve), so the JVM-side bound is PULL_POOL x max serialized partition
  size: at the reference's 64 MiB blob scale ~0.5 GB at the default
  pool. PULL_POOL is settable via ``GO_DFS_MR_PULL_POOL`` (ADVICE r14)
  for deployments with bigger reducer outputs; 1 reproduces
  ``toLocalIterator``'s memory profile while keeping finish-order
  writes.

The invariant is NOT guaranteed for an arbitrary ``ReduceExpr`` lowering
(e.g. log_analyzer's builder unions several relational branches whose
output partitionings can disagree, splitting one r_id across pulled
partitions — observed live on the CLI). The writer detects the split at
file-claim time and FALLS BACK to the classic ordered drain (global
orderBy(r_id, seq) + toLocalIterator): every file is rewritten complete
and correctly ordered, at the cost of job-end latency — correctness
never rides on the plan shape. ``on_complete`` may re-fire for a reducer
whose phase-1 file was rewritten by the fallback.

``tests/test_cli.py::test_mr_streams_reducer_files_mid_job`` proves the
mid-job behavior the hard way — a reducer that refuses to produce until
an earlier reducer's pulled file exists still completes — and
``test_mr_cli_lowered_log_analyzer_streams_per_reducer`` pins the
fallback: the lowered log_analyzer CLI run completes with files byte-
identical to the unlowered Arrow reduce.
"""

from __future__ import annotations

import os
import threading
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor, as_completed

from pyspark.sql import DataFrame

# concurrent single-partition pull jobs; local[32] handles 8 comfortably
# and a cluster scheduler treats them as ordinary FIFO jobs. Also the
# JVM-side memory knob: at most this many partitions' serialized bytes
# are in flight at once (the Python side streams row-at-a-time either
# way). Overridable per deployment via GO_DFS_MR_PULL_POOL.
PULL_POOL = int(os.environ.get("GO_DFS_MR_PULL_POOL", "8") or "8")


def _iter_partition(sc, rdd, p: int):
    """Lazily stream one partition's rows: ``sc.runJob(rdd, f, [p])``
    without the materializing ``list()`` around the result socket.
    PySpark's runJob already serves job results through a local socket
    (`_load_from_socket`) and only the trailing ``list()`` makes it
    O(partition) in driver memory — iterating the socket directly keeps
    the pull O(buffer). Falls back to the materializing runJob if the
    private helpers move (they are stable across pyspark 3.x/4.x; the
    fallback trades memory, never correctness). A moved helper shows up
    as ImportError/AttributeError; a changed JVM-side runJob SIGNATURE
    as a plain Py4JError ("method does not exist") — all pre-iteration,
    so all safely degrade to the materializing path. A GENUINE job
    failure at this synchronous call is a Py4JJavaError and must
    propagate, not re-run the failing job through the fallback."""
    from py4j.protocol import Py4JError, Py4JJavaError

    try:
        from pyspark.rdd import _load_from_socket

        mapped = rdd.mapPartitions(lambda it: it)
        sock_info = sc._jvm.PythonRDD.runJob(
            sc._jsc.sc(), mapped._jrdd, [p]
        )
        return _load_from_socket(sock_info, mapped._jrdd_deserializer)
    except Py4JJavaError:
        raise
    except (ImportError, AttributeError, Py4JError):
        return iter(sc.runJob(rdd, lambda it: list(it), [p]))


class _SplitReducer(RuntimeError):
    """A reducer's rows turned up in two result partitions: the plan is
    not r_id-partitioned, so per-partition pulls cannot produce complete
    blobs — switch to the ordered fallback drain."""


def stream_reducer_results(
    result: DataFrame,
    out_dir: str,
    on_complete: Callable[[int, str], None] | None = None,
) -> list[int]:
    """Write ``result`` (DataFrame[r_id, seq, line]) as one ``r{r_id}``
    file per reducer under ``out_dir``, pulling result partitions as
    concurrent jobs and closing each reducer's file the moment its
    partition's job returns — the streamed mid-job pull.
    ``on_complete(r_id, path)`` fires at each close (serialized under a
    lock), while straggler reducers are still running. Returns reducer
    ids in completion order (reducers with no output produce no file,
    matching the reference's empty-blob behavior). If the result plan is
    not r_id-partitioned (possible for custom ``ReduceExpr`` lowerings),
    the writer detects the split and transparently redoes the drain in
    ordered job-end mode — same files, no mid-job latency win."""
    os.makedirs(out_dir, exist_ok=True)
    # narrow per-partition sort: groups become contiguous and seq-ordered
    # without an exchange, so partition-at-a-time laziness is preserved
    stream = result.sortWithinPartitions("r_id", "seq")
    spark = result.sparkSession
    sc = spark.sparkContext
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key)
    spark.conf.set(coalesce_key, "false")
    try:
        try:
            return _drain(stream.rdd, sc, out_dir, on_complete)
        except _SplitReducer:
            return _ordered_drain(result, out_dir, on_complete)
    finally:
        spark.conf.set(coalesce_key, prev)


def _drain(rdd, sc, out_dir, on_complete) -> list[int]:
    done: list[int] = []
    claimed: set[int] = set()
    lock = threading.Lock()

    def _claim(r_id: int) -> str:
        with lock:
            if r_id in claimed:
                raise _SplitReducer(r_id)
            claimed.add(r_id)
        return os.path.join(out_dir, f"r{r_id}")

    def _finish(r_id: int, path: str) -> None:
        with lock:
            done.append(r_id)
            if on_complete is not None:
                on_complete(r_id, path)

    def _pull(p: int) -> None:
        # one Spark job for ONE partition; the shuffle map output is
        # computed once and shared across all concurrent pull jobs.
        # rows is a LAZY socket stream: each row is appended to its
        # reducer file as it arrives, never a whole-partition list.
        rows = _iter_partition(sc, rdd, p)
        cur_id: int | None = None
        cur_path: str | None = None
        cur_fh = None
        try:
            for row in rows:
                if row.r_id != cur_id:
                    if cur_fh is not None:
                        cur_fh.close()
                        _finish(cur_id, cur_path)
                    cur_id = int(row.r_id)
                    cur_path = _claim(cur_id)
                    cur_fh = open(cur_path, "w")
                cur_fh.write(row.line + "\n")
            if cur_fh is not None:
                cur_fh.close()
                cur_fh = None
                _finish(cur_id, cur_path)
        finally:
            if cur_fh is not None:
                cur_fh.close()

    n = rdd.getNumPartitions()
    with ThreadPoolExecutor(max_workers=min(PULL_POOL, max(n, 1))) as pool:
        futures = [pool.submit(_pull, p) for p in range(n)]
        try:
            for f in as_completed(futures):
                f.result()  # surface pull/claim errors immediately
        except _SplitReducer:
            # stop handing out new pulls; running ones finish harmlessly
            # (the with-block joins them before the fallback rewrites)
            for fut in futures:
                fut.cancel()
            raise
    return done


def _ordered_drain(result: DataFrame, out_dir, on_complete) -> list[int]:
    """Job-end fallback for non-r_id-partitioned plans: one globally
    ordered pass, every file rewritten complete (clobbering any partial
    phase-1 files). The pre-parallel-pull writer, kept as the safety
    net."""
    done: list[int] = []
    handles: dict[int, object] = {}
    try:
        for row in result.orderBy("r_id", "seq").toLocalIterator():
            fh = handles.get(row.r_id)
            if fh is None:
                fh = open(os.path.join(out_dir, f"r{row.r_id}"), "w")
                handles[row.r_id] = fh
            fh.write(row.line + "\n")
    finally:
        for r_id, fh in sorted(handles.items()):
            fh.close()
    for r_id in sorted(handles):
        done.append(r_id)
        if on_complete is not None:
            on_complete(r_id, os.path.join(out_dir, f"r{r_id}"))
    return done
