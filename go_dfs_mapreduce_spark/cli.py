"""Client CLI — the reference's interactive client as a one-shot command.

Mirrors the verb set of /root/reference/client/client.go:96-107 (store,
retrieve, delete, ls [-v], info, activity, mr) on the Warehouse + MR
layers, and adds `query` — the reference's MR plugins are its only query
surface, while this engine exposes the whole registered analytics registry
by name.

    python -m go_dfs_mapreduce_spark store /tmp/corpus.txt
    python -m go_dfs_mapreduce_spark ls -v
    python -m go_dfs_mapreduce_spark mr word_count corpus.txt -o /tmp/out
    python -m go_dfs_mapreduce_spark query q1_pricing_summary \
        --sf-dir /root/testdata/sf0.01

The MR verb writes one result file per reducer (r0..r{R-1}) exactly like
the reference client (cl/mr_actions.go:200-245): rows stream through
``toLocalIterator`` ordered by (r_id, seq) — never a full collect.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _get_spark(app: str) -> SparkSession:
    from .session import get_spark

    return get_spark(app)


# plugin registry for the `mr` verb — name -> (f_map, f_reduce, R), the
# analog of the reference's job_plugins/{name}/{name}.go lookup
# (cl/mr_actions.go:37-48)
def _mr_plugins():
    from .mapreduce.plugins import (
        LOG_ANALYZER_R,
        WORD_COUNT_R,
        log_analyzer_map,
        log_analyzer_reduce,
        word_count_map,
        word_count_reduce,
    )

    return {
        "word_count": (word_count_map, word_count_reduce, WORD_COUNT_R),
        "log_analyzer": (log_analyzer_map, log_analyzer_reduce, LOG_ANALYZER_R),
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="go_dfs_mapreduce_spark")
    ap.add_argument(
        "--warehouse",
        default=os.environ.get("SPARK_GRAFT_WAREHOUSE", "./warehouse"),
        help="warehouse root directory (env SPARK_GRAFT_WAREHOUSE)",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("store", help="ingest a local file (TXT/BIN sniffed)")
    p.add_argument("path")
    p.add_argument("name", nargs="?")
    # the reference's `store {path} [chunk_MiB]` knob (cl/dfs_actions.go:76-81)
    p.add_argument("--chunk-mib", type=int, default=None)

    p = sub.add_parser("retrieve", help="reassemble a stored file locally")
    p.add_argument("name")
    p.add_argument("out")

    p = sub.add_parser("delete", help="remove a stored file")
    p.add_argument("name")

    p = sub.add_parser("ls", help="list stored files")
    p.add_argument("-v", "--verbose", action="store_true")

    sub.add_parser("info", help="per-executor report")
    sub.add_parser("activity", help="cluster-level report")

    p = sub.add_parser("mr", help="run a MapReduce plugin over stored TXT files")
    p.add_argument(
        "job",
        help="builtin plugin name (word_count, log_analyzer) or a path to a"
        " .py file exporting R, f_map, f_reduce",
    )
    p.add_argument("files", nargs="*", help="stored names (default: all TXT)")
    p.add_argument("-o", "--out-dir", required=True)
    p.add_argument(
        "--dfs-nodes",
        help="run over reference storage-node chunk dirs (comma-separated)"
        " instead of warehouse tables; FILES filter by chunk-layout name",
    )

    p = sub.add_parser(
        "dfs-import",
        help="ingest a file stored in reference storage-node chunk dirs"
        " (chunk layout <file>_t<idx> / <file>_b<idx> + md5 sidecars) into"
        " the warehouse",
    )
    p.add_argument("nodes", help="comma-separated storage-node directories")
    p.add_argument("file", help="stored file name in the chunk layout")
    p.add_argument("name", nargs="?", help="warehouse name (default: file)")

    p = sub.add_parser(
        "dfs-export",
        help="export a warehouse TXT table back to the reference chunk layout",
    )
    p.add_argument("name", help="warehouse TXT table name")
    p.add_argument("node", help="target storage-node directory")
    p.add_argument("--file", help="chunk-layout file name (default: name)")
    p.add_argument("--chunks", type=int, default=1, help="output chunk count")
    p.add_argument("--overwrite", action="store_true")

    p = sub.add_parser(
        "dfs-drain",
        help="incrementally drain a landing directory of text files into"
        " the reference chunk layout: each invocation appends ONLY"
        " not-yet-drained files as NEW chunks (checkpointed stream,"
        " AvailableNow) — the catch-up twin of dfs-export's one-shot",
    )
    p.add_argument("src", help="landing directory of text files")
    p.add_argument("node", help="target storage-node directory")
    p.add_argument("--file", required=True, help="chunk-layout file name")
    p.add_argument(
        "--checkpoint",
        help="stream checkpoint dir (default: <node>/.drain_ckpt_<file>)",
    )

    p = sub.add_parser(
        "dfs-fsck",
        help="verify every chunk replica across storage-node dirs against"
        " its md5 sidecar; --repair deletes corrupt replicas and"
        " re-replicates from healthy copies (the controller's 5s cycle)",
    )
    p.add_argument("nodes", help="comma-separated storage-node directories")
    p.add_argument("--repair", action="store_true")
    p.add_argument("--replicas", type=int, default=3)

    p = sub.add_parser(
        "dfs-nodes-status",
        help="one controller maintenance cycle over storage-node dirs:"
        " heartbeat liveness (22s flatline eviction), live files map,"
        " under-replication report (cn/struct.go:53-187 semantics)",
    )
    p.add_argument("nodes", help="comma-separated storage-node directories")
    p.add_argument("--flatline-ms", type=int, default=22000)
    p.add_argument("--replicas", type=int, default=3)
    p.add_argument(
        "--heartbeat",
        action="store_true",
        help="write this cycle's .heartbeat into each dir first (the"
        " storage-node agent's side of the protocol)",
    )

    p = sub.add_parser(
        "dfs-daemon",
        help="the controller's PERPETUAL maintenance loop"
        " (cn/struct.go:58-66: registry rebuild + replication every 5s):"
        " each cycle heartbeats the node dirs, reports membership +"
        " under-replication, and fsck-repairs corrupt/missing replicas;"
        " runs until --cycles (0 = forever / Ctrl-C)",
    )
    p.add_argument("nodes", help="comma-separated storage-node directories")
    p.add_argument("--interval-s", type=float, default=5.0)
    p.add_argument("--cycles", type=int, default=0)
    p.add_argument("--replicas", type=int, default=3)
    p.add_argument("--flatline-ms", type=int, default=22000)
    p.add_argument(
        "--heartbeat",
        action="store_true",
        help="also play the storage-node agents' role and write each"
        " cycle's .heartbeat into the dirs (single-host demo mode);"
        " WITHOUT this the daemon is controller-only, flatlined nodes"
        " actually show up dead, and the repair arm reads from / copies"
        " to LIVE nodes only (a dead replica is not a healthy copy)",
    )

    p = sub.add_parser("query", help="run a registered analytics query")
    p.add_argument("name")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("-n", "--limit", type=int, default=20)
    p.add_argument(
        "--explain",
        action="store_true",
        help="print the formatted physical plan instead of executing",
    )

    p = sub.add_parser(
        "sql", help="run ad-hoc SQL over the sf tables (registered as views)"
    )
    p.add_argument("statement")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("-n", "--limit", type=int, default=20)

    p = sub.add_parser(
        "analyze",
        help="register sf parquet tables in the catalog and ANALYZE them "
        "(row counts + column stats — the CBO food; see "
        "sources/catalog_stats.py)",
    )
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--db", default="sf_stats")
    p.add_argument(
        "--no-columns",
        action="store_true",
        help="compute only row counts / sizes, skip per-column stats",
    )

    p = sub.add_parser(
        "derived", help="inspect / clean / compact the derived-table warehouse"
    )
    p.add_argument("action", choices=["ls", "gc", "compact"])
    p.add_argument(
        "--all",
        action="store_true",
        dest="drop_all",
        help="gc: drop every published table (they rebuild on next use), "
        "not just orphaned .tmp build dirs",
    )
    p.add_argument(
        "--name",
        default=None,
        help="compact: restrict to one table name (default: every "
        "multi-generation version)",
    )

    args = ap.parse_args(argv)

    # warehouse ls/gc need no SparkSession at all; compact rewrites
    # parquet, so it alone starts one
    if args.cmd == "derived":
        from . import derived

        if args.action == "ls":
            for entry in derived.list_tables():
                print(json.dumps(entry))
        elif args.action == "gc":
            for name in derived.gc(drop_all=args.drop_all):
                print(f"removed {name}")
        else:
            for row in derived.compact(
                _get_spark("cli-derived-compact"), name=args.name
            ):
                print(json.dumps(row))
        return 0

    from .sources.warehouse import Warehouse

    spark = _get_spark(f"cli-{args.cmd}")
    wh = Warehouse(spark, args.warehouse)

    if args.cmd == "store":
        print(wh.store(args.path, args.name, chunk_mib=args.chunk_mib))
    elif args.cmd == "retrieve":
        print(wh.retrieve(args.name, args.out))
    elif args.cmd == "delete":
        wh.delete(args.name)
        print(f"deleted {args.name}")
    elif args.cmd == "ls":
        for entry in wh.ls(verbose=args.verbose):
            print(json.dumps(entry))
    elif args.cmd == "info":
        for entry in wh.info():
            print(json.dumps(entry))
    elif args.cmd == "activity":
        print(json.dumps(wh.activity()))
    elif args.cmd == "mr":
        rc = _run_mr(spark, wh, args)
        if rc:
            return rc
    elif args.cmd == "dfs-fsck":
        from .sources.dfs_chunks import fsck

        dirs = [p for p in (s.strip() for s in args.nodes.split(",")) if p]
        for row in fsck(
            dirs, repair=args.repair, replicas=args.replicas, spark=spark
        ):
            print(json.dumps(row))
    elif args.cmd == "dfs-nodes-status":
        from .sources.membership import node_status, touch_heartbeat

        dirs = [p for p in (s.strip() for s in args.nodes.split(",")) if p]
        if args.heartbeat:
            for d in dirs:
                touch_heartbeat(d)
        print(
            json.dumps(
                node_status(
                    dirs, flatline_ms=args.flatline_ms, replicas=args.replicas
                )
            )
        )
    elif args.cmd == "dfs-daemon":
        # Always-on controller choreography (cn/struct.go:58-66 runs
        # check_nodes + check_replication_level in a perpetual 5 s loop;
        # the repo's batch verbs are the same logic invocable once).
        # Each cycle: heartbeat -> membership/under-replication report
        # -> fsck --repair. One JSON line per cycle; SIGINT (Ctrl-C)
        # exits cleanly after the current cycle like a daemon's TERM.
        import time as _time

        from .sources.dfs_chunks import fsck
        from .sources.membership import node_status, touch_heartbeat

        dirs = [p for p in (s.strip() for s in args.nodes.split(",")) if p]
        cycle = 0
        try:
            while args.cycles <= 0 or cycle < args.cycles:
                t0 = _time.time()
                # A vanished node dir is a DEAD NODE, not a daemon crash
                # (the reference controller survives node loss and keeps
                # repairing from the survivors, cn/struct.go:189-232) —
                # re-evaluated every cycle so a node can come back.
                present = [d for d in dirs if os.path.isdir(d)]
                if args.heartbeat:
                    for d in present:
                        try:
                            touch_heartbeat(d)
                        except FileNotFoundError:
                            # vanished between the isdir scan and the
                            # write (TOCTOU): dead for this cycle
                            continue
                try:
                    if present:
                        status = node_status(
                            present,
                            flatline_ms=args.flatline_ms,
                            replicas=args.replicas,
                        )
                        # the repair arm sees only LIVE nodes: a replica
                        # sitting on a flatlined-but-present dir must not
                        # count as healthy, or under-replication caused by
                        # a dead node is reported every cycle yet never
                        # repaired — the reference controller re-replicates
                        # off dead nodes (cn/struct.go:234-392). With zero
                        # live nodes there is nothing to read from or copy
                        # to, so the cycle only reports.
                        live = [
                            n["dir"] for n in status["nodes"] if n["alive"]
                        ]
                        rows = (
                            fsck(
                                live,
                                repair=True,
                                replicas=args.replicas,
                                spark=spark,
                            )
                            if live
                            else []
                        )
                    else:
                        status = {"nodes": [], "under_replicated": []}
                        rows = []
                except FileNotFoundError:
                    # a dir vanished mid-walk (same TOCTOU window inside
                    # node_status/fsck): degraded cycle, re-scan next time
                    status = {"nodes": [], "under_replicated": []}
                    rows = []
                print(
                    json.dumps(
                        {
                            "cycle": cycle,
                            "alive": sum(
                                1 for n in status["nodes"] if n["alive"]
                            ),
                            "missing_dirs": len(dirs) - len(present),
                            "under_replicated": len(
                                status["under_replicated"]
                            ),
                            "chunks": len(rows),
                            "corrupt": sum(r["corrupt"] for r in rows),
                            "repaired": sum(r["repaired"] for r in rows),
                            "wall_s": round(_time.time() - t0, 3),
                        }
                    ),
                    flush=True,
                )
                cycle += 1
                if args.cycles <= 0 or cycle < args.cycles:
                    _time.sleep(
                        max(0.0, args.interval_s - (_time.time() - t0))
                    )
        except KeyboardInterrupt:
            print(json.dumps({"stopped_after_cycle": cycle}), flush=True)
    elif args.cmd == "dfs-drain":
        print(_dfs_drain(spark, args))
    elif args.cmd == "dfs-import":
        print(_dfs_import(spark, wh, args))
    elif args.cmd == "dfs-export":
        print(_dfs_export(spark, wh, args))
    elif args.cmd == "query":
        from . import registry

        qs, _ = registry.collect()
        if args.name not in qs:
            print(f"unknown query {args.name!r}; {len(qs)} available", file=sys.stderr)
            return 2
        df = qs[args.name](spark, args.sf_dir)
        if args.explain:
            from .plans import formatted_plan

            print(formatted_plan(df))
        else:
            df.show(args.limit, truncate=False)
    elif args.cmd == "sql":
        from .tables import register_temp_views

        register_temp_views(spark, args.sf_dir)
        spark.sql(args.statement).show(args.limit, truncate=False)
    elif args.cmd == "analyze":
        from .sources.catalog_stats import (
            TPCH_TABLES,
            analyze_tables,
            register_parquet_catalog,
        )

        register_parquet_catalog(spark, args.db, args.sf_dir)
        analyze_tables(spark, args.db, columns=not args.no_columns)
        for t in TPCH_TABLES:
            row = spark.sql(f"DESCRIBE EXTENDED {args.db}.{t}").where(
                "col_name = 'Statistics'"
            ).collect()
            stats = row[0]["data_type"] if row else "none"
            print(json.dumps({"table": f"{args.db}.{t}", "statistics": stats}))
    return 0


def _run_mr(spark: SparkSession, wh, args) -> int:
    """The `mr {job} [files...]` verb: stored TXT tables -> (file,
    line_number, line) -> MapReduceJob -> one local file per reducer,
    mirroring the reference's TXT-only input filter (cn/mr_actions.go:
    221-230) and per-reducer result files (cl/mr_actions.go:200-245)."""
    from .mapreduce import MapReduceJob

    builtins = _mr_plugins()
    if args.job in builtins:
        f_map, f_reduce, r = builtins[args.job]
    elif args.job.endswith(".py"):
        try:
            f_map, f_reduce, r = _load_plugin_file(args.job)
        except (OSError, ValueError, SyntaxError) as e:
            print(f"plugin error: {e}", file=sys.stderr)
            return 2
    else:
        print(
            f"unknown job {args.job!r}; builtins: {sorted(builtins)}"
            " (or pass a .py plugin path)",
            file=sys.stderr,
        )
        return 2
    if getattr(args, "dfs_nodes", None):
        # run straight over reference-stored chunks — the reference's own
        # `mr {job} [files...]` input path, no ingestion step
        from .mapreduce import read_dfs_chunks_with_line_numbers
        from .sources.dfs_chunks import _inventory

        dirs = [p for p in (s.strip() for s in args.dfs_nodes.split(",")) if p]
        if args.files:
            # a typo'd name must be a diagnostic, not an empty result —
            # matching the warehouse branch's 'file not stored' check
            for n in args.files:
                if not _inventory(dirs, "TXT", n):
                    print(
                        f"file {n!r} has no TXT chunks in {args.dfs_nodes}",
                        file=sys.stderr,
                    )
                    return 2
            parts = [
                read_dfs_chunks_with_line_numbers(spark, dirs, file=n)
                for n in args.files
            ]
            inputs = parts[0]
            for df in parts[1:]:
                inputs = inputs.unionByName(df)
        else:
            inputs = read_dfs_chunks_with_line_numbers(spark, dirs)
    else:
        stored = {e["name"]: e["type"] for e in wh.ls()}
        names = args.files or [n for n, t in sorted(stored.items()) if t == "TXT"]
        for n in names:
            if n not in stored:
                print(f"file {n!r} not stored", file=sys.stderr)
                return 2
            if stored[n] != "TXT":
                print(f"file {n!r} is {stored[n]}, not TXT", file=sys.stderr)
                return 2
        if not names:
            print("no TXT files stored", file=sys.stderr)
            return 2
        inputs = None
        for n in names:
            df = wh.read(n).select(
                F.lit(n).alias("file"),
                F.col("line_number").cast("long").alias("line_number"),
                F.col("value").alias("line"),
            )
            inputs = df if inputs is None else inputs.unionByName(df)
    job = MapReduceJob(f"cli-{args.job}", f_map, f_reduce, r=r)
    result = job.run(inputs)
    # Streamed MID-JOB result pull (cl/mr_actions.go:138-219 parity):
    # each reducer's file is written and closed the moment that
    # reducer's rows end — while later reducers are still running —
    # instead of materializing the whole job before the first byte
    # lands. The per-reducer print is the reference client's
    # per-blob download progress line.
    from .mapreduce.results import stream_reducer_results

    done = stream_reducer_results(
        result,
        args.out_dir,
        on_complete=lambda r_id, path: print(f"pulled r{r_id} -> {path}"),
    )
    print(f"wrote {len(done)} reducer file(s) to {args.out_dir}")
    return 0


def _load_plugin_file(path: str):
    """Load a user MR plugin from a .py file and validate its exports —
    the analog of the reference's compile-and-symbol-check admission step
    (cn/mr_actions.go:87-199 compiles the received Go source with
    `go build -buildmode=plugin` and looks up R / F_map / F_reduce; here
    the 'compile' is an import and the symbol check is the same).

    The plugin must export:
      R        : int >= 1, the reducer count
      f_map    : callable(file, line_no, line, out) appending (k, v) pairs
      f_reduce : callable(keys, values, out) appending output lines
    """
    import importlib.util

    spec = importlib.util.spec_from_file_location("mr_user_plugin", path)
    if spec is None or spec.loader is None:
        raise ValueError(f"cannot load plugin from {path!r}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    missing = [s for s in ("R", "f_map", "f_reduce") if not hasattr(mod, s)]
    if missing:
        raise ValueError(f"plugin {path!r} missing exports: {missing}")
    r = mod.R
    if not isinstance(r, int) or r < 1:
        raise ValueError(f"plugin R must be an int >= 1, got {r!r}")
    if not callable(mod.f_map) or not callable(mod.f_reduce):
        raise ValueError("plugin f_map and f_reduce must be callable")
    return mod.f_map, mod.f_reduce, r


def _dfs_drain(spark: SparkSession, args) -> str:
    """The `dfs-drain` verb: catch-up ingestion from a landing directory
    into the chunk layout via the go_dfs_text STREAM SINK. The file
    stream source's checkpoint remembers which landing files were already
    drained, so repeated invocations append only new data as new chunks
    with continuing indices (sources/dfs_chunks.py::_TextStreamWriter) —
    run it from cron and reference consumers see one coherent growing
    file. AvailableNow makes each run a bounded batch; at deployment the
    same pipeline runs continuously with a processing-time trigger."""
    from .sources import register_dfs_sources
    from .sources.dfs_chunks import _inventory

    register_dfs_sources(spark)
    ckpt = args.checkpoint or os.path.join(
        args.node, f".drain_ckpt_{args.file}"
    )
    q = (
        spark.readStream.text(args.src)
        .select(F.col("value").alias("line"))
        .writeStream.format("go_dfs_text")
        .option("checkpointLocation", ckpt)
        .option("file", args.file)
        .outputMode("append")
        .trigger(availableNow=True)
        .start(args.node)
    )
    q.awaitTermination()
    chunks = {c for (_f, c) in _inventory([args.node], "TXT", args.file)}
    return json.dumps(
        {"file": args.file, "node": args.node, "chunks": len(chunks)}
    )


def _dfs_import(spark: SparkSession, wh, args) -> str:
    """dfs-import: chunk-layout file -> warehouse table, both file types.
    TXT reads through the go_dfs_text source (checksum verify + replica
    failover) and restores the global line order from (chunk_idx,
    line_number) — chunk indices are byte-ordered by construction
    (cl/dfs_actions.go:76-95) — landing the warehouse TXT layout (parquet
    line_number+value). BIN reads chunk rows through go_dfs_bin and lands
    the warehouse's chunk-row layout unchanged."""
    import os as _os

    from pyspark.sql import functions as F

    from .sources import register_dfs_sources
    from .sources.dfs_chunks import _inventory

    register_dfs_sources(spark)
    name = args.name or args.file
    target = wh._table_dir(name)
    if wh._exists(name):
        raise FileExistsError(f"file {name!r} already stored")
    # file type comes from the chunk INVENTORY (the filename encodes it),
    # not from data presence — an empty TXT file is still a TXT file
    dirs = [p for p in (s.strip() for s in args.nodes.split(",")) if p]
    has_txt = bool(_inventory(dirs, "TXT", args.file))
    has_bin = bool(_inventory(dirs, "BIN", args.file))
    if not (has_txt or has_bin):
        raise FileNotFoundError(
            f"no TXT or BIN chunks for {args.file!r} in {args.nodes}"
        )
    if has_txt:
        txt = (
            spark.read.format("go_dfs_text")
            .option("file", args.file)
            .load(args.nodes)
        )
        # global line numbers WITHOUT a single-task global window: chunk
        # line counts are tiny metadata (one row per chunk) — collect
        # them, prefix-sum on the driver, and add each chunk's offset to
        # its per-chunk line numbers map-side. Chunk indices are
        # byte-ordered by construction (cl/dfs_actions.go:76-95).
        counts = {
            r.chunk_idx: r.n
            for r in txt.groupBy("chunk_idx").agg(F.count("*").alias("n")).collect()
        }
        offsets, acc = {}, 0
        for idx in sorted(counts):
            offsets[idx] = acc
            acc += counts[idx]
        if offsets:
            offmap = F.create_map(
                *[F.lit(x) for kv in offsets.items() for x in kv]
            )
            out = txt.select(
                (F.col("line_number") + offmap[F.col("chunk_idx")]).alias(
                    "line_number"
                ),
                F.col("line").alias("value"),
            )
        else:  # TXT file whose chunks hold zero lines
            out = spark.createDataFrame([], "line_number long, value string")
        ftype = "TXT"
        # chunk data not ending in \n means the original file had no
        # trailing newline — preserve that through retrieve
        last_chunk_nl = _chunk_ends_with_newline(dirs, args.file)
    else:
        out = (
            spark.read.format("go_dfs_bin")
            .option("file", args.file)
            .load(args.nodes)
            .select("chunk_idx", "content")
        )
        ftype = "BIN"
    out.write.parquet(target)
    with open(_os.path.join(target, "_FTYPE"), "w") as fh:
        fh.write(ftype)
    if ftype == "TXT" and not last_chunk_nl:
        with open(_os.path.join(target, "_NO_TRAILING_NL"), "w") as fh:
            fh.write("1")
    return name


def _chunk_ends_with_newline(dirs: list[str], file: str) -> bool:
    """True when the highest-index TXT chunk's last byte is a newline
    (empty files count as newline-terminated). Reads through the same
    checksum-verify + replica-failover path as the scan readers, so a
    corrupt first replica can't silently flip the trailing-newline
    decision."""
    from .sources.dfs_chunks import _ChunkPartition, _inventory, _read_verified

    chunks = _inventory(dirs, "TXT", file)
    if not chunks:
        return True
    (fname, idx), last_paths = max(chunks.items(), key=lambda kv: kv[0][1])
    data = _read_verified(
        _ChunkPartition(fname, "TXT", idx, tuple(last_paths), verify=True)
    )
    return data == b"" or data.endswith(b"\n")


def _dfs_export(spark: SparkSession, wh, args) -> str:
    """dfs-export: warehouse TXT/BIN table -> reference chunk layout via
    the go_dfs_text / go_dfs_bin writers (chunks_tmp + commit rename).
    Range-partitioning on the persisted order key keeps chunk indices in
    byte order."""
    import os as _os

    from .sources import register_dfs_sources

    register_dfs_sources(spark)
    ftype = wh._ftype(args.name)
    df = spark.read.parquet(wh._table_dir(args.name))
    if ftype == "TXT":
        if args.chunks > 1:
            df = df.repartitionByRange(args.chunks, "line_number")
        else:
            df = df.coalesce(1)
        out = df.sortWithinPartitions("line_number").select("value")
        fmt = "go_dfs_text"
    elif ftype == "BIN":
        # chunk rows map 1:1 to chunks; --chunks is ignored for BIN
        out = (
            df.repartitionByRange(1, "chunk_idx")
            .sortWithinPartitions("chunk_idx")
            .select("content")
        )
        fmt = "go_dfs_bin"
    else:
        raise ValueError(f"{args.name!r} is a TABLE; dfs-export needs TXT/BIN")
    writer = (
        out.write.format(fmt)
        .option("file", args.file or args.name)
        .mode("overwrite" if args.overwrite else "append")
    )
    writer.save(args.node)
    if ftype == "TXT" and _os.path.exists(
        _os.path.join(wh._table_dir(args.name), "_NO_TRAILING_NL")
    ):
        # the chunk writer newline-terminates every line; restore the
        # stored file's missing trailing newline by truncating the last
        # chunk's final byte and re-hashing its sidecar (the reference's
        # own last chunk simply ends at EOF)
        _strip_final_newline(args.node, args.file or args.name)
    return args.node


def _strip_final_newline(node: str, file: str) -> None:
    import hashlib as _h

    from .sources.dfs_chunks import _inventory

    chunks = _inventory([node], "TXT", file)
    if not chunks:
        return
    _, paths = max(chunks.items(), key=lambda kv: kv[0][1])
    path = paths[0]
    with open(path, "rb") as fh:
        data = fh.read()
    if not data.endswith(b"\n"):
        return
    data = data[:-1]
    with open(path, "wb") as fh:
        fh.write(data)
    with open(path + "h", "wb") as fh:
        fh.write(_h.md5(data).digest())


if __name__ == "__main__":
    raise SystemExit(main())
