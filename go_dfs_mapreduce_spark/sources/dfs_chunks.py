"""Python DataSource reading the reference's on-disk chunk format.

A Go_DFS storage node keeps each stored file as chunk files named
``<file>_t<idx>`` (TXT) / ``<file>_b<idx>`` (BIN) — single lowercase type
char, ``sn/dfs_actions.go:20-30`` writes it and ``sn/struct.go:198-216`` /
``cl/dfs_actions.go:422-429`` parse it — next to an md5 sidecar
``<chunk>h`` holding the raw 16-byte digest (``sn/dfs_actions.go:32,77``,
``util/util.go:12-41``). TXT chunks are newline-aligned byte ranges
(``cl/dfs_actions.go:172-195``), so every chunk is independently scannable
— which is exactly a Spark input partition.

These sources are the migration path for reference users: point
``spark.read.format("go_dfs_text")`` at one or more storage-node
directories (comma-separated — each directory is a "node") and the chunk
inventory is read in place, no re-ingestion:

- planning (driver side) unions the per-node chunk inventories into a
  replica map, one InputPartition per distinct (file, chunk_idx) — the
  Spark twin of the controller's soft-state registry
  (``cn/struct.go:18-31``);
- each task md5-verifies its chunk against the sidecar and fails over to
  the next replica on mismatch, mirroring retrieve's per-chunk failover
  (``cl/dfs_actions.go:369-495``); a chunk with no healthy replica fails
  the scan like the reference fails the whole retrieve
  (``cl/dfs_actions.go:396-411``);
- ``go_dfs_text`` emits (file, chunk_idx, line_number, line) with
  per-chunk line numbers from 0 — the exact record the MR scan hands to
  ``F_map`` (``sn/mr_actions.go:211-231``); ``go_dfs_bin`` emits one
  (file, chunk_idx, content) row per chunk.

At scale this degrades gracefully: planning cost is one directory listing
per node (metadata-only), partition count equals chunk count (64 MiB
default chunks → the same task granularity Spark would pick for parquet),
and verification is streamed per-task, never on the driver.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

# On-disk name: <file>_<t|b><idx>; the greedy .+ mirrors the reference's
# strings.LastIndex("_") parse (sn/struct.go:198-216). Sidecars end in a
# trailing 'h' after the digits, so \d+$ excludes them.
_CHUNK_RE = re.compile(r"^(?P<file>.+)_(?P<tchar>[tb])(?P<idx>\d+)$")
# Logical file type (API surface, matches the warehouse's TXT/BIN) <-> the
# reference's single-char on-disk code (sn/dfs_actions.go:20-28).
_CHAR_OF = {"TXT": "t", "BIN": "b"}
_TYPE_OF = {"t": "TXT", "b": "BIN"}


def chunk_name(file: str, ftype: str, idx: int) -> str:
    """The reference's on-disk chunk file name for (file, TXT|BIN, idx)."""
    return f"{file}_{_CHAR_OF[ftype]}{idx}"


@dataclass
class _ChunkPartition(InputPartition):
    file: str
    ftype: str
    idx: int
    replicas: tuple[str, ...]  # full paths, tried in order
    verify: bool


def _inventory(dirs: list[str], want_ftype: str, only_file: str | None):
    """(file, idx) -> [replica paths], from every node dir's listing."""
    chunks: dict[tuple[str, int], list[str]] = {}
    for d in dirs:
        if not os.path.isdir(d):
            raise FileNotFoundError(f"go_dfs node directory {d!r} not found")
        for entry in sorted(os.listdir(d)):
            m = _CHUNK_RE.match(entry)
            if not m or _TYPE_OF[m.group("tchar")] != want_ftype:
                continue  # sidecars (trailing 'h') and foreign files skipped
            if only_file and m.group("file") != only_file:
                continue
            key = (m.group("file"), int(m.group("idx")))
            chunks.setdefault(key, []).append(os.path.join(d, entry))
    return chunks


def scan_lines(data: bytes):
    """bufio.Scanner semantics (sn/mr_actions.go:211-231): split on \\n;
    a trailing newline yields no final empty line, but data that ends at
    EOF without one still yields its last line; exactly ONE trailing \\r
    is stripped per line (Go's dropCR). Go strings are arbitrary bytes,
    so input can legally contain invalid UTF-8; Spark strings cannot, so
    such bytes become U+FFFD instead of failing the whole scan."""
    lines = data.decode("utf-8", errors="replace").split("\n")
    if lines and lines[-1] == "":
        lines = lines[:-1]
    for line in lines:
        yield line[:-1] if line.endswith("\r") else line


def _read_verified(part: _ChunkPartition) -> bytes:
    """Chunk bytes from the first replica whose md5 matches its sidecar."""
    errors = []
    for path in part.replicas:
        try:
            with open(path, "rb") as fh:
                data = fh.read()
            if part.verify:
                with open(path + "h", "rb") as fh:
                    want = fh.read()
                got = hashlib.md5(data).digest()
                if got != want:
                    errors.append(f"{path}: checksum mismatch")
                    continue
            return data
        except OSError as e:  # missing replica / unreadable sidecar
            errors.append(f"{path}: {e}")
    raise IOError(
        f"chunk {chunk_name(part.file, part.ftype, part.idx)}: all "
        f"{len(part.replicas)} replicas failed: {errors}"
    )


class _BaseReader(DataSourceReader):
    def __init__(self, options, ftype: str) -> None:
        raw = options.get("path") or options.get("paths")
        if not raw:
            raise ValueError("go_dfs source requires a path (node dir[,dir...])")
        self._dirs = [p for p in (s.strip() for s in raw.split(",")) if p]
        self._file = options.get("file")
        self._verify = str(options.get("verify", "true")).lower() != "false"
        self._ftype = ftype

    def partitions(self):
        chunks = _inventory(self._dirs, self._ftype, self._file)
        return [
            _ChunkPartition(f, self._ftype, i, tuple(paths), self._verify)
            for (f, i), paths in sorted(chunks.items())
        ]


class _TextReader(_BaseReader):
    def __init__(self, options) -> None:
        super().__init__(options, "TXT")

    def read(self, partition: _ChunkPartition):
        if partition is None:  # empty inventory -> Spark's implicit single split
            return
        data = _read_verified(partition)
        for n, line in enumerate(scan_lines(data)):
            yield (partition.file, partition.idx, n, line)


class _BinReader(_BaseReader):
    def __init__(self, options) -> None:
        super().__init__(options, "BIN")

    def read(self, partition: _ChunkPartition):
        if partition is None:
            return
        yield (partition.file, partition.idx, _read_verified(partition))


@dataclass
class _ChunkCommit(WriterCommitMessage):
    pid: int
    tmp_name: str


class _TextWriter(DataSourceWriter):
    """Write a text DataFrame as reference-layout TXT chunks.

    Mirrors the storage node's commit protocol exactly
    (``sn/dfs_actions.go:34-112``): each task streams its partition's
    lines + md5 sidecar into ``chunks_tmp/`` under a job-unique name, and
    the driver-side commit atomically renames them into place. Chunk
    indices are assigned contiguously in partition order at commit time
    (a failed job leaves only ``chunks_tmp`` litter, never a partial
    file), and partition boundaries fall between lines, so every chunk
    is newline-aligned like the reference's TXT split
    (``cl/dfs_actions.go:172-195``).

    Save-mode mapping (the Python DataSource API offers append/overwrite
    only): ``append`` is the reference's ``store`` — it REJECTS a
    duplicate file name at commit like the controller does
    (``cn/dfs_actions.go:17-22``); ``overwrite`` replaces the file's
    chunks."""

    def __init__(self, options, overwrite: bool) -> None:
        raw = options.get("path") or options.get("paths")
        if not raw:
            raise ValueError("go_dfs_text write requires a node directory path")
        self._dir = raw.split(",")[0].strip()
        fname = options.get("file")
        if not fname:
            raise ValueError("go_dfs_text write requires .option('file', name)")
        self._file = fname
        self._overwrite = overwrite
        self._job = uuid.uuid4().hex

    def _existing(self):
        if not os.path.isdir(self._dir):
            return []
        return [
            e
            for e in os.listdir(self._dir)
            if _CHUNK_RE.match(e) and _CHUNK_RE.match(e).group("file") == self._file
        ]

    def write(self, iterator) -> _ChunkCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tmp_dir = os.path.join(self._dir, "chunks_tmp")
        os.makedirs(tmp_dir, exist_ok=True)
        tmp_name = f"{self._job}_p{pid}"
        h = hashlib.md5()
        wrote = False
        with open(os.path.join(tmp_dir, tmp_name), "wb") as fh:
            for row in iterator:
                # NULL lines write as empty (the layout has no null notion)
                data = (("" if row[0] is None else str(row[0])) + "\n").encode(
                    "utf-8"
                )
                fh.write(data)
                h.update(data)
                wrote = True
        if not wrote:  # empty partition -> no chunk (indices stay contiguous)
            os.remove(os.path.join(tmp_dir, tmp_name))
            return _ChunkCommit(pid=pid, tmp_name="")
        with open(os.path.join(tmp_dir, tmp_name + "h"), "wb") as fh:
            fh.write(h.digest())
        return _ChunkCommit(pid=pid, tmp_name=tmp_name)

    def commit(self, messages) -> None:
        existing = self._existing()
        if existing and not self._overwrite:
            raise FileExistsError(
                f"file {self._file!r} already stored in {self._dir}"
            )
        for e in existing:  # overwrite: drop old chunks + sidecars
            os.remove(os.path.join(self._dir, e))
            side = os.path.join(self._dir, e + "h")
            if os.path.exists(side):
                os.remove(side)
        tmp_dir = os.path.join(self._dir, "chunks_tmp")
        idx = 0
        for m in sorted(
            (m for m in messages if m and m.tmp_name), key=lambda m: m.pid
        ):
            final = os.path.join(self._dir, chunk_name(self._file, "TXT", idx))
            os.rename(os.path.join(tmp_dir, m.tmp_name), final)
            os.rename(os.path.join(tmp_dir, m.tmp_name + "h"), final + "h")
            idx += 1

    def abort(self, messages) -> None:
        tmp_dir = os.path.join(self._dir, "chunks_tmp")
        for m in messages:
            if not (m and m.tmp_name):
                continue
            for suffix in ("", "h"):
                p = os.path.join(tmp_dir, m.tmp_name + suffix)
                if os.path.exists(p):
                    os.remove(p)


class _TextStreamWriter(_TextWriter, DataSourceStreamWriter):
    """Streaming SINK into the reference chunk layout — the producer twin
    of ``_TextStreamReader``'s tail: each micro-batch appends
    newline-aligned TXT chunks (md5 sidecars, ``chunks_tmp`` two-phase
    commit, ``sn/dfs_actions.go:34-112`` protocol) CONTINUING the file's
    contiguous index sequence, so reference consumers (and our own tail
    reader) see the file grow exactly as if the reference's storage node
    were writing it.

    Exactly-once: Spark replays a micro-batch when a crash lands between
    sink commit and checkpoint offset commit. A batch high-water-mark
    sidecar (``.stream_state_<file>_<ckpt-hash>``, atomically replaced)
    detects the replay and drops its tmp files instead of appending
    duplicates — the growing-file analogue of the batch writer's
    duplicate-store rejection (a tail producer cannot reject by name).
    The state is keyed by the query's checkpointLocation (REQUIRED as an
    explicit ``.option`` — a conf-default or Spark-managed temp
    checkpoint is invisible to the sink and would collapse every stream
    onto one shared key, silently dropping a second stream's first
    batches as 'replays'), so a DIFFERENT stream (fresh checkpoint)
    writing the same file starts its own batch numbering without
    colliding; reusing a checkpoint PATH after deleting its contents
    requires removing the state sidecar too (documented failure mode —
    the sink cannot distinguish that from a replay).
    Crash-safety inside commit: the planned renames are journaled
    atomically BEFORE any rename, so a crash mid-commit rolls forward
    from the journal on replay instead of appending the batch twice, and
    every rename refuses to clobber an existing chunk — two live
    producers on the same (node, file) fail loudly at the index
    collision instead of silently overwriting each other (the layout is
    single-producer-per-file, like the reference's storage node). A
    corrupt state or journal sidecar fails the commit loudly: guessing
    would risk silent chunk duplication, the one thing this protocol
    exists to prevent."""

    _ftype = "TXT"

    def __init__(self, options) -> None:
        super().__init__(options, overwrite=False)
        ck = options.get("checkpointlocation") or options.get(
            "checkpointLocation"
        )
        if not ck:
            raise ValueError(
                f"go_dfs_{self._ftype.lower()} stream sink requires an "
                "explicit .option('checkpointLocation', ...): the replay "
                "high-water-mark is keyed by it, and a conf-default or "
                "temp checkpoint would collapse distinct streams onto one "
                "shared key"
            )
        # normalize URI spellings ('file:///x', 'file:/x') to the plain
        # path so a restart that spells the same checkpoint differently
        # keeps the same replay-state key
        ck = re.sub(r"^file:/{0,2}(?=/)", "", ck)
        self._ckpt_key = hashlib.md5(
            os.path.abspath(ck).encode("utf-8")
        ).hexdigest()[:8]

    @staticmethod
    def _tmp_names(message) -> list[str]:
        return [message.tmp_name]

    def _state_path(self) -> str:
        # 'ck' prefix keeps the name out of _CHUNK_RE's language: a bare
        # hex suffix like '_b1234567' would otherwise parse as a BIN
        # chunk and poison the node's inventory (~0.2% of hashes)
        return os.path.join(
            self._dir, f".stream_state_{self._file}_ck{self._ckpt_key}"
        )

    def _next_idx(self) -> int:
        mx = -1
        for e in self._existing():
            m = _CHUNK_RE.match(e)
            if m.group("tchar") == _CHAR_OF[self._ftype]:
                mx = max(mx, int(m.group("idx")))
        return mx + 1

    @staticmethod
    def _corrupt(what: str, path: str, cause=None) -> RuntimeError:
        return RuntimeError(
            f"corrupt stream-sink {what} {path!r}; refusing to commit "
            "(risk of duplicate chunks) — repair or remove it after "
            "checking the chunk inventory"
        ) if cause is None else RuntimeError(
            f"corrupt stream-sink {what} {path!r}; refusing to commit "
            "(risk of duplicate chunks) — repair or remove it after "
            f"checking the chunk inventory ({cause})"
        )

    def _load_state(self, path: str) -> int:
        """The committed high-water batch id, or -1. Anything short of a
        well-formed {'last_batch': int} refuses loudly — a damaged state
        treated as fresh would replay-append duplicate chunks."""
        if not os.path.exists(path):
            return -1
        try:
            with open(path, "r", encoding="utf-8") as fh:
                payload = json.load(fh)
            return int(payload["last_batch"])
        except (ValueError, OSError, KeyError, TypeError) as exc:
            raise self._corrupt("state", path, exc) from exc

    def _load_journal(self, path: str):
        """The in-flight commit journal {'batch': int, 'renames': [...]},
        or None; malformed shapes refuse loudly like _load_state."""
        if not os.path.exists(path):
            return None
        try:
            with open(path, "r", encoding="utf-8") as fh:
                payload = json.load(fh)
            batch = int(payload["batch"])
            renames = [
                (str(t), str(f)) for t, f in payload["renames"]
            ]
            return {"batch": batch, "renames": renames}
        except (ValueError, OSError, KeyError, TypeError) as exc:
            raise self._corrupt("journal", path, exc) from exc

    def _replace_json(self, path: str, payload) -> None:
        tmp = path + f".tmp_{self._job}"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(payload, fh)
        os.replace(tmp, path)

    def _roll_forward(self, renames, resuming: bool) -> None:
        """Execute (or complete) the journaled tmp->final renames; safe to
        re-run from any crash point, including a half-renamed pair (data
        in place, sidecar still in chunks_tmp). Renames never clobber: a
        final name that already exists while its tmp is ALSO still
        present means another producer took the index (two live streams
        on one (node, file)) — refuse loudly rather than silently
        overwrite. When ``resuming`` a journaled commit, a final that
        exists with its tmp gone is our own completed rename and is
        skipped."""
        tmp_dir = os.path.join(self._dir, "chunks_tmp")
        for tmp_name, final_name in renames:
            final = os.path.join(self._dir, final_name)
            src = os.path.join(tmp_dir, tmp_name)
            if os.path.exists(src):
                if os.path.exists(final):
                    raise RuntimeError(
                        f"chunk {final!r} already exists while committing "
                        f"{tmp_name!r}: another producer is writing this "
                        "(node, file) — the chunk layout is single-"
                        "producer-per-file; refusing to overwrite"
                    )
                os.rename(src, final)
            elif not os.path.exists(final):
                if resuming:
                    # Both the tmp and the final are gone: the journaled
                    # rename never happened and its input no longer exists
                    # (e.g. a failed commit attempt raised, abort() deleted
                    # the batch's tmp files, then the restarted query resumed
                    # this journal). Marking the batch committed here would
                    # silently lose those chunks — the one failure the
                    # journal protocol exists to prevent. Fail loudly; only
                    # a final that exists with its tmp gone is a completed
                    # rename.
                    raise RuntimeError(
                        f"journaled chunk {final_name!r} missing and its tmp "
                        f"{tmp_name!r} gone while resuming batch commit: the "
                        "batch data was deleted before the journaled renames "
                        "completed; refusing to advance the commit "
                        "high-water mark over lost chunks"
                    )
                raise RuntimeError(
                    f"stream-sink tmp chunk {tmp_name!r} vanished before "
                    f"commit of {final_name!r}; aborting the batch"
                )
            side = os.path.join(tmp_dir, tmp_name + "h")
            if os.path.exists(side):
                os.replace(side, final + "h")

    def commit(self, messages, batchId: int) -> None:  # noqa: N803 (API name)
        sp = self._state_path()
        jp = sp + ".journal"
        last = self._load_state(sp)
        journal = self._load_journal(jp)
        if journal is not None and journal["batch"] == batchId:
            # crash landed inside THIS batch's earlier commit attempt:
            # complete the journaled renames, then drop the replay's tmps
            self._roll_forward(journal["renames"], resuming=True)
            self._replace_json(sp, {"last_batch": batchId})
            os.remove(jp)
            self.abort(messages, batchId)
            return
        if batchId <= last:
            # replayed, fully committed batch: chunks already on disk
            self.abort(messages, batchId)
            return
        idx = self._next_idx()
        renames = []
        for m in sorted(
            (m for m in messages if m and m.tmp_name), key=lambda m: m.pid
        ):
            for tmp_name in self._tmp_names(m):
                renames.append(
                    [tmp_name, chunk_name(self._file, self._ftype, idx)]
                )
                idx += 1
        # journal first (atomic), then rename: a crash anywhere below is
        # rolled forward — never re-planned — on the replay
        self._replace_json(jp, {"batch": batchId, "renames": renames})
        self._roll_forward(renames, resuming=False)
        self._replace_json(sp, {"last_batch": batchId})
        os.remove(jp)

    def abort(self, messages, batchId: int) -> None:  # noqa: N803 (API name)
        # A journal on disk means a commit attempt already planned renames
        # over this batch's tmp files; deleting those here would turn the
        # restart's journal roll-forward into data loss (both tmp and final
        # absent — the resuming-mode raise). Preserve journaled tmps so the
        # resumed commit can complete the renames; everything else (the
        # replay's own tmps, half-written task output) is dropped as usual.
        try:
            journal = self._load_journal(self._state_path() + ".journal")
        except RuntimeError as exc:
            # unreadable journal: delete nothing — repair comes first,
            # and abort must never destroy data a journal may reference.
            # Say so: the preserved chunks_tmp litter is intentional
            # (pending journal repair), not a cleanup bug.
            print(
                f"go_dfs abort(batch {batchId}): journal is corrupt "
                f"({exc}); preserving chunks_tmp contents until the "
                "journal is repaired",
                file=sys.stderr,
            )
            return
        keep = (
            frozenset(t for t, _ in journal["renames"])
            if journal is not None
            else frozenset()
        )
        tmp_dir = os.path.join(self._dir, "chunks_tmp")
        for m in messages:
            if not (m and m.tmp_name):
                continue
            for tmp_name in self._tmp_names(m):
                if tmp_name in keep:
                    continue
                for suffix in ("", "h"):
                    p = os.path.join(tmp_dir, tmp_name + suffix)
                    if os.path.exists(p):
                        os.remove(p)


class _TextStreamReader(DataSourceStreamReader):
    """Streaming tail of a growing chunk directory set.

    The offset is ``{"files": {<file>: <next chunk idx>}}`` — per stored
    file, the count of contiguously-processed chunks. This is exact for
    the reference layout because chunk indices are assigned contiguously
    from 0 (``cl/dfs_actions.go:76-95``; our writers commit the same
    way), so "new data" is always a higher index or a brand-new file, and
    the offset stays bounded by the file count, not the chunk count. Each
    micro-batch plans one InputPartition per newly-visible chunk (same
    md5-verify + replica-failover read as the batch reader), so a live
    migration can point ``readStream`` at reference storage-node dirs and
    keep consuming while the old system still writes."""

    def __init__(self, options, ftype: str = "TXT") -> None:
        raw = options.get("path") or options.get("paths")
        if not raw:
            raise ValueError("go_dfs source requires a path (node dir[,dir...])")
        self._dirs = [p for p in (s.strip() for s in raw.split(",")) if p]
        self._file = options.get("file")
        self._verify = str(options.get("verify", "true")).lower() != "false"
        self._ftype = ftype

    def initialOffset(self) -> dict:
        return {"files": {}}

    def latestOffset(self) -> dict:
        # a chunk becomes VISIBLE only once a replica has its md5 sidecar:
        # writers (ours and the reference's, sn/dfs_actions.go:30-34)
        # land the data file before the sidecar, and planning a chunk in
        # that window would crash the tail's read instead of deferring
        # the chunk to the next micro-batch. With verify=false the read
        # never opens sidecars, so data-file existence is the right gate.
        inv = _inventory(self._dirs, self._ftype, self._file)
        by_file: dict[str, set[int]] = {}
        for (f, i), paths in inv.items():
            if not self._verify or any(os.path.exists(p + "h") for p in paths):
                by_file.setdefault(f, set()).add(i)
        files: dict[str, int] = {}
        for f, idxs in by_file.items():
            n = 0
            while n in idxs:  # longest contiguous prefix 0..n-1
                n += 1
            files[f] = n
        return {"files": files}

    def partitions(self, start: dict, end: dict):
        inv = _inventory(self._dirs, self._ftype, self._file)
        parts = []
        for f, n_end in sorted(end.get("files", {}).items()):
            n_start = start.get("files", {}).get(f, 0)
            for i in range(n_start, n_end):
                paths = inv.get((f, i))
                if not paths:
                    raise IOError(
                        f"chunk {chunk_name(f, self._ftype, i)} vanished"
                        " between offset planning and read"
                    )
                parts.append(
                    _ChunkPartition(f, self._ftype, i, tuple(paths), self._verify)
                )
        return parts

    def read(self, partition: _ChunkPartition):
        data = _read_verified(partition)
        for n, line in enumerate(scan_lines(data)):
            yield (partition.file, partition.idx, n, line)

    def commit(self, end: dict) -> None:
        pass  # chunk files are immutable; nothing to release


class GoDfsTextDataSource(DataSource):
    """``spark.read.format("go_dfs_text").load("node1[,node2,...]")`` /
    ``spark.readStream.format("go_dfs_text").load(...)`` (tails growing
    chunk dirs) /
    ``df.write.format("go_dfs_text").option("file", name).save(node)``"""

    @classmethod
    def name(cls) -> str:
        return "go_dfs_text"

    def schema(self) -> str:
        return "file string, chunk_idx bigint, line_number bigint, line string"

    def reader(self, schema):
        return _TextReader(self.options)

    def streamReader(self, schema):
        return _TextStreamReader(self.options)

    def writer(self, schema, overwrite: bool):
        if len(schema.fields) != 1 or schema.fields[0].dataType.typeName() != "string":
            raise ValueError(
                "go_dfs_text write expects exactly one string column of lines,"
                f" got {schema.simpleString()}"
            )
        return _TextWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        if overwrite:
            raise ValueError(
                "go_dfs_text stream sink only supports append output mode "
                "(chunks accrete with continuing indices); complete/update "
                "would re-emit state snapshots as extra chunks"
            )
        if len(schema.fields) != 1 or schema.fields[0].dataType.typeName() != "string":
            raise ValueError(
                "go_dfs_text stream write expects exactly one string column "
                f"of lines, got {schema.simpleString()}"
            )
        return _TextStreamWriter(self.options)


class _BinWriter(_TextWriter):
    """BIN twin of the text writer: each input row's ``content`` bytes
    become one chunk (the Warehouse BIN layout is already chunk rows, so
    export is row -> chunk), with the same chunks_tmp + commit-rename
    protocol and contiguous indices in (partition, row) order."""

    def write(self, iterator) -> _ChunkCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tmp_dir = os.path.join(self._dir, "chunks_tmp")
        os.makedirs(tmp_dir, exist_ok=True)
        names = []
        for n, row in enumerate(iterator):
            # NULL content writes as an empty chunk, matching the text
            # writer's NULL-line policy (the layout has no null notion)
            data = b"" if row[0] is None else bytes(row[0])
            tmp_name = f"{self._job}_p{pid}_{n}"
            with open(os.path.join(tmp_dir, tmp_name), "wb") as fh:
                fh.write(data)
            with open(os.path.join(tmp_dir, tmp_name + "h"), "wb") as fh:
                fh.write(hashlib.md5(data).digest())
            names.append(tmp_name)
        return _ChunkCommit(pid=pid, tmp_name=",".join(names))

    def commit(self, messages) -> None:
        existing = self._existing()
        if existing and not self._overwrite:
            raise FileExistsError(
                f"file {self._file!r} already stored in {self._dir}"
            )
        for e in existing:
            os.remove(os.path.join(self._dir, e))
            side = os.path.join(self._dir, e + "h")
            if os.path.exists(side):
                os.remove(side)
        tmp_dir = os.path.join(self._dir, "chunks_tmp")
        idx = 0
        for m in sorted(
            (m for m in messages if m and m.tmp_name), key=lambda m: m.pid
        ):
            for tmp_name in m.tmp_name.split(","):
                final = os.path.join(self._dir, chunk_name(self._file, "BIN", idx))
                os.rename(os.path.join(tmp_dir, tmp_name), final)
                os.rename(os.path.join(tmp_dir, tmp_name + "h"), final + "h")
                idx += 1

    def abort(self, messages) -> None:
        tmp_dir = os.path.join(self._dir, "chunks_tmp")
        for m in messages:
            if not (m and m.tmp_name):
                continue
            for tmp_name in m.tmp_name.split(","):
                for suffix in ("", "h"):
                    p = os.path.join(tmp_dir, tmp_name + suffix)
                    if os.path.exists(p):
                        os.remove(p)


class _BinStreamWriter(_TextStreamWriter):
    """BIN twin of the text stream sink: each micro-batch row's bytes
    become one appended chunk (row -> chunk, like the batch BIN writer),
    with the same continuing-index commit and replay protection."""

    _ftype = "BIN"
    write = _BinWriter.write

    @staticmethod
    def _tmp_names(message) -> list[str]:
        return message.tmp_name.split(",")
    # abort: inherited journal-aware variant (_TextStreamWriter.abort uses
    # the polymorphic _tmp_names, so the comma-joined BIN names work)


class _BinStreamReader(_TextStreamReader):
    """BIN twin of the streaming tail: one (file, chunk_idx, content)
    row per newly-visible chunk, same per-file contiguous offsets."""

    def __init__(self, options) -> None:
        super().__init__(options, "BIN")

    def read(self, partition: _ChunkPartition):
        yield (partition.file, partition.idx, _read_verified(partition))


class GoDfsBinDataSource(DataSource):
    """``spark.read.format("go_dfs_bin").load("node1[,node2,...]")`` /
    ``spark.readStream.format("go_dfs_bin").load(...)`` (tails growing
    chunk dirs) /
    ``df.write.format("go_dfs_bin").option("file", name).save(node)``"""

    @classmethod
    def name(cls) -> str:
        return "go_dfs_bin"

    def schema(self) -> str:
        return "file string, chunk_idx bigint, content binary"

    def reader(self, schema):
        return _BinReader(self.options)

    def streamReader(self, schema):
        return _BinStreamReader(self.options)

    def writer(self, schema, overwrite: bool):
        if len(schema.fields) != 1 or schema.fields[0].dataType.typeName() != "binary":
            raise ValueError(
                "go_dfs_bin write expects exactly one binary column of"
                f" chunk contents, got {schema.simpleString()}"
            )
        return _BinWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        if overwrite:
            raise ValueError(
                "go_dfs_bin stream sink only supports append output mode "
                "(chunks accrete with continuing indices); complete/update "
                "would re-emit state snapshots as extra chunks"
            )
        if len(schema.fields) != 1 or schema.fields[0].dataType.typeName() != "binary":
            raise ValueError(
                "go_dfs_bin stream write expects exactly one binary column"
                f" of chunk contents, got {schema.simpleString()}"
            )
        return _BinStreamWriter(self.options)


def register(spark) -> None:
    """Register both formats on this session (idempotent)."""
    spark.dataSource.register(GoDfsTextDataSource)
    spark.dataSource.register(GoDfsBinDataSource)


def _verify_replica(path: str) -> tuple[str, str]:
    """(path, status) where status is healthy | corrupt | missing_sidecar.

    Module-level and self-contained so it ships to Spark tasks as-is."""
    import hashlib as _h

    try:
        with open(path + "h", "rb") as fh:
            want = fh.read()
    except OSError:
        return (path, "missing_sidecar")
    try:
        h = _h.md5()
        with open(path, "rb") as fh:
            for block in iter(lambda: fh.read(1 << 20), b""):
                h.update(block)
    except OSError:
        return (path, "corrupt")
    return (path, "healthy" if h.digest() == want else "corrupt")


def fsck(
    dirs: list[str],
    repair: bool = False,
    replicas: int = 3,
    spark=None,
) -> list[dict]:
    """The controller's maintenance cycle as a batch pass
    (``cn/struct.go:234-392`` re-replicates chunks with fewer than 3
    healthy copies; ``sn/dfs_actions.go:183-194`` deletes a replica whose
    bytes no longer match its checksum so the next cycle restores it).

    Scans every chunk across the node dirs, md5-verifies each replica
    against its sidecar, and reports one dict per chunk:
    ``{file, ftype, idx, healthy, corrupt, missing_sidecar, repaired}``
    (``corrupt`` = bad digest, ``missing_sidecar`` = data file with no
    readable sidecar; repair deletes both kinds). With ``repair=True``:
    bad replicas are deleted, then healthy bytes are copied to nodes
    lacking a replica until ``replicas`` copies exist (or nodes run
    out). A chunk with NO healthy replica is reported but untouched —
    the reference logs the same unrecoverable case
    (``cn/struct.go:266-268``).

    The verify phase is the byte-scale part; given ``spark`` it runs as
    one Spark task per replica over the inventory (the distributed twin
    of the controller's per-node checks — at deployment each task reads
    its node-local file). The inventory walk and the repair bookkeeping
    are metadata-scale and stay on the driver; repair copies are
    node-local at deployment. Without ``spark`` the verify loops on the
    driver (small layouts, no session at hand).

    Node dirs and replica paths are realpath-normalized so membership
    checks can't be fooled by trailing slashes / ``./`` aliases (a
    mis-ranked membership check could otherwise select a copy whose
    source and destination are the same file — guarded against
    independently below).
    """
    norm_dirs: list[str] = []
    for d in dirs:
        if not os.path.isdir(d):
            raise FileNotFoundError(f"go_dfs node directory {d!r} not found")
        rd = os.path.realpath(d)
        if rd not in norm_dirs:
            norm_dirs.append(rd)
    chunks: dict[tuple[str, str, int], list[str]] = {}
    for d in norm_dirs:
        for entry in sorted(os.listdir(d)):
            m = _CHUNK_RE.match(entry)
            if not m:
                continue
            key = (m.group("file"), _TYPE_OF[m.group("tchar")], int(m.group("idx")))
            chunks.setdefault(key, []).append(os.path.join(d, entry))

    all_paths = [p for paths in chunks.values() for p in paths]
    if spark is not None and all_paths:
        sc = spark.sparkContext
        slices = min(len(all_paths), sc.defaultParallelism)
        status = dict(
            sc.parallelize(all_paths, slices).map(_verify_replica).collect()
        )
    else:
        status = dict(map(_verify_replica, all_paths))

    report = []
    for (fname, ftype, idx), paths in sorted(chunks.items()):
        healthy = [p for p in paths if status[p] == "healthy"]
        corrupt = [p for p in paths if status[p] == "corrupt"]
        no_sidecar = [p for p in paths if status[p] == "missing_sidecar"]
        repaired = 0
        if repair and healthy:
            for p in corrupt + no_sidecar:  # delete bad replicas (sn semantics)
                for suffix in ("", "h"):
                    if os.path.exists(p + suffix):
                        os.remove(p + suffix)
            src = healthy[0]
            have = {os.path.dirname(p) for p in healthy}
            for d in norm_dirs:  # re-replicate onto nodes lacking a copy
                if len(have) >= replicas:
                    break
                if d in have:
                    continue
                dst = os.path.join(d, chunk_name(fname, ftype, idx))
                if os.path.exists(dst) and os.path.samefile(src, dst):
                    continue  # never open the healthy source for writing
                for suffix in ("", "h"):
                    with open(src + suffix, "rb") as fin, open(
                        dst + suffix, "wb"
                    ) as fout:
                        fout.write(fin.read())
                have.add(d)
                repaired += 1
        report.append(
            {
                "file": fname,
                "ftype": ftype,
                "idx": idx,
                "healthy": len(healthy),
                "corrupt": len(corrupt),
                "missing_sidecar": len(no_sidecar),
                "repaired": repaired,
            }
        )
    return report
