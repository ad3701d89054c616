"""Persisted derived-table warehouse: feature/index tables built once per
source-corpus version and reused by every consumer — the production
pattern behind round 7's cold-path wins (VERDICT r6 #5).

Several operator families re-derive the same small intermediate frame
from the raw tables on every cold invocation: the graph family's
co-purchase edge list (lineitem self-join + distinct) and the dedup
family's per-doc shingle arrays (tokenize + collect_set). Both are
orders of magnitude smaller than their source (8.1 MB edges / 2.2 MB
shingle arrays at sf0.1) and strictly determined by it — exactly what a
100 TB deployment materializes as a curated feature table next to the
corpus rather than recomputing per query. Measured at sf0.1 (median of
3, cache-cleared): edges build 2.71 s vs parquet re-read 0.31 s,
shingle arrays 1.21 s vs 0.28 s (SCALE.md round-7).

Staleness is handled by CONTENT FINGERPRINT, not trust: the cache key
includes (layout version, absolute sf_dir, and the (relpath, size,
mtime_ns) of every source parquet file), so regenerating the testdata —
or pointing at a different corpus — misses the cache and rebuilds
rather than silently serving stale rows. Writes are atomic
(build into a pid-suffixed temp dir, ``os.rename`` into place; the
loser of a concurrent race discards its copy), and stale fingerprints
of the same table are garbage-collected on the next build.

In-memory session caching stays where it was (``memo.session_memo``
persists the read-back frame per session); this layer only changes what
a COLD build costs.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_LAYOUT_VERSION = 1
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _default_base() -> str:
    return os.environ.get("SPARK_GRAFT_DERIVED_DIR") or os.path.join(
        _REPO_ROOT, "warehouse", "derived"
    )


def _source_fingerprint(
    sf_dir: str, source_tables: tuple[str, ...], version: int = 1
) -> str:
    """Content key of the source tables: any byte-size or mtime change in
    any part file changes the fingerprint. ``version`` is the BUILDER'S
    OWN version (per table, bumped by the caller whenever the builder's
    semantics change — a new hash formula, a different lane count), and
    the global layout version is folded in too: fingerprinting only
    source bytes would silently serve a stale index after a code change
    (round-14 review finding)."""
    parts: list[tuple[str, int, int]] = []
    for t in source_tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            for root, _, files in os.walk(p):
                for f in sorted(files):
                    fp = os.path.join(root, f)
                    st = os.stat(fp)
                    parts.append(
                        (os.path.relpath(fp, sf_dir), st.st_size, st.st_mtime_ns)
                    )
        elif os.path.exists(p):
            st = os.stat(p)
            parts.append((f"{t}.parquet", st.st_size, st.st_mtime_ns))
    blob = json.dumps(
        [_LAYOUT_VERSION, version, os.path.abspath(sf_dir), sorted(parts)],
        separators=(",", ":"),
    )
    return hashlib.md5(blob.encode()).hexdigest()[:16]


def derived_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    source_tables: tuple[str, ...],
    build: Callable[[], DataFrame],
    version: int = 1,
) -> DataFrame:
    """Return ``name`` derived from ``source_tables`` under ``sf_dir``,
    reading the fingerprint-matched parquet copy if one exists and
    building + atomically publishing it otherwise.

    The read-back is REPARTITIONED to the session's default parallelism
    before it reaches consumers: these feature tables are megabytes, so
    the scan's file bin-packing (maxPartitionBytes + openCostInBytes)
    collapses them into a handful of read partitions, and a consumer
    that persists the frame inherits that collapsed parallelism in every
    map-side stage built on the cache — measured on the common-neighbors
    wedge self-join as 34.9 s vs 22.5 s at sf0.1 (SCALE.md round-7). One
    round-robin exchange of a few MB per cold session buys the correct
    task fan-out everywhere downstream."""
    base = _default_base()
    fp = _source_fingerprint(sf_dir, source_tables, version)
    dst = os.path.join(base, f"{name}-{fp}")
    if not os.path.isdir(dst):
        os.makedirs(base, exist_ok=True)
        tmp = f"{dst}.tmp-{os.getpid()}"
        build().write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, dst)
        except OSError:
            # a concurrent builder published first; its copy is
            # byte-equivalent in content (same fingerprint), keep it
            shutil.rmtree(tmp, ignore_errors=True)
        _gc_stale_versions(base, name, keep=os.path.basename(dst))
    return spark.read.parquet(dst).repartition(
        max(spark.sparkContext.defaultParallelism, 1)
    )


# Published versions of one table retained per name: the fingerprint
# embeds the corpus path, so gate (sf0.01) and bench (sf0.1) runs that
# alternate would otherwise delete each other's live copy every build —
# rebuild-thrash, plus an rmtree under a concurrent reader's scan
# (round-14 review finding). Keeping a few newest versions makes the
# common multi-corpus workflow stable; truly stale versions age out.
KEEP_VERSIONS = 4


def _mtime_or_zero(path: str) -> float:
    """GC sort key tolerant of a CONCURRENT session GC-ing the same table
    between our listdir and the stat (round-14 advice): a vanished entry
    sorts oldest and the rmtree below is already ignore_errors."""
    try:
        return os.path.getmtime(path)
    except OSError:
        return 0.0


def _gc_stale_versions(base: str, name: str, keep: str) -> None:
    """Drop this table's oldest published versions beyond KEEP_VERSIONS
    (never the one just published, never in-flight .tmp dirs)."""
    versions = [
        d
        for d in os.listdir(base)
        if d.startswith(f"{name}-") and ".tmp-" not in d
    ]
    versions.sort(
        key=lambda d: _mtime_or_zero(os.path.join(base, d)), reverse=True
    )
    for d in versions[KEEP_VERSIONS:]:
        if d != keep:
            shutil.rmtree(os.path.join(base, d), ignore_errors=True)


def _bases() -> list[str]:
    """All artifact stores under the warehouse root: the derived parquet
    tables plus the sibling bin_store (reference-layout chunk corpora,
    e.g. the stored-BIN decode twin's) — one inventory/GC surface for
    both (round-14 review: bin_store was invisible to `derived ls`/`gc`,
    so a crashed build's .tmp dir leaked forever)."""
    base = _default_base()
    sibling = os.path.join(os.path.dirname(base.rstrip(os.sep)), "bin_store")
    return [base] + ([sibling] if os.path.isdir(sibling) else [])


def list_tables() -> list[dict]:
    """Inventory of the derived warehouse: one dict per published table
    version (name, fingerprint, bytes, part files, mtime) plus any
    orphaned .tmp dirs from crashed builders."""
    out: list[dict] = []
    for base in _bases():
        if not os.path.isdir(base):
            continue
        _list_base(base, out)
    return out


def _list_base(base: str, out: list[dict]) -> None:
    for d in sorted(os.listdir(base)):
        p = os.path.join(base, d)
        if not os.path.isdir(p):
            continue
        files = [
            os.path.join(r, f) for r, _, fs in os.walk(p) for f in fs
        ]
        name, _, fp = d.rpartition("-")

        def _size(f: str) -> int:
            try:  # tolerate a concurrent GC racing the inventory walk
                return os.path.getsize(f)
            except OSError:
                return 0

        out.append(
            {
                "name": name if ".tmp-" not in d else d,
                "fingerprint": fp if ".tmp-" not in d else None,
                "orphan_tmp": ".tmp-" in d,
                "bytes": sum(_size(f) for f in files),
                "n_files": len(files),
                "mtime": int(_mtime_or_zero(p)),
                "store": os.path.basename(base),
            }
        )


def gc(drop_all: bool = False) -> list[str]:
    """Remove orphaned .tmp build dirs (always safe: a live builder
    publishes via rename, so anything still named .tmp-* after its
    process exits is litter); with ``drop_all``, drop every published
    table too — they rebuild from source on next use."""
    removed: list[str] = []
    for base in _bases():
        if not os.path.isdir(base):
            continue
        for d in sorted(os.listdir(base)):
            p = os.path.join(base, d)
            if not os.path.isdir(p):
                continue
            if ".tmp-" in d or drop_all:
                shutil.rmtree(p, ignore_errors=True)
                removed.append(d)
    return removed
