"""Node membership / heartbeat twin of the controller's maintenance
cycle (``cn/struct.go:53-187``).

The reference controller dials every storage node each 5 s cycle
(``stethoscope``), parses a Heartbeat {Space, Served, Busy, ChunkMap},
evicts nodes silent for >22 s (``flatline_check``, cn/struct.go:175-187),
rebuilds the soft-state files map from live nodes' chunk maps
(``update_filesmap``), and schedules re-replication for chunks on fewer
than 3 live nodes (``check_replication_level``).

The Spark-first twin replaces the TCP push with a filesystem pull — the
right shape when "nodes" are directories a cluster manager already
supervises:

- ``touch_heartbeat(dir, ...)`` is the storage node's side: an agent (or
  cron) writes ``.heartbeat`` — a JSON twin of wire.Heartbeat with the
  epoch, free space, and served-files count.
- ``node_status(dirs, flatline_ms=22000)`` is the controller's side: one
  cycle of stethoscope + flatline_check + update_filesmap +
  check_replication_level as a pure batch pass. A node with a fresh
  heartbeat is ALIVE; silent past the flatline window is DEAD and its
  replicas leave the files map exactly as the reference deletes the
  node_socket; chunks whose live replica count < target are reported —
  the work order ``dfs-fsck --repair`` (sources/dfs_chunks.py) then
  executes.

Scale: both sides are metadata-only (one stat + one dict per node, one
listing per dir — the same cost the controller pays per cycle); the
byte-scale work (verify/copy) stays in fsck where it runs as Spark
tasks.
"""

from __future__ import annotations

import json
import os
import time

from .dfs_chunks import _CHUNK_RE, _TYPE_OF

FLATLINE_MS = 22_000  # cn/struct.go:182 — the reference's eviction window


def touch_heartbeat(node_dir: str, space: int | None = None) -> dict:
    """Write ``<dir>/.heartbeat`` — the wire.Heartbeat twin. Returns the
    heartbeat dict. ``space`` defaults to the filesystem's free bytes
    (the node's statfs, as the reference node reports its disk)."""
    if not os.path.isdir(node_dir):
        raise FileNotFoundError(f"node directory {node_dir!r} not found")
    served = set()
    for entry in os.listdir(node_dir):
        m = _CHUNK_RE.match(entry)
        if m:
            served.add(m.group("file"))
    if space is None:
        st = os.statvfs(node_dir)
        space = st.f_bavail * st.f_frsize
    hb = {
        "epoch_ms": int(time.time() * 1000),
        "space": int(space),
        "served": len(served),
    }
    tmp = os.path.join(node_dir, ".heartbeat.tmp")
    with open(tmp, "w") as fh:
        json.dump(hb, fh)
    os.replace(tmp, os.path.join(node_dir, ".heartbeat"))  # atomic, like
    # the chunks_tmp commit rename
    return hb


def node_status(
    dirs: list[str],
    flatline_ms: int = FLATLINE_MS,
    replicas: int = 3,
    now_ms: int | None = None,
) -> dict:
    """One controller maintenance cycle over the node dirs.

    Returns ``{"nodes": [...], "under_replicated": [...]}``:

    - nodes: per dir — alive flag, heartbeat age ms, space, served file
      count, chunk count (dead nodes keep their stats for the report but
      contribute NOTHING to the files map, mirroring node_socket
      deletion).
    - under_replicated: per (file, ftype, idx) with fewer than
      ``replicas`` live copies — the controller's replicate queue; feed
      these dirs to ``fsck(repair=True)`` to execute the copies.

    A dir with no ``.heartbeat`` file is treated as never-reporting
    (dead) unless it has chunk files, in which case its newest chunk
    mtime stands in as a last-known heartbeat — migration mode for
    layouts written by the reference itself, which has no such file.
    """
    if now_ms is None:
        now_ms = int(time.time() * 1000)
    # realpath-normalize + dedupe, like fsck: 'n1' and 'n1/' are ONE node,
    # and counting an aliased dir twice would fake a replica and hide
    # under-replication — the exact condition this report exists to catch
    norm_dirs: list[str] = []
    for d in dirs:
        if not os.path.isdir(d):
            raise FileNotFoundError(f"node directory {d!r} not found")
        rd = os.path.realpath(d)
        if rd not in norm_dirs:
            norm_dirs.append(rd)
    nodes = []
    live_chunks: dict[tuple[str, str, int], int] = {}
    for d in norm_dirs:
        hb_path = os.path.join(d, ".heartbeat")
        space = served = None
        epoch_ms = None
        has_hb_file = os.path.isfile(hb_path)
        if has_hb_file:
            try:
                with open(hb_path) as fh:
                    hb = json.load(fh)
                epoch_ms = int(hb["epoch_ms"])
                space = hb.get("space")
                served = hb.get("served")
            except (ValueError, KeyError, OSError):
                epoch_ms = None  # corrupt heartbeat == silence
        chunks = []
        for entry in sorted(os.listdir(d)):
            m = _CHUNK_RE.match(entry)
            if m:
                chunks.append(
                    (m.group("file"), _TYPE_OF[m.group("tchar")], int(m.group("idx")))
                )
        if epoch_ms is None and not has_hb_file and chunks:
            # migration mode is ONLY for dirs that never participate in
            # the heartbeat protocol (reference-written layouts); a node
            # that writes .heartbeat but corrupts it is silent, not
            # grandfathered — chunk mtimes must not revive it
            epoch_ms = int(
                max(
                    os.path.getmtime(os.path.join(d, e))
                    for e in os.listdir(d)
                    if _CHUNK_RE.match(e)
                )
                * 1000
            )
        age_ms = None if epoch_ms is None else now_ms - epoch_ms
        alive = age_ms is not None and age_ms <= flatline_ms
        nodes.append(
            {
                "dir": d,
                "alive": alive,
                "heartbeat_age_ms": age_ms,
                "space": space,
                "served": served if served is not None else len({c[0] for c in chunks}),
                "chunks": len(chunks),
            }
        )
        for key in chunks:
            # files map counts LIVE replicas only (update_filesmap builds
            # from live nodes' chunk maps); dead nodes' chunks still seed
            # the key at 0 — one thing the pull model can see that the
            # reference's push model cannot: a chunk stranded entirely on
            # flatlined nodes surfaces as live_replicas=0 instead of
            # silently vanishing from the files map
            live_chunks[key] = live_chunks.get(key, 0) + (1 if alive else 0)
    under = [
        {
            "file": f,
            "ftype": t,
            "idx": i,
            "live_replicas": n,
            "want": replicas,
        }
        for (f, t, i), n in sorted(live_chunks.items())
        if n < replicas
    ]
    return {"nodes": nodes, "under_replicated": under}
