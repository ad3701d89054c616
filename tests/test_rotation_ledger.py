"""Registry-rotation bookkeeping guard (VERDICT r6 #8).

At 185+ registered queries the showcase rotation is the main evidence
risk surface: a name dropped from rotation before ever earning a driver
row silently loses its only externally-scored verification. This ledger
test pins the invariant: every registered query name must either already
appear in some driver CORRECTNESS_r*.json or be scheduled in the current
round's _DRIVER_SHOWCASE slice. It needs no SparkSession — importing the
operator modules only registers builders.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_recorded_names() -> set[str]:
    names: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            names.update(json.load(f).keys())
    return names


def test_every_registered_name_has_or_is_queued_for_driver_evidence():
    from go_dfs_mapreduce_spark import registry

    queries, _ = registry.collect()
    recorded = _driver_recorded_names()
    showcase = set(registry._DRIVER_SHOWCASE)
    queued = set(registry._NEXT_ROTATION_QUEUE)
    orphans = sorted(set(queries) - recorded - showcase - queued)
    assert not orphans, (
        "registered queries with no driver row and no slot in the current "
        f"rotation (add them to _DRIVER_SHOWCASE or _NEXT_ROTATION_QUEUE): "
        f"{orphans}"
    )
    # the queue is for names that genuinely lack evidence AND a slot —
    # anything already recorded or showcased should not linger in it
    stale = sorted(queued & (recorded | showcase))
    assert not stale, f"queued names already have evidence or a slot: {stale}"
    # queued names must actually be registered (typo guard)
    ghosts = sorted(queued - set(queries))
    assert not ghosts, f"queued names not registered: {ghosts}"


def test_showcase_is_exactly_the_driver_prefix():
    from go_dfs_mapreduce_spark import registry

    queries, oracles = registry.collect()
    head = list(queries)[: len(registry._DRIVER_SHOWCASE)]
    assert head == list(registry._DRIVER_SHOWCASE)
    # every showcase row the driver will hash needs an oracle unless it
    # is a declared rows-only (non-SQL-expressible) query
    rows_only = {n for n in head if n not in oracles}
    # keep this allowlist deliberately explicit: adding a rows-only query
    # to the showcase is an evidence-strength decision, not an accident
    assert rows_only <= {"stream_dfs_chunk_tail"}, rows_only
