"""Custom stateful streaming operator via transformWithStateInPandas
(Spark 4's arbitrary-state API — the successor to applyInPandasWithState
with typed, composable state primitives and timers).

The demo operator is a per-user FIRST-OCCURRENCE detector: emit an event
only the first time its (user_id, event_type) combination is ever seen —
the streaming-dedup shape a training-data pipeline uses to build "new
behavior" feeds. Seen types live in a ListState per user; output is
append-only (a first occurrence is never revised), so state never needs
rewriting once a type is recorded.

Batch-checkability (same strategy as the window surface): after
processing ALL input, the emitted rows must equal the batch twin
``first_occurrences_batch`` — the min-ts row per (user_id, event_type) —
which tests/test_streaming_novelty.py asserts through the real streaming
engine. Within a micro-batch, ties on ts break by event_id, matching the
twin's deterministic argmin.

Scale: state is one small list per user (bounded by the event-type
vocabulary, NOT the stream length), partitioned by user_id in the state
store; at 100 TB the state store shuffles once on user_id and each list
stays a few strings. timeMode="None" because first-ever semantics never
expire; a TTL variant is one ``ttlDurationMs`` argument away.

Runtime dependency: Spark's transformWithStateInPandas driver worker
imports ``google.protobuf`` (its state-server protocol is protobuf over
a local socket). The SAME operator is therefore also provided on the v1
arbitrary-state API (``first_occurrences_stream_v1`` via
``applyInPandasWithState``), which has no protobuf dependency and runs
the real streaming engine anywhere; the batch twin stays oracle-checked
either way. tests/test_streaming_novelty.py runs the v1 path end-to-end,
and drives THIS processor class through a local replay of the engine
contract when protobuf is absent — zero environment-dependent skips.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = (
    "user_id long, event_type string, first_event_id long, first_ts timestamp"
)


class FirstOccurrenceProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getListState("seen_types", "event_type string")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        seen = {r[0] for r in self._seen.get()}
        out = []
        # a key's micro-batch arrives as MULTIPLE Arrow chunks when it
        # exceeds maxRecordsPerBatch — concat before the (ts, event_id)
        # sort, else a later-ts row in an earlier chunk would win and
        # break the batching-invariance equality with the batch twin
        chunks = list(rows)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            for _, row in pdf.iterrows():
                et = str(row["event_type"])
                if et in seen:
                    continue
                seen.add(et)
                self._seen.appendValue((et,))
                out.append(
                    (int(user_id), et, int(row["event_id"]), row["ts"])
                )
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "event_type", "first_event_id", "first_ts"],
            )

    def close(self) -> None:
        pass


def first_occurrences_stream(events: DataFrame) -> DataFrame:
    """events (streaming) -> append-only first-occurrence rows."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=FirstOccurrenceProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


def _first_occurrences_v1_fn(key, pdf_iter, state):
    """applyInPandasWithState kernel: same semantics as
    FirstOccurrenceProcessor, with the seen-type set as ONE GroupState row
    (array<string>) instead of ListState appends."""
    (user_id,) = key
    seen = set((state.get)[0]) if state.exists else set()
    chunks = list(pdf_iter)
    out = []
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        for _, row in pdf.iterrows():
            et = str(row["event_type"])
            if et in seen:
                continue
            seen.add(et)
            out.append((int(user_id), et, int(row["event_id"]), row["ts"]))
    state.update((sorted(seen),))
    if out:
        yield pd.DataFrame(
            out, columns=["user_id", "event_type", "first_event_id", "first_ts"]
        )


def first_occurrences_stream_v1(events: DataFrame) -> DataFrame:
    """The same first-occurrence operator on the v1 arbitrary-state API
    (``applyInPandasWithState``), which has no protobuf dependency — the
    engine path that runs in protobuf-less environments, and a live
    demonstration that both state APIs express this operator. State per
    user is one array<string> of seen types (bounded by the event-type
    vocabulary, same as the ListState variant)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _first_occurrences_v1_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType="seen array<string>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def first_occurrences_batch(events: DataFrame) -> DataFrame:
    """Batch twin: the deterministic argmin-(ts, event_id) row per
    (user_id, event_type)."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
        )
    )
