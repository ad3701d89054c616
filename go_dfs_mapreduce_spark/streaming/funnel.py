"""Stateful streaming funnel: the greedy event-path automaton of
``operators.timeseries.event_path_conversion`` run as a per-user
streaming state machine — the conversion feed a product pipeline tails
(alerting, attribution) instead of recomputing the batch table.

Semantics: per user, advance through signup -> click -> purchase in
event-time order and emit ONE row the moment the pattern completes,
carrying the exact microsecond latency from the matched signup to the
matched purchase. Emission is append-only BY CONSTRUCTION: the greedy
(earliest in-order) embedding is prefix-stable — processing events in
time order, the automaton state after any prefix is a pure function of
that prefix, so the first time state reaches k=3 is the final answer and
is never revised. A converted user's state freezes at k=3 (a done flag
in spirit); later events are consumed without effect, which is also the
state-cleanup story — converted keys hold 3 longs forever or until a
TTL evicts them.

Scale: state is ONE (k, t0_us, t2_us) triple per user — independent of
stream length; the state store shuffles once on user_id. The same
ordering contract as every *_live query applies (time-ordered arrival
across micro-batches; the landing-file split orders by (ts, event_id)).

Like :mod:`novelty`, the operator ships on both arbitrary-state APIs:
``path_conversions_stream_v1`` (``applyInPandasWithState``, no protobuf
dependency — the path the registered gate query runs) and
``PathConversionProcessor`` (``transformWithStateInPandas``, Spark 4's
typed-state successor).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

PATTERN = ("signup", "click", "purchase")
OUTPUT_SCHEMA = "user_id long, micros_to_convert long"
_DONE = len(PATTERN)


def _advance(k: int, t0us: int, t2us: int, event_type: str, ts_us: int):
    """One automaton step; returns the next (k, t0us, t2us)."""
    if k == 0 and event_type == PATTERN[0]:
        return 1, ts_us, t2us
    if k == 1 and event_type == PATTERN[1]:
        return 2, t0us, t2us
    if k == 2 and event_type == PATTERN[2]:
        return 3, t0us, ts_us
    return k, t0us, t2us


def _fold_chunks(k, t0us, t2us, chunks):
    """Advance the automaton over a key's micro-batch (possibly multiple
    Arrow chunks — concat before the (ts, event_id) sort, the same
    batching-invariance guard as novelty's processor)."""
    if chunks and k < _DONE:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
        for _, row in pdf.iterrows():
            k, t0us, t2us = _advance(
                k, t0us, t2us, str(row["event_type"]), row["ts"].value // 1000
            )
            if k == _DONE:
                break
    return k, t0us, t2us


def _path_v1_fn(key, pdf_iter, state):
    """applyInPandasWithState kernel; state = one (k, t0us, t2us) row."""
    (user_id,) = key
    k, t0us, t2us = state.get if state.exists else (0, 0, 0)
    was_done = k == _DONE
    k, t0us, t2us = _fold_chunks(k, t0us, t2us, list(pdf_iter))
    state.update((k, t0us, t2us))
    if k == _DONE and not was_done:
        yield pd.DataFrame(
            [(int(user_id), int(t2us - t0us))],
            columns=["user_id", "micros_to_convert"],
        )


def path_conversions_stream_v1(events: DataFrame) -> DataFrame:
    """events (streaming) -> append-only conversion rows (v1 API)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _path_v1_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType="k long, t0us long, t2us long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class PathConversionProcessor(StatefulProcessor):
    """transformWithStateInPandas variant: same automaton, typed
    ValueState. Requires google.protobuf at runtime (the state-server
    protocol); semantics proven equal to the v1 kernel by
    tests/test_streaming.py's shared-fold construction — both paths call
    ``_fold_chunks``."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._st = handle.getValueState(
            "path_state", "k long, t0us long, t2us long"
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        cur = self._st.get()
        k, t0us, t2us = cur if cur is not None else (0, 0, 0)
        was_done = k == _DONE
        k, t0us, t2us = _fold_chunks(k, t0us, t2us, list(rows))
        self._st.update((k, t0us, t2us))
        if k == _DONE and not was_done:
            yield pd.DataFrame(
                [(int(user_id), int(t2us - t0us))],
                columns=["user_id", "micros_to_convert"],
            )

    def close(self) -> None:
        pass


def path_conversions_stream(events: DataFrame) -> DataFrame:
    """events (streaming) -> append-only conversion rows (tws API)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=PathConversionProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
