"""Stateful streaming token-bucket rate limiter — admission control at
the ingestion edge (``operators.timeseries.events_rate_limit``'s
streaming twin): per user, a bucket of capacity ``RL_CAP_MICRO``
micro-tokens refills at ``RL_RATE_MICRO_PER_SEC`` per elapsed second;
each event costs ``RL_COST_MICRO`` and is ALLOWED iff the refilled
balance covers the cost. The classic clamped-counter recursion

    avail_i = min(CAP, after_{i-1} + (t_i - t_{i-1}) * RATE)
    after_i = avail_i - COST if avail_i >= COST else avail_i

has NO window identity (the min() clamp couples every step — unlike
CUSUM's one-sided max(0, .), which the prefix-min identity linearizes),
so BOTH twins run the same Arrow kernel: the batch operator folds each
user's whole history in one ``applyInPandas`` group pass (the declared
Python-path exception, like ``winnow_candidate_pairs_fast``), the
streaming operator folds incrementally with TWO LONGS of state
(balance, last event's epoch second). The DuckDB oracle replays the
recursion as a per-user recursive CTE, so the gate hash-checks every
verdict of every event through either engine.

Emission is append-only BY CONSTRUCTION: an event's verdict depends only
on its user's strictly-earlier events (prefix-stable, never revised) —
the funnel/z-score/CUSUM argument.

Out-of-order arrival across micro-batches is a CHOSEN policy, not an
accident (round-11): late events earn zero refill and never rewind the
monotone bucket clock (see ``_fold_bucket``). The reference never faces
this — TCP per-connection ordering serializes each client's stream
(``wire/wire_handler.go:49-74``); a distributed engine has no such
luxury and must pick a policy.

Numeric story: NO float path. Timestamps quantize to whole epoch
seconds, balances are micro-token int64, every step (multiply, add, min,
compare, subtract) is 64-bit integer arithmetic — cross-engine agreement
is unconditional.

Ships on both arbitrary-state APIs (the repo convention):
``ratelimit_stream_v1`` (``applyInPandasWithState`` — the registered
gate path) and ``RateLimitProcessor`` (``transformWithStateInPandas``);
both fold through the shared ``_fold_bucket``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

RL_CAP_MICRO = 3_000_000        # bucket capacity: 3 tokens
RL_RATE_MICRO_PER_SEC = 100     # refill: 1 token per 10^4 seconds
RL_COST_MICRO = 1_000_000       # every event costs 1 token

OUTPUT_SCHEMA = (
    "user_id long, ts timestamp, event_id long, allowed boolean,"
    " tokens_micro_after long"
)
STATE_SCHEMA = "bal long, last_t long"  # balance after, last epoch second


def _fold_bucket(bal, last_t, chunks: list[pd.DataFrame], user_id: int):
    """Advance one key's bucket over its micro-batch slice (concat
    before the (ts, event_id) sort — the shared batching-invariance
    guard) and collect one verdict row per event. Pure int64 throughout;
    ``bal``/``last_t`` of None mean 'first event starts a full bucket'.

    Out-of-order policy (PINNED, round-11): a LATE event — event-time
    earlier than the bucket clock, possible only across micro-batches
    since each batch sorts by (ts, event_id) — earns ZERO refill and
    does NOT rewind the clock: ``dt`` clamps at 0 and ``last_t`` is
    monotone max. Without the clamp, ``(t - last_t) * RATE`` goes
    negative and a single late event silently DRAINS the bucket (the
    r10 verdict's #1 finding); without the monotone clock, the next
    on-time event would refill from the late timestamp and mint double
    tokens. Late events are still charged against the current balance —
    'late events don't refund'. On an event-time-ordered feed (what the
    batch twin's per-group sort and the oracle's ROW_NUMBER replay
    guarantee) both guards are no-ops, so batch/stream/oracle equality
    is unchanged; the policy is pinned by
    ``test_ratelimit_out_of_order_late_event_no_refund``."""
    out = []
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
        # vectorize the column extraction once (no iterrows, no per-row
        # Timestamp wrapping); only the inherently sequential bucket
        # recursion runs per event
        tss = list(pdf["ts"])
        secs = (
            pdf["ts"].to_numpy("datetime64[ns]").astype("int64")
            // 1_000_000_000
        )
        eids = pdf["event_id"].to_numpy()
        uid = int(user_id)
        for ts, t, eid in zip(tss, secs.tolist(), eids.tolist()):
            if last_t is None:
                avail = RL_CAP_MICRO
            else:
                dt = t - last_t
                if dt < 0:
                    dt = 0  # late event: no refund
                avail = min(
                    RL_CAP_MICRO,
                    bal + dt * RL_RATE_MICRO_PER_SEC,
                )
            allowed = avail >= RL_COST_MICRO
            bal = avail - RL_COST_MICRO if allowed else avail
            if last_t is None or t > last_t:
                last_t = t  # monotone bucket clock: never rewinds
            out.append((uid, ts, int(eid), allowed, bal))
    return bal, last_t, out


def _emit(out: list[tuple]):
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "user_id",
                "ts",
                "event_id",
                "allowed",
                "tokens_micro_after",
            ],
        )


def _ratelimit_v1_fn(key, pdf_iter, state):
    """applyInPandasWithState kernel; state = (balance, last second)."""
    (user_id,) = key
    bal, last_t = state.get if state.exists else (None, None)
    bal, last_t, out = _fold_bucket(
        None if bal is None else int(bal),
        None if last_t is None else int(last_t),
        list(pdf_iter),
        user_id,
    )
    if last_t is not None:
        state.update((int(bal), int(last_t)))
    yield from _emit(out)


def ratelimit_stream_v1(events: DataFrame) -> DataFrame:
    """events (streaming) -> append-only admission verdicts (v1 API)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _ratelimit_v1_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- event-time ordered mode (r12, VERDICT r11 #6) ------------------------

RL_EVENTTIME_DELAY = "1 second"  # watermark delay of the event-time mode

EVENTTIME_STATE_SCHEMA = (
    "bal long, last_t long, upto long, bts array<long>, beid array<long>"
)


def _ratelimit_eventtime_fn(key, pdf_iter, state):
    """The PRINCIPLED out-of-order twin (the r11 verdict's ask): instead
    of the arrival-order policy ('late events earn zero refill'), buffer
    each key's events until the WATERMARK passes them, then fold in
    EVENT-TIME order — the transformWithState-timers pattern expressed
    on the v1 API (the container's engine path; probed r12: the engine
    does NOT drop sub-watermark input for this operator, late handling
    is the kernel's responsibility, and event-time timeouts fire in the
    trailing AvailableNow batch once ``timeout < watermark``).

    Mechanics per call: (1) arriving rows at or below the FLUSHED
    boundary (``upto`` = the watermark of the last flush) are DROPPED —
    the standard watermark contract; anything newer is buffered; (2)
    every buffered row with event-time ms <= current watermark is
    flushed through the shared ``_fold_bucket`` in (ts, event_id)
    order (the late-clamp guards are no-ops on this ordered feed by
    construction); (3) a timeout is armed just below the earliest
    still-buffered event so the flush resumes as soon as the watermark
    passes it. Because flush boundaries are the monotone watermark
    sequence and each chunk is sorted, the fold is GLOBALLY event-time
    ordered — on any feed, however shuffled its arrival, the output
    equals the batch replay of the sub-watermark slice (the oracle).
    Rows above the final watermark stay buffered when an AvailableNow
    drain ends — a real deployment keeps running; the gate twin's
    oracle states the same cutoff in SQL.

    State: the two bucket longs (-1 sentinel = not yet started), the
    flushed boundary, and the buffered (event-time micros, event_id)
    arrays — bounded by each key's in-flight watermark lag."""
    import pandas as pd

    (user_id,) = key
    wm = state.getCurrentWatermarkMs()
    if state.exists:
        bal, last_t, upto, bts, beid = state.get
        bal = None if last_t is None or last_t < 0 else int(bal)
        last_t = None if last_t is None or last_t < 0 else int(last_t)
        upto = int(upto)
        buf = list(zip(list(bts or []), list(beid or [])))
    else:
        bal = last_t = None
        upto = -1
        buf = []
    if not state.hasTimedOut:
        for pdf in pdf_iter:
            us = (
                pdf["ts"].to_numpy("datetime64[ns]").astype("int64")
                // 1_000
            )
            for t_us, eid in zip(us.tolist(), pdf["event_id"].tolist()):
                if t_us // 1_000 <= upto:
                    continue  # late beyond the flushed watermark: dropped
                buf.append((int(t_us), int(eid)))
    flush = [(t, e) for (t, e) in buf if t // 1_000 <= wm]
    keep = [(t, e) for (t, e) in buf if t // 1_000 > wm]
    out = []
    if flush:
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime(
                    [t * 1_000 for t, _ in flush], unit="ns"
                ),
                "event_id": [e for _, e in flush],
            }
        )
        bal, last_t, out = _fold_bucket(bal, last_t, [pdf], user_id)
    upto = max(upto, wm)
    state.update(
        (
            -1 if last_t is None else int(bal),
            -1 if last_t is None else int(last_t),
            int(upto),
            [t for t, _ in keep],
            [e for _, e in keep],
        )
    )
    if keep:
        state.setTimeoutTimestamp(
            max(min(t // 1_000 for t, _ in keep) - 1, wm + 1)
        )
    yield from _emit(out)


def ratelimit_eventtime_stream(events: DataFrame) -> DataFrame:
    """events (streaming, watermarked) -> append-only admission
    verdicts folded in EVENT-TIME order (v1 API, EventTimeTimeout)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _ratelimit_eventtime_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=EVENTTIME_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


class RateLimitProcessor(StatefulProcessor):
    """transformWithStateInPandas variant: same two-long state; both
    paths call ``_fold_bucket`` (equality by shared construction)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._st = handle.getValueState("bucket", STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        cur = self._st.get()
        bal = int(cur[0]) if cur is not None else None
        last_t = int(cur[1]) if cur is not None else None
        bal, last_t, out = _fold_bucket(bal, last_t, list(rows), user_id)
        if last_t is not None:
            self._st.update((int(bal), int(last_t)))
        yield from _emit(out)

    def close(self) -> None:
        pass


def ratelimit_stream(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas wiring of :class:`RateLimitProcessor`."""
    return events.groupBy("user_id").transformWithStateInPandas(
        RateLimitProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="None",
    )
