"""Custom stateful streaming operator: timeout sessionization via
applyInPandasWithState (the Arrow-batched arbitrary-state API).

The batch twin is operators.spans.sessionize; this streaming form
keeps one (start, end, n) tuple per user in the state store, closes a
session when a new event arrives more than `gap` after the last one
(emitting the closed session downstream), and closes idle sessions
via processing-time timeout.  State is O(active users), partitioned
by the grouping key — the state store shards with executors, so a
1000-executor cluster holds 1000x the active-user working set.

The reference has no streaming at all (SURVEY.md §2.6); this is the
Spark-native capability that turns its batch span-merging idea into a
continuous operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StructField, StructType)

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", LongType()),
    StructField("session_end", LongType()),
    StructField("n_events", LongType()),
])

STATE_SCHEMA = StructType([
    StructField("start", LongType()),
    StructField("end", LongType()),
    StructField("n", LongType()),
])


def stream_sessionize(events: DataFrame, gap: int = 30,
                      pos_col: str = "m",
                      key_col: str = "user_id",
                      idle_timeout: bool = False,
                      timeout_ms: int | None = None) -> DataFrame:
    """events stream (key_col, pos_col as integer minutes) ->
    append-mode stream of CLOSED sessions.

    idle_timeout=True arms a processing-time timeout so sessions of
    users that go silent still close — use it in ALWAYS-ON
    deployments.  Leave False for availableNow drains: with a
    processing-time timeout registered, the micro-batch engine keeps
    scheduling empty timeout-check batches and an availableNow query
    never reaches termination (observed: ~1.5 s/batch forever); in
    drain mode idle sessions simply stay in the checkpointed state
    until the next run's events or an always-on restart closes them.
    The always-on path is TESTED with a real processing-time trigger
    (tests/test_stream_sessions.py::test_idle_timeout_real_trigger):
    run with .trigger(processingTime=...), poll the sink for the
    timeout-closed session, then q.stop() — stop() is the correct
    termination for an always-on query; never awaitTermination() one.

    timeout_ms overrides the idle-timeout duration (default
    gap * 60 * 1000 ms, i.e. `gap` minutes of wall time — event
    positions are minutes, processing-time timeouts are real ms).

    Late data: events are sorted within a micro-batch, but an event
    arriving in a LATER batch may precede the open session's end.  Any
    late event within gap of the open session merges via
    (min(start, m), max(end, m)); a late event more than gap BEFORE the
    open session still merges (documented divergence from the batch
    twin, which would emit it as its own earlier session — resolving
    that exactly would require buffering closed sessions per key)."""

    def fn(key, pdfs, state: GroupState):
        import pandas as pd
        (user,) = key
        closed = []
        if state.hasTimedOut:
            s, e, n = state.get
            closed.append((user, s, e, n))
            state.remove()
        else:
            ms: list[int] = []
            for pdf in pdfs:
                ms.extend(int(x) for x in pdf[pos_col])
            ms.sort()
            if state.exists:
                s, e, n = state.get
            else:
                s = e = n = None
            for m in ms:
                if s is None:
                    s, e, n = m, m, 1
                elif m - e > gap:
                    closed.append((user, s, e, n))
                    s, e, n = m, m, 1
                else:
                    # min/max merge so a LATE event (m <= e, possible
                    # across micro-batches even though each batch is
                    # sorted) widens the open session instead of
                    # corrupting it (shrinking session_end / inverting
                    # start > end); in-order arrivals take e = m as
                    # before
                    s, e, n = min(s, m), max(e, m), n + 1
            if s is not None:
                state.update((s, e, n))
                if idle_timeout:
                    state.setTimeoutDuration(
                        timeout_ms if timeout_ms is not None
                        else gap * 60 * 1000)
        yield pd.DataFrame(
            closed, columns=[f.name for f in SESSION_SCHEMA.fields])

    conf = (GroupStateTimeout.ProcessingTimeTimeout if idle_timeout
            else GroupStateTimeout.NoTimeout)
    return events.groupBy(key_col).applyInPandasWithState(
        fn, SESSION_SCHEMA, STATE_SCHEMA, "append", conf)
