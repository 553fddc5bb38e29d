"""Custom stateful streaming operator: per-key session aggregation via
``applyInPandasWithState`` — the Structured Streaming escape hatch for
semantics the built-in windowed aggregates can't express.

Shovel has no event-time state at all (its only state is the in-memory /
LevelDB queue, reference: src/queues/batch.js:61-98); this operator covers
arbitrary per-key state kept across micro-batches — and across query
*restarts* via the state store in the checkpoint — with timeout-based
emission.

Semantics: events (user_id, ts) accumulate into one session per key; the
session closes when no event arrives for ``gap_ms`` of processing time
(state timeout) — on close, one row (user_id, session_start, session_end,
n_events) is emitted.

Scale notes: state lives in the state store partitioned by key — the
shuffle carries the grouping key only; a hot key serializes through one
state partition, so key-salting + session-stitching applies when a single
key exceeds one core's throughput.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
        T.StructField("n_events", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), True),
        T.StructField("end_us", T.LongType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)

_EMPTY = pd.DataFrame(
    {"user_id": [], "session_start": [], "session_end": [], "n_events": []}
).astype({"user_id": "int64", "n_events": "int64"})


def sessionize_stream(events: DataFrame, gap_ms: int = 30_000) -> DataFrame:
    """events stream (user_id, ts, ...) → closed-session rows.

    One stateful shuffle on user_id; a session emits on processing-time
    timeout (``gap_ms`` without traffic for that key).
    """

    def _sessionize(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                }
            )
            return

        start_us, end_us, n = state.get if state.exists else (None, None, 0)
        n0 = n
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ts_us = pdf["ts"].astype("int64") // 1000  # ns → us
            lo, hi = int(ts_us.min()), int(ts_us.max())
            start_us = lo if start_us is None else min(start_us, lo)
            end_us = hi if end_us is None else max(end_us, hi)
            n += len(pdf)
        if n > n0:
            # re-arm ONLY on new data: the engine also invokes stateful keys
            # on empty cleanup batches, and unconditionally re-arming there
            # keeps the trigger alive forever (availableNow never terminates)
            state.update((start_us, end_us, n))
            state.setTimeoutDuration(gap_ms)
        yield _EMPTY

    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
