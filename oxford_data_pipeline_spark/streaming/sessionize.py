"""Custom stateful streaming operator: gap-based sessionization with
`applyInPandasWithState` — the engine's example of a stateful operator
Spark's built-in windowed aggregations can't express (per-key session
windows that close after an inactivity gap).

State per user: (session start, last event time, event count, value
sum). An incoming batch extends the open session or closes it and
emits the finished session row; event-time timeout closes idle
sessions at the watermark.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp,"
    " n_events long, total_value double"
)
STATE_SCHEMA = "start long, last long, n long, total double"

GAP_SECONDS = 30 * 60


def _sessionize(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n, total = state.get
        state.remove()
        yield pd.DataFrame(
            [(user_id, pd.Timestamp(start, unit="s"), pd.Timestamp(last, unit="s"),
              n, total)],
            columns=["user_id", "session_start", "session_end", "n_events",
                     "total_value"],
        )
        return

    events = pd.concat(list(batches)).sort_values("event_ts")
    ts = events["event_ts"].astype("int64") // 1_000_000_000
    vals = events["value"].to_numpy()

    if state.exists:
        start, last, n, total = state.get
    else:
        start, last, n, total = int(ts.iloc[0]), int(ts.iloc[0]), 0, 0.0

    finished = []
    for t, v in zip(ts, vals):
        t = int(t)
        if n > 0 and t - last > GAP_SECONDS:
            finished.append((user_id, pd.Timestamp(start, unit="s"),
                             pd.Timestamp(last, unit="s"), n, total))
            start, n, total = t, 0, 0.0
        if n == 0:
            start = t
        last, n, total = t, n + 1, total + float(v)

    state.update((start, last, n, total))
    state.setTimeoutTimestamp(last * 1000 + GAP_SECONDS * 1000)
    if finished:
        yield pd.DataFrame(
            finished,
            columns=["user_id", "session_start", "session_end", "n_events",
                     "total_value"],
        )


def sessionized(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Gap-sessionize a (user_id, event_ts, value) event stream."""
    return (
        stream.withWatermark("event_ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
