"""Custom stateful streaming operator via applyInPandasWithState:
per-user running counters with inactivity-timeout session emission —
the pattern for operators the built-in windows can't express
(conversion funnels, fraud counters, per-entity ML features).

State is one small tuple per user key, partitioned by Spark's state
store — scales horizontally with executors; the timeout mechanism
bounds memory for dead keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts_us", LongType()),
        StructField("closed", LongType()),  # 1 when emitted by timeout
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts_us", LongType()),
    ]
)


def make_tracker(timeout_ms: int | None = 60_000):
    """Build the per-key tracking function. ``timeout_ms=None`` runs
    without inactivity timeouts (pure accumulate-and-snapshot) — used
    by the driver-facing registry entry, where the availableNow
    executor must terminate as soon as the data drains."""

    def track_user_sessions(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, total, last = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [total],
                    "last_ts_us": [last],
                    "closed": [1],
                }
            )
            return

        n, total, last = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            last = max(last, int(pdf["ts_us"].max()))
        state.update((n, total, last))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)  # inactivity → close
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "last_ts_us": [last],
                "closed": [0],
            }
        )

    return track_user_sessions


# default operator: 60 s inactivity-timeout session close
track_user_sessions = make_tracker(60_000)


def user_session_stream(events_with_ts_us, timeout_ms: int | None = 60_000):
    """events(user_id, value, ts_us) stream → stateful session rows."""
    conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events_with_ts_us.groupBy("user_id").applyInPandasWithState(
        make_tracker(timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=conf,
    )
