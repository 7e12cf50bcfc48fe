"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.I streaming row, north-star "custom stateful operators").

``running_totals`` maintains (count, sum) per key across microbatches —
the arbitrary-state primitive that watermarked windows can't express
(e.g. lifetime per-user counters, custom session logic with side state).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType(), False),
        StructField("n_events", LongType(), False),
        StructField("sum_value", DoubleType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), False),
        StructField("total", DoubleType(), False),
    ]
)


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"event_type": [key[0]], "n_events": [n], "sum_value": [total]}
    )


def running_totals(events: DataFrame) -> DataFrame:
    """Streaming lifetime (count, sum) per event_type.  Emits the updated
    totals for every key seen in each microbatch ("update" semantics)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start", LongType(), False),  # epoch ms
        StructField("session_end", LongType(), False),
        StructField("n_events", LongType(), False),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType(), False),
        StructField("last_ms", LongType(), False),
        StructField("n", LongType(), False),
    ]
)


def sessionize_with_timeout(events: DataFrame, gap_seconds: int = 1800,
                            watermark: str = "2 hours") -> DataFrame:
    """Custom stateful sessionizer (applyInPandasWithState +
    EventTimeTimeout): emits a session row once a user has been idle past
    ``gap_seconds`` — either observed inside a batch (a later event beyond
    the gap) or via state timeout when the watermark passes the horizon.
    This is the shape ``session_window`` cannot express once per-session
    custom state (counters, side lookups) is needed; state is evicted on
    timeout so memory stays O(active users)."""
    gap_ms = gap_seconds * 1000

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        closed: list[tuple] = []
        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            closed.append((key[0], start_ms, last_ms, n))
            state.remove()
        else:
            ts_ms: list[int] = []
            for pdf in pdfs:
                ts_ms.extend(int(t.value // 1_000_000) for t in pd.to_datetime(pdf["ts"]))
            ts_ms.sort()
            if state.exists:
                start_ms, last_ms, n = state.get
            else:
                start_ms, last_ms, n = ts_ms[0], ts_ms[0], 0
            for t in ts_ms:
                if t - last_ms > gap_ms:
                    closed.append((key[0], start_ms, last_ms, n))
                    start_ms, n = t, 0
                last_ms = t
                n += 1
            state.update((start_ms, last_ms, n))
            state.setTimeoutTimestamp(last_ms + gap_ms)
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start", "session_end", "n_events"]
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
