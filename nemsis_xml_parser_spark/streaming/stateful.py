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
