"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.I streaming row, north-star "custom stateful operators").

``running_totals`` maintains (count, sum) per key across microbatches —
the arbitrary-state primitive that watermarked windows can't express
(e.g. lifetime per-user counters, custom session logic with side state).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
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


BAND_OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("band_idx", LongType(), False),
        StructField("collided", BooleanType(), False),
        StructField("first_doc", LongType(), False),
    ]
)

BAND_STATE_SCHEMA = StructType(
    [
        StructField("first_doc", LongType(), False),
        StructField("last_ms", LongType(), False),
    ]
)


def lsh_band_collisions(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    watermark: str = "1 hour",
    state_ttl_seconds: int = 3600,
) -> DataFrame:
    """Streaming banded-MinHash near-dup state (the streaming twin of
    operators.dedup.minhash_lsh_pairs, NOTES item 5).

    Each document fans out to ``bands`` LSH band keys (same banding as the
    batch operator, computed JVM-side); per band key,
    ``applyInPandasWithState`` remembers the first document that claimed
    the band and flags every later claimant as ``collided`` — across
    microbatches and checkpointed restarts.  State is evicted via
    EventTimeTimeout once a band has been idle past ``state_ttl_seconds``
    beyond the watermark, so memory is O(bands in the horizon), not
    O(stream).

    Emits one row per (doc, band).  The cross-band verdict ("drop the doc
    if ANY band collided") is a per-microbatch aggregate — compose with
    ``novel_doc_verdicts`` inside foreachBatch, since Structured Streaming
    does not allow a second stateful aggregate after
    applyInPandasWithState in update mode.
    """
    from ..functions import hashing as H
    from ..functions import text as T

    rows_per_band = num_hashes // bands
    shingles = F.array_distinct(T.word_ngrams(F.col(text_col), 3))
    sig = H.minhash_signature_from_pairs(H.shingle_hash_pairs(shingles), num_hashes)
    banded = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(ts_col).alias("__ts"),
            sig.alias("__sig"),
        )
        .select(
            "doc_id",
            "__ts",
            F.posexplode(
                F.array(
                    *[
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("__sig")[i].cast("string")
                                    for i in range(
                                        b * rows_per_band, (b + 1) * rows_per_band
                                    )
                                ],
                            )
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("band_idx", "band_hash"),
        )
        .withWatermark("__ts", watermark)
    )

    ttl_ms = state_ttl_seconds * 1000

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                [], columns=["doc_id", "band_idx", "collided", "first_doc"]
            )
            return
        rows: list[tuple[int, int, int]] = []  # (ms, doc_id, band_idx)
        for pdf in pdfs:
            for ts, doc, bi in zip(
                pd.to_datetime(pdf["__ts"]), pdf["doc_id"], pdf["band_idx"]
            ):
                rows.append((int(ts.value // 1_000_000), int(doc), int(bi)))
        rows.sort()
        if state.exists:
            first_doc, last_ms = state.get
        else:
            first_doc, last_ms = rows[0][1], rows[0][0]
        out = []
        for ms, doc, bi in rows:
            out.append((doc, bi, doc != first_doc, first_doc))
            last_ms = max(last_ms, ms)
        state.update((first_doc, last_ms))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
        yield pd.DataFrame(
            out, columns=["doc_id", "band_idx", "collided", "first_doc"]
        )

    return banded.groupBy("band_hash").applyInPandasWithState(
        fn,
        outputStructType=BAND_OUTPUT_SCHEMA,
        stateStructType=BAND_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def novel_doc_verdicts(band_rows: DataFrame) -> DataFrame:
    """Per-document verdict from a microbatch of ``lsh_band_collisions``
    rows: a doc is a near-duplicate iff ANY of its bands collided with
    earlier state.  Batch-side (use inside foreachBatch)."""
    return band_rows.groupBy("doc_id").agg(
        F.max(F.col("collided")).alias("is_dup"),
        F.min(F.when(F.col("collided"), F.col("first_doc"))).alias("dup_of"),
    )
