"""Event-stream operators (SURVEY §2.I streaming row): watermarked
tumbling/sliding/session windows and dedup-within-watermark over the
``events`` table schema.

Each builder takes any streaming (or batch) DataFrame with
``(ts TIMESTAMP, event_type STRING, value DOUBLE, event_id BIGINT)`` —
tests feed them from a rate/file source and cross-check the batch twins in
plans.families (events_hourly_rollup).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window count/sum per event_type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user (gap-based)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stateful streaming dedup on event_id within the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def dedup_stream_by_fingerprint(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact near-dup drop: normalized-text fingerprint +
    dropDuplicatesWithinWatermark — the streaming twin of
    operators.dedup.exact_dedup.  State is bounded by the watermark (a
    fingerprint older than the horizon is evictable), so memory is
    O(docs per watermark window), not O(stream)."""
    from ..functions.text import fingerprint

    return (
        docs.withColumn("__fprint", fingerprint(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fprint"])
        .drop("__fprint")
    )


def dedup_stream_by_minhash(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    num_hashes: int = 16,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming MinHash near-dup drop: documents whose full k-hash MinHash
    signature collides with one already seen inside the watermark horizon
    are dropped.  Near-identical texts (reordered whitespace, small edits
    below shingle resolution) collapse to the same signature with high
    probability, so this is the streaming counterpart of the batch
    banded-LSH pipeline (operators.dedup.minhash_lsh_pairs) with one
    stateful operator and watermark-bounded state — the shape Structured
    Streaming supports without chaining stateful stages.  The signature is
    computed entirely with built-in expressions (md5 double hashing over
    3-gram shingles), so the stream stays JVM-side until the dedup state
    store."""
    from ..functions import hashing as H
    from ..functions import text as T

    shingles = F.array_distinct(T.word_ngrams(F.col(text_col), 3))
    sig = H.minhash_signature_from_pairs(
        H.shingle_hash_pairs(shingles), num_hashes
    )
    return (
        docs.withColumn("__sig", F.concat_ws(",", sig.cast("array<string>")))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__sig"])
        .drop("__sig")
    )
