"""Stream-stream interval joins — watermark-bounded event attribution.

The classic shape: attribute each ``click`` to the ``view`` by the same
user that happened at most ``horizon`` before it.  In Structured
Streaming this is the canonical stream-stream join: BOTH sides carry a
watermark and the join condition bounds event time on both ends, so
Spark can size the join state buffer and evict rows older than
``watermark + horizon`` — without the time bound the state would grow
forever.

The join condition is built by ``attribution_condition`` and shared
verbatim by the batch twin (plans/llm_ops `events_view_click_attribution`,
full SQL oracle) — the streaming path is the same logical join over an
unbounded input, which is exactly the Structured Streaming contract.

Scale: state is hash-partitioned on user_id (the equi half of the
condition); the interval half is evaluated within each partition.  Skewed
hot users bound the per-key state by the horizon, not by stream length.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def attribution_condition(horizon: str = "30 minutes") -> Column:
    """view↔click match: same user, click in [view_ts, view_ts + horizon]."""
    return (
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.expr(f"view_ts + INTERVAL {horizon}"))
    )


def _sides(
    views: DataFrame, clicks: DataFrame
) -> tuple[DataFrame, DataFrame]:
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    return v, c


def attribute_clicks_batch(
    views: DataFrame, clicks: DataFrame, horizon: str = "30 minutes"
) -> DataFrame:
    """Batch twin: every (view, click) pair within the horizon."""
    v, c = _sides(views, clicks)
    return v.join(c, attribution_condition(horizon)).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "click_id",
        "view_ts",
        "click_ts",
        "click_value",
    )


def attribute_clicks_stream(
    views: DataFrame,
    clicks: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming attribution: same join, watermarked on both inputs so the
    state store evicts views older than watermark + horizon and clicks
    older than watermark."""
    v, c = _sides(
        views.withWatermark("ts", watermark),
        clicks.withWatermark("ts", watermark),
    )
    return v.join(c, attribution_condition(horizon)).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "click_id",
        "view_ts",
        "click_ts",
        "click_value",
    )
