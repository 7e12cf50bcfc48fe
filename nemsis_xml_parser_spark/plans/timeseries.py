"""Time-series battery: gap-filled resampling and hypertable-style
hierarchical time rollups over the ``events`` table.

Scale notes: the gap-fill grid is |hours| × |event types| — both tiny
relative to the fact table (dimension-sized), generated with
``sequence``/``explode`` from a single min/max aggregate and cross-joined
broadcast-style; the fact side contributes only its (bucket, type) partial
aggregates.  The hierarchy rollup is one pass over events (``df.rollup``
→ partial+final hash aggregate with grouping sets), the Spark equivalent
of a TimescaleDB continuous-aggregate backfill.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import register, table


@register(
    "events_gapfill_hourly",
    family="timeseries",
    doc="Resample events to an hourly grid per event type with zero-filled "
    "gaps: sequence(min,max,1h) ⨯ distinct types, left join of the grouped "
    "counts (Spark sequence/explode ≡ DuckDB generate_series/unnest).",
    oracle="""
WITH e AS (SELECT date_trunc('hour', ts) AS hr, event_type FROM events),
bounds AS (SELECT MIN(hr) AS a, MAX(hr) AS b FROM e),
hours AS (SELECT unnest(generate_series(a, b, INTERVAL 1 HOUR)) AS hr FROM bounds),
types AS (SELECT DISTINCT event_type FROM e),
counts AS (SELECT hr, event_type, COUNT(*) AS n FROM e GROUP BY hr, event_type)
SELECT h.hr, t.event_type, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
FROM hours h
CROSS JOIN types t
LEFT JOIN counts c ON c.hr = h.hr AND c.event_type = t.event_type
""",
)
def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("hr"), "event_type"
    )
    counts = e.groupBy("hr", "event_type").agg(F.count(F.lit(1)).alias("n"))
    hours = (
        e.agg(F.min("hr").alias("a"), F.max("hr").alias("b"))
        .select(
            F.explode(
                F.sequence(F.col("a"), F.col("b"), F.expr("INTERVAL 1 HOUR"))
            ).alias("hr")
        )
    )
    types = e.select("event_type").distinct()
    return (
        hours.crossJoin(types)
        .join(counts, ["hr", "event_type"], "left")
        .select(
            "hr",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
        )
    )


@register(
    "events_time_rollup_hierarchy",
    family="timeseries",
    doc="Hypertable-style hierarchical time rollup in one pass: "
    "ROLLUP(day, hour) yields hourly, daily, and grand-total rows together "
    "(continuous-aggregate analogue; df.rollup ≡ GROUP BY ROLLUP).",
    oracle="""
SELECT bucket_day, bucket_hour, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS sum_value
FROM (
  SELECT date_trunc('day', ts) AS bucket_day,
         date_trunc('hour', ts) AS bucket_hour,
         value
  FROM events
)
GROUP BY ROLLUP (bucket_day, bucket_hour)
""",
)
def events_time_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("bucket_day"),
        F.date_trunc("hour", F.col("ts")).alias("bucket_hour"),
        "value",
    )
    return e.rollup("bucket_day", "bucket_hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(14,4)")).cast("double").alias("sum_value"),
    )


@register(
    "events_view_click_attribution",
    family="timeseries",
    doc="Interval-join attribution: every click within 30 minutes after a "
    "view by the same user (streaming/joins.py — the batch twin of the "
    "watermarked stream-stream join; same condition builder, parity "
    "tested in tests/test_stream_joins.py).  Equi half (user_id) drives "
    "the shuffle; the interval half filters within partitions.",
    oracle="""
SELECT v.user_id,
       v.event_id AS view_id,
       c.event_id AS click_id,
       v.ts AS view_ts,
       c.ts AS click_ts,
       c.value AS click_value
FROM events v
JOIN events c
  ON v.user_id = c.user_id
 AND v.event_type = 'view'
 AND c.event_type = 'click'
 AND c.ts >= v.ts
 AND c.ts <= v.ts + INTERVAL 30 MINUTE
""",
)
def events_view_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.joins import attribute_clicks_batch

    ev = table(spark, sf_dir, "events")
    return attribute_clicks_batch(
        ev.where(F.col("event_type") == "view"),
        ev.where(F.col("event_type") == "click"),
        horizon="30 minutes",
    )
