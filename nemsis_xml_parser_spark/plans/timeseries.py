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
from pyspark.sql import DataFrame, SparkSession, Window

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


@register(
    "events_anomaly_mad",
    family="timeseries",
    doc="Robust anomaly detection over the hourly event-count series: "
    "per event_type, median and MAD (median absolute deviation) of "
    "hourly counts, then the robust z-score (n - med)/(1.4826*MAD) per "
    "hour, keeping |z| >= 2 — the outlier monitor that mean/stddev "
    "cannot provide under heavy tails (Spark percentile ≡ DuckDB "
    "quantile_cont gives exact cross-engine medians).  Two small "
    "aggregates over the already-reduced hourly rollup; the raw event "
    "scan happens once.",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
med AS (
  SELECT event_type, CAST(quantile_cont(n, 0.5) AS DOUBLE) AS med
  FROM hourly GROUP BY event_type
),
mad AS (
  SELECT hourly.event_type,
         CAST(quantile_cont(ABS(n - med), 0.5) AS DOUBLE) AS mad
  FROM hourly JOIN med USING (event_type)
  GROUP BY hourly.event_type
)
SELECT hourly.event_type, h, n,
       ROUND((n - med) / (1.4826 * mad), 6) AS robust_z
FROM hourly
JOIN med USING (event_type)
JOIN mad USING (event_type)
WHERE mad > 0 AND ABS((n - med) / (1.4826 * mad)) >= 2
""",
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    med = hourly.groupBy("event_type").agg(
        F.percentile("n", 0.5).alias("med")
    )
    mad = (
        hourly.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.percentile(F.abs(F.col("n") - F.col("med")), 0.5).alias("mad"))
    )
    z = (F.col("n") - F.col("med")) / (F.lit(1.4826) * F.col("mad"))
    return (
        hourly.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .where((F.col("mad") > 0) & (F.abs(z) >= 2))
        .select("event_type", "h", "n", F.round(z, 6).alias("robust_z"))
    )


@register(
    "events_trending_rank_delta",
    family="timeseries",
    doc="Trending analysis — per day, event types ranked by count with the "
    "rank CHANGE vs the previous day (lag over the per-type daily "
    "series): the movers dashboard shape (new entries surface with NULL "
    "prev_rank).  Two shuffles total: the daily count aggregate and the "
    "per-type lag window; the final per-day rank is a tiny window over "
    "days x types rows.",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT day, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY day
                            ORDER BY n DESC, event_type ASC) AS rnk
  FROM daily
),
with_prev AS (
  SELECT day, event_type, n, rnk,
         LAG(rnk) OVER (PARTITION BY event_type ORDER BY day) AS prev_rnk
  FROM ranked
)
SELECT strftime(day, '%Y-%m-%d') AS day, event_type,
       CAST(n AS BIGINT) AS n_events,
       CAST(rnk AS INTEGER) AS rank,
       CAST(prev_rnk AS INTEGER) AS prev_rank,
       CAST(prev_rnk - rnk AS INTEGER) AS rank_gain
FROM with_prev
WHERE rnk <= 3
""",
)
def events_trending_rank_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    wr = Window.partitionBy("day").orderBy(F.col("n").desc(), F.col("event_type").asc())
    ranked = daily.withColumn("rnk", F.row_number().over(wr))
    wl = Window.partitionBy("event_type").orderBy("day")
    return (
        ranked.withColumn("prev_rnk", F.lag("rnk").over(wl))
        .where(F.col("rnk") <= 3)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "event_type",
            F.col("n").cast("bigint").alias("n_events"),
            F.col("rnk").cast("int").alias("rank"),
            F.col("prev_rnk").cast("int").alias("prev_rank"),
            (F.col("prev_rnk") - F.col("rnk")).cast("int").alias("rank_gain"),
        )
    )


@register(
    "events_session_paths",
    family="timeseries",
    doc="Path analysis — the 'what do sessions look like' shape: per "
    "user, events ordered by (ts, event_id) and the first three event "
    "types concatenated into a path string, then the top-10 paths by "
    "frequency with deterministic tie-breaks.  Ordering inside the "
    "collect is made unambiguous by sorting structs of (ts, event_id, "
    "type) — never bare collect_list order, which is partitioning-"
    "dependent.  One window-free aggregate per user + one count.",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts ASC, event_id ASC) AS rn
  FROM events
),
paths AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM ordered WHERE rn <= 3 GROUP BY user_id
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT path, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, path ASC) AS rank
  FROM paths GROUP BY path
) t(path, cnt, rank)
JOIN paths p USING (path)
GROUP BY path, rank
HAVING rank <= 10
""",
)
def events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    first3 = (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                    lambda s: s["event_type"],
                ),
            ).alias("path")
        )
    )
    # Distinct-path cardinality grows with corpus size, so take the top 10
    # first via orderBy().limit() (TakeOrderedAndProject — per-partition
    # partial top-k); the rank column the result surfaces is then computed
    # by a window over the bounded ≤10-row survivor set only.
    top10 = (
        first3.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path").asc())
        .limit(10)
    )
    wr = Window.orderBy(F.col("n_users").desc(), F.col("path").asc())
    return top10.select(
        "path",
        F.col("n_users").cast("bigint").alias("n_users"),
        F.row_number().over(wr).cast("int").alias("rank"),
    )


@register(
    "events_rate_limited_sample",
    family="timeseries",
    doc="Rate-limited log sampling — keep at most 3 events per (user, "
    "hour), earliest-first with event_id tie-breaks: the throttling "
    "shape every high-volume event pipeline applies before expensive "
    "enrichment.  Deterministic membership (pure function of the data, "
    "no rand()), one window; audited per event_type with kept/dropped "
    "counts so the sampling loss is part of the checked answer.",
    oracle="""
WITH ranked AS (
  SELECT event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts ASC, event_id ASC) AS rn
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN rn <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rn > 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       ROUND(CAST(SUM(CASE WHEN rn <= 3 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS keep_rate
FROM ranked
GROUP BY event_type
""",
)
def events_rate_limited_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", F.date_trunc("hour", F.col("ts"))).orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    ranked = e.withColumn("rn", F.row_number().over(w))
    kept = F.sum(F.when(F.col("rn") <= 3, 1).otherwise(0))
    return ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        kept.cast("bigint").alias("n_kept"),
        F.sum(F.when(F.col("rn") > 3, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dropped"),
        F.round(kept.cast("double") / F.count(F.lit(1)), 6).alias("keep_rate"),
    )


@register(
    "events_cumulative_users",
    family="timeseries",
    doc="Cumulative-distinct growth curve — daily new vs returning users "
    "and the running total of users ever seen: the windowed COUNT "
    "(DISTINCT) that engines cannot evaluate directly, rewritten as the "
    "first-touch transform (min day per user, then a cumulative sum "
    "over the daily new-user counts).  Distinct-per-day joins back for "
    "the returning split.  Two aggregates + one tiny window over days.",
    oracle="""
WITH first_day AS (
  SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS d0 FROM events
  GROUP BY user_id
),
daily_new AS (
  SELECT d0 AS day, COUNT(*) AS n_new FROM first_day GROUP BY d0
),
daily_active AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         COUNT(DISTINCT user_id) AS n_active
  FROM events GROUP BY 1
)
SELECT strftime(a.day, '%Y-%m-%d') AS day,
       CAST(a.n_active AS BIGINT) AS n_active,
       CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new,
       CAST(a.n_active - COALESCE(n.n_new, 0) AS BIGINT) AS n_returning,
       CAST(SUM(COALESCE(n.n_new, 0)) OVER (ORDER BY a.day ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_users
FROM daily_active a LEFT JOIN daily_new n ON n.day = a.day
""",
)
def events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    first_day = e.groupBy("user_id").agg(F.min(day).alias("d0"))
    daily_new = first_day.groupBy(F.col("d0").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    daily_active = e.groupBy(day.alias("day")).agg(
        F.countDistinct("user_id").alias("n_active")
    )
    w = Window.orderBy(F.col("day").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    joined = daily_active.join(daily_new, "day", "left").select(
        "day",
        "n_active",
        F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
    )
    return joined.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n_active").cast("bigint").alias("n_active"),
        F.col("n_new").cast("bigint").alias("n_new"),
        (F.col("n_active") - F.col("n_new")).cast("bigint").alias("n_returning"),
        F.sum("n_new").over(w).cast("bigint").alias("cumulative_users"),
    )


@register(
    "events_error_bursts",
    family="timeseries",
    doc="Gaps-and-islands — consecutive-run detection, the classic shape "
    "no single window function expresses: per user, maximal runs of "
    "consecutive error events (island id = row_number over all events "
    "minus row_number over errors, constant within a run), keeping "
    "bursts of length >= 3 with their bounds — the alerting primitive "
    "for error storms and bot-like behavior.  Two windows + one "
    "aggregate; both windows share the (user_id, ts, event_id) sort so "
    "Catalyst plans ONE exchange+sort.",
    oracle="""
WITH seq AS (
  SELECT user_id, event_id, ts, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts ASC, event_id ASC) AS rn_all,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts ASC, event_id ASC) AS rn_type
  FROM events
),
islands AS (
  SELECT user_id, event_id, ts,
         rn_all - rn_type AS island
  FROM seq WHERE event_type = 'error'
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS burst_len,
       CAST(MIN(event_id) AS BIGINT) AS first_event_id,
       CAST(MAX(event_id) AS BIGINT) AS last_event_id
FROM islands
GROUP BY user_id, island
HAVING COUNT(*) >= 3
""",
)
def events_error_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    w_type = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.row_number().over(w_all).alias("rn_all"),
        F.row_number().over(w_type).alias("rn_type"),
    )
    islands = seq.where(F.col("event_type") == "error").select(
        "user_id", "event_id", (F.col("rn_all") - F.col("rn_type")).alias("island")
    )
    return (
        islands.groupBy("user_id", "island")
        .agg(
            F.count(F.lit(1)).alias("burst_len"),
            F.min("event_id").cast("bigint").alias("first_event_id"),
            F.max("event_id").cast("bigint").alias("last_event_id"),
        )
        .where(F.col("burst_len") >= 3)
        .select(
            "user_id",
            F.col("burst_len").cast("bigint").alias("burst_len"),
            "first_event_id",
            "last_event_id",
        )
    )


@register(
    "events_markov_transitions",
    family="timeseries",
    doc="First-order Markov transition matrix between event types — the "
    "behavioral model behind next-action prediction and anomalous-flow "
    "detection: per user, each event paired with its successor via "
    "lead() over (ts, event_id), then P(next | current) as exact counts "
    "over the per-current total.  One window + two aggregates; the "
    "conditional probability is one identical division, and transitions "
    "below 1% are folded out to keep the matrix sparse and the result "
    "stable.",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type AS cur,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC) AS nxt
  FROM events
),
trans AS (
  SELECT cur, nxt, COUNT(*) AS n FROM seq WHERE nxt IS NOT NULL
  GROUP BY cur, nxt
),
totals AS (SELECT cur, SUM(n) AS tot FROM trans GROUP BY cur)
SELECT t.cur AS current_type, t.nxt AS next_type,
       CAST(t.n AS BIGINT) AS n_transitions,
       ROUND(CAST(t.n AS DOUBLE) / ttl.tot, 6) AS p_next
FROM trans t JOIN totals ttl ON ttl.cur = t.cur
WHERE CAST(t.n AS DOUBLE) / ttl.tot >= 0.01
""",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    trans = (
        seq.where(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = trans.groupBy("cur").agg(F.sum("n").alias("tot"))
    p = F.col("n").cast("double") / F.col("tot")
    return (
        trans.join(totals, "cur")
        .where(p >= 0.01)
        .select(
            F.col("cur").alias("current_type"),
            F.col("nxt").alias("next_type"),
            F.col("n").cast("bigint").alias("n_transitions"),
            F.round(p, 6).alias("p_next"),
        )
    )


@register(
    "join_interval_coalesce",
    family="join",
    doc="Interval coalescing (temporal normalization) — merge each "
    "customer's overlapping/adjacent 30-day order-activity windows into "
    "maximal disjoint intervals: the PACK/NORMALIZE operation of SQL:2016 "
    "temporal databases, and the contract-period step ahead of any "
    "duration rollup.  Classic two-window gaps-and-islands: running "
    "max(end) over prior rows flags island starts, a running sum of the "
    "flags numbers islands, then one aggregate per (custkey, island).  "
    "Both windows are PARTITIONED by custkey with a deterministic "
    "(start, end, orderkey) tie-break — scale-safe, no global ordering "
    "anywhere.  Restricted to o_custkey < 200 to keep the checked answer "
    "small; semantics identical at any key range.",
    oracle="""
WITH iv AS (
  SELECT o_custkey AS custkey, o_orderkey,
         CAST(o_orderdate AS DATE) AS s,
         CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS e
  FROM orders WHERE o_custkey < 200
),
flagged AS (
  SELECT custkey, s, e, o_orderkey,
         CASE WHEN MAX(e) OVER (PARTITION BY custkey ORDER BY s, e, o_orderkey
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   >= s THEN 0 ELSE 1 END AS new_island
  FROM iv
),
islands AS (
  SELECT custkey, s, e,
         SUM(new_island) OVER (PARTITION BY custkey ORDER BY s, e, o_orderkey
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM flagged
)
SELECT CAST(custkey AS BIGINT) AS custkey,
       CAST(island AS BIGINT) AS island,
       strftime(MIN(s), '%Y-%m-%d') AS start_date,
       strftime(MAX(CAST(e AS DATE)), '%Y-%m-%d') AS end_date,
       CAST(COUNT(*) AS BIGINT) AS n_merged
FROM islands GROUP BY custkey, island
""",
)
def join_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.range_join import coalesce_intervals

    o = table(spark, sf_dir, "orders").where(F.col("o_custkey") < 200)
    iv = o.select(
        F.col("o_custkey").alias("custkey"),
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("s"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("e"),
    )
    packed = coalesce_intervals(iv, "custkey", "s", "e", tiebreak="o_orderkey")
    return packed.select(
        F.col("custkey").cast("bigint").alias("custkey"),
        F.col("island").cast("bigint").alias("island"),
        F.date_format("s", "yyyy-MM-dd").alias("start_date"),
        F.date_format("e", "yyyy-MM-dd").alias("end_date"),
        F.col("n_merged").cast("bigint").alias("n_merged"),
    )


@register(
    "events_dwell_time_stats",
    family="timeseries",
    doc="Inter-event dwell-time distribution — per event type, the gap in "
    "seconds to the user's NEXT event (lead over the per-user stream, "
    "deterministic event_id tie-break): count, exact mean (integer-"
    "second sums over a deterministic count), and interpolated "
    "median/p90 (Spark percentile ≡ DuckDB quantile_cont on integer "
    "gaps — the agg_percentile_exact cross-engine contract).  The "
    "engagement metric behind session-depth dashboards.  One "
    "user-partitioned window + one hash aggregate; second-granularity "
    "gaps via epoch casts, which both engines floor identically.",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, ts,
         LEAD(ts) OVER (PARTITION BY user_id
                        ORDER BY ts ASC, event_id ASC) AS nxt
  FROM events
),
gaps AS (
  SELECT event_type,
         CAST(date_diff('second', date_trunc('second', ts),
                        date_trunc('second', nxt)) AS BIGINT) AS gap
  FROM seq WHERE nxt IS NOT NULL
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       ROUND(CAST(SUM(gap) AS DOUBLE) / COUNT(*), 6) AS mean_gap_sec,
       CAST(quantile_cont(gap, 0.5) AS DOUBLE) AS median_gap_sec,
       CAST(quantile_cont(gap, 0.9) AS DOUBLE) AS p90_gap_sec
FROM gaps GROUP BY event_type
""",
)
def events_dwell_time_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = e.select(
        "event_type", "ts", F.lead("ts").over(w).alias("nxt")
    ).where(F.col("nxt").isNotNull())
    # whole-second truncation on BOTH engines before the diff: the data
    # carries sub-second parts, and truncate-then-diff is the one shape
    # whose integer result no epoch/timezone/boundary convention can bend
    gaps = seq.select(
        "event_type",
        F.expr(
            "timestampdiff(SECOND, date_trunc('second', ts), "
            "date_trunc('second', nxt))"
        ).cast("long").alias("gap"),
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.round(
            F.sum("gap").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_gap_sec"),
        F.percentile("gap", 0.5).cast("double").alias("median_gap_sec"),
        F.percentile("gap", 0.9).cast("double").alias("p90_gap_sec"),
    )


@register(
    "etl_scd2_build",
    family="etl",
    doc="SCD Type-2 dimension BUILD — the complement of "
    "join_scd2_point_in_time: collapse each user's event-type stream "
    "into validity intervals [valid_from, valid_to) that open at every "
    "state CHANGE (lag-based change detection with deterministic "
    "ts/event_id ordering), version-numbered per user, open-ended "
    "current row flagged.  The construction half of every warehouse's "
    "type-2 history table.  Interval bounds surface as whole-second "
    "epochs (both engines truncate-then-diff — no timezone/format "
    "surface).  Three partitioned windows per user, one corpus scan; "
    "restricted to user_id < 100 to bound the checked answer.",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts ASC, event_id ASC) AS prev
  FROM events WHERE user_id < 100
),
changes AS (
  SELECT user_id, event_type, ts, event_id
  FROM seq WHERE prev IS NULL OR prev <> event_type
),
versioned AS (
  SELECT user_id, event_type, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts ASC, event_id ASC) AS version,
         LEAD(ts) OVER (PARTITION BY user_id
                        ORDER BY ts ASC, event_id ASC) AS next_ts
  FROM changes
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       event_type,
       CAST(version AS INT) AS version,
       CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS valid_from_s,
       CAST(epoch(date_trunc('second', next_ts)) AS BIGINT) AS valid_to_s,
       CAST(CASE WHEN next_ts IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
FROM versioned
""",
)
def etl_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").where(F.col("user_id") < 100)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev"),
    )
    changes = seq.where(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
    )
    versioned = changes.select(
        "user_id",
        "event_type",
        "ts",
        F.row_number().over(w).alias("version"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    epoch_s = (
        lambda c: F.expr(
            f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
            f"date_trunc('second', {c}))"
        ).cast("bigint")
    )
    return versioned.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        "event_type",
        F.col("version").cast("int").alias("version"),
        epoch_s("ts").alias("valid_from_s"),
        F.when(F.col("next_ts").isNull(), F.lit(None).cast("bigint"))
        .otherwise(epoch_s("next_ts"))
        .alias("valid_to_s"),
        F.when(F.col("next_ts").isNull(), 1).otherwise(0).cast("int").alias(
            "is_current"
        ),
    )
