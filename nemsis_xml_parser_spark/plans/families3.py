"""Third battery: as-of join (custom operator), exact percentiles, unpivot.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.asof_join import asof_join
from .registry import register, table


@register(
    "asof_join_last_signup",
    family="join",
    doc="As-of join (custom operator Spark lacks): each non-signup event "
    "paired with the user's most recent signup at or before it.  Spark side "
    "is the union+fill-forward window composition; oracle is DuckDB's native "
    "ASOF JOIN — two independent algorithms, same semantics.",
    oracle="""
WITH signups AS (
  SELECT user_id, ts, MAX(event_id) AS signup_event_id
  FROM events WHERE event_type = 'signup'
  GROUP BY user_id, ts
),
others AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type != 'signup'
)
SELECT o.event_id, o.user_id, s.signup_event_id
FROM others o ASOF LEFT JOIN signups s
  ON o.user_id = s.user_id AND o.ts >= s.ts
""",
)
def asof_join_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    left = e.where(F.col("event_type") != "signup").select("event_id", "user_id", "ts")
    right = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("signup_event_id"))
        .withColumn("__ord", F.col("signup_event_id"))
    )
    joined = asof_join(
        left,
        right,
        key="user_id",
        ts="ts",
        right_order="__ord",
        value_cols=["signup_event_id"],
    )
    return joined.select("event_id", "user_id", "signup_event_id")


@register(
    "agg_percentile_exact",
    family="agg",
    doc="Exact linear-interpolation percentiles (Spark percentile ≡ DuckDB "
    "quantile_cont).",
    oracle="""
SELECT l_returnflag,
       ROUND(CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE), 6) AS p50_qty,
       ROUND(CAST(quantile_cont(l_quantity, 0.9) AS DOUBLE), 6) AS p90_qty,
       ROUND(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE), 6) AS p50_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", 0.5), 6).alias("p50_qty"),
        F.round(F.percentile("l_quantity", 0.9), 6).alias("p90_qty"),
        F.round(F.percentile("l_extendedprice", 0.5), 6).alias("p50_price"),
    )


@register(
    "agg_percentile_approx",
    family="agg",
    doc="approx_percentile (KLL/GK sketch — engine-specific, rows-only; "
    "bounded-error property asserted in tests vs the exact percentile).",
    oracle=None,
)
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", 0.5, 1000).alias("p50_qty_approx"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "unpivot_stack",
    family="setop",
    doc="Unpivot via stack(): wide per-flag aggregates back to (metric, value) rows.",
    oracle="""
WITH agg AS (
  SELECT l_returnflag,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty,
         CAST(COUNT(*) AS DOUBLE) AS n_rows
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'total_qty' AS metric, total_qty AS value FROM agg
UNION ALL
SELECT l_returnflag, 'n_rows' AS metric, n_rows AS value FROM agg
""",
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    agg = l.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("total_qty"),
        F.count(F.lit(1)).cast("double").alias("n_rows"),
    )
    return agg.selectExpr(
        "l_returnflag",
        "stack(2, 'total_qty', total_qty, 'n_rows', n_rows) AS (metric, value)",
    )
