"""Round-13 additions: split conformal prediction intervals.

Reference parity: none — §2.I data-quality tier (the reference is a
psycopg2 ETL with no calibration audits).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import register, table

# ---------------------------------------------------------------------------
# Split conformal prediction intervals (Vovk et al.; Lei et al. JASA'18)
# ---------------------------------------------------------------------------

CP_ALPHA = 0.1  # target miscoverage: 90% intervals


@register(
    "quality_conformal_interval",
    family="quality",
    doc="Split conformal prediction audit at miscoverage "
    f"alpha={CP_ALPHA}: orders are split calibration/test by md5-hash "
    "parity of the key (deterministic, engine-reproducible); the "
    "'model' is the calibration mean totalprice per order priority "
    "(any point predictor works — conformal wraps it); the interval "
    "half-width q is the ceil((n+1)(1-alpha))-th SMALLEST calibration "
    "absolute residual (the finite-sample-valid split-conformal "
    "quantile, exact order statistic — not an interpolated "
    "percentile), and test coverage is the fraction of held-out "
    "orders inside mu +/- q.  Distribution-free guarantee: coverage "
    ">= 1 - alpha in expectation, which the emitted per-segment "
    "coverage column exhibits.  Determinism: sums run over "
    "DECIMAL-cast prices (exact, order-independent), residuals are "
    "rounded to a DECIMAL grid before selection and comparison, so "
    "the order statistic and the coverage comparisons are identical "
    "across engines.  Scale shape: one aggregate for the model; the "
    "order statistic selects the k-th smallest via a cumulative-count "
    "window over the (seg, r) PRE-AGGREGATE — window input bounded by "
    "distinct 4-dp grid values per segment, not calibration rows (the "
    "agg_weighted_median pattern) — then one broadcast join scores the "
    "test split; no all-pairs anywhere.",
    oracle=f"""
WITH o AS (
  SELECT o_orderpriority AS seg,
         CAST(o_totalprice AS DECIMAL(18,4)) AS y,
         md5(CAST(o_orderkey AS VARCHAR)) < '8' AS is_calib
  FROM orders
),
model AS (
  SELECT seg, CAST(SUM(y) AS DOUBLE) / COUNT(*) AS mu,
         COUNT(*) AS n_calib
  FROM o WHERE is_calib GROUP BY seg
),
resid AS (
  SELECT o.seg,
         CAST(ROUND(ABS(CAST(y AS DOUBLE) - mu), 4) AS DECIMAL(18,4)) AS r
  FROM o JOIN model ON o.seg = model.seg
  WHERE is_calib
),
q AS (
  SELECT seg, r AS q_radius FROM (
    SELECT seg, r,
           ROW_NUMBER() OVER (PARTITION BY seg ORDER BY r ASC) AS rn,
           COUNT(*) OVER (PARTITION BY seg) AS n
    FROM resid
  ) WHERE rn = LEAST(CAST(CEIL((n + 1) * {1 - CP_ALPHA}) AS BIGINT), n)
),
test AS (
  SELECT o.seg,
         CAST(ROUND(ABS(CAST(y AS DOUBLE) - mu), 4) AS DECIMAL(18,4)) AS r
  FROM o JOIN model ON o.seg = model.seg
  WHERE NOT is_calib
)
SELECT t.seg,
       MIN(m.n_calib) AS n_calib,
       COUNT(*) AS n_test,
       CAST(MIN(q.q_radius) AS DOUBLE) AS q_radius,
       ROUND(SUM(CASE WHEN t.r <= q.q_radius THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS coverage
FROM test t JOIN q ON t.seg = q.seg JOIN model m ON t.seg = m.seg
GROUP BY t.seg
""",
)
def quality_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("seg"),
        F.col("o_totalprice").cast("decimal(18,4)").alias("y"),
        (F.md5(F.col("o_orderkey").cast("string")) < F.lit("8")).alias(
            "is_calib"
        ),
    )
    model = (
        o.where("is_calib")
        .groupBy("seg")
        .agg(
            (F.sum("y").cast("double") / F.count(F.lit(1))).alias("mu"),
            F.count(F.lit(1)).alias("n_calib"),
        )
    )
    resid = (
        o.where("is_calib")
        .join(F.broadcast(model), "seg")
        .select(
            "seg",
            F.round(F.abs(F.col("y").cast("double") - F.col("mu")), 4)
            .cast("decimal(18,4)")
            .alias("r"),
        )
    )
    # k-th smallest via the agg_weighted_median shape (VERDICT r13 #2):
    # residuals live on a 4-dp DECIMAL grid, so pre-aggregate
    # (seg, r) -> count and select the smallest r whose cumulative count
    # reaches k with a window whose input is DISTINCT grid values per
    # segment — bounded by the price grid, not by calibration rows.  A
    # direct row_number over resid would sort O(rows) through 5 segment
    # reducers at scale.  Selection rule identical to the oracle's
    # rn == least(ceil((n+1)(1-alpha)), n): duplicates are counted by c,
    # ties are impossible post-GROUP BY.
    grid = resid.groupBy("seg", "r").agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("seg")
        .orderBy(F.col("r").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "seg",
        "r",
        F.sum("c").over(wcum).alias("cw"),
        F.sum("c").over(Window.partitionBy("seg")).alias("n"),
    )
    k = F.least(
        F.ceil((F.col("n") + 1) * F.lit(1 - CP_ALPHA)).cast("long"),
        F.col("n"),
    )
    q = (
        cum.groupBy("seg")
        .agg(F.min(F.when(F.col("cw") >= k, F.col("r"))).alias("q_radius"))
    )
    test = (
        o.where(~F.col("is_calib"))
        .join(F.broadcast(model), "seg")
        .select(
            "seg",
            "n_calib",
            F.round(F.abs(F.col("y").cast("double") - F.col("mu")), 4)
            .cast("decimal(18,4)")
            .alias("r"),
        )
    )
    return (
        test.join(F.broadcast(q), "seg")
        .groupBy("seg")
        .agg(
            F.min("n_calib").alias("n_calib"),
            F.count(F.lit(1)).alias("n_test"),
            F.min("q_radius").cast("double").alias("q_radius"),
            F.round(
                F.sum(
                    F.when(F.col("r") <= F.col("q_radius"), 1).otherwise(0)
                )
                * F.lit(1.0)
                / F.count(F.lit(1)),
                6,
            ).alias("coverage"),
        )
    )
