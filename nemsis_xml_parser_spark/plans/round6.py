"""Round-6 additions: interval concurrency sweep, A/B z-test,
Kneser–Ney bigram smoothing, forward as-of join, Jensen–Shannon drift.

Registered after every earlier module so the rotation fronts them as
never-recorded queries.  Oracle discipline per plans/registry.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import register, table

# ---------------------------------------------------------------------------
# Concurrent-interval sweep (endpoint +1/−1 running sum)
# ---------------------------------------------------------------------------

SESSION_MINUTES = 15


@register(
    "window_session_concurrency",
    family="window",
    doc="Peak concurrency per day via the endpoint-sweep: each event "
    "opens a 15-minute interval, every interval contributes a +1 at its "
    "start and a −1 at its end, and the running sum of deltas in "
    "(time, delta, event_id) order is the number of concurrently-open "
    "intervals — the classic interval-stabbing reduction that answers "
    "'how many sessions were live at once' without any interval×interval "
    "join.  The −1 sorts before the +1 at equal timestamps, so "
    "half-open [t, t+15m) intervals never double-count a boundary.  Both "
    "endpoints of an interval land in the START day's partition, so each "
    "day's sweep starts at zero and the window stays partitioned "
    "(per-day; at 100 TB/day the same sweep runs through "
    "operators/prefix_sum.py instead of a per-day window).  Deltas are "
    "exact ints — no float anywhere.",
    oracle=f"""
WITH ev AS (SELECT event_id, ts FROM events),
pts AS (
  SELECT CAST(ts AS DATE) AS day, ts AS t, 1 AS delta, event_id FROM ev
  UNION ALL
  SELECT CAST(ts AS DATE) AS day,
         ts + INTERVAL {SESSION_MINUTES} MINUTE AS t, -1 AS delta, event_id
  FROM ev
),
run AS (
  SELECT day, delta,
         SUM(delta) OVER (PARTITION BY day ORDER BY t ASC, delta ASC,
                          event_id ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS conc
  FROM pts
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_events,
       CAST(MAX(conc) AS INT) AS peak_concurrency
FROM run
GROUP BY day
""",
)
def window_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_id", "ts")
    start = ev.select(
        F.to_date("ts").alias("day"),
        F.col("ts").alias("t"),
        F.lit(1).alias("delta"),
        "event_id",
    )
    end = ev.select(
        F.to_date("ts").alias("day"),
        F.expr(f"ts + INTERVAL {SESSION_MINUTES} MINUTE").alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    pts = start.unionByName(end)
    w = (
        Window.partitionBy("day")
        .orderBy(F.col("t").asc(), F.col("delta").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.select("day", "delta", F.sum("delta").over(w).alias("conc"))
    return run.groupBy(
        F.date_format("day", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_events"),
        F.max("conc").cast("int").alias("peak_concurrency"),
    )


# ---------------------------------------------------------------------------
# Two-proportion z-test (A/B experiment readout)
# ---------------------------------------------------------------------------


@register(
    "quality_two_proportion_ztest",
    family="drift",
    doc="A/B conversion readout: users hash-split into two variants "
    "(md5 parity — the deterministic bucketing every experiment "
    "framework uses), conversion = 13+ purchases (the per-user median, "
    "so both rates are interior and the pooled variance is nonzero — "
    "every user has SOME purchase in this corpus), and the "
    "two-proportion z-statistic z = (pA − pB) / sqrt(p̂(1−p̂)(1/nA + "
    "1/nB)) from the pooled rate — the standard significance gate on a "
    "conversion experiment.  All inputs are exact per-variant user "
    "counts (two aggregates over one scan); the z arithmetic is one "
    "identical expression tree in both engines, rounded at the edge.",
    oracle="""
WITH u AS (
  SELECT user_id,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
           % 2 AS variant,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   >= 13 THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY user_id
),
agg AS (
  SELECT
    CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
    CAST(SUM(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv_b
  FROM u
)
SELECT n_a, n_b, conv_a, conv_b,
       ROUND(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
       ROUND(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
       ROUND((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
             / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)), 6) AS z_score
FROM agg
""",
)
def quality_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_long

    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            >= 13
        )
        .cast("int")
        .alias("converted")
    ).select(
        (md5_long(F.col("user_id").cast("string")) % 2).alias("variant"),
        "converted",
    )
    agg = u.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("variant") == 0, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_b"),
    )
    ca, cb = F.col("conv_a").cast("double"), F.col("conv_b").cast("double")
    na, nb = F.col("n_a"), F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (na + nb)
    z = (ca / na - cb / nb) / F.sqrt(
        pooled * (F.lit(1.0) - pooled) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    )
    return agg.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(ca / na, 6).alias("rate_a"),
        F.round(cb / nb, 6).alias("rate_b"),
        F.round(z, 6).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Kneser–Ney smoothed bigram model
# ---------------------------------------------------------------------------

KN_D = 0.75
KN_TOP = 20


@register(
    "text_kneser_ney_bigram",
    family="text",
    doc="Interpolated Kneser–Ney bigram probabilities — the smoothing "
    "that actually powers n-gram LMs (importance weighting, perplexity "
    "filters): P(w2|w1) = (c(w1,w2) − D)/c(w1) + D·N1+(w1,·)/c(w1) · "
    "N1+(·,w2)/B, with absolute discount D = 0.75 and the CONTINUATION "
    "count N1+(·,w2) (how many distinct contexts w2 follows) replacing "
    "raw frequency in the backoff — the 'Francisco problem' fix.  All "
    "five statistics are exact count aggregates over one bigram "
    "explode; the probability is one identical expression tree both "
    "engines, rounded at the edge.  Top-20 bigrams by count with full "
    "tie-break via orderBy().limit() (TakeOrderedAndProject).",
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '') AS t
  FROM documents
),
big AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM toks, UNNEST(range(1, len(t))) AS r(i)
  WHERE len(t) >= 2
),
c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n2 FROM big GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(SUM(n2) AS BIGINT) AS n1,
              CAST(COUNT(*) AS BIGINT) AS n1f FROM c2 GROUP BY w1),
cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1b FROM c2 GROUP BY w2),
btot AS (SELECT CAST(COUNT(*) AS BIGINT) AS b FROM c2)
SELECT c2.w1, c2.w2, n2, n1,
       ROUND(((n2 - {KN_D}) / n1)
             + (({KN_D} * n1f / n1) * (CAST(n1b AS DOUBLE) / b)), 6)
         AS kn_prob
FROM c2 JOIN c1 USING (w1) JOIN cont ON cont.w2 = c2.w2, btot
ORDER BY n2 DESC, c2.w1 ASC, c2.w2 ASC
LIMIT {KN_TOP}
""",
)
def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as T

    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", T.tokens(F.col("text")).alias("t"))
    big = (
        toks.where(F.size("t") >= 2)
        .select(
            F.expr(
                "explode(transform(sequence(0, size(t) - 2),"
                " i -> struct(t[i] AS w1, t[i + 1] AS w2)))"
            ).alias("bg")
        )
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("n2"))
    c1 = c2.groupBy("w1").agg(
        F.sum("n2").cast("bigint").alias("n1"),
        F.count(F.lit(1)).cast("bigint").alias("n1f"),
    )
    cont = c2.groupBy("w2").agg(F.count(F.lit(1)).cast("bigint").alias("n1b"))
    btot = c2.agg(F.count(F.lit(1)).cast("bigint").alias("b"))
    prob = ((F.col("n2") - F.lit(KN_D)) / F.col("n1")) + (
        (F.lit(KN_D) * F.col("n1f") / F.col("n1"))
        * (F.col("n1b").cast("double") / F.col("b"))
    )
    return (
        c2.join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(btot))
        .select("w1", "w2", "n2", "n1", F.round(prob, 6).alias("kn_prob"))
        .orderBy(F.col("n2").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(KN_TOP)
    )


# ---------------------------------------------------------------------------
# Forward as-of join
# ---------------------------------------------------------------------------


@register(
    "join_asof_forward",
    family="join",
    doc="FORWARD as-of join (operators/asof_join.py direction='forward'):"
    " each non-signup event paired with the user's EARLIEST signup at "
    "or after it — the next-event lookup (time-to-upgrade, "
    "click-to-conversion latency) that mirrors asof_join_last_signup's "
    "backward direction.  Same single-shuffle union + fill window with "
    "the time axis reversed.  The oracle takes the independent "
    "correlated-subquery formulation (DuckDB decorrelates it into a "
    "join), so two different algorithms must agree row-for-row.",
    oracle="""
WITH signups AS (
  SELECT user_id, ts, MAX(event_id) AS signup_event_id
  FROM events WHERE event_type = 'signup'
  GROUP BY user_id, ts
),
others AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type != 'signup'
)
SELECT o.event_id, o.user_id,
       (SELECT s.signup_event_id FROM signups s
        WHERE s.user_id = o.user_id AND s.ts >= o.ts
        ORDER BY s.ts ASC LIMIT 1) AS next_signup_event_id
FROM others o
""",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof_join import asof_join

    e = table(spark, sf_dir, "events")
    left = e.where(F.col("event_type") != "signup").select(
        "event_id", "user_id", "ts"
    )
    right = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("next_signup_event_id"))
        .withColumn("__ord", F.col("next_signup_event_id"))
    )
    joined = asof_join(
        left,
        right,
        key="user_id",
        ts="ts",
        right_order="__ord",
        value_cols=["next_signup_event_id"],
        direction="forward",
    )
    return joined.select("event_id", "user_id", "next_signup_event_id")


# ---------------------------------------------------------------------------
# Jensen–Shannon divergence per source vs the corpus
# ---------------------------------------------------------------------------

JS_BUCKET = 32
JS_MAXB = 15


@register(
    "quality_js_divergence",
    family="drift",
    doc="Jensen–Shannon divergence of each source's token-length "
    "distribution against the whole corpus — the symmetric, bounded "
    "[0, ln 2] drift metric that completes the monitoring battery "
    "beside PSI (asymmetric, unbounded) and KS (max-gap): JS(P‖Q) = "
    "½Σp·ln(p/m) + ½Σq·ln(q/m), m = (p+q)/2, over capped 32-token "
    "buckets.  The bucket grid comes from the corpus side, which "
    "contains every source's buckets by construction, so no mass is "
    "dropped.  Per-bucket terms are rounded+DECIMAL-cast before the "
    "sum (order-independent); everything else is exact counts.  Scale: "
    "two aggregates over one scan plus arithmetic on a sources×16 "
    "broadcast grid.",
    oracle=f"""
WITH d AS (
  SELECT source,
         LEAST(CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                     x -> x != '')) AS BIGINT) // {JS_BUCKET},
               {JS_MAXB}) AS bucket
  FROM documents
),
sb AS (SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS c_sb
       FROM d GROUP BY 1, 2),
st AS (SELECT source, CAST(SUM(c_sb) AS BIGINT) AS n_s FROM sb GROUP BY 1),
ob AS (SELECT bucket, CAST(SUM(c_sb) AS BIGINT) AS c_b FROM sb GROUP BY 1),
tot AS (SELECT CAST(SUM(c_b) AS BIGINT) AS n FROM ob),
grid AS (
  SELECT st.source, st.n_s, ob.bucket, ob.c_b, tot.n,
         COALESCE(sb.c_sb, 0) AS c_sb
  FROM st CROSS JOIN ob CROSS JOIN tot
  LEFT JOIN sb ON sb.source = st.source AND sb.bucket = ob.bucket
),
terms AS (
  SELECT source, n_s,
         CAST(c_sb AS DOUBLE) / n_s AS p,
         CAST(c_b AS DOUBLE) / n AS q
  FROM grid
),
summed AS (
  SELECT source, n_s,
         SUM(CAST(ROUND(CASE WHEN p > 0
                             THEN p * LN(p / ((p + q) / 2)) ELSE 0 END, 12)
                  AS DECIMAL(38,12))) AS tp,
         SUM(CAST(ROUND(CASE WHEN q > 0
                             THEN q * LN(q / ((p + q) / 2)) ELSE 0 END, 12)
                  AS DECIMAL(38,12))) AS tq
  FROM terms GROUP BY 1, 2
)
SELECT source, CAST(n_s AS BIGINT) AS n_docs,
       ROUND(0.5 * CAST(tp AS DOUBLE) + 0.5 * CAST(tq AS DOUBLE), 6)
         AS js_divergence
FROM summed
""",
)
def quality_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as T

    d = table(spark, sf_dir, "documents").select(
        "source",
        F.least(
            F.floor(T.token_count(F.col("text")) / F.lit(JS_BUCKET)).cast(
                "bigint"
            ),
            F.lit(JS_MAXB).cast("bigint"),
        ).alias("bucket"),
    )
    sb = d.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_sb")
    )
    st = sb.groupBy("source").agg(F.sum("c_sb").cast("bigint").alias("n_s"))
    ob = sb.groupBy("bucket").agg(F.sum("c_sb").cast("bigint").alias("c_b"))
    tot = ob.agg(F.sum("c_b").cast("bigint").alias("n"))
    grid = (
        st.crossJoin(F.broadcast(ob))
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(sb), ["source", "bucket"], "left")
        .select(
            "source",
            "n_s",
            (F.coalesce(F.col("c_sb"), F.lit(0)).cast("double") / F.col("n_s")).alias("p"),
            (F.col("c_b").cast("double") / F.col("n")).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / F.lit(2)
    tp = F.when(F.col("p") > 0, F.col("p") * F.log(F.col("p") / m)).otherwise(0.0)
    tq = F.when(F.col("q") > 0, F.col("q") * F.log(F.col("q") / m)).otherwise(0.0)
    summed = grid.groupBy("source", "n_s").agg(
        F.sum(F.round(tp, 12).cast("decimal(38,12)")).alias("tp"),
        F.sum(F.round(tq, 12).cast("decimal(38,12)")).alias("tq"),
    )
    return summed.select(
        "source",
        F.col("n_s").cast("bigint").alias("n_docs"),
        F.round(
            F.lit(0.5) * F.col("tp").cast("double")
            + F.lit(0.5) * F.col("tq").cast("double"),
            6,
        ).alias("js_divergence"),
    )


# ---------------------------------------------------------------------------
# CDC changelog apply (last-writer-wins with deletes)
# ---------------------------------------------------------------------------


@register(
    "etl_cdc_apply",
    family="etl",
    doc="CDC changelog application — the merge every warehouse ingest "
    "runs on a Debezium/CDC feed: events become an ordered changelog "
    "per key (signup=INSERT, error=DELETE, everything else=UPDATE), "
    "ops apply in (ts, event_id) order, and the final state is the "
    "LAST op per key with deleted keys absent — last-writer-wins "
    "compaction, the set-based upgrade of the reference's "
    "delete-then-insert per PCR key (main_ingest.py:276-328).  One "
    "key-partitioned row_number window (never global), exact values "
    "passed through untouched.",
    oracle="""
WITH log AS (
  SELECT user_id, event_id, ts,
         CASE event_type WHEN 'error' THEN 'D'
                         WHEN 'signup' THEN 'I' ELSE 'U' END AS op,
         value
  FROM events
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_changes
  FROM log
)
SELECT user_id, event_id AS final_event_id, op AS final_op, value AS final_value,
       CAST(n_changes AS BIGINT) AS n_changes
FROM ranked
WHERE rn = 1 AND op != 'D'
""",
)
def etl_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    log = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "error", "D")
        .when(F.col("event_type") == "signup", "I")
        .otherwise("U")
        .alias("op"),
        "value",
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wc = Window.partitionBy("user_id")
    ranked = log.select(
        "*",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_changes"),
    )
    return ranked.where((F.col("rn") == 1) & (F.col("op") != "D")).select(
        "user_id",
        F.col("event_id").alias("final_event_id"),
        F.col("op").alias("final_op"),
        F.col("value").alias("final_value"),
        F.col("n_changes").cast("bigint").alias("n_changes"),
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap confidence interval
# ---------------------------------------------------------------------------

BOOT_B = 32
#: inverse-CDF thresholds for Poisson(1), scaled by 1e6 (cum e^-1/k!)
BOOT_THRESH = [367879, 735759, 919699, 981012, 996340, 999406, 999917]


def _poisson_case_sql(u: str) -> str:
    parts = [
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(BOOT_THRESH)
    ]
    return "CASE " + " ".join(parts) + f" ELSE {len(BOOT_THRESH)} END"


@register(
    "agg_poisson_bootstrap_ci",
    family="agg",
    doc="Bootstrap confidence interval for the mean order price via the "
    "POISSON bootstrap — the resampling scheme that actually "
    "distributes (Chamandy et al.): instead of materializing B "
    "resamples, every row draws a deterministic Poisson(1) weight per "
    "replica from the md5 stream (inverse-CDF on the seeded uniform), "
    "so each replica mean is one weighted aggregate and all 32 run in "
    "a single pass with map-side combine.  Replica sums are exact "
    "DECIMAL (weight × DECIMAL(12,2) price); the CI is the exact "
    "0.025/0.975 linear-interpolation percentile over the 32 replica "
    "means (percentile ≡ quantile_cont, proven by "
    "agg_percentile_exact).  Everything seeded — full hash oracle.",
    oracle=f"""
WITH w AS (
  SELECT o.o_orderkey, b.b,
         CAST(o.o_totalprice AS DECIMAL(12,2)) AS price,
         {_poisson_case_sql("CAST(('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR) || '_' || CAST(b.b AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000")}
           AS wt
  FROM orders o, UNNEST(range({BOOT_B})) AS b(b)
),
reps AS (
  SELECT b,
         CAST(SUM(wt * price) AS DOUBLE) / CAST(SUM(wt) AS BIGINT) AS mean_b
  FROM w GROUP BY b
),
point AS (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
           / COUNT(*) AS point_mean
  FROM orders
)
SELECT ROUND(point_mean, 6) AS point_mean,
       CAST({BOOT_B} AS BIGINT) AS n_replicas,
       ROUND(CAST(SUM(CAST(ROUND(mean_b, 6) AS DECIMAL(18,6))) AS DOUBLE)
             / {BOOT_B}, 6) AS boot_mean,
       ROUND(CAST(quantile_cont(mean_b, 0.025) AS DOUBLE), 6) AS ci_lo,
       ROUND(CAST(quantile_cont(mean_b, 0.975) AS DOUBLE), 6) AS ci_hi
FROM reps, point
GROUP BY point_mean
""",
)
def agg_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_long

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    b = spark.range(BOOT_B).select(F.col("id").cast("int").alias("b"))
    u = md5_long(
        F.concat(
            F.col("o_orderkey").cast("string"),
            F.lit("_"),
            F.col("b").cast("string"),
        )
    ) % 1000000
    wt = F.when(u < BOOT_THRESH[0], 0)
    for k, t in enumerate(BOOT_THRESH[1:], start=1):
        wt = wt.when(u < t, k)
    wt = wt.otherwise(len(BOOT_THRESH))
    w = o.crossJoin(F.broadcast(b)).select(
        "b",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
        wt.alias("wt"),
    )
    reps = w.groupBy("b").agg(
        (
            F.sum(F.col("wt") * F.col("price")).cast("double")
            / F.sum("wt").cast("bigint")
        ).alias("mean_b")
    )
    point = o.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("point_mean")
    )
    return (
        reps.crossJoin(F.broadcast(point))
        .groupBy("point_mean")
        .agg(
            F.lit(BOOT_B).cast("bigint").alias("n_replicas"),
            F.round(
                F.sum(F.round(F.col("mean_b"), 6).cast("decimal(18,6)")).cast(
                    "double"
                )
                / F.lit(BOOT_B),
                6,
            ).alias("boot_mean"),
            F.round(F.percentile("mean_b", 0.025), 6).alias("ci_lo"),
            F.round(F.percentile("mean_b", 0.975), 6).alias("ci_hi"),
        )
        .select(
            F.round("point_mean", 6).alias("point_mean"),
            "n_replicas",
            "boot_mean",
            "ci_lo",
            "ci_hi",
        )
    )


# ---------------------------------------------------------------------------
# Spatial grid epsilon-join
# ---------------------------------------------------------------------------

EPS = 0.5
TOP_PAIRS = 10


@register(
    "join_spatial_grid_epsilon",
    family="join",
    doc="Epsilon-neighborhood self-join via GRID BUCKETING — the "
    "canonical scalable spatial-join pattern (the 2-D generalization "
    "of the 1-D band join): purchases become points (value, "
    "hour-of-day), each point replicates into its 3×3 neighborhood of "
    "ε-sized grid cells on the LEFT side only and joins the right "
    "side's HOME cell, so every qualifying pair is produced exactly "
    "once (no distinct needed) and the join is a pure equi-join on "
    "cell id — candidate count bounded by cell occupancy, never "
    "|points|².  Exact |dx|<ε ∧ |dy|<ε verification post-join.  The "
    "oracle is the naive all-pairs theta join — equality proves the "
    "grid decomposition is lossless.  Output: pair count + top-10 "
    "closest pairs by L∞ distance with full tie-break.",
    oracle=f"""
WITH p AS (
  SELECT event_id, value AS x,
         EXTRACT(hour FROM ts) + EXTRACT(minute FROM ts) / 60.0 AS y
  FROM events WHERE event_type = 'purchase'
),
pairs AS (
  SELECT a.event_id AS id_a, b.event_id AS id_b,
         ROUND(GREATEST(ABS(a.x - b.x), ABS(a.y - b.y)), 6) AS linf
  FROM p a JOIN p b ON a.event_id < b.event_id
  WHERE ABS(a.x - b.x) < {EPS} AND ABS(a.y - b.y) < {EPS}
),
top AS (
  SELECT * FROM pairs ORDER BY linf ASC, id_a ASC, id_b ASC LIMIT {TOP_PAIRS}
)
SELECT t.id_a, t.id_b, t.linf, n.n_pairs
FROM top t CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM pairs) n
""",
)
def join_spatial_grid_epsilon(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        F.col("value").alias("x"),
        (F.hour("ts") + F.minute("ts") / F.lit(60.0)).alias("y"),
    )
    cx, cy = F.floor(F.col("x") / EPS), F.floor(F.col("y") / EPS)
    # left side: replicate into the 3x3 cell neighborhood
    a = p.select(
        F.col("event_id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (cx + dx).alias("gx"), (cy + dy).alias("gy")
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("cell"),
    ).select("id_a", "xa", "ya", F.col("cell.gx").alias("gx"), F.col("cell.gy").alias("gy"))
    # right side: home cell only
    bb = p.select(
        F.col("event_id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        cx.alias("gx"),
        cy.alias("gy"),
    )
    pairs = (
        a.join(bb, ["gx", "gy"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            (F.abs(F.col("xa") - F.col("xb")) < EPS)
            & (F.abs(F.col("ya") - F.col("yb")) < EPS)
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.greatest(
                    F.abs(F.col("xa") - F.col("xb")),
                    F.abs(F.col("ya") - F.col("yb")),
                ),
                6,
            ).alias("linf"),
        )
        .localCheckpoint()  # two consumers: count scalar + top-k
    )
    n = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    return (
        pairs.orderBy(F.col("linf").asc(), F.col("id_a").asc(), F.col("id_b").asc())
        .limit(TOP_PAIRS)
        .crossJoin(F.broadcast(n))
    )


# ---------------------------------------------------------------------------
# Timestamp scalar battery (NTZ, zone-free by construction)
# ---------------------------------------------------------------------------


@register(
    "scalar_timestamp_battery",
    family="scalar",
    doc="Timestamp scalar-function battery over the NTZ event stream — "
    "field extraction (year/month/day/hour/minute/second), hour/week "
    "truncation, epoch-day arithmetic, second-of-day, and NTZ interval "
    "differences via timestampdiff — every expression zone-free by "
    "construction (the battery that guards the NTZ discipline of "
    "NOTES gotchas 17-18).  Aggregated to one audit row per event "
    "type: exact BIGINT sums only.",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(EXTRACT(year FROM ts) * 10000 + EXTRACT(month FROM ts) * 100
                + EXTRACT(day FROM ts)) AS BIGINT) AS ymd_sum,
       CAST(SUM(EXTRACT(hour FROM ts) * 3600 + EXTRACT(minute FROM ts) * 60
                + EXTRACT(second FROM ts)) AS BIGINT) AS second_of_day_sum,
       CAST(SUM(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)))
         AS BIGINT) AS epoch_day_sum,
       CAST(SUM(DATEDIFF('minute', date_trunc('hour', ts), ts)) AS BIGINT)
         AS minutes_past_hour_sum,
       CAST(SUM(DATEDIFF('day', date_trunc('week', ts), CAST(ts AS DATE)))
         AS BIGINT) AS dow_from_monday_sum
FROM events
GROUP BY event_type
""",
)
def scalar_timestamp_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.year("ts") * 10000 + F.month("ts") * 100 + F.dayofmonth("ts")
        )
        .cast("bigint")
        .alias("ymd_sum"),
        F.sum(
            F.hour("ts") * 3600 + F.minute("ts") * 60 + F.second("ts")
        )
        .cast("bigint")
        .alias("second_of_day_sum"),
        F.sum(F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")))
        .cast("bigint")
        .alias("epoch_day_sum"),
        F.sum(F.expr("timestampdiff(MINUTE, date_trunc('hour', ts), ts)"))
        .cast("bigint")
        .alias("minutes_past_hour_sum"),
        F.sum(
            F.datediff(F.to_date("ts"), F.to_date(F.date_trunc("week", "ts")))
        )
        .cast("bigint")
        .alias("dow_from_monday_sum"),
    )


# ---------------------------------------------------------------------------
# Exact covariance matrix over the lineitem metric columns
# ---------------------------------------------------------------------------

COV_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "agg_covariance_matrix",
    family="agg",
    doc="Pairwise covariance matrix of the four lineitem metrics from "
    "EXACT decimal cross-moments — cov(a,b) = (Σab − ΣaΣb/n)/n computed "
    "from DECIMAL sums so the result is row-order independent (builtin "
    "covar_pop aggregates floats in shuffle order and cannot "
    "hash-match across engines).  The d(d+1)/2 upper-triangle shape of "
    "the Gram/covariance primitive specialized to a typed column set — "
    "one scan, one aggregate, 10 output rows.",
    oracle="""
WITH m AS (
  SELECT CAST(l_quantity AS DECIMAL(12,2)) AS c0,
         CAST(l_extendedprice AS DECIMAL(12,2)) AS c1,
         CAST(l_discount AS DECIMAL(12,2)) AS c2,
         CAST(l_tax AS DECIMAL(12,2)) AS c3
  FROM lineitem
),
s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(c0) AS DOUBLE) AS s0, CAST(SUM(c1) AS DOUBLE) AS s1,
         CAST(SUM(c2) AS DOUBLE) AS s2, CAST(SUM(c3) AS DOUBLE) AS s3,
         CAST(SUM(c0 * c0) AS DOUBLE) AS p00, CAST(SUM(c0 * c1) AS DOUBLE) AS p01,
         CAST(SUM(c0 * c2) AS DOUBLE) AS p02, CAST(SUM(c0 * c3) AS DOUBLE) AS p03,
         CAST(SUM(c1 * c1) AS DOUBLE) AS p11, CAST(SUM(c1 * c2) AS DOUBLE) AS p12,
         CAST(SUM(c1 * c3) AS DOUBLE) AS p13, CAST(SUM(c2 * c2) AS DOUBLE) AS p22,
         CAST(SUM(c2 * c3) AS DOUBLE) AS p23, CAST(SUM(c3 * c3) AS DOUBLE) AS p33
  FROM m
)
SELECT i, j, ROUND((p - si * sj / n) / n, 6) AS cov
FROM (
  SELECT 0 AS i, 0 AS j, p00 AS p, s0 AS si, s0 AS sj, n FROM s
  UNION ALL SELECT 0, 1, p01, s0, s1, n FROM s
  UNION ALL SELECT 0, 2, p02, s0, s2, n FROM s
  UNION ALL SELECT 0, 3, p03, s0, s3, n FROM s
  UNION ALL SELECT 1, 1, p11, s1, s1, n FROM s
  UNION ALL SELECT 1, 2, p12, s1, s2, n FROM s
  UNION ALL SELECT 1, 3, p13, s1, s3, n FROM s
  UNION ALL SELECT 2, 2, p22, s2, s2, n FROM s
  UNION ALL SELECT 2, 3, p23, s2, s3, n FROM s
  UNION ALL SELECT 3, 3, p33, s3, s3, n FROM s
)
""",
)
def agg_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    cols = [F.col(c).cast("decimal(12,2)").alias(f"c{k}") for k, c in enumerate(COV_COLS)]
    m = li.select(*cols)
    aggs = [
        F.count(F.lit(1)).cast("double").alias("n"),
    ]
    d = len(COV_COLS)
    for k in range(d):
        aggs.append(F.sum(F.col(f"c{k}")).cast("double").alias(f"s{k}"))
    for i in range(d):
        for j in range(i, d):
            aggs.append(
                F.sum(F.col(f"c{i}") * F.col(f"c{j}"))
                .cast("double")
                .alias(f"p{i}{j}")
            )
    s = m.agg(*aggs)
    rows = None
    for i in range(d):
        for j in range(i, d):
            r = s.select(
                F.lit(i).cast("int").alias("i"),
                F.lit(j).cast("int").alias("j"),
                F.round(
                    (
                        F.col(f"p{i}{j}")
                        - F.col(f"s{i}") * F.col(f"s{j}") / F.col("n")
                    )
                    / F.col("n"),
                    6,
                ).alias("cov"),
            )
            rows = r if rows is None else rows.unionByName(r)
    return rows


# ---------------------------------------------------------------------------
# Water-filling token-budget allocation across sources
# ---------------------------------------------------------------------------

BUDGET_FRACTION = 0.5  # spend half the corpus token mass


@register(
    "curation_waterfill_budget",
    family="curation",
    doc="Water-filling budget allocation — distribute a global token "
    "budget across sources so every source gets MIN(its supply, a "
    "common fair-share level L), with L chosen so allocations exactly "
    "exhaust the budget: the standard max-min fair allocator for "
    "mixture construction under a token cap.  Closed form over the "
    "SORTED supplies: for each candidate k (sources sorted ascending), "
    "L_k = (budget − cumsum of the k smallest) / (n − k); the valid "
    "level is the one where supply_k ≤ L_{k-1}-style feasibility "
    "holds — computed here by taking, per source, the smallest "
    "feasible level via a bounded per-source triangular join (20 "
    "sources — a dimension, not data).  Exact integer token counts; "
    "the level and allocations rounded at the edge.  Allocations sum "
    "to the budget (floor-level discrepancy < n tokens, audited in "
    "the output).",
    oracle=f"""
WITH supply AS (
  SELECT source,
         CAST(SUM(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                  x -> x != ''))) AS BIGINT) AS toks
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(FLOOR(SUM(toks) * {BUDGET_FRACTION}) AS BIGINT) AS budget,
               CAST(COUNT(*) AS BIGINT) AS n FROM supply),
ranked AS (
  SELECT source, toks,
         ROW_NUMBER() OVER (ORDER BY toks ASC, source ASC) AS rk
  FROM supply
),
-- cumulative sum of the (rk-1) smaller supplies, via bounded self-join
cum AS (
  SELECT a.rk, a.source, a.toks,
         CAST(COALESCE(SUM(b.toks), 0) AS BIGINT) AS below
  FROM ranked a LEFT JOIN ranked b ON b.rk < a.rk
  GROUP BY a.rk, a.source, a.toks
),
-- the water level if every source with rank >= rk is capped by L
levels AS (
  SELECT c.rk, c.source, c.toks, c.below,
         (CAST(t.budget - c.below AS DOUBLE)) / (t.n - c.rk + 1) AS lvl
  FROM cum c, tot t
),
-- the binding level: the first rank whose supply exceeds its level
chosen AS (
  SELECT MIN(lvl) AS level FROM levels WHERE toks > lvl
),
alloc AS (
  SELECT r.source, r.toks,
         CASE WHEN c.level IS NULL OR r.toks <= c.level
              THEN CAST(r.toks AS DOUBLE)
              ELSE c.level END AS granted
  FROM ranked r, chosen c
)
SELECT source, toks AS supply_tokens,
       ROUND(granted, 6) AS granted_tokens,
       CAST(CASE WHEN granted < toks THEN 1 ELSE 0 END AS INT) AS capped
FROM alloc
""",
)
def curation_waterfill_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as T

    d = table(spark, sf_dir, "documents")
    supply = d.groupBy("source").agg(
        F.sum(T.token_count(F.col("text"))).cast("bigint").alias("toks")
    )
    tot = supply.agg(
        F.floor(F.sum("toks") * BUDGET_FRACTION).cast("bigint").alias("budget"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    ranked = supply.select(
        "source",
        "toks",
        F.row_number()
        .over(Window.orderBy(F.col("toks").asc(), F.col("source").asc()))
        .alias("rk"),
    )
    a = ranked.alias("a")
    b = ranked.select(F.col("rk").alias("brk"), F.col("toks").alias("btoks"))
    cum = (
        a.join(F.broadcast(b), F.col("brk") < F.col("rk"), "left")
        .groupBy("rk", "source", "toks")
        .agg(F.coalesce(F.sum("btoks"), F.lit(0)).cast("bigint").alias("below"))
    )
    levels = cum.crossJoin(F.broadcast(tot)).select(
        "rk",
        "source",
        "toks",
        (
            (F.col("budget") - F.col("below")).cast("double")
            / (F.col("n") - F.col("rk") + 1)
        ).alias("lvl"),
    )
    chosen = levels.where(F.col("toks") > F.col("lvl")).agg(
        F.min("lvl").alias("level")
    )
    alloc = ranked.crossJoin(F.broadcast(chosen)).select(
        "source",
        "toks",
        F.when(
            F.col("level").isNull() | (F.col("toks") <= F.col("level")),
            F.col("toks").cast("double"),
        )
        .otherwise(F.col("level"))
        .alias("granted"),
    )
    return alloc.select(
        "source",
        F.col("toks").alias("supply_tokens"),
        F.round("granted", 6).alias("granted_tokens"),
        F.when(F.col("granted") < F.col("toks"), 1).otherwise(0).cast("int").alias("capped"),
    )


# ---------------------------------------------------------------------------
# Frequent triples (level-3 a-priori)
# ---------------------------------------------------------------------------

TRI_MINSUP = 2


@register(
    "mine_frequent_triples",
    family="dedup",
    doc="Frequent 3-itemsets over the order baskets via LEVEL-3 a-priori "
    "(operators/apriori.py::triple_supports) — the iteration step "
    "beyond mine_association_rules' pairs that pattern mining actually "
    "runs: frequent items prune the baskets, frequent PAIRS generate "
    "candidates on their shared prefix, the subset-closure join "
    "((a,b),(a,c),(b,c) all frequent) prunes again, and only then does "
    "the three-way basket join count — candidate cardinality bounded "
    "by frequent-pair density, never basket-width³.  The oracle is the "
    "naive unpruned three-way self-join: equality proves both prunes "
    "lossless.  Exact counts, full tie-broken ordering.",
    oracle=f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS a, b.l_partkey AS b, c.l_partkey AS c,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM li a
JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
JOIN li c ON a.l_orderkey = c.l_orderkey AND b.l_partkey < c.l_partkey
GROUP BY 1, 2, 3
HAVING COUNT(*) >= {TRI_MINSUP}
""",
)
def mine_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.apriori import triple_supports

    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=True)  # consumed by prune, pairs and 3 join sides
    )
    return triple_supports(li, "l_orderkey", "l_partkey", TRI_MINSUP)


# ---------------------------------------------------------------------------
# Audio periodicity probe (square-wave matched filter over real PCM)
# ---------------------------------------------------------------------------


@register(
    "multimodal_audio_periodicity",
    family="multimodal",
    doc="Square-wave matched-filter periodicity features over REAL "
    "16-bit PCM WAV decode (operators/multimodal.py::"
    "wav_periodicity_features): per audio, channel-0 energy Σx² and "
    "correlations against ±1 square waves at periods 4/8/16 — the "
    "integer-exact cousin of a Goertzel DFT bin (sin/cos would make "
    "the oracle hostage to libm's last-ulp differences; square-wave "
    "signs keep every statistic an exact BIGINT).  The corpus is the "
    "deterministic closed-form PCM (sample(i,0) = ((id·13+7i) mod "
    "2003) − 1001), so the oracle recomputes every feature without "
    "touching a WAV byte — drift in RIFF chunk walking, int16 LE "
    "decoding or channel deinterleaving breaks the hash.",
    oracle="""
WITH spec AS (
  SELECT doc_id, doc_id % 100 + 1 AS n FROM documents
),
px AS (
  SELECT doc_id, n, s.i,
         (doc_id * 13 + 7 * s.i) % 2003 - 1001 AS x
  FROM spec, UNNEST(range(0, n)) AS s(i)
)
SELECT doc_id AS audio_id,
       CAST(MIN(n) AS INT) AS n_samples,
       CAST(SUM(x * x) AS BIGINT) AS energy,
       CAST(SUM(x * (CASE WHEN i % 4 < 2 THEN 1 ELSE -1 END)) AS BIGINT)
         AS corr_p4,
       CAST(SUM(x * (CASE WHEN i % 8 < 4 THEN 1 ELSE -1 END)) AS BIGINT)
         AS corr_p8,
       CAST(SUM(x * (CASE WHEN i % 16 < 8 THEN 1 ELSE -1 END)) AS BIGINT)
         AS corr_p16
FROM px
GROUP BY doc_id
""",
)
def multimodal_audio_periodicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (
        synthesize_pcm_audio,
        wav_periodicity_features,
    )

    d = table(spark, sf_dir, "documents")
    return wav_periodicity_features(synthesize_pcm_audio(d.select("doc_id")))


# ---------------------------------------------------------------------------
# Mann–Kendall trend test (nonparametric, tie-corrected)
# ---------------------------------------------------------------------------


@register(
    "agg_mann_kendall_trend",
    family="timeseries",
    doc="Mann–Kendall trend test on the daily event-count series — the "
    "nonparametric significance companion to agg_theil_sen_slope "
    "(which gives the magnitude): S = Σ_{i<j} sign(x_j − x_i) over the "
    "bounded day domain (triangular join on ~30 days — a calendar "
    "dimension, not data), tie-corrected variance Var(S) = "
    "[n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18 from exact counts, and the "
    "continuity-corrected z.  Everything integer until the final "
    "sqrt/division — one identical expression tree both engines.",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
s AS (
  SELECT CAST(SUM(CASE WHEN b.x > a.x THEN 1
                       WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
  FROM daily a JOIN daily b ON a.day < b.day
),
ties AS (
  SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie_sum
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY x) g
  WHERE t > 1
)
SELECT n.n AS n_days, s.s_stat,
       ROUND((CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_sum AS DOUBLE))
             / 18.0, 6) AS var_s,
       ROUND((CASE WHEN s.s_stat > 0 THEN s.s_stat - 1.0
                   WHEN s.s_stat < 0 THEN s.s_stat + 1.0
                   ELSE 0.0 END)
             / sqrt((CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_sum
                          AS DOUBLE)) / 18.0), 6) AS z_score
FROM n, s, ties
""",
)
def agg_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    n = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = daily.select(F.col("day").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("day").alias("db"), F.col("x").alias("xb"))
    s = (
        a.join(b, F.col("da") < F.col("db"))
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    ties = (
        daily.groupBy("x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie_sum")
        )
    )
    var_expr = (
        (
            F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
            - F.col("tie_sum")
        ).cast("double")
        / F.lit(18.0)
    )
    z_num = (
        F.when(F.col("s_stat") > 0, F.col("s_stat") - F.lit(1.0))
        .when(F.col("s_stat") < 0, F.col("s_stat") + F.lit(1.0))
        .otherwise(F.lit(0.0))
    )
    return (
        n.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("n").alias("n_days"),
            "s_stat",
            F.round(var_expr, 6).alias("var_s"),
            F.round(z_num / F.sqrt(var_expr), 6).alias("z_score"),
        )
    )


# ---------------------------------------------------------------------------
# Kaplan–Meier survival over user lifetimes
# ---------------------------------------------------------------------------


@register(
    "events_kaplan_meier",
    family="timeseries",
    doc="Kaplan–Meier survival estimator over user lifetimes — the "
    "right-censored churn curve: lifetime = days between a user's "
    "first and last event, censored when the user is still active on "
    "the corpus' final day; at each observed churn time t, S(t) "
    "multiplies the running product by (1 − d_t/n_t) with n_t = users "
    "whose observed time ≥ t.  The cumulative product runs over the "
    "BOUNDED day domain (≤ horizon days, a calendar dimension) as a "
    "triangular join of exp(Σ round-12 ln terms) — decimal-summed so "
    "order-independent, final ROUND(6) absorbing exp/ln last-ulp "
    "variance.  Exact integer risk/event counts surfaced beside the "
    "estimate.",
    oracle="""
WITH horizon AS (SELECT MAX(CAST(ts AS DATE)) AS last_day FROM events),
lives AS (
  SELECT user_id,
         DATEDIFF('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)))
           AS lifetime,
         CASE WHEN MAX(CAST(ts AS DATE)) = (SELECT last_day FROM horizon)
              THEN 1 ELSE 0 END AS censored
  FROM events GROUP BY user_id
),
times AS (
  SELECT lifetime AS t,
         CAST(SUM(1 - censored) AS BIGINT) AS d
  FROM lives GROUP BY lifetime
  HAVING SUM(1 - censored) > 0
),
risk AS (
  SELECT tm.t, tm.d,
         CAST((SELECT COUNT(*) FROM lives l WHERE l.lifetime >= tm.t)
           AS BIGINT) AS n_risk
  FROM times tm
),
surv AS (
  SELECT a.t, a.d, a.n_risk,
         EXP(CAST(SUM(CAST(ROUND(LN(1.0 - CAST(b.d AS DOUBLE) / b.n_risk),
                                 12) AS DECIMAL(24,12))) AS DOUBLE))
           AS s_raw
  FROM risk a JOIN risk b ON b.t <= a.t
  GROUP BY a.t, a.d, a.n_risk
)
SELECT CAST(t AS BIGINT) AS t_days, n_risk, d AS n_events,
       ROUND(s_raw, 6) AS survival
FROM surv
""",
)
def events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    horizon = ev.agg(F.max(F.to_date("ts")).alias("last_day"))
    lives = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.to_date("ts")).alias("first_day"),
            F.max(F.to_date("ts")).alias("last_day_u"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            F.datediff("last_day_u", "first_day").alias("lifetime"),
            F.when(F.col("last_day_u") == F.col("last_day"), 1)
            .otherwise(0)
            .alias("censored"),
        )
        .localCheckpoint(eager=True)  # consumed by times AND the risk probe
    )
    times = (
        lives.groupBy(F.col("lifetime").alias("t"))
        .agg(F.sum(1 - F.col("censored")).cast("bigint").alias("d"))
        .where(F.col("d") > 0)
    )
    lv = lives.select(F.col("lifetime").alias("lt"))
    risk = (
        times.join(F.broadcast(lv), F.col("lt") >= F.col("t"))
        .groupBy("t", "d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_risk"))
    )
    a = risk.select(
        F.col("t").alias("ta"), F.col("d").alias("da"), F.col("n_risk").alias("na")
    )
    b = risk.select(
        F.col("t").alias("tb"), F.col("d").alias("db"), F.col("n_risk").alias("nb")
    )
    surv = (
        a.join(F.broadcast(b), F.col("tb") <= F.col("ta"))
        .groupBy("ta", "da", "na")
        .agg(
            F.exp(
                F.sum(
                    F.round(
                        F.log(
                            F.lit(1.0) - F.col("db").cast("double") / F.col("nb")
                        ),
                        12,
                    ).cast("decimal(24,12)")
                ).cast("double")
            ).alias("s_raw")
        )
    )
    return surv.select(
        F.col("ta").cast("bigint").alias("t_days"),
        F.col("na").alias("n_risk"),
        F.col("da").alias("n_events"),
        F.round("s_raw", 6).alias("survival"),
    )


# ---------------------------------------------------------------------------
# Seeded differential-privacy count release
# ---------------------------------------------------------------------------

DP_EPS = 1.0
DP_SENS = 1  # counting query sensitivity


@register(
    "quality_dp_noisy_counts",
    family="drift",
    doc="Differentially-private count release with SEEDED Laplace noise "
    "— the privacy-preserving data card every public corpus ships: "
    "per-(source, lang) document counts plus Lap(sensitivity/ε) noise "
    "drawn by inverse-CDF from the md5-uniform stream (u ∈ (0,1) → "
    "−(1/ε)·sign(u−½)·ln(1−2|u−½|)), so the release is reproducible "
    "and cross-engine hash-checked while keeping the exact mechanism "
    "shape.  The true count rides alongside as the absolute-error "
    "audit (a real release would drop it).  One aggregate; noise is "
    "scalar arithmetic on the group keys; ln variance absorbed by "
    "ROUND(6).",
    oracle=f"""
WITH g AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM documents GROUP BY source, lang
),
u AS (
  SELECT source, lang, true_count,
         (CAST(('0x' || substr(md5(source || '|' || lang), 1, 15)) AS BIGINT)
          % 999999 + 1) / 1000000.0 AS uv
  FROM g
)
SELECT source, lang, true_count,
       ROUND(true_count
             - ({DP_SENS} / {DP_EPS})
               * (CASE WHEN uv < 0.5 THEN -1.0 ELSE 1.0 END)
               * LN(1.0 - 2.0 * ABS(uv - 0.5)), 6) AS noisy_count,
       ROUND(ABS(({DP_SENS} / {DP_EPS})
                 * (CASE WHEN uv < 0.5 THEN -1.0 ELSE 1.0 END)
                 * LN(1.0 - 2.0 * ABS(uv - 0.5))), 6) AS abs_noise
FROM u
""",
)
def quality_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_long

    d = table(spark, sf_dir, "documents")
    g = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_count")
    )
    uv = (
        md5_long(F.concat(F.col("source"), F.lit("|"), F.col("lang"))) % 999999
        + 1
    ) / F.lit(1000000.0)
    noise = (
        (F.lit(float(DP_SENS)) / F.lit(float(DP_EPS)))
        * F.when(uv < 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(uv - F.lit(0.5)))
    )
    return g.select(
        "source",
        "lang",
        "true_count",
        F.round(F.col("true_count") - noise, 6).alias("noisy_count"),
        F.round(F.abs(noise), 6).alias("abs_noise"),
    )


# ---------------------------------------------------------------------------
# End-to-end curation pipeline (filter -> dedup -> sample -> account)
# ---------------------------------------------------------------------------

PIPE_MIN_W, PIPE_MAX_W = 10, 5000
PIPE_KEEP_PCT = 80


@register(
    "curation_pipeline_e2e",
    family="curation",
    doc="The composed curation pass a training-data team actually runs, "
    "end to end in ONE declarative plan: quality gate (word count in "
    "[10, 5000] and unique-token ratio ≥ 0.3) → exact near-dup removal "
    "(md5 fingerprint of trimmed text, min-doc_id survivor election) → "
    "deterministic 80% hash sample (md5 mod 100) → per-(source, lang) "
    "accounting of docs and tokens surviving each stage.  Every stage "
    "is a component proven separately (gopher rules, "
    "dedup_exact_survivors, sample_hash_split); this row proves the "
    "COMPOSITION — the funnel counts only agree if all four stage "
    "semantics chain exactly.  One scan, stage flags as columns (no "
    "per-stage materialization), one final 20×2-key aggregate; the "
    "dedup survivor election is the only extra shuffle (fingerprint "
    "group).",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, lang,
         len(list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x != '')) AS nw,
         len(list_distinct(list_filter(string_split_regex(trim(text), '\\s+'),
                                       x -> x != ''))) AS nu,
         md5(trim(text)) AS fp
  FROM documents
),
flt AS (
  SELECT *, CASE WHEN nw BETWEEN {PIPE_MIN_W} AND {PIPE_MAX_W}
                  AND CAST(nu AS DOUBLE) / nw >= 0.3
             THEN 1 ELSE 0 END AS pass_filter
  FROM t
),
surv AS (
  SELECT fp, MIN(doc_id) AS survivor_id
  FROM flt WHERE pass_filter = 1 GROUP BY fp
),
staged AS (
  SELECT f.*,
         CASE WHEN f.pass_filter = 1 AND s.survivor_id = f.doc_id
              THEN 1 ELSE 0 END AS pass_dedup,
         CASE WHEN f.pass_filter = 1 AND s.survivor_id = f.doc_id
                   AND CAST(('0x' || substr(md5(CAST(f.doc_id AS VARCHAR)),
                                            1, 15)) AS BIGINT) % 100
                       < {PIPE_KEEP_PCT}
              THEN 1 ELSE 0 END AS pass_sample
  FROM flt f LEFT JOIN surv s ON s.fp = f.fp
)
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS docs_in,
       CAST(SUM(pass_filter) AS BIGINT) AS docs_filtered,
       CAST(SUM(pass_dedup) AS BIGINT) AS docs_deduped,
       CAST(SUM(pass_sample) AS BIGINT) AS docs_sampled,
       CAST(SUM(CASE WHEN pass_sample = 1 THEN nw ELSE 0 END) AS BIGINT)
         AS tokens_sampled
FROM staged
GROUP BY source, lang
""",
)
def curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as T
    from ..functions.hashing import md5_long

    d = table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    t = d.select(
        "doc_id",
        "source",
        "lang",
        F.size(toks).alias("nw"),
        F.size(F.array_distinct(toks)).alias("nu"),
        F.md5(F.trim(F.col("text"))).alias("fp"),
    )
    flt = t.withColumn(
        "pass_filter",
        F.when(
            F.col("nw").between(PIPE_MIN_W, PIPE_MAX_W)
            & (F.col("nu").cast("double") / F.col("nw") >= 0.3),
            1,
        ).otherwise(0),
    )
    surv = (
        flt.where(F.col("pass_filter") == 1)
        .groupBy("fp")
        .agg(F.min("doc_id").alias("survivor_id"))
    )
    staged = flt.join(surv, "fp", "left").select(
        "*",
        F.when(
            (F.col("pass_filter") == 1)
            & (F.col("survivor_id") == F.col("doc_id")),
            1,
        )
        .otherwise(0)
        .alias("pass_dedup"),
    )
    staged = staged.withColumn(
        "pass_sample",
        F.when(
            (F.col("pass_dedup") == 1)
            & (md5_long(F.col("doc_id").cast("string")) % 100 < PIPE_KEEP_PCT),
            1,
        ).otherwise(0),
    )
    return staged.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs_in"),
        F.sum("pass_filter").cast("bigint").alias("docs_filtered"),
        F.sum("pass_dedup").cast("bigint").alias("docs_deduped"),
        F.sum("pass_sample").cast("bigint").alias("docs_sampled"),
        F.sum(F.when(F.col("pass_sample") == 1, F.col("nw")).otherwise(0))
        .cast("bigint")
        .alias("tokens_sampled"),
    )


# ---------------------------------------------------------------------------
# Winsorized mean (robust-statistics battery)
# ---------------------------------------------------------------------------


@register(
    "agg_winsorized_mean",
    family="agg",
    doc="5%-winsorized mean of order totals per priority — the robust "
    "location estimate that clamps (rather than drops) the tails: "
    "values below P5 / above P95 are replaced by the exact linear-"
    "interpolation percentiles (percentile ≡ quantile_cont, proven by "
    "agg_percentile_exact), then averaged via round-12 DECIMAL sums so "
    "the clamped aggregate is order-independent.  Compared against the "
    "raw mean in the same row — the visible outlier-influence audit.",
    oracle="""
WITH b AS (
  SELECT o_orderpriority,
         ROUND(CAST(quantile_cont(o_totalprice, 0.05) AS DOUBLE), 6) AS p05,
         ROUND(CAST(quantile_cont(o_totalprice, 0.95) AS DOUBLE), 6) AS p95
  FROM orders GROUP BY o_orderpriority
),
w AS (
  SELECT o.o_orderpriority,
         CAST(o.o_totalprice AS DECIMAL(12,2)) AS raw,
         CAST(ROUND(LEAST(GREATEST(o.o_totalprice, b.p05), b.p95), 12)
              AS DECIMAL(24,12)) AS clamped
  FROM orders o JOIN b USING (o_orderpriority)
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(raw) AS DOUBLE) / COUNT(*), 6) AS raw_mean,
       ROUND(CAST(SUM(clamped) AS DOUBLE) / COUNT(*), 6) AS winsorized_mean
FROM w
GROUP BY o_orderpriority
""",
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    b = o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", 0.05), 6).alias("p05"),
        F.round(F.percentile("o_totalprice", 0.95), 6).alias("p95"),
    )
    w = o.join(F.broadcast(b), "o_orderpriority").select(
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(12,2)").alias("raw"),
        F.round(
            F.least(
                F.greatest(F.col("o_totalprice"), F.col("p05")), F.col("p95")
            ),
            12,
        )
        .cast("decimal(24,12)")
        .alias("clamped"),
    )
    return w.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum("raw").cast("double") / F.count(F.lit(1)), 6).alias(
            "raw_mean"
        ),
        F.round(
            F.sum("clamped").cast("double") / F.count(F.lit(1)), 6
        ).alias("winsorized_mean"),
    )


# ---------------------------------------------------------------------------
# Term burstiness (variance-to-mean dispersion across documents)
# ---------------------------------------------------------------------------

BURST_TOP = 20


@register(
    "text_burstiness_dispersion",
    family="text",
    doc="Term burstiness — the variance-to-mean dispersion index of "
    "per-document term counts for the corpus' top-20 terms: D = "
    "Var(tf)/Mean(tf) over ALL documents (zeros included — absent "
    "docs are part of the distribution), D ≈ 1 for Poisson-scattered "
    "function words, D ≫ 1 for bursty topical terms — the signal "
    "keyword extractors and stopword inducers split on.  Zeros enter "
    "through N (corpus size) arithmetic, not row explosion: Var from "
    "exact Σtf, Σtf² DECIMAL moments + N, so the all-docs distribution "
    "costs nothing beyond the posting aggregate.  Top-20 by corpus "
    "frequency with full tie-break.",
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '') AS t
  FROM documents
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM toks),
tf AS (
  SELECT doc_id, UNNEST(t) AS term FROM toks
),
ptf AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS f
  FROM tf GROUP BY term, doc_id
),
stats AS (
  SELECT term,
         CAST(SUM(f) AS BIGINT) AS total_tf,
         CAST(COUNT(*) AS BIGINT) AS df,
         CAST(SUM(f * f) AS BIGINT) AS sum_f2
  FROM ptf GROUP BY term
)
SELECT term, total_tf, df,
       ROUND((CAST(sum_f2 AS DOUBLE) / n.n_docs
              - (CAST(total_tf AS DOUBLE) / n.n_docs)
                * (CAST(total_tf AS DOUBLE) / n.n_docs))
             / (CAST(total_tf AS DOUBLE) / n.n_docs), 6) AS dispersion
FROM stats, n
ORDER BY total_tf DESC, term ASC
LIMIT {BURST_TOP}
""",
)
def text_burstiness_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as T

    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", T.tokens(F.col("text")).alias("t"))
    n = toks.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    ptf = (
        toks.select("doc_id", F.explode("t").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    stats = ptf.groupBy("term").agg(
        F.sum("f").cast("bigint").alias("total_tf"),
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum(F.col("f") * F.col("f")).cast("bigint").alias("sum_f2"),
    )
    mean = F.col("total_tf").cast("double") / F.col("n_docs")
    disp = (
        F.col("sum_f2").cast("double") / F.col("n_docs") - mean * mean
    ) / mean
    return (
        stats.crossJoin(F.broadcast(n))
        .select("term", "total_tf", "df", F.round(disp, 6).alias("dispersion"))
        .orderBy(F.col("total_tf").desc(), F.col("term").asc())
        .limit(BURST_TOP)
    )
