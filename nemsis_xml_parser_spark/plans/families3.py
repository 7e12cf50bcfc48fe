"""Third battery: as-of join (custom operator), exact percentiles, unpivot.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators import sketches as SK
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


@register(
    "set_intersect_all",
    family="setop",
    doc="INTERSECT ALL (duplicate-preserving) ≡ df.intersectAll.",
    oracle="""
SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
INTERSECT ALL
SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
""",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    r = l.where(F.col("l_returnflag") == "R").select("l_suppkey")
    a = l.where(F.col("l_returnflag") == "A").select("l_suppkey")
    return r.intersectAll(a)


@register(
    "set_except_all",
    family="setop",
    doc="EXCEPT ALL (multiset difference) ≡ df.exceptAll.",
    oracle="""
SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
EXCEPT ALL
SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
""",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    r = l.where(F.col("l_returnflag") == "R").select("l_suppkey")
    a = l.where(F.col("l_returnflag") == "A").select("l_suppkey")
    return r.exceptAll(a)


@register(
    "window_range_frame",
    family="window",
    doc="Value-based RANGE frame: per-customer 30-day trailing spend "
    "(rangeBetween over day numbers ≡ RANGE n PRECEDING — day arithmetic on "
    "both sides keeps it timezone-free; frames under ties include all "
    "peers, so no tie-break is needed for determinism).",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
            OVER (PARTITION BY o_custkey
                  ORDER BY DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d_spend
FROM orders
""",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    day_num = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    )
    w = Window.partitionBy("o_custkey").orderBy(day_num).rangeBetween(-30, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_30d_spend"),
    )


@register(
    "window_locf_fill",
    family="window",
    doc="Last-observation-carried-forward: per-user click value filled "
    "forward over event time (F.last ignorenulls ≡ LAST_VALUE IGNORE NULLS).",
    oracle="""
SELECT event_id, user_id,
       LAST_VALUE(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_value
FROM events
""",
)
def window_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.when(F.col("event_type") == "click", F.col("value"))
    return e.select(
        "event_id",
        "user_id",
        F.last(v, ignorenulls=True).over(w).alias("last_click_value"),
    )


@register(
    "join_salted_skew",
    family="join",
    doc="Skew-safe salted join (operators/partitioning.salted_join): events "
    "joined to per-user aggregates with an 8-way salt replication — the "
    "oracle is the PLAIN join, proving salting is result-identical.",
    oracle="""
SELECT e.event_id, e.user_id, d.n_user_events
FROM events e
JOIN (SELECT user_id, COUNT(*) AS n_user_events FROM events GROUP BY user_id) d
  ON e.user_id = d.user_id
""",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.partitioning import salted_join

    e = table(spark, sf_dir, "events")
    dim = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_user_events"))
    return salted_join(
        e.select("event_id", "user_id"), dim, key="user_id", salt=8
    ).select("event_id", "user_id", "n_user_events")


@register(
    "join_nullsafe_eq",
    family="join",
    doc="Null-safe equality join (eqNullSafe ≡ IS NOT DISTINCT FROM): rows "
    "with NULL keys join each other instead of dropping — a semantics "
    "corner every engine must get right.",
    oracle="""
WITH e AS (
  SELECT event_id,
         CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) < 10 THEN NULL
              ELSE CAST(json_extract_string(props, '$.k') AS INTEGER) % 5 END AS k_bucket
  FROM events
),
d AS (SELECT k_bucket, COUNT(*) AS n_bucket FROM e GROUP BY k_bucket)
SELECT e.event_id, e.k_bucket, d.n_bucket
FROM e JOIN d ON e.k_bucket IS NOT DISTINCT FROM d.k_bucket
""",
)
def join_nullsafe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    e = ev.select(
        "event_id",
        F.when(k < 10, F.lit(None).cast("int")).otherwise(k % 5).alias("k_bucket"),
    )
    d = e.groupBy("k_bucket").agg(F.count(F.lit(1)).alias("n_bucket"))
    return (
        e.alias("e")
        .join(
            F.broadcast(d).alias("d"),
            F.col("e.k_bucket").eqNullSafe(F.col("d.k_bucket")),
        )
        .select("e.event_id", "e.k_bucket", "d.n_bucket")
    )


@register(
    "multimodal_binary_roundtrip",
    family="multimodal",
    doc="Binary-column handling with an oracle: text encoded to BINARY, "
    "byte length + md5 signature + first-byte class computed over the "
    "bytes (the decode-free slice of the multimodal plumbing — full "
    "binaryFile/mapInPandas machinery in operators/multimodal.py).",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       substr(md5(text), 1, 8) AS sig_prefix,
       CASE WHEN substr(text, 1, 1) BETWEEN 'A' AND 'Z' THEN 'upper'
            WHEN substr(text, 1, 1) BETWEEN 'a' AND 'z' THEN 'lower'
            ELSE 'other' END AS first_byte_class
FROM documents
""",
)
def multimodal_binary_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "UTF-8")
    first = F.substring(F.col("text"), 1, 1)
    return d.select(
        "doc_id",
        F.length(blob).alias("n_bytes"),
        F.substring(F.md5(blob), 1, 8).alias("sig_prefix"),
        F.when(first.between("A", "Z"), "upper")
        .when(first.between("a", "z"), "lower")
        .otherwise("other")
        .alias("first_byte_class"),
    )


@register(
    "agg_filter_clause",
    family="agg",
    doc="ANSI FILTER (WHERE ...) conditional aggregation — same syntax in "
    "Spark SQL and DuckDB, planned as a partial/final hash aggregate.",
    oracle="""
SELECT l_returnflag,
       COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS disc_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.expr("count(*) FILTER (WHERE l_quantity > 25)").alias("n_big"),
        F.expr(
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))"
            " FILTER (WHERE l_discount > 0.05) AS DOUBLE)"
        ).alias("disc_price"),
    )


@register(
    "recursive_cte_key_depth",
    family="recursive",
    doc="Recursive CTE (Spark 4 WITH RECURSIVE, via the spark.sql + temp "
    "view API path): iterate parent = key DIV 10 over a synthetic key "
    "forest until the root digit, emitting per-customer depth and root — "
    "the unbounded-iteration shape the engine otherwise only reaches in "
    "the Python flatten.",
    oracle="""
WITH RECURSIVE anc AS (
  SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth FROM customer
  UNION ALL
  SELECT node, cur // 10, depth + 1 FROM anc WHERE cur >= 10
)
SELECT node AS c_custkey, CAST(MAX(depth) AS INTEGER) AS depth,
       CAST(MIN(cur) AS BIGINT) AS root_key
FROM anc GROUP BY node
""",
)
def recursive_cte_key_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
WITH RECURSIVE anc AS (
  SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth FROM customer_v
  UNION ALL
  SELECT node, cur DIV 10, depth + 1 FROM anc WHERE cur >= 10
)
SELECT node AS c_custkey, CAST(MAX(depth) AS INT) AS depth,
       CAST(MIN(cur) AS BIGINT) AS root_key
FROM anc GROUP BY node
"""
    )


@register(
    "join_range_interval_banded",
    family="join",
    doc="Fact-to-fact range join via the banded equi-join scale path "
    "(operators/range_join.py): customers whose balance falls inside each "
    "supplier's ±50 band — oracle is the NAIVE non-equi join, proving the "
    "banding is result-identical while replacing the nested-loop join with "
    "one shuffle on the band id.",
    oracle="""
SELECT s_suppkey, c_custkey
FROM supplier JOIN customer
  ON c_acctbal >= s_acctbal - 50.0 AND c_acctbal < s_acctbal + 50.0
""",
)
def join_range_interval_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.range_join import banded_range_join

    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (F.col("s_acctbal") - 50.0).alias("lo"),
        (F.col("s_acctbal") + 50.0).alias("hi"),
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    joined = banded_range_join(
        c, s, point_col="c_acctbal", lo_col="lo", hi_col="hi", band_width=100.0
    )
    return joined.select("s_suppkey", "c_custkey")


@register(
    "sketch_hll_mergeable",
    family="agg",
    doc="Mergeable HyperLogLog, deterministic register build "
    "(operators/sketches.py::hll_registers): per-order-priority "
    "distinct-customer sketches (512 md5-derived registers — bucket from "
    "the 60-bit digest slice, rank = first-set-bit of the independent "
    "48-bit slice via exact bin()-length arithmetic) merged into a global "
    "estimate by bucket-wise MAX, WITHOUT re-scanning — the build-partial/"
    "merge pattern that makes distinct counts tractable at 100 TB.  The "
    "harmonic mean is carried as an exact BIGINT (s_scaled = "
    "Σ 2^(49-rank) + zeros·2^49), so the whole sketch state AND the raw "
    "alpha·m²/Σ estimate are cross-engine hash-checked — this replaced "
    "the rows-only Apache DataSketches variant (hll_sketch_agg, still "
    "pytest-covered in tests/test_sketches.py) in round 6.  Per-segment "
    "rows plus the merged 'ALL' row, each with the exact distinct count "
    "beside the estimate as the visible error audit.",
    oracle=f"""
WITH h AS (
  SELECT o_orderpriority AS seg,
         CAST(('0x'||substr(md5(CAST(o_custkey AS VARCHAR)),1,15)) AS BIGINT)
           % {SK.HLL_M} AS bucket,
         CAST(('0x'||substr(md5(CAST(o_custkey AS VARCHAR)),17,12)) AS BIGINT)
           AS w,
         o_custkey
  FROM orders
),
ranked AS (
  SELECT seg, bucket,
         CASE WHEN w = 0 THEN 49 ELSE 49 - length(bin(w)) END AS rank,
         o_custkey
  FROM h
),
seg_regs AS (
  SELECT seg, bucket, MAX(rank) AS maxrank FROM ranked GROUP BY 1, 2
),
all_regs AS (
  SELECT 'ALL' AS seg, bucket, MAX(maxrank) AS maxrank
  FROM seg_regs GROUP BY 2
),
regs AS (SELECT * FROM seg_regs UNION ALL SELECT * FROM all_regs),
est AS (
  SELECT seg,
         CAST(COUNT(*) AS BIGINT) AS n_set,
         CAST({SK.HLL_M} - COUNT(*) AS BIGINT) AS v_zero,
         CAST(SUM(CAST(1 AS BIGINT) << (49 - maxrank))
              + ({SK.HLL_M} - COUNT(*)) * (CAST(1 AS BIGINT) << 49)
              AS BIGINT) AS s_scaled
  FROM regs GROUP BY 1
),
exact AS (
  SELECT seg, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
  FROM ranked GROUP BY 1
  UNION ALL
  SELECT 'ALL', CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM ranked
),
raw AS (
  SELECT seg, n_set, v_zero, s_scaled,
         0.7213 / (1.0 + 1.079 / {float(SK.HLL_M)})
           * {float(SK.HLL_M)} * {float(SK.HLL_M)}
           / (CAST(s_scaled AS DOUBLE) / {float(1 << 49)}) AS er
  FROM est
)
SELECT r.seg, n_set, v_zero, s_scaled,
       ROUND(er, 6) AS est_raw,
       ROUND(CASE WHEN er <= {2.5 * SK.HLL_M} AND v_zero > 0
                  THEN {float(SK.HLL_M)} * LN({float(SK.HLL_M)}
                                              / CAST(v_zero AS DOUBLE))
                  ELSE er END, 6) AS est_std,
       exact_distinct
FROM raw r JOIN exact x ON r.seg = x.seg
""",
)
def sketch_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import sketches as SKo

    o = table(spark, sf_dir, "orders").select("o_orderpriority", "o_custkey")
    seg_regs = SKo.hll_registers(o, "o_custkey", ["o_orderpriority"]).select(
        F.col("o_orderpriority").alias("seg"), "bucket", "maxrank"
    ).localCheckpoint()  # two consumers: per-seg estimate + the merge
    all_regs = SKo.hll_merge(seg_regs.drop("seg")).select(
        F.lit("ALL").alias("seg"), "bucket", "maxrank"
    )
    regs = seg_regs.unionByName(all_regs)
    est = SKo.hll_estimate(regs, ["seg"])
    exact = (
        o.groupBy(F.col("o_orderpriority").alias("seg"))
        .agg(F.countDistinct("o_custkey").cast("bigint").alias("exact_distinct"))
        .unionByName(
            o.agg(
                F.countDistinct("o_custkey").cast("bigint").alias("exact_distinct")
            ).select(F.lit("ALL").alias("seg"), "exact_distinct")
        )
    )
    return est.join(exact, "seg").select(
        "seg", "n_set", "v_zero", "s_scaled", "est_raw", "est_std",
        "exact_distinct",
    )


@register(
    "events_funnel_conversion",
    family="window",
    doc="Sequential funnel: per user, first 'click' and the earliest "
    "'purchase' that follows it within 1 hour — the A-then-B-within-T "
    "shape behind conversion/retention analytics (no MATCH_RECOGNIZE in "
    "either engine; expressed as aggregate + time-banded self-join, which "
    "at scale is an equi-join on user_id with the band predicate applied "
    "post-shuffle).  Totals as exact BIGINT second sums — no float "
    "averaging, so both engines agree bit-for-bit.",
    oracle="""
WITH clicks AS (
  SELECT user_id, MIN(ts) AS first_click FROM events
  WHERE event_type = 'click' GROUP BY user_id
),
conv AS (
  SELECT c.user_id, MIN(p.ts) AS conv_ts
  FROM clicks c JOIN events p
    ON p.user_id = c.user_id AND p.event_type = 'purchase'
   AND p.ts > c.first_click AND p.ts <= c.first_click + INTERVAL 1 HOUR
  GROUP BY c.user_id
)
SELECT COUNT(*) AS n_clickers,
       COUNT(conv_ts) AS n_converted,
       CAST(COALESCE(SUM(date_diff('second', date_trunc('second', first_click),
                                 date_trunc('second', conv_ts))), 0) AS BIGINT)
         AS total_seconds_to_convert
FROM clicks LEFT JOIN conv USING (user_id)
""",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts")
    )
    conv = (
        purchases.join(clicks, "user_id")
        .where(
            (F.col("pts") > F.col("first_click"))
            & (F.col("pts") <= F.col("first_click") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("pts").alias("conv_ts"))
    )
    joined = clicks.join(conv, "user_id", "left")
    secs = F.expr(
        "timestampdiff(SECOND, date_trunc('SECOND', first_click),"
        " date_trunc('SECOND', conv_ts))"
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_clickers"),
        F.count("conv_ts").alias("n_converted"),
        F.coalesce(F.sum(secs), F.lit(0))
        .cast("bigint")
        .alias("total_seconds_to_convert"),
    )


@register(
    "events_retention_cohorts",
    family="window",
    doc="Retention cohort matrix: users cohorted by the week of their "
    "first 'signup', counted distinct in each subsequent activity week as "
    "a week offset — the standard growth-analytics triangle.  Week "
    "offsets derive from day-diffs of week-truncated timestamps (exact "
    "multiples of 7), sidestepping engine differences in week-boundary "
    "counting.  Plan: two hash aggregates + one equi-join on user_id + "
    "a distinct-count — all shuffle-by-user/cohort, no window needed.",
    oracle="""
WITH cohort AS (
  SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, act_week) / 7 AS BIGINT) AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_active_users
FROM cohort c JOIN activity a
  ON a.user_id = c.user_id AND a.act_week >= c.cohort_week
GROUP BY cohort_week, week_offset
""",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    cohort = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.date_trunc("week", F.col("ts"))).alias("cohort_week"))
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
    ).distinct()
    return (
        cohort.join(activity, "user_id")
        .where(F.col("act_week") >= F.col("cohort_week"))
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("act_week"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


@register(
    "join_lateral_topk",
    family="join",
    doc="LATERAL correlated subquery: per nation, its top-2 suppliers by "
    "account balance — Spark plans the correlated LATERAL as a "
    "LateralJoin (same SQL runs on DuckDB).  Equivalent to the window "
    "top-k (topk_per_group) but exercises the lateral-join operator "
    "surface; deterministic via acctbal DESC + suppkey tie-break.",
    oracle="""
SELECT n_name, s.s_suppkey, s.s_name, s.s_acctbal
FROM nation,
LATERAL (
  SELECT s_suppkey, s_name, s_acctbal
  FROM supplier
  WHERE s_nationkey = n_nationkey
  ORDER BY s_acctbal DESC, s_suppkey ASC
  LIMIT 2
) s
""",
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat_v")
    table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_lat_v")
    return spark.sql(
        """
        SELECT n_name, s.s_suppkey, s.s_name, s.s_acctbal
        FROM nation_lat_v,
        LATERAL (
          SELECT s_suppkey, s_name, s_acctbal
          FROM supplier_lat_v
          WHERE s_nationkey = n_nationkey
          ORDER BY s_acctbal DESC, s_suppkey ASC
          LIMIT 2
        ) s
        """
    )


@register(
    "array_hof_battery",
    family="scalar",
    doc="Higher-order array functions over the embedding column: "
    "transform/filter/exists/aggregate/zip_with in one projection "
    "(DuckDB twins: list_transform/list_filter/len>0/list_sum/"
    "list_dot_product).  All JVM-side codegen in Spark — the HOF path "
    "that keeps per-element logic out of Python at 100 TB.  Fold order "
    "is left-to-right in both engines, so doubles agree before the "
    "6-dp round.",
    oracle="""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings WHERE vec_id < 50)
SELECT vec_id,
       len(list_filter(v, x -> x > 0)) AS n_pos,
       len(list_filter(v, x -> x < -0.4)) > 0 AS any_strong_neg,
       ROUND(list_max(v), 6) AS max_val,
       ROUND(list_sum(list_transform(v, x -> x * x)), 6) AS sum_sq,
       ROUND(list_dot_product(v, list_reverse(v)), 6) AS dot_reversed
FROM e
""",
)
def array_hof_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import to_double_array

    e = table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 50)
    v = to_double_array(F.col("embedding"))
    return e.select(
        "vec_id",
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.exists(v, lambda x: x < -0.4).alias("any_strong_neg"),
        F.round(F.array_max(v), 6).alias("max_val"),
        F.round(
            F.aggregate(
                F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
            ),
            6,
        ).alias("sum_sq"),
        F.round(
            F.aggregate(
                F.zip_with(v, F.reverse(v), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("dot_reversed"),
    )


@register(
    "join_fuzzy_name_match",
    family="join",
    doc="Entity-resolution fuzzy join (operators/fuzzy.py): customer-name "
    "pairs within edit distance 1 via FastSS deletion-neighborhood "
    "blocking — an equi-join on deletion variants replaces the O(n^2) "
    "levenshtein cross join; exact levenshtein verifies only the "
    "candidates.  Input bounded to c_custkey < 400 to keep the checked "
    "output compact.",
    oracle="""
WITH base AS (
  SELECT c_custkey AS id, c_name AS name FROM customer WHERE c_custkey < 400
),
keys AS (
  SELECT id, name,
         UNNEST(list_prepend(name,
                list_transform(range(1, len(name) + 1),
                               i -> substr(name, 1, i - 1) || substr(name, i + 1)))) AS key
  FROM base
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.name AS name_a, b.name AS name_b
  FROM keys a JOIN keys b ON a.key = b.key AND a.id < b.id
)
SELECT id_a, id_b, name_a, name_b, levenshtein(name_a, name_b) AS dist
FROM cand
WHERE levenshtein(name_a, name_b) <= 1
""",
)
def join_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.fuzzy import fuzzy_pairs

    c = table(spark, sf_dir, "customer").where(F.col("c_custkey") < 400)
    out = fuzzy_pairs(c, id_col="c_custkey", text_col="c_name", max_dist=1)
    return out.select(
        "id_a", "id_b", "name_a", "name_b", F.col("dist").cast("bigint").alias("dist")
    )
