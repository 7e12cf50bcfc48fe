"""Second operator battery: subqueries (scalar/correlated/IN), HAVING,
pivot-style conditional aggregation, advanced window analytics
(ntile/percent_rank/first/last), array+map construction, more TPC-H
analogues (Q14 promo share, Q18 large orders), cross join, union-all.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import register, table
from .tpch import SQL_REV, dec2, rate, rev, ts


@register(
    "subquery_scalar_avg",
    family="subquery",
    doc="Scalar subquery: customers above global average balance.",
    oracle="""
SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM customer)
""",
)
def subquery_scalar_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    c.createOrReplaceTempView("customer_sq")
    return spark.sql(
        """
        SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal
        FROM customer_sq
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM customer_sq)
        """
    )


@register(
    "subquery_in_list",
    family="subquery",
    doc="IN-subquery: orders of customers in nations of region ASIA.",
    oracle="""
SELECT o_orderkey, o_custkey FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer
  WHERE c_nationkey IN (
    SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'))
""",
)
def subquery_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ["orders", "customer", "nation", "region"]:
        table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_inq")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey FROM orders_inq
        WHERE o_custkey IN (
          SELECT c_custkey FROM customer_inq
          WHERE c_nationkey IN (
            SELECT n_nationkey FROM nation_inq JOIN region_inq ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'))
        """
    )


@register(
    "subquery_correlated_max",
    family="subquery",
    doc="Correlated subquery: each customer's single largest order.",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
FROM orders o
WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
                      WHERE o2.o_custkey = o.o_custkey)
""",
)
def subquery_correlated_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_corr")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
        FROM orders_corr o
        WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders_corr o2
                              WHERE o2.o_custkey = o.o_custkey)
        """
    )


@register(
    "agg_having",
    family="agg",
    doc="GROUP BY + HAVING (post-aggregate filter).",
    oracle="""
SELECT o_custkey, COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 12
""",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 12)
    )


@register(
    "pivot_status_by_segment",
    family="agg",
    doc="Pivot (df.groupBy().pivot()) — oracle as conditional aggregation.",
    oracle="""
SELECT c_mktsegment,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS status_f,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS status_o,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS status_p
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    pivoted = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "c_mktsegment",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
    )


@register(
    "window_analytic_battery",
    family="window",
    doc="ntile / percent_rank / first_value / last_value in one pass.",
    oracle="""
SELECT o_custkey, o_orderkey,
       NTILE(4) OVER w AS spend_quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       FIRST_VALUE(o_orderkey) OVER w AS smallest_order,
       LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS largest_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC)
""",
)
def window_analytic_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("spend_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.first("o_orderkey").over(w).alias("smallest_order"),
        F.last("o_orderkey").over(w_full).alias("largest_order"),
    )


@register(
    "array_agg_battery",
    family="scalar",
    doc="Array construction + ops (collect_set→sort→join emitted as string "
    "for engine-neutral comparison).",
    oracle="""
SELECT c_nationkey,
       COUNT(*) AS n_segments,
       ARRAY_TO_STRING(ARRAY_AGG(seg ORDER BY seg), ',') AS segments
FROM (SELECT DISTINCT c_nationkey, c_mktsegment AS seg FROM customer)
GROUP BY c_nationkey
""",
)
def array_agg_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.countDistinct("c_mktsegment").alias("n_segments"),
        F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias(
            "segments"
        ),
    )


@register(
    "map_build_battery",
    family="scalar",
    doc="Map construction/access (map_from_entries + element_at), emitted as "
    "sorted key=val string.",
    oracle="""
SELECT n_nationkey,
       'name=' || n_name || ';region=' || CAST(n_regionkey AS VARCHAR) AS kv,
       n_name AS name_lookup
FROM nation
""",
)
def map_build_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("name"), F.col("n_name"),
        F.lit("region"), F.col("n_regionkey").cast("string"),
    )
    return n.select(
        "n_nationkey",
        F.concat_ws(
            ";",
            F.concat(F.lit("name="), F.element_at(m, "name")),
            F.concat(F.lit("region="), F.element_at(m, "region")),
        ).alias("kv"),
        F.element_at(m, "name").alias("name_lookup"),
    )


@register(
    "q14_promo_revenue_share",
    family="join",
    doc="TPC-H Q14 analogue: conditional-aggregate promo revenue share.",
    oracle=f"""
SELECT ROUND(
         100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {SQL_REV} ELSE CAST(0 AS DECIMAL(3,2)) END) AS DOUBLE)
               / CAST(SUM({SQL_REV}) AS DOUBLE), 6) AS promo_share,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
""",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ts("1997-06-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1997-07-01 00:00:00"))
    )
    p = table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", rev()).otherwise(
        F.lit(0).cast("decimal(3,2)")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev()).cast("double"),
                6,
            ).alias("promo_share"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q18_large_orders",
    family="join",
    doc="TPC-H Q18 analogue: orders whose total quantity exceeds a threshold "
    "(join against a grouped-HAVING derived relation).",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey, o_custkey
HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.sum(dec2("l_quantity")).alias("_tq"))
        .where(F.col("_tq") > 150)
        .select(
            "o_orderkey", "o_custkey", F.col("_tq").cast("double").alias("total_qty")
        )
    )


@register(
    "q19_disjunctive_filter_join",
    family="join",
    doc="TPC-H Q19 analogue: disjunctive multi-predicate filter join "
    "(brand × size-band × quantity-band OR-blocks).",
    oracle=f"""
SELECT CAST(SUM({SQL_REV}) AS DOUBLE) AS revenue, COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
""",
)
def q19_disjunctive_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond1 = (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    cond2 = (
        (F.col("p_brand") == "Brand#19")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .where(cond1 | cond2)
        .agg(
            F.sum(rev()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "set_union_all",
    family="setop",
    doc="UNION ALL (bag semantics, unlike set_union_distinct).",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION ALL
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s)


@register(
    "cross_join_small",
    family="join",
    doc="Explicit cross join of two tiny dimensions.",
    oracle="""
SELECT a.r_name AS region_a, b.r_name AS region_b
FROM region a CROSS JOIN region b
""",
)
def cross_join_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = table(spark, sf_dir, "region").select(F.col("r_name").alias("region_a"))
    b = table(spark, sf_dir, "region").select(F.col("r_name").alias("region_b"))
    return a.crossJoin(b)


@register(
    "scalar_conditional_battery",
    family="scalar",
    doc="coalesce / nullif / least / greatest / bit ops battery.",
    oracle="""
SELECT l_orderkey, l_linenumber,
       COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none,
       LEAST(l_quantity, 25.0) AS qty_capped,
       GREATEST(l_quantity, 10.0) AS qty_floored,
       l_orderkey & 255 AS key_low_byte,
       xor(l_orderkey, l_linenumber) AS key_xor
FROM lineitem
""",
)
def scalar_conditional_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
        F.least(F.col("l_quantity"), F.lit(25.0)).alias("qty_capped"),
        F.greatest(F.col("l_quantity"), F.lit(10.0)).alias("qty_floored"),
        F.col("l_orderkey").bitwiseAND(F.lit(255)).alias("key_low_byte"),
        F.col("l_orderkey")
        .bitwiseXOR(F.col("l_linenumber").cast("bigint"))
        .alias("key_xor"),
    )


@register(
    "explode_tokens",
    family="scalar",
    doc="explode/unnest: token frequencies over part names (lateral row "
    "expansion — the relational inverse of the flatten operator).",
    oracle="""
SELECT token, COUNT(*) AS n
FROM (SELECT UNNEST(string_split(p_name, ' ')) AS token FROM part)
GROUP BY token
""",
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split(F.col("p_name"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "date_arithmetic_battery",
    family="scalar",
    doc="add_months / date_add / last_day arithmetic.",
    oracle="""
SELECT o_orderkey,
       o_orderdate + INTERVAL 3 MONTH AS plus_3m,
       o_orderdate + INTERVAL 30 DAY AS plus_30d,
       CAST(LAST_DAY(o_orderdate) AS TIMESTAMP) AS month_end
FROM orders
""",
)
def date_arithmetic_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTH")).alias("plus_3m"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("plus_30d"),
        F.last_day("o_orderdate").cast("timestamp_ntz").alias("month_end"),
    )


@register(
    "events_sessionize",
    family="window",
    doc="Batch sessionization via gaps-and-islands (lag + cumulative flag); "
    "the streaming twin is streaming.events.session_windows.",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       MIN(ts) AS session_start, MAX(ts) AS session_end, COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
""",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    w_cum = Window.partitionBy("user_id").orderBy(F.col("ts").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prev = F.lag("ts").over(w)
    new_session = F.when(
        prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        e.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(w_cum).cast("bigint"))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
