"""Operator-family battery (SURVEY §2.I gap list → rebuild targets).

One oracle-checked query per operator family the reference defers to its
warehouse: filter/project, the join family (inner/left/semi/anti/
broadcast/range), agg + distinct agg, rollup/cube/grouping sets, windows
(rank/running/lag), top-k per group, sort/limit, set ops, scalar
string/date/math/json batteries, and conditional logic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import register, table
from .tpch import dec2, rate, rev, ts

# ---------------------------------------------------------------- projections


@register(
    "filter_project",
    family="filter",
    doc="Predicate + column pruning — both reach the parquet scan (C-group).",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_quantity > 45 AND l_returnflag = 'N'
""",
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.where((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "N")).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


# --------------------------------------------------------------------- joins


@register(
    "join_inner",
    family="join",
    doc="Shuffled equi-join (F1 parent↔child analogue).",
    oracle="""
SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderstatus = 'F'
""",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "join_left_outer",
    family="join",
    doc="Left outer join + null-aware aggregate (customers incl. orderless).",
    oracle="""
SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec2("o_totalprice")), F.lit(0).cast("decimal(12,2)"))
            .cast("double")
            .alias("total_spent"),
        )
    )


@register(
    "join_semi",
    family="join",
    doc="Left-semi join (EXISTS): customers having at least one urgent order.",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    family="join",
    doc="Left-anti join (NOT EXISTS) — same primitive as the lake-side orphan/FK check (SURVEY B4).",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_broadcast_decode",
    family="join",
    doc="Broadcast decode-join against a dimension (F2 ElementDefinitions analogue).",
    oracle="""
SELECT n_nationkey, n_name, r_name AS region_name
FROM nation JOIN region ON n_regionkey = r_regionkey
""",
)
def join_broadcast_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", F.col("r_name").alias("region_name")
    )


@register(
    "join_range_band",
    family="join",
    doc="Non-equi (range) join of lineitem quantities into static bands.",
    oracle="""
SELECT b.band_name, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS band_price
FROM lineitem l
JOIN (VALUES ('low', 0, 17), ('mid', 17, 34), ('high', 34, 51))
     AS b(band_name, lo, hi)
  ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
GROUP BY b.band_name
""",
)
def join_range_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    bands = table(spark, sf_dir, "lineitem").sparkSession.createDataFrame(
        [("low", 0, 17), ("mid", 17, 34), ("high", 34, 51)],
        "band_name string, lo int, hi int",
    )
    return (
        l.join(
            F.broadcast(bands),
            (l.l_quantity >= bands.lo) & (l.l_quantity < bands.hi),
        )
        .groupBy("band_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(dec2("l_extendedprice")).cast("double").alias("band_price"),
        )
    )


# ---------------------------------------------------------------- aggregates


@register(
    "agg_groupby_multi",
    family="agg",
    doc="Multi-key hash aggregate with min/max/count (partial+final via Catalyst).",
    oracle="""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty,
       MIN(l_shipdate) AS first_ship,
       MAX(l_shipdate) AS last_ship
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def agg_groupby_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@register(
    "agg_count_distinct",
    family="agg",
    doc="Distinct aggregate (expand+two-phase in Spark).",
    oracle="""
SELECT c_mktsegment,
       COUNT(DISTINCT o_custkey) AS n_buyers,
       COUNT(DISTINCT o_orderpriority) AS n_priorities,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_buyers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "agg_variance_manual",
    family="agg",
    doc="Variance via exact decimal moments (engine-neutral, unlike builtin stddev's float accumulation).",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s1,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s2,
       ROUND((CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
              - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
             / (COUNT(*) - 1), 4) AS var_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_variance_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    s1 = F.sum(dec2("l_quantity")).cast("double")
    s2 = F.sum(dec2("l_quantity") * dec2("l_quantity")).cast("double")
    return l.groupBy("l_returnflag").agg(
        n.alias("n"),
        s1.alias("s1"),
        s2.alias("s2"),
        F.round((s2 - s1 * s1 / n) / (n - F.lit(1)), 4).alias("var_qty"),
    )


@register(
    "agg_approx_distinct",
    family="agg",
    doc="approx_count_distinct (HLL) — sketch differs per engine, so rows-only check; "
    "exactness cross-checked in tests against countDistinct.",
    oracle=None,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.count(F.lit(1)).alias("n"),
    )


# ------------------------------------------------- rollup / cube / grouping


@register(
    "rollup_agg",
    family="grouping_sets",
    doc="ROLLUP hierarchy totals (df.rollup).",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"),
    )


@register(
    "cube_agg",
    family="grouping_sets",
    doc="CUBE over two dimensions (df.cube).",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


@register(
    "grouping_sets_agg",
    family="grouping_sets",
    doc="Explicit GROUPING SETS via Spark SQL.",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# ------------------------------------------------------------------ windows


@register(
    "window_rank_orders",
    family="window",
    doc="rank() per customer by order value; top-3 kept.",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price,
         RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders
) WHERE rnk <= 3
""",
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            dec2("o_totalprice").cast("double").alias("price"),
            F.rank().over(w).alias("rnk"),
        )
        .where(F.col("rnk") <= 3)
    )


@register(
    "window_running_total",
    family="window",
    doc="Running total per customer over order time (exact decimal accumulation).",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
""",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec2("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@register(
    "window_lag_gap",
    family="window",
    doc="lag(): days between consecutive orders of a customer.",
    oracle="""
SELECT o_custkey, o_orderkey,
       DATEDIFF('day',
                LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
                o_orderdate) AS days_since_prev
FROM orders
""",
)
def window_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("bigint")
        .alias("days_since_prev"),
    )


@register(
    "topk_per_group",
    family="window",
    doc="Per-group top-k via row_number (the scalable per-group limit).",
    oracle="""
SELECT * FROM (
  SELECT c_mktsegment, c_custkey,
         CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
  FROM customer
) WHERE rn <= 5
""",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            dec2("c_acctbal").cast("double").alias("acctbal"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 5)
    )


# -------------------------------------------------------------- sort / limit


@register(
    "sort_limit_topn",
    family="sort",
    doc="Global deterministic top-N (TakeOrderedAndProject — no full sort at scale).",
    oracle="""
SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 15
""",
)
def sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", dec2("o_totalprice").cast("double").alias("price"), "o_orderdate")
        .orderBy(F.col("price").desc(), F.col("o_orderkey").asc())
        .limit(15)
    )


# ------------------------------------------------------------------- set ops


@register(
    "set_union_distinct",
    family="setop",
    doc="UNION (distinct) of customer and supplier nation keys.",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "set_intersect",
    family="setop",
    doc="INTERSECT of customer and supplier nation keys.",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except",
    family="setop",
    doc="EXCEPT: nations with customers but no suppliers.",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


# ------------------------------------------------------------ scalar battery


@register(
    "scalar_string_battery",
    family="scalar",
    doc="String fn battery: upper/lower/substring/concat/length/replace/regexp_extract.",
    oracle="""
SELECT p_partkey,
       UPPER(p_brand) AS brand_upper,
       LOWER(p_type) AS type_lower,
       SUBSTRING(p_name, 1, 8) AS name_prefix,
       LENGTH(p_name) AS name_len,
       CONCAT(p_brand, ':', p_type) AS brand_type,
       REPLACE(p_type, ' ', '_') AS type_snake,
       REGEXP_EXTRACT(p_type, '^([A-Z]+)', 1) AS type_first_word
FROM part
""",
)
def scalar_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.regexp_extract("p_type", "^([A-Z]+)", 1).alias("type_first_word"),
    )


@register(
    "scalar_date_battery",
    family="scalar",
    doc="Date fn battery: year/month/day, date_trunc, datediff vs epoch of dataset.",
    oracle="""
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS INT) AS order_year,
       CAST(MONTH(o_orderdate) AS INT) AS order_month,
       CAST(DAY(o_orderdate) AS INT) AS order_day,
       DATE_TRUNC('month', o_orderdate) AS order_month_start,
       DATEDIFF('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_1995
FROM orders
""",
)
def scalar_date_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("order_month_start"),
        F.datediff(F.col("o_orderdate"), ts("1995-01-01 00:00:00"))
        .cast("bigint")
        .alias("days_since_1995"),
    )


@register(
    "scalar_math_battery",
    family="scalar",
    doc="Math fn battery: exact decimal arithmetic, mod, abs, floor/ceil, sqrt.",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS net_price,
       l_orderkey % 7 AS key_mod,
       CAST(ABS(CAST(l_quantity AS DECIMAL(12,2)) - 25) AS DOUBLE) AS qty_dev,
       CAST(FLOOR(l_quantity / 10) AS BIGINT) AS qty_decile,
       ROUND(SQRT(l_quantity), 6) AS qty_sqrt
FROM lineitem
""",
)
def scalar_math_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        rev().cast("double").alias("net_price"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.abs(dec2("l_quantity") - F.lit(25).cast("decimal(12,2)")).cast("double").alias("qty_dev"),
        F.floor(F.col("l_quantity") / 10).cast("bigint").alias("qty_decile"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
    )


@register(
    "json_extract_events",
    family="scalar",
    doc="JSON extraction from events.props + grouped aggregate (SURVEY §2.I json row).",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events
GROUP BY event_type
""",
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "case_when_bands",
    family="scalar",
    doc="Conditional logic (CASE WHEN) bucketing + aggregate.",
    oracle="""
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            ELSE 'large' END AS price_band,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS band_total
FROM orders
GROUP BY 1
""",
)
def case_when_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return (
        o.select(band.alias("price_band"), "o_totalprice")
        .groupBy("price_band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec2("o_totalprice")).cast("double").alias("band_total"),
        )
    )


@register(
    "events_hourly_rollup",
    family="agg",
    doc="Batch tumbling-window analogue: hourly event rollup (streaming twin in streaming/events.py).",
    oracle="""
SELECT DATE_TRUNC('hour', ts) AS hour_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


@register(
    "agg_corr_manual",
    family="agg",
    doc="Pearson correlation via exact decimal moments (sx, sy, sxy, sxx, "
    "syy summed as DECIMAL — order-independent — then one identical "
    "double expression on both engines; builtin corr() accumulates in "
    "float and is not reproducible across engines/partitionings).",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       ROUND((COUNT(*) * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
              - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE))
             / SQRT((COUNT(*) * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                     - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                       * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE))
                    * (COUNT(*) * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                       - CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                         * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE))), 6)
         AS corr_qty_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_corr_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    sx = F.sum(dec2("l_quantity")).cast("double")
    sy = F.sum(dec2("l_extendedprice")).cast("double")
    sxy = F.sum(dec2("l_quantity") * dec2("l_extendedprice")).cast("double")
    sxx = F.sum(dec2("l_quantity") * dec2("l_quantity")).cast("double")
    syy = F.sum(dec2("l_extendedprice") * dec2("l_extendedprice")).cast("double")
    return l.groupBy("l_returnflag").agg(
        n.alias("n"),
        F.round(
            (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6
        ).alias("corr_qty_price"),
    )


@register(
    "agg_regression_battery",
    family="agg",
    doc="Covariance / least-squares regression battery over exact decimal "
    "moments (the agg_corr_manual pattern extended): covar_pop, "
    "covar_samp, regr_slope, regr_intercept and r² of extendedprice on "
    "quantity per returnflag.  The five moments (sx, sy, sxy, sxx, syy) "
    "are summed as DECIMAL — order-independent across partitionings — "
    "then every statistic is ONE identical double expression on both "
    "engines (intercept in closed form (sy·sxx − sx·sxy)/(n·sxx − sx²), "
    "never via a chained slope reference; builtin covar_*/regr_* "
    "accumulate in float and are not reproducible across engines).  "
    "Scale: one hash aggregate, map-side partials, no second pass.",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       ROUND((COUNT(*) * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
              - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE))
             / (CAST(COUNT(*) AS DOUBLE) * COUNT(*)), 6) AS covar_pop_qp,
       ROUND((COUNT(*) * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
              - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE))
             / (CAST(COUNT(*) AS DOUBLE) * (COUNT(*) - 1)), 6) AS covar_samp_qp,
       ROUND((COUNT(*) * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
              - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE))
             / (COUNT(*) * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                  * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)), 6) AS regr_slope_pq,
       ROUND((CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
              - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE))
             / (COUNT(*) * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                  * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)), 6) AS regr_intercept_pq,
       ROUND(((COUNT(*) * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                 * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE))
              * (COUNT(*) * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                 - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                   * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)))
             / ((COUNT(*) * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                 - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                   * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE))
                * (COUNT(*) * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                   - CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                     * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE))), 6) AS r2_pq
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_regression_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    sx = F.sum(dec2("l_quantity")).cast("double")
    sy = F.sum(dec2("l_extendedprice")).cast("double")
    sxy = F.sum(dec2("l_quantity") * dec2("l_extendedprice")).cast("double")
    sxx = F.sum(dec2("l_quantity") * dec2("l_quantity")).cast("double")
    syy = F.sum(dec2("l_extendedprice") * dec2("l_extendedprice")).cast("double")
    cov_num = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    return l.groupBy("l_returnflag").agg(
        n.alias("n"),
        F.round(cov_num / (n.cast("double") * n), 6).alias("covar_pop_qp"),
        F.round(cov_num / (n.cast("double") * (n - 1)), 6).alias("covar_samp_qp"),
        F.round(cov_num / var_x, 6).alias("regr_slope_pq"),
        F.round((sy * sxx - sx * sxy) / var_x, 6).alias("regr_intercept_pq"),
        F.round((cov_num * cov_num) / (var_x * var_y), 6).alias("r2_pq"),
    )


@register(
    "agg_histogram_fixed_bins",
    family="agg",
    doc="Fixed-width histogram (width_bucket semantics): l_extendedprice "
    "into 10 equal bins over [0, 60000) per returnflag, out-of-range "
    "clamped to the edge bins.  The profiling primitive behind "
    "distribution drift checks; one hash aggregate, bin id computed "
    "map-side with integer arithmetic (identical FLOOR expression both "
    "engines).",
    oracle="""
SELECT l_returnflag,
       CAST(LEAST(GREATEST(FLOOR(l_extendedprice / 6000.0), 0), 9) AS BIGINT)
         AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY 1, 2
""",
)
def agg_histogram_fixed_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    bin_id = F.least(
        F.greatest(F.floor(F.col("l_extendedprice") / 6000.0), F.lit(0)),
        F.lit(9),
    ).cast("bigint")
    return l.groupBy("l_returnflag", bin_id.alias("bin")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"),
    )


@register(
    "quality_expectations_audit",
    family="etl",
    doc="Declarative data-quality expectations in ONE aggregate pass "
    "(the Deequ/expectations pattern): completeness (non-null rate), "
    "domain membership, value ranges, and cross-column rules over "
    "lineitem, emitted as one row per rule via stack() so downstream "
    "alerting joins on rule_name.  Referential integrity (orphan "
    "orderkeys) rides the same result as an anti-join count.  Scale: "
    "every rule is a conditional SUM in a single scan — adding a rule "
    "adds zero passes; the RI check is one broadcast-free semi-join.",
    oracle="""
WITH base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS total,
         CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS null_shipdate,
         CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END)
              AS BIGINT) AS bad_returnflag,
         CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)
              AS BIGINT) AS bad_quantity,
         CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END)
              AS BIGINT) AS bad_discount,
         CAST(SUM(CASE WHEN l_tax < 0 OR l_tax > 0.08 THEN 1 ELSE 0 END)
              AS BIGINT) AS bad_tax
  FROM lineitem
),
orphans AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
)
SELECT rule_name, n_violations, total_rows FROM (
  SELECT 'shipdate_not_null' AS rule_name, null_shipdate AS n_violations,
         total AS total_rows FROM base
  UNION ALL
  SELECT 'returnflag_in_domain', bad_returnflag, total FROM base
  UNION ALL
  SELECT 'quantity_in_range', bad_quantity, total FROM base
  UNION ALL
  SELECT 'discount_in_range', bad_discount, total FROM base
  UNION ALL
  SELECT 'tax_in_range', bad_tax, total FROM base
  UNION ALL
  SELECT 'orderkey_ri', o.n, b.total FROM orphans o, base b
)
""",
)
def quality_expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")

    def viol(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    base = l.agg(
        F.count(F.lit(1)).alias("total"),
        viol(F.col("l_shipdate").isNull()).alias("shipdate_not_null"),
        viol(~F.col("l_returnflag").isin("A", "N", "R")).alias(
            "returnflag_in_domain"
        ),
        viol((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).alias(
            "quantity_in_range"
        ),
        viol((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).alias(
            "discount_in_range"
        ),
        viol((F.col("l_tax") < 0) | (F.col("l_tax") > 0.08)).alias(
            "tax_in_range"
        ),
    )
    orphans = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("orderkey_ri"))
    )
    wide = base.crossJoin(F.broadcast(orphans))
    rules = [
        "shipdate_not_null", "returnflag_in_domain", "quantity_in_range",
        "discount_in_range", "tax_in_range", "orderkey_ri",
    ]
    stack_expr = ", ".join(f"'{r}', {r}" for r in rules)
    return wide.select(
        F.expr(
            f"stack({len(rules)}, {stack_expr}) AS (rule_name, n_violations)"
        ),
        F.col("total").alias("total_rows"),
    )


@register(
    "agg_weighted_median",
    family="agg",
    doc="Exact weighted median (and p25/p75 weighted quantiles) of "
    "l_extendedprice weighted by l_quantity, per returnflag — the "
    "robust-stats positional selection plain percentile_cont cannot "
    "express (each row counts quantity times).  Lower weighted quantile: "
    "the smallest value whose running weight reaches q * total, via one "
    "cumulative-sum window over the per-value aggregate and a min-filter "
    "— identical selection rule on both engines, exact DECIMAL weights.  "
    "Scale: the per-value pre-aggregate bounds the window input to "
    "distinct values per group.",
    oracle="""
WITH vals AS (
  SELECT l_returnflag AS flag, l_extendedprice AS val,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS w
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT flag, val, w,
         SUM(w) OVER (PARTITION BY flag ORDER BY val ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(w) OVER (PARTITION BY flag) AS tw
  FROM vals
)
SELECT flag AS l_returnflag,
       CAST(MIN(CASE WHEN CAST(cw AS DOUBLE) >= 0.25 * CAST(tw AS DOUBLE)
                     THEN val END) AS DOUBLE) AS wp25,
       CAST(MIN(CASE WHEN CAST(cw AS DOUBLE) >= 0.50 * CAST(tw AS DOUBLE)
                     THEN val END) AS DOUBLE) AS wmedian,
       CAST(MIN(CASE WHEN CAST(cw AS DOUBLE) >= 0.75 * CAST(tw AS DOUBLE)
                     THEN val END) AS DOUBLE) AS wp75
FROM cum
GROUP BY flag
""",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    vals = l.groupBy(
        F.col("l_returnflag").alias("flag"), F.col("l_extendedprice").alias("val")
    ).agg(F.sum(dec2("l_quantity")).cast("decimal(18,2)").alias("w"))
    wc = Window.partitionBy("flag").orderBy(F.col("val").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy("flag")
    cum = vals.select(
        "flag",
        "val",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(wt).alias("tw"),
    )

    def wq(q):
        return F.min(
            F.when(
                F.col("cw").cast("double") >= q * F.col("tw").cast("double"),
                F.col("val"),
            )
        ).cast("double")

    return cum.groupBy(F.col("flag").alias("l_returnflag")).agg(
        wq(0.25).alias("wp25"), wq(0.50).alias("wmedian"), wq(0.75).alias("wp75")
    )


@register(
    "join_scd2_point_in_time",
    family="join",
    doc="Slowly-changing-dimension type 2, built and probed in one query: "
    "a per-customer change log (the day's last order priority, "
    "deduplicated per date) becomes validity intervals via lead() over "
    "the date sequence — [valid_from, valid_to), last interval open — "
    "and each order is then joined to the version valid 30 days BEFORE "
    "it was placed (the as-of-the-past lookup every feature-engineering "
    "pipeline needs to avoid label leakage).  Probes before a "
    "customer's first change resolve to 'none' via the left join.  "
    "Scale: interval build is one lag-free window per customer; the "
    "point-in-time join is equi on custkey with a range residual — "
    "sort-merge, no cartesian.",
    oracle="""
WITH day_last AS (
  SELECT o_custkey AS ck, o_orderdate AS d, MAX(o_orderpriority) AS prio
  FROM orders GROUP BY 1, 2
),
intervals AS (
  SELECT ck, prio, d AS valid_from,
         LEAD(d) OVER (PARTITION BY ck ORDER BY d ASC) AS valid_to
  FROM day_last
),
probes AS (
  SELECT o_orderkey AS k, o_custkey AS ck, o_orderstatus AS status,
         o_orderdate - INTERVAL 30 DAY AS asof_d
  FROM orders
)
SELECT COALESCE(i.prio, 'none') AS priority_30d_before,
       p.status AS o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT p.ck) AS BIGINT) AS n_customers
FROM probes p
LEFT JOIN intervals i
  ON i.ck = p.ck AND p.asof_d >= i.valid_from
 AND (i.valid_to IS NULL OR p.asof_d < i.valid_to)
GROUP BY 1, 2
""",
)
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    day_last = o.groupBy(
        F.col("o_custkey").alias("ck"), F.col("o_orderdate").alias("d")
    ).agg(F.max("o_orderpriority").alias("prio"))
    w = Window.partitionBy("ck").orderBy(F.col("d").asc())
    intervals = day_last.select(
        "ck",
        "prio",
        F.col("d").alias("valid_from"),
        F.lead("d").over(w).alias("valid_to"),
    )
    probes = o.select(
        F.col("o_custkey").alias("pck"),
        F.col("o_orderstatus").alias("o_orderstatus"),
        F.date_sub(F.col("o_orderdate"), 30).alias("asof_d"),
    )
    cond = (
        (F.col("ck") == F.col("pck"))
        & (F.col("asof_d") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("asof_d") < F.col("valid_to")))
    )
    return (
        probes.join(intervals, cond, "left")
        .groupBy(
            F.coalesce(F.col("prio"), F.lit("none")).alias("priority_30d_before"),
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("pck").alias("n_customers"),
        )
    )


@register(
    "scalar_bitwise_battery",
    family="scalar",
    doc="Bitwise expression battery — the codegen-side primitives the "
    "hash/sketch family builds on (simhash chunks, LSH band masks, "
    "Z-order interleave): AND/OR/XOR, shifts, popcount (bit_count), and "
    "a mask-extract roundtrip, all over deterministic integer columns "
    "and aggregated so the result is compact.  Identical two's-"
    "complement semantics asserted across engines.",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(xor(l_orderkey, l_partkey) % 1000) AS BIGINT) AS sum_xor_mod,
       CAST(SUM(l_orderkey & 255) AS BIGINT) AS sum_and_mask,
       CAST(SUM(l_orderkey | 15) % 1000000007 AS BIGINT) AS sum_or_mod,
       CAST(SUM((l_orderkey << 3) % 4096) AS BIGINT) AS sum_shl_mod,
       CAST(SUM(l_orderkey >> 2) % 1000000007 AS BIGINT) AS sum_shr_mod,
       CAST(SUM(bit_count(CAST(l_orderkey AS BIGINT))) AS BIGINT) AS sum_popcount
FROM lineitem
GROUP BY l_returnflag
""",
)
def scalar_bitwise_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    p = F.col("l_partkey")
    return l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k.bitwiseXOR(p) % 1000).cast("bigint").alias("sum_xor_mod"),
        F.sum(k.bitwiseAND(F.lit(255))).cast("bigint").alias("sum_and_mask"),
        (F.sum(k.bitwiseOR(F.lit(15))) % 1000000007)
        .cast("bigint")
        .alias("sum_or_mod"),
        F.sum(F.shiftleft(k, 3) % 4096).cast("bigint").alias("sum_shl_mod"),
        (F.sum(F.shiftright(k, 2)) % 1000000007)
        .cast("bigint")
        .alias("sum_shr_mod"),
        F.sum(F.bit_count(k.cast("bigint"))).cast("bigint").alias("sum_popcount"),
    )


@register(
    "agg_argmax_battery",
    family="agg",
    doc="Argmax/argmin semantics per group — 'the value of column A at "
    "the row where B is extreme', with deterministic tie-breaks encoded "
    "as struct ordering (max of (B, tiebreak, A) structs) rather than "
    "engine-specific max_by, whose tie behavior differs between Spark "
    "and DuckDB: per returnflag, the orderkey and quantity of the "
    "highest-priced lineitem and the shipdate of the earliest-shipped "
    "one.  One hash aggregate, no window, no self-join.",
    oracle="""
SELECT l_returnflag,
       CAST(MAX(ROW(l_extendedprice, l_orderkey))[2] AS BIGINT)
         AS top_price_orderkey,
       CAST(MAX(ROW(l_extendedprice, l_orderkey, l_quantity))[3]
            AS DOUBLE) AS top_price_qty,
       CAST(MAX(l_extendedprice) AS DOUBLE) AS top_price,
       strftime(CAST(MIN(ROW(l_shipdate, l_orderkey))[1] AS DATE), '%Y-%m-%d')
         AS first_ship_date
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_argmax_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.max(F.struct("l_extendedprice", "l_orderkey"))["l_orderkey"]
        .cast("bigint")
        .alias("top_price_orderkey"),
        F.max(F.struct("l_extendedprice", "l_orderkey", "l_quantity"))["l_quantity"]
        .cast("double")
        .alias("top_price_qty"),
        F.max("l_extendedprice").cast("double").alias("top_price"),
        F.date_format(
            F.min(F.struct("l_shipdate", "l_orderkey"))["l_shipdate"], "yyyy-MM-dd"
        ).alias("first_ship_date"),
    )


@register(
    "agg_skewness_kurtosis",
    family="agg",
    doc="Third and fourth standardized moments per returnflag from exact "
    "decimal power sums (s1..s4) — skewness and excess kurtosis with "
    "the same engine-reproducibility contract as agg_variance_manual/"
    "agg_corr_manual (builtin skewness()/kurtosis() accumulate in float "
    "and drift across partitionings): every moment is summed as DECIMAL "
    "then ONE identical double expression computes m2/m3/m4 and the "
    "standardized ratios.  One hash aggregate, map-side partials.",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND((CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
              - 3 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
                  * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
              + 2 * POW(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 3))
             / POW(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
                   - POW(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 2), 1.5), 6)
         AS skewness_qty,
       ROUND((CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
              - 4 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
                  * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
              + 6 * POW(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 2)
                  * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
              - 3 * POW(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 4))
             / POW(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
                   - POW(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 2), 2) - 3, 6)
         AS excess_kurtosis_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_skewness_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    q = dec2("l_quantity")
    m1 = F.sum(q).cast("double") / n
    m2r = F.sum(q * q).cast("double") / n
    m3r = F.sum(q * q * q).cast("double") / n
    m4r = F.sum(q * q * q * q).cast("double") / n
    var = m2r - F.pow(m1, 2)
    skew = (m3r - 3 * m1 * m2r + 2 * F.pow(m1, 3)) / F.pow(var, 1.5)
    kurt = (m4r - 4 * m1 * m3r + 6 * F.pow(m1, 2) * m2r - 3 * F.pow(m1, 4)) / F.pow(
        var, 2
    ) - 3
    return l.groupBy("l_returnflag").agg(
        n.alias("n"),
        F.round(skew, 6).alias("skewness_qty"),
        F.round(kurt, 6).alias("excess_kurtosis_qty"),
    )


@register(
    "agg_benford_digit_audit",
    family="etl",
    doc="Benford first-digit audit — the forensic data-quality check for "
    "fabricated or truncated numeric columns: observed first-significant-"
    "digit distribution of o_totalprice vs the Benford expectation "
    "log10(1 + 1/d), with per-digit deviation and a chi-square-style "
    "contribution.  First digit extracted arithmetically "
    "(value / 10^floor(log10(value))) — no string round-trip.  One "
    "scan, one 9-row aggregate.",
    oracle="""
WITH digits AS (
  SELECT CAST(FLOOR(o_totalprice / POW(10, FLOOR(LOG10(o_totalprice))))
              AS BIGINT) AS d
  FROM orders WHERE o_totalprice > 0
),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM digits)
SELECT d AS digit,
       CAST(COUNT(*) AS BIGINT) AS n_obs,
       ROUND(COUNT(*) / (SELECT n FROM tot), 6) AS p_obs,
       ROUND(LOG10(1 + 1.0 / d), 6) AS p_benford,
       ROUND(COUNT(*) / (SELECT n FROM tot) - LOG10(1 + 1.0 / d), 6)
         AS deviation,
       ROUND(POW(COUNT(*) / (SELECT n FROM tot) - LOG10(1 + 1.0 / d), 2)
             / LOG10(1 + 1.0 / d), 6) AS chi2_term
FROM digits
GROUP BY d
""",
)
def agg_benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    d = F.floor(
        F.col("o_totalprice") / F.pow(10, F.floor(F.log10("o_totalprice")))
    ).cast("bigint")
    digits = o.select(d.alias("digit"))
    tot = digits.agg(F.count(F.lit(1)).cast("double").alias("n"))
    p_obs = F.count(F.lit(1)) / F.col("n")
    p_ben = F.log10(1 + 1.0 / F.col("digit"))
    return (
        digits.crossJoin(F.broadcast(tot))
        .groupBy("digit", "n")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.round(p_obs, 6).alias("p_obs"),
            F.round(p_ben, 6).alias("p_benford"),
            F.round(p_obs - p_ben, 6).alias("deviation"),
            F.round(F.pow(p_obs - p_ben, 2) / p_ben, 6).alias("chi2_term"),
        )
        .drop("n")
        .select("digit", "n_obs", "p_obs", "p_benford", "deviation", "chi2_term")
    )


@register(
    "join_prorate_quarters",
    family="join",
    doc="Temporal proration — splitting a value across the calendar "
    "periods an interval overlaps (revenue recognition, capacity "
    "accounting): each order opens a 90-day service window and its "
    "total is prorated across 1995 quarters by exact overlap-day "
    "count, overlap = greatest(0, least(ends) - greatest(starts) + 1) "
    "against a generated quarter spine.  The join is a range predicate "
    "against a 4-row broadcast dimension; proration shares are exact "
    "integer-day ratios applied to DECIMAL totals.",
    oracle="""
WITH quarters AS (
  SELECT q,
         CAST('1995-01-01' AS DATE) + INTERVAL (3 * (q - 1)) MONTH AS q_start,
         CAST('1995-01-01' AS DATE) + INTERVAL (3 * q) MONTH - INTERVAL 1 DAY
           AS q_end
  FROM UNNEST(range(1, 5)) AS t(q)
),
svc AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(o_totalprice AS DECIMAL(12,2)) AS total,
         CAST(o_orderdate AS DATE) AS s_start,
         CAST(o_orderdate AS DATE) + INTERVAL 89 DAY AS s_end
  FROM orders
  WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1994-10-03' AND DATE '1995-12-31'
),
overlap AS (
  SELECT s.o_orderstatus, q.q,
         GREATEST(0, date_diff('day',
             GREATEST(s.s_start, q.q_start),
             LEAST(s.s_end, q.q_end)) + 1) AS o_days,
         s.total
  FROM svc s JOIN quarters q
    ON s.s_start <= q.q_end AND s.s_end >= q.q_start
)
SELECT o_orderstatus, CAST(q AS INTEGER) AS quarter,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o_days) AS BIGINT) AS sum_overlap_days,
       ROUND(CAST(SUM(total * o_days / 90) AS DOUBLE), 2) AS prorated_revenue
FROM overlap
WHERE o_days > 0
GROUP BY o_orderstatus, q
""",
)
def join_prorate_quarters(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    quarters = (
        spark.range(1, 5)
        .withColumnRenamed("id", "q")
        .select(
            "q",
            F.add_months(F.lit("1995-01-01").cast("date"),
                         (3 * (F.col("q") - 1)).cast("int")).alias("q_start"),
            F.date_sub(
                F.add_months(F.lit("1995-01-01").cast("date"),
                             (3 * F.col("q")).cast("int")), 1
            ).alias("q_end"),
        )
    )
    svc = o.where(
        F.col("o_orderdate").cast("date").between("1994-10-03", "1995-12-31")
    ).select(
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(12,2)").alias("total"),
        F.col("o_orderdate").cast("date").alias("s_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 89).alias("s_end"),
    )
    joined = svc.join(
        F.broadcast(quarters),
        (F.col("s_start") <= F.col("q_end")) & (F.col("s_end") >= F.col("q_start")),
    )
    o_days = F.greatest(
        F.lit(0),
        F.datediff(
            F.least(F.col("s_end"), F.col("q_end")),
            F.greatest(F.col("s_start"), F.col("q_start")),
        )
        + 1,
    )
    return (
        joined.select("o_orderstatus", "q", "total", o_days.alias("o_days"))
        .where(F.col("o_days") > 0)
        .groupBy("o_orderstatus", F.col("q").cast("int").alias("quarter"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_days").cast("bigint").alias("sum_overlap_days"),
            F.round(
                F.sum(F.col("total") * F.col("o_days") / 90).cast("double"), 2
            ).alias("prorated_revenue"),
        )
    )


@register(
    "agg_gini_concentration",
    family="agg",
    doc="Gini concentration of order value per market segment — the "
    "inequality measure behind 'whale' analyses (revenue concentration, "
    "corpus-source dominance; pairs with curation_pareto_coverage): "
    "G = (2·Σ i·xᵢ) / (n·Σ xᵢ) − (n+1)/n over values ranked ascending "
    "with full tie-breaks.  Rank weights are exact integers, value sums "
    "exact DECIMAL, one identical double expression at the end.  One "
    "join + one rank window per segment partition.",
    oracle="""
WITH j AS (
  SELECT c.c_mktsegment AS seg, CAST(o.o_totalprice AS DECIMAL(12,2)) AS x,
         o.o_orderkey AS k
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
ranked AS (
  SELECT seg, x,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY x ASC, k ASC) AS i
  FROM j
)
SELECT seg AS c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(CAST(SUM(x) AS DOUBLE) AS DOUBLE) AS total_value,
       ROUND(2.0 * CAST(SUM(x * i) AS DOUBLE)
             / (COUNT(*) * CAST(SUM(x) AS DOUBLE))
             - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
FROM ranked
GROUP BY seg
""",
)
def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    j = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("x"),
        F.col("o_orderkey").alias("k"),
    )
    w = Window.partitionBy("seg").orderBy(F.col("x").asc(), F.col("k").asc())
    ranked = j.withColumn("i", F.row_number().over(w))
    n = F.count(F.lit(1))
    sx = F.sum("x").cast("double")
    sxi = F.sum(F.col("x") * F.col("i")).cast("double")
    return ranked.groupBy(F.col("seg").alias("c_mktsegment")).agg(
        n.alias("n_orders"),
        sx.alias("total_value"),
        F.round(2.0 * sxi / (n * sx) - (n + 1.0) / n, 6).alias("gini"),
    )
