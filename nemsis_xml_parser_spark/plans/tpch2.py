"""Remaining TPC-H analogues (Q2, Q4..Q22) adapted to the driver's reduced
schema (no ``partsupp``, no commit/receipt dates, no ship modes — see
TESTDATA.md).  Together with plans.tpch (Q1/3/5/6/10) and plans.families2
(Q14/18/19) this covers every TPC-H query shape expressible over the
available columns: EXISTS / NOT EXISTS (semi/anti with theta conditions),
left-outer histograms, correlated scalar subqueries, share-of-total, and
window-free argmax.

Scale notes (100 TB posture):

* Every plan filters fact tables BEFORE joining so parquet pushdown and
  partition pruning bound the scan.
* Dimension sides (nation, region, filtered part/supplier) are broadcast
  explicitly; customer/orders-sized sides are left to shuffled hash joins
  with AQE deciding broadcast at runtime when a filter makes them small.
* Scalar subqueries (q15 max, q17 per-part threshold, q22 avg balance)
  are computed as tiny aggregate DataFrames and broadcast-joined — one
  extra stage, no driver collect, no recompute per row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import register, table
from .tpch import SQL_REV, dec2, rev, ts


@register(
    "q4_order_priority_check",
    family="join",
    doc="TPC-H Q4 analogue: EXISTS rewritten as a theta left-semi join — "
    "orders in a quarter having at least one lineitem shipped after the "
    "order date, counted per priority (reference sets up only equi FK joins; "
    "this is the semi-join family over the same key shape).",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
)
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1996-04-01 00:00:00"))
    )
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q7_volume_shipping",
    family="join",
    doc="TPC-H Q7 analogue: bidirectional nation-pair trade volume by ship "
    "year; nation joined twice under aliases (self-join disambiguation).",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year, CAST(SUM(rev) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
         {SQL_REV} AS rev
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair = F.col("n1.n_name").isin("NATION_1", "NATION_2") & F.col(
        "n2.n_name"
    ).isin("NATION_1", "NATION_2") & (F.col("n1.n_name") != F.col("n2.n_name"))
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").alias("n1")
    n2 = table(spark, sf_dir, "nation").alias("n2")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2.n_nationkey"))
        .where(pair)
        .select(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").cast("int").alias("l_year"),
            rev().alias("rev"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("rev").cast("double").alias("revenue"))
    )


@register(
    "q8_market_share",
    family="agg",
    doc="TPC-H Q8 analogue: NATION_1's share of AMERICA-customer ECONOMY-part "
    "revenue per order year — conditional aggregate over an 8-way join, "
    "numerator as a null-skipping SUM(CASE) kept exact in decimal.",
    oracle=f"""
SELECT o_year,
       ROUND(COALESCE(CAST(SUM(CASE WHEN nation = 'NATION_1' THEN rev END) AS DOUBLE), 0.0)
             / CAST(SUM(rev) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
         {SQL_REV} AS rev,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
)
GROUP BY o_year
""",
)
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").alias("n1")
    n2 = table(spark, sf_dir, "nation").alias("n2")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    base = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2.n_nationkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            rev().alias("rev"),
            F.col("n2.n_name").alias("nation"),
        )
    )
    return base.groupBy("o_year").agg(
        F.round(
            F.coalesce(
                F.sum(F.when(F.col("nation") == "NATION_1", F.col("rev"))).cast(
                    "double"
                ),
                F.lit(0.0),
            )
            / F.sum("rev").cast("double"),
            6,
        ).alias("mkt_share")
    )


@register(
    "q9_product_type_profit",
    family="join",
    doc="TPC-H Q9 analogue (no partsupp → revenue stands in for profit): "
    "per supplier-nation per year revenue on parts whose name contains "
    "'gear', LIKE-filtered scan broadcast into the fact join.",
    oracle=f"""
SELECT nation, o_year, CAST(SUM(rev) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
         {SQL_REV} AS rev
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%gear%'
)
GROUP BY nation, o_year
""",
)
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            rev().alias("rev"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("rev").cast("double").alias("sum_profit"))
    )


@register(
    "q12_priority_by_linestatus",
    family="agg",
    doc="TPC-H Q12 analogue (no l_shipmode → l_linestatus buckets): "
    "high/low-priority order counts per line status for one ship year, "
    "conditional counts as null-skipping SUM(CASE).",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
""",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1998-01-01 00:00:00"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_order_distribution",
    family="join",
    doc="TPC-H Q13 analogue: left-outer join preserving order-less customers, "
    "then a second aggregation over the counts (orders-per-customer "
    "histogram) — the double-groupBy shape AQE handles with two exchanges.",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
""",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    family="agg",
    doc="TPC-H Q15 analogue: per-supplier quarterly revenue, keep supplier(s) "
    "equal to the max — scalar subquery as a broadcast single-row join; "
    "equality is exact because both engines compare the same decimal sums.",
    oracle=f"""
WITH rev_per_supp AS (
  SELECT l_suppkey, SUM({SQL_REV}) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier JOIN rev_per_supp ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM rev_per_supp)
""",
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1997-04-01 00:00:00"))
    )
    s = table(spark, sf_dir, "supplier")
    rev_per_supp = l.groupBy("l_suppkey").agg(F.sum(rev()).alias("total_rev"))
    max_rev = rev_per_supp.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev_per_supp.join(F.broadcast(max_rev), F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


@register(
    "q16_supplier_part_counts",
    family="agg",
    doc="TPC-H Q16 analogue (partsupp → lineitem as the part↔supplier "
    "bridge): distinct suppliers per (brand, size) for small non-PROMO parts "
    "excluding one brand — COUNT(DISTINCT) after a broadcast-filtered join.",
    oracle="""
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5' AND p_size <= 10 AND p_type <> 'PROMO'
GROUP BY p_brand, p_size
""",
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_size") <= 10)
        & (F.col("p_type") != "PROMO")
    )
    l = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    family="agg",
    doc="TPC-H Q17 analogue: correlated scalar subquery (20% of per-part "
    "average quantity) decorrelated into a per-part aggregate joined back to "
    "the fact — threshold computed with identical operation order in both "
    "engines so the < boundary agrees bit-for-bit.",
    oracle="""
WITH part_avg AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) * 0.2 AS qty_threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_rows
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN part_avg ON pk = l_partkey
WHERE p_brand = 'Brand#3' AND l_quantity < qty_threshold
""",
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    part_avg = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(dec2("l_quantity")).cast("double") / F.count(F.lit(1)) * 0.2
        ).alias("qty_threshold")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(part_avg, F.col("pk") == l.l_partkey)
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(dec2("l_extendedprice")).cast("double") / 7.0).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q21_last_shipper_multi_supplier",
    family="join",
    doc="TPC-H Q21 analogue (no receipt/commit dates): on orders served by "
    "≥2 distinct suppliers, the supplier(s) shipping last — per-order "
    "aggregate re-joined to lineitem, top-20 with full tie-break.",
    oracle="""
WITH per_order AS (
  SELECT l_orderkey AS ok, COUNT(DISTINCT l_suppkey) AS n_supp, MAX(l_shipdate) AS max_ship
  FROM lineitem GROUP BY l_orderkey
),
late AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN per_order p ON l.l_orderkey = p.ok
  WHERE p.n_supp >= 2 AND l.l_shipdate = p.max_ship
)
SELECT s_name, COUNT(*) AS numwait
FROM late JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
""",
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE wide shuffle: collect the distinct (shipdate, suppkey) pairs
    # per order (bounded — TPC-H orders carry <= 7 lineitems) and derive
    # n_supp / max_ship / last-shippers with higher-order functions,
    # instead of re-shuffling the whole lineitem fact a second time for
    # the per-order-aggregate join (the shape that scaled at 3.55x on
    # 10x data; this one removes the second fact shuffle entirely).
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    per_order = l.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.collect_set(
            F.struct(
                F.col("l_shipdate").alias("ship"),
                F.col("l_suppkey").alias("supp"),
            )
        ).alias("ps")
    )
    per_order = (
        per_order.withColumn(
            "n_supp",
            F.size(F.array_distinct(F.transform("ps", lambda x: x["supp"]))),
        )
        .withColumn("max_ship", F.array_max(F.transform("ps", lambda x: x["ship"])))
        .where(F.col("n_supp") >= 2)
    )
    late = per_order.select(
        "ok",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.filter("ps", lambda x: x["ship"] == F.col("max_ship")),
                    lambda x: x["supp"],
                )
            )
        ).alias("l_suppkey"),
    )
    return (
        late.join(F.broadcast(s), late.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


@register(
    "q22_dormant_high_balance",
    family="join",
    doc="TPC-H Q22 analogue: customers above the average positive balance "
    "with no orders since 2000 — scalar-subquery broadcast + left-anti join "
    "against a pushdown-filtered orders scan, grouped per nation.",
    oracle="""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS a
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
""",
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= ts("2000-01-01 00:00:00"))
        .select("o_custkey")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec2("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("a")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec2("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


@register(
    "q2_cheapest_supplier",
    family="join",
    doc="TPC-H Q2 analogue (no partsupp → lineitem as the part↔supplier "
    "bridge): per (part, supplier) exact average unit price, keep the "
    "supplier(s) at each part's minimum — min-per-group decorrelated into "
    "an aggregate join, deterministic top-100 by account balance.  "
    "Completes the TPC-H shape set: every query number 1-22 now has an "
    "analogue or a documented schema-gap adaptation.",
    oracle="""
WITH unit AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
best AS (
  SELECT l_partkey AS bk, MIN(avg_price) AS min_price FROM unit GROUP BY l_partkey
)
SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal,
       ROUND(u.avg_price, 6) AS unit_price
FROM part
JOIN unit u ON u.l_partkey = p_partkey
JOIN best b ON b.bk = p_partkey AND u.avg_price = b.min_price
JOIN supplier ON s_suppkey = u.l_suppkey
WHERE p_size = 15 AND p_type = 'SMALL'
ORDER BY s_acctbal DESC, p_partkey ASC, s_suppkey ASC
LIMIT 100
""",
)
def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    )
    s = table(spark, sf_dir, "supplier")
    unit = l.groupBy("l_partkey", "l_suppkey").agg(
        (F.sum(dec2("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias(
            "avg_price"
        )
    )
    best = unit.groupBy(F.col("l_partkey").alias("bk")).agg(
        F.min("avg_price").alias("min_price")
    )
    return (
        unit.join(F.broadcast(p), unit.l_partkey == p.p_partkey)
        .join(
            best,
            (F.col("bk") == F.col("p_partkey"))
            & (F.col("avg_price") == F.col("min_price")),
        )
        .join(F.broadcast(s), unit.l_suppkey == s.s_suppkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_suppkey",
            "s_name",
            "s_acctbal",
            F.round(F.col("avg_price"), 6).alias("unit_price"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), F.col("p_partkey").asc(), F.col("s_suppkey").asc()
        )
        .limit(100)
    )


@register(
    "q11_important_stock",
    family="agg",
    doc="TPC-H Q11 analogue (no partsupp table — see TESTDATA.md): stock "
    "value per part is adapted to shipped revenue per part for suppliers "
    "of one nation; keep parts whose value exceeds 1/1000 of the nation "
    "total.  Exercises the Q11 shape: semi-join-scoped aggregation plus a "
    "scalar-subquery threshold over the SAME aggregate, implemented as a "
    "1-row broadcast cross join (no driver collect, no recompute).  The "
    "threshold compare is value*1000 > total in exact decimals — "
    "deterministic in both engines (reference: query layer deferred to "
    "PG, README.md:119-127).",
    oracle=f"""
WITH natsupp AS (
  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
),
val AS (
  SELECT l_partkey AS partkey, SUM({SQL_REV}) AS value_dec
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM natsupp)
  GROUP BY l_partkey
)
SELECT partkey, CAST(value_dec AS DOUBLE) AS part_value
FROM val, (SELECT SUM(value_dec) AS total_dec FROM val) tot
WHERE value_dec * 1000 > total_dec
""",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    natsupp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    val = (
        l.join(F.broadcast(natsupp), l.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(rev()).alias("value_dec"))
    )
    tot = val.agg(F.sum("value_dec").alias("total_dec"))
    return (
        val.join(F.broadcast(tot))
        .where(F.col("value_dec") * 1000 > F.col("total_dec"))
        .select("partkey", F.col("value_dec").cast("double").alias("part_value"))
    )


@register(
    "q20_dominant_suppliers",
    family="join",
    doc="TPC-H Q20 analogue (no partsupp availqty — see TESTDATA.md): the "
    "'excess availability' predicate becomes supply dominance — suppliers "
    "who in 1997 shipped MORE than half of some 'small%' part's total "
    "shipped quantity.  Same nested shape as Q20: filtered part dim → "
    "per-(part,supplier) aggregate vs per-part aggregate threshold → "
    "DISTINCT qualifying suppliers → semi-join into supplier⋈nation.  "
    "qty*2 > tot in exact decimals keeps the compare deterministic.",
    oracle="""
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
  GROUP BY l_partkey, l_suppkey
),
parttot AS (
  SELECT l_partkey AS pk, SUM(qty) AS tot FROM shipped GROUP BY l_partkey
),
qualifying AS (
  SELECT DISTINCT s.l_suppkey AS qk
  FROM shipped s JOIN parttot t ON t.pk = s.l_partkey AND s.qty * 2 > t.tot
)
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT qk FROM qualifying)
""",
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    shipped = (
        l.where(
            (F.col("l_shipdate") >= ts("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < ts("1998-01-01 00:00:00"))
        )
        .join(F.broadcast(p), l.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec2("l_quantity")).alias("qty"))
    )
    parttot = shipped.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("qty").alias("tot")
    )
    qualifying = (
        shipped.join(
            parttot,
            (F.col("pk") == F.col("l_partkey")) & (F.col("qty") * 2 > F.col("tot")),
        )
        .select(F.col("l_suppkey").alias("qk"))
        .distinct()
    )
    return s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
        F.broadcast(qualifying), s.s_suppkey == F.col("qk"), "left_semi"
    ).select("s_suppkey", "s_name", "n_name")
