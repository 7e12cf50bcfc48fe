"""Headline analytic queries (TPC-H analogues over the driver tables).

These are the bench.py headliners.  Plans are written so Catalyst gets the
good physical strategy for free at 100 TB:

* filters applied before joins → parquet pushdown + partition pruning;
* dimension sides broadcast (region/nation/supplier explicitly; AQE
  converts others at runtime when under threshold);
* aggregates are partial-final hash aggregates (map-side combine) because
  they are plain groupBy().agg();
* top-k = orderBy + limit → Spark's TakeOrderedAndProject (no full sort).

Determinism convention (see plans.registry): doubles are cast to
small-precision decimals BEFORE arithmetic so every product/sum is exact
in both Spark and DuckDB (never exceeding precision 38, where the two
engines degrade differently), and only final results are surfaced as
DOUBLE.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import register, table


def dec2(col: str) -> F.Column:
    """Exact money/quantity: DECIMAL(12,2)."""
    return F.col(col).cast("decimal(12,2)")


def rate(col: str) -> F.Column:
    """Exact rate in [0,1): DECIMAL(3,2)."""
    return F.col(col).cast("decimal(3,2)")


# SQL twins of the helpers above
SQL_REV = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)
SQL_CHARGE = f"{SQL_REV} * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))"


def one() -> F.Column:
    return F.lit(1).cast("decimal(3,2)")


def rev() -> F.Column:
    """discounted price, exact decimal (Column built lazily — needs a live session)."""
    return dec2("l_extendedprice") * (one() - rate("l_discount"))


def charge() -> F.Column:
    return rev() * (one() + rate("l_tax"))


def ts(lit: str) -> F.Column:
    return F.lit(lit).cast("timestamp_ntz")


@register(
    "q1_pricing_summary",
    family="agg",
    doc="TPC-H Q1 analogue: filter → grouped multi-aggregate (SURVEY §2.I agg family). Flagship query.",
    oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM({SQL_REV}) AS DOUBLE) AS sum_disc_price,
  CAST(SUM({SQL_CHARGE}) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    return (
        l.where(F.col("l_shipdate") <= ts("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec2("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(rev()).cast("double").alias("sum_disc_price"),
            F.sum(charge()).cast("double").alias("sum_charge"),
            (F.sum(dec2("l_quantity")).cast("double") / cnt).alias("avg_qty"),
            (F.sum(dec2("l_extendedprice")).cast("double") / cnt).alias("avg_price"),
            (F.sum(rate("l_discount")).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    family="join",
    doc="TPC-H Q3 analogue: 3-way join + grouped revenue + deterministic top-10 (join + top-k families).",
    oracle=f"""
SELECT
  l_orderkey,
  CAST(SUM({SQL_REV}) AS DOUBLE) AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderdate") < ts("1998-03-15 00:00:00"))
    l = table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > ts("1997-03-15 00:00:00"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    family="join",
    doc="TPC-H Q5 analogue: 6-way snowflake join with broadcast dims, revenue per nation.",
    oracle=f"""
SELECT
  n_name,
  CAST(SUM({SQL_REV}) AS DOUBLE) AS revenue
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""",
)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    cst = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1998-01-01 00:00:00"))
    )
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(cst, o.o_custkey == cst.c_custkey)
        .join(F.broadcast(s), (l.l_suppkey == s.s_suppkey) & (s.s_nationkey == cst.c_nationkey))
        .join(F.broadcast(n), cst.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev()).cast("double").alias("revenue"))
    )


@register(
    "q6_forecast_revenue",
    family="filter",
    doc="TPC-H Q6 analogue: pure pushdown filter + single aggregate (filter family; PushedFilters demo).",
    oracle="""
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.where(
        (F.col("l_shipdate") >= ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1998-01-01 00:00:00"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(dec2("l_extendedprice") * rate("l_discount")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q10_returned_items",
    family="join",
    doc="TPC-H Q10 analogue: returned-item revenue per customer, deterministic top-20.",
    oracle=f"""
SELECT
  c_custkey,
  c_name,
  CAST(SUM({SQL_REV}) AS DOUBLE) AS revenue,
  n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cst = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(cst, o.o_custkey == cst.c_custkey)
        .join(F.broadcast(n), cst.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )
