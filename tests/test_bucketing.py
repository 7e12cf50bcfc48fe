"""Bucketed co-located joins (operators/bucketing.py): the big⋈big
equi-join runs with zero exchanges when both sides share a bucket spec."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nemsis_xml_parser_spark.operators.bucketing import (
    bucketed_join,
    exchange_count,
    write_bucketed,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bucketed")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(o, "orders_b", "o_orderkey", 8, path=str(tmp / "o"))
    write_bucketed(li, "lineitem_b", "o_orderkey", 8, path=str(tmp / "l"))
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_zero_exchanges(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # force the SortMergeJoin path: a broadcast would hide the layout win
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "o_orderkey")
        assert exchange_count(joined) == 0
        # and the same join from plain parquet DOES shuffle — the layout,
        # not the data size, is what removed the exchanges
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        assert exchange_count(o.join(li, "o_orderkey")) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_results_match_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    bucketed = bucketed_join(spark, lt, rt, "o_orderkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
    )
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    plain = o.join(li, "o_orderkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
    )
    assert bucketed.collect() == plain.collect()


def test_bucketed_groupby_on_bucket_key_skips_shuffle(spark, bucketed_tables):
    _, rt = bucketed_tables
    agg = spark.table(rt).groupBy("o_orderkey").agg(F.sum("l_quantity").alias("s"))
    assert exchange_count(agg) == 0
