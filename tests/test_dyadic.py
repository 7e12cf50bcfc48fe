"""Dyadic-decomposition rank/quantile structure (operators/dyadic.py):
every rank of a small multiset must come back as the true order
statistic, and the level tables must merge by addition."""

from __future__ import annotations

import pyspark.sql.functions as F

from nemsis_xml_parser_spark.operators.dyadic import (
    dyadic_counts,
    dyadic_rank_select,
)
from nemsis_xml_parser_spark.operators.lineage import cut_lineage

L = 8  # values < 256


def test_every_rank_is_the_true_order_statistic(spark):
    vals = [3, 17, 17, 200, 5, 99, 0, 255, 17, 42, 128, 6]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    counts = cut_lineage(dyadic_counts(df, F.col("v"), L))
    targets = spark.createDataFrame(
        [(float(r), r) for r in range(1, len(vals) + 1)], "q double, target long"
    )
    got = {
        r["target"]: r["value"]
        for r in dyadic_rank_select(counts, targets, L).collect()
    }
    want = sorted(vals)
    assert got == {r: want[r - 1] for r in range(1, len(vals) + 1)}


def test_level_tables_merge_by_addition(spark):
    a = [1, 5, 9, 9, 200]
    b = [2, 5, 130]
    da = spark.createDataFrame([(v,) for v in a], "v long")
    db = spark.createDataFrame([(v,) for v in b], "v long")
    dab = spark.createDataFrame([(v,) for v in a + b], "v long")
    merged = (
        dyadic_counts(da, F.col("v"), L)
        .unionByName(dyadic_counts(db, F.col("v"), L))
        .groupBy("l", "bucket")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )
    direct = dyadic_counts(dab, F.col("v"), L)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # and the merged table answers ranks over the union correctly
    targets = spark.createDataFrame([(0.5, 4)], "q double, target long")
    got = dyadic_rank_select(cut_lineage(merged), targets, L).collect()[0]
    assert got["value"] == sorted(a + b)[3]
