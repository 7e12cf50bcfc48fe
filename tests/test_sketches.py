"""Mergeable-sketch correctness: HLL union estimate vs exact distinct."""

import pyspark.sql.functions as F


def test_hll_union_estimate_within_bound(spark):
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    exact = o.select(F.countDistinct("o_custkey").alias("n")).collect()[0]["n"]
    per = o.groupBy("o_orderpriority").agg(F.hll_sketch_agg("o_custkey").alias("sk"))
    est = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sk"))).alias("e")
    ).collect()[0]["e"]
    # default lgConfigK=12 → relative error ~1.6%; assert a loose 5% bound
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_hll_merge_equals_direct_sketch(spark):
    # merging per-group sketches must estimate the same as one global sketch
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    direct = o.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("e")
    ).collect()[0]["e"]
    merged = (
        o.groupBy("o_orderstatus")
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg(F.col("sk"))).alias("e"))
        .collect()[0]["e"]
    )
    assert direct == merged
