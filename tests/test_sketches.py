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


# --- Count-Min / Bloom (operators/sketches.py) -----------------------------

def test_countmin_never_underestimates_and_merges(spark):
    from nemsis_xml_parser_spark.operators import sketches as SK

    ev = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    keyed = ev.groupBy(F.col("o_custkey").cast("string").alias("k")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cells = SK.countmin_cells(keyed, "k", "cnt", depth=4, width=64)
    est = SK.countmin_estimate(keyed, cells, "k", depth=4, width=64)
    joined = keyed.join(est, "k")
    under = joined.where(F.col("cm_estimate") < F.col("cnt")).count()
    assert under == 0  # the Count-Min guarantee: estimates never undershoot

    # mergeability: cells built from two disjoint shards, summed cell-wise,
    # must equal the cells built from the whole corpus
    a = keyed.where(F.col("k").cast("long") % 2 == 0)
    b = keyed.where(F.col("k").cast("long") % 2 == 1)
    merged = (
        SK.countmin_cells(a, "k", "cnt", 4, 64)
        .unionAll(SK.countmin_cells(b, "k", "cnt", 4, 64))
        .groupBy("i", "pos")
        .agg(F.sum("total").alias("total"))
    )
    diff = (
        cells.join(merged, ["i", "pos"], "full")
        .where(
            F.coalesce(cells["total"], F.lit(0))
            != F.coalesce(merged["total"], F.lit(0))
        )
        .count()
    )
    assert diff == 0


def test_bloom_no_false_negatives(spark):
    from nemsis_xml_parser_spark.operators import sketches as SK

    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    keys = c.select(F.col("c_custkey").cast("string").alias("k")).distinct()
    bits = SK.bloom_bits(keys, "k", k=3, m=4096)
    claims = SK.bloom_claims(keys, bits, "k", k=3, m=4096)
    # every inserted key must be claimed — the structural Bloom guarantee
    missed = claims.where(F.col("claimed") == 0).count()
    assert missed == 0


def test_hll_registers_deterministic_and_mergeable(spark):
    from nemsis_xml_parser_spark.operators import sketches as SK

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderpriority", "o_custkey"
    )
    regs = SK.hll_registers(o, "o_custkey", ["o_orderpriority"])
    # merging per-segment registers == sketching the whole corpus at once
    merged = SK.hll_merge(regs.drop("o_orderpriority"))
    direct = SK.hll_registers(o, "o_custkey")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    est = SK.hll_estimate(direct).collect()[0]
    exact = o.select("o_custkey").distinct().count()
    # n << m here, so the small-range (linear counting) branch must fire
    # and be accurate; the raw harmonic estimate is known-biased there
    assert abs(est.est_std - exact) / exact < 0.1
    assert est.n_set + est.v_zero == SK.HLL_M


def test_hll_rank_boundaries(spark):
    from nemsis_xml_parser_spark.operators import sketches as SK
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(0,), (1,), (2,), ((1 << 47),), ((1 << 48) - 1,)], "w: long"
    )
    got = [r[0] for r in df.select(SK.hll_rank(F.col("w"))).collect()]
    # w=0 -> 49; w=1 -> 48 leading zeros -> rank 48; top bit set -> 1
    assert got == [49, 48, 47, 1, 1]
