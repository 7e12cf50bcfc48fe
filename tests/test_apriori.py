"""A-priori pruned pair mining (operators/apriori.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from nemsis_xml_parser_spark.operators import apriori as AP


def _baskets(spark, data):
    rows = [(k, i) for k, items in data.items() for i in items]
    return spark.createDataFrame(rows, "k string, item string")


def test_prune_is_lossless_for_pair_floor(spark):
    data = {
        "b1": ["x", "y", "rare1"],
        "b2": ["x", "y", "rare2"],
        "b3": ["x", "z"],
        "b4": ["y", "z"],
    }
    b = _baskets(spark, data)
    pruned = AP.pair_supports(b, "k", "item", minsup=2)
    # naive all-pairs with the same floor
    a = b.select(F.col("k"), F.col("item").alias("a"))
    bb = b.select(F.col("k").alias("k2"), F.col("item").alias("b"))
    naive = (
        a.join(bb, (a["k"] == bb["k2"]) & (F.col("a") < F.col("b")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .where(F.col("c") >= 2)
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_prune_caps_hot_basket_fanout(spark):
    # one hot basket with 200 singleton items + 2 frequent ones: the
    # naive expansion would emit C(202,2) ~ 20k pairs for it; after the
    # prune only the 2 frequent items survive -> 1 pair row
    data = {"hot": [f"s{i}" for i in range(200)] + ["x", "y"]}
    data.update({f"b{i}": ["x", "y"] for i in range(3)})
    b = _baskets(spark, data)
    pruned_rows = AP.prune_infrequent(b, "k", "item", minsup=2)
    hot_width = pruned_rows.where(F.col("k") == "hot").count()
    assert hot_width == 2  # frequent-item width, not raw width (202)
    pairs = AP.pair_supports(b, "k", "item", minsup=2)
    got = {(r.a, r.b): r.c for r in pairs.collect()}
    assert got == {("x", "y"): 4}


def test_triples_lossless_and_closure_pruned(spark):
    data = {
        "b1": ["x", "y", "z", "rare1"],
        "b2": ["x", "y", "z"],
        "b3": ["x", "y", "w"],
        "b4": ["x", "z", "w"],
        "b5": ["y", "z", "q"],
    }
    b = _baskets(spark, data)
    got = {
        (r.a, r.b, r.c): r.cnt
        for r in AP.triple_supports(b, "k", "item", minsup=2).collect()
    }
    # naive ground truth
    import itertools
    from collections import Counter

    cnt = Counter()
    for items in data.values():
        for t in itertools.combinations(sorted(items), 3):
            cnt[t] += 1
    want = {t: c for t, c in cnt.items() if c >= 2}
    assert got == want and ("x", "y", "z") in got
