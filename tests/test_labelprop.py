"""Deterministic label propagation (operators/labelprop.py)."""

import pyspark.sql.functions as F

from nemsis_xml_parser_spark.operators import labelprop as LP


def _sym(spark, pairs):
    e = spark.createDataFrame(pairs, ["a", "b"])
    return e, e.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        e.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )


def test_two_cliques_form_two_communities(spark):
    # two disjoint triangles: {1,2,3} and {10,11,12}
    e, sym = _sym(spark, [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12)])
    labels = LP.propagate_labels(sym, iters=4)
    got = {r["node"]: r["lab"] for r in labels.collect()}
    assert got[1] == got[2] == got[3]
    assert got[10] == got[11] == got[12]
    assert got[1] != got[10]

    stats = LP.community_stats(e, labels).collect()
    assert {r["community"]: r["n_members"] for r in stats} == {got[1]: 3, got[10]: 3}
    # perfect 2-community split of 2 cliques: Q = 2·(3/6 − (6/12)²) = 0.5
    assert all(abs(r["modularity"] - 0.5) < 1e-9 for r in stats)


def test_min_label_tie_break_is_deterministic(spark):
    # node 3 sees neighbors 1 and 2 equally often → tie broken to MIN label
    e, sym = _sym(spark, [(1, 3), (2, 3)])
    labels = LP.propagate_labels(sym, iters=1)
    got = {r["node"]: r["lab"] for r in labels.collect()}
    assert got[3] == 1
