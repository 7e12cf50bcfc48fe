"""Fixed-iteration PageRank (operators/pagerank.py): centrality ordering,
mass conservation, determinism."""

import pyspark.sql.functions as F

from nemsis_xml_parser_spark.operators.pagerank import pagerank


def _edges(spark, pairs):
    df = spark.createDataFrame(pairs, ["src", "dst"])
    return df.unionAll(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_star_center_wins(spark):
    # star: 0 — {1..5}; the hub must out-rank every leaf
    pr = {r["node"]: r["pr"] for r in
          pagerank(_edges(spark, [(0, i) for i in range(1, 6)])).collect()}
    assert pr[0] > max(pr[i] for i in range(1, 6))
    leaf = {pr[i] for i in range(1, 6)}
    assert len(leaf) == 1  # symmetry: all leaves identical


def test_mass_conserved_and_deterministic(spark):
    edges = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3)])
    out1 = sorted(pagerank(edges, iters=3).collect())
    out2 = sorted(pagerank(edges, iters=3).collect())
    assert out1 == out2  # bit-identical across runs
    total = sum(r["pr"] for r in out1)
    # undirected connected graph, no dangling mass: power iteration keeps
    # total mass at 1 up to per-iteration rounding
    assert abs(total - 1.0) < 1e-6
    assert {r["node"] for r in out1} == {0, 1, 2, 3}


def test_degree_column(spark):
    out = {r["node"]: r["degree"] for r in
           pagerank(_edges(spark, [(0, 1), (0, 2)])).collect()}
    assert out == {0: 2, 1: 1, 2: 1}
