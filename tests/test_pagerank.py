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


def test_directed_sinks_hold_rank(spark):
    # directed chain 0→1→2: node 2 is a sink (dst-only).  It must appear
    # in the output with degree 0, accumulate rank, and its dangling mass
    # must be redistributed so total mass stays 1.
    edges = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])
    rows = pagerank(edges, iters=5).collect()
    pr = {r["node"]: r["pr"] for r in rows}
    deg = {r["node"]: r["degree"] for r in rows}
    assert set(pr) == {0, 1, 2}
    assert deg == {0: 1, 1: 1, 2: 0}
    assert abs(sum(pr.values()) - 1.0) < 1e-6  # dangling mass conserved
    # downstream accumulation: 2 receives from 1 plus dangling share
    assert pr[2] > pr[0]


def test_directed_sink_heavy_graph(spark):
    # two sources pointing at one sink: sink out-ranks both sources and
    # mass is still conserved despite most mass going dangling each round
    edges = spark.createDataFrame([(0, 2), (1, 2)], ["src", "dst"])
    pr = {r["node"]: r["pr"] for r in pagerank(edges, iters=4).collect()}
    assert pr[2] > pr[0] == pr[1]
    assert abs(sum(pr.values()) - 1.0) < 1e-6
