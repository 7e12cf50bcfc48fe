"""Hop-bounded Brandes betweenness: known closed-form values on small
graphs (path, star, diamond), fractional path-splitting, hop-bound
truncation, validation."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from nemsis_xml_parser_spark.operators.betweenness import betweenness_sampled


def undirected(spark, pairs):
    e = spark.createDataFrame(pairs, "u bigint, v bigint")
    return e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def all_nodes(adj):
    return adj.select("u").distinct().withColumnRenamed("u", "v")


def bc_map(df) -> dict:
    return {r["v"]: float(r["betweenness"]) for r in df.collect()}


def test_path_graph_all_sources(spark):
    # 1-2-3-4-5: unnormalized directed-sum betweenness is 2x the pair
    # count through each node: 0, 6, 8, 6, 0.
    adj = undirected(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    got = bc_map(betweenness_sampled(adj, all_nodes(adj), 4))
    assert got == {1: 0.0, 2: 6.0, 3: 8.0, 4: 6.0, 5: 0.0}


def test_star_center(spark):
    # center 0 with 4 leaves: C(4,2)=6 leaf pairs x 2 directions = 12
    adj = undirected(spark, [(0, 1), (0, 2), (0, 3), (0, 4)])
    got = bc_map(betweenness_sampled(adj, all_nodes(adj), 2))
    assert got == {0: 12.0, 1: 0.0, 2: 0.0, 3: 0.0, 4: 0.0}


def test_diamond_fractional_split(spark):
    # 1-2-4 and 1-3-4: sigma(1,4)=2 so 2 and 3 each mediate half; every
    # node ends at exactly 1.0 (pair (1,4) splits over {2,3}, pair (2,3)
    # splits over {1,4}, both directions).
    adj = undirected(spark, [(1, 2), (1, 3), (2, 4), (3, 4)])
    got = bc_map(betweenness_sampled(adj, all_nodes(adj), 2))
    assert got == {1: 1.0, 2: 1.0, 3: 1.0, 4: 1.0}


def test_hop_bound_truncates(spark):
    # bound 2 on the 5-path: only length-<=2 geodesics count, so each
    # interior node mediates exactly one adjacent pair (x2 directions).
    adj = undirected(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    got = bc_map(betweenness_sampled(adj, all_nodes(adj), 2))
    assert got == {1: 0.0, 2: 2.0, 3: 2.0, 4: 2.0, 5: 0.0}


def test_sampled_sources_subset(spark):
    # only source 1 on the path: delta from a single source (Brandes
    # forward value): node 2 mediates 1->{3,4,5} = 3, node 3 -> 2, 4 -> 1.
    adj = undirected(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    seeds = spark.createDataFrame([(1,)], "v bigint")
    got = bc_map(betweenness_sampled(adj, seeds, 4))
    assert got == {2: 3.0, 3: 2.0, 4: 1.0, 5: 0.0}


def test_invalid_hops_raise(spark):
    adj = undirected(spark, [(1, 2)])
    with pytest.raises(ValueError):
        betweenness_sampled(adj, all_nodes(adj), 0)
