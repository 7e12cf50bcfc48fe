"""Bounded-depth multi-source BFS: hop minimality, bounds, validation."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from nemsis_xml_parser_spark.operators.bfs import bfs_hops


def undirected(spark, pairs):
    e = spark.createDataFrame(pairs, "u bigint, v bigint")
    return e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def hops_map(df) -> dict:
    return {r["v"]: r["hop"] for r in df.collect()}


def test_single_source_path_graph(spark):
    # 1-2-3-4-5 chain, seed at 1
    adj = undirected(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    seeds = spark.createDataFrame([(1,)], "v bigint")
    got = hops_map(bfs_hops(adj, seeds, 3))
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 is beyond the bound


def test_multi_source_takes_minimum(spark):
    # seeds at both ends of the chain: middle node gets the closer one
    adj = undirected(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    seeds = spark.createDataFrame([(1,), (5,)], "v bigint")
    got = hops_map(bfs_hops(adj, seeds, 4))
    assert got == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_cycle_terminates_with_min_hop(spark):
    adj = undirected(spark, [(1, 2), (2, 3), (3, 1)])
    seeds = spark.createDataFrame([(1,)], "v bigint")
    got = hops_map(bfs_hops(adj, seeds, 5))
    assert got == {1: 0, 2: 1, 3: 1}


def test_zero_hops_returns_seeds_only(spark):
    adj = undirected(spark, [(1, 2)])
    seeds = spark.createDataFrame([(1,)], "v bigint")
    assert hops_map(bfs_hops(adj, seeds, 0)) == {1: 0}


def test_negative_depth_raises(spark):
    adj = undirected(spark, [(1, 2)])
    seeds = spark.createDataFrame([(1,)], "v bigint")
    with pytest.raises(ValueError):
        bfs_hops(adj, seeds, -1)


def test_disconnected_component_unreached(spark):
    adj = undirected(spark, [(1, 2), (10, 11)])
    seeds = spark.createDataFrame([(1,)], "v bigint")
    got = hops_map(bfs_hops(adj, seeds, 3))
    assert 10 not in got and 11 not in got and got == {1: 0, 2: 1}


def test_per_source_distance_matrix(spark):
    from nemsis_xml_parser_spark.operators.bfs import bfs_hops_per_source

    adj = undirected(spark, [(1, 2), (2, 3), (3, 4)])
    seeds = spark.createDataFrame([(1,), (4,)], "v bigint")
    got = {(r["src"], r["v"]): r["hop"]
           for r in bfs_hops_per_source(adj, seeds, 2).collect()}
    assert got == {
        (1, 1): 0, (1, 2): 1, (1, 3): 2,
        (4, 4): 0, (4, 3): 1, (4, 2): 2,
    }


def test_per_source_independent_of_other_seeds(spark):
    from nemsis_xml_parser_spark.operators.bfs import (
        bfs_hops,
        bfs_hops_per_source,
    )

    adj = undirected(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (2, 5)])
    single = {r["v"]: r["hop"] for r in bfs_hops(
        adj, spark.createDataFrame([(1,)], "v bigint"), 3).collect()}
    multi = {r["v"]: r["hop"] for r in bfs_hops_per_source(
        adj, spark.createDataFrame([(1,), (3,)], "v bigint"), 3).collect()
        if r["src"] == 1}
    assert multi == single
