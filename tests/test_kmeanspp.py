"""Deterministic farthest-point (k-means++-style) seeding: known greedy
traversal on 1-D configurations, tie-breaking, validation."""

from __future__ import annotations

import pytest

from nemsis_xml_parser_spark.operators.kmeans import farthest_point_seed


def frame(spark, pts):
    return spark.createDataFrame(
        [(i, [float(x)]) for i, x in pts],
        "vec_id bigint, embedding array<double>",
    )


def seeds_list(df):
    return [
        (r["c"], r["vec_id"], float(r["sep_d2"]))
        for r in df.orderBy("c").collect()
    ]


def test_greedy_farthest_traversal(spark):
    # positions: 1->0, 2->1, 3->2, 4->10, 5->4
    # seed0 = min id (1 at 0); then 4 (d2=100); then 5 (min-dist 16);
    # then 3 (min-dist 4)
    df = frame(spark, [(1, 0), (2, 1), (3, 2), (4, 10), (5, 4)])
    got = seeds_list(farthest_point_seed(df, k=4))
    assert got == [(0, 1, 0.0), (1, 4, 100.0), (2, 5, 16.0), (3, 3, 4.0)]


def test_tie_breaks_by_smallest_id(spark):
    # 2 and 3 equidistant from seed 1: the smaller id wins
    df = frame(spark, [(1, 0), (2, 5), (3, -5)])
    got = seeds_list(farthest_point_seed(df, k=2))
    assert got == [(0, 1, 0.0), (1, 2, 25.0)]


def test_k_one_returns_min_id_only(spark):
    df = frame(spark, [(7, 3), (2, 9)])
    got = seeds_list(farthest_point_seed(df, k=1))
    assert got == [(0, 2, 0.0)]


def test_invalid_k_raises(spark):
    df = frame(spark, [(1, 0)])
    with pytest.raises(ValueError):
        farthest_point_seed(df, k=0)
