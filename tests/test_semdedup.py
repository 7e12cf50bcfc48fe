"""SemDeDup rank-band operator (operators/semdedup.py): exact-duplicate
capture guarantee, survivor rule, candidate-count bound, summary shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from nemsis_xml_parser_spark.operators.semdedup import (
    semantic_dedup_members,
    semantic_dedup_pairs,
    semantic_dedup_summary,
)


def frame(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<double>",
    )


def test_exact_duplicates_always_caught(spark):
    # ids 10/11/12 identical => identical d2 => adjacent ranks; any
    # band >= group size must pair them all, regardless of cell noise
    rows = [(10, [1, 0]), (11, [1, 0]), (12, [1, 0]),
            (20, [0, 5]), (21, [0, 6]), (22, [7, 7])]
    pairs = semantic_dedup_pairs(
        frame(spark, rows), k=2, band=2, threshold=0.999
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert {(10, 11), (10, 12), (11, 12)} <= got


def test_survivor_is_closer_to_centroid(spark):
    # id_a always ranks before id_b: lower (d2, id) — the kept member
    rows = [(1, [1, 0]), (2, [1, 0]), (3, [0, 9])]
    pairs = semantic_dedup_pairs(
        frame(spark, rows), k=1, band=3, threshold=0.999
    ).collect()
    for r in pairs:
        assert r["rnk_a"] < r["rnk_b"]
    # identical vectors tie on d2 -> id breaks the tie -> 1 survives
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


def test_candidate_count_is_linear_in_band(spark):
    # n members in one cell: band=b yields sum over members of
    # min(b, remaining) pairs <= n*b, never the n*(n-1)/2 cross product
    n, band = 12, 3
    rows = [(i, [float(i), 0.0]) for i in range(n)]
    pairs = semantic_dedup_pairs(
        frame(spark, rows), k=1, band=band, threshold=-1.0
    )
    cnt = pairs.count()
    expected = sum(min(band, n - 1 - r) for r in range(n))
    assert cnt == expected  # 3*9 + 2 + 1 + 0 = 30 < 66 all-pairs


def test_members_partition_whole_corpus(spark):
    rows = [(i, [float(i % 4), float(i % 7)]) for i in range(30)]
    m = semantic_dedup_members(frame(spark, rows), k=3)
    assert m.count() == 30
    assert m.select("_id").distinct().count() == 30
    assert m.agg(F.countDistinct("c")).collect()[0][0] <= 3


def test_summary_counts_match_pairs(spark):
    rows = [(1, [1, 0]), (2, [1, 0]), (3, [1, 0.01]), (4, [0, 8]),
            (5, [0, 8]), (6, [3, 3])]
    df = frame(spark, rows)
    summary = {r["cell"]: r for r in semantic_dedup_summary(
        df, k=2, band=5, threshold=0.99).collect()}
    pairs = semantic_dedup_pairs(df, k=2, band=5, threshold=0.99).collect()
    by_cell: dict[int, set] = {}
    removed: dict[int, set] = {}
    for r in pairs:
        by_cell.setdefault(r["c"], set()).add((r["id_a"], r["id_b"]))
        removed.setdefault(r["c"], set()).add(r["id_b"])
    assert sum(r["n_members"] for r in summary.values()) == 6
    for c, row in summary.items():
        assert row["n_dup_pairs"] == len(by_cell.get(c, set()))
        assert row["n_removed"] == len(removed.get(c, set()))
