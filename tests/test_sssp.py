"""Fixed-round Bellman-Ford vs hand-computed distances."""

from __future__ import annotations

from nemsis_xml_parser_spark.operators.sssp import bellman_ford_rounds


def _run(spark, edges, seeds, rounds):
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    s = spark.createDataFrame([(v,) for v in seeds], "v long")
    return {
        r.v: r.dist for r in bellman_ford_rounds(e, s, rounds).collect()
    }


def test_weighted_shortest_path_beats_fewer_hops(spark):
    # 1→3 direct costs 10; 1→2→3 costs 2+3=5: weighted min must win
    edges = [(1, 2, 2), (2, 3, 3), (1, 3, 10)]
    assert _run(spark, edges, [1], 3) == {1: 0, 2: 2, 3: 5}


def test_round_budget_bounds_path_length(spark):
    # after 1 round only ≤1-edge paths are relaxed: 3 is at the direct
    # cost 10, not the 2-edge cost 5; round 2 fixes it
    edges = [(1, 2, 2), (2, 3, 3), (1, 3, 10)]
    assert _run(spark, edges, [1], 1) == {1: 0, 2: 2, 3: 10}
    assert _run(spark, edges, [1], 2)[3] == 5


def test_multi_source_takes_nearest_seed(spark):
    edges = [(1, 2, 5), (9, 2, 1), (2, 3, 1)]
    assert _run(spark, edges, [1, 9], 3) == {1: 0, 9: 0, 2: 1, 3: 2}


def test_unreached_nodes_absent(spark):
    edges = [(1, 2, 1), (7, 8, 1)]  # 7-8 disconnected from seed 1
    got = _run(spark, edges, [1], 4)
    assert got == {1: 0, 2: 1}
