"""Deterministic walk generation: hash-argmin rule, reproducibility,
early stop at sinks."""

from __future__ import annotations

import pyspark.sql.functions as F

from nemsis_xml_parser_spark.operators.walks import (
    WALK_P,
    deterministic_walks,
    walk_paths,
)


def _score(walk: int, step: int, nbr: int) -> int:
    return ((walk % WALK_P) * 31 + step * 101 + (nbr % WALK_P) * 977) % WALK_P


def ref_walks(adj: dict[int, list[int]], seeds, steps):
    out = {}
    for w in seeds:
        path, cur = [w], w
        for t in range(1, steps + 1):
            nbrs = adj.get(cur, [])
            if not nbrs:
                break
            cur = min(nbrs, key=lambda n: (_score(w, t, n), n))
            path.append(cur)
        out[w] = path
    return out


def _run(spark, edges, seeds, steps):
    a = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(v,) for v in seeds], "v long")
    visits = deterministic_walks(a, s, steps)
    got = {}
    for r in visits.orderBy("walk_id", "step").collect():
        got.setdefault(r.walk_id, []).append(r.node)
    return got, visits


def test_walks_match_reference_argmin(spark):
    edges = [(1, 2), (1, 3), (2, 1), (2, 4), (3, 1), (4, 2), (3, 4), (4, 3)]
    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    got, _ = _run(spark, edges, [1, 2], 6)
    assert got == ref_walks(adj, [1, 2], 6)


def test_walk_stops_at_sink(spark):
    edges = [(1, 2), (2, 3)]  # 3 has no out-edges
    got, _ = _run(spark, edges, [1], 5)
    assert got == {1: [1, 2, 3]}


def test_walk_paths_rendering(spark):
    edges = [(1, 2), (2, 3)]
    _, visits = _run(spark, edges, [1], 5)
    rows = walk_paths(visits).collect()
    assert len(rows) == 1
    assert rows[0].path == "1->2->3"
    assert rows[0].end_node == 3


def test_walks_are_reproducible(spark):
    edges = [(i, (i * 7 + 3) % 20) for i in range(20)] + [
        ((i * 7 + 3) % 20, i) for i in range(20)
    ]
    edges = [(s, d) for s, d in edges if s != d]
    g1, _ = _run(spark, edges, [0, 5, 10], 8)
    g2, _ = _run(spark, edges, [0, 5, 10], 8)
    assert g1 == g2
