"""Unit tests for k-core peeling (operators/kcore.py)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nemsis_xml_parser_spark.operators import kcore as KC  # noqa: E402


def _edges(spark, pairs):
    return spark.createDataFrame(sorted(pairs), "a long, b long")


def _py_kcore(pairs, k):
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    while True:
        drop = [v for v, ns in adj.items() if len(ns) < k]
        if not drop:
            break
        for v in drop:
            for u in adj[v]:
                adj[u].discard(v)
            del adj[v]
    return {tuple(sorted(e)) for v in adj for e in ((v, u) for u in adj[v])}


def test_triangle_with_tail(spark):
    # triangle 1-2-3 plus a pendant 3-4: 2-core = triangle, 3-core = {}
    pairs = [(1, 2), (1, 3), (2, 3), (3, 4)]
    e2 = {(r.a, r.b) for r in KC.kcore_edges(_edges(spark, pairs), 2).collect()}
    assert e2 == {(1, 2), (1, 3), (2, 3)}
    assert KC.kcore_edges(_edges(spark, pairs), 3).count() == 0


def test_cascading_peel(spark):
    # chain that unravels one node per round: 1-2-3-4-5
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5)]
    assert KC.kcore_edges(_edges(spark, pairs), 2).count() == 0


def test_matches_python_reference(spark):
    import random

    rng = random.Random(7)
    nodes = list(range(30))
    pairs = {
        tuple(sorted(rng.sample(nodes, 2))) for _ in range(80)
    }
    for k in (2, 3, 4):
        got = {
            (r.a, r.b)
            for r in KC.kcore_edges(_edges(spark, pairs), k).collect()
        }
        assert got == _py_kcore(pairs, k)


def test_degrees(spark):
    e = _edges(spark, [(1, 2), (1, 3)])
    d = {r.v: r.d for r in KC.degrees(e).collect()}
    assert d == {1: 2, 2: 1, 3: 1}
