"""Unit tests for HITS hubs/authorities (operators/hits.py)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nemsis_xml_parser_spark.operators.hits import hits  # noqa: E402


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_star_authority_dominates(spark):
    # hubs 1..4 all point at part 10; hub 1 also points at part 11
    e = _edges(spark, [(1, 10), (2, 10), (3, 10), (4, 10), (1, 11)])
    auth, hubs = hits(e, iters=2)
    a = {r.dst: r.auth for r in auth.collect()}
    assert a[10] > a[11]
    h = {r.src: r.hub for r in hubs.collect()}
    # hub 1 touches both authorities -> highest hub score
    assert h[1] == max(h.values())


def test_l1_normalized(spark):
    e = _edges(spark, [(1, 10), (2, 10), (2, 11), (3, 12)])
    auth, hubs = hits(e, iters=2)
    sa = sum(r.auth for r in auth.collect())
    sh = sum(r.hub for r in hubs.collect())
    assert abs(sa - 1.0) < 1e-9
    assert abs(sh - 1.0) < 1e-9


def test_symmetric_graph_uniform_scores(spark):
    # complete bipartite 2x2: all hubs equal, all authorities equal
    e = _edges(spark, [(1, 10), (1, 11), (2, 10), (2, 11)])
    auth, hubs = hits(e, iters=3)
    a = [r.auth for r in auth.collect()]
    h = [r.hub for r in hubs.collect()]
    assert max(a) - min(a) < 1e-12
    assert max(h) - min(h) < 1e-12
    assert abs(a[0] - 0.5) < 1e-9
