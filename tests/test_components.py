from __future__ import annotations

import random

import pytest

from nemsis_xml_parser_spark.operators.components import (
    connected_components,
    dedup_clusters,
    elect_survivors,
)


def _uf_components(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in component
    comp: dict[int, list[int]] = {}
    for v in range(n_nodes):
        comp.setdefault(find(v), []).append(v)
    return {v: min(members) for members in comp.values() for v in members}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    n = 200
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    df = spark.createDataFrame(edges, "src long, dst long")
    # single-task union-find endgame (default at this size) and the
    # distributed pointer-jumping fixpoint must agree with brute
    local = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    distributed = {
        r["node"]: r["component"]
        for r in connected_components(df, local_finish_max=0).collect()
    }
    want = _uf_components(n, edges)
    touched = {v for e in edges for v in e if e[0] != e[1]}
    assert local == distributed == {v: want[v] for v in touched}


def test_chain_converges_in_log_rounds(spark):
    # a 64-node path has diameter 63; pointer jumping must close it in
    # far fewer than 63 rounds — max_iter=12 would fail plain propagation
    # (local_finish_max=0 forces the distributed path under test)
    edges = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = connected_components(df, max_iter=12, local_finish_max=0).collect()
    assert all(r["component"] == 0 for r in got)
    assert len(got) == 64


def test_no_convergence_raises(spark):
    edges = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(RuntimeError):
        connected_components(df, max_iter=1, local_finish_max=0)


def test_dedup_clusters_includes_singletons(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    nodes = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    rows = {r["doc_id"]: r for r in dedup_clusters(pairs, nodes=nodes).collect()}
    assert {k: r["cluster_id"] for k, r in rows.items()} == {
        0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5,
    }
    assert rows[2]["cluster_size"] == 3
    assert rows[0]["cluster_size"] == 1


def test_elect_survivors_picks_central_member(spark):
    # cluster A: star 1—{2,3,4} (hub 1 has highest centrality);
    # cluster B: pair 10—11 (symmetric ranks → min-id tie-break);
    # node 20 is a singleton → no election row.
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (10, 11)], "doc_a long, doc_b long"
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 20]], "doc_id long"
    )
    rows = {r["cluster_id"]: r for r in elect_survivors(pairs, nodes=nodes).collect()}
    assert set(rows) == {1, 10}  # singleton 20 excluded
    star = rows[1]
    assert star["survivor_doc_id"] == 1  # the hub
    assert star["cluster_size"] == 4 and star["n_dropped"] == 3
    pair = rows[10]
    assert pair["survivor_doc_id"] == 10  # equal rank → min doc_id
    assert pair["cluster_size"] == 2 and pair["n_dropped"] == 1


def test_elect_survivors_deterministic(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4)], "doc_a long, doc_b long"
    )
    a = sorted(map(tuple, elect_survivors(pairs).collect()))
    b = sorted(map(tuple, elect_survivors(pairs).collect()))
    assert a == b and len(a) == 1
