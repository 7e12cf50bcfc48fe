"""Heavy-edge matching rounds vs a pure-Python reference."""

from __future__ import annotations

from nemsis_xml_parser_spark.operators.coarsen import (
    coarsen_stats,
    heavy_edge_matching_round,
)


def ref_round(edges: dict[tuple[int, int], int]):
    adj: dict[int, list[tuple[int, int]]] = {}
    for (u, v), w in edges.items():
        adj.setdefault(u, []).append((w, v))
        adj.setdefault(v, []).append((w, u))
    pick = {n: max(nb, key=lambda t: (t[0], -t[1]))[1] for n, nb in adj.items()}
    matches = {
        (u, v): edges[(u, v)]
        for (u, v) in edges
        if pick[u] == v and pick[v] == u
    }
    smap = {v: u for (u, v) in matches}
    out: dict[tuple[int, int], int] = {}
    for (u, v), w in edges.items():
        a, b = smap.get(u, u), smap.get(v, v)
        if a == b:
            continue
        key = (min(a, b), max(a, b))
        out[key] = out.get(key, 0) + w
    return matches, out


def _edges_df(spark, edges):
    return spark.createDataFrame(
        [(u, v, w) for (u, v), w in edges.items()], "u long, v long, w long"
    )


def test_one_round_matches_reference(spark):
    edges = {
        (1, 2): 5, (2, 3): 9, (3, 4): 2, (1, 4): 9,
        (4, 5): 1, (5, 6): 7, (2, 6): 3,
    }
    ref_m, ref_e = ref_round(edges)
    contracted, matches = heavy_edge_matching_round(_edges_df(spark, edges))
    got_m = {(r.u, r.v): r.w for r in matches.collect()}
    got_e = {(r.u, r.v): r.w for r in contracted.collect()}
    assert got_m == ref_m
    assert got_e == ref_e


def test_tie_break_prefers_min_partner(spark):
    # node 2 sees weight 4 on both sides; must propose to min id 1
    edges = {(1, 2): 4, (2, 3): 4}
    _, matches = heavy_edge_matching_round(_edges_df(spark, edges))
    got = {(r.u, r.v) for r in matches.collect()}
    assert got == {(1, 2)}  # 1 picks 2, 2 picks 1 (tie-break), 3 unmatched


def test_multi_round_stats_shrink(spark):
    edges = {(i, i + 1): (i % 5) + 1 for i in range(1, 30)}
    stats = {
        r.round: r for r in coarsen_stats(_edges_df(spark, edges), 3).collect()
    }
    assert stats[1].n_nodes == 30 and stats[1].n_edges == 29
    # contraction must shrink the graph monotonically
    assert stats[2].n_nodes < stats[1].n_nodes
    assert stats[3].n_nodes <= stats[2].n_nodes
    # total weight is conserved minus matched (internalized) weight
    assert (
        stats[2].total_weight
        == stats[1].total_weight - stats[1].matched_weight
    )
