"""Louvain gain sweep vs a pure-Python reference on hand graphs."""

from __future__ import annotations

from nemsis_xml_parser_spark.operators.louvain import louvain_sweep_summary


def ref_sweep(edges: dict[tuple[int, int], int]):
    adj: dict[int, dict[int, int]] = {}
    for (u, v), w in edges.items():
        adj.setdefault(u, {})[v] = w
        adj.setdefault(v, {})[u] = w
    m = sum(edges.values())
    k = {n: sum(nb.values()) for n, nb in adj.items()}
    part = {}
    for i, nb in adj.items():
        cands = [
            (2 * m * w - k[i] * k[j], j) for j, w in nb.items()
            if 2 * m * w - k[i] * k[j] > 0
        ]
        part[i] = min(cands, key=lambda t: (-t[0], t[1]))[1] if cands else i
    comms: dict[int, list[int]] = {}
    for n, c in part.items():
        comms.setdefault(c, []).append(n)
    qn = 0
    for c, members in comms.items():
        win = sum(
            w for (u, v), w in edges.items()
            if part[u] == c and part[v] == c
        )
        dc = sum(k[n] for n in members)
        qn += 4 * m * win - dc * dc
    return {
        "n_nodes": len(part),
        "n_moved": sum(1 for n, c in part.items() if c != n),
        "n_communities": len(comms),
        "largest_community": max(len(v) for v in comms.values()),
        "modularity": round(qn / float(4 * m * m), 6),
    }


def _run(spark, edges):
    df = spark.createDataFrame(
        [(u, v, w) for (u, v), w in edges.items()], "u long, v long, w long"
    )
    r = louvain_sweep_summary(df).collect()[0]
    return {
        "n_nodes": r.n_nodes,
        "n_moved": r.n_moved,
        "n_communities": r.n_communities,
        "largest_community": r.largest_community,
        "modularity": r.modularity,
    }


def test_two_cliques_with_weak_bridge(spark):
    edges = {}
    for grp in ([1, 2, 3, 4], [10, 11, 12, 13]):
        for i, a in enumerate(grp):
            for b in grp[i + 1:]:
                edges[(a, b)] = 5
    edges[(4, 10)] = 1  # weak bridge
    got = _run(spark, edges)
    assert got == ref_sweep(edges)
    # one synchronous sweep from singletons splits each clique around
    # its two lowest-id anchors (the classic artifact iterated sweeps
    # clean up) — but nothing crosses the weak bridge, and modularity
    # is already positive
    assert got["n_communities"] == 4
    assert got["modularity"] > 0.15


def test_matches_reference_on_irregular_graph(spark):
    edges = {
        (1, 2): 3, (2, 3): 1, (3, 4): 7, (4, 5): 2, (5, 1): 4,
        (2, 6): 6, (6, 7): 6, (7, 2): 1, (3, 8): 2,
    }
    assert _run(spark, edges) == ref_sweep(edges)


def test_lone_edge_synchronous_swap(spark):
    # a lone edge has positive gain both ways, so under the SYNCHRONOUS
    # semantics both endpoints move to each other's (original) anchor —
    # the classic swap artifact the docstring documents: two moved
    # nodes, still two communities; the asynchronous/iterated driver
    # loop is what collapses it.  The parity with the reference is the
    # real assertion.
    got = _run(spark, {(1, 2): 5})
    assert got == ref_sweep({(1, 2): 5})
    assert got["n_moved"] == 2
    assert got["n_communities"] == 2
