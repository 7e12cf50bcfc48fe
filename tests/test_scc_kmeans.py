"""Unit tests: strongly connected components (operators/scc.py) and
Lloyd k-means (operators/kmeans.py) — small hand-checked graphs/clouds
plus property checks against brute-force references."""

from __future__ import annotations

import itertools

import pytest

from nemsis_xml_parser_spark.operators.kmeans import (
    kmeans_parallel_init,
    lloyd_kmeans,
    weighted_lloyd_kmeans,
)
from nemsis_xml_parser_spark.operators.scc import (
    strongly_connected_components,
)


def _scc_brute(edges: list[tuple[int, int]]) -> dict[int, int]:
    nodes = sorted({n for e in edges for n in e})
    reach = {n: {n} for n in nodes}
    changed = True
    while changed:
        changed = False
        for u, v in edges:
            new = reach[v] - reach[u]
            if new:
                reach[u] |= new
                changed = True
    out = {}
    for v in nodes:
        mutual = {u for u in reach[v] if v in reach[u]}
        out[v] = min(mutual)
    return out


def _run_scc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    # distributed FW-BW path (local_finish_max=0 forces it) and the
    # single-task Tarjan endgame must agree with each other and brute
    distributed = {
        r["node"]: r["scc"]
        for r in strongly_connected_components(
            df, local_finish_max=0
        ).collect()
    }
    local = {
        r["node"]: r["scc"]
        for r in strongly_connected_components(df).collect()
    }
    assert distributed == local == _scc_brute(edges)
    return distributed


def test_scc_two_cycles_and_bridge(spark):
    # 1<->2<->3 cycle, 10<->11 cycle, DAG bridge 3->10, tail 11->20
    edges = [
        (1, 2), (2, 3), (3, 1),
        (10, 11), (11, 10),
        (3, 10), (11, 20),
    ]
    got = _run_scc(spark, edges)
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == 10
    assert got[20] == 20  # singleton: on no cycle


def test_scc_chain_is_all_singletons(spark):
    edges = [(i, i + 1) for i in range(1, 8)]
    got = _run_scc(spark, edges)
    assert all(got[v] == v for v in range(1, 9))


def test_scc_interleaved_ids_random_graph(spark):
    # deterministic pseudo-random directed graph, ids deliberately NOT
    # in topological order (the min-label edge cases)
    edges = sorted(
        {
            ((i * 7919) % 23, (i * 104729 + 3) % 23)
            for i in range(60)
        }
    )
    edges = [(a, b) for a, b in edges if a != b]
    _run_scc(spark, edges)  # asserts equality against brute closure


def test_kmeans_separated_clouds(spark):
    # two tight clouds far apart, k=2: members must split by cloud and
    # centroids land on the cloud means
    pts = []
    for i in range(10):
        pts.append((i, [0.0 + i * 0.001, 0.0]))
    for i in range(10):
        pts.append((100 + i, [50.0, 50.0 + i * 0.001]))
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    assigned, cents = lloyd_kmeans(df, k=2, iters=3)
    a = {r["_id"]: r["c"] for r in assigned.collect()}
    lows = {a[i] for i in range(10)}
    highs = {a[100 + i] for i in range(10)}
    assert len(lows) == 1 and len(highs) == 1 and lows != highs
    cv = {r["c"]: r["cv"] for r in cents.collect()}
    low_c = cv[next(iter(lows))]
    assert low_c[0] == pytest.approx(0.0045, abs=1e-9)
    assert low_c[1] == pytest.approx(0.0, abs=1e-12)


def test_kmeans_deterministic_across_runs(spark):
    pts = [
        (i, [((i * 31 + d * 7) % 97) / 97.0 for d in range(4)])
        for i in range(40)
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    runs = []
    for _ in range(2):
        assigned, cents = lloyd_kmeans(df, k=3, iters=2)
        runs.append(
            (
                sorted(map(tuple, assigned.collect())),
                sorted((r["c"], tuple(r["cv"])) for r in cents.collect()),
            )
        )
    assert runs[0] == runs[1]


def test_kmeans_assignment_is_argmin(spark):
    pts = [
        (i, [((i * 13 + d * 5) % 53) / 53.0 for d in range(3)])
        for i in range(30)
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    assigned, cents = lloyd_kmeans(df, k=3, iters=1)
    cv = {r["c"]: r["cv"] for r in cents.collect()}
    # iteration-1 centroids are the seed vectors (vec_id 0, 1, 2)
    seeds = {c: pts[c][1] for c in range(3)}
    by_id = dict(pts)
    for r in assigned.collect():
        x = by_id[r["_id"]]
        dists = {
            c: round(sum((a - b) ** 2 for a, b in zip(x, s)), 6)
            for c, s in seeds.items()
        }
        best = min(dists.items(), key=lambda kv: (kv[1], kv[0]))[0]
        assert r["c"] == best
    assert set(cv) == {0, 1, 2}


def test_weighted_kmeans_uniform_weights_match_unweighted(spark):
    # weight=1 everywhere: assignments and centroids must equal plain
    # Lloyd (same seeds, same argmin, weighted mean degenerates to mean)
    pts = [
        (i, [((i * 31 + d * 7) % 97) / 97.0 for d in range(4)])
        for i in range(40)
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    wdf = df.withColumn("weight", df.vec_id * 0 + 1.0)
    a_u, c_u = lloyd_kmeans(df, k=3, iters=2)
    a_w, c_w = weighted_lloyd_kmeans(wdf, k=3, iters=2)
    assert sorted((r["_id"], r["c"]) for r in a_u.collect()) == sorted(
        (r["_id"], r["c"]) for r in a_w.collect()
    )
    assert sorted((r["c"], tuple(r["cv"])) for r in c_u.collect()) == sorted(
        (r["c"], tuple(r["cv"])) for r in c_w.collect()
    )


def test_weighted_kmeans_update_is_weighted_mean(spark):
    # one cluster (k=1), one iteration: the centroid must be the exact
    # weighted mean of all points under the staged-rounding arithmetic
    pts = [
        (i, [float(i), float(i * i % 7)], 1.0 + (i % 3))
        for i in range(12)
    ]
    df = spark.createDataFrame(
        pts, "vec_id long, embedding array<double>, weight double"
    )
    _, cents = weighted_lloyd_kmeans(df, k=1, iters=1)
    cv = cents.collect()[0]["cv"]
    wsum = sum(w for _, _, w in pts)
    for d in range(2):
        want = round(
            sum(round(w * x[d], 12) for _, x, w in pts) / wsum, 12
        )
        assert cv[d] == pytest.approx(want, abs=1e-9)


def test_weighted_kmeans_heavy_point_pulls_centroid(spark):
    # two points, one massively heavier: the k=1 centroid must land
    # (almost) on the heavy point
    df = spark.createDataFrame(
        [(0, [0.0, 0.0], 1.0), (1, [10.0, 10.0], 999.0)],
        "vec_id long, embedding array<double>, weight double",
    )
    _, cents = weighted_lloyd_kmeans(df, k=1, iters=1)
    cv = cents.collect()[0]["cv"]
    assert cv[0] == pytest.approx(10.0 * 999.0 / 1000.0, abs=1e-6)


def test_kmeans_parallel_init_invariants(spark):
    pts = [
        (i, [((i * 31 + d * 7) % 97) / 97.0 for d in range(4)])
        for i in range(60)
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    rows = kmeans_parallel_init(df, ell=6, rounds=2).collect()
    by_id = {r["vec_id"]: r for r in rows}
    # seed candidate: min id, round 0, zero selection distance
    assert by_id[0]["rnd"] == 0 and by_id[0]["sel_d2"] == 0.0
    assert sum(r["rnd"] == 0 for r in rows) == 1
    # oversampling drew more than the seed but far less than the corpus
    assert 1 < len(rows) < 60
    # every corpus point is weighted to exactly one candidate
    assert sum(r["weight"] for r in rows) == 60
    # weights match a brute nearest-candidate assignment (ties: lower id)
    cands = [(r["vec_id"], r["cv"]) for r in rows]
    want = {cid: 0 for cid, _ in cands}
    for i, x in pts:
        best = min(
            cands,
            key=lambda cc: (
                round(sum((a - b) ** 2 for a, b in zip(x, cc[1])), 6),
                cc[0],
            ),
        )
        want[best[0]] += 1
    assert {r["vec_id"]: r["weight"] for r in rows} == want


def test_kmeans_parallel_init_deterministic(spark):
    pts = [
        (i, [((i * 13 + d * 5) % 53) / 53.0 for d in range(3)])
        for i in range(40)
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    runs = [
        sorted(
            (r["rnd"], r["vec_id"], r["sel_d2"], r["weight"])
            for r in kmeans_parallel_init(df, ell=5, rounds=3).collect()
        )
        for _ in range(2)
    ]
    assert runs[0] == runs[1]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)),
        min_size=1,
        max_size=40,
    )
)
def test_scc_matches_brute_closure_hypothesis(spark, raw_edges):
    edges = sorted({(a, b) for a, b in raw_edges if a != b})
    if not edges:
        return
    _run_scc(spark, edges)  # asserts equality against the brute closure
