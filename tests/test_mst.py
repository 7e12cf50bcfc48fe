"""Unit tests for Borůvka MSF (operators/mst.py) and the stats-reset
lineage cut (operators/lineage.py)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pyspark.sql.functions as F  # noqa: E402

from nemsis_xml_parser_spark.operators.lineage import cut_lineage  # noqa: E402
from nemsis_xml_parser_spark.operators.mst import boruvka_forest  # noqa: E402


def _edges(spark, triples):
    return spark.createDataFrame(sorted(triples), "u long, v long, w long")


def _py_mst(triples):
    """Kruskal with (w, u, v) tie-break — the unique MSF under the total
    order, the ground truth boruvka_forest must converge to."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    picked = set()
    for w, u, v in sorted((w, u, v) for u, v, w in triples):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            picked.add((u, v, w))
    return picked


def test_two_triangles_bridge(spark):
    # two triangles joined by a heavy bridge: MSF = 2 cheap edges per
    # triangle + the bridge (5 edges, n=6)
    triples = [
        (1, 2, 1), (2, 3, 2), (1, 3, 9),
        (4, 5, 1), (5, 6, 2), (4, 6, 9),
        (3, 4, 100),
    ]
    picked, comp = boruvka_forest(_edges(spark, triples), rounds=4)
    got = {(r.u, r.v, r.w) for r in picked.collect()}
    assert got == _py_mst(triples)
    assert comp.select("c").distinct().count() == 1


def test_weight_ties_total_order(spark):
    # all weights equal: (w, u, v) tie-break still yields a unique MSF
    triples = [(1, 2, 5), (2, 3, 5), (1, 3, 5), (3, 4, 5), (2, 4, 5)]
    picked, _ = boruvka_forest(_edges(spark, triples), rounds=3)
    got = {(r.u, r.v, r.w) for r in picked.collect()}
    assert got == _py_mst(triples)


def test_forest_multiple_components(spark):
    # two disjoint paths: MSF keeps every edge, 2 components remain
    triples = [(1, 2, 3), (2, 3, 4), (10, 11, 1)]
    picked, comp = boruvka_forest(_edges(spark, triples), rounds=3)
    assert {(r.u, r.v, r.w) for r in picked.collect()} == set(triples)
    assert comp.select("c").distinct().count() == 2


def test_random_matches_kruskal(spark):
    import random

    rng = random.Random(8)
    nodes = list(range(40))
    triples = {
        (min(a, b), max(a, b))
        for a, b in (rng.sample(nodes, 2) for _ in range(120))
    }
    triples = [(u, v, rng.randrange(50)) for u, v in sorted(triples)]
    picked, _ = boruvka_forest(_edges(spark, triples), rounds=6)
    assert {(r.u, r.v, r.w) for r in picked.collect()} == _py_mst(triples)


def test_round_tags_monotone_counts(spark):
    import random

    rng = random.Random(9)
    triples = [
        (i, rng.randrange(i + 1, 30), rng.randrange(100))
        for i in range(29)
    ]
    picked, _ = boruvka_forest(_edges(spark, triples), rounds=5)
    per_round = {
        r["round"]: r["n"]
        for r in picked.groupBy("round").agg(F.count("*").alias("n")).collect()
    }
    # components at least halve per round, so picked counts are
    # non-increasing across rounds
    rounds = sorted(per_round)
    assert all(
        per_round[a] >= per_round[b] for a, b in zip(rounds, rounds[1:])
    )


def test_cut_lineage_rows_and_stats(spark):
    df = spark.range(100).select(
        F.col("id").alias("c"), (F.col("id") % 7).alias("par")
    )
    cut = cut_lineage(df)
    assert sorted(r.c for r in cut.collect()) == list(range(100))
    assert cut.schema == df.schema

    def digits(d):
        s = d._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        return len(str(s))

    # the regression this module exists for: digit count of sizeInBytes
    # must stay bounded through iterated self-join + cut rounds
    par = cut
    for _ in range(6):
        b = par.select(F.col("c").alias("bc"), F.col("par").alias("bpar"))
        par = cut_lineage(
            par.join(b, par["par"] == b["bc"], "left").select(
                "c", F.coalesce("bpar", "par").alias("par")
            )
        )
    assert digits(par) < 25
    assert par.count() == 100


def test_resolve_roots_local_matches_distributed(spark):
    """The single-task root-resolution endgame must be bit-identical to
    the distributed pointer-jump doubling on valid Borůvka pointer
    graphs (only 2-cycles; every referenced component has a pointer)."""
    import random

    from nemsis_xml_parser_spark.operators.mst import (
        _resolve_roots,
        _resolve_roots_local,
    )

    rng = random.Random(1413)
    for trial in range(4):
        # mutual pairs first (the 2-cycles), then chain nodes pointing at
        # any already-present component — acyclic beyond the 2-cycles,
        # exactly the shape a total-order min-edge pick produces
        ids = rng.sample(range(1, 10_000), 120)
        ptr = {}
        for a, b in zip(ids[0:20:2], ids[1:20:2]):
            ptr[a], ptr[b] = b, a
        present = list(ptr)
        for c in ids[20:]:
            ptr[c] = rng.choice(present)
            present.append(c)
        df = spark.createDataFrame(
            sorted(ptr.items()), "c long, oc long"
        ).transform(cut_lineage)
        got_local = {
            (r["c"], r["root"]) for r in _resolve_roots_local(df).collect()
        }
        got_dist = {
            (r["c"], r["root"])
            for r in _resolve_roots(df, small=(trial % 2 == 0)).collect()
        }
        assert got_local == got_dist
