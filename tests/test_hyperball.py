"""Unit tests: HyperBall / ANF neighborhood-function estimation
(operators/hyperball.py) — exact closure counts against brute-force
reachability, sketch sanity, and determinism."""

from __future__ import annotations

import pytest

from nemsis_xml_parser_spark.operators.hyperball import hyperball_anf


def _balls_brute(edges, max_t):
    nodes = sorted({n for e in edges for n in e})
    adj = {n: set() for n in nodes}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    balls = {v: {v} for v in nodes}
    out = [sum(len(b) for b in balls.values())]
    for _ in range(max_t):
        balls = {
            v: b | set().union(*(balls[u] for u in adj[v])) if adj[v] else b
            for v, b in balls.items()
        }
        out.append(sum(len(b) for b in balls.values()))
    return out


def _sym(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    import pyspark.sql.functions as F

    return df.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        df.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )


def test_hyperball_exact_closure_matches_brute(spark):
    # path + triangle + isolated pair: hand-checkable ball growth
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 3), (10, 11)]
    adj = _sym(spark, edges)
    rows = {r["hop"]: r for r in hyperball_anf(adj, max_t=3).collect()}
    want = _balls_brute(edges, 3)
    assert [rows[t]["n_pairs_exact"] for t in range(4)] == want
    # rel_error is consistent with the reported estimate and exact count
    for t in range(4):
        r = rows[t]
        assert r["rel_error"] == pytest.approx(
            abs(r["anf_estimate"] - r["n_pairs_exact"]) / r["n_pairs_exact"],
            abs=1e-6,
        )


def test_hyperball_estimate_grows_and_brackets(spark):
    # 30-node random-ish graph: the ANF estimate must be monotone in t
    # (register max-merge only grows) and within coarse sketch error
    edges = sorted(
        {((i * 7) % 30, (i * 11 + 1) % 30) for i in range(50)}
    )
    edges = [(a, b) for a, b in edges if a != b]
    adj = _sym(spark, edges)
    rows = sorted(hyperball_anf(adj, max_t=3).collect(), key=lambda r: r["hop"])
    ests = [r["anf_estimate"] for r in rows]
    assert all(b >= a for a, b in zip(ests, ests[1:]))
    for r in rows:
        assert r["rel_error"] < 0.5  # 64-register sketch, coarse bound


def test_hyperball_deterministic(spark):
    edges = [(i, (i * 3 + 1) % 17) for i in range(17)]
    edges = [(a, b) for a, b in edges if a != b]
    adj = _sym(spark, edges)
    runs = [
        sorted(map(tuple, hyperball_anf(adj, max_t=2).collect()))
        for _ in range(2)
    ]
    assert runs[0] == runs[1]
