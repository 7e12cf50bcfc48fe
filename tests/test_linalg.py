"""Distributed Gram matrix (operators/linalg.py)."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nemsis_xml_parser_spark.operators.linalg import gram_matrix  # noqa: E402


def _df(spark, x):
    return spark.createDataFrame(
        [(list(map(float, row)),) for row in x], "embedding array<double>"
    )


def test_matches_numpy_gram(spark):
    rng = np.random.default_rng(11)
    x = rng.normal(size=(200, 6))
    got = {
        (r.i, r.j): r.gram
        for r in gram_matrix(_df(spark, x), "embedding").collect()
    }
    want = x.T @ x
    assert len(got) == 6 * 7 // 2
    for (i, j), v in got.items():
        assert i <= j
        assert abs(v - want[i, j]) < 1e-9


def test_invariant_to_partitioning(spark):
    rng = np.random.default_rng(5)
    x = rng.normal(size=(64, 4))
    base = {
        (r.i, r.j): round(r.gram, 6)
        for r in gram_matrix(_df(spark, x), "embedding").collect()
    }
    rep = {
        (r.i, r.j): round(r.gram, 6)
        for r in gram_matrix(
            _df(spark, x).repartition(7), "embedding"
        ).collect()
    }
    assert base == rep


def test_full_matrix_symmetric(spark):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(30, 3))
    full = {
        (r.i, r.j): r.gram
        for r in gram_matrix(_df(spark, x), "embedding", upper_only=False).collect()
    }
    assert len(full) == 9
    for i in range(3):
        for j in range(3):
            assert abs(full[(i, j)] - full[(j, i)]) < 1e-12


def test_gram_power_components_matches_decimal_replay(spark):
    """The one-row-matrix eigsolve must reproduce the documented
    round-12 + exact-decimal arithmetic bit-for-bit — replicated here
    independently with Python Decimal (the oracle's formulation)."""
    import random
    from decimal import Decimal, ROUND_HALF_UP

    from nemsis_xml_parser_spark.operators.linalg import (
        gram_power_components,
    )

    dim, k, iters = 8, 2, 3
    rng = random.Random(23)
    full = [
        [0.0] * dim for _ in range(dim)
    ]
    rows = []
    for i in range(dim):
        for j in range(i, dim):
            g = round(rng.uniform(-1.5, 2.0) + (8.0 if i == j else 0.0), 9)
            full[i][j] = full[j][i] = g
            rows.append((i, j, g))
    gdf = spark.createDataFrame(rows, "i int, j int, gram double")

    def r12(x: float) -> float:
        return float(
            Decimal(repr(x)).quantize(Decimal("1e-12"), rounding=ROUND_HALF_UP)
        )

    def dsum12(terms):
        acc = Decimal(0)
        for t in terms:
            acc += Decimal(repr(r12(t)))
        return float(acc)

    g = [row[:] for row in full]
    expect = {}
    for c in range(k):
        v = [1.0] + [0.0] * (dim - 1)
        for _ in range(iters):
            u = [dsum12(g[i][j] * v[j] for j in range(dim)) for i in range(dim)]
            nrm = dsum12(x * x for x in u) ** 0.5
            v = [r12(x / nrm) for x in u]
        for i in range(dim):
            expect[(c, i)] = (v[i], nrm)
        g = [
            [r12(g[i][j] - nrm * v[i] * v[j]) for j in range(dim)]
            for i in range(dim)
        ]
    got = {
        (r["comp_idx"], r["i"]): (r["vc"], r["eigenvalue"])
        for r in gram_power_components(gdf, dim=dim, k=k, iters=iters).collect()
    }
    assert got == expect
