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
