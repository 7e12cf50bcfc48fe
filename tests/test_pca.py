"""Power-iteration PCA (operators/pca.py): agreement with numpy's exact
eigendecomposition, determinism, and the uncentered variant."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F  # noqa: F401

from nemsis_xml_parser_spark.operators.pca import power_iteration_top_component


def _cloud(seed: int = 11, n: int = 200, dim: int = 8) -> np.ndarray:
    rng = np.random.default_rng(seed)
    # anisotropic cloud: one dominant direction with 5x the spread
    basis = np.linalg.qr(rng.normal(size=(dim, dim)))[0]
    scales = np.array([5.0, 2.0] + [0.5] * (dim - 2))
    return rng.normal(size=(n, dim)) @ (basis * scales).T + rng.normal(size=dim)


def _spark_component(spark, X: np.ndarray, iters: int, center: bool = True):
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    rows = power_iteration_top_component(
        df, dim=X.shape[1], iters=iters, center=center
    ).collect()
    v = np.array([r["component"] for r in sorted(rows, key=lambda r: r["i"])])
    return v, rows[0]["eigenvalue"], rows[0]["n_vectors"]


def test_matches_numpy_top_eigenvector(spark):
    X = _cloud()
    v, lam, n = _spark_component(spark, X, iters=6)
    assert n == len(X)
    cov = np.cov(X.T, bias=True)  # population covariance — matches ‖u‖/n
    w, U = np.linalg.eigh(cov)
    top_vec, top_val = U[:, -1], w[-1]
    # direction agreement up to sign, eigenvalue within 1%
    assert abs(float(np.dot(v, top_vec))) > 0.999
    assert math.isclose(lam, float(top_val), rel_tol=0.01)
    assert math.isclose(float(np.linalg.norm(v)), 1.0, rel_tol=1e-6)


def test_deterministic_across_runs(spark):
    X = _cloud(seed=3, n=80, dim=6)
    a = _spark_component(spark, X, iters=3)
    b = _spark_component(spark, X, iters=3)
    assert a[0].tolist() == b[0].tolist() and a[1] == b[1]


def test_topk_deflation_matches_numpy(spark):
    # distinct spectral gaps: with a degenerate tail (equal eigenvalues)
    # the trailing eigenVECTOR is not unique and the comparison would be
    # ill-posed, so separate the top three scales explicitly
    rng = np.random.default_rng(7)
    basis = np.linalg.qr(rng.normal(size=(8, 8)))[0]
    scales = np.array([5.0, 2.5, 1.2] + [0.3] * 5)
    X = rng.normal(size=(150, 8)) @ (basis * scales).T + rng.normal(size=8)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    from nemsis_xml_parser_spark.operators.pca import power_iteration_components

    rows = power_iteration_components(df, dim=8, k=3, iters=8).collect()
    comps = {}
    lams = {}
    for r in rows:
        comps.setdefault(r["comp_idx"], {})[r["i"]] = r["component"]
        lams[r["comp_idx"]] = r["eigenvalue"]
    V3 = np.array([[comps[c][i] for i in range(8)] for c in range(3)])
    w, U = np.linalg.eigh(np.cov(X.T, bias=True))
    for c in range(3):
        ref = U[:, -1 - c]
        assert abs(float(np.dot(V3[c], ref))) > 0.99, f"component {c} off-axis"
        assert math.isclose(lams[c], float(w[-1 - c]), rel_tol=0.05)
    # extracted directions are mutually orthogonal (deflation worked)
    gram = V3 @ V3.T
    assert np.allclose(gram, np.eye(3), atol=1e-3)
    # eigenvalues strictly decreasing for this anisotropic cloud
    assert lams[0] > lams[1] > lams[2]


def test_uncentered_tracks_second_moment(spark):
    # with a large mean offset, the UNcentered dominant direction aligns
    # with the mean, not the covariance axis — proves center=False is a
    # genuinely different (second-moment) computation
    X = _cloud(seed=5, n=100, dim=6) + 50.0
    v, lam, _ = _spark_component(spark, X, iters=6, center=False)
    mean_dir = X.mean(axis=0) / np.linalg.norm(X.mean(axis=0))
    assert abs(float(np.dot(v, mean_dir))) > 0.99
    assert lam > 100  # dominated by the offset's second moment
