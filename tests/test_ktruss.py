"""k-truss peeling: closed-form cores on K4/triangle/bowtie graphs,
cascade deletion, validation."""

from __future__ import annotations

import pytest

from nemsis_xml_parser_spark.operators.ktruss import ktruss_edges


def edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "u bigint, v bigint")


def truss_set(df):
    return {(r["u"], r["v"], r["support"]) for r in df.collect()}


K4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]


def test_k4_is_a_4truss(spark):
    got = truss_set(ktruss_edges(edges_df(spark, K4), k=4, rounds=3))
    assert got == {(u, v, 2) for u, v in K4}


def test_pendant_edge_peeled_off(spark):
    got = truss_set(
        ktruss_edges(edges_df(spark, K4 + [(4, 9)]), k=4, rounds=3)
    )
    assert got == {(u, v, 2) for u, v in K4}


def test_triangle_survives_k3_not_k4(spark):
    tri = [(1, 2), (1, 3), (2, 3)]
    assert truss_set(ktruss_edges(edges_df(spark, tri), k=3, rounds=2)) == {
        (1, 2, 1),
        (1, 3, 1),
        (2, 3, 1),
    }
    assert truss_set(ktruss_edges(edges_df(spark, tri), k=4, rounds=2)) == set()


def test_bowtie_cascade_deletion(spark):
    # two triangles sharing edge (1,2): the shared edge has support 2 and
    # survives round 1, but its triangles die with the outer edges — it
    # must fall in round 2 (the reason peeling iterates)
    bowtie = [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)]
    assert (
        truss_set(ktruss_edges(edges_df(spark, bowtie), k=4, rounds=2)) == set()
    )


def test_invalid_params_raise(spark):
    e = edges_df(spark, [(1, 2)])
    with pytest.raises(ValueError):
        ktruss_edges(e, k=2, rounds=1)
    with pytest.raises(ValueError):
        ktruss_edges(e, k=4, rounds=0)
