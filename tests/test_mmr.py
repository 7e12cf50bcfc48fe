"""MMR diversified rerank: hand-checked greedy path + diversification."""

from __future__ import annotations

import pytest

from nemsis_xml_parser_spark.operators.similarity import (
    mmr_rerank,
    pairwise_cosines,
)


def test_greedy_path_hand_computed(spark):
    # rel: a=0.9 b=0.85 c=0.5; a~b near-dupes (sim .99), c distant (.1)
    cand = spark.createDataFrame(
        [(1, 0.9), (2, 0.85), (3, 0.5)], "vec_id long, rel double"
    )
    sims = spark.createDataFrame(
        [(1, 2, 0.99), (2, 1, 0.99), (1, 3, 0.1), (3, 1, 0.1),
         (2, 3, 0.1), (3, 2, 0.1)],
        "ia long, ib long, sim double",
    )
    out = {r["pick"]: (r["vec_id"], r["score"])
           for r in mmr_rerank(cand, sims, k=3, lam=0.7, mu=0.3).collect()}
    # pick1: a (0.63); pick2: b scores .7*.85-.3*.99=.298 < c .35-.03=.32 → c
    # pick3: b (.298)
    assert out[1] == (1, pytest.approx(0.63))
    assert out[2] == (3, pytest.approx(0.32))
    assert out[3] == (2, pytest.approx(0.298))


def test_pure_relevance_when_mu_zero(spark):
    cand = spark.createDataFrame(
        [(1, 0.9), (2, 0.85), (3, 0.5)], "vec_id long, rel double"
    )
    sims = spark.createDataFrame(
        [(1, 2, 0.99), (2, 1, 0.99), (1, 3, 0.1), (3, 1, 0.1),
         (2, 3, 0.1), (3, 2, 0.1)],
        "ia long, ib long, sim double",
    )
    picks = [r["vec_id"] for r in
             mmr_rerank(cand, sims, k=3, lam=1.0, mu=0.0)
             .orderBy("pick").collect()]
    assert picks == [1, 2, 3]  # mu=0 degenerates to relevance order


def test_score_tie_breaks_on_vec_id(spark):
    cand = spark.createDataFrame(
        [(7, 0.5), (3, 0.5)], "vec_id long, rel double"
    )
    sims = spark.createDataFrame(
        [(7, 3, 0.2), (3, 7, 0.2)], "ia long, ib long, sim double"
    )
    picks = [r["vec_id"] for r in
             mmr_rerank(cand, sims, k=2).orderBy("pick").collect()]
    assert picks == [3, 7]


def test_k_validation(spark):
    cand = spark.createDataFrame([(1, 0.5)], "vec_id long, rel double")
    sims = spark.createDataFrame([], "ia long, ib long, sim double")
    with pytest.raises(ValueError):
        mmr_rerank(cand, sims, k=0)


def test_pairwise_cosines_symmetric_no_self(spark):
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 2.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {(r["ia"], r["ib"]): r["sim"] for r in pairwise_cosines(vecs).collect()}
    assert len(rows) == 6 and (1, 1) not in rows
    assert rows[(1, 2)] == rows[(2, 1)] == 0.0
    assert rows[(1, 3)] == pytest.approx(0.707107)
