"""Incremental MSF maintenance: sparsification parity vs batch Borůvka,
replay idempotency, streaming e2e."""

from __future__ import annotations

import random

from nemsis_xml_parser_spark.operators.mst import boruvka_forest
from nemsis_xml_parser_spark.streaming.msf import (
    canonical_min_edges,
    empty_forest,
    merge_msf_batch,
    read_forest,
    start_msf_maintenance,
)


def _df(spark, triples):
    return spark.createDataFrame(triples, "u long, v long, w long")


def _forest_set(df):
    return {(r.u, r.v, r.w) for r in df.collect()}


def _batch_msf(spark, triples):
    picked, _ = boruvka_forest(
        canonical_min_edges(_df(spark, triples)), 20
    )
    return _forest_set(picked.select("u", "v", "w"))


def _random_batches(seed, n_batches, per_batch, n_nodes=25):
    rng = random.Random(seed)
    batches = []
    for _ in range(n_batches):
        b = []
        for _ in range(per_batch):
            u, v = rng.randrange(n_nodes), rng.randrange(n_nodes)
            if u != v:
                b.append((u, v, rng.randrange(1, 50)))
        batches.append(b)
    return batches


def test_fold_parity_random_batches(spark):
    batches = _random_batches(80, 3, 10)
    forest, seen = empty_forest(spark), []
    for b in batches:
        seen += b
        forest = merge_msf_batch(forest, _df(spark, b))
        assert _forest_set(forest) == _batch_msf(spark, seen)


def test_cheaper_parallel_edge_displaces_forest_edge(spark):
    forest = merge_msf_batch(
        empty_forest(spark), _df(spark, [(1, 2, 9), (2, 3, 5)])
    )
    assert _forest_set(forest) == {(1, 2, 9), (2, 3, 5)}
    # a cheaper (1,2) edge must replace the weight-9 one
    forest = merge_msf_batch(forest, _df(spark, [(1, 2, 2)]))
    assert _forest_set(forest) == {(1, 2, 2), (2, 3, 5)}


def test_cycle_edge_rejected(spark):
    forest = merge_msf_batch(
        empty_forest(spark), _df(spark, [(1, 2, 1), (2, 3, 1)])
    )
    forest = merge_msf_batch(forest, _df(spark, [(1, 3, 10)]))
    assert _forest_set(forest) == {(1, 2, 1), (2, 3, 1)}


def test_replay_idempotent(spark):
    b1, b2 = [(1, 2, 3), (3, 4, 1)], [(2, 3, 2), (1, 4, 9)]
    forest = merge_msf_batch(empty_forest(spark), _df(spark, b1))
    forest = merge_msf_batch(forest, _df(spark, b2))
    replay = merge_msf_batch(forest, _df(spark, b2))
    assert _forest_set(replay) == _forest_set(forest)
    assert _forest_set(replay) == _batch_msf(spark, b1 + b2)


def test_streaming_e2e_matches_batch(spark, tmp_path):
    batches = _random_batches(81, 3, 8)
    src = tmp_path / "edges"
    src.mkdir()
    for i, b in enumerate(batches):
        _df(spark, b).coalesce(1).write.parquet(str(src / f"b{i}"))
    stream = (
        spark.readStream.schema("u long, v long, w long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = start_msf_maintenance(
        stream, str(tmp_path / "state"), str(tmp_path / "cp")
    )
    q.awaitTermination(180)
    got = _forest_set(read_forest(spark, str(tmp_path / "state")))
    assert got == _batch_msf(spark, [t for b in batches for t in b])
