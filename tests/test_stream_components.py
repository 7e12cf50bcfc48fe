"""Incremental CC maintenance: fold parity vs batch, idempotency,
streaming e2e through the txlog store."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from nemsis_xml_parser_spark.operators.components import connected_components
from nemsis_xml_parser_spark.streaming.components import (
    empty_state,
    merge_components_batch,
    read_state,
    start_components_maintenance,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs or [(None, None)], "src long, dst long").where(
        F.col("src").isNotNull()
    )


def _state_dict(df):
    return {r.node: r.component for r in df.collect()}


def _batch_cc(spark, pairs):
    return _state_dict(connected_components(_edges_df(spark, pairs)))


def test_fold_parity_random_batches(spark):
    rng = random.Random(8)
    all_pairs: list[tuple[int, int]] = []
    state = empty_state(spark)
    for _ in range(4):
        batch = [
            (rng.randrange(0, 40), rng.randrange(0, 40)) for _ in range(12)
        ]
        batch = [(a, b) for a, b in batch if a != b]
        all_pairs += batch
        state = merge_components_batch(state, _edges_df(spark, batch))
        assert _state_dict(state) == _batch_cc(spark, all_pairs)


def test_new_node_undercuts_existing_root(spark):
    state = merge_components_batch(
        empty_state(spark), _edges_df(spark, [(5, 7)])
    )
    assert _state_dict(state) == {5: 5, 7: 5}
    state = merge_components_batch(state, _edges_df(spark, [(3, 5)]))
    # the new smaller id must become the component label of 5 AND 7
    assert _state_dict(state) == {3: 3, 5: 3, 7: 3}


def test_batch_bridging_two_existing_components(spark):
    state = merge_components_batch(
        empty_state(spark), _edges_df(spark, [(1, 2), (10, 11)])
    )
    assert _state_dict(state) == {1: 1, 2: 1, 10: 10, 11: 10}
    state = merge_components_batch(state, _edges_df(spark, [(2, 11)]))
    assert _state_dict(state) == {1: 1, 2: 1, 10: 1, 11: 1}


def test_fold_is_idempotent_under_replay(spark):
    b1, b2 = [(1, 2), (2, 3)], [(3, 4), (8, 9)]
    state = merge_components_batch(empty_state(spark), _edges_df(spark, b1))
    state = merge_components_batch(state, _edges_df(spark, b2))
    replayed = merge_components_batch(state, _edges_df(spark, b2))
    assert _state_dict(replayed) == _state_dict(state)
    assert _state_dict(replayed) == _batch_cc(spark, b1 + b2)


def test_internal_edges_change_nothing(spark):
    state = merge_components_batch(
        empty_state(spark), _edges_df(spark, [(1, 2), (2, 3)])
    )
    again = merge_components_batch(state, _edges_df(spark, [(1, 3)]))
    assert _state_dict(again) == _state_dict(state)


def test_streaming_e2e_matches_batch(spark, tmp_path):
    src_dir = tmp_path / "edges"
    src_dir.mkdir()
    state_root = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    rng = random.Random(17)
    all_pairs = []
    for i in range(3):
        batch = [
            (rng.randrange(0, 30), rng.randrange(0, 30)) for _ in range(10)
        ]
        batch = [(a, b) for a, b in batch if a != b]
        all_pairs += batch
        _edges_df(spark, batch).coalesce(1).write.parquet(
            str(src_dir / f"b{i}")
        )

    stream = (
        spark.readStream.schema("src long, dst long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "*"))
    )
    q = start_components_maintenance(stream, state_root, ckpt)
    q.awaitTermination(120)

    got = _state_dict(read_state(spark, state_root))
    assert got == _batch_cc(spark, all_pairs)
