"""Historical winnowing index stream: fold parity vs the batch pair
generator, replay idempotency, stateful stop-list monotonicity."""

from __future__ import annotations

import pyspark.sql.functions as F

from nemsis_xml_parser_spark.operators.winnow import winnowing_pairs
from nemsis_xml_parser_spark.streaming.winnow_index import (
    candidates_against_fp_index,
    read_fp_index,
    read_winnow_pairs,
    start_winnow_index_stream,
    winnowing_fingerprints,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus(k: int):
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "a completely different document about spark shuffle partition sizing",
        "training data curation needs careful deduplication at corpus scale",
    ]
    rows = []
    for i in range(k):
        t = base[i % 3]
        if i % 4 == 0 and i > 0:
            t = t + " with a tiny suffix tweak appended here"
        rows.append((i, t))
    return rows


def test_fold_matches_batch_pairs(spark, tmp_path):
    """With the guard off, the union of per-batch candidates equals the
    batch algorithm on the full corpus — including shared counts."""
    rows = _corpus(18)
    batches = [rows[0:6], rows[6:12], rows[12:18]]
    index = read_fp_index(spark, str(tmp_path / "idx"))
    got = set()
    for b in batches:
        fps = winnowing_fingerprints(_docs(spark, b), max_df=None)
        pairs = candidates_against_fp_index(
            fps, index, max_df=None, min_shared=1
        )
        got |= {(r.doc_a, r.doc_b, r.shared) for r in pairs.collect()}
        index = index.unionByName(fps)
    exp = {
        (r.doc_a, r.doc_b, r.shared)
        for r in winnowing_pairs(
            _docs(spark, rows), max_df=None, min_shared=1
        ).collect()
    }
    assert got == exp


def test_streaming_e2e_and_replay_stability(spark, tmp_path):
    rows = _corpus(12)
    src = tmp_path / "docs"
    for i, chunk in enumerate([rows[0:4], rows[4:8], rows[8:12]]):
        _docs(spark, chunk).coalesce(1).write.mode("overwrite").parquet(
            str(src / f"f{i}")
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "f*"))
    )
    q = start_winnow_index_stream(
        stream,
        str(tmp_path / "idx"),
        str(tmp_path / "pairs"),
        str(tmp_path / "cp"),
        max_df=None,
        min_shared=1,
    )
    q.awaitTermination()
    got = {
        (r.doc_a, r.doc_b, r.shared)
        for r in read_winnow_pairs(spark, str(tmp_path / "pairs")).collect()
    }
    exp = {
        (r.doc_a, r.doc_b, r.shared)
        for r in winnowing_pairs(
            _docs(spark, rows), max_df=None, min_shared=1
        ).collect()
    }
    assert got == exp
    # index is append-only with one dir per batch, unguarded fingerprints
    idx = read_fp_index(spark, str(tmp_path / "idx"))
    assert idx.select("doc_id").distinct().count() == 12
    # replaying a batch (simulated: overwrite its outputs by re-running
    # the fold on the same inputs) leaves the pair set unchanged
    fps0 = winnowing_fingerprints(_docs(spark, rows[0:4]), max_df=None)
    replay = candidates_against_fp_index(fps0, idx, max_df=None, min_shared=1)
    replay.write.mode("overwrite").parquet(str(tmp_path / "pairs" / "batch=0"))
    fps0.write.mode("overwrite").parquet(str(tmp_path / "idx" / "batch=0"))
    again = {
        (r.doc_a, r.doc_b, r.shared)
        for r in read_winnow_pairs(spark, str(tmp_path / "pairs")).collect()
    }
    assert again == got


def test_stop_list_is_monotone(spark, tmp_path):
    """Once a fingerprint's cumulative df crosses max_df it stops
    generating candidates: a boilerplate template that goes hot in a
    later batch produces no new pairs from that point on."""
    boiler = "this license header repeats verbatim in every generated file"
    rows = [(i, boiler) for i in range(12)]
    batches = [rows[0:3], rows[3:12]]
    index = read_fp_index(spark, str(tmp_path / "idx"))
    per_batch = []
    for b in batches:
        fps = winnowing_fingerprints(_docs(spark, b), max_df=None)
        pairs = candidates_against_fp_index(
            fps, index, max_df=4, min_shared=1
        )
        per_batch.append({(r.doc_a, r.doc_b) for r in pairs.collect()})
        index = index.unionByName(fps)
    # batch 1: 3 docs, df=3 <= 4 -> all 3 pairs emitted
    assert per_batch[0] == {(0, 1), (0, 2), (1, 2)}
    # batch 2 pushes df to 12 > 4 -> the stop-list swallows everything
    assert per_batch[1] == set()
