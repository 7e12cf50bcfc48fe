"""Streaming Count-Min: fold parity vs the batch cell table (sums of
batch deltas = cells of the union), replay idempotence via batch-keyed
OVERWRITE, and the watermark-compaction crash-window guarantee (folded
dirs still on disk are never double-counted)."""

from __future__ import annotations

import pyspark.sql.functions as F

from nemsis_xml_parser_spark.operators.sketches import (
    countmin_cells,
    countmin_estimate,
)
from nemsis_xml_parser_spark.streaming.countmin import (
    compact_cm_cells,
    read_cm_cells,
    read_cm_estimates,
    start_countmin_stream,
)

D, W = 4, 256


def _batch_truth(spark, rows):
    df = spark.createDataFrame(rows, "k string")
    keyed = df.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    cells = {
        (r.i, r.pos): r.total
        for r in countmin_cells(keyed, "k", "cnt", D, W).collect()
    }
    true = {r.k: r.cnt for r in keyed.collect()}
    est = {
        r.k: r.cm_estimate
        for r in countmin_estimate(
            keyed.select("k"),
            countmin_cells(keyed, "k", "cnt", D, W),
            "k",
            D,
            W,
        ).collect()
    }
    return cells, true, est


def _run_stream(spark, tmp_path, cp, compact_every=None):
    stream = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src" / "f*"))
    )
    q = start_countmin_stream(
        stream,
        str(tmp_path / "state"),
        str(tmp_path / "est"),
        str(tmp_path / cp),
        key_col="k",
        depth=D,
        width=W,
        compact_every=compact_every,
    )
    q.awaitTermination()


def test_stream_cells_match_batch_and_estimates_bound(spark, tmp_path):
    rows = [(f"k{i % 13}",) for i in range(400)] + [("hot",)] * 200
    src = tmp_path / "src"
    for i in range(3):
        spark.createDataFrame(rows[i::3], "k string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"f{i}"))
    _run_stream(spark, tmp_path, "cp")
    want_cells, true, want_est = _batch_truth(spark, rows)
    got_cells = {
        (r.i, r.pos): r.total
        for r in read_cm_cells(spark, str(tmp_path / "state")).collect()
    }
    assert got_cells == want_cells  # sum-of-deltas = cells of the union
    ests = read_cm_estimates(spark, str(tmp_path / "est"))
    last_bid = ests.agg(F.max("batch_id")).collect()[0][0]
    last = {
        r.k: r.cm_estimate
        for r in ests.where(F.col("batch_id") == last_bid).collect()
    }
    # the final batch's estimates read the FULL corpus sketch
    for k, e in last.items():
        assert e == want_est[k]
        assert e >= true[k]  # Count-Min never underestimates


def test_replay_is_idempotent_and_compaction_watermark_holds(
    spark, tmp_path
):
    rows = [(f"k{i % 7}",) for i in range(200)]
    src = tmp_path / "src"
    for i in range(4):
        spark.createDataFrame(rows[i::4], "k string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"f{i}"))
    # compact_every=2: two compactions happen mid-stream
    _run_stream(spark, tmp_path, "cp", compact_every=2)
    s1 = sorted(
        map(tuple, read_cm_cells(spark, str(tmp_path / "state")).collect())
    )
    want_cells, _, _ = _batch_truth(spark, rows)
    assert dict(((i, p), t) for i, p, t in s1) == want_cells
    # replay everything with a fresh checkpoint: batch-keyed OVERWRITE
    # keeps the delta set idempotent even though addition is not
    _run_stream(spark, tmp_path, "cp2", compact_every=None)
    s2 = sorted(
        map(tuple, read_cm_cells(spark, str(tmp_path / "state")).collect())
    )
    assert s1 == s2
    # crash-window simulation: compact WITHOUT the dir GC having run —
    # folded dirs still on disk must be ignored by the watermark
    import shutil

    state = str(tmp_path / "state")
    ver_before = sorted(
        map(tuple, read_cm_cells(spark, state).collect())
    )
    compact_cm_cells(spark, state)
    # resurrect a folded delta dir by replaying batch 0's write shape:
    # copy the compacted parquet as a fake stale dir with a LOW batch id
    # (<= watermark) — readers must not add it in
    import glob

    stale = f"{state}/batch=0"
    spark.createDataFrame(
        [(0, 0, 10**9)], "i int, pos long, total long"
    ).coalesce(1).write.mode("overwrite").parquet(stale)
    after = sorted(map(tuple, read_cm_cells(spark, state).collect()))
    assert after == ver_before
