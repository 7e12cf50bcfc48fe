"""Streaming IVF index maintenance: parity with the batch-built index,
replay/crash duplicate immunity, compaction boundedness."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from nemsis_xml_parser_spark.operators.ivf import assign_cells
from nemsis_xml_parser_spark.streaming.ivf_index import (
    compact_ivf_cells,
    ivf_stream_index_topk,
    read_ivf_cells,
    read_ivf_centroids,
    start_ivf_index_stream,
)

SRC = "/root/testdata/sf0.001/embeddings.parquet"


def _stage(spark, tmp_path, n_files=3):
    src = tmp_path / "vecs"
    e = spark.read.parquet(SRC).select("vec_id", "embedding").limit(240)
    # deterministic file split by id range so "the first batch" is a
    # well-defined set under maxFilesPerTrigger=1
    n = 240 // n_files
    for i in range(n_files):
        e.where(
            (F.col("vec_id") >= i * n) & (F.col("vec_id") < (i + 1) * n)
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"f{i}"))
    return e, str(src)


def _run(spark, src, idx_root, cp, **kw):
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    q = start_ivf_index_stream(stream, idx_root, cp, **kw)
    q.awaitTermination()


def test_stream_index_matches_batch_assignment(spark, tmp_path):
    e, src = _stage(spark, tmp_path)
    idx = str(tmp_path / "idx")
    _run(spark, src, idx, str(tmp_path / "cp"), compact_every=None)
    centroids = read_ivf_centroids(spark, idx)
    assert centroids is not None and centroids.count() == 8
    got = {
        (r.cid, r.item_id)
        for r in read_ivf_cells(spark, idx).collect()
    }
    exp = {
        (r.cid, r.item_id)
        for r in assign_cells(e, centroids).collect()
    }
    assert got == exp
    assert len(got) == 240
    # search returns k ranked rows per query with the index's ids
    out = ivf_stream_index_topk(
        spark, idx, e.where(F.col("vec_id") < 3), k=5, nprobe=8
    )
    rows = out.collect()
    assert {r.query_id for r in rows} == {0, 1, 2}
    assert all(1 <= r.rank <= 5 for r in rows)


def test_replay_duplicates_do_not_shift_topk(spark, tmp_path):
    e, src = _stage(spark, tmp_path)
    idx = str(tmp_path / "idx")
    _run(spark, src, idx, str(tmp_path / "cp"), compact_every=2)
    queries = e.where(F.col("vec_id") < 5)
    before = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in ivf_stream_index_topk(spark, idx, queries, k=5).collect()
    )
    # simulate a replay after compaction folded batch 0: re-append the
    # first file's assignments as a fresh batch=0 dir (the crash window
    # that leaves duplicate rows visible)
    centroids = read_ivf_centroids(spark, idx)
    first = spark.read.parquet(f"{src}/f0")
    assign_cells(first, centroids).write.mode("overwrite").partitionBy(
        "cid"
    ).parquet(f"{idx}/cells/batch=0")
    view = read_ivf_cells(spark, idx)
    assert view.count() > view.dropDuplicates(["cid", "item_id"]).count()
    after = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in ivf_stream_index_topk(spark, idx, queries, k=5).collect()
    )
    assert after == before  # duplicate-immune search
    # the next compaction folds the duplicates away
    compact_ivf_cells(spark, idx)
    folded = read_ivf_cells(spark, idx)
    assert folded.count() == folded.dropDuplicates(["cid", "item_id"]).count()
    assert folded.count() == 240


def test_compaction_bounds_batch_dirs(spark, tmp_path):
    _, src = _stage(spark, tmp_path)
    idx = str(tmp_path / "idx")
    _run(spark, src, idx, str(tmp_path / "cp"), compact_every=2)
    dirs = [
        d
        for d in os.listdir(f"{idx}/cells")
        if d.startswith("batch=")
    ]
    # 3 batches, compaction after batch 1 folds batches 0-1 -> only
    # batch=2 remains as a raw dir
    assert dirs == ["batch=2"]
    assert read_ivf_cells(spark, idx).count() == 240
