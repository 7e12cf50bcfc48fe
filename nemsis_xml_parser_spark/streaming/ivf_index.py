"""Streaming ANN index maintenance — incremental upsert into the
persisted IVF index (the streaming twin of
``operators/ivf.py::ivf_index_write``, closing the one LLM-pipeline
surface that had no streaming counterpart).

Deployment model is FAISS's train-once/add-forever: coarse centroids
are trained ON THE FIRST BATCH and frozen (re-training would move cell
boundaries under already-indexed vectors; at cluster scale you train
on a bounded sample for the same reason), then every microbatch
assigns its vectors to cells and appends them.

Layout:

* ``{index_root}/centroids`` — KB-scale, written once by batch 0
  (replay retrains on the identical batch — the trainer is
  deterministic — and overwrites the identical bytes);
* ``{index_root}/cells/batch={id}/cid={c}/...`` — each batch's cell
  assignments, batch-keyed OVERWRITE (the history-index exactly-once
  argument verbatim) and cid-partitioned so probes prune to their
  cells' files across every batch dir;
* every ``compact_every`` batches the batch dirs fold DISTINCT into a
  txlog-versioned cells table (``operators/txlog.py``: immutable
  ``v=N`` dirs + atomic pointer swap) and are removed — the
  cdc_index/countmin compaction recipe, so the dir count stays bounded
  on a long-lived stream.

Crash/replay windows can leave duplicate (cid, item_id, iv) rows
visible (a replayed batch whose rows were already folded); the search
path is duplicate-immune by construction — candidates are
``dropDuplicates(query_id, neighbor_id)`` before ranking — and the
next compaction folds the duplicates away, so no coordination with the
streaming commit log is needed.

Reference parity: none — §2.I streaming-similarity tier.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.streaming import StreamingQuery

from ..functions import vectors as V
from ..operators.ivf import (
    _nearest,
    assign_cells_arrow,
    train_centroids,
)
from ..operators.txlog import commit_table, current_version, read_table, vacuum

__all__ = [
    "read_ivf_cells",
    "read_ivf_centroids",
    "start_ivf_index_stream",
    "ivf_stream_index_topk",
    "compact_ivf_cells",
]

_COMPACT_NAME = "cells_compacted"
CELL_SCHEMA = "cid int, item_id long, iv array<double>"


def read_ivf_centroids(spark: SparkSession, index_root: str) -> DataFrame | None:
    """Committed centroids, or None when absent.  A dir without the
    writer's _SUCCESS marker is treated as absent — a crash mid-write
    then retrains on the replayed first batch and overwrites cleanly
    instead of wedging every retry on a torn read."""
    d = f"{index_root}/centroids"
    if not os.path.isfile(os.path.join(d, "_SUCCESS")):
        return None
    return spark.read.parquet(d)


def read_ivf_cells(spark: SparkSession, index_root: str) -> DataFrame:
    """All committed (cid, item_id, iv) rows: the latest compaction (if
    any) plus every batch dir written since (or not yet folded).  May
    contain duplicates in crash/replay windows — consumers dedup
    (module docstring)."""
    parts = []
    cells_dir = f"{index_root}/cells"
    if os.path.isdir(cells_dir) and any(
        d.startswith("batch=") for d in os.listdir(cells_dir)
    ):
        parts.append(
            spark.read.option("basePath", cells_dir)
            .parquet(f"{cells_dir}/batch=*")
            .select(
                F.col("cid").cast("int").alias("cid"), "item_id", "iv"
            )
        )
    if current_version(index_root, _COMPACT_NAME) is not None:
        parts.append(
            read_table(spark, index_root, _COMPACT_NAME).select(
                F.col("cid").cast("int").alias("cid"), "item_id", "iv"
            )
        )
    if not parts:
        return spark.createDataFrame([], CELL_SCHEMA)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def compact_ivf_cells(
    spark: SparkSession, index_root: str, exclude_batch: int | None = None
) -> int:
    """Fold the current cells view DISTINCT into the next txlog version
    (replay duplicates collapse on (cid, item_id) — the vector is a
    function of the id, so first-row-wins is exact), remove the folded
    batch dirs, vacuum old versions.

    ``exclude_batch`` keeps one batch dir OUT of the fold (neither read
    nor removed): a caller compacting at the START of batch N must not
    fold a crashed prior attempt of batch N itself, or the replay would
    see its own rows through the compacted store (the exactly-once
    argument needs own-batch exclusion to stay exact across the
    compaction boundary)."""
    cells_dir = f"{index_root}/cells"
    folded = [
        d
        for d in os.listdir(cells_dir)
        if d.startswith("batch=") and d.split("=", 1)[1].isdigit()
        and d != f"batch={exclude_batch}"
    ] if os.path.isdir(cells_dir) else []
    parts = [
        spark.read.option("basePath", cells_dir)
        .parquet(os.path.join(cells_dir, d))
        .select(F.col("cid").cast("int").alias("cid"), "item_id", "iv")
        for d in folded
    ]
    if current_version(index_root, _COMPACT_NAME) is not None:
        parts.append(
            read_table(spark, index_root, _COMPACT_NAME).select(
                F.col("cid").cast("int").alias("cid"), "item_id", "iv"
            )
        )
    full = parts[0] if parts else spark.createDataFrame([], CELL_SCHEMA)
    for p in parts[1:]:
        full = full.unionByName(p)
    full = full.dropDuplicates(["cid", "item_id"])
    ver = commit_table(full, index_root, _COMPACT_NAME)
    for d in folded:
        shutil.rmtree(os.path.join(cells_dir, d), ignore_errors=True)
    vacuum(index_root, _COMPACT_NAME, keep=2)
    return ver


def start_ivf_index_stream(
    vec_stream: DataFrame,
    index_root: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 8,
    iters: int = 3,
    available_now: bool = True,
    batch_shuffle_partitions: int | None = 4,
    compact_every: int | None = 8,
) -> StreamingQuery:
    """foreachBatch loop: (train centroids if absent) → assign cells →
    batch-keyed cid-partitioned OVERWRITE append → periodic compaction.

    Assignment runs through ``assign_cells_arrow`` (r13): the
    expression form's per-(vector, centroid) HOF l2 is interpreted
    (~0.5 µs/element) and expands every vector nlist-x through the
    plan; the numpy kernel carries the frozen KB-scale centroid table
    in its closure (collected once per stream)."""

    frozen_cents: list = []

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # conf overrides land on the streaming query's CLONED session
        # (the winnow_index note) — no cross-stream races
        spark = batch_df.sparkSession
        prev: dict[str, str | None] = {}
        if batch_shuffle_partitions is not None:
            for key, val in (
                ("spark.sql.shuffle.partitions", batch_shuffle_partitions),
                ("spark.sql.files.minPartitionNum", 4),
                ("spark.sql.adaptive.enabled", "false"),
            ):
                prev[key] = spark.conf.get(key, None)
                spark.conf.set(key, str(val))
        try:
            centroids = read_ivf_centroids(spark, index_root)
            if centroids is None:
                # train-once on the first batch; replay retrains on the
                # identical batch (deterministic seeded trainer) and
                # overwrites identical bytes
                trained = train_centroids(
                    batch_df, nlist, iters, id_col, vec_col
                )
                trained.coalesce(1).write.mode("overwrite").parquet(
                    f"{index_root}/centroids"
                )
                centroids = read_ivf_centroids(spark, index_root)
            if not frozen_cents:
                frozen_cents.extend(centroids.collect())
            cells = assign_cells_arrow(
                batch_df, frozen_cents, id_col, vec_col
            )
            # one file per (batch, cid): the store is re-scanned by
            # every search and compaction — repartition, not coalesce,
            # so the kernel stage keeps its width
            cells.repartition(F.col("cid")).write.mode(
                "overwrite"
            ).partitionBy("cid").parquet(
                f"{index_root}/cells/batch={batch_id}"
            )
            if compact_every and (batch_id + 1) % compact_every == 0:
                compact_ivf_cells(spark, index_root)
        finally:
            for key, val in prev.items():
                if val is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, val)

    writer = vec_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ivf_stream_index_topk(
    spark: SparkSession,
    index_root: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search the stream-maintained index — ``ivf_index_topk`` against
    the batch-dir ∪ compaction view, duplicate-immune (candidates
    deduped on (query, neighbor) before ranking, so a crash-window
    replay dup cannot shift the top-k)."""
    centroids = read_ivf_centroids(spark, index_root)
    if centroids is None:
        raise ValueError(f"no centroids committed under {index_root}")
    qv = queries.select(
        F.col(id_col).alias("__vid"),
        V.to_double_array(F.col(vec_col)).alias("v"),
    )
    probes = _nearest(qv, centroids, keep=nprobe).select(
        F.col("__vid").alias("query_id"), F.col("v").alias("qv"), "cid"
    )
    cells = read_ivf_cells(spark, index_root)
    cos = F.round(V.cosine_similarity(F.col("qv"), F.col("iv")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        F.broadcast(probes)
        .join(cells, "cid")
        .where(F.col("query_id") != F.col("item_id"))
        .select(
            "query_id",
            F.col("item_id").alias("neighbor_id"),
            cos.alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
