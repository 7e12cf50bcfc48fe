"""Streaming chunk-level dedup against the FULL historical corpus —
Gear-CDC chunk fingerprints maintained as a persisted index per
microbatch: incremental storage-dedup ("have we stored this chunk
anywhere, ever?") plus chunk-sharing candidate pairs.

Third instantiation of the history-index pattern
(``streaming/dedup_index.py`` = LSH band keys,
``streaming/winnow_index.py`` = winnowing fingerprints): the state
machinery is REUSED from winnow_index — CDC chunk hashes flow through
the same (doc_id, gh) schema, the same cumulative-df stop-list (hot
boilerplate chunks go mute, monotone, prefix-consistent) and the same
batch-keyed OVERWRITE exactly-once argument.  What CDC adds over both:
fingerprints are byte-RANGES, so a hit localizes WHAT is duplicated,
and an edit re-synchronizes at the next content boundary (the
chunk-store dedup-ratio economics).

Per batch the sink also records the batch's dedup ratio — chunks whose
hash already exists in history (or earlier in the batch) versus total —
the number a chunk-store sizes capacity with.

Index COMPACTION (r10): the raw index is batch-keyed parquet dirs that
would otherwise accumulate forever.  Every ``compact_every`` batches the
full (doc_id, gh) history is rewritten DISTINCT into a txlog-versioned
table (``operators/txlog.py``: immutable ``v=N`` dirs + atomic pointer
swap) and the folded batch dirs are removed.  Readers resolve the
committed compaction ∪ the batch dirs written after it.  Every crash /
replay window leaves only DUPLICATE (doc_id, gh) rows visible, and every
consumer is duplicate-immune by construction — the df guard counts
DISTINCT doc_ids, pair scores count DISTINCT ghs, the dedup-ratio known
set is ``.distinct()`` — so compaction needs no coordination with the
streaming commit log; the next compaction folds the duplicates away.

Reference parity: none — §2.I streaming-dedup tier.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.cdc import cdc_chunks_arrow
from ..operators.txlog import commit_table, current_version, read_table, vacuum
from .winnow_index import (
    candidates_against_fp_index,  # noqa: F401  (re-export: test/tool API)
    fp_groups,
    pairs_from_groups,
    read_fp_index,
    read_hot_fps,
    write_hot_fps,
)


def _write_ratio_row(
    ratio_root: str, batch_id: int, total: int, duplicate: int
) -> None:
    """Driver-side single-row parquet write of the batch dedup ratio —
    batch-keyed overwrite via tmp + atomic rename (replay-safe, torn
    files impossible), schema-identical to the Spark writer it
    replaces so ``read_dedup_ratios`` is unchanged."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(ratio_root, f"batch={batch_id}")
    os.makedirs(d, exist_ok=True)
    # clear foreign files first (a previous writer version may have left
    # Spark-named part-* files; unlike Spark's mode('overwrite') the
    # fixed-name rename below would not displace them and the glob scan
    # would double-read) — the new file then lands atomically
    for f in os.listdir(d):
        if f != "part-0.parquet":
            os.remove(os.path.join(d, f))
    tmp = os.path.join(d, ".part-0.parquet.tmp")
    pq.write_table(
        pa.table(
            {
                "batch_id": pa.array([batch_id], pa.int64()),
                "total_chunks": pa.array([total], pa.int64()),
                "duplicate_chunks": pa.array([duplicate], pa.int64()),
            }
        ),
        tmp,
    )
    os.replace(tmp, os.path.join(d, "part-0.parquet"))

def _parquet_rowcount(d: str) -> int:
    """Sum of row counts from the parquet footers in a directory — a
    driver-side metadata read (no Spark job) for counting a frame that
    was just written."""
    import pyarrow.parquet as pq

    total = 0
    for f in os.listdir(d):
        if f.endswith(".parquet") and not f.startswith("."):
            total += pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
    return total


__all__ = [
    "read_chunk_index",
    "start_cdc_index_stream",
    "read_cdc_pairs",
    "read_dedup_ratios",
    "compact_chunk_index",
]

_COMPACT_NAME = "compacted"


def read_chunk_index(spark: SparkSession, index_root: str) -> DataFrame:
    """All committed (doc_id, gh) chunk fingerprints: the latest
    compaction (if any) plus every batch dir written since (or not yet
    folded).  May contain duplicate rows in crash/replay windows — every
    consumer is duplicate-immune (module docstring)."""
    parts = [read_fp_index(spark, index_root)]
    if current_version(index_root, _COMPACT_NAME) is not None:
        parts.append(
            read_table(spark, index_root, _COMPACT_NAME).select("doc_id", "gh")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def compact_chunk_index(spark: SparkSession, index_root: str) -> int:
    """Fold the current full index view into the next txlog version
    (DISTINCT — replay duplicates collapse here), then remove the batch
    dirs that were folded and vacuum old versions.  Crash anywhere
    leaves a readable, at-worst-duplicated view.  Returns the committed
    version."""
    folded = [
        d for d in os.listdir(index_root)
        if d.startswith("batch=") and d.split("=", 1)[1].isdigit()
    ] if os.path.isdir(index_root) else []
    full = read_chunk_index(spark, index_root).distinct()
    ver = commit_table(full, index_root, _COMPACT_NAME)
    for d in folded:
        shutil.rmtree(os.path.join(index_root, d), ignore_errors=True)
    vacuum(index_root, _COMPACT_NAME, keep=2)
    return ver


def start_cdc_index_stream(
    docs_stream: DataFrame,
    index_root: str,
    out_root: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    mask_bits: int = 6,
    max_df: int | None = 50,
    min_shared: int = 2,
    available_now: bool = True,
    batch_shuffle_partitions: int | None = 4,
    compact_every: int | None = 8,
) -> StreamingQuery:
    """foreachBatch loop: chunk → dedup-ratio + candidates vs index →
    batch-keyed OVERWRITE writes (winnow_index's exactly-once argument
    verbatim), with the winnow r10 microbatch tuning (scoped narrow
    shuffles, widened compute stage, cached union — see
    ``start_winnow_index_stream``) and periodic index compaction
    (module docstring) every ``compact_every`` batches."""
    spark = docs_stream.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch hands over a DataFrame bound to the streaming
        # query's CLONED session (Structured Streaming runs every query
        # on sparkSession.cloneSession()), so the conf overrides below
        # land on the clone and CANNOT race a concurrent stream or
        # batch query on the shared outer session (probe-verified:
        # setting shuffle.partitions here leaves the outer session
        # untouched).  All batch-body reads plan under this session so
        # the overrides actually apply to them.
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
        # r12: NO width repartition — the Arrow kernel chunks a
        # microbatch in tens of milliseconds, so the source's
        # maxFilesPerTrigger partitions (floored at 4 by
        # minPartitionNum) are already enough parallelism and the
        # extra exchange was costing more than the compute it spread.
        # On a cluster whose triggers carry GBs, pass
        # batch_shuffle_partitions=None and the session defaults
        # (file split sizing + AQE) re-widen the scan naturally.
        try:
            # r12 job shape: the chunk computation WRITES ITS INDEX DIR
            # FIRST (one job: scan → width repartition → chunk →
            # narrow-4 shuffle → write), then everything downstream
            # reads the batch's fingerprints back from that MB-scale
            # parquet dir.  This kills the old persist (cache
            # materialization) and the separate fps.count() job —
            # total_chunks is summed from the written files' parquet
            # footers driver-side, a free metadata read.  Replay-safe:
            # the index write was already batch-keyed OVERWRITE, and
            # every index consumer is duplicate-immune (module
            # docstring), so the own-batch rows now always visible in
            # the read_chunk_index scan collapse inside fp_groups' sets
            # exactly as a crash-window replay always did.
            batch_dir = f"{index_root}/batch={batch_id}"
            fps = (
                # the vectorized Arrow twin (parity-pinned vs the
                # expression form) — HOF lambdas are interpreted, so at
                # microbatch latency budgets the numpy kernel is the
                # right chunker
                cdc_chunks_arrow(
                    batch_df, mask_bits=mask_bits,
                    id_col=id_col, text_col=text_col,
                )
                .select("doc_id", F.col("chunk_hash").alias("gh"))
                .persist()
            )
            # no repartition: with the width shuffle gone the scan
            # arrives in minPartitionNum(=4) partitions, so the chunk
            # job is ONE fully narrow stage — scan → kernel → cache →
            # write, zero exchanges — and the batch dir still holds ~4
            # small files for the next batch's scan to bin-pack.  The
            # write doubles as the cache materialization; the pairs job
            # then probes the MB-scale cached frame instead of
            # re-scanning parquet.
            fps.write.mode("overwrite").parquet(batch_dir)
            total_chunks = _parquet_rowcount(batch_dir)
            index = read_chunk_index(spark, index_root)
            # r11 (winnow_index's rework, shared machinery): restrict the
            # history view to chunk hashes present in this batch
            # (broadcast semi inside fp_groups), drop already-hot hashes
            # via the monotone hot sidecar, and run ONE group aggregate
            # whose (gh, bd, ad) sets feed pair emission, the newly-hot
            # append AND the dedup ratio — the growing index is only ever
            # scanned, never shuffled/aggregated/cached per batch.
            fps_g = fps
            hot_prior = (
                read_hot_fps(spark, index_root, exclude_batch=batch_id)
                if max_df is not None
                else None
            )
            if hot_prior is not None:
                b = F.broadcast(hot_prior)
                index = index.join(b, "gh", "left_anti")
                fps_g = fps.join(b, "gh", "left_anti")
            g = fp_groups(fps_g, index)
            # batch dedup ratio: chunk INSTANCES whose hash is already
            # known (history or another copy in this batch) / total.
            # A batch hash is a FIRST copy iff no doc outside this batch
            # carries it: size(ad) == size(bd) in the group frame (sets,
            # so a replayed batch's own rows already in the index collapse
            # — the replay-safety exclusion the old own-docs anti-join
            # bought).  Prior-hot hashes are absent from g and correctly
            # count as known (> max_df docs carried them in earlier
            # batches).  The first-copy count and the newly-hot gh list
            # ride the PAIRS JOB as observe() metrics on the unfiltered
            # group frame (its only consumer — no persist, no extra
            # job); the two single-row/tiny sidecar files are written
            # driver-side (pyarrow, tmp + atomic rename —
            # write_hot_fps's argument).
            from pyspark.sql import Observation

            obs = Observation(f"cdc_stats_{batch_id}")
            g = g.observe(
                obs,
                F.sum(
                    (F.size("ad") == F.size("bd")).cast("long")
                ).alias("fc"),
                F.collect_list(
                    F.when(F.size("ad") > max_df, F.col("gh"))
                    if max_df is not None
                    else F.lit(None).cast("long")
                ).alias("newly_hot"),
            )
            pairs = pairs_from_groups(
                g, max_df=max_df, min_shared=min_shared
            )
            pairs.write.mode("overwrite").parquet(
                f"{out_root}/batch={batch_id}"
            )
            stats = obs.get
            if max_df is not None:
                write_hot_fps(
                    index_root, batch_id, list(stats["newly_hot"])
                )
            _write_ratio_row(
                f"{out_root}_ratio",
                batch_id,
                total_chunks,
                total_chunks - int(stats["fc"] or 0),
            )
            fps.unpersist()
            if compact_every and (batch_id + 1) % compact_every == 0:
                compact_chunk_index(spark, index_root)
        finally:
            for key, val in prev.items():
                if val is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, val)

    writer = docs_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cdc_pairs(spark: SparkSession, out_root: str) -> DataFrame:
    return spark.read.schema(
        "doc_a long, doc_b long, shared long"
    ).parquet(f"{out_root}/batch=*").distinct()


def read_dedup_ratios(spark: SparkSession, out_root: str) -> DataFrame:
    return spark.read.schema(
        "batch_id long, total_chunks long, duplicate_chunks long"
    ).parquet(f"{out_root}_ratio/batch=*")
