"""Streaming Count-Min frequency sketch — the third algebraic sketch
class on the mergeable-sketch stream template: ``streaming/kmv.py``
folds by MIN-K, ``streaming/hll.py`` by register MAX, this one by
cell-wise SUM (``operators/sketches.py::countmin_cells`` — the same
depth×width double-hash family as the batch query).

Sums are NOT idempotent, so the kmv/hll ledger-free replay argument
does not apply; exactly-once comes from the repo's other discipline
instead: each batch writes its cell DELTA batch-keyed with OVERWRITE
(a replayed batch rewrites its own delta wholesale — the set of
materialized deltas is idempotent even though addition is not), and the
corpus sketch is the read-side SUM across deltas.

COMPACTION must respect non-idempotence too: the cdc_index fold relies
on consumers being duplicate-immune (DISTINCT everywhere), which
counters are not.  Here the compacted txlog table carries an
``upto_batch`` WATERMARK: readers sum the compaction plus only the
delta dirs with batch_id > upto_batch, so a crash between the
compaction commit and the delta-dir garbage collection leaves folded
dirs visible but IGNORED — never double-counted.  Dir removal is pure
GC.

Per-batch output: Count-Min point estimates for the group domain
(event types here — the heavy-hitter read), which upper-bound the true
counts by the sketch guarantee and equal them while the domain is
small.

Reference parity: none — §2.I streaming/sketch tier.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.sketches import countmin_cells, countmin_estimate
from ..operators.txlog import commit_table, current_version, read_table, vacuum

_STATE = "cm_state"
CELLS_SCHEMA = "i int, pos long, total long"


def _delta_dirs(state_root: str) -> list[tuple[int, str]]:
    if not os.path.isdir(state_root):
        return []
    out = []
    for d in os.listdir(state_root):
        if d.startswith("batch=") and d.split("=", 1)[1].isdigit():
            out.append((int(d.split("=", 1)[1]), os.path.join(state_root, d)))
    return sorted(out)


def read_cm_cells(spark: SparkSession, state_root: str) -> DataFrame:
    """The corpus cell table: the committed compaction (if any) plus
    every delta dir ABOVE its upto_batch watermark, summed cell-wise.
    Folded-but-not-yet-deleted dirs are ignored by the watermark, so
    crash windows never double-count."""
    upto = -1
    parts = []
    if current_version(state_root, _STATE) is not None:
        comp = read_table(spark, state_root, _STATE)
        upto_row = comp.agg(F.max("upto_batch")).collect()[0][0]
        upto = -1 if upto_row is None else int(upto_row)
        parts.append(comp.select("i", "pos", "total"))
    live = [p for bid, p in _delta_dirs(state_root) if bid > upto]
    if live:
        parts.append(
            spark.read.schema(CELLS_SCHEMA).parquet(*live).select(
                "i", "pos", "total"
            )
        )
    if not parts:
        return spark.createDataFrame([], CELLS_SCHEMA)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("i", "pos").agg(
        F.sum("total").cast("bigint").alias("total")
    )


def compact_cm_cells(spark: SparkSession, state_root: str) -> int:
    """Fold the current view into the next txlog version stamped with
    the upto_batch watermark, then GC the folded delta dirs.  Crash
    anywhere leaves a readable, never-double-counted view."""
    dirs = _delta_dirs(state_root)
    if not dirs:
        return -1
    upto = max(bid for bid, _ in dirs)
    full = read_cm_cells(spark, state_root).withColumn(
        "upto_batch", F.lit(upto).cast("long")
    )
    ver = commit_table(full.coalesce(1), state_root, _STATE)
    for bid, p in dirs:
        if bid <= upto:
            shutil.rmtree(p, ignore_errors=True)
    vacuum(state_root, _STATE, keep=2)
    return ver


def start_countmin_stream(
    stream: DataFrame,
    state_root: str,
    out_root: str,
    checkpoint_dir: str,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    available_now: bool = True,
    batch_shuffle_partitions: int | None = 8,
    compact_every: int | None = 8,
) -> StreamingQuery:
    """foreachBatch loop: exact per-key batch counts → cell delta →
    batch-keyed OVERWRITE; per-batch heavy-hitter estimates for the
    keys seen in the batch ride along; periodic watermark compaction."""
    spark = stream.sparkSession

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
                ("spark.sql.files.minPartitionNum", 1),
                ("spark.sql.adaptive.enabled", "false"),
            ):
                prev[key] = spark.conf.get(key, None)
                spark.conf.set(key, str(val))
        try:
            keyed = (
                batch_df.select(F.col(key_col).cast("string").alias("k"))
                .groupBy("k")
                .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
                .persist()
            )
            delta = countmin_cells(keyed, "k", "cnt", depth, width)
            delta.coalesce(1).write.mode("overwrite").parquet(
                f"{state_root}/batch={batch_id}"
            )
            cells = read_cm_cells(spark, state_root)
            est = countmin_estimate(
                keyed.select("k"), cells, "k", depth, width
            )
            est.withColumn(
                "batch_id", F.lit(batch_id).cast("long")
            ).coalesce(1).write.mode("overwrite").parquet(
                f"{out_root}/batch={batch_id}"
            )
            keyed.unpersist()
            if compact_every and (batch_id + 1) % compact_every == 0:
                compact_cm_cells(spark, state_root)
        finally:
            for key, val in prev.items():
                if val is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, val)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cm_estimates(spark: SparkSession, out_root: str) -> DataFrame:
    return spark.read.schema(
        "k string, cm_estimate long, batch_id long"
    ).parquet(f"{out_root}/batch=*")
