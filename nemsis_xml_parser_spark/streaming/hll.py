"""Streaming HyperLogLog distinct-count — 64 registers of bounded state
per group over an unbounded stream, the streaming twin of the batch
``sketch_hll_distinct`` query and the second instantiation of the
mergeable-sketch template ``streaming/kmv.py`` established.

State per group is the (register j, max rho) table — at most 64 small
rows per group FOREVER, versus O(cardinality) for the exact count.  The
fold is a SEMILATTICE (register-wise max of a union = max of maxes —
the same property HyperBall's iteration exploits in
``operators/hyperball.py``), so it is

* order-independent: any batch arrival order yields the SAME committed
  state, which is why the fold-parity test compares the drained stream
  against the batch sketch bit-for-bit;
* idempotent: replaying a batch maxes in rho values already present —
  exactly-once needs no ledger.

State lives in a txlog-versioned table (``operators/txlog.py``); the
estimate is ``operators/hll.py``'s DECIMAL-staged harmonic form, so the
streamed estimate equals the batch query's estimate exactly whenever
they have seen the same keys.

Reference parity: none — §2.I streaming/sketch tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..functions.hashing import md5_long
from ..operators.hll import _M, HLL_NUM_TERM, hll_est_expr, hll_rho
from ..operators.txlog import commit_table, current_version, read_table, vacuum

_STATE = "hll_state"
STATE_SCHEMA = "grp string, j int, mj int"


def read_hll_state(spark: SparkSession, state_root: str) -> DataFrame:
    """Current committed (grp, j, mj) register state (empty if none)."""
    if current_version(state_root, _STATE) is None:
        return spark.createDataFrame([], STATE_SCHEMA)
    return read_table(spark, state_root, _STATE).select("grp", "j", "mj")


def hll_registers(
    df: DataFrame, key_col: str, group_col: str | None = None
) -> DataFrame:
    """(grp, j, mj) sparse register table of a batch — the SAME hash,
    register index and rho as operators/hll.py, so batch and stream
    states are interchangeable."""
    grp = F.col(group_col).cast("string") if group_col else F.lit("all")
    h = md5_long(F.col(key_col).cast("string"))
    return (
        df.select(
            grp.alias("grp"),
            (h % _M).cast("int").alias("j"),
            hll_rho(h).cast("int").alias("mj"),
        )
        .groupBy("grp", "j")
        .agg(F.max("mj").cast("int").alias("mj"))
    )


def hll_state_estimates(state: DataFrame) -> DataFrame:
    """(grp, n_present, hll_estimate) from a register state."""
    per = state.groupBy("grp").agg(
        F.sum(F.expr(HLL_NUM_TERM)).alias("num_present"),
        F.count(F.lit(1)).cast("bigint").alias("n_present"),
    )
    est = hll_est_expr(F.col("num_present"), F.col("n_present"))
    return per.select(
        "grp", "n_present", F.round(est, 6).alias("hll_estimate")
    )


def start_hll_stream(
    stream: DataFrame,
    state_root: str,
    out_root: str,
    checkpoint_dir: str,
    key_col: str,
    group_col: str | None = None,
    available_now: bool = True,
    batch_shuffle_partitions: int | None = 8,
) -> StreamingQuery:
    """foreachBatch loop: sketch the batch's keys, max-merge into the
    committed register state, commit the new version, write the batch's
    estimate rows batch-keyed (OVERWRITE on replay — same rows by the
    semilattice idempotence)."""
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
            bh = hll_registers(batch_df, key_col, group_col)
            folded = (
                read_hll_state(spark, state_root)
                .unionByName(bh)
                .groupBy("grp", "j")
                .agg(F.max("mj").cast("int").alias("mj"))
                .coalesce(1)
            )
            commit_table(folded, state_root, _STATE)
            vacuum(state_root, _STATE, keep=2)
            est = hll_state_estimates(read_hll_state(spark, state_root))
            est.withColumn(
                "batch_id", F.lit(batch_id).cast("long")
            ).coalesce(1).write.mode("overwrite").parquet(
                f"{out_root}/batch={batch_id}"
            )
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


def read_hll_estimates(spark: SparkSession, out_root: str) -> DataFrame:
    return spark.read.schema(
        "grp string, n_present long, hll_estimate double, batch_id long"
    ).parquet(f"{out_root}/batch=*")
