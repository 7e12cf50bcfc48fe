"""Streaming KMV (theta) distinct-count — a BOUNDED-state sketch over an
unbounded stream, the streaming twin of the batch ``sketch_kmv_distinct``
query (plans/round9.py).

State per group is the k smallest distinct md5 hashes seen so far — a
few KB forever, the whole point of sketching a stream: the exact
distinct count needs O(cardinality) state, the KMV needs O(k).  The fold
is a SEMILATTICE (min-k of a union = min-k of min-k's), so it is

* order-independent: any batch arrival order yields the SAME state,
  which is why the fold-parity test can compare the drained stream
  against the batch estimator bit-for-bit;
* idempotent: replaying a batch unions in hashes already present, and
  the committed state is unchanged — exactly-once needs no ledger.

State lives in a txlog-versioned table (``operators/txlog.py``: write
the new version, atomically swap the pointer, vacuum old versions), so
a crash between commits leaves the previous committed state readable
and the replayed batch recomputes the identical next version.  Per-batch
estimates append batch-keyed (OVERWRITE on replay, same rows by the
idempotence above).

estimate = (k-1) * 2^60 / h_k with h_k the k-th smallest retained hash
(exact count while fewer than k distinct hashes are known) — the same
formula the oracled batch query replays in DuckDB.

Reference parity: none — §2.I streaming/sketch tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.streaming import StreamingQuery

from ..functions.hashing import md5_long
from ..operators.txlog import commit_table, current_version, read_table, vacuum

_STATE = "kmv_state"
_POW60 = 1 << 60
STATE_SCHEMA = "grp string, hv long"


def read_kmv_state(spark: SparkSession, state_root: str) -> DataFrame:
    """Current committed (grp, hv) retained-hash state (empty if none)."""
    if current_version(state_root, _STATE) is None:
        return spark.createDataFrame([], STATE_SCHEMA)
    return read_table(spark, state_root, _STATE).select("grp", "hv")


def kmv_estimates(state: DataFrame, k: int) -> DataFrame:
    """(grp, n_retained, kmv_estimate) from a retained-hash state."""
    agg = state.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_retained"),
        F.max("hv").alias("h_max"),
    )
    return agg.select(
        "grp",
        "n_retained",
        F.round(
            F.when(
                F.col("n_retained") < k, F.col("n_retained").cast("double")
            ).otherwise(
                F.lit(float((k - 1) * _POW60)) / F.col("h_max").cast("double")
            ),
            6,
        ).alias("kmv_estimate"),
    )


def start_kmv_stream(
    stream: DataFrame,
    state_root: str,
    out_root: str,
    checkpoint_dir: str,
    key_col: str,
    group_col: str | None = None,
    k: int = 256,
    available_now: bool = True,
    batch_shuffle_partitions: int | None = 8,
) -> StreamingQuery:
    """foreachBatch loop: hash the batch's keys, fold min-k(state ∪
    batch) per group, commit the new state version, write the batch's
    estimate rows batch-keyed."""
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
            grp = (
                F.col(group_col).cast("string")
                if group_col
                else F.lit("all")
            )
            bh = (
                batch_df.select(
                    grp.alias("grp"),
                    md5_long(F.col(key_col).cast("string")).alias("hv"),
                )
                .distinct()
            )
            folded = (
                read_kmv_state(spark, state_root)
                .unionByName(bh)
                .distinct()
                .withColumn(
                    "__rn",
                    F.row_number().over(
                        Window.partitionBy("grp").orderBy(F.col("hv").asc())
                    ),
                )
                .where(F.col("__rn") <= k)
                .select("grp", "hv")
                .coalesce(1)
            )
            commit_table(folded, state_root, _STATE)
            vacuum(state_root, _STATE, keep=2)
            est = kmv_estimates(read_kmv_state(spark, state_root), k)
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


def read_kmv_estimates(spark: SparkSession, out_root: str) -> DataFrame:
    return spark.read.schema(
        "grp string, n_retained long, kmv_estimate double, batch_id long"
    ).parquet(f"{out_root}/batch=*")
