"""Distributed two-pass global prefix sum (running total at scale).

A global running total expressed as ``SUM(x) OVER (ORDER BY k)`` funnels
the entire dataset through ONE partition — the classic 100 TB
scale-killer (tools/audit_plans.py rejects exactly that shape).  This
operator is the documented scale path: the textbook two-pass
parallel-prefix algorithm on DataFrames.

1. ``repartitionByRange`` on the ordering key — equal keys co-locate,
   partitions hold contiguous key ranges;
2. pass 1: partition-LOCAL running sum (window partitioned by the
   physical partition id — no global funnel) + per-partition totals;
3. pass 2: the per-partition totals (one row per partition —
   metadata-sized) get an exclusive prefix via a broadcast triangular
   join, and each row adds its partition's offset.

The result is invariant to where the sampled range boundaries fall
(prefix-sum associativity), and with DECIMAL-typed values it is exact
and order-independent across engines.

No counterpart in the reference (a single-threaded psycopg2 ETL); this
is the scale-out pattern its per-file sequential bookkeeping would need
on a cluster.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .lineage import cut_lineage


def scalable_running_sum(
    df: DataFrame,
    order_col: str,
    val_col: str,
    out_col: str = "running_total",
    num_ranges: int = 8,
) -> DataFrame:
    """All input columns + ``out_col`` = running sum of ``val_col`` in
    ``order_col`` order, computed without any single-partition window.

    ``val_col`` should be an exact type (integer/DECIMAL) for
    bit-identical results; the running frame includes ORDER BY peers
    (RANGE semantics), matching ``SUM() OVER (ORDER BY ...)``.
    """
    # Both the local-window branch and the totals branch below must
    # observe the IDENTICAL physical range partitioning (_pid values),
    # but repartitionByRange samples its boundaries nondeterministically
    # per materialization — without pinning, correctness would silently
    # depend on Spark's ReuseExchange deduplicating the two identical
    # exchange subtrees.  Eagerly materialize once so _pid consistency
    # is structural (same discipline as the iterative operators).
    r = (
        df.repartitionByRange(num_ranges, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .transform(cut_lineage)
    )
    # partition-local running sum — window is partitioned, never global.
    # rangeBetween(unboundedPreceding, currentRow) over the ORDER BY value
    # keeps ANSI peer semantics for duplicate keys.
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = r.withColumn("_local", F.sum(val_col).over(local_w))
    # per-partition totals: one row per range partition (metadata-sized)
    totals = r.groupBy("_pid").agg(F.sum(val_col).alias("_pt"))
    ta = totals.select(F.col("_pid").alias("_pa"))
    tb = totals.select(F.col("_pid").alias("_pb"), "_pt")
    offsets = (
        ta.join(F.broadcast(tb), F.col("_pb") < F.col("_pa"))
        .groupBy("_pa")
        .agg(F.sum("_pt").alias("_off"))
    )
    out = (
        local.join(
            F.broadcast(offsets), local["_pid"] == offsets["_pa"], "left"
        )
        .withColumn(
            out_col, F.col("_local") + F.coalesce(F.col("_off"), F.lit(0))
        )
        .drop("_pid", "_local", "_pa", "_off")
    )
    return out


def global_dense_rank(
    df: DataFrame,
    cols: list[str],
    rank_col: str = "gr",
    num_ranges: int = 8,
) -> DataFrame:
    """All input columns + ``rank_col`` = global DENSE rank of the key
    tuple ``cols``, computed without any single-partition window — the
    ranking sibling of ``scalable_running_sum``.

    The two-pass shape: DISTINCT keys are range-partitioned (contiguous,
    non-overlapping, ascending ranges — and distinct, so no key straddles
    a boundary), each partition computes a LOCAL dense rank (window input
    bounded by distinct-keys / num_ranges), and the per-partition
    distinct counts — one metadata-sized row per partition — become
    exclusive prefix offsets via the same broadcast triangular join as
    the prefix sum.  global rank = partition offset + local rank; the
    ranked key dictionary then joins back onto the input by key.

    The range boundaries are sampled nondeterministically per
    materialization, so the keyed frame is eagerly pinned with
    ``cut_lineage`` before ``_pid`` is read twice (same discipline as
    ``scalable_running_sum``); the resulting RANKS are boundary-invariant
    either way — only the pinning of ``_pid`` across the two branches is
    load-bearing.

    NULL-key rows are dropped by the final equi-join-back (SQL NULL !=
    NULL) — pre-coalesce key columns if NULLs must rank (the suffix-array
    caller encodes its past-the-end sentinel as 0 for exactly this
    reason).
    """
    keys = (
        df.select(*cols)
        .distinct()
        .repartitionByRange(num_ranges, *[F.col(c) for c in cols])
        .withColumn("_pid", F.spark_partition_id())
        .transform(cut_lineage)
    )
    local_w = Window.partitionBy("_pid").orderBy(*cols)
    local = keys.withColumn("_lr", F.dense_rank().over(local_w))
    counts = keys.groupBy("_pid").agg(F.count(F.lit(1)).alias("_ct"))
    ca = counts.select(F.col("_pid").alias("_pa"))
    cb = counts.select(F.col("_pid").alias("_pb"), "_ct")
    offsets = (
        ca.join(F.broadcast(cb), F.col("_pb") < F.col("_pa"))
        .groupBy("_pa")
        .agg(F.sum("_ct").alias("_off"))
    )
    ranked = (
        local.join(F.broadcast(offsets), local["_pid"] == offsets["_pa"], "left")
        .select(
            *cols,
            (F.coalesce(F.col("_off"), F.lit(0)) + F.col("_lr"))
            .cast("long")
            .alias(rank_col),
        )
    )
    return df.join(ranked, cols)
