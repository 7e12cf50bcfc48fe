"""Streaming distribution-drift monitor — the live twin of
plans/drift.py's PSI audit.

A production ingest watches the incoming stream's value distribution
against a static reference profile and alerts when PSI crosses the
industry 0.2 gate.  The streaming-legal decomposition:

* ``windowed_counts`` — the ONE stateful operator: a watermarked
  tumbling-window (window, bucket) count.  Append mode emits each
  window's bucket histogram exactly once, when the watermark closes it;
  state is bounded by open-windows × buckets.
* ``psi_from_counts`` — pure BATCH arithmetic from those counts to one
  PSI row per window (smoothing and bucket math mirror plans/drift.py
  exactly, so the stream monitor and the batch audit agree on the same
  data — asserted in tests/test_streaming_drift.py).
* ``monitor_drift`` — wires the two through ``foreachBatch``: finalized
  windows arrive as microbatch rows, PSI is computed batch-side, and the
  alert rows go to the caller's sink.  PSI needs per-window totals —
  a SECOND aggregation over the first — and chaining stateful aggregates
  inside one streaming query is exactly the shape Structured Streaming
  restricts, so evaluating it on the append output is both the supported
  and the operationally honest design (alerts fire on CLOSED windows).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..plans.drift import BUCKET_W


def bucketize(col: F.Column) -> F.Column:
    return F.floor(col / BUCKET_W).cast("int")


def reference_profile(ref: DataFrame, value_col: str = "n_chars") -> DataFrame:
    """(bucket, n_ref, t_ref, b_ref): reference bucket counts plus the
    totals needed to apply the smoothed-share formula downstream."""
    counts = ref.groupBy(bucketize(F.col(value_col)).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_ref")
    )
    tot = counts.agg(
        F.sum("n_ref").cast("double").alias("t_ref"),
        F.count(F.lit(1)).cast("double").alias("b_ref"),
    )
    return counts.crossJoin(tot)


def windowed_counts(
    stream: DataFrame,
    value_col: str = "n_chars",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling (window, bucket) histogram — the stateful half."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, window).alias("w"),
            bucketize(F.col(value_col)).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n_cur"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "bucket",
            "n_cur",
        )
    )


def psi_from_counts(counts: DataFrame, reference: DataFrame) -> DataFrame:
    """(window_start, window_end, n_values, psi, alert) per window from a
    BATCH frame of (window_start, window_end, bucket, n_cur) rows.

    Buckets present only in the reference still contribute their smoothed
    mass (full outer union of bucket domains per window — identical
    treatment to one-sided buckets in the batch audit); smoothing is the
    same (n + 0.5)/(N + 0.5·B) with B = the union domain size.
    """
    windows = counts.select("window_start", "window_end").distinct()
    domain = windows.crossJoin(F.broadcast(reference.select("bucket")))
    full = domain.join(
        counts, ["window_start", "window_end", "bucket"], "full_outer"
    ).select(
        "window_start",
        "window_end",
        "bucket",
        F.coalesce(F.col("n_cur"), F.lit(0)).alias("n_cur"),
    )
    # t_ref rides every reference row, but a bucket seen ONLY in the
    # stream has no reference row to carry it — attach the global total
    # by cross join so novel buckets contribute their (0 + 0.5)-smoothed
    # reference mass instead of a NULL term that silently drops from the
    # sum (novel buckets are precisely the strongest drift signal)
    ref_tot = reference.select("t_ref").distinct()
    joined = (
        full.join(
            F.broadcast(reference.select("bucket", "n_ref")), "bucket", "left"
        )
        .crossJoin(F.broadcast(ref_tot))
        .select(
            "window_start",
            "window_end",
            "bucket",
            "n_cur",
            F.coalesce(F.col("n_ref"), F.lit(0)).alias("n_ref"),
            "t_ref",
        )
    )
    tot = joined.groupBy("window_start", "window_end").agg(
        F.sum("n_cur").cast("double").alias("t_cur"),
        F.count(F.lit(1)).cast("double").alias("b"),
    )
    p_ref = (F.col("n_ref") + 0.5) / (F.col("t_ref") + 0.5 * F.col("b"))
    p_cur = (F.col("n_cur") + 0.5) / (F.col("t_cur") + 0.5 * F.col("b"))
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return (
        joined.join(F.broadcast(tot), ["window_start", "window_end"])
        .withColumn("term", term)
        .groupBy("window_start", "window_end")
        .agg(
            F.sum("n_cur").cast("bigint").alias("n_values"),
            F.round(F.sum("term"), 6).alias("psi"),
        )
        .withColumn("alert", (F.col("psi") > 0.2).cast("int"))
    )


def monitor_drift(
    stream: DataFrame,
    reference: DataFrame,
    sink: Callable[[DataFrame, int], None],
    value_col: str = "n_chars",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    checkpoint: str | None = None,
):
    """Start the monitor: windowed histogram (append mode — one emission
    per closed window) → foreachBatch(psi_from_counts → ``sink``).
    Returns the StreamingQuery."""
    counts = windowed_counts(stream, value_col, ts_col, window, watermark)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sink(psi_from_counts(batch_df, reference), batch_id)

    writer = counts.writeStream.outputMode("append").foreachBatch(process)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
