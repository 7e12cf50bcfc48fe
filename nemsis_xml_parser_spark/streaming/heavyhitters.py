"""Streaming hot-key (heavy-hitter) monitor — the live twin of
``sketch_countmin_heavy_hitters`` and the operational input to the
skew-mitigation operators (``join_salted_skew`` /
``agg_salted_two_phase``): a pipeline that KNOWS which keys are hot in
near-real-time can salt exactly those keys.

Streaming-legal decomposition (same shape as streaming/drift.py):

* ``windowed_key_counts`` — the ONE stateful operator: watermarked
  tumbling-window (window, key) counts, append mode — each window's
  key histogram emits exactly once when the watermark closes it.
  State is bounded by open-windows x distinct keys; when the key
  domain is unbounded (crawl hostnames, raw user ids at 100 TB), swap
  the per-key count for the (window, cm_row, cm_col) Count-Min cell
  aggregate of operators/sketches.py — state 4x64 per window
  regardless of cardinality, point queries batch-side (the sketch
  math is already hash-oracled in ``sketch_countmin_heavy_hitters``).
* ``heavy_hitters_from_counts`` — pure batch arithmetic on the closed
  windows: per-window totals, traffic share per key, hot flag at the
  ``tau`` share threshold, deterministic top-k.
* ``monitor_heavy_hitters`` — foreachBatch wiring: finalized windows
  in, alert rows out (alerts fire on CLOSED windows; a second
  stateful aggregate in-stream is the restricted shape).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def windowed_key_counts(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling (window, key) count — the stateful half."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "key",
            "n",
        )
    )


def heavy_hitters_from_counts(
    counts: DataFrame, tau: float = 0.10, k: int = 5
) -> DataFrame:
    """Per closed window: top-``k`` keys by count with traffic share and
    the ``share >= tau`` hot flag.  Rank window partitions by window —
    never global."""
    totals = counts.groupBy("window_start", "window_end").agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    ranked = (
        counts.join(totals, ["window_start", "window_end"])
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("window_start", "window_end").orderBy(
                    F.col("n").desc(), F.col("key").asc()
                )
            ),
        )
        .where(F.col("rank") <= k)
    )
    share = F.col("n").cast("double") / F.col("total")
    return ranked.select(
        "window_start",
        "window_end",
        "rank",
        "key",
        "n",
        "total",
        "n_keys",
        F.round(share, 6).alias("share"),
        (share >= tau).cast("int").alias("is_hot"),
    )


def monitor_heavy_hitters(
    stream: DataFrame,
    checkpoint: str,
    sink: Callable[[DataFrame, int], None],
    key_col: str = "user_id",
    window: str = "1 hour",
    watermark: str = "2 hours",
    tau: float = 0.10,
    k: int = 5,
):
    """Start the monitor: windowed key counts (append mode — one emission
    per closed window) → foreachBatch(heavy_hitters_from_counts →
    ``sink``).  Returns the StreamingQuery."""
    counts = windowed_key_counts(
        stream, key_col=key_col, window=window, watermark=watermark
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sink(heavy_hitters_from_counts(batch_df, tau=tau, k=k), batch_id)

    return (
        counts.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(process)
        .start()
    )
