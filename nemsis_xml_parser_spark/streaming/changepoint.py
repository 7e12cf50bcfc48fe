"""Streaming CUSUM changepoint monitor — the live twin of
plans/mining.py::events_changepoint_cusum.

Online CUSUM (Page 1954) watches the per-window event volume against a
REFERENCE mean and accumulates S ← S + (c_w − μ); a level shift drifts S
away from zero until |S| crosses the alarm threshold.  The streaming-legal
decomposition mirrors streaming/drift.py:

* ``windowed_event_counts`` — the ONE stateful operator: a watermarked
  tumbling-window count in append mode (each window emitted exactly once,
  when the watermark closes it; state = open windows only).
* ``monitor_cusum`` — ``foreachBatch``: closed windows arrive as
  microbatch rows (one row per window — metadata-sized, so ordering and
  collecting them driver-side is O(days), not O(events)); the running S
  carries across microbatches in the closure and, when ``state_path`` is
  given, persists to a JSON file after every batch (write-temp + atomic
  rename) so a restarted monitor resumes from the carried S instead of
  re-zeroing — the state is O(1), so a file beside the checkpoint is the
  proportionate store.  Exactly-once caveat: the carry file commits
  after the batch, so a crash BETWEEN sink and carry-write replays one
  window into S on restart — acceptable for an alerting statistic and
  documented here rather than hidden.

The batch twin recomputes μ from the full series; the online monitor
necessarily uses a FIXED reference μ — feeding it the batch mean makes
the two agree exactly, which tests/test_streaming_changepoint.py asserts.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """Watermarked tumbling (window → count) — the stateful half."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


def monitor_cusum(
    stream: DataFrame,
    mu: float,
    sink: Callable[[list[dict]], None],
    threshold: float,
    ts_col: str = "ts",
    window: str = "1 day",
    watermark: str = "2 days",
    checkpoint: str | None = None,
    state_path: str | None = None,
):
    """Start the monitor: windowed counts (append mode) →
    foreachBatch(running CUSUM → ``sink``).  ``sink`` receives a list of
    dicts (window_start, window_end, n_events, cusum, alert) per
    microbatch — already ordered by window start.  ``state_path``
    persists the carried S so a restarted monitor continues the
    statistic.  Returns the StreamingQuery."""
    import json
    import os

    counts = windowed_event_counts(stream, ts_col, window, watermark)
    state = {"s": 0.0}
    if state_path is not None and os.path.exists(state_path):
        with open(state_path) as fh:
            state["s"] = float(json.load(fh)["s"])

    def process(batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.orderBy("window_start").collect()
        if not rows:
            return
        out = []
        for r in rows:
            state["s"] += r["n_events"] - mu
            out.append(
                {
                    "window_start": r["window_start"],
                    "window_end": r["window_end"],
                    "n_events": r["n_events"],
                    "cusum": round(state["s"], 6),
                    "alert": int(abs(state["s"]) > threshold),
                }
            )
        sink(out)
        if state_path is not None:
            tmp = f"{state_path}.tmp"
            with open(tmp, "w") as fh:
                json.dump({"s": state["s"]}, fh)
            os.replace(tmp, state_path)

    writer = counts.writeStream.outputMode("append").foreachBatch(process)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
