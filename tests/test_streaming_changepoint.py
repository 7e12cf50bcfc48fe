"""Streaming CUSUM changepoint monitor (streaming/changepoint.py):
stream/batch agreement on the real event series, level-shift alerting."""

from __future__ import annotations

import pyspark.sql.functions as F

from nemsis_xml_parser_spark.streaming.changepoint import monitor_cusum

SF_DIR = "/root/testdata/sf0.001"


def _clean_events(spark, tmp_path) -> str:
    """events.parquet stores TIMESTAMP(NANOS); stream from a micros copy
    written through the registry reader (same hop the batch side takes)."""
    from nemsis_xml_parser_spark.plans.registry import table

    src = str(tmp_path / "events_src")
    table(spark, SF_DIR, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts")
    ).write.mode("overwrite").parquet(src)
    return src


def test_cusum_agrees_with_batch_twin(spark, tmp_path):
    """Fed the batch series' own mean as the reference μ, the streaming
    monitor's per-day CUSUM must reproduce events_changepoint_cusum."""
    from nemsis_xml_parser_spark.plans import QUERIES

    batch = {
        r["day"]: r
        for r in QUERIES["events_changepoint_cusum"].spark(spark, SF_DIR).collect()
    }
    n_days = len(batch)
    mu = sum(r["n_events"] for r in batch.values()) / n_days

    src = _clean_events(spark, tmp_path)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)

    got: list[dict] = []
    q = monitor_cusum(
        stream,
        mu=mu,
        sink=got.extend,
        threshold=1e18,  # agreement test — alerts exercised separately
        window="1 day",
        watermark="1 second",
        checkpoint=str(tmp_path / "cp"),
    )
    q.processAllAvailable()
    q.stop()

    # the last day stays open (nothing past it advances the watermark)
    assert len(got) == n_days - 1
    for row in got:
        day = row["window_start"].strftime("%Y-%m-%d")
        assert row["n_events"] == batch[day]["n_events"]
        assert abs(row["cusum"] - batch[day]["cusum"]) < 1e-6 * n_days


def test_cusum_alerts_on_level_shift(spark, tmp_path):
    """Three daily windows at the reference level, then three at double
    volume: S stays near zero through the stable prefix and must cross
    the threshold during the shifted suffix."""
    base = 1704067200  # 2024-01-01 00:00 UTC
    rows = []
    for day in range(6):
        n = 100 if day < 3 else 200
        rows.extend((day * 86400 + i % 3600,) for i in range(n))
    rows.append((30 * 86400,))  # flush sentinel: closes all six windows
    src = str(tmp_path / "shift_src")
    spark.createDataFrame(rows, ["off"]).select(
        F.timestamp_seconds(F.lit(base) + F.col("off")).alias("ts")
    ).write.mode("overwrite").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)

    got: list[dict] = []
    q = monitor_cusum(
        stream,
        mu=100.0,
        sink=got.extend,
        threshold=150.0,
        window="1 day",
        watermark="1 second",
        checkpoint=str(tmp_path / "cp2"),
    )
    q.processAllAvailable()
    q.stop()

    assert len(got) == 6
    got.sort(key=lambda r: r["window_start"])
    assert [r["alert"] for r in got] == [0, 0, 0, 0, 1, 1]
    assert got[-1]["cusum"] == 300.0  # 3 × (200 − 100)


def test_cusum_carry_state_survives_restart(spark, tmp_path):
    """Two monitor lifetimes over a growing source directory: the second
    run loads the persisted S and continues the statistic exactly where
    the first stopped — its alert fires because of carried history, not
    batch-local evidence."""
    base = 1704067200
    src = str(tmp_path / "carry_src")
    state = str(tmp_path / "cusum_state.json")

    def write_days(first_day, n_days, per_day, sentinel_off):
        # sentinel offsets are chosen to advance the watermark JUST past
        # the windows under test — a far-future sentinel would persist in
        # the checkpoint and make the next lifetime's data arrive late
        rows = [
            (d * 86400 + i % 3600,)
            for d in range(first_day, first_day + n_days)
            for i in range(per_day)
        ]
        rows.append((sentinel_off,))
        spark.createDataFrame(rows, ["off"]).select(
            F.timestamp_seconds(F.lit(base) + F.col("off")).alias("ts")
        ).write.mode("append").parquet(src)

    def run_monitor():
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        got: list[dict] = []
        q = monitor_cusum(
            stream, mu=100.0, sink=got.extend, threshold=250.0,
            window="1 day", watermark="1 second",
            checkpoint=str(tmp_path / "cp"), state_path=state,
        )
        q.processAllAvailable()
        q.stop()
        return got

    # lifetime 1: days 0-2 at +100 over the reference mean → S reaches
    # 300; sentinel at day 3 00:00:02 closes exactly days 0-2
    write_days(0, 3, 200, 3 * 86400 + 2)
    first = run_monitor()
    assert [r["cusum"] for r in sorted(first, key=lambda r: r["window_start"])][
        -1
    ] == 300.0

    # lifetime 2 (fresh query, same checkpoint + state file): day 4 at
    # +100, sentinel day 6; the day-3 window (lone first-lifetime
    # sentinel, n=1) also closes now.  Batch-local S alone would be
    # (1−100)+(200−100)=1 — far under threshold; only the carried S=300
    # explains 201 → 301 and the alert.
    write_days(4, 1, 200, 6 * 86400)
    second = run_monitor()
    second.sort(key=lambda r: r["window_start"])
    assert [r["n_events"] for r in second] == [1, 200]
    assert [r["cusum"] for r in second] == [201.0, 301.0]
    assert [r["alert"] for r in second] == [0, 1]
