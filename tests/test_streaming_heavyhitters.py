"""Streaming hot-key monitor (streaming/heavyhitters.py): batch
agreement and end-to-end windowed alerting over a file stream."""

from __future__ import annotations

import pyspark.sql.functions as F

from nemsis_xml_parser_spark.streaming.heavyhitters import (
    heavy_hitters_from_counts,
    monitor_heavy_hitters,
)

SF_DIR = "/root/testdata/sf0.001"


def test_evaluator_shares_and_ranking(spark):
    counts = spark.createDataFrame(
        [("w0", "w1", k, n) for k, n in
         [(1, 60), (2, 25), (3, 10), (4, 4), (5, 1)]],
        "window_start string, window_end string, key long, n long",
    )
    rows = heavy_hitters_from_counts(counts, tau=0.10, k=3).collect()
    assert [r.key for r in rows] == [1, 2, 3]
    assert [r.rank for r in rows] == [1, 2, 3]
    assert all(r.total == 100 and r.n_keys == 5 for r in rows)
    assert [r.is_hot for r in rows] == [1, 1, 1]
    assert rows[0].share == 0.6


def test_windowed_monitor_flags_injected_hot_key(spark, tmp_path):
    """Two closed hourly windows through a real file stream: window 0 is
    organic traffic, window 1 has a single user injected at 30% share —
    the monitor must rank that user first and flag ONLY it as hot."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id"
    )
    base = 1704067200  # 2024-01-01 00:00 UTC
    organic0 = ev.limit(400).select(
        "user_id", F.lit(0).alias("win"), "event_id"
    )
    organic1 = ev.limit(400).select(
        "user_id", F.lit(1).alias("win"), "event_id"
    )
    hot = spark.range(200).select(
        F.lit(999999).alias("user_id"),
        F.lit(1).alias("win"),
        (F.col("id") + 500000).alias("event_id"),
    )
    flush = spark.range(1).select(
        F.lit(0).alias("user_id"),
        F.lit(10).alias("win"),
        (F.col("id") + 900000).alias("event_id"),
    )
    src = str(tmp_path / "src")
    (
        organic0.unionByName(organic1)
        .unionByName(hot)
        .unionByName(flush)
        .select(
            "user_id",
            F.timestamp_seconds(
                F.lit(base) + F.col("win") * 3600 + F.col("event_id") % 60
            ).alias("ts"),
        )
        .write.mode("overwrite")
        .parquet(src)
    )
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)

    got: list[dict] = []

    def sink(df, batch_id):
        got.extend(r.asDict() for r in df.collect())

    q = monitor_heavy_hitters(
        stream,
        checkpoint=str(tmp_path / "cp"),
        sink=sink,
        window="1 hour",
        watermark="1 second",
        tau=0.25,
        k=3,
    )
    q.processAllAvailable()
    q.stop()

    by_win: dict[str, list] = {}
    for r in got:
        by_win.setdefault(str(r["window_start"]), []).append(r)
    assert len(by_win) == 2  # flush window stays open, unreported
    w0, w1 = sorted(by_win)
    # organic window: 150 users over 400 events — nobody near 25% share
    assert all(r["is_hot"] == 0 for r in by_win[w0])
    # injected window: the hot user leads with ~33% share, flagged alone
    top = [r for r in by_win[w1] if r["rank"] == 1][0]
    assert top["key"] == 999999
    assert top["is_hot"] == 1
    assert abs(top["share"] - 200 / 600) < 0.01
    assert all(r["is_hot"] == 0 for r in by_win[w1] if r["key"] != 999999)
