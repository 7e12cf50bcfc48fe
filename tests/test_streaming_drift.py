"""Streaming PSI drift monitor (streaming/drift.py): batch-audit
agreement, end-to-end windowed alerting over a file stream."""

from __future__ import annotations

import pyspark.sql.functions as F

from nemsis_xml_parser_spark.streaming.drift import (
    monitor_drift,
    psi_from_counts,
    reference_profile,
    windowed_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def test_psi_agrees_with_batch_audit(spark):
    """Same split as quality_psi_drift (even doc_ids = reference, odd =
    current): the streaming evaluator's PSI must equal the batch audit's
    summed psi_terms up to per-term rounding."""
    from nemsis_xml_parser_spark.plans import QUERIES

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ref = reference_profile(docs.where(F.col("doc_id") % 2 == 0))
    cur = docs.where(F.col("doc_id") % 2 == 1)
    counts = (
        cur.groupBy(F.floor(F.col("n_chars") / 50).cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_cur"))
        .select(
            F.lit("2024-01-01 00:00:00").alias("window_start"),
            F.lit("2024-01-01 01:00:00").alias("window_end"),
            "bucket",
            "n_cur",
        )
    )
    [row] = psi_from_counts(counts, ref).collect()
    batch_terms = QUERIES["quality_psi_drift"].spark(spark, SF_DIR).collect()
    batch_psi = sum(r["psi_term"] for r in batch_terms)
    # batch surfaces per-term rounding to 6; allow that much slack per term
    assert abs(row["psi"] - batch_psi) <= 2e-6 * len(batch_terms)
    assert row["n_values"] == cur.count()


def test_windowed_monitor_alerts_on_drifted_window(spark, tmp_path):
    """Three hourly windows through a real file stream: window 0 and 1
    carry reference-like lengths, window 2 carries a 3x-shifted
    distribution — the monitor must emit exactly the closed windows and
    flag only the drifted one."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ref = reference_profile(docs)

    base = 1704067200  # 2024-01-01 00:00 UTC
    normal = docs.select(
        "doc_id", "n_chars", (F.col("doc_id") % 2).alias("win")
    )
    drifted = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        (F.col("n_chars") * 3).alias("n_chars"),
        F.lit(2).alias("win"),
    )
    # flush sentinel: one far-future row pushes the watermark past all
    # three real windows so availableNow emits them in append mode
    flush = spark.range(1).select(
        (F.col("id") + 200000).alias("doc_id"),
        F.lit(100).alias("n_chars"),
        F.lit(12).alias("win"),
    )
    src = str(tmp_path / "stream_src")
    (
        normal.unionByName(drifted)
        .unionByName(flush)
        .select(
            "doc_id",
            "n_chars",
            F.timestamp_seconds(
                F.lit(base) + F.col("win") * 3600 + F.col("doc_id") % 60
            ).alias("ts"),
        )
        .write.mode("overwrite")
        .parquet(src)
    )
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)

    got: list[dict] = []

    def sink(df, batch_id):
        got.extend(r.asDict() for r in df.collect())

    q = monitor_drift(
        stream, ref, sink,
        window="1 hour", watermark="1 second",
        checkpoint=str(tmp_path / "cp"),
    )
    q.processAllAvailable()
    q.stop()

    by_start = {str(r["window_start"]): r for r in got}
    assert len(by_start) == 3  # the flush window stays open, unreported
    starts = sorted(by_start)
    # windows 0/1: same distribution as the reference — PSI far below gate
    assert by_start[starts[0]]["alert"] == 0
    assert by_start[starts[1]]["alert"] == 0
    # window 2: tripled lengths — unmistakable drift
    assert by_start[starts[2]]["alert"] == 1
    assert by_start[starts[2]]["psi"] > 0.2


def test_novel_stream_buckets_contribute_drift_mass(spark):
    """A bucket seen only in the stream (outside the reference domain) is
    the strongest drift signal — its term must enter the PSI sum, not
    vanish as NULL arithmetic."""
    ref = reference_profile(
        spark.range(100).select((F.lit(100) + F.col("id") % 3).alias("n_chars"))
    )
    # all mass lands in bucket 40 — far outside the reference's bucket 2
    novel = spark.range(100).select(
        F.lit("w0").alias("window_start"),
        F.lit("w1").alias("window_end"),
        F.lit(40).alias("bucket"),
        F.lit(1).alias("n_cur"),
    ).groupBy("window_start", "window_end", "bucket").agg(
        F.sum("n_cur").alias("n_cur")
    )
    [row] = psi_from_counts(novel, ref).collect()
    assert row["psi"] is not None and row["psi"] > 1.0  # massive divergence
    assert row["alert"] == 1


def test_windowed_counts_state_is_bucket_bounded(spark, tmp_path):
    """The stateful half emits (window, bucket) rows — cardinality bound =
    windows x buckets, independent of row volume."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    src = str(tmp_path / "src2")
    base = 1704067200
    docs.select(
        "doc_id", "n_chars",
        F.timestamp_seconds(F.lit(base) + F.col("doc_id") % 60).alias("ts"),
    ).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    out = windowed_counts(
        spark.readStream.schema(schema).parquet(src), watermark="1 second"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("wc_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from wc_test").collect()
    n_buckets = docs.select(
        F.floor(F.col("n_chars") / 50).cast("int")
    ).distinct().count()
    # single window (plus none emitted if watermark hasn't passed): rows
    # bounded by the bucket domain
    assert len(rows) <= n_buckets
