"""applyInPandasWithState custom stateful operator: lifetime totals must
accumulate across microbatches and survive a checkpointed restart."""

import pandas as pd
import pyspark.sql.functions as F

from nemsis_xml_parser_spark.streaming.stateful import running_totals

SCHEMA = "event_id long, ts string, event_type string, value double"


def _write_batch(src, name, rows):
    pd.DataFrame(
        rows, columns=["event_id", "ts", "event_type", "value"]
    ).to_json(src / name, orient="records", lines=True)


def _run(spark, src, ckpt):
    """availableNow run with a foreachBatch sink (memory sink cannot recover
    from a checkpoint; foreachBatch can)."""
    out = {}

    def sink(batch_df, _batch_id):
        for r in batch_df.collect():
            out[r["event_type"]] = (r["n_events"], r["sum_value"])

    ev = spark.readStream.schema(SCHEMA).json(str(src))
    q = (
        running_totals(ev)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return out


def test_running_totals_accumulate_across_restarts(spark, tmp_path):
    src = tmp_path / "st_src"
    src.mkdir()
    ckpt = tmp_path / "st_ckpt"

    _write_batch(src, "b1.json", [
        (1, "2024-01-01 10:00:00", "click", 1.0),
        (2, "2024-01-01 10:01:00", "click", 2.0),
        (3, "2024-01-01 10:02:00", "view", 3.0),
    ])
    first = _run(spark, src, ckpt)
    assert first["click"] == (2, 3.0)
    assert first["view"] == (1, 3.0)

    # new file, restart from the checkpoint: state picks up where it left off
    _write_batch(src, "b2.json", [
        (4, "2024-01-01 10:03:00", "click", 5.0),
    ])
    second = _run(spark, src, ckpt)
    assert second["click"] == (3, 8.0)  # 2+1 events, 3.0+5.0
    assert "view" not in second  # update mode: untouched keys not re-emitted


def test_sessionize_with_timeout_closes_on_gap(spark, tmp_path):
    from nemsis_xml_parser_spark.streaming.stateful import sessionize_with_timeout

    src = tmp_path / "sess_src"
    src.mkdir()
    ckpt = tmp_path / "sess_ckpt"
    # user 7: two events 5 min apart, then one 2h later (gap > 30 min closes
    # the first session inside the batch)
    _write_batch(src, "b1.json", [
        (1, "2024-01-01 10:00:00", "click", 1.0),
        (2, "2024-01-01 10:05:00", "click", 1.0),
        (3, "2024-01-01 12:30:00", "click", 1.0),
    ])

    out = []

    def sink(batch_df, _bid):
        out.extend(batch_df.collect())

    ev = (
        spark.readStream.schema(SCHEMA)
        .json(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumnRenamed("event_id", "user_id_src")
        .withColumn("user_id", F.lit(7))
    )
    q = (
        sessionize_with_timeout(ev, gap_seconds=1800)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    sessions = [(r["session_start"], r["session_end"], r["n_events"]) for r in out]
    # first session (10:00-10:05, 2 events) closed by the in-batch gap
    ms = lambda s: int(pd.Timestamp(s).value // 1_000_000)  # noqa: E731
    assert (ms("2024-01-01 10:00:00"), ms("2024-01-01 10:05:00"), 2) in sessions


DOC_SCHEMA = "doc_id long, ts string, text string"

BASE = ("the quick brown fox jumps over the lazy dog near the river "
        "bank today while the sun sets slowly behind the hills")


def _write_docs(src, name, rows):
    pd.DataFrame(rows, columns=["doc_id", "ts", "text"]).to_json(
        src / name, orient="records", lines=True
    )


def _run_lsh(spark, src, ckpt):
    from nemsis_xml_parser_spark.streaming.stateful import (
        lsh_band_collisions,
        novel_doc_verdicts,
    )

    verdicts = {}

    def sink(batch_df, _bid):
        for r in novel_doc_verdicts(batch_df).collect():
            verdicts[r["doc_id"]] = (r["is_dup"], r["dup_of"])

    docs = (
        spark.readStream.schema(DOC_SCHEMA)
        .json(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        lsh_band_collisions(docs)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return verdicts


def test_lsh_band_dedup_survives_restart(spark, tmp_path):
    src = tmp_path / "lsh_src"
    src.mkdir()
    ckpt = tmp_path / "lsh_ckpt"

    _write_docs(src, "b1.json", [
        (0, "2024-01-01 10:00:00", BASE),
        (1, "2024-01-01 10:00:30", "completely different content about "
            "medical records and emergency services data systems"),
        (2, "2024-01-01 10:01:00", BASE),  # exact dup of 0, same batch
    ])
    first = _run_lsh(spark, src, ckpt)
    assert first[0] == (False, None)   # first claimant of its bands
    assert first[1] == (False, None)   # novel content
    assert first[2] == (True, 0)       # all bands collide with doc 0

    # restart from the checkpoint: band state must survive
    _write_docs(src, "b2.json", [
        (3, "2024-01-01 10:05:00", BASE),  # dup of doc 0, across restart
        (4, "2024-01-01 10:05:30", "spark executes distributed dataframe "
            "plans with catalyst and tungsten engines at scale"),
    ])
    second = _run_lsh(spark, src, ckpt)
    assert second[3] == (True, 0)      # checkpointed state caught it
    assert second[4] == (False, None)
