"""Stream-stream interval join: watermarked view→click attribution, and
batch/stream result parity on the same input."""

import pandas as pd
import pyspark.sql.functions as F

from nemsis_xml_parser_spark.streaming.joins import (
    attribute_clicks_batch,
    attribute_clicks_stream,
)

ROWS = [
    # user 7: view at 10:00; click at 10:20 (attributed), click at 11:40 (outside 30m)
    (1, "2024-01-01 10:00:00", 7, "view", 0.0),
    (2, "2024-01-01 10:20:00", 7, "click", 5.0),
    (3, "2024-01-01 11:40:00", 7, "click", 6.0),
    # user 8: click with no prior view
    (4, "2024-01-01 10:10:00", 8, "click", 7.0),
    # user 9: view after the click — not attributed
    (5, "2024-01-01 10:30:00", 9, "click", 8.0),
    (6, "2024-01-01 10:45:00", 9, "view", 0.0),
]
COLS = ["event_id", "ts", "user_id", "event_type", "value"]


def _stream(spark, tmp_path):
    src = tmp_path / "ev_src"
    src.mkdir()
    pd.DataFrame(ROWS, columns=COLS).to_json(
        src / "batch.json", orient="records", lines=True
    )
    schema = "event_id long, ts string, user_id long, event_type string, value double"
    return (
        spark.readStream.schema(schema)
        .json(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def test_stream_attribution_matches_batch(spark, tmp_path):
    ev = _stream(spark, tmp_path)
    views = ev.where(F.col("event_type") == "view")
    clicks = ev.where(F.col("event_type") == "click")
    out = attribute_clicks_stream(views, clicks, horizon="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["view_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM attrib").collect()
    }
    assert got == {(1, 2)}

    bdf = spark.createDataFrame(pd.DataFrame(ROWS, columns=COLS)).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    batch = attribute_clicks_batch(
        bdf.where(F.col("event_type") == "view"),
        bdf.where(F.col("event_type") == "click"),
        horizon="30 minutes",
    )
    assert {(r["view_id"], r["click_id"]) for r in batch.collect()} == got
    row = batch.collect()[0]
    assert row["user_id"] == 7 and row["click_value"] == 5.0
