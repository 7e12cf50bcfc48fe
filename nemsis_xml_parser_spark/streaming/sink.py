"""Exactly-once JDBC sink for Structured Streaming — transactional
batch-id idempotence over ``foreachBatch``.

``foreachBatch`` alone is AT-LEAST-ONCE: after a crash between the sink
write and the checkpoint commit, Spark re-delivers the same microbatch
(same ``batch_id``) on restart, and a naive append duplicates it.  The
production fix is the epoch-stamped idempotent upsert: every applied
batch records its ``(sink_id, batch_id)`` in a ``_stream_commits``
ledger INSIDE THE SAME DATABASE TRANSACTION as the data rows, so

* crash BEFORE commit → rollback removes rows and marker together;
  replay applies the batch cleanly;
* crash AFTER commit (before the Spark checkpoint advances) → replay
  finds the marker and skips — no duplicate rows, ever.

This is the reference's transaction-per-file
(/root/reference/main_ingest.py:644,661-688 — one commit covering data
and bookkeeping) transplanted to stream time: the unit of atomicity
moves from file to microbatch, and the MD5 idempotency log the
reference kept but never checked (main_ingest.py:39-50 — SURVEY D5)
becomes a ledger that is actually consulted on every delivery.

Tested live against DuckDB (DBAPI) AND Derby (a real JDBC engine via
the ``java.sql`` py4j bridge, operators/dbapi.py::JavaJdbcConnection)
with a forced crash-after-commit and a checkpoint-restart replay
(tests/test_stream_sink.py); PostgreSQL swaps in via ``conn_factory``.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

COMMITS_TABLE = "_stream_commits"

_CREATE_COMMITS = (
    f'CREATE TABLE IF NOT EXISTS "{COMMITS_TABLE}" ('
    '"sink_id" TEXT, "batch_id" BIGINT, "n_rows" BIGINT, '
    '"committed_at" TEXT, PRIMARY KEY ("sink_id", "batch_id"));'
)


def _qmark_insert(table: str, n_cols: int) -> str:
    params = ", ".join(["?"] * n_cols)
    return f'INSERT INTO "{table}" VALUES ({params});'


def exactly_once_batch_writer(
    conn_factory: Callable[[], object],
    table: str,
    columns: list[str],
    sink_id: str,
    create_sql: str | None = None,
    batch_size: int = 1000,
    after_commit: Callable[[int], None] | None = None,
    commits_create_sql: str = _CREATE_COMMITS,
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function with transactional batch-id dedup.

    ``conn_factory`` opens a DBAPI connection per batch (qmark style —
    DuckDB/JDBC-bridged drivers; swap the placeholder for psycopg2).
    ``create_sql`` optionally creates the target table.  ``after_commit``
    is a test seam fired after the DB commit but before Spark's
    checkpoint advances — raising there simulates the
    crash-after-commit window that separates exactly-once from
    at-least-once.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        conn = conn_factory()
        try:
            cur = conn.cursor()
            for ddl in filter(None, (commits_create_sql, create_sql)):
                try:
                    cur.execute(ddl)
                except Exception:  # noqa: BLE001
                    # engines without IF NOT EXISTS (Derby) raise when the
                    # table already exists; nothing else is in the txn yet
                    conn.rollback()
            cur.execute(
                f'SELECT 1 FROM "{COMMITS_TABLE}" '
                'WHERE "sink_id" = ? AND "batch_id" = ?;',
                (sink_id, batch_id),
            )
            if cur.fetchone() is not None:
                return  # replayed batch: committed atomically in a prior life
            rows = [tuple(r) for r in batch_df.select(*columns).collect()]
            try:
                sql = _qmark_insert(table, len(columns))
                for i in range(0, len(rows), batch_size):
                    cur.executemany(sql, rows[i : i + batch_size])
                cur.execute(
                    f'INSERT INTO "{COMMITS_TABLE}" VALUES (?, ?, ?, ?);',
                    (
                        sink_id,
                        batch_id,
                        len(rows),
                        _dt.datetime.now(_dt.timezone.utc).isoformat(),
                    ),
                )
                conn.commit()  # data + ledger land together or not at all
            except Exception:
                conn.rollback()
                raise
        finally:
            close = getattr(conn, "close", None)
            if close is not None:
                close()
        if after_commit is not None:
            after_commit(batch_id)

    return write


def stream_to_jdbc_exactly_once(
    df: DataFrame,
    conn_factory: Callable[[], object],
    table: str,
    columns: list[str],
    sink_id: str,
    checkpoint: str,
    create_sql: str | None = None,
    after_commit: Callable[[int], None] | None = None,
    commits_create_sql: str = _CREATE_COMMITS,
) -> StreamingQuery:
    """Wire a streaming DataFrame into the exactly-once JDBC sink."""
    writer = exactly_once_batch_writer(
        conn_factory,
        table,
        columns,
        sink_id,
        create_sql=create_sql,
        after_commit=after_commit,
        commits_create_sql=commits_create_sql,
    )
    return (
        df.writeStream.outputMode("append")
        .foreachBatch(writer)
        .option("checkpointLocation", checkpoint)
        .start()
    )
