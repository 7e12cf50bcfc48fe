"""psycopg2-style transaction adapter over DuckDB's DBAPI.

The JDBC/warehouse operators (``stage_to_jdbc``, the exactly-once
streaming sink) are written against the psycopg2 contract the reference
uses (/root/reference/database_setup.py:18-41): one shared transaction
per connection, ``commit``/``rollback`` on the connection object.
DuckDB's Python DBAPI autocommits each statement and ``cursor()`` opens
a separate context, so this bridge issues an explicit BEGIN on first
use and funnels every cursor through the one underlying connection —
the same adapter the live-engine tests use, packaged so tools (bench)
and applications can run the JDBC code paths on DuckDB without a
PostgreSQL server.
"""

from __future__ import annotations

from typing import Any


class DuckTxnConnection:
    """Wrap ``duckdb.connect(path)`` with psycopg2-style transactions."""

    def __init__(self, path: str | None = None) -> None:
        import duckdb

        self._c = duckdb.connect(path) if path is not None else duckdb.connect()
        self._in_txn = False

    def _begin(self) -> None:
        if not self._in_txn:
            self._c.execute("BEGIN TRANSACTION;")
            self._in_txn = True

    def cursor(self) -> Any:
        conn = self

        class _Cur:
            def execute(self, sql: str, params=None):
                conn._begin()
                conn._c.execute(sql, params)
                return self

            def executemany(self, sql: str, rows):
                conn._begin()
                conn._c.executemany(sql, rows)
                return self

            def fetchone(self):
                return conn._c.fetchone()

            def fetchall(self):
                return conn._c.fetchall()

        return _Cur()

    def commit(self) -> None:
        if self._in_txn:
            self._c.execute("COMMIT;")
            self._in_txn = False

    def rollback(self) -> None:
        if self._in_txn:
            self._c.execute("ROLLBACK;")
            self._in_txn = False

    def close(self) -> None:
        self.rollback()
        self._c.close()
