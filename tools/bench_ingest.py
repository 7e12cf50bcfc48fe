"""ETL ingest throughput bench — the reference's own workload, measured
end-to-end: flatten → warehouse fan-out → distributed JDBC staging.

The reference ingests one XML file at a time, one SQL INSERT round-trip per
element on a single thread (/root/reference/main_ingest.py:429-495).  This
bench runs OUR pipeline over N synthetic NEMSIS files and reports:

* stage 1 — ``ingest_xml_files`` (md5-skip → distributed flatten →
  per-tag warehouse parquet fan-out → bookkeeping): files/s and
  elements/s, the number to hold against any single-node ingestor at
  the same element count;
* stage 2 — ``stage_to_jdbc_distributed`` of the same flatten output
  into a live DuckDB target (per-partition executor connections into
  file-backed scratch DBs + ONE promote transaction — the exact
  dispatcher the pipeline routes >=100k-row batches through;
  PostgreSQL swaps the connect_fn, nothing else): rows/s inserted.

Usage: python tools/bench_ingest.py [n_files] [pcrs_per_file]
Prints one JSON line; rounds commit it as BENCH_ingest_r{N}.json.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from nemsis_xml_parser_spark.operators import jdbc_sink as J  # noqa: E402
from nemsis_xml_parser_spark.operators.bookkeeping import (  # noqa: E402
    ingest_xml_files,
)
from nemsis_xml_parser_spark.operators.flatten import (  # noqa: E402
    flatten_xml_files,
)
from nemsis_xml_parser_spark.operators.warehouse import (  # noqa: E402
    COMMON_COLUMNS,
    attribute_columns_per_table,
    table_comments,
    table_frame,
    value_column_name,
)
from nemsis_xml_parser_spark.session import get_spark  # noqa: E402

PCR_TEMPLATE = """  <Header>
    <PatientCareReport UUID="pcr-{fid}-{pid}">
      <eRecord><eRecord.01>rec-{fid}-{pid}</eRecord.01></eRecord>
      <eTimes>
        <eTimes.01>2025-02-15T12:0{t}:00-05:00</eTimes.01>
        <eTimes.03>2025-02-15T12:1{t}:00-05:00</eTimes.03>
      </eTimes>
      <eVitals VitalGroup="g{pid}">
        <eVitals.01>2025-02-15T12:15:00-05:00</eVitals.01>
        <eVitals.06 units="mmHg">1{t}0</eVitals.06>
        <eVitals.10>9{t}</eVitals.10>
        <eVitals.14>3{t}</eVitals.14>
      </eVitals>
      <eDisposition>
        <eDisposition.12 code="43{t}">Treated</eDisposition.12>
      </eDisposition>
    </PatientCareReport>
  </Header>
"""


def make_file(fid: int, pcrs: int) -> str:
    body = "".join(
        PCR_TEMPLATE.format(fid=fid, pid=p, t=p % 10) for p in range(pcrs)
    )
    return f'<EMSDataSet xmlns="http://www.nemsis.org">\n{body}</EMSDataSet>\n'


class _DuckConn:
    """psycopg2-style transaction contract over DuckDB (the
    tests/test_jdbc_live.py adapter, file-backed so ATTACH works)."""

    def __init__(self, path: str):
        self._c = duckdb.connect(path)
        self._c.execute("CREATE SCHEMA IF NOT EXISTS public;")
        self._in_txn = False

    def _begin(self):
        if not self._in_txn:
            self._c.execute("BEGIN TRANSACTION;")
            self._in_txn = True

    def cursor(self):
        conn = self

        class _Cur:
            def execute(self, sql, params=None):
                conn._begin()
                conn._c.execute(sql, params)
                return self

            def executemany(self, sql, rows):
                conn._begin()
                conn._c.executemany(sql, rows)
                return self

            def fetchall(self):
                return conn._c.fetchall()

            def fetchone(self):
                return conn._c.fetchone()

        return _Cur()

    def commit(self):
        if self._in_txn:
            self._c.execute("COMMIT;")
            self._in_txn = False

    def rollback(self):
        if self._in_txn:
            self._c.execute("ROLLBACK;")
            self._in_txn = False


def _duckdb_hooks(stage_dir: str) -> dict:
    def connect_fn(pid):
        import duckdb as _duck

        return _duck.connect(f"{stage_dir}/stg_{pid}.db")

    def stage_ref(table, pid):
        return f'stg{pid}."{J.stage_table_name(table, pid)}"'

    def prepare_promote(conn, staged):
        for pid in sorted({pid for _, pid, n in staged if n}):
            conn._c.execute(
                f"ATTACH '{stage_dir}/stg_{pid}.db' AS stg{pid} (READ_ONLY);"
            )

    def stage_rows(conn, stage, schema, cols, rows):
        # engine-native bulk path (the PG deployment passes COPY here):
        # register the partition's rows as an Arrow table and bulk
        # INSERT..SELECT — ~150x the DBAPI executemany row-binding rate
        import pyarrow as pa

        tb = pa.table({c: [r[i] for r in rows] for i, c in enumerate(cols)})
        conn.register("_stg_src", tb)
        qual = f'"{schema}"."{stage}"' if schema else f'"{stage}"'
        conn.execute(f"INSERT INTO {qual} SELECT * FROM _stg_src")
        conn.unregister("_stg_src")

    return dict(
        connect_fn=connect_fn,
        stage_schema=None,
        stage_ref=stage_ref,
        prepare_promote=prepare_promote,
        paramstyle="qmark",
        stage_rows=stage_rows,
    )


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    pcrs = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    work = Path(tempfile.mkdtemp(prefix="ingest_bench_"))
    src = work / "xml"
    src.mkdir()
    for f in range(n_files):
        (src / f"file_{f:05d}.xml").write_text(make_file(f, pcrs))
    paths = [str(p) for p in sorted(src.iterdir())]

    # 13 elements per PCR subtree + 1 root per file
    n_elements = n_files * (pcrs * 13 + 1)

    spark = get_spark("ingest-bench")
    wh = str(work / "warehouse")
    t0 = time.time()
    statuses = ingest_xml_files(spark, paths, wh, deterministic_ids=True)
    wh_elapsed = time.time() - t0
    ok = sum(1 for s in statuses.values() if s.startswith("Staged"))

    # stage 2: the distributed JDBC dispatcher over the same flatten
    # output (fresh flatten so stage 2's wall excludes warm caches)
    els = flatten_xml_files(spark, paths, deterministic_ids=True).cache()
    attr_map = attribute_columns_per_table(els)
    tables = sorted(
        attr_map.keys()
        | {
            r["t"]
            for r in els.selectExpr(
                "lower(table_name) t"
            ).distinct().collect()
        }
    )
    registry = {
        t: list(COMMON_COLUMNS) + [value_column_name(t)] + attr_map.get(t, [])
        for t in tables
    }
    frames = {t: table_frame(els, t, attr_map.get(t, [])) for t in tables}
    keys = [
        r["pcr_uuid"]
        for r in els.select("pcr_uuid")
        .where("pcr_uuid is not null")
        .distinct()
        .collect()
    ]
    comments = table_comments(els)
    els.count()  # materialize the cache before the timed staging pass

    stage_dir = work / "stg"
    stage_dir.mkdir()
    conn = _DuckConn(str(work / "target.db"))
    phases: dict = {}
    t0 = time.time()
    inserted = J.stage_to_jdbc_distributed(
        conn,
        registry=registry,
        frames=frames,
        pcr_keys=keys,
        comments=comments,
        phase_timings=phases,
        **_duckdb_hooks(str(stage_dir)),
    )
    jdbc_elapsed = time.time() - t0
    n_rows = sum(inserted.values())

    print(
        json.dumps(
            {
                "metric": "ingest_elements_per_sec",
                "value": round(n_elements / wh_elapsed, 1),
                "unit": "elements/sec",
                "n_files": n_files,
                "n_elements": n_elements,
                "elapsed_sec": round(wh_elapsed, 2),
                "files_per_sec": round(n_files / wh_elapsed, 1),
                "files_ok": ok,
                "jdbc_distributed": {
                    "rows_inserted": n_rows,
                    "n_tables": len(inserted),
                    "elapsed_sec": round(jdbc_elapsed, 2),
                    "rows_per_sec": round(n_rows / jdbc_elapsed, 1),
                    **phases,
                },
            }
        )
    )
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
