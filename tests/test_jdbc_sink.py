"""JDBC sink DDL generation + staging transaction against a DBAPI stub
(no PostgreSQL in this container — the SQL strings are the parity artifact)."""

import pytest

from nemsis_xml_parser_spark.operators import jdbc_sink as J
from nemsis_xml_parser_spark.operators.flatten import flatten_xml_strings
from nemsis_xml_parser_spark.operators.warehouse import (
    attribute_columns_per_table,
    table_comments,
    table_frame,
)
from tests.conftest import NEMSIS_XML


class StubCursor:
    def __init__(self, log, fail_on=None):
        self.log = log
        self.fail_on = fail_on

    def execute(self, sql, params=None):
        if self.fail_on and self.fail_on in sql:
            raise RuntimeError(f"injected failure on: {self.fail_on}")
        self.log.append(("execute", sql, params))

    def executemany(self, sql, rows):
        self.log.append(("executemany", sql, list(rows)))


class StubConn:
    def __init__(self, fail_on=None):
        self.log = []
        self.committed = False
        self.rolled_back = False
        self.fail_on = fail_on

    def cursor(self):
        return StubCursor(self.log, self.fail_on)

    def commit(self):
        self.committed = True

    def rollback(self):
        self.rolled_back = True


def test_create_table_sql_shape():
    stmts = J.create_table_sql("evitals_06", ["nv"], path_comment="a/b's")
    assert stmts[0] == (
        'CREATE TABLE IF NOT EXISTS "public"."evitals_06" '
        '("element_id" TEXT PRIMARY KEY, "parent_element_id" TEXT, '
        '"pcr_uuid_context" TEXT, "original_tag_name" TEXT, '
        '"evitals_06_value" TEXT, "nv" TEXT);'
    )
    assert stmts[1] == 'COMMENT ON TABLE "public"."evitals_06" IS \'a/b\'\'s\';'


def test_widen_and_fk_sql():
    assert J.widen_table_sql("t", ["a", "b"]) == [
        'ALTER TABLE "public"."t" ADD COLUMN IF NOT EXISTS "a" TEXT;',
        'ALTER TABLE "public"."t" ADD COLUMN IF NOT EXISTS "b" TEXT;',
    ]
    probe, ddl = J.fk_constraint_sql("child", "parent")
    assert "information_schema.table_constraints" in probe
    assert '"fk_child_parent"' in ddl
    assert "ON DELETE CASCADE" in ddl
    # long names hash-truncate ≤ 63
    _, ddl_long = J.fk_constraint_sql("c" * 60, "p" * 60)
    name = ddl_long.split('ADD CONSTRAINT "')[1].split('"')[0]
    assert len(name) <= 63


def test_fk_pairs_derived(spark):
    els = flatten_xml_strings(spark, [("f.xml", NEMSIS_XML)])
    pairs = J.fk_pairs(els)
    # original sanitized-tag case preserved (reference main_ingest.py:460-462)
    assert ("eVitals_01", "eVitals_VitalGroup") in pairs
    assert ("PatientCareReport", "Header") in pairs
    assert all(len(p) == 2 for p in pairs)


def test_fk_constraint_name_original_case_parity():
    """The reference builds the ideal name from raw-case sanitized tags and
    lowercases only the table identifiers in the DDL
    (main_ingest.py:509-514)."""
    probe, ddl = J.fk_constraint_sql("PatientCareReport", "Header")
    assert '"fk_PatientCareReport_Header"' in ddl
    assert '"public"."patientcarereport"' in ddl
    assert 'REFERENCES "public"."header"' in ddl
    assert "table_name = 'patientcarereport'" in probe
    assert "fk_PatientCareReport_Header" in probe
    # truncation hash must also come from the raw-case ideal name
    import hashlib
    child, parent = "C" * 60, "P" * 60
    _, ddl_long = J.fk_constraint_sql(child, parent)
    name = ddl_long.split('ADD CONSTRAINT "')[1].split('"')[0]
    assert len(name) <= 63
    assert name.endswith(hashlib.md5(f"fk_{child}_{parent}".encode()).hexdigest()[:6])


def test_stage_to_jdbc_transaction(spark):
    els = flatten_xml_strings(spark, [("f.xml", NEMSIS_XML)])
    attr = attribute_columns_per_table(els)
    frames = {"evitals_06": table_frame(els, "evitals_06", attr["evitals_06"])}
    registry = {"evitals_06": frames["evitals_06"].columns}
    conn = StubConn()
    out = J.stage_to_jdbc(
        conn, registry, frames, ["P1"], comments=table_comments(els)
    )
    assert out == {"evitals_06": 1}
    assert conn.committed and not conn.rolled_back
    kinds = [k for k, *_ in conn.log]
    assert "executemany" in kinds  # batched, not per-row execute
    deletes = [s for k, s, _ in conn.log if k == "execute" and s.startswith("DELETE")]
    assert deletes == ['DELETE FROM "public"."evitals_06" WHERE "pcr_uuid_context" IN (\'P1\');']


def test_stage_to_jdbc_rollback_on_failure(spark):
    els = flatten_xml_strings(spark, [("f.xml", NEMSIS_XML)])
    frames = {"evitals_06": table_frame(els, "evitals_06", ["nv"])}
    conn = StubConn(fail_on="DELETE")
    with pytest.raises(RuntimeError, match="injected failure"):
        J.stage_to_jdbc(conn, {"evitals_06": frames["evitals_06"].columns}, frames, ["P1"])
    assert conn.rolled_back and not conn.committed
