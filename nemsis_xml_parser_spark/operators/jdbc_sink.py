"""PostgreSQL/JDBC warehouse adapter (SURVEY B1-B4, D3/D6 on JDBC).

The reference materializes its warehouse in PostgreSQL with dynamic DDL:
CREATE TABLE with 5 common columns (+PK), ALTER TABLE ADD COLUMN widening,
and FK constraints with 63-char-safe names, all inside a per-file
transaction (/root/reference/main_ingest.py:169-273,500-642,644).

Spark's JDBC writer can't issue DDL/PK/FK, so this module does what the
reference's psycopg2 layer did — but set-based:

* ``create_table_sql`` / ``widen_table_sql`` / ``fk_constraint_sql``
  generate exact-shape DDL from the warehouse schema registry (one schema
  pass per tag instead of per element);
* ``fk_pairs`` derives the unique (child_table, parent_table) pairs
  distributively (D4);
* ``stage_to_jdbc`` executes: DDL → set-based DELETE by PCR keys (D3) →
  batched INSERT appends — one transaction per batch (D6) when a DBAPI
  connection is supplied.

No PostgreSQL exists in the test container, so execution is exercised
against an in-memory DBAPI stub in tests; the SQL strings are the parity
artifact and are byte-stable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..naming import COMMON_COLUMNS, fk_constraint_name, value_column_name


def create_table_sql(
    table: str, attr_cols: list[str], schema: str = "public", path_comment: str | None = None
) -> list[str]:
    """CREATE TABLE with the reference's exact 5-common-column layout
    (main_ingest.py:210-246) + COMMENT carrying the XML path."""
    cols = [
        '"element_id" TEXT PRIMARY KEY',
        '"parent_element_id" TEXT',
        '"pcr_uuid_context" TEXT',
        '"original_tag_name" TEXT',
        f'"{value_column_name(table)}" TEXT',
    ] + [f'"{a}" TEXT' for a in attr_cols]
    stmts = [
        f'CREATE TABLE IF NOT EXISTS "{schema}"."{table}" ({", ".join(cols)});'
    ]
    if path_comment is not None:
        escaped = path_comment.replace("'", "''")
        stmts.append(f'COMMENT ON TABLE "{schema}"."{table}" IS \'{escaped}\';')
    return stmts


def widen_table_sql(
    table: str, new_attr_cols: list[str], schema: str = "public"
) -> list[str]:
    """Schema evolution by widening (main_ingest.py:252-271), one ALTER per
    newly-observed attribute column."""
    return [
        f'ALTER TABLE "{schema}"."{table}" ADD COLUMN IF NOT EXISTS "{a}" TEXT;'
        for a in new_attr_cols
    ]


def fk_pairs(elements: DataFrame) -> list[tuple[str, str]]:
    """Distinct (child_table, parent_table) pairs derived distributively
    (parity: main_ingest.py:451-463 set-dedup, D4).

    Pairs keep the ORIGINAL sanitized-tag case — the reference builds the
    constraint name from raw-case tags (main_ingest.py:512-514,
    ``fk_PatientCareReport_Header``) and lowercases only the table
    identifiers inside the DDL; lowering here would change both the ideal
    name and the MD5 truncation suffix.
    """
    rows = (
        elements.where(F.col("parent_table_name").isNotNull())
        .select(
            F.col("table_name").alias("c"),
            F.col("parent_table_name").alias("p"),
        )
        .distinct()
        .collect()
    )
    return sorted((r["c"], r["p"]) for r in rows)


def fk_constraint_sql(
    child: str, parent: str, schema: str = "public"
) -> tuple[str, str]:
    """(probe_sql, ddl_sql) for one FK: existence probe against
    information_schema (main_ingest.py:586-603) and the ADD CONSTRAINT with
    the 63-char-safe name and ON DELETE CASCADE (main_ingest.py:605-618).

    ``child``/``parent`` are original-case sanitized tags; the constraint
    name is derived from them verbatim (main_ingest.py:512-514) while the
    table identifiers are lowercased in the probe and DDL
    (main_ingest.py:509-510, ``.lower()`` on both tables).
    """
    name = fk_constraint_name(child, parent)
    child_l, parent_l = child.lower(), parent.lower()
    probe = (
        "SELECT constraint_name FROM information_schema.table_constraints "
        f"WHERE table_schema = '{schema}' AND table_name = '{child_l}' "
        f"AND constraint_name = '{name}' AND constraint_type = 'FOREIGN KEY';"
    )
    ddl = (
        f'ALTER TABLE "{schema}"."{child_l}" ADD CONSTRAINT "{name}" '
        f'FOREIGN KEY ("parent_element_id") REFERENCES "{schema}"."{parent_l}" '
        '("element_id") ON DELETE CASCADE;'
    )
    return probe, ddl


def delete_by_keys_sql(table: str, keys: list[str], schema: str = "public") -> str:
    """Set-based key-scoped delete — replaces the reference's per-UUID
    round-trips (main_ingest.py:312-316) with one statement per table."""
    key_list = ", ".join("'" + k.replace("'", "''") + "'" for k in keys)
    return (
        f'DELETE FROM "{schema}"."{table}" '
        f'WHERE "pcr_uuid_context" IN ({key_list});'
    )


#: DBAPI paramstyle → placeholder token (psycopg2 is "format", duckdb and
#: most JDBC-bridged drivers are "qmark")
_PLACEHOLDERS = {"format": "%s", "qmark": "?"}


def insert_sql(
    table: str, columns: list[str], schema: str = "public", paramstyle: str = "format"
) -> str:
    """Parameterized batched INSERT template (executemany) — replaces the
    reference's statement-per-element (main_ingest.py:485-495)."""
    collist = ", ".join(f'"{c}"' for c in columns)
    params = ", ".join([_PLACEHOLDERS[paramstyle]] * len(columns))
    return f'INSERT INTO "{schema}"."{table}" ({collist}) VALUES ({params});'


def stage_to_jdbc(
    conn,
    registry: dict[str, list[str]],
    frames: dict[str, DataFrame],
    pcr_keys: list[str],
    comments: dict[str, str] | None = None,
    schema: str = "public",
    batch_size: int = 1000,
    paramstyle: str = "format",
) -> dict[str, int]:
    """Execute the full staging transaction over a DBAPI connection:
    DDL → FK DDL → set-based DELETE → batched INSERTs → commit (rollback on
    any error — D6 parity).  Returns rows inserted per table.

    ``frames`` values must be per-tag table frames (warehouse.table_frame
    shape).  At scale, run per-partition with connection pooling via
    ``df.foreachPartition``; here the driver iterates because dynamic-table
    row counts in NEMSIS files are small.
    """
    inserted: dict[str, int] = {}
    cur = conn.cursor()
    try:
        for table, cols in registry.items():
            attr_cols = [c for c in cols if c not in COMMON_COLUMNS and c != value_column_name(table)]
            for stmt in create_table_sql(
                table, attr_cols, schema, (comments or {}).get(table)
            ):
                cur.execute(stmt)
            if pcr_keys:
                cur.execute(delete_by_keys_sql(table, pcr_keys, schema))
            rows = [tuple(r) for r in frames[table].collect()]
            sql = insert_sql(table, cols, schema, paramstyle)
            for i in range(0, len(rows), batch_size):
                cur.executemany(sql, rows[i : i + batch_size])
            inserted[table] = len(rows)
        conn.commit()
        return inserted
    except Exception:
        conn.rollback()
        raise
