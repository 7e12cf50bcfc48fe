"""ETL-operator parity queries (SURVEY §2.C) — the reference's scalar ETL
semantics exercised as oracle-checked queries over the driver tables.

The real ETL path (XML → elements DF → warehouse) is exercised in
tests/test_flatten.py and tests/test_warehouse.py against FIXTURES.md; these
queries prove the same column-level semantics (sanitize, namespace strip,
naming, hashing, distinct-pair dedup) under the driver's DuckDB gate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions import text as T
from .registry import register, table

# SQL twin of functions.text.sanitize_identifier_col (ASCII subset)
def _sql_sanitize(expr: str) -> str:
    base = f"regexp_replace(replace({expr}, '.', '_'), '[^A-Za-z0-9_]', '', 'g')"
    return (
        f"CASE WHEN {base} = '' THEN 'unnamed_element' "
        f"WHEN regexp_matches({base}, '^[0-9]') THEN '_' || {base} "
        f"ELSE {base} END"
    )


@register(
    "etl_sanitize_identifiers",
    family="etl",
    doc="Identifier sanitizer battery (C2 parity: dots→_, strip specials, digit-prefix) "
    "applied to synthesized dirty names.",
    oracle=f"""
SELECT p_partkey,
       {_sql_sanitize("p_name")} AS clean_name,
       {_sql_sanitize("CAST(p_size AS VARCHAR) || '.' || p_type")} AS clean_digit_leading,
       LOWER({_sql_sanitize("p_type")}) || '_value' AS value_column
FROM part
""",
)
def etl_sanitize_identifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    dirty = F.concat(F.col("p_size").cast("string"), F.lit("."), F.col("p_type"))
    return p.select(
        "p_partkey",
        T.sanitize_identifier_col(F.col("p_name")).alias("clean_name"),
        T.sanitize_identifier_col(dirty).alias("clean_digit_leading"),
        F.concat(
            F.lower(T.sanitize_identifier_col(F.col("p_type"))), F.lit("_value")
        ).alias("value_column"),
    )


@register(
    "etl_namespace_strip",
    family="etl",
    doc="Namespace strip (C1 parity: '{uri}Tag' → 'Tag') on synthesized namespaced tags.",
    oracle="""
SELECT p_partkey,
       regexp_replace('{http://www.nemsis.org}' || p_brand, '^\\{[^}]*\\}', '') AS local_tag
FROM part
""",
)
def etl_namespace_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    namespaced = F.concat(F.lit("{http://www.nemsis.org}"), F.col("p_brand"))
    return p.select(
        "p_partkey", T.strip_namespace_col(namespaced).alias("local_tag")
    )


@register(
    "etl_trim_nullify",
    family="etl",
    doc="Text trim semantics (C3 parity: strip; whitespace-only → empty string).",
    oracle="""
SELECT p_partkey, TRIM('  ' || p_name || '   ') AS trimmed,
       LENGTH(TRIM('   ')) AS ws_only_len
FROM part
""",
)
def etl_trim_nullify(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    padded = F.concat(F.lit("  "), F.col("p_name"), F.lit("   "))
    return p.select(
        "p_partkey",
        T.trim_nullify(padded).alias("trimmed"),
        F.length(T.trim_nullify(F.lit("   "))).cast("bigint").alias("ws_only_len"),
    )


@register(
    "etl_file_md5",
    family="etl",
    doc="Content MD5 hashing (A5/E5 parity: file-bytes digest → here over document text).",
    oracle="""
SELECT doc_id, md5(text) AS content_md5 FROM documents
""",
)
def etl_file_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", F.md5(F.col("text").cast("binary")).alias("content_md5"))


@register(
    "etl_distinct_pairs",
    family="etl",
    doc="Distinct key-pair extraction (D2/D4 parity: the FK-pair dedup primitive).",
    oracle="""
SELECT DISTINCT l_returnflag AS child_key, l_linestatus AS parent_key FROM lineitem
""",
)
def etl_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        F.col("l_returnflag").alias("child_key"),
        F.col("l_linestatus").alias("parent_key"),
    ).distinct()
