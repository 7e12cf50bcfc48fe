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


@register(
    "etl_snapshot_diff",
    family="etl",
    doc="Keyed snapshot diff — the incremental-publish / CDC audit between "
    "two table versions: rows only in the old version (removed), only in "
    "the new (added), in both with a different row fingerprint (changed), "
    "or identical (unchanged).  Versions are simulated deterministically "
    "from orders (old drops key % 97 == 0, new drops key % 89 == 0 and "
    "bumps totalprice on key % 13 == 0); comparison is a full outer join "
    "on the key with md5 row fingerprints, so wide rows never ship twice.  "
    "Scale: one co-partitioned full outer join on the key — with both "
    "versions bucketed by key this is shuffle-free; fingerprints cut the "
    "compare to one column.",
    oracle="""
WITH old_v AS (
  SELECT o_orderkey AS k,
         md5(CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus || '|'
             || CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR)) AS fp
  FROM orders WHERE o_orderkey % 97 != 0
),
new_v AS (
  SELECT o_orderkey AS k,
         md5(CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus || '|'
             || CAST(CAST(CASE WHEN o_orderkey % 13 = 0
                               THEN o_totalprice + 1.00
                               ELSE o_totalprice END AS DECIMAL(12,2))
                     AS VARCHAR)) AS fp
  FROM orders WHERE o_orderkey % 89 != 0
)
SELECT CASE WHEN o.k IS NULL THEN 'added'
            WHEN n.k IS NULL THEN 'removed'
            WHEN o.fp != n.fp THEN 'changed'
            ELSE 'unchanged' END AS status,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(COALESCE(o.k, n.k)) AS BIGINT) AS min_key,
       CAST(MAX(COALESCE(o.k, n.k)) AS BIGINT) AS max_key
FROM old_v o FULL OUTER JOIN new_v n ON o.k = n.k
GROUP BY 1
""",
)
def etl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")

    def fingerprint(price):
        return F.md5(
            F.concat_ws(
                "|",
                F.col("o_custkey").cast("string"),
                F.col("o_orderstatus"),
                price.cast("decimal(12,2)").cast("string"),
            )
        )

    old_v = o.where(F.col("o_orderkey") % 97 != 0).select(
        F.col("o_orderkey").alias("k"), fingerprint(F.col("o_totalprice")).alias("fp")
    )
    new_price = F.when(
        F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + 1.00
    ).otherwise(F.col("o_totalprice"))
    new_v = o.where(F.col("o_orderkey") % 89 != 0).select(
        F.col("o_orderkey").alias("k"), fingerprint(new_price).alias("fp")
    )
    joined = old_v.alias("o").join(
        new_v.alias("n"), F.col("o.k") == F.col("n.k"), "full_outer"
    )
    status = (
        F.when(F.col("o.k").isNull(), F.lit("added"))
        .when(F.col("n.k").isNull(), F.lit("removed"))
        .when(F.col("o.fp") != F.col("n.fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.groupBy(status.alias("status")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(F.coalesce(F.col("o.k"), F.col("n.k"))).cast("bigint").alias("min_key"),
        F.max(F.coalesce(F.col("o.k"), F.col("n.k"))).cast("bigint").alias("max_key"),
    )
