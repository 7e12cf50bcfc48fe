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


@register(
    "etl_incremental_rollup",
    family="etl",
    doc="Incremental materialized-rollup maintenance: instead of "
    "recomputing per-status totals from the full new snapshot, apply the "
    "keyed delta (added rows contribute +new, removed -old, changed "
    "new-old) to the old rollup — the 100 TB pattern where the delta is "
    "MB-scale against a PB-scale base.  Versions are the etl_snapshot_diff "
    "simulation; the result carries BOTH the delta-maintained total and "
    "the direct recompute, so the audit (maintained == direct, drift 0) "
    "is part of the hash-checked answer.  All sums are exact DECIMAL "
    "(order-independent) cast to DOUBLE at the edge.",
    oracle="""
WITH old_v AS (
  SELECT o_orderkey AS k, o_orderstatus AS status,
         CAST(o_totalprice AS DECIMAL(12,2)) AS price
  FROM orders WHERE o_orderkey % 97 != 0
),
new_v AS (
  SELECT o_orderkey AS k, o_orderstatus AS status,
         CAST(CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.00
                   ELSE o_totalprice END AS DECIMAL(12,2)) AS price
  FROM orders WHERE o_orderkey % 89 != 0
),
old_agg AS (
  SELECT status, SUM(price) AS total, COUNT(*) AS n FROM old_v GROUP BY status
),
delta AS (
  SELECT COALESCE(o.status, n.status) AS status,
         SUM(COALESCE(n.price, 0) - COALESCE(o.price, 0)) AS dtotal,
         SUM(CASE WHEN o.k IS NULL THEN 1
                  WHEN n.k IS NULL THEN -1 ELSE 0 END) AS dn
  FROM old_v o FULL OUTER JOIN new_v n ON o.k = n.k
  GROUP BY COALESCE(o.status, n.status)
),
direct AS (
  SELECT status, SUM(price) AS total, COUNT(*) AS n FROM new_v GROUP BY status
)
SELECT d.status,
       CAST(oa.n + dl.dn AS BIGINT) AS n_rows_maintained,
       CAST(d.n AS BIGINT) AS n_rows_direct,
       CAST(oa.total + dl.dtotal AS DOUBLE) AS total_maintained,
       CAST(d.total AS DOUBLE) AS total_direct,
       CAST(oa.total + dl.dtotal - d.total AS DOUBLE) AS drift
FROM direct d
JOIN old_agg oa ON oa.status = d.status
JOIN delta dl ON dl.status = d.status
""",
)
def etl_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    old_v = o.where(F.col("o_orderkey") % 97 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
    )
    new_price = F.when(
        F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + 1.00
    ).otherwise(F.col("o_totalprice"))
    new_v = o.where(F.col("o_orderkey") % 89 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        new_price.cast("decimal(12,2)").alias("price"),
    )
    old_agg = old_v.groupBy("status").agg(
        F.sum("price").alias("total"), F.count(F.lit(1)).alias("n")
    )
    j = old_v.alias("o").join(new_v.alias("n"), F.col("o.k") == F.col("n.k"), "full_outer")
    delta = j.groupBy(
        F.coalesce(F.col("o.status"), F.col("n.status")).alias("status")
    ).agg(
        F.sum(
            F.coalesce(F.col("n.price"), F.lit(0).cast("decimal(12,2)"))
            - F.coalesce(F.col("o.price"), F.lit(0).cast("decimal(12,2)"))
        ).alias("dtotal"),
        F.sum(
            F.when(F.col("o.k").isNull(), 1)
            .when(F.col("n.k").isNull(), -1)
            .otherwise(0)
        ).alias("dn"),
    )
    direct = new_v.groupBy("status").agg(
        F.sum("price").alias("dtotal_direct"), F.count(F.lit(1)).alias("n_direct")
    )
    return (
        direct.join(old_agg, "status")
        .join(delta, "status")
        .select(
            "status",
            (F.col("n") + F.col("dn")).cast("bigint").alias("n_rows_maintained"),
            F.col("n_direct").cast("bigint").alias("n_rows_direct"),
            (F.col("total") + F.col("dtotal")).cast("double").alias("total_maintained"),
            F.col("dtotal_direct").cast("double").alias("total_direct"),
            (F.col("total") + F.col("dtotal") - F.col("dtotal_direct"))
            .cast("double")
            .alias("drift"),
        )
    )
