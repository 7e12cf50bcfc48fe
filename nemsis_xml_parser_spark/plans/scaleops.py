"""Scale-pattern operators surfaced as oracle-checked queries.

* ``window_scalable_running_total`` — the distributed two-pass prefix
  sum (operators/prefix_sum.py): the scale path for every global
  running total that tools/audit_plans.py would reject as a
  single-partition window.  The oracle is the plain ANSI
  ``SUM() OVER (ORDER BY ...)`` — proving the two-pass decomposition
  computes exactly the textbook semantics.
* ``etl_table_checksum`` — order-independent bucketed table checksum
  (Merkle-style anti-entropy): per bucket, BIT_XOR of md5-derived
  64-bit row hashes + row count.  Two replicas compare 16 rows instead
  of the whole table; a single changed/missing/duplicated row flips
  its bucket's hash.  Both engines derive the int from the same md5
  hex prefix, so the checksum itself is the cross-engine contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import register, table

# ---------------------------------------------------------------------------
# Distributed two-pass global running total
# ---------------------------------------------------------------------------


@register(
    "window_scalable_running_total",
    family="window",
    doc="Global running total of order value in orderkey order, computed "
    "by the two-pass distributed prefix sum (operators/prefix_sum.py) "
    "instead of the single-partition SUM() OVER (ORDER BY ...) window: "
    "range-repartition on the key, partition-LOCAL running sums, then "
    "a broadcast exclusive-prefix of the per-partition totals (one row "
    "per partition).  Values are DECIMAL-staged so the distributed "
    "decomposition is bit-identical to the ANSI window the oracle "
    "runs — same semantics, no scale-killing funnel; result invariant "
    "to sampled range boundaries by prefix-sum associativity.",
    oracle="""
SELECT o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
            OVER (ORDER BY o_orderkey) AS DOUBLE) AS running_total
FROM orders
""",
)
def window_scalable_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix_sum import scalable_running_sum

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("decimal(12,2)").alias("_v")
    )
    out = scalable_running_sum(o, "o_orderkey", "_v", out_col="_rt")
    return out.select(
        "o_orderkey", F.col("_rt").cast("double").alias("running_total")
    )


# ---------------------------------------------------------------------------
# Order-independent bucketed table checksum
# ---------------------------------------------------------------------------

CHECKSUM_BUCKETS = 16


@register(
    "etl_table_checksum",
    family="etl",
    doc="Merkle-style anti-entropy checksum of the customer dimension: "
    "row hash = first 15 hex chars of md5 over the '|'-joined key "
    "columns as a 64-bit int, aggregated per (custkey % 16) bucket "
    "with BIT_XOR + COUNT.  XOR is commutative/associative, so the "
    "checksum is row-order independent and computable map-side in one "
    "pass; replicas diff 16 bucket rows instead of the table, and any "
    "single-row change flips exactly one bucket.  The md5-int "
    "derivation is byte-identical across engines (Spark conv(hex,16,"
    "10) == DuckDB '0x'||hex cast).  Scale shape: one hash aggregate, "
    "no shuffle wider than 16 groups after partial aggregation.",
    oracle=f"""
SELECT c_custkey % {CHECKSUM_BUCKETS} AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       bit_xor(CAST(('0x' || substr(md5(
           CAST(c_custkey AS VARCHAR) || '|' || c_name || '|'
           || CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment
       ), 1, 15)) AS BIGINT)) AS xor_hash
FROM customer GROUP BY 1 ORDER BY 1
""",
)
def etl_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    row_hash = F.expr(
        "cast(conv(substr(md5(concat("
        "cast(c_custkey as string), '|', c_name, '|', "
        "cast(c_nationkey as string), '|', c_mktsegment"
        ")), 1, 15), 16, 10) as bigint)"
    )
    return (
        c.select(
            (F.col("c_custkey") % CHECKSUM_BUCKETS).alias("bucket"),
            row_hash.alias("h"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.expr("bit_xor(h)").alias("xor_hash"),
        )
        .orderBy("bucket")
    )
