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
* ``join_bloom_prefilter`` — Bloom runtime-filter join (the manual
  form of the runtime filters Spark/Trino inject): build the filter
  from the selective dimension side (operators/sketches.py), broadcast
  it, and drop fact rows BEFORE the join shuffle; false positives are
  removed by the real join, so the result is byte-identical to the
  plain join the oracle runs.
* ``agg_salted_two_phase`` — skew-safe aggregation: salt the group key
  into 16 subgroups, aggregate partially, re-aggregate — the
  hot-key-agg twin of ``join_salted_skew``.
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


# ---------------------------------------------------------------------------
# Bloom runtime-filter join
# ---------------------------------------------------------------------------

BLOOM_K = 3
BLOOM_M = 4096
BLOOM_SEGMENT = "BUILDING"


@register(
    "join_bloom_prefilter",
    family="join",
    doc="Bloom runtime-filter join (manual form of engine-injected "
    "runtime filters): the Bloom bits of the selective dimension keys "
    "(BUILDING-segment customers, operators/sketches.py::bloom_bits) "
    "broadcast to the fact side and drop non-matching orders BEFORE "
    "the join shuffle; the real join then removes the Bloom's false "
    "positives, so the revenue-by-priority result is byte-identical "
    "to the plain join — which is exactly what the oracle runs.  "
    "Scale shape: the filter is <= m DISTINCT bit rows (broadcastable "
    "by construction), the fact scan aggregates its Bloom probes "
    "map-side, and the expensive shuffle moves only surviving rows; "
    "FN=0 is structural, FP rate only costs shuffle bytes.  "
    "Selectivity teeth pytest-proven in tests/test_scaleops.py.",
    oracle=f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{BLOOM_SEGMENT}'
GROUP BY 1 ORDER BY 1
""",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import bloom_bits, bloom_claims

    c = table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == BLOOM_SEGMENT
    )
    o = table(spark, sf_dir, "orders")
    bits = bloom_bits(c, "c_custkey", k=BLOOM_K, m=BLOOM_M)
    passing = bloom_claims(
        o.select("o_custkey").distinct(), bits, "o_custkey", k=BLOOM_K, m=BLOOM_M
    ).where(F.col("claimed") == 1)
    prefiltered = o.join(passing.select("o_custkey"), "o_custkey")
    joined = prefiltered.join(
        c.select("c_custkey"), prefiltered["o_custkey"] == F.col("c_custkey")
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Salted two-phase aggregation
# ---------------------------------------------------------------------------

SALT_BUCKETS = 16


@register(
    "agg_salted_two_phase",
    family="agg",
    doc="Skew-safe two-phase aggregation: the group key is salted with "
    "event_id % 16, partially aggregated per (key, salt) — so a hot "
    "key's rows spread over 16 reducers instead of one — then "
    "re-aggregated per key (counts sum, DECIMAL-staged value sums "
    "stay exact through both phases).  n_subaggs surfaces how many "
    "partials each key produced.  The hot-key twin of "
    "join_salted_skew on the aggregation side; byte-identical to the "
    "plain GROUP BY the oracle runs because count/sum are "
    "commutative monoids.",
    oracle=f"""
WITH p1 AS (
  SELECT event_type, event_id % {SALT_BUCKETS} AS salt,
         COUNT(*) AS c, SUM(CAST(value AS DECIMAL(18,6))) AS s
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(SUM(c) AS BIGINT) AS n_events,
       CAST(SUM(s) AS DOUBLE) AS total_value,
       CAST(COUNT(*) AS BIGINT) AS n_subaggs
FROM p1 GROUP BY event_type ORDER BY event_type
""",
)
def agg_salted_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    p1 = e.groupBy(
        "event_type", (F.col("event_id") % SALT_BUCKETS).alias("salt")
    ).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("s"),
    )
    return (
        p1.groupBy("event_type")
        .agg(
            F.sum("c").cast("bigint").alias("n_events"),
            F.sum("s").cast("double").alias("total_value"),
            F.count(F.lit(1)).cast("bigint").alias("n_subaggs"),
        )
        .orderBy("event_type")
    )
