"""Unit tests for the distributed two-pass prefix sum
(operators/prefix_sum.py) and the bucketed table checksum query."""

from __future__ import annotations

import sys
from pathlib import Path

import pyspark.sql.functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nemsis_xml_parser_spark.operators.prefix_sum import (  # noqa: E402
    scalable_running_sum,
)
from nemsis_xml_parser_spark.plans import QUERIES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_matches_python_prefix_sum(spark):
    rows = [(i, (i * 7) % 13) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, v long")
    out = {
        r.k: r.running_total
        for r in scalable_running_sum(df, "k", "v", num_ranges=8).collect()
    }
    acc = 0
    for k, v in rows:
        acc += v
        assert out[k] == acc


def test_duplicate_keys_get_peer_semantics(spark):
    # ANSI RANGE frame: peers share the same running total
    df = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 5)], "k long, v long"
    )
    out = scalable_running_sum(df, "k", "v", num_ranges=4).collect()
    got = sorted((r.k, r.running_total) for r in out)
    assert got == [(1, 30), (1, 30), (2, 35)]


def test_invariant_to_partition_count(spark):
    df = spark.createDataFrame(
        [(i, i) for i in range(50)], "k long, v long"
    )
    for n in (1, 3, 16):
        out = {
            r.k: r.running_total
            for r in scalable_running_sum(df, "k", "v", num_ranges=n).collect()
        }
        assert out[49] == 49 * 50 // 2


def test_no_global_window_in_plan(spark):
    df = QUERIES["window_scalable_running_total"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan()

    def walk(node):
        yield node
        ch = node.children()
        for i in range(ch.length()):
            yield from walk(ch.apply(i))

    for node in walk(plan):
        if node.nodeName() == "Window":
            assert not node.partitionSpec().isEmpty(), (
                "scalable running total must never plan a global window"
            )


def test_checksum_flips_on_single_row_change(spark):
    base = QUERIES["etl_table_checksum"].spark(spark, SF_DIR).collect()
    by_bucket = {r.bucket: r.xor_hash for r in base}
    # recompute with one customer's segment flipped -> exactly one bucket
    # hash changes, counts identical
    from nemsis_xml_parser_spark.plans.registry import table
    from nemsis_xml_parser_spark.plans.scaleops import CHECKSUM_BUCKETS

    c = table(spark, SF_DIR, "customer").withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") == 7, F.lit("TAMPERED")).otherwise(
            F.col("c_mktsegment")
        ),
    )
    row_hash = F.expr(
        "cast(conv(substr(md5(concat("
        "cast(c_custkey as string), '|', c_name, '|', "
        "cast(c_nationkey as string), '|', c_mktsegment"
        ")), 1, 15), 16, 10) as bigint)"
    )
    tampered = {
        r.bucket: r.xor_hash
        for r in c.select(
            (F.col("c_custkey") % CHECKSUM_BUCKETS).alias("bucket"),
            row_hash.alias("h"),
        )
        .groupBy("bucket")
        .agg(F.expr("bit_xor(h)").alias("xor_hash"))
        .collect()
    }
    diffs = [b for b in by_bucket if by_bucket[b] != tampered.get(b)]
    assert diffs == [7 % CHECKSUM_BUCKETS]
