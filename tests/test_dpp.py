"""Dynamic partition pruning evidence.

At 100 TB the fact table is laid out as date-partitioned parquet; a join
against a filtered dimension must prune fact PARTITIONS at runtime
(Spark's DPP), not scan everything.  This test writes a small
date-partitioned copy of events, joins it to a filtered dimension frame,
and asserts (a) the physical plan carries the ``dynamicpruning``
subquery expression on the partition column, and (b) the result matches
the unpartitioned computation.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyspark.sql.functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nemsis_xml_parser_spark.plans.registry import table  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    ev = table(spark, SF_DIR, "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    fact_path = str(tmp_path / "events_by_day")
    ev.write.partitionBy("day").parquet(fact_path)
    fact = spark.read.parquet(fact_path)

    # dimension must be an independent source with its OWN filter —
    # DPP only injects the pruning subquery when the build side is
    # selectively filtered (a limit/derived frame does not qualify)
    dim_path = str(tmp_path / "day_dim")
    ev.select("day").distinct().withColumn(
        "flag", F.dayofweek("day")
    ).write.parquet(dim_path)
    dim = spark.read.parquet(dim_path).where("flag = 2")

    joined = fact.join(dim, "day").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), (
        "expected a DPP subquery on the partition column; plan:\n"
        + plan[:2000]
    )

    got = {r.event_type: r.n for r in joined.collect()}
    days = {r.day for r in dim.collect()}
    want = {
        r.event_type: r.n
        for r in ev.where(F.col("day").isin(list(days)))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
