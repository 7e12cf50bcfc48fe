"""Bucketed-table layout for shuffle-free co-located joins.

The third leg of the join-strategy tripod (SCALING.md §join strategy):
broadcast for small dims, salting/AQE for skew, and BUCKETING for the
recurring big⋈big equi-join — pre-hash-partition both fact tables into
the same number of buckets on the join key at WRITE time, and every
subsequent join on that key runs with ZERO exchanges (Spark matches the
bucket specs and feeds SortMergeJoin directly from the bucketed files).
At 100 TB this converts the nightly orders⋈lineitem shuffle — the
single largest network event in the pipeline — into a local merge per
bucket; the write-side cost is one repartition, paid once.

Spark constraint this module encodes: bucketing metadata lives in the
session catalog, so bucketed data MUST go through ``saveAsTable`` (an
``option("path", …)`` makes it an external table — files land where the
caller says, the catalog only keeps the bucket spec).  A plain
``.parquet(path)`` write silently drops the bucket spec — the classic
footgun; ``write_bucketed`` exists so callers can't hit it.
"""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: F401  (kept for callers' lambdas)
from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and by default sorted) external table.

    Sorting within buckets lets the subsequent SortMergeJoin skip its
    per-partition sort as well — the plan degrades gracefully if a
    caller disables it (sort nodes reappear, exchanges still don't)."""
    w = df.write.format("parquet").mode("overwrite")
    if path is not None:
        w = w.option("path", path)
    w = w.bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-spec bucketed tables on their bucket key.

    Plain catalog reads — the co-location is a property of the layout,
    not of the query; callers verify with ``exchange_count``."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange operators in the pre-AQE physical plan — the
    assertion surface for co-located layouts (0 for a correctly bucketed
    join; the plan-budget gate uses the same counter)."""
    import re

    plan = df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    ops = re.findall(r"^\s*\(\d+\)\s+(\w+)", plan, re.MULTILINE)
    return sum(o == "Exchange" for o in ops)
