"""Query registry backing ``__spark_entry__.queries()`` / ``oracle_sql()``.

Conventions that make the DuckDB comparison deterministic:

* money/quantity sums: inputs cast to DECIMAL first, summed exactly, result
  cast to DOUBLE — bit-identical across engines regardless of row order;
* averages: exact decimal sum divided by COUNT, in DOUBLE — one
  deterministic division;
* plain double arithmetic (cosine similarity etc.): identical operation
  order on both sides, rounded to 6 decimals at the end;
* every computed column aliased identically in Spark and SQL;
* top-k queries always carry a full deterministic tie-break.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    family: str
    spark: SparkQuery
    oracle: str | None  # None → driver records the weaker rows-only check
    doc: str = ""


QUERIES: dict[str, Query] = {}


def register(
    name: str, family: str, oracle: str | None, doc: str = ""
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name=name, family=family, spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# Rebuild TIMESTAMP_NTZ (UTC wall clock) from epoch nanos with pure
# integer/date arithmetic.  timestamp_micros(..).cast("timestamp_ntz")
# would be SESSION-ZONE-DEPENDENT — and lazily evaluated, so pinning the
# session zone at read time is both load-bearing and leaky (the cast
# executes at action time under whatever zone is then active); a
# convert_timezone round-trip is ambiguous in DST fall-back hours.
# `div`/`%` keep everything exact; DECIMAL division keeps the sub-second
# part exact for make_interval's DECIMAL(18,6) seconds.
_NTZ_FROM_NANOS = """
cast(date_add(date '1970-01-01',
              cast((ts div 1000) div 86400000000 as int)) as timestamp_ntz)
+ make_interval(0, 0, 0, 0, 0, 0,
                cast(cast((ts div 1000) % 86400000000 as decimal(18,0))
                     / 1000000 as decimal(18,6)))
"""


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name in ("documents", "embeddings"):
        # These two corpora feed the expression-heavy operators (ngram
        # explodes, per-char rolling hashes, array dot products) whose
        # real work runs in the SCAN stage — and the test parquet is a
        # single row group, so that stage is otherwise ONE task on a
        # 32-core pool (measured: minhash pairs 4.3 -> 2.6 s, winnowing
        # pairs 2.8 -> 2.1 s warm at sf0.1).  The table is KB-to-MB
        # scale, so the widening exchange is noise; on a cluster with
        # properly row-grouped files the repartition is a cheap no-op
        # cost-wise and the scan parallelism comes from the files
        # themselves.  TPC-H tables are left alone: their first stages
        # are pushdown-filtered scans where an extra exchange buys
        # nothing.
        return spark.read.parquet(f"{sf_dir}/{name}.parquet").repartition(
            spark.sparkContext.defaultParallelism
        )
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read nanos as LONG and rebuild a TIMESTAMP_NTZ
        # (truncation to micros matches DuckDB's ns→us cast) without any
        # session-timezone dependence.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr(_NTZ_FROM_NANOS))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
