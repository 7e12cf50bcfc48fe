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


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read nanos as LONG and rebuild a TIMESTAMP_NTZ
        # (truncation to micros matches DuckDB's ns→us cast).  Session tz is
        # pinned to UTC so the LTZ→NTZ hop is the identity.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
