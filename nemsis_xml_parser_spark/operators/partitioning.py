"""Partitioning strategies for 100 TB joins (pyspark_guide "Partitioning &
shuffle"): bucketed co-located joins and salted skew joins.

* ``write_bucketed`` / ``bucketed_join`` — persist both join sides bucketed
  on the key so subsequent equi-joins are shuffle-free (SortMergeJoin with
  no Exchange).  tests/test_partitioning.py asserts the Exchange is absent
  from the physical plan.
* ``salted_join`` — explode a hot build-side key into ``salt`` replicas and
  scatter the probe side with a random salt, defeating single-reducer skew;
  result-identical to the plain join (asserted in tests).  AQE's skew-join
  split handles moderate skew automatically — salting is for the pathological
  key that exceeds a single executor even after splitting.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    num_buckets: int,
    path: str,
    file_format: str = "parquet",
) -> None:
    """Persist ``df`` bucketed+sorted by ``key`` as a catalog table backed
    by ``path``.  Joins between tables bucketed identically on the join key
    skip the shuffle entirely."""
    (
        df.write.mode("overwrite")
        .format(file_format)
        .bucketBy(num_buckets, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(name)
    )


def bucketed_join(
    spark: SparkSession, left_name: str, right_name: str, key_l: str, key_r: str
) -> DataFrame:
    left = spark.table(left_name)
    right = spark.table(right_name)
    return left.join(right, left[key_l] == right[key_r])


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join on ``key``: the (small/broadcastable-ish) right
    side is replicated ``salt`` times, the left side scatters uniformly via
    a random salt in [0, salt).  Output == plain ``left.join(right, key)``.

    Use when one key's row count dwarfs the rest; plain hash partitioning
    would send that entire key to one reducer.

    Only left-preserving joins are supported: the right side is replicated
    ``salt`` times, so a right/full outer join would emit each unmatched
    right row once per replica instead of once."""
    if how not in {"inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "semi", "left_anti", "leftanti", "anti"}:
        raise ValueError(
            f"salted_join does not support how={how!r}: the right side is "
            "replicated, so right/full outer semantics would duplicate "
            "unmatched right rows"
        )
    salted_l = left.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    salted_r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return (
        salted_l.join(salted_r, on=[key, "__salt"], how=how).drop("__salt")
    )


def physical_plan(df: DataFrame) -> str:
    """Executed-plan string — used by tests to assert shuffle absence."""
    return df._jdf.queryExecution().executedPlan().toString()
