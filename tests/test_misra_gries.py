"""Misra–Gries two-pass exact heavy hitters: the no-false-negative
pruning guarantee, the bounded-memory streaming fold, and exactness of
the recounted output."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from nemsis_xml_parser_spark.operators.misra_gries import (
    mg_exact_heavy_hitters,
    mg_fold,
    mg_partition_summaries,
)


def _skewed(spark, n=2000, parts=8):
    # 40% of rows on two heavy keys, uniform tail
    return (
        spark.range(n)
        .repartition(parts)
        .select(
            F.when(
                F.col("id") % 10 < 4,
                F.concat(F.lit("heavy_"), (F.col("id") % 2).cast("string")),
            )
            .otherwise(F.concat(F.lit("u"), F.col("id").cast("string")))
            .alias("key")
        )
    )


def test_output_equals_plain_groupby(spark):
    df = _skewed(spark)
    k = 16
    got = {
        (r.key, r.exact_count)
        for r in mg_exact_heavy_hitters(df, "key", k).collect()
    }
    n = df.count()
    exp = {
        (r.key, r.cnt)
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * (k + 1) > n)
        .collect()
    }
    assert got == exp and len(got) == 2


def test_summaries_bounded_and_superset(spark):
    df = _skewed(spark, parts=4)
    k = 8
    summ = mg_partition_summaries(df, "key", k)
    # each partition's summary emits at most k rows
    assert summ.count() <= 4 * k
    # no false negatives: every true heavy hitter appears among the
    # merged candidates
    n = df.count()
    heavy = {
        r.key
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * (k + 1) > n)
        .collect()
    }
    cands = {r.key for r in summ.select("key").distinct().collect()}
    assert heavy <= cands


def test_accumulator_memory_bounded(spark):
    """The fold's high-water mark stays at k + one-Arrow-batch-distinct
    even when the partition's distinct-key count is far larger — the
    streaming-MG property that keeps a 100 TB high-cardinality key from
    blowing executor memory."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
    try:
        n, k = 20000, 8
        # 4 heavy keys + ~10k-distinct tail in ONE partition: the tail
        # is the memory worst case, the heavy keys keep the summary
        # non-empty so the peak probe is observable
        df = spark.range(n).coalesce(1).select(
            F.when(
                F.col("id") % 2 == 0,
                F.concat(F.lit("heavy_"), (F.col("id") % 4).cast("string")),
            )
            .otherwise(F.concat(F.lit("u"), F.col("id").cast("string")))
            .alias("key")
        )
        summ = mg_partition_summaries(df, "key", k, with_peak=True)
        rows = summ.collect()
        assert rows, "summary must not be empty"
        peak = max(r.peak_acc for r in rows)
        assert peak <= k + 256, peak
        assert len(rows) <= k
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_null_keys_counted(spark):
    """A NULL-keyed heavy hitter survives both passes, matching SQL
    GROUP BY's single NULL group."""
    k = 4
    df = spark.range(100).select(
        F.when(F.col("id") % 2 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("u"), F.col("id").cast("string")))
        .alias("key")
    )
    got = {(r.key, r.exact_count) for r in mg_exact_heavy_hitters(df, "key", k).collect()}
    assert got == {(None, 50)}


@settings(max_examples=200, deadline=None)
@given(
    data=st.lists(
        st.lists(st.integers(min_value=0, max_value=30), max_size=60),
        max_size=8,
    ),
    k=st.integers(min_value=1, max_value=12),
)
def test_mg_fold_properties(data, k):
    """Pure-fold invariants, driven without Spark: (1) final size <= k;
    (2) peak size <= k + max batch-distinct; (3) MG error bound — every
    key is underestimated by at most n/(k+1), which implies the
    no-false-negative candidate superset."""
    from collections import Counter

    batches = [dict(Counter(b)) for b in data]
    probe: dict = {}
    acc = mg_fold(batches, k, probe)
    assert len(acc) <= k
    max_batch_distinct = max((len(b) for b in batches), default=0)
    assert probe.get("peak", 0) <= k + max_batch_distinct
    truth = Counter()
    for b in data:
        truth.update(b)
    n = sum(truth.values())
    for key, cnt in truth.items():
        est = acc.get(key, 0)
        assert est <= cnt
        assert (cnt - est) * (k + 1) <= n
