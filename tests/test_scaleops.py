"""Semantic tests for the Bloom runtime-filter join and salted
two-phase aggregation (plans/scaleops.py)."""

from __future__ import annotations

import sys
from pathlib import Path

import pyspark.sql.functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nemsis_xml_parser_spark.operators.sketches import (  # noqa: E402
    bloom_bits,
    bloom_claims,
)
from nemsis_xml_parser_spark.plans import QUERIES  # noqa: E402
from nemsis_xml_parser_spark.plans.registry import table  # noqa: E402
from nemsis_xml_parser_spark.plans.scaleops import (  # noqa: E402
    BLOOM_K,
    BLOOM_M,
    BLOOM_SEGMENT,
)

SF_DIR = "/root/testdata/sf0.001"


def test_bloom_prefilter_no_false_negatives_and_prunes(spark):
    c = table(spark, SF_DIR, "customer").where(
        F.col("c_mktsegment") == BLOOM_SEGMENT
    )
    o = table(spark, SF_DIR, "orders")
    bits = bloom_bits(c, "c_custkey", k=BLOOM_K, m=BLOOM_M)
    claims = bloom_claims(
        o.select("o_custkey").distinct(), bits, "o_custkey", k=BLOOM_K, m=BLOOM_M
    )
    passing = {r.o_custkey for r in claims.where("claimed = 1").collect()}
    true_keys = {r.c_custkey for r in c.select("c_custkey").collect()}
    probe_keys = {r.o_custkey for r in o.select("o_custkey").distinct().collect()}
    # FN = 0: every true key that is probed passes
    assert (true_keys & probe_keys) <= passing
    # teeth: the filter actually prunes a meaningful share of probes
    assert len(passing) < len(probe_keys)


def test_bloom_join_matches_plain_join(spark):
    got = {
        r.o_orderpriority: (r.n_orders, round(r.revenue, 2))
        for r in QUERIES["join_bloom_prefilter"].spark(spark, SF_DIR).collect()
    }
    o = table(spark, SF_DIR, "orders")
    c = table(spark, SF_DIR, "customer").where(
        F.col("c_mktsegment") == BLOOM_SEGMENT
    )
    want = {
        r.o_orderpriority: (r.n, round(r.rev, 2))
        for r in o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("rev"),
        )
        .collect()
    }
    assert got == want


def test_salted_agg_spreads_hot_keys(spark):
    rows = QUERIES["agg_salted_two_phase"].spark(spark, SF_DIR).collect()
    ev = table(spark, SF_DIR, "events")
    n_total = ev.count()
    assert sum(r.n_events for r in rows) == n_total
    for r in rows:
        # every type is hot enough to hit all 16 salt buckets here —
        # the partial aggregation genuinely fans out
        assert r.n_subaggs == 16
