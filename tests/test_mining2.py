"""Semantic checks for the tier-3 mining queries (plans/mining2.py)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nemsis_xml_parser_spark.plans import QUERIES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_golden_record_covers_every_customer(spark):
    rows = QUERIES["er_golden_record"].spark(spark, SF_DIR).collect()
    total = sum(r.n_members for r in rows)
    from nemsis_xml_parser_spark.plans.registry import table
    import pyspark.sql.functions as F

    n_input = (
        table(spark, SF_DIR, "customer")
        .where(F.col("c_custkey") < 400)
        .count()
    )
    assert total == n_input
    # nationkey blocking prevents the chain collapse: >1 cluster, and
    # canonical ids are cluster minima
    assert len(rows) > 1
    for r in rows:
        assert r.canonical_custkey == r.cluster_id


def test_bpe_merge_counts_descending(spark):
    rows = QUERIES["text_bpe_merge_candidates"].spark(spark, SF_DIR).collect()
    assert len(rows) == 20
    counts = [r.merge_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert len(r.pair) == 2
        assert r.n_words >= 1


def test_perplexity_buckets_partition_corpus(spark):
    from nemsis_xml_parser_spark.plans.registry import table

    rows = QUERIES["quality_perplexity_buckets"].spark(spark, SF_DIR).collect()
    buckets = {r.bucket: r for r in rows}
    assert set(buckets) == {"head", "middle", "tail"}
    n_docs = table(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    # fixed thresholds order the bucket means: head < middle < tail
    assert buckets["head"].avg_h < buckets["middle"].avg_h < buckets["tail"].avg_h


def test_hits_top_authority_has_high_indegree(spark):
    rows = QUERIES["graph_hits_bipartite"].spark(spark, SF_DIR).collect()
    assert len(rows) == 20
    scores = [r.authority for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r.in_degree >= 1 for r in rows)
    assert all(r.authority > 0 for r in rows)
