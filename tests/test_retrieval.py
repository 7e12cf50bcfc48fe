"""Semantic checks for the retrieval/data-selection tier (plans/retrieval.py).

The oracle gate proves Spark == DuckDB; these tests pin the *meaning*:
RRF fusion ranks dual-list hits with both ranks populated and scores in
the lawful range, DSIR importance weighting actually enriches the target
source, and the Heaps fit flags this templated corpus' saturating bigram
vocabulary with a near-zero beta.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nemsis_xml_parser_spark.plans import QUERIES  # noqa: E402
from nemsis_xml_parser_spark.plans.retrieval import (  # noqa: E402
    DSIR_TARGET_SOURCE,
    HEAPS_BUCKETS,
    RRF_K,
    RRF_POOL,
    RRF_TOP,
)

SF_DIR = "/root/testdata/sf0.001"


def test_rrf_scores_lawful_and_sorted(spark):
    rows = QUERIES["retrieval_hybrid_rrf"].spark(spark, SF_DIR).collect()
    assert len(rows) == RRF_TOP
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        # at least one ranker contributed, ranks stay inside the pool
        assert r.bm25_rank is not None or r.cos_rank is not None
        for rk in (r.bm25_rank, r.cos_rank):
            if rk is not None:
                assert 1 <= rk <= RRF_POOL
        hi = 2.0 / (RRF_K + 1)
        assert 0.0 < r.rrf_score <= hi + 1e-9


def test_rrf_dual_list_hit_outranks_single_list_tail(spark):
    rows = QUERIES["retrieval_hybrid_rrf"].spark(spark, SF_DIR).collect()
    dual = [r for r in rows if r.bm25_rank is not None and r.cos_rank is not None]
    single = [r for r in rows if r.bm25_rank is None or r.cos_rank is None]
    if dual and single:
        # RRF's defining property: any doc in both pools beats any doc
        # whose single rank is no better than the dual doc's worse rank
        best_dual = max(dual, key=lambda r: r.rrf_score)
        worst_single = min(single, key=lambda r: r.rrf_score)
        assert best_dual.rrf_score > worst_single.rrf_score


def test_dsir_enriches_target_source(spark):
    df = QUERIES["curation_dsir_importance"].spark(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) == 25
    ws = [r.dsir_logratio for r in rows]
    assert ws == sorted(ws, reverse=True)
    n_target = sum(1 for r in rows if r.source == DSIR_TARGET_SOURCE)
    # base rate is ~1/20 sources => ~1.25 of 25; importance weighting
    # must enrich the target source well beyond that
    assert n_target >= 3


def test_heaps_flags_template_saturation(spark):
    row = QUERIES["text_heaps_law"].spark(spark, SF_DIR).collect()[0]
    assert row.n_buckets == HEAPS_BUCKETS
    # bigram vocab of the 31-word template corpus saturates almost
    # immediately: beta must be far below the ~0.5-0.7 of healthy text,
    # but strictly positive (new bigrams do trickle in)
    assert 0.0 < row.heaps_beta < 0.3
    assert row.heaps_lnk > 0.0
