"""Physical-plan regression gate over EVERY registered query.

tools/plan_budgets.json records, per query, the number of Exchanges
(shuffles), CartesianProducts, and BroadcastNestedLoopJoins in the
executed plan at sf0.001.  This test rebuilds each plan and fails if any
query grew beyond its recorded budget — catching an accidentally
introduced shuffle, a broadcast that regressed to cartesian, or a join
that lost its equi-condition.  After an INTENTIONAL plan change, re-run
``python tools/gen_plan_budgets.py`` and commit the diff (the review of
that diff is the point).
"""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nemsis_xml_parser_spark.plans import QUERIES  # noqa: E402
from tools.gen_plan_budgets import BUDGET_PATH, plan_stats  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# BNLJ is legitimate only for broadcast-scalar cross joins, range/band
# joins, and the intentionally tiny cross join — never for an equi-join
# that lost its keys.  Budgets > 0 must stay justified here.
JUSTIFIED_BNLJ = {
    "ann_ivf_topk",          # broadcast centroid set (nlist rows)
    "cross_join_small",      # intentional 25x5 cross join
    "dedup_embedding_cosine_pairs",  # bounded all-pairs verification tier
    "embedding_quantization_error",  # broadcast 1-row n_docs scalar
    "events_gapfill_hourly",         # hour spine x key set (small)
    "join_range_band",       # non-equi range predicate
    "knn_cosine_topk",       # broadcast query set vs corpus
    "multimodal_embed_knn",  # broadcast probe set
    "q11_important_stock",   # broadcast 1-row threshold scalar
    "q22_dormant_high_balance",  # broadcast 1-row avg-balance scalar
    "skew_key_audit",        # broadcast 1-row total scalar
    "text_unigram_logprob",  # broadcast 1-row corpus-size scalar
    "text_bigram_logprob",   # broadcast 1-row vocab-size scalar
    "text_kneser_ney_bigram",  # broadcast 1-row bigram-total scalar
    "text_bm25_score",       # broadcast 1-row (n_docs, avgdl) scalar
    "text_tfidf_cosine_pairs",  # broadcast 1-row n_docs scalar
    "sample_temperature_rebalance",  # broadcast 1-row n_min scalar
    "ann_ivfpq_topk",        # broadcast centroid/codebook sets (KB-scale)
    "mine_bitext_margin",    # bounded cross-side brute tier (broadcast side A)
    "text_pmi_collocations", # broadcast 1-row corpus-total scalars (Nu, Nb)
    "quality_permutation_test",  # broadcast 1-row observed-diff + count scalars
    "sketch_kmv_intersection",   # broadcast 1-2 row sketch scalars (theta, exact, counts)
    "sketch_kmv_difference",     # broadcast 1-2 row sketch scalars (theta, exact, counts)
    "sketch_kmv_jaccard",        # broadcast 1-2 row sketch scalars (theta, exact, counts)
    "text_good_turing",          # broadcast 1-row S_1 / N corpus scalars
    "sketch_dyadic_quantiles",   # broadcast per-level count lookups vs
                                 # the 3-row rank-descent state + 1-row
                                 # n scalar (never corpus-sized)
    "ann_ivfpq_rerank_topk",     # broadcast centroid/codebook sets (KB-scale)
    "quality_ransac_line",       # broadcast 16-row iteration spine + 1-row best/fit scalars
    "curation_coreset_sample",   # broadcast 1-row (n, total_cost) scalar
    "er_blocking_quality",       # bounded 400-record exhaustive-truth tier (broadcast side A)
    "retrieval_qld_dirichlet",   # broadcast 1-row corpus-total scalar + bounded literal query terms
    "sketch_ams_f2",             # broadcast 1-row exact-F2 scalar beside the 1-row sketch vector
    "sketch_misra_gries_heavy",  # broadcast 1-row N-total scalar against <=k candidate rows
    "quality_expectations_audit",  # broadcast 1-row orphan-count scalar
    "graph_louvain_sweep",   # broadcast 1-row summary scalars (largest, qn)
    "curation_pareto_coverage",    # broadcast 1-row corpus-total scalar
    "curation_waterfill_budget",   # bounded 20-source triangular join + 1-row level/budget scalars
    "text_keyword_extraction",     # broadcast 1-row corpus-size scalar
    "agg_benford_digit_audit",     # broadcast 1-row total scalar
    "join_prorate_quarters",       # range join vs broadcast 4-row quarter spine
    "quality_psi_drift",           # broadcast 1-row totals scalar
    "quality_js_divergence",       # broadcast bucket grid + 1-row total
    "agg_poisson_bootstrap_ci",    # broadcast 32-row replica spine + 1-row point mean
    "join_spatial_grid_epsilon",   # broadcast 1-row pair-count scalar
    "quality_ks_drift",            # broadcast bounded bin frame + 1-row scalars
    "quality_mutual_information",  # broadcast 1-row entropy/total scalars
    "embedding_pca_power",         # broadcast 1-row iterate/mean vectors
    "embedding_pca_projection",    # broadcast 1-row mu vector + norm scalars
    "multimodal_luminance_histogram",  # broadcast 1-row pixel-total scalar
    "curation_mixture_weights",    # broadcast 1-row weight/token-total scalars
    "graph_triangle_count",        # broadcast 1-row edge/triangle-count scalars
    "mine_hard_negatives",         # broadcast probe set (5 rows) vs corpus
    "quality_psi_by_day",          # day spine x bounded type set + 1-row totals
    "quality_rank_sum_drift",      # broadcast bounded bin frame + 1-row totals
    "sketch_join_cardinality",     # broadcast 1-row side-stat scalars (x2 joins)
    "events_changepoint_cusum",    # triangular join over bounded day domain
    "agg_mann_kendall_trend",      # triangular join over bounded day domain + 1-row scalars
    "events_kaplan_meier",         # triangular join over bounded churn-day domain + broadcast lifetimes probe
    "graph_degree_distribution",   # broadcast 1-row total/slope scalars
    "events_autocorrelation",      # day spine x 7-row lag spine, all broadcast
    "quality_chi_square_independence",  # broadcast 1-row N scalar onto the tiny contingency table
    "events_rfm_segmentation",     # broadcast 1-row corpus-max-day + 1-row quintile-cutoff scalars
    "agg_hash_sample_quantiles",   # broadcast 1-row sample-quantile scalars onto 1-row population row
    "quality_emd_drift",           # triangular join over the fixed 20-bin spine + 1-row totals scalar
    "events_max_drawdown",         # triangular joins over the bounded day domain + 1-row n_days scalar
    "sketch_hll_intersection",     # broadcast 1-row estimate/exact-count scalars onto a 1-row frame
    "events_fano_overdispersion",  # broadcast 1-row calendar-span scalar onto the per-type moments
    "retrieval_mmr_rerank",        # broadcast query vector (brute top-N stage) + candidate-local greedy picks
    "embedding_silhouette",        # broadcast 5-row centroid frame
    "sketch_bloom_membership",     # broadcast 1-row n_keys/bits_set scalars
    "agg_histogram_quantiles",     # quantile spine x bounded bucket frame
    "events_seasonality_dow",      # broadcast 1-row variance scalars
    "graph_label_propagation",     # broadcast 1-row modularity scalar
    "retrieval_hybrid_rrf",        # broadcast 1-probe vs corpus + bm25 scalars
    "curation_dsir_importance",    # broadcast 1-row LM-total scalars
    "text_heaps_law",              # 20-bucket triangular join + maxid scalar
    "text_burstiness_dispersion",  # broadcast 1-row corpus-size scalar
    "agg_theil_sen_slope",         # triangular join over calendar-bounded
                                   # day frame + 1-row n/median/ols scalars
    "graph_kcore",                 # broadcast 1-row core/base-stat scalars
    "quality_dedup_recall",        # cross of three 1-row confusion-count
                                   # aggregates (tp/fp/fn scalars)
    "quality_calibration_bins",    # broadcast 1-row corpus-total scalar
                                   # (ECE weight denominator)
    "retrieval_prf_expansion",     # broadcast 1-row (n_docs, avgdl)
                                   # corpus-stat scalars per BM25 pass
    "dedup_edit_distance_pairs",   # bounded quadratic tier by design
                                   # (doc_id<60 x 24-char prefixes; the
                                   # scale path is FastSS/LSH candidates)
    "quality_poisson_rate_test",   # broadcast 1-row calendar-span scalar
    "quality_isotonic_calibration",  # bounded 20-bin triangular joins
                                     # (minimax PAVA closed form)
    "events_seasonal_decompose",   # 7-day band self-join over the
                                   # calendar-bounded day frame + 1-row
                                   # weekly-mean scalar
    "layout_zorder_skipping",      # broadcast 1-row min/max bounds scalar
    "quality_perplexity_buckets",  # broadcast 1-row corpus-token-total scalar
    "window_scalable_running_total",  # broadcast per-partition-total
                                      # exclusive-prefix triangular join
                                      # (one row per range partition)
    "events_trend_break",          # candidate x day cross frame, both
                                   # calendar-bounded (<=31 rows each),
                                   # + 1-row single-fit/min-day scalars
    "quality_adjusted_rand",       # broadcast seeded-centroid argmin +
                                   # 1-row metric scalars off the
                                   # checkpointed contingency table
    "mine_association_rules",      # broadcast 1-row basket-total scalar
    "agg_pct_of_parent",           # broadcast 1-row grand-total scalar
    "sample_neyman_allocation",    # broadcast 1-row denominator scalar
    "events_peak_days",            # broadcast 1-row daily-total scalar
    "cluster_kmeans_parallel_init",  # broadcast 1-row total-cost (phi)
                                     # scalar per oversampling round
    "graph_hyperball_anf",         # broadcast 1-row exact-closure-count
                                   # scalar per hop tier (the tie-out)
    "quality_fdr_bh",              # broadcast m=20-row hypothesis frame
                                   # (rates) + 1-row totals/k* scalars
    "retrieval_ndcg_eval",         # broadcast bounded 8-query probe set
                                   # vs corpus (the exact-truth tier)
    "retrieval_map_mrr",           # same bounded probe-set brute tier
    "graph_effective_diameter",    # hyperball tie-out scalars + 1-row
                                   # final-ANF broadcast onto the 4-row
                                   # curve
    "dedup_semdedup_band",         # broadcast k=8-row seed-centroid
                                   # crossJoins (assignment passes; the
                                   # ivf.py coarse-quantizer shape)
    "curation_facility_location",  # broadcast candidate pool (bounded)
                                   # + per-pick broadcast 1-row
                                   # winner/coverage scalars (k=5)
    "text_suffix_array",           # suffix_array._ranked_rows'
                                   # triangular offset join — broadcast
                                   # side = one metadata row per range
                                   # partition (num_ranges=8)
    "text_suffix_lcp",             # same triangular offset join via
                                   # _ranked_rows (num_ranges rows)
    "quality_bootstrap_ci",        # broadcast 1-row n/CI scalar frames
                                   # (the resample modulus + final stats)
    "quality_benford_digits",      # broadcast 1-row total/chi2 scalars
                                   # onto the 9-row digit spine
}


@pytest.fixture(scope="module")
def budgets():
    assert BUDGET_PATH.exists(), (
        "tools/plan_budgets.json missing - run python tools/gen_plan_budgets.py"
    )
    return json.loads(BUDGET_PATH.read_text())


def test_every_query_has_a_budget(budgets):
    missing = sorted(set(QUERIES) - set(budgets))
    assert not missing, (
        f"queries with no plan budget: {missing} - "
        "run python tools/gen_plan_budgets.py and review the diff"
    )


def test_plans_within_budget(spark, budgets):
    failures = []
    for name, q in sorted(QUERIES.items()):
        if name not in budgets:
            continue  # caught by test_every_query_has_a_budget
        stats = plan_stats(q.spark(spark, SF_DIR))
        budget = budgets[name]
        if stats["cartesian"] > 0:
            failures.append(f"{name}: CartesianProduct in plan")
        if stats["exchanges"] > budget["exchanges"]:
            failures.append(
                f"{name}: {stats['exchanges']} exchanges > "
                f"budget {budget['exchanges']}"
            )
        if stats["bnlj"] > budget["bnlj"]:
            failures.append(
                f"{name}: {stats['bnlj']} BroadcastNestedLoopJoin > "
                f"budget {budget['bnlj']}"
            )
        if stats["bnlj"] > 0 and name not in JUSTIFIED_BNLJ:
            failures.append(f"{name}: unjustified BroadcastNestedLoopJoin")
    assert not failures, "\n".join(failures)


def test_budgeted_bnlj_all_justified(budgets):
    with_bnlj = {n for n, b in budgets.items() if b["bnlj"] > 0}
    assert with_bnlj <= JUSTIFIED_BNLJ, (
        f"BNLJ without justification entry: {sorted(with_bnlj - JUSTIFIED_BNLJ)}"
    )
