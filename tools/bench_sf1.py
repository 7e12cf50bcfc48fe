"""Scale-up bench: the most expensive flagships at sf1 (10× sf0.1).

The sf0.1 bench can hide a superlinear shape (a quadratic tier that is
flat at 600k rows explodes at 6M); this runs the top-cost flagships at
the synthetic sf1 dataset (tools/gen_sf1.py) and records per-query
times next to their sf0.1 times, flagging any query whose sf1 time
exceeds 10× its sf0.1 time (10× data ⇒ linear-or-better target, with
headroom for shuffle superlinearity in the flag threshold).

Usage: python tools/bench_sf1.py [sf1_dir] [--out FILE]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from nemsis_xml_parser_spark.plans import QUERIES  # noqa: E402
from nemsis_xml_parser_spark.session import get_spark  # noqa: E402

#: most expensive flagships by BENCH_r05 + the round-6 additions
SF1_QUERIES = [
    "dedup_survivor_election",
    "ann_ivfpq_topk",
    "dedup_cluster_components",
    "embedding_pca_power",
    "multimodal_phash_groups",
    "dedup_ssjoin_prefix",
    "er_golden_record",
    "graph_pagerank_centrality",
    "multimodal_pixel_stats",
    "curation_chunk_sequences",
    "q1_pricing_summary",
    "q21_last_shipper_multi_supplier",
    "window_scalable_running_total",
    "embedding_pca_projection",
    "sketch_hll_mergeable",
    "mine_association_rules",
    "mine_fpgrowth_itemsets",
    "join_spatial_grid_knn",
    "dedup_ladder_full",
    # round 8 additions
    "dedup_semdedup_band",
    "graph_boruvka_msf",
    "dedup_winnowing_pairs",
    "embedding_jl_projection",
    # round 8 session-4 additions
    "text_bpe_train_merges",
    "graph_node2vec_walks",
    "sketch_hll_distinct",
    "curation_zorder_layout",
    "graph_heavy_edge_coarsening",
    "graph_louvain_sweep",
    # round 9 additions
    "dedup_cdc_chunks",
    "curation_hilbert_layout",
    "sketch_kmv_distinct",
    "text_bpe_encode",
    "er_sorted_neighborhood",
    # round 10 additions (session 2)
    "sketch_dyadic_quantiles",
    "quality_fdr_bh",
    "cluster_kmeans_parallel_init",
    "curation_coreset_weighted_kmeans",
    "text_good_turing",
    # round 11 additions
    "ann_lsh_multitable_topk",
    "cluster_single_linkage_mst",
    "retrieval_qld_dirichlet",
    "multimodal_wav_adpcm_stats",
    "multimodal_png_subbyte_stats",
    # round 12 flagships (r13: the substring-span df-guard is the
    # boundedness argument — prove it at 10x data)
    "dedup_substring_spans",
    "multimodal_jpeg_progressive_gradient_stats",
    # round 13/14 flagships (VERDICT r13 #3: every flagship gets a
    # measured 10x-data ratio — conformal's grid window and facility
    # location's per-step corpus aggregates are the new unbounded-input
    # shapes to prove)
    "quality_conformal_interval",
    "curation_facility_location",
    "text_suffix_array",
    "text_suffix_lcp",
]


def _run(name: str, spark, sf_dir: str) -> list[float]:
    samples = []
    for _ in range(2):
        t0 = time.time()
        df = QUERIES[name].spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
    return samples


def main() -> None:
    args = sys.argv[1:]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    sf1_dir = args[0] if args else "/root/repo/.benchdata/sf1"
    sf01_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-sf1")
    _run("q1_pricing_summary", spark, sf01_dir)  # warmup

    rows = {}
    for name in SF1_QUERIES:
        s01 = _run(name, spark, sf01_dir)
        s1 = _run(name, spark, sf1_dir)
        ratio = round(min(s1) / min(s01), 2) if min(s01) > 0 else None
        rows[name] = {
            "sf01_sec": min(s01),
            "sf1_sec": min(s1),
            "ratio": ratio,
            "superlinear_flag": bool(ratio is not None and ratio > 10.0),
            "samples_sf01": s01,
            "samples_sf1": s1,
        }
        print(
            f"{name}: sf0.1 {min(s01):.2f}s  sf1 {min(s1):.2f}s  "
            f"x{ratio}{'  ** SUPERLINEAR' if rows[name]['superlinear_flag'] else ''}",
            file=sys.stderr,
        )
    spark.stop()
    line = json.dumps(
        {
            "metric": "sf1_scaleup_flagships",
            "sf1_dir": sf1_dir,
            "rep": 10,
            "queries": rows,
            "n_superlinear": sum(r["superlinear_flag"] for r in rows.values()),
        }
    )
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
