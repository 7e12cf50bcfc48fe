"""ANN quality cross-comparison: recall@k of every approximate index
against brute force on the SAME corpus and query set.

Each method's recall floor is pytest-asserted in isolation
(test_similarity / test_ivf / test_ivfpq / test_nsw); this tool puts
them side by side — the comparison a user choosing an index actually
needs — and records wall time so the recall/cost trade is visible.

Methods (all over the embeddings table, queries = a deterministic
every-Nth sample of the corpus, self excluded everywhere):

* brute      — exact cosine top-k (the ground truth; recall 1.0)
* lsh        — random-hyperplane bucket, compare within bucket
* ivf        — k-means cells, probe nprobe nearest cells
* ivfpq      — IVF cells + product-quantized residuals, ADC ranking
* nsw        — navigable-small-world beam search

Usage: python tools/ann_recall.py [sf_dir] [--out FILE]
Writes ONE JSON line; rounds commit it as ANN_RECALL_r{N}.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from nemsis_xml_parser_spark.operators.ivf import ivf_topk  # noqa: E402
from nemsis_xml_parser_spark.operators.ivfpq import (  # noqa: E402
    ivfpq_rerank_topk,
    ivfpq_topk,
    train_ivfpq,
)
from nemsis_xml_parser_spark.operators.nsw import nsw_beam_topk  # noqa: E402
from nemsis_xml_parser_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    lsh_multiprobe_topk,
    lsh_multitable_topk,
    lsh_topk,
)
from nemsis_xml_parser_spark.session import get_spark  # noqa: E402

K = 10
QUERY_STRIDE = 20  # every 20th corpus vector is a query


def _collect(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.select("query_id", "neighbor_id").collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def _recall(truth: dict[int, set[int]], got: dict[int, set[int]]) -> float:
    num = sum(len(truth[q] & got.get(q, set())) for q in truth)
    den = sum(len(truth[q]) for q in truth)
    return round(num / den, 4) if den else 0.0


def main() -> None:
    args = sys.argv[1:]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    spark = get_spark("ann-recall")
    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = corpus.where(F.col("vec_id") % QUERY_STRIDE == 0)
    n_corpus = corpus.count()
    n_queries = queries.count()

    def run(name, fn):
        fn().write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        got = _collect(fn())
        return name, got, round(time.time() - t0, 2)

    results = {}
    name, truth, wall = run("brute", lambda: brute_force_topk(queries, corpus, k=K))
    results[name] = {"recall_at_k": 1.0, "wall_sec": wall}

    # two operating points per method: the shipped default and a
    # higher-recall setting, so the recall/cost FRONTIER is visible
    # (a single point per index is not a comparison)
    cases = {
        "lsh_planes8": lambda: lsh_topk(queries, corpus, k=K, num_planes=8),
        "lsh_planes4": lambda: lsh_topk(queries, corpus, k=K, num_planes=4),
        # multi-probe: flip the n lowest-|margin| planes (r10) — recall
        # scales ~(1+n_flips)x the single-probe point at the same planes
        "mplsh_planes8_flips3": lambda: lsh_multiprobe_topk(
            queries, corpus, k=K, num_planes=8, n_flips=3
        ),
        "mplsh_planes8_flips5": lambda: lsh_multiprobe_topk(
            queries, corpus, k=K, num_planes=8, n_flips=5
        ),
        # multi-TABLE (r11): L independent plane sets, candidate union,
        # exact re-rank — the E2LSH OR-amplification; the construction
        # that actually moves hyperplane LSH past the multi-probe
        # plateau
        "mtlsh_planes6_tables8": lambda: lsh_multitable_topk(
            queries, corpus, k=K, num_planes=6, n_tables=8
        ),
        "mtlsh_planes5_tables12": lambda: lsh_multitable_topk(
            queries, corpus, k=K, num_planes=5, n_tables=12
        ),
        "mtlsh_planes4_tables8": lambda: lsh_multitable_topk(
            queries, corpus, k=K, num_planes=4, n_tables=8
        ),
        "ivf_probe3of8": lambda: ivf_topk(queries, corpus, k=K, nlist=8, nprobe=3),
        "ivf_probe6of8": lambda: ivf_topk(queries, corpus, k=K, nlist=8, nprobe=6),
        "nsw_beam8x3": lambda: nsw_beam_topk(queries, corpus, k=K),
        "nsw_beam8x3_entries3": lambda: nsw_beam_topk(
            queries, corpus, k=K, entries=3
        ),
        "nsw_beam16x4": lambda: nsw_beam_topk(
            queries, corpus, k=K, beam=16, hops=4, g_intra=10
        ),
        "nsw_beam16x4_entries3": lambda: nsw_beam_topk(
            queries, corpus, k=K, beam=16, hops=4, g_intra=10, entries=3
        ),
    }
    for name, fn in cases.items():
        name, got, wall = run(name, fn)
        results[name] = {"recall_at_k": _recall(truth, got), "wall_sec": wall}

    # r13: the STREAM-maintained NSW graph (streaming/nsw_index.py) —
    # the same corpus arriving in 4 microbatches builds the index via
    # the graph-guided insert, then the SAME query set searches it with
    # the batch row's beam parameters.  recall here prices the guided
    # insert's approximation (history candidates from a beam search
    # instead of the batch build's exhaustive in-cell scan);
    # index_build_sec is the availableNow drain wall.
    import shutil
    import tempfile

    from nemsis_xml_parser_spark.streaming.nsw_index import (
        nsw_stream_index_topk,
        start_nsw_index_stream,
    )

    work = tempfile.mkdtemp(prefix="annrecall_nswstream_")
    try:
        corpus.repartition(8).write.parquet(f"{work}/vecs")
        vschema = spark.read.parquet(f"{work}/vecs").schema
        src = (
            spark.readStream.schema(vschema)
            .option("maxFilesPerTrigger", 2)
            .parquet(f"{work}/vecs")
        )
        t0 = time.time()
        # compact mid-stream (batch 2 of 4) so the orphan-repair pass
        # (r14) is on the measured path, as in a long-running deploy
        start_nsw_index_stream(
            src, f"{work}/idx", f"{work}/cp", compact_every=2
        ).awaitTermination()
        build_wall = round(time.time() - t0, 2)
        for sname, entries in (
            ("nsw_stream_beam8x3", 1),
            ("nsw_stream_beam8x3_entries3", 3),
        ):
            sname, got, wall = run(
                sname,
                lambda e=entries: nsw_stream_index_topk(
                    spark, f"{work}/idx", queries, k=K, entries=e
                ),
            )
            results[sname] = {
                "recall_at_k": _recall(truth, got),
                "wall_sec": wall,
                "index_build_sec": build_wall,
            }
        # the fully-compacted state: exact top-g_intra prune + orphan
        # repair over the whole graph — what a deployment searches
        # right after its periodic fold
        from nemsis_xml_parser_spark.streaming.nsw_index import (
            compact_nsw_edges,
        )

        compact_nsw_edges(spark, f"{work}/idx")
        for sname, entries in (
            ("nsw_stream_compacted_beam8x3", 1),
            ("nsw_stream_compacted_beam8x3_entries3", 3),
        ):
            sname, got, wall = run(
                sname,
                lambda e=entries: nsw_stream_index_topk(
                    spark, f"{work}/idx", queries, k=K, entries=e
                ),
            )
            results[sname] = {
                "recall_at_k": _recall(truth, got),
                "wall_sec": wall,
            }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    centroids, codebooks, codes = train_ivfpq(corpus)
    for df in (centroids, codebooks, codes):
        df.persist().count()
    for name, nprobe in (("ivfpq_probe3of8", 3), ("ivfpq_probe8of8", 8)):
        name, got, wall = run(
            name,
            lambda np=nprobe: ivfpq_topk(
                queries, centroids, codebooks, codes, k=K, nprobe=np
            ),
        )
        results[name] = {"recall_at_k": _recall(truth, got), "wall_sec": wall}

    # r10: the exact-rerank second stage (ADC shortlist k*alpha -> raw-
    # vector cosine) on a FINER trained index (m=16 subspaces) — the
    # configuration a production deployment ships.  Two points: the
    # cheap codebook (ksub=16) and the accurate one (ksub=64).
    for cname, m_, ksub_ in (("m16ksub16", 16, 16), ("m16ksub64", 16, 64)):
        cents2, cbs2, codes2 = train_ivfpq(corpus, nlist=8, m=m_, ksub=ksub_)
        for df in (cents2, cbs2, codes2):
            df.persist().count()
        for pname, nprobe, alpha in (
            (f"ivfpq_rerank_{cname}_p6_a8", 6, 8),
            (f"ivfpq_rerank_{cname}_p8_a16", 8, 16),
        ):
            pname, got, wall = run(
                pname,
                lambda np=nprobe, a=alpha, m2=m_, c=cents2, cb=cbs2, co=codes2:
                ivfpq_rerank_topk(
                    queries, corpus, c, cb, co, k=K, alpha=a, nprobe=np, m=m2
                ),
            )
            results[pname] = {
                "recall_at_k": _recall(truth, got), "wall_sec": wall
            }
        for df in (cents2, cbs2, codes2):
            df.unpersist()

    spark.stop()
    line = json.dumps(
        {
            "metric": "ann_recall_cross_comparison",
            "sf_dir": sf_dir,
            "k": K,
            "n_corpus": n_corpus,
            "n_queries": n_queries,
            "methods": results,
            "note": "wall_sec is warm query time incl. index build per "
            "call (ivfpq index pre-trained and persisted, matching its "
            "write-once/query-many deployment); recall averaged over "
            "all (query, true-neighbor) pairs",
        }
    )
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
