"""Navigable-small-world beam-search ANN (the graph-based family:
Malkov/Yashunin's NSW/HNSW, DiskANN's Vamana) re-expressed as bounded
DataFrame joins — the third ANN scale path next to IVF cell pruning
(operators/ivf.py) and PQ compression (operators/pq.py).

Index = a navigable neighbor graph with two edge classes:

1. intra-cell kNN edges — each node's ``g_intra`` most-cosine-similar
   neighbors WITHIN its coarse cell (the seeded IVF quantizer of
   ivf.py, iters=0, so cell assignment is closed-form);
2. navigation links — each node is linked (both directions) to the
   SEED MEMBER of its ``seed_links`` nearest cells.  Seeds act as the
   hub layer every navigable-graph method needs: any node is reachable
   from any entry in <= 2 hub hops, the flat stand-in for HNSW's upper
   layers.

Search = fixed-hop beam search: start from the seed of the query's
nearest cell, then per hop expand the beam's out-edges, score
candidates by cosine against the query, and keep the top ``beam`` per
query.  Every step is an equi-join + a bounded per-query window —
candidate volume is O(queries × beam × degree) rows per hop, never a
cross join, and the graph build touches only within-cell pairs (cell
size is corpus/nlist — at scale raise nlist so cells stay bounded,
exactly the IVF discipline).

Everything is deterministic (seeded quantizer, ROUND-6 scores, ties to
the smaller vec_id), so the registered query's generated oracle
(plans/round8.py) replays graph build AND all unrolled hops in SQL —
a graph-ANN whose whole search path is hash-checked, with the recall
contract vs brute force asserted in tests/test_nsw.py.

Reference parity: none — the reference (psycopg2 ETL) has no vector
surface; §2.I similarity-search tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions import vectors as V
from .ivf import _nearest, assign_cells, train_centroids
from .lineage import cut_lineage


def _seed_members(corpus: DataFrame, nlist: int, id_col: str):
    """(cid, svid) — the seeded quantizer's defining member per cell
    (min id of the ``id % nlist`` stratum, matching train_centroids
    iters=0)."""
    return (
        corpus.select((F.col(id_col) % nlist).cast("int").alias("cid"),
                      F.col(id_col).alias("svid"))
        .groupBy("cid")
        .agg(F.min("svid").alias("svid"))
    )


def build_nsw_graph(
    corpus: DataFrame,
    nlist: int = 8,
    g_intra: int = 6,
    seed_links: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """(src, dst) — the navigable graph: per-node top-``g_intra``
    in-cell cosine neighbors plus bidirectional links to the seed
    members of the node's ``seed_links`` nearest cells.  Materialized
    (cut_lineage) before return: the searcher joins it once per hop,
    and without the cut each hop would replay the whole within-cell
    build."""
    if centroids is None:
        centroids = train_centroids(
            corpus, nlist=nlist, iters=0, id_col=id_col, vec_col=vec_col
        ).transform(cut_lineage)
    cells = assign_cells(corpus, centroids, id_col=id_col, vec_col=vec_col)
    # hoist each node's norm out of the pair loop: the pair score is then
    # ONE interpreted array fold (dot) instead of three — higher-order
    # functions bypass whole-stage codegen, so per-pair folds dominate
    # the build.  sqrt(dot(v,v)) here is the exact expression the
    # per-pair form evaluates, so scores stay bit-identical to the
    # generated oracle.
    cells = cells.withColumn("nrm", V.norm(F.col("iv")))
    a = cells.select(
        "cid", F.col("item_id").alias("src"),
        F.col("iv").alias("sv"), F.col("nrm").alias("sn"),
    )
    b = cells.select(
        "cid", F.col("item_id").alias("dst"),
        F.col("iv").alias("dv"), F.col("nrm").alias("dn"),
    )
    denom = F.col("sn") * F.col("dn")
    pair_cos = F.when(
        denom > 0, V.dot(F.col("sv"), F.col("dv")) / denom
    ).otherwise(F.lit(0.0))
    scored = (
        a.join(b, "cid")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst", F.round(pair_cos, 6).alias("cos"))
    )
    w = Window.partitionBy("src").orderBy(
        F.col("cos").desc(), F.col("dst").asc()
    )
    intra = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= g_intra)
        .select("src", "dst")
    )
    vecs = corpus.select(
        F.col(id_col).alias("__vid"), V.to_double_array(F.col(vec_col)).alias("v")
    )
    probes = _nearest(vecs, centroids, keep=seed_links).select(
        F.col("__vid").alias("node"), "cid"
    )
    seeds = _seed_members(corpus, nlist, id_col)
    linked = probes.join(seeds, "cid").where(F.col("node") != F.col("svid"))
    links = linked.select(
        F.col("node").alias("src"), F.col("svid").alias("dst")
    ).unionByName(
        linked.select(F.col("svid").alias("src"), F.col("node").alias("dst"))
    )
    return intra.unionByName(links).distinct().transform(cut_lineage)


def nsw_beam_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nlist: int = 8,
    g_intra: int = 6,
    seed_links: int = 3,
    beam: int = 8,
    hops: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    entries: int = 1,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank) — beam-search ANN over the
    navigable graph.  The query itself stays IN the beam while
    searching (its out-edges are the best expansion frontier) but is
    excluded from the returned top-k.  ``entries`` > 1 starts the beam
    from the seed members of the query's ``entries`` nearest cells
    (HNSW's multi-entry trick flattened): the extra entry points cost
    nothing per hop — the beam width caps the frontier — but recover
    the recall a single unlucky entry cell forfeits."""
    centroids = train_centroids(
        corpus, nlist=nlist, iters=0, id_col=id_col, vec_col=vec_col
    ).transform(cut_lineage)
    graph = build_nsw_graph(
        corpus, nlist=nlist, g_intra=g_intra, seed_links=seed_links,
        id_col=id_col, vec_col=vec_col, centroids=centroids,
    )
    vecs = corpus.select(
        F.col(id_col).alias("node"), V.to_double_array(F.col(vec_col)).alias("nv")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        V.to_double_array(F.col(vec_col)).alias("qv"),
    )
    qcell = _nearest(
        queries.select(F.col(id_col).alias("__vid"),
                       V.to_double_array(F.col(vec_col)).alias("v")),
        centroids,
        keep=entries,
    ).select(F.col("__vid").alias("query_id"), "cid")
    seeds = _seed_members(corpus, nlist, id_col)
    state = qcell.join(seeds, "cid").select(
        "query_id", F.col("svid").alias("node")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("node").asc()
    )
    for _ in range(hops):
        cand = state.select("query_id", "node").distinct()
        scored = (
            cand.join(qv, "query_id")
            .join(vecs, "node")
            .select(
                "query_id",
                "node",
                F.round(
                    V.cosine_similarity(F.col("qv"), F.col("nv")), 6
                ).alias("cosine"),
            )
        )
        # cut per hop: hop t+1's scoring must not replay hops 1..t.
        # REJECTED EXPERIMENT (r10): chaining all hops into one plan
        # (the dyadic-descent recipe) measured only ~8% here and blew
        # the physical plan up 6 -> 90 exchanges — `state` feeds TWO
        # consumers per hop (kept + expansion union), so the un-cut
        # plan duplicates the hop subtree exponentially; dyadic's chain
        # is linear (one consumer) which is why the same trick was 2x
        # there.  The checkpoint is load-bearing here.
        kept = (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= beam)
            .select("query_id", "node")
            .transform(cut_lineage)
        )
        expansion = kept.join(
            graph, kept["node"] == graph["src"]
        ).select("query_id", F.col("dst").alias("node"))
        state = kept.unionByName(expansion)
    final = (
        state.select("query_id", "node")
        .distinct()
        .join(qv, "query_id")
        .join(vecs, "node")
        .where(F.col("node") != F.col("query_id"))
        .select(
            "query_id",
            F.col("node").alias("neighbor_id"),
            F.round(V.cosine_similarity(F.col("qv"), F.col("nv")), 6).alias(
                "cosine"
            ),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        final.withColumn("rank", F.row_number().over(wf))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )
