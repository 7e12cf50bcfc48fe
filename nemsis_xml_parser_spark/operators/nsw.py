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
        # train_centroids returns a VALUES LocalRelation (driver-side
        # centroid state), so every broadcast of it below is job-free
        centroids = train_centroids(
            corpus, nlist=nlist, iters=0, id_col=id_col, vec_col=vec_col
        )
    cells = assign_cells(corpus, centroids, id_col=id_col, vec_col=vec_col)
    # in-cell top-g via the Arrow matmul kernel (r13): the expression
    # all-pairs form — even with the r11 norm hoist down to ONE
    # interpreted array fold per pair — paid ~100 µs per pair and
    # dominated the registered queries' wall (~2/3 of ~6.5 s at the
    # 2000-vector harness); the kernel does the same flops as one
    # normalized matmul per cell with the identical (cos desc, dst asc)
    # tie-break on the identical ROUND-6 value, so the generated SQL
    # oracles that replay the expression form stay green.
    intra = cell_topg_pairs_arrow(cells, g_intra).select("src", "dst")
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


def cell_topg_pairs_arrow(cells: DataFrame, g_intra: int) -> DataFrame:
    """(src, dst, cos) — each node's top-``g_intra`` ROUND-6 cosine
    neighbors WITHIN its cell (input: (cid, item_id, iv) rows).
    Vectorized: one normalized matmul per cell group inside
    ``applyInPandas`` — the in-cell pair count is corpus²/nlist, and at
    ~100 µs per interpreted HOF dot the expression form dominated both
    the streaming insert (the 61-rows/s wall, r12) and the batch graph
    build (~2/3 of the registered queries' wall, r13).  Tie-break
    matches the expression form exactly: cosine desc, then dst asc, on
    the ROUNDED value (round-6 parity pinned by the stream==batch
    single-batch test and the generated SQL oracles)."""
    import numpy as np
    import pandas as pd

    def kern(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf["item_id"].to_numpy()
        n = ids.shape[0]
        if n < 2:
            return pd.DataFrame(
                {"src": pd.Series([], dtype="int64"),
                 "dst": pd.Series([], dtype="int64"),
                 "cos": pd.Series([], dtype="float64")}
            )
        M = np.stack(pdf["iv"].to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(M, axis=1)
        safe = np.where(nrm == 0, 1.0, nrm)
        Vn = M / safe[:, None]
        S = np.round(Vn @ Vn.T, 6)
        S[nrm == 0, :] = 0.0
        S[:, nrm == 0] = 0.0
        out_src, out_dst, out_cos = [], [], []
        for i in range(n):
            order = np.lexsort((ids, -S[i]))
            taken = 0
            for j in order:
                if j == i:
                    continue
                out_src.append(int(ids[i]))
                out_dst.append(int(ids[j]))
                out_cos.append(float(S[i, j]))
                taken += 1
                if taken == g_intra:
                    break
        return pd.DataFrame(
            {"src": pd.Series(out_src, dtype="int64"),
             "dst": pd.Series(out_dst, dtype="int64"),
             "cos": pd.Series(out_cos, dtype="float64")}
        )

    return cells.select("cid", "item_id", "iv").groupBy("cid").applyInPandas(
        kern, schema="src long, dst long, cos double"
    )


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
    )
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
