"""IVF-PQ — coarse cell pruning composed with residual product
quantization, the standard billion-scale ANN index layout (FAISS
IndexIVFPQ; Jegou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011).

The two single-technique operators compose:

* IVF (operators/ivf.py) prunes WHICH vectors a query scores —
  nprobe/nlist of the corpus, via an equi-join on cell id;
* PQ (operators/pq.py) compresses WHAT is stored and scored — m small
  codes instead of dim floats, scanned via ADC lookup tables.

Residual encoding is the part that makes the composition worth more
than its pieces: PQ quantizes ``v - centroid(cell(v))`` rather than v
itself, so the codebook spends its 2^codebits levels on the
*within-cell* variance (much smaller than global variance → lower
quantization error at the same code size).  Search mirrors it: the
query builds a separate LUT per probed cell from ``q - centroid(cell)``.

Scale shape: the codes table is (cid, item_id, m codes) — persist
partitioned by cid and a probe reads nprobe/nlist of an already
dim/(m·4)-compressed corpus.  LUTs are |Q|·nprobe·m·ksub rows
(KB-scale, broadcast).  All stages are DataFrame ops; the only
iterative parts (Lloyd's for both quantizers) shuffle centroid-sized
aggregates, never raw vectors by key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions import vectors as V
from . import ivf as IVF
from .pq import _sq_dist, train_pq


def _centroid_matrix(centroid_rows):
    """Collected (cid, centroid) rows -> (cids int64 asc, C float64[n,dim]).
    Sorted by cid so argmin's first-minimum tie-break equals the
    expression form's min(struct(dist, cid))."""
    import numpy as np

    rows = sorted(centroid_rows, key=lambda r: int(r.cid))
    cids = np.asarray([int(r.cid) for r in rows], dtype=np.int64)
    C = np.stack([np.asarray(r.centroid, dtype=np.float64) for r in rows])
    return cids, C


def _residuals_arrow(
    corpus: DataFrame,
    centroid_rows,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cid, item_id, rv ARRAY<DOUBLE>) — coarse assignment + residual in
    ONE Arrow stage.  Value-identical to ``assign_cells`` -> ``zip_with(iv,
    centroid, x - y)``: same round-6 l2 (nearest_arrow's formula), same
    cid-asc tie-break, exact float64 subtraction.  ``centroid_rows`` is
    the collected nlist-bounded table (the documented safe-collect class:
    KB-scale, frozen for the query)."""
    import numpy as np
    import pandas as pd

    cids, C = _centroid_matrix(centroid_rows)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            diff = M[:, None, :] - C[None, :, :]
            D = np.round(np.sqrt((diff * diff).sum(axis=-1)), 6)
            j = np.argmin(D, axis=1)
            R = M - C[j]
            yield pd.DataFrame(
                {
                    "cid": cids[j].astype("int32"),
                    "item_id": pdf[id_col].to_numpy(),
                    "rv": list(R),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        kernel, schema="cid int, item_id long, rv array<double>"
    )


def _encode_arrow(
    corpus: DataFrame,
    centroid_rows,
    codebook_rows,
    m: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cid, item_id, codes ARRAY<INT>[m]) — the ENTIRE IVF-PQ encode
    (coarse assign -> residual -> per-subspace nearest code) as ONE Arrow
    stage over the raw corpus scan.

    Replaces a 5-operator relational pipeline (broadcast-NLJ cell
    expansion, two sort-aggregate pairs with their exchanges, a dim/m-way
    posexplode and the HOF fold distance — ~0.5 µs/element interpreted)
    with three numpy matmul-shaped reductions per batch (guide §4.2).
    Tie conventions replicated exactly: round-6 distances, coarse ties ->
    lowest cid (centroids sorted asc + argmin first-min == min(struct(
    dist, cid))), subspace ties -> lowest code (codebooks sorted asc ==
    min(struct(dist, code))).  Oracle-checked value parity at sf0.01 and
    sf0.1 (OPTIMIZATION_r14.md)."""
    import numpy as np
    import pandas as pd

    cids, C = _centroid_matrix(centroid_rows)
    sub = dim // m
    cb = {}
    for r in codebook_rows:
        cb[(int(r.sub_idx), int(r.code))] = np.asarray(r.centroid, dtype=np.float64)
    subs_sorted = sorted({k[0] for k in cb})
    codes_sorted = sorted({k[1] for k in cb})
    CB = np.stack(
        [np.stack([cb[(s, c)] for c in codes_sorted]) for s in subs_sorted]
    )  # (m, ksub, sub)
    code_vals = np.asarray(codes_sorted, dtype=np.int64)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            diff = M[:, None, :] - C[None, :, :]
            D = np.round(np.sqrt((diff * diff).sum(axis=-1)), 6)
            j = np.argmin(D, axis=1)
            R = (M - C[j]).reshape(len(M), m, sub)
            d2 = np.round(
                ((R[:, :, None, :] - CB[None, :, :, :]) ** 2).sum(axis=-1), 6
            )
            code_idx = np.argmin(d2, axis=2)
            yield pd.DataFrame(
                {
                    "cid": cids[j].astype("int32"),
                    "item_id": pdf[id_col].to_numpy(),
                    "codes": list(code_vals[code_idx].astype("int32")),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        kernel, schema="cid int, item_id long, codes array<int>"
    )


def train_ivfpq(
    corpus: DataFrame,
    nlist: int = 8,
    m: int = 8,
    ksub: int = 16,
    iters_coarse: int = 3,
    iters_pq: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """-> (centroids, codebooks, codes).

    centroids: (cid, centroid) — the coarse quantizer (KB-scale).
    codebooks: (sub_idx, code, centroid) — PQ trained on RESIDUALS.
    codes:     (cid, item_id, codes ARRAY<INT>[m]) — the compressed
               inverted file; at scale, persist partitioned by cid.
    """
    centroids = IVF.train_centroids(corpus, nlist, iters_coarse, id_col, vec_col)
    # train_centroids now returns a TRUE VALUES LocalRelation, so this
    # collect is driver-local (no job) and every downstream broadcast
    # (residual join, probe ranking, LUT build) is job-free.
    crows = centroids.collect()
    res_vecs = _residuals_arrow(corpus, crows, id_col, vec_col).select(
        F.col("item_id").alias("vec_id"), F.col("rv").alias("embedding")
    )
    codebooks = train_pq(res_vecs, m=m, ksub=ksub, iters=iters_pq, dim=dim)
    # the encode (assign -> residual -> nearest code, with cid attached)
    # is ONE Arrow stage over the raw corpus — no cell-expansion join, no
    # sort-aggregate exchanges, no corpus-sized re-join to attach cid
    codes = _encode_arrow(
        corpus, crows, codebooks.collect(), m, dim, id_col, vec_col
    )
    return centroids, codebooks, codes


def ivfpq_topk(
    queries: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    codes: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over the probed cells only.

    Per (query, probed cell): residual q - centroid(cell) → per-subspace
    LUT; candidates join on (cid, sub_idx, code) so vectors outside the
    probed cells never enter the plan, and stored vectors are never
    decompressed."""
    sub = dim // m
    qv = queries.select(
        F.col(id_col).alias("__vid"), V.to_double_array(F.col(vec_col)).alias("v")
    )
    probes = (
        IVF._nearest(qv, centroids, keep=nprobe)
        .join(F.broadcast(centroids), "cid")
        .select(
            F.col("__vid").alias("query_id"),
            "cid",
            F.zip_with("v", "centroid", lambda x, y: x - y).alias("qres"),
        )
    )
    qsubs = probes.select(
        "query_id",
        "cid",
        F.posexplode(
            F.array(*[F.slice("qres", i * sub + 1, sub) for i in range(m)])
        ).alias("sub_idx", "sv"),
    )
    lut = qsubs.join(F.broadcast(codebooks), "sub_idx").select(
        "query_id",
        "cid",
        "sub_idx",
        "code",
        F.round(_sq_dist(F.col("sv"), F.col("centroid")), 6).alias("pdist"),
    )
    exploded = codes.select(
        "cid",
        F.col("item_id").alias("neighbor_id"),
        F.posexplode("codes").alias("sub_idx", "code"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        exploded.join(F.broadcast(lut), ["cid", "sub_idx", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sum("pdist"), 6).alias("adc_dist"))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivfpq_rerank_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    codes: DataFrame,
    k: int = 5,
    alpha: int = 8,
    nprobe: int = 3,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact re-rank of the ADC shortlist — the standard second stage of
    every production IVF-PQ deployment (FAISS refine / Jegou et al. §V):
    the compressed scan is a RECALL filter, not a ranker.  Stage 1 takes
    the ADC top-(k·alpha) per query (cheap — compressed codes only);
    stage 2 joins the shortlist back to the RAW vectors, scores exact
    cosine (6-dp rounded, id tie-break — the brute_force_topk contract),
    and keeps the top-k.  Quantization error then only hurts when a true
    neighbor falls OUT of the shortlist entirely, so recall@k rises from
    the ADC ranking's to nearly the probed-cell ceiling (measured in
    ANN_RECALL_r10.json; bound asserted in tests/test_ivfpq.py).

    Scale shape: the shortlist is |Q|·k·alpha rows — broadcast it
    against the corpus scan, so raw vectors are read once, never
    shuffled, and only shortlisted vectors' bytes cross the wire."""
    shortlist = ivfpq_topk(
        queries, centroids, codebooks, codes,
        k=k * alpha, nprobe=nprobe, m=m, dim=dim,
        id_col=id_col, vec_col=vec_col,
    ).select("query_id", "neighbor_id")
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        V.to_double_array(F.col(vec_col)).alias("qv"),
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        V.to_double_array(F.col(vec_col)).alias("cv"),
    )
    cos = F.round(V.cosine_similarity(F.col("qv"), F.col("cv")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cv.join(F.broadcast(shortlist.join(qv, "query_id")), "neighbor_id")
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivfpq_index_write(
    corpus: DataFrame,
    index_dir: str,
    nlist: int = 8,
    m: int = 8,
    ksub: int = 16,
    iters_coarse: int = 3,
    iters_pq: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF-PQ index: codes partitioned by cid (probe reads
    only its cells' files), centroids + codebooks as KB-scale side
    tables.  Train once, query many."""
    centroids, codebooks, codes = train_ivfpq(
        corpus, nlist, m, ksub, iters_coarse, iters_pq, dim, id_col, vec_col
    )
    codes.write.mode("overwrite").partitionBy("cid").parquet(f"{index_dir}/codes")
    centroids.write.mode("overwrite").parquet(f"{index_dir}/centroids")
    codebooks.write.mode("overwrite").parquet(f"{index_dir}/codebooks")


def ivfpq_index_topk(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a persisted IVF-PQ index.  The equi-join of the broadcast
    LUT against the cid-partitioned codes table lets dynamic partition
    pruning skip every non-probed cell's files — fully lazy, no
    driver-side cid collect (same posture as ivf_index_topk)."""
    centroids = spark.read.parquet(f"{index_dir}/centroids")
    codebooks = spark.read.parquet(f"{index_dir}/codebooks")
    codes = spark.read.parquet(f"{index_dir}/codes")
    return ivfpq_topk(
        queries, centroids, codebooks, codes, k, nprobe, m, dim, id_col, vec_col
    )
