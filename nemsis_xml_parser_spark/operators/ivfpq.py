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
from .pq import _sq_dist, pq_encode, train_pq


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
    cells = IVF.assign_cells(corpus, centroids, id_col, vec_col)
    residuals = cells.join(F.broadcast(centroids), "cid").select(
        "cid",
        "item_id",
        F.zip_with("iv", "centroid", lambda x, y: x - y).alias("rv"),
    )
    res_vecs = residuals.select(
        F.col("item_id").alias("vec_id"), F.col("rv").alias("embedding")
    )
    codebooks = train_pq(res_vecs, m=m, ksub=ksub, iters=iters_pq, dim=dim)
    encoded = pq_encode(res_vecs, codebooks, m=m, dim=dim)
    codes = (
        residuals.select("cid", "item_id")
        .join(encoded, residuals["item_id"] == encoded["vec_id"])
        .select("cid", "item_id", "codes")
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
