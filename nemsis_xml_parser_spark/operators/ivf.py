"""IVF (inverted-file) approximate nearest neighbor — the k-means scale
path for similarity search, complementing sign-LSH (operators/similarity.py).

At 100 TB the corpus cannot be cross-joined against queries.  IVF splits it
into ``nlist`` Voronoi cells around trained centroids; each query probes only
the ``nprobe`` nearest cells, so the candidate join is an equi-join on
``cid`` touching nprobe/nlist of the corpus.  All stages are DataFrame ops:

* ``train_centroids`` — Lloyd's iterations fully distributed: assignment is
  a broadcast-centroid argmin (corpus × nlist rows, ranked per vector), the
  re-mean is posexplode → groupBy(cid, dim) avg → array_sort re-assembly.
  No driver-side math, no collect of vectors; only the nlist×dim centroid
  table (KB-scale) is ever broadcast.
* ``assign_cells``     — nearest-centroid cell id per vector (the "inverted
  file"; at scale this is written once, partitioned by cid).
* ``ivf_topk``         — probe nprobe cells per query, exact cosine within
  candidates, deterministic top-k (rounded cosine + id tie-break).

Initialization is deterministic (min vec_id per id-modulo-nlist stratum), so
the whole pipeline is reproducible across runs — required by the rows-only
correctness check and the recall test (tests/test_similarity.py).

Iterative k-means is not expressible in one SQL statement, so the query
registration is rows-only by design (driver contract: iterative algorithms
may omit oracle_sql).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .lineage import cut_lineage

from ..functions import vectors as V


def _nearest(
    vecs: DataFrame, centroids: DataFrame, vec_col: str = "v", keep: int = 1
) -> DataFrame:
    """Rank centroids per vector by (l2 asc, cid asc); keep the ``keep``
    nearest.  ``centroids`` is broadcast — nlist rows, never shuffled.

    keep=1 (the hot path: every training assignment + the inverted file)
    is a hash aggregate with min(struct(dist, cid)) — partial/final with
    map-side combine, no sort.  keep>1 (query probes only — tiny input)
    uses the row_number window."""
    d = F.round(V.l2_distance(F.col(vec_col), F.col("centroid")), 6)
    expanded = vecs.join(F.broadcast(centroids)).withColumn("dist", d)
    if keep == 1:
        best = expanded.groupBy("__vid").agg(
            F.min(F.struct("dist", "cid")).alias("best"),
            F.first(vec_col).alias(vec_col),
        )
        return best.select(
            "__vid",
            vec_col,
            F.col("best.cid").alias("cid"),
            F.col("best.dist").alias("dist"),
        )
    w = Window.partitionBy("__vid").orderBy(F.col("dist").asc(), F.col("cid").asc())
    return (
        expanded.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= keep)
        .drop("__rank", "centroid")
    )


def nearest_arrow(
    vecs: DataFrame,
    centroid_rows,
    vec_col: str = "v",
    keep: int = 1,
) -> DataFrame:
    """Arrow twin of :func:`_nearest` with the nlist centroids carried
    in the kernel closure — same output schema and the same ROUND-6
    (l2 asc, cid asc) ranking, WITHOUT the nlist-x row expansion or the
    interpreted HOF distance (~0.5 µs/element — the cdc_chunks_arrow
    argument; at a 12.5k-vector microbatch the expression form costs
    ~1.5 s per call).  ``centroid_rows`` is the collected KB-scale
    centroid table (rows with .cid/.centroid).  The streaming index
    maintainers use this; the batch IVF queries keep the expression
    form their oracles audit."""
    import numpy as np
    import pandas as pd

    rows = sorted(centroid_rows, key=lambda r: int(r.cid))
    cids = np.asarray([int(r.cid) for r in rows], dtype=np.int64)
    C = (
        np.stack([np.asarray(r.centroid, dtype=np.float64) for r in rows])
        if rows
        else np.zeros((0, 1), dtype=np.float64)
    )
    nkeep = min(keep, len(rows)) if rows else 0

    def kernel(batches):
        for pdf in batches:
            if not len(pdf) or not len(C):
                continue
            M = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            diff = M[:, None, :] - C[None, :, :]
            D = np.round(np.sqrt((diff * diff).sum(axis=-1)), 6)
            if nkeep == 1:
                # argmin returns the FIRST minimum; centroids sorted by
                # cid, so ties break cid-asc — the expression ranking
                j = np.argmin(D, axis=1)
                yield pd.DataFrame(
                    {
                        "__vid": pdf["__vid"].to_numpy(),
                        vec_col: pdf[vec_col],
                        "cid": cids[j].astype("int32"),
                        "dist": D[np.arange(len(D)), j],
                    }
                )
            else:
                order = np.argsort(D, axis=1, kind="stable")[:, :nkeep]
                n = len(pdf)
                out_vid = np.repeat(pdf["__vid"].to_numpy(), nkeep)
                out_v = pdf[vec_col].iloc[
                    np.repeat(np.arange(n), nkeep)
                ].reset_index(drop=True)
                flat = order.ravel()
                yield pd.DataFrame(
                    {
                        "__vid": out_vid,
                        vec_col: out_v,
                        "cid": cids[flat].astype("int32"),
                        "dist": D[np.repeat(np.arange(n), nkeep), flat],
                    }
                )

    return vecs.select("__vid", vec_col).mapInPandas(
        kernel,
        schema=f"__vid long, {vec_col} array<double>, cid int, dist double",
    )


def assign_cells_arrow(
    corpus: DataFrame,
    centroid_rows,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow twin of :func:`assign_cells` (see :func:`nearest_arrow`)."""
    vecs = corpus.select(
        F.col(id_col).alias("__vid"),
        V.to_double_array(F.col(vec_col)).alias("v"),
    )
    return nearest_arrow(vecs, centroid_rows).select(
        "cid", F.col("__vid").alias("item_id"), F.col("v").alias("iv")
    )


def _centroid_values_frame(spark, rows) -> DataFrame:
    """(cid, centroid) rows -> a TRUE LocalRelation via a VALUES inline
    table with exact-double literals (the kmeans.py discipline): every
    downstream broadcast collects driver-locally with NO job, unlike a
    checkpoint leaf (1 read job per broadcast build) or a
    ``createDataFrame`` LogicalRDD (1-partition job per build)."""
    vals = ", ".join(
        f"({int(r.cid)}, {V.array_lit_sql(list(r.centroid))})" for r in rows
    )
    return spark.sql(f"SELECT * FROM VALUES {vals} AS t(cid, centroid)")


def train_centroids(
    corpus: DataFrame,
    nlist: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd's k-means → DataFrame(cid INT, centroid ARRAY<DOUBLE>).

    Deterministic seeding: the member with the smallest id in each
    ``id % nlist`` stratum.  Each iteration: broadcast-argmin assignment,
    then per-dimension mean via posexplode/groupBy — both shuffle only
    (cid, dim)-sized aggregates, never raw vectors by key.

    The nlist-row centroid table lives DRIVER-SIDE between iterations
    (the bounded-collect safe class, ≤ nlist·dim doubles): each round is
    one collect of the distributed update aggregate — the update plan is
    unchanged, only its materialization moved from an eager checkpoint
    to a collect, so the values are bit-identical — and re-enters as a
    VALUES LocalRelation, so the next assignment (and every downstream
    broadcast in the callers) builds its broadcast with no job at all.
    """
    spark = corpus.sparkSession
    vecs = corpus.select(
        F.col(id_col).alias("__vid"), V.to_double_array(F.col(vec_col)).alias("v")
    )
    seed_ids = (
        vecs.withColumn("g", (F.col("__vid") % nlist).cast("int"))
        .groupBy("g")
        .agg(F.min("__vid").alias("__vid"))
    )
    seeded = (
        seed_ids.join(vecs, "__vid")
        .select(F.col("g").alias("cid"), F.col("v").alias("centroid"))
    )
    if iters == 0:
        rows = seeded.collect()
        if not rows:  # degenerate empty corpus: keep the (empty) frame shape
            return seeded.transform(cut_lineage)
        return _centroid_values_frame(spark, rows)
    # iters > 0: iteration 1 assigns against the DISTRIBUTED seeded frame
    # (its broadcast build executes the seeding subtree inside iteration
    # 1's job, exactly like the old checkpoint form — a separate seed
    # collect would add one sequential job for nothing)
    centroids = seeded
    for _ in range(iters):
        assigned = _nearest(vecs, centroids)
        upd = (
            assigned.select("cid", F.posexplode("v").alias("dim", "val"))
            .groupBy("cid", "dim")
            .agg(F.avg("val").alias("mean"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "mean"))),
                    lambda s: s["mean"],
                ).alias("centroid")
            )
        )
        rows = upd.collect()
        if not rows:  # degenerate empty corpus: keep the frame shape
            return upd.transform(cut_lineage)
        centroids = _centroid_values_frame(spark, rows)
    return centroids


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The inverted file: (cid, id, vector) — at scale, persist partitioned
    by cid so each probe reads only its cells."""
    vecs = corpus.select(
        F.col(id_col).alias("__vid"), V.to_double_array(F.col(vec_col)).alias("v")
    )
    return _nearest(vecs, centroids).select(
        "cid", F.col("__vid").alias("item_id"), F.col("v").alias("iv")
    )


def ivf_index_write(
    corpus: DataFrame,
    index_dir: str,
    nlist: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF index: ``{index_dir}/cells`` partitioned by cid (so
    a probe reads ONLY its cells' files — partition pruning, the point of
    the inverted file) and ``{index_dir}/centroids`` (KB-scale).  Train
    once, query many."""
    centroids = train_centroids(corpus, nlist, iters, id_col, vec_col)
    cells = assign_cells(corpus, centroids, id_col, vec_col)
    cells.write.mode("overwrite").partitionBy("cid").parquet(f"{index_dir}/cells")
    centroids.write.mode("overwrite").parquet(f"{index_dir}/centroids")


def ivf_index_topk(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a persisted IVF index.  The cid filter on the partitioned
    cells table prunes to the probed cells' files — the scan is
    nprobe/nlist of the corpus regardless of corpus size."""
    centroids = spark.read.parquet(f"{index_dir}/centroids")
    qv = queries.select(
        F.col(id_col).alias("__vid"), V.to_double_array(F.col(vec_col)).alias("v")
    )
    probes = _nearest(qv, centroids, keep=nprobe).select(
        F.col("__vid").alias("query_id"), F.col("v").alias("qv"), "cid"
    )
    # No driver round-trip: broadcasting the (small) probe side lets dynamic
    # partition pruning reuse the broadcast to prune the cid-partitioned
    # cells scan to the probed cells — fully lazy, no collect of cid list.
    cells = spark.read.parquet(f"{index_dir}/cells")
    cos = F.round(V.cosine_similarity(F.col("qv"), F.col("iv")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        F.broadcast(probes).join(cells, "cid")
        .where(F.col("query_id") != F.col("item_id"))
        .select(
            "query_id", F.col("item_id").alias("neighbor_id"), cos.alias("cosine")
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 3,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: probe the ``nprobe`` nearest cells per
    query.  Recall → 1 as nprobe → nlist (exactly brute force at nprobe =
    nlist); tests measure recall vs brute_force_topk."""
    centroids = train_centroids(corpus, nlist, iters, id_col, vec_col)
    cells = assign_cells(corpus, centroids, id_col, vec_col)
    qv = queries.select(
        F.col(id_col).alias("__vid"), V.to_double_array(F.col(vec_col)).alias("v")
    )
    probes = _nearest(qv, centroids, keep=nprobe).select(
        F.col("__vid").alias("query_id"), F.col("v").alias("qv"), "cid"
    )
    cos = F.round(V.cosine_similarity(F.col("qv"), F.col("iv")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        probes.join(cells, "cid")
        .where(F.col("query_id") != F.col("item_id"))
        .select(
            "query_id", F.col("item_id").alias("neighbor_id"), cos.alias("cosine")
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
