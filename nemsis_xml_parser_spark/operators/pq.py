"""Product quantization (PQ) — ANN memory compression, completing the
similarity tier (brute force → LSH buckets → IVF cells → PQ codes).

A dim-float vector becomes ``m`` small codes (one byte each at ksub ≤
256): the vector is split into ``m`` subvectors, each quantized to its
nearest centroid in a per-subspace codebook.  At 100 TB this is the
difference between holding 256 GB of float32 vectors and 16 GB of codes
per billion vectors; search uses asymmetric distance (ADC) — exact query
subvectors against codebook entries — so only KB-scale lookup tables are
computed per query.

Spark-first: ALL subspaces train in ONE distributed Lloyd's loop (the
subspace index is just another grouping key — m separate k-means jobs
would be m× the scheduler round-trips), assignment is the same
broadcast-argmin hash aggregate as IVF (operators/ivf.py:_nearest), and
ADC search is two equi-joins (LUT build, code lookup) plus a window
top-k.  No driver-side math; only the m×ksub codebook (KB-scale) is ever
broadcast or checkpointed.

Iterative k-means is not one SQL statement, so the registered query is
rows-only by design; determinism (seeded init, rounded distances, id
tie-breaks) and self-retrieval/recall are pytest-asserted
(tests/test_pq.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions import vectors as V


def _subvectors(
    corpus: DataFrame,
    m: int,
    dim: int,
    id_col: str,
    vec_col: str,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(__vid, [passthrough...], sub_idx, sv ARRAY<DOUBLE>[dim/m]) —
    narrow projection.  ``passthrough`` columns ride along unchanged
    (e.g. an IVF cell id), so callers never need a corpus-sized join to
    re-attach them after encoding."""
    if dim % m != 0:
        raise ValueError(f"m={m} must divide dim={dim}")
    sub = dim // m
    v = V.to_double_array(F.col(vec_col))
    return corpus.select(
        F.col(id_col).alias("__vid"), *passthrough, v.alias("__v")
    ).select(
        "__vid",
        *passthrough,
        F.posexplode(
            F.array(*[F.slice("__v", i * sub + 1, sub) for i in range(m)])
        ).alias("sub_idx", "sv"),
    )


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _nearest_code(
    subs: DataFrame,
    codebooks: DataFrame,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Nearest codebook entry per (__vid, sub_idx): broadcast the m×ksub
    codebook, hash-aggregate min(struct(dist, code)) — no sort, map-side
    combine, the IVF assignment pattern.  ``passthrough`` columns (one
    value per __vid) ride through the aggregate via FIRST."""
    d = F.round(_sq_dist(F.col("sv"), F.col("centroid")), 6)
    expanded = subs.join(F.broadcast(codebooks), "sub_idx").withColumn("dist", d)
    best = expanded.groupBy("__vid", "sub_idx").agg(
        F.min(F.struct("dist", "code")).alias("best"),
        F.first("sv").alias("sv"),
        *[F.first(c).alias(c) for c in passthrough],
    )
    return best.select(
        "__vid",
        *passthrough,
        "sub_idx",
        "sv",
        F.col("best.code").alias("code"),
        F.col("best.dist").alias("dist"),
    )


def _codebook_values_frame(spark, rows) -> DataFrame:
    """(sub_idx, code, centroid) rows -> a TRUE LocalRelation via a
    VALUES inline table with exact-double literals (kmeans.py/ivf.py
    discipline).  ``createDataFrame`` would build an RDD-backed
    LogicalRDD whose every broadcast costs a 1-partition job; a parsed
    VALUES table broadcasts driver-locally with NO job."""
    if not rows:  # degenerate empty corpus: typed empty LocalRelation
        return spark.sql(
            "SELECT CAST(NULL AS INT) sub_idx, CAST(NULL AS INT) code, "
            "CAST(NULL AS ARRAY<DOUBLE>) centroid WHERE 1=0"
        )
    vals = ", ".join(
        f"({int(s)}, {int(c)}, {V.array_lit_sql(list(v))})" for s, c, v in rows
    )
    return spark.sql(f"SELECT * FROM VALUES {vals} AS t(sub_idx, code, centroid)")


def train_pq(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Joint distributed Lloyd's over all m subspaces →
    DataFrame(sub_idx INT, code INT, centroid ARRAY<DOUBLE>).

    Deterministic seeding per subspace: the subvector of the smallest
    ``__vid`` in each ``__vid % ksub`` stratum (IVF's scheme, one per
    (sub_idx, stratum)).  Each iteration shuffles only (sub_idx, code,
    dim)-sized aggregates, never raw vectors by key."""
    subs = _subvectors(corpus, m, dim, id_col, vec_col)
    # Seeding: min __vid per __vid % ksub stratum — identical for every
    # sub_idx, so derive it from the UN-exploded corpus (one narrow agg,
    # no m-way explode), fetch the ≤ksub seed vectors (ksub-bounded, the
    # documented safe-collect class) and slice them driver-side into a
    # LocalRelation.  Value-identical to the old (sub_idx, g) stratum-min
    # over the exploded subvectors: same ids, same slices, and float64
    # slicing is exact.  The old shape cost two full explode passes plus
    # an exchange just to pick ~ksub rows.
    if dim % m != 0:
        raise ValueError(f"m={m} must divide dim={dim}")
    sub = dim // m
    seed_ids = (
        corpus.select(
            (F.col(id_col) % ksub).cast("int").alias("g"),
            F.col(id_col).alias("__sid"),
        )
        .groupBy("g")
        .agg(F.min("__sid").alias("__sid"))
    )
    seed_rows = (
        corpus.join(F.broadcast(seed_ids), F.col(id_col) == F.col("__sid"))
        .select("g", V.to_double_array(F.col(vec_col)).alias("v"))
        .collect()
    )
    codebooks = _codebook_values_frame(
        corpus.sparkSession,
        [
            (s, int(r.g), list(r.v[s * sub : (s + 1) * sub]))
            for r in seed_rows
            for s in range(m)
        ],
    )
    for _ in range(iters):
        assigned = _nearest_code(subs, codebooks)
        upd = (
            assigned.select(
                "sub_idx", "code", F.posexplode("sv").alias("dim", "val")
            )
            .groupBy("sub_idx", "code", "dim")
            .agg(F.avg("val").alias("mean"))
            .groupBy("sub_idx", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "mean"))),
                    lambda s: s["mean"],
                ).alias("centroid")
            )
        )
        # the m·ksub-row codebook lives DRIVER-SIDE between iterations
        # (bounded-collect safe class): the update plan is unchanged —
        # only its materialization moved from an eager checkpoint to a
        # collect (bit-identical values) — and it re-enters as a VALUES
        # LocalRelation, so each assignment broadcast is job-free
        codebooks = _codebook_values_frame(
            corpus.sparkSession,
            [(int(r.sub_idx), int(r.code), list(r.centroid)) for r in upd.collect()],
        )
    return codebooks


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(vec_id, codes ARRAY<INT>[m] [, passthrough...]) — the compressed
    corpus.  At scale this is the table you persist (and optionally
    partition by an IVF cid for IVF-PQ).  ``passthrough`` columns (one
    value per id) ride through both aggregates via FIRST, so attaching
    e.g. the IVF cell id costs no corpus-sized join."""
    subs = _subvectors(corpus, m, dim, id_col, vec_col, passthrough)
    return (
        _nearest_code(subs, codebooks, passthrough)
        .groupBy("__vid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub_idx", "code"))),
                lambda s: s["code"],
            ).alias("codes"),
            *[F.first(c).alias(c) for c in passthrough],
        )
        .select(F.col("__vid").alias(id_col), "codes", *passthrough)
    )


def pq_reconstruction_error(
    corpus: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, sq_error) — total squared quantization error per vector
    (the sum of per-subspace assignment distances; trains' objective)."""
    subs = _subvectors(corpus, m, dim, id_col, vec_col)
    return (
        _nearest_code(subs, codebooks)
        .groupBy("__vid")
        .agg(F.round(F.sum("dist"), 6).alias("sq_error"))
        .select(F.col("__vid").alias(id_col), "sq_error")
    )


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: exact query subvectors against codebook centroids build
    a per-query lookup table (|Q|·m·ksub rows, KB-scale — broadcast);
    the compressed corpus then needs only an equi-join on (sub_idx, code)
    and a sum — vectors are never decompressed.  Compose with IVF cells
    to prune candidates (IVF-PQ) when |corpus|·|Q| partials is too much."""
    qsubs = _subvectors(queries, m, dim, id_col, vec_col).withColumnRenamed(
        "__vid", "query_id"
    )
    lut = qsubs.join(F.broadcast(codebooks), "sub_idx").select(
        "query_id",
        "sub_idx",
        "code",
        F.round(_sq_dist(F.col("sv"), F.col("centroid")), 6).alias("pdist"),
    )
    exploded = codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode("codes").alias("sub_idx", "code"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        exploded.join(F.broadcast(lut), ["sub_idx", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sum("pdist"), 6).alias("adc_dist"))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
