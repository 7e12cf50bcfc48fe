"""Distributed top-principal-component extraction via fixed-iteration
power iteration — matrix-free PCA over an embedding column.

The whitening/compression step ahead of ANN index builds and embedding
diagnostics: the dominant direction of the (centered) vector cloud.  No
matrix is ever materialized — each iteration is

    u = Σ_i  x_i · (x_i ⋅ v)        (one scan + one 64-key aggregate)
    v = u / ‖u‖

which is the edge-list PageRank shape transplanted to linear algebra:
corpus-sized data contributes per-row scalar products, the shuffled state
is dim-sized, and the iterate ``v`` rides along as a broadcast 1-row
DataFrame (never a driver collect).  A FIXED iteration count from a fixed
unit start vector keeps the computation deterministic and closed-form so
a SQL oracle can replay every iteration as chained CTEs (same contract as
operators/pagerank.py).

Determinism: per-row scores and per-element contributions are rounded to
12 and DECIMAL-cast before their sums (order-independent across
partitionings); each iterate's components are rounded to 12 after
normalization.  Scale shape: the embedding table is scanned once per
iteration from a localCheckpoint (lineage cut — without it iteration N
replays iterations 1..N-1); every shuffle is keyed on the 64-value
dimension index.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions import vectors as V


def _as_vector(per_dim: DataFrame, col: str) -> DataFrame:
    """(i, col) rows → 1-row (v array<double>) ordered by i."""
    return per_dim.agg(
        F.array_sort(F.collect_list(F.struct("i", F.col(col)))).alias("s")
    ).select(F.transform("s", lambda e: e[col]).alias("v"))


def power_iteration_top_component(
    emb: DataFrame,
    dim: int,
    iters: int = 3,
    vec_col: str = "embedding",
    center: bool = True,
) -> DataFrame:
    """-> (i INT, component DOUBLE, eigenvalue DOUBLE, n_vectors BIGINT):
    the unit top-eigenvector of the (centered) second-moment matrix after
    ``iters`` power iterations from e₀, with the Rayleigh-style
    eigenvalue estimate ‖u‖/n replicated onto every row."""
    x = V.to_double_array(F.col(vec_col))
    base = emb.select(x.alias("x"))
    if center:
        stats = (
            base.select(F.posexplode("x").alias("i", "xi"))
            .groupBy("i")
            .agg(
                F.sum(F.round(F.col("xi"), 12).cast("decimal(38,12)")).alias("sx"),
                F.count(F.lit(1)).alias("n"),
            )
            .select(
                "i", (F.col("sx").cast("double") / F.col("n")).alias("m")
            )
        )
        mu = _as_vector(stats.withColumnRenamed("m", "c"), "c")
        base = base.crossJoin(F.broadcast(mu)).select(
            F.zip_with("x", "v", lambda a, b: a - b).alias("x")
        )
    base = base.localCheckpoint(eager=True)
    n_df = base.agg(F.count(F.lit(1)).alias("n"))

    v = base.sparkSession.range(1).select(
        F.array(
            *[F.lit(1.0 if j == 0 else 0.0) for j in range(dim)]
        ).alias("v")
    )
    nrm_last = None
    for _ in range(iters):
        scored = base.crossJoin(F.broadcast(v)).select(
            "x",
            F.round(V.dot(F.col("x"), F.col("v")), 12)
            .cast("decimal(38,12)")
            .alias("s"),
        )
        u = (
            scored.select(
                F.col("s").cast("double").alias("s"),
                F.posexplode("x").alias("i", "xi"),
            )
            .groupBy("i")
            .agg(
                F.sum(
                    F.round(F.col("xi") * F.col("s"), 12).cast("decimal(38,12)")
                )
                .cast("double")
                .alias("u")
            )
        )
        nrm = u.agg(
            F.sqrt(
                F.sum(
                    F.round(F.col("u") * F.col("u"), 12).cast("decimal(38,12)")
                ).cast("double")
            ).alias("nrm")
        )
        v = _as_vector(
            u.crossJoin(F.broadcast(nrm)).select(
                "i", F.round(F.col("u") / F.col("nrm"), 12).alias("c")
            ),
            "c",
        ).localCheckpoint(eager=True)
        nrm_last = nrm
    return (
        v.select(F.posexplode("v").alias("i", "component"))
        .crossJoin(F.broadcast(nrm_last))
        .crossJoin(F.broadcast(n_df))
        .select(
            F.col("i").cast("int").alias("i"),
            F.round("component", 6).alias("component"),
            F.round(F.col("nrm") / F.col("n"), 6).alias("eigenvalue"),
            F.col("n").cast("bigint").alias("n_vectors"),
        )
    )
