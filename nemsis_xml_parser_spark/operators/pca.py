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

from .lineage import cut_lineage

from ..functions import vectors as V


def _as_vector(per_dim: DataFrame, col: str) -> DataFrame:
    """(i, col) rows → 1-row (v array<double>) ordered by i."""
    return per_dim.agg(
        F.array_sort(F.collect_list(F.struct("i", F.col(col)))).alias("s")
    ).select(F.transform("s", lambda e: e[col]).alias("v"))


def power_iteration_components(
    emb: DataFrame,
    dim: int,
    k: int = 2,
    iters: int = 6,
    vec_col: str = "embedding",
    center: bool = True,
) -> DataFrame:
    """Top-``k`` principal components via power iteration + deflation:
    after each component converges, its projection is subtracted from
    every vector (x ← x − (x·v)·v) and the next component is extracted
    from the deflated cloud — the classic sequential eigenextraction,
    kept matrix-free and DataFrame-shaped throughout.

    Returns (comp_idx INT, i INT, component DOUBLE, eigenvalue DOUBLE,
    n_vectors BIGINT) — k × dim rows.  Deflation hoists the per-row
    projection scalar into a materialized column BEFORE the zip_with
    (the HOF-lambda re-evaluation landmine: a computed expression
    captured in the lambda would re-evaluate per element, turning the
    deflation into O(dim²) work per row).  Each deflated frame is
    localCheckpointed so component j+1 does not replay extractions
    1..j.
    """
    x = V.to_double_array(F.col(vec_col))
    base = emb.select(x.alias("embedding"))
    if center:
        # center ONCE, before any extraction: deflation preserves the
        # centroid at zero, so later components see correctly-centered
        # data; centering per-component inside the subroutine would
        # re-shift the deflated cloud and bend components 2..k
        stats = (
            base.select(F.posexplode("embedding").alias("i", "xi"))
            .groupBy("i")
            .agg(
                F.sum(F.round(F.col("xi"), 12).cast("decimal(38,12)")).alias("sx"),
                F.count(F.lit(1)).alias("n"),
            )
            .select("i", (F.col("sx").cast("double") / F.col("n")).alias("m"))
        )
        mu = _as_vector(stats.withColumnRenamed("m", "c"), "c")
        base = base.crossJoin(F.broadcast(mu)).select(
            F.zip_with("embedding", "v", lambda a, b: a - b).alias("embedding")
        ).transform(cut_lineage)
    out: DataFrame | None = None
    for comp_idx in range(k):
        comp = power_iteration_top_component(
            base, dim=dim, iters=iters, center=False
        ).select(
            F.lit(comp_idx).cast("int").alias("comp_idx"),
            "i",
            "component",
            "eigenvalue",
            "n_vectors",
        )
        if comp_idx < k - 1:
            # two consumers (the output union AND the deflation's v_df):
            # materialize the 64-row extraction once so the deflation's
            # broadcast build does not re-run the iteration chain
            comp = comp.transform(cut_lineage)
        out = comp if out is None else out.unionByName(comp)
        if comp_idx == k - 1:
            break
        v_df = comp.agg(
            F.array_sort(F.collect_list(F.struct("i", "component"))).alias("s")
        ).select(F.transform("s", lambda e: e["component"]).alias("vd"))
        scored = base.crossJoin(F.broadcast(v_df)).select(
            "embedding", "vd", V.dot(F.col("embedding"), F.col("vd")).alias("s")
        )
        base = scored.select(
            F.zip_with(
                "embedding", "vd", lambda xi, vi: xi - F.col("s") * vi
            ).alias("embedding")
        ).transform(cut_lineage)
    return out


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
    base = base.transform(cut_lineage)
    n_df = base.agg(F.count(F.lit(1)).alias("n"))

    # The iterate rides as a 1-row (v array, nrm) frame whose norm and
    # normalization are NARROW array folds over the matvec aggregate —
    # the former separate norm frame re-executed u's corpus aggregate
    # inside its broadcast build (2 corpus aggregates per iteration) and
    # each iterate paid an eager checkpoint job.  Now each v is consumed
    # exactly once (by the next iteration's broadcast), so the whole
    # loop chains into ONE linear plan executed by the final action: per
    # iteration exactly one corpus scan and zero driver-side jobs.
    # Values are unchanged — decimal sums are exact, so the fold order
    # cannot move a bit.
    dec0 = "cast(0 as decimal(37,12))"
    v = base.sparkSession.range(1).select(
        F.array(
            *[F.lit(1.0 if j == 0 else 0.0) for j in range(dim)]
        ).alias("v")
    )
    for _ in range(iters):
        scored = base.crossJoin(F.broadcast(v)).select(
            "x",
            F.round(V.dot(F.col("x"), F.col("v")), 12)
            .cast("decimal(38,12)")
            .alias("s"),
        )
        u_rows = (
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
        v = (
            u_rows.agg(
                F.array_sort(F.collect_list(F.struct("i", "u"))).alias("su")
            )
            .select(F.expr("transform(su, e -> e.u)").alias("u"))
            .select(
                "u",
                F.expr(
                    f"sqrt(cast(aggregate(u, {dec0}, (acc, x) ->"
                    " cast(acc + cast(round(x * x, 12) as decimal(32,12))"
                    " as decimal(37,12))) as double))"
                ).alias("nrm"),
            )
            .select(
                F.expr("transform(u, e -> round(e / nrm, 12))").alias("v"),
                "nrm",
            )
        )
    return (
        v.select(F.posexplode("v").alias("i", "component"), "nrm")
        .crossJoin(F.broadcast(n_df))
        .select(
            F.col("i").cast("int").alias("i"),
            F.round("component", 6).alias("component"),
            F.round(F.col("nrm") / F.col("n"), 6).alias("eigenvalue"),
            F.col("n").cast("bigint").alias("n_vectors"),
        )
    )
