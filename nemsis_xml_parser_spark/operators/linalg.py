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
    project.  The corpus is never rescanned, which is the entire point
    of materializing the Gram first at 100 TB.

    Returns (comp_idx INT, i INT, vc DOUBLE, eigenvalue DOUBLE): unit
    eigenvector components at 12 dp and the ‖u‖ Rayleigh estimate in
    Gram scale.  Determinism contract as operators/pca.py: round-12 +
    DECIMAL casts before every sum, so a generated SQL oracle can
    replay each iteration bit-for-bit.

    Shape: d is the embedding width — a compile-time constant, never a
    data size — so the whole d×d Gram collapses into ONE matrix row
    (array<array<double>>, KB-scale) materialized with a single eager
    checkpoint, and the ENTIRE eigsolve (every power iteration, norm
    and deflation) is then ONE narrow expression on that single row: no
    per-iteration join, exchange, window or checkpoint job (the former
    d²-row join form paid ~2 jobs × k·iters of pure local-mode latency;
    at cluster scale the same chain is k·iters sequential stage
    barriers on KB of state).  Every reused intermediate (u, nrm, the
    iterate structs, deflated matrices) is LAMBDA-BOUND via the
    ``transform(array(x), v -> body)[0]`` LET idiom (operators/winnow.py
    convention) — a plain chained-select form here re-evaluates
    exponentially, because CollapseProject inlines single-referenced
    aliases into HOF lambda bodies where they evaluate PER ELEMENT (the
    documented HOF-lambda re-evaluation landmine).  Values are
    unchanged: every sum is an exact-DECIMAL fold over round-12 terms,
    and decimal addition is exact, so the fold's j-ascending order
    gives bit-identical results to the hash aggregate's arbitrary
    order."""
    dec0 = "cast(0 as decimal(37,12))"

    def let(val: str, var: str, body: str) -> str:
        return f"transform(array({val}), {var} -> {body})[0]"

    seq = f"sequence(0, {dim - 1})"
    v0 = f"transform({seq}, z -> cast(if(z = 0, 1.0, 0.0) as double))"

    def u_of(gv: str, vref: str, s: str) -> str:
        # u_i = double(Σ_j decimal(round(g_ij · v_j, 12)))
        return (
            f"transform({gv}, row{s} -> cast(aggregate({seq}, {dec0},"
            f" (ua{s}, uj{s}) -> cast(ua{s} + cast(round(row{s}[uj{s}] *"
            f" {vref}[uj{s}], 12) as decimal(32,12)) as decimal(37,12)))"
            " as double))"
        )

    def nrm_of(uv: str, s: str) -> str:
        return (
            f"sqrt(cast(aggregate({uv}, {dec0}, (na{s}, nx{s}) ->"
            f" cast(na{s} + cast(round(nx{s} * nx{s}, 12) as decimal(32,12))"
            " as decimal(37,12))) as double))"
        )

    def iter_struct(gv: str, vref: str, s: str) -> str:
        # one power iteration -> struct(v, nrm), u and nrm lambda-bound
        body = (
            f"struct(transform(u{s}, vx{s} -> round(vx{s} / nr{s}, 12))"
            f" as v, nr{s} as nrm)"
        )
        return let(
            u_of(gv, vref, s),
            f"u{s}",
            let(nrm_of(f"u{s}", s), f"nr{s}", body),
        )

    def deflate(gv: str, stv: str, s: str) -> str:
        return (
            f"transform({seq}, di{s} -> transform({seq}, dj{s} ->"
            f" round({gv}[di{s}][dj{s}] - {stv}.nrm * {stv}.v[di{s}] *"
            f" {stv}.v[dj{s}], 12)))"
        )

    def component_chain(c: int, gv: str) -> str:
        # iterate component c on matrix gv, then (deflate and) recurse;
        # the innermost body assembles the final array — outer lambda
        # variables stay in scope through the nesting
        def iters_chain(t: int) -> str:
            vref = v0 if t == 1 else f"st{c}_{t - 1}.v"
            inner = (
                tail(c)
                if t == iters
                else iters_chain(t + 1)
            )
            return let(iter_struct(gv, vref, f"{c}_{t}"), f"st{c}_{t}", inner)

        def tail(cc: int) -> str:
            if cc == k - 1:
                parts = ", ".join(f"st{x}_{iters}" for x in range(k))
                return f"array({parts})"
            return let(
                deflate(gv if cc == c else f"g{cc}", f"st{cc}_{iters}", str(cc)),
                f"g{cc + 1}",
                component_chain(cc + 1, f"g{cc + 1}"),
            )

        return iters_chain(1)

    # one matrix row, (i, j)-ordered — array_sort on struct(i, j, gram)
    # sorts lexicographically and (i, j) is unique; the sorted list is
    # LET-bound so the reshape lambda cannot inline+re-sort per element
    mat = (
        mirror_full(gram_upper)
        .agg(F.array_sort(F.collect_list(F.struct("i", "j", "gram"))).alias("s"))
        .select(
            F.expr(
                let(
                    "s",
                    "sm",
                    f"transform({seq}, mi -> transform({seq}, mj ->"
                    f" element_at(sm, mi * {dim} + mj + 1).gram))",
                )
            ).alias("g")
        )
        .transform(cut_lineage)
    )
    comps = mat.select(F.expr(component_chain(0, "g")).alias("comps"))
    return (
        comps.select(F.posexplode("comps").alias("comp_idx", "st"))
        .select(
            F.col("comp_idx").cast("int").alias("comp_idx"),
            F.posexplode("st.v").alias("i", "vc"),
            F.col("st.nrm").alias("eigenvalue"),
        )
        .select("comp_idx", "i", "vc", "eigenvalue")
    )
