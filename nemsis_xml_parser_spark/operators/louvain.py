"""Louvain phase-1 modularity-gain sweep (one synchronous round) with
exact-rational modularity evaluation.

Community detection for the dedup/curation graph tier: from the
singleton partition, every node evaluates the modularity gain of
joining each neighbor's community and takes the best positive move —
the first sweep of Louvain phase 1 (Blondel et al. 2008), rendered
synchronously (all nodes decide against the ORIGINAL partition, the
Pregel discipline; iterated sweeps are a driver loop over this
operator).  Synchronicity has the textbook artifact: mutually-best
pairs SWAP anchors instead of merging (a lone edge yields two moved
nodes in two communities), and cliques split around their two lowest
anchors — artifacts the iterated loop cleans up; the tests pin them
explicitly so the semantics are never mistaken for asynchronous
Louvain.  From singletons the gain of moving i next to j is, up to
the positive factor 1/(2m²),

    gain(i→j) = 2·m·w_ij − k_i·k_j

with m = total edge weight and k = weighted degree — ALL INTEGERS for
integer edge weights, so the argmax (gain desc, then min j) is exact
on both engines with no float ranking anywhere.  The resulting
partition's Newman modularity is likewise exact until the last step:

    Q · 4m² = Σ_c (4·m·w_in(c) − d_c²)

is an integer; Q itself is ONE double division.

Scale shape: gains are one edge-keyed join against the degree table
plus a node-keyed argmax aggregate; modularity is one edge-level
same-community check plus a community-keyed aggregate.  Nothing ever
materializes beyond the edge list.

Reference parity: none — §2.I graph tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .lineage import cut_lineage


def louvain_sweep_summary(edges: DataFrame) -> DataFrame:
    """One synchronous gain sweep from singletons over canonical
    (u < v, w) integer-weighted edges.  Returns ONE row:
    (n_nodes, n_moved, n_communities, largest_community, modularity)."""
    e = edges.select(
        F.col("u").cast("long"), F.col("v").cast("long"), F.col("w").cast("long")
    )
    adj = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"), F.col("w"))
    )
    deg = adj.groupBy("u").agg(F.sum("w").alias("k"))
    m = e.agg(F.sum("w")).collect()[0][0] or 0
    if m == 0:
        # Modularity divides by 4*m^2; an empty / all-zero-weight graph has
        # no defined partition quality — fail loudly instead of emitting NaN.
        raise ValueError("louvain_sweep_summary: total edge weight is 0")
    gains = (
        adj.join(deg.withColumnRenamed("u", "v").withColumnRenamed("k", "kj"), "v")
        .join(deg, "u")
        .select(
            "u",
            "v",
            (F.lit(2 * m) * F.col("w") - F.col("k") * F.col("kj")).alias("g"),
        )
        .where(F.col("g") > 0)
    )
    best_g = gains.groupBy("u").agg(F.max("g").alias("gmax"))
    move = (
        gains.join(best_g, "u")
        .where(F.col("g") == F.col("gmax"))
        .groupBy("u")
        .agg(F.min("v").alias("anchor"))
    )
    nodes = deg.select(F.col("u").alias("node"), "k")
    # part/comm feed four downstream branches (moved-count, community
    # stats, in-community weight, modularity numerator) — materialize
    # once or every branch re-derives the whole gain pipeline
    part = cut_lineage(
        nodes.join(
            move.withColumnRenamed("u", "node"), "node", "left"
        ).select("node", "k", F.coalesce("anchor", F.col("node")).alias("c"))
    )
    comm = cut_lineage(
        part.groupBy("c").agg(
            F.count(F.lit(1)).alias("size"), F.sum("k").alias("dc")
        )
    )
    w_in = (
        e.join(part.select(F.col("node").alias("u"), F.col("c").alias("cu")), "u")
        .join(part.select(F.col("node").alias("v"), F.col("c").alias("cv")), "v")
        .where(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("c"))
        .agg(F.sum("w").alias("win"))
    )
    qnum = (
        comm.join(w_in, "c", "left")
        .select(
            (
                F.lit(4 * m) * F.coalesce("win", F.lit(0))
                - F.col("dc") * F.col("dc")
            ).alias("t")
        )
        .agg(F.sum("t").cast("decimal(38,0)").alias("qn"))
    )
    stats = part.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum((F.col("c") != F.col("node")).cast("long"))
        .cast("bigint")
        .alias("n_moved"),
        F.count_distinct("c").cast("bigint").alias("n_communities"),
    )
    largest = comm.agg(F.max("size").cast("bigint").alias("largest_community"))
    return (
        stats.crossJoin(largest)
        .crossJoin(qnum)
        .select(
            "n_nodes",
            "n_moved",
            "n_communities",
            "largest_community",
            F.round(
                F.col("qn").cast("double") / F.lit(float(4 * m * m)), 6
            ).alias("modularity"),
        )
    )
