"""Graph coarsening by heavy-edge matching — the METIS/multilevel-
partitioning contraction phase, bulk-parallel.

Partitioning a 100 TB graph starts by shrinking it: repeatedly match
each node to its heaviest neighbor (mutual proposals only — a
maximal-matching heuristic that preserves heavy edges inside
supernodes) and contract matched pairs, summing parallel edge weights.
Each round is three node-keyed hash shuffles — proposal argmax,
mutual-match join, contraction aggregate — and never materializes
anything bigger than the edge list, which SHRINKS geometrically (the
scaling argument for the whole multilevel family: Karypis & Kumar,
"A Fast and High Quality Multilevel Scheme for Partitioning Irregular
Graphs", SIAM J. Sci. Comput. 1998).

Determinism: weights are integers; the proposal argmax packs
(weight, partner) into ONE integer — ``w * 2^31 + (2^31 - 1 - j)`` so
a plain MAX takes the max weight with min-partner tie-break — the
``operators/winnow.py`` packing trick, reproduced verbatim in the SQL
oracle.  Matched pairs contract onto ``min(i, j)``; self-loops drop;
parallel edges sum exactly.

Reference parity: none — §2.I graph tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .lineage import cut_lineage

_PACK = 1 << 31  # node ids must stay below this


def heavy_edge_matching_round(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One propose→match→contract round over canonical (u < v) weighted
    edges (u, v, w).  Returns (contracted_edges, matches) where matches
    is (u, v, w) — the mutually-proposed pairs that merged (u < v) —
    and contracted_edges is the coarse graph in canonical form."""
    checked = edges.select(
        "u",
        # Packing assumes ids (and weights) fit beside each other in one
        # BIGINT; an id >= 2^31 would silently corrupt the argmax pick,
        # so out-of-range ids fail loudly at scan time instead.
        F.when(
            (F.col("v") >= 0) & (F.col("v") < _PACK)
            & (F.col("u") >= 0) & (F.col("u") < _PACK),
            F.col("v"),
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("heavy_edge_round: node id out of packable "
                          "range [0, 2^31): ("),
                    F.col("u").cast("string"), F.lit(", "),
                    F.col("v").cast("string"), F.lit(")"),
                )
            )
        )
        .alias("v"),
        "w",
    )
    adj = checked.unionByName(
        checked.select(
            F.col("v").alias("u"), F.col("u").alias("v"), F.col("w")
        )
    )
    prop = (
        adj.groupBy("u")
        .agg(
            F.max(
                F.col("w") * F.lit(_PACK) + (F.lit(_PACK - 1) - F.col("v"))
            ).alias("m")
        )
        .select(
            F.col("u").alias("node"),
            (F.lit(_PACK - 1) - F.col("m") % F.lit(_PACK)).alias("pick"),
        )
    )
    # mutual proposals, one row per pair (u < v)
    a = prop.select(F.col("node").alias("u"), F.col("pick").alias("v"))
    b = prop.select(F.col("pick").alias("u"), F.col("node").alias("v"))
    matches = (
        a.join(b, ["u", "v"])
        .where(F.col("u") < F.col("v"))
        .join(edges, ["u", "v"])
        .select("u", "v", "w")
    )
    # supernode map: both endpoints of a match map to min(u, v) = u
    smap = matches.select(
        F.col("v").alias("node"), F.col("u").alias("super")
    )
    def relabel(col: str) -> DataFrame:
        return smap.withColumnRenamed("node", col).withColumnRenamed(
            "super", f"{col}_s"
        )

    # the supernode map is O(matched nodes) — NOT broadcastable at real
    # scale; these are node-keyed shuffle joins (AQE may still broadcast
    # small rounds at demo scale)
    contracted = (
        edges.join(relabel("u"), "u", "left")
        .join(relabel("v"), "v", "left")
        .select(
            F.coalesce("u_s", "u").alias("a"),
            F.coalesce("v_s", "v").alias("b"),
            "w",
        )
        .where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"),
            F.greatest("a", "b").alias("v"),
            "w",
        )
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
    )
    return contracted, matches


def coarsen_stats(edges: DataFrame, rounds: int) -> DataFrame:
    """Run ``rounds`` matching rounds; one stats row per round:
    (round, n_nodes, n_edges, total_weight, n_matched, matched_weight)
    where n_nodes/n_edges/total_weight describe the graph the round
    STARTED from."""
    spark = edges.sparkSession
    e = cut_lineage(
        edges.select(
            F.col("u").cast("long"), F.col("v").cast("long"),
            F.col("w").cast("long"),
        )
    )
    rows = []
    for r in range(1, rounds + 1):
        # ONE job for all three graph scalars (the old loop paid three:
        # a distinct-count, a count and a sum) — each edge contributes
        # both endpoints to the explode, so edge count and weight come
        # back doubled and halve exactly (integers)
        st = (
            e.select(F.explode(F.array("u", "v")).alias("n"), "w")
            .agg(
                F.countDistinct("n").alias("nn"),
                F.count(F.lit(1)).alias("ne2"),
                F.coalesce(F.sum("w"), F.lit(0)).alias("tw2"),
            )
            .collect()[0]
        )
        # exact integer halving driver-side (both totals are doubled)
        n_nodes, n_edges, total_w = st["nn"], st["ne2"] // 2, st["tw2"] // 2
        contracted, matches = heavy_edge_matching_round(e)
        magg = matches.agg(
            F.count(F.lit(1)).alias("n"), F.sum("w").alias("mw")
        ).collect()[0]
        rows.append(
            (
                r,
                int(n_nodes),
                int(n_edges),
                int(total_w),
                int(magg["n"]),
                int(magg["mw"] or 0),
            )
        )
        e = cut_lineage(contracted)
    return spark.createDataFrame(
        rows,
        "round int, n_nodes bigint, n_edges bigint, total_weight bigint, "
        "n_matched bigint, matched_weight bigint",
    )
