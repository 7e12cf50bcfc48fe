"""k-truss decomposition by support peeling — the community-core
operator between triangle counting and clique finding.

A k-truss is the maximal subgraph where EVERY edge participates in at
least k−2 triangles *within the subgraph* (Cohen, "Trusses: cohesive
subgraphs for social network analysis", NSA tech report 2008).  The
standard distributed algorithm is support peeling: compute per-edge
triangle support with one wedge join, drop edges under the threshold,
recompute on the residual — dropped edges can break other edges'
triangles, so iterate.

Distributed shape per round (the same triangle-join pattern as
graph_triangle_count / graph_local_clustering): canonical edges (u<v)
join the adjacency twice on the shared wedge endpoint — shuffles are
keyed on node ids, support is one (u,v)-keyed hash aggregate, and the
edge filter is a broadcast-free where().  Peeling rounds are FIXED
(``rounds``) so the whole computation is oracle-replayable; the
fixpoint is typically reached in a handful of rounds on real graphs
(each round removes every currently-under-supported edge at once —
the "bulk deletion" variant that converges in O(diameter of the
support lattice), not O(|E|)).

Reference parity: the reference (psycopg2 ETL) has no graph surface;
§2.I extension tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .lineage import cut_lineage


def ktruss_edges(
    edges: DataFrame, k: int, rounds: int
) -> DataFrame:
    """Peel ``edges`` (canonical u < v, one row per undirected edge)
    toward the k-truss for a FIXED number of rounds.

    Returns the surviving edges with their final-round support:
    (u, v, support).  With enough rounds this IS the k-truss; a fixed
    round count keeps the operator deterministic and replayable — the
    caller picks rounds like any other bounded-iteration operator here
    (PageRank, Lloyd, label propagation).
    """
    if k < 3:
        raise ValueError("k must be >= 3 (k-2 triangles per edge)")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    e = edges.select("u", "v").where(F.col("u") < F.col("v")).distinct()
    e = e.transform(cut_lineage)

    def _support(edge_df: DataFrame) -> DataFrame:
        # support(u,v) = |N(u) ∩ N(v)|: wedge join on the shared
        # endpoint; distinct column names everywhere (self-join lineage)
        adj = edge_df.select("u", "v").unionByName(
            edge_df.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        ce = edge_df.select(
            F.col("u").alias("e_u"), F.col("v").alias("e_v")
        )
        wa = adj.select(F.col("u").alias("a_u"), F.col("v").alias("a_w"))
        wb = adj.select(F.col("u").alias("b_u"), F.col("v").alias("b_w"))
        return (
            ce.join(wa, F.col("e_u") == F.col("a_u"))
            .join(
                wb,
                (F.col("e_v") == F.col("b_u"))
                & (F.col("a_w") == F.col("b_w")),
            )
            .groupBy(
                F.col("e_u").alias("u"), F.col("e_v").alias("v")
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        )

    for _ in range(rounds):
        sup = _support(e)
        e = (
            e.join(sup, ["u", "v"], "left")
            .where(F.coalesce(F.col("support"), F.lit(0)) >= k - 2)
            .select("u", "v")
            .transform(cut_lineage)
        )
    # final support on the surviving subgraph; LEFT join so survivors
    # whose support dropped to 0 on the residual graph still appear
    # (the wedge join alone would silently omit them)
    return (
        e.join(_support(e), ["u", "v"], "left")
        .select(
            "u",
            "v",
            F.coalesce(F.col("support"), F.lit(0))
            .cast("bigint")
            .alias("support"),
        )
    )
