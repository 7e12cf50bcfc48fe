"""Bounded-depth multi-source BFS (k-hop neighborhood labeling).

Distributed shape: per level, ONE equi-join of the current frontier
against the adjacency list plus one anti-join against the visited set —
the standard Pregel-style frontier expansion.  Each level is
localCheckpointed so the plan stays flat (NOTES gotcha 13: iterative
DataFrame loops double their plan per level otherwise) and the visited
set never re-derives earlier levels.

At 100 TB the adjacency join shuffles on the frontier key only (frontier
cardinality, not graph cardinality); the visited anti-join is the same
key.  Depth is a hard bound — the k-hop semantics every feature-
engineering pipeline uses (no unbounded transitive closure).

Reference parity: the reference (a psycopg2 ETL, main_ingest.py) has no
graph surface; this is part of the §2.I query tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .lineage import cut_lineage


def bfs_hops(adj: DataFrame, seeds: DataFrame, max_hops: int) -> DataFrame:
    """Label every node reachable from ``seeds`` within ``max_hops``.

    ``adj``: directed adjacency (u, v) — pass both directions for an
    undirected graph.  ``seeds``: one column ``v``.  Returns (v, hop)
    with hop = minimum number of edges from any seed (0 for seeds).
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    frontier = seeds.select("v").distinct().transform(cut_lineage)
    visited = frontier.select("v", F.lit(0).alias("hop")).transform(cut_lineage)
    for i in range(1, max_hops + 1):
        nxt = (
            adj.join(frontier.withColumnRenamed("v", "u"), "u")
            .select("v")
            .distinct()
            .join(visited.select("v"), "v", "left_anti")
            .transform(cut_lineage)
        )
        visited = visited.unionByName(
            nxt.select("v", F.lit(i).alias("hop"))
        ).transform(cut_lineage)
        frontier = nxt
    return visited


def bfs_hops_per_source(
    adj: DataFrame, seeds: DataFrame, max_hops: int
) -> DataFrame:
    """Per-source hop labels: like :func:`bfs_hops` but each seed runs
    its own BFS (state keyed (src, v)) — the k-hop distance MATRIX
    restricted to the seed set, the input to closeness/harmonic
    centrality and hop-bounded ego features.

    ``seeds``: one column ``v``.  Returns (src, v, hop), hop <=
    ``max_hops``.  Shuffle cost per level is frontier-pair-sized
    (|active (src, v) pairs|), the standard multi-source labeled BFS;
    seed count is the work multiplier, so callers sample sources (as
    Brandes-style approximations do) rather than running all nodes.
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    frontier = (
        seeds.select(F.col("v").alias("src"), "v")
        .distinct()
        .transform(cut_lineage)
    )
    visited = frontier.select("src", "v", F.lit(0).alias("hop")).transform(cut_lineage)
    for i in range(1, max_hops + 1):
        nxt = (
            adj.join(
                frontier.select("src", F.col("v").alias("u")), "u"
            )
            .select("src", "v")
            .distinct()
            .join(visited.select("src", "v"), ["src", "v"], "left_anti")
            .transform(cut_lineage)
        )
        visited = visited.unionByName(
            nxt.select("src", "v", F.lit(i).alias("hop"))
        ).transform(cut_lineage)
        frontier = nxt
    return visited
