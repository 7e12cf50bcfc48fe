"""Multi-source weighted shortest paths — fixed-round Bellman-Ford.

The weighted complement of ``operators/bfs.py``: distances over a
weighted graph via synchronous relaxation rounds, the textbook
MapReduce/Pregel SSSP.  Per round the tentative-distance vector joins
the adjacency list once (shuffle keyed on node) and a min-aggregate
folds the relaxations — frontier-free but bounded: after K rounds the
vector holds exact shortest distances among paths of ≤ K edges, and if
K ≥ the weighted diameter those ARE the shortest paths.  Fixed K keeps
the operator oracle-expressible (the SQL twin unrolls K rounds); the
convergence-probe variant would stop on a zero-change ``observe``
metric like SCC does.

Integer weights in, integer distances out — no float discipline needed.
Lineage is cut per round (``operators/lineage.py`` — never bare
localCheckpoint in a loop).

Reference parity: none — no graph operators in the reference; §2.I
graph tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .lineage import cut_lineage


def bellman_ford_rounds(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    node: str = "v",
) -> DataFrame:
    """(v, dist) — minimum over ≤``rounds``-edge paths from any seed.

    ``edges`` is directed (symmetrize upstream for undirected graphs);
    ``seeds`` rows start at distance 0.  Nodes unreached within
    ``rounds`` edges are absent from the result.
    """
    adj = cut_lineage(
        edges.select(
            F.col(src).cast("long").alias("src"),
            F.col(dst).cast("long").alias("dst"),
            F.col(weight).cast("long").alias("w"),
        )
    )
    dist = cut_lineage(
        seeds.select(
            F.col(node).cast("long").alias("v"), F.lit(0).cast("long").alias("dist")
        ).distinct()
    )
    for _ in range(rounds):
        relax = (
            dist.join(adj, dist["v"] == adj["src"])
            .select(
                F.col("dst").alias("v"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
        )
        dist = cut_lineage(
            dist.unionByName(relax)
            .groupBy("v")
            .agg(F.min("dist").alias("dist"))
        )
    return dist
