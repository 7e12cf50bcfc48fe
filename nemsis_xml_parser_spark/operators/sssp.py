"""Multi-source weighted shortest paths — fixed-round Bellman-Ford.

The weighted complement of ``operators/bfs.py``: distances over a
weighted graph via synchronous relaxation rounds, the textbook
MapReduce/Pregel SSSP.  Per round the tentative-distance vector joins
the adjacency list once (keyed on node) and a min-aggregate folds the
relaxations — frontier-free but bounded: after K rounds the vector
holds exact shortest distances among paths of ≤ K edges, and if K ≥
the weighted diameter those ARE the shortest paths.  Fixed K keeps the
operator oracle-expressible (the SQL twin unrolls K rounds).

The "keep the previous distance" branch is folded INTO the relaxation
as weight-0 self-loop edges on every node (min over {dist} ∪
{dist+w over in-edges} == min over the self-loop-augmented in-edges),
so each round references the distance state exactly ONCE — the whole
K-round ladder chains into a single linear plan with zero per-round
driver jobs instead of K sequential lineage-cut jobs (guide §1.2,
§2.4; the former shape paid one eager checkpoint per round purely to
keep the twice-referenced state from duplicating its subtree).  The
augmented adjacency is lineage-cut ONCE and reused by every round.

Integer weights in, integer distances out — no float discipline needed.

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
    e = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
        F.col(weight).cast("long").alias("w"),
    )
    # weight-0 self-loops on every node (seeds included, so a seed with
    # no out-edges still survives at distance 0 exactly as the old
    # union-branch form kept it): relaxing over them carries the
    # previous round's distance forward, so the per-round min needs no
    # separate union branch (and the state is referenced only once).
    loops = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .union(seeds.select(F.col(node).cast("long").alias("v")))
        .distinct()
        .select(
            F.col("v").alias("src"),
            F.col("v").alias("dst"),
            F.lit(0).cast("long").alias("w"),
        )
    )
    adj = cut_lineage(e.unionByName(loops))
    dist = (
        seeds.select(
            F.col(node).cast("long").alias("v"),
            F.lit(0).cast("long").alias("dist"),
        )
        .distinct()
    )
    for _ in range(rounds):
        dist = (
            dist.join(adj, dist["v"] == adj["src"])
            .groupBy(F.col("dst").alias("v2"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("dist"))
            .withColumnRenamed("v2", "v")
        )
    # one cut at the end: callers typically fan out (histogram +
    # anti-join), and a single materialization keeps that from
    # re-executing the K-round chain per branch.
    return cut_lineage(dist)
