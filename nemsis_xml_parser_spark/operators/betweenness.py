"""Hop-bounded Brandes betweenness centrality over sampled sources.

Distributed shape (the standard Pregel-style decomposition of Brandes'
algorithm):

* **forward phase** — labeled multi-source BFS exactly like
  ``operators/bfs.py::bfs_hops_per_source``, except each frontier row
  carries ``sigma`` = the number of shortest paths from ``src`` —
  computed per level as ONE (src, v)-keyed hash aggregate over the
  frontier⋈adjacency join (sigma(v) = Σ sigma(u) over predecessors u on
  the previous level).  Map-side combine reduces each partition before
  the shuffle; per-level traffic is frontier-pair-sized, never
  graph-sized.
* **backward phase** — dependency accumulation descending the levels:
  delta(u) = Σ over successors w on the next level of
  sigma(u)/sigma(w) · (1 + delta(w)), again one join + one hash
  aggregate per level.  Betweenness(v) = Σ over sources of delta(v).

Sampled sources are the Brandes–Pich recipe: seed count is the work
multiplier, so centrality cost is bounded by |seeds| · levels, not |V|².
The hop bound makes this k-bounded betweenness (Borgatti's "bounded
rationality" variant) — every frontier is finite and every iteration is
a fixed, oracle-replayable number of joins.

Determinism contract: sigma is exact BIGINT; each dependency term is
round-12 double ``sigma_u/sigma_w * (1 + delta_w)`` accumulated as
DECIMAL(38,12) (order-independent), so a generated SQL oracle replays
both phases bit-for-bit.

Reference parity: the reference (psycopg2 ETL, main_ingest.py) has no
graph surface; §2.I extension tier.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .lineage import cut_lineage

_DEC = "decimal(38,12)"


def betweenness_sampled(
    adj: DataFrame, seeds: DataFrame, max_hops: int
) -> DataFrame:
    """Hop-bounded betweenness from ``seeds`` over directed adjacency
    ``adj`` (u, v) — pass both directions for an undirected graph.

    ``seeds``: one column ``v``.  Returns (v, delta DECIMAL(38,12)) with
    one row per (node, contributing source) pair ALREADY summed over
    sources: (v, betweenness_partial) — callers aggregate/round.  More
    precisely the result is (v, n_source_paths, betweenness) where
    betweenness = Σ_src delta(src, v) over nodes at hop ≥ 1.
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    levels: list[DataFrame] = []
    frontier = (
        seeds.select(F.col("v").alias("src"), "v")
        .distinct()
        .select("src", "v", F.lit(1).cast("bigint").alias("sigma"))
        .transform(cut_lineage)
    )
    levels.append(frontier)
    for _ in range(1, max_hops + 1):
        # visited = the union of the already-pinned levels — reading it
        # back per hop costs nothing extra and saves the dedicated
        # visited checkpoint job every hop (guide §1.2: the job ladder,
        # not the anti-join, is the wall at demo scale; at cluster
        # scale the anti-join input is identical either way).
        visited = reduce(
            DataFrame.unionByName,
            [lv.select("src", "v") for lv in levels],
        )
        nxt = (
            adj.join(
                frontier.select("src", F.col("v").alias("u"), "sigma"), "u"
            )
            .join(visited, ["src", "v"], "left_anti")
            .groupBy("src", "v")
            .agg(F.sum("sigma").alias("sigma"))
            .transform(cut_lineage)
        )
        levels.append(nxt)
        frontier = nxt
    # backward: deepest level has delta = 0
    delta = levels[max_hops].select(
        "src", "v", F.lit(0).cast(_DEC).alias("delta")
    )
    acc = delta
    for i in range(max_hops - 1, 0, -1):
        # (src, nv) on the NEXT level with its sigma and accumulated delta
        nxt_info = delta.select(
            F.col("src").alias("n_src"),
            F.col("v").alias("nv"),
            F.col("delta").alias("n_delta"),
        ).join(
            levels[i + 1].select(
                F.col("src").alias("n_src"),
                F.col("v").alias("nv"),
                F.col("sigma").alias("n_sigma"),
            ),
            ["n_src", "nv"],
        )
        # string-qualified aliases: levels share the adjacency's exprIds
        # (groupBy keys keep their input ids through localCheckpoint), so
        # dataset-ref disambiguation would be ambiguous here.
        cur = levels[i].select(
            F.col("src").alias("f_src"),
            F.col("v").alias("f_v"),
            F.col("sigma").alias("f_sigma"),
        )
        adj_r = adj.select(
            F.col("u").alias("a_u"), F.col("v").alias("a_v")
        )
        terms = (
            cur.join(adj_r, F.col("f_v") == F.col("a_u"))
            .join(
                nxt_info,
                (F.col("f_src") == F.col("n_src"))
                & (F.col("a_v") == F.col("nv")),
            )
            .select(
                F.col("f_src").alias("g_src"),
                F.col("f_v").alias("g_v"),
                F.round(
                    F.col("f_sigma").cast("double")
                    / F.col("n_sigma").cast("double")
                    * (F.lit(1.0) + F.col("n_delta").cast("double")),
                    12,
                )
                .cast(_DEC)
                .alias("term"),
            )
            .groupBy("g_src", "g_v")
            .agg(F.sum("term").cast(_DEC).alias("s"))
        )
        delta = (
            cur.select("f_src", "f_v")
            .join(
                terms,
                (F.col("f_src") == F.col("g_src"))
                & (F.col("f_v") == F.col("g_v")),
                "left",
            )
            .select(
                F.col("f_src").alias("src"),
                F.col("f_v").alias("v"),
                F.coalesce(F.col("s"), F.lit(0).cast(_DEC))
                .cast(_DEC)
                .alias("delta"),
            )
            .transform(cut_lineage)
        )
        acc = acc.unionByName(delta)
    return acc.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_source_paths"),
        F.sum("delta").cast(_DEC).alias("betweenness"),
    )
