"""Fixed-iteration PageRank over an edge DataFrame — graph centrality as a
quality prior (web-corpus curation ranks domains/documents by link
centrality; within near-dup clusters it elects the most *central* survivor
instead of the arbitrary min-id).

Companion to operators/components.py: components give the partition of the
near-dup graph, PageRank gives an ordering inside it.  A FIXED iteration
count (power iteration unrolled) rather than convergence detection keeps
the computation deterministic and closed-form — each iteration is one
equi-join + one aggregate, so the oracle can replay it as chained CTEs.

Scale shape (100 TB): per iteration the only shuffle is the
contribution aggregate keyed on dst; the rank vector is (node, pr) — tiny
next to the edge list — and the edge list itself is scanned once per
iteration from a localCheckpoint, not recomputed through upstream lineage
(the components.py lesson).  Degree is computed once.  Driver-side work is
one scalar count (node total), the same footprint as the CC convergence
probe.

Determinism contract (oracle-matchable): per-edge contributions are
rounded and cast to DECIMAL before the SUM (order-independent), and each
iteration's rank is rounded to 12 decimals — identical expressions on
both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """-> DataFrame(node, degree, pagerank) for every node in ``edges``.

    ``edges`` is directed.  The node set is src ∪ dst, so sink nodes
    (appearing only as dst) hold rank; their out-mass is dangling mass,
    redistributed uniformly each iteration (standard PageRank treatment).
    For an undirected graph pass both directions — then every node has
    out-degree ≥ 1, the dangling term is identically zero, and the
    computation reduces to the simple form.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # bound lineage once: every iteration re-scans the edge list
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n_nodes = nodes.count()  # driver scalar, same footprint as CC probe
    base = (1.0 - damping) / n_nodes

    pr = nodes.withColumn("pr", F.lit(1.0 / n_nodes))
    for _ in range(iters):
        contrib = (
            e.join(pr, e["src"] == pr["node"])
            .join(deg, "src")
            .select(
                "dst",
                F.round(F.col("pr") / F.col("deg"), 12)
                .cast("decimal(20,12)")
                .alias("c"),
            )
        )
        # dangling mass: rank held by sink nodes (no out-edges); a 1-row
        # aggregate broadcast back in — no driver collect per iteration
        dangling = (
            pr.join(deg, pr["node"] == deg["src"], "left_anti")
            .agg(
                F.coalesce(
                    F.sum(F.col("pr").cast("decimal(20,12)")), F.lit(0)
                )
                .cast("double")
                .alias("dm")
            )
        )
        pr = (
            nodes.join(
                contrib.groupBy("dst").agg(F.sum("c").alias("s")),
                nodes["node"] == contrib["dst"],
                "left",
            )
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                F.round(
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                        + F.col("dm") / F.lit(float(n_nodes))
                    ),
                    12,
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return pr.join(deg, pr["node"] == deg["src"], "left").select(
        "node",
        F.coalesce(F.col("deg"), F.lit(0)).alias("degree"),
        "pr",
    )
