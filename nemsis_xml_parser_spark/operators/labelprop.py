"""Deterministic synchronous label propagation — community detection on
an undirected edge list (Raghavan et al. 2007, made reproducible).

Plain LPA is order-dependent (asynchronous updates, random tie-breaks);
this variant fixes both so a SQL oracle can replay it iteration for
iteration (the operators/pagerank.py contract):

* synchronous rounds: every node updates from the PREVIOUS round's
  labels simultaneously;
* deterministic argmax: the new label is the neighbor label with the
  highest count, ties broken by SMALLEST label — expressed as one
  struct-max aggregate (max (count, −label)), no per-node window;
* fixed iteration count from labels = node ids.

Scale shape, per round: one edge⋈label equi-join (shuffle keyed on the
neighbor id), one (node, label) count aggregate, one struct-max per
node, one left join back onto the label frame for isolated nodes —
identical to the PageRank round structure; the label frame is
localCheckpointed each round to cut lineage.  Synchronous LPA can
oscillate on bipartite-ish structures — a fixed round count makes that
a determinism feature (both engines see the same snapshot), not a
convergence bug.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .lineage import cut_lineage


def propagate_labels(edges: DataFrame, iters: int = 4) -> DataFrame:
    """(node, label) after ``iters`` synchronous rounds.

    ``edges`` must be symmetrized (both directions present); columns
    ``src``/``dst``.  Labels start as the node ids themselves (the
    min-label tie-break then prefers older/smaller ids, matching the
    components operator's survivor convention)."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    labels = nodes.select("node", F.col("node").alias("lab")).transform(cut_lineage)
    for _ in range(iters):
        neigh = (
            edges.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"), "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        pick = (
            neigh.groupBy("node")
            .agg(F.max(F.struct(F.col("c"), (-F.col("lab")).alias("nl"))).alias("m"))
            .select("node", (-F.col("m.nl")).alias("new_lab"))
        )
        labels = (
            labels.join(pick, "node", "left")
            .select("node", F.coalesce("new_lab", "lab").alias("lab"))
            .transform(cut_lineage)  # cut lineage: round t+1 must not replay 1..t
        )
    return labels


def community_stats(edges_undirected: DataFrame, labels: DataFrame) -> DataFrame:
    """Per-community rollup + global modularity.

    ``edges_undirected``: one row per edge with ``a < b``.  Returns
    (community, n_members, internal_edges, modularity) — modularity
    Q = Σ_c (e_c/m − (d_c/2m)²) replicated on every row as the audit
    verdict; terms are rounded to 12 dp and DECIMAL-cast before the
    community sum so Q is order-independent."""
    la = labels.select(F.col("node").alias("a"), F.col("lab").alias("lab_a"))
    lb = labels.select(F.col("node").alias("b"), F.col("lab").alias("lab_b"))
    tagged = edges_undirected.join(la, "a").join(lb, "b")
    internal = (
        tagged.where(F.col("lab_a") == F.col("lab_b"))
        .groupBy(F.col("lab_a").alias("community"))
        .agg(F.count(F.lit(1)).alias("internal_edges"))
    )
    deg = (
        edges_undirected.select(F.col("a").alias("node"))
        .unionAll(edges_undirected.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    comm = (
        labels.join(deg, "node", "left")
        .groupBy(F.col("lab").alias("community"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.coalesce("d", F.lit(0))).alias("d_sum"),
        )
        .join(internal, "community", "left")
        .select(
            "community",
            "n_members",
            F.coalesce("internal_edges", F.lit(0)).alias("internal_edges"),
            "d_sum",
        )
    )
    m = edges_undirected.agg(F.count(F.lit(1)).cast("double").alias("m"))
    term = F.round(
        F.col("internal_edges") / F.col("m")
        - (F.col("d_sum") / (2 * F.col("m"))) * (F.col("d_sum") / (2 * F.col("m"))),
        12,
    ).cast("decimal(38,12)")
    withq = comm.crossJoin(F.broadcast(m)).transform(cut_lineage)
    q = withq.agg(F.sum(term).cast("double").alias("q"))
    return (
        withq.crossJoin(F.broadcast(q))
        .select(
            F.col("community").cast("bigint").alias("community"),
            F.col("n_members").cast("bigint").alias("n_members"),
            F.col("internal_edges").cast("bigint").alias("internal_edges"),
            F.round("q", 6).alias("modularity"),
        )
    )
