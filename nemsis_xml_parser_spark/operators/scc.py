"""Strongly connected components of a DIRECTED graph — forward/backward
min-label peeling (the FW-BW family: Fleischer/Hendrickson/Pinar "On
Identifying Strongly Connected Components in Parallel", and its
label-propagation rendering in Pregel-style systems).

Per round, over the still-unresolved subgraph:

1. ``fwd(v)`` = min node id among v's ancestors (and v) — a min-label
   fixpoint along edge direction;
2. ``bwd(v)`` = min node id among v's descendants (and v) — the same
   fixpoint on reversed edges;
3. every v with ``fwd(v) == bwd(v) == m`` is RESOLVED into SCC(m): m
   reaches v (fwd) and v reaches m (bwd), so they are mutually
   reachable.  Resolution is SCC-ATOMIC: within one SCC every member
   has the same ancestor set and the same descendant set (strong
   connectivity composes paths through any member), so fwd and bwd are
   constant across the SCC — either the whole SCC resolves this round
   (and the shared value is necessarily its own minimum member) or
   none of it does.  The SCC of the globally minimal unresolved node
   always satisfies fwd = bwd = that minimum, so every round makes
   progress and the loop terminates.
4. resolved nodes leave the edge set; repeat on the residual.

Round count equals the depth at which min-labels collide along the
condensation DAG — small for cycle-rich graphs (every round clears at
least the current global-min SCC and, in practice, most label-agreeing
mass).  A long pure-DAG chain is the known pathology of every
label-propagation SCC scheme; the production hardening for such inputs
is a trim phase (peel in/out-degree-0 nodes) + pivot-BFS FW-BW
(Slota et al., "BFS and Coloring-based Parallel Algorithms for
Strongly Connected Components", IPDPS'14) — an extension seam, not a
correctness gap.

Distributed shape: each fixpoint round is one src-keyed equi-join +
one node-keyed min-aggregate (the same shuffles as
``components.connected_components``); the peeling loop never
materializes reachability PAIRS — state stays (node, label) — which is
the difference between this and a transitive-closure SCC at scale.
Convergence probes are scalar aggregates (sum of labels strictly
decreases), lineage cut per round with ``localCheckpoint`` (swap for
reliable ``checkpoint()`` on a cluster).

The reference (a psycopg2 ETL) has no graph surface; §2.I tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _min_label_fixpoint(
    edges: DataFrame, nodes: DataFrame, max_iter: int
) -> DataFrame:
    """(node, lbl): lbl = min id over the node's ancestors along
    ``edges`` (u, v) direction, including itself.

    Pointer jumping is sound for min-ANCESTOR labels exactly as for
    undirected components: lbl(v) is always an ancestor-or-self of v
    (invariant holds at init, under min-of-predecessors updates, and
    under composition — an ancestor of an ancestor is an ancestor), so
    taking least(lbl(v), lbl(lbl(v))) stays within the ancestor set and
    cuts convergence from O(diameter) to O(log diameter) rounds."""
    labels = nodes.withColumn("lbl", F.col("node")).localCheckpoint(eager=True)
    probe = F.sum(F.col("lbl").cast("decimal(38,0)"))
    prev = labels.agg(probe).collect()[0][0]
    for _ in range(max_iter):
        msgs = edges.join(
            labels.withColumnRenamed("node", "u"), "u"
        ).select(F.col("v").alias("node"), "lbl")
        new = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
        )
        jump = new.select(
            F.col("node").alias("lbl"), F.col("lbl").alias("lbl_jump")
        )
        labels = (
            new.join(jump, "lbl", "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("lbl_jump"), F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        cur = labels.agg(probe).collect()[0][0]
        if cur == prev:
            return labels
        prev = cur
    raise RuntimeError(f"min-label fixpoint: no convergence in {max_iter} rounds")


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 25,
    max_iter: int = 50,
) -> DataFrame:
    """(node BIGINT, scc BIGINT) — scc = min node id of the node's
    strongly connected component.  Every node mentioned by any edge is
    assigned; isolated SCCs (no cycle through the node) come out as
    singletons labeled by themselves."""
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    out: DataFrame | None = None
    for _ in range(max_rounds):
        if nodes.limit(1).count() == 0:
            break
        fwd = _min_label_fixpoint(e, nodes, max_iter)
        rev = e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        bwd = _min_label_fixpoint(rev, nodes, max_iter).withColumnRenamed(
            "lbl", "blbl"
        )
        both = fwd.join(bwd, "node")
        resolved = both.where(F.col("lbl") == F.col("blbl")).select(
            "node", F.col("lbl").alias("scc")
        )
        out = (
            resolved
            if out is None
            else out.unionByName(resolved)
        ).localCheckpoint(eager=True)
        nodes = (
            both.where(F.col("lbl") != F.col("blbl"))
            .select("node")
            .localCheckpoint(eager=True)
        )
        e = (
            e.join(nodes.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(nodes.withColumnRenamed("node", "v"), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(
            f"strongly_connected_components: residual graph not empty "
            f"after {max_rounds} peeling rounds"
        )
    return out if out is not None else nodes.select(
        "node", F.col("node").alias("scc")
    )
