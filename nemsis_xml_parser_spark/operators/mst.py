"""Borůvka minimum spanning forest — bulk-parallel MST by per-component
minimum-edge contraction.

Borůvka (1926; the algorithm behind every distributed MST — MapReduce
MST of Lattanzi et al. "Filtering: a method for solving graph problems
in MapReduce", GraphX's MST recipes) is the naturally data-parallel MST:
each round EVERY component picks its minimum-weight outgoing edge (one
hash aggregate), the picked edges merge components (pointer jumping on
a functional graph), and the component count at least halves — so
``rounds`` = log2(n) completes the forest, and a FIXED smaller round
count yields the replayable partial forest (the ktruss/kmeans
fixed-iteration convention here).

Correctness hinges on a TOTAL edge order: ties in weight are broken by
(w, u, v), making the MST unique and both engines' picks identical.
With a total order the per-round pointer graph (component -> component
at the other end of its min edge) has only 2-cycles — a length>=3 cycle
would contain a non-minimal edge picked over a smaller incident one —
so cycle breaking is local (the smaller label of a mutual pair roots),
and chains resolve by pointer-jump doubling, O(log chain) rounds.

Distributed shape per round: two node-keyed equi-joins stamp component
labels onto edges, one (component)-keyed hash aggregate picks minima
(map-side combine reduces each partition to <= |components| rows), and
the contraction state is one (component, parent) row per component —
never an adjacency materialization.  Lineage is cut per round with
``lineage.cut_lineage`` (eager localCheckpoint + stats reset — see
that module for the Spark 4 BigInt-stats pathology this sidesteps;
reliable checkpoint on a real cluster).

Reference parity: the reference (psycopg2 ETL) has no graph surface;
§2.I extension tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .lineage import cut_lineage


def _resolve_roots(ptr: DataFrame, max_jump: int = 25) -> DataFrame:
    """(c, root) for every component in ``ptr`` (c -> oc, its min-edge
    neighbor).  Breaks the 2-cycles (mutual pairs root at the smaller
    label), then pointer-jumps to the chain root by doubling."""
    q = ptr.select(F.col("c").alias("qc"), F.col("oc").alias("qoc"))
    par = (
        ptr.join(q, ptr["oc"] == q["qc"], "left")
        .select(
            "c",
            F.when(
                F.col("qoc") == F.col("c"), F.least(F.col("c"), F.col("oc"))
            )
            .otherwise(F.col("oc"))
            .alias("par"),
        )
        .transform(cut_lineage)
    )
    for _ in range(max_jump):
        b = par.select(F.col("c").alias("bc"), F.col("par").alias("bpar"))
        jumped = (
            par.join(b, par["par"] == b["bc"], "left")
            .select(
                "c", F.coalesce(F.col("bpar"), F.col("par")).alias("par")
            )
            .transform(cut_lineage)
        )
        changed = (
            jumped.join(
                par.withColumnRenamed("par", "old"), "c"
            )
            .where(F.col("par") != F.col("old"))
            .limit(1)
            .count()
        )
        par = jumped
        if changed == 0:
            return par.withColumnRenamed("par", "root")
    raise RuntimeError(f"pointer jumping did not converge in {max_jump} rounds")


def boruvka_forest(
    edges: DataFrame, rounds: int
) -> tuple[DataFrame, DataFrame]:
    """Run ``rounds`` Borůvka rounds over ``edges`` (u, v, w — canonical
    u < v, one row per undirected edge; (w, u, v) must be unique, which
    canonical pairs guarantee).

    Returns (picked, comp): ``picked`` — forest edges (round, u, v, w),
    every edge tagged with the round that contracted it; ``comp`` —
    final (node, c) component labels.  With rounds >= log2(n) the picked
    set IS the minimum spanning forest (unique under the total order);
    fewer rounds give the replayable partial forest.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    e = (
        edges.select("u", "v", "w")
        .where(F.col("u") < F.col("v"))
        .transform(cut_lineage)
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
    )
    comp = nodes.select(
        "node", F.col("node").alias("c")
    ).transform(cut_lineage)
    picked = None
    for r in range(1, rounds + 1):
        cu = comp.select(F.col("node").alias("u"), F.col("c").alias("cu"))
        cv = comp.select(F.col("node").alias("v"), F.col("c").alias("cv"))
        ce = (
            e.join(cu, "u")
            .join(cv, "v")
            .where(F.col("cu") != F.col("cv"))
        )
        if ce.limit(1).count() == 0:
            break
        both = ce.select(
            F.col("cu").alias("c"), "w", "u", "v", F.col("cv").alias("oc")
        ).unionByName(
            ce.select(
                F.col("cv").alias("c"), "w", "u", "v", F.col("cu").alias("oc")
            )
        )
        pick = (
            both.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("c").orderBy("w", "u", "v")
                ),
            )
            .where(F.col("rn") == 1)
            .select("c", "oc", "u", "v", "w")
            .transform(cut_lineage)
        )
        new_edges = pick.select("u", "v", "w").distinct().withColumn(
            "round", F.lit(r)
        )
        picked = (
            new_edges
            if picked is None
            else picked.unionByName(new_edges)
        ).transform(cut_lineage)
        roots = _resolve_roots(pick.select("c", "oc"))
        comp = (
            comp.join(
                roots.withColumnRenamed("c", "c_old"),
                comp["c"] == F.col("c_old"),
                "left",
            )
            .select(
                "node", F.coalesce(F.col("root"), F.col("c")).alias("c")
            )
            .transform(cut_lineage)
        )
    if picked is None:
        picked = e.limit(0).withColumn("round", F.lit(0)).select(
            "round", "u", "v", "w"
        )
    return picked.select("round", "u", "v", "w"), comp
