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
from pyspark.sql import DataFrame, Observation

from .lineage import cut_lineage


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
    e = e.transform(cut_lineage)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # fold the out-degree onto the edge list ONCE — the former loop
    # re-joined deg every iteration (guide §2.1: remove the repeated
    # shuffle outright; one extra edge-sized materialization up front
    # buys iters× fewer joins)
    ed = e.join(deg, "src").select("src", "dst", "deg").transform(cut_lineage)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # the rank state carries is_sink so the per-iteration dangling mass
    # is a NARROW aggregate over the state itself — the former loop paid
    # an anti-join against deg every iteration.  The node count rides
    # the state's materialization via observe (no dedicated count job).
    obs0 = Observation()
    state = (
        nodes.join(deg, nodes["node"] == deg["src"], "left")
        .select("node", F.col("deg").isNull().alias("is_sink"))
        .observe(obs0, F.count(F.lit(1)).alias("n"))
        .transform(cut_lineage)
    )
    n_nodes = obs0.get["n"]
    base = (1.0 - damping) / n_nodes

    pr = state.withColumn("pr", F.lit(1.0 / n_nodes))
    for _ in range(iters):
        contrib = ed.join(pr, ed["src"] == pr["node"]).select(
            "dst",
            F.round(F.col("pr") / F.col("deg"), 12)
            .cast("decimal(20,12)")
            .alias("c"),
        )
        # dangling mass: rank held by sink nodes (no out-edges); a 1-row
        # aggregate broadcast back in — no driver collect per iteration
        dangling = pr.where(F.col("is_sink")).agg(
            F.coalesce(F.sum(F.col("pr").cast("decimal(20,12)")), F.lit(0))
            .cast("double")
            .alias("dm")
        )
        pr = (
            pr.select("node", "is_sink")
            .join(
                contrib.groupBy("dst").agg(F.sum("c").alias("s")),
                pr["node"] == contrib["dst"],
                "left",
            )
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "is_sink",
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
            .transform(cut_lineage)
        )
    return pr.join(deg, pr["node"] == deg["src"], "left").select(
        "node",
        F.coalesce(F.col("deg"), F.lit(0)).alias("degree"),
        "pr",
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """Personalized PageRank: teleport (and dangling mass) goes to the
    SEED set uniformly instead of all nodes — rank measures proximity
    to the seeds (topic-sensitive ranking / related-item discovery).

    -> DataFrame(node, degree, is_seed, ppr).  Same determinism
    contract as ``pagerank``: decimal-staged contribution sums,
    per-iteration 12-dp rounding, so an unrolled SQL oracle replays it
    exactly.  Scale shape identical: one dst-keyed aggregate per
    iteration, seed flags ride the (node)-sized rank vector.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = e.transform(cut_lineage)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # same shuffle removals as ``pagerank``: degree folded onto the edge
    # list once, is_sink folded into the state, scalars via observe
    ed = e.join(deg, "src").select("src", "dst", "deg").transform(cut_lineage)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    sd = seeds.select(F.col(seed_col).alias("node")).distinct()
    obs0 = Observation()
    nodes_s = (
        nodes.join(sd.withColumn("_s", F.lit(1)), "node", "left")
        .join(deg, nodes["node"] == deg["src"], "left")
        .select(
            "node",
            F.coalesce(F.col("_s"), F.lit(0)).alias("is_seed"),
            F.col("deg").isNull().alias("is_sink"),
        )
        .observe(obs0, F.sum("is_seed").alias("ns"))
        .transform(cut_lineage)
    )
    n_seeds = obs0.get["ns"]  # rides the checkpoint job, no driver collect
    if not n_seeds:
        raise ValueError("no seed intersects the graph's node set")

    seed_mass = F.col("is_seed").cast("double") / F.lit(float(n_seeds))
    pr = nodes_s.withColumn("pr", F.round(seed_mass, 12))
    for _ in range(iters):
        contrib = ed.join(pr, ed["src"] == pr["node"]).select(
            "dst",
            F.round(F.col("pr") / F.col("deg"), 12)
            .cast("decimal(20,12)")
            .alias("c"),
        )
        dangling = pr.where(F.col("is_sink")).agg(
            F.coalesce(F.sum(F.col("pr").cast("decimal(20,12)")), F.lit(0))
            .cast("double")
            .alias("dm")
        )
        pr = (
            pr.select("node", "is_seed", "is_sink")
            .join(
                contrib.groupBy("dst").agg(F.sum("c").alias("s")),
                pr["node"] == contrib["dst"],
                "left",
            )
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "is_seed",
                "is_sink",
                F.round(
                    F.lit(1.0 - damping) * seed_mass
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                        + F.col("dm") * seed_mass
                    ),
                    12,
                ).alias("pr"),
            )
            .transform(cut_lineage)
        )
    return pr.join(deg, pr["node"] == deg["src"], "left").select(
        "node",
        F.coalesce(F.col("deg"), F.lit(0)).alias("degree"),
        "is_seed",
        "pr",
    )
