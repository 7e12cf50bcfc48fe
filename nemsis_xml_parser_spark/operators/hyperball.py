"""HyperBall / ANF — the neighborhood function N(t) = Σ_v |ball(v, t)|
estimated with per-node HyperLogLog sketches (Palmer et al., "ANF: A
Fast and Scalable Tool for Data Mining in Massive Graphs", KDD'02;
Boldi/Rosa/Vigna, "HyperANF: Approximating the Neighbourhood Function
of Very Large Graphs on a Budget", WWW'11).

Exact N(t) needs the t-step transitive closure — pairs-sized, O(n²)
in the worst case, the thing that cannot exist at 100 TB.  HyperBall
replaces each node's reachable SET with a 64-register HLL sketch and
replaces set union with register-wise MAX, which is associative,
commutative, and idempotent — so one iteration is ONE equi-join of the
edge list against the sparse (v, j, mj) register state plus ONE
(v, j)-keyed max-aggregate (map-side combinable, state ≤ 64 small ints
per node regardless of ball size).  t iterations give N(0..t), the
curve behind effective-diameter and centrality estimates.

Both per-round states — the sketch registers and the exact-closure
tie-out tier — propagate with the SAME shape (join the adjacency on
the current node, re-aggregate by key with an idempotent fold), so
they ride ONE tagged union frame: kind 0 rows are (v, j, mj) registers
(fold = MAX), kind 1 rows are (dst, src) closure pairs (fold =
DISTINCT, i.e. MAX over an all-NULL payload).  That halves both the
per-round shuffles and the per-round lineage-cut jobs relative to
maintaining the two states separately (guide §2.4: two operations
keyed the same way share one exchange; §1.2: the job ladder is the
wall in an iterative operator).

Determinism: registers come from the cross-engine md5 hash with the
exact integer rho of ``operators/hll.py``, and the estimate is the
same DECIMAL-staged harmonic form — every register value and every
per-node estimate replays bit-for-bit in the DuckDB oracle.  The exact
closure rides along as the accuracy tie-out on the demo-capped graph
(cap documented at the call site; at scale you run ONLY the sketch).

Reference parity: none — §2.I graph/sketch extension tier.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.hashing import md5_long
from .hll import HLL_NUM_TERM, hll_est_expr, hll_rho
from .lineage import cut_lineage


def _tier(comb: DataFrame, t: int) -> DataFrame:
    """One (hop, n_pairs_exact, anf_estimate, rel_error) row: the sum of
    per-node round-6 HLL ball estimates (DECIMAL-summed, order-free)
    next to the exact closure pair count.  ``comb`` is the tagged union
    state: kind 0 = (x=v, y=j, m=mj), kind 1 = (x=dst, y=src)."""
    state = comb.where(F.col("kind") == 0).select(
        F.col("x").alias("v"), F.col("m").cast("int").alias("mj")
    )
    per = state.groupBy("v").agg(
        F.sum(F.expr(HLL_NUM_TERM)).alias("num_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    tot = per.select(
        F.round(
            hll_est_expr(F.col("num_present"), F.col("n_present")), 6
        ).alias("e")
    ).agg(
        F.round(
            F.sum(F.col("e").cast("decimal(28,6)")).cast("double"), 6
        ).alias("anf_estimate")
    )
    exact = (
        comb.where(F.col("kind") == 1)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs_exact"))
    )
    return tot.crossJoin(F.broadcast(exact)).select(
        F.lit(t).cast("int").alias("hop"),
        "n_pairs_exact",
        "anf_estimate",
        F.round(
            F.abs(
                F.col("anf_estimate") - F.col("n_pairs_exact").cast("double")
            )
            / F.col("n_pairs_exact").cast("double"),
            6,
        ).alias("rel_error"),
    )


def hyperball_anf(adj: DataFrame, max_t: int = 3) -> DataFrame:
    """Run ``max_t`` HyperBall iterations over a symmetric (u, v) edge
    list.  Returns one row per hop t in 0..max_t: the estimated
    neighborhood function next to the exact t-step closure pair count
    (the tie-out tier — drop the closure for production-scale graphs).
    """
    nodes = adj.select(F.col("u").alias("v")).distinct()
    h = md5_long(F.col("v").cast("string"))
    # tagged union state: sketch registers (kind 0, fold = MAX) and the
    # exact-closure pairs (kind 1, payload NULL, fold = DISTINCT) share
    # one frame, one per-round shuffle, one per-round lineage cut.
    comb = cut_lineage(
        nodes.select(
            F.lit(0).alias("kind"),
            F.col("v").alias("x"),
            (h % 64).alias("y"),
            hll_rho(h).cast("long").alias("m"),
        ).unionByName(
            nodes.select(
                F.lit(1).alias("kind"),
                F.col("v").alias("x"),
                F.col("v").alias("y"),
                F.lit(None).cast("long").alias("m"),
            )
        )
    )
    tiers = [_tier(comb, 0)]
    for t in range(1, max_t + 1):
        # state rows propagate v -> neighbors; closure rows propagate
        # dst -> neighbors (src rides in y) — the SAME join on x == u.
        prop = adj.join(comb.withColumnRenamed("x", "u"), "u").select(
            "kind", F.col("v").alias("x"), "y", "m"
        )
        comb = cut_lineage(
            comb.unionByName(prop)
            .groupBy("kind", "x", "y")
            .agg(F.max("m").alias("m"))
        )
        tiers.append(_tier(comb, t))
    return reduce(DataFrame.unionByName, tiers)
