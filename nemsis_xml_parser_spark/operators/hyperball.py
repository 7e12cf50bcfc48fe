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


def _tier(state: DataFrame, closure: DataFrame, t: int) -> DataFrame:
    """One (hop, n_pairs_exact, anf_estimate, rel_error) row: the sum of
    per-node round-6 HLL ball estimates (DECIMAL-summed, order-free)
    next to the exact closure pair count."""
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
    exact = closure.agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs_exact"))
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
    state = nodes.select(
        "v", (h % 64).alias("j"), hll_rho(h).alias("mj")
    ).transform(cut_lineage)
    closure = nodes.select(
        F.col("v").alias("src"), F.col("v").alias("dst")
    ).transform(cut_lineage)
    tiers = [_tier(state, closure, 0)]
    for t in range(1, max_t + 1):
        prop = adj.join(
            state.withColumnRenamed("v", "u"), "u"
        ).select("v", "j", "mj")
        state = (
            state.unionAll(prop)
            .groupBy("v", "j")
            .agg(F.max("mj").alias("mj"))
            .transform(cut_lineage)
        )
        step = adj.join(
            closure.withColumnRenamed("dst", "u"), "u"
        ).select("src", F.col("v").alias("dst"))
        closure = (
            closure.unionAll(step).distinct().transform(cut_lineage)
        )
        tiers.append(_tier(state, closure, t))
    return reduce(DataFrame.unionByName, tiers)
