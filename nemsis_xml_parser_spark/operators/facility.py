"""Greedy facility-location exemplar selection — the submodular
coreset/curation primitive (Nemhauser et al. '78 greedy; the CRAIG /
exemplar-selection shape in training-data pipelines): pick ``k``
documents whose summed best-coverage of the WHOLE corpus is maximal,

    f(S) = sum_i max_{j in S} s(i, j),

where ``s`` is the (non-negative-clamped) cosine between embeddings.
Greedy is (1 - 1/e)-optimal for monotone submodular f — the standard
guarantee that makes this the default subset-selection primitive.

Scale shape: unlike the MMR rerank (candidate-local by design), every
greedy step here is a DISTRIBUTED aggregate over the corpus:

* the (universe x candidates) similarity frame is built ONCE with the
  bounded candidate side BROADCAST (a justified BNLJ — C is the
  candidate-pool size, not the corpus) and materialized;
* each step joins the corpus-sized coverage vector ``cur`` on the
  universe id — an equi-join on the frame's own key — and computes
  per-candidate marginal gains with one map-side-combinable SUM;
* the argmax is a ``TakeOrdered`` over C candidate rows (never a
  global window), and the winner rides back as a BROADCAST 1-row
  frame — no driver collect anywhere;
* all similarities and gains are DECIMAL(18,6) on a ROUND-6 grid, so
  sums are exact and order-independent and the greedy path is
  engine-deterministic (ties broken by candidate id).

``cur`` and the picked set are lineage-cut per step (k bounded) so
step t never re-executes steps 1..t-1.

Reference parity: none — §2.I curation tier (the reference is a
psycopg2 ETL with no selection operators).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions import vectors as V
from .lineage import cut_lineage

DEC0 = "CAST(0 AS DECIMAL(18,6))"


def facility_location_greedy(
    universe: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(pick, vec_id, gain, coverage) — the ``k`` greedy facility-location
    picks in selection order, each with its exact marginal gain and the
    cumulative coverage f(S) after the pick (both DOUBLE, from exact
    DECIMAL sums)."""
    u = universe.select(
        F.col(id_col).alias("i"),
        V.to_double_array(F.col(vec_col)).alias("uv"),
    )
    c = candidates.select(
        F.col(id_col).alias("j"),
        V.to_double_array(F.col(vec_col)).alias("cv"),
    )
    sims = cut_lineage(
        u.crossJoin(F.broadcast(c)).select(
            "i",
            "j",
            F.greatest(
                F.round(
                    V.cosine_similarity(F.col("uv"), F.col("cv")), 6
                ),
                F.lit(0.0),
            )
            .cast("decimal(18,6)")
            .alias("s"),
        )
    )
    cur = u.select("i", F.expr(DEC0).alias("cur"))
    picked = None
    out_frames = []
    for t in range(1, k + 1):
        gains = sims.join(cur, "i")
        if picked is not None:
            gains = gains.join(F.broadcast(picked), "j", "left_anti")
        gains = gains.groupBy("j").agg(
            F.sum(
                F.greatest(F.col("s") - F.col("cur"), F.expr(DEC0))
            ).alias("gain")
        )
        top = cut_lineage(
            gains.orderBy(F.col("gain").desc(), F.col("j").asc()).limit(1)
        )
        sel = sims.join(F.broadcast(top.select("j")), "j").select(
            "i", F.col("s").alias("snew")
        )
        cur = cut_lineage(
            cur.join(sel, "i", "left").select(
                "i",
                F.greatest(
                    F.col("cur"), F.coalesce(F.col("snew"), F.expr(DEC0))
                ).alias("cur"),
            )
        )
        cov = cur.agg(F.sum("cur").alias("coverage"))
        out_frames.append(
            top.crossJoin(F.broadcast(cov)).select(
                F.lit(t).cast("int").alias("pick"),
                F.col("j").alias("vec_id"),
                F.round(F.col("gain").cast("double"), 6).alias("gain"),
                F.round(F.col("coverage").cast("double"), 6).alias("coverage"),
            )
        )
        new_pick = top.select("j")
        picked = (
            new_pick
            if picked is None
            else cut_lineage(picked.unionByName(new_pick))
        )
    out = out_frames[0]
    for f in out_frames[1:]:
        out = out.unionByName(f)
    return out
