"""Greedy facility-location exemplar selection — the submodular
coreset/curation primitive (Nemhauser et al. '78 greedy; the CRAIG /
exemplar-selection shape in training-data pipelines): pick ``k``
documents whose summed best-coverage of the WHOLE corpus is maximal,

    f(S) = sum_i max_{j in S} s(i, j),

where ``s`` is the (non-negative-clamped) cosine between embeddings.
Greedy is (1 - 1/e)-optimal for monotone submodular f — the standard
guarantee that makes this the default subset-selection primitive.

Scale shape (reworked in the r14 optimization round, guide §2.4 "remove
shuffles outright"): the per-step state is ONE corpus-sized frame

    (i, cs ARRAY<STRUCT<j, s>>, cur, picked ARRAY<BIGINT>)

holding, per universe row, its similarity row of the bounded candidate
pool, its current best coverage, and the picked set:

* the (universe x candidates) similarities are computed ONCE with the
  bounded candidate side BROADCAST (a justified BNLJ — C is the
  candidate-pool size, not the corpus) and grouped into the array
  column — the only corpus-sized shuffle in the whole operator;
* each greedy step is one NARROW pass: explode the unpicked slots,
  partial-aggregate per-candidate marginal gains map-side (C rows per
  partition cross the wire — never the corpus), TakeOrdered the argmax,
  and broadcast the 1-row winner back into the state update.  The old
  shape re-joined a corpus-sized ``cur`` vector against the
  (corpus x C) similarity frame every step — 2 corpus-sized exchanges
  per pick that simply do not exist now (the join key is the frame's
  own row);
* coverage needs no per-step corpus aggregate: gain_t is exactly
  f(S_t) - f(S_{t-1}) and every quantity is an exact DECIMAL(18,6)-grid
  sum, so the cumulative coverage is the running sum of the k picked
  gains — a k-row window at the end, not k corpus scans;
* all similarities and gains stay DECIMAL on the ROUND-6 grid, so sums
  are exact and order-independent and the greedy path is
  engine-deterministic (ties broken by candidate id) — the DuckDB
  oracle (per-pick unrolled CTEs, SUM(cur) coverage) is unchanged and
  still matches cell-for-cell.

State is lineage-cut per step (k bounded) so step t never re-executes
steps 1..t-1; no driver collect anywhere.

Reference parity: none — §2.I curation tier (the reference is a
psycopg2 ETL with no selection operators).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

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
    pair = u.crossJoin(F.broadcast(c)).select(
        "i",
        "j",
        F.greatest(
            F.round(V.cosine_similarity(F.col("uv"), F.col("cv")), 6),
            F.lit(0.0),
        )
        .cast("decimal(18,6)")
        .alias("s"),
    )
    state = cut_lineage(
        pair.groupBy("i")
        .agg(F.array_sort(F.collect_list(F.struct("j", "s"))).alias("cs"))
        .select(
            "i",
            "cs",
            F.expr(DEC0).alias("cur"),
            F.expr("CAST(array() AS ARRAY<BIGINT>)").alias("picked"),
        )
    )
    top_frames = []
    for t in range(1, k + 1):
        # marginal gains: narrow explode of the unpicked candidate slots
        # + map-side-combinable SUM — C rows per partition shuffle, the
        # corpus never moves
        gains = (
            state.select(
                F.explode(
                    F.expr("filter(cs, e -> NOT array_contains(picked, e.j))")
                ).alias("e"),
                "cur",
            )
            .groupBy(F.col("e.j").alias("j"))
            .agg(
                F.sum(
                    F.greatest(F.col("e.s") - F.col("cur"), F.expr(DEC0))
                ).alias("gain")
            )
        )
        top = gains.orderBy(F.col("gain").desc(), F.col("j").asc()).limit(1)
        top_frames.append(
            top.select(
                F.lit(t).cast("int").alias("pick"),
                F.col("j").alias("vec_id"),
                F.col("gain"),
            )
        )
        if t == k:
            break
        state = cut_lineage(
            state.crossJoin(
                F.broadcast(top.select(F.col("j").alias("jstar")))
            ).select(
                "i",
                "cs",
                F.greatest(
                    F.col("cur"),
                    F.coalesce(
                        F.expr("filter(cs, e -> e.j = jstar)[0].s"),
                        F.expr(DEC0),
                    ),
                ).alias("cur"),
                F.expr("array_union(picked, array(jstar))").alias("picked"),
            )
        )
    out = top_frames[0]
    for f in top_frames[1:]:
        out = out.unionByName(f)
    # coverage = running sum of exact-decimal gains (gain_t is exactly
    # f(S_t) - f(S_{t-1}) on the 6-dp grid) — a k-row window, bounded by
    # the pick count, never by corpus size
    w = Window.orderBy("pick").rowsBetween(Window.unboundedPreceding, 0)
    return out.select(
        "pick",
        "vec_id",
        F.round(F.col("gain").cast("double"), 6).alias("gain"),
        F.round(F.sum("gain").over(w).cast("double"), 6).alias("coverage"),
    )
