"""Dyadic-decomposition quantile structure — MERGEABLE rank/quantile
queries over a bounded integer domain without a global sort.

The structure behind Count-Min-based quantile sketches (Cormode &
Muthukrishnan's dyadic-range trick) and wavelet-tree ranking: keep a
count per dyadic interval ``[b·2^l, (b+1)·2^l)`` for every level
``l = 0..L-1``.  Each value touches exactly L intervals (its value
prefix at each level), so the build is one explode ×L + one hash
aggregate — map-side combinable, order-independent, and MERGEABLE by
plain addition (two datasets' tables sum; a streaming microbatch folds
the same way — the semilattice-template shape of streaming/kmv.py with
``+`` instead of min/max).

A rank-r query then DESCENDS the levels: at each level look up the left
child's count and branch — L keyed lookups against the counts table
replace the global sort.  With exact counts the answer is the exact
r-th smallest value; hanging a Count-Min under each level turns the
same structure into the fixed-space sketch (the point at 100 TB: the
level tables are the only corpus-scale state, and they sum).

Determinism: everything is integer counts and integer bit arithmetic —
the generated SQL oracle replays the build and every descent step
bit-for-bit, and the exact per-rank value rides along as the tie-out.

Reference parity: none — §2.I sketch tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .lineage import cut_lineage


def dyadic_counts(df: DataFrame, value: Column, levels: int) -> DataFrame:
    """(l, bucket, c) — count per dyadic interval, levels 0..levels-1;
    ``value`` must be a non-negative integer column < 2^levels."""
    return (
        df.select(value.cast("long").alias("v"))
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(levels - 1))).alias("l"),
            "v",
        )
        # F.shiftright only takes a literal shift; the SQL form accepts
        # a column expression
        .select("l", F.expr("shiftright(v, l)").alias("bucket"))
        .groupBy("l", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def dyadic_rank_select(
    counts: DataFrame, targets: DataFrame, levels: int
) -> DataFrame:
    """For each (q, target) row in ``targets`` (target = 1-based rank),
    descend the dyadic levels and return (q, target, value) with value =
    the exact target-th smallest.  Each step is one keyed lookup of the
    left child's count against the tiny state frame; all ``levels``
    steps chain into ONE plan (the state is rows-of-targets sized and
    ``counts`` should be lineage-cut by the caller, so the 24-join-deep
    plan stays flat and runs as a single job — 24 per-step checkpoints
    measured ~10x slower in local mode)."""
    state = targets.select(
        "q",
        "target",
        F.lit(0).cast("long").alias("prefix"),
        F.lit(0).cast("long").alias("acc"),
    )
    for l in range(levels - 1, -1, -1):
        left = counts.where(F.col("l") == l).select(
            F.col("bucket").alias("__lb"), F.col("c").alias("__lc")
        )
        take_left = F.col("acc") + F.coalesce(F.col("__lc"), F.lit(0)) >= F.col(
            "target"
        )
        state = state.join(
            F.broadcast(left),
            state["prefix"] * 2 == F.col("__lb"),
            "left",
        ).select(
            "q",
            "target",
            F.when(take_left, state["prefix"] * 2)
            .otherwise(state["prefix"] * 2 + 1)
            .alias("prefix"),
            F.when(take_left, F.col("acc"))
            .otherwise(F.col("acc") + F.coalesce(F.col("__lc"), F.lit(0)))
            .alias("acc"),
        )
    return state.select("q", "target", F.col("prefix").alias("value"))


def dyadic_rank_select_rows(
    count_rows, targets: list[tuple], levels: int
) -> list[tuple]:
    """Driver-side twin of ``dyadic_rank_select`` over the COLLECTED
    counts table — pure integer arithmetic, step-identical to the
    17-join descent (tests/test_dyadic.py parity).

    Sound at any corpus scale because the counts table is bounded by
    the VALUE DOMAIN, not the data: at most ``2^(levels+1)`` rows
    (sum over l of 2^(levels-l) buckets), ~6 MB at levels=17 — the
    "decide with small rows" move (guide §8.4); the only corpus-scale
    work is the one mergeable build aggregate the caller collects.

    ``count_rows``: iterable of (l, bucket, c); ``targets``: list of
    (q, target) with target the 1-based rank.  Returns
    [(q, target, value)] in input order.
    """
    cmap = {(int(r[0]), int(r[1])): int(r[2]) for r in count_rows
            if r[1] is not None}
    out = []
    for q, target in targets:
        prefix, acc = 0, 0
        for l in range(levels - 1, -1, -1):
            lc = cmap.get((l, prefix * 2), 0)
            if acc + lc >= target:  # take_left
                prefix = prefix * 2
            else:
                prefix, acc = prefix * 2 + 1, acc + lc
        out.append((q, target, prefix))
    return out
