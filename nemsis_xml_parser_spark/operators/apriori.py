"""A-priori support pruning for pairwise market-basket mining.

The naive pair expansion self-joins baskets on the basket key: a basket
with B items emits B(B-1)/2 pair rows, so one hot basket (a crawl dump
ordering every part, a bot user touching every item) turns the join
quadratic — the basket-mining twin of the dedup tier's star-skew
problem.  The classic a-priori fix is LOSSLESS for a pair-support
floor s: support(a,b) ≤ min(support(a), support(b)) (anti-monotonicity),
so items below s can be dropped BEFORE pairing without changing any
surviving pair count.  The frequent-item set is aggregate-sized and
broadcasts; the prune is a broadcast semi-join ahead of the self-join,
exactly the shape of a runtime bloom filter.

After the prune, per-basket width is bounded by the number of FREQUENT
items a basket holds — at a real support floor (fractions of a percent
of baskets) that is orders of magnitude below raw basket width, the
same effect the rarest-first prefix gives the set-similarity join.

No counterpart in the reference (a psycopg2 ETL with no mining tier).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def prune_infrequent(
    baskets: DataFrame,
    key_col: str,
    item_col: str,
    minsup: int,
    item_counts: DataFrame | None = None,
) -> DataFrame:
    """Drop items whose basket-level support is below ``minsup``.

    ``baskets``: one row per DISTINCT (key, item).  Returns the same
    shape, restricted to frequent items — the a-priori first pass.
    Pass ``item_counts`` ((item, c) — e.g. the per-item supports the
    rule scoring already aggregates) to reuse that aggregate instead of
    recomputing it here.
    """
    if item_counts is None:
        item_counts = baskets.groupBy(item_col).agg(
            F.count(F.lit(1)).alias("c")
        )
    freq = item_counts.where(F.col("c") >= minsup).select(item_col)
    return baskets.join(F.broadcast(freq), item_col).select(*baskets.columns)


def pair_supports(
    baskets: DataFrame,
    key_col: str,
    item_col: str,
    minsup: int,
    item_counts: DataFrame | None = None,
) -> DataFrame:
    """(a, b, c) pair supports with c >= minsup, a < b — a-priori-pruned.

    One broadcast semi-join prune, one self equi-join on the basket key
    (pair fan-out bounded by frequent-basket width), one (a, b)-keyed
    count with map-side partial aggregation.
    """
    pruned = prune_infrequent(baskets, key_col, item_col, minsup, item_counts)
    a = pruned.select(F.col(key_col).alias("__k"), F.col(item_col).alias("a"))
    b = pruned.select(F.col(key_col).alias("__k"), F.col(item_col).alias("b"))
    return (
        a.join(b, (a["__k"] == b["__k"]) & (F.col("a") < F.col("b")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .where(F.col("c") >= minsup)
    )


def triple_supports(
    baskets: DataFrame,
    key_col: str,
    item_col: str,
    minsup: int,
    item_counts: DataFrame | None = None,
) -> DataFrame:
    """(a, b, c, cnt) frequent triples (a < b < c, cnt >= minsup) via
    two-level a-priori candidate generation — the step beyond pairs
    that FP-growth/a-priori mining actually iterates:

    1. frequent items prune the baskets (broadcast semi-join);
    2. frequent PAIRS (the level-2 pass) become the candidate
       generator: candidate (a, b, c) exists only if (a, b) and (a, c)
       are frequent pairs (b < c join on the shared prefix a) AND
       (b, c) is frequent (the a-priori subset closure — all three
       sub-pairs frequent);
    3. one three-way basket join counts only those candidates.

    The candidate set is bounded by frequent-pair density, never by
    basket-width³; the level-2 prune reuses ``pair_supports``.
    """
    pruned = prune_infrequent(baskets, key_col, item_col, minsup, item_counts)
    pairs = pair_supports(baskets, key_col, item_col, minsup, item_counts)
    ab = pairs.select(F.col("a"), F.col("b"))
    ac = pairs.select(F.col("a"), F.col("b").alias("c"))
    bc = pairs.select(F.col("a").alias("b"), F.col("b").alias("c"))
    cand = (
        ab.join(ac, "a")
        .where(F.col("b") < F.col("c"))
        .join(bc, ["b", "c"])  # subset closure: (b, c) frequent too
        .select("a", "b", "c")
    )
    t1 = pruned.select(F.col(key_col).alias("__k"), F.col(item_col).alias("a"))
    t2 = pruned.select(F.col(key_col).alias("__k"), F.col(item_col).alias("b"))
    t3 = pruned.select(F.col(key_col).alias("__k"), F.col(item_col).alias("c"))
    return (
        cand.join(t1, "a")
        .join(t2, ["__k", "b"])
        .join(t3, ["__k", "c"])
        .groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .where(F.col("cnt") >= minsup)
    )
