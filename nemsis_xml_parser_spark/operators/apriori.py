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
