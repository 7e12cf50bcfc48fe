"""Parallel FP-growth (PFP) frequent-itemset mining.

The a-priori tier (operators/apriori.py) generates candidates level by
level with one distributed join per level — ideal for shallow mining
(pairs, triples) over narrow baskets.  For WIDE baskets and deeper
itemsets the join-per-level plan re-shuffles the corpus once per level;
FP-growth instead mines each item's CONDITIONAL PATTERN BASE
independently, which distributes as the classic PFP recipe
(Li et al., RecSys'08 — public):

1. **F-list**: one aggregate computes per-item support; items below the
   floor are dropped (lossless by anti-monotonicity, same argument as
   the a-priori prune), survivors get a dense rank by descending
   support.  Aggregate-sized → broadcast.
2. **Group-dependent transactions**: each basket keeps only frequent
   items sorted by F-rank; for the item at position j it emits the
   prefix basket[0..j] to that item's group — after this ONE shuffle,
   every itemset that ends (in F-rank order) at item g can be mined
   entirely inside group g, so groups are independent and no itemset is
   produced twice.
3. **Per-group mining** (Arrow-batched ``applyInPandas``): identical
   prefixes are merged into (path, count) entries — the flat form of
   FP-tree path compression — and the standard conditional-base
   recursion emits every frequent itemset with its exact support.

Scale: the prefix fan-out multiplies rows by frequent-basket width (the
documented PFP cost, bounded after the prune); per-group base size
equals the group item's support, so hot-item groups are the skew axis —
production PFP shards the F-list into G hash groups, which composes
here by mapping ``grp`` through ``pmod(hash(item), G)`` before the
group-by (each shard then mines its items' bases sequentially).

No counterpart in the reference (psycopg2 ETL, no mining tier).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_OUT_SCHEMA = "items array<bigint>, support bigint"


def _mine_base(
    base: dict[tuple, int], minsup: int, suffix: tuple, max_len: int | None, out: list
) -> None:
    """Conditional-pattern-base recursion (paths already in F-rank order)."""
    counts: dict = {}
    for path, c in base.items():
        for it in path:
            counts[it] = counts.get(it, 0) + c
    for it, s in counts.items():
        if s < minsup:
            continue
        itemset = (it,) + suffix
        out.append((itemset, s))
        if max_len is not None and len(itemset) >= max_len:
            continue
        sub_base: dict = {}
        for path, c in base.items():
            if it in path:
                sub = path[: path.index(it)]
                if sub:
                    sub_base[sub] = sub_base.get(sub, 0) + c
        if sub_base:
            _mine_base(sub_base, minsup, itemset, max_len, out)


def fpgrowth_itemsets(
    baskets: DataFrame,
    key_col: str,
    item_col: str,
    minsup: int,
    max_len: int | None = None,
    n_groups: int | None = None,
) -> DataFrame:
    """All frequent itemsets (support >= ``minsup``) over distinct
    (key, item) baskets; ``max_len`` bounds itemset size (None = all).

    ``n_groups``: the PFP F-list shard count — items hash into
    ``n_groups`` buckets and each bucket's conditional bases are mined
    sequentially inside ONE Arrow batch.  This is the production
    setting: it bounds task count, amortizes the per-group Python/Arrow
    overhead across items, and is the skew lever (a hot item shares its
    task only with its hash-mates).  ``None`` = one group per item
    (fine for small item vocabularies).  Identical output either way.

    Returns (items array<bigint> ascending, support bigint).
    """
    distinct = baskets.select(
        F.col(key_col).alias("__k"), F.col(item_col).cast("bigint").alias("__it")
    ).distinct()
    flist = (
        distinct.groupBy("__it")
        .agg(F.count(F.lit(1)).alias("sup"))
        .where(F.col("sup") >= minsup)
    )
    ranked = distinct.join(F.broadcast(flist), "__it")
    # F-rank order = (support desc, item asc), realized by sorting
    # (-sup, item) structs per basket — no global rank window needed.
    txns = ranked.groupBy("__k").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct((-F.col("sup")).alias("nsup"), "__it"))),
            lambda s: s["__it"],
        ).alias("arr")
    )
    prefixes = txns.select(
        F.posexplode("arr").alias("pos", "grp"), F.col("arr")
    ).select("grp", F.slice("arr", 1, F.col("pos") + 1).alias("prefix"))

    def mine_item(g: int, prefs, out: list) -> None:
        base: dict = {}
        total = 0
        for pref in prefs:
            path = tuple(int(x) for x in pref[:-1])  # strip trailing g
            total += 1
            if path:
                base[path] = base.get(path, 0) + 1
        if total >= minsup:
            out.append(((g,), total))
            if (max_len is None or max_len > 1) and base:
                _mine_base(base, minsup, (g,), max_len, out)

    def mine(pdf: pd.DataFrame) -> pd.DataFrame:
        out: list = []
        if not pdf.empty:
            for g, sub in pdf.groupby("grp")["prefix"]:
                mine_item(int(g), sub, out)
        return pd.DataFrame(
            {
                "items": [sorted(s) for s, _ in out],
                "support": [c for _, c in out],
            }
        )

    if n_groups is not None:
        prefixes = prefixes.withColumn(
            "shard", F.pmod(F.xxhash64("grp"), F.lit(n_groups))
        )
        return prefixes.groupBy("shard").applyInPandas(
            lambda pdf: mine(pdf), _OUT_SCHEMA
        )
    return prefixes.groupBy("grp").applyInPandas(mine, _OUT_SCHEMA)
