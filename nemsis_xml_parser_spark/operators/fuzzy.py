"""Fuzzy string matching (entity resolution) via deletion-neighborhood
blocking — the FastSS scheme (Bocek et al., "Fast Similarity Search in
Large Dictionaries", 2007).

The naive edit-distance join is O(n²) string comparisons.  FastSS makes
it an equi-join: two strings within edit distance 1 necessarily share a
key in {s} ∪ {s with one char deleted} (substitution: delete the
differing position from both; insertion/deletion: delete the inserted
char).  So:

1. explode each string into its ≤ len+1 deletion variants (map-side,
   codegen string ops);
2. self-equi-join on the variant key — shuffles only (id, key) pairs,
   candidates concentrate in shared buckets;
3. verify candidates with exact ``levenshtein`` — a tiny fraction of
   the n² pairs.

This is the same candidates-then-verify ladder as MinHash-LSH dedup
(operators/dedup.py), applied to identifier-level entity resolution
(customer/supplier name reconciliation — the reference's warehouse has
no fuzzy layer at all; PostgreSQL users reach for fuzzystrmatch).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _deletion_keys(col: F.Column) -> F.Column:
    """ARRAY<STRING>: the string plus every single-char deletion."""
    return F.array_union(
        F.array(col),
        F.transform(
            F.sequence(F.lit(1), F.length(col)),
            lambda i: F.concat(
                F.substr(col, F.lit(1), i - 1),
                F.substr(col, i + 1, F.length(col)),
            ),
        ),
    )


def fuzzy_pairs(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "name",
    max_dist: int = 1,
) -> DataFrame:
    """(id_a, id_b, name_a, name_b, dist) for pairs within edit distance
    ``max_dist`` (candidate recall is exact for max_dist=1; for larger
    distances apply the k-deletion generalization).
    """
    if max_dist != 1:
        raise NotImplementedError(
            f"max_dist={max_dist} requested, but only the k=1 deletion "
            "neighborhood is implemented — generalize _deletion_keys to "
            "k-deletion variants for larger distances"
        )
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("name"))
    keys = base.select(
        "id", "name", F.explode(_deletion_keys(F.col("name"))).alias("key")
    )
    a = keys.alias("a")
    b = keys.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.key") == F.col("b.key")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
        )
        .distinct()
    )
    return cand.withColumn(
        "dist", F.levenshtein("name_a", "name_b")
    ).where(F.col("dist") <= max_dist)
