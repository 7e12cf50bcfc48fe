"""SemDeDup-style semantic deduplication over an embedding column —
cluster, rank by centroid distance, prune near-duplicates within a
bounded rank band.

SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication") clusters the corpus in
embedding space and removes, within each cluster, all but one member of
every high-cosine group, keeping the member closest to the centroid.
The paper's within-cluster step is all-pairs; at 100 TB that is only
tractable because k grows with the corpus so clusters stay small.  This
operator keeps the fixed-k broadcast assignment (one corpus scan
against k seed centroids — the ``operators/ivf.py`` coarse-quantizer
shape) and replaces the within-cluster quadratic with a RANK-BAND
candidate generator: members are ranked by (distance-to-centroid, id)
inside their cell, and each member is compared only to the ``band``
members ranked immediately after it.

Why that is the scalable formulation: candidates are exactly
N x band rows (explode of rank offsets -> equi-join on (cell, rank) —
never an inequality join that Catalyst would expand to the within-cell
cross product), every stage is linear in the corpus for fixed (k,
band), and the approximation is principled: exact duplicates have
IDENTICAL distance-to-centroid, so they occupy adjacent ranks and are
always caught (for any band >= the duplicate-group size); near-dups
have near-equal distances (||a-c||-||b-c|| <= ||a-b|| by the triangle
inequality), so high-cosine pairs concentrate in nearby ranks — the
same bounded-recall trade MinHash-LSH makes for Jaccard.

Survivor rule (the paper's): within a duplicate pair the member closer
to the centroid (lower rank; ties by id) is kept, the other removed.

Determinism: distances use the round-12/DECIMAL(38,12)/round-6
discipline of ``operators/kmeans.py``; cosines use the
dot/(sqrt·sqrt) order of ``operators/similarity.py`` — both replay
bit-for-bit in a generated SQL oracle.

Reference parity: the reference (psycopg2 ETL,
/root/reference/main_ingest.py) has no similarity tier; §2.I
LLM-curation extension.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions import vectors as V
from .kmeans import _d2_col


def semantic_dedup_pairs(
    df: DataFrame,
    k: int,
    band: int,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Near-duplicate pairs (cell, id_a, id_b, rnk_a, rnk_b, cosine)
    with cosine >= threshold, id_a ranked closer to the cell centroid
    (the survivor) and id_b within ``band`` ranks after it (the
    removal candidate).  Seeds are the vectors of the k smallest ids
    (the deterministic iters=0 convention of ``operators/ivf.py`` /
    ``operators/kmeans.py``)."""
    base = df.select(
        F.col(id_col).alias("_id"),
        V.to_double_array(F.col(vec_col)).alias("x"),
    )
    assigned = semantic_dedup_members(df, k, vec_col, id_col)
    ranked = assigned.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("c").orderBy(F.col("d2").asc(), F.col("_id").asc())
        ),
    )
    # band candidates: explode the next `band` rank slots and equi-join
    # back on (cell, rank) — exactly N*band rows, no within-cell cross
    # product for Catalyst to fall into
    left = ranked.select(
        "c",
        F.col("_id").alias("id_a"),
        F.col("rnk").alias("rnk_a"),
        F.explode(
            F.sequence(F.col("rnk") + 1, F.col("rnk") + band)
        ).alias("rnk_b"),
    )
    right = ranked.select(
        "c", F.col("_id").alias("id_b"), F.col("rnk").alias("rnk_b")
    )
    cand = left.join(right, ["c", "rnk_b"])
    # exact cosine on the candidate set only: join the (hoisted-norm)
    # vector frame back by each side's id
    ev = base.withColumn("nrm", V.norm(F.col("x")))
    ea = ev.select(
        F.col("_id").alias("id_a"), F.col("x").alias("xa"), F.col("nrm").alias("na")
    )
    eb = ev.select(
        F.col("_id").alias("id_b"), F.col("x").alias("xb"), F.col("nrm").alias("nb")
    )
    denom = F.col("na") * F.col("nb")
    cos = F.when(denom > 0, V.dot(F.col("xa"), F.col("xb")) / denom).otherwise(
        F.lit(0.0)
    )
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .withColumn("cosine", F.round(cos, 6))
        .where(F.col("cosine") >= threshold)
        .select("c", "id_a", "id_b", "rnk_a", "rnk_b", "cosine")
    )


def semantic_dedup_summary(
    df: DataFrame,
    k: int,
    band: int,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-cell curation summary: members, duplicate pairs found in the
    rank band, members removed (the paper's keep-closest-to-centroid
    rule → removed = distinct id_b), and the round-6 cosine mass of the
    found pairs (DECIMAL-summed, order-independent)."""
    pairs = semantic_dedup_pairs(df, k, band, threshold, vec_col, id_col)
    # recompute membership for the count (same assignment plan)
    members = semantic_dedup_members(df, k, vec_col, id_col)
    per_cell = members.groupBy("c").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    agg = pairs.groupBy("c").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_pairs"),
        F.countDistinct("id_b").cast("bigint").alias("n_removed"),
        F.sum(F.col("cosine").cast("decimal(18,6)"))
        .cast("double")
        .alias("cos_mass"),
        F.max("cosine").alias("max_cosine"),
    )
    return (
        per_cell.join(agg, "c", "left")
        .select(
            F.col("c").cast("int").alias("cell"),
            "n_members",
            F.coalesce("n_dup_pairs", F.lit(0)).cast("bigint").alias(
                "n_dup_pairs"
            ),
            F.coalesce("n_removed", F.lit(0)).cast("bigint").alias("n_removed"),
            F.round(F.coalesce("cos_mass", F.lit(0.0)), 6).alias("cos_mass"),
            F.round(F.coalesce("max_cosine", F.lit(0.0)), 6).alias(
                "max_cosine"
            ),
        )
    )


def semantic_dedup_members(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Cell assignment only — (id, c, d2) against the k seed centroids."""
    base = df.select(
        F.col(id_col).alias("_id"),
        V.to_double_array(F.col(vec_col)).alias("x"),
    )
    wk = Window.orderBy("_id")
    seeds = (
        base.orderBy("_id")
        .limit(k)
        .select((F.row_number().over(wk) - 1).alias("c"), F.col("x").alias("cv"))
    )
    scored = base.crossJoin(F.broadcast(seeds)).select(
        "_id", "c", _d2_col("x", "cv").alias("d2")
    )
    best = Window.partitionBy("_id").orderBy(F.col("d2").asc(), F.col("c").asc())
    return (
        scored.withColumn("rn", F.row_number().over(best))
        .where(F.col("rn") == 1)
        .select("_id", "c", "d2")
    )
