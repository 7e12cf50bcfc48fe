"""Lloyd's k-means over an embedding column — fixed-iteration,
deterministic, oracle-replayable.

Scale shape: centroids are k×d (broadcast-sized, like the IVF coarse
quantizer in ``operators/ivf.py``); each iteration is one corpus-scan
assignment (broadcast join against the k centroids + per-vector argmin)
and one (cluster, dim)-keyed hash aggregate for the update — map-side
combine reduces every partition to ≤ k·d partials before the shuffle,
so per-iteration traffic is independent of corpus size.  The corpus is
localCheckpointed once and re-read per iteration (on a cluster: persist
or reliable checkpoint).

Determinism contract (the PCA/linalg discipline): squared distances are
per-dim round-12 terms summed as DECIMAL(38,12) (order-independent
exact rationals) and compared rounded to 6 with ties broken by centroid
index; centroid updates are DECIMAL-sum means rounded to 12 — so a
generated SQL oracle replays every iteration bit-for-bit.

k-means itself is the standard curation primitive (semantic cluster
balancing, dedup bucket seeding, IVF training); the reference (a
psycopg2 ETL) has nothing comparable — §2.I extension tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .lineage import cut_lineage


def _d2_col(x: str, cv: str):
    """Round-6 squared L2 distance between two ARRAY<DOUBLE> columns —
    per-dim round-12 terms summed as DECIMAL(38,12), the deterministic
    arithmetic every distance in this module uses."""
    return F.round(
        F.aggregate(
            F.zip_with(
                x,
                cv,
                lambda a, b: F.round((a - b) * (a - b), 12).cast(
                    "decimal(38,12)"
                ),
            ),
            F.lit(0).cast("decimal(38,12)"),
            lambda acc, v: (acc + v).cast("decimal(38,12)"),
        ).cast("double"),
        6,
    )


def farthest_point_seed(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
) -> DataFrame:
    """Deterministic k-means++-style seeding by greedy farthest-point
    traversal (the argmax variant of the D² rule — kmeans|| papers call
    it "greedy k-means++"; fully deterministic, so oracle-replayable):

    * seed 0 = the vector with the smallest id;
    * seed t = the vector maximizing its round-6 squared distance to the
      NEAREST already-chosen seed, ties broken by id ascending.

    Each round is ONE corpus scan against the broadcast chosen set
    (≤ k×d doubles) + a per-vector min + a global top-1 — the same
    broadcast-assignment shape as a Lloyd iteration, k−1 times.  No
    driver-side data movement beyond the k chosen rows themselves.

    Returns (c, vec_id, cv ARRAY<DOUBLE>, sep_d2) where sep_d2 is the
    selection-time distance-to-nearest-prior-seed (0.0 for seed 0).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    base = (
        df.select(
            F.col(id_col).alias("_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("x"),
        )
        .transform(cut_lineage)
    )
    chosen = (
        base.orderBy("_id")
        .limit(1)
        .select(
            F.lit(0).alias("c"),
            F.col("_id").alias("vec_id"),
            F.col("x").alias("cv"),
            F.lit(0.0).alias("sep_d2"),
        )
        .transform(cut_lineage)
    )
    for t in range(1, k):
        picked = (
            base.crossJoin(F.broadcast(chosen.select("cv")))
            .select("_id", "x", _d2_col("x", "cv").alias("d2"))
            .groupBy("_id")
            .agg(F.min("d2").alias("mind2"), F.first("x").alias("x"))
            .orderBy(F.col("mind2").desc(), F.col("_id").asc())
            .limit(1)
            .select(
                F.lit(t).alias("c"),
                F.col("_id").alias("vec_id"),
                F.col("x").alias("cv"),
                F.col("mind2").alias("sep_d2"),
            )
        )
        chosen = chosen.unionByName(picked).transform(cut_lineage)
    return chosen


def lloyd_kmeans(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    iters: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Run ``iters`` Lloyd iterations seeded by the vectors of the ``k``
    smallest ids.  Returns (assignments, centroids):

    * assignments — (id, c, d2): final assignment (computed against the
      pre-update centroids of the last iteration, i.e. the arg-min that
      produced the final update) with its round-6 squared distance;
    * centroids — (c, cv ARRAY<DOUBLE>): the post-update centroids.

    Assumes every cluster keeps at least one member (true for any
    reasonable k on a non-degenerate corpus; a vanished cluster would
    surface as a missing (c) group, never silently).
    """
    base = (
        df.select(
            F.col(id_col).alias("_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("x"),
        )
        .transform(cut_lineage)
    )
    w = Window.orderBy("_id")  # applied below a LIMIT k — k rows, never corpus
    cents = (
        base.orderBy("_id")
        .limit(k)
        .select((F.row_number().over(w) - 1).alias("c"), F.col("x").alias("cv"))
        .transform(cut_lineage)
    )
    assigned = None
    for _ in range(iters):
        scored = (
            base.crossJoin(F.broadcast(cents))
            .select(
                "_id",
                "c",
                F.round(
                    F.aggregate(
                        F.zip_with(
                            "x",
                            "cv",
                            lambda a, b: F.round((a - b) * (a - b), 12).cast(
                                "decimal(38,12)"
                            ),
                        ),
                        F.lit(0).cast("decimal(38,12)"),
                        lambda acc, v: (acc + v).cast("decimal(38,12)"),
                    ).cast("double"),
                    6,
                ).alias("d2"),
            )
        )
        best = Window.partitionBy("_id").orderBy(
            F.col("d2").asc(), F.col("c").asc()
        )
        assigned = (
            scored.withColumn("rn", F.row_number().over(best))
            .where(F.col("rn") == 1)
            .select("_id", "c", "d2")
            .transform(cut_lineage)
        )
        upd = (
            assigned.join(base, "_id")
            .select("c", F.posexplode("x").alias("i", "xi"))
            .groupBy("c", "i")
            .agg(
                F.round(
                    F.sum(F.round(F.col("xi"), 12).cast("decimal(38,12)"))
                    .cast("double")
                    / F.count(F.lit(1)),
                    12,
                ).alias("m")
            )
        )
        cents = (
            upd.groupBy("c")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
            .transform(cut_lineage)
        )
    return assigned, cents
