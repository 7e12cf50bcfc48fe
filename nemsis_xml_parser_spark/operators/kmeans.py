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
    spark = df.sparkSession
    base = (
        df.select(
            F.col(id_col).alias("_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("x"),
        )
        .transform(cut_lineage)
    )
    id_type = base.schema["_id"].dataType.simpleString()
    schema = f"c int, vec_id {id_type}, cv array<double>, sep_d2 double"
    # The chosen set is k-bounded (a protocol constant), so it
    # accumulates DRIVER-SIDE: each round is exactly one TakeOrdered
    # collect of the 1-row argmax (the bounded-collect safe class), and
    # the chosen vectors re-enter as a job-free LocalRelation broadcast
    # — no per-round union checkpoint, no per-round broadcast-build job
    # (guide §1.2; the corpus scan per round is the algorithm and
    # stays).  Collect round-trips doubles exactly, so d2 arithmetic is
    # bit-identical to the frame-accumulated form.
    first = base.orderBy("_id").limit(1).select("_id", "x").collect()
    if not first:
        return spark.createDataFrame([], schema)
    rows = [(0, first[0]["_id"], first[0]["x"], 0.0)]
    for t in range(1, k):
        cvs = _cents_values_frame(
            spark, [(i, r[2]) for i, r in enumerate(rows)]
        ).select("cv")
        picked = (
            base.crossJoin(F.broadcast(cvs))
            .select("_id", "x", _d2_col("x", "cv").alias("d2"))
            .groupBy("_id")
            .agg(F.min("d2").alias("mind2"), F.first("x").alias("x"))
            .orderBy(F.col("mind2").desc(), F.col("_id").asc())
            .limit(1)
            .collect()
        )
        rows.append(
            (t, picked[0]["_id"], picked[0]["x"], float(picked[0]["mind2"]))
        )
    from ..functions.vectors import array_lit_sql, double_lit_sql

    vals = ", ".join(
        f"({c}, CAST('{vid}' AS {id_type}), {array_lit_sql(cv)}, "
        f"{double_lit_sql(sep)})"
        for c, vid, cv, sep in rows
    )
    return spark.sql(
        f"SELECT * FROM VALUES {vals} AS t(c, vec_id, cv, sep_d2)"
    )


def _cents_values_frame(spark, rows: list) -> DataFrame:
    """(c, cv) rows -> a TRUE LocalRelation via a VALUES inline table
    with exact-double literals (functions/vectors.py discipline).
    PySpark's ``createDataFrame`` builds an RDD-backed LogicalRDD whose
    every broadcast costs a 1-partition job; a parsed VALUES table is a
    LocalRelation, and BroadcastExchange over LocalTableScan collects
    driver-locally with NO job at all."""
    from ..functions.vectors import array_lit_sql

    vals = ", ".join(f"({int(c)}, {array_lit_sql(cv)})" for c, cv in rows)
    return spark.sql(f"SELECT * FROM VALUES {vals} AS t(c, cv)")


def _seed_cents_local(base: DataFrame, k: int) -> DataFrame:
    """Seed centroids = the vectors of the k smallest ids, collected
    (k-bounded, a protocol constant) into a job-free LocalRelation —
    replaces the limit-k window + eager checkpoint + per-iteration
    broadcast-build of the frame-resident form."""
    rows = base.orderBy("_id").limit(k).select("_id", "x").collect()
    return _cents_values_frame(
        base.sparkSession, [(i, r["x"]) for i, r in enumerate(rows)]
    )


def _upd_cents_local(upd: DataFrame) -> DataFrame:
    """Collect the (c, i, m) per-dimension means (k·d rows — protocol
    constants) and rebuild the (c, cv) centroid table as a
    LocalRelation; the sort by dimension index replays
    array_sort(collect_list(struct(i, m))) exactly."""
    by_c: dict = {}
    for r in upd.collect():
        by_c.setdefault(r["c"], []).append((r["i"], r["m"]))
    return _cents_values_frame(
        upd.sparkSession,
        [(c, [m for _, m in sorted(v)]) for c, v in sorted(by_c.items())],
    )


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
    # centroids live driver-side between iterations (k·d doubles — the
    # bounded-collect safe class): each update is one collect of the
    # (c, i, m) means instead of an eager checkpoint, and the next
    # assignment broadcasts a job-free LocalRelation (guide §1.2)
    cents = _seed_cents_local(base, k)
    assigned = None
    for it in range(iters):
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
        # intermediate iterations are not pinned: each assignment is
        # consumed exactly once (the update collect below), so the pin
        # bought nothing but a corpus-sized checkpoint write.  Only the
        # LAST assignment is pinned — it is read twice (final update +
        # the caller's result).
        assigned = (
            scored.withColumn("rn", F.row_number().over(best))
            .where(F.col("rn") == 1)
            .select("_id", "c", "d2")
        )
        if it == iters - 1:
            assigned = cut_lineage(assigned)
        upd = (
            assigned.join(
                base.select(F.col("_id").alias("_bid"), "x"),
                F.col("_id") == F.col("_bid"),
            )
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
        cents = _upd_cents_local(upd)
    return assigned, cents


def kmeans_parallel_init(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    ell: int = 8,
    rounds: int = 3,
) -> DataFrame:
    """k-means|| oversampling initialization (Bahmani et al., "Scalable
    K-Means++", VLDB'12) — the DISTRIBUTED replacement for k-means++'s
    k sequential corpus passes: each of ``rounds`` passes samples each
    point INDEPENDENTLY with probability min(1, ell * d2(x, C) / phi(C))
    where phi is the current total cost, drawing ~ell candidates per
    round in parallel; the O(ell * rounds) weighted candidate set is then
    reclustered (here: ``weighted_lloyd_kmeans``) at negligible cost.

    Determinism: the Bernoulli draw is the coreset trick — hash-uniform
    u(x, r) = md5(vec_id || '|' || r) / 2^60 compared against the exact
    threshold (d2 round-6, phi a DECIMAL(28,6) exact sum, one double
    division), so the whole cascade replays bit-for-bit in a SQL oracle.
    Already-chosen candidates have d2 = 0 and can never re-enter.

    Scale shape: per round ONE corpus scan against the broadcast
    candidate set (min-d2 per point), ONE 1-row total-cost aggregate,
    ONE filter; the final weighting pass is one more broadcast-argmin
    scan.  Nothing sequential in the corpus dimension — the point of
    kmeans|| over kmeans++ at 100 TB.

    Returns (rnd, vec_id, cv ARRAY<DOUBLE>, sel_d2, weight) — selection
    round, candidate id/vector, its distance-to-C at selection time, and
    the number of corpus points nearest to it (ties to the smaller
    candidate id; a candidate duplicated by an earlier-id twin weighs 0).
    """
    from ..functions.hashing import md5_long

    base = (
        df.select(
            F.col(id_col).alias("_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("x"),
        )
        .transform(cut_lineage)
    )
    # plain-double sequential fold + round-6: identical to DuckDB's
    # list_sum(list_transform(...)) (the curation_coreset_sample pairing)
    d2 = lambda x, cv: F.round(  # noqa: E731
        F.aggregate(
            F.zip_with(x, cv, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )
    cand = (
        base.orderBy("_id")
        .limit(1)
        .select(
            F.lit(0).alias("rnd"),
            F.col("_id").alias("vec_id"),
            F.col("x").alias("cv"),
            F.lit(0.0).alias("sel_d2"),
        )
        .transform(cut_lineage)
    )
    for r in range(1, rounds + 1):
        mind2 = (
            base.crossJoin(F.broadcast(cand.select("cv")))
            .select("_id", "x", d2(F.col("x"), F.col("cv")).alias("dd"))
            .groupBy("_id")
            .agg(F.min("dd").alias("mind2"), F.first("x").alias("x"))
        )
        phi = mind2.agg(
            F.sum(F.col("mind2").cast("decimal(28,6)"))
            .cast("double")
            .alias("phi")
        )
        u = md5_long(
            F.concat(F.col("_id").cast("string"), F.lit(f"|{r}"))
        ) / F.lit(float(1 << 60))
        picked = (
            mind2.crossJoin(F.broadcast(phi))
            .where(u < ell * F.col("mind2") / F.col("phi"))
            .select(
                F.lit(r).alias("rnd"),
                F.col("_id").alias("vec_id"),
                F.col("x").alias("cv"),
                F.col("mind2").alias("sel_d2"),
            )
        )
        cand = cand.unionByName(picked).transform(cut_lineage)
    best = Window.partitionBy("_id").orderBy(
        F.col("dd").asc(), F.col("cnd").asc()
    )
    weights = (
        base.crossJoin(
            F.broadcast(cand.select(F.col("vec_id").alias("cnd"), "cv"))
        )
        .select("_id", "cnd", d2(F.col("x"), F.col("cv")).alias("dd"))
        .withColumn("rn", F.row_number().over(best))
        .where(F.col("rn") == 1)
        .groupBy("cnd")
        .agg(F.count(F.lit(1)).cast("bigint").alias("weight"))
    )
    return (
        cand.join(weights, cand["vec_id"] == weights["cnd"], "left")
        .drop("cnd")
        .withColumn(
            "weight", F.coalesce(F.col("weight"), F.lit(0).cast("bigint"))
        )
    )


def weighted_lloyd_kmeans(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    weight_col: str = "weight",
    k: int = 4,
    iters: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Lloyd's iterations over WEIGHTED points — the estimator a coreset
    exists for (Bachem et al.: running weighted k-means on the coreset
    approximates full-corpus k-means at O(coreset) cost).  Assignment is
    identical to ``lloyd_kmeans`` (round-6 argmin of DECIMAL-summed
    round-12 squared terms, ties by centroid index); the update is the
    WEIGHTED mean — per (cluster, dim): round-12 DECIMAL sum of
    round(w·x_i, 12) divided by the DECIMAL sum of the 6-dp weights.
    All staged sums are exact and order-independent, so the generated
    SQL oracle replays every round bit-for-bit.

    Returns (assignments (id, c, d2, w6), centroids (c, cv))."""
    base = (
        df.select(
            F.col(id_col).alias("_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("x"),
            F.round(F.col(weight_col), 6).alias("w6"),
        )
        .transform(cut_lineage)
    )
    cents = _seed_cents_local(base, k)
    assigned = None
    for it in range(iters):
        scored = (
            base.crossJoin(F.broadcast(cents))
            .select(
                "_id",
                "w6",
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
        # last-iteration pin only — same reasoning as lloyd_kmeans
        assigned = (
            scored.withColumn("rn", F.row_number().over(best))
            .where(F.col("rn") == 1)
            .select("_id", "c", "d2", "w6")
        )
        if it == iters - 1:
            assigned = cut_lineage(assigned)
        upd = (
            # assigned already carries w6; join back only for x (the
            # projected base side avoids the self-join ambiguity now
            # that assigned is lazy over base rather than a pinned leaf)
            assigned.join(
                base.select(F.col("_id").alias("_bid"), "x"),
                F.col("_id") == F.col("_bid"),
            )
            .select("c", F.col("w6").alias("wv"), F.posexplode("x").alias("i", "xi"))
            .groupBy("c", "i")
            .agg(
                F.round(
                    F.sum(
                        F.round(F.col("wv") * F.col("xi"), 12).cast(
                            "decimal(38,12)"
                        )
                    ).cast("double")
                    / F.sum(F.col("wv").cast("decimal(38,6)")).cast("double"),
                    12,
                ).alias("m")
            )
        )
        cents = _upd_cents_local(upd)
    return assigned, cents
