"""Similarity search over embedding columns (ARRAY<FLOAT>).

* ``brute_force_topk``   — exact cosine top-k: queries broadcast against the
                           corpus, ranked per query.  The correctness
                           baseline; O(|Q|·|C|) but fully JVM-side
                           (zip_with/aggregate) and embarrassingly parallel.
* ``with_lsh_bucket`` /
  ``lsh_topk``           — sign-random-projection LSH: corpus bucketed by
                           hyperplane signs; queries probe only their bucket
                           (plus optional multi-probe neighbors).  The
                           100 TB path: turns the cross join into an
                           equi-join on bucket id.
* ``cosine_pairs_above`` — all-pairs variant for embedding near-dedup.

Hyperplanes are generated from a fixed LCG seed (pure Python, no numpy
dependency at plan-build time) so bucket assignments are deterministic
across runs and engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .lineage import cut_lineage

from ..functions import vectors as V


def _lcg_planes(num_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1): LCG(2^31) walk."""
    state = seed
    planes = []
    for _ in range(num_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (2**31)
            row.append(state / float(2**30) - 1.0)
        planes.append(row)
    return planes


def cosine_pairs_above(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (a<b) pairs with cosine ≥ threshold — brute force.

    Per-vector norms are computed ONCE before the pair join (higher-order
    array expressions are CodegenFallback — interpreted per evaluation —
    so recomputing sqrt(dot(v,v)) per PAIR costs 4 interpreted aggregates
    on an O(n²) row count; hoisting them cut this operator 107 s → ~25 s
    on 2k vectors / 4M candidate rows).  The arithmetic is unchanged —
    dot(a,b) / (sqrt(dot(a,a)) · sqrt(dot(b,b))) in the same order — so
    results and oracles are bit-identical."""
    e = df.select(
        F.col(id_col).alias("vid"), V.to_double_array(F.col(vec_col)).alias("v")
    ).withColumn("nrm", V.norm(F.col("v")))
    a = e.alias("a")
    b = e.alias("b")
    denom = F.col("a.nrm") * F.col("b.nrm")
    cos = F.when(denom > 0, V.dot(F.col("a.v"), F.col("b.v")) / denom).otherwise(
        F.lit(0.0)
    )
    return (
        a.join(b, F.col("a.vid") < F.col("b.vid"))
        .where(cos >= threshold)
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            F.round(cos, 6).alias("cosine"),
        )
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector (self excluded).

    Ranking uses the ROUNDED similarity (6 dp) with id tie-break so results
    are stable across engines/float orderings."""
    q = queries.select(
        F.col(id_col).alias("query_id"), V.to_double_array(F.col(vec_col)).alias("qv")
    ).withColumn("qn", V.norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        V.to_double_array(F.col(vec_col)).alias("cv"),
    ).withColumn("cn", V.norm(F.col("cv")))
    # norms hoisted out of the pair loop (see cosine_pairs_above): same
    # arithmetic — dot / (sqrt(dot(q,q)) * sqrt(dot(c,c))) — fewer
    # interpreted HOF evaluations per candidate
    _den = F.col("qn") * F.col("cn")
    cos = F.round(
        F.when(_den > 0, V.dot(F.col("qv"), F.col("cv")) / _den).otherwise(
            F.lit(0.0)
        ),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def hard_negative_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining: per query vector, the top-k most-similar
    corpus vectors carrying a DIFFERENT label — the contrastive-training
    counterpart of ``brute_force_topk`` (a hard negative is a high-
    similarity cross-class neighbor).  Same determinism contract: ranking
    on the 6-dp rounded cosine with id tie-break; same hoisted-norm
    discipline; the label filter rides the join condition so mismatched
    pairs never materialize.  Scale path: swap the broadcast cross join
    for the LSH bucket join exactly as in ``lsh_topk``."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("query_label"),
        V.to_double_array(F.col(vec_col)).alias("qv"),
    ).withColumn("qn", V.norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        V.to_double_array(F.col(vec_col)).alias("cv"),
    ).withColumn("cn", V.norm(F.col("cv")))
    _den = F.col("qn") * F.col("cn")
    cos = F.round(
        F.when(_den > 0, V.dot(F.col("qv"), F.col("cv")) / _den).otherwise(F.lit(0.0)),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        F.broadcast(q)
        .join(c, F.col("query_label") != F.col("neighbor_label"))
        .select(
            "query_id", "query_label", "neighbor_id", "neighbor_label",
            cos.alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def with_lsh_bucket(
    df: DataFrame,
    num_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Attach the sign-LSH bucket id (deterministic seeded hyperplanes).

    The bucket expression is emitted as ONE SQL string (64 x num_planes
    literals through a single F.expr) — bit-identical to the Column-API
    form but without its one-py4j-call-per-literal construction cost
    (see functions/vectors.py)."""
    planes = _lcg_planes(num_planes, dim, seed)
    return df.withColumn(
        "bucket",
        F.expr(
            V.random_projection_bucket_sql(
                V.to_double_array_sql(f"`{vec_col}`"), planes
            )
        ),
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: compare only within the query's LSH bucket.

    Recall is tuned by ``num_planes`` (fewer planes → bigger buckets →
    higher recall, more compute).  tests/test_similarity.py measures recall
    against brute_force_topk."""
    qb = with_lsh_bucket(queries, num_planes, dim, vec_col).select(
        F.col(id_col).alias("query_id"),
        V.to_double_array(F.col(vec_col)).alias("qv"),
        "bucket",
    ).withColumn("qn", V.norm(F.col("qv")))
    cb = with_lsh_bucket(corpus, num_planes, dim, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        V.to_double_array(F.col(vec_col)).alias("cv"),
        "bucket",
    ).withColumn("cn", V.norm(F.col("cv")))
    _den = F.col("qn") * F.col("cn")
    cos = F.round(
        F.when(_den > 0, V.dot(F.col("qv"), F.col("cv")) / _den).otherwise(
            F.lit(0.0)
        ),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        qb.join(cb, ["bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def lsh_multiprobe_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    n_flips: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Query-aware multi-probe sign-LSH top-k (Lv et al., "Multi-Probe
    LSH", VLDB'07): besides its own bucket, each query probes the
    buckets reached by flipping the ``n_flips`` planes whose projection
    margin |q·plane| is smallest — exactly the bits most likely to have
    landed on the wrong side for a true neighbor.  Recall rises without
    adding planes (which would shrink every bucket) or removing planes
    (which would inflate every candidate set): probing 1+n_flips of the
    2^planes buckets scans a (1+n_flips)/2^planes corpus fraction.

    Determinism: flip selection orders by (6-dp rounded |margin|,
    plane_idx); scoring is exact cosine within candidates with the
    brute_force_topk rounding/tie contract.  Buckets partition the
    corpus and single-bit flips are distinct, so candidate sets are
    disjoint — no post-join dedup.  Scale shape: the probe list is
    (1+n_flips)·|Q| rows joined on the bucket key — same bucket-pruned
    scan as ``lsh_topk``/``lsh_index_topk``, just more probes."""
    if not 0 <= n_flips <= num_planes:
        raise ValueError("n_flips must be in [0, num_planes]")
    planes = _lcg_planes(num_planes, dim, seed)
    qb = with_lsh_bucket(queries, num_planes, dim, vec_col, seed).select(
        F.col(id_col).alias("query_id"),
        V.to_double_array(F.col(vec_col)).alias("qv"),
        "bucket",
    )
    dots = F.expr(
        "array("
        + ", ".join(
            V.dot_sql("`qv`", V.array_lit_sql(p)) for p in planes
        )
        + ")"
    )
    qd = qb.select(
        "query_id", "qv", "bucket",
        F.posexplode(dots).alias("plane_idx", "d"),
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.round(F.abs(F.col("d")), 6).asc(), F.col("plane_idx").asc()
    )
    flips = (
        qd.withColumn("rn", F.row_number().over(wf))
        .where(F.col("rn") <= n_flips)
        .select(
            "query_id",
            "qv",
            F.col("bucket")
            .bitwiseXOR(F.pow(F.lit(2.0), F.col("plane_idx")).cast("long"))
            .alias("bucket"),
        )
    )
    probes = qb.select("query_id", "qv", "bucket").unionByName(flips)
    cb = with_lsh_bucket(corpus, num_planes, dim, vec_col, seed).select(
        F.col(id_col).alias("neighbor_id"),
        V.to_double_array(F.col(vec_col)).alias("cv"),
        "bucket",
    )
    cos = F.round(V.cosine_similarity(F.col("qv"), F.col("cv")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        F.broadcast(probes)
        .join(cb, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def lsh_multitable_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    num_planes: int = 6,
    n_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Multi-TABLE sign-LSH top-k — the classic E2LSH amplification
    (Indyk/Motwani; Datar et al., SoCG'04): ``n_tables`` independent
    seeded hyperplane sets, candidate union across tables, exact-cosine
    re-rank.  Where multi-probe widens the search around ONE table's
    bucket (correlated probes — recall plateaus, ANN_RECALL_r10's
    0.102 ceiling), independent tables give the OR-amplified
    1-(1-p^planes)^L collision curve, the standard way to push
    hyperplane LSH past 0.5 recall without inflating any single
    bucket's size.

    Shape: one scan of each side computes the per-table bucket array
    (posexploded to (table, bucket) keys), candidates are the
    (table, bucket) equi-join, DISTINCT (query, neighbor) collapses
    cross-table repeats before the exact-cosine ranking (the
    brute_force_topk rounding/tie contract).  At 100 TB: the corpus
    side carries n_tables bucket rows per vector (the L-fold E2LSH
    index-size tradeoff), the join shuffles only (table, bucket)
    groups, and nothing is ever all-pairs."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        V.to_double_array(F.col(vec_col)).alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        V.to_double_array(F.col(vec_col)).alias("cv"),
    )

    def buckets(vcol: str) -> F.Column:
        # one SQL string for the whole L-table battery: ~7,000 py4j
        # calls -> 1 (pure construction cost; the tree is identical)
        return F.expr(
            V.random_projection_buckets_sql(
                f"`{vcol}`",
                [_lcg_planes(num_planes, dim, seed + t) for t in range(n_tables)],
            )
        )

    qb = q.select(
        "query_id", "qv", F.posexplode(buckets("qv")).alias("t", "bucket")
    )
    cb = c.select(
        "neighbor_id",
        "cv",
        F.posexplode(buckets("cv")).alias("t", "bucket"),
    )
    cand = (
        F.broadcast(qb)
        .join(cb, ["t", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cos = F.round(V.cosine_similarity(F.col("qv"), F.col("cv")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def cosine_pairs_above_lsh(
    df: DataFrame,
    threshold: float,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs with cosine ≥ threshold, candidates restricted to
    same-sign-LSH-bucket — the scale path for ``cosine_pairs_above``: the
    O(n²) cross join becomes an equi-join on ``bucket``, so at 100 TB the
    shuffle co-locates each bucket and compares only within it (recall
    <1 by design; tune with fewer planes → bigger buckets)."""
    e = with_lsh_bucket(df, num_planes, dim, vec_col, seed).select(
        F.col(id_col).alias("vid"),
        V.to_double_array(F.col(vec_col)).alias("v"),
        "bucket",
    ).withColumn("nrm", V.norm(F.col("v")))
    a = e.alias("a")
    b = e.alias("b")
    # norms hoisted out of the pair loop (see cosine_pairs_above) — same
    # arithmetic, interpreted-HOF count per candidate drops 6 → 2
    denom = F.col("a.nrm") * F.col("b.nrm")
    cos = F.when(denom > 0, V.dot(F.col("a.v"), F.col("b.v")) / denom).otherwise(
        F.lit(0.0)
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .where(cos >= threshold)
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            F.round(cos, 6).alias("cosine"),
        )
    )


def lsh_index_write(
    corpus: DataFrame,
    index_dir: str,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> None:
    """Persist the sign-LSH index partitioned by bucket — the hash-family
    twin of ivf.ivf_index_write (train once, query many; no training step
    since the hyperplanes are seeded).  A probe then reads ONLY its
    bucket's files via partition pruning, nprobe-free."""
    (
        with_lsh_bucket(corpus, num_planes, dim, vec_col, seed)
        .select(
            "bucket",
            F.col(id_col).alias("item_id"),
            V.to_double_array(F.col(vec_col)).alias("iv"),
        )
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{index_dir}/buckets")
    )


def lsh_index_topk(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Search a persisted sign-LSH index: bucket each query with the same
    seeded hyperplanes, filter the partitioned buckets table to the probed
    bucket ids (partition pruning — the scan is |probed buckets| / 2^planes
    of the corpus), exact cosine within candidates, deterministic top-k."""
    qb = with_lsh_bucket(queries, num_planes, dim, vec_col, seed).select(
        F.col(id_col).alias("query_id"),
        V.to_double_array(F.col(vec_col)).alias("qv"),
        "bucket",
    )
    # No driver round-trip: broadcasting the (small) query side lets dynamic
    # partition pruning reuse the broadcast to prune the bucket-partitioned
    # scan to the probed buckets — fully lazy, no collect of bucket ids.
    cells = spark.read.parquet(f"{index_dir}/buckets")
    cos = F.round(V.cosine_similarity(F.col("qv"), F.col("iv")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        F.broadcast(qb).join(cells, "bucket")
        .where(F.col("query_id") != F.col("item_id"))
        .select(
            "query_id", F.col("item_id").alias("neighbor_id"), cos.alias("cosine")
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def pairwise_cosines(vecs: DataFrame, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """All ordered pairs (ia, ib, sim) over a SMALL vector frame (a
    candidate set, not a corpus — the caller bounds it): rounded cosine
    with hoisted norms, broadcast self-join."""
    v = vecs.select(
        F.col(id_col).alias("ia"), V.to_double_array(F.col(vec_col)).alias("va")
    ).withColumn("na", V.norm(F.col("va")))
    w = v.select(
        F.col("ia").alias("ib"),
        F.col("va").alias("vb"),
        F.col("na").alias("nb"),
    )
    return (
        F.broadcast(v)
        .join(w, F.col("ia") != F.col("ib"))
        .select(
            "ia",
            "ib",
            F.round(
                V.dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("sim"),
        )
    )


def mmr_rerank(
    cand: DataFrame,
    pair_sims: DataFrame,
    k: int,
    lam: float = 0.7,
    mu: float = 0.3,
) -> DataFrame:
    """Maximal Marginal Relevance diversified rerank (Carbonell &
    Goldstein '98): greedily pick k items maximizing
    ``lam·rel − mu·max_{s∈selected} sim(item, s)`` (first pick scores
    ``lam·rel`` — empty-set penalty is 0).

    ``cand``: (vec_id, rel) — the ALREADY-BOUNDED candidate set from a
    first-stage retriever (brute/IVF top-N); ``pair_sims``: (ia, ib,
    sim) among candidates.  ``lam``/``mu`` are passed separately rather
    than derived (``1 - 0.7`` is not the double ``0.3`` — cross-engine
    oracles need the exact literal).

    Scores round to 6 dp with vec_id tie-break, so the greedy path is
    engine-deterministic.  Both inputs are bounded by the first-stage
    retriever's N (a protocol constant), so the greedy runs DRIVER-SIDE
    on the two collected candidate tables — two bounded collects
    (the documented nlist/ksub-bounded safe class) replace ~3k
    sequential candidate-sized jobs (per pick: argmax + union pin +
    anti-join pin; guide §1.2 — the job ladder was the wall, the data
    never exceeded N rows + N² pair sims).  The Python replay is
    operation-identical: lam·rel − mu·max_sim in IEEE double order,
    rounded via shortest-repr decimal HALF_UP == Spark's Round, vec_id
    tie-break.  Returns (pick 1..k, vec_id, score) as a LocalRelation.
    """
    import decimal

    if k < 1:
        raise ValueError("k must be >= 1")
    spark = cand.sparkSession
    id_type = cand.schema["vec_id"].dataType.simpleString()
    crows = cand.select("vec_id", "rel").collect()  # <= first-stage N
    srows = pair_sims.select("ia", "ib", "sim").collect()  # <= N^2

    def _r6(x: float) -> float:
        # Spark Round(double) = BigDecimal.valueOf(shortest repr),
        # setScale(6, HALF_UP) — Python repr() is the same shortest
        # round-trip decimal, so this replays bit-for-bit
        return float(
            decimal.Decimal(repr(float(x))).quantize(
                decimal.Decimal("0.000001"),
                rounding=decimal.ROUND_HALF_UP,
            )
        )

    rel = {r["vec_id"]: float(r["rel"]) for r in crows}
    sim: dict = {}
    for r in srows:
        sim[(r["ia"], r["ib"])] = float(r["sim"])
    selected: list = []
    out_rows: list = []
    remaining = set(rel)
    for i in range(1, k + 1):
        if not remaining:
            break
        best = None
        for v in remaining:
            if not selected:
                raw = lam * rel[v]
            else:
                pens = [sim[(v, s)] for s in selected if (v, s) in sim]
                msim = max(pens) if pens else 0.0
                raw = lam * rel[v] - mu * msim
            key = (-_r6(raw), v)
            if best is None or key < best[0]:
                best = (key, v, _r6(raw))
        _, pick_id, score = best
        out_rows.append((i, pick_id, score))
        selected.append(pick_id)
        remaining.discard(pick_id)
    return spark.createDataFrame(
        out_rows, f"pick int, vec_id {id_type}, score double"
    )
