"""Distribution-drift and dataset-quality audits (SURVEY §2.I extension).

The monitoring tier every production training-data pipeline runs between
ingests: did the incoming batch's distributions move?  PSI and KS are the
two standard drift statistics (banking model-risk practice and the
two-sample test respectively), mutual information quantifies leakage
between metadata axes, and the embedding-norm audit catches degenerate
vectors before they poison ANN indexes.  All four are pure DataFrame
aggregation pipelines — contingency/bucket counts are exact integers, so
cross-engine determinism only needs the usual rounded-edge contract on
the final ratios.

Scale shape: every query here aggregates to a bounded domain first
(fixed-width buckets, lang×source cells, labels) and computes statistics
on that tiny frame — corpus-sized data is touched exactly once, by one
hash aggregate, and no unpartitioned window appears anywhere (the KS
ECDF uses a triangular join over the bounded bin domain instead).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import register, table

#: fixed bucket width (chars) for length-distribution drift — n_chars is
#: bucketed BEFORE any distribution math, so the statistic domains stay
#: bounded regardless of corpus size
BUCKET_W = 50


@register(
    "quality_psi_drift",
    family="quality",
    doc="Population Stability Index between two halves of the corpus "
    "(doc_id parity stands in for reference-vs-incoming batches): "
    "n_chars bucketed at fixed width 50, per-bucket smoothed shares "
    "p = (n + 0.5) / (N + 0.5·B) on both sides (additive smoothing so "
    "one-sided buckets contribute finite terms), psi_term = "
    "(p_cur − p_ref)·ln(p_cur/p_ref) per bucket.  The industry drift "
    "gate (PSI > 0.2 → investigate) is the SUM of these surfaced "
    "terms.  One corpus-wide hash aggregate onto ≤ a dozen buckets, "
    "then arithmetic on the tiny frame with totals broadcast back — "
    "no window, no second scan.",
    oracle=f"""
WITH counts AS (
  SELECT CAST(FLOOR(n_chars / {BUCKET_W}) AS INTEGER) AS bucket,
         SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS n_ref,
         SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS n_cur
  FROM documents GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_ref) AS DOUBLE) AS t_ref,
         CAST(SUM(n_cur) AS DOUBLE) AS t_cur,
         CAST(COUNT(*) AS DOUBLE) AS b
  FROM counts
)
SELECT bucket,
       CAST(n_ref AS BIGINT) AS n_ref,
       CAST(n_cur AS BIGINT) AS n_cur,
       ROUND((n_ref + 0.5) / (t_ref + 0.5 * b), 6) AS p_ref,
       ROUND((n_cur + 0.5) / (t_cur + 0.5 * b), 6) AS p_cur,
       ROUND(((n_cur + 0.5) / (t_cur + 0.5 * b)
              - (n_ref + 0.5) / (t_ref + 0.5 * b))
             * LN(((n_cur + 0.5) / (t_cur + 0.5 * b))
                  / ((n_ref + 0.5) / (t_ref + 0.5 * b))), 6) AS psi_term
FROM counts, tot
""",
)
def quality_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy(
        F.floor(F.col("n_chars") / BUCKET_W).cast("int").alias("bucket")
    ).agg(
        F.sum(F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("doc_id") % 2 == 1, 1).otherwise(0)).alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").cast("double").alias("t_ref"),
        F.sum("n_cur").cast("double").alias("t_cur"),
        F.count(F.lit(1)).cast("double").alias("b"),
    )
    p_ref = (F.col("n_ref") + 0.5) / (F.col("t_ref") + 0.5 * F.col("b"))
    p_cur = (F.col("n_cur") + 0.5) / (F.col("t_cur") + 0.5 * F.col("b"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cur, 6).alias("p_cur"),
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi_term"),
    )


@register(
    "quality_ks_drift",
    family="quality",
    doc="Binned two-sample Kolmogorov-Smirnov statistic between the same "
    "two corpus halves: D = max over buckets of |ECDF_ref − ECDF_cur| "
    "on the width-50 n_chars binning.  ECDFs come from a TRIANGULAR "
    "join over the bounded bin domain (cum counts = Σ of bins ≤ b) — "
    "windows would need an unpartitioned ordering, the triangle join "
    "broadcasts a ≤dozen-row frame instead; cumulative counts are "
    "exact integers.  Output is the single decision row: D, the bucket "
    "attaining it (min bucket on ties — deterministic), bin count and "
    "both sample sizes.",
    oracle=f"""
WITH counts AS (
  SELECT CAST(FLOOR(n_chars / {BUCKET_W}) AS INTEGER) AS bucket,
         SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS n_ref,
         SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS n_cur
  FROM documents GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_ref) AS DOUBLE) AS t_ref,
         CAST(SUM(n_cur) AS DOUBLE) AS t_cur FROM counts
),
cdf AS (
  SELECT a.bucket,
         SUM(b.n_ref) AS c_ref,
         SUM(b.n_cur) AS c_cur
  FROM counts a JOIN counts b ON b.bucket <= a.bucket
  GROUP BY a.bucket
),
diffs AS (
  SELECT bucket,
         ROUND(ABS(c_ref / (SELECT t_ref FROM tot)
                   - c_cur / (SELECT t_cur FROM tot)), 6) AS d
  FROM cdf
),
mx AS (SELECT MAX(d) AS ks FROM diffs)
SELECT (SELECT ks FROM mx) AS ks_stat,
       CAST(MIN(bucket) AS INTEGER) AS at_bucket,
       CAST((SELECT COUNT(*) FROM counts) AS BIGINT) AS n_bins,
       CAST((SELECT SUM(n_ref) FROM counts) AS BIGINT) AS n_ref,
       CAST((SELECT SUM(n_cur) FROM counts) AS BIGINT) AS n_cur
FROM diffs WHERE d = (SELECT ks FROM mx)
""",
)
def quality_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy(
        F.floor(F.col("n_chars") / BUCKET_W).cast("int").alias("bucket")
    ).agg(
        F.sum(F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("doc_id") % 2 == 1, 1).otherwise(0)).alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").cast("double").alias("t_ref"),
        F.sum("n_cur").cast("double").alias("t_cur"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum("n_ref").cast("bigint").alias("tot_ref"),
        F.sum("n_cur").cast("bigint").alias("tot_cur"),
    )
    a = counts.select(F.col("bucket").alias("b_hi"))
    cdf = (
        a.join(F.broadcast(counts), F.col("bucket") <= F.col("b_hi"))
        .groupBy("b_hi")
        .agg(F.sum("n_ref").alias("c_ref"), F.sum("n_cur").alias("c_cur"))
    )
    diffs = cdf.crossJoin(F.broadcast(tot)).select(
        F.col("b_hi").alias("bucket"),
        F.round(
            F.abs(
                F.col("c_ref") / F.col("t_ref") - F.col("c_cur") / F.col("t_cur")
            ),
            6,
        ).alias("d"),
        "n_bins",
        "tot_ref",
        "tot_cur",
    )
    mx = diffs.agg(F.max("d").alias("ks"))
    return (
        diffs.crossJoin(F.broadcast(mx))
        .where(F.col("d") == F.col("ks"))
        .groupBy("ks", "n_bins", "tot_ref", "tot_cur")
        .agg(F.min("bucket").cast("int").alias("at_bucket"))
        .select(
            F.col("ks").alias("ks_stat"),
            "at_bucket",
            F.col("n_bins").alias("n_bins"),
            F.col("tot_ref").alias("n_ref"),
            F.col("tot_cur").alias("n_cur"),
        )
    )


@register(
    "quality_mutual_information",
    family="quality",
    doc="Mutual information and entropies of the lang × source metadata "
    "axes — the leakage audit run before stratified splitting (high "
    "MI(lang, source) means a source-based split silently skews "
    "language balance).  All probabilities come from one contingency "
    "aggregate (exact integer counts); MI and marginal entropy terms "
    "are rounded and DECIMAL-cast before their sums, so the aggregation "
    "is order-independent.  Output is the one-row audit: MI in nats, "
    "H(lang), H(source), H(joint), and the redundancy ratio "
    "MI / min(H) that gates the split strategy.",
    oracle="""
WITH joint AS (
  SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY lang, source
),
tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM joint),
ml AS (SELECT lang, SUM(n) AS nl FROM joint GROUP BY lang),
ms AS (SELECT source, SUM(n) AS ns FROM joint GROUP BY source),
mi AS (
  SELECT CAST(SUM(CAST(ROUND((j.n / t.t)
           * LN((j.n * t.t) / (CAST(ml.nl AS DOUBLE) * ms.ns)), 12)
           AS DECIMAL(20,12))) AS DOUBLE) AS mi,
         CAST(SUM(CAST(ROUND(-(j.n / t.t) * LN(j.n / t.t), 12)
           AS DECIMAL(20,12))) AS DOUBLE) AS h_joint
  FROM joint j JOIN ml USING (lang) JOIN ms USING (source) CROSS JOIN tot t
),
hl AS (
  SELECT CAST(SUM(CAST(ROUND(-(nl / t.t) * LN(nl / t.t), 12)
           AS DECIMAL(20,12))) AS DOUBLE) AS h_lang
  FROM ml CROSS JOIN tot t
),
hs AS (
  SELECT CAST(SUM(CAST(ROUND(-(ns / t.t) * LN(ns / t.t), 12)
           AS DECIMAL(20,12))) AS DOUBLE) AS h_source
  FROM ms CROSS JOIN tot t
)
SELECT ROUND(mi.mi, 6) AS mi_nats,
       ROUND(hl.h_lang, 6) AS h_lang,
       ROUND(hs.h_source, 6) AS h_source,
       ROUND(mi.h_joint, 6) AS h_joint,
       ROUND(mi.mi / LEAST(hl.h_lang, hs.h_source), 6) AS redundancy,
       CAST((SELECT SUM(n) FROM joint) AS BIGINT) AS n_docs
FROM mi, hl, hs
""",
)
def quality_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    joint = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    tot = joint.agg(
        F.sum("n").cast("double").alias("t"),
        F.sum("n").cast("bigint").alias("n_docs"),
    )
    ml = joint.groupBy("lang").agg(F.sum("n").alias("nl"))
    ms = joint.groupBy("source").agg(F.sum("n").alias("ns"))

    def _dec12(col):
        return F.round(col, 12).cast("decimal(20,12)")

    p = F.col("n") / F.col("t")
    mi_term = _dec12(
        p * F.log((F.col("n") * F.col("t")) / (F.col("nl").cast("double") * F.col("ns")))
    )
    hj_term = _dec12(-p * F.log(p))
    mi = (
        joint.join(F.broadcast(ml), "lang")
        .join(F.broadcast(ms), "source")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(mi_term).cast("double").alias("mi"),
            F.sum(hj_term).cast("double").alias("h_joint"),
        )
    )
    pl = F.col("nl") / F.col("t")
    hl = ml.crossJoin(F.broadcast(tot)).agg(
        F.sum(_dec12(-pl * F.log(pl))).cast("double").alias("h_lang")
    )
    ps = F.col("ns") / F.col("t")
    hs = ms.crossJoin(F.broadcast(tot)).agg(
        F.sum(_dec12(-ps * F.log(ps))).cast("double").alias("h_source")
    )
    return (
        mi.crossJoin(F.broadcast(hl))
        .crossJoin(F.broadcast(hs))
        .crossJoin(F.broadcast(tot.select("n_docs")))
        .select(
            F.round("mi", 6).alias("mi_nats"),
            F.round("h_lang", 6).alias("h_lang"),
            F.round("h_source", 6).alias("h_source"),
            F.round("h_joint", 6).alias("h_joint"),
            F.round(
                F.col("mi") / F.least(F.col("h_lang"), F.col("h_source")), 6
            ).alias("redundancy"),
            "n_docs",
        )
    )


@register(
    "quality_embedding_norm_outliers",
    family="quality",
    doc="Embedding-norm audit per label — degenerate vectors (near-zero "
    "or exploded norms) poison cosine ANN indexes, so index builds gate "
    "on exactly this report: n, mean/std of the L2 norm, and the count "
    "of |z| > 2 outliers.  Norms are rounded to 6 and DECIMAL-cast "
    "before the moment sums (order-independent, exact), the z-test "
    "reuses those sums broadcast back onto the per-vector frame — two "
    "scans of the (vec_id, norm) projection, one of them over a "
    "label-keyed broadcast join, no window.",
    oracle="""
WITH norms AS (
  SELECT label,
         CAST(ROUND(sqrt(list_dot_product(
             list_transform(embedding, x -> CAST(x AS DOUBLE)),
             list_transform(embedding, x -> CAST(x AS DOUBLE)))), 6)
           AS DECIMAL(18,6)) AS nrm
  FROM embeddings
),
stats AS (
  SELECT label,
         COUNT(*) AS n,
         CAST(SUM(nrm) AS DOUBLE) AS s1,
         CAST(SUM(CAST(nrm AS DECIMAL(28,12)) * nrm) AS DOUBLE) AS s2
  FROM norms GROUP BY label
),
enriched AS (
  SELECT label, n,
         s1 / n AS mean_n,
         sqrt(GREATEST(s2 / n - (s1 / n) * (s1 / n), 0.0)) AS std_n
  FROM stats
)
SELECT e.label,
       CAST(e.n AS BIGINT) AS n_vectors,
       ROUND(e.mean_n, 6) AS mean_norm,
       ROUND(e.std_n, 6) AS std_norm,
       CAST(SUM(CASE WHEN ABS(CAST(nrm AS DOUBLE) - e.mean_n)
                          > 2 * e.std_n THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM norms v JOIN enriched e USING (label)
GROUP BY e.label, e.n, e.mean_n, e.std_n
""",
)
def quality_embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import vectors as V

    e = table(spark, sf_dir, "embeddings")
    v = V.to_double_array(F.col("embedding"))
    norms = e.select(
        "label",
        F.round(F.sqrt(V.dot(v, v)), 6).cast("decimal(18,6)").alias("nrm"),
    )
    stats = norms.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("nrm").cast("double").alias("s1"),
        F.sum(F.col("nrm").cast("decimal(28,12)") * F.col("nrm"))
        .cast("double")
        .alias("s2"),
    )
    mean_n = F.col("s1") / F.col("n")
    enriched = stats.select(
        "label",
        "n",
        mean_n.alias("mean_n"),
        F.sqrt(F.greatest(F.col("s2") / F.col("n") - mean_n * mean_n, F.lit(0.0)))
        .alias("std_n"),
    )
    return (
        norms.join(F.broadcast(enriched), "label")
        .groupBy("label", "n", "mean_n", "std_n")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("nrm").cast("double") - F.col("mean_n"))
                    > 2 * F.col("std_n"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers")
        )
        .select(
            "label",
            F.col("n").cast("bigint").alias("n_vectors"),
            F.round("mean_n", 6).alias("mean_norm"),
            F.round("std_n", 6).alias("std_norm"),
            "n_outliers",
        )
    )


def _pca_power_oracle(dim: int = 64, iters: int = 3) -> str:
    """Generated oracle replaying every power iteration as chained CTEs —
    same contract as graph_pagerank_centrality's unrolled oracle:
    identical rounding/DECIMAL casts at every step, so any drift in the
    Spark operator's arithmetic breaks the hash."""
    blocks = [
        "emb AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) "
        "AS x FROM embeddings)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM emb)",
        f"dims AS (SELECT UNNEST(range({dim})) AS i)",
        "mu_i AS (SELECT d.i, CAST(SUM(CAST(ROUND(x[d.i + 1], 12) AS "
        "DECIMAL(38,12))) AS DOUBLE) / (SELECT n FROM nn) AS m "
        "FROM emb, dims d GROUP BY d.i)",
        "muv AS (SELECT list(m ORDER BY i) AS mu FROM mu_i)",
        f"cent AS (SELECT list_transform(range({dim}), j -> x[j + 1] - "
        "mu[j + 1]) AS x FROM emb, muv)",
        f"v0 AS (SELECT list_transform(range({dim}), "
        "j -> CASE WHEN j = 0 THEN 1.0 ELSE 0.0 END) AS v)",
    ]
    prev = "v0"
    for t in range(1, iters + 1):
        blocks += [
            f"s{t} AS (SELECT c.x, CAST(ROUND(list_dot_product(c.x, "
            f"{prev}.v), 12) AS DECIMAL(38,12)) AS s FROM cent c, {prev})",
            f"u{t} AS (SELECT d.i, CAST(SUM(CAST(ROUND(x[d.i + 1] * "
            f"CAST(s AS DOUBLE), 12) AS DECIMAL(38,12))) AS DOUBLE) AS u "
            f"FROM s{t}, dims d GROUP BY d.i)",
            f"n{t} AS (SELECT sqrt(CAST(SUM(CAST(ROUND(u * u, 12) AS "
            f"DECIMAL(38,12))) AS DOUBLE)) AS nrm FROM u{t})",
            f"v{t} AS (SELECT list(ROUND(u / nrm, 12) ORDER BY i) AS v "
            f"FROM u{t}, n{t})",
        ]
        prev = f"v{t}"
    return (
        "WITH " + ",\n".join(blocks) + f"""
SELECT CAST(d.i AS INTEGER) AS i,
       ROUND(v[d.i + 1], 6) AS component,
       ROUND((SELECT nrm FROM n{iters}) / (SELECT n FROM nn), 6)
         AS eigenvalue,
       CAST((SELECT n FROM nn) AS BIGINT) AS n_vectors
FROM {prev}, dims d
"""
    )


@register(
    "embedding_pca_power",
    family="similarity",
    doc="Top principal component of the centered embedding cloud via 3 "
    "matrix-free power iterations (operators/pca.py) — the whitening/"
    "diagnostic step ahead of ANN index builds.  PageRank's shape "
    "transplanted to linear algebra: per iteration one corpus scan "
    "produces per-row scalar products, the only shuffle is the 64-key "
    "dimension aggregate, and the iterate rides as a broadcast 1-row "
    "array (no driver collect of data).  Deterministic/oracle-matched "
    "end-to-end: scores and contributions rounded+DECIMAL-cast before "
    "sums, iterates rounded to 12, the oracle replays all three "
    "iterations (generated CTEs).  Output: the unit eigenvector (64 "
    "rows) with the ‖u‖/n eigenvalue estimate.",
    oracle=_pca_power_oracle(),
)
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pca import power_iteration_top_component

    e = table(spark, sf_dir, "embeddings")
    return power_iteration_top_component(e, dim=64, iters=3)


def _pca_projection_oracle(dim: int = 64, iters: int = 5, k: int = 2) -> str:
    """Generated oracle for the full Gram → eigsolve → project pass:
    exact-decimal Gram, every power iteration and the Hotelling
    deflation replayed as MATERIALIZED CTEs (DuckDB inlines plain CTEs —
    NOTES gotcha 11), identical rounding at every step."""
    blocks = [
        "emb AS (SELECT vec_id, label, list_transform(embedding, "
        "x -> CAST(x AS DOUBLE)) AS x FROM embeddings)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM emb)",
        f"dims AS (SELECT UNNEST(range({dim})) AS i)",
        "mu_i AS (SELECT d.i, CAST(SUM(CAST(ROUND(x[d.i + 1], 12) AS "
        "DECIMAL(38,12))) AS DOUBLE) / (SELECT n FROM nn) AS m "
        "FROM emb, dims d GROUP BY d.i)",
        "muv AS (SELECT list(m ORDER BY i) AS mu FROM mu_i)",
        f"cent AS MATERIALIZED (SELECT vec_id, label, "
        f"list_transform(range({dim}), j -> x[j + 1] - mu[j + 1]) AS x "
        "FROM emb, muv)",
        f"pairs AS (SELECT a.i AS i, b.j AS j FROM UNNEST(range({dim})) a(i), "
        f"UNNEST(range({dim})) b(j) WHERE a.i <= b.j)",
        "g_up AS (SELECT p.i, p.j, CAST(SUM(CAST(ROUND(x[p.i + 1] * "
        "x[p.j + 1], 12) AS DECIMAL(38,12))) AS DOUBLE) AS gram "
        "FROM cent, pairs p GROUP BY 1, 2)",
        "g0 AS MATERIALIZED (SELECT i, j, gram FROM g_up "
        "UNION ALL SELECT j AS i, i AS j, gram FROM g_up WHERE i < j)",
    ]
    for c in range(k):
        blocks.append(
            f"c{c}v0 AS (SELECT d.i, CASE WHEN d.i = 0 THEN 1.0 ELSE 0.0 END "
            "AS vc FROM dims d)"
        )
        for t in range(1, iters + 1):
            blocks += [
                f"c{c}u{t} AS MATERIALIZED (SELECT g.i, "
                "CAST(SUM(CAST(ROUND(g.gram * v.vc, 12) AS DECIMAL(38,12))) "
                f"AS DOUBLE) AS u FROM g{c} g JOIN c{c}v{t - 1} v "
                "ON g.j = v.i GROUP BY g.i)",
                f"c{c}n{t} AS MATERIALIZED (SELECT sqrt(CAST(SUM(CAST("
                "ROUND(u * u, 12) AS DECIMAL(38,12))) AS DOUBLE)) AS nrm "
                f"FROM c{c}u{t})",
                f"c{c}v{t} AS MATERIALIZED (SELECT i, ROUND(u / nrm, 12) "
                f"AS vc FROM c{c}u{t}, c{c}n{t})",
            ]
        if c < k - 1:
            blocks.append(
                f"g{c + 1} AS MATERIALIZED (SELECT g.i, g.j, "
                f"ROUND(g.gram - (SELECT nrm FROM c{c}n{iters}) * a.vc * b.vc, "
                f"12) AS gram FROM g{c} g "
                f"JOIN c{c}v{iters} a ON g.i = a.i "
                f"JOIN c{c}v{iters} b ON g.j = b.i)"
            )
    blocks += [
        "ce AS MATERIALIZED (SELECT vec_id, label, d.i, x[d.i + 1] AS ci "
        "FROM cent, dims d)",
    ]
    ys = []
    for c in range(k):
        blocks.append(
            f"y{c} AS (SELECT vec_id, CAST(SUM(CAST(ROUND(ci * v.vc, 12) AS "
            f"DECIMAL(38,12))) AS DOUBLE) AS y FROM ce JOIN c{c}v{iters} v "
            "ON ce.i = v.i GROUP BY vec_id)"
        )
        ys.append(f"ROUND(y{c}.y, 6) AS y{c + 1}")
    joins = " ".join(f"JOIN y{c} ON y{c}.vec_id = e.vec_id" for c in range(k))
    return (
        "WITH "
        + ",\n".join(blocks)
        + f"""
SELECT e.vec_id, e.label, {", ".join(ys)}
FROM (SELECT DISTINCT vec_id, label FROM emb) e {joins}
"""
    )


@register(
    "embedding_pca_projection",
    family="similarity",
    doc="The FULL dimensionality-reduction pass a curation pipeline runs, "
    "composing the two primitives that exist separately as "
    "embedding_gram_matrix and embedding_pca_power: exact-decimal Gram of "
    "the centered cloud (operators/linalg.py::gram_matrix_exact — "
    "pair-explode into a (i,j)-keyed hash aggregate, so map-side combine "
    "keeps shuffle traffic at d² per partition like the blocked-BLAS "
    "twin), then the eigsolve ON THE d×d TABLE (gram_power_components — "
    "5 power iterations + Hotelling deflation for the top 2 components, "
    "all state broadcast-sized, corpus never rescanned), then one "
    "corpus-scan projection onto the component pair.  Deterministic "
    "end-to-end (round-12 + DECIMAL sums at every step); the generated "
    "oracle replays the Gram, all 10 iterations, the deflation and the "
    "projection as MATERIALIZED CTEs.  Output: (vec_id, label, y1, y2) — "
    "the 2-D embedding of every vector.",
    oracle=_pca_projection_oracle(),
)
def embedding_pca_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.linalg import gram_matrix_exact, gram_power_components

    dim, iters, k = 64, 5, 2
    e = table(spark, sf_dir, "embeddings")
    x = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    base = e.select("vec_id", "label", x.alias("x"))
    # exact decimal column means -> centered cloud (broadcast 1-row mu)
    mu_i = (
        base.select(F.posexplode("x").alias("i", "xi"))
        .groupBy("i")
        .agg(
            F.sum(F.round(F.col("xi"), 12).cast("decimal(38,12)")).alias("sx"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("i", (F.col("sx").cast("double") / F.col("n")).alias("m"))
    )
    muv = mu_i.agg(
        F.array_sort(F.collect_list(F.struct("i", "m"))).alias("s")
    ).select(F.transform("s", lambda s: s["m"]).alias("mu"))
    # small-file inputs arrive as one split; the Gram's d²-per-row fan-out
    # and the projection both read this checkpoint, so spread it across
    # cores before materializing (no-op at real scale, where the scan
    # already has >= cores splits; decimal sums are order-independent so
    # values are unchanged)
    par = spark.sparkContext.defaultParallelism
    cloud = base.repartition(par) if base.rdd.getNumPartitions() < par else base
    cent = (
        cloud.crossJoin(F.broadcast(muv))
        .select(
            "vec_id",
            "label",
            F.zip_with("x", "mu", lambda a, b: a - b).alias("x"),
        )
        .localCheckpoint(eager=True)  # consumed by the Gram AND the projection
    )
    gram = gram_matrix_exact(cent, "x", upper_only=True)
    comps = gram_power_components(gram, dim=dim, k=k, iters=iters)
    ce = cent.select("vec_id", "label", F.posexplode("x").alias("i", "ci"))
    proj = (
        ce.join(F.broadcast(comps.select("comp_idx", "i", "vc")), "i")
        .groupBy("vec_id", "label", "comp_idx")
        .agg(
            F.sum(F.round(F.col("ci") * F.col("vc"), 12).cast("decimal(38,12)"))
            .cast("double")
            .alias("y")
        )
    )
    return proj.groupBy("vec_id", "label").agg(
        F.round(F.max(F.when(F.col("comp_idx") == 0, F.col("y"))), 6).alias("y1"),
        F.round(F.max(F.when(F.col("comp_idx") == 1, F.col("y"))), 6).alias("y2"),
    )
