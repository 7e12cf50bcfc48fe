"""Round-8 additions: multi-page TIFF (the IFD-chain + RGB codec
seams closed this round), SemDeDup-style semantic dedup, and scale
reworks proven by oracle parity.

Oracle discipline per plans/registry.py: deterministic fixtures with
closed-form pixel/centroid formulas, MATERIALIZED CTEs for anything
read twice.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import register, table


# ---------------------------------------------------------------------------
# Multi-IFD (multi-page) TIFF with mixed grayscale / chunky-RGB pages
# ---------------------------------------------------------------------------


@register(
    "multimodal_tiff_multipage_stats",
    family="multimodal",
    doc="Per-page pixel statistics over the REAL multi-IFD TIFF decode "
    "path (operators/tiff.py::decode_tiff_pages — the next-IFD pointer "
    "chain every fax bundle / multi-sheet scan uses, plus 3-sample "
    "chunky RGB pages with the out-of-line BitsPerSample array): the "
    "two codec seams round 7 left raising are now real decoders.  "
    "Fixtures chain id%3+2 pages alternating grayscale and RGB, with "
    "per-page PackBits/uncompressed mix and per-file byte order; the "
    "closed-form sample formula (id*5 + 7p + 3y + x div 4 + 50c) makes "
    "the oracle break on any wrong page boundary, channel interleave "
    "or strip assembly.  Blobs never leave the executor Arrow batch; "
    "narrow per-page stat rows aggregate by (page_idx, channels, "
    "width).",
    oracle="""
WITH pg AS (
  SELECT doc_id, p.p AS p,
         (doc_id + 2 * p.p) % 14 + 4 AS w,
         (doc_id + 3 * p.p) % 8 + 3 AS h,
         CASE WHEN p.p % 2 = 0 THEN 1 ELSE 3 END AS ch
  FROM documents, UNNEST(range(0, 4)) AS p(p)
  WHERE p.p < doc_id % 3 + 2
),
px AS (
  SELECT doc_id, p, w, h, ch,
         (doc_id * 5 + 7 * p + 3 * ys.y + xs.x // 4 + 50 * cs.c) % 256 AS v
  FROM pg,
       UNNEST(range(0, w)) AS xs(x),
       UNNEST(range(0, h)) AS ys(y),
       UNNEST(range(0, ch)) AS cs(c)
),
per AS (
  SELECT doc_id, p, w, ch,
         CAST(SUM(v) AS BIGINT) AS s, MIN(v) AS mn, MAX(v) AS mx
  FROM px GROUP BY 1, 2, 3, 4
)
SELECT CAST(p AS INT) AS page_idx, CAST(ch AS INT) AS channels,
       CAST(w AS INT) AS width,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(SUM(s) AS BIGINT) AS px_sum,
       CAST(MIN(mn) AS INT) AS px_min,
       CAST(MAX(mx) AS INT) AS px_max
FROM per GROUP BY 1, 2, 3
""",
)
def multimodal_tiff_multipage_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.tiff import (
        synthesize_tiff_multipage_media,
        tiff_multipage_stats,
    )

    d = table(spark, sf_dir, "documents")
    stats = tiff_multipage_stats(
        synthesize_tiff_multipage_media(d.select("doc_id"))
    )
    return stats.groupBy(
        F.col("page_idx").cast("int").alias("page_idx"),
        F.col("channels").cast("int").alias("channels"),
        F.col("width").cast("int").alias("width"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pages"),
        F.sum("px_sum").cast("bigint").alias("px_sum"),
        F.min("px_min").cast("int").alias("px_min"),
        F.max("px_max").cast("int").alias("px_max"),
    )


# ---------------------------------------------------------------------------
# SemDeDup-style semantic deduplication (rank-band variant)
# ---------------------------------------------------------------------------

SD_K = 8
SD_BAND = 10
SD_T = 0.38
SD_DIM = 64


def _semdedup_oracle(
    k: int = SD_K, band: int = SD_BAND, t: float = SD_T, dim: int = SD_DIM
) -> str:
    d2 = (
        f"ROUND(CAST(list_sum(list_transform(range({dim}), i -> "
        "CAST(ROUND((e.x[i+1] - c.cv[i+1]) * (e.x[i+1] - c.cv[i+1]), 12) "
        "AS DECIMAL(38,12)))) AS DOUBLE), 6)"
    )
    return f"""
WITH emb AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS x
  FROM embeddings
),
seeds AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c, x AS cv
  FROM emb WHERE vec_id IN (SELECT vec_id FROM emb ORDER BY vec_id LIMIT {k})
),
s AS (SELECT e.vec_id, c.c, {d2} AS d2 FROM emb e CROSS JOIN seeds c),
a AS MATERIALIZED (
  SELECT vec_id, c, d2 FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC)
      AS rn FROM s) WHERE rn = 1
),
r AS MATERIALIZED (
  SELECT vec_id, c, d2,
         ROW_NUMBER() OVER (PARTITION BY c ORDER BY d2 ASC, vec_id ASC) AS rnk
  FROM a
),
cand AS (
  SELECT x.c, x.vec_id AS id_a, y.vec_id AS id_b
  FROM r x JOIN r y ON x.c = y.c AND y.rnk BETWEEN x.rnk + 1 AND x.rnk + {band}
),
dup AS MATERIALIZED (
  SELECT cand.c, id_a, id_b,
         ROUND(list_dot_product(ea.x, eb.x) /
           (sqrt(list_dot_product(ea.x, ea.x)) *
            sqrt(list_dot_product(eb.x, eb.x))), 6) AS cosine
  FROM cand
  JOIN emb ea ON ea.vec_id = id_a
  JOIN emb eb ON eb.vec_id = id_b
  WHERE list_dot_product(ea.x, eb.x) /
          (sqrt(list_dot_product(ea.x, ea.x)) *
           sqrt(list_dot_product(eb.x, eb.x))) >= {t}
),
per AS (
  SELECT c, CAST(COUNT(*) AS BIGINT) AS n_dup_pairs,
         CAST(COUNT(DISTINCT id_b) AS BIGINT) AS n_removed,
         CAST(SUM(CAST(cosine AS DECIMAL(18,6))) AS DOUBLE) AS cos_mass,
         MAX(cosine) AS max_cosine
  FROM dup GROUP BY c
)
SELECT CAST(m.c AS INT) AS cell,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       COALESCE(ANY_VALUE(p.n_dup_pairs), 0) AS n_dup_pairs,
       COALESCE(ANY_VALUE(p.n_removed), 0) AS n_removed,
       ROUND(COALESCE(ANY_VALUE(p.cos_mass), 0.0), 6) AS cos_mass,
       ROUND(COALESCE(ANY_VALUE(p.max_cosine), 0.0), 6) AS max_cosine
FROM a m LEFT JOIN per p ON p.c = m.c
GROUP BY m.c
"""


@register(
    "dedup_semdedup_band",
    family="dedup",
    doc="SemDeDup-style semantic dedup (operators/semdedup.py; Abbas "
    "et al. 2023): one corpus scan assigns every embedding to its "
    "nearest of k=8 BROADCAST seed centroids (the ivf.py coarse-"
    "quantizer shape, DECIMAL round-12/round-6 distance discipline), "
    "members rank by (distance-to-centroid, id) inside their cell, and "
    "near-duplicate candidates are ONLY the 10 ranks after each member "
    "— an explode-of-offsets equi-join on (cell, rank), exactly "
    "N·band rows, never the paper's within-cluster all-pairs (which "
    "is only tractable when k grows with N).  Exact duplicates have "
    "identical centroid distance, so they sit on adjacent ranks and "
    "are always caught; near-dups concentrate nearby by the triangle "
    "inequality — the bounded-recall trade MinHash-LSH makes for "
    "Jaccard, applied to embedding space.  Survivors follow the "
    "paper's rule (keep the member closest to the centroid).  Output "
    "per cell: members, dup pairs, removals, DECIMAL-summed cosine "
    "mass.  The generated oracle replays assignment, ranking, band "
    "join and cosine verify bit-for-bit.",
    oracle=_semdedup_oracle(),
)
def dedup_semdedup_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.semdedup import semantic_dedup_summary

    e = table(spark, sf_dir, "embeddings")
    return semantic_dedup_summary(e, k=SD_K, band=SD_BAND, threshold=SD_T)


# ---------------------------------------------------------------------------
# Borůvka minimum spanning forest (bulk-parallel MST)
# ---------------------------------------------------------------------------

MST_ORDER_CAP = 600
MST_ROUNDS = 4


def _boruvka_oracle(cap: int = MST_ORDER_CAP, rounds: int = MST_ROUNDS) -> str:
    blocks = [
        f"""li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey < {cap}
),
e0 AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
e AS MATERIALIZED (SELECT u, v, (u * 7 + v * 13) % 1000 AS w FROM e0),
n AS (SELECT u AS node FROM e UNION SELECT v FROM e),
c0 AS MATERIALIZED (SELECT node, node AS c FROM n)"""
    ]
    for t in range(1, rounds + 1):
        blocks.append(
            f"""ce{t} AS (
  SELECT a.c AS cu, b.c AS cv, e.u, e.v, e.w
  FROM e JOIN c{t - 1} a ON a.node = e.u JOIN c{t - 1} b ON b.node = e.v
  WHERE a.c <> b.c
),
both{t} AS (
  SELECT cu AS c, w, u, v, cv AS oc FROM ce{t}
  UNION ALL SELECT cv, w, u, v, cu FROM ce{t}
),
pick{t} AS MATERIALIZED (
  SELECT c, oc, u, v, w FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY c ORDER BY w, u, v) AS rn
    FROM both{t}) WHERE rn = 1
),
par{t} AS MATERIALIZED (
  SELECT p.c, CASE WHEN q.oc = p.c THEN LEAST(p.c, p.oc) ELSE p.oc END AS par
  FROM pick{t} p LEFT JOIN pick{t} q ON q.c = p.oc
),
walk{t}(c, cur) AS (
  SELECT c, par FROM par{t}
  UNION ALL
  SELECT w.c, p.par FROM walk{t} w JOIN par{t} p ON p.c = w.cur
  WHERE p.par <> w.cur
),
root{t} AS MATERIALIZED (
  SELECT c, cur AS root FROM walk{t} w
  WHERE NOT EXISTS (
    SELECT 1 FROM par{t} p WHERE p.c = w.cur AND p.par <> p.c)
),
c{t} AS MATERIALIZED (
  SELECT m.node, COALESCE(r.root, m.c) AS c
  FROM c{t - 1} m LEFT JOIN root{t} r ON r.c = m.c
)"""
        )
    per_round = "\nUNION ALL ".join(
        f"SELECT {t} AS round, CAST(COUNT(*) AS BIGINT) AS n_edges, "
        f"CAST(SUM(w) AS BIGINT) AS w_sum "
        f"FROM (SELECT DISTINCT u, v, w FROM pick{t})"
        for t in range(1, rounds + 1)
    )
    return (
        "WITH RECURSIVE "
        + ",\n".join(blocks)
        + f"\n{per_round}\nORDER BY round"
    )


@register(
    "graph_boruvka_msf",
    family="graph",
    doc="Borůvka minimum spanning forest (operators/mst.py, 4 bulk "
    "rounds): per round EVERY component picks its minimum outgoing "
    "edge under the TOTAL order (w, u, v) — one (component)-keyed hash "
    "aggregate after two node-keyed label joins — and the picked edges "
    "contract components by pointer jumping (the only cycles in the "
    "pointer graph are mutual-min 2-cycles, provable from order "
    "totality, so cycle breaking is local).  Component count at least "
    "halves per round; 4 fixed rounds give the replayable partial "
    "forest (the ktruss convention), log2(n) rounds the full MSF — the "
    "naturally data-parallel MST every distributed framework uses "
    "(Lattanzi et al. MapReduce filtering).  Graph: co-purchase parts "
    "(orders < 600), weight (7u+13v) mod 1000.  Output: per-round "
    "picked-edge count and weight sum — wrong labels in round t "
    "corrupt every later round, so the hash verifies the whole "
    "contraction cascade.  The generated oracle replays each round "
    "with a recursive-CTE pointer-chain resolution.",
    oracle=_boruvka_oracle(),
)
def graph_boruvka_msf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mst import boruvka_forest

    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < MST_ORDER_CAP)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    e = (
        a.join(b, (a["ok"] == b["ok"]) & (F.col("u") < F.col("v")))
        .select("u", "v")
        .distinct()
        .withColumn("w", (F.col("u") * 7 + F.col("v") * 13) % 1000)
    )
    picked, _comp = boruvka_forest(e, rounds=MST_ROUNDS)
    return (
        picked.groupBy("round")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_edges"),
            F.sum("w").cast("bigint").alias("w_sum"),
        )
        .orderBy("round")
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (MOSS) — sublinear near-dup fingerprint selection
# ---------------------------------------------------------------------------

WIN_K = 5          # words per shingle
WIN_W = 4          # winnowing window (shingles per window)
WIN_POS_BITS = 20  # pos packed below the hash: docs < 2^20 shingles
WIN_MAXDF = 50     # stop-fingerprint guard: drop gh seen in > 50 docs
WIN_MINSHARED = 3  # surface pairs sharing >= 3 fingerprints

_WIN_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ts FROM documents
),
idx AS (
  SELECT doc_id, ts, UNNEST(range(1, len(ts) - {WIN_K} + 2)) AS i FROM toks
),
ng AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         array_to_string(ts[i:i+{WIN_K - 1}], ' ') AS g
  FROM idx
),
h AS (
  SELECT doc_id, pos,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, LENGTH(g) + 1),
             j -> CAST(ascii(substr(g, CAST(j AS INTEGER), 1)) AS BIGINT))),
           (acc, c) -> (acc * 31 + c) % 2147483647) AS gh,
         COUNT(*) OVER (PARTITION BY doc_id) AS n_ng
  FROM ng
),
sel AS (
  SELECT doc_id, pos, n_ng,
         MIN(gh * {1 << WIN_POS_BITS} + ({(1 << WIN_POS_BITS) - 1} - pos)) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {WIN_W - 1} FOLLOWING) AS wkey
  FROM h
),
fps0 AS (
  SELECT DISTINCT doc_id, wkey // {1 << WIN_POS_BITS} AS gh
  FROM sel WHERE pos <= n_ng - {WIN_W}
),
ok AS (SELECT gh FROM fps0 GROUP BY gh HAVING COUNT(*) <= {WIN_MAXDF}),
fps AS (SELECT f.doc_id, f.gh FROM fps0 f JOIN ok USING (gh)),
cnt AS (SELECT doc_id, COUNT(*) AS n_fp FROM fps GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
  FROM fps a JOIN fps b ON a.gh = b.gh AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING COUNT(*) >= {WIN_MINSHARED}
)
SELECT CAST(p.doc_a AS BIGINT) AS doc_a,
       CAST(p.doc_b AS BIGINT) AS doc_b,
       CAST(p.shared AS BIGINT) AS shared,
       ROUND(CAST(p.shared AS DOUBLE) / (ca.n_fp + cb.n_fp - p.shared), 6)
         AS sim
FROM pairs p
JOIN cnt ca ON ca.doc_id = p.doc_a
JOIN cnt cb ON cb.doc_id = p.doc_b
"""


@register(
    "dedup_winnowing_pairs",
    family="dedup",
    doc="Winnowing fingerprint near-dup pairs (Schleimer/Wilkerson/"
    "Aiken SIGMOD'03 — the MOSS algorithm): word-5-gram shingles are "
    "rolling-hashed, and each sliding window of 4 consecutive shingle "
    "hashes SELECTS its minimum (ties to the rightmost position — "
    "robust winnowing, packed as hash*2^20 + (2^20-1-pos) so one "
    "integer MIN implements the lexicographic rule on both engines), "
    "guaranteeing any shared substring of >= w+k-1 words yields a "
    "shared fingerprint while storing only ~2/(w+1) of the shingles — "
    "the sublinear-storage middle ground between exact-substring "
    "dedup (dedup_duplicate_spans) and MinHash sketching.  Pairs "
    "sharing >= 3 selected fingerprints are surfaced with a "
    "fingerprint-Jaccard estimate.  Scale shape: one explode, one "
    "bounded per-doc window (ROWS frame, partitioned by doc), distinct, "
    "a document-frequency stop-fingerprint guard (df <= 50 caps any "
    "bucket fan-out, the same skew bound as the LSH star-cap), and a "
    "fingerprint-keyed equi-join — never an all-pairs comparison.  "
    "Position packing assumes < 2^20 shingles/doc; chunk longer docs.",
    oracle=_WIN_ORACLE,
)
def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.winnow import winnowing_fingerprints, winnowing_pairs

    d = table(spark, sf_dir, "documents")
    fps = winnowing_fingerprints(
        d, k=WIN_K, w=WIN_W, max_df=WIN_MAXDF, pos_bits=WIN_POS_BITS
    )
    cnt = fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    pairs = winnowing_pairs(
        d, k=WIN_K, w=WIN_W, max_df=WIN_MAXDF,
        min_shared=WIN_MINSHARED, pos_bits=WIN_POS_BITS,
    )
    return (
        pairs.join(cnt.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_fp", "n_fp_a")
        .join(cnt.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .select(
            F.col("doc_a").cast("bigint").alias("doc_a"),
            F.col("doc_b").cast("bigint").alias("doc_b"),
            F.col("shared").cast("bigint").alias("shared"),
            F.round(
                F.col("shared").cast("double")
                / (F.col("n_fp_a") + F.col("n_fp") - F.col("shared")),
                6,
            ).alias("sim"),
        )
    )


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss random projection (sign matrix, functional)
# ---------------------------------------------------------------------------

JL_DIM = 64
JL_K = 8
JL_PROBE = 8
_JL_A, _JL_B, _JL_P = 2654435761, 40503, 2147483647

_JL_SIGN_SQL = (
    f"(CASE WHEN (((j + 1) * {_JL_A} + (s.k + 1) * {_JL_B}) "
    f"% {_JL_P}) % 2 = 0 THEN 1 ELSE -1 END)"
)

_JL_ORACLE = f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS x
  FROM embeddings
),
dims AS (SELECT UNNEST(range({JL_DIM})) AS j),
ex AS MATERIALIZED (
  SELECT vec_id, d.j, x[d.j + 1] AS xj FROM emb, dims d
),
ks AS (SELECT UNNEST(range({JL_K})) AS k),
y AS MATERIALIZED (
  SELECT vec_id, s.k,
         CAST(SUM(CAST(ROUND(xj * {_JL_SIGN_SQL}, 12) AS DECIMAL(38,12)))
              AS DOUBLE) / sqrt({JL_K}.0) AS y
  FROM ex, ks s GROUP BY 1, 2
),
pe AS (SELECT * FROM ex WHERE vec_id < {JL_PROBE}),
orig AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         CAST(SUM(CAST(ROUND((a.xj - b.xj) * (a.xj - b.xj), 12)
              AS DECIMAL(38,12))) AS DOUBLE) AS d2
  FROM pe a JOIN pe b ON a.j = b.j AND a.vec_id < b.vec_id
  GROUP BY 1, 2
),
yp AS (SELECT * FROM y WHERE vec_id < {JL_PROBE}),
proj AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         CAST(SUM(CAST(ROUND((a.y - b.y) * (a.y - b.y), 12)
              AS DECIMAL(38,12))) AS DOUBLE) AS d2
  FROM yp a JOIN yp b ON a.k = b.k AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT CAST(o.va AS BIGINT) AS vec_a, CAST(o.vb AS BIGINT) AS vec_b,
       ROUND(o.d2, 6) AS orig_d2, ROUND(p.d2, 6) AS proj_d2,
       ROUND(p.d2 / o.d2, 6) AS ratio
FROM orig o JOIN proj p ON p.va = o.va AND p.vb = o.vb
"""


@register(
    "embedding_jl_projection",
    family="similarity",
    doc="Johnson–Lindenstrauss random projection (Achlioptas'03 sign "
    "variant): every 64-d embedding is projected to 8-d as y_k = "
    "(1/sqrt(8)) * sum_j sign(j,k) * x_j, with the +-1 sign matrix "
    "FUNCTIONAL — sign(j,k) from a Knuth-multiplicative hash of the "
    "(dimension, component) pair — so there is no model state at all: "
    "no broadcast, no training scan, just one O(N*d*K) map-side "
    "fan-out into a (vec_id,k)-keyed hash aggregate.  That is the "
    "whole 100 TB story of JL: the cheapest dimensionality reduction "
    "that still guarantees (1+-eps) pairwise-distance preservation, "
    "and the standard preconditioner in front of clustering / ANN "
    "when PCA's covariance pass is too expensive.  The audit output "
    "surfaces the guarantee: all 28 probe pairs (vec_id < 8) with "
    "exact-decimal squared L2 before and after projection and the "
    "distortion ratio.  Decimal-sum discipline at every reduction "
    "(ROUND 12 then DECIMAL(38,12) sum) keeps both engines "
    "order-independent and bit-identical.",
    oracle=_JL_ORACLE,
)
def embedding_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    x = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    ex = e.select("vec_id", x.alias("x")).select(
        "vec_id", F.posexplode("x").alias("j", "xj")
    )
    exk = ex.select(
        "vec_id",
        "j",
        "xj",
        F.explode(F.sequence(F.lit(0), F.lit(JL_K - 1))).alias("k"),
    )
    sign = F.when(
        ((F.col("j") + 1) * F.lit(_JL_A) + (F.col("k") + 1) * F.lit(_JL_B))
        % F.lit(_JL_P) % 2
        == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    y = (
        exk.groupBy("vec_id", "k")
        .agg(
            F.sum(
                F.round(F.col("xj") * sign, 12).cast("decimal(38,12)")
            ).alias("s")
        )
        .select(
            "vec_id",
            "k",
            (F.col("s").cast("double") / F.lit(float(JL_K) ** 0.5)).alias("y"),
        )
    )
    pe = ex.where(F.col("vec_id") < JL_PROBE)
    pa = pe.select(F.col("vec_id").alias("va"), "j", F.col("xj").alias("xa"))
    pb = pe.select(F.col("vec_id").alias("vb"), "j", F.col("xj").alias("xb"))
    orig = (
        pa.join(pb, "j")
        .where(F.col("va") < F.col("vb"))
        .groupBy("va", "vb")
        .agg(
            F.sum(
                F.round(
                    (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")),
                    12,
                ).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("orig_d2")
        )
    )
    yp = y.where(F.col("vec_id") < JL_PROBE)
    ya = yp.select(F.col("vec_id").alias("va"), "k", F.col("y").alias("ya"))
    yb = yp.select(F.col("vec_id").alias("vb"), "k", F.col("y").alias("yb"))
    proj = (
        ya.join(yb, "k")
        .where(F.col("va") < F.col("vb"))
        .groupBy("va", "vb")
        .agg(
            F.sum(
                F.round(
                    (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")),
                    12,
                ).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("proj_d2")
        )
    )
    return orig.join(proj, ["va", "vb"]).select(
        F.col("va").cast("bigint").alias("vec_a"),
        F.col("vb").cast("bigint").alias("vec_b"),
        F.round("orig_d2", 6).alias("orig_d2"),
        F.round("proj_d2", 6).alias("proj_d2"),
        F.round(F.col("proj_d2") / F.col("orig_d2"), 6).alias("ratio"),
    )


# ---------------------------------------------------------------------------
# Winnowing ladder — fingerprint pairs -> clusters -> survivor election
# ---------------------------------------------------------------------------

_ELECTION_TAIL_SQL = """
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
csize AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY cluster_id),
gnodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT COUNT(*) AS n FROM gnodes),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
pr0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM gnodes),
{iters},
elect AS (
  SELECT c.cluster_id, s.cluster_size, c.doc_id, ROUND(p.pr, 6) AS pr,
         ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                            ORDER BY ROUND(p.pr, 6) DESC, c.doc_id ASC) AS rn
  FROM comp c
  JOIN csize s USING (cluster_id)
  JOIN pr3 p ON p.node = c.doc_id
  WHERE s.cluster_size >= 2
)
SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(doc_id AS BIGINT) AS survivor_doc_id,
       pr AS survivor_pagerank,
       CAST(cluster_size - 1 AS BIGINT) AS n_dropped
FROM elect WHERE rn = 1
"""


def _election_tail() -> str:
    """The transitive-closure + 3-iteration PageRank + per-cluster
    election SQL tail shared with round7._ladder_oracle (same rounding
    discipline at every step; equality of the two Spark ladders against
    this identical tail pins both pair generators to one election
    semantics).  Expects a ``pairs(doc_a, doc_b)`` CTE upstream."""
    pr_iter = """
pr{t} AS (
  SELECT n2.node,
         ROUND((1.0 - 0.85) / (SELECT n FROM nn)
               + 0.85 * COALESCE(CAST(SUM(CAST(ROUND(p.pr / dg.d, 12)
                     AS DECIMAL(20,12))) AS DOUBLE), 0.0), 12) AS pr
  FROM gnodes n2
  LEFT JOIN edges e ON e.dst = n2.node
  LEFT JOIN pr{p} p ON p.node = e.src
  LEFT JOIN deg dg ON dg.src = e.src
  GROUP BY n2.node
)"""
    iters = ",".join(pr_iter.format(t=t, p=t - 1) for t in (1, 2, 3))
    return _ELECTION_TAIL_SQL.format(iters=iters)


_WIN_PAIRS_SQL = f"""
toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ts FROM documents
),
idx AS (
  SELECT doc_id, ts, UNNEST(range(1, len(ts) - {WIN_K} + 2)) AS i FROM toks
),
ng AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         array_to_string(ts[i:i+{WIN_K - 1}], ' ') AS g
  FROM idx
),
h AS (
  SELECT doc_id, pos,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, LENGTH(g) + 1),
             j -> CAST(ascii(substr(g, CAST(j AS INTEGER), 1)) AS BIGINT))),
           (acc, c) -> (acc * 31 + c) % 2147483647) AS gh,
         COUNT(*) OVER (PARTITION BY doc_id) AS n_ng
  FROM ng
),
sel AS (
  SELECT doc_id, pos, n_ng,
         MIN(gh * {1 << WIN_POS_BITS} + ({(1 << WIN_POS_BITS) - 1} - pos)) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {WIN_W - 1} FOLLOWING) AS wkey
  FROM h
),
fps0 AS (
  SELECT DISTINCT doc_id, wkey // {1 << WIN_POS_BITS} AS gh
  FROM sel WHERE pos <= n_ng - {WIN_W}
),
ok AS (SELECT gh FROM fps0 GROUP BY gh HAVING COUNT(*) <= {WIN_MAXDF}),
fps AS MATERIALIZED (SELECT f.doc_id, f.gh FROM fps0 f JOIN ok USING (gh)),
pairs AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM fps a JOIN fps b ON a.gh = b.gh AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING COUNT(*) >= {WIN_MINSHARED}
)"""


@register(
    "dedup_winnowing_ladder",
    family="dedup",
    doc="The winnowing twin of dedup_ladder_full: MOSS winnowing "
    "fingerprint pairs (same selection pipeline as "
    "dedup_winnowing_pairs — window-min shingle hashes, df<=50 "
    "stop-fingerprint guard, >=3 shared fingerprints) fed through the "
    "SAME downstream composition — connected components by min-label "
    "pointer jumping, PageRank on the symmetrized pair graph, one "
    "survivor elected per cluster of size >=2 "
    "(operators/components.py::elect_survivors).  The oracle replays "
    "the fingerprint pipeline, a recursive-CTE transitive closure, 3 "
    "unrolled PageRank iterations and the election with the identical "
    "SQL tail the LSH ladder uses — the two pair generators are pinned "
    "to one election semantics, so a curation run can swap candidate "
    "generators without touching the dedup decision logic.  Scale "
    "shape: inherited — explode + bounded per-doc window + "
    "fingerprint-keyed join upstream, (node,label) iteration + one "
    "struct-max election downstream; no stage materializes pairs "
    "beyond the candidate graph.",
    oracle="WITH RECURSIVE " + _WIN_PAIRS_SQL + ",\n" + _election_tail(),
)
def dedup_winnowing_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import elect_survivors
    from ..operators.winnow import winnowing_pairs

    d = table(spark, sf_dir, "documents")
    pairs = winnowing_pairs(
        d, k=WIN_K, w=WIN_W, max_df=WIN_MAXDF,
        min_shared=WIN_MINSHARED, pos_bits=WIN_POS_BITS,
    )
    return elect_survivors(
        pairs.select("doc_a", "doc_b"), nodes=d.select("doc_id")
    )


# ---------------------------------------------------------------------------
# Tiled TIFF (TileOffsets layout) — the last major TIFF layout seam
# ---------------------------------------------------------------------------


@register(
    "multimodal_tiff_tiled_stats",
    family="multimodal",
    doc="Pixel statistics over the REAL tiled-TIFF decode path "
    "(operators/tiff.py::encode_tiff_tiled / the TileOffsets branch of "
    "_decode_ifd): the TileWidth/TileLength/TileOffsets/TileByteCounts "
    "layout large scans and geo rasters use so readers can fetch a "
    "spatial region without the whole raster — the layout seam the "
    "strip decoder had raised at since round 7.  Every tile is a full "
    "16x16 raster (edge tiles written padded, clipped on read, per "
    "the spec's edge rule); fixtures are always >= 2 tiles in each "
    "dimension with clipped edges, chunky RGB every 4th id, PackBits/"
    "uncompressed and II/MM mixes, pixel formula id*7 + 3y + x div 5 "
    "+ 50c — the closed-form oracle breaks on any wrong tile origin, "
    "pad clip, channel interleave or run length.  Blobs never leave "
    "the executor Arrow batch; narrow stat rows out.",
    oracle="""
WITH dims AS (
  SELECT doc_id, doc_id % 37 + 17 AS w, doc_id % 23 + 17 AS h,
         CASE WHEN doc_id % 4 = 1 THEN 3 ELSE 1 END AS ch
  FROM documents
),
px AS (
  SELECT doc_id, w, h, ch,
         (doc_id * 7 + 3 * ys.y + xs.x // 5 + 50 * cs.c) % 256 AS v
  FROM dims,
       UNNEST(range(0, w)) AS xs(x),
       UNNEST(range(0, h)) AS ys(y),
       UNNEST(range(0, ch)) AS cs(c)
),
per AS (
  SELECT doc_id, w, ch,
         CAST(SUM(v) AS BIGINT) AS s, MIN(v) AS mn, MAX(v) AS mx
  FROM px GROUP BY 1, 2, 3
)
SELECT CAST(ch AS INT) AS channels, CAST(w AS INT) AS width,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(s) AS BIGINT) AS px_sum,
       CAST(MIN(mn) AS INT) AS px_min,
       CAST(MAX(mx) AS INT) AS px_max
FROM per GROUP BY 1, 2
""",
)
def multimodal_tiff_tiled_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.tiff import synthesize_tiff_tiled_media, tiff_tiled_stats

    d = table(spark, sf_dir, "documents")
    stats = tiff_tiled_stats(synthesize_tiff_tiled_media(d.select("doc_id")))
    return stats.groupBy(
        F.col("channels").cast("int").alias("channels"),
        F.col("width").cast("int").alias("width"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_images"),
        F.sum("px_sum").cast("bigint").alias("px_sum"),
        F.min("px_min").cast("int").alias("px_min"),
        F.max("px_max").cast("int").alias("px_max"),
    )


# ---------------------------------------------------------------------------
# NSW beam-search ANN — the graph-based third ANN scale path
# ---------------------------------------------------------------------------

NSW_NLIST = 8
NSW_G = 6
NSW_LINKS = 3
NSW_BEAM = 8
NSW_HOPS = 3
NSW_K = 5
NSW_Q = 3


def _nsw_oracle(entries: int = 1) -> str:
    """Replays graph build AND every unrolled beam hop in SQL — the
    entire graph-ANN search path hash-checked against Spark.
    ``entries`` parameterizes the multi-entry start (rn <= entries
    seed cells; 1 = the original single-entry search)."""

    def cos(a: str, b: str) -> str:
        return (
            f"ROUND(list_dot_product({a}, {b}) / "
            f"(sqrt(list_dot_product({a}, {a})) * "
            f"sqrt(list_dot_product({b}, {b}))), 6)"
        )

    blocks = [
        """vecs AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings)""",
        f"""strata AS (
  SELECT vec_id % {NSW_NLIST} AS cid, MIN(vec_id) AS svid
  FROM vecs GROUP BY 1)""",
        """cents AS MATERIALIZED (
  SELECT s.cid, s.svid, v.v AS c
  FROM strata s JOIN vecs v ON v.vec_id = s.svid)""",
        """asgn_d AS MATERIALIZED (
  SELECT v.vec_id, ce.cid,
         ROUND(sqrt(list_sum(list_transform(range(64),
               i -> (v.v[i+1] - ce.c[i+1]) * (v.v[i+1] - ce.c[i+1])))), 6) AS d
  FROM vecs v CROSS JOIN cents ce)""",
        """ranked AS MATERIALIZED (
  SELECT vec_id, cid, d,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY d ASC, cid ASC) AS rn
  FROM asgn_d)""",
        """cells AS MATERIALIZED (
  SELECT vec_id AS item_id, cid FROM ranked WHERE rn = 1)""",
        f"""intra AS (
  SELECT src, dst FROM (
    SELECT a.item_id AS src, b.item_id AS dst,
           ROW_NUMBER() OVER (PARTITION BY a.item_id
             ORDER BY {cos("va.v", "vb.v")} DESC, b.item_id ASC) AS rn
    FROM cells a JOIN cells b ON a.cid = b.cid AND a.item_id != b.item_id
    JOIN vecs va ON va.vec_id = a.item_id
    JOIN vecs vb ON vb.vec_id = b.item_id
  ) WHERE rn <= {NSW_G})""",
        f"""lk AS (
  SELECT r.vec_id AS node, c.svid
  FROM ranked r JOIN cents c ON c.cid = r.cid
  WHERE r.rn <= {NSW_LINKS} AND c.svid != r.vec_id)""",
        """graph AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM intra
    UNION ALL SELECT node, svid FROM lk
    UNION ALL SELECT svid, node FROM lk))""",
        f"""qset AS MATERIALIZED (
  SELECT vec_id AS query_id, v AS qv FROM vecs WHERE vec_id < {NSW_Q})""",
        f"""state0 AS (
  SELECT DISTINCT r.vec_id AS query_id, c.svid AS node
  FROM ranked r JOIN cents c ON c.cid = r.cid
  WHERE r.vec_id < {NSW_Q} AND r.rn <= {entries})""",
    ]
    for t in range(1, NSW_HOPS + 1):
        blocks.append(
            f"""kept{t} AS MATERIALIZED (
  SELECT query_id, node FROM (
    SELECT s.query_id, s.node,
           ROW_NUMBER() OVER (PARTITION BY s.query_id
             ORDER BY {cos("q.qv", "n.v")} DESC, s.node ASC) AS rn
    FROM (SELECT DISTINCT query_id, node FROM state{t - 1}) s
    JOIN qset q USING (query_id)
    JOIN vecs n ON n.vec_id = s.node
  ) WHERE rn <= {NSW_BEAM})"""
        )
        blocks.append(
            f"""state{t} AS (
  SELECT query_id, node FROM kept{t}
  UNION ALL
  SELECT k.query_id, g.dst
  FROM kept{t} k JOIN graph g ON g.src = k.node)"""
        )
    return (
        "WITH "
        + ",\n".join(blocks)
        + f"""
SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
  SELECT s.query_id, s.node AS neighbor_id,
         {cos("q.qv", "n.v")} AS cosine,
         ROW_NUMBER() OVER (PARTITION BY s.query_id
           ORDER BY {cos("q.qv", "n.v")} DESC, s.node ASC) AS rank
  FROM (SELECT DISTINCT query_id, node FROM state{NSW_HOPS}) s
  JOIN qset q USING (query_id)
  JOIN vecs n ON n.vec_id = s.node
  WHERE s.node != s.query_id
) WHERE rank <= {NSW_K}
"""
    )


@register(
    "ann_nsw_beam_topk",
    family="similarity",
    doc="Navigable-small-world beam-search ANN (operators/nsw.py — the "
    "graph-based family of Malkov/Yashunin NSW/HNSW and DiskANN, next "
    "to the IVF and PQ scale paths): the index is per-node top-6 "
    "in-cell cosine neighbors plus bidirectional navigation links to "
    "the seed members of each node's 3 nearest cells (the flat hub "
    "stand-in for HNSW's upper layers); search starts at the query's "
    "nearest-cell seed and runs 3 beam-8 hops — per hop one graph "
    "equi-join expansion and one bounded per-query ranking window, "
    "candidate volume O(queries x beam x degree), never a cross join.  "
    "Deterministic end to end (seeded quantizer, ROUND-6 scores, ties "
    "to the smaller vec_id), so the generated oracle replays the graph "
    "BUILD and every unrolled hop in SQL — a graph-ANN whose whole "
    "search path is hash-checked; recall vs brute force asserted in "
    "tests/test_nsw.py.  At scale: raise nlist so cells stay bounded "
    "(the graph build touches only within-cell pairs) and persist the "
    "graph partitioned by src — hops are then src-keyed shuffle joins.",
    oracle=_nsw_oracle(),
)
def ann_nsw_beam_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.nsw import nsw_beam_topk

    e = table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < NSW_Q)
    return nsw_beam_topk(
        queries,
        e,
        k=NSW_K,
        nlist=NSW_NLIST,
        g_intra=NSW_G,
        seed_links=NSW_LINKS,
        beam=NSW_BEAM,
        hops=NSW_HOPS,
    )


# ---------------------------------------------------------------------------
# 12-bit extended-sequential JPEG (SOF1) — the precision seam
# ---------------------------------------------------------------------------


@register(
    "multimodal_jpeg12_stats",
    family="multimodal",
    doc="Pixel statistics over the REAL 12-bit extended-sequential "
    "JPEG path (operators/jpeg.py::encode_jpeg12 + the SOF1 branch of "
    "decode_baseline_jpeg): precision 12 with level shift 2048, 16-bit "
    "DQT entries (Pq=1, the form 12-bit streams use), and the extended "
    "Huffman alphabets (DC categories to 15, AC sizes to 14) — the "
    "medical/scientific-imaging profile that was the decoder's last "
    "named precision seam.  Fixtures are grids of constant 8x8 blocks "
    "(losslessly quantized under the DC-step-8 table) with closed-form "
    "block values, so the oracle breaks on a wrong level shift, DQT "
    "width or alphabet decode.  Blobs stay in executor Arrow batches; "
    "narrow stat rows out.",
    oracle="""
WITH dims AS (
  SELECT doc_id, doc_id % 3 + 2 AS bh, doc_id % 4 + 2 AS bw FROM documents
),
blk AS (
  SELECT doc_id, bh, bw,
         (doc_id * 37 + 131 * xs.x + 197 * ys.y) % 4096 AS v
  FROM dims, UNNEST(range(0, bw)) AS xs(x), UNNEST(range(0, bh)) AS ys(y)
),
per AS (
  SELECT doc_id, bw * 8 AS w, bh * 8 AS h,
         CAST(SUM(v) * 64 AS BIGINT) AS s, MIN(v) AS mn, MAX(v) AS mx
  FROM blk GROUP BY 1, 2, 3
)
SELECT CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(s) AS BIGINT) AS px_sum,
       CAST(MIN(mn) AS INT) AS px_min,
       CAST(MAX(mx) AS INT) AS px_max
FROM per GROUP BY 1, 2
""",
)
def multimodal_jpeg12_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import jpeg_pixel_stats, synthesize_jpeg12_media

    d = table(spark, sf_dir, "documents")
    stats = jpeg_pixel_stats(synthesize_jpeg12_media(d.select("doc_id")))
    return stats.groupBy(
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_images"),
        F.sum("px_sum").cast("bigint").alias("px_sum"),
        F.min("px_min").cast("int").alias("px_min"),
        F.max("px_max").cast("int").alias("px_max"),
    )


# ---------------------------------------------------------------------------
# distributed BPE merge-table training — the tokenizer-trainer flagship
# ---------------------------------------------------------------------------

BPE_ROUNDS = 8


def _bpe_oracle(rounds: int) -> str:
    """Unroll the full merge loop as chained CTEs: each round's pair
    count reads the previous vocabulary, ORDER BY count DESC / pair ASC
    LIMIT 1 picks the same deterministic argmax as the Spark loop, and
    replace() on the paren-cell form applies the identical greedy fuse
    (operators/bpe.py module docstring).  Every CTE read twice is
    MATERIALIZED (DuckDB inlines plain CTEs — NOTES gotcha #1)."""
    parts = [
        """w0 AS MATERIALIZED (
  SELECT regexp_replace(w, '(.)', '(\\1)', 'g') AS cells, cnt FROM (
    SELECT term AS w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
      SELECT UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS term
      FROM documents
    ) WHERE regexp_matches(term, '^[a-z0-9]+$') GROUP BY term
  )
)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""p{r} AS (
  SELECT x, y, CAST(SUM(cnt) AS BIGINT) AS c FROM (
    SELECT cnt, toks[i] AS x, toks[i + 1] AS y FROM (
      SELECT cnt,
             string_split(substr(cells, 2, len(cells) - 2), ')(') AS toks
      FROM w{r - 1} WHERE instr(cells, ')(') > 0
    ), UNNEST(range(1, len(toks))) AS r(i)
  ) GROUP BY x, y
),
m{r} AS MATERIALIZED (
  SELECT x, y, c FROM p{r} ORDER BY c DESC, x ASC, y ASC LIMIT 1
)"""
        )
        if r < rounds:
            parts.append(
                f"""w{r} AS MATERIALIZED (
  SELECT replace(cells, '(' || x || ')(' || y || ')',
                 '(' || x || y || ')') AS cells, cnt
  FROM w{r - 1}, m{r}
)"""
            )
    union = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, x AS left_tok, y AS right_tok,"
        f" x || y AS merged, c AS merge_count FROM m{r}"
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + union


@register(
    "text_bpe_train_merges",
    family="text",
    doc="FULL distributed BPE merge-table training (Sennrich 2016), "
    f"{BPE_ROUNDS} rounds: the corpus collapses to a word-frequency "
    "table once (the only corpus-sized shuffle), then every round is "
    "one pair-count hash aggregate over the VOCABULARY plus a 1-row "
    "argmax collect (scalar-probe pattern) and a narrow literal "
    "replace — sentencepiece/fastBPE's exact scaling shape, so at "
    "100 TB the loop runs over millions of vocab rows, not trillions "
    "of corpus tokens.  Merge application is cross-engine exact via "
    "the paren-cell representation (operators/bpe.py docstring): "
    "left-to-right non-overlapping replace == Sennrich's greedy "
    "re.sub on both engines, with a lowercase-alnum alphabet guard "
    "keeping the delimiters unambiguous.  The oracle unrolls all "
    f"{BPE_ROUNDS} rounds as chained MATERIALIZED CTEs.",
    oracle=_bpe_oracle(BPE_ROUNDS),
)
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import train_bpe_merges, word_frequencies

    d = table(spark, sf_dir, "documents")
    return train_bpe_merges(word_frequencies(d), BPE_ROUNDS)


# ---------------------------------------------------------------------------
# weighted multi-source shortest paths — fixed-round Bellman-Ford
# ---------------------------------------------------------------------------

SSSP_ORDER_CAP = 1000
SSSP_SEED_MOD = 50
SSSP_ROUNDS = 6


def _sssp_oracle() -> str:
    parts = [
        f"""WITH li AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey < {SSSP_ORDER_CAP}
),
e AS MATERIALIZED (
  SELECT a.l_partkey AS a, b.l_partkey AS b,
         11 - LEAST(COUNT(*), 10) AS w
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
adj AS MATERIALIZED (
  SELECT a AS src, b AS dst, w FROM e UNION ALL SELECT b, a, w FROM e
),
nodes AS MATERIALIZED (SELECT DISTINCT src AS v FROM adj),
d0 AS MATERIALIZED (
  SELECT v, CAST(0 AS BIGINT) AS dist FROM nodes
  WHERE v % {SSSP_SEED_MOD} = 0
)"""
    ]
    for i in range(1, SSSP_ROUNDS + 1):
        parts.append(
            f"""d{i} AS MATERIALIZED (
  SELECT v, MIN(dist) AS dist FROM (
    SELECT v, dist FROM d{i - 1}
    UNION ALL
    SELECT adj.dst AS v, p.dist + adj.w AS dist
    FROM d{i - 1} p JOIN adj ON adj.src = p.v
  ) GROUP BY v
)"""
        )
    parts.append(
        f"""hist AS (
  SELECT CAST(dist AS INT) AS dist, CAST(COUNT(*) AS BIGINT) AS n_nodes
  FROM d{SSSP_ROUNDS} GROUP BY 1
)"""
    )
    return (
        ",\n".join(parts)
        + f"""
SELECT dist, n_nodes FROM hist
UNION ALL
SELECT -1 AS dist, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM nodes WHERE NOT EXISTS (SELECT 1 FROM d{SSSP_ROUNDS} d
                             WHERE d.v = nodes.v)
"""
    )


@register(
    "graph_sssp_bellman_ford",
    family="graph",
    doc="Multi-source WEIGHTED shortest paths (operators/sssp.py, "
    f"{SSSP_ROUNDS} synchronous Bellman-Ford relaxation rounds) on the "
    "part co-purchase graph with proximity weights 11 - min(co-orders, "
    "10): strongly co-purchased parts are close, hub parts (key % "
    f"{SSSP_SEED_MOD} = 0) seed at distance 0 — the weighted "
    "complement of graph_bfs_hops.  Per round ONE node-keyed "
    "adjacency join plus a min fold; integer weights make every "
    "distance exact (no float discipline).  The oracle unrolls all "
    "rounds as MATERIALIZED CTEs.  Output: node count per final "
    "distance plus the count unreached within the round budget "
    "(dist = -1).",
    oracle=_sssp_oracle(),
)
def graph_sssp_bellman_ford(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sssp import bellman_ford_rounds

    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < SSSP_ORDER_CAP)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("b"))
    e = (
        a.join(b, (a["ok"] == b["ok"]) & (F.col("a") < F.col("b")))
        .groupBy("a", "b")
        .agg((F.lit(11) - F.least(F.count(F.lit(1)), F.lit(10))).alias("w"))
    )
    adj = e.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    ).unionAll(e.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w"))
    nodes = adj.select(F.col("src").alias("v")).distinct()
    seeds = nodes.where(F.col("v") % SSSP_SEED_MOD == 0)
    dist = bellman_ford_rounds(adj, seeds, SSSP_ROUNDS)
    hist = dist.groupBy(F.col("dist").cast("int").alias("dist")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )
    unreached = (
        nodes.join(dist.select("v"), "v", "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        .select(F.lit(-1).cast("int").alias("dist"), "n_nodes")
    )
    return hist.unionByName(unreached)


# ---------------------------------------------------------------------------
# deterministic random-walk corpus (DeepWalk / node2vec input stage)
# ---------------------------------------------------------------------------

WALK_ORDER_CAP = 1000
WALK_SEED_MOD = 50
WALK_STEPS = 8


def _walks_oracle() -> str:
    from ..operators.walks import WALK_P

    parts = [
        f"""WITH li AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey < {WALK_ORDER_CAP}
),
e AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
adj AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e
),
f0 AS MATERIALIZED (
  SELECT v AS walk_id, v AS cur
  FROM (SELECT DISTINCT src AS v FROM adj) WHERE v % {WALK_SEED_MOD} = 0
)"""
    ]
    for t in range(1, WALK_STEPS + 1):
        parts.append(
            f"""f{t} AS MATERIALIZED (
  SELECT walk_id, CAST(m % 2147483648 AS BIGINT) AS cur FROM (
    SELECT walk_id,
           MIN((((walk_id % {WALK_P}) * 31 + {t * 101}
                 + (adj.dst % {WALK_P}) * 977) % {WALK_P})
               * 2147483648 + adj.dst) AS m
    FROM f{t - 1} p JOIN adj ON adj.src = p.cur GROUP BY walk_id)
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT walk_id, {t} AS step, cur AS node FROM f{t}"
        for t in range(WALK_STEPS + 1)
    )
    parts.append(f"visits AS (\n{union}\n)")
    return (
        ",\n".join(parts)
        + """
SELECT walk_id,
       string_agg(CAST(node AS VARCHAR), '->' ORDER BY step) AS path,
       CAST(arg_max(node, step) AS BIGINT) AS end_node
FROM visits GROUP BY walk_id
"""
    )


@register(
    "graph_node2vec_walks",
    family="graph",
    doc="Deterministic random-walk corpus (operators/walks.py, "
    f"{WALK_STEPS} steps) over the part co-purchase graph — the "
    "DeepWalk/node2vec input stage, generated with a counter-based "
    "PRNG so every retry/partitioning reproduces the same corpus: the "
    "choice at (walk, step) is a pure integer hash argmin over the "
    "neighbors, packed as score*2^31+nbr so one MIN does the "
    "lexicographic tie-break on both engines (the winnowing packing "
    "trick).  Per step ONE frontier-adjacency equi-join + a per-walk "
    "min aggregate — frontier-sized shuffles, never graph-sized.  "
    "The oracle unrolls every step as MATERIALIZED CTEs and rebuilds "
    "the '->' paths with an ordered string_agg.",
    oracle=_walks_oracle(),
)
def graph_node2vec_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.walks import deterministic_walks, walk_paths

    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < WALK_ORDER_CAP)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("b"))
    e = (
        a.join(b, (a["ok"] == b["ok"]) & (F.col("a") < F.col("b")))
        .select("a", "b")
        .distinct()
    )
    adj = e.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        e.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    seeds = (
        adj.select(F.col("src").alias("v"))
        .distinct()
        .where(F.col("v") % WALK_SEED_MOD == 0)
    )
    return walk_paths(deterministic_walks(adj, seeds, WALK_STEPS))


# ---------------------------------------------------------------------------
# per-group multiple linear regression — normal equations + Cramer solve
# ---------------------------------------------------------------------------


def _det3(a, b, c, d, e, f, g, h, i):
    """Textual 3x3 determinant (expansion along the first row) — used to
    emit the IDENTICAL operation order on both engines."""
    return (
        f"({a} * ({e} * {i} - {f} * {h}) "
        f"- {b} * ({d} * {i} - {f} * {g}) "
        f"+ {c} * ({d} * {h} - {e} * {g}))"
    )


def _linprobe_select() -> list[str]:
    """Shared post-aggregate arithmetic: solve the 3x3 normal equations
    [s11 s12 s1; s12 s22 s2; s1 s2 n][b1 b2 b0] = [s1y s2y sy] by
    Cramer's rule.  Moments are EXACT integer sums cast to DOUBLE once;
    everything after is the same double expression on both engines
    (plans/registry.py determinism conventions)."""
    m = {k: f"CAST({k} AS DOUBLE)" for k in
         ["n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y", "syy"]}
    d = _det3(m["s11"], m["s12"], m["s1"], m["s12"], m["s22"], m["s2"],
              m["s1"], m["s2"], m["n"])
    d1 = _det3(m["s1y"], m["s12"], m["s1"], m["s2y"], m["s22"], m["s2"],
               m["sy"], m["s2"], m["n"])
    d2 = _det3(m["s11"], m["s1y"], m["s1"], m["s12"], m["s2y"], m["s2"],
               m["s1"], m["sy"], m["n"])
    d0 = _det3(m["s11"], m["s12"], m["s1y"], m["s12"], m["s22"], m["s2y"],
               m["s1"], m["s2"], m["sy"])
    b1, b2, b0 = f"({d1} / {d})", f"({d2} / {d})", f"({d0} / {d})"
    sse = (f"({m['syy']} - {b1} * {m['s1y']} - {b2} * {m['s2y']}"
           f" - {b0} * {m['sy']})")
    sst = f"({m['syy']} - {m['sy']} * {m['sy']} / {m['n']})"
    return [
        "lang",
        "CAST(n AS BIGINT) AS n",
        f"ROUND({b0}, 6) AS b0",
        f"ROUND({b1}, 6) AS b1",
        f"ROUND({b2}, 6) AS b2",
        f"ROUND(1.0 - {sse} / {sst}, 6) AS r2",
    ]


@register(
    "quality_linear_probe",
    family="quality",
    doc="One-pass multi-feature linear-probe training, one model per "
    "language group: fit n_chars ~ b0 + b1*tokens + b2*longwords "
    "(whitespace-token count; tokens longer than 5 chars) by "
    "ordinary least squares via the NORMAL EQUATIONS — ten exact "
    "integer moment sums per group in a single hash aggregate (the "
    "agg_regression_battery discipline extended to a 3x3 system), "
    "then Cramer's rule solves for the coefficients driver-free with "
    "the identical double operation order on both engines; r² from "
    "the moment identity SSE = syy - b·[s1y s2y sy].  The shape every "
    "quality-classifier/probe fit over a 100 TB corpus wants: "
    "training IS one map-side-combinable aggregate, never an "
    "iterative pass (use this as the closed-form baseline against "
    "which GD-trained probes are sanity-checked).",
    oracle="""
WITH feat AS (
  SELECT lang,
         len(list_filter(string_split_regex(trim(text), '\\s+'),
                         t -> t <> '')) AS x1,
         len(list_filter(string_split_regex(trim(text), '\\s+'),
                         t -> len(t) > 5)) AS x2,
         n_chars AS y
  FROM documents
),
mom AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x1 * x1) AS BIGINT) AS s11,
         CAST(SUM(x1 * x2) AS BIGINT) AS s12,
         CAST(SUM(x2 * x2) AS BIGINT) AS s22,
         CAST(SUM(x1 * y) AS BIGINT) AS s1y,
         CAST(SUM(x2 * y) AS BIGINT) AS s2y,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM feat GROUP BY lang HAVING COUNT(*) >= 3
)
"""
    + "SELECT " + ", ".join(_linprobe_select())
    + "\nFROM mom",
)
def quality_linear_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as T

    d = table(spark, sf_dir, "documents")
    feat = d.select(
        "lang",
        F.size(T.tokens(F.col("text"))).cast("long").alias("x1"),
        F.size(
            F.filter(T.tokens(F.col("text")), lambda t: F.length(t) > 5)
        ).cast("long").alias("x2"),
        F.col("n_chars").cast("long").alias("y"),
    )
    mom = (
        feat.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x1").cast("bigint").alias("s1"),
            F.sum("x2").cast("bigint").alias("s2"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x1") * F.col("x1")).cast("bigint").alias("s11"),
            F.sum(F.col("x1") * F.col("x2")).cast("bigint").alias("s12"),
            F.sum(F.col("x2") * F.col("x2")).cast("bigint").alias("s22"),
            F.sum(F.col("x1") * F.col("y")).cast("bigint").alias("s1y"),
            F.sum(F.col("x2") * F.col("y")).cast("bigint").alias("s2y"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        )
        .where(F.col("n") >= 3)
    )
    return mom.selectExpr(*_linprobe_select())


# ---------------------------------------------------------------------------
# Z-order (Morton) layout — data-skipping file statistics
# ---------------------------------------------------------------------------

ZO_BITS = 10  # cluster on 10-bit projections of the two keys
ZO_FILE_BITS = 6  # 64 z-contiguous files


def _zorder_oracle() -> str:
    from ..operators.zorder import z_value_sql

    z = z_value_sql("px", "sy", ZO_BITS)
    return f"""
WITH pts AS (
  SELECT l_partkey % 1024 AS px, l_suppkey % 1024 AS sy FROM lineitem
),
zed AS (
  SELECT px, sy, {z} >> {2 * ZO_BITS - ZO_FILE_BITS} AS file_id FROM pts
)
SELECT CAST(file_id AS INT) AS file_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(px) AS BIGINT) AS x_min, CAST(MAX(px) AS BIGINT) AS x_max,
       CAST(MIN(sy) AS BIGINT) AS y_min, CAST(MAX(sy) AS BIGINT) AS y_max
FROM zed GROUP BY file_id
"""


@register(
    "curation_zorder_layout",
    family="curation",
    doc="Z-order (Morton) layout statistics (operators/zorder.py) — the "
    "clustering step behind Delta/Iceberg OPTIMIZE ZORDER: interleave "
    "the bits of two clustering keys (10-bit projections of partkey "
    "and suppkey) with pure JVM bit arithmetic, assign rows to the 64 "
    "z-contiguous files via the z-value's high bits, and report the "
    "per-file min/max footer statistics a predicate scan skips on — "
    "with the interleave, BOTH columns' per-file ranges are ~2^7-wide "
    "cells of the 1024x1024 key space instead of one tight and one "
    "full-width.  In a real write the same z column feeds "
    "repartitionByRange + sortWithinPartitions; the high-bit file "
    "assignment here is its deterministic oracle-expressible twin.  "
    "Scale: one projection + one bounded hash aggregate, no shuffle "
    "beyond the aggregate's own.",
    oracle=_zorder_oracle(),
)
def curation_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.zorder import zorder_file_stats

    li = table(spark, sf_dir, "lineitem")
    return zorder_file_stats(
        li,
        F.col("l_partkey") % 1024,
        F.col("l_suppkey") % 1024,
        ZO_BITS,
        ZO_FILE_BITS,
    )


# ---------------------------------------------------------------------------
# oracle-checked HyperLogLog (md5-register sketch)
# ---------------------------------------------------------------------------


@register(
    "sketch_hll_distinct",
    family="sketch",
    doc="HyperLogLog distinct-term estimation per language with FULLY "
    "oracle-checked registers (operators/hll.py): the builtin HLL++ "
    "behind agg_approx_distinct is engine-private (rows-only check), "
    "but a sketch is just a deterministic function of a hash — built "
    "over the repo's cross-engine md5 hash, register index = low 6 "
    "bits, rho via the exact integer bit-length (length(bin(w)), no "
    "float log2), the estimate reproduces bit-for-bit in SQL.  "
    "Determinism: the harmonic denominator is the EXACT integer "
    "sum Σ 2^(61-M_j) in DECIMAL(38,0) (empty registers in closed "
    "form) with ONE double division at the end; the linear-counting "
    "branch compares exact integers so both engines take the same "
    "branch.  Scale: COUNT(DISTINCT) shuffles the key universe — the "
    "sketch is a map-side-combinable 64-registers-per-group max "
    "aggregate (the exact count rides along per register only as the "
    "accuracy tie-out).",
    oracle="""
WITH tok AS (
  SELECT lang, term FROM (
    SELECT lang, UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS term
    FROM documents) WHERE term <> ''
),
h AS (
  SELECT lang, term,
         CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) AS h
  FROM tok
),
reg AS (
  SELECT lang, h % 64 AS j,
         MAX(55 - CASE WHEN (h >> 6) = 0 THEN 0
                       ELSE length(bin(h >> 6)) END) AS mj,
         COUNT(DISTINCT term) AS nd
  FROM h GROUP BY 1, 2
),
per AS (
  SELECT lang, CAST(SUM(nd) AS BIGINT) AS n_exact,
         SUM(CAST((CAST(1 AS BIGINT) << (61 - mj)) AS DECIMAL(38,0)))
           AS num_present,
         COUNT(*) AS n_present
  FROM reg GROUP BY lang
),
est AS (
  SELECT lang, n_exact,
         CAST(64 - n_present AS DOUBLE) AS zeros,
         num_present + CAST(64 - n_present AS DECIMAL(38,0))
           * CAST(2305843009213693952 AS DECIMAL(38,0)) AS num_dec,
         ((0.7213 / (1.0 + 1.079 / 64.0)) * 4096.0)
           * 2305843009213693952.0
           / CAST(num_present + CAST(64 - n_present AS DECIMAL(38,0))
                  * CAST(2305843009213693952 AS DECIMAL(38,0))
                  AS DOUBLE) AS raw
  FROM per
),
-- linear-counting branch decided on the EXACT integer denominator
-- (raw <= 2.5*m  ⟺  num >= ceil(alpha_m2*2^61/(2.5*m)) — the same
-- DECIMAL-vs-integer-literal compare operators/hll.py makes), so both
-- engines provably take the same branch
br AS (
  SELECT *, (num_dec >= CAST('41872099375760238183' AS DECIMAL(38,0))
             AND zeros > 0) AS lc
  FROM est
)
SELECT lang, n_exact,
       ROUND(CASE WHEN lc THEN 64.0 * ln(64.0 / zeros) ELSE raw END, 6)
         AS hll_estimate,
       ROUND(ABS(CASE WHEN lc THEN 64.0 * ln(64.0 / zeros) ELSE raw END
                 - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE), 6)
         AS rel_error
FROM br
""",
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as T
    from ..operators.hll import hll_estimate

    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "lang", F.explode(T.tokens(F.lower(F.col("text")))).alias("term")
    )
    return hll_estimate(tok, "lang", "term")


# ---------------------------------------------------------------------------
# Adam7-interlaced + palette PNG — the two remaining PNG layout seams
# ---------------------------------------------------------------------------


@register(
    "multimodal_png_variants_stats",
    family="multimodal",
    doc="Pixel statistics over the REAL Adam7-interlaced and palette "
    "PNG decode paths (operators/multimodal.py::decode_png_pixels — "
    "the two layout seams the round-6 decoder left raising): even ids "
    "encode Adam7 (seven independently filtered passes re-woven by "
    "the pass geometry; fixture dims down to 4x4 exercise empty/edge "
    "passes), odd ids encode colortype-3 palette streams expanded "
    "through PLTE on read.  Interlacing is lossless so the even "
    "closed form is make_png_image's; palette channel c decodes to "
    "(index * (3 + 2c)) % 256.  The oracle breaks on any wrong pass "
    "offset, per-pass filter reset, or palette lookup.  Blobs stay in "
    "executor Arrow batches; narrow stat rows out.",
    oracle="""
WITH dims AS (
  SELECT doc_id, doc_id % 24 + 4 AS w, doc_id % 16 + 4 AS h,
         doc_id % 2 AS odd
  FROM documents
),
px AS (
  SELECT doc_id, w, odd,
         CASE WHEN odd = 0
              THEN (doc_id * 7 + 3 * xs.x + 5 * ys.y + 11 * cs.c) % 256
              ELSE (((doc_id * 7 + 3 * xs.x + 5 * ys.y) % 64)
                    * (3 + 2 * cs.c)) % 256 END AS v
  FROM dims,
       UNNEST(range(0, w)) AS xs(x),
       UNNEST(range(0, h)) AS ys(y),
       UNNEST(range(0, 3)) AS cs(c)
),
per AS (
  SELECT doc_id, w, odd,
         CAST(SUM(v) AS BIGINT) AS s, MIN(v) AS mn, MAX(v) AS mx
  FROM px GROUP BY 1, 2, 3
)
SELECT CASE WHEN odd = 0 THEN 'adam7' ELSE 'palette' END AS layout,
       CAST(w AS INT) AS width,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(s) AS BIGINT) AS px_sum,
       CAST(MIN(mn) AS INT) AS px_min,
       CAST(MAX(mx) AS INT) AS px_max
FROM per GROUP BY 1, 2
""",
)
def multimodal_png_variants_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (
        png_pixel_stats,
        synthesize_png_variant_media,
    )

    d = table(spark, sf_dir, "documents")
    stats = png_pixel_stats(synthesize_png_variant_media(d.select("doc_id")))
    return stats.select(
        F.when(F.col("image_id") % 2 == 0, F.lit("adam7"))
        .otherwise(F.lit("palette"))
        .alias("layout"),
        F.col("width").cast("int").alias("width"),
        "px_sum",
        "px_min",
        "px_max",
    ).groupBy("layout", "width").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_images"),
        F.sum("px_sum").cast("bigint").alias("px_sum"),
        F.min("px_min").cast("int").alias("px_min"),
        F.max("px_max").cast("int").alias("px_max"),
    )


# ---------------------------------------------------------------------------
# Holt linear-trend smoothing — exact cross-engine fold
# ---------------------------------------------------------------------------

HOLT_A = 0.3  # level smoothing
HOLT_B = 0.2  # trend smoothing


@register(
    "timeseries_holt_linear",
    family="timeseries",
    doc="Holt double-exponential (linear-trend) smoothing of the daily "
    "event-count series per type - the forecasting step after "
    "events_ewma_daily's level-only smoother: state (level, trend) "
    "folds through the day sequence with level' = a*x + (1-a)*(level+"
    "trend) and the non-duplicating trend form trend' = a*b*(x-level) "
    "+ (b*(1-a)+(1-b))*trend, seeded at (x_1, 0); the composite "
    "literals are formatted from the SAME Python floats into both "
    "texts so each step is the identical double arithmetic.  Spark "
    "folds with aggregate() over the day-sorted array; the oracle "
    "folds with a RECURSIVE CTE over the row-numbered day sequence - "
    "NOT list_reduce, whose struct accumulator updates fields "
    "sequentially in place (trend would see the already-updated "
    "level; NOTES gotcha).  Scale shape: one (type, day) aggregate "
    "collapses the corpus; recursion depth = calendar days.  Output: "
    "final state + the 7-day-ahead forecast level + 7*trend.",
    oracle=f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
seq AS MATERIALIZED (
  SELECT event_type, CAST(cnt AS DOUBLE) AS x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d ASC) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM daily
),
st AS (
  SELECT event_type, rn, n, x AS lvl, CAST(0 AS DOUBLE) AS tr
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT q.event_type, q.rn, q.n,
         {HOLT_A} * q.x + {1 - HOLT_A} * (s.lvl + s.tr),
         {HOLT_B * HOLT_A} * (q.x - s.lvl)
           + {HOLT_B * (1 - HOLT_A) + (1 - HOLT_B)} * s.tr
  FROM st s JOIN seq q
    ON q.event_type = s.event_type AND q.rn = s.rn + 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       ROUND(lvl, 6) AS level, ROUND(tr, 6) AS trend,
       ROUND(lvl + 7 * tr, 6) AS forecast_7d
FROM st WHERE rn = n
""",
)
def timeseries_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))

    def merge(acc, x):
        return F.struct(
            (
                F.lit(HOLT_A) * x["level"]
                + F.lit(1 - HOLT_A) * (acc["level"] + acc["trend"])
            ).alias("level"),
            (
                F.lit(HOLT_B * HOLT_A) * (x["level"] - acc["level"])
                + F.lit(HOLT_B * (1 - HOLT_A) + (1 - HOLT_B)) * acc["trend"]
            ).alias("trend"),
        )

    folded = (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.array_sort(F.collect_list(F.struct("d", "cnt"))).alias("xs"),
        )
        .select(
            "event_type",
            "n_days",
            F.transform(
                "xs",
                lambda s: F.struct(
                    s["cnt"].cast("double").alias("level"),
                    F.lit(0.0).alias("trend"),
                ),
            ).alias("vals"),
        )
        .select(
            "event_type",
            "n_days",
            F.aggregate(
                F.slice("vals", F.lit(2), F.size("vals") - 1),
                F.element_at("vals", 1),
                merge,
            ).alias("st"),
        )
    )
    return folded.select(
        "event_type",
        "n_days",
        F.round(F.col("st.level"), 6).alias("level"),
        F.round(F.col("st.trend"), 6).alias("trend"),
        F.round(F.col("st.level") + 7 * F.col("st.trend"), 6).alias(
            "forecast_7d"
        ),
    )


# ---------------------------------------------------------------------------
# graph coarsening by heavy-edge matching (METIS contraction phase)
# ---------------------------------------------------------------------------

HEM_ORDER_CAP = 1000
HEM_ROUNDS = 3


def _hem_oracle() -> str:
    parts = [
        f"""WITH li AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey < {HEM_ORDER_CAP}
),
e1 AS MATERIALIZED (
  SELECT a.l_partkey AS u, b.l_partkey AS v,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)"""
    ]
    for r in range(1, HEM_ROUNDS + 1):
        parts.append(
            f"""adj{r} AS (
  SELECT u, v, w FROM e{r} UNION ALL SELECT v, u, w FROM e{r}
),
prop{r} AS MATERIALIZED (
  SELECT u AS node,
         2147483647 - (MAX(w * 2147483648 + (2147483647 - v))
                       % 2147483648) AS pick
  FROM adj{r} GROUP BY u
),
m{r} AS MATERIALIZED (
  SELECT a.node AS u, a.pick AS v, e.w
  FROM prop{r} a
  JOIN prop{r} b ON b.node = a.pick AND b.pick = a.node
  JOIN e{r} e ON e.u = a.node AND e.v = a.pick
  WHERE a.node < a.pick
),
s{r} AS (
  SELECT {r} AS round,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM
            (SELECT DISTINCT u FROM adj{r})) AS n_nodes,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM e{r}) AS n_edges,
         (SELECT CAST(COALESCE(SUM(w), 0) AS BIGINT) FROM e{r})
           AS total_weight,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM m{r}) AS n_matched,
         (SELECT CAST(COALESCE(SUM(w), 0) AS BIGINT) FROM m{r})
           AS matched_weight
)"""
        )
        if r < HEM_ROUNDS:
            parts.append(
                f"""e{r + 1} AS MATERIALIZED (
  SELECT LEAST(a, b) AS u, GREATEST(a, b) AS v,
         CAST(SUM(w) AS BIGINT) AS w
  FROM (
    SELECT COALESCE(mu.u, e.u) AS a, COALESCE(mv.u, e.v) AS b, e.w
    FROM e{r} e
    LEFT JOIN m{r} mu ON mu.v = e.u
    LEFT JOIN m{r} mv ON mv.v = e.v
  ) WHERE a <> b GROUP BY 1, 2
)"""
            )
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM s{r}" for r in range(1, HEM_ROUNDS + 1)
    )
    return ",\n".join(parts) + "\n" + union


@register(
    "graph_heavy_edge_coarsening",
    family="graph",
    doc="Multilevel graph coarsening by heavy-edge matching "
    f"(operators/coarsen.py, {HEM_ROUNDS} rounds — the METIS "
    "contraction phase, Karypis & Kumar 1998) on the weighted part "
    "co-purchase graph: each node proposes to its heaviest neighbor "
    "(integer weights; (w, partner) packed as w*2^31 + (2^31-1-v) so "
    "one MAX does the max-weight/min-partner argmax — the winnowing "
    "packing trick), mutual proposals contract onto min(u, v) with "
    "parallel edge weights summed exactly.  Per round three node-"
    "keyed hash shuffles and a geometrically SHRINKING edge list — "
    "the scaling argument of the whole multilevel-partitioning "
    "family.  Output per round: the graph the round started from and "
    "what the matching captured.  The oracle unrolls all rounds as "
    "MATERIALIZED CTEs.",
    oracle=_hem_oracle(),
)
def graph_heavy_edge_coarsening(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.coarsen import coarsen_stats

    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < HEM_ORDER_CAP)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    e = (
        a.join(b, (a["ok"] == b["ok"]) & (F.col("u") < F.col("v")))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    return coarsen_stats(e, HEM_ROUNDS)


# ---------------------------------------------------------------------------
# Louvain phase-1 gain sweep — integer-exact community detection round
# ---------------------------------------------------------------------------

LV_ORDER_CAP = 1000


@register(
    "graph_louvain_sweep",
    family="graph",
    doc="Louvain phase-1 modularity-gain sweep, one synchronous round "
    "from singletons (operators/louvain.py; Blondel 2008) on the "
    "weighted part co-purchase graph: each node joins the neighbor "
    "maximizing gain(i->j) = 2*m*w_ij - k_i*k_j when positive (ALL "
    "integer arithmetic — no float ranking), tie-break min j; the "
    "resulting partition's Newman modularity is evaluated via the "
    "integer identity Q*4m^2 = sum_c(4*m*w_in(c) - d_c^2) with ONE "
    "double division at the end.  Gains are one edge-keyed join "
    "against the degree table + a node-keyed argmax; modularity one "
    "same-community edge check + a community-keyed aggregate — "
    "nothing beyond edge-list size materializes.  Iterated sweeps / "
    "the contraction phase are a driver loop over this operator "
    "(graph_heavy_edge_coarsening is the contraction's matching "
    "kernel).",
    oracle=f"""
WITH li AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey < {LV_ORDER_CAP}
),
e AS MATERIALIZED (
  SELECT a.l_partkey AS u, b.l_partkey AS v,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
adj AS MATERIALIZED (
  SELECT u, v, w FROM e UNION ALL SELECT v, u, w FROM e
),
deg AS MATERIALIZED (SELECT u, SUM(w) AS k FROM adj GROUP BY u),
mm AS MATERIALIZED (SELECT SUM(w) AS m FROM e),
gains AS MATERIALIZED (
  SELECT a.u, a.v,
         2 * (SELECT m FROM mm) * a.w - d1.k * d2.k AS g
  FROM adj a
  JOIN deg d1 ON d1.u = a.u
  JOIN deg d2 ON d2.u = a.v
  WHERE 2 * (SELECT m FROM mm) * a.w - d1.k * d2.k > 0
),
best AS (SELECT u, MAX(g) AS gmax FROM gains GROUP BY u),
move AS MATERIALIZED (
  SELECT g.u, MIN(g.v) AS anchor
  FROM gains g JOIN best b ON b.u = g.u AND g.g = b.gmax
  GROUP BY g.u
),
part AS MATERIALIZED (
  SELECT d.u AS node, d.k, COALESCE(mv.anchor, d.u) AS c
  FROM deg d LEFT JOIN move mv ON mv.u = d.u
),
comm AS MATERIALIZED (
  SELECT c, COUNT(*) AS size, SUM(k) AS dc FROM part GROUP BY c
),
win AS (
  SELECT pu.c, SUM(e.w) AS win
  FROM e
  JOIN part pu ON pu.node = e.u
  JOIN part pv ON pv.node = e.v
  WHERE pu.c = pv.c GROUP BY pu.c
),
qnum AS (
  SELECT CAST(SUM(4 * (SELECT m FROM mm) * COALESCE(w.win, 0)
              - comm.dc * comm.dc) AS DECIMAL(38,0)) AS qn
  FROM comm LEFT JOIN win w ON w.c = comm.c
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM part) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM part WHERE c <> node)
         AS n_moved,
       (SELECT CAST(COUNT(DISTINCT c) AS BIGINT) FROM part)
         AS n_communities,
       (SELECT CAST(MAX(size) AS BIGINT) FROM comm) AS largest_community,
       ROUND(CAST((SELECT qn FROM qnum) AS DOUBLE)
             / CAST(4 * (SELECT m FROM mm) * (SELECT m FROM mm) AS DOUBLE),
             6) AS modularity
""",
)
def graph_louvain_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.louvain import louvain_sweep_summary

    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < LV_ORDER_CAP)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    e = (
        a.join(b, (a["ok"] == b["ok"]) & (F.col("u") < F.col("v")))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    return louvain_sweep_summary(e)


# ---------------------------------------------------------------------------
# 4-bit (16-color) BMP — packed nibbles + BI_RLE4
# ---------------------------------------------------------------------------


@register(
    "multimodal_bmp4_pixel_stats",
    family="multimodal",
    doc="REAL 4-bit BMP decode (operators/bmp.py::decode_bmp4): packed "
    "nibbles (high first, 4-byte-padded rows) for odd ids and BI_RLE4 "
    "for even ids — encoded runs carry TWO alternating nibbles per "
    "data byte, absolute blocks pack nibbles with the 16-bit "
    "alignment pad, EOL/EOB markers, bottom-up rows.  The 16-color "
    "depth is the legacy icon/sensor-dump shape left raising after "
    "round 7's RLE8.  Pixels are closed-form (id*3 + 2x + 5y) mod 16 "
    "so the oracle reproduces every decoded sample; any nibble-order, "
    "alignment or marker drift breaks the hash.  Blobs stay inside "
    "the Arrow batch.",
    oracle="""
WITH dims AS (
  SELECT doc_id, doc_id % 14 + 4 AS w, doc_id % 9 + 3 AS h FROM documents
),
px AS (
  SELECT doc_id, w, h,
         (doc_id * 3 + 2 * xs.x + 5 * ys.y) % 16 AS v
  FROM dims,
       UNNEST(range(0, w)) AS xs(x),
       UNNEST(range(0, h)) AS ys(y)
)
SELECT doc_id AS image_id,
       CAST(MIN(w) AS INT) AS width,
       CAST(MIN(h) AS INT) AS height,
       CAST(MIN(w) * MIN(h) AS BIGINT) AS n_subpixels,
       CAST(SUM(v) AS BIGINT) AS px_sum,
       CAST(MIN(v) AS INT) AS px_min,
       CAST(MAX(v) AS INT) AS px_max
FROM px GROUP BY doc_id
""",
)
def multimodal_bmp4_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import bmp4_pixel_stats, synthesize_bmp4_media

    d = table(spark, sf_dir, "documents")
    return bmp4_pixel_stats(synthesize_bmp4_media(d.select("doc_id")))


# ---------------------------------------------------------------------------
# Holt one-step-ahead backtest — rolling-origin forecast evaluation
# ---------------------------------------------------------------------------


@register(
    "timeseries_holt_backtest",
    family="timeseries",
    doc="Rolling-origin one-step-ahead backtest of the Holt linear "
    "smoother (the evaluation loop behind every forecasting deploy): "
    "for each day t the model fitted on days 1..t forecasts day t+1 "
    "(level_t + trend_t), and the per-type MAPE aggregates the "
    "absolute percentage errors.  The Spark side materializes the "
    "whole state TRAJECTORY in one aggregate fold (the accumulator is "
    "the array of states, array_append per step — no per-prefix "
    "refits, O(days) not O(days^2)); the oracle reads the same "
    "trajectory off the recursive CTE's intermediate rows.  "
    "Determinism: each APE is a ratio of doubles from the identical "
    "fold, ROUNDed to 12 before an EXACT DECIMAL sum, so the "
    "aggregation order never matters (the PMI/pagerank discipline).  "
    "Scale shape: one (type, day) corpus aggregate; everything after "
    "runs on calendar-bounded arrays.",
    oracle=f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
seq AS MATERIALIZED (
  SELECT event_type, CAST(cnt AS DOUBLE) AS x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d ASC) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM daily
),
st AS (
  SELECT event_type, rn, n, x AS lvl, CAST(0 AS DOUBLE) AS tr
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT q.event_type, q.rn, q.n,
         {HOLT_A} * q.x + {1 - HOLT_A} * (s.lvl + s.tr),
         {HOLT_B * HOLT_A} * (q.x - s.lvl)
           + {HOLT_B * (1 - HOLT_A) + (1 - HOLT_B)} * s.tr
  FROM st s JOIN seq q
    ON q.event_type = s.event_type AND q.rn = s.rn + 1
),
ape AS (
  SELECT s.event_type,
         CAST(ROUND(ABS(s.lvl + s.tr - q.x) / q.x, 12)
              AS DECIMAL(20,12)) AS e
  FROM st s JOIN seq q
    ON q.event_type = s.event_type AND q.rn = s.rn + 1
)
SELECT a.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_forecasts,
       ROUND(CAST(SUM(a.e) AS DOUBLE) / COUNT(*), 6) AS mape
FROM ape a GROUP BY a.event_type
""",
)
def timeseries_holt_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))

    def step(acc_last, x):
        lvl = F.lit(HOLT_A) * x["level"] + F.lit(1 - HOLT_A) * (
            acc_last["level"] + acc_last["trend"]
        )
        return F.struct(
            lvl.alias("level"),
            (
                F.lit(HOLT_B * HOLT_A) * (x["level"] - acc_last["level"])
                + F.lit(HOLT_B * (1 - HOLT_A) + (1 - HOLT_B))
                * acc_last["trend"]
            ).alias("trend"),
        )

    traj = (
        daily.groupBy("event_type")
        .agg(F.array_sort(F.collect_list(F.struct("d", "cnt"))).alias("xs"))
        .select(
            "event_type",
            F.transform(
                "xs",
                lambda s: F.struct(
                    s["cnt"].cast("double").alias("level"),
                    F.lit(0.0).alias("trend"),
                ),
            ).alias("vals"),
        )
        .select(
            "event_type",
            "vals",
            F.aggregate(
                F.slice("vals", F.lit(2), F.size("vals") - 1),
                F.array(F.element_at("vals", 1)),
                lambda acc, x: F.array_append(
                    acc, step(F.element_at(acc, -1), x)
                ),
            ).alias("states"),
        )
    )
    errs = traj.select(
        "event_type",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("vals") - 1),
                lambda i: F.round(
                    F.abs(
                        F.element_at("states", i)["level"]
                        + F.element_at("states", i)["trend"]
                        - F.element_at("vals", i + 1)["level"]
                    )
                    / F.element_at("vals", i + 1)["level"],
                    12,
                ).cast("decimal(20,12)"),
            )
        ).alias("e"),
    )
    return errs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_forecasts"),
        F.round(
            F.sum("e").cast("double") / F.count(F.lit(1)), 6
        ).alias("mape"),
    )


# ---------------------------------------------------------------------------
# Fellegi–Sunter record-linkage scoring
# ---------------------------------------------------------------------------

import math as _math

# (m, u) per comparison field: P(agree | match) and P(agree | non-match).
# The log-weights are computed ONCE in Python and injected as identical
# double literals into both engines — no engine-side ln() anywhere.
FS_FIELDS = {
    "seg": (0.95, 0.20),   # mktsegment equality
    "bal": (0.90, 0.05),   # account balance within 10.0
    "key": (0.85, 0.02),   # customer number within 5
}
FS_W = {
    f: (_math.log(m / u), _math.log((1 - m) / (1 - u)))
    for f, (m, u) in FS_FIELDS.items()
}
FS_MATCH, FS_POSSIBLE = 2.0, 0.0


@register(
    "er_fellegi_sunter",
    family="quality",
    doc="Fellegi–Sunter probabilistic record-linkage scoring (the 1969 "
    "decision model behind every production linker) over blocked "
    "customer pairs: candidates block on (nationkey, acctbal//500) — "
    "the fine-blocking posture that keeps within-block comparison "
    "quadratics bounded — and each pair scores "
    "sum_f(agree_f ? ln(m_f/u_f) : ln((1-m_f)/(1-u_f))) over three "
    "field comparators (segment equality, balance within 10, customer "
    "number within 5).  The log-weights are Python-computed literals "
    "injected into BOTH engines, so no libm ln() enters either plan; "
    "the score is a fixed-order sum of three identical doubles.  "
    "Output: the match / possible / non-match decision counts with "
    "DECIMAL-disciplined mean scores (round-12 per pair, exact sum, "
    "one division).",
    oracle=f"""
WITH c AS (
  SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment,
         CAST(FLOOR(c_acctbal / 500) AS BIGINT) AS blk
  FROM customer
),
pairs AS (
  SELECT a.c_custkey AS ka, b.c_custkey AS kb,
         (CASE WHEN a.c_mktsegment = b.c_mktsegment
               THEN {FS_W['seg'][0]!r} ELSE {FS_W['seg'][1]!r} END)
       + (CASE WHEN ABS(a.c_acctbal - b.c_acctbal) < 10.0
               THEN {FS_W['bal'][0]!r} ELSE {FS_W['bal'][1]!r} END)
       + (CASE WHEN ABS(a.c_custkey - b.c_custkey) < 5
               THEN {FS_W['key'][0]!r} ELSE {FS_W['key'][1]!r} END)
           AS score
  FROM c a JOIN c b
    ON a.c_nationkey = b.c_nationkey AND a.blk = b.blk
   AND a.c_custkey < b.c_custkey
),
scored AS (
  SELECT CASE WHEN score > {FS_MATCH!r} THEN 'match'
              WHEN score > {FS_POSSIBLE!r} THEN 'possible'
              ELSE 'non_match' END AS decision,
         CAST(ROUND(score, 12) AS DECIMAL(20,12)) AS s
  FROM pairs
)
SELECT decision, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) AS mean_score
FROM scored GROUP BY decision
""",
)
def er_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 500).cast("bigint").alias("blk"),
    )
    a, b = c.alias("a"), c.alias("b")

    def w(field, cond):
        wa, wd = FS_W[field]
        return F.when(cond, F.lit(wa)).otherwise(F.lit(wd))

    score = (
        w("seg", F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
        + w("bal", F.abs(F.col("a.c_acctbal") - F.col("b.c_acctbal")) < 10.0)
        + w("key", F.abs(F.col("a.c_custkey") - F.col("b.c_custkey")) < 5)
    )
    pairs = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    ).select(score.alias("score"))
    scored = pairs.select(
        F.when(F.col("score") > FS_MATCH, F.lit("match"))
        .when(F.col("score") > FS_POSSIBLE, F.lit("possible"))
        .otherwise(F.lit("non_match"))
        .alias("decision"),
        F.round("score", 12).cast("decimal(20,12)").alias("s"),
    )
    return scored.groupBy("decision").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(
            F.sum("s").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_score"),
    )
