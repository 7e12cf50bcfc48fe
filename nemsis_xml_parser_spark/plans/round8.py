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
