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
