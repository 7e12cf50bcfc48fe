"""Round-11 queries: multi-table LSH ANN (the E2LSH OR-amplification
that gives hyperplane LSH a usable recall point), plus this round's
additions to the similarity/streaming frontier.

Reference parity: none — §2.I LLM-pipeline extension tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import register, table

# ---------------------------------------------------------------------------
# Multi-table sign-LSH — the OR-amplified recall path
# ---------------------------------------------------------------------------

_MT_PLANES = 6
_MT_TABLES = 8
_MT_K = 5
_MT_NQ = 3


def _mtlsh_oracle(
    num_planes: int = _MT_PLANES,
    n_tables: int = _MT_TABLES,
    k: int = _MT_K,
    nq: int = _MT_NQ,
    seed: int = 42,
) -> str:
    """Generated oracle: every table's seeded hyperplanes inlined as one
    (t, plane_idx, p) VALUES relation; per-table sign buckets, the
    (t, bucket) candidate join, cross-table DISTINCT and the exact-cosine
    top-k replayed relationally — byte-identical to
    similarity.lsh_multitable_topk."""
    from ..operators.similarity import _lcg_planes

    rows = []
    for t in range(n_tables):
        for i, p in enumerate(_lcg_planes(num_planes, 64, seed + t)):
            lst = "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in p) + "]"
            rows.append(f"({t}, {i}, {lst})")
    values = ",\n    ".join(rows)
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
planes(t, plane_idx, p) AS (VALUES
    {values}
),
b AS (
  SELECT e.vec_id, pl.t,
         CAST(SUM(CASE WHEN list_dot_product(e.v, pl.p) >= 0
                       THEN CAST(POWER(2, pl.plane_idx) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS bucket
  FROM e CROSS JOIN planes pl
  GROUP BY e.vec_id, pl.t
),
cand AS (
  SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
  FROM b qb JOIN b cb ON cb.t = qb.t AND cb.bucket = qb.bucket
  WHERE qb.vec_id < {nq} AND cb.vec_id != qb.vec_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         ROUND(list_dot_product(q.v, n.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(n.v, n.v))), 6) AS cosine
  FROM cand c
  JOIN e q ON q.vec_id = c.query_id
  JOIN e n ON n.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {k}
"""


@register(
    "ann_lsh_multitable_topk",
    family="similarity",
    doc="Multi-table sign-LSH top-k (operators/similarity.py::"
    "lsh_multitable_topk; the E2LSH OR-amplification of Indyk/Motwani "
    "and Datar et al.): 8 INDEPENDENT seeded 6-plane tables, candidate "
    "union across tables, cross-table DISTINCT, exact-cosine re-rank.  "
    "Multi-probe widens one table's search with correlated probes and "
    "plateaued at recall 0.10 (ANN_RECALL_r10's negative result); "
    "independent tables follow the 1-(1-p^planes)^L curve instead — "
    "the standard construction that pushes hyperplane LSH to usable "
    "RECALL (0.56-0.69 at planes6x16 / planes4x8, ANN_RECALL_r11, vs "
    "the 0.10 multi-probe plateau).  Honest frontier note: at the "
    "harness's 2000-vector corpus the L-table index work cannot "
    "amortize against an O(n) brute scan (2.8-9x brute wall), so "
    "IVFPQ+rerank (0.986 at 1.9x) dominates every hyperplane-LSH "
    "config THERE — the multitable curve is the 100 TB shape, where "
    "the bucket-pruned candidate fraction, not the index pass, is the "
    "cost that matters.  Deterministic end to end "
    "(LCG hyperplanes seeded 42..49, 6-dp rounding, neighbor-id ties), "
    "so the oracle replays every table's buckets and the full re-rank "
    "from the same plane constants.  At 100 TB: the corpus index "
    "carries L bucket rows per vector (the E2LSH space tradeoff) and "
    "the candidate join shuffles only (table, bucket) groups.",
    oracle=_mtlsh_oracle(),
)
def ann_lsh_multitable_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity as S

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.where(F.col("vec_id") < _MT_NQ)
    out = S.lsh_multitable_topk(
        queries,
        emb,
        k=_MT_K,
        num_planes=_MT_PLANES,
        n_tables=_MT_TABLES,
        dim=64,
    )
    return out.select(
        "query_id",
        "neighbor_id",
        "cosine",
        F.col("rank").cast("int").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Sub-byte PNG depths — the last real-world PNG decode seam (r10 item 4)
# ---------------------------------------------------------------------------


@register(
    "multimodal_png_subbyte_stats",
    family="multimodal",
    doc="Pixel statistics over the REAL 1/2/4-bit PNG decode paths "
    "(operators/multimodal.py::decode_png_pixels — the sub-byte seam "
    "the r10 verdict named): depth cycles 1/2/4 by id % 3, even ids "
    "are packed GREYSCALE scanlines (MSB-first bit groups, filter "
    "distance floored at one byte per the spec, raw levels out "
    "unscaled), odd ids are PALETTIZED at the same depths (packed "
    "indexes expanded through PLTE[i] = (37i, 59i, 83i) mod 256).  "
    "All five PNG filters cycle per row, so a wrong bit order, a "
    "wrong scanline stride (padding bits must fall off), or a wrong "
    "filter distance breaks the hash.  Levels are closed-form "
    "(id*7 + 3x + 5y) mod 2^depth; blobs stay inside the Arrow batch.",
    oracle="""
WITH dims AS (
  SELECT doc_id, doc_id % 24 + 4 AS w, doc_id % 16 + 4 AS h,
         CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END AS depth,
         doc_id % 2 = 0 AS grey
  FROM documents
),
lv AS (
  SELECT doc_id, w, h, grey,
         (doc_id * 7 + 3 * xs.x + 5 * ys.y) % (1 << depth) AS idx
  FROM dims,
       UNNEST(range(0, w)) AS xs(x),
       UNNEST(range(0, h)) AS ys(y)
),
px AS (
  SELECT doc_id, w, h,
         CASE WHEN grey THEN idx
              ELSE (idx * CASE cs.c WHEN 0 THEN 37 WHEN 1 THEN 59
                                    ELSE 83 END) % 256
         END AS v
  FROM lv, UNNEST(range(0, 3)) AS cs(c)
  WHERE cs.c = 0 OR NOT grey
)
SELECT doc_id AS image_id,
       CAST(MIN(w) AS INT) AS width,
       CAST(MIN(h) AS INT) AS height,
       CAST(COUNT(*) AS BIGINT) AS n_subpixels,
       CAST(SUM(v) AS BIGINT) AS px_sum,
       CAST(MIN(v) AS INT) AS px_min,
       CAST(MAX(v) AS INT) AS px_max
FROM px GROUP BY doc_id
""",
)
def multimodal_png_subbyte_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.multimodal import (
        png_pixel_stats,
        synthesize_png_subbyte_media,
    )

    d = table(spark, sf_dir, "documents")
    return png_pixel_stats(synthesize_png_subbyte_media(d.select("doc_id")))


# ---------------------------------------------------------------------------
# 4:2:0-subsampled progressive JPEG — the last named progressive seam
# ---------------------------------------------------------------------------


@register(
    "multimodal_jpeg_progressive_420_stats",
    family="multimodal",
    doc="REAL 4:2:0-SUBSAMPLED progressive JPEG decode "
    "(operators/jpeg_progressive.py::encode_progressive_jpeg_420 + the "
    "general-sampling branches of decode_progressive_jpeg — the seam "
    "the r10 verdict named): Y sampled 2x2, chroma 1x1 at half "
    "resolution; interleaved DC scans walk the T.81 A.2.3 MCU block "
    "order (four Y blocks then Cb then Cr, per-component predictors, "
    "both bit-planes), per-component AC scans cover each component's "
    "OWN block grid, and decoded chroma is upsampled by sample "
    "replication.  Constant blocks keep closed-form exactness: "
    "Y(x,y) = (id*11 + 13*(x div 8) + 29*(y div 8)) mod 256 on the "
    "full-res grid, chroma c at (id*11 + 13*(x div 16) + "
    "29*(y div 16) + 47c) mod 256 after upsampling — a wrong MCU "
    "order, block-grid mapping or upsample breaks the hash.  Also "
    "covers 4:2:2 sampling in the decoder (Hi,Vi in {1,2} generally).",
    oracle="""
WITH dims AS (
  SELECT doc_id, 16 * (doc_id % 3 + 1) AS w, 16 * (doc_id % 2 + 1) AS h
  FROM documents
),
px AS (
  SELECT doc_id, w, h,
         CASE WHEN cs.c = 0
              THEN (doc_id * 11 + 13 * (xs.x // 8) + 29 * (ys.y // 8)) % 256
              ELSE (doc_id * 11 + 13 * (xs.x // 16) + 29 * (ys.y // 16)
                    + 47 * cs.c) % 256
         END AS v
  FROM dims,
       UNNEST(range(0, w)) AS xs(x),
       UNNEST(range(0, h)) AS ys(y),
       UNNEST(range(0, 3)) AS cs(c)
)
SELECT doc_id AS image_id,
       CAST(MIN(w) AS INT) AS width,
       CAST(MIN(h) AS INT) AS height,
       CAST(COUNT(*) AS BIGINT) AS n_subpixels,
       CAST(SUM(v) AS BIGINT) AS px_sum,
       CAST(MIN(v) AS INT) AS px_min,
       CAST(MAX(v) AS INT) AS px_max
FROM px GROUP BY doc_id
""",
)
def multimodal_jpeg_progressive_420_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.multimodal import (
        jpeg_pixel_stats,
        synthesize_progressive_420_jpeg_media,
    )

    d = table(spark, sf_dir, "documents")
    return jpeg_pixel_stats(
        synthesize_progressive_420_jpeg_media(d.select("doc_id"))
    )


# ---------------------------------------------------------------------------
# IMA ADPCM WAV — the named audio codec seam
# ---------------------------------------------------------------------------


def _adpcm_oracle() -> str:
    """Generated oracle: the 89-entry IMA step table inlined as VALUES;
    a RECURSIVE CTE replays the decode recurrence (diff composition,
    int16 clamp, index-table adjust) over the same closed-form nibble /
    header constants the fixture encodes — a genuinely independent
    re-derivation of the sequential state machine, not a replay of the
    Python decoder."""
    from ..operators.multimodal import IMA_STEP_TABLE

    steps = ", ".join(f"({i}, {s})" for i, s in enumerate(IMA_STEP_TABLE))
    return f"""
WITH RECURSIVE
steptab(i, s) AS (VALUES {steps}),
blocks AS (
  SELECT doc_id, bs.b
  FROM documents, UNNEST(range(0, doc_id % 2 + 1)) AS bs(b)
),
dec(doc_id, b, k, pred, idx) AS (
  SELECT doc_id, b, 0,
         ((doc_id * 97 + 131 * b) % 4096) - 2048,
         (doc_id + 5 * b) % 40
  FROM blocks
  UNION ALL
  SELECT doc_id, b, k + 1,
         CASE WHEN (nib & 8) != 0
              THEN GREATEST(-32768, pred - diff)
              ELSE LEAST(32767, pred + diff) END,
         LEAST(88, GREATEST(0, idx + CASE WHEN (nib & 7) < 4 THEN -1
                                         ELSE 2 * ((nib & 7) - 3) END))
  FROM (
    SELECT q.*,
           (q.s >> 3)
           + CASE WHEN (q.nib & 4) != 0 THEN q.s ELSE 0 END
           + CASE WHEN (q.nib & 2) != 0 THEN q.s >> 1 ELSE 0 END
           + CASE WHEN (q.nib & 1) != 0 THEN q.s >> 2 ELSE 0 END AS diff
    FROM (
      SELECT d.doc_id, d.b, d.k, d.pred, d.idx, st.s,
             (d.doc_id * 3 + 7 * d.k + 11 * d.b) % 16 AS nib
      FROM dec d JOIN steptab st ON st.i = d.idx
      WHERE d.k < 16
    ) q
  )
)
SELECT doc_id AS audio_id,
       CAST(COUNT(*) AS INT) AS n_samples,
       CAST(1 AS INT) AS n_channels,
       CAST(SUM(pred) AS BIGINT) AS sample_sum,
       CAST(MIN(pred) AS INT) AS sample_min,
       CAST(MAX(pred) AS INT) AS sample_max
FROM dec GROUP BY doc_id
"""


@register(
    "multimodal_wav_adpcm_stats",
    family="multimodal",
    doc="Sample statistics over the REAL mono IMA ADPCM WAV decode path "
    "(operators/multimodal.py::_ima_adpcm_decode, format tag 0x11 — "
    "the named audio seam after PCM and G.711): per 12-byte block a "
    "4-byte header (int16 predictor = first output sample, step "
    "index) then 16 low-nibble-first 4-bit codes; per nibble "
    "diff = step>>3 (+step if n&4) (+step>>1 if n&2) (+step>>2 if "
    "n&1), sign n&8, int16 clamp, step index walked by the IMA index "
    "table with [0,88] clamp.  The oracle re-derives the whole "
    "sequential state machine as a RECURSIVE CTE over the inlined "
    "89-entry step table — the first oracle in the registry that "
    "replays a stateful codec recurrence relationally instead of "
    "comparing closed-form pixel laws.  Blobs stay in the Arrow "
    "batch; narrow stat rows out.",
    oracle=_adpcm_oracle(),
)
def multimodal_wav_adpcm_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.multimodal import (
        synthesize_adpcm_audio,
        wav_sample_stats,
    )

    d = table(spark, sf_dir, "documents")
    return wav_sample_stats(synthesize_adpcm_audio(d.select("doc_id")))
