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


# ---------------------------------------------------------------------------
# Single-linkage clustering via the MSF — dendrogram cut == threshold graph
# ---------------------------------------------------------------------------

_SL_CAP = 600  # reuse the MSF co-purchase graph (plans/round8.py)
_SL_T = 150


def _single_linkage_oracle(cap: int = _SL_CAP, t: int = _SL_T) -> str:
    return f"""
WITH RECURSIVE
li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey < {cap}
),
e0 AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
n AS (SELECT u AS node FROM e0 UNION SELECT v FROM e0),
e AS (
  SELECT u, v FROM e0 WHERE (u * 7 + v * 13) % 1000 <= {t}
),
sym AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v AS a, u AS b FROM e),
reach(node, lbl) AS (
  SELECT node, node FROM n
  UNION
  SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node
  WHERE r.lbl < s.b
),
lab AS (SELECT node, MIN(lbl) AS cluster FROM reach GROUP BY node)
SELECT CAST(cluster AS BIGINT) AS cluster,
       CAST(COUNT(*) AS BIGINT) AS size
FROM lab GROUP BY cluster
"""


@register(
    "cluster_single_linkage_mst",
    family="cluster",
    doc="Single-linkage clustering at distance threshold t via the "
    "minimum spanning forest (operators/mst.py::boruvka_forest at full "
    "depth + operators/components.py::connected_components): the "
    "dendrogram-cut clusters equal the connected components of the "
    "forest with every MST edge of weight > t removed — the classic "
    "SLINK-at-scale rendering (Gower/Ross 1969: the MST carries the "
    "whole single-linkage hierarchy, so ONE distributed MSF answers "
    "every threshold).  Graph: the MSF co-purchase parts graph "
    "(orders < 600, weight (7u+13v) mod 1000), t = 150; isolated "
    "nodes stay singleton clusters.  The oracle is deliberately "
    "INDEPENDENT: DuckDB computes the components of the THRESHOLD "
    "GRAPH directly (recursive min-label closure over edges <= t, "
    "never touching an MST) — agreement proves the cut-forest "
    "identity itself, not a replay of the same algorithm.  At 100 TB: "
    "Boruvka rounds are component-keyed aggregates, the cut is a "
    "filter, components use the guarded local-finish endgame.",
    oracle=_single_linkage_oracle(),
)
def cluster_single_linkage_mst(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import connected_components
    from ..operators.mst import boruvka_forest

    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < _SL_CAP)
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
    picked, _comp = boruvka_forest(e, rounds=10)
    cut = picked.where(F.col("w") <= _SL_T)
    labels = connected_components(cut, src="u", dst="v")
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
    )
    lab = nodes.join(labels, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("cluster")
    )
    return (
        lab.groupBy("cluster")
        .agg(F.count(F.lit(1)).cast("bigint").alias("size"))
        .select(F.col("cluster").cast("bigint").alias("cluster"), "size")
    )


# ---------------------------------------------------------------------------
# JPEG EXIF metadata — the curation-pipeline metadata read
# ---------------------------------------------------------------------------


@register(
    "multimodal_jpeg_exif_meta",
    family="multimodal",
    doc="EXIF metadata extraction from REAL JPEG APP1 segments "
    "(operators/exif.py): marker walk to Exif\\0\\0, TIFF byte-order "
    "header (the corpus alternates II and MM by id, so endianness "
    "handling is exercised, not assumed), IFD0 entry scan with "
    "type-aware value extraction — the RATIONAL XResolution lives "
    "OUT-OF-LINE behind the value-offset indirection, ASCII strings "
    "are NUL-terminated, the SHORT orientation is inline.  The "
    "image-curation metadata read (orientation/timestamp/resolution "
    "filters) that precedes any pixel work.  All values closed-form "
    "in the id, so the oracle reproduces them with printf arithmetic; "
    "a wrong byte order, offset walk or type size breaks the hash.",
    oracle="""
SELECT doc_id AS image_id,
       CAST(doc_id % 8 + 1 AS INT) AS orientation,
       printf('2026:%02d:%02d %02d:%02d:%02d',
              doc_id % 12 + 1, doc_id % 28 + 1,
              doc_id % 24, doc_id % 60, (doc_id * 7) % 60) AS datetime,
       'img-' || CAST(doc_id AS VARCHAR) AS description,
       CAST(doc_id % 300 + 1 AS BIGINT) AS xres_num,
       CAST(doc_id % 4 + 1 AS BIGINT) AS xres_den,
       CASE WHEN doc_id % 2 = 1 THEN 'MM' ELSE 'II' END AS byte_order
FROM documents
""",
)
def multimodal_jpeg_exif_meta(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.multimodal import (
        jpeg_exif_meta,
        synthesize_exif_jpeg_media,
    )

    d = table(spark, sf_dir, "documents")
    return jpeg_exif_meta(synthesize_exif_jpeg_media(d.select("doc_id")))


# ---------------------------------------------------------------------------
# Query-likelihood retrieval with Dirichlet smoothing (Zhai–Lafferty)
# ---------------------------------------------------------------------------

_QLD_QUERIES = (
    (0, "data quality training"),
    (1, "model the corpus documents"),
    (2, "spark pipeline shuffle"),
)
_QLD_MU = 50
_QLD_K = 5


@register(
    "retrieval_qld_dirichlet",
    family="retrieval",
    doc="Query-likelihood document ranking with Dirichlet-prior "
    "smoothing (Zhai and Lafferty, SIGIR'01 — the language-modeling "
    "retrieval family next to the repo's BM25 and tf-idf): "
    "score(q, d) = sum_t log((tf(t,d) + mu*p(t|C)) / (|d| + mu)) with "
    "p(t|C) the corpus unigram MLE and mu = 50.  Rendering: one "
    "corpus term-frequency aggregate, one per-doc length aggregate, "
    "the 3 fixed queries' terms broadcast against them; absent terms "
    "contribute the smoothing-only term, so the score decomposes as "
    "the per-doc constant plus the posting-list part — the shape "
    "that scales as posting joins (the bounded literal cross join "
    "here keeps the demo plan readable).  Natural logs ride ROUND-6 "
    "on both engines (the text_*_logprob precedent).  Top-5 per "
    "query, doc_id ties ascending.",
    oracle=f"""
WITH q(query_id, qtext) AS (VALUES
  {", ".join(f"({i}, '{t}')" for i, t in _QLD_QUERIES)}
),
qt AS (
  SELECT query_id, UNNEST(string_split(qtext, ' ')) AS term FROM q
),
toks AS (
  SELECT doc_id,
         UNNEST(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                            x -> x != '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
cf AS (SELECT term, COUNT(*) AS cf FROM toks GROUP BY 1),
ctot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM toks),
scored AS (
  SELECT qt.query_id, dl.doc_id,
         SUM(LN((COALESCE(tf.tf, 0) + {_QLD_MU} * cf.cf / ctot.n)
                / (dl.dl + {_QLD_MU}))) AS s
  FROM qt
  JOIN ctot ON TRUE
  JOIN cf ON cf.term = qt.term
  CROSS JOIN dl
  LEFT JOIN tf ON tf.doc_id = dl.doc_id AND tf.term = qt.term
  GROUP BY qt.query_id, dl.doc_id
)
SELECT query_id, doc_id, ROUND(s, 6) AS score, CAST(rank AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY ROUND(s, 6) DESC, doc_id ASC) AS rank
  FROM scored
) WHERE rank <= {_QLD_K}
""",
)
def retrieval_qld_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import tokens

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(tokens(F.lower(F.col("text")))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    cf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cf"))
    n_tot = toks.agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    qt = spark.createDataFrame(
        [(i, t) for i, txt in _QLD_QUERIES for t in txt.split(" ")],
        "query_id int, term string",
    )
    mu = F.lit(float(_QLD_MU))
    scored = (
        F.broadcast(qt)
        .join(F.broadcast(cf), "term")
        .crossJoin(F.broadcast(n_tot))
        .crossJoin(dl)
        .join(tf, ["doc_id", "term"], "left")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                F.log(
                    (
                        F.coalesce(F.col("tf"), F.lit(0))
                        + mu * F.col("cf") / F.col("n")
                    )
                    / (F.col("dl") + mu)
                )
            ).alias("s")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round("s", 6).desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _QLD_K)
        .select(
            "query_id",
            "doc_id",
            F.round("s", 6).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Blocking-scheme quality — reduction ratio and pair completeness
# ---------------------------------------------------------------------------

_BQ_CAP = 400  # records in the exhaustive-truth tier


@register(
    "er_blocking_quality",
    family="quality",
    doc="Blocking-scheme evaluation for entity resolution (the "
    "Christen-survey metrics every ER paper reports): over the first "
    "400 customers, ground-truth matches come from an EXHAUSTIVE "
    "Fellegi-Sunter-style agreement rule (same mktsegment AND "
    "|acctbal diff| <= 10 AND |custkey diff| <= 5 — the er_fellegi_"
    "sunter comparators at their agree thresholds), and the "
    "(nationkey, acctbal//500) blocking scheme is scored by "
    "REDUCTION RATIO (1 - candidate/all pairs — how much comparison "
    "work blocking saves) and PAIR COMPLETENESS (the fraction of true "
    "matches the blocks retain — blocking recall).  The exhaustive "
    "tier is the bounded all-pairs verification posture (400 records "
    "= 79,800 pairs, broadcast cross); production blocking itself "
    "stays an equi-join.  One row out, ratios ROUND-6.",
    oracle=f"""
WITH c AS (
  SELECT c_custkey AS k, c_nationkey AS nk, c_mktsegment AS seg,
         c_acctbal AS bal, CAST(FLOOR(c_acctbal / 500) AS BIGINT) AS bb
  FROM customer WHERE c_custkey <= {_BQ_CAP}
),
pairs AS (
  SELECT a.k AS ka, b.k AS kb,
         (a.nk = b.nk AND a.bb = b.bb) AS blocked,
         (a.seg = b.seg AND ABS(a.bal - b.bal) <= 10
          AND b.k - a.k <= 5) AS is_match
  FROM c a JOIN c b ON a.k < b.k
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT)
           AS n_candidates,
         CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT)
           AS n_true,
         CAST(SUM(CASE WHEN is_match AND blocked THEN 1 ELSE 0 END)
              AS BIGINT) AS n_true_blocked
  FROM pairs
)
SELECT n_pairs, n_candidates, n_true, n_true_blocked,
       ROUND(1.0 - CAST(n_candidates AS DOUBLE) / n_pairs, 6)
         AS reduction_ratio,
       ROUND(CAST(n_true_blocked AS DOUBLE) / n_true, 6)
         AS pair_completeness
FROM agg
""",
)
def er_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") <= _BQ_CAP)
        .select(
            F.col("c_custkey").alias("k"),
            F.col("c_nationkey").alias("nk"),
            F.col("c_mktsegment").alias("seg"),
            F.col("c_acctbal").alias("bal"),
            F.floor(F.col("c_acctbal") / 500).cast("long").alias("bb"),
        )
    )
    a = c.select(*[F.col(x).alias(f"a_{x}") for x in c.columns])
    b = c.select(*[F.col(x).alias(f"b_{x}") for x in c.columns])
    pairs = F.broadcast(a).join(
        b, F.col("a_k") < F.col("b_k")
    ).select(
        (
            (F.col("a_nk") == F.col("b_nk"))
            & (F.col("a_bb") == F.col("b_bb"))
        ).alias("blocked"),
        (
            (F.col("a_seg") == F.col("b_seg"))
            & (F.abs(F.col("a_bal") - F.col("b_bal")) <= 10)
            & (F.col("b_k") - F.col("a_k") <= 5)
        ).alias("is_match"),
    )
    agg = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.col("blocked").cast("long")).cast("bigint").alias(
            "n_candidates"
        ),
        F.sum(F.col("is_match").cast("long")).cast("bigint").alias(
            "n_true"
        ),
        F.sum(
            (F.col("is_match") & F.col("blocked")).cast("long")
        ).cast("bigint").alias("n_true_blocked"),
    )
    return agg.select(
        "n_pairs",
        "n_candidates",
        "n_true",
        "n_true_blocked",
        F.round(
            F.lit(1.0) - F.col("n_candidates").cast("double") / F.col("n_pairs"),
            6,
        ).alias("reduction_ratio"),
        F.round(
            F.col("n_true_blocked").cast("double") / F.col("n_true"), 6
        ).alias("pair_completeness"),
    )


# ---------------------------------------------------------------------------
# Misra–Gries two-pass exact heavy hitters
# ---------------------------------------------------------------------------

_MG_K = 16


@register(
    "sketch_misra_gries_heavy",
    family="sketch",
    doc="Misra-Gries heavy hitters as the pruning pass of the two-pass "
    "EXACT pipeline (operators/misra_gries.py; Misra/Gries '82, "
    "mergeable per Agarwal et al. PODS'12) — the deterministic "
    "counter-based summary family beside the repo's linear sketches "
    "(Count-Min: cell sums; KMV/HLL: order statistics): per partition "
    "the exact counts compress to <= k counters by subtracting the "
    "(k+1)-th largest (no key with partition count above n_p/(k+1) "
    "can drop), summaries merge by plain per-key addition, and the "
    "candidate superset is recounted exactly and filtered at "
    "N/(k+1).  Because MG has NO false negatives, the sketch-pruned "
    "output equals the plain GROUP BY / HAVING answer — the oracle "
    "verifies a sketch pipeline exactly, no rows-only concession.  "
    "Key: a deterministically SKEWED derivation of events.user_id "
    "(40% of rows collapse onto two heavy keys, the rest stay a "
    "uniform per-user tail) so the per-partition trim really prunes "
    "and only the two heavy keys clear N/(k+1).  Scale: one Arrow pass emitting <= k rows "
    "per partition, one small candidate aggregate, one semi-joined "
    "recount.",
    oracle=f"""
WITH k AS (
  SELECT CASE WHEN user_id % 10 < 4
              THEN 'heavy_' || CAST(user_id % 2 AS VARCHAR)
              ELSE 'u' || CAST(user_id AS VARCHAR) END AS key
  FROM events
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM k)
SELECT key,
       CAST(COUNT(*) AS BIGINT) AS exact_count,
       CAST(n.n // {_MG_K + 1} AS BIGINT) AS threshold
FROM k, n
GROUP BY key, n.n
HAVING COUNT(*) * {_MG_K + 1} > n.n
""",
)
def sketch_misra_gries_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.misra_gries import mg_exact_heavy_hitters

    ev = table(spark, sf_dir, "events").select(
        F.when(
            F.col("user_id") % 10 < 4,
            F.concat(F.lit("heavy_"), (F.col("user_id") % 2).cast("string")),
        )
        .otherwise(F.concat(F.lit("u"), F.col("user_id").cast("string")))
        .alias("key")
    )
    return mg_exact_heavy_hitters(ev, "key", _MG_K)


# ---------------------------------------------------------------------------
# AMS (tug-of-war) F2 moment sketch
# ---------------------------------------------------------------------------

_AMS_R = 16  # estimators (4 groups of 4 for median-of-means)


@register(
    "sketch_ams_f2",
    family="sketch",
    doc="AMS tug-of-war sketch for the second frequency moment "
    "(Alon-Matias-Szegedy STOC'96 — the linear sketch family's "
    "founding member, beside the repo's Count-Min/KMV/HLL/dyadic "
    "set): 16 estimators Z_i = sum_v s_i(v) * f_v with four-wise-"
    "independent-style signs s_i(v) = 2*(md5(i:v) mod 2) - 1 (the "
    "repo's SQL-replayable md5 family), E[Z_i^2] = F2; reported as "
    "the plain mean of the 16 squares AND the textbook "
    "median-of-means over 4 groups of 4 (middle-two average, "
    "computed by explicit sorted-list arithmetic so both engines "
    "interpolate identically).  Exact F2 rides along for the "
    "relative-error audit.  Scale shape: one exact per-key count "
    "(the sketch is LINEAR, so signs apply to aggregated counts, "
    "16 md5s per DISTINCT key, not per row), one 16-column sum — "
    "mergeable by vector addition across shards.",
    oracle=f"""
WITH f AS (
  SELECT l_partkey AS v, CAST(COUNT(*) AS BIGINT) AS fv
  FROM lineitem GROUP BY 1
),
z AS (
  SELECT i.i,
         CAST(SUM((2 * (CAST(('0x' || substr(md5(CAST(i.i AS VARCHAR) || ':'
                || CAST(f.v AS VARCHAR)), 1, 15)) AS BIGINT) % 2) - 1)
               * f.fv) AS BIGINT) AS z
  FROM f, UNNEST(range(0, {_AMS_R})) AS i(i)
  GROUP BY i.i
),
g AS (
  SELECT i // 4 AS grp, CAST(AVG(z * z) AS DOUBLE) AS gm
  FROM z GROUP BY 1
),
mom AS (
  SELECT (l[2] + l[3]) / 2 AS f2_mom
  FROM (SELECT list_sort(list(gm)) AS l FROM g)
),
exact AS (SELECT CAST(SUM(fv * fv) AS BIGINT) AS f2_exact FROM f),
mean AS (SELECT CAST(AVG(z * z) AS DOUBLE) AS f2_mean FROM z)
SELECT exact.f2_exact,
       ROUND(mean.f2_mean, 6) AS f2_mean,
       ROUND(mom.f2_mom, 6) AS f2_mom,
       ROUND(ABS(mean.f2_mean - exact.f2_exact) / exact.f2_exact, 6)
         AS rel_err_mean
FROM exact, mean, mom
""",
)
def sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_long

    li = table(spark, sf_dir, "lineitem")
    f = li.groupBy(F.col("l_partkey").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("fv")
    )

    def sign(i: int) -> F.Column:
        h = md5_long(
            F.concat(
                F.lit(f"{i}:"), F.col("v").cast("string")
            )
        )
        return (h % 2) * 2 - 1

    zs = f.agg(
        *[
            F.sum(sign(i) * F.col("fv")).cast("bigint").alias(f"z{i}")
            for i in range(_AMS_R)
        ]
    )
    z2 = [F.col(f"z{i}") * F.col(f"z{i}") for i in range(_AMS_R)]
    group_means = [
        (
            sum(z2[4 * g + j] for j in range(4)).cast("double") / F.lit(4.0)
        ).alias(f"g{g}")
        for g in range(4)
    ]
    exact = f.agg(
        F.sum(F.col("fv") * F.col("fv")).cast("bigint").alias("f2_exact")
    )
    out = zs.select(*group_means, *[F.col(f"z{i}") for i in range(_AMS_R)])
    sorted_g = F.sort_array(
        F.array(*[F.col(f"g{g}") for g in range(4)])
    )
    mean_expr = (
        sum(z2[i] for i in range(_AMS_R)).cast("double") / F.lit(float(_AMS_R))
    )
    return (
        out.select(
            mean_expr.alias("f2_mean"),
            ((sorted_g[1] + sorted_g[2]) / F.lit(2.0)).alias("f2_mom"),
        )
        .crossJoin(F.broadcast(exact))
        .select(
            "f2_exact",
            F.round("f2_mean", 6).alias("f2_mean"),
            F.round("f2_mom", 6).alias("f2_mom"),
            F.round(
                F.abs(F.col("f2_mean") - F.col("f2_exact"))
                / F.col("f2_exact"),
                6,
            ).alias("rel_err_mean"),
        )
    )
