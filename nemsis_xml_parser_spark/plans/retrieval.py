"""Retrieval & data-selection queries (SURVEY §2.I extension, round 5).

The retrieval tier a training-data pipeline runs on top of the corpus:
hybrid lexical+dense search (BM25 fused with embedding cosine via
Reciprocal Rank Fusion — the standard ensembling used by every RAG
stack), DSIR-style importance weighting (Xie et al. 2023: unigram-LM
log-likelihood ratio between a target domain and the raw corpus, the
scalable recipe for "select pretraining data that looks like the
target"), and a Heaps-law vocabulary-growth fit (the sublinear
vocab-vs-tokens exponent — the corpus-health statistic that detects
template/boilerplate collapse when beta drops).

Scale shapes: every corpus-sized frame is aggregated once onto a bounded
domain (term stats, rank pools, doc-id buckets) before any window or
triangular join; rank windows only ever run above an explicit Limit
(TakeOrderedAndProject pool) or partitioned by query id.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import register, table

# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 ∪ dense cosine, Reciprocal Rank Fusion
# ---------------------------------------------------------------------------

RRF_TERMS = ("spark", "join", "window")
RRF_POOL = 50  # per-ranker candidate pool
RRF_K = 60  # the standard RRF dampening constant
RRF_TOP = 20
_PROBE_VEC = 0  # dense probe = embedding of vec_id 0 (doc_id-aligned)

_BM25_POOL_SQL = f"""
tok AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS term
    FROM documents
  ) WHERE term <> ''
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
stats AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE term IN ('spark', 'join', 'window')
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         LN(1.0 + (n_docs - df + 0.5) / (df + 0.5))
         * (tf * (1.2 + 1.0))
         / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * CAST(dl AS DOUBLE) / avgdl)) AS s
  FROM tf
  JOIN dfreq USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
),
bm AS (SELECT doc_id, ROUND(SUM(s), 6) AS bm25 FROM scored GROUP BY doc_id),
btop AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT)
           AS bm25_rank
  FROM (SELECT * FROM bm ORDER BY bm25 DESC, doc_id ASC LIMIT {RRF_POOL})
)
"""


@register(
    "retrieval_hybrid_rrf",
    family="text",
    doc="Hybrid retrieval with Reciprocal Rank Fusion: the BM25 ranking "
    "for probe terms {spark, join, window} (operators/ranking.py, same "
    "scoring as text_bm25_score) and the dense cosine ranking against "
    "the embedding of vec_id 0 (operators/similarity.py brute-force "
    "baseline) are each pooled to their top-50 (orderBy().limit() — "
    "TakeOrderedAndProject), rank-numbered INSIDE the bounded pool "
    "(the only global windows sit above an explicit Limit), "
    "full-outer-joined on doc_id, and fused with "
    "score = Σ 1/(60 + rank).  Missing ranks contribute 0 — the "
    "textbook RRF treatment of single-list hits.  Scale shape: each "
    "ranker's pool is a fixed-size TakeOrdered heap, the fusion join "
    "and final top-20 run on ≤2·pool rows; at 100 TB the dense pool "
    "comes from the IVF/LSH path instead of brute force, the fusion "
    "stage is unchanged.",
    oracle=f"""
WITH {_BM25_POOL_SQL},
e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
q AS (SELECT v FROM e WHERE vec_id = {_PROBE_VEC}),
cos AS (
  SELECT c.vec_id AS doc_id,
         ROUND(CASE WHEN sqrt(list_dot_product(q.v, q.v))
                         * sqrt(list_dot_product(c.v, c.v)) > 0
               THEN list_dot_product(q.v, c.v)
                    / (sqrt(list_dot_product(q.v, q.v))
                       * sqrt(list_dot_product(c.v, c.v)))
               ELSE 0.0 END, 6) AS cosine
  FROM e c CROSS JOIN q WHERE c.vec_id != {_PROBE_VEC}
),
ctop AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id ASC) AS BIGINT)
           AS cos_rank
  FROM (SELECT * FROM cos ORDER BY cosine DESC, doc_id ASC LIMIT {RRF_POOL})
),
fused AS (
  SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
         b.bm25_rank, c.cos_rank,
         ROUND(COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + b.bm25_rank), 0.0)
               + COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + c.cos_rank), 0.0), 6)
           AS rrf_score
  FROM btop b FULL OUTER JOIN ctop c ON b.doc_id = c.doc_id
)
SELECT doc_id, bm25_rank, cos_rank, rrf_score
FROM fused ORDER BY rrf_score DESC, doc_id ASC LIMIT {RRF_TOP}
""",
)
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import ranking as R
    from ..operators import similarity as S

    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")

    bpool = (
        R.bm25_scores(d, terms=RRF_TERMS)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(RRF_POOL)
    )
    btop = bpool.withColumn(
        "bm25_rank",
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()))
        .cast("bigint"),
    ).select("doc_id", "bm25_rank")

    ctop = (
        S.brute_force_topk(
            e.where(F.col("vec_id") == _PROBE_VEC), e, k=RRF_POOL
        )
        .select(
            F.col("neighbor_id").alias("doc_id"),
            F.col("rank").cast("bigint").alias("cos_rank"),
        )
    )

    fused = btop.join(ctop, "doc_id", "full_outer").select(
        "doc_id",
        "bm25_rank",
        "cos_rank",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("bm25_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("cos_rank")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc()).limit(
        RRF_TOP
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weighting (target-domain data selection)
# ---------------------------------------------------------------------------

DSIR_TARGET_SOURCE = "src1"
DSIR_TOP = 25


@register(
    "curation_dsir_importance",
    family="curation",
    doc="DSIR-style importance weights (Xie et al. 2023, 'Data Selection "
    "for Language Models via Importance Resampling', re-expressed on "
    "unigrams): target = documents from source src1, raw = the whole "
    "corpus; each term gets the add-1-smoothed log-likelihood ratio "
    "ln p_target(t) − ln p_raw(t) over the SHARED corpus vocabulary, "
    "and each document scores Σ tf·ratio — high scorers 'look like' "
    "the target domain and would be up-weighted in resampling.  "
    "Top-25 by (score DESC, doc_id) via orderBy().limit().  Scale "
    "shape: two (term) hash aggregates build the LM tables, the "
    "per-doc score is a term-keyed shuffle join (tf ⋈ ratio — the "
    "ratio table is vocab-sized, NOT assumed broadcastable) and one "
    "(doc) aggregate; corpus scalars (token totals, vocab size) ride "
    "a broadcast cross join.",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, source, term FROM (
    SELECT doc_id, source,
           UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS term
    FROM documents
  ) WHERE term <> ''
),
raw_tf AS (SELECT term, COUNT(*) AS cr FROM tok GROUP BY term),
tgt_tf AS (
  SELECT term, COUNT(*) AS ct FROM tok
  WHERE source = '{DSIR_TARGET_SOURCE}' GROUP BY term
),
totals AS (
  SELECT CAST(SUM(cr) AS BIGINT) AS n_raw,
         CAST(COUNT(*) AS BIGINT) AS vocab
  FROM raw_tf
),
tgt_total AS (
  SELECT CAST(COALESCE(SUM(ct), 0) AS BIGINT) AS n_tgt FROM tgt_tf
),
ratio AS (
  SELECT r.term,
         LN(CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE) / (n_tgt + vocab))
         - LN(CAST(r.cr + 1 AS DOUBLE) / (n_raw + vocab)) AS lr
  FROM raw_tf r
  LEFT JOIN tgt_tf t ON t.term = r.term
  CROSS JOIN totals CROSS JOIN tgt_total
),
doc_tf AS (
  SELECT doc_id, source, term, COUNT(*) AS tf
  FROM tok GROUP BY doc_id, source, term
),
scored AS (
  SELECT d.doc_id, d.source,
         CAST(SUM(d.tf) AS BIGINT) AS n_tokens,
         ROUND(SUM(d.tf * r.lr), 6) AS dsir_logratio
  FROM doc_tf d JOIN ratio r ON r.term = d.term
  GROUP BY d.doc_id, d.source
)
SELECT doc_id, source, n_tokens, dsir_logratio
FROM scored ORDER BY dsir_logratio DESC, doc_id ASC LIMIT {DSIR_TOP}
""",
)
def curation_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as T

    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "source", F.explode(T.tokens(F.lower(F.col("text")))).alias("term")
    )
    raw_tf = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cr"))
    tgt_tf = (
        tok.where(F.col("source") == DSIR_TARGET_SOURCE)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    totals = raw_tf.agg(
        F.sum("cr").cast("bigint").alias("n_raw"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
    )
    tgt_total = tgt_tf.agg(
        F.coalesce(F.sum("ct"), F.lit(0)).cast("bigint").alias("n_tgt")
    )
    ratio = (
        raw_tf.join(tgt_tf, "term", "left")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(tgt_total))
        .select(
            "term",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                    / (F.col("n_tgt") + F.col("vocab"))
                )
                - F.log(
                    (F.col("cr") + 1).cast("double")
                    / (F.col("n_raw") + F.col("vocab"))
                )
            ).alias("lr"),
        )
    )
    doc_tf = tok.groupBy("doc_id", "source", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    scored = (
        doc_tf.join(ratio, "term")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.round(F.sum(F.col("tf") * F.col("lr")), 6).alias("dsir_logratio"),
        )
    )
    return scored.orderBy(
        F.col("dsir_logratio").desc(), F.col("doc_id").asc()
    ).limit(DSIR_TOP)


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth fit
# ---------------------------------------------------------------------------

HEAPS_BUCKETS = 20


@register(
    "text_heaps_law",
    family="text",
    doc="Heaps-law vocabulary-growth fit V(N) ≈ k·N^β over the word-BIGRAM "
    "vocabulary (the unigram vocab of a templated corpus saturates in "
    "the first bucket — β≡0 — so the bigram universe is the "
    "discriminating one): documents are binned into 20 equal doc_id "
    "ranges, each bigram is charged to the bucket of its FIRST "
    "occurrence (MIN over a (term) hash aggregate), cumulative token "
    "count N and vocabulary size V per checkpoint come from a "
    "broadcast triangular join over the 20-bucket domain (no "
    "unpartitioned window), and β / ln k are the closed-form "
    "least-squares fit of ln V on ln N.  Template collapse drives β "
    "toward 0.  Scale shape: corpus touched twice ((term) "
    "first-occurrence agg + (bucket) token counts), statistics on a "
    "20-row frame.",
    oracle=f"""
WITH mx AS (SELECT MAX(doc_id) AS maxid FROM documents),
tok AS (
  SELECT doc_id,
         UNNEST(list_transform(
             range(1, len(toks)),
             i -> array_to_string(toks[i:i+1], ' '))) AS term
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                       t -> t <> '') AS toks
    FROM documents
  )
),
bt AS (
  SELECT CAST(FLOOR(doc_id * {HEAPS_BUCKETS} / (maxid + 1)) AS BIGINT)
           AS bucket, term
  FROM tok CROSS JOIN mx
),
toks_per AS (SELECT bucket, COUNT(*) AS n_tok FROM bt GROUP BY bucket),
first_b AS (SELECT term, MIN(bucket) AS fb FROM bt GROUP BY term),
new_per AS (SELECT fb AS bucket, COUNT(*) AS n_new FROM first_b GROUP BY fb),
per AS (
  SELECT t.bucket, t.n_tok, COALESCE(n.n_new, 0) AS n_new
  FROM toks_per t LEFT JOIN new_per n ON n.bucket = t.bucket
),
cum AS (
  SELECT a.bucket,
         CAST(SUM(b.n_tok) AS BIGINT) AS cum_tokens,
         CAST(SUM(b.n_new) AS BIGINT) AS cum_vocab
  FROM per a JOIN per b ON b.bucket <= a.bucket
  GROUP BY a.bucket
),
pts AS (
  SELECT LN(CAST(cum_tokens AS DOUBLE)) AS x,
         LN(CAST(cum_vocab AS DOUBLE)) AS y
  FROM cum
),
fit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
         COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS num,
         COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS den,
         SUM(x) AS sx, SUM(y) AS sy
  FROM pts
)
SELECT n_buckets,
       ROUND(num / den, 6) AS heaps_beta,
       ROUND((sy - (num / den) * sx) / n_buckets, 6) AS heaps_lnk
FROM fit
""",
)
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as T

    d = table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id").alias("maxid"))
    tok = d.select(
        "doc_id",
        F.explode(T.word_ngrams(F.lower(F.col("text")), 2)).alias("term"),
    )
    bt = tok.crossJoin(F.broadcast(mx)).select(
        F.floor(F.col("doc_id") * HEAPS_BUCKETS / (F.col("maxid") + 1))
        .cast("bigint")
        .alias("bucket"),
        "term",
    )
    toks_per = bt.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_tok"))
    first_b = bt.groupBy("term").agg(F.min("bucket").alias("fb"))
    new_per = first_b.groupBy(F.col("fb").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    per = toks_per.join(new_per, "bucket", "left").select(
        "bucket", "n_tok", F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new")
    )
    a = per.select(F.col("bucket").alias("b_a"))
    cum = (
        a.join(F.broadcast(per), F.col("bucket") <= F.col("b_a"))
        .groupBy("b_a")
        .agg(
            F.sum("n_tok").cast("bigint").alias("cum_tokens"),
            F.sum("n_new").cast("bigint").alias("cum_vocab"),
        )
    )
    pts = cum.select(
        F.log(F.col("cum_tokens").cast("double")).alias("x"),
        F.log(F.col("cum_vocab").cast("double")).alias("y"),
    )
    fit = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        (
            F.count(F.lit(1)) * F.sum(F.col("x") * F.col("y"))
            - F.sum("x") * F.sum("y")
        ).alias("num"),
        (
            F.count(F.lit(1)) * F.sum(F.col("x") * F.col("x"))
            - F.sum("x") * F.sum("x")
        ).alias("den"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
    )
    return fit.select(
        "n_buckets",
        F.round(F.col("num") / F.col("den"), 6).alias("heaps_beta"),
        F.round(
            (F.col("sy") - (F.col("num") / F.col("den")) * F.col("sx"))
            / F.col("n_buckets"),
            6,
        ).alias("heaps_lnk"),
    )
