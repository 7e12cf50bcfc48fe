"""LLM-training-data pipeline queries (north-star extensions): dedup,
similarity search, text analysis over ``documents`` / ``embeddings``.

Operator implementations live in ``operators.dedup`` / ``operators.similarity``
and ``functions.text``; this module registers the driver-checkable query
forms.  Hash-based operators use md5-derived hash families so the DuckDB
oracle can reproduce signatures bit-for-bit; engine-specific hashes
(xxhash64 etc.) would be faster but unverifiable — at cluster scale swap
``functions.hashing.md5_long`` for ``F.xxhash64`` behind the same API.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions import text as T
from ..operators import dedup as D
from ..operators import ivf as I
from ..operators import similarity as S
from .registry import register, table

# SQL twin of functions.text.fingerprint
SQL_FPRINT = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"


# ------------------------------------------------------------------- dedup


@register(
    "dedup_exact_fingerprint",
    family="dedup",
    doc="Exact dedup via normalized-text md5 fingerprint: groups + survivor (min doc_id).",
    oracle=f"""
SELECT {SQL_FPRINT} AS fprint,
       COUNT(*) AS n_copies,
       MIN(doc_id) AS keep_doc_id
FROM documents
GROUP BY 1
""",
)
def dedup_exact_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.groupBy(T.fingerprint(F.col("text")).alias("fprint")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keep_doc_id"),
    )


@register(
    "dedup_exact_survivors",
    family="dedup",
    doc="Exact dedup keep-first: surviving doc_ids (row_number=1 per fingerprint).",
    oracle=f"""
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (PARTITION BY {SQL_FPRINT} ORDER BY doc_id ASC) AS rn
  FROM documents
) WHERE rn = 1
""",
)
def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return D.exact_dedup(d, text_col="text", order_col="doc_id").select(
        "doc_id", "lang", "source"
    )


@register(
    "dedup_ngram_jaccard_pairs",
    family="dedup",
    doc="3-gram shingle Jaccard similarity pairs at 0.02 (the synthetic corpus has no true near-dups, so the threshold sits below its max observed 0.03 to keep the check non-trivial; LSH is the scale path).",
    oracle="""
WITH sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           UNNEST(list_transform(range(1, len(string_split(trim(text), ' ')) - 1),
                  i -> array_to_string((string_split(trim(text), ' '))[i:i+2], ' '))) AS shingle
    FROM documents WHERE doc_id < 120
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       ROUND(CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) >= 0.02
""",
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 120)
    return D.ngram_jaccard_pairs(d, n=3, threshold=0.02)


def _minhash_lsh_oracle() -> str:
    """Generated oracle for the FULL MinHash+LSH pipeline: 16 Kirsch-
    Mitzenmacher family members as MIN aggregates, 1-row bands, band-bucket
    self-join, exact-Jaccard verification — signature-for-signature
    identical to operators.dedup.minhash_lsh_pairs."""
    m61 = (1 << 61) - 1
    sig_cols = ", ".join(f"MIN((h1 + {k} * h2) % {m61}) AS s{k}" for k in range(16))
    bands = ", ".join(
        "{'band_idx': %d, 'band_hash': md5(CAST(s%d AS VARCHAR))}" % (b, b)
        for b in range(16)
    )
    return f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 120),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           UNNEST(list_transform(range(1, len(string_split(trim(text), ' ')) - 1),
                  i -> array_to_string((string_split(trim(text), ' '))[i:i+2], ' '))) AS shingle
    FROM docs)
),
hp AS (SELECT doc_id,
         CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h1,
         CAST(('0x' || substr(md5(shingle), 17, 12)) AS BIGINT) AS h2
       FROM sh),
sig AS (SELECT doc_id, {sig_cols} FROM hp GROUP BY doc_id),
banded AS (
  SELECT doc_id, u.b.band_idx AS band_idx, u.b.band_hash AS band_hash
  FROM sig, UNNEST([{bands}]) AS u(b)
),
candidates AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
common AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM candidates c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b,
       ROUND(CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) >= 0.0
"""


@register(
    "dedup_minhash_lsh_candidates",
    family="dedup",
    doc="MinHash(16)+LSH(16 one-row bands) candidate pairs with exact "
    "Jaccard verification on the doc_id<120 sample (threshold 0 — the "
    "synthetic corpus has no true near-dups, so the candidate set itself "
    "is the non-trivial output).  Oracle is GENERATED: the whole "
    "signature/banding/verification pipeline reproduced in SQL.",
    oracle=_minhash_lsh_oracle(),
)
def dedup_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lsh_planner import plan_minhash_lsh

    # catch ≥95% of J≥0.3 pairs within a 16-hash budget → the planner's
    # only feasible split is 16 one-row bands (verify-everything posture;
    # no FP budget because threshold=0 verifies every candidate anyway)
    plan = plan_minhash_lsh(0.3, num_hashes=16, fn_budget=0.05)
    assert (plan.bands, plan.rows_per_band) == (16, 1)
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 120)
    return D.minhash_lsh_pairs(
        d, num_hashes=plan.num_hashes, bands=plan.bands, n=3, threshold=0.0
    )


def _simhash_oracle() -> str:
    """Generated oracle: per-bit ±1 vote sums over md5-derived token hashes
    via list_transform/list_sum — byte-identical to functions.hashing.simhash64."""
    terms = [
        f"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> {b}) & 1 = 1"
        f" THEN 1 ELSE -1 END)) > 0 THEN CAST({1 << b} AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END)"
        for b in range(32)
    ]
    return (
        "WITH t AS (\n"
        "  SELECT doc_id,\n"
        "         list_transform(list_filter(string_split_regex(trim(text), '\\s+'), x -> x != ''),\n"
        "                        s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS hs\n"
        "  FROM documents\n)\n"
        "SELECT doc_id, " + "\n + ".join(terms) + " AS simhash\nFROM t"
    )


@register(
    "dedup_simhash_fingerprints",
    family="dedup",
    doc="SimHash(32-bit) near-dup fingerprints.  Oracle is GENERATED: the "
    "per-bit ±1 vote loop unrolled into list_sum/list_transform terms, so "
    "DuckDB reproduces every fingerprint bit-for-bit.",
    oracle=_simhash_oracle(),
)
def dedup_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return D.simhash_fingerprints(d).select("doc_id", "simhash")


@register(
    "dedup_embedding_cosine_pairs",
    family="dedup",
    doc="Embedding near-dup pairs: cosine ≥ 0.35 over all vector pairs (brute; "
    "LSH-bucketed variant is the scale path, see ann_lsh_bucket_stats).",
    oracle="""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.35
""",
)
def dedup_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return S.cosine_pairs_above(e, threshold=0.35)


# ------------------------------------------------------------- similarity


@register(
    "knn_cosine_topk",
    family="similarity",
    doc="Brute-force cosine top-5 neighbors for query vectors vec_id<3 "
    "(baseline ANN; ranking on rounded similarity for engine-neutral ties).",
    oracle="""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings)
SELECT * FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND(list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY ROUND(list_dot_product(q.v, c.v)
                 / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) DESC,
                 c.vec_id ASC) AS rank
  FROM e q JOIN e c ON q.vec_id < 3 AND c.vec_id != q.vec_id
) WHERE rank <= 5
""",
)
def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 3)
    return S.brute_force_topk(queries, e, k=5)


def _lsh_bucket_oracle() -> str:
    """Generated oracle: the 8 seeded hyperplanes inlined as literal arrays,
    sign-bit bucket id via list_dot_product — byte-identical bucketing to
    functions.vectors.random_projection_bucket."""
    from ..operators.similarity import _lcg_planes

    terms = []
    for i, p in enumerate(_lcg_planes(8, 64, 42)):
        lst = "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in p) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(v, {lst}) >= 0"
            f" THEN CAST({2**i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        )
    return (
        "WITH e AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
        " FROM embeddings)\n"
        "SELECT bucket, COUNT(*) AS n_vectors FROM (\n  SELECT "
        + "\n       + ".join(terms)
        + " AS bucket\n  FROM e\n) GROUP BY bucket"
    )


@register(
    "ann_lsh_bucket_stats",
    family="similarity",
    doc="Sign-random-projection LSH bucketing (8 fixed hyperplanes): bucket "
    "histogram.  The IVF/LSH scale path for ANN — candidates are compared "
    "only within buckets.  Oracle is GENERATED: the seeded hyperplanes "
    "inlined as SQL array literals, so DuckDB reproduces every bucket id; "
    "recall vs brute force asserted in tests/test_similarity.py.",
    oracle=_lsh_bucket_oracle(),
)
def ann_lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return (
        S.with_lsh_bucket(e, num_planes=8, dim=64)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


@register(
    "ann_ivf_topk",
    family="similarity",
    doc="IVF approximate top-5 neighbors for query vectors vec_id<3 with "
    "the deterministic SEEDED coarse quantizer (operators/ivf.py, iters=0 "
    "— centroids are the min-vec_id member of each vec_id%nlist stratum, "
    "so cell assignment, probe selection and candidate search are all "
    "closed-form and the whole prune-then-score path is oracle-checked "
    "hash-for-hash; Lloyd's refinement is the iterative part and its "
    "recall/objective-decrease contract is asserted against "
    "brute_force_topk in tests/test_similarity.py).  Each query probes "
    "its 3 nearest of 8 cells only — the equi-join scale path that "
    "replaces the cross join.",
    oracle="""
WITH vecs AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cents AS (
  SELECT s.cid, v.v AS c
  FROM (SELECT vec_id % 8 AS cid, MIN(vec_id) AS svid FROM vecs GROUP BY 1) s
  JOIN vecs v ON v.vec_id = s.svid
),
asgn_d AS (
  SELECT v.vec_id, ce.cid,
         ROUND(sqrt(list_sum(list_transform(range(64),
               i -> (v.v[i+1] - ce.c[i+1]) * (v.v[i+1] - ce.c[i+1])))), 6) AS d
  FROM vecs v CROSS JOIN cents ce
),
cells AS (
  SELECT vec_id AS item_id, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY d ASC, cid ASC) AS rn
    FROM asgn_d
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY d ASC, cid ASC) AS rn
    FROM asgn_d WHERE vec_id < 3
  ) WHERE rn <= 3
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
  SELECT p.query_id, cl.item_id AS neighbor_id,
         ROUND(list_dot_product(q.v, n.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(n.v, n.v))), 6) AS cosine,
         ROW_NUMBER() OVER (
           PARTITION BY p.query_id
           ORDER BY ROUND(list_dot_product(q.v, n.v)
                 / (sqrt(list_dot_product(q.v, q.v))
                    * sqrt(list_dot_product(n.v, n.v))), 6) DESC,
                 cl.item_id ASC) AS rank
  FROM probes p
  JOIN cells cl USING (cid)
  JOIN vecs q ON q.vec_id = p.query_id
  JOIN vecs n ON n.vec_id = cl.item_id
  WHERE cl.item_id != p.query_id
) WHERE rank <= 5
""",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 3)
    return I.ivf_topk(queries, e, k=5, nlist=8, nprobe=3, iters=0)


# ----------------------------------------------------------- text analysis


@register(
    "text_token_stats",
    family="text",
    doc="Token counting + quality scoring per document (identical arithmetic in oracle).",
    oracle="""
SELECT doc_id,
       LENGTH(text) AS n_chars_actual,
       CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
            ELSE LENGTH(TRIM(text)) - LENGTH(REPLACE(TRIM(text), ' ', '')) + 1 END AS n_tokens,
       ROUND(
         0.5 * LEAST(1.0, CAST(LENGTH(text) AS DOUBLE) / 500.0)
         + 0.3 * (1.0 - CASE WHEN LENGTH(text) > 0
                 THEN CAST(LENGTH(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / LENGTH(text)
                 ELSE 0.0 END)
         + 0.2 * LEAST(1.0,
             (CASE WHEN (CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                    ELSE LENGTH(TRIM(text)) - LENGTH(REPLACE(TRIM(text), ' ', '')) + 1 END) > 0
               THEN (CAST(LENGTH(text) AS DOUBLE)
                     - ((CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                         ELSE LENGTH(TRIM(text)) - LENGTH(REPLACE(TRIM(text), ' ', '')) + 1 END) - 1))
                    / (CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                       ELSE LENGTH(TRIM(text)) - LENGTH(REPLACE(TRIM(text), ' ', '')) + 1 END)
               ELSE 0.0 END) / 8.0)
       , 6) AS quality
FROM documents
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_actual"),
        T.token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        F.round(T.quality_score(F.col("text")), 6).alias("quality"),
    )


def _sql_stopword_score(words: tuple[str, ...]) -> str:
    terms = [
        f"CAST((LENGTH(' ' || LOWER(text) || ' ') - LENGTH(REPLACE(' ' || LOWER(text) || ' ', ' {w} ', ''))) / {len(w) + 2} AS INT)"
        for w in words
    ]
    return " + ".join(terms)


@register(
    "text_langid_confusion",
    family="text",
    doc="Stopword-vote language ID vs the labeled lang column (confusion matrix).",
    oracle=f"""
WITH scored AS (
  SELECT lang,
         {_sql_stopword_score(('der', 'und', 'die'))} AS s_de,
         {_sql_stopword_score(('the', 'and', 'of'))} AS s_en,
         {_sql_stopword_score(('el', 'de', 'la'))} AS s_es,
         {_sql_stopword_score(('le', 'et', 'les'))} AS s_fr
  FROM documents
)
SELECT lang AS actual_lang,
       CASE WHEN s_de = 0 AND s_en = 0 AND s_es = 0 AND s_fr = 0 THEN 'und'
            WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
            WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
            WHEN s_es >= s_fr THEN 'es'
            ELSE 'fr' END AS predicted_lang,
       COUNT(*) AS n_docs
FROM scored
GROUP BY 1, 2
""",
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select(
            F.col("lang").alias("actual_lang"),
            T.detect_language(F.col("text")).alias("predicted_lang"),
        )
        .groupBy("actual_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "text_quality_by_source",
    family="text",
    doc="Mean quality score per source (exact decimal accumulation of rounded scores).",
    oracle="""
WITH q AS (
  SELECT source,
         CAST(ROUND(
           0.5 * LEAST(1.0, CAST(LENGTH(text) AS DOUBLE) / 500.0)
           + 0.3 * (1.0 - CASE WHEN LENGTH(text) > 0
                   THEN CAST(LENGTH(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / LENGTH(text)
                   ELSE 0.0 END)
           + 0.2 * LEAST(1.0,
               (CASE WHEN (CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                      ELSE LENGTH(TRIM(text)) - LENGTH(REPLACE(TRIM(text), ' ', '')) + 1 END) > 0
                 THEN (CAST(LENGTH(text) AS DOUBLE)
                       - ((CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                           ELSE LENGTH(TRIM(text)) - LENGTH(REPLACE(TRIM(text), ' ', '')) + 1 END) - 1))
                      / (CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                         ELSE LENGTH(TRIM(text)) - LENGTH(REPLACE(TRIM(text), ' ', '')) + 1 END)
                 ELSE 0.0 END) / 8.0)
         , 6) AS DECIMAL(10,6)) AS quality
  FROM documents
)
SELECT source, COUNT(*) AS n_docs,
       ROUND(CAST(SUM(quality) AS DOUBLE) / COUNT(*), 6) AS avg_quality
FROM q
GROUP BY source
""",
)
def text_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    q = F.round(T.quality_score(F.col("text")), 6).cast("decimal(10,6)")
    return (
        d.select("source", q.alias("quality"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.sum("quality").cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_quality"
            ),
        )
    )


@register(
    "text_rolling_fingerprint",
    family="text",
    doc="Polynomial rolling-hash document fingerprint over the first 64 "
    "chars — the character fold is expressed with F.aggregate in Spark and "
    "list_reduce in DuckDB: two higher-order-function dialects, same hash.",
    oracle="""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, LENGTH(substr(text, 1, 64)) + 1),
                          i -> CAST(ascii(substr(substr(text, 1, 64), CAST(i AS INTEGER), 1)) AS BIGINT))),
         (acc, c) -> (acc * 31 + c) % 2147483647) AS rhash
FROM documents
""",
)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", T.rolling_hash(F.substring("text", 1, 64)).alias("rhash")
    )


@register(
    "text_term_frequency",
    family="text",
    doc="Per-document term frequency of a probe vocabulary (tf building "
    "block of tf-idf; replace-based counting, engine-identical).",
    oracle="""
SELECT doc_id,
       CAST((LENGTH(' ' || lower(text) || ' ') - LENGTH(REPLACE(' ' || lower(text) || ' ', ' spark ', ''))) / 7 AS INT) AS tf_spark,
       CAST((LENGTH(' ' || lower(text) || ' ') - LENGTH(REPLACE(' ' || lower(text) || ' ', ' data ', ''))) / 6 AS INT) AS tf_data,
       CAST((LENGTH(' ' || lower(text) || ' ') - LENGTH(REPLACE(' ' || lower(text) || ' ', ' join ', ''))) / 6 AS INT) AS tf_join
FROM documents
""",
)
def text_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.stopword_hits(F.col("text"), ("spark",)).alias("tf_spark"),
        T.stopword_hits(F.col("text"), ("data",)).alias("tf_data"),
        T.stopword_hits(F.col("text"), ("join",)).alias("tf_join"),
    )


@register(
    "text_doc_idf",
    family="text",
    doc="Document frequency + idf of the probe vocabulary (the idf half of "
    "tf-idf; exact log arithmetic on both engines).",
    oracle="""
WITH df AS (
  SELECT
    COUNT(*) AS n_docs,
    COUNT(*) FILTER (WHERE ' ' || lower(text) || ' ' LIKE '% spark %') AS df_spark,
    COUNT(*) FILTER (WHERE ' ' || lower(text) || ' ' LIKE '% data %') AS df_data
  FROM documents
)
SELECT CAST(n_docs AS BIGINT) AS n_docs,
       CAST(df_spark AS BIGINT) AS df_spark,
       CAST(df_data AS BIGINT) AS df_data,
       ROUND(LN(CAST(n_docs AS DOUBLE) / (1 + df_spark)), 6) AS idf_spark,
       ROUND(LN(CAST(n_docs AS DOUBLE) / (1 + df_data)), 6) AS idf_data
FROM df
""",
)
def text_doc_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    has = lambda w: F.sum(  # noqa: E731
        F.when(padded.like(f"% {w} %"), F.lit(1)).otherwise(F.lit(0))
    )
    agg = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        has("spark").cast("bigint").alias("df_spark"),
        has("data").cast("bigint").alias("df_data"),
    )
    return agg.select(
        "n_docs",
        "df_spark",
        "df_data",
        F.round(
            F.log(F.col("n_docs").cast("double") / (F.lit(1) + F.col("df_spark"))), 6
        ).alias("idf_spark"),
        F.round(
            F.log(F.col("n_docs").cast("double") / (F.lit(1) + F.col("df_data"))), 6
        ).alias("idf_data"),
    )


@register(
    "text_bpe_token_stats",
    family="text",
    doc="BPE-ish pre-tokenization (letter runs | digit runs | single marks — "
    "the GPT-2-style boundary without the merge table): subword vs "
    "whitespace token counts per document, identical regex in both engines.",
    oracle="""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER) AS n_bpe_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS INTEGER) AS n_alpha_runs,
       CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
            ELSE LENGTH(TRIM(text)) - LENGTH(REPLACE(TRIM(text), ' ', '')) + 1 END AS n_ws_tokens
FROM documents
""",
)
def text_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
        F.coalesce(
            F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]+"), F.lit(0))),
            F.lit(0),
        ).alias("n_alpha_runs"),
        T.token_count(F.col("text")).alias("n_ws_tokens"),
    )


@register(
    "text_zscore_by_lang",
    family="text",
    doc="Per-language z-score of document length via groupBy().applyInPandas "
    "(Arrow-batched group-wise Pandas operator) — verified against the pure "
    "SQL window algebra, two independent implementations of the same "
    "exact-integer-sum formula.",
    oracle="""
SELECT doc_id, lang, n_chars,
       CASE WHEN n >= 2 AND var > 0
            THEN ROUND((n_chars - mean) / sqrt(var), 6) END AS zscore
FROM (
  SELECT doc_id, lang, n_chars,
         COUNT(*) OVER w AS n,
         CAST(SUM(n_chars) OVER w AS DOUBLE) / COUNT(*) OVER w AS mean,
         (CAST(SUM(n_chars * n_chars) OVER w AS DOUBLE)
          - CAST(SUM(n_chars) OVER w AS DOUBLE) * CAST(SUM(n_chars) OVER w AS DOUBLE) / COUNT(*) OVER w)
         / (COUNT(*) OVER w - 1) AS var
  FROM documents
  WINDOW w AS (PARTITION BY lang)
)
""",
)
def text_zscore_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.groupwise import zscore_by_group

    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out = zscore_by_group(d, group_col="lang", value_col="n_chars")
    return out.select(
        "doc_id", "lang", "n_chars", F.round(F.col("zscore"), 6).alias("zscore")
    )


@register(
    "curation_survivor_stats",
    family="dedup",
    doc="Composite curation pipeline: exact-dedup survivors → length/token "
    "quality gates → per-(lang, source) corpus stats — the end-to-end shape "
    "of a training-data filtering job.",
    oracle=f"""
WITH survivors AS (
  SELECT doc_id, lang, source, text FROM (
    SELECT doc_id, lang, source, text,
           ROW_NUMBER() OVER (PARTITION BY {SQL_FPRINT} ORDER BY doc_id ASC) AS rn
    FROM documents
  ) WHERE rn = 1
),
filtered AS (
  SELECT * FROM survivors
  WHERE LENGTH(text) >= 100
    AND (CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
         ELSE LENGTH(TRIM(text)) - LENGTH(REPLACE(TRIM(text), ' ', '')) + 1 END) >= 20
)
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars
FROM filtered GROUP BY lang, source
""",
)
def curation_survivor_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    survivors = D.exact_dedup(d, text_col="text", order_col="doc_id")
    filtered = survivors.where(
        (F.length("text") >= 100) & (T.token_count(F.col("text")) >= 20)
    )
    return filtered.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
    )


@register(
    "text_stopword_ratio",
    family="text",
    doc="Stopword density per document (quality-scoring component): "
    "space-bounded occurrences of a fixed stopword list counted via "
    "non-overlapping replace() length arithmetic — identical semantics in "
    "both engines.",
    oracle="""
SELECT doc_id,
       CAST(
         CAST((LENGTH(' ' || LOWER(text) || ' ') - LENGTH(REPLACE(' ' || LOWER(text) || ' ', ' the ', ''))) / 5 AS INTEGER)
       + CAST((LENGTH(' ' || LOWER(text) || ' ') - LENGTH(REPLACE(' ' || LOWER(text) || ' ', ' and ', ''))) / 5 AS INTEGER)
       + CAST((LENGTH(' ' || LOWER(text) || ' ') - LENGTH(REPLACE(' ' || LOWER(text) || ' ', ' of ', ''))) / 4 AS INTEGER)
       AS INTEGER) AS n_stopwords,
       CASE WHEN LENGTH(TRIM(text)) = 0 THEN NULL
            ELSE ROUND(
              (CAST((LENGTH(' ' || LOWER(text) || ' ') - LENGTH(REPLACE(' ' || LOWER(text) || ' ', ' the ', ''))) / 5 AS INTEGER)
             + CAST((LENGTH(' ' || LOWER(text) || ' ') - LENGTH(REPLACE(' ' || LOWER(text) || ' ', ' and ', ''))) / 5 AS INTEGER)
             + CAST((LENGTH(' ' || LOWER(text) || ' ') - LENGTH(REPLACE(' ' || LOWER(text) || ' ', ' of ', ''))) / 4 AS INTEGER))
              / CAST(LENGTH(TRIM(text)) - LENGTH(REPLACE(TRIM(text), ' ', '')) + 1 AS DOUBLE), 6)
       END AS stopword_ratio
FROM documents
""",
)
def text_stopword_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    hits = T.stopword_hits(F.col("text"), ("the", "and", "of")).cast("int")
    ntok = T.token_count(F.col("text"))
    return d.select(
        "doc_id",
        hits.alias("n_stopwords"),
        F.when(
            ntok > 0, F.round(hits / ntok.cast("double"), 6)
        ).alias("stopword_ratio"),
    )


@register(
    "text_clean_normalize",
    family="text",
    doc="Curation cleaner (strip markup, collapse whitespace, trim) applied "
    "to deterministically dirtied text — byte-identical regex chains in "
    "both engines; roundtrip_ok proves the cleaner inverts the dirtying.",
    oracle="""
SELECT doc_id,
       LENGTH('<p> ' || text || ' </p>') AS n_dirty_chars,
       LENGTH(TRIM(regexp_replace(regexp_replace('<p> ' || text || ' </p>', '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g'))) AS n_clean_chars,
       TRIM(regexp_replace(regexp_replace('<p> ' || text || ' </p>', '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g')) = TRIM(text) AS roundtrip_ok
FROM documents
""",
)
def text_clean_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    dirty = F.concat(F.lit("<p> "), F.col("text"), F.lit(" </p>"))
    cleaned = T.clean_text(dirty)
    return d.select(
        "doc_id",
        F.length(dirty).alias("n_dirty_chars"),
        F.length(cleaned).alias("n_clean_chars"),
        (cleaned == F.trim(F.col("text"))).alias("roundtrip_ok"),
    )


@register(
    "sample_hash_split",
    family="dedup",
    doc="Reproducible train/val/test split by content hash (80/10/10): "
    "bucket = md5-derived value mod 100 — deterministic across runs, "
    "engines, and cluster sizes, unlike rand()-based sampling; the "
    "standard way to split training corpora so membership never drifts.",
    oracle="""
SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM (
  SELECT n_chars,
         CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
  FROM (SELECT n_chars,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
        FROM documents)
)
GROUP BY split
""",
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_long

    d = table(spark, sf_dir, "documents")
    b = md5_long(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split")
    )
    return d.select(split, "n_chars").groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@register(
    "multimodal_embed_knn",
    family="multimodal",
    doc="Media → embedding → ANN bridge: documents' text bytes stand in "
    "for media blobs (binaryFile scan shape, operators/multimodal.py), "
    "byte-histogram features via Arrow-batched mapInPandas, then exact "
    "cosine top-3 neighbors for 3 probe docs via the shared similarity "
    "operator.  Oracle-checked end-to-end: the corpus is pure ASCII "
    "(byte ≡ codepoint), so DuckDB rebuilds every 64-bin L1-normalized "
    "histogram from unicode(char) % 64 and reproduces the pandas-UDF "
    "embeddings bit-for-bit — the strongest parity statement the stubbed "
    "multimodal path can make.",
    oracle="""
WITH chars AS (
  SELECT doc_id, unicode(substr(text, i, 1)) % 64 AS bin
  FROM documents, UNNEST(range(1, length(text) + 1)) AS t(i)
),
hist AS (SELECT doc_id, bin, COUNT(*) AS n FROM chars GROUP BY doc_id, bin),
binned AS (
  SELECT d.doc_id, b.bin, COALESCE(h.n, 0) AS n
  FROM (SELECT DISTINCT doc_id FROM documents) d
  CROSS JOIN (SELECT UNNEST(range(64)) AS bin) b
  LEFT JOIN hist h ON h.doc_id = d.doc_id AND h.bin = b.bin
),
emb AS (
  SELECT doc_id, list(CAST(n AS DOUBLE) ORDER BY bin) AS nl, SUM(n) AS tot
  FROM binned GROUP BY doc_id
),
vec AS (SELECT doc_id, list_transform(nl, x -> x / tot) AS v FROM emb)
SELECT * FROM (
  SELECT CAST(q.doc_id AS STRING) AS query_id,
         CAST(c.doc_id AS STRING) AS neighbor_id,
         ROUND(list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine,
         ROW_NUMBER() OVER (
           PARTITION BY q.doc_id
           ORDER BY ROUND(list_dot_product(q.v, c.v)
                 / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) DESC,
                 CAST(c.doc_id AS STRING) ASC) AS rank
  FROM vec q JOIN vec c ON q.doc_id < 3 AND c.doc_id != q.doc_id
) WHERE rank <= 3
""",
)
def multimodal_embed_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import byte_histogram_embedding
    from ..operators.similarity import brute_force_topk

    d = table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("path"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )
    emb = byte_histogram_embedding(d).withColumn(
        "vec_id", F.col("path").cast("bigint")
    )
    probes = emb.where(F.col("vec_id") < 3)
    return brute_force_topk(probes, emb, k=3)


@register(
    "multimodal_decode_meta",
    family="multimodal",
    doc="Media metadata decode, end-to-end: a deterministic image corpus "
    "(format cycling png/gif/jpeg by doc_id%3, dimensions fixed arithmetic "
    "on doc_id) is synthesized as real header bytes via mapInPandas, then "
    "decoded back by the REAL header parsers (PNG IHDR, JPEG SOF marker "
    "walk, GIF screen descriptor — operators/multimodal.py:decode_image_"
    "meta, no image library involved).  The oracle predicts the dimensions "
    "from the same arithmetic, so any decode drift (endianness, offset, "
    "marker-walk bug) breaks the hash match.  Blobs never leave the "
    "pandas batch; the aggregate sees only the narrow typed rows.",
    oracle="""
SELECT CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' ELSE 'jpeg' END
         AS format,
       COUNT(*) AS n_images,
       CAST(SUM(doc_id * 7 % 640 + 16) AS BIGINT) AS sum_width,
       CAST(SUM(doc_id * 13 % 480 + 16) AS BIGINT) AS sum_height,
       CAST(MIN(doc_id * 7 % 640 + 16) AS BIGINT) AS min_width,
       CAST(MAX(doc_id * 13 % 480 + 16) AS BIGINT) AS max_height
FROM documents
GROUP BY 1
""",
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import extract_media_metadata, synthesize_media

    d = table(spark, sf_dir, "documents")
    media = synthesize_media(d.select("doc_id"))
    meta = extract_media_metadata(media)
    return meta.groupBy("format").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum("width").cast("bigint").alias("sum_width"),
        F.sum("height").cast("bigint").alias("sum_height"),
        F.min("width").cast("bigint").alias("min_width"),
        F.max("height").cast("bigint").alias("max_height"),
    )


@register(
    "sample_stratified_hash",
    family="dedup",
    doc="Deterministic stratified downsampling for corpus curation: "
    "per-language keep rates (en 50%, others 20%) applied by md5-bucket "
    "threshold instead of rand() — membership is a pure function of "
    "doc_id, so the sample is identical across runs, engines, and "
    "cluster sizes, and a re-run after adding data keeps every "
    "previously-selected doc (the property rand()-sampling lacks).  "
    "Map-side filter, no shuffle until the audit aggregate.",
    oracle="""
SELECT lang, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS kept_chars
FROM (
  SELECT lang, n_chars,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 AS b
  FROM documents
)
WHERE b < CASE WHEN lang = 'en' THEN 500 ELSE 200 END
GROUP BY lang
""",
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_long

    d = table(spark, sf_dir, "documents")
    b = md5_long(F.col("doc_id").cast("string")) % 1000
    keep = b < F.when(F.col("lang") == "en", 500).otherwise(200)
    return (
        d.where(keep)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("kept_chars"),
        )
    )


def _lsh_pairs_oracle() -> str:
    """Generated oracle: seeded hyperplanes inlined (as in
    _lsh_bucket_oracle), bucket-equality self-join, cosine filter."""
    from ..operators.similarity import _lcg_planes

    terms = []
    for i, p in enumerate(_lcg_planes(8, 64, 42)):
        lst = "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in p) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(v, {lst}) >= 0"
            f" THEN CAST({2**i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        )
    bucket = "\n       + ".join(terms)
    cos = (
        "list_dot_product(a.v, b.v)"
        " / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
    )
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
bk AS (SELECT vec_id, v, {bucket} AS bucket FROM e)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, ROUND({cos}, 6) AS cosine
FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {cos} >= 0.35
"""


@register(
    "dedup_embedding_lsh_pairs",
    family="dedup",
    doc="Embedding near-dup pairs, LSH-bucketed scale path: the cross join "
    "of dedup_embedding_cosine_pairs becomes an equi-join on the sign-LSH "
    "bucket id (8 seeded hyperplanes) — candidates compared only within "
    "buckets, shuffle keyed on bucket.  Oracle is GENERATED with the "
    "hyperplanes inlined so DuckDB reproduces every bucket id; recall vs "
    "the brute pairs asserted in tests/test_similarity.py.",
    oracle=_lsh_pairs_oracle(),
)
def dedup_embedding_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return S.cosine_pairs_above_lsh(e, threshold=0.35)


@register(
    "embedding_quantization_error",
    family="similarity",
    doc="int8 scalar quantization for ANN memory (4x smaller vectors): "
    "q = round(clamp(x,-1,1)*127), dequantized back and compared to the "
    "original by cosine.  Per-language mean/min of the rounded cosine — "
    "the acceptance metric for shipping quantized indexes.  Mean is an "
    "exact DECIMAL sum of 6-dp cosines over a deterministic count, so "
    "both engines agree bit-for-bit.  Map-side only until the final "
    "aggregate; embeddings joined to documents on vec_id%n_docs to get "
    "a language axis.",
    oracle="""
WITH recon AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         list_transform(embedding,
           x -> round(least(greatest(CAST(x AS DOUBLE), -1.0), 1.0) * 127) / 127.0
         ) AS dq
  FROM embeddings
),
cos AS (
  SELECT vec_id,
         CAST(ROUND(list_dot_product(v, dq)
               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(dq, dq))),
             6) AS DECIMAL(8,6)) AS c
  FROM recon
)
SELECT d.lang,
       COUNT(*) AS n_vectors,
       CAST(SUM(c) AS DOUBLE) / COUNT(*) AS mean_cosine,
       CAST(MIN(c) AS DOUBLE) AS worst_cosine
FROM cos JOIN documents d ON d.doc_id = cos.vec_id % (SELECT COUNT(*) FROM documents)
GROUP BY d.lang
""",
)
def embedding_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import vectors as V

    d = table(spark, sf_dir, "documents")
    # n_docs as a broadcast 1-row aggregate (no driver-side count — plan
    # construction stays fully lazy; Catalyst folds the cross join into a
    # BroadcastNestedLoopJoin over a single row)
    n_docs = d.agg(F.count(F.lit(1)).alias("__n_docs"))
    v = V.to_double_array(F.col("embedding"))
    dq = F.transform(
        v,
        lambda x: F.round(F.least(F.greatest(x, F.lit(-1.0)), F.lit(1.0)) * 127)
        / 127.0,
    )
    cos = (
        table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.round(V.cosine_similarity(v, dq), 6).cast("decimal(8,6)").alias("c"),
        )
    )
    return (
        cos.crossJoin(F.broadcast(n_docs))
        .join(F.broadcast(d), d.doc_id == cos.vec_id % F.col("__n_docs"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            (F.sum("c").cast("double") / F.count(F.lit(1))).alias("mean_cosine"),
            F.min("c").cast("double").alias("worst_cosine"),
        )
    )


@register(
    "skew_key_audit",
    family="agg",
    doc="Join-key skew audit — the diagnostic behind choosing salted vs "
    "plain joins (operators/partitioning.py): per-key row counts on the "
    "events user_id axis, top 10 heaviest keys with their share of total "
    "rows in exact per-mille.  At 100 TB this runs as two partial/final "
    "hash aggregates + a 10-row TakeOrdered — no full sort, no collect; "
    "a key above ~50‰ is the signal to salt or let AQE split it.",
    oracle="""
WITH per_key AS (
  SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY user_id
),
tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total FROM per_key)
SELECT user_id, n_rows,
       CAST(FLOOR(n_rows * 1000 / total) AS BIGINT) AS share_permille
FROM per_key, tot
ORDER BY n_rows DESC, user_id ASC
LIMIT 10
""",
)
def skew_key_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_rows"))
    tot = per_key.agg(F.sum("n_rows").cast("bigint").alias("total"))
    return (
        per_key.join(F.broadcast(tot))
        .select(
            "user_id",
            "n_rows",
            F.floor(F.col("n_rows") * 1000 / F.col("total"))
            .cast("bigint")
            .alias("share_permille"),
        )
        .orderBy(F.col("n_rows").desc(), F.col("user_id").asc())
        .limit(10)
    )


@register(
    "decontaminate_split_overlap",
    family="dedup",
    doc="Train/test decontamination audit: test-split documents (same "
    "md5-bucket split as sample_hash_split) that share at least one 3-gram "
    "shingle with any train document, counted per language.  The canonical "
    "benchmark-leakage check for training corpora: distinct (doc, shingle) "
    "pairs, a distinct train shingle set, one equi semi-join on shingle — "
    "all shuffle-by-shingle with map-side distinct, no cross join.  At "
    "cluster scale hash the shingle to a LONG (xxhash64) to shrink the "
    "shuffle; strings kept here for oracle parity.",
    oracle="""
WITH b AS (
  SELECT doc_id, lang, text,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bkt
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           UNNEST(list_transform(range(1, len(string_split(trim(text), ' ')) - 1),
                  i -> array_to_string((string_split(trim(text), ' '))[i:i+2], ' '))) AS shingle
    FROM b)
),
train_sh AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id IN (SELECT doc_id FROM b WHERE bkt < 80)
),
test_docs AS (SELECT doc_id, lang FROM b WHERE bkt >= 90),
contaminated AS (
  SELECT DISTINCT s.doc_id FROM sh s
  WHERE s.doc_id IN (SELECT doc_id FROM test_docs)
    AND s.shingle IN (SELECT shingle FROM train_sh)
)
SELECT t.lang,
       COUNT(*) AS n_test_docs,
       COUNT(c.doc_id) AS n_contaminated
FROM test_docs t LEFT JOIN contaminated c ON c.doc_id = t.doc_id
GROUP BY t.lang
""",
)
def decontaminate_split_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_long

    d = table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id", "lang", "text",
        (md5_long(F.col("doc_id").cast("string")) % 100).alias("bkt"),
    )
    # split BEFORE sharding into shingles: the train side needs only a
    # distinct shingle SET (no doc_id — smaller shuffle rows), the test side
    # only its own 10% of exploded shingles; per-doc array_distinct already
    # dedups within a doc, so no full-corpus (doc, shingle) distinct exists
    shingled = lambda df: df.select(  # noqa: E731
        "doc_id",
        F.explode(F.array_distinct(T.word_ngrams(F.col("text"), 3))).alias("shingle"),
    )
    train_sh = shingled(docs.where(F.col("bkt") < 80)).select("shingle").distinct()
    test_docs = docs.where(F.col("bkt") >= 90).select("doc_id", "lang")
    contaminated = (
        shingled(docs.where(F.col("bkt") >= 90))
        .join(train_sh, "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        test_docs.join(contaminated, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_test_docs"),
            F.count("__hit").alias("n_contaminated"),
        )
    )


@register(
    "text_unigram_logprob",
    family="text",
    doc="Corpus-statistics quality scoring: unigram language-model "
    "log-probability per document — ln(corpus frequency) of each token, "
    "averaged over the document.  The classic cheap perplexity proxy for "
    "filtering gibberish from training corpora (low avg log-prob = rare/"
    "malformed tokens).  Determinism: each token's ln(freq) is rounded to "
    "6 dp and cast to DECIMAL before the per-doc SUM, so the aggregate is "
    "exact and order-independent in both engines.  Two shuffles at scale: "
    "token-count aggregate, then score-join keyed on token (broadcast the "
    "vocabulary when it fits).",
    oracle="""
WITH tok AS (
  SELECT doc_id, UNNEST(list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '')) AS token
  FROM documents
),
freq AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM tok),
scored AS (
  SELECT t.doc_id,
         CAST(ROUND(LN(f.n / tot.total), 6) AS DECIMAL(12,6)) AS lp
  FROM tok t JOIN freq f ON f.token = t.token, tot
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       ROUND(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS avg_logprob
FROM scored
GROUP BY doc_id
""",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("token"))
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    # total from the vocab aggregate, not a second pass over the token stream
    tot = freq.agg(F.sum("n").cast("double").alias("total"))
    scored = (
        tok.join(F.broadcast(freq), "token")
        .join(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(F.log(F.col("n") / F.col("total")), 6)
            .cast("decimal(12,6)")
            .alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.sum("lp").cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_logprob"
        ),
    )


@register(
    "text_pii_scrub",
    family="text",
    doc="PII scrubbing for training corpora: deterministic emails/phones "
    "are injected by doc_id arithmetic (so the workload is non-trivial and "
    "fully predictable), then redacted with the two standard patterns "
    "(RE2-compatible: no backrefs, so Spark's Java regex and DuckDB's RE2 "
    "agree) and audited per language: docs touched, redactions applied, "
    "characters removed.  Pure map-side regexp until the final aggregate "
    "- scrubbing 100 TB is embarrassingly parallel.",
    oracle="""
WITH injected AS (
  SELECT lang,
         CASE WHEN doc_id % 5 = 0
              THEN text || ' contact user' || doc_id || '@example.com now'
              WHEN doc_id % 7 = 0
              THEN text || ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                        || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE text END AS t
  FROM documents
),
scrubbed AS (
  SELECT lang, t,
         regexp_replace(
           regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+',
                          '<EMAIL>', 'g'),
           '[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]', '<PHONE>', 'g'
         ) AS s
  FROM injected
)
SELECT lang,
       CAST(SUM(CASE WHEN s != t THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_scrubbed,
       CAST(SUM(CASE WHEN contains(s, '<EMAIL>') THEN 1 ELSE 0 END) AS BIGINT)
         AS n_email_docs,
       CAST(SUM(CASE WHEN contains(s, '<PHONE>') THEN 1 ELSE 0 END) AS BIGINT)
         AS n_phone_docs,
       CAST(SUM(LENGTH(t) - LENGTH(s)) AS BIGINT) AS chars_delta
FROM scrubbed
GROUP BY lang
""",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    injected = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            F.col("text"), F.lit(" contact user"), F.col("doc_id"),
            F.lit("@example.com now"),
        ),
    ).when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"), F.lit(" call 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.col("text"))
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
    phone = r"[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]"
    scrubbed = F.regexp_replace(
        F.regexp_replace(injected, email, "<EMAIL>"), phone, "<PHONE>"
    )
    s = d.select(
        "lang", injected.alias("t"), scrubbed.alias("s")
    )
    return s.groupBy("lang").agg(
        F.sum((F.col("s") != F.col("t")).cast("int")).cast("bigint")
        .alias("n_docs_scrubbed"),
        F.sum(F.col("s").contains("<EMAIL>").cast("int")).cast("bigint")
        .alias("n_email_docs"),
        F.sum(F.col("s").contains("<PHONE>").cast("int")).cast("bigint")
        .alias("n_phone_docs"),
        F.sum(F.length("t") - F.length("s")).cast("bigint").alias("chars_delta"),
    )


@register(
    "pack_sequences_cumsum",
    family="text",
    doc="Training-batch sequence packing (cumulative-fill): docs stream "
    "per language in doc_id order into 2048-token packs; pack_id = "
    "floor(preceding-cumsum / 2048) - the closed-form packing both "
    "engines compute with one window.  Per-language partitioning keeps "
    "the window parallel (one stream per partition at 100 TB - per-shard "
    "packing; a global order-by window would serialize).  Output: "
    "per-lang pack audit (packs, docs/pack, fill vs the 2048 budget).",
    oracle="""
WITH toks AS (
  SELECT lang, doc_id,
         CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
              ELSE LENGTH(TRIM(text)) - LENGTH(replace(TRIM(text), ' ', '')) + 1
         END AS tok
  FROM documents
),
packed AS (
  SELECT lang, doc_id, tok,
         CAST(FLOOR(COALESCE(SUM(tok) OVER (
             PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048.0)
           AS BIGINT) AS pack_id
  FROM toks
),
packs AS (
  SELECT lang, pack_id, COUNT(*) AS n_docs, SUM(tok) AS tokens
  FROM packed GROUP BY lang, pack_id
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_packs,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       ROUND(AVG(CAST(n_docs AS DOUBLE)), 6) AS avg_docs_per_pack,
       ROUND(AVG(CAST(tokens AS DOUBLE) / 2048.0), 6) AS avg_fill,
       CAST(MAX(tokens) AS BIGINT) AS max_pack_tokens
FROM packs
GROUP BY lang
""",
)
def pack_sequences_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions import text as T

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "lang", "doc_id", T.token_count(F.col("text")).alias("tok")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = toks.withColumn(
        "pack_id",
        F.floor(F.coalesce(F.sum("tok").over(w), F.lit(0)) / 2048.0).cast("bigint"),
    )
    packs = packed.groupBy("lang", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("tok").alias("tokens")
    )
    return packs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_packs"),
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.round(F.avg(F.col("n_docs").cast("double")), 6).alias("avg_docs_per_pack"),
        F.round(F.avg(F.col("tokens").cast("double") / 2048.0), 6).alias("avg_fill"),
        F.max("tokens").cast("bigint").alias("max_pack_tokens"),
    )


@register(
    "multimodal_audio_meta",
    family="multimodal",
    doc="Audio metadata decode, end-to-end: a deterministic WAV corpus "
    "(rate cycling 8000/16000/44100 by doc_id%3, channels doc_id%2+1, "
    "doc_id%100+1 samples) is synthesized as real RIFF bytes via "
    "mapInPandas and decoded back by the REAL chunk-walking header parser "
    "(operators/multimodal.py:decode_wav_meta).  The oracle predicts "
    "rate/channels/duration from the same arithmetic; duration_ms = "
    "samples*1000/rate exercises the fmt-chunk byte-rate math.",
    oracle="""
SELECT CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END
         AS BIGINT) AS sample_rate,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(doc_id % 2 + 1) AS BIGINT) AS sum_channels,
       ROUND(SUM((doc_id % 100 + 1) * 1000.0
             / CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END), 4)
         AS sum_duration_ms
FROM documents
GROUP BY 1
""",
)
def multimodal_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import extract_audio_metadata, synthesize_audio

    d = table(spark, sf_dir, "documents")
    meta = extract_audio_metadata(synthesize_audio(d.select("doc_id")))
    return meta.groupBy(F.col("sample_rate").cast("bigint").alias("sample_rate")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("channels").cast("bigint").alias("sum_channels"),
        F.round(F.sum("duration_ms"), 4).alias("sum_duration_ms"),
    )


@register(
    "text_repetition_ratio",
    family="text",
    doc="Repetition quality signal for corpus filtering: per doc, the "
    "share of the most frequent token (degenerate/boilerplate docs "
    "repeat); per language, average share and the count of docs above "
    "the 0.5 repetition threshold.  Explode -> two-level aggregate; "
    "at 100 TB this is the standard token-frequency shuffle bounded by "
    "vocabulary per doc, and the doc-level reduce is a partial agg.",
    oracle="""
WITH tok AS (
  SELECT doc_id, lang,
         UNNEST(list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '')) AS token
  FROM documents
),
per_tok AS (
  SELECT doc_id, lang, token, COUNT(*) AS n FROM tok GROUP BY ALL
),
per_doc AS (
  SELECT doc_id, lang,
         CAST(MAX(n) AS DOUBLE) / SUM(n) AS top_share
  FROM per_tok GROUP BY doc_id, lang
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(top_share), 6) AS avg_top_share,
       CAST(SUM(CASE WHEN top_share > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repetitive
FROM per_doc
GROUP BY lang
""",
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as T

    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(T.tokens(F.col("text"))).alias("token")
    )
    per_tok = tok.groupBy("doc_id", "lang", "token").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_doc = per_tok.groupBy("doc_id", "lang").agg(
        (F.max("n").cast("double") / F.sum("n")).alias("top_share")
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.avg("top_share"), 6).alias("avg_top_share"),
        F.sum((F.col("top_share") > 0.5).cast("int")).cast("bigint")
        .alias("n_repetitive"),
    )


@register(
    "pack_greedy_audit",
    family="text",
    doc="Boundary-respecting first-fit packing (operators/packing.py:"
    "greedy_pack, applyInPandas per language shard - a doc is never "
    "split; a pack closes when the next doc would overflow 2048).  The "
    "sequential fold is genuinely non-relational, yet still fully "
    "oracle-checked: the DuckDB twin replays the same first-fit walk "
    "with a recursive CTE stepping one doc at a time per shard.  Audit "
    "output per language: packs, overflow-free fill, oversized docs.",
    oracle="""
WITH RECURSIVE toks AS (
  SELECT lang, doc_id,
         CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
              ELSE LENGTH(TRIM(text)) - LENGTH(replace(TRIM(text), ' ', '')) + 1
         END AS tok
  FROM documents
),
seq AS (
  SELECT lang, doc_id, tok,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM toks
),
walk AS (
  SELECT lang, rn, tok, tok AS cur, CAST(0 AS BIGINT) AS pack_id
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.lang, s.rn, s.tok,
         CASE WHEN w.cur + s.tok > 2048 THEN s.tok ELSE w.cur + s.tok END,
         CASE WHEN w.cur + s.tok > 2048 THEN w.pack_id + 1 ELSE w.pack_id END
  FROM walk w JOIN seq s ON s.lang = w.lang AND s.rn = w.rn + 1
),
packs AS (
  SELECT lang, pack_id, COUNT(*) AS n_docs, SUM(tok) AS tokens
  FROM walk GROUP BY lang, pack_id
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_packs,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       ROUND(AVG(CASE WHEN tokens <= 2048 THEN CAST(tokens AS DOUBLE) / 2048.0 END), 6)
         AS avg_fill_ok,
       CAST(SUM(CASE WHEN tokens > 2048 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oversize
FROM packs
GROUP BY lang
""",
)
def pack_greedy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as T
    from ..operators.packing import greedy_pack

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "lang", "doc_id", T.token_count(F.col("text")).alias("tok")
    )
    packs = greedy_pack(toks, budget=2048, shard_col="lang")
    return packs.groupBy(F.col("shard").alias("lang")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_packs"),
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.round(
            F.avg(F.when(~F.col("oversize"), F.col("fill"))), 6
        ).alias("avg_fill_ok"),
        F.sum(F.col("oversize").cast("int")).cast("bigint").alias("n_oversize"),
    )


@register(
    "pq_adc_seeded_topk",
    family="similarity",
    doc="Product-quantization ADC search with the deterministic SEEDED "
    "codebook (operators/pq.py, iters=0 - seeding, encoding and "
    "asymmetric-distance search are all closed-form, so the whole "
    "compress-then-search path is oracle-checked bit-for-bit; only "
    "Lloyd's refinement is iterative and lives in the rows-only twin "
    "ann_pq_topk).  8 subspaces x 16 codes over dim-64: the corpus "
    "shrinks 32x and search touches only codes + a KB-scale LUT.",
    oracle="""
WITH vecs AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
subs AS (
  SELECT vec_id, s.sub_idx, list_slice(v, s.sub_idx * 8 + 1, s.sub_idx * 8 + 8) AS sv
  FROM vecs, (SELECT UNNEST(range(8)) AS sub_idx) s
),
seed_ids AS (
  SELECT sub_idx, vec_id % 16 AS code, MIN(vec_id) AS svid
  FROM subs GROUP BY sub_idx, vec_id % 16
),
codebook AS (
  SELECT si.sub_idx, si.code, s.sv AS centroid
  FROM seed_ids si JOIN subs s ON s.vec_id = si.svid AND s.sub_idx = si.sub_idx
),
dists AS (
  SELECT s.vec_id, s.sub_idx, cb.code,
         ROUND(list_dot_product(s.sv, s.sv)
               - 2 * list_dot_product(s.sv, cb.centroid)
               + list_dot_product(cb.centroid, cb.centroid), 6) AS d
  FROM subs s JOIN codebook cb ON cb.sub_idx = s.sub_idx
),
assigned AS (
  SELECT vec_id, sub_idx, code, d FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub_idx
                                 ORDER BY d ASC, code ASC) AS rn
    FROM dists
  ) WHERE rn = 1
),
lut AS (
  SELECT d.vec_id AS query_id, d.sub_idx, d.code, d.d AS pdist
  FROM dists d WHERE d.vec_id < 3
),
adc AS (
  SELECT l.query_id, a.vec_id AS neighbor_id,
         ROUND(SUM(l.pdist), 6) AS adc_dist
  FROM assigned a JOIN lut l ON l.sub_idx = a.sub_idx AND l.code = a.code
  WHERE l.query_id != a.vec_id
  GROUP BY l.query_id, a.vec_id
)
SELECT query_id, neighbor_id, adc_dist, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY adc_dist ASC, neighbor_id ASC) AS rank
  FROM adc
) WHERE rank <= 3
""",
)
def pq_adc_seeded_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import pq as P

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    codebooks = P.train_pq(emb, m=8, ksub=16, iters=0, dim=64)
    codes = P.pq_encode(emb, codebooks, m=8, dim=64)
    queries = emb.where(F.col("vec_id") < 3)
    out = P.pq_topk(queries, codes, codebooks, k=3, m=8, dim=64)
    return out.select(
        "query_id", "neighbor_id", "adc_dist", F.col("rank").cast("int").alias("rank")
    )


@register(
    "ann_pq_topk",
    family="similarity",
    doc="PQ ADC top-3 with the TRAINED codebook (3 joint Lloyd's "
    "iterations across all 8 subspaces - one distributed loop, not m "
    "separate k-means jobs).  Iterative training is not one SQL "
    "statement, so rows-only by design (same contract as ann_ivf_topk); "
    "the closed-form seeded twin pq_adc_seeded_topk carries the full "
    "oracle, and recall/determinism/objective-decrease are asserted in "
    "tests/test_pq.py.",
    oracle=None,
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import pq as P

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    codebooks = P.train_pq(emb, m=8, ksub=16, iters=3, dim=64)
    codes = P.pq_encode(emb, codebooks, m=8, dim=64)
    queries = emb.where(F.col("vec_id") < 3)
    return P.pq_topk(queries, codes, codebooks, k=3, m=8, dim=64)


@register(
    "dedup_cluster_components",
    family="dedup",
    doc="Near-dup pairs -> duplicate CLUSTERS via distributed connected "
    "components (min-label propagation + pointer jumping, "
    "operators/components.py).  Edges are 3-gram Jaccard >= 0.01 pairs on "
    "doc_id < 120 (one 104-doc giant component, several small ones, "
    "singletons), so the oracle's recursive CTE exercises real multi-hop "
    "transitive closure.  cluster_id = min doc_id in the component; "
    "survivor election is then min(doc_id) per cluster.",
    oracle="""
WITH RECURSIVE sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           UNNEST(list_transform(range(1, len(string_split(trim(text), ' ')) - 1),
                  i -> array_to_string((string_split(trim(text), ' '))[i:i+2], ' '))) AS shingle
    FROM documents WHERE doc_id < 120
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT doc_a, doc_b
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) >= 0.01
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents WHERE doc_id < 120
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node)
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM comp
""",
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import components as C

    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 120)
    pairs = D.ngram_jaccard_pairs(d, n=3, threshold=0.01)
    return C.dedup_clusters(pairs, nodes=d.select("doc_id"))


@register(
    "text_bm25_score",
    family="text",
    doc="Okapi BM25 relevance score per document for probe query "
    "{spark, join, window} (k1=1.2, b=0.75) — operators/ranking.py: "
    "tf filtered before the shuffle, df/corpus stats broadcast, all "
    "arithmetic codegen-side.  avgdl is exact BIGINT-sum / count so "
    "both engines divide the same integers.",
    oracle="""
WITH tok AS (
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
)
SELECT doc_id, ROUND(SUM(s), 6) AS bm25 FROM scored GROUP BY doc_id
""",
)
def text_bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import ranking as R

    d = table(spark, sf_dir, "documents")
    return R.bm25_scores(d, terms=("spark", "join", "window"))


@register(
    "profile_documents_columns",
    family="profiling",
    doc="One-pass ANALYZE-style column profile of the documents table "
    "(operators/profiling.py): null count, exact distinct count, "
    "min/max per column — the table is scanned once and the single "
    "aggregate row is unpivoted with stack().",
    oracle="""
SELECT 'doc_id' AS column_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT(doc_id) AS n_null, COUNT(DISTINCT doc_id) AS n_distinct,
       CAST(MIN(doc_id) AS VARCHAR) AS min_str, CAST(MAX(doc_id) AS VARCHAR) AS max_str
FROM documents
UNION ALL
SELECT 'text', COUNT(*), COUNT(*) - COUNT(text), COUNT(DISTINCT text),
       MIN(text), MAX(text) FROM documents
UNION ALL
SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang), COUNT(DISTINCT lang),
       MIN(lang), MAX(lang) FROM documents
UNION ALL
SELECT 'source', COUNT(*), COUNT(*) - COUNT(source), COUNT(DISTINCT source),
       MIN(source), MAX(source) FROM documents
UNION ALL
SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars), COUNT(DISTINCT n_chars),
       CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR) FROM documents
""",
)
def profile_documents_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import profiling as PF

    return PF.profile_columns(table(spark, sf_dir, "documents"))


@register(
    "ann_ivfpq_topk",
    family="similarity",
    doc="IVF-PQ composed ANN (operators/ivfpq.py): coarse cells prune "
    "WHICH vectors are scored (nprobe/nlist of the corpus via a cid "
    "equi-join), residual PQ compresses WHAT is stored (m codes vs dim "
    "floats, ADC lookup tables per probed cell).  Runs the deterministic "
    "SEEDED quantizers (iters=0 for both Lloyd's loops), so coarse "
    "assignment, residual computation, PQ encoding and per-cell ADC "
    "search are all closed-form — the oracle replays the ENTIRE "
    "compressed index build + search in SQL and any drift in residual "
    "math, code assignment tie-breaks, or per-cell LUT joins breaks the "
    "hash.  Lloyd's refinement (the iterative part) keeps its recall/"
    "determinism/pruning contract in tests/test_ivfpq.py.",
    oracle="""
WITH vecs AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cents AS (
  SELECT s.cid, v.v AS c
  FROM (SELECT vec_id % 8 AS cid, MIN(vec_id) AS svid FROM vecs GROUP BY 1) s
  JOIN vecs v ON v.vec_id = s.svid
),
asgn_d AS (
  SELECT v.vec_id, ce.cid,
         ROUND(sqrt(list_sum(list_transform(range(64),
               i -> (v.v[i+1] - ce.c[i+1]) * (v.v[i+1] - ce.c[i+1])))), 6) AS d
  FROM vecs v CROSS JOIN cents ce
),
cells AS (
  SELECT vec_id AS item_id, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY d ASC, cid ASC) AS rn
    FROM asgn_d
  ) WHERE rn = 1
),
resid AS (
  SELECT cl.item_id, cl.cid,
         list_transform(range(64), i -> v.v[i+1] - ce.c[i+1]) AS rv
  FROM cells cl
  JOIN vecs v ON v.vec_id = cl.item_id
  JOIN cents ce ON ce.cid = cl.cid
),
rsubs AS (
  SELECT item_id, cid, s.sub_idx,
         list_slice(rv, s.sub_idx * 8 + 1, s.sub_idx * 8 + 8) AS sv
  FROM resid, (SELECT UNNEST(range(8)) AS sub_idx) s
),
seed_cb AS (
  SELECT r.sub_idx, si.code, r.sv AS centroid
  FROM (SELECT sub_idx, item_id % 16 AS code, MIN(item_id) AS svid
        FROM rsubs GROUP BY sub_idx, item_id % 16) si
  JOIN rsubs r ON r.item_id = si.svid AND r.sub_idx = si.sub_idx
),
enc_d AS (
  SELECT r.item_id, r.cid, r.sub_idx, cb.code,
         ROUND(list_sum(list_transform(range(8),
               i -> (r.sv[i+1] - cb.centroid[i+1])
                    * (r.sv[i+1] - cb.centroid[i+1]))), 6) AS d
  FROM rsubs r JOIN seed_cb cb ON cb.sub_idx = r.sub_idx
),
codes AS (
  SELECT item_id, cid, sub_idx, code FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY item_id, sub_idx
                                 ORDER BY d ASC, code ASC) AS rn
    FROM enc_d
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY d ASC, cid ASC) AS rn
    FROM asgn_d WHERE vec_id < 3
  ) WHERE rn <= 3
),
qsubs AS (
  SELECT p.query_id, p.cid, s.sub_idx,
         list_slice(list_transform(range(64), i -> v.v[i+1] - ce.c[i+1]),
                    s.sub_idx * 8 + 1, s.sub_idx * 8 + 8) AS sv
  FROM probes p
  JOIN vecs v ON v.vec_id = p.query_id
  JOIN cents ce ON ce.cid = p.cid,
       (SELECT UNNEST(range(8)) AS sub_idx) s
),
lut AS (
  SELECT q.query_id, q.cid, q.sub_idx, cb.code,
         ROUND(list_sum(list_transform(range(8),
               i -> (q.sv[i+1] - cb.centroid[i+1])
                    * (q.sv[i+1] - cb.centroid[i+1]))), 6) AS pdist
  FROM qsubs q JOIN seed_cb cb ON cb.sub_idx = q.sub_idx
),
adc AS (
  SELECT l.query_id, c.item_id AS neighbor_id,
         ROUND(SUM(l.pdist), 6) AS adc_dist
  FROM codes c
  JOIN lut l ON l.cid = c.cid AND l.sub_idx = c.sub_idx AND l.code = c.code
  WHERE l.query_id != c.item_id
  GROUP BY l.query_id, c.item_id
)
SELECT query_id, neighbor_id, adc_dist, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY adc_dist ASC, neighbor_id ASC) AS rank
  FROM adc
) WHERE rank <= 3
""",
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import ivfpq as X

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids, codebooks, codes = X.train_ivfpq(
        emb, nlist=8, m=8, ksub=16, iters_coarse=0, iters_pq=0, dim=64
    )
    queries = emb.where(F.col("vec_id") < 3)
    out = X.ivfpq_topk(queries, centroids, codebooks, codes, k=3, nprobe=3, m=8, dim=64)
    return out.select(
        "query_id", "neighbor_id", "adc_dist", F.col("rank").cast("int").alias("rank")
    )


@register(
    "text_bigram_logprob",
    family="text",
    doc="Bigram language-model quality scoring with add-one smoothing: "
    "avg ln((c(w1,w2)+1)/(c(w1)+V)) per document — the next step up "
    "from text_unigram_logprob as a perplexity proxy (catches shuffled/"
    "unnatural token order that unigram stats cannot).  Same determinism "
    "contract: per-bigram logprob rounded and cast to DECIMAL before the "
    "per-doc SUM, so aggregation is exact and order-independent.  Scale: "
    "two count aggregates (bigram, context) + one vocab scalar, then a "
    "score join keyed on the bigram — broadcast when the model fits, "
    "shuffle-join otherwise.",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '') AS t
  FROM documents
),
big AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM toks, UNNEST(range(1, len(t))) AS r(i)
  WHERE len(t) >= 2
),
c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM big GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS n1 FROM big GROUP BY w1),
vocab AS (SELECT COUNT(DISTINCT token) AS v FROM (SELECT UNNEST(t) AS token FROM toks)),
scored AS (
  SELECT b.doc_id,
         CAST(ROUND(LN((n2 + 1.0) / (n1 + v)), 6) AS DECIMAL(12,6)) AS lp
  FROM big b JOIN c2 USING (w1, w2) JOIN c1 USING (w1), vocab
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS avg_logprob
FROM scored GROUP BY doc_id
""",
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", T.tokens(F.col("text")).alias("t"))
    big = toks.where(F.size("t") >= 2).select(
        "doc_id",
        F.expr(
            "explode(transform(sequence(0, size(t) - 2),"
            " i -> struct(t[i] AS w1, t[i + 1] AS w2)))"
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    vocab = toks.select(F.explode("t").alias("token")).agg(
        F.count_distinct("token").alias("v")
    )
    scored = (
        big.join(F.broadcast(c2), ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .join(F.broadcast(vocab))
        .select(
            "doc_id",
            F.round(F.log((F.col("n2") + F.lit(1.0)) / (F.col("n1") + F.col("v"))), 6)
            .cast("decimal(12,6)")
            .alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.sum("lp").cast("double") / F.count(F.lit(1)), 6).alias("avg_logprob"),
    )


@register(
    "sample_topk_per_source",
    family="dedup",
    doc="Fixed-SIZE deterministic sampling: exactly k=10 docs per source, "
    "chosen by md5-hash ranking (the distributed reservoir-sample "
    "equivalent — same uniform-without-replacement marginal, but "
    "reproducible across runs/engines, unlike rand() reservoirs).  "
    "Complements sample_stratified_hash (fixed RATE): caps over-"
    "represented sources at a hard per-group budget.  One shuffle on "
    "source for the window rank; the hash is computed map-side.",
    oracle="""
SELECT source, doc_id, lang
FROM (
  SELECT source, doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
         ) AS rn
  FROM documents
)
WHERE rn <= 10
""",
)
def sample_topk_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .select("source", "doc_id", "lang")
    )


@register(
    "text_boilerplate_ratio",
    family="text",
    doc="Cross-document repeated-span (boilerplate) detection: the share "
    "of each document's distinct 5-token spans that occur in >= 5 "
    "distinct documents — the span-level curation metric for stripping "
    "templates/navigation from web corpora (word-shingle approximation "
    "of the suffix-array exact-substring method of Lee et al. 2022).  "
    "Two shuffles: span document-frequency aggregate, then the "
    "span-keyed join back; both keyed on the span hash at scale.",
    oracle="""
WITH sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           UNNEST(list_transform(range(1, len(string_split(trim(text), ' ')) - 3),
                  i -> array_to_string((string_split(trim(text), ' '))[i:i+4], ' '))) AS shingle
    FROM documents
  )
),
spans AS (SELECT shingle, COUNT(*) AS n_docs FROM sh GROUP BY shingle)
SELECT sh.doc_id,
       COUNT(*) AS n_spans,
       COUNT(*) FILTER (WHERE spans.n_docs >= 5) AS n_boilerplate,
       ROUND(CAST(COUNT(*) FILTER (WHERE spans.n_docs >= 5) AS DOUBLE) / COUNT(*), 6)
         AS boilerplate_ratio
FROM sh JOIN spans USING (shingle)
GROUP BY sh.doc_id
""",
)
def text_boilerplate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    sh = (
        d.select(
            "doc_id",
            F.explode(F.array_distinct(T.word_ngrams(F.col("text"), 5))).alias(
                "shingle"
            ),
        )
        .distinct()
    )
    spans = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        sh.join(spans, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.count_if(F.col("n_docs") >= 5).alias("n_boilerplate"),
            F.round(
                F.count_if(F.col("n_docs") >= 5).cast("double") / F.count(F.lit(1)), 6
            ).alias("boilerplate_ratio"),
        )
    )


@register(
    "text_tfidf_cosine_pairs",
    family="similarity",
    doc="SPARSE vector similarity: document-pair cosine over tf-idf "
    "weighted token vectors (doc_id < 80), computed as a token-keyed "
    "join of postings — the sparse twin of the dense embedding cosine "
    "operators (no dim-length arrays; cost scales with nonzeros).  "
    "Determinism: idf is rounded to DECIMAL(12,6) once, weights and "
    "their products stay DECIMAL (exact, order-independent sums); the "
    "single double division + sqrt at the end is identical on both "
    "engines.  Scale: postings join shuffles on token; stop-token skew "
    "is bounded by the idf weight itself (high-df tokens carry ~zero "
    "weight) and AQE skew splitting.",
    oracle="""
WITH tok AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS term
    FROM documents
  ) WHERE term <> ''
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE doc_id < 80 GROUP BY doc_id, term
),
dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tok),
w AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf AS DECIMAL(12,0))
           * CAST(ROUND(LN(CAST(n_docs AS DOUBLE) / (1 + df)), 6) AS DECIMAL(12,6))
           AS wt
  FROM tf JOIN dfreq USING (term), n
),
norms AS (
  SELECT doc_id, SQRT(CAST(SUM(CAST(wt AS DECIMAL(18,6)) * CAST(wt AS DECIMAL(18,6))) AS DOUBLE)) AS nrm
  FROM w GROUP BY doc_id
),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(SUM(CAST(a.wt AS DECIMAL(18,6)) * CAST(b.wt AS DECIMAL(18,6))) AS DOUBLE) AS dot
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, ROUND(dot / (na.nrm * nb.nrm), 6) AS cosine
FROM dots
JOIN norms na ON na.doc_id = doc_a
JOIN norms nb ON nb.doc_id = doc_b
WHERE dot / (na.nrm * nb.nrm) >= 0.75
""",
)
def text_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(T.tokens(F.lower(F.col("text")))).alias("term"))
    tf = (
        tok.where(F.col("doc_id") < 80)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tok.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n = tok.agg(F.count_distinct("doc_id").alias("n_docs"))
    w = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf").cast("decimal(12,0)")
                * F.round(
                    F.log(F.col("n_docs").cast("double") / (F.lit(1) + F.col("df"))), 6
                ).cast("decimal(12,6)")
            ).alias("wt"),
        )
    )
    w18 = F.col("wt").cast("decimal(18,6)")
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(w18 * w18).cast("double")).alias("nrm")
    )
    a = w.alias("a")
    b = w.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.sum(
                F.col("a.wt").cast("decimal(18,6)") * F.col("b.wt").cast("decimal(18,6)")
            )
            .cast("double")
            .alias("dot")
        )
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb"))
    cos = F.col("dot") / (F.col("na") * F.col("nb"))
    return (
        dots.join(F.broadcast(na), "doc_a")
        .join(F.broadcast(nb), "doc_b")
        .where(cos >= 0.75)
        .select("doc_a", "doc_b", F.round(cos, 6).alias("cosine"))
    )


@register(
    "sample_temperature_rebalance",
    family="dedup",
    doc="Multilingual corpus rebalancing by inverse-sqrt frequency "
    "(temperature-0.5 smoothing a la multilingual-BERT exponent "
    "sampling): keep-rate(lang) = sqrt(n_min/n_lang), so the most "
    "over-represented language is downsampled hardest and the rarest "
    "kept whole.  Rates derive only from exact integer counts + one "
    "sqrt (bit-identical across engines); membership is the md5-bucket "
    "threshold — deterministic, re-runnable, monotone under corpus "
    "growth.  One count aggregate + one broadcast join; acceptance is "
    "a map-side filter.",
    oracle="""
WITH counts AS (SELECT lang, COUNT(*) AS n_before FROM documents GROUP BY lang),
mn AS (SELECT MIN(n_before) AS n_min FROM counts),
rates AS (
  SELECT lang, n_before,
         CAST(FLOOR(SQRT(CAST(n_min AS DOUBLE) / n_before) * 1000000) AS BIGINT)
           AS threshold
  FROM counts, mn
)
SELECT r.lang, r.n_before, r.threshold, COUNT(*) AS n_after
FROM documents d
JOIN rates r USING (lang)
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        % 1000000 < r.threshold
GROUP BY r.lang, r.n_before, r.threshold
""",
)
def sample_temperature_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_long

    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_before"))
    mn = counts.agg(F.min("n_before").alias("n_min"))
    rates = counts.join(F.broadcast(mn)).select(
        "lang",
        "n_before",
        F.floor(
            F.sqrt(F.col("n_min").cast("double") / F.col("n_before")) * 1000000
        )
        .cast("bigint")
        .alias("threshold"),
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .where(md5_long(F.col("doc_id").cast("string")) % 1000000 < F.col("threshold"))
        .groupBy("lang", "n_before", "threshold")
        .agg(F.count(F.lit(1)).alias("n_after"))
    )


@register(
    "multimodal_pixel_stats",
    family="multimodal",
    doc="REAL pixel-level PNG decode with nothing but stdlib zlib + numpy "
    "(operators/multimodal.py:decode_png_pixels — chunk walk, IDAT "
    "inflate, per-scanline unfilter for all five PNG filter types): a "
    "deterministic corpus of genuine zlib-compressed PNGs is synthesized "
    "from doc_id (pixel(x,y,c) = (id*7+3x+5y+11c) mod 256, filters "
    "cycling None/Sub/Up/Average/Paeth by scanline), decoded back "
    "pixel-for-pixel inside Arrow-batched mapInPandas, and reduced to "
    "narrow per-image statistics.  The oracle recomputes the same "
    "statistics from the closed-form pixel arithmetic without ever "
    "touching a PNG byte — any drift in deflate framing, filter "
    "reconstruction (incl. Paeth tie-breaks), stride math, or channel "
    "order breaks the hash.  Closes the one pixel-codec seam that needs "
    "no external library; blobs never leave the executor batch.",
    oracle="""
WITH dims AS (
  SELECT doc_id, doc_id % 24 + 4 AS w, doc_id % 16 + 4 AS h FROM documents
),
px AS (
  SELECT doc_id, w, h,
         (doc_id * 7 + 3 * xs.x + 5 * ys.y + 11 * cs.c) % 256 AS v
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
FROM px
GROUP BY doc_id
""",
)
def multimodal_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import png_pixel_stats, synthesize_png_media

    d = table(spark, sf_dir, "documents")
    return png_pixel_stats(synthesize_png_media(d.select("doc_id")))


@register(
    "curation_chunk_sequences",
    family="text",
    doc="Fixed-size token chunking with stride — the split-documents-into-"
    "training-sequences op every LLM data pipeline runs before packing: "
    "per document, windows of 64 whitespace tokens at stride 48 (16-token "
    "overlap), final short window kept.  One map-side explode over a "
    "sequence column (no shuffle until the audit aggregate); per chunk "
    "the id, bounds, token count and an md5 content fingerprint (join key "
    "for chunk-level dedup downstream).  Aggregated per source for a "
    "compact deterministic result; the oracle rebuilds every window with "
    "list_slice over the same token split.",
    oracle="""
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '') AS tok
  FROM documents
),
chunks AS (
  SELECT doc_id, source, g.chunk_idx,
         list_slice(tok, g.chunk_idx * 48 + 1, g.chunk_idx * 48 + 64) AS ctoks
  FROM toks,
       UNNEST(range(CASE WHEN len(tok) <= 64 THEN 1
                         ELSE CAST(CEIL((len(tok) - 64) / 48.0) AS BIGINT) + 1
                    END)) AS g(chunk_idx)
),
stats AS (
  SELECT doc_id, source, chunk_idx, len(ctoks) AS n_tokens,
         md5(array_to_string(ctoks, ' ')) AS chunk_md5
  FROM chunks
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
       CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
       CAST(COUNT(DISTINCT chunk_md5) AS BIGINT) AS n_distinct_chunks
FROM stats
GROUP BY source
""",
)
def curation_chunk_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    size, stride = 64, 48
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "source", tokens(F.col("text")).alias("tok"))
    n_chunks = F.when(F.size("tok") <= size, F.lit(1)).otherwise(
        F.ceil((F.size("tok") - size) / F.lit(float(stride))).cast("bigint") + 1
    )
    chunks = toks.select(
        "doc_id",
        "source",
        F.posexplode(F.sequence(F.lit(0), n_chunks.cast("bigint") - 1)).alias(
            "_i", "chunk_idx"
        ),
        F.col("tok"),
    ).select(
        "doc_id",
        "source",
        "chunk_idx",
        F.slice("tok", F.col("chunk_idx").cast("int") * stride + 1, size).alias(
            "ctoks"
        ),
    )
    stats = chunks.select(
        "doc_id",
        "source",
        "chunk_idx",
        F.size("ctoks").alias("n_tokens"),
        F.md5(F.concat_ws(" ", F.col("ctoks"))).alias("chunk_md5"),
    )
    return stats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        F.min("n_tokens").cast("bigint").alias("min_tokens"),
        F.max("n_tokens").cast("bigint").alias("max_tokens"),
        F.countDistinct("chunk_md5").alias("n_distinct_chunks"),
    )


@register(
    "decontaminate_passage_containment",
    family="dedup",
    doc="Asymmetric shingle CONTAINMENT — the substring-dedup / passage-"
    "contamination primitive Jaccard misses: a short passage inside a "
    "long document scores near-zero Jaccard but containment "
    "|S(p) ∩ S(d)| / |S(p)| ≈ 1.  Probe passages are the first-40-token "
    "prefixes of every doc_id % 10 == 7 (a held-out benchmark sample); "
    "the postings join on distinct 3-gram shingles finds every corpus "
    "document containing ≥ 80% of a passage's shingles (each passage "
    "finds at least its own source at 1.0).  Scale shape: token-keyed "
    "equi-join (the text_tfidf_cosine_pairs posting-list pattern) — "
    "never all-pairs; at 100 TB add a shingle-df stop-list cap to bound "
    "hot posting rows before the join.",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '') AS t
  FROM documents
),
passages AS (
  SELECT doc_id AS passage_id, list_slice(t, 1, 40) AS pt
  FROM tok WHERE doc_id % 10 = 7
),
pshingles AS (
  SELECT DISTINCT passage_id,
         array_to_string(list_slice(pt, g.i + 1, g.i + 3), ' ') AS shingle
  FROM passages, UNNEST(range(GREATEST(len(pt) - 2, 0))) AS g(i)
),
pcount AS (
  SELECT passage_id, COUNT(*) AS n_p FROM pshingles GROUP BY passage_id
),
dshingles AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(t, g.i + 1, g.i + 3), ' ') AS shingle
  FROM tok, UNNEST(range(GREATEST(len(t) - 2, 0))) AS g(i)
),
hits AS (
  SELECT p.passage_id, d.doc_id, COUNT(*) AS n_shared
  FROM pshingles p JOIN dshingles d USING (shingle)
  GROUP BY p.passage_id, d.doc_id
)
SELECT h.passage_id, h.doc_id,
       ROUND(CAST(h.n_shared AS DOUBLE) / c.n_p, 6) AS containment
FROM hits h JOIN pcount c USING (passage_id)
WHERE CAST(h.n_shared AS DOUBLE) / c.n_p >= 0.8
""",
)
def decontaminate_passage_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens, word_ngrams

    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", tokens(F.col("text")).alias("t"))
    pshingles = (
        tok.where(F.col("doc_id") % 10 == 7)
        .select(
            F.col("doc_id").alias("passage_id"),
            F.explode(
                F.array_distinct(
                    word_ngrams(F.concat_ws(" ", F.slice("t", 1, 40)), 3)
                )
            ).alias("shingle"),
        )
    )
    pcount = pshingles.groupBy("passage_id").agg(F.count(F.lit(1)).alias("n_p"))
    dshingles = d.select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams(F.col("text"), 3))).alias("shingle"),
    )
    hits = (
        pshingles.join(dshingles, "shingle")
        .groupBy("passage_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    cont = F.col("n_shared").cast("double") / F.col("n_p")
    return (
        hits.join(F.broadcast(pcount), "passage_id")
        .where(cont >= 0.8)
        .select("passage_id", "doc_id", F.round(cont, 6).alias("containment"))
    )


@register(
    "split_cluster_safe",
    family="dedup",
    doc="Cluster-safe train/val/test split: whole near-dup CLUSTERS are "
    "assigned atomically to a split by md5-bucket of cluster_id (80/10/10), "
    "so near-duplicate documents can never straddle train and eval — the "
    "leakage mode plain hash-splitting (sample_hash_split) cannot prevent.  "
    "Clusters come from the dedup_cluster_components pipeline (3-gram "
    "Jaccard edges on doc_id < 120, distributed min-label components); the "
    "audit output counts, per split, docs, clusters and near-dup pairs "
    "escaping to another split — provably zero rows of leakage, computed "
    "from the edge list rather than asserted.  Scale: the split column is "
    "one broadcast-free map-side hash on the component label; the leakage "
    "audit is two joins of the (small) pair list against the assignment.",
    oracle="""
WITH RECURSIVE sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           UNNEST(list_transform(range(1, len(string_split(trim(text), ' ')) - 1),
                  i -> array_to_string((string_split(trim(text), ' '))[i:i+2], ' '))) AS shingle
    FROM documents WHERE doc_id < 120
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT doc_a, doc_b
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) >= 0.01
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents WHERE doc_id < 120
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
assigned AS (
  SELECT doc_id, cluster_id,
         CASE WHEN CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % 10 < 8 THEN 'train'
              WHEN CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % 10 = 8 THEN 'val'
              ELSE 'test' END AS split
  FROM comp
),
leaks AS (
  SELECT sa.split, COUNT(*) AS n
  FROM pairs p
  JOIN assigned sa ON sa.doc_id = p.doc_a
  JOIN assigned sb ON sb.doc_id = p.doc_b
  WHERE sa.split != sb.split
  GROUP BY sa.split
)
SELECT a.split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT a.cluster_id) AS BIGINT) AS n_clusters,
       CAST(COALESCE(MAX(l.n), 0) AS BIGINT) AS n_leak_pairs
FROM assigned a LEFT JOIN leaks l ON l.split = a.split
GROUP BY a.split
""",
)
def split_cluster_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_long
    from ..operators import components as C

    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 120)
    pairs = D.ngram_jaccard_pairs(d, n=3, threshold=0.01)
    comp = C.dedup_clusters(pairs, nodes=d.select("doc_id"))
    bucket = md5_long(F.col("cluster_id").cast("string")) % 10
    assigned = comp.select(
        "doc_id",
        "cluster_id",
        F.when(bucket < 8, F.lit("train"))
        .when(bucket == 8, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    sa = assigned.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    sb = assigned.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    leaks = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(F.col("split_a") != F.col("split_b"))
        .groupBy(F.col("split_a").alias("split"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("cluster_id").alias("n_clusters"),
        )
        .join(leaks, "split", "left")
        .select(
            "split",
            "n_docs",
            "n_clusters",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_leak_pairs"),
        )
    )


@register(
    "text_entropy_score",
    family="text",
    doc="Character-entropy quality signal (low entropy = degenerate/"
    "repetitive text, a standard corpus filter next to repetition ratio): "
    "per document, Shannon entropy -Σ p_c ln p_c over characters; per "
    "language, document count, exact mean entropy and the count of "
    "low-entropy docs (< 3 nats).  Determinism contract: each per-char "
    "term is rounded and cast to DECIMAL before the per-doc SUM, and each "
    "per-doc entropy is rounded/DECIMAL-cast before the per-language "
    "mean — both aggregations exact and order-independent across "
    "partitionings.  Scale: one explode + two hash aggregates, all "
    "codegen-side expressions.",
    oracle="""
WITH chars AS (
  SELECT doc_id, substr(text, g.i, 1) AS ch
  FROM documents, UNNEST(range(1, length(text) + 1)) AS g(i)
),
freq AS (
  SELECT doc_id, ch, COUNT(*) AS n FROM chars GROUP BY doc_id, ch
),
tot AS (
  SELECT doc_id, CAST(SUM(n) AS DOUBLE) AS total FROM freq GROUP BY doc_id
),
terms AS (
  SELECT f.doc_id,
         CAST(ROUND((f.n / t.total) * LN(f.n / t.total), 12)
              AS DECIMAL(20, 12)) AS term
  FROM freq f JOIN tot t USING (doc_id)
),
per_doc AS (
  SELECT doc_id,
         CAST(ROUND(-CAST(SUM(term) AS DOUBLE), 6) AS DECIMAL(18, 6)) AS ent
  FROM terms GROUP BY doc_id
)
SELECT d.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(p.ent) AS DOUBLE) / COUNT(*), 6) AS avg_entropy,
       CAST(SUM(CASE WHEN p.ent < 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_entropy
FROM per_doc p JOIN documents d USING (doc_id)
GROUP BY d.lang
""",
)
def text_entropy_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    # Code-point-exact mirror of the oracle's substr/length enumeration:
    # Spark's length()/substring() count Unicode code points (probed: len
    # of 'a😀b' = 3, substring(.,2,1) = the full emoji), so this stays
    # aligned with DuckDB on non-BMP text where a code-UNIT split would
    # diverge.
    # (sequence(1, 0) infers step -1 → [1, 0], so guard empty text; the
    # oracle's range(1, 1) is empty there)
    chars = d.where(F.length("text") > 0).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(text)), i -> substring(text, i, 1))")
        ).alias("ch"),
    )
    freq = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("n"))
    tot = freq.groupBy("doc_id").agg(F.sum("n").cast("double").alias("total"))
    p = F.col("n") / F.col("total")
    terms = freq.join(tot, "doc_id").select(
        "doc_id",
        F.round(p * F.log(p), 12).cast("decimal(20,12)").alias("term"),
    )
    per_doc = terms.groupBy("doc_id").agg(
        F.round(-F.sum("term").cast("double"), 6)
        .cast("decimal(18,6)")
        .alias("ent")
    )
    return (
        per_doc.join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum("ent").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_entropy"),
            F.sum(F.when(F.col("ent") < 3, 1).otherwise(0))
            .cast("bigint")
            .alias("n_low_entropy"),
        )
    )


@register(
    "graph_pagerank_centrality",
    family="dedup",
    doc="Fixed-iteration PageRank (operators/pagerank.py, 3 unrolled power "
    "iterations, d=0.85) over the near-dup graph from "
    "dedup_cluster_components' edge set — centrality as a survivor-"
    "election prior: inside a duplicate cluster the highest-PR doc is the "
    "one most other near-dups point at, a better keep policy than "
    "min-id.  Deterministic/oracle-matched end-to-end: per-edge "
    "contributions DECIMAL-cast before the sum, per-iteration ranks "
    "rounded to 12, the oracle replays all three iterations as chained "
    "CTEs.  Scale: per iteration one dst-keyed aggregate shuffle; edge "
    "list localCheckpointed once, rank vector is (node, pr).",
    oracle="""
WITH sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           UNNEST(list_transform(range(1, len(string_split(trim(text), ' ')) - 1),
                  i -> array_to_string((string_split(trim(text), ' '))[i:i+2], ' '))) AS shingle
    FROM documents WHERE doc_id < 120
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT doc_a, doc_b
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) >= 0.01
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT COUNT(*) AS n FROM nodes),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
pr0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes),
pr1 AS (
  SELECT n2.node,
         ROUND((1.0 - 0.85) / (SELECT n FROM nn)
               + 0.85 * COALESCE(CAST(SUM(CAST(ROUND(p.pr / dg.d, 12)
                     AS DECIMAL(20,12))) AS DOUBLE), 0.0), 12) AS pr
  FROM nodes n2
  LEFT JOIN edges e ON e.dst = n2.node
  LEFT JOIN pr0 p ON p.node = e.src
  LEFT JOIN deg dg ON dg.src = e.src
  GROUP BY n2.node
),
pr2 AS (
  SELECT n2.node,
         ROUND((1.0 - 0.85) / (SELECT n FROM nn)
               + 0.85 * COALESCE(CAST(SUM(CAST(ROUND(p.pr / dg.d, 12)
                     AS DECIMAL(20,12))) AS DOUBLE), 0.0), 12) AS pr
  FROM nodes n2
  LEFT JOIN edges e ON e.dst = n2.node
  LEFT JOIN pr1 p ON p.node = e.src
  LEFT JOIN deg dg ON dg.src = e.src
  GROUP BY n2.node
),
pr3 AS (
  SELECT n2.node,
         ROUND((1.0 - 0.85) / (SELECT n FROM nn)
               + 0.85 * COALESCE(CAST(SUM(CAST(ROUND(p.pr / dg.d, 12)
                     AS DECIMAL(20,12))) AS DOUBLE), 0.0), 12) AS pr
  FROM nodes n2
  LEFT JOIN edges e ON e.dst = n2.node
  LEFT JOIN pr2 p ON p.node = e.src
  LEFT JOIN deg dg ON dg.src = e.src
  GROUP BY n2.node
)
SELECT p.node AS doc_id,
       CAST(dg.d AS BIGINT) AS degree,
       ROUND(p.pr, 6) AS pagerank
FROM pr3 p JOIN deg dg ON dg.src = p.node
""",
)
def graph_pagerank_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pagerank import pagerank

    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 120)
    pairs = D.ngram_jaccard_pairs(d, n=3, threshold=0.01)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    pr = pagerank(edges, iters=3, damping=0.85)
    return pr.select(
        F.col("node").alias("doc_id"),
        F.col("degree").cast("bigint").alias("degree"),
        F.round(F.col("pr"), 6).alias("pagerank"),
    )


@register(
    "dedup_survivor_election",
    family="dedup",
    doc="End-to-end survivor election (operators/components.py:"
    "elect_survivors): near-dup pairs → connected components → per-"
    "cluster PageRank argmax — the full 'which copy do we KEEP' "
    "decision a production dedup pass ends with.  Components give the "
    "partition (cluster_id = min reachable doc_id), 3-iteration "
    "PageRank on the same symmetrized edge set gives the in-cluster "
    "ordering, and the survivor is the highest-centrality member with "
    "deterministic min-doc_id tie-break at 6-decimal rank precision.  "
    "Clusters of size ≥ 2 only (singletons have no election).  The "
    "oracle replays the whole composition: recursive-CTE transitive "
    "closure + 3 unrolled power iterations + a ROW_NUMBER argmax.  "
    "Scale: one doc_id equi-join + one struct-max aggregate on "
    "cluster_id on top of the two component operators' own shapes; no "
    "per-cluster window over corpus-sized input.",
    oracle="""
WITH RECURSIVE sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           UNNEST(list_transform(range(1, len(string_split(trim(text), ' ')) - 1),
                  i -> array_to_string((string_split(trim(text), ' '))[i:i+2], ' '))) AS shingle
    FROM documents WHERE doc_id < 120
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT doc_a, doc_b
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) >= 0.01
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents WHERE doc_id < 120
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
csize AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY cluster_id),
gnodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT COUNT(*) AS n FROM gnodes),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
pr0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM gnodes),
pr1 AS (
  SELECT n2.node,
         ROUND((1.0 - 0.85) / (SELECT n FROM nn)
               + 0.85 * COALESCE(CAST(SUM(CAST(ROUND(p.pr / dg.d, 12)
                     AS DECIMAL(20,12))) AS DOUBLE), 0.0), 12) AS pr
  FROM gnodes n2
  LEFT JOIN edges e ON e.dst = n2.node
  LEFT JOIN pr0 p ON p.node = e.src
  LEFT JOIN deg dg ON dg.src = e.src
  GROUP BY n2.node
),
pr2 AS (
  SELECT n2.node,
         ROUND((1.0 - 0.85) / (SELECT n FROM nn)
               + 0.85 * COALESCE(CAST(SUM(CAST(ROUND(p.pr / dg.d, 12)
                     AS DECIMAL(20,12))) AS DOUBLE), 0.0), 12) AS pr
  FROM gnodes n2
  LEFT JOIN edges e ON e.dst = n2.node
  LEFT JOIN pr1 p ON p.node = e.src
  LEFT JOIN deg dg ON dg.src = e.src
  GROUP BY n2.node
),
pr3 AS (
  SELECT n2.node,
         ROUND((1.0 - 0.85) / (SELECT n FROM nn)
               + 0.85 * COALESCE(CAST(SUM(CAST(ROUND(p.pr / dg.d, 12)
                     AS DECIMAL(20,12))) AS DOUBLE), 0.0), 12) AS pr
  FROM gnodes n2
  LEFT JOIN edges e ON e.dst = n2.node
  LEFT JOIN pr2 p ON p.node = e.src
  LEFT JOIN deg dg ON dg.src = e.src
  GROUP BY n2.node
),
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
""",
)
def dedup_survivor_election(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import elect_survivors

    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 120)
    pairs = D.ngram_jaccard_pairs(d, n=3, threshold=0.01)
    return elect_survivors(pairs, nodes=d.select("doc_id"))


@register(
    "mine_bitext_margin",
    family="similarity",
    doc="Margin-based bitext mining (the ratio-margin criterion of "
    "Artetxe & Schwenk, 'Margin-based Parallel Corpus Mining', ACL 2019 "
    "— the method behind CCMatrix-style aligned-pair curation): label-0 "
    "vectors are the source side, label-1 the target side; each source's "
    "best target is scored by cos(x,y) normalized by the mean of both "
    "directions' top-4 neighborhoods, which suppresses hubs that plain "
    "cosine thresholds mis-mine.  Determinism: cosines rounded to 6, "
    "neighborhood means via DECIMAL sums (order-independent), one "
    "identical margin expression both engines.  Scale: the cross-side "
    "score matrix here is the bounded brute-force tier; at 100 TB "
    "candidates come from the LSH/IVF bucket joins and the margin "
    "normalization is unchanged (per-id top-k aggregates).",
    oracle="""
WITH va AS (
  SELECT vec_id AS src_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE label = 0
),
vb AS (
  SELECT vec_id AS tgt_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE label = 1
),
scores AS (
  SELECT a.src_id, b.tgt_id,
         ROUND(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
  FROM va a CROSS JOIN vb b
),
fwd AS (
  SELECT src_id,
         CAST(SUM(CAST(cosine AS DECIMAL(10,6))) AS DOUBLE) / 4 AS fwd_avg
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id
                                 ORDER BY cosine DESC, tgt_id ASC) AS rn
    FROM scores
  ) WHERE rn <= 4 GROUP BY src_id
),
bwd AS (
  SELECT tgt_id,
         CAST(SUM(CAST(cosine AS DECIMAL(10,6))) AS DOUBLE) / 4 AS bwd_avg
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY tgt_id
                                 ORDER BY cosine DESC, src_id ASC) AS rn
    FROM scores
  ) WHERE rn <= 4 GROUP BY tgt_id
),
margins AS (
  SELECT s.src_id, s.tgt_id, s.cosine,
         ROUND(s.cosine / ((f.fwd_avg + b.bwd_avg) / 2), 6) AS margin
  FROM scores s
  JOIN fwd f USING (src_id)
  JOIN bwd b USING (tgt_id)
)
SELECT src_id, tgt_id, cosine, margin FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id
                               ORDER BY margin DESC, tgt_id ASC) AS rn
  FROM margins
) WHERE rn = 1 AND margin >= 1.0
""",
)
def mine_bitext_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import vectors as V

    e = table(spark, sf_dir, "embeddings")
    va = e.where(F.col("label") == 0).select(
        F.col("vec_id").alias("src_id"),
        V.to_double_array(F.col("embedding")).alias("v"),
    )
    vb = e.where(F.col("label") == 1).select(
        F.col("vec_id").alias("tgt_id"),
        V.to_double_array(F.col("embedding")).alias("w"),
    )
    scores = F.broadcast(va).crossJoin(vb).select(
        "src_id",
        "tgt_id",
        F.round(V.cosine_similarity(F.col("v"), F.col("w")), 6).alias("cosine"),
    )
    wf = Window.partitionBy("src_id").orderBy(
        F.col("cosine").desc(), F.col("tgt_id").asc()
    )
    wb = Window.partitionBy("tgt_id").orderBy(
        F.col("cosine").desc(), F.col("src_id").asc()
    )
    fwd = (
        scores.withColumn("rn", F.row_number().over(wf))
        .where(F.col("rn") <= 4)
        .groupBy("src_id")
        .agg(
            (F.sum(F.col("cosine").cast("decimal(10,6)")).cast("double") / 4).alias(
                "fwd_avg"
            )
        )
    )
    bwd = (
        scores.withColumn("rn", F.row_number().over(wb))
        .where(F.col("rn") <= 4)
        .groupBy("tgt_id")
        .agg(
            (F.sum(F.col("cosine").cast("decimal(10,6)")).cast("double") / 4).alias(
                "bwd_avg"
            )
        )
    )
    margin = F.round(
        F.col("cosine") / ((F.col("fwd_avg") + F.col("bwd_avg")) / 2), 6
    )
    wtop = Window.partitionBy("src_id").orderBy(
        F.col("margin").desc(), F.col("tgt_id").asc()
    )
    return (
        scores.join(fwd, "src_id")
        .join(bwd, "tgt_id")
        .withColumn("margin", margin)
        .withColumn("rn", F.row_number().over(wtop))
        .where((F.col("rn") == 1) & (F.col("margin") >= 1.0))
        .select("src_id", "tgt_id", "cosine", "margin")
    )


@register(
    "text_pmi_collocations",
    family="text",
    doc="PMI collocation mining — the classic corpus-linguistics signal "
    "for multiword expressions (Church & Hanks 1990), used in tokenizer "
    "and phrase-vocabulary induction: pmi(w1,w2) = ln((c12/Nb) / "
    "((c1/Nu)(c2/Nu))) over whitespace bigrams, pairs seen ≥ 5 times, "
    "deterministic top-50 by (pmi desc, w1, w2).  All inputs to the one "
    "ln expression are exact integer counts, so the double is "
    "bit-identical across engines and partitionings.  Scale: two count "
    "aggregates (unigram, bigram) + two broadcast joins of the pair list "
    "against the unigram model; corpus totals are broadcast scalars.",
    oracle="""
WITH toks AS (
  SELECT list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '') AS t
  FROM documents
),
uni AS (
  SELECT u.w, COUNT(*) AS c FROM toks, UNNEST(t) AS u(w) GROUP BY u.w
),
nu AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM uni),
bi AS (
  SELECT t[g.i + 1] AS w1, t[g.i + 2] AS w2, COUNT(*) AS c12
  FROM toks, UNNEST(range(GREATEST(len(t) - 1, 0))) AS g(i)
  GROUP BY 1, 2
),
nb AS (SELECT CAST(SUM(c12) AS DOUBLE) AS n FROM bi),
scored AS (
  SELECT b.w1, b.w2, b.c12,
         ROUND(LN((b.c12 / (SELECT n FROM nb))
               / ((u1.c / (SELECT n FROM nu)) * (u2.c / (SELECT n FROM nu)))), 6)
           AS pmi
  FROM bi b
  JOIN uni u1 ON u1.w = b.w1
  JOIN uni u2 ON u2.w = b.w2
  WHERE b.c12 >= 5
)
SELECT w1, w2, CAST(c12 AS BIGINT) AS n_pair, pmi FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY pmi DESC, w1 ASC, w2 ASC) AS rn
  FROM scored
) WHERE rn <= 50
""",
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens, word_ngrams

    d = table(spark, sf_dir, "documents")
    toks = d.select(tokens(F.col("text")).alias("t"))
    uni = toks.select(F.explode("t").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("c")
    )
    nu = uni.agg(F.sum("c").cast("double").alias("nu"))
    bi = (
        d.select(F.explode(word_ngrams(F.col("text"), 2)).alias("bg"))
        .select(
            F.split(F.col("bg"), " ").getItem(0).alias("w1"),
            F.split(F.col("bg"), " ").getItem(1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .where(F.col("c12") >= 5)
    )
    # Nb is the ALL-bigram total (the c12 >= 5 cut applies to candidates,
    # not to the probability denominator)
    nb = (
        d.select(F.explode(word_ngrams(F.col("text"), 2)).alias("bg"))
        .agg(F.count(F.lit(1)).cast("double").alias("nb"))
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    pmi = F.round(
        F.log(
            (F.col("c12") / F.col("nb"))
            / ((F.col("c1") / F.col("nu")) * (F.col("c2") / F.col("nu")))
        ),
        6,
    )
    # Top-k via orderBy().limit() → TakeOrderedAndProject (per-partition
    # partial top-k, no single-partition window shuffle).  Bigram vocabulary
    # grows with corpus size, so a global row_number window here would funnel
    # the whole vocab through one partition at scale.
    return (
        bi.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .withColumn("pmi", pmi)
        .orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(50)
        .select("w1", "w2", F.col("c12").cast("bigint").alias("n_pair"), "pmi")
    )


@register(
    "curation_url_canonicalize",
    family="etl",
    doc="Crawl-URL canonicalization battery — the normalization every "
    "URL-level dedup runs before hashing: lowercase scheme+host, strip "
    "default port, strip tracking query params (utm_*), drop fragments, "
    "collapse trailing slash.  URLs are synthesized deterministically "
    "from doc_id (scheme/host/port/path/params all arithmetic), so the "
    "oracle rebuilds input AND expected output from the same closed "
    "form; the dedup effect (distinct canonical vs raw) is part of the "
    "hash-checked answer.  Pure string expressions, map-side, no "
    "shuffle until the audit aggregate.",
    oracle="""
WITH raw AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END || '://' ||
         CASE WHEN doc_id % 3 = 0 THEN 'WWW.Example' || CAST(doc_id % 7 AS VARCHAR) || '.COM'
              ELSE 'site' || CAST(doc_id % 7 AS VARCHAR) || '.org' END ||
         CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE '' END ||
         '/path' || CAST(doc_id % 5 AS VARCHAR) ||
         CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END ||
         CASE WHEN doc_id % 3 = 1 THEN '?utm_source=feed&utm_campaign=x' ELSE '' END ||
         CASE WHEN doc_id % 6 = 2 THEN '#frag' ELSE '' END AS url
  FROM documents
),
canon AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 lower(regexp_replace(regexp_replace(url, '#.*$', ''),
                       '\\?utm_[^#]*$', '')),
                 ':80/', '/'),
               ':80$', ''),
             '/$', ''),
           '^http://', 'https://') AS curl
  FROM raw
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT curl) AS BIGINT) AS n_canonical,
       CAST(SUM(CASE WHEN curl LIKE 'https://%' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_https,
       CAST(SUM(CASE WHEN curl LIKE '%utm%' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tracking_left,
       MIN(curl) AS sample_min,
       MAX(curl) AS sample_max
FROM canon
""",
)
def curation_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    k = F.col("doc_id")
    url = F.concat(
        F.when(k % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(
            k % 3 == 0,
            F.concat(F.lit("WWW.Example"), (k % 7).cast("string"), F.lit(".COM")),
        ).otherwise(F.concat(F.lit("site"), (k % 7).cast("string"), F.lit(".org"))),
        F.when(k % 2 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/path"),
        (k % 5).cast("string"),
        F.when(k % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(k % 3 == 1, F.lit("?utm_source=feed&utm_campaign=x")).otherwise(
            F.lit("")
        ),
        F.when(k % 6 == 2, F.lit("#frag")).otherwise(F.lit("")),
    )
    curl = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.lower(
                        F.regexp_replace(
                            F.regexp_replace(url, r"#.*$", ""), r"\?utm_[^#]*$", ""
                        )
                    ),
                    ":80/",
                    "/",
                ),
                ":80$",
                "",
            ),
            "/$",
            "",
        ),
        "^http://",
        "https://",
    )
    return d.select(curl.alias("curl")).agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("curl").alias("n_canonical"),
        F.sum(F.when(F.col("curl").startswith("https://"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_https"),
        F.sum(F.when(F.col("curl").contains("utm"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_tracking_left"),
        F.min("curl").alias("sample_min"),
        F.max("curl").alias("sample_max"),
    )


@register(
    "curation_pareto_coverage",
    family="text",
    doc="Pareto coverage audit — 'how concentrated is the corpus': sources "
    "ranked by total characters contributed, cumulative share via a "
    "running-sum window, and per source its rank, exact share and "
    "cumulative share, flagged with the smallest prefix reaching 50% and "
    "90% coverage.  The dashboard behind source-mix rebalancing "
    "decisions (pairs with sample_temperature_rebalance).  Exact "
    "DECIMAL char sums; shares are one identical double division, "
    "cumulative share accumulated over DECIMAL then divided once — "
    "order-independent.  One aggregate + one tiny window over "
    "n_sources rows.",
    oracle="""
WITH per_source AS (
  SELECT source, CAST(SUM(n_chars) AS DECIMAL(18,0)) AS chars
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(SUM(chars) AS DOUBLE) AS t FROM per_source),
ranked AS (
  SELECT source, chars,
         ROW_NUMBER() OVER (ORDER BY chars DESC, source ASC) AS rnk,
         SUM(chars) OVER (ORDER BY chars DESC, source ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_chars
  FROM per_source
)
SELECT source,
       CAST(rnk AS INTEGER) AS rank,
       CAST(chars AS BIGINT) AS n_chars,
       ROUND(CAST(chars AS DOUBLE) / (SELECT t FROM tot), 6) AS share,
       ROUND(CAST(cum_chars AS DOUBLE) / (SELECT t FROM tot), 6) AS cum_share,
       CAST(CASE WHEN CAST(cum_chars AS DOUBLE) / (SELECT t FROM tot) >= 0.5
                  AND (CAST(cum_chars - chars AS DOUBLE) / (SELECT t FROM tot)) < 0.5
                 THEN 1 ELSE 0 END AS INTEGER) AS crosses_p50,
       CAST(CASE WHEN CAST(cum_chars AS DOUBLE) / (SELECT t FROM tot) >= 0.9
                  AND (CAST(cum_chars - chars AS DOUBLE) / (SELECT t FROM tot)) < 0.9
                 THEN 1 ELSE 0 END AS INTEGER) AS crosses_p90
FROM ranked
""",
)
def curation_pareto_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.sum(F.col("n_chars").cast("decimal(18,0)")).alias("chars")
    )
    tot = per_source.agg(F.sum("chars").cast("double").alias("t"))
    w = Window.orderBy(F.col("chars").desc(), F.col("source").asc())
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = per_source.select(
        "source",
        "chars",
        F.row_number().over(w).alias("rank"),
        F.sum("chars").over(wcum).alias("cum_chars"),
    ).crossJoin(F.broadcast(tot))
    share = F.col("chars").cast("double") / F.col("t")
    cum = F.col("cum_chars").cast("double") / F.col("t")
    prev = (F.col("cum_chars") - F.col("chars")).cast("double") / F.col("t")
    return ranked.select(
        "source",
        F.col("rank").cast("int").alias("rank"),
        F.col("chars").cast("bigint").alias("n_chars"),
        F.round(share, 6).alias("share"),
        F.round(cum, 6).alias("cum_share"),
        F.when((cum >= 0.5) & (prev < 0.5), 1).otherwise(0).cast("int")
        .alias("crosses_p50"),
        F.when((cum >= 0.9) & (prev < 0.9), 1).otherwise(0).cast("int")
        .alias("crosses_p90"),
    )


@register(
    "multimodal_thumbnail_stats",
    family="multimodal",
    doc="Decode → transform → feature, the image-preprocessing pipeline "
    "shape: REAL PNG pixel decode (stdlib zlib inflate + unfilter), "
    "nearest-neighbor resize to an 8x8 thumbnail with the integer index "
    "map src = out_idx * src_dim // out_dim (resize_ppm's convention), "
    "then per-thumbnail statistics.  The oracle samples the closed-form "
    "pixel arithmetic at exactly the mapped coordinates — any drift in "
    "the decode OR the resize index math breaks the hash.  Blobs stay "
    "inside the Arrow batch; the aggregate sees 6 narrow columns.",
    oracle="""
WITH dims AS (
  SELECT doc_id, doc_id % 24 + 4 AS w, doc_id % 16 + 4 AS h FROM documents
),
px AS (
  SELECT doc_id, w, h,
         (doc_id * 7
          + 3 * ((xs.x * w) // 8)
          + 5 * ((ys.y * h) // 8)
          + 11 * cs.c) % 256 AS v
  FROM dims,
       UNNEST(range(0, 8)) AS xs(x),
       UNNEST(range(0, 8)) AS ys(y),
       UNNEST(range(0, 3)) AS cs(c)
)
SELECT doc_id AS image_id,
       CAST(MIN(w) AS INT) AS src_width,
       CAST(MIN(h) AS INT) AS src_height,
       CAST(SUM(v) AS BIGINT) AS thumb_sum,
       CAST(MIN(v) AS INT) AS thumb_min,
       CAST(MAX(v) AS INT) AS thumb_max
FROM px
GROUP BY doc_id
""",
)
def multimodal_thumbnail_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import png_thumbnail_stats, synthesize_png_media

    d = table(spark, sf_dir, "documents")
    return png_thumbnail_stats(synthesize_png_media(d.select("doc_id")))


@register(
    "embedding_centroid_fisher",
    family="similarity",
    doc="Per-label centroid + Fisher separation diagnostic — the "
    "embedding-quality check run before trusting a space for clustering "
    "or ANN: per label, the mean vector (exact DECIMAL per-dimension "
    "sums over posexplode, order-independent) and mean squared distance "
    "to the own centroid (within-class scatter); plus each label's "
    "distance to the global centroid (between-class signal).  Labels "
    "whose between/within ratio is low are entangled in the space.  "
    "Scale: one posexplode shuffle keyed (label, dim) — nlabels*dim "
    "aggregate rows, vectors never collected.",
    oracle="""
WITH vecs AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
flat AS (
  SELECT label, vec_id, d.i AS dim, v[d.i + 1] AS val
  FROM vecs, UNNEST(range(64)) AS d(i)
),
cent AS (
  SELECT label, dim,
         CAST(SUM(CAST(ROUND(val, 9) AS DECIMAL(20,9))) AS DOUBLE)
           / COUNT(*) AS mu
  FROM flat GROUP BY label, dim
),
gcent AS (
  SELECT dim,
         CAST(SUM(CAST(ROUND(val, 9) AS DECIMAL(20,9))) AS DOUBLE)
           / COUNT(*) AS gmu
  FROM flat GROUP BY dim
),
within AS (
  SELECT f.label, f.vec_id,
         CAST(SUM(CAST(ROUND((f.val - c.mu) * (f.val - c.mu), 9)
                       AS DECIMAL(20,9))) AS DOUBLE) AS sqd
  FROM flat f JOIN cent c ON c.label = f.label AND c.dim = f.dim
  GROUP BY f.label, f.vec_id
),
between_d AS (
  SELECT c.label,
         CAST(SUM(CAST(ROUND((c.mu - g.gmu) * (c.mu - g.gmu), 9)
                       AS DECIMAL(20,9))) AS DOUBLE) AS bsq
  FROM cent c JOIN gcent g ON g.dim = c.dim
  GROUP BY c.label
)
SELECT w.label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       ROUND(CAST(SUM(CAST(ROUND(w.sqd, 6) AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 6) AS within_msd,
       ROUND(MIN(b.bsq), 6) AS between_sq,
       ROUND(MIN(b.bsq) / (CAST(SUM(CAST(ROUND(w.sqd, 6) AS DECIMAL(18,6)))
             AS DOUBLE) / COUNT(*)), 6) AS fisher_ratio
FROM within w JOIN between_d b ON b.label = w.label
GROUP BY w.label
""",
)
def embedding_centroid_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import vectors as V

    e = table(spark, sf_dir, "embeddings")
    flat = e.select(
        "label",
        "vec_id",
        F.posexplode(V.to_double_array(F.col("embedding"))).alias("dim", "val"),
    )
    dec9 = lambda c: F.round(c, 9).cast("decimal(20,9)")  # noqa: E731
    cent = flat.groupBy("label", "dim").agg(
        (F.sum(dec9(F.col("val"))).cast("double") / F.count(F.lit(1))).alias("mu")
    )
    gcent = flat.groupBy("dim").agg(
        (F.sum(dec9(F.col("val"))).cast("double") / F.count(F.lit(1))).alias("gmu")
    )
    within = (
        flat.join(cent, ["label", "dim"])
        .groupBy("label", "vec_id")
        .agg(
            F.sum(dec9((F.col("val") - F.col("mu")) * (F.col("val") - F.col("mu"))))
            .cast("double")
            .alias("sqd")
        )
    )
    between_d = (
        cent.join(F.broadcast(gcent), "dim")
        .groupBy("label")
        .agg(
            F.sum(dec9((F.col("mu") - F.col("gmu")) * (F.col("mu") - F.col("gmu"))))
            .cast("double")
            .alias("bsq")
        )
    )
    wmsd = F.sum(F.round(F.col("sqd"), 6).cast("decimal(18,6)")).cast(
        "double"
    ) / F.count(F.lit(1))
    return (
        within.join(F.broadcast(between_d), "label")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(wmsd, 6).alias("within_msd"),
            F.round(F.min("bsq"), 6).alias("between_sq"),
            F.round(F.min("bsq") / wmsd, 6).alias("fisher_ratio"),
        )
    )


@register(
    "text_keyword_extraction",
    family="text",
    doc="TF-IDF keyword extraction — deterministic top-3 keywords per "
    "document for doc_id < 50 (the summarization/indexing primitive "
    "composing text_term_frequency and text_doc_idf): tf = in-doc term "
    "count, idf = ln(N / df) over the full corpus, score rounded and "
    "ranked with full tie-breaks.  Scale: the token-count aggregate and "
    "the df aggregate are the only shuffles; the probe-doc restriction "
    "is a map-side filter pushed below both.",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         UNNEST(list_filter(string_split_regex(trim(text), '\\s+'),
                x -> x != '')) AS w
  FROM documents
),
nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n FROM tok),
df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY w),
tf AS (
  SELECT doc_id, w, COUNT(*) AS tf FROM tok WHERE doc_id < 50
  GROUP BY doc_id, w
),
scored AS (
  SELECT t.doc_id, t.w AS keyword, CAST(t.tf AS BIGINT) AS tf,
         ROUND(t.tf * LN((SELECT n FROM nd) / d.df), 6) AS score
  FROM tf t JOIN df d ON d.w = t.w
)
SELECT doc_id, keyword, tf, score, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, keyword ASC) AS rank
  FROM scored
) WHERE rank <= 3
""",
)
def text_keyword_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    nd = tok.agg(F.countDistinct("doc_id").cast("double").alias("n"))
    df = tok.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    tf = (
        tok.where(F.col("doc_id") < 50)
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("keyword").asc()
    )
    return (
        tf.join(df, "w")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            F.col("w").alias("keyword"),
            F.col("tf").cast("bigint").alias("tf"),
            F.round(F.col("tf") * F.log(F.col("n") / F.col("df")), 6).alias("score"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("doc_id", "keyword", "tf", "score", F.col("rank").cast("int").alias("rank"))
    )


@register(
    "sample_weighted_reservoir",
    family="dedup",
    doc="Weighted sampling without replacement, exactly k per group, "
    "deterministic (Efraimidis-Spirakis A-ES keys): per doc u = "
    "(md5-bucket + 0.5) / 1e6 in (0,1), key = ln(u) / n_chars, top-20 "
    "per language by key DESC — longer documents win proportionally to "
    "weight, yet the draw is a pure function of doc_id, so the sample "
    "is reproducible across runs, engines and partitionings (the "
    "property rand()-weighted sampling lacks; pairs with the unweighted "
    "sample_topk_per_source).  Key arithmetic is one identical "
    "ln-and-divide on both engines; selection is one per-group top-k "
    "window.",
    oracle="""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         LN((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 1000000 + 0.5) / 1000000.0)
           / n_chars AS es_key
  FROM documents
)
SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       ROUND(es_key * 1000000, 6) AS key_scaled,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                               ORDER BY es_key DESC, doc_id ASC) AS rank
  FROM keyed
) WHERE rank <= 20
""",
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_long

    d = table(spark, sf_dir, "documents")
    u = (md5_long(F.col("doc_id").cast("string")) % 1000000 + 0.5) / 1000000.0
    es_key = F.log(u) / F.col("n_chars")
    w = Window.partitionBy("lang").orderBy(F.col("es_key").desc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", "lang", "n_chars", es_key.alias("es_key"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 20)
        .select(
            "lang",
            "doc_id",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.round(F.col("es_key") * 1000000, 6).alias("key_scaled"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


@register(
    "text_fertility_stats",
    family="text",
    doc="Tokenizer fertility diagnostics per language — the eval behind "
    "choosing/retraining a tokenizer for multilingual corpora: "
    "whitespace tokens vs BPE-ish pre-tokens per doc, chars-per-token "
    "and subtoken-inflation ratios aggregated with exact DECIMAL sums "
    "(order-independent), languages whose inflation is highest pay the "
    "most sequence length per character of signal.  Two map-side token "
    "counts per doc (no explode — size(array) only), one aggregate.",
    oracle="""
WITH per_doc AS (
  SELECT lang,
         CAST(LENGTH(text) AS DECIMAL(18,2)) AS n_chars,
         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                              x -> x != '')) AS DECIMAL(18,2)) AS n_ws,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
              AS DECIMAL(18,2)) AS n_bpe
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(CAST(SUM(n_ws) AS DOUBLE) AS BIGINT) AS total_ws_tokens,
       CAST(CAST(SUM(n_bpe) AS DOUBLE) AS BIGINT) AS total_bpe_tokens,
       ROUND(CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(n_bpe) AS DOUBLE), 6)
         AS chars_per_bpe_token,
       ROUND(CAST(SUM(n_bpe) AS DOUBLE) / CAST(SUM(n_ws) AS DOUBLE), 6)
         AS subtoken_inflation
FROM per_doc
GROUP BY lang
""",
)
def text_fertility_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import bpe_tokens, tokens

    d = table(spark, sf_dir, "documents")
    per_doc = d.select(
        "lang",
        F.length("text").cast("decimal(18,2)").alias("n_chars"),
        F.size(tokens(F.col("text"))).cast("decimal(18,2)").alias("n_ws"),
        F.size(bpe_tokens(F.col("text"))).cast("decimal(18,2)").alias("n_bpe"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_ws").cast("double").cast("bigint").alias("total_ws_tokens"),
        F.sum("n_bpe").cast("double").cast("bigint").alias("total_bpe_tokens"),
        F.round(
            F.sum("n_chars").cast("double") / F.sum("n_bpe").cast("double"), 6
        ).alias("chars_per_bpe_token"),
        F.round(
            F.sum("n_bpe").cast("double") / F.sum("n_ws").cast("double"), 6
        ).alias("subtoken_inflation"),
    )


def _semantic_clusters_oracle() -> str:
    """Generated oracle composing the LSH pair SQL (seeded hyperplanes
    inlined, as in _lsh_pairs_oracle) with the recursive-CTE transitive
    closure — the full bucketed-pairs → components pipeline in one
    statement."""
    from ..operators.similarity import _lcg_planes

    terms = []
    for i, p in enumerate(_lcg_planes(8, 64, 42)):
        lst = "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in p) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(v, {lst}) >= 0"
            f" THEN CAST({2**i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        )
    bucket = "\n       + ".join(terms)
    cos = (
        "list_dot_product(a.v, b.v)"
        " / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
    )
    return f"""
WITH RECURSIVE e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
bk AS (SELECT vec_id, v, {bucket} AS bucket FROM e),
pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE {cos} >= 0.35
),
edges AS (
  SELECT va AS src, vb AS dst FROM pairs
  UNION ALL SELECT vb, va FROM pairs
),
reach(node, lbl) AS (
  SELECT vec_id, vec_id FROM e
  UNION
  SELECT ed.dst, r.lbl FROM reach r JOIN edges ed ON ed.src = r.node
),
comp AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node)
SELECT cluster_id,
       CAST(COUNT(*) AS BIGINT) AS cluster_size,
       CAST(MIN(node) AS BIGINT) AS member_min,
       CAST(MAX(node) AS BIGINT) AS member_max
FROM comp
GROUP BY cluster_id
HAVING COUNT(*) >= 2
"""


@register(
    "dedup_semantic_clusters",
    family="dedup",
    doc="SemDeDup-style semantic deduplication end-to-end ON THE SCALE "
    "PATH: sign-LSH bucketed cosine pairs (>= 0.35, the "
    "dedup_embedding_lsh_pairs edge set — equi-join on bucket, never "
    "all-pairs) fed through distributed connected components "
    "(operators/components.py) and reduced to per-cluster facts — id, "
    "size, member span.  The embedding-space twin of "
    "dedup_cluster_components: semantically redundant groups collapse "
    "to one representative even when their surface text shares no "
    "shingles.  Oracle is GENERATED: inlined hyperplanes + bucket join "
    "+ recursive-CTE closure replay the whole pipeline in SQL.  "
    "(Edge recall vs brute force is the LSH trade, asserted in "
    "tests/test_similarity.py; the brute twin stays available as "
    "cosine_pairs_above for bounded tiers.)",
    oracle=_semantic_clusters_oracle(),
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import components as C

    e = table(spark, sf_dir, "embeddings")
    pairs = S.cosine_pairs_above_lsh(e, threshold=0.35).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    comp = C.dedup_clusters(
        pairs, nodes=e.select(F.col("vec_id").alias("doc_id"))
    )
    return (
        comp.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min("doc_id").cast("bigint").alias("member_min"),
            F.max("doc_id").cast("bigint").alias("member_max"),
        )
        .where(F.col("cluster_size") >= 2)
        .select(
            "cluster_id",
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            "member_min",
            "member_max",
        )
    )


_HOT_TEMPLATE = (
    "the shared boilerplate template text repeated for the hot family of"
    " documents v"
)


def _minhash_star_capped_oracle() -> str:
    """Generated oracle for the max_bucket STAR-CAP path: same
    signature/banding SQL as _minhash_lsh_oracle, but candidate
    generation replicates the capped logic — per-bucket size +
    representative, all-pairs for buckets <= 8, star edges to the
    min-doc_id representative above — over a corpus with a PLANTED
    30-doc hot family (one unique shingle each, 12 shared), so the
    oversized-bucket branch actually executes under the driver's gate."""
    m61 = (1 << 61) - 1
    sig_cols = ", ".join(f"MIN((h1 + {k} * h2) % {m61}) AS s{k}" for k in range(16))
    bands = ", ".join(
        "{'band_idx': %d, 'band_hash': md5(CAST(s%d AS VARCHAR))}" % (b, b)
        for b in range(16)
    )
    return f"""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 120
  UNION ALL
  SELECT 10000 + t.i AS doc_id,
         '{_HOT_TEMPLATE}' || CAST(t.i AS VARCHAR) AS text
  FROM UNNEST(range(30)) AS t(i)
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           UNNEST(list_transform(range(1, len(string_split(trim(text), ' ')) - 1),
                  i -> array_to_string((string_split(trim(text), ' '))[i:i+2], ' '))) AS shingle
    FROM docs)
),
hp AS (SELECT doc_id,
         CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h1,
         CAST(('0x' || substr(md5(shingle), 17, 12)) AS BIGINT) AS h2
       FROM sh),
sig AS (SELECT doc_id, {sig_cols} FROM hp GROUP BY doc_id),
banded AS (
  SELECT doc_id, u.b.band_idx AS band_idx, u.b.band_hash AS band_hash
  FROM sig, UNNEST([{bands}]) AS u(b)
),
bstats AS (
  SELECT band_idx, band_hash, COUNT(*) AS bsz, MIN(doc_id) AS rep
  FROM banded GROUP BY band_idx, band_hash
),
bb AS (
  SELECT b.doc_id, b.band_idx, b.band_hash, s.bsz, s.rep
  FROM banded b JOIN bstats s USING (band_idx, band_hash)
),
small_pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bb a JOIN bb b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id AND a.bsz <= 8
),
star_pairs AS (
  SELECT rep AS doc_a, doc_id AS doc_b FROM bb
  WHERE bsz > 8 AND doc_id != rep
),
candidates AS (
  SELECT DISTINCT doc_a, doc_b FROM (
    SELECT * FROM small_pairs UNION ALL SELECT * FROM star_pairs
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
common AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM candidates c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b,
       ROUND(CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) >= 0.0
"""


@register(
    "dedup_minhash_star_capped",
    family="dedup",
    doc="The adversarial-skew guard under the driver's gate: MinHash(16)+"
    "LSH(16 one-row bands) with max_bucket=8 star-capping "
    "(operators/dedup.py) over the doc_id<120 sample PLUS a planted "
    "30-doc hot-template family (12 shared shingles, 1 unique each) "
    "whose band buckets overflow the cap — so the oversized-bucket star "
    "branch (edges to the min-id representative, O(bucket) not "
    "O(bucket²)) actually executes and is hash-verified.  Oracle is "
    "GENERATED: the full pipeline incl. per-bucket size/representative "
    "logic reproduced in SQL.  Motivation measured in SCALING.md "
    "('Adversarial stop-shingle skew': 762s -> 28s at 10x-hot).",
    oracle=_minhash_star_capped_oracle(),
)
def dedup_minhash_star_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lsh_planner import plan_minhash_lsh

    # same max-recall plan as dedup_minhash_lsh_candidates; the planner
    # bounds the EXPECTED candidate rate, max_bucket bounds the
    # adversarial worst case the planted hot family creates
    plan = plan_minhash_lsh(0.3, num_hashes=16, fn_budget=0.05)
    assert (plan.bands, plan.rows_per_band) == (16, 1)
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 120)
    hot = spark.range(30).select(
        (F.col("id") + 10000).alias("doc_id"),
        F.concat(F.lit(_HOT_TEMPLATE), F.col("id").cast("string")).alias("text"),
    )
    corpus = d.select("doc_id", "text").unionAll(hot)
    return D.minhash_lsh_pairs(
        corpus,
        num_hashes=plan.num_hashes,
        bands=plan.bands,
        n=3,
        threshold=0.0,
        max_bucket=8,
    )


@register(
    "text_ngram_novelty",
    family="text",
    doc="Corpus redundancy curve — per doc_id-ordered bucket of 50 "
    "documents, the share of its distinct 3-gram shingles whose FIRST "
    "corpus occurrence (min doc_id owning the shingle) falls inside "
    "that bucket: high novelty early, declining as the corpus "
    "saturates — the measurement behind 'more data stops helping' "
    "curation calls and dedup-threshold tuning.  Two aggregates "
    "(first-owner per shingle, then per-bucket rollup) + one join, all "
    "keyed on the shingle hash at scale.",
    oracle="""
WITH sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           UNNEST(list_transform(range(1, len(string_split(trim(text), ' ')) - 1),
                  i -> array_to_string((string_split(trim(text), ' '))[i:i+2], ' '))) AS shingle
    FROM documents)
),
first_owner AS (
  SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
),
per_doc AS (
  SELECT s.doc_id,
         COUNT(*) AS n_shingles,
         SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS n_novel
  FROM sh s JOIN first_owner f USING (shingle)
  GROUP BY s.doc_id
)
SELECT CAST(doc_id // 50 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_shingles) AS BIGINT) AS total_shingles,
       CAST(SUM(n_novel) AS BIGINT) AS novel_shingles,
       ROUND(CAST(SUM(n_novel) AS DOUBLE) / SUM(n_shingles), 6) AS novelty
FROM per_doc
GROUP BY 1
""",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import word_ngrams

    d = table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams(F.col("text"), 3))).alias("shingle"),
    )
    first_owner = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        sh.join(first_owner, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    return per_doc.groupBy(
        (F.col("doc_id") / 50).cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_shingles").cast("bigint").alias("total_shingles"),
        F.sum("n_novel").cast("bigint").alias("novel_shingles"),
        F.round(
            F.sum("n_novel").cast("double") / F.sum("n_shingles"), 6
        ).alias("novelty"),
    )


@register(
    "multimodal_audio_sample_stats",
    family="multimodal",
    doc="REAL sample-level PCM audio decode — the audio twin of "
    "multimodal_pixel_stats: a deterministic corpus of genuine 16-bit "
    "PCM WAVs (sample(i,ch) = ((id*13+7i+3ch) mod 2003) - 1001) is "
    "synthesized, decoded back sample-for-sample by the chunk-walking "
    "PCM reader (operators/multimodal.py:decode_wav_samples — byte "
    "arithmetic + numpy, no audio library), and reduced to per-clip "
    "statistics.  The oracle recomputes the same statistics from the "
    "closed-form sample arithmetic; drift in chunk offsets, LE int16 "
    "interpretation, or channel interleave breaks the hash.",
    oracle="""
WITH dims AS (
  SELECT doc_id, doc_id % 100 + 1 AS n, doc_id % 2 + 1 AS ch FROM documents
),
samples AS (
  SELECT doc_id, n, ch,
         (doc_id * 13 + 7 * si.i + 3 * ci.c) % 2003 - 1001 AS s
  FROM dims,
       UNNEST(range(0, n)) AS si(i),
       UNNEST(range(0, ch)) AS ci(c)
)
SELECT doc_id AS audio_id,
       CAST(MIN(n) AS INT) AS n_samples,
       CAST(MIN(ch) AS INT) AS n_channels,
       CAST(SUM(s) AS BIGINT) AS sample_sum,
       CAST(MIN(s) AS INT) AS sample_min,
       CAST(MAX(s) AS INT) AS sample_max
FROM samples
GROUP BY doc_id
""",
)
def multimodal_audio_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import synthesize_pcm_audio, wav_sample_stats

    d = table(spark, sf_dir, "documents")
    return wav_sample_stats(synthesize_pcm_audio(d.select("doc_id")))


@register(
    "multimodal_luminance_histogram",
    family="multimodal",
    doc="Corpus exposure audit over the REAL PNG decode path "
    "(operators/multimodal.py:png_luminance_histogram): per image, "
    "integer BT.601 luma (299R + 587G + 114B) // 1000 — all-integer "
    "arithmetic so the closed-form oracle reproduces it without "
    "float-weight rounding hazards — binned into 16 16-wide buckets, "
    "numpy-bincounted inside the Arrow batch, per-image partials "
    "aggregated globally with shares against the broadcast pixel "
    "total.  The curation gate for over/under-exposed image shards; "
    "blobs never leave the executor, the aggregate sees 16 rows per "
    "batch.",
    oracle="""
WITH dims AS (
  SELECT doc_id, doc_id % 24 + 4 AS w, doc_id % 16 + 4 AS h FROM documents
),
px AS (
  SELECT ((299 * ((doc_id * 7 + 3 * xs.x + 5 * ys.y) % 256)
         + 587 * ((doc_id * 7 + 3 * xs.x + 5 * ys.y + 11) % 256)
         + 114 * ((doc_id * 7 + 3 * xs.x + 5 * ys.y + 22) % 256)) // 1000)
         // 16 AS bin
  FROM dims, UNNEST(range(0, w)) AS xs(x), UNNEST(range(0, h)) AS ys(y)
),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM px)
SELECT CAST(bin AS INT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_px,
       ROUND(COUNT(*) / t, 6) AS share
FROM px, tot GROUP BY bin, t
""",
)
def multimodal_luminance_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (
        png_luminance_histogram,
        synthesize_png_media,
    )

    d = table(spark, sf_dir, "documents")
    hist = png_luminance_histogram(synthesize_png_media(d.select("doc_id")))
    tot = hist.agg(F.sum("n_px").cast("double").alias("t"))
    return hist.crossJoin(F.broadcast(tot)).select(
        F.col("bin").cast("int").alias("bin"),
        F.col("n_px").cast("bigint").alias("n_px"),
        F.round(F.col("n_px") / F.col("t"), 6).alias("share"),
    )
