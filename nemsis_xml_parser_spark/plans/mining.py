"""Corpus-mining and estimation queries (SURVEY §2.I extension).

The second tier of the training-data pipeline family: heuristic quality
gates (Gopher-style rule batteries), nonparametric drift tests
(Mann-Whitney rank-sum on the bounded bucket domain), optimizer-grade
cardinality estimation audits, inverted-index construction, RefinedWeb-
style exact-substring (duplicated n-gram span) detection, and graph
triangle counting / clustering coefficients on a co-occurrence graph.

Scale shapes, per query, are documented on the registration docstrings;
the common discipline: aggregate corpus-sized data once onto a bounded
domain (rule booleans, buckets, terms, n-grams, edges) and do the
statistics on the small frame; no unpartitioned windows anywhere (top-k
is orderBy().limit() → TakeOrderedAndProject; cumulative counts over
bounded domains use broadcast triangular joins).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions import text as T
from .registry import register, table

# ---------------------------------------------------------------------------
# Gopher-style quality rule battery
# ---------------------------------------------------------------------------

#: rule thresholds, probed against the synthetic corpus so every rule
#: discriminates (no all-pass / all-fail rule): word counts span 10-99,
#: mean word lengths 3.7-5.3, unique-token ratios 0.28-1.0
MIN_WORDS, MAX_WORDS = 40, 1000
MAX_MEAN_WLEN = 5.0
MIN_UNIQUE_RATIO = 0.5
STOPWORD = "the"


@register(
    "curation_gopher_rules",
    family="curation",
    doc="Gopher-style heuristic quality gate (Rae et al. 2021 §A1.1 "
    "adapted to the synthetic corpus): per-document boolean rules — "
    "word count in [40, 1000], mean word length ≤ 5.0 (chars-minus-"
    "separators over words, so both engines share one exact formula), "
    "unique-token ratio ≥ 0.5, stopword presence ('the') — aggregated "
    "per source into rule-level pass counts and the all-rules pass "
    "rate.  Every rule is a built-in column expression (split/length/"
    "array_distinct/array_contains — whole-stage codegen, no Python), "
    "and the only shuffle is the final 20-key source aggregate; rule "
    "booleans are exact integers so cross-engine determinism is free.",
    oracle=f"""
WITH t AS (
  SELECT source,
         len(string_split(trim(text), ' ')) AS nw,
         length(trim(text)) - (len(string_split(trim(text), ' ')) - 1) AS nc,
         len(list_distinct(string_split(trim(text), ' '))) AS nu,
         list_contains(string_split(trim(text), ' '), '{STOPWORD}') AS hs
  FROM documents
),
r AS (
  SELECT source,
         CASE WHEN nw BETWEEN {MIN_WORDS} AND {MAX_WORDS} THEN 1 ELSE 0 END AS r_words,
         CASE WHEN CAST(nc AS DOUBLE) / nw <= {MAX_MEAN_WLEN} THEN 1 ELSE 0 END AS r_wlen,
         CASE WHEN CAST(nu AS DOUBLE) / nw >= {MIN_UNIQUE_RATIO} THEN 1 ELSE 0 END AS r_uniq,
         CASE WHEN hs THEN 1 ELSE 0 END AS r_stop
  FROM t
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(r_words) AS BIGINT) AS pass_wordcount,
       CAST(SUM(r_wlen) AS BIGINT) AS pass_meanlen,
       CAST(SUM(r_uniq) AS BIGINT) AS pass_unique,
       CAST(SUM(r_stop) AS BIGINT) AS pass_stopword,
       CAST(SUM(r_words * r_wlen * r_uniq * r_stop) AS BIGINT) AS pass_all,
       ROUND(CAST(SUM(r_words * r_wlen * r_uniq * r_stop) AS DOUBLE)
             / COUNT(*), 6) AS pass_rate
FROM r GROUP BY source
""",
)
def curation_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " ")
    nw = F.size(toks)
    nc = F.length(F.trim(F.col("text"))) - (nw - F.lit(1))
    nu = F.size(F.array_distinct(toks))
    r_words = ((nw >= MIN_WORDS) & (nw <= MAX_WORDS)).cast("int")
    r_wlen = (nc.cast("double") / nw <= MAX_MEAN_WLEN).cast("int")
    r_uniq = (nu.cast("double") / nw >= MIN_UNIQUE_RATIO).cast("int")
    r_stop = F.array_contains(toks, STOPWORD).cast("int")
    rules = d.select(
        "source",
        r_words.alias("r_words"),
        r_wlen.alias("r_wlen"),
        r_uniq.alias("r_uniq"),
        r_stop.alias("r_stop"),
    )
    return rules.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("r_words").cast("bigint").alias("pass_wordcount"),
        F.sum("r_wlen").cast("bigint").alias("pass_meanlen"),
        F.sum("r_uniq").cast("bigint").alias("pass_unique"),
        F.sum("r_stop").cast("bigint").alias("pass_stopword"),
        F.sum(F.col("r_words") * F.col("r_wlen") * F.col("r_uniq") * F.col("r_stop"))
        .cast("bigint")
        .alias("pass_all"),
        F.round(
            F.sum(
                F.col("r_words") * F.col("r_wlen") * F.col("r_uniq") * F.col("r_stop")
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("pass_rate"),
    )


# ---------------------------------------------------------------------------
# Mann-Whitney rank-sum drift test (bucketed midranks)
# ---------------------------------------------------------------------------

#: same fixed bucket width as plans/drift.py — the statistic domain stays
#: bounded regardless of corpus size
RS_BUCKET_W = 50


@register(
    "quality_rank_sum_drift",
    family="quality",
    doc="Mann-Whitney U two-sample drift test between the corpus halves "
    "(doc_id parity = reference vs incoming), the nonparametric "
    "complement of the PSI/KS audits in plans/drift.py: n_chars is "
    "bucketed at fixed width 50 FIRST, per-bucket midranks come from "
    "cumulative counts below each bucket (broadcast strict-less "
    "triangular join over the ≤dozen-bucket domain — no window), "
    "U = Σ n_cur·midrank − n_cur(n_cur+1)/2, and the z-score uses the "
    "tie-corrected variance n_ref·n_cur/12·((N+1) − Σ(t³−t)/(N(N−1))). "
    "Midranks are exact multiples of 0.5 and every count is an exact "
    "integer, so the arithmetic is order-independent without DECIMAL "
    "staging; one corpus scan, then tiny-frame math.",
    oracle=f"""
WITH counts AS (
  SELECT CAST(FLOOR(n_chars / {RS_BUCKET_W}) AS INTEGER) AS bucket,
         SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS n_ref,
         SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS n_cur
  FROM documents GROUP BY 1
),
cum AS (
  SELECT a.bucket, a.n_ref, a.n_cur,
         COALESCE(SUM(b.n_ref + b.n_cur), 0) AS below
  FROM counts a LEFT JOIN counts b ON b.bucket < a.bucket
  GROUP BY a.bucket, a.n_ref, a.n_cur
),
tot AS (
  SELECT CAST(SUM(n_ref) AS DOUBLE) AS nr,
         CAST(SUM(n_cur) AS DOUBLE) AS nc,
         CAST(SUM(n_ref + n_cur) AS DOUBLE) AS n,
         CAST(SUM((n_ref + n_cur) * (n_ref + n_cur) * (n_ref + n_cur)
                  - (n_ref + n_cur)) AS DOUBLE) AS ties,
         CAST(COUNT(*) AS BIGINT) AS n_bins
  FROM counts
),
rsum AS (
  SELECT SUM(n_cur * (below + (n_ref + n_cur + 1) / 2.0)) AS r_cur FROM cum
)
SELECT ROUND(r_cur - t.nc * (t.nc + 1) / 2.0, 6) AS u_stat,
       ROUND((r_cur - t.nc * (t.nc + 1) / 2.0 - t.nr * t.nc / 2.0)
             / sqrt(t.nr * t.nc / 12.0
                    * ((t.n + 1) - t.ties / (t.n * (t.n - 1)))), 6) AS z_score,
       CAST(t.nr AS BIGINT) AS n_ref,
       CAST(t.nc AS BIGINT) AS n_cur,
       t.n_bins AS n_bins
FROM rsum, tot t
""",
)
def quality_rank_sum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy(
        F.floor(F.col("n_chars") / RS_BUCKET_W).cast("int").alias("bucket")
    ).agg(
        F.sum(F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("doc_id") % 2 == 1, 1).otherwise(0)).alias("n_cur"),
    )
    lo = counts.select(
        F.col("bucket").alias("b_lo"),
        (F.col("n_ref") + F.col("n_cur")).alias("n_lo"),
    )
    cum = (
        counts.join(F.broadcast(lo), F.col("b_lo") < F.col("bucket"), "left")
        .groupBy("bucket", "n_ref", "n_cur")
        .agg(F.coalesce(F.sum("n_lo"), F.lit(0)).alias("below"))
    )
    n_tot = F.col("n_ref") + F.col("n_cur")
    tot = counts.agg(
        F.sum("n_ref").cast("double").alias("nr"),
        F.sum("n_cur").cast("double").alias("nc"),
        F.sum(n_tot).cast("double").alias("n"),
        F.sum(n_tot * n_tot * n_tot - n_tot).cast("double").alias("ties"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
    )
    rsum = cum.agg(
        F.sum(
            F.col("n_cur") * (F.col("below") + (n_tot + F.lit(1)) / F.lit(2.0))
        ).alias("r_cur")
    )
    u = F.col("r_cur") - F.col("nc") * (F.col("nc") + 1) / F.lit(2.0)
    var_u = (
        F.col("nr")
        * F.col("nc")
        / F.lit(12.0)
        * ((F.col("n") + 1) - F.col("ties") / (F.col("n") * (F.col("n") - 1)))
    )
    return rsum.crossJoin(F.broadcast(tot)).select(
        F.round(u, 6).alias("u_stat"),
        F.round((u - F.col("nr") * F.col("nc") / F.lit(2.0)) / F.sqrt(var_u), 6).alias(
            "z_score"
        ),
        F.col("nr").cast("bigint").alias("n_ref"),
        F.col("nc").cast("bigint").alias("n_cur"),
        F.col("n_bins").alias("n_bins"),
    )


# ---------------------------------------------------------------------------
# Join cardinality estimation audit (System-R uniform-key estimate)
# ---------------------------------------------------------------------------


@register(
    "sketch_join_cardinality",
    family="sketch",
    doc="Optimizer-grade join cardinality estimation audit: for two "
    "equi-joins (orders⋈customer on custkey, lineitem⋈part on partkey) "
    "compute the classic System-R uniform-key estimate "
    "|L⋈R| ≈ |L|·|R| / max(d_L, d_R) from EXACT per-side distinct key "
    "counts, next to the actual join cardinality, and surface the "
    "relative error — the audit run before trusting a sketch-based "
    "estimator at scale (the HLL variant is `sketch_hll_mergeable`; "
    "this is its exact twin in the estimator role).  Per side one "
    "count-distinct aggregate; the actual counts are plain equi-join "
    "COUNT(*)s; everything else is arithmetic on 1-row frames "
    "(broadcast), output 2 labeled rows.",
    oracle="""
SELECT 'orders_customer' AS join_name,
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_left,
       CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_right,
       CAST((SELECT COUNT(DISTINCT o_custkey) FROM orders) AS BIGINT) AS d_left,
       CAST((SELECT COUNT(DISTINCT c_custkey) FROM customer) AS BIGINT) AS d_right,
       ROUND(CAST((SELECT COUNT(*) FROM orders) AS DOUBLE)
             * (SELECT COUNT(*) FROM customer)
             / GREATEST((SELECT COUNT(DISTINCT o_custkey) FROM orders),
                        (SELECT COUNT(DISTINCT c_custkey) FROM customer)),
             6) AS est_rows,
       CAST((SELECT COUNT(*) FROM orders o JOIN customer c
             ON o.o_custkey = c.c_custkey) AS BIGINT) AS actual_rows,
       ROUND((CAST((SELECT COUNT(*) FROM orders) AS DOUBLE)
              * (SELECT COUNT(*) FROM customer)
              / GREATEST((SELECT COUNT(DISTINCT o_custkey) FROM orders),
                         (SELECT COUNT(DISTINCT c_custkey) FROM customer))
              - (SELECT COUNT(*) FROM orders o JOIN customer c
                 ON o.o_custkey = c.c_custkey))
             / (SELECT COUNT(*) FROM orders o JOIN customer c
                ON o.o_custkey = c.c_custkey), 6) AS rel_err
UNION ALL
SELECT 'lineitem_part',
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
       CAST((SELECT COUNT(*) FROM part) AS BIGINT),
       CAST((SELECT COUNT(DISTINCT l_partkey) FROM lineitem) AS BIGINT),
       CAST((SELECT COUNT(DISTINCT p_partkey) FROM part) AS BIGINT),
       ROUND(CAST((SELECT COUNT(*) FROM lineitem) AS DOUBLE)
             * (SELECT COUNT(*) FROM part)
             / GREATEST((SELECT COUNT(DISTINCT l_partkey) FROM lineitem),
                        (SELECT COUNT(DISTINCT p_partkey) FROM part)),
             6),
       CAST((SELECT COUNT(*) FROM lineitem l JOIN part p
             ON l.l_partkey = p.p_partkey) AS BIGINT),
       ROUND((CAST((SELECT COUNT(*) FROM lineitem) AS DOUBLE)
              * (SELECT COUNT(*) FROM part)
              / GREATEST((SELECT COUNT(DISTINCT l_partkey) FROM lineitem),
                         (SELECT COUNT(DISTINCT p_partkey) FROM part))
              - (SELECT COUNT(*) FROM lineitem l JOIN part p
                 ON l.l_partkey = p.p_partkey))
             / (SELECT COUNT(*) FROM lineitem l JOIN part p
                ON l.l_partkey = p.p_partkey), 6)
""",
)
def sketch_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    def one(label: str, left: DataFrame, lk: str, right: DataFrame, rk: str) -> DataFrame:
        ls = left.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_left"),
            F.count_distinct(F.col(lk)).cast("bigint").alias("d_left"),
        )
        rs = right.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_right"),
            F.count_distinct(F.col(rk)).cast("bigint").alias("d_right"),
        )
        actual = (
            left.join(right, left[lk] == right[rk])
            .agg(F.count(F.lit(1)).cast("bigint").alias("actual_rows"))
        )
        est = (
            F.col("n_left").cast("double")
            * F.col("n_right")
            / F.greatest(F.col("d_left"), F.col("d_right"))
        )
        return (
            ls.crossJoin(F.broadcast(rs))
            .crossJoin(F.broadcast(actual))
            .select(
                F.lit(label).alias("join_name"),
                "n_left",
                "n_right",
                "d_left",
                "d_right",
                F.round(est, 6).alias("est_rows"),
                "actual_rows",
                F.round((est - F.col("actual_rows")) / F.col("actual_rows"), 6).alias(
                    "rel_err"
                ),
            )
        )

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    return one("orders_customer", o, "o_custkey", c, "c_custkey").unionAll(
        one("lineitem_part", li, "l_partkey", p, "p_partkey")
    )


# ---------------------------------------------------------------------------
# Inverted index construction (posting lists)
# ---------------------------------------------------------------------------

POSTINGS_CAP = 15
INDEX_TOP = 30


@register(
    "text_inverted_index",
    family="text",
    doc="Inverted-index construction — the retrieval-side data structure "
    "every BM25/keyword search engine builds from the corpus: distinct "
    "(term, doc_id) postings, per-term document frequency, and the "
    "posting list surfaced as the first 15 doc_ids in ascending order "
    "(comma-joined so both engines compare as one scalar).  Top 30 "
    "terms by (df DESC, term ASC) via orderBy().limit() — "
    "TakeOrderedAndProject, no global window.  Scale shape: one "
    "explode, df from a (term) hash aggregate, and the posting list "
    "capped BEFORE any collect — a term-partitioned row_number keeps "
    "the 15 smallest doc_ids per term (sort-based window, spills "
    "gracefully on stopword-sized terms) so no aggregation buffer ever "
    "holds an unbounded doc list; at 100 TB the same plan writes the "
    "full index partitioned by term-hash instead of limiting.",
    oracle=f"""
WITH td AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, UNNEST(string_split(trim(text), ' ')) AS term
    FROM documents
  )
),
g AS (
  SELECT term,
         CAST(COUNT(*) AS BIGINT) AS df,
         array_to_string(list_slice(list(doc_id ORDER BY doc_id),
                                    1, {POSTINGS_CAP}), ',') AS postings
  FROM td GROUP BY term
)
SELECT term, df, postings FROM g
ORDER BY df DESC, term ASC LIMIT {INDEX_TOP}
""",
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    td = d.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.trim(F.col("text")), " "))).alias("term")
    )
    df_counts = td.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    # cap BEFORE collecting: the term-partitioned window keeps the first
    # POSTINGS_CAP doc_ids, so the collect_list below aggregates at most
    # that many rows per term — bounded state even for stopword-sized terms
    w = Window.partitionBy("term").orderBy(F.col("doc_id").asc())
    capped = td.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= POSTINGS_CAP
    )
    postings = capped.groupBy("term").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")
            ),
        ).alias("postings")
    )
    g = df_counts.join(postings, "term")
    return g.orderBy(F.col("df").desc(), F.col("term").asc()).limit(INDEX_TOP)


# ---------------------------------------------------------------------------
# RefinedWeb-style duplicated-span (exact substring) detection
# ---------------------------------------------------------------------------

SPAN_N = 8


@register(
    "dedup_duplicate_spans",
    family="dedup",
    doc="Exact-substring duplication audit (the RefinedWeb/Lee et al. "
    "2022 'exact substring dedup' statistic re-expressed on word "
    "8-grams): a span is duplicated when its 8-gram also appears in at "
    "least one OTHER document; per source report documents scanned, "
    "total spans, duplicated spans, documents containing any "
    "duplicated span, and the duplicated-span fraction.  Scale shape: "
    "one explode to (doc_id, ngram), one (ngram) aggregate for the "
    "cross-document count, an ngram-keyed shuffle join back (both "
    "sides already partitioned by ngram — no broadcast assumption, the "
    "dup set grows with the corpus), then per-doc and per-source "
    "aggregates.  All counts exact integers.",
    oracle=f"""
WITH ng AS (
  SELECT doc_id, source,
         UNNEST(list_transform(
             range(1, len(string_split(trim(text), ' ')) - {SPAN_N - 2}),
             i -> array_to_string((string_split(trim(text), ' '))[i:i+{SPAN_N - 1}],
                                  ' '))) AS g
  FROM documents
),
dup AS (
  SELECT g FROM ng GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
),
flagged AS (
  SELECT n.doc_id, n.source,
         CASE WHEN d.g IS NOT NULL THEN 1 ELSE 0 END AS is_dup
  FROM ng n LEFT JOIN dup d ON n.g = d.g
),
per_doc AS (
  SELECT doc_id, source, COUNT(*) AS n_spans, SUM(is_dup) AS n_dup
  FROM flagged GROUP BY doc_id, source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_spans) AS BIGINT) AS n_spans,
       CAST(SUM(n_dup) AS BIGINT) AS n_dup_spans,
       CAST(SUM(CASE WHEN n_dup > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged_docs,
       ROUND(CAST(SUM(n_dup) AS DOUBLE) / SUM(n_spans), 6) AS dup_frac
FROM per_doc GROUP BY source
""",
)
def dedup_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    ng = d.select(
        "doc_id",
        "source",
        F.explode(T.word_ngrams(F.col("text"), SPAN_N)).alias("g"),
    )
    dup = (
        ng.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("g", F.lit(1).alias("dup_marker"))
    )
    flagged = ng.join(dup, "g", "left").select(
        "doc_id", "source", F.coalesce(F.col("dup_marker"), F.lit(0)).alias("is_dup")
    )
    per_doc = flagged.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_spans"), F.sum("is_dup").alias("n_dup")
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_spans").cast("bigint").alias("n_spans"),
        F.sum("n_dup").cast("bigint").alias("n_dup_spans"),
        F.sum(F.when(F.col("n_dup") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_flagged_docs"),
        F.round(F.sum("n_dup").cast("double") / F.sum("n_spans"), 6).alias("dup_frac"),
    )


# ---------------------------------------------------------------------------
# Triangle counting / global clustering coefficient
# ---------------------------------------------------------------------------

TRI_ORDER_CAP = 1000


@register(
    "graph_triangle_count",
    family="graph",
    doc="Triangle count and global clustering coefficient on the part "
    "co-purchase graph (parts sharing an order in lineitem, orderkeys "
    "< 1000 for the bounded demo tier — ~7.3k edges / ~9.2k triangles "
    "at sf0.01): edges are the distinct a<b part pairs per order, "
    "triangles come from the canonical ordered edge-edge-edge join "
    "(a<b<c, each triangle counted exactly once), wedges from "
    "Σ deg·(deg−1)/2, and the coefficient is 3·triangles/wedges.  "
    "Scale shape: the per-order pair expansion is bounded by orders' "
    "small basket size (≤7 items → ≤21 pairs); the triangle join "
    "shuffles the edge list twice on its join keys — the standard "
    "distributed algorithm (node-iterator via join); degree/wedge "
    "counts are one aggregate over edge endpoints.  All counts exact.",
    oracle=f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey < {TRI_ORDER_CAP}
),
e AS (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
tri AS (
  SELECT COUNT(*) AS n_tri
  FROM e x JOIN e y ON y.a = x.b JOIN e z ON z.a = x.a AND z.b = y.b
),
deg AS (
  SELECT v, COUNT(*) AS d FROM (
    SELECT a AS v FROM e UNION ALL SELECT b FROM e
  ) GROUP BY v
),
w AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges
  FROM deg
)
SELECT w.n_nodes,
       CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
       CAST(tri.n_tri AS BIGINT) AS n_triangles,
       w.n_wedges,
       ROUND(3.0 * tri.n_tri / w.n_wedges, 6) AS clustering_coeff
FROM w, tri
""",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < TRI_ORDER_CAP)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("b"))
    e = (
        a.join(b, (a["ok"] == b["ok"]) & (F.col("a") < F.col("b")))
        .select("a", "b")
        .distinct()
        .localCheckpoint()  # materialize once: reused 3× in the triangle join
    )
    ex = e.select(F.col("a").alias("xa"), F.col("b").alias("xb"))
    ey = e.select(F.col("a").alias("ya"), F.col("b").alias("yb"))
    ez = e.select(F.col("a").alias("za"), F.col("b").alias("zb"))
    tri = (
        ex.join(ey, F.col("ya") == F.col("xb"))
        .join(ez, (F.col("za") == F.col("xa")) & (F.col("zb") == F.col("yb")))
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    w = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint").alias("n_wedges"),
    )
    edges = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return (
        w.crossJoin(F.broadcast(edges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            F.col("n_tri").cast("bigint").alias("n_triangles"),
            "n_wedges",
            F.round(F.lit(3.0) * F.col("n_tri") / F.col("n_wedges"), 6).alias(
                "clustering_coeff"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Temperature-scaled corpus mixture weights
# ---------------------------------------------------------------------------

MIX_ALPHA_DOC = "sqrt"  # alpha = 0.5 — sqrt() on both engines, bit-identical


@register(
    "curation_mixture_weights",
    family="curation",
    doc="Temperature-scaled source mixture weights (the multilingual-"
    "sampling recipe from GPT-3/XLM-R: p_i ∝ n_i^α with α = 0.5, "
    "computed as sqrt so both engines share one intrinsic): per source "
    "token totals, the α-scaled sampling weight, the natural share "
    "n_i/Σn, and the boost factor weight/natural that shows how much "
    "the temperature flattens head sources and lifts tail ones.  Σw is "
    "a 20-term double sum, so each sqrt is rounded to 12 dp and "
    "DECIMAL-cast before summing (order-independent); one corpus scan, "
    "one 20-key aggregate, totals broadcast back.",
    oracle="""
WITH s AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(CAST(ROUND(sqrt(n_tokens), 12) AS DECIMAL(38,12)))
              AS DOUBLE) AS w_sum,
         CAST(SUM(n_tokens) AS DOUBLE) AS t_sum
  FROM s
)
SELECT source, n_docs, n_tokens,
       ROUND(sqrt(n_tokens) / tot.w_sum, 6) AS weight,
       ROUND(n_tokens / tot.t_sum, 6) AS nat_share,
       ROUND((sqrt(n_tokens) / tot.w_sum) / (n_tokens / tot.t_sum), 6) AS boost
FROM s, tot
""",
)
def curation_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split(F.trim(F.col("text")), " ")))
        .cast("bigint")
        .alias("n_tokens"),
    )
    tot = s.agg(
        F.sum(F.round(F.sqrt(F.col("n_tokens")), 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("w_sum"),
        F.sum("n_tokens").cast("double").alias("t_sum"),
    )
    weight = F.sqrt(F.col("n_tokens")) / F.col("w_sum")
    nat = F.col("n_tokens") / F.col("t_sum")
    return s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(weight, 6).alias("weight"),
        F.round(nat, 6).alias("nat_share"),
        F.round(weight / nat, 6).alias("boost"),
    )


# ---------------------------------------------------------------------------
# Windowed drift: PSI per day against the corpus-wide baseline
# ---------------------------------------------------------------------------


@register(
    "quality_psi_by_day",
    family="quality",
    doc="Windowed drift monitoring — the batch twin of streaming/drift.py "
    "run at daily grain: per-day event_type distribution vs the "
    "corpus-wide baseline, smoothed PSI per day (additive 0.5 on the "
    "full day×type grid so zero-count cells contribute finite terms — "
    "the grid is a cross join of two TINY distinct frames, then a left "
    "join back onto cell counts).  PSI terms are rounded to 12 dp and "
    "DECIMAL-cast before the ≤|types|-term per-day sum.  One corpus "
    "scan onto the bounded (day, type) domain; everything after is "
    "broadcast-sized.  Surfaces the drift gate: psi > 0.2 → drifted.",
    oracle="""
WITH cells AS (
  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
days AS (SELECT day, SUM(n) AS n_day FROM cells GROUP BY day),
types AS (SELECT event_type, SUM(n) AS n_type FROM cells GROUP BY event_type),
tot AS (
  SELECT CAST(SUM(n_type) AS DOUBLE) AS gn,
         CAST(COUNT(*) AS DOUBLE) AS t
  FROM types
),
grid AS (
  SELECT d.day, d.n_day, ty.event_type, ty.n_type, COALESCE(c.n, 0) AS n
  FROM days d CROSS JOIN types ty
  LEFT JOIN cells c ON c.day = d.day AND c.event_type = ty.event_type
),
terms AS (
  SELECT day, n_day,
         CAST(ROUND(((n + 0.5) / (n_day + 0.5 * tot.t)
                     - (n_type + 0.5) / (tot.gn + 0.5 * tot.t))
                    * LN(((n + 0.5) / (n_day + 0.5 * tot.t))
                         / ((n_type + 0.5) / (tot.gn + 0.5 * tot.t))), 12)
              AS DECIMAL(38,12)) AS term
  FROM grid, tot
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(n_day AS BIGINT) AS n_events,
       ROUND(CAST(SUM(term) AS DOUBLE), 6) AS psi,
       CASE WHEN CAST(SUM(term) AS DOUBLE) > 0.2 THEN 1 ELSE 0 END AS drifted
FROM terms GROUP BY day, n_day
""",
)
def quality_psi_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    cells = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    days = cells.groupBy("day").agg(F.sum("n").alias("n_day"))
    types = cells.groupBy("event_type").agg(F.sum("n").alias("n_type"))
    tot = types.agg(
        F.sum("n_type").cast("double").alias("gn"),
        F.count(F.lit(1)).cast("double").alias("t"),
    )
    grid = (
        days.crossJoin(F.broadcast(types))
        .join(F.broadcast(cells), ["day", "event_type"], "left")
        .select(
            "day",
            "n_day",
            "event_type",
            "n_type",
            F.coalesce("n", F.lit(0)).alias("n"),
        )
        .crossJoin(F.broadcast(tot))
    )
    p_d = (F.col("n") + 0.5) / (F.col("n_day") + 0.5 * F.col("t"))
    p_b = (F.col("n_type") + 0.5) / (F.col("gn") + 0.5 * F.col("t"))
    term = F.round((p_d - p_b) * F.log(p_d / p_b), 12).cast("decimal(38,12)")
    return (
        grid.select("day", "n_day", term.alias("term"))
        .groupBy("day", "n_day")
        .agg(F.sum("term").cast("double").alias("psi_raw"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n_day").cast("bigint").alias("n_events"),
            F.round("psi_raw", 6).alias("psi"),
            F.when(F.col("psi_raw") > 0.2, 1).otherwise(0).alias("drifted"),
        )
    )


# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive training pairs)
# ---------------------------------------------------------------------------


@register(
    "mine_hard_negatives",
    family="similarity",
    doc="Hard-negative mining for contrastive training (the DPR/sentence-"
    "transformers recipe): per probe vector (vec_id < 5), the top-3 "
    "most-cosine-similar corpus vectors with a DIFFERENT label — high-"
    "similarity cross-class neighbors are the negatives that actually "
    "teach the margin.  operators/similarity.py::hard_negative_topk: "
    "probes broadcast, norms hoisted out of the pair loop, ranking on "
    "the 6-dp rounded cosine with vec_id tie-break (engine-neutral), "
    "label filter in the join condition so same-class pairs never "
    "materialize.  The window partitions by probe id — bounded "
    "partition count, allowlisted shape.  Scale path: the LSH bucket "
    "join, exactly as knn_cosine_topk → ann_lsh.",
    oracle="""
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)
SELECT * FROM (
  SELECT q.vec_id AS query_id, q.label AS query_label,
         c.vec_id AS neighbor_id, c.label AS neighbor_label,
         ROUND(list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY ROUND(list_dot_product(q.v, c.v)
                 / (sqrt(list_dot_product(q.v, q.v))
                    * sqrt(list_dot_product(c.v, c.v))), 6) DESC,
                 c.vec_id ASC) AS rank
  FROM e q JOIN e c ON q.vec_id < 5 AND c.label != q.label
) WHERE rank <= 3
""",
)
def mine_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity as S

    e = table(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") < 5)
    return S.hard_negative_topk(probes, e, k=3)


# ---------------------------------------------------------------------------
# Candidate-key / uniqueness profiling
# ---------------------------------------------------------------------------


@register(
    "profile_key_candidates",
    family="profiling",
    doc="Candidate-key discovery audit — the schema-inference pass a "
    "warehouse loader runs before declaring primary keys (the query-"
    "side twin of the reference's FK bookkeeping, "
    "/root/reference/main_ingest.py:605-618): for each declared key "
    "expression (single-column keys plus lineitem's composite "
    "(l_orderkey, l_linenumber) via an engine-neutral string encoding) "
    "report row count, distinct count, uniqueness ratio, and the "
    "is-key verdict.  One count-distinct aggregate per table — six "
    "independent scans unioned into the 6-row report; at scale each is "
    "a single partial-aggregated pass.",
    oracle="""
SELECT 'orders' AS table_name, 'o_orderkey' AS key_expr,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       ROUND(CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) / COUNT(*), 6) AS unique_ratio,
       CASE WHEN COUNT(DISTINCT o_orderkey) = COUNT(*) THEN 1 ELSE 0 END AS is_key
FROM orders
UNION ALL
SELECT 'customer', 'c_custkey', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(DISTINCT c_custkey) AS BIGINT),
       ROUND(CAST(COUNT(DISTINCT c_custkey) AS DOUBLE) / COUNT(*), 6),
       CASE WHEN COUNT(DISTINCT c_custkey) = COUNT(*) THEN 1 ELSE 0 END
FROM customer
UNION ALL
SELECT 'part', 'p_partkey', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(DISTINCT p_partkey) AS BIGINT),
       ROUND(CAST(COUNT(DISTINCT p_partkey) AS DOUBLE) / COUNT(*), 6),
       CASE WHEN COUNT(DISTINCT p_partkey) = COUNT(*) THEN 1 ELSE 0 END
FROM part
UNION ALL
SELECT 'lineitem', 'l_orderkey||_||l_linenumber', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(DISTINCT CAST(l_orderkey AS VARCHAR) || '_'
                  || CAST(l_linenumber AS VARCHAR)) AS BIGINT),
       ROUND(CAST(COUNT(DISTINCT CAST(l_orderkey AS VARCHAR) || '_'
                  || CAST(l_linenumber AS VARCHAR)) AS DOUBLE) / COUNT(*), 6),
       CASE WHEN COUNT(DISTINCT CAST(l_orderkey AS VARCHAR) || '_'
                  || CAST(l_linenumber AS VARCHAR)) = COUNT(*) THEN 1 ELSE 0 END
FROM lineitem
UNION ALL
SELECT 'documents', 'doc_id', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(DISTINCT doc_id) AS BIGINT),
       ROUND(CAST(COUNT(DISTINCT doc_id) AS DOUBLE) / COUNT(*), 6),
       CASE WHEN COUNT(DISTINCT doc_id) = COUNT(*) THEN 1 ELSE 0 END
FROM documents
UNION ALL
SELECT 'events', 'event_id', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(DISTINCT event_id) AS BIGINT),
       ROUND(CAST(COUNT(DISTINCT event_id) AS DOUBLE) / COUNT(*), 6),
       CASE WHEN COUNT(DISTINCT event_id) = COUNT(*) THEN 1 ELSE 0 END
FROM events
""",
)
def profile_key_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    def audit(tbl: str, expr_label: str, key: F.Column, df: DataFrame) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count_distinct(key).cast("bigint").alias("n_distinct"),
        ).select(
            F.lit(tbl).alias("table_name"),
            F.lit(expr_label).alias("key_expr"),
            "n_rows",
            "n_distinct",
            F.round(F.col("n_distinct").cast("double") / F.col("n_rows"), 6).alias(
                "unique_ratio"
            ),
            F.when(F.col("n_distinct") == F.col("n_rows"), 1).otherwise(0).alias(
                "is_key"
            ),
        )

    li_key = F.concat_ws(
        "_",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    parts = [
        audit("orders", "o_orderkey", F.col("o_orderkey"), table(spark, sf_dir, "orders")),
        audit("customer", "c_custkey", F.col("c_custkey"), table(spark, sf_dir, "customer")),
        audit("part", "p_partkey", F.col("p_partkey"), table(spark, sf_dir, "part")),
        audit("lineitem", "l_orderkey||_||l_linenumber", li_key, table(spark, sf_dir, "lineitem")),
        audit("documents", "doc_id", F.col("doc_id"), table(spark, sf_dir, "documents")),
        audit("events", "event_id", F.col("event_id"), table(spark, sf_dir, "events")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ---------------------------------------------------------------------------
# CUSUM changepoint scan over the daily event series
# ---------------------------------------------------------------------------


@register(
    "events_changepoint_cusum",
    family="timeseries",
    doc="CUSUM changepoint statistic over the daily event-count series "
    "(Page 1954, the standard level-shift scan): per day the cumulative "
    "sum S_d = Σ_{d'≤d} (c_d' − μ) of deviations from the global daily "
    "mean — a changepoint shows as the extremum of |S|.  The corpus "
    "collapses to the bounded ~30-day domain in one aggregate; the "
    "cumulative sum is a broadcast triangular join over that domain (no "
    "unpartitioned window), and each deviation term is rounded to 12 dp "
    "and DECIMAL-cast before summing so the running sums are order-"
    "independent.  Output: day, count, CUSUM.",
    oracle="""
WITH days AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c FROM events GROUP BY 1
),
mu AS (SELECT CAST(SUM(c) AS DOUBLE) / COUNT(*) AS m FROM days),
cusum AS (
  SELECT a.day, a.c,
         CAST(SUM(CAST(ROUND(b.c - mu.m, 12) AS DECIMAL(38,12)))
              AS DOUBLE) AS s
  FROM days a JOIN days b ON b.day <= a.day CROSS JOIN mu
  GROUP BY a.day, a.c
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(c AS BIGINT) AS n_events,
       ROUND(s, 6) AS cusum
FROM cusum
""",
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    days = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    mu = days.agg((F.sum("c").cast("double") / F.count(F.lit(1))).alias("m"))
    b = days.select(F.col("day").alias("b_day"), F.col("c").alias("b_c"))
    return (
        days.join(F.broadcast(b), F.col("b_day") <= F.col("day"))
        .crossJoin(F.broadcast(mu))
        .groupBy("day", "c")
        .agg(
            F.sum(F.round(F.col("b_c") - F.col("m"), 12).cast("decimal(38,12)"))
            .cast("double")
            .alias("s")
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("c").cast("bigint").alias("n_events"),
            F.round("s", 6).alias("cusum"),
        )
    )


# ---------------------------------------------------------------------------
# Degree distribution + power-law tail slope of the co-purchase graph
# ---------------------------------------------------------------------------


@register(
    "graph_degree_distribution",
    family="graph",
    doc="Degree histogram of the part co-purchase graph (same bounded "
    "edge set as graph_triangle_count) with the log-log OLS slope over "
    "the histogram points — the power-law-tail diagnostic run before "
    "choosing skew strategies (a steep slope means broadcast-safe hubs; "
    "a flat one means salting).  Histogram counts are exact; the slope "
    "regression runs over the ≤60-row histogram with ln-terms rounded "
    "to 12 dp and DECIMAL-cast before their sums (order-independent), "
    "replicated onto every output row as the audit verdict.",
    oracle=f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey < {TRI_ORDER_CAP}
),
e AS (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT v, COUNT(*) AS d FROM (
    SELECT a AS v FROM e UNION ALL SELECT b FROM e
  ) GROUP BY v
),
hist AS (SELECT d AS degree, COUNT(*) AS n_nodes FROM deg GROUP BY d),
tot AS (SELECT CAST(SUM(n_nodes) AS DOUBLE) AS n FROM hist),
reg AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS m,
         CAST(SUM(CAST(ROUND(LN(degree), 12) AS DECIMAL(38,12))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ROUND(LN(n_nodes), 12) AS DECIMAL(38,12))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(LN(degree) * LN(n_nodes), 12) AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(ROUND(LN(degree) * LN(degree), 12) AS DECIMAL(38,12))) AS DOUBLE) AS sxx
  FROM hist
)
SELECT CAST(degree AS BIGINT) AS degree,
       CAST(n_nodes AS BIGINT) AS n_nodes,
       ROUND(n_nodes / tot.n, 6) AS frac,
       ROUND((reg.sxy - reg.sx * reg.sy / reg.m)
             / (reg.sxx - reg.sx * reg.sx / reg.m), 6) AS ll_slope
FROM hist, tot, reg
""",
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < TRI_ORDER_CAP)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("b"))
    e = (
        a.join(b, (F.col("ok") == F.col("ok2")) & (F.col("a") < F.col("b")))
        .select("a", "b")
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    hist = (
        deg.groupBy(F.col("d").alias("degree"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .localCheckpoint()  # ≤60-row frame reused by tot/reg/output — cuts
        # the edge-pipeline replay from 3× to 1×
    )
    tot = hist.agg(F.sum("n_nodes").cast("double").alias("n"))

    def _dec(col):
        return F.sum(F.round(col, 12).cast("decimal(38,12)")).cast("double")

    lx = F.log(F.col("degree"))
    ly = F.log(F.col("n_nodes"))
    reg = hist.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        _dec(lx).alias("sx"),
        _dec(ly).alias("sy"),
        _dec(lx * ly).alias("sxy"),
        _dec(lx * lx).alias("sxx"),
    )
    return (
        hist.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(reg))
        .select(
            F.col("degree").cast("bigint").alias("degree"),
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            F.round(F.col("n_nodes") / F.col("n"), 6).alias("frac"),
            F.round(
                (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("m"))
                / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("m")),
                6,
            ).alias("ll_slope"),
        )
    )


# ---------------------------------------------------------------------------
# Daily-series autocorrelation (lags 1..7)
# ---------------------------------------------------------------------------

ACF_MAX_LAG = 7


@register(
    "events_autocorrelation",
    family="timeseries",
    doc="Autocorrelation of the daily event-count series at lags 1..7 — "
    "the seasonality probe run before choosing rollup grains: "
    "r_k = Σ(c_d−μ)(c_{d−k}−μ) / Σ(c_d−μ)² with the mean and "
    "denominator over ALL days (the standard ACF estimator).  The "
    "corpus collapses to the ~30-day domain once; lag pairing is a "
    "datediff equi-join of that tiny frame against itself crossed with "
    "the 7-row lag spine (all broadcast); products are rounded to 12 dp "
    "and DECIMAL-cast before summing.  Output: lag, pair count, r_k.",
    oracle=f"""
WITH days AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c FROM events GROUP BY 1
),
mu AS (SELECT CAST(SUM(c) AS DOUBLE) / COUNT(*) AS m FROM days),
den AS (
  SELECT CAST(SUM(CAST(ROUND((c - mu.m) * (c - mu.m), 12)
                       AS DECIMAL(38,12))) AS DOUBLE) AS d2
  FROM days CROSS JOIN mu
),
lags AS (SELECT UNNEST(range(1, {ACF_MAX_LAG + 1})) AS k),
pairs AS (
  SELECT l.k,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(CAST(ROUND((a.c - mu.m) * (b.c - mu.m), 12)
                       AS DECIMAL(38,12))) AS DOUBLE) AS num
  FROM lags l
  JOIN days a ON TRUE
  JOIN days b ON date_diff('day', b.day, a.day) = l.k
  CROSS JOIN mu
  GROUP BY l.k
)
SELECT CAST(p.k AS INTEGER) AS lag,
       p.n_pairs AS n_pairs,
       ROUND(p.num / den.d2, 6) AS acf
FROM pairs p, den
""",
)
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    days = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    mu = days.agg((F.sum("c").cast("double") / F.count(F.lit(1))).alias("m"))
    den = days.crossJoin(F.broadcast(mu)).agg(
        F.sum(
            F.round((F.col("c") - F.col("m")) * (F.col("c") - F.col("m")), 12).cast(
                "decimal(38,12)"
            )
        )
        .cast("double")
        .alias("d2")
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").cast("int").alias("k"))
    b = days.select(F.col("day").alias("b_day"), F.col("c").alias("b_c"))
    pairs = (
        days.crossJoin(F.broadcast(lags))
        .join(F.broadcast(b), F.datediff(F.col("day"), F.col("b_day")) == F.col("k"))
        .crossJoin(F.broadcast(mu))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(
                F.round(
                    (F.col("c") - F.col("m")) * (F.col("b_c") - F.col("m")), 12
                ).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("num"),
        )
    )
    return pairs.crossJoin(F.broadcast(den)).select(
        F.col("k").cast("int").alias("lag"),
        "n_pairs",
        F.round(F.col("num") / F.col("d2"), 6).alias("acf"),
    )


# ---------------------------------------------------------------------------
# Centroid silhouette score per label
# ---------------------------------------------------------------------------

SIL_DIM = 64


@register(
    "embedding_silhouette",
    family="similarity",
    doc="Simplified (centroid-based) silhouette score per label — the "
    "cluster-quality audit for labeled embedding sets: a(i) = L2 "
    "distance to the own-label centroid, b(i) = min distance to any "
    "other label's centroid, s(i) = (b−a)/max(a,b), averaged per "
    "label.  Centroids come from one posexplode + (label, dim) "
    "aggregate with DECIMAL-staged sums (the operators/pca.py "
    "discipline), then ride as a broadcast 5-row frame against the "
    "corpus — one scan, 5 distance evaluations per vector, no window. "
    "Per-vector s terms are rounded to 12 dp and DECIMAL-cast before "
    "the per-label mean.",
    oracle=f"""
WITH emb AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
dims AS (SELECT UNNEST(range({SIL_DIM})) AS i),
pd AS (
  SELECT label, d.i,
         CAST(SUM(CAST(ROUND(v[d.i + 1], 12) AS DECIMAL(38,12))) AS DOUBLE)
           / COUNT(*) AS c
  FROM emb, dims d GROUP BY label, d.i
),
cents AS (SELECT label AS clabel, list(c ORDER BY i) AS cv FROM pd GROUP BY label),
dist AS (
  SELECT vec_id, label, clabel, sqrt(list_dot_product(dd, dd)) AS dist
  FROM (
    SELECT e.vec_id, e.label, c.clabel,
           list_transform(range({SIL_DIM}), j -> e.v[j + 1] - c.cv[j + 1]) AS dd
    FROM emb e CROSS JOIN cents c
  )
),
ab AS (
  SELECT vec_id, label,
         MIN(CASE WHEN label = clabel THEN dist END) AS a,
         MIN(CASE WHEN label != clabel THEN dist END) AS b
  FROM dist GROUP BY vec_id, label
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       ROUND(CAST(SUM(CAST(ROUND((b - a) / GREATEST(a, b), 12)
                           AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 6)
         AS mean_silhouette
FROM ab GROUP BY label
""",
)
def embedding_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import vectors as V

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", V.to_double_array(F.col("embedding")).alias("v")
    )
    pd = (
        e.select("label", F.posexplode("v").alias("i", "xi"))
        .groupBy("label", "i")
        .agg(
            F.sum(F.round(F.col("xi"), 12).cast("decimal(38,12)")).alias("sx"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("label", "i", (F.col("sx").cast("double") / F.col("n")).alias("c"))
    )
    cents = (
        pd.groupBy(F.col("label").alias("clabel"))
        .agg(F.array_sort(F.collect_list(F.struct("i", "c"))).alias("s"))
        .select("clabel", F.transform("s", lambda x: x["c"]).alias("cv"))
    )
    dd = F.zip_with(F.col("v"), F.col("cv"), lambda x, y: x - y)
    dist = e.crossJoin(F.broadcast(cents)).select(
        "vec_id", "label", "clabel", F.sqrt(V.dot(dd, dd)).alias("dist")
    )
    ab = dist.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("label") == F.col("clabel"), F.col("dist"))).alias("a"),
        F.min(F.when(F.col("label") != F.col("clabel"), F.col("dist"))).alias("b"),
    )
    s_term = F.round(
        (F.col("b") - F.col("a")) / F.greatest(F.col("a"), F.col("b")), 12
    ).cast("decimal(38,12)")
    return ab.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.round(F.sum(s_term).cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_silhouette"
        ),
    )


# ---------------------------------------------------------------------------
# Deterministic sketches: Count-Min heavy hitters, Bloom membership
# ---------------------------------------------------------------------------

CM_DEPTH, CM_WIDTH = 4, 64
BLOOM_K, BLOOM_M = 3, 8192
_M61 = (1 << 61) - 1


def _cm_oracle() -> str:
    return f"""
WITH keyed AS (
  SELECT CAST(user_id AS VARCHAR) AS k, COUNT(*) AS cnt
  FROM events GROUP BY user_id
),
hp AS (
  SELECT k, cnt,
         CAST(('0x' || substr(md5(k), 1, 15)) AS BIGINT) AS h1,
         CAST(('0x' || substr(md5(k), 17, 12)) AS BIGINT) AS h2
  FROM keyed
),
rows_ AS (SELECT UNNEST(range({CM_DEPTH})) AS i),
cells AS (
  SELECT i, (h1 + i * h2) % {_M61} % {CM_WIDTH} AS pos,
         CAST(SUM(cnt) AS BIGINT) AS total
  FROM hp, rows_ GROUP BY 1, 2
),
top5 AS (SELECT k, cnt, h1, h2 FROM hp ORDER BY cnt DESC, k ASC LIMIT 5),
probe AS (
  SELECT t.k, t.cnt, r.i, (t.h1 + r.i * t.h2) % {_M61} % {CM_WIDTH} AS pos
  FROM top5 t, rows_ r
)
SELECT p.k AS user_key,
       CAST(p.cnt AS BIGINT) AS exact_count,
       CAST(MIN(c.total) AS BIGINT) AS cm_estimate,
       CAST(MIN(c.total) - p.cnt AS BIGINT) AS overestimate
FROM probe p JOIN cells c ON c.i = p.i AND c.pos = p.pos
GROUP BY p.k, p.cnt
"""


@register(
    "sketch_countmin_heavy_hitters",
    family="sketch",
    doc="Count-Min sketch frequency estimation (Cormode-Muthukrishnan) "
    "with the md5 double-hash family (Kirsch-Mitzenmacher, same family "
    "as the MinHash operators) so every cell is SQL-replayable — a "
    "deterministic, fully hash-oracled sketch next to the rows-only "
    "HLL: a 4×64 cell table built from the exact per-user aggregate "
    "(the mergeable build — shard cell tables merge by addition), "
    "point-queried for the top-5 users; surfaces exact count, CM "
    "estimate, and the (always ≥0) overestimate.  operators/"
    "sketches.py.  Scale shape: one exact per-key aggregate, 4 rows "
    "per key into a 256-cell aggregate, probes join the broadcast cell "
    "table.",
    oracle=_cm_oracle(),
)
def sketch_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import sketches as SK

    ev = table(spark, sf_dir, "events")
    keyed = ev.groupBy(F.col("user_id").cast("string").alias("user_key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cells = SK.countmin_cells(keyed, "user_key", "cnt", CM_DEPTH, CM_WIDTH)
    top5 = keyed.orderBy(F.col("cnt").desc(), F.col("user_key").asc()).limit(5)
    est = SK.countmin_estimate(top5, cells, "user_key", CM_DEPTH, CM_WIDTH)
    return top5.join(est, "user_key").select(
        "user_key",
        F.col("cnt").cast("bigint").alias("exact_count"),
        "cm_estimate",
        (F.col("cm_estimate") - F.col("cnt")).cast("bigint").alias("overestimate"),
    )


def _bloom_oracle() -> str:
    return f"""
WITH keys AS (SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS k FROM customer),
kh AS (
  SELECT k,
         CAST(('0x' || substr(md5(k), 1, 15)) AS BIGINT) AS h1,
         CAST(('0x' || substr(md5(k), 17, 12)) AS BIGINT) AS h2
  FROM keys
),
ks AS (SELECT UNNEST(range({BLOOM_K})) AS i),
bits AS (
  SELECT DISTINCT (h1 + i * h2) % {_M61} % {BLOOM_M} AS pos FROM kh, ks
),
probes AS (SELECT DISTINCT CAST(p_partkey AS VARCHAR) AS pk FROM part),
ph AS (
  SELECT pk,
         CAST(('0x' || substr(md5(pk), 1, 15)) AS BIGINT) AS h1,
         CAST(('0x' || substr(md5(pk), 17, 12)) AS BIGINT) AS h2
  FROM probes
),
ppos AS (
  SELECT pk, (h1 + ks.i * h2) % {_M61} % {BLOOM_M} AS pos FROM ph, ks
),
claims AS (
  SELECT p.pk,
         CASE WHEN COUNT(b.pos) = {BLOOM_K} THEN 1 ELSE 0 END AS claimed
  FROM ppos p LEFT JOIN bits b ON b.pos = p.pos
  GROUP BY p.pk
),
truth AS (
  SELECT c.pk, c.claimed,
         CASE WHEN k.k IS NOT NULL THEN 1 ELSE 0 END AS member
  FROM claims c LEFT JOIN keys k ON k.k = c.pk
)
SELECT CAST({BLOOM_M} AS BIGINT) AS m_bits,
       CAST({BLOOM_K} AS BIGINT) AS k_hashes,
       CAST((SELECT COUNT(*) FROM keys) AS BIGINT) AS n_keys,
       CAST((SELECT COUNT(*) FROM bits) AS BIGINT) AS bits_set,
       CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(claimed) AS BIGINT) AS claimed_members,
       CAST(SUM(member) AS BIGINT) AS true_members,
       CAST(SUM(CASE WHEN claimed = 1 AND member = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS false_positives,
       CAST(SUM(CASE WHEN claimed = 0 AND member = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS false_negatives,
       ROUND(CAST(SUM(CASE WHEN claimed = 1 AND member = 0 THEN 1 ELSE 0 END)
                  AS DOUBLE)
             / NULLIF(SUM(CASE WHEN member = 0 THEN 1 ELSE 0 END), 0), 6)
         AS fp_rate
FROM truth
"""


@register(
    "sketch_bloom_membership",
    family="sketch",
    doc="Bloom-filter membership pre-filter audit (the runtime-filter "
    "pattern engines push into scans before expensive joins): an "
    "8192-bit / 3-hash filter over customer keys, represented as a "
    "DISTINCT bit-position TABLE (broadcastable by construction — the "
    "Spark-idiomatic distributed Bloom), probed with every part key; "
    "reports bits set, claimed vs true members, false positives/"
    "negatives (FN must be 0 — the Bloom guarantee, enforced by the "
    "hash gate) and the measured FP rate among true non-members.  Same "
    "md5 double-hash family as Count-Min/MinHash → fully SQL-"
    "replayable.  operators/sketches.py.",
    oracle=_bloom_oracle(),
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import sketches as SK

    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("k")
    ).distinct()
    probes = table(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("string").alias("pk")
    ).distinct()
    bits = SK.bloom_bits(cust, "k", BLOOM_K, BLOOM_M)
    claims = SK.bloom_claims(probes, bits, "pk", BLOOM_K, BLOOM_M)
    truth = claims.join(
        cust.withColumn("member_flag", F.lit(1)),
        claims["pk"] == cust["k"],
        "left",
    ).select("pk", "claimed", F.coalesce("member_flag", F.lit(0)).alias("member"))
    n_keys = cust.agg(F.count(F.lit(1)).cast("bigint").alias("n_keys"))
    bits_set = bits.agg(F.count(F.lit(1)).cast("bigint").alias("bits_set"))
    return (
        truth.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_probes"),
            F.sum("claimed").cast("bigint").alias("claimed_members"),
            F.sum("member").cast("bigint").alias("true_members"),
            F.sum(F.when((F.col("claimed") == 1) & (F.col("member") == 0), 1).otherwise(0))
            .cast("bigint")
            .alias("false_positives"),
            F.sum(F.when((F.col("claimed") == 0) & (F.col("member") == 1), 1).otherwise(0))
            .cast("bigint")
            .alias("false_negatives"),
            F.round(
                F.sum(
                    F.when((F.col("claimed") == 1) & (F.col("member") == 0), 1).otherwise(0)
                ).cast("double")
                / F.nullif(
                    F.sum(F.when(F.col("member") == 0, 1).otherwise(0)), F.lit(0)
                ),
                6,
            ).alias("fp_rate"),
        )
        .crossJoin(F.broadcast(n_keys))
        .crossJoin(F.broadcast(bits_set))
        .select(
            F.lit(BLOOM_M).cast("bigint").alias("m_bits"),
            F.lit(BLOOM_K).cast("bigint").alias("k_hashes"),
            "n_keys",
            "bits_set",
            "n_probes",
            "claimed_members",
            "true_members",
            "false_positives",
            "false_negatives",
            "fp_rate",
        )
    )


# ---------------------------------------------------------------------------
# Mergeable histogram quantiles (the distributed quantile scale path)
# ---------------------------------------------------------------------------

HQ_QS = (0.25, 0.5, 0.9, 0.99)


def _hist_quantile_oracle() -> str:
    spine = ", ".join(f"({q})" for q in HQ_QS)
    exact_cols = ", ".join(
        f"ROUND(CAST(quantile_cont(n_chars, {q}) AS DOUBLE), 6) AS e{int(q*100)}"
        for q in HQ_QS
    )
    exact_case = " ".join(
        f"WHEN q = {q} THEN e{int(q*100)}" for q in HQ_QS
    )
    return f"""
WITH counts AS (
  SELECT CAST(FLOOR(n_chars / {RS_BUCKET_W}) AS INTEGER) AS bucket,
         COUNT(*) AS n
  FROM documents GROUP BY 1
),
cum AS (
  SELECT a.bucket, a.n, SUM(b.n) AS c
  FROM counts a JOIN counts b ON b.bucket <= a.bucket
  GROUP BY a.bucket, a.n
),
tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS nn FROM counts),
spine AS (SELECT * FROM (VALUES {spine}) AS t(q)),
exact AS (SELECT {exact_cols} FROM documents),
pick AS (
  SELECT s.q,
         MIN(c.bucket) AS bucket
  FROM spine s, cum c, tot
  WHERE (c.c - c.n) < s.q * tot.nn AND s.q * tot.nn <= c.c
  GROUP BY s.q
)
SELECT p.q,
       ROUND(p.bucket * {RS_BUCKET_W}
             + {RS_BUCKET_W} * (p.q * tot.nn - (c.c - c.n)) / c.n, 6)
         AS hist_estimate,
       ROUND(CASE {exact_case} END, 6) AS exact_value,
       ROUND(ABS(p.bucket * {RS_BUCKET_W}
             + {RS_BUCKET_W} * (p.q * tot.nn - (c.c - c.n)) / c.n
             - (CASE {exact_case} END)), 6) AS abs_err
FROM pick p
JOIN cum c ON c.bucket = p.bucket, tot, exact
"""


@register(
    "agg_histogram_quantiles",
    family="agg",
    doc="Mergeable histogram quantiles — the 100 TB quantile path next to "
    "the exact percentile: fixed-width bucket counts (trivially "
    "mergeable across shards, like the Count-Min cells), cumulative "
    "counts via the bounded triangular join, linear interpolation "
    "inside the covering bucket, audited against the exact "
    "quantile_cont value with the absolute error surfaced per "
    "quantile.  One corpus scan for the histogram + one exact-"
    "percentile aggregate for the audit column; at scale the audit "
    "column is dropped and only the mergeable histogram runs.",
    oracle=_hist_quantile_oracle(),
)
def agg_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy(
        F.floor(F.col("n_chars") / RS_BUCKET_W).cast("int").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    b = counts.select(F.col("bucket").alias("b2"), F.col("n").alias("n2"))
    cum = (
        counts.join(F.broadcast(b), F.col("b2") <= F.col("bucket"))
        .groupBy("bucket", "n")
        .agg(F.sum("n2").alias("c"))
    )
    tot = counts.agg(F.sum("n").cast("double").alias("nn"))
    spine = spark.createDataFrame([(q,) for q in HQ_QS], ["q"])
    exact = d.agg(
        *[
            F.round(F.percentile("n_chars", q), 6).alias(f"e{int(q*100)}")
            for q in HQ_QS
        ]
    )
    r = F.col("q") * F.col("nn")
    pick = (
        spine.crossJoin(F.broadcast(cum))
        .crossJoin(F.broadcast(tot))
        .where(((F.col("c") - F.col("n")) < r) & (r <= F.col("c")))
        .groupBy("q")
        .agg(F.min("bucket").alias("bucket"))
    )
    exact_case = F.coalesce(
        *[
            F.when(F.col("q") == q, F.col(f"e{int(q*100)}"))
            for q in HQ_QS
        ]
    )
    est = (
        F.col("bucket") * RS_BUCKET_W
        + RS_BUCKET_W * (r - (F.col("c") - F.col("n"))) / F.col("n")
    )
    return (
        pick.join(F.broadcast(cum), "bucket")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(exact))
        .select(
            "q",
            F.round(est, 6).alias("hist_estimate"),
            F.round(exact_case, 6).alias("exact_value"),
            F.round(F.abs(est - exact_case), 6).alias("abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# Day-of-week seasonality decomposition
# ---------------------------------------------------------------------------


@register(
    "events_seasonality_dow",
    family="timeseries",
    doc="Day-of-week seasonal decomposition of the daily event series — "
    "the grain-selection diagnostic: per ISO weekday the mean daily "
    "count, plus Hyndman's seasonal strength 1 − Var(residual)/"
    "Var(series) (residual = day count minus its weekday mean) "
    "replicated as the audit verdict.  The corpus collapses to the "
    "bounded day domain once; weekday means broadcast back onto the "
    "day frame; both variances are DECIMAL-staged 30-term sums.  "
    "isodow = Spark weekday()+1 ≡ DuckDB isodow — probed identical.",
    oracle="""
WITH days AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c FROM events GROUP BY 1
),
dd AS (SELECT day, c, isodow(day) AS dow FROM days),
dowm AS (
  SELECT dow, COUNT(*) AS n_days,
         CAST(SUM(c) AS DOUBLE) / COUNT(*) AS m
  FROM dd GROUP BY dow
),
mu AS (SELECT CAST(SUM(c) AS DOUBLE) / COUNT(*) AS g FROM dd),
vt AS (
  SELECT CAST(SUM(CAST(ROUND((c - mu.g) * (c - mu.g), 12)
                       AS DECIMAL(38,12))) AS DOUBLE) AS v
  FROM dd, mu
),
vr AS (
  SELECT CAST(SUM(CAST(ROUND((dd.c - dowm.m) * (dd.c - dowm.m), 12)
                       AS DECIMAL(38,12))) AS DOUBLE) AS v
  FROM dd JOIN dowm USING (dow)
)
SELECT CAST(dowm.dow AS INTEGER) AS dow,
       CAST(dowm.n_days AS BIGINT) AS n_days,
       ROUND(dowm.m, 6) AS mean_count,
       ROUND(1.0 - vr.v / vt.v, 6) AS seasonal_strength
FROM dowm, vt, vr
""",
)
def events_seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    days = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    dd = days.select("day", "c", (F.weekday("day") + 1).alias("dow"))
    dowm = dd.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_days"),
        (F.sum("c").cast("double") / F.count(F.lit(1))).alias("m"),
    )
    mu = dd.agg((F.sum("c").cast("double") / F.count(F.lit(1))).alias("g"))

    def _varsum(col):
        return F.sum(F.round(col * col, 12).cast("decimal(38,12)")).cast("double")

    vt = dd.crossJoin(F.broadcast(mu)).agg(
        _varsum(F.col("c") - F.col("g")).alias("vt")
    )
    vr = dd.join(F.broadcast(dowm), "dow").agg(
        _varsum(F.col("c") - F.col("m")).alias("vr")
    )
    return (
        dowm.crossJoin(F.broadcast(vt))
        .crossJoin(F.broadcast(vr))
        .select(
            F.col("dow").cast("int").alias("dow"),
            F.col("n_days").cast("bigint").alias("n_days"),
            F.round("m", 6).alias("mean_count"),
            F.round(F.lit(1.0) - F.col("vr") / F.col("vt"), 6).alias(
                "seasonal_strength"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Label-propagation communities + modularity
# ---------------------------------------------------------------------------

LPA_ITERS = 4


def _lpa_oracle(iters: int = LPA_ITERS) -> str:
    blocks = [
        f"""li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey < {TRI_ORDER_CAP}
)""",
        """e AS (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)""",
        "sym AS (SELECT a AS src, b AS dst FROM e "
        "UNION ALL SELECT b, a FROM e)",
        "nodes AS (SELECT DISTINCT src AS node FROM sym)",
        "l0 AS (SELECT node, node AS lab FROM nodes)",
    ]
    for t in range(1, iters + 1):
        blocks += [
            f"c{t} AS (SELECT s.src AS node, l.lab, COUNT(*) AS c "
            f"FROM sym s JOIN l{t-1} l ON l.node = s.dst GROUP BY 1, 2)",
            f"p{t} AS (SELECT node, lab FROM ("
            f"SELECT node, lab, ROW_NUMBER() OVER (PARTITION BY node "
            f"ORDER BY c DESC, lab ASC) AS rn FROM c{t}) WHERE rn = 1)",
            f"l{t} AS (SELECT n.node, COALESCE(p.lab, n.lab) AS lab "
            f"FROM l{t-1} n LEFT JOIN p{t} p USING (node))",
        ]
    fin = f"l{iters}"
    blocks += [
        f"""internal AS (
  SELECT la.lab AS community, COUNT(*) AS internal_edges
  FROM e JOIN {fin} la ON la.node = e.a JOIN {fin} lb ON lb.node = e.b
  WHERE la.lab = lb.lab GROUP BY 1
)""",
        "deg AS (SELECT v, COUNT(*) AS d FROM (SELECT a AS v FROM e "
        "UNION ALL SELECT b FROM e) GROUP BY v)",
        f"""comm AS (
  SELECT l.lab AS community, COUNT(*) AS n_members,
         SUM(COALESCE(deg.d, 0)) AS d_sum
  FROM {fin} l LEFT JOIN deg ON deg.v = l.node GROUP BY 1
)""",
        "mm AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM e)",
        """fullc AS (
  SELECT c.community, c.n_members,
         COALESCE(i.internal_edges, 0) AS internal_edges, c.d_sum
  FROM comm c LEFT JOIN internal i USING (community)
)""",
        """qq AS (
  SELECT CAST(SUM(CAST(ROUND(internal_edges / mm.m
             - (d_sum / (2 * mm.m)) * (d_sum / (2 * mm.m)), 12)
             AS DECIMAL(38,12))) AS DOUBLE) AS q
  FROM fullc, mm
)""",
    ]
    return (
        "WITH " + ",\n".join(blocks) + """
SELECT CAST(community AS BIGINT) AS community,
       CAST(n_members AS BIGINT) AS n_members,
       CAST(internal_edges AS BIGINT) AS internal_edges,
       ROUND(qq.q, 6) AS modularity
FROM fullc, qq
"""
    )


@register(
    "graph_label_propagation",
    family="graph",
    doc="Deterministic synchronous label-propagation communities on the "
    "part co-purchase graph (operators/labelprop.py): 4 fixed rounds "
    "from labels = node ids, new label = argmax neighbor-label count "
    "with min-label tie-break expressed as one struct-max aggregate "
    "(no per-node window); per-community membership, internal edge "
    "count, and Newman modularity Q = Σ(e_c/m − (d_c/2m)²) with "
    "DECIMAL-staged terms.  The oracle replays every round as chained "
    "CTEs (the pagerank/PCA generated-oracle contract).  Per round one "
    "edge⋈label shuffle + one count aggregate — the PageRank round "
    "shape; label frame localCheckpointed per round.",
    oracle=_lpa_oracle(),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import labelprop as LP

    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < TRI_ORDER_CAP)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("b"))
    e = (
        a.join(b, (F.col("ok") == F.col("ok2")) & (F.col("a") < F.col("b")))
        .select("a", "b")
        .distinct()
        .localCheckpoint()
    )
    sym = e.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        e.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    labels = LP.propagate_labels(sym, iters=LPA_ITERS)
    return LP.community_stats(e, labels)
