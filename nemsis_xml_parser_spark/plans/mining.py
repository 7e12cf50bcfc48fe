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
    "explode + one (term) hash aggregate; posting lists are capped so "
    "no aggregate state is unbounded, and at 100 TB the same plan "
    "writes the full index partitioned by term-hash instead of "
    "limiting.",
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
    d = table(spark, sf_dir, "documents")
    td = d.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.trim(F.col("text")), " "))).alias("term")
    )
    g = td.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.concat_ws(
            ",",
            F.transform(
                F.slice(F.sort_array(F.collect_set("doc_id")), 1, POSTINGS_CAP),
                lambda x: x.cast("string"),
            ),
        ).alias("postings"),
    )
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
