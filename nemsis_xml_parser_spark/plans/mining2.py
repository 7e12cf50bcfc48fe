"""Corpus-mining tier 3 (SURVEY §2.I extension, round 5, batch 3).

* ``er_golden_record`` — full entity-resolution pipeline: FastSS
  deletion-key fuzzy blocking (operators/fuzzy.py) → connected
  components (operators/components.py) → per-cluster golden-record
  election (canonical id, max-balance, majority segment) — the
  compose-the-operators query an MDM/customer-360 pass runs;
* ``text_bpe_merge_candidates`` — the first iteration of BPE tokenizer
  training: frequency-weighted adjacent-character-pair counts over the
  word vocabulary, top merge candidates — the corpus-sized step of
  tokenizer induction (the rest is a driver-side loop over a shrinking
  pair table);
* ``quality_perplexity_buckets`` — CCNet-style head/middle/tail corpus
  partitioning by unigram-LM cross-entropy with fixed thresholds;
* ``graph_hits_bipartite`` — Kleinberg HITS hubs/authorities on the
  customer→part purchase graph (operators/hits.py), decimal-staged and
  fully unrolled in the oracle like PageRank.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import register, table

# ---------------------------------------------------------------------------
# Entity resolution: fuzzy blocking -> components -> golden record
# ---------------------------------------------------------------------------

ER_KEY_CAP = 400  # same bounded demo tier as join_fuzzy_name_match


@register(
    "er_golden_record",
    family="join",
    doc="Entity-resolution golden record: customer-name pairs within "
    "edit distance 1 (FastSS deletion-key blocking, operators/"
    "fuzzy.py), additionally blocked on equal nationkey (the classic "
    "block-on-exact + fuzzy-on-name ER recipe — and, on this corpus, "
    "the guard against full chain collapse: sequential TPC-H names "
    "are pairwise distance 1, so unblocked transitive closure merges "
    "EVERYTHING into one cluster), become edges; connected components "
    "(operators/components.py) merge transitive matches, and each "
    "cluster elects its golden record — canonical (min) custkey, max "
    "account balance, majority market segment with (count DESC, "
    "segment ASC) tie-break.  Singletons remain their own golden "
    "record.  Scale shape: blocking joins on deletion keys (no O(n²) "
    "levenshtein), components is the pointer-jumping operator, "
    "election is one (cluster) aggregate + a cluster-partitioned "
    "majority window.",
    oracle=f"""
WITH RECURSIVE base AS (
  SELECT c_custkey AS id, c_name AS name, c_nationkey, c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey < {ER_KEY_CAP}
),
keys AS (
  SELECT id, name,
         UNNEST(list_prepend(name,
                list_transform(range(1, len(name) + 1),
                               i -> substr(name, 1, i - 1) || substr(name, i + 1)))) AS key
  FROM base
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.name AS name_a, b.name AS name_b
  FROM keys a JOIN keys b ON a.key = b.key AND a.id < b.id
),
pairs AS (
  SELECT id_a, id_b FROM cand
  JOIN base ba ON ba.id = cand.id_a
  JOIN base bb ON bb.id = cand.id_b
  WHERE levenshtein(name_a, name_b) <= 1
    AND ba.c_nationkey = bb.c_nationkey
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
reach(node, lbl) AS (
  SELECT id, id FROM base
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node AS id, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
joined AS (
  SELECT comp.cluster_id, b.id, b.c_acctbal, b.c_mktsegment
  FROM comp JOIN base b USING (id)
),
segcnt AS (
  SELECT cluster_id, c_mktsegment, COUNT(*) AS cnt
  FROM joined GROUP BY 1, 2
),
segpick AS (
  SELECT cluster_id, c_mktsegment AS golden_segment FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id
                                 ORDER BY cnt DESC, c_mktsegment ASC) AS rn
    FROM segcnt
  ) WHERE rn = 1
),
agg AS (
  SELECT cluster_id,
         CAST(COUNT(*) AS BIGINT) AS n_members,
         CAST(MIN(id) AS BIGINT) AS canonical_custkey,
         MAX(c_acctbal) AS golden_acctbal
  FROM joined GROUP BY cluster_id
)
SELECT CAST(a.cluster_id AS BIGINT) AS cluster_id, n_members,
       canonical_custkey, golden_acctbal, golden_segment
FROM agg a JOIN segpick USING (cluster_id)
""",
)
def er_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import dedup_clusters
    from ..operators.fuzzy import fuzzy_pairs

    c = table(spark, sf_dir, "customer").where(F.col("c_custkey") < ER_KEY_CAP)
    name_pairs = fuzzy_pairs(c, id_col="c_custkey", text_col="c_name", max_dist=1)
    nk = c.select(F.col("c_custkey").alias("_k"), F.col("c_nationkey").alias("_n"))
    pairs = (
        name_pairs.join(
            nk.select(F.col("_k").alias("id_a"), F.col("_n").alias("nk_a")), "id_a"
        )
        .join(
            nk.select(F.col("_k").alias("id_b"), F.col("_n").alias("nk_b")), "id_b"
        )
        .where(F.col("nk_a") == F.col("nk_b"))
    )
    clusters = dedup_clusters(
        pairs.select("id_a", "id_b"),
        nodes=c.select(F.col("c_custkey").alias("doc_id")),
        src="id_a",
        dst="id_b",
    ).select(F.col("doc_id").alias("id"), "cluster_id")
    joined = clusters.join(
        c.select(
            F.col("c_custkey").alias("id"), "c_acctbal", "c_mktsegment"
        ),
        "id",
    )
    segcnt = joined.groupBy("cluster_id", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    segpick = (
        segcnt.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("cluster_id").orderBy(
                    F.col("cnt").desc(), F.col("c_mktsegment").asc()
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select("cluster_id", F.col("c_mktsegment").alias("golden_segment"))
    )
    agg = joined.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.min("id").cast("bigint").alias("canonical_custkey"),
        F.max("c_acctbal").alias("golden_acctbal"),
    )
    return agg.join(segpick, "cluster_id").select(
        F.col("cluster_id").cast("bigint").alias("cluster_id"),
        "n_members",
        "canonical_custkey",
        "golden_acctbal",
        "golden_segment",
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training: first merge iteration
# ---------------------------------------------------------------------------

BPE_TOP = 20


@register(
    "text_bpe_merge_candidates",
    family="text",
    doc="BPE tokenizer training, iteration 1: the word vocabulary with "
    "frequencies (one corpus aggregate), every adjacent character "
    "pair inside each word weighted by word frequency, and the top-20 "
    "merge candidates by total count — exactly the statistic "
    "sentencepiece/BPE computes per merge round; the corpus-sized "
    "work is this pair count, the merge loop itself is driver-side "
    "over the shrinking vocab table.  Scale shape: one (word) hash "
    "aggregate collapses the corpus, the pair expansion runs over the "
    "VOCABULARY (bounded by distinct words, not corpus tokens); "
    "top-20 via orderBy().limit().",
    oracle=f"""
WITH w AS (
  SELECT term AS w FROM (
    SELECT UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS term
    FROM documents
  ) WHERE term <> ''
),
wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM w GROUP BY w),
pr AS (
  SELECT w, cnt,
         UNNEST(list_transform(range(1, len(w)), i -> substr(w, i, 2))) AS pair
  FROM wc WHERE len(w) >= 2
)
SELECT pair,
       CAST(SUM(cnt) AS BIGINT) AS merge_count,
       CAST(COUNT(DISTINCT w) AS BIGINT) AS n_words
FROM pr GROUP BY pair
ORDER BY merge_count DESC, pair ASC LIMIT {BPE_TOP}
""",
)
def text_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as T

    d = table(spark, sf_dir, "documents")
    w = d.select(F.explode(T.tokens(F.lower(F.col("text")))).alias("w"))
    wc = w.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    pr = wc.where(F.length("w") >= 2).select(
        "w",
        "cnt",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.substr(F.col("w"), i, F.lit(2)),
            )
        ).alias("pair"),
    )
    return (
        pr.groupBy("pair")
        .agg(
            F.sum("cnt").cast("bigint").alias("merge_count"),
            F.count_distinct("w").cast("bigint").alias("n_words"),
        )
        .orderBy(F.col("merge_count").desc(), F.col("pair").asc())
        .limit(BPE_TOP)
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing
# ---------------------------------------------------------------------------

PPL_HEAD = 3.40  # cross-entropy (nats/token) cutoffs, probed so all three
PPL_MID = 3.42  # buckets are non-empty across sf0.001-0.1


@register(
    "quality_perplexity_buckets",
    family="quality",
    doc="CCNet-style corpus partitioning: per-document unigram-LM "
    "cross-entropy H = -Σ ln p(term) / n_tokens (corpus MLE unigram "
    "probabilities), rounded to 6 dp BEFORE bucketing so both engines "
    "compare identical doubles, then split head (< 3.40) / middle "
    "(< 3.42) / tail — low-H 'head' documents read like the corpus "
    "average, high-H 'tail' is boilerplate/noise, the split CCNet "
    "feeds different training mixes from.  Scale shape: one (term) "
    "aggregate for the LM, a term-keyed join + (doc) aggregate for H "
    "(LM table NOT assumed broadcastable), one bounded (bucket) "
    "aggregate; the corpus token-total rides a broadcast cross join.",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS term
    FROM documents
  ) WHERE term <> ''
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok),
p AS (
  SELECT term, CAST(COUNT(*) AS DOUBLE) / n AS p
  FROM tok CROSS JOIN tot GROUP BY term, n
),
h AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         ROUND(-SUM(LN(p.p)) / COUNT(*), 6) AS hh
  FROM tok JOIN p USING (term) GROUP BY doc_id
),
b AS (
  SELECT CASE WHEN hh < {PPL_HEAD} THEN 'head'
              WHEN hh < {PPL_MID} THEN 'middle'
              ELSE 'tail' END AS bucket,
         n_tokens, hh
  FROM h
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 6) AS avg_tokens,
       ROUND(SUM(hh) / COUNT(*), 6) AS avg_h,
       MIN(hh) AS min_h, MAX(hh) AS max_h
FROM b GROUP BY bucket ORDER BY bucket
""",
)
def quality_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as T

    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(T.tokens(F.lower(F.col("text")))).alias("term")
    )
    tot = tok.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    p = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .crossJoin(F.broadcast(tot))
        .select("term", (F.col("c").cast("double") / F.col("n")).alias("p"))
    )
    h = (
        tok.join(p, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(-F.sum(F.log("p")) / F.count(F.lit(1)), 6).alias("hh"),
        )
    )
    b = h.select(
        F.when(F.col("hh") < PPL_HEAD, "head")
        .when(F.col("hh") < PPL_MID, "middle")
        .otherwise("tail")
        .alias("bucket"),
        "n_tokens",
        "hh",
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(
                F.sum("n_tokens").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_tokens"),
            F.round(F.sum("hh") / F.count(F.lit(1)), 6).alias("avg_h"),
            F.min("hh").alias("min_h"),
            F.max("hh").alias("max_h"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# HITS hubs/authorities on the purchase graph
# ---------------------------------------------------------------------------

HITS_ORDER_CAP = 2000
HITS_TOP = 20


def _hits_iter_sql(i: int, prev_hub: str) -> str:
    return f"""a{i}r AS MATERIALIZED (
  SELECT dst, SUM(CAST(ROUND(h.hub, 12) AS DECIMAL(20,12))) AS raw
  FROM e JOIN {prev_hub} h USING (src) GROUP BY dst
),
a{i} AS MATERIALIZED (
  SELECT dst, ROUND(CAST(raw AS DOUBLE)
               / CAST((SELECT SUM(raw) FROM a{i}r) AS DOUBLE), 12) AS auth
  FROM a{i}r
),
h{i}r AS MATERIALIZED (
  SELECT src, SUM(CAST(ROUND(a.auth, 12) AS DECIMAL(20,12))) AS raw
  FROM e JOIN a{i} a USING (dst) GROUP BY src
),
h{i} AS MATERIALIZED (
  SELECT src, ROUND(CAST(raw AS DOUBLE)
               / CAST((SELECT SUM(raw) FROM h{i}r) AS DOUBLE), 12) AS hub
  FROM h{i}r
)"""


def _hits_oracle(iters: int = 2) -> str:
    parts = [
        f"""WITH e AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS src, l_partkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_orderkey < {HITS_ORDER_CAP}
),
h0 AS MATERIALIZED (
  SELECT DISTINCT src, CAST(1.0 AS DOUBLE) AS hub FROM e
)"""
    ]
    for i in range(1, iters + 1):
        parts.append(_hits_iter_sql(i, f"h{i - 1}"))
    parts.append(
        """deg AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS in_degree
       FROM e GROUP BY dst)"""
    )
    final = f"""
SELECT a.dst AS part_id, deg.in_degree, ROUND(a.auth, 6) AS authority
FROM a{iters} a JOIN deg USING (dst)
ORDER BY authority DESC, part_id ASC LIMIT {HITS_TOP}
"""
    return ",\n".join(parts) + final


@register(
    "graph_hits_bipartite",
    family="graph",
    doc="Kleinberg HITS on the bipartite customer→part purchase graph "
    "(operators/hits.py, 2 unrolled iterations): authority(part) "
    "accumulates hub mass of its buyers, hub(customer) accumulates "
    "authority of what they buy, L1-normalized per half-step — top "
    "authorities are the parts heavy multi-part buyers converge on.  "
    "Deterministic end-to-end with the PageRank decimal-staging "
    "trick: per-edge contributions ROUND(·,12)→DECIMAL(20,12) before "
    "exact sums, normalization re-rounded to 12; the oracle replays "
    "every half-iteration as chained MATERIALIZED CTEs.  Scale shape: "
    "per half-iteration one key-grouped aggregate + broadcast 1-row "
    "L1 total; top-20 via orderBy().limit().",
    oracle=_hits_oracle(),
)
def graph_hits_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.hits import hits

    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") < HITS_ORDER_CAP
    )
    l = table(spark, sf_dir, "lineitem")
    e = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .select(
            F.col("o_custkey").alias("src"), F.col("l_partkey").alias("dst")
        )
        .distinct()
        .localCheckpoint()
    )
    auth, _hubs = hits(e, iters=2)
    deg = e.groupBy("dst").agg(
        F.count(F.lit(1)).cast("bigint").alias("in_degree")
    )
    return (
        auth.join(deg, "dst")
        .select(
            F.col("dst").alias("part_id"),
            "in_degree",
            F.round(F.col("auth"), 6).alias("authority"),
        )
        .orderBy(F.col("authority").desc(), F.col("part_id").asc())
        .limit(HITS_TOP)
    )
