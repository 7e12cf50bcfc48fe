"""Round-7 additions: the UNCAPPED dedup ladder — the single composed
query a 100 TB curation pipeline actually runs (VERDICT r6 next-round
#5): MinHash+LSH candidates over the FULL documents table → exact
Jaccard verification → connected components → PageRank survivor
election, one oracled flagship.

Registered after round6b so the rotation fronts it as a never-recorded
query.  Oracle discipline per plans/registry.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import register, table

_M61 = (1 << 61) - 1


def _ladder_oracle(num_hashes: int = 16, bands: int = 16) -> str:
    """Generated oracle replaying the WHOLE ladder in SQL: the MinHash
    signature/banding/verification pipeline of
    llm_ops._minhash_lsh_oracle (uncapped), then min-label transitive
    closure as a recursive CTE, then 3 unrolled PageRank iterations and
    the per-cluster election — the same SQL text the capped
    dedup_survivor_election oracle uses, with the LSH candidate edges
    swapped in for the bounded jaccard tier."""
    sig_cols = ", ".join(
        f"MIN((h1 + {k} * h2) % {_M61}) AS s{k}" for k in range(num_hashes)
    )
    band_structs = ", ".join(
        "{'band_idx': %d, 'band_hash': md5(CAST(s%d AS VARCHAR))}" % (b, b)
        for b in range(bands)
    )
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
    return f"""
WITH RECURSIVE docs AS (SELECT doc_id, text FROM documents),
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
  FROM sig, UNNEST([{band_structs}]) AS u(b)
),
candidates AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
common AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM candidates c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
),
pairs AS (SELECT doc_a, doc_b FROM common),
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


@register(
    "dedup_ladder_full",
    family="dedup",
    doc="THE flagship dedup composition, uncapped: MinHash(16) + "
    "LSH(16 one-row bands) candidate generation over the ENTIRE "
    "documents table (operators/dedup.py::minhash_lsh_pairs — band-"
    "bucket equi-join, never an all-pairs product), exact-Jaccard "
    "verification of every candidate, min-label connected components "
    "with pointer jumping (operators/components.py), and PageRank "
    "survivor election per cluster.  This is the end-to-end query a "
    "100 TB curation run executes; every stage is bucketed/broadcast "
    "shaped — corpus text shuffles once into shingles, candidate "
    "traffic is band-key bounded, CC state is (node, label) pairs, "
    "election is one struct-max per cluster.  The capped "
    "dedup_survivor_election remains as the bounded-tier demonstrator; "
    "this query removes the doc_id<120 cap and swaps the quadratic "
    "jaccard tier for the LSH candidate set.  Oracle is GENERATED: "
    "signatures, banding, verification, a recursive-CTE transitive "
    "closure, 3 unrolled PageRank iterations and the election window, "
    "bit-for-bit.",
    oracle=_ladder_oracle(),
)
def dedup_ladder_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as D
    from ..operators.components import elect_survivors
    from ..operators.lsh_planner import plan_minhash_lsh

    # same operating point as dedup_minhash_lsh_candidates: catch >=95%
    # of J>=0.3 pairs within a 16-hash budget -> 16 one-row bands,
    # verify-everything posture (threshold 0 exact-verifies every
    # candidate; the synthetic corpus has no planted near-dups, so the
    # candidate graph itself is the non-trivial structure under test)
    plan = plan_minhash_lsh(0.3, num_hashes=16, fn_budget=0.05)
    d = table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(
        d, num_hashes=plan.num_hashes, bands=plan.bands, n=3, threshold=0.0
    )
    return elect_survivors(
        pairs.select("doc_a", "doc_b"), nodes=d.select("doc_id")
    )


# ---------------------------------------------------------------------------
# Strongly connected components (directed) — FW-BW min-label peeling
# ---------------------------------------------------------------------------

SCC_ORDER_CAP = 1200  # fixed-size demo subgraph (AA_ORDER_CAP convention)

_SCC_EDGES_SQL = f"""
li AS (
  SELECT l_orderkey, l_partkey, MIN(l_linenumber) AS ln
  FROM lineitem WHERE l_orderkey < {SCC_ORDER_CAP} GROUP BY 1, 2
),
seq AS (
  SELECT l_orderkey, l_partkey,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY ln, l_partkey) AS rn,
         COUNT(*) OVER (PARTITION BY l_orderkey) AS sz
  FROM li
),
edges AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM seq a JOIN seq b ON a.l_orderkey = b.l_orderkey
   AND b.rn = CASE WHEN a.rn = a.sz AND a.l_orderkey % 3 = 0
              THEN 1 ELSE a.rn + 1 END
  WHERE a.l_partkey <> b.l_partkey
),
e AS (SELECT DISTINCT src, dst FROM edges)
"""


@register(
    "graph_scc_peeling",
    family="graph",
    doc="Strongly connected components of a DIRECTED graph "
    "(operators/scc.py): forward/backward min-label peeling — per "
    "round, a min-ancestor fixpoint (with pointer jumping, sound "
    "because ancestor-of-ancestor is an ancestor), the same fixpoint "
    "on reversed edges, and the SCC-atomic resolution fwd==bwd (both "
    "labels are constant across an SCC, so components never split "
    "across rounds).  State stays (node, label) — no reachability "
    "PAIRS ever materialize, which is what separates this from a "
    "transitive-closure SCC at 100 TB.  Graph: part-succession chains "
    "per order (sorted by line number) with every third order closing "
    "its cycle — overlapping cycles + DAG tails, 226 SCCs incl. a "
    "giant component at the demo cap.  The ORACLE is the quadratic "
    "tier: recursive-CTE closure + mutual-reach minimum — equality "
    "proves the label algebra computes true SCCs.  Output: one row "
    "per SCC (scc_id = min member, scc_size).",
    oracle=f"""
WITH RECURSIVE {_SCC_EDGES_SQL},
reach(src, dst) AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.src, e.dst FROM reach r JOIN e ON e.src = r.dst
),
nodes AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
mutual AS (
  SELECT a.src AS u, a.dst AS v
  FROM reach a JOIN reach b ON a.src = b.dst AND a.dst = b.src
),
scc AS (
  SELECT n.v AS node, LEAST(n.v, COALESCE(MIN(m.v), n.v)) AS scc_id
  FROM nodes n LEFT JOIN mutual m ON m.u = n.v
  GROUP BY n.v
)
SELECT CAST(scc_id AS BIGINT) AS scc_id,
       CAST(COUNT(*) AS BIGINT) AS scc_size
FROM scc GROUP BY scc_id
""",
)
def graph_scc_peeling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scc import strongly_connected_components

    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < SCC_ORDER_CAP)
        .groupBy("l_orderkey", "l_partkey")
        .agg(F.min("l_linenumber").alias("ln"))
    )
    w = Window.partitionBy("l_orderkey").orderBy("ln", "l_partkey")
    seq = li.select(
        "l_orderkey",
        "l_partkey",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("l_orderkey")).alias("sz"),
    )
    a, b = seq.alias("a"), seq.alias("b")
    wrap = (F.col("a.rn") == F.col("a.sz")) & (F.col("a.l_orderkey") % 3 == 0)
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (
                F.col("b.rn")
                == F.when(wrap, F.lit(1)).otherwise(F.col("a.rn") + 1)
            ),
        )
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
    )
    scc = strongly_connected_components(edges)
    return scc.groupBy(F.col("scc").alias("scc_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("scc_size")
    )


# ---------------------------------------------------------------------------
# Lloyd's k-means — fixed iterations, generated CTE-replay oracle
# ---------------------------------------------------------------------------

KM_K = 4
KM_ITERS = 3
KM_DIM = 64


def _kmeans_oracle(k: int = KM_K, iters: int = KM_ITERS, dim: int = KM_DIM) -> str:
    """Replay every Lloyd iteration as CTEs: assignment = round-6 argmin
    of DECIMAL-summed round-12 per-dim squared terms (ties by centroid
    index), update = round-12 DECIMAL-sum means — identical arithmetic
    to operators/kmeans.py at every step."""
    d2 = (
        f"ROUND(CAST(list_sum(list_transform(range({dim}), i -> "
        "CAST(ROUND((e.x[i+1] - c.cv[i+1]) * (e.x[i+1] - c.cv[i+1]), 12) "
        "AS DECIMAL(38,12)))) AS DOUBLE), 6)"
    )
    blocks = [
        "emb AS (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(x AS DOUBLE)) AS x FROM embeddings)",
        f"c0 AS MATERIALIZED (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 "
        f"AS c, x AS cv FROM emb WHERE vec_id IN "
        f"(SELECT vec_id FROM emb ORDER BY vec_id LIMIT {k}))",
    ]
    for t in range(1, iters + 1):
        blocks += [
            f"s{t} AS (SELECT e.vec_id, c.c, {d2} AS d2 "
            f"FROM emb e CROSS JOIN c{t - 1} c)",
            f"a{t} AS MATERIALIZED (SELECT vec_id, c, d2 FROM ("
            "SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id "
            "ORDER BY d2 ASC, c ASC) AS rn "
            f"FROM s{t}) WHERE rn = 1)",
            f"c{t} AS MATERIALIZED (SELECT c, list(m ORDER BY i) AS cv FROM ("
            "SELECT a.c, t.i, ROUND(CAST(SUM(CAST(ROUND(e.x[t.i+1], 12) "
            "AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 12) AS m "
            f"FROM a{t} a JOIN emb e USING (vec_id), "
            f"UNNEST(range({dim})) AS t(i) "
            "GROUP BY a.c, t.i) GROUP BY c)",
        ]
    return (
        "WITH "
        + ",\n".join(blocks)
        + f"""
SELECT a.c AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       ROUND(CAST(SUM(CAST(a.d2 AS DECIMAL(28,6))) AS DOUBLE), 6) AS inertia,
       ROUND(sqrt(CAST(MIN(cn.nrm2) AS DOUBLE)), 6) AS centroid_norm
FROM a{iters} a
JOIN (SELECT c, CAST(list_sum(list_transform(range({dim}), i ->
        CAST(ROUND(cv[i+1] * cv[i+1], 12) AS DECIMAL(38,12))))
      AS DOUBLE) AS nrm2 FROM c{iters}) cn ON cn.c = a.c
GROUP BY a.c
"""
    )


@register(
    "cluster_kmeans_lloyd",
    family="similarity",
    doc="Lloyd's k-means (operators/kmeans.py, k=4, 3 fixed iterations, "
    "seeded by the k smallest vec_ids): per iteration one corpus scan "
    "against BROADCAST k×d centroids (per-vector round-6 argmin of "
    "DECIMAL-summed round-12 per-dim squared terms, ties by centroid "
    "index) and one (cluster, dim)-keyed hash aggregate for the "
    "DECIMAL-mean update — map-side combine caps shuffle traffic at "
    "k·d per partition, independent of corpus size; the centroid "
    "state is broadcast-sized like the IVF coarse quantizer it would "
    "seed.  The generated oracle replays all three assignment/update "
    "rounds as MATERIALIZED CTEs, bit-for-bit.  Output per cluster: "
    "member count, inertia (sum of assigned round-6 d2), centroid "
    "L2 norm.",
    oracle=_kmeans_oracle(),
)
def cluster_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.kmeans import lloyd_kmeans

    e = table(spark, sf_dir, "embeddings")
    assigned, cents = lloyd_kmeans(
        e, vec_col="embedding", id_col="vec_id", k=KM_K, iters=KM_ITERS
    )
    norms = cents.select(
        "c",
        F.aggregate(
            F.transform(
                "cv", lambda v: F.round(v * v, 12).cast("decimal(38,12)")
            ),
            F.lit(0).cast("decimal(38,12)"),
            lambda acc, v: (acc + v).cast("decimal(38,12)"),
        )
        .cast("double")
        .alias("nrm2"),
    )
    return (
        assigned.groupBy(F.col("c").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.round(
                F.sum(F.col("d2").cast("decimal(28,6)")).cast("double"), 6
            ).alias("inertia"),
        )
        .join(
            F.broadcast(norms.withColumnRenamed("c", "cluster_id")),
            "cluster_id",
        )
        .select(
            "cluster_id",
            "n_members",
            "inertia",
            F.round(F.sqrt(F.col("nrm2")), 6).alias("centroid_norm"),
        )
    )


# ---------------------------------------------------------------------------
# Zipf rank-frequency slope per language
# ---------------------------------------------------------------------------

ZIPF_TOP = 50


@register(
    "text_zipf_slope",
    family="text",
    doc="Zipf's-law rank-frequency fit per language: term frequencies "
    "(one (lang, term) hash aggregate over the corpus), rank by "
    "(freq DESC, term ASC) inside each language (window partitioned "
    "by lang over the VOCABULARY, never corpus rows), top-50 points, "
    "then the closed-form least-squares slope/intercept of ln(freq) "
    "on ln(rank) — the standard corpus-health diagnostic (natural "
    "text sits near slope -1; templated or deduplicated corpora "
    "flatten).  Moment discipline: ln terms rounded to 12 and summed "
    "as DECIMAL(20,12) (order-independent), one identical double "
    "expression on both engines, surfaced at 6 dp.",
    oracle=f"""
WITH w AS (
  SELECT lang, term FROM (
    SELECT lang, UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS term
    FROM documents
  ) WHERE term <> ''
),
tf AS (SELECT lang, term, COUNT(*) AS freq FROM w GROUP BY lang, term),
rk AS (
  SELECT lang, freq,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY freq DESC, term ASC) AS rn
  FROM tf
),
pts AS (
  SELECT lang,
         ROUND(LN(CAST(rn AS DOUBLE)), 12) AS lx,
         ROUND(LN(CAST(freq AS DOUBLE)), 12) AS ly
  FROM rk WHERE rn <= {ZIPF_TOP}
),
mo AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(lx AS DECIMAL(20,12))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ly AS DECIMAL(20,12))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(lx * ly, 12) AS DECIMAL(20,12))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(ROUND(lx * lx, 12) AS DECIMAL(20,12))) AS DOUBLE) AS sxx
  FROM pts GROUP BY lang
)
SELECT lang, n AS n_terms,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       ROUND((sy * sxx - sx * sxy) / (n * sxx - sx * sx), 6) AS zipf_intercept
FROM mo
""",
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as T

    d = table(spark, sf_dir, "documents")
    w = d.select(
        "lang", F.explode(T.tokens(F.lower(F.col("text")))).alias("term")
    )
    tf = w.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("freq"))
    rk = Window.partitionBy("lang").orderBy(
        F.col("freq").desc(), F.col("term").asc()
    )
    pts = (
        tf.withColumn("rn", F.row_number().over(rk))
        .where(F.col("rn") <= ZIPF_TOP)
        .select(
            "lang",
            F.round(F.log(F.col("rn").cast("double")), 12).alias("lx"),
            F.round(F.log(F.col("freq").cast("double")), 12).alias("ly"),
        )
    )
    dec = lambda c: c.cast("decimal(20,12)")  # noqa: E731
    n = F.count(F.lit(1))
    sx = F.sum(dec(F.col("lx"))).cast("double")
    sy = F.sum(dec(F.col("ly"))).cast("double")
    sxy = F.sum(dec(F.round(F.col("lx") * F.col("ly"), 12))).cast("double")
    sxx = F.sum(dec(F.round(F.col("lx") * F.col("lx"), 12))).cast("double")
    den = n * sxx - sx * sx
    return pts.groupBy("lang").agg(
        n.cast("bigint").alias("n_terms"),
        F.round((n * sxy - sx * sy) / den, 6).alias("zipf_slope"),
        F.round((sy * sxx - sx * sxy) / den, 6).alias("zipf_intercept"),
    )


# ---------------------------------------------------------------------------
# MJPEG scene-cut detection — real decode, closed-form oracle
# ---------------------------------------------------------------------------


@register(
    "multimodal_video_scene_cuts",
    family="multimodal",
    doc="Shot-boundary detection over the REAL video decode path "
    "(operators/video.py::video_scene_cuts): every frame of each "
    "RIFF/AVI MJPEG blob decodes through the real baseline-JPEG codec, "
    "consecutive frames are compared by exact integer sum-of-absolute-"
    "pixel-differences, and a pair is a cut when its mean abs diff "
    "exceeds 7 (integer comparison sum > 7*w*h — no float means).  The "
    "constant-block fixture advances every block by +7 mod 256 per "
    "frame, so a pair cuts exactly when at least one block value wraps "
    "past 255 — giving the lossy pipeline a closed-form oracle over "
    "container walk, Huffman decode, IDCT, differencing and threshold "
    "alike.  Blobs never leave the executor batch; cross-video state "
    "is zero.",
    oracle="""
WITH spec AS (
  SELECT doc_id, 8 * (doc_id % 3 + 1) AS w, 8 * (doc_id % 2 + 1) AS h,
         doc_id % 5 + 2 AS n
  FROM documents
),
pairdiff AS (
  SELECT doc_id, w, h, n, fs.f,
         SUM(ABS(((doc_id * 11 + 7 * (fs.f + 1) + 13 * bxs.bx + 29 * bys.by) % 256)
                 - ((doc_id * 11 + 7 * fs.f + 13 * bxs.bx + 29 * bys.by) % 256)) * 64) AS pair_abs
  FROM spec,
       UNNEST(range(0, n - 1)) AS fs(f),
       UNNEST(range(0, w // 8)) AS bxs(bx),
       UNNEST(range(0, h // 8)) AS bys(by)
  GROUP BY doc_id, w, h, n, fs.f
)
SELECT doc_id AS video_id,
       CAST(MIN(n) AS BIGINT) AS n_frames,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN pair_abs > 7 * w * h THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
       CAST(MIN(CASE WHEN pair_abs > 7 * w * h THEN f END) AS BIGINT) AS first_cut_pair,
       CAST(SUM(pair_abs) AS BIGINT) AS motion_total
FROM pairdiff
GROUP BY doc_id
""",
)
def multimodal_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.video import synthesize_mjpeg_media, video_scene_cuts

    d = table(spark, sf_dir, "documents")
    return video_scene_cuts(
        synthesize_mjpeg_media(d.select("doc_id")), mean_abs_threshold=7
    ).select(
        "video_id", "n_frames", "n_pairs", "n_cuts",
        "first_cut_pair", "motion_total",
    )


# ---------------------------------------------------------------------------
# Hodges-Lehmann robust location estimator
# ---------------------------------------------------------------------------

HL_USER_CAP = 120  # bounded pairwise tier (the Walsh-average set is O(n²))


@register(
    "agg_hodges_lehmann",
    family="agg",
    doc="Hodges-Lehmann robust location estimator per event type: the "
    "median of all Walsh averages (x_i + x_j)/2, i <= j — the location "
    "estimate dual to the Wilcoxon signed-rank test, ~95% efficient at "
    "the normal yet 29%-breakdown robust (the estimator quality "
    "pipelines prefer over the mean for heavy-tailed metrics).  "
    "Pairwise tier is BOUNDED (user_id < 120 sample, documented like "
    "dedup's jaccard tier — the full-corpus path is the O(n log n) "
    "quantile-of-convolution approximation); the median is the exact "
    "lower-median over the pair set via one ranking window per type "
    "(pair count is group-bounded, never corpus-global).  Values are "
    "DECIMAL(12,2)-cast before pairing so both engines average "
    "identical exact inputs.",
    oracle=f"""
WITH v AS (
  SELECT event_type, CAST(value AS DECIMAL(12,2)) AS x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rid
  FROM events WHERE user_id < {HL_USER_CAP} AND value IS NOT NULL
),
walsh AS (
  SELECT a.event_type,
         CAST(a.x AS DOUBLE) / 2 + CAST(b.x AS DOUBLE) / 2 AS wavg
  FROM v a JOIN v b
    ON a.event_type = b.event_type AND a.rid <= b.rid
),
rk AS (
  SELECT event_type, wavg,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY wavg) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM walsh
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_pairs,
       ROUND(MIN(CASE WHEN rn = (n + 1) // 2 THEN wavg END), 6) AS hodges_lehmann
FROM rk GROUP BY event_type
""",
)
def agg_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        table(spark, sf_dir, "events")
        .where((F.col("user_id") < HL_USER_CAP) & F.col("value").isNotNull())
        .select(
            "event_type",
            F.col("value").cast("decimal(12,2)").alias("x"),
            "event_id",
        )
    )
    rid = Window.partitionBy("event_type").orderBy("x", "event_id")
    v = e.select(
        "event_type", "x", F.row_number().over(rid).alias("rid")
    )
    a, b = v.alias("a"), v.alias("b")
    walsh = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.rid") <= F.col("b.rid")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            F.col("a.x").cast("double") / 2 + F.col("b.x").cast("double") / 2
        ).alias("wavg"),
    )
    wrk = Window.partitionBy("event_type").orderBy("wavg")
    wcnt = Window.partitionBy("event_type")
    rk = walsh.select(
        "event_type",
        "wavg",
        F.row_number().over(wrk).alias("rn"),
        F.count(F.lit(1)).over(wcnt).alias("n"),
    )
    return rk.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_pairs"),
        F.round(
            F.min(
                F.when(
                    F.col("rn") == F.floor((F.col("n") + 1) / 2), F.col("wavg")
                )
            ),
            6,
        ).alias("hodges_lehmann"),
    )


# ---------------------------------------------------------------------------
# Local clustering coefficient per node
# ---------------------------------------------------------------------------

LCC_ORDER_CAP = 1000


@register(
    "graph_local_clustering",
    family="graph",
    doc="Per-node LOCAL clustering coefficient on the part co-purchase "
    "graph (the node-level refinement of graph_triangle_count's global "
    "census): degree from the symmetrized adjacency, triangles through "
    "each node via the wedge (two-hop) equi-join semi-matched against "
    "the edge set — the standard distributed triangle shape, candidate "
    "volume bounded by Σ deg² (wedges), never all pairs — and "
    "lcc = 2T / (d(d-1)) for d ≥ 2.  The closure-vs-degree profile "
    "separates clustered communities from hub spokes, the first graph "
    "health check a feature pipeline runs.  Output ordered nodes with "
    "d ≥ 2: degree, triangle count, coefficient at 6 dp.",
    oracle=f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey < {LCC_ORDER_CAP}
),
e AS (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
adj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT u, COUNT(*) AS d FROM adj GROUP BY u),
wedge AS (
  SELECT x.u AS z, x.v AS pa, y.v AS pb
  FROM adj x JOIN adj y ON x.u = y.u AND x.v < y.v
),
tri AS (
  SELECT w.z, COUNT(*) AS t
  FROM wedge w JOIN e ON e.a = w.pa AND e.b = w.pb
  GROUP BY w.z
)
SELECT d.u AS node,
       CAST(d.d AS BIGINT) AS degree,
       CAST(COALESCE(t.t, 0) AS BIGINT) AS triangles,
       ROUND(2.0 * COALESCE(t.t, 0) / (d.d * (d.d - 1)), 6) AS lcc
FROM deg d LEFT JOIN tri t ON t.z = d.u
WHERE d.d >= 2
""",
)
def graph_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < LCC_ORDER_CAP)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("b"))
    e = (
        a.join(b, (a["ok"] == b["ok"]) & (F.col("a") < F.col("b")))
        .select("a", "b")
        .distinct()
        .localCheckpoint()  # reused: adjacency (x2) + triangle probe
    )
    adj = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    x = adj.select(F.col("u").alias("z"), F.col("v").alias("pa"))
    y = adj.select(F.col("u").alias("z"), F.col("v").alias("pb"))
    wedge = x.join(y, "z").where(F.col("pa") < F.col("pb"))
    tri = (
        wedge.join(
            e, (wedge["pa"] == e["a"]) & (wedge["pb"] == e["b"]), "left_semi"
        )
        .groupBy("z")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    )
    return (
        deg.where(F.col("d") >= 2)
        .join(tri, deg["u"] == tri["z"], "left")
        .select(
            F.col("u").alias("node"),
            F.col("d").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0)).cast("bigint").alias("triangles"),
            F.round(
                F.lit(2.0)
                * F.coalesce(F.col("t"), F.lit(0))
                / (F.col("d") * (F.col("d") - 1)),
                6,
            ).alias("lcc"),
        )
    )


# ---------------------------------------------------------------------------
# Rolling median filter over the daily series
# ---------------------------------------------------------------------------


@register(
    "window_median_filter",
    family="window",
    doc="Rolling MEDIAN filter (k=5, centered) over the daily event-count "
    "series — the robust smoother (impulse noise immune, unlike the "
    "moving average) used to despike monitoring series before "
    "changepoint/trend passes.  The frame is gathered per day with "
    "collect_list over a ±2 ROWS window on the per-DAY aggregate "
    "(window input = calendar days, partitioned output of one "
    "hash-agg — never raw events), sorted in-expression, and the exact "
    "lower-median of the available frame (shorter at the series edges) "
    "is surfaced.  Oracle: the same frame via self-join banding on day "
    "index.",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS y
  FROM events GROUP BY 1
),
idx AS (
  SELECT d, y, ROW_NUMBER() OVER (ORDER BY d) AS i FROM daily
),
frame AS (
  SELECT a.d, a.y, b.y AS fy
  FROM idx a JOIN idx b ON b.i BETWEEN a.i - 2 AND a.i + 2
),
med AS (
  SELECT d, y, fy,
         ROW_NUMBER() OVER (PARTITION BY d ORDER BY fy) AS rn,
         COUNT(*) OVER (PARTITION BY d) AS n
  FROM frame
)
SELECT CAST(d AS VARCHAR) AS day,
       CAST(MIN(y) AS BIGINT) AS n_events,
       CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN fy END) AS BIGINT)
         AS median_filtered
FROM med GROUP BY d
""",
)
def window_median_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    # ±2-rows frame over the per-day series: collect the 5-window, sort
    # in-expression, take the exact lower median.  The unpartitioned
    # window rides on the per-DAY aggregate (calendar-bounded input,
    # the events_cumulative_users argument).
    w = Window.orderBy("d").rowsBetween(-2, 2)
    frame = daily.withColumn("fr", F.array_sort(F.collect_list("y").over(w)))
    return frame.select(
        F.col("d").cast("string").alias("day"),
        F.col("y").cast("bigint").alias("n_events"),
        F.col("fr")[
            ((F.size("fr") + 1) / F.lit(2)).cast("int") - 1
        ].cast("bigint").alias("median_filtered"),
    )


# ---------------------------------------------------------------------------
# Dedup pipeline evaluation: LSH candidate recall/precision vs exact tier
# ---------------------------------------------------------------------------

EVAL_DOC_CAP = 120
EVAL_J = 0.02


@register(
    "quality_dedup_recall",
    family="quality",
    doc="Evaluation harness for the dedup ladder itself: on the bounded "
    "tier, the exact shingle-Jaccard pairs at J >= 0.02 are ground "
    "truth, the MinHash(16)+LSH(16x1) candidate set is the prediction, "
    "and the query surfaces the confusion counts + precision/recall "
    "the curation team watches when tuning bands x rows (the "
    "operating-point check behind operators/lsh_planner.py).  Both "
    "sides reuse the registered pipelines' exact arithmetic "
    "(md5-derived hash family, banded signatures), so this measures "
    "the REAL recall of the production candidate generator, not a "
    "simulation.  At full scale the truth tier is infeasible — that "
    "is the point of measuring on the bounded sample.",
    oracle=f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < {EVAL_DOC_CAP}),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           UNNEST(list_transform(range(1, len(string_split(trim(text), ' ')) - 1),
                  i -> array_to_string((string_split(trim(text), ' '))[i:i+2], ' '))) AS shingle
    FROM docs)
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
truth AS (
  SELECT doc_a, doc_b FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) >= {EVAL_J}
),
hp AS (SELECT doc_id,
         CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h1,
         CAST(('0x' || substr(md5(shingle), 17, 12)) AS BIGINT) AS h2
       FROM sh),
sig AS (SELECT doc_id, {", ".join(f"MIN((h1 + {k} * h2) % {(1 << 61) - 1}) AS s{k}" for k in range(16))} FROM hp GROUP BY doc_id),
banded AS (
  SELECT doc_id, u.b.band_idx AS band_idx, u.b.band_hash AS band_hash
  FROM sig, UNNEST([{", ".join("{'band_idx': %d, 'band_hash': md5(CAST(s%d AS VARCHAR))}" % (b, b) for b in range(16))}]) AS u(b)
),
pred AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
tp AS (SELECT COUNT(*) AS c FROM truth t JOIN pred p USING (doc_a, doc_b)),
fn AS (SELECT COUNT(*) AS c FROM truth t ANTI JOIN pred p USING (doc_a, doc_b)),
fp AS (SELECT COUNT(*) AS c FROM pred p ANTI JOIN truth t USING (doc_a, doc_b))
SELECT CAST(tp.c AS BIGINT) AS true_positives,
       CAST(fp.c AS BIGINT) AS false_positives,
       CAST(fn.c AS BIGINT) AS false_negatives,
       ROUND(CAST(tp.c AS DOUBLE) / NULLIF(tp.c + fp.c, 0), 6) AS precision,
       ROUND(CAST(tp.c AS DOUBLE) / NULLIF(tp.c + fn.c, 0), 6) AS recall
FROM tp, fn, fp
""",
)
def quality_dedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as D

    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < EVAL_DOC_CAP)
    truth = D.ngram_jaccard_pairs(d, n=3, threshold=EVAL_J).select(
        "doc_a", "doc_b"
    )
    pred = D.minhash_lsh_pairs(
        d, num_hashes=16, bands=16, n=3, threshold=0.0, candidates_only=True
    ).select("doc_a", "doc_b")
    keys = ["doc_a", "doc_b"]
    truth = truth.localCheckpoint()  # consumed by all three confusion legs
    pred = pred.localCheckpoint()
    tp = truth.join(pred, keys, "left_semi").agg(
        F.count(F.lit(1)).cast("bigint").alias("tp")
    )
    fn = truth.join(pred, keys, "left_anti").agg(
        F.count(F.lit(1)).cast("bigint").alias("fn")
    )
    fp = pred.join(truth, keys, "left_anti").agg(
        F.count(F.lit(1)).cast("bigint").alias("fp")
    )
    return (
        tp.crossJoin(fn)
        .crossJoin(fp)
        .select(
            F.col("tp").alias("true_positives"),
            F.col("fp").alias("false_positives"),
            F.col("fn").alias("false_negatives"),
            F.round(
                F.col("tp").cast("double")
                / F.nullif(F.col("tp") + F.col("fp"), F.lit(0)),
                6,
            ).alias("precision"),
            F.round(
                F.col("tp").cast("double")
                / F.nullif(F.col("tp") + F.col("fn"), F.lit(0)),
                6,
            ).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# BMP RLE8 decode — lossless run-length codec, closed-form oracle
# ---------------------------------------------------------------------------


@register(
    "multimodal_bmp_pixel_stats",
    family="multimodal",
    doc="REAL BMP RLE8 decode with stdlib struct + numpy "
    "(operators/bmp.py): header walk, bottom-up row order, encoded "
    "runs, ABSOLUTE literal blocks with their 16-bit alignment pads, "
    "EOL/EOB markers — the classic Windows run-length scheme, closing "
    "another codec next to PNG/JPEG/GIF/MJPEG.  The fixture's run "
    "lengths cycle 1/2/3 with the id so the corpus exercises run mode, "
    "absolute mode and the padding path together; pixels are "
    "closed-form (id*3 + 5y + x//(1+id%3)) mod 251, so the oracle "
    "reproduces every decoded sample without touching a byte — any "
    "drift in row direction, run chunking, alignment or marker "
    "handling breaks the hash.  Blobs stay inside the Arrow batch.",
    oracle="""
WITH dims AS (
  SELECT doc_id, 4 * (doc_id % 4 + 2) AS w, doc_id % 3 + 2 AS h,
         1 + doc_id % 3 AS rl
  FROM documents
),
px AS (
  SELECT doc_id, w, h,
         (doc_id * 3 + 5 * ys.y + xs.x // rl) % 251 AS v
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
def multimodal_bmp_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import bmp_pixel_stats, synthesize_bmp_media

    d = table(spark, sf_dir, "documents")
    return bmp_pixel_stats(synthesize_bmp_media(d.select("doc_id")))


# ---------------------------------------------------------------------------
# Audio dominant-frequency (real DFT over real PCM decode)
# ---------------------------------------------------------------------------


@register(
    "multimodal_audio_dft_peak",
    family="multimodal",
    doc="Dominant-frequency detection over the REAL audio path "
    "(operators/multimodal.py::wav_dft_peak): RIFF chunk walk, int16 "
    "LE PCM decode, channel deinterleave, then a REAL DFT (numpy "
    "rfft) and the spectral argmax over non-DC bins — the carrier/"
    "pitch detector an audio curation pass runs before filtering.  "
    "The fixture corpus is bin-ALIGNED pure tones (exactly k = "
    "id%31+1 cycles in the 256-sample window, int16 quantization "
    "noise five orders of magnitude under the line), so the argmax "
    "is closed-form k and only integer-safe quantities surface "
    "(bin, n, bin*rate/n) — the oracle never touches FFT/libm "
    "rounding.  Blobs stay inside the Arrow batch.",
    oracle="""
SELECT doc_id AS audio_id,
       CAST(256 AS BIGINT) AS n_samples,
       CAST(doc_id % 31 + 1 AS INT) AS peak_bin,
       CAST(doc_id % 31 + 1 AS DOUBLE) * 8000 / 256 AS peak_freq_hz
FROM documents
""",
)
def multimodal_audio_dft_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import synthesize_tone_media, wav_dft_peak

    d = table(spark, sf_dir, "documents")
    return wav_dft_peak(synthesize_tone_media(d.select("doc_id")))


# ---------------------------------------------------------------------------
# SimHash banded near-pairs with exact Hamming verification
# ---------------------------------------------------------------------------

SIMHASH_MAX_HAMMING = 3


@register(
    "dedup_simhash_band_pairs",
    family="dedup",
    doc="SimHash near-dup PAIRS — the candidate-generation stage "
    "dedup_simhash_fingerprints feeds: each 32-bit fingerprint splits "
    "into 4 disjoint 8-bit bands, and by pigeonhole any pair within "
    "Hamming distance 3 shares at least one band, so the equi-join on "
    "(band_idx, band_value) is a LOSSLESS candidate filter for the "
    "d<=3 ball (the Manku/Jain/Sarma WWW'07 web-dedup construction).  "
    "Candidates verify by exact bit_count(XOR) <= 3.  Scale shape "
    "mirrors MinHash-LSH: banded signature relation shuffles on the "
    "band key, never the corpus text; verification touches candidate "
    "pairs only.  Oracle replays fingerprints, banding, pigeonhole "
    "join and popcount verify in SQL.",
    oracle="""
WITH t AS (
  SELECT doc_id,
         list_transform(list_filter(string_split_regex(trim(text), '\\s+'), x -> x != ''),
                        s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS hs
  FROM documents
),
sh AS (
  SELECT doc_id, """ + "\n + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> {b}) & 1 = 1"
        f" THEN 1 ELSE -1 END)) > 0 THEN CAST({1 << b} AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END)"
        for b in range(32)
    ) + """ AS simhash
  FROM t
),
banded AS (
  SELECT doc_id, b.i AS band_idx,
         (simhash >> (b.i * 8)) & 255 AS band_value, simhash
  FROM sh, UNNEST(range(4)) AS b(i)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sa, b.simhash AS sb
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_value = b.band_value
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(sa, sb)) <= """ + str(SIMHASH_MAX_HAMMING) + """
""",
)
def dedup_simhash_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as D

    d = table(spark, sf_dir, "documents")
    sh = D.simhash_fingerprints(d).select("doc_id", "simhash")
    banded = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.expr(
                "transform(sequence(0, 3), "
                "i -> shiftright(simhash, i * 8) & 255)"
            )
        ).alias("band_idx", "band_value"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_value") == F.col("b.band_value"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return cand.where(ham <= SIMHASH_MAX_HAMMING).select(
        "doc_a", "doc_b", ham.cast("int").alias("hamming")
    )


# ---------------------------------------------------------------------------
# Point-in-convex-polygon spatial join via grid prefilter
# ---------------------------------------------------------------------------

PIP_G = 16  # grid cell width

_PIP_BASE_SQL = """
polys AS (
  SELECT n_nationkey AS poly_id,
         (n_nationkey * 53 + 17) % 200 + 28 AS cx,
         (n_nationkey * 97 + 23) % 200 + 28 AS cy,
         6 + n_nationkey % 5 AS r
  FROM nation
),
verts AS (
  SELECT poly_id, cx, cy, r, v.i AS vi,
         cx + CASE v.i WHEN 0 THEN 2*r WHEN 1 THEN r WHEN 2 THEN -r
                       WHEN 3 THEN -2*r WHEN 4 THEN -2*r WHEN 5 THEN -r
                       WHEN 6 THEN r ELSE 2*r END AS vx,
         cy + CASE v.i WHEN 0 THEN r WHEN 1 THEN 2*r WHEN 2 THEN 2*r
                       WHEN 3 THEN r WHEN 4 THEN -r WHEN 5 THEN -2*r
                       WHEN 6 THEN -2*r ELSE -r END AS vy
  FROM polys, UNNEST(range(8)) AS v(i)
),
edges AS (
  SELECT a.poly_id, a.vx AS x1, a.vy AS y1, b.vx AS x2, b.vy AS y2
  FROM verts a JOIN verts b
    ON b.poly_id = a.poly_id AND b.vi = (a.vi + 1) % 8
),
pts AS (
  SELECT c_custkey AS pt_id,
         (c_custkey * 13 + 5) % 256 AS px,
         (c_custkey * 29 + 11) % 256 AS py
  FROM customer
)
"""


@register(
    "join_point_in_polygon_grid",
    family="join",
    doc="Point-in-CONVEX-polygon spatial join — the polygon step up "
    "from join_spatial_grid_epsilon's radius joins: per-nation integer "
    "octagons (CCW vertices (cx±2r, cy±r), (cx±r, cy±2r)), customer "
    "points hashed onto the same integer plane, containment decided by "
    "ALL-INTEGER cross-product signs against every CCW edge — exact, "
    "no epsilon, no float orientation ambiguity.  Scale shape: each "
    "polygon explodes to the grid cells of its bounding box (<= 9 "
    "cells at these radii), each point lands in its ONE home cell, "
    "and the candidate set is the pure equi-join on cell id — "
    "bounded by cell occupancy x overlapping polygons, never "
    "|points| x |polygons|; the 8-edge test runs per candidate "
    "against the broadcast edge table.  The oracle is the naive "
    "all-pairs cross join + the identical edge test, so equality "
    "proves the bbox-cell cover is lossless.  Output per polygon: "
    "contained-point count + custkey checksum.",
    oracle=f"""
WITH {_PIP_BASE_SQL},
inside AS (
  SELECT e.poly_id, p.pt_id
  FROM pts p CROSS JOIN edges e
  GROUP BY e.poly_id, p.pt_id
  HAVING MIN(CASE WHEN (e.x2 - e.x1) * (p.py - e.y1)
                     - (e.y2 - e.y1) * (p.px - e.x1) >= 0
             THEN 1 ELSE 0 END) = 1
)
SELECT poly_id,
       CAST(COUNT(*) AS BIGINT) AS n_inside,
       CAST(SUM(pt_id) AS BIGINT) AS pt_checksum
FROM inside GROUP BY poly_id
""",
)
def join_point_in_polygon_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    polys = n.select(
        F.col("n_nationkey").alias("poly_id"),
        ((F.col("n_nationkey") * 53 + 17) % 200 + 28).alias("cx"),
        ((F.col("n_nationkey") * 97 + 23) % 200 + 28).alias("cy"),
        (F.lit(6) + F.col("n_nationkey") % 5).alias("r"),
    )
    dx = [2, 1, -1, -2, -2, -1, 1, 2]
    dy = [1, 2, 2, 1, -1, -2, -2, -1]
    verts = polys.select(
        "poly_id", "cx", "cy", "r",
        F.posexplode(
            F.array(
                *[
                    F.struct(
                        (F.col("cx") + dx[i] * F.col("r")).alias("vx"),
                        (F.col("cy") + dy[i] * F.col("r")).alias("vy"),
                    )
                    for i in range(8)
                ]
            )
        ).alias("vi", "v"),
    )
    a, b = verts.alias("a"), verts.alias("b")
    edges = a.join(
        b,
        (F.col("b.poly_id") == F.col("a.poly_id"))
        & (F.col("b.vi") == (F.col("a.vi") + 1) % 8),
    ).select(
        F.col("a.poly_id").alias("poly_id"),
        F.col("a.v.vx").alias("x1"), F.col("a.v.vy").alias("y1"),
        F.col("b.v.vx").alias("x2"), F.col("b.v.vy").alias("y2"),
    )
    # bbox cell cover per polygon (dimension-sized, broadcast)
    cover = polys.select(
        "poly_id",
        F.explode(
            F.sequence(
                F.floor((F.col("cx") - 2 * F.col("r")) / PIP_G),
                F.floor((F.col("cx") + 2 * F.col("r")) / PIP_G),
            )
        ).alias("gx"),
        F.col("cy"), F.col("r"),
    ).select(
        "poly_id", "gx",
        F.explode(
            F.sequence(
                F.floor((F.col("cy") - 2 * F.col("r")) / PIP_G),
                F.floor((F.col("cy") + 2 * F.col("r")) / PIP_G),
            )
        ).alias("gy"),
    )
    c = table(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("pt_id"),
        ((F.col("c_custkey") * 13 + 5) % 256).alias("px"),
        ((F.col("c_custkey") * 29 + 11) % 256).alias("py"),
    ).withColumn("gx", F.floor(F.col("px") / PIP_G)).withColumn(
        "gy", F.floor(F.col("py") / PIP_G)
    )
    cand = pts.join(F.broadcast(cover), ["gx", "gy"]).select(
        "poly_id", "pt_id", "px", "py"
    )
    cross_ok = F.when(
        (F.col("x2") - F.col("x1")) * (F.col("py") - F.col("y1"))
        - (F.col("y2") - F.col("y1")) * (F.col("px") - F.col("x1"))
        >= 0,
        1,
    ).otherwise(0)
    inside = (
        cand.join(F.broadcast(edges), "poly_id")
        .groupBy("poly_id", "pt_id")
        .agg(F.min(cross_ok).alias("ok"))
        .where(F.col("ok") == 1)
    )
    return inside.groupBy("poly_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_inside"),
        F.sum("pt_id").cast("bigint").alias("pt_checksum"),
    )


# ---------------------------------------------------------------------------
# Mann-Whitney AUC of a quality score against a binary label
# ---------------------------------------------------------------------------


@register(
    "quality_auc_mann_whitney",
    family="quality",
    doc="Exact ROC-AUC via the Mann-Whitney U identity — the classifier-"
    "free evaluation every quality-score pipeline needs: AUC = P(score+ "
    "> score-) + P(=)/2, computed from rank sums (U = R+ − n+(n+1)/2) "
    "with midranks for ties, never from a sampled ROC curve.  Here the "
    "document LENGTH score is evaluated against the lang='en' label "
    "per source: one global ranking window over the scored rows "
    "(PARTITIONED by source — group-bounded), exact integer rank "
    "sums, one identical closed-form expression both engines.  An "
    "AUC near 0.5 certifies the synthetic corpus length is "
    "label-independent; the machinery is what matters.",
    oracle="""
WITH scored AS (
  SELECT source, LENGTH(text) AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
),
rk AS (
  SELECT source, y,
         -- midrank: average rank over the tie group = avg of rank_min..rank_max
         (CAST(RANK() OVER (PARTITION BY source ORDER BY s) AS DOUBLE)
          + CAST(COUNT(*) OVER (PARTITION BY source, s) - 1 AS DOUBLE) / 2)
           AS midrank
  FROM scored
)
SELECT source,
       CAST(SUM(y) AS BIGINT) AS n_pos,
       CAST(SUM(1 - y) AS BIGINT) AS n_neg,
       ROUND((SUM(CASE WHEN y = 1 THEN midrank ELSE 0 END)
              - CAST(SUM(y) AS DOUBLE) * (SUM(y) + 1) / 2)
             / (CAST(SUM(y) AS DOUBLE) * SUM(1 - y)), 6) AS auc
FROM rk GROUP BY source
""",
)
def quality_auc_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    scored = d.select(
        "source",
        F.length("text").alias("s"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    wr = Window.partitionBy("source").orderBy("s")
    wt = Window.partitionBy("source", "s")
    rk = scored.select(
        "source",
        "y",
        (
            F.rank().over(wr).cast("double")
            + (F.count(F.lit(1)).over(wt) - 1).cast("double") / 2
        ).alias("midrank"),
    )
    npos = F.sum("y")
    nneg = F.sum(F.lit(1) - F.col("y"))
    rpos = F.sum(F.when(F.col("y") == 1, F.col("midrank")).otherwise(0.0))
    return rk.groupBy("source").agg(
        npos.cast("bigint").alias("n_pos"),
        nneg.cast("bigint").alias("n_neg"),
        F.round(
            (rpos - npos.cast("double") * (npos + 1) / 2)
            / (npos.cast("double") * nneg),
            6,
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# Bounded edit-distance pairs (Levenshtein)
# ---------------------------------------------------------------------------

EDIT_DOC_CAP = 60
EDIT_PREFIX = 24


@register(
    "dedup_edit_distance_pairs",
    family="dedup",
    doc="Levenshtein edit-distance near-pair tier over text PREFIXES — "
    "the character-level verifier beside the token-level Jaccard tiers "
    "(catches reorder-free typo/OCR variants shingles miss).  Bounded "
    "like the other quadratic tiers (doc_id < 60, first 24 chars); at "
    "scale candidates come from FastSS deletion neighborhoods "
    "(operators/fuzzy.py) or LSH and only the verify step is this "
    "expression.  Both engines run their native levenshtein on "
    "identical prefixes — exact integers, no rounding anywhere.",
    oracle=f"""
WITH d AS (
  SELECT doc_id, substr(text, 1, {EDIT_PREFIX}) AS p
  FROM documents WHERE doc_id < {EDIT_DOC_CAP}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.p, b.p) AS INT) AS edit_distance
FROM d a JOIN d b ON a.doc_id < b.doc_id
WHERE levenshtein(a.p, b.p) <= 10
""",
)
def dedup_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < EDIT_DOC_CAP)
        .select(
            "doc_id", F.substring("text", 1, EDIT_PREFIX).alias("p")
        )
    )
    a, b = d.alias("a"), d.alias("b")
    lev = F.levenshtein(F.col("a.p"), F.col("b.p"))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .where(lev <= 10)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            lev.cast("int").alias("edit_distance"),
        )
    )


# ---------------------------------------------------------------------------
# Jackknife variance of the mean — closed form from exact moments
# ---------------------------------------------------------------------------


@register(
    "agg_jackknife_variance",
    family="agg",
    doc="Leave-one-out jackknife variance of the mean order price per "
    "market segment — the classic bias/variance companion to "
    "agg_poisson_bootstrap_ci, computed in CLOSED FORM from two exact "
    "moments instead of n replica passes: with S = Σx (DECIMAL-exact) "
    "and Q = Σx², each leave-one-out mean is (S−xᵢ)/(n−1) and "
    "var_jack = (n−1)/n · Σ(m₋ᵢ − m̄)² collapses algebraically to "
    "(Q − S²/n) / (n(n−1)) — the unbiased SE² of the mean, a pure "
    "function of (n, S, Q) — ONE hash aggregate at any scale, no "
    "per-replica work, and identical expression trees on both "
    "engines.  Surfaced: jackknife SE and the n/(n−1) ratio to the "
    "naive SE (the finite-sample correction the estimate exists to "
    "expose).",
    oracle="""
WITH m AS (
  SELECT c.c_mktsegment AS segment,
         COUNT(*) AS n,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS s,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))
                  * CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS q
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY c.c_mktsegment
)
SELECT segment,
       CAST(n AS BIGINT) AS n,
       ROUND(s / n, 6) AS mean_price,
       ROUND(SQRT((q - s * s / n) / (CAST(n AS DOUBLE) * (n - 1))), 6)
         AS jackknife_se,
       ROUND(SQRT((q - s * s / n) / (CAST(n AS DOUBLE) * n))
             / SQRT((q - s * s / n) / (CAST(n AS DOUBLE) * (n - 1))), 6)
         AS naive_to_jack_ratio
FROM m
""",
)
def agg_jackknife_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    px = F.col("o_totalprice").cast("decimal(12,2)")
    j = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        F.col("c_custkey") == F.col("o_custkey"),
    )
    n = F.count(F.lit(1))
    s = F.sum(px).cast("double")
    q = F.sum(px * px).cast("double")
    nd = n.cast("double")
    var_core = (q - s * s / n) / nd
    return j.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        n.cast("bigint").alias("n"),
        F.round(s / n, 6).alias("mean_price"),
        F.round(F.sqrt(var_core / (n - 1)), 6).alias("jackknife_se"),
        F.round(
            F.sqrt(var_core / n) / F.sqrt(var_core / (n - 1)), 6
        ).alias("naive_to_jack_ratio"),
    )


# ---------------------------------------------------------------------------
# V-shape pattern detection (MATCH_RECOGNIZE-style, windowless)
# ---------------------------------------------------------------------------


@register(
    "events_vshape_patterns",
    family="timeseries",
    doc="Row-pattern detection (the MATCH_RECOGNIZE DOWN{2} UP{2} "
    "idiom) over the daily event-count series: a day is a V-bottom "
    "when the two preceding days strictly descend into it and the two "
    "following strictly ascend out.  Deliberately WINDOWLESS: the ±2 "
    "frame comes from a band equi-join on date arithmetic over the "
    "per-DAY aggregate (30 rows at any corpus size), so there is no "
    "global ordering anywhere in the plan — the pattern predicate is "
    "four conditional aggregates keyed by day offset.  Surfaced: the "
    "bottom day, its count, and the V depth (min drop from either "
    "rim).  Interior days only (both rims must exist).",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS y
  FROM events GROUP BY 1
),
frame AS (
  SELECT a.d, a.y,
         MAX(CASE WHEN b.d = a.d - 2 THEN b.y END) AS ym2,
         MAX(CASE WHEN b.d = a.d - 1 THEN b.y END) AS ym1,
         MAX(CASE WHEN b.d = a.d + 1 THEN b.y END) AS yp1,
         MAX(CASE WHEN b.d = a.d + 2 THEN b.y END) AS yp2
  FROM daily a JOIN daily b ON b.d BETWEEN a.d - 2 AND a.d + 2
  GROUP BY a.d, a.y
)
SELECT CAST(d AS VARCHAR) AS bottom_day,
       CAST(y AS BIGINT) AS n_events,
       CAST(LEAST(ym2, yp2) - y AS BIGINT) AS v_depth
FROM frame
WHERE ym2 > ym1 AND ym1 > y AND y < yp1 AND yp1 < yp2
""",
)
def events_vshape_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    # each day emits its ±2 probe dates so the frame is a pure EQUI-join
    # on date (no theta band, no BNLJ)
    probes = daily.select(
        "d",
        "y",
        F.explode(F.array(*[F.lit(k) for k in (-2, -1, 1, 2)])).alias("off"),
    ).select("d", "y", "off", F.date_add(F.col("d"), F.col("off")).alias("bd"))
    b = daily.select(F.col("d").alias("bd"), F.col("y").alias("by"))
    frame = (
        probes.join(b, "bd")
        .groupBy("d", "y")
        .agg(
            F.max(F.when(F.col("off") == -2, F.col("by"))).alias("ym2"),
            F.max(F.when(F.col("off") == -1, F.col("by"))).alias("ym1"),
            F.max(F.when(F.col("off") == 1, F.col("by"))).alias("yp1"),
            F.max(F.when(F.col("off") == 2, F.col("by"))).alias("yp2"),
        )
    )
    return frame.where(
        (F.col("ym2") > F.col("ym1"))
        & (F.col("ym1") > F.col("y"))
        & (F.col("y") < F.col("yp1"))
        & (F.col("yp1") < F.col("yp2"))
    ).select(
        F.col("d").cast("string").alias("bottom_day"),
        F.col("y").cast("bigint").alias("n_events"),
        (F.least("ym2", "yp2") - F.col("y")).cast("bigint").alias("v_depth"),
    )


# ---------------------------------------------------------------------------
# Interval-overlap aggregate (sessions x maintenance shifts, tz-free)
# ---------------------------------------------------------------------------


@register(
    "join_interval_overlap_agg",
    family="join",
    doc="Interval-OVERLAP-duration aggregate — beyond the membership "
    "range joins (join_range_interval_banded) to the measure a "
    "capacity audit needs: per (user, day) activity spans [first "
    "event, last event] in tz-free SECONDS-OF-DAY arithmetic "
    "(hour/minute/second extraction only — no epoch, so the result "
    "is identical under any session timezone), range-joined against "
    "a small shift table (six 4-hour windows, broadcast), overlap "
    "seconds = greatest(0, least(ends) - greatest(starts)) summed "
    "per shift.  Output per shift: sessions touched, total and max "
    "overlap seconds.",
    oracle="""
WITH sess AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         MIN(EXTRACT(hour FROM ts) * 3600 + EXTRACT(minute FROM ts) * 60
             + EXTRACT(second FROM ts)) AS s0,
         MAX(EXTRACT(hour FROM ts) * 3600 + EXTRACT(minute FROM ts) * 60
             + EXTRACT(second FROM ts)) AS s1
  FROM events GROUP BY 1, 2
),
shifts AS (
  SELECT i.i AS shift_id, i.i * 14400 AS w0, i.i * 14400 + 14400 AS w1
  FROM UNNEST(range(6)) AS i(i)
),
ov AS (
  SELECT sh.shift_id,
         GREATEST(0, LEAST(s.s1, sh.w1 - 1) - GREATEST(s.s0, sh.w0) + 1)
           AS osec
  FROM sess s JOIN shifts sh
    ON s.s0 < sh.w1 AND s.s1 >= sh.w0
)
SELECT shift_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(osec) AS BIGINT) AS overlap_seconds,
       CAST(MAX(osec) AS BIGINT) AS max_overlap
FROM ov WHERE osec > 0 GROUP BY shift_id
""",
)
def join_interval_overlap_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    sod = (
        F.hour("ts") * 3600 + F.minute("ts") * 60 + F.second("ts")
    )
    sess = e.groupBy(
        "user_id", F.col("ts").cast("date").alias("d")
    ).agg(F.min(sod).alias("s0"), F.max(sod).alias("s1"))
    spark_ = sess.sparkSession
    shifts = spark_.range(6).select(
        F.col("id").alias("shift_id"),
        (F.col("id") * 14400).alias("w0"),
        (F.col("id") * 14400 + 14400).alias("w1"),
    )
    # each session explodes to the shift ids its span covers — an
    # EQUI-join on shift_id (lossless cover, no theta-band BNLJ)
    covered = sess.select(
        "s0",
        "s1",
        F.explode(
            F.sequence(
                F.floor(F.col("s0") / 14400).cast("bigint"),
                F.floor(F.col("s1") / 14400).cast("bigint"),
            )
        ).alias("shift_id"),
    )
    ov = covered.join(F.broadcast(shifts), "shift_id").select(
        "shift_id",
        F.greatest(
            F.lit(0),
            F.least(F.col("s1"), F.col("w1") - 1)
            - F.greatest(F.col("s0"), F.col("w0"))
            + 1,
        ).alias("osec"),
    )
    return (
        ov.where(F.col("osec") > 0)
        .groupBy("shift_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum("osec").cast("bigint").alias("overlap_seconds"),
            F.max("osec").cast("bigint").alias("max_overlap"),
        )
    )


# ---------------------------------------------------------------------------
# Calibration / reliability table with ECE contributions
# ---------------------------------------------------------------------------


@register(
    "quality_calibration_bins",
    family="quality",
    doc="Reliability-diagram table + expected-calibration-error "
    "contributions — the standard eval for any scored filter before "
    "its threshold is trusted: a deterministic seeded 'model score' "
    "p in [0,1) (md5-derived 60-bit uniform per order — no rand(), "
    "identical on both engines) against a deterministic label from "
    "an independent hash bit; rows land in 10 equal-width bins, and "
    "each bin reports mean confidence (DECIMAL-summed round-12 "
    "uniforms), empirical rate, |gap| and its n-weighted ECE "
    "contribution.  One hash aggregate; the bin spine is the 10-row "
    "dimension.",
    oracle="""
WITH scored AS (
  SELECT CAST(('0x' || substr(md5('p|' || CAST(o_orderkey AS VARCHAR)), 1, 15))
              AS BIGINT) / 1152921504606846976.0 AS p,
         CAST(('0x' || substr(md5('y|' || CAST(o_orderkey AS VARCHAR)), 1, 15))
              AS BIGINT) % 2 AS y
  FROM orders
),
b AS (
  SELECT LEAST(CAST(FLOOR(p * 10) AS INT), 9) AS bin,
         ROUND(p, 12) AS p12, y
  FROM scored
),
agg AS (
  SELECT bin, COUNT(*) AS n,
         CAST(SUM(CAST(p12 AS DECIMAL(20,12))) AS DOUBLE) AS sp,
         CAST(SUM(y) AS BIGINT) AS npos,
         (SELECT COUNT(*) FROM scored) AS total
  FROM b GROUP BY bin
)
SELECT bin,
       CAST(n AS BIGINT) AS n,
       ROUND(sp / n, 6) AS mean_confidence,
       ROUND(CAST(npos AS DOUBLE) / n, 6) AS empirical_rate,
       ROUND(ABS(sp / n - CAST(npos AS DOUBLE) / n), 6) AS gap,
       ROUND(ABS(sp / n - CAST(npos AS DOUBLE) / n) * n / total, 6)
         AS ece_contribution
FROM agg
""",
)
def quality_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    h = lambda tag: F.expr(  # noqa: E731
        f"cast(conv(substr(md5(concat('{tag}|', cast(o_orderkey as string)"
        ")), 1, 15), 16, 10) as bigint)"
    )
    scored = o.select(
        (h("p") / F.lit(float(1 << 60))).alias("p"),
        (h("y") % 2).alias("y"),
    )
    b = scored.select(
        F.least(F.floor(F.col("p") * 10).cast("int"), F.lit(9)).alias("bin"),
        F.round(F.col("p"), 12).alias("p12"),
        "y",
    )
    total = b.agg(F.count(F.lit(1)).alias("total"))
    agg = b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("p12").cast("decimal(20,12)")).cast("double").alias("sp"),
        F.sum("y").cast("bigint").alias("npos"),
    )
    mean_conf = F.col("sp") / F.col("n")
    emp = F.col("npos").cast("double") / F.col("n")
    return agg.crossJoin(F.broadcast(total)).select(
        "bin",
        F.col("n").cast("bigint").alias("n"),
        F.round(mean_conf, 6).alias("mean_confidence"),
        F.round(emp, 6).alias("empirical_rate"),
        F.round(F.abs(mean_conf - emp), 6).alias("gap"),
        F.round(F.abs(mean_conf - emp) * F.col("n") / F.col("total"), 6)
        .alias("ece_contribution"),
    )


# ---------------------------------------------------------------------------
# BOM-style subtree rollup over a synthetic part hierarchy
# ---------------------------------------------------------------------------


@register(
    "recursive_bom_rollup",
    family="recursive",
    doc="Bill-of-materials subtree rollup: parts form a tree via "
    "parent(p) = p/10 (roots p < 10), and every INTERNAL node reports "
    "its subtree size and total retail price — the hierarchical "
    "aggregation pattern (BOM cost rollups, org charts, category "
    "trees).  The Spark plan exploits the closed-form ancestry: each "
    "part EMITS its own ancestor chain with a sequence/transform "
    "expression (depth = digit count, so the chain array is tiny and "
    "computed map-side), one explode + one hash aggregate — no "
    "iteration, no driver loop, and at 100 TB this stays a single "
    "shuffle keyed on ancestor.  The oracle derives the same pairs "
    "with a recursive CTE walking parent links — equality proves the "
    "closed-form ancestry matches true transitive closure.  DECIMAL "
    "price sums; internal nodes only (subtree size > 1).",
    oracle="""
WITH RECURSIVE up(node, anc) AS (
  SELECT p_partkey, p_partkey FROM part
  UNION ALL
  SELECT u.node, u.anc // 10 FROM up u WHERE u.anc >= 10
),
roll AS (
  SELECT u.anc AS part_root, COUNT(*) AS subtree_size,
         CAST(SUM(CAST(p.p_retailprice AS DECIMAL(12,2))) AS DOUBLE)
           AS subtree_price
  FROM up u JOIN part p ON p.p_partkey = u.node
  GROUP BY u.anc
)
SELECT CAST(part_root AS BIGINT) AS part_root,
       CAST(subtree_size AS BIGINT) AS subtree_size,
       ROUND(subtree_price, 2) AS subtree_price
FROM roll WHERE subtree_size > 1
""",
)
def recursive_bom_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    # ancestor chain [p, p/10, p/100, ...] in one map-side expression:
    # depth = number of decimal digits, so sequence length is <= 5 here
    # and <= 20 for any BIGINT — no recursion, no iteration
    chain = F.expr(
        "transform(sequence(0, cast(floor(log10(greatest(p_partkey, 1))) "
        "as int)), i -> cast(p_partkey / cast(pow(10, i) as bigint) "
        "as bigint))"
    )
    up = p.select(
        F.col("p_retailprice").cast("decimal(12,2)").alias("price"),
        F.explode(chain).alias("part_root"),
    )
    return (
        up.groupBy("part_root")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("subtree_size"),
            F.round(F.sum("price").cast("double"), 2).alias("subtree_price"),
        )
        .where(F.col("subtree_size") > 1)
        .select(
            F.col("part_root").cast("bigint").alias("part_root"),
            "subtree_size",
            "subtree_price",
        )
    )


# ---------------------------------------------------------------------------
# Pseudo-relevance-feedback query expansion (Rocchio-style PRF)
# ---------------------------------------------------------------------------

PRF_PROBE = ("data", "model")
PRF_TOPDOCS = 10
PRF_EXPAND = 5
PRF_FINAL = 10


def _prf_oracle() -> str:
    probe_list = ", ".join(f"'{t}'" for t in PRF_PROBE)
    return f"""
WITH tok AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS term
    FROM documents
  ) WHERE term <> ''
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM dl
),
tfall AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
dfall AS (SELECT term, COUNT(*) AS df FROM tfall GROUP BY term),
bm1 AS (
  SELECT t.doc_id,
         CAST(SUM(CAST(ROUND(
           LN(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * (tf * (1.2 + 1.0))
           / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * CAST(dl AS DOUBLE) / avgdl))
         , 12) AS DECIMAL(24,12))) AS DOUBLE) AS s
  FROM tfall t
  JOIN dfall USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  WHERE t.term IN ({probe_list})
  GROUP BY t.doc_id
),
seed AS (
  SELECT doc_id FROM bm1
  ORDER BY ROUND(s, 6) DESC, doc_id ASC LIMIT {PRF_TOPDOCS}
),
exp_terms AS (
  SELECT t.term FROM tfall t
  JOIN seed USING (doc_id)
  JOIN dfall USING (term) CROSS JOIN stats
  WHERE t.term NOT IN ({probe_list})
  GROUP BY t.term
  ORDER BY ROUND(CAST(SUM(CAST(ROUND(
             t.tf * LN(CAST(n_docs AS DOUBLE) / df), 12)
           AS DECIMAL(24,12))) AS DOUBLE), 6) DESC, t.term ASC
  LIMIT {PRF_EXPAND}
),
q2 AS (SELECT term FROM exp_terms UNION ALL SELECT UNNEST([{probe_list}])),
bm2 AS (
  SELECT t.doc_id,
         CAST(SUM(CAST(ROUND(
           LN(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * (tf * (1.2 + 1.0))
           / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * CAST(dl AS DOUBLE) / avgdl))
         , 12) AS DECIMAL(24,12))) AS DOUBLE) AS s
  FROM tfall t
  JOIN q2 USING (term)
  JOIN dfall USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY t.doc_id
)
SELECT doc_id, ROUND(s, 6) AS bm25_expanded
FROM bm2 ORDER BY ROUND(s, 6) DESC, doc_id ASC LIMIT {PRF_FINAL}
"""


@register(
    "retrieval_prf_expansion",
    family="retrieval",
    doc="Pseudo-relevance-feedback query expansion (the Rocchio/RM "
    "idiom): BM25-score the probe query, take the top-10 seed docs, "
    "mine their top-5 tf-idf expansion terms (probe terms excluded), "
    "and rescore the corpus with the expanded query — the classic "
    "recall lever between lexical and hybrid retrieval "
    "(retrieval_hybrid_rrf).  Every per-term score is rounded to 12 "
    "and DECIMAL-summed so both engines rank identical values; every "
    "cutoff (seed docs, expansion terms, final top-10) breaks ties "
    "on rounded score then id/term.  Scale shape: tf/df/dl are the "
    "inverted-index aggregates (corpus-keyed hash aggs), the seed and "
    "expansion frames are k-row broadcasts, and the rescore is one "
    "semi-join of tf against the 7-term expanded query.",
    oracle=_prf_oracle(),
)
def retrieval_prf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as T

    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(T.tokens(F.lower(F.col("text")))).alias("term")
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tfall = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    tfall = tfall.localCheckpoint()  # reused: probe score, mining, rescore
    dfall = tfall.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    def bm25(tf_subset):
        s_term = F.round(
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            )
            * (F.col("tf") * (1.2 + 1.0))
            / (
                F.col("tf")
                + 1.2
                * (
                    (1.0 - 0.75)
                    + 0.75 * F.col("dl").cast("double") / F.col("avgdl")
                )
            ),
            12,
        ).cast("decimal(24,12)")
        return (
            tf_subset.join(F.broadcast(dfall), "term")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(stats))
            .groupBy("doc_id")
            .agg(F.sum(s_term).cast("double").alias("s"))
        )

    probe = [F.lit(t) for t in PRF_PROBE]
    bm1 = bm25(tfall.where(F.col("term").isin(list(PRF_PROBE))))
    seed = bm1.orderBy(
        F.round("s", 6).desc(), F.col("doc_id").asc()
    ).limit(PRF_TOPDOCS).select("doc_id")
    tfidf = F.round(
        F.col("tf")
        * F.log(F.col("n_docs").cast("double") / F.col("df")),
        12,
    ).cast("decimal(24,12)")
    exp_terms = (
        tfall.join(F.broadcast(seed), "doc_id")
        .where(~F.col("term").isin(list(PRF_PROBE)))
        .join(F.broadcast(dfall), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("term")
        .agg(F.sum(tfidf).cast("double").alias("w"))
        .orderBy(F.round("w", 6).desc(), F.col("term").asc())
        .limit(PRF_EXPAND)
        .select("term")
    )
    spark_ = d.sparkSession
    q2 = exp_terms.unionByName(
        spark_.createDataFrame([(t,) for t in PRF_PROBE], "term string")
    )
    bm2 = bm25(tfall.join(F.broadcast(q2), "term"))
    return (
        bm2.orderBy(F.round("s", 6).desc(), F.col("doc_id").asc())
        .limit(PRF_FINAL)
        .select("doc_id", F.round("s", 6).alias("bm25_expanded"))
    )


# ---------------------------------------------------------------------------
# Progressive JPEG decode — multi-scan SOF2, closed-form oracle
# ---------------------------------------------------------------------------


@register(
    "multimodal_jpeg_progressive_stats",
    family="multimodal",
    doc="REAL progressive (SOF2) JPEG decode "
    "(operators/jpeg_progressive.py) — the codec seam VERDICT r5/r6 "
    "named as the largest remaining: multi-scan coefficient "
    "accumulation across a 6-scan spectral-selection + successive-"
    "approximation script (DC bit-planes with two's-complement "
    "refinement, AC bands with EOBn end-of-band runs, AC refinement "
    "with ±1 newly-significant symbols and appended correction bits "
    "per T.81 §G.1.2.3).  The fixture keeps the constant-block "
    "exactness lever, so decoded pixel (x,y) = (id·11 + 13·(x//8) + "
    "29·(y//8)) mod 256 in closed form; the AC-refinement machinery "
    "is additionally pinned by gradient round-trip parity against the "
    "baseline codec in tests/test_jpeg_progressive.py.  Decode runs "
    "through the SAME jpeg_pixel_stats mapInPandas path (the marker "
    "walk dispatches on SOF2), so blobs never leave the executor.",
    oracle="""
WITH dims AS (
  SELECT doc_id, 8 * (doc_id % 3 + 1) AS w, 8 * (doc_id % 2 + 1) AS h
  FROM documents
),
blocks AS (
  SELECT doc_id, w, h,
         (doc_id * 11 + 13 * bxs.bx + 29 * bys.by) % 256 AS v
  FROM dims,
       UNNEST(range(0, w // 8)) AS bxs(bx),
       UNNEST(range(0, h // 8)) AS bys(by)
)
SELECT doc_id AS image_id,
       CAST(MIN(w) AS INT) AS width,
       CAST(MIN(h) AS INT) AS height,
       CAST(MIN(w) * MIN(h) AS BIGINT) AS n_subpixels,
       CAST(SUM(v) * 64 AS BIGINT) AS px_sum,
       CAST(MIN(v) AS INT) AS px_min,
       CAST(MAX(v) AS INT) AS px_max
FROM blocks
GROUP BY doc_id
""",
)
def multimodal_jpeg_progressive_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (
        jpeg_pixel_stats,
        synthesize_progressive_jpeg_media,
    )

    d = table(spark, sf_dir, "documents")
    return jpeg_pixel_stats(synthesize_progressive_jpeg_media(d.select("doc_id")))
