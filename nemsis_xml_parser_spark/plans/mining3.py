"""Corpus-mining tier 4: structural-change detection and
topic-sensitive graph ranking (SURVEY §2.I extension, round 5).

* ``events_trend_break`` — segmented-regression breakpoint detection:
  for every candidate break day, fit OLS separately to the left/right
  segments and pick the split minimizing total SSE — the
  piecewise-linear changepoint that CUSUM (level shifts) cannot see
  (slope changes).  All segment statistics are integer sums (exact in
  both engines); only the final closed-form divisions are floating.
* ``graph_personalized_pagerank`` — PPR over the part co-purchase
  graph with a brand-defined seed set (operators/pagerank.py::
  personalized_pagerank): teleport and dangling mass go to the seeds,
  so rank measures proximity to the brand — the related-item ranking
  a recommender derives from co-purchases.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import register, table

# ---------------------------------------------------------------------------
# Segmented regression breakpoint
# ---------------------------------------------------------------------------

MIN_SEG = 5  # minimum days on each side of a candidate break

_SEG_STATS = """
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
  CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(x * y) AS BIGINT) AS sxy,
  CAST(SUM(y * y) AS BIGINT) AS syy
"""

_FIT = """
  (syy - CAST(sy * sy AS DOUBLE) / n)
  - CASE WHEN (sxx - CAST(sx * sx AS DOUBLE) / n) > 0
         THEN (sxy - CAST(sx * sy AS DOUBLE) / n)
              * (sxy - CAST(sx * sy AS DOUBLE) / n)
              / (sxx - CAST(sx * sx AS DOUBLE) / n)
         ELSE 0.0 END
"""

_SLOPE = """
  CASE WHEN (sxx - CAST(sx * sx AS DOUBLE) / n) > 0
       THEN (sxy - CAST(sx * sy AS DOUBLE) / n)
            / (sxx - CAST(sx * sx AS DOUBLE) / n)
       ELSE 0.0 END
"""


@register(
    "events_trend_break",
    family="timeseries",
    doc="Segmented-regression breakpoint on the daily event-count "
    "series: every candidate break day with >= 5 days on each side "
    "gets a two-piece OLS fit (left/right), and the winner minimizes "
    "ROUND(SSE_left + SSE_right, 6) with min-day tie-break; the "
    "single-line SSE is surfaced so sse_gain says how much structure "
    "the break explains.  Slope changes are invisible to level-shift "
    "CUSUM (events_changepoint_cusum) — this is its complement.  "
    "Determinism: all segment sums are INTEGER (exact in any order); "
    "only the closed-form divisions float, with identical expression "
    "trees both engines.  Scale shape: the corpus collapses to one "
    "(day) aggregate; the candidate x day cross frame is "
    "calendar-bounded (<=31 x 31 here), statistics on that bounded "
    "frame.",
    oracle=f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
mn AS (SELECT MIN(d) AS d0 FROM daily),
idx AS (
  SELECT datediff('day', d0, d) AS x, y FROM daily CROSS JOIN mn
),
cand AS (SELECT DISTINCT x AS b FROM idx),
seg AS (
  SELECT c.b, CASE WHEN i.x < c.b THEN 0 ELSE 1 END AS side, i.x, i.y
  FROM cand c CROSS JOIN idx i
),
per AS (
  SELECT b, side, {_SEG_STATS}
  FROM seg GROUP BY b, side
),
fit AS (
  SELECT b, side, n, {_FIT} AS sse, {_SLOPE} AS slope FROM per
),
tot AS (
  SELECT l.b, l.n AS n_left, r.n AS n_right,
         ROUND(l.sse + r.sse, 6) AS sse_total,
         ROUND(l.slope, 6) AS slope_left, ROUND(r.slope, 6) AS slope_right
  FROM fit l JOIN fit r ON l.b = r.b AND l.side = 0 AND r.side = 1
  WHERE l.n >= {MIN_SEG} AND r.n >= {MIN_SEG}
),
single AS (
  SELECT ROUND({_FIT}, 6) AS sse_single FROM (
    SELECT {_SEG_STATS} FROM idx
  )
),
best AS (
  SELECT * FROM tot ORDER BY sse_total ASC, b ASC LIMIT 1
)
SELECT CAST(best.b AS BIGINT) AS break_x,
       CAST(CAST(d0 + CAST(best.b AS INTEGER) AS DATE) AS VARCHAR)
         AS break_date,
       best.n_left, best.n_right, best.sse_total,
       best.slope_left, best.slope_right,
       single.sse_single,
       ROUND(single.sse_single - best.sse_total, 6) AS sse_gain
FROM best CROSS JOIN single CROSS JOIN mn
""",
)
def events_trend_break(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("y")
    )
    mn = daily.agg(F.min("d").alias("d0"))
    idx = daily.crossJoin(F.broadcast(mn)).select(
        F.datediff(F.col("d"), F.col("d0")).alias("x"), "y"
    )
    cand = idx.select(F.col("x").alias("b")).distinct()
    seg = cand.join(
        F.broadcast(idx.select(F.col("x"), F.col("y"))), F.lit(True)
    ).select(
        "b", F.when(F.col("x") < F.col("b"), 0).otherwise(1).alias("side"),
        "x", "y",
    )

    def stats(df: DataFrame, keys: list[str]) -> DataFrame:
        g = df.groupBy(*keys) if keys else df.groupBy()
        return g.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        )

    def _c(name: str) -> F.Column:
        return F.col(name)

    sxx_c = _c("sxx") - (_c("sx") * _c("sx")).cast("double") / _c("n")
    sxy_c = _c("sxy") - (_c("sx") * _c("sy")).cast("double") / _c("n")
    syy_c = _c("syy") - (_c("sy") * _c("sy")).cast("double") / _c("n")
    sse = syy_c - F.when(sxx_c > 0, sxy_c * sxy_c / sxx_c).otherwise(0.0)
    slope = F.when(sxx_c > 0, sxy_c / sxx_c).otherwise(0.0)

    fit = stats(seg, ["b", "side"]).select(
        "b", "side", "n", sse.alias("sse"), slope.alias("slope")
    )
    l = fit.where("side = 0").select(
        "b", F.col("n").alias("n_left"), F.col("sse").alias("sse_l"),
        F.col("slope").alias("slope_l"),
    )
    r = fit.where("side = 1").select(
        "b", F.col("n").alias("n_right"), F.col("sse").alias("sse_r"),
        F.col("slope").alias("slope_r"),
    )
    tot = (
        l.join(r, "b")
        .where((F.col("n_left") >= MIN_SEG) & (F.col("n_right") >= MIN_SEG))
        .select(
            "b", "n_left", "n_right",
            F.round(F.col("sse_l") + F.col("sse_r"), 6).alias("sse_total"),
            F.round(F.col("slope_l"), 6).alias("slope_left"),
            F.round(F.col("slope_r"), 6).alias("slope_right"),
        )
    )
    single = stats(idx, []).select(F.round(sse, 6).alias("sse_single"))
    best = tot.orderBy(F.col("sse_total").asc(), F.col("b").asc()).limit(1)
    return (
        best.crossJoin(F.broadcast(single))
        .crossJoin(F.broadcast(mn))
        .select(
            F.col("b").cast("bigint").alias("break_x"),
            F.date_add(F.col("d0"), F.col("b").cast("int"))
            .cast("string")
            .alias("break_date"),
            "n_left", "n_right", "sse_total", "slope_left", "slope_right",
            "sse_single",
            F.round(F.col("sse_single") - F.col("sse_total"), 6).alias(
                "sse_gain"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Personalized PageRank
# ---------------------------------------------------------------------------

PPR_ORDER_CAP = 1000
PPR_BRAND = "Brand#11"
PPR_TOP = 15
PPR_ITERS = 3
PPR_D = 0.85


def _ppr_iter_sql(i: int) -> str:
    return f"""pr{i} AS MATERIALIZED (
  SELECT n2.node, n2.is_seed,
         ROUND((1.0 - {PPR_D}) * CAST(n2.is_seed AS DOUBLE) / ns.n_seeds
               + {PPR_D} * COALESCE(CAST(SUM(CAST(ROUND(p.pr / dg.d, 12)
                     AS DECIMAL(20,12))) AS DOUBLE), 0.0), 12) AS pr
  FROM nodes_s n2
  CROSS JOIN ns
  LEFT JOIN edges e ON e.dst = n2.node
  LEFT JOIN pr{i - 1} p ON p.node = e.src
  LEFT JOIN deg dg ON dg.src = e.src
  GROUP BY n2.node, n2.is_seed, ns.n_seeds
)"""


def _ppr_oracle() -> str:
    head = f"""WITH li AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey < {PPR_ORDER_CAP}
),
e0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0
),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
seeds AS MATERIALIZED (
  SELECT node FROM nodes JOIN part ON p_partkey = node
  WHERE p_brand = '{PPR_BRAND}'
),
ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_seeds FROM seeds),
nodes_s AS MATERIALIZED (
  SELECT n.node, CASE WHEN s.node IS NOT NULL THEN 1 ELSE 0 END AS is_seed
  FROM nodes n LEFT JOIN seeds s ON s.node = n.node
),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
pr0 AS MATERIALIZED (
  SELECT node, is_seed,
         ROUND(CAST(is_seed AS DOUBLE) / ns.n_seeds, 12) AS pr
  FROM nodes_s CROSS JOIN ns
)"""
    iters = ",\n".join(_ppr_iter_sql(i) for i in range(1, PPR_ITERS + 1))
    final = f"""
SELECT p.node AS part_id,
       CAST(dg.d AS BIGINT) AS degree,
       CAST(p.is_seed AS BIGINT) AS is_seed,
       ROUND(p.pr, 6) AS ppr
FROM pr{PPR_ITERS} p JOIN deg dg ON dg.src = p.node
ORDER BY ppr DESC, part_id ASC LIMIT {PPR_TOP}
"""
    return head + ",\n" + iters + final


@register(
    "graph_personalized_pagerank",
    family="graph",
    doc="Personalized PageRank over the part co-purchase graph with the "
    "Brand#11 parts as seed set (operators/pagerank.py::"
    "personalized_pagerank, 3 unrolled iterations, d=0.85): teleport "
    "mass returns to the SEEDS, so rank = proximity to the brand — "
    "the 'related items' a co-purchase recommender surfaces.  Same "
    "determinism contract as graph_pagerank_centrality (decimal-"
    "staged contribution sums, 12-dp per-iteration rounds), oracle "
    "replays all three iterations as MATERIALIZED CTEs.  The "
    "symmetrized graph has no sinks, so the dangling-to-seeds term "
    "is identically zero here; its handling is pytest-covered on "
    "directed inputs.  Scale shape: one dst-keyed aggregate per "
    "iteration; seed flags ride the (node)-sized rank vector.",
    oracle=_ppr_oracle(),
)
def graph_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pagerank import personalized_pagerank

    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < PPR_ORDER_CAP)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("b"))
    e0 = (
        a.join(b, (a["ok"] == b["ok"]) & (F.col("a") < F.col("b")))
        .select("a", "b")
        .distinct()
    )
    edges = e0.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(e0.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    seeds = (
        table(spark, sf_dir, "part")
        .where(F.col("p_brand") == PPR_BRAND)
        .select(F.col("p_partkey").alias("node"))
    )
    out = personalized_pagerank(
        edges, seeds, iters=PPR_ITERS, damping=PPR_D
    )
    return (
        out.select(
            F.col("node").alias("part_id"),
            F.col("degree").cast("bigint").alias("degree"),
            F.col("is_seed").cast("bigint").alias("is_seed"),
            F.round(F.col("pr"), 6).alias("ppr"),
        )
        .orderBy(F.col("ppr").desc(), F.col("part_id").asc())
        .limit(PPR_TOP)
    )


# ---------------------------------------------------------------------------
# Perceptual-hash image dedup groups
# ---------------------------------------------------------------------------


@register(
    "multimodal_phash_groups",
    family="multimodal",
    doc="Perceptual image dedup by 64-bit average hash "
    "(operators/multimodal.py::png_average_hash): REAL PNG decode "
    "(stdlib inflate + all-5-filter unfilter), integer BT.601 luma, "
    "nearest-neighbor 8x8 sample, mean-threshold bits packed into two "
    "BIGINT halves — then ONE hash aggregate groups identical-looking "
    "images (group sizes, canonical min id).  This is the first-pass "
    "image dedup of a multimodal corpus: no pair joins at all, the "
    "grouping key is the hash itself, map-side combinable at any "
    "scale.  The oracle recomputes every sampled luma, the threshold "
    "compare, and the bit packing from the closed-form pixel "
    "arithmetic — a one-bit drift anywhere in decode, resize index "
    "math, luma rounding, or packing splits a group and breaks the "
    "hash.  (Banded hamming-LSH was evaluated and intentionally NOT "
    "used here: the synthetic gradient corpus is aHash-degenerate — "
    "2.4k pairs at hamming 0 — so near-dup banding adds no pruning; "
    "dedup_ssjoin_prefix carries the banded-candidate pattern.)",
    oracle="""
WITH dims AS (
  SELECT doc_id, doc_id % 24 + 4 AS w, doc_id % 16 + 4 AS h FROM documents
),
grid AS (
  SELECT doc_id, (i.i * w) // 8 AS x, (j.j * h) // 8 AS y,
         j.j * 8 + i.i AS k
  FROM dims, UNNEST(range(0, 8)) AS j(j), UNNEST(range(0, 8)) AS i(i)
),
luma AS (
  SELECT doc_id, k,
         (299 * ((doc_id * 7 + 3 * x + 5 * y) % 256)
          + 587 * ((doc_id * 7 + 3 * x + 5 * y + 11) % 256)
          + 114 * ((doc_id * 7 + 3 * x + 5 * y + 22) % 256)) // 1000 AS l
  FROM grid
),
tot AS (SELECT doc_id, SUM(l) AS s FROM luma GROUP BY doc_id),
bits AS (
  SELECT luma.doc_id, k, CASE WHEN l * 64 > s THEN 1 ELSE 0 END AS b
  FROM luma JOIN tot ON tot.doc_id = luma.doc_id
),
hashes AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN k >= 32
                  THEN b * (CAST(1 AS BIGINT) << (k - 32)) ELSE 0 END)
              AS BIGINT) AS ahash_hi,
         CAST(SUM(CASE WHEN k < 32
                  THEN b * (CAST(1 AS BIGINT) << k) ELSE 0 END)
              AS BIGINT) AS ahash_lo
  FROM bits GROUP BY doc_id
)
SELECT ahash_hi, ahash_lo,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(MIN(doc_id) AS BIGINT) AS min_image_id,
       CAST(SUM(doc_id) AS BIGINT) AS sum_image_id
FROM hashes GROUP BY 1, 2
""",
)
def multimodal_phash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import png_average_hash, synthesize_png_media

    d = table(spark, sf_dir, "documents")
    hashes = png_average_hash(synthesize_png_media(d.select("doc_id")))
    return hashes.groupBy("ahash_hi", "ahash_lo").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_images"),
        F.min("image_id").cast("bigint").alias("min_image_id"),
        F.sum("image_id").cast("bigint").alias("sum_image_id"),
    )


# ---------------------------------------------------------------------------
# Audio silence segmentation (frame-energy VAD)
# ---------------------------------------------------------------------------

AUDIO_FRAME = 16


@register(
    "multimodal_audio_silence_segments",
    family="multimodal",
    doc="Frame-energy silence segmentation over the REAL PCM decode path "
    "(operators/multimodal.py::wav_energy_segments) — the VAD-style "
    "preprocessing that trims/segments silence before audio feature "
    "extraction: per clip, 16-sample frame energies (integer Σ s² "
    "across channels), QUIET iff 2·energy·n_frames < total_energy "
    "(integer cross-multiplied half-mean), quiet runs counted "
    "gaps-and-islands style.  Exact integer arithmetic end-to-end; "
    "the oracle replays frame grouping, the energy threshold, and the "
    "island numbering from the closed-form sample formula — drift in "
    "chunk offsets, int16 decode, frame boundaries, or run logic "
    "breaks the hash.  Scale shape: one mapInPandas over the blobs "
    "(narrow row out per clip), no shuffle at all.",
    oracle=f"""
WITH dims AS (
  SELECT doc_id, doc_id % 100 + 1 AS n, doc_id % 2 + 1 AS ch FROM documents
),
samples AS (
  SELECT doc_id, si.i // {AUDIO_FRAME} AS f,
         (doc_id * 13 + 7 * si.i + 3 * ci.c) % 2003 - 1001 AS s
  FROM dims,
       UNNEST(range(0, n)) AS si(i),
       UNNEST(range(0, ch)) AS ci(c)
),
fe AS (
  SELECT doc_id, f, CAST(SUM(s * s) AS BIGINT) AS e
  FROM samples GROUP BY 1, 2
),
tot AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nf,
         CAST(SUM(e) AS BIGINT) AS tot
  FROM fe GROUP BY 1
),
q AS (
  SELECT fe.doc_id, f,
         CASE WHEN 2 * e * nf < tot THEN 1 ELSE 0 END AS quiet
  FROM fe JOIN tot ON tot.doc_id = fe.doc_id
),
isl AS (
  SELECT doc_id, f, quiet,
         f - ROW_NUMBER() OVER (PARTITION BY doc_id, quiet ORDER BY f) AS grp
  FROM q
),
runs AS (
  SELECT doc_id, COUNT(*) AS len FROM isl WHERE quiet = 1
  GROUP BY doc_id, grp
),
seg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_seg,
         CAST(MAX(len) AS BIGINT) AS longest
  FROM runs GROUP BY doc_id
),
nq AS (SELECT doc_id, CAST(SUM(quiet) AS BIGINT) AS n_quiet FROM q GROUP BY 1)
SELECT t.doc_id AS audio_id,
       t.nf AS n_frames,
       COALESCE(nq.n_quiet, 0) AS n_quiet,
       COALESCE(seg.n_seg, 0) AS n_quiet_segments,
       COALESCE(seg.longest, 0) AS longest_quiet_run,
       t.tot AS total_energy
FROM tot t
LEFT JOIN nq ON nq.doc_id = t.doc_id
LEFT JOIN seg ON seg.doc_id = t.doc_id
""",
)
def multimodal_audio_silence_segments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.multimodal import synthesize_pcm_audio, wav_energy_segments

    d = table(spark, sf_dir, "documents")
    return wav_energy_segments(
        synthesize_pcm_audio(d.select("doc_id")), frame=AUDIO_FRAME
    )


# ---------------------------------------------------------------------------
# Clustering-evaluation metrics vs gold labels (ARI + NMI)
# ---------------------------------------------------------------------------


@register(
    "quality_adjusted_rand",
    family="quality",
    doc="Clustering evaluation against gold labels: the seeded IVF "
    "coarse assignment (operators/ivf.py, iters=0 — the same "
    "closed-form quantizer ann_ivf_topk hash-checks) is scored "
    "against the embeddings' label column with the Adjusted Rand "
    "Index and Normalized Mutual Information — the two standard "
    "external cluster-quality metrics an embedding-pipeline eval "
    "reports.  ARI is computed from the integer contingency table "
    "(all pair counts exact BIGINTs; only the final divisions float), "
    "NMI from the same table with identical LN expression trees.  "
    "Scale shape: assignment is the broadcast-argmin pass, the "
    "contingency table is (n_cells x n_labels)-bounded, metrics are "
    "computed on that tiny frame; corpus scalars ride broadcast "
    "cross joins.",
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
cont AS (
  SELECT c.cid, e.label, CAST(COUNT(*) AS BIGINT) AS nij
  FROM cells c JOIN embeddings e ON e.vec_id = c.item_id
  GROUP BY 1, 2
),
ai AS (SELECT cid, CAST(SUM(nij) AS BIGINT) AS a FROM cont GROUP BY cid),
bj AS (SELECT label, CAST(SUM(nij) AS BIGINT) AS b FROM cont GROUP BY label),
nn AS (SELECT CAST(SUM(nij) AS BIGINT) AS n FROM cont),
sums AS (
  SELECT
    (SELECT CAST(SUM(nij * (nij - 1) // 2) AS BIGINT) FROM cont) AS sij,
    (SELECT CAST(SUM(a * (a - 1) // 2) AS BIGINT) FROM ai) AS sa,
    (SELECT CAST(SUM(b * (b - 1) // 2) AS BIGINT) FROM bj) AS sb,
    (SELECT CAST(n * (n - 1) // 2 AS BIGINT) FROM nn) AS c2n,
    (SELECT n FROM nn) AS n,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM ai) AS n_clusters,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM bj) AS n_classes
),
mi AS (
  SELECT SUM(CAST(nij AS DOUBLE) / nn.n
             * LN(CAST(nn.n AS DOUBLE) * nij / (ai.a * bj.b))) AS i
  FROM cont JOIN ai USING (cid) JOIN bj USING (label) CROSS JOIN nn
),
hu AS (
  SELECT -SUM(CAST(a AS DOUBLE) / nn.n * LN(CAST(a AS DOUBLE) / nn.n)) AS h
  FROM ai CROSS JOIN nn
),
hv AS (
  SELECT -SUM(CAST(b AS DOUBLE) / nn.n * LN(CAST(b AS DOUBLE) / nn.n)) AS h
  FROM bj CROSS JOIN nn
)
SELECT n, n_clusters, n_classes,
       ROUND((sij - CAST(sa AS DOUBLE) * sb / c2n)
             / (0.5 * (sa + sb) - CAST(sa AS DOUBLE) * sb / c2n), 6) AS ari,
       ROUND(mi.i / sqrt(hu.h * hv.h), 6) AS nmi
FROM sums, mi, hu, hv
""",
)
def quality_adjusted_rand(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import ivf as I

    e = table(spark, sf_dir, "embeddings")
    cents = I.train_centroids(e, nlist=8, iters=0)
    cells = I.assign_cells(e, cents).select("item_id", "cid")
    cont = (
        cells.join(e.select(F.col("vec_id").alias("item_id"), "label"), "item_id")
        .groupBy("cid", "label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nij"))
        # materialize the (n_cells x n_labels)-bounded contingency table
        # once: seven downstream aggregates reference it, and without the
        # checkpoint each re-runs the assignment pipeline (measured: 54
        # exchanges -> 8)
        .localCheckpoint()
    )
    ai = cont.groupBy("cid").agg(F.sum("nij").cast("bigint").alias("a"))
    bj = cont.groupBy("label").agg(F.sum("nij").cast("bigint").alias("b"))
    nn = cont.agg(F.sum("nij").cast("bigint").alias("n"))

    sums = (
        cont.agg(
            F.sum(F.expr("nij * (nij - 1) div 2")).cast("bigint").alias("sij")
        )
        .crossJoin(
            F.broadcast(
                ai.agg(
                    F.sum(F.expr("a * (a - 1) div 2")).cast("bigint").alias("sa"),
                    F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                bj.agg(
                    F.sum(F.expr("b * (b - 1) div 2")).cast("bigint").alias("sb"),
                    F.count(F.lit(1)).cast("bigint").alias("n_classes"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                nn.select(
                    "n",
                    F.expr("n * (n - 1) div 2").cast("bigint").alias("c2n"),
                )
            )
        )
    )
    mi = (
        cont.join(ai, "cid")
        .join(bj, "label")
        .crossJoin(F.broadcast(nn))
        .agg(
            F.sum(
                F.col("nij").cast("double")
                / F.col("n")
                * F.log(
                    F.col("n").cast("double")
                    * F.col("nij")
                    / (F.col("a") * F.col("b"))
                )
            ).alias("i")
        )
    )
    hu = (
        ai.crossJoin(F.broadcast(nn))
        .agg(
            (-F.sum(
                F.col("a").cast("double") / F.col("n")
                * F.log(F.col("a").cast("double") / F.col("n"))
            )).alias("hu")
        )
    )
    hv = (
        bj.crossJoin(F.broadcast(nn))
        .agg(
            (-F.sum(
                F.col("b").cast("double") / F.col("n")
                * F.log(F.col("b").cast("double") / F.col("n"))
            )).alias("hv")
        )
    )
    expected = F.col("sa").cast("double") * F.col("sb") / F.col("c2n")
    return (
        sums.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hu))
        .crossJoin(F.broadcast(hv))
        .select(
            "n",
            "n_clusters",
            "n_classes",
            F.round(
                (F.col("sij") - expected)
                / (F.lit(0.5) * (F.col("sa") + F.col("sb")) - expected),
                6,
            ).alias("ari"),
            F.round(
                F.col("i") / F.sqrt(F.col("hu") * F.col("hv")), 6
            ).alias("nmi"),
        )
    )


# ---------------------------------------------------------------------------
# Distributed Gram matrix (map-side partial X^T X)
# ---------------------------------------------------------------------------


@register(
    "embedding_gram_matrix",
    family="similarity",
    doc="Gram matrix X^T X over the embedding corpus "
    "(operators/linalg.py::gram_matrix) — the covariance/PCA/whitening "
    "primitive — computed the scale-correct way: every Arrow batch "
    "reduces its rows to a LOCAL d x d partial (numpy BLAS), and only "
    "P·d² (i, j, partial) triples shuffle to the final sums — traffic "
    "independent of corpus size, vs the n·d² pair-explode or the "
    "ship-all-vectors single reducer.  Upper triangle only (symmetric); "
    "6-dp rounding absorbs the partial-vs-sequential association "
    "difference.  The oracle computes every entry by the naive "
    "per-element expansion — equality proves the blocked decomposition "
    "computes exactly Σ v_i·v_j.",
    oracle="""
WITH vecs AS (
  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)
SELECT CAST(ij.i AS INT) AS i, CAST(ij.j AS INT) AS j,
       ROUND(SUM(v[ij.i + 1] * v[ij.j + 1]), 6) AS gram
FROM vecs,
     (SELECT a.i, b.j FROM UNNEST(range(0, 64)) a(i), UNNEST(range(0, 64)) b(j)
      WHERE a.i <= b.j) ij
GROUP BY 1, 2
""",
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.linalg import gram_matrix

    e = table(spark, sf_dir, "embeddings")
    g = gram_matrix(e, "embedding", upper_only=True)
    return g.select("i", "j", F.round(F.col("gram"), 6).alias("gram"))


# ---------------------------------------------------------------------------
# Temporal anti-join: views with no purchase inside the attribution window
# ---------------------------------------------------------------------------

ATTR_WINDOW = "1 HOUR"


@register(
    "join_temporal_anti_window",
    family="join",
    doc="Temporal ANTI-join — absence of a follow-up event inside an "
    "attribution window: per user, the views with NO purchase by the "
    "same user within the following hour (the complement of "
    "events_view_click_attribution's positive match).  Spark plans "
    "this as an equi-key LEFT ANTI on user_id with the time band as "
    "join FILTER (BroadcastHashJoin LeftAnti here; sort-merge anti "
    "once the purchase side outgrows broadcast) — no cartesian "
    "anywhere; at 100 TB both sides shuffle once on user_id and the "
    "band runs inside the join.  Exact counts only; conversion-gap "
    "ratio rounded at the edge.",
    oracle=f"""
WITH v AS (
  SELECT user_id, ts FROM events WHERE event_type = 'view'
),
p AS (
  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
),
flagged AS (
  SELECT v.user_id,
         CASE WHEN EXISTS (
           SELECT 1 FROM p
           WHERE p.user_id = v.user_id
             AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL {ATTR_WINDOW}
         ) THEN 0 ELSE 1 END AS unconverted
  FROM v
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_views,
       CAST(SUM(unconverted) AS BIGINT) AS n_unconverted,
       ROUND(CAST(SUM(unconverted) AS DOUBLE) / COUNT(*), 6) AS gap_rate
FROM flagged GROUP BY user_id ORDER BY user_id
""",
)
def join_temporal_anti_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    v = ev.where(F.col("event_type") == "view").select("user_id", "ts")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    cond = (
        (v["user_id"] == p["pu"])
        & (p["pts"] > v["ts"])
        & (p["pts"] <= v["ts"] + F.expr(f"INTERVAL {ATTR_WINDOW}"))
    )
    unconv = v.join(p, cond, "left_anti").groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_unconverted")
    )
    views = v.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_views")
    )
    return (
        views.join(unconv, "user_id", "left")
        .select(
            "user_id",
            "n_views",
            F.coalesce(F.col("n_unconverted"), F.lit(0))
            .cast("bigint")
            .alias("n_unconverted"),
            F.round(
                F.coalesce(F.col("n_unconverted"), F.lit(0)).cast("double")
                / F.col("n_views"),
                6,
            ).alias("gap_rate"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Market-basket association rules
# ---------------------------------------------------------------------------

RULES_MINSUP = 2  # absolute pair-support floor
RULES_TOP = 20


@register(
    "mine_association_rules",
    family="dedup",
    doc="Market-basket association rules over the order→parts baskets "
    "(the full lineitem, no demo cap): distinct per-order item sets, "
    "pair supports c_ij (a<b, floor 2), and both rule directions "
    "a→b / b→a scored with support, confidence and lift — the "
    "classic co-occurrence mining a recommender bootstrap runs.  "
    "Top-20 by (ROUND(lift,6) DESC, antecedent, consequent) via "
    "orderBy().limit(); ratios are rationals of exact counts rounded "
    "at the edge, so ordering and values agree across engines.  "
    "Scale shape (r6): the pair expansion goes through the A-PRIORI "
    "prune (operators/apriori.py::pair_supports) — items below the "
    "pair-support floor are dropped by a broadcast semi-join BEFORE "
    "the self-join (lossless by anti-monotonicity: support(a,b) <= "
    "min(support(a), support(b)), so the surviving pair counts and "
    "hashes are identical), bounding per-basket fan-out by FREQUENT-"
    "item width instead of raw width — the guard against the hot "
    "basket that turns the naive join quadratic.  Pair counts then "
    "shuffle once on (a, b), item counts join back by key, the "
    "basket total rides a broadcast cross join.  The oracle "
    "intentionally keeps the unpruned all-pairs formulation: "
    "equality IS the losslessness proof.",
    oracle=f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
nb AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM li),
ic AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM li GROUP BY 1),
pc AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b, CAST(COUNT(*) AS BIGINT) AS c
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {RULES_MINSUP}
),
rules AS (
  SELECT a AS antecedent, b AS consequent, c FROM pc
  UNION ALL
  SELECT b, a, c FROM pc
),
scored AS (
  SELECT r.antecedent, r.consequent, r.c AS pair_support,
         ia.c AS ant_count, ic2.c AS cons_count,
         ROUND(CAST(r.c AS DOUBLE) / nb.n, 6) AS support,
         ROUND(CAST(r.c AS DOUBLE) / ia.c, 6) AS confidence,
         ROUND(CAST(r.c AS DOUBLE) * nb.n / (ia.c * ic2.c), 6) AS lift
  FROM rules r
  JOIN ic ia ON ia.l_partkey = r.antecedent
  JOIN ic ic2 ON ic2.l_partkey = r.consequent
  CROSS JOIN nb
)
SELECT * FROM scored
ORDER BY lift DESC, antecedent ASC, consequent ASC LIMIT {RULES_TOP}
""",
)
def mine_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        # five consumers (basket total, item counts, the a-priori prune
        # and both pair sides) — materialize the distinct ONCE instead
        # of replanning it per branch (0 ReusedExchange otherwise)
        .localCheckpoint(eager=True)
    )
    nb = li.agg(F.count_distinct("l_orderkey").cast("bigint").alias("n"))
    ic = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    from ..operators.apriori import pair_supports

    pc = pair_supports(
        li,
        "l_orderkey",
        "l_partkey",
        RULES_MINSUP,
        item_counts=ic.select("l_partkey", "c"),
    )
    rules = pc.select(
        F.col("a").alias("antecedent"), F.col("b").alias("consequent"), "c"
    ).unionAll(
        pc.select(
            F.col("b").alias("antecedent"), F.col("a").alias("consequent"), "c"
        )
    )
    scored = (
        rules.join(
            ic.select(F.col("l_partkey").alias("antecedent"), F.col("c").alias("ant_count")),
            "antecedent",
        )
        .join(
            ic.select(F.col("l_partkey").alias("consequent"), F.col("c").alias("cons_count")),
            "consequent",
        )
        .crossJoin(F.broadcast(nb))
        .select(
            "antecedent",
            "consequent",
            F.col("c").alias("pair_support"),
            "ant_count",
            "cons_count",
            F.round(F.col("c").cast("double") / F.col("n"), 6).alias("support"),
            F.round(F.col("c").cast("double") / F.col("ant_count"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("c").cast("double") * F.col("n")
                / (F.col("ant_count") * F.col("cons_count")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), F.col("antecedent").asc(), F.col("consequent").asc()
    ).limit(RULES_TOP)


# ---------------------------------------------------------------------------
# Regex scalar battery
# ---------------------------------------------------------------------------


@register(
    "scalar_regex_battery",
    family="scalar",
    doc="Regex scalar-function battery over customer names "
    "(c_custkey < 50): capture-group extract, extract-all counting, "
    "pattern replace, boolean match, and regex split arity — the "
    "regexp surface (regexp_extract / regexp_extract_all / "
    "regexp_replace / rlike / split) mapped one-to-one onto DuckDB's "
    "(regexp_extract / regexp_extract_all / regexp_replace / "
    "regexp_matches / string_split_regex).  All codegen-side in "
    "Spark; per-row outputs keep both engines' trailing-empty split "
    "semantics honest.",
    oracle="""
SELECT c_custkey,
       regexp_extract(c_name, '([0-9]+)', 1) AS digits,
       CAST(len(regexp_extract_all(c_name, '0')) AS BIGINT) AS n_zeros,
       regexp_replace(c_name, '0+', '-', 'g') AS dashed,
       CAST(CASE WHEN regexp_matches(c_name, '[13579]$') THEN 1 ELSE 0 END
            AS INT) AS odd_tail,
       CAST(len(string_split_regex(c_name, '0+')) AS BIGINT) AS n_splits
FROM customer WHERE c_custkey < 50 ORDER BY c_custkey
""",
)
def scalar_regex_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").where(F.col("c_custkey") < 50)
    return c.select(
        "c_custkey",
        F.regexp_extract(F.col("c_name"), "([0-9]+)", 1).alias("digits"),
        F.size(F.regexp_extract_all(F.col("c_name"), F.lit("0"), 0))
        .cast("bigint")
        .alias("n_zeros"),
        F.regexp_replace(F.col("c_name"), "0+", "-").alias("dashed"),
        F.col("c_name").rlike("[13579]$").cast("int").alias("odd_tail"),
        F.size(F.split(F.col("c_name"), "0+")).cast("bigint").alias("n_splits"),
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# Cohort LTV curve
# ---------------------------------------------------------------------------


@register(
    "events_cohort_ltv",
    family="timeseries",
    doc="Cohort lifetime-value curve: users are cohorted by signup week "
    "(first 'signup' event), purchase value accrues per (cohort, age "
    "week), and the running LTV per user comes from a broadcast "
    "triangular join over the age domain — weeks-since-signup is "
    "calendar-bounded, so no window ever sees corpus-sized input.  "
    "Value sums are DECIMAL-staged; the per-user division happens "
    "once at the edge.  The revenue companion of "
    "events_retention_cohorts.",
    oracle="""
WITH signup AS (
  SELECT user_id, MIN(ts) AS s FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
cohort AS (
  SELECT user_id, CAST(date_trunc('week', s) AS DATE) AS cw, s FROM signup
),
cohort_size AS (
  SELECT cw, CAST(COUNT(*) AS BIGINT) AS n_users FROM cohort GROUP BY cw
),
pur AS (
  SELECT c.cw,
         CAST(FLOOR(CAST(datediff('second', c.s, e.ts) AS DOUBLE)
                    / 604800) AS BIGINT) AS age_w,
         CAST(e.value AS DECIMAL(18,6)) AS v
  FROM events e JOIN cohort c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.s
),
per AS (
  SELECT cw, age_w, CAST(COUNT(*) AS BIGINT) AS n_purchases,
         SUM(v) AS rev
  FROM pur GROUP BY cw, age_w
),
cum AS (
  SELECT a.cw, a.age_w,
         CAST(SUM(b.n_purchases) AS BIGINT) AS cum_purchases,
         CAST(SUM(b.rev) AS DOUBLE) AS cum_rev
  FROM per a JOIN per b ON b.cw = a.cw AND b.age_w <= a.age_w
  GROUP BY a.cw, a.age_w
)
SELECT CAST(c.cw AS VARCHAR) AS cohort_week, c.age_w, s.n_users,
       c.cum_purchases,
       ROUND(c.cum_rev, 6) AS cum_revenue,
       ROUND(c.cum_rev / s.n_users, 6) AS ltv_per_user
FROM cum c JOIN cohort_size s ON s.cw = c.cw
ORDER BY cohort_week, age_w
""",
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    signup = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s"))
    )
    cohort = signup.select(
        "user_id", F.date_trunc("week", "s").cast("date").alias("cw"), "s"
    )
    cohort_size = cohort.groupBy("cw").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    pur = (
        ev.where(F.col("event_type") == "purchase")
        .join(cohort, "user_id")
        .where(F.col("ts") >= F.col("s"))
        .select(
            "cw",
            # timestampdiff is timezone-free on NTZ inputs — a
            # unix_timestamp difference would shift by the DST delta when
            # the driver session runs in a zone with a transition between
            # signup and purchase
            F.floor(
                F.expr("timestampdiff(SECOND, s, ts)").cast("double") / 604800
            )
            .cast("bigint")
            .alias("age_w"),
            F.col("value").cast("decimal(18,6)").alias("v"),
        )
    )
    per = pur.groupBy("cw", "age_w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.sum("v").alias("rev"),
    )
    a = per.select(
        F.col("cw").alias("cwa"), F.col("age_w").alias("aga")
    )
    cum = (
        a.join(
            F.broadcast(per),
            (F.col("cw") == F.col("cwa")) & (F.col("age_w") <= F.col("aga")),
        )
        .groupBy("cwa", "aga")
        .agg(
            F.sum("n_purchases").cast("bigint").alias("cum_purchases"),
            F.sum("rev").cast("double").alias("cum_rev"),
        )
    )
    return (
        cum.join(cohort_size, cum["cwa"] == cohort_size["cw"])
        .select(
            F.col("cwa").cast("string").alias("cohort_week"),
            F.col("aga").alias("age_w"),
            "n_users",
            "cum_purchases",
            F.round(F.col("cum_rev"), 6).alias("cum_revenue"),
            F.round(F.col("cum_rev") / F.col("n_users"), 6).alias(
                "ltv_per_user"
            ),
        )
        .orderBy("cohort_week", "age_w")
    )


# ---------------------------------------------------------------------------
# Percent-of-parent rollup shares
# ---------------------------------------------------------------------------


@register(
    "agg_pct_of_parent",
    family="agg",
    doc="Hierarchical share-of-parent report: revenue per (nation, "
    "segment) with its share of the nation subtotal and of the grand "
    "total — the percent-of-parent columns every BI rollup adds, "
    "expressed as joins of three aggregate levels (leaf ⋈ nation ⋈ "
    "grand) instead of partition-spanning windows: each level is one "
    "hash aggregate, the upper levels are dimension-sized and "
    "broadcast.  Money exact via DECIMAL staging; shares rounded at "
    "the edge.",
    oracle="""
WITH leaf AS (
  SELECT c_nationkey AS nation, c_mktsegment AS segment,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
nat AS (SELECT nation, SUM(rev) AS nrev FROM leaf GROUP BY nation),
tot AS (SELECT SUM(rev) AS trev FROM leaf)
SELECT l.nation AS nation, l.segment AS segment, l.n_orders AS n_orders,
       CAST(l.rev AS DOUBLE) AS revenue,
       ROUND(CAST(l.rev AS DOUBLE) / CAST(n.nrev AS DOUBLE), 6)
         AS pct_of_nation,
       ROUND(CAST(l.rev AS DOUBLE) / CAST(t.trev AS DOUBLE), 6)
         AS pct_of_total
FROM leaf l JOIN nat n ON n.nation = l.nation CROSS JOIN tot t
ORDER BY l.nation, l.segment
""",
)
def agg_pct_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    leaf = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("rev"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
    )
    nat = leaf.groupBy("nation").agg(F.sum("rev").alias("nrev"))
    tot = leaf.agg(F.sum("rev").alias("trev"))
    return (
        leaf.join(F.broadcast(nat), "nation")
        .crossJoin(F.broadcast(tot))
        .select(
            "nation",
            "segment",
            "n_orders",
            F.col("rev").cast("double").alias("revenue"),
            F.round(
                F.col("rev").cast("double") / F.col("nrev").cast("double"), 6
            ).alias("pct_of_nation"),
            F.round(
                F.col("rev").cast("double") / F.col("trev").cast("double"), 6
            ).alias("pct_of_total"),
        )
        .orderBy("nation", "segment")
    )


# ---------------------------------------------------------------------------
# Sliding-window rollup (batch twin of the streaming sliding shape)
# ---------------------------------------------------------------------------


@register(
    "events_sliding_window_rollup",
    family="timeseries",
    doc="Sliding-window rollup: 2-hour windows advancing every hour "
    "(each event contributes to exactly two windows), counts and "
    "DECIMAL-staged value sums per (window, event_type) — F.window "
    "with a slide in Spark; the oracle materializes each event's two "
    "epoch-aligned window starts explicitly (trunc(ts) and "
    "trunc(ts)−1h) and groups, proving the window-assignment "
    "semantics rather than assuming them.  Scale shape: the slide "
    "fans each row out by window/slide (=2 here) map-side, then one "
    "hash aggregate — same cost model as the streaming twin in "
    "streaming/events.py.",
    oracle="""
WITH ex AS (
  SELECT event_type, CAST(value AS DECIMAL(18,6)) AS v, ws
  FROM events,
       UNNEST([date_trunc('hour', ts),
               date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS t(ws)
)
SELECT CAST(ws AS VARCHAR) AS window_start,
       CAST(ws + INTERVAL 2 HOUR AS VARCHAR) AS window_end,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(v) AS DOUBLE) AS sum_value
FROM ex GROUP BY ws, event_type
ORDER BY window_start, event_type
""",
)
def events_sliding_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = F.window("ts", "2 hours", "1 hour")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            F.col("w.end").cast("string").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# Neyman optimal sampling allocation
# ---------------------------------------------------------------------------

NEYMAN_BUDGET = 100


@register(
    "sample_neyman_allocation",
    family="curation",
    doc="Neyman optimal allocation for stratified sampling: given a "
    "100-document budget, each source stratum h receives "
    "n_h = floor(B · N_h·S_h / Σ N_h·S_h) — proportional to stratum "
    "size times stratum standard deviation (of document length), the "
    "variance-minimizing allocation for estimating the corpus mean.  "
    "The sampling-design complement of curation_mixture_weights.  "
    "S_h comes from exact integer power sums (n·Σx² − (Σx)²); the "
    "allocation floors a 6-dp-rounded share so both engines truncate "
    "the same decimal.  Scale shape: one (source) aggregate over the "
    "corpus, allocation math on the source-bounded frame, the "
    "denominator scalar rides a broadcast cross join.",
    oracle=f"""
WITH st AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS sx,
         CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
  FROM documents GROUP BY source
),
sd AS (
  SELECT source, n_docs,
         sqrt((n_docs * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
              / (CAST(n_docs AS DOUBLE) * (n_docs - 1))) AS s
  FROM st WHERE n_docs > 1
),
tot AS (SELECT SUM(n_docs * s) AS denom FROM sd)
SELECT source, n_docs,
       ROUND(s, 6) AS stddev_len,
       ROUND(n_docs * s / denom, 6) AS share,
       CAST(FLOOR(ROUND({NEYMAN_BUDGET} * n_docs * s / denom, 6)) AS BIGINT)
         AS alloc
FROM sd CROSS JOIN tot ORDER BY source
""",
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    st = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("sxx"),
    )
    sd = st.where(F.col("n_docs") > 1).select(
        "source",
        "n_docs",
        F.sqrt(
            (
                F.col("n_docs") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx")
            )
            / (F.col("n_docs").cast("double") * (F.col("n_docs") - 1))
        ).alias("s"),
    )
    tot = sd.agg(F.sum(F.col("n_docs") * F.col("s")).alias("denom"))
    return (
        sd.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.round(F.col("s"), 6).alias("stddev_len"),
            F.round(F.col("n_docs") * F.col("s") / F.col("denom"), 6).alias(
                "share"
            ),
            F.floor(
                F.round(
                    F.lit(NEYMAN_BUDGET) * F.col("n_docs") * F.col("s")
                    / F.col("denom"),
                    6,
                )
            )
            .cast("bigint")
            .alias("alloc"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Pythagorean-means battery
# ---------------------------------------------------------------------------


@register(
    "agg_mean_battery",
    family="agg",
    doc="Pythagorean means per return flag: arithmetic, geometric "
    "(exp of mean log — the only scalable formulation; a product "
    "aggregate overflows), harmonic (n / Σ 1/x), and quadratic (RMS) "
    "means of lineitem quantity, plus the AM >= GM >= HM ordering "
    "surfaced as a check column.  LN/EXP/SQRT with identical "
    "expression trees both engines, 6-dp rounding at the edge; "
    "quantities are strictly positive so every mean is defined.  "
    "Scale shape: one hash aggregate, four accumulators.",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(l_quantity) / COUNT(*), 6) AS mean_arith,
       ROUND(EXP(SUM(LN(l_quantity)) / COUNT(*)), 6) AS mean_geo,
       ROUND(COUNT(*) / SUM(1.0 / l_quantity), 6) AS mean_harm,
       ROUND(SQRT(SUM(l_quantity * l_quantity) / COUNT(*)), 6) AS mean_quad,
       CAST(CASE WHEN SUM(l_quantity) / COUNT(*)
                      >= EXP(SUM(LN(l_quantity)) / COUNT(*))
                  AND EXP(SUM(LN(l_quantity)) / COUNT(*))
                      >= COUNT(*) / SUM(1.0 / l_quantity)
            THEN 1 ELSE 0 END AS INT) AS am_gm_hm_ok
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def agg_mean_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    n = F.count(F.lit(1))
    am = F.sum(q) / n
    gm = F.exp(F.sum(F.log(q)) / n)
    hm = n / F.sum(F.lit(1.0) / q)
    return (
        l.groupBy("l_returnflag")
        .agg(
            n.cast("bigint").alias("n"),
            F.round(am, 6).alias("mean_arith"),
            F.round(gm, 6).alias("mean_geo"),
            F.round(hm, 6).alias("mean_harm"),
            F.round(F.sqrt(F.sum(q * q) / n), 6).alias("mean_quad"),
            F.when((am >= gm) & (gm >= hm), 1).otherwise(0).cast("int").alias(
                "am_gm_hm_ok"
            ),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Peak detection on the daily series (join-based, fully integer)
# ---------------------------------------------------------------------------

@register(
    "events_peak_days",
    family="timeseries",
    doc="Local-maximum peak detection on the daily event-count series, "
    "window-free and fully integer: a day is a peak when its count "
    "strictly exceeds both calendar neighbors (self-joins on day±1; "
    "a missing neighbor counts as 0).  A mean-relative prominence "
    "gate was probed and rejected: daily fluctuations shrink as "
    "sqrt(n), so any fixed multiple of the mean empties at larger "
    "SFs — the count-vs-mean ratio is surfaced as information "
    "instead.  Scale shape: the corpus collapses to the "
    "calendar-bounded day frame; neighbor lookups are key joins, the "
    "mean scalar rides a broadcast cross join.",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(y) AS BIGINT) AS ty
  FROM daily
),
peaks AS (
  SELECT a.d, a.y
  FROM daily a
  LEFT JOIN daily p ON p.d = a.d - 1
  LEFT JOIN daily n ON n.d = a.d + 1
  CROSS JOIN tot
  WHERE a.y > COALESCE(p.y, 0) AND a.y > COALESCE(n.y, 0)
)
SELECT CAST(d AS VARCHAR) AS peak_day, y AS n_events,
       ROUND(CAST(y AS DOUBLE) * (SELECT nd FROM tot)
             / (SELECT ty FROM tot), 6) AS vs_mean
FROM peaks ORDER BY peak_day
""",
)
def events_peak_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("y")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.sum("y").cast("bigint").alias("ty"),
    )
    p = daily.select(F.date_add(F.col("d"), 1).alias("d"), F.col("y").alias("py"))
    nn = daily.select(F.date_sub(F.col("d"), 1).alias("d"), F.col("y").alias("ny"))
    return (
        daily.join(p, "d", "left")
        .join(nn, "d", "left")
        .crossJoin(F.broadcast(tot))
        .where(
            (F.col("y") > F.coalesce(F.col("py"), F.lit(0)))
            & (F.col("y") > F.coalesce(F.col("ny"), F.lit(0)))
        )
        .select(
            F.col("d").cast("string").alias("peak_day"),
            F.col("y").alias("n_events"),
            F.round(
                F.col("y").cast("double") * F.col("nd") / F.col("ty"), 6
            ).alias("vs_mean"),
        )
        .orderBy("peak_day")
    )


# ---------------------------------------------------------------------------
# Baseline JPEG decode (operators/jpeg.py) — lossy codec, exact oracle
# ---------------------------------------------------------------------------


@register(
    "multimodal_jpeg_pixel_stats",
    family="multimodal",
    doc="REAL baseline-JPEG decode with nothing but stdlib struct + numpy "
    "(operators/jpeg.py::decode_baseline_jpeg — marker walk, DQT/DHT "
    "table reads with canonical Huffman reconstruction, 0xFF-stuffing-"
    "aware entropy decode of DC diffs + AC run/size symbols, dequantize "
    "through zigzag, 2-D IDCT, level shift): a deterministic corpus of "
    "genuine interleaved-Huffman JPEGs is synthesized from doc_id and "
    "decoded back inside Arrow-batched mapInPandas.  The lossy codec "
    "gets an EXACT closed-form oracle via the constant-block "
    "construction: every 8x8 block is constant at v(bx,by) = "
    "(id*11+13bx+29by) mod 256 with DC quantizer 8, so the DCT is "
    "DC-only, the DC quantizes losslessly, and decoded pixel (x,y) = "
    "v(x//8,y//8) exactly — any drift in Huffman tables, bit order, "
    "byte stuffing, zigzag, dequantization or the IDCT breaks the "
    "hash.  Narrows the codec seam to progressive/subsampled/video.  "
    "Blobs never leave the executor batch.",
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
def multimodal_jpeg_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import jpeg_pixel_stats, synthesize_jpeg_media

    d = table(spark, sf_dir, "documents")
    return jpeg_pixel_stats(synthesize_jpeg_media(d.select("doc_id")))


@register(
    "multimodal_jpeg420_color_stats",
    family="multimodal",
    doc="REAL 4:2:0 subsampled COLOR JPEG decode (operators/jpeg.py): "
    "interleaved MCUs (4 luma blocks + Cb + Cr), two quantization "
    "tables and two Huffman table pairs read from the stream, "
    "nearest-neighbor chroma upsample, JFIF inverse color transform — "
    "the full color path of the baseline codec, stdlib+numpy only.  "
    "Exact oracle via the constant-MCU construction: each 16x16 MCU "
    "is constant in integer YCbCr (chroma constrained to [80,176) to "
    "avoid the four half-even/half-away rounding boundary collisions "
    "of the JFIF floats — verified exhaustively), DC quantizer 8 makes "
    "the YCbCr round trip integer-lossless, and decoded RGB is "
    "clip(round(identical float expression trees)) per MCU — any "
    "drift in MCU interleave order, per-component DC prediction, "
    "table wiring, upsampling or the color transform breaks the hash.",
    oracle="""
WITH dims AS (
  SELECT doc_id, 16 * (doc_id % 3 + 1) AS w, 16 * (doc_id % 2 + 1) AS h
  FROM documents
),
mcus AS (
  SELECT doc_id, w, h,
         (doc_id * 5 + 7 * mxs.mx + 11 * mys.my) % 256 AS yv,
         80 + (doc_id * 3 + 13 * mxs.mx + 17 * mys.my) % 96 AS cbv,
         80 + (doc_id * 7 + 19 * mxs.mx + 23 * mys.my) % 96 AS crv
  FROM dims,
       UNNEST(range(0, w // 16)) AS mxs(mx),
       UNNEST(range(0, h // 16)) AS mys(my)
),
rgb AS (
  SELECT doc_id, w, h,
         LEAST(GREATEST(ROUND(yv + 1.402 * (crv - 128.0), 0), 0), 255) AS r,
         LEAST(GREATEST(ROUND(yv - 0.344136 * (cbv - 128.0)
                              - 0.714136 * (crv - 128.0), 0), 0), 255) AS g,
         LEAST(GREATEST(ROUND(yv + 1.772 * (cbv - 128.0), 0), 0), 255) AS b
  FROM mcus
)
SELECT doc_id AS image_id,
       CAST(MIN(w) AS INT) AS width,
       CAST(MIN(h) AS INT) AS height,
       CAST(SUM(r) * 256 AS BIGINT) AS r_sum,
       CAST(SUM(g) * 256 AS BIGINT) AS g_sum,
       CAST(SUM(b) * 256 AS BIGINT) AS b_sum,
       CAST(LEAST(MIN(r), MIN(g), MIN(b)) AS INT) AS rgb_min,
       CAST(GREATEST(MAX(r), MAX(g), MAX(b)) AS INT) AS rgb_max
FROM rgb
GROUP BY doc_id
""",
)
def multimodal_jpeg420_color_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import jpeg_color_stats, synthesize_jpeg420_media

    d = table(spark, sf_dir, "documents")
    return jpeg_color_stats(synthesize_jpeg420_media(d.select("doc_id")))
