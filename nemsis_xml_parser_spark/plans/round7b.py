"""Round-7 continuation: Brandes-sampled betweenness centrality and
deterministic k-means++ (farthest-point) seeding — the two operators the
round-6 NOTES flagged as the natural next graph/clustering additions.

Oracle discipline per plans/registry.py: every iterative operator is
fixed-iteration and replayed stage-by-stage as MATERIALIZED CTEs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import register, table

# Same co-purchase graph as graph_harmonic_closeness (round6b):
# parts co-occurring on an order, orders < CAP, seeds every 50th part.
BW_ORDER_CAP = 1000
BW_SEED_MOD = 50
BW_MAX_HOPS = 4
BW_TOPK = 15


def _betweenness_oracle() -> str:
    parts = [
        f"""WITH li AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey < {BW_ORDER_CAP}
),
e AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
adj AS MATERIALIZED (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
nodes AS MATERIALIZED (SELECT DISTINCT u AS v FROM adj),
f0 AS MATERIALIZED (
  SELECT v AS src, v, CAST(1 AS BIGINT) AS sigma FROM nodes
  WHERE v % {BW_SEED_MOD} = 0
),
vis0 AS MATERIALIZED (SELECT src, v FROM f0)"""
    ]
    for i in range(1, BW_MAX_HOPS + 1):
        parts.append(
            f"""f{i} AS MATERIALIZED (
  SELECT p.src, adj.v, CAST(SUM(p.sigma) AS BIGINT) AS sigma
  FROM adj JOIN f{i - 1} p ON adj.u = p.v
  WHERE NOT EXISTS (SELECT 1 FROM vis{i - 1} w
                    WHERE w.src = p.src AND w.v = adj.v)
  GROUP BY p.src, adj.v
),
vis{i} AS MATERIALIZED (
  SELECT src, v FROM vis{i - 1} UNION ALL SELECT src, v FROM f{i}
)"""
        )
    parts.append(
        f"""d{BW_MAX_HOPS} AS MATERIALIZED (
  SELECT src, v, CAST(0 AS DECIMAL(38,12)) AS delta FROM f{BW_MAX_HOPS}
)"""
    )
    for i in range(BW_MAX_HOPS - 1, 0, -1):
        parts.append(
            f"""t{i} AS (
  SELECT f.src AS g_src, f.v AS g_v,
         CAST(SUM(CAST(ROUND(CAST(f.sigma AS DOUBLE)
               / CAST(n.n_sigma AS DOUBLE)
               * (1.0 + CAST(n.n_delta AS DOUBLE)), 12)
             AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS s
  FROM f{i} f
  JOIN adj ON adj.u = f.v
  JOIN (SELECT d.src, d.v, d.delta AS n_delta, ff.sigma AS n_sigma
        FROM d{i + 1} d JOIN f{i + 1} ff ON ff.src = d.src AND ff.v = d.v) n
    ON n.src = f.src AND n.v = adj.v
  GROUP BY f.src, f.v
),
d{i} AS MATERIALIZED (
  SELECT f.src, f.v, COALESCE(t.s, CAST(0 AS DECIMAL(38,12))) AS delta
  FROM f{i} f LEFT JOIN t{i} t ON t.g_src = f.src AND t.g_v = f.v
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT src, v, delta FROM d{i}" for i in range(1, BW_MAX_HOPS + 1)
    )
    parts.append(f"alld AS (\n{union}\n)")
    final = f"""
SELECT CAST(v AS BIGINT) AS node,
       CAST(COUNT(*) AS BIGINT) AS n_source_paths,
       ROUND(CAST(SUM(delta) AS DOUBLE), 6) AS betweenness
FROM alld GROUP BY v
ORDER BY betweenness DESC, node ASC
LIMIT {BW_TOPK}
"""
    return ",\n".join(parts) + final


@register(
    "graph_betweenness_sampled",
    family="graph",
    doc="Hop-bounded Brandes betweenness over sampled sources "
    "(operators/betweenness.py): forward labeled BFS carries exact "
    "BIGINT shortest-path counts (one (src,v)-keyed hash aggregate "
    "per level — sigma(v) = Σ sigma(pred)); backward dependency "
    "accumulation descends the levels (delta(u) = Σ σu/σw·(1+δw) "
    "over next-level successors, round-12 terms DECIMAL-summed).  "
    "Every 50th part seeds the co-purchase graph — the Brandes–Pich "
    "sampling recipe that makes centrality affordable at scale: cost "
    "is |seeds|·levels frontier joins, never |V|² — and 4-hop "
    "bounding makes each phase a fixed, oracle-replayable join "
    "count.  Top-15 by summed dependency with full tie-break.",
    oracle=_betweenness_oracle(),
)
def graph_betweenness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.betweenness import betweenness_sampled

    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < BW_ORDER_CAP)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("b"))
    e = (
        a.join(b, (a["ok"] == b["ok"]) & (F.col("a") < F.col("b")))
        .select("a", "b")
        .distinct()
    )
    adj = (
        e.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(e.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .localCheckpoint()
    )
    seeds = (
        adj.select("u")
        .distinct()
        .withColumnRenamed("u", "v")
        .where(F.col("v") % BW_SEED_MOD == 0)
    )
    bc = betweenness_sampled(adj, seeds, BW_MAX_HOPS)
    return (
        bc.select(
            F.col("v").cast("bigint").alias("node"),
            "n_source_paths",
            F.round(F.col("betweenness").cast("double"), 6).alias(
                "betweenness"
            ),
        )
        .orderBy(F.col("betweenness").desc(), F.col("node").asc())
        .limit(BW_TOPK)
    )


# ---------------------------------------------------------------------------
# Deterministic k-means++ (greedy farthest-point) seeding
# ---------------------------------------------------------------------------

KPP_K = 6
KPP_DIM = 64


def _kmeanspp_oracle(k: int = KPP_K, dim: int = KPP_DIM) -> str:
    d2 = (
        f"ROUND(CAST(list_sum(list_transform(range({dim}), i -> "
        "CAST(ROUND((e.x[i+1] - c.cv[i+1]) * (e.x[i+1] - c.cv[i+1]), 12) "
        "AS DECIMAL(38,12)))) AS DOUBLE), 6)"
    )
    blocks = [
        "emb AS MATERIALIZED (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(x AS DOUBLE)) AS x FROM embeddings)",
        "ch0 AS MATERIALIZED (SELECT 0 AS c, vec_id, x AS cv, 0.0 AS sep_d2 "
        "FROM emb WHERE vec_id = (SELECT MIN(vec_id) FROM emb))",
    ]
    for t in range(1, k):
        blocks += [
            f"m{t} AS (SELECT e.vec_id, MIN({d2}) AS mind2 "
            f"FROM emb e CROSS JOIN ch{t - 1} c GROUP BY e.vec_id)",
            f"p{t} AS MATERIALIZED (SELECT vec_id, mind2 FROM m{t} "
            "ORDER BY mind2 DESC, vec_id ASC LIMIT 1)",
            f"ch{t} AS MATERIALIZED (SELECT * FROM ch{t - 1} UNION ALL "
            f"SELECT {t} AS c, e.vec_id, e.x AS cv, p.mind2 AS sep_d2 "
            f"FROM emb e JOIN p{t} p USING (vec_id))",
        ]
    return (
        "WITH "
        + ",\n".join(blocks)
        + f"""
SELECT CAST(c AS INT) AS seed_rank,
       CAST(vec_id AS BIGINT) AS vec_id,
       ROUND(sep_d2, 6) AS sep_d2,
       ROUND(sqrt(CAST(list_sum(list_transform(range({dim}), i ->
         CAST(ROUND(cv[i+1] * cv[i+1], 12) AS DECIMAL(38,12))))
         AS DOUBLE)), 6) AS centroid_norm
FROM ch{k - 1}
ORDER BY seed_rank ASC
"""
    )


@register(
    "cluster_kmeanspp_seeding",
    family="similarity",
    doc="Deterministic k-means++-style seeding by greedy farthest-point "
    "traversal (operators/kmeans.py::farthest_point_seed, k=6): seed 0 "
    "is the min-id vector; each subsequent seed maximizes its round-6 "
    "distance-to-nearest-chosen (ties by id) — the argmax variant of "
    "the D² rule, fully deterministic so the oracle replays all k−1 "
    "selection rounds as CTE stages.  Each round is one corpus scan "
    "against the BROADCAST chosen set (≤ k×d doubles) + per-vector "
    "min + global top-1; nothing corpus-sized ever moves.  This is "
    "how the IVF coarse quantizer and Lloyd runs in this repo get "
    "well-spread initial centroids at scale.  Output: seed rank, "
    "chosen vec_id, selection-time separation, centroid norm.",
    oracle=_kmeanspp_oracle(),
)
def cluster_kmeanspp_seeding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.kmeans import farthest_point_seed

    e = table(spark, sf_dir, "embeddings")
    chosen = farthest_point_seed(
        e, vec_col="embedding", id_col="vec_id", k=KPP_K
    )
    return (
        chosen.select(
            F.col("c").cast("int").alias("seed_rank"),
            F.col("vec_id").cast("bigint").alias("vec_id"),
            F.round(F.col("sep_d2"), 6).alias("sep_d2"),
            F.round(
                F.sqrt(
                    F.aggregate(
                        F.transform(
                            "cv",
                            lambda v: F.round(v * v, 12).cast(
                                "decimal(38,12)"
                            ),
                        ),
                        F.lit(0).cast("decimal(38,12)"),
                        lambda acc, v: (acc + v).cast("decimal(38,12)"),
                    ).cast("double")
                ),
                6,
            ).alias("centroid_norm"),
        )
        .orderBy(F.col("seed_rank").asc())
    )


# ---------------------------------------------------------------------------
# Isotonic calibration (PAVA via the max-min closed form) on score bins
# ---------------------------------------------------------------------------

ISO_BINS = 20
ISO_WIDTH = 25


@register(
    "quality_isotonic_calibration",
    family="drift",
    doc="Isotonic (monotone non-decreasing) calibration of purchase "
    "rate over 20 fixed value bins — PAVA computed via the "
    "Robertson-Wright max-min closed form "
    "(operators/isotonic.py::isotonic_fit_binned): iso(i) = "
    "max_{j<=i} min_{k>=i} mean(pos/n over bins j..k).  PAVA's "
    "sequential sweep is useless distributed; on the BOUNDED bin "
    "domain the minimax form is three broadcast triangular joins "
    "(cubic in 20 bins = trivial), while the corpus-scale work is "
    "ONE hash aggregate.  Interval means are round-12 doubles "
    "(identical IEEE division both engines); output raw vs fitted "
    "rate per bin, fitted column monotone by construction.",
    oracle=f"""
WITH src AS (
  SELECT LEAST(CAST(FLOOR(value / {ISO_WIDTH}) AS BIGINT), {ISO_BINS - 1})
           AS bin,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
b AS MATERIALIZED (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos
  FROM src GROUP BY bin
),
jk AS MATERIALIZED (
  SELECT j.bin AS j, k.bin AS k,
         ROUND(CAST(SUM(m.pos) AS DOUBLE) / CAST(SUM(m.n) AS DOUBLE), 12) AS m
  FROM b j JOIN b k ON j.bin <= k.bin
  JOIN b m ON m.bin >= j.bin AND m.bin <= k.bin
  GROUP BY j.bin, k.bin
),
mn AS (
  SELECT i.bin AS bin, jk.j, MIN(jk.m) AS mn
  FROM b i JOIN jk ON jk.j <= i.bin AND jk.k >= i.bin
  GROUP BY i.bin, jk.j
),
iso AS (SELECT bin, MAX(mn) AS iso_m FROM mn GROUP BY bin)
SELECT b.bin, b.n, b.pos,
       ROUND(CAST(b.pos AS DOUBLE) / CAST(b.n AS DOUBLE), 6) AS raw_rate,
       ROUND(iso.iso_m, 6) AS iso_rate
FROM b JOIN iso USING (bin)
ORDER BY b.bin
""",
)
def quality_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.isotonic import isotonic_fit_binned

    ev = table(spark, sf_dir, "events")
    src = ev.select(
        F.least(
            F.floor(F.col("value") / ISO_WIDTH).cast("bigint"),
            F.lit(ISO_BINS - 1).cast("bigint"),
        ).alias("bin"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    b = src.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    fit = isotonic_fit_binned(b)
    return fit.select(
        "bin",
        "n",
        "pos",
        F.round(F.col("pos").cast("double") / F.col("n").cast("double"), 6)
        .alias("raw_rate"),
        F.round(F.col("iso_m"), 6).alias("iso_rate"),
    ).orderBy("bin")


# ---------------------------------------------------------------------------
# Additive 7-day seasonal decomposition of the daily event series
# ---------------------------------------------------------------------------


@register(
    "events_seasonal_decompose",
    family="events",
    doc="Classical additive seasonal decomposition of daily event "
    "counts: trend = centered 7-day moving average (band self-join "
    "over the calendar-BOUNDED day frame, full-window days only — "
    "the repo's no-global-window discipline), seasonal(dow) = mean "
    "detrended deviation re-centered to sum 0 over the week (1-row "
    "broadcast mean scalar), residual = y − trend − seasonal.  "
    "Moment discipline: detrended terms round-12 then DECIMAL-"
    "summed; per-dow RMSE of residuals surfaces model fit.  Output "
    "7 rows: ISO weekday, day count, seasonal index, residual RMSE.",
    oracle="""
WITH d AS MATERIALIZED (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
tr AS MATERIALIZED (
  SELECT a.day,
         ROUND(CAST(SUM(b.y) AS DOUBLE) / 7, 12) AS trend
  FROM d a JOIN d b ON b.day BETWEEN a.day - 3 AND a.day + 3
  GROUP BY a.day HAVING COUNT(*) = 7
),
det AS MATERIALIZED (
  SELECT d.day, CAST(isodow(d.day) - 1 AS INT) AS dow,
         ROUND(CAST(d.y AS DOUBLE) - tr.trend, 12) AS z
  FROM d JOIN tr ON tr.day = d.day
),
sea AS MATERIALIZED (
  SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
         ROUND(CAST(SUM(CAST(z AS DECIMAL(20,12))) AS DOUBLE) / COUNT(*), 12)
           AS s_raw
  FROM det GROUP BY dow
),
ms AS (
  SELECT ROUND(CAST(SUM(CAST(s_raw AS DECIMAL(20,12))) AS DOUBLE)
               / COUNT(*), 12) AS m
  FROM sea
),
seac AS MATERIALIZED (
  SELECT sea.dow, sea.n_days, ROUND(sea.s_raw - ms.m, 12) AS seasonal
  FROM sea CROSS JOIN ms
),
res AS (
  SELECT det.dow, ROUND(det.z - seac.seasonal, 12) AS r
  FROM det JOIN seac ON seac.dow = det.dow
)
SELECT seac.dow, seac.n_days,
       ROUND(seac.seasonal, 6) AS seasonal,
       ROUND(sqrt(CAST(rr.ssq AS DOUBLE) / rr.n), 6) AS rmse_residual
FROM seac
JOIN (SELECT dow, SUM(CAST(ROUND(r * r, 12) AS DECIMAL(28,12))) AS ssq,
             COUNT(*) AS n
      FROM res GROUP BY dow) rr ON rr.dow = seac.dow
ORDER BY seac.dow
""",
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    d = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
        .localCheckpoint()  # bounded calendar frame, reused on both band sides
    )
    a = d.select(F.col("day").alias("aday"))
    tr = (
        a.join(
            F.broadcast(d),
            (F.col("day") >= F.date_sub(F.col("aday"), 3))
            & (F.col("day") <= F.date_add(F.col("aday"), 3)),
        )
        .groupBy("aday")
        .agg(
            F.sum("y").alias("sy"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .where(F.col("cnt") == 7)
        .select(
            F.col("aday").alias("day"),
            F.round(F.col("sy").cast("double") / 7, 12).alias("trend"),
        )
    )
    det = (
        d.join(tr, "day")
        .select(
            "day",
            F.weekday("day").cast("int").alias("dow"),
            F.round(F.col("y").cast("double") - F.col("trend"), 12).alias("z"),
        )
        .localCheckpoint()  # reused: seasonal means + residuals
    )
    sea = det.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(
            F.sum(F.col("z").cast("decimal(20,12)")).cast("double")
            / F.count(F.lit(1)),
            12,
        ).alias("s_raw"),
    )
    ms = sea.agg(
        F.round(
            F.sum(F.col("s_raw").cast("decimal(20,12)")).cast("double")
            / F.count(F.lit(1)),
            12,
        ).alias("m")
    )
    seac = sea.crossJoin(F.broadcast(ms)).select(
        "dow",
        "n_days",
        F.round(F.col("s_raw") - F.col("m"), 12).alias("seasonal"),
    )
    res = det.join(F.broadcast(seac), "dow").select(
        "dow", F.round(F.col("z") - F.col("seasonal"), 12).alias("r")
    )
    rr = res.groupBy("dow").agg(
        F.sum(F.round(F.col("r") * F.col("r"), 12).cast("decimal(28,12)"))
        .alias("ssq"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        seac.join(rr, "dow")
        .select(
            "dow",
            "n_days",
            F.round(F.col("seasonal"), 6).alias("seasonal"),
            F.round(
                F.sqrt(F.col("ssq").cast("double") / F.col("n")), 6
            ).alias("rmse_residual"),
        )
        .orderBy("dow")
    )


# ---------------------------------------------------------------------------
# Interlaced-GIF decode path (round-7 codec seam closure)
# ---------------------------------------------------------------------------


@register(
    "multimodal_gif_interlaced_stats",
    family="multimodal",
    doc="Pixel statistics over INTERLACED GIFs (operators/gif.py round-7 "
    "seam closure: rows stored in the 4-pass 8/8/4/2 stride order and "
    "deinterlaced on decode; local color tables and palette-luma "
    "mapping landed in the same change).  The fixtures carry the same "
    "closed-form pixels as multimodal_gif_pixel_stats but physically "
    "reordered by the interlace passes, so the identical closed-form "
    "oracle passes ONLY if deinterlacing restores scanline order "
    "exactly — a wrong-stride bug shifts rows and breaks px_sum per "
    "dimension class.  Blobs never leave the executor Arrow batch.",
    oracle="""
WITH dims AS (
  SELECT doc_id, doc_id % 20 + 4 AS w, doc_id % 12 + 4 AS h FROM documents
),
px AS (
  SELECT doc_id, w, h,
         (doc_id * 5 + 7 * xs.x + 11 * ys.y) % 256 AS v
  FROM dims, UNNEST(range(0, w)) AS xs(x), UNNEST(range(0, h)) AS ys(y)
),
per AS (
  SELECT doc_id, w, h,
         CAST(SUM(v) AS BIGINT) AS s, MIN(v) AS mn, MAX(v) AS mx
  FROM px GROUP BY 1, 2, 3
)
SELECT CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(s) AS BIGINT) AS px_sum,
       CAST(MIN(mn) AS INT) AS px_min,
       CAST(MAX(mx) AS INT) AS px_max
FROM per GROUP BY 1, 2
""",
)
def multimodal_gif_interlaced_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.gif import gif_pixel_stats, synthesize_gif_media

    d = table(spark, sf_dir, "documents")
    stats = gif_pixel_stats(
        synthesize_gif_media(d.select("doc_id"), interlace=True)
    )
    return stats.groupBy(
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_images"),
        F.sum("px_sum").cast("bigint").alias("px_sum"),
        F.min("px_min").cast("int").alias("px_min"),
        F.max("px_max").cast("int").alias("px_max"),
    )


# ---------------------------------------------------------------------------
# TIFF strip container + PackBits RLE (new codec, round 7)
# ---------------------------------------------------------------------------


@register(
    "multimodal_tiff_pixel_stats",
    family="multimodal",
    doc="Pixel statistics over the REAL TIFF decode path "
    "(operators/tiff.py — IFD tag walking with the inline-when-it-"
    "fits value rule, multi-strip assembly via StripOffsets/"
    "StripByteCounts/RowsPerStrip, PackBits RLE both directions, II "
    "and MM byte orders): the scanned-document container every OCR "
    "ingest meets.  The fixture corpus mixes layouts — every 3rd "
    "image big-endian, every 5th uncompressed — and the pixel "
    "formula (id*3 + 5y + x div 6, x-runs of 6) produces genuine RLE "
    "runs, so the closed-form oracle breaks on any wrong strip "
    "boundary, endian swap or run length.  Blobs never leave the "
    "executor Arrow batch; narrow stat rows out.",
    oracle="""
WITH dims AS (
  SELECT doc_id, doc_id % 20 + 4 AS w, doc_id % 12 + 4 AS h FROM documents
),
px AS (
  SELECT doc_id, w, h,
         (doc_id * 3 + 5 * ys.y + xs.x // 6) % 256 AS v
  FROM dims, UNNEST(range(0, w)) AS xs(x), UNNEST(range(0, h)) AS ys(y)
),
per AS (
  SELECT doc_id, w, h,
         CAST(SUM(v) AS BIGINT) AS s, MIN(v) AS mn, MAX(v) AS mx
  FROM px GROUP BY 1, 2, 3
)
SELECT CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(s) AS BIGINT) AS px_sum,
       CAST(MIN(mn) AS INT) AS px_min,
       CAST(MAX(mx) AS INT) AS px_max
FROM per GROUP BY 1, 2
""",
)
def multimodal_tiff_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.tiff import synthesize_tiff_media, tiff_pixel_stats

    d = table(spark, sf_dir, "documents")
    stats = tiff_pixel_stats(synthesize_tiff_media(d.select("doc_id")))
    return stats.groupBy(
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_images"),
        F.sum("px_sum").cast("bigint").alias("px_sum"),
        F.min("px_min").cast("int").alias("px_min"),
        F.max("px_max").cast("int").alias("px_max"),
    )


# ---------------------------------------------------------------------------
# STFT per-frame spectral peaks (audio framing primitive)
# ---------------------------------------------------------------------------


@register(
    "multimodal_audio_stft_bands",
    family="multimodal",
    doc="Short-time Fourier analysis over the REAL audio path "
    "(operators/multimodal.py::wav_stft_peaks): RIFF chunk walk, "
    "int16 PCM decode, non-overlapping 256-sample framing, REAL DFT "
    "per frame, per-frame spectral argmax classified into low/mid/"
    "high bands — the framing primitive under every audio feature "
    "extractor.  Fixtures are two-segment sweeps (frame 0 carries "
    "exactly k1 = id%31+1 cycles, frame 1 k2 = (id*7)%31+1): a "
    "whole-file DFT smears the two lines, so the closed-form oracle "
    "passes ONLY if the framing boundaries are exact.  Blobs stay "
    "inside the executor Arrow batch.",
    oracle="""
WITH frames AS (
  SELECT doc_id, f.frame_idx,
         CASE WHEN f.frame_idx = 0 THEN doc_id % 31 + 1
              ELSE (doc_id * 7) % 31 + 1 END AS pk
  FROM documents, UNNEST([0, 1]) AS f(frame_idx)
)
SELECT CAST(doc_id AS BIGINT) AS audio_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(pk AS INT) AS peak_bin,
       CASE WHEN pk <= 10 THEN 'low'
            WHEN pk <= 21 THEN 'mid'
            ELSE 'high' END AS band
FROM frames
""",
)
def multimodal_audio_stft_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import synthesize_sweep_media, wav_stft_peaks

    d = table(spark, sf_dir, "documents")
    return wav_stft_peaks(synthesize_sweep_media(d.select("doc_id")))


# ---------------------------------------------------------------------------
# Two-sample Poisson rate-ratio test (early vs late exposure windows)
# ---------------------------------------------------------------------------

PRT_T1_DAYS = 10  # exposure window 1: first 10 calendar days; rest is window 2


@register(
    "quality_poisson_rate_test",
    family="drift",
    doc="Two-sample Poisson rate-ratio test per event type: counts in "
    "the first 10 calendar days vs the remainder (exposures derived "
    "from the data's own min/max day — a 1-row broadcast scalar), "
    "rate ratio (x1/t1)/(x2/t2) and the standard log-ratio z "
    "statistic ln(ratio)/sqrt(1/x1 + 1/x2) — the rate-drift monitor "
    "for error/event volumes that PSI/KS (value drift, elsewhere in "
    "this battery) don't cover.  One corpus hash-aggregate + "
    "constant-size arithmetic; identical double expression order on "
    "both engines, rounded to 6.",
    oracle=f"""
WITH span AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 FROM events
),
c AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN CAST(ts AS DATE) < span.d0 + {PRT_T1_DAYS}
                       THEN 1 ELSE 0 END) AS BIGINT) AS x1,
         CAST(SUM(CASE WHEN CAST(ts AS DATE) >= span.d0 + {PRT_T1_DAYS}
                       THEN 1 ELSE 0 END) AS BIGINT) AS x2,
         CAST(MIN(span.d1 - span.d0 + 1 - {PRT_T1_DAYS}) AS BIGINT) AS t2
  FROM events CROSS JOIN span
  GROUP BY event_type
)
SELECT event_type, x1, x2,
       ROUND(CAST(x1 AS DOUBLE) / {PRT_T1_DAYS}, 6) AS rate1,
       ROUND(CAST(x2 AS DOUBLE) / t2, 6) AS rate2,
       ROUND((CAST(x1 AS DOUBLE) / {PRT_T1_DAYS}) / (CAST(x2 AS DOUBLE) / t2), 6)
         AS rate_ratio,
       ROUND(LN((CAST(x1 AS DOUBLE) / {PRT_T1_DAYS}) / (CAST(x2 AS DOUBLE) / t2))
             / SQRT(1.0 / x1 + 1.0 / x2), 6) AS z_stat
FROM c
""",
)
def quality_poisson_rate_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    span = ev.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    c = (
        ev.crossJoin(F.broadcast(span))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(
                    F.col("day") < F.date_add(F.col("d0"), PRT_T1_DAYS), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("x1"),
            F.sum(
                F.when(
                    F.col("day") >= F.date_add(F.col("d0"), PRT_T1_DAYS), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("x2"),
            F.min(
                F.datediff(F.col("d1"), F.col("d0")) + 1 - PRT_T1_DAYS
            )
            .cast("bigint")
            .alias("t2"),
        )
    )
    r1 = F.col("x1").cast("double") / PRT_T1_DAYS
    r2 = F.col("x2").cast("double") / F.col("t2")
    return c.select(
        "event_type",
        "x1",
        "x2",
        F.round(r1, 6).alias("rate1"),
        F.round(r2, 6).alias("rate2"),
        F.round(r1 / r2, 6).alias("rate_ratio"),
        F.round(
            F.log(r1 / r2)
            / F.sqrt(1.0 / F.col("x1") + 1.0 / F.col("x2")),
            6,
        ).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# k-truss community cores by support peeling
# ---------------------------------------------------------------------------

KT_K = 4
KT_ROUNDS = 3


def _ktruss_oracle(k: int = KT_K, rounds: int = KT_ROUNDS) -> str:
    parts = [
        f"""WITH li AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey < {BW_ORDER_CAP}
),
e0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)"""
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f"""adj{t - 1} AS (
  SELECT u, v FROM e{t - 1} UNION ALL SELECT v, u FROM e{t - 1}
),
s{t} AS MATERIALIZED (
  SELECT e.u, e.v, CAST(COUNT(*) AS BIGINT) AS support
  FROM e{t - 1} e
  JOIN adj{t - 1} a ON a.u = e.u
  JOIN adj{t - 1} b ON b.u = e.v AND b.v = a.v
  GROUP BY e.u, e.v
),
e{t} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{t - 1} e
  JOIN s{t} s ON s.u = e.u AND s.v = e.v AND s.support >= {k - 2}
)"""
        )
    parts.append(
        f"""adjF AS (
  SELECT u, v FROM e{rounds} UNION ALL SELECT v, u FROM e{rounds}
),
sfj AS (
  SELECT e.u, e.v, CAST(COUNT(*) AS BIGINT) AS support
  FROM e{rounds} e
  JOIN adjF a ON a.u = e.u
  JOIN adjF b ON b.u = e.v AND b.v = a.v
  GROUP BY e.u, e.v
),
sf AS (
  SELECT e.u, e.v, COALESCE(s.support, 0) AS support
  FROM e{rounds} e
  LEFT JOIN sfj s ON s.u = e.u AND s.v = e.v
)"""
    )
    return ",\n".join(parts) + """
SELECT support, CAST(COUNT(*) AS BIGINT) AS n_edges
FROM sf GROUP BY support ORDER BY support
"""


@register(
    "graph_ktruss_peeling",
    family="graph",
    doc="k-truss community cores (operators/ktruss.py, k=4, 3 bulk-"
    "peeling rounds): per round ONE wedge join computes every edge's "
    "in-subgraph triangle support (the same node-keyed shuffle shape "
    "as triangle counting) and every under-supported edge drops at "
    "once — Cohen's truss decomposition, the cohesion tier between "
    "triangles and cliques that community-mining pipelines use "
    "because it's computable by joins (unlike clique finding).  "
    "Fixed rounds keep it oracle-replayable; the oracle unrolls "
    "support→filter per round and recomputes final support on the "
    "survivors.  Output: support histogram of the surviving core.",
    oracle=_ktruss_oracle(),
)
def graph_ktruss_peeling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ktruss import ktruss_edges

    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < BW_ORDER_CAP)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    e = (
        a.join(b, (a["ok"] == b["ok"]) & (F.col("u") < F.col("v")))
        .select("u", "v")
        .distinct()
    )
    truss = ktruss_edges(e, k=KT_K, rounds=KT_ROUNDS)
    return (
        truss.groupBy("support")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
        .orderBy("support")
    )
