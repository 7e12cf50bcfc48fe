"""Robust statistics, privacy audit, layout efficiency, and scalable
similarity-join queries (SURVEY §2.I extension, round 5).

Families covered here:

* ``dedup_ssjoin_prefix`` — the PPJoin-style prefix-filtered
  set-similarity self-join (operators/ssjoin.py): the lossless
  scale-path alternative to both all-pairs Jaccard and probabilistic
  MinHash;
* ``agg_theil_sen_slope`` — median-of-pairwise-slopes robust trend vs
  OLS on the same daily series (the estimator that shrugs off the
  outlier days that wreck least squares);
* ``events_ewma_daily`` — exponentially-weighted moving average per
  event type via the closed-form weight expansion (no recursion
  needed: s_n = Σ w_i·x_i with w pinned by row position);
* ``quality_k_anonymity`` — k-anonymity / l-diversity privacy audit of
  quasi-identifier equivalence classes;
* ``layout_zorder_skipping`` — Z-order (Morton) clustering vs linear
  layout: measured file-skipping efficiency for a 2-D range probe
  (the audit twin of operators/layout.py's zorder_write);
* ``graph_kcore`` — k-core dense-backbone extraction by iterative
  peeling (operators/kcore.py) with a fully unrolled SQL oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import register, table
from .tpch import dec2, rate

# ---------------------------------------------------------------------------
# PPJoin-style prefix-filtered set-similarity join
# ---------------------------------------------------------------------------

SSJOIN_T = 0.5
SSJOIN_N = 4  # word 4-gram shingles


@register(
    "dedup_ssjoin_prefix",
    family="dedup",
    doc="Set-similarity self-join with PPJoin prefix filtering "
    "(operators/ssjoin.py): all document pairs with Jaccard >= 0.5 "
    "over word 4-gram shingle sets.  Candidates come ONLY from pairs "
    "sharing a PREFIX shingle (each set's rarest "
    "|s|-ceil(t|s|)+1 shingles by global df — a lossless pigeonhole "
    "bound), then one exact overlap count per candidate verifies.  "
    "Scale shape: the join key is a single rare shingle (bucket sizes "
    "bounded by rare-token df — no stopword blowup), the per-set rank "
    "window partitions by doc_id, verification is candidate-bounded.  "
    "The oracle intentionally uses the naive shared-shingle all-pairs "
    "formulation: prefix filtering is LOSSLESS, so both must produce "
    "identical verified pairs — that equivalence is the test.",
    oracle=f"""
WITH sh AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id,
           UNNEST(list_transform(range(1, len(toks) - {SSJOIN_N - 2}),
                  i -> array_to_string(toks[i:i+{SSJOIN_N - 1}], ' '))) AS g
    FROM (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents
    )
  )
),
sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, sa.sz AS sz_a, sb.sz AS sz_b, n_common,
       ROUND(CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common), 6)
         AS jaccard
FROM common
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) >= {SSJOIN_T}
""",
)
def dedup_ssjoin_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as T
    from ..operators import ssjoin as SS

    d = table(spark, sf_dir, "documents")
    tokens = d.select(
        F.col("doc_id").alias("id"),
        F.explode(
            F.array_distinct(T.word_ngrams(F.col("text"), SSJOIN_N))
        ).alias("token"),
    )
    out = SS.verified_pairs(tokens, SSJOIN_T)
    return out.select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        F.col("sz_a").cast("bigint").alias("sz_a"),
        F.col("sz_b").cast("bigint").alias("sz_b"),
        F.col("n_common").cast("bigint").alias("n_common"),
        "jaccard",
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust slope vs OLS
# ---------------------------------------------------------------------------

TS_START = "1995-01-01"
TS_END = "1995-04-01"


@register(
    "agg_theil_sen_slope",
    family="agg",
    doc="Theil-Sen robust trend estimator on 1995-Q1 daily revenue: the "
    "median of all pairwise day-slopes (exact lower/upper-middle "
    "average), next to the OLS slope on the same series — the robust "
    "estimator is immune to the outlier days that pull least squares.  "
    "Daily revenue is the exact DECIMAL sum cast to DOUBLE, so every "
    "pairwise slope is the same IEEE value in both engines.  Scale "
    "shape: the pair expansion is a triangular join over the "
    "calendar-bounded quarter (<=92 days, <=4186 pairs — fixed by the "
    "calendar, not by row volume); the median rank window runs over "
    "that bounded pair frame (documented in BOUNDED_GLOBAL_WINDOWS).",
    oracle=f"""
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
              AS DOUBLE) AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{TS_START} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{TS_END} 00:00:00'
  GROUP BY 1
),
idx AS (SELECT datediff('day', DATE '{TS_START}', d) AS di, rev FROM daily),
slopes AS (
  SELECT (b.rev - a.rev) / (b.di - a.di) AS slope
  FROM idx a JOIN idx b ON b.di > a.di
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM slopes),
ranked AS (
  SELECT slope, ROW_NUMBER() OVER (ORDER BY slope ASC) AS rn FROM slopes
),
med AS (
  SELECT AVG(slope) AS ts FROM ranked CROSS JOIN nn
  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
),
ols AS (
  SELECT (COUNT(*) * SUM(di * rev) - SUM(di) * SUM(rev))
         / (COUNT(*) * SUM(di * di) - SUM(di) * SUM(di)) AS b1,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM idx
)
SELECT ols.n_days, nn.n AS n_pairs,
       ROUND(med.ts, 6) AS theil_sen_slope,
       ROUND(ols.b1, 6) AS ols_slope
FROM nn, med, ols
""",
)
def agg_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    daily = (
        l.where(
            # timestamp_ntz literals (the tpch.ts convention): an LTZ cast
            # would shift the quarter boundary by the session offset under
            # a non-UTC driver session
            (
                F.col("l_shipdate")
                >= F.lit(f"{TS_START} 00:00:00").cast("timestamp_ntz")
            )
            & (
                F.col("l_shipdate")
                < F.lit(f"{TS_END} 00:00:00").cast("timestamp_ntz")
            )
        )
        .groupBy(F.col("l_shipdate").cast("date").alias("d"))
        .agg(
            F.sum(dec2("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - rate("l_discount")))
            .cast("double")
            .alias("rev")
        )
    )
    idx = daily.select(
        F.datediff(F.col("d"), F.lit(TS_START).cast("date")).alias("di"), "rev"
    )
    a = idx.select(F.col("di").alias("dia"), F.col("rev").alias("reva"))
    b = idx.select(F.col("di").alias("dib"), F.col("rev").alias("revb"))
    slopes = a.join(F.broadcast(b), F.col("dib") > F.col("dia")).select(
        ((F.col("revb") - F.col("reva")) / (F.col("dib") - F.col("dia"))).alias(
            "slope"
        )
    )
    nn = slopes.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ranked = slopes.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.col("slope").asc()))
    )
    med = (
        ranked.crossJoin(F.broadcast(nn))
        .where(
            (F.col("rn") == F.floor((F.col("n") + 1) / 2))
            | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
        )
        .agg(F.avg("slope").alias("ts"))
    )
    ols = idx.agg(
        (
            (F.count(F.lit(1)) * F.sum(F.col("di") * F.col("rev"))
             - F.sum("di") * F.sum("rev"))
            / (F.count(F.lit(1)) * F.sum(F.col("di") * F.col("di"))
               - F.sum("di") * F.sum("di"))
        ).alias("b1"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    return (
        ols.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(med))
        .select(
            "n_days",
            F.col("n").alias("n_pairs"),
            F.round(F.col("ts"), 6).alias("theil_sen_slope"),
            F.round(F.col("b1"), 6).alias("ols_slope"),
        )
    )


# ---------------------------------------------------------------------------
# EWMA smoothing of the daily event series
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.3


@register(
    "events_ewma_daily",
    family="timeseries",
    doc="Per-type EWMA (alpha=0.3) of the daily event-count series via "
    "the closed-form weight expansion: with rows numbered 1..n per "
    "type, s_n = Σ cnt_i · w_i where w_1 = (1-α)^(n-1) and "
    "w_i = α(1-α)^(n-i) — exactly the recursive EWMA with s_1 = x_1, "
    "no recursion or driver loop needed.  Also surfaces the trailing "
    "7-day simple moving average for contrast.  Scale shape: one "
    "(type, day) aggregate collapses the corpus; the weight window "
    "partitions by event_type over the calendar-bounded day domain.",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
seq AS (
  SELECT event_type, cnt,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d ASC) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM daily
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_days,
       CAST(SUM(CASE WHEN rn = n THEN cnt END) AS BIGINT) AS last_count,
       ROUND(SUM(cnt * CASE WHEN rn = 1
                       THEN POWER({1 - EWMA_ALPHA}, n - rn)
                       ELSE {EWMA_ALPHA} * POWER({1 - EWMA_ALPHA}, n - rn)
                       END), 6) AS ewma,
       ROUND(CAST(SUM(CASE WHEN rn > n - 7 THEN cnt END) AS DOUBLE) / 7, 6)
         AS sma7_last
FROM seq GROUP BY event_type ORDER BY event_type
""",
)
def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    wp = Window.partitionBy("event_type")
    seq = daily.select(
        "event_type",
        "cnt",
        F.row_number().over(wp.orderBy(F.col("d").asc())).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    alpha, decay = EWMA_ALPHA, 1 - EWMA_ALPHA
    weight = F.when(
        F.col("rn") == 1, F.pow(F.lit(decay), F.col("n") - F.col("rn"))
    ).otherwise(F.lit(alpha) * F.pow(F.lit(decay), F.col("n") - F.col("rn")))
    return (
        seq.groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n_days"),
            F.sum(F.when(F.col("rn") == F.col("n"), F.col("cnt")))
            .cast("bigint")
            .alias("last_count"),
            F.round(F.sum(F.col("cnt") * weight), 6).alias("ewma"),
            F.round(
                F.sum(F.when(F.col("rn") > F.col("n") - 7, F.col("cnt")))
                .cast("double")
                / 7,
                6,
            ).alias("sma7_last"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity privacy audit
# ---------------------------------------------------------------------------

KANON_K = 5
KANON_BAND = 2000.0


@register(
    "quality_k_anonymity",
    family="quality",
    doc="k-anonymity / l-diversity audit over the customer "
    "quasi-identifier pair (nationkey, mktsegment): every equivalence "
    "class with its size, the count of distinct sensitive-value bands "
    "(acctbal / 2000) it contains (l-diversity), and the k>=5 flag — "
    "the release-safety report a privacy review runs before sharing "
    "micro-data.  Scale shape: a single hash aggregate on the "
    "quasi-identifier key; the class domain (25 nations x 5 segments) "
    "is schema-bounded.",
    oracle=f"""
SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS class_size,
       CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / {KANON_BAND}) AS BIGINT))
            AS BIGINT) AS l_diversity,
       CASE WHEN COUNT(*) >= {KANON_K} THEN 1 ELSE 0 END AS k_anonymous
FROM customer GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def quality_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("class_size"),
            F.count_distinct(
                F.floor(F.col("c_acctbal") / KANON_BAND).cast("bigint")
            )
            .cast("bigint")
            .alias("l_diversity"),
            F.when(F.count(F.lit(1)) >= KANON_K, 1).otherwise(0).alias(
                "k_anonymous"
            ),
        )
        .orderBy("nationkey", "segment")
    )


# ---------------------------------------------------------------------------
# Z-order vs linear layout: file-skipping efficiency
# ---------------------------------------------------------------------------

ZBITS = 8
ZFILES = 16  # top 4 Morton bits -> 16 files


def _morton_sql(qp: str, qs: str) -> str:
    terms = []
    for b in range(ZBITS):
        terms.append(f"(({qp} >> {b}) & 1) * {1 << (2 * b + 1)}")
        terms.append(f"(({qs} >> {b}) & 1) * {1 << (2 * b)}")
    return " + ".join(terms)


def _morton_col(qp: F.Column, qs: F.Column) -> F.Column:
    z = F.lit(0)
    for b in range(ZBITS):
        z = z + F.shiftright(qp, b).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * b + 1))
        z = z + F.shiftright(qs, b).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * b))
    return z


@register(
    "layout_zorder_skipping",
    family="etl",
    doc="Data-layout efficiency audit: lineitem (partkey, suppkey) "
    "quantized to 8 bits each (exact integer math), Morton-interleaved "
    "(the same bit interleave as operators/layout.py::morton_key, "
    "which writes real Z-ordered parquet), and binned into 16 files "
    "by Z range vs 16 files by partkey range (linear).  For the "
    "center-quadrant 2-D probe (both quantized dims in [64,127]) the "
    "audit reports how many files each layout's min/max zone maps can "
    "skip: Z-order prunes BOTH dimensions (1/16 scanned), linear "
    "prunes only its sort key (4/16).  Exactly the query-shape "
    "argument for Z-ordering 100 TB fact tables.  Scale shape: one "
    "pass to quantize + assign, one (file) aggregate per layout for "
    "zone maps; min/max scalars ride a broadcast cross join.",
    oracle=f"""
WITH bounds AS (
  SELECT MIN(l_partkey) AS minp, MAX(l_partkey) AS maxp,
         MIN(l_suppkey) AS mins, MAX(l_suppkey) AS maxs
  FROM lineitem
),
q AS (
  SELECT ((l_partkey - minp) * 255) // (maxp - minp) AS qp,
         ((l_suppkey - mins) * 255) // (maxs - mins) AS qs
  FROM lineitem CROSS JOIN bounds
),
z AS (SELECT qp, qs, ({_morton_sql('qp', 'qs')}) AS zv FROM q),
zfiles AS (
  SELECT zv // 4096 AS file_id,
         MIN(qp) AS min_qp, MAX(qp) AS max_qp,
         MIN(qs) AS min_qs, MAX(qs) AS max_qs,
         COUNT(*) AS n_rows
  FROM z GROUP BY 1
),
lfiles AS (
  SELECT qp // 16 AS file_id,
         MIN(qp) AS min_qp, MAX(qp) AS max_qp,
         MIN(qs) AS min_qs, MAX(qs) AS max_qs,
         COUNT(*) AS n_rows
  FROM q GROUP BY 1
),
probe AS (
  SELECT 'zorder' AS layout,
         CAST(COUNT(*) AS BIGINT) AS n_files,
         CAST(SUM(CASE WHEN max_qp >= 64 AND min_qp <= 127
                        AND max_qs >= 64 AND min_qs <= 127
                  THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
         CAST(SUM(CASE WHEN max_qp >= 64 AND min_qp <= 127
                        AND max_qs >= 64 AND min_qs <= 127
                  THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned
  FROM zfiles
  UNION ALL
  SELECT 'linear',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN max_qp >= 64 AND min_qp <= 127
                        AND max_qs >= 64 AND min_qs <= 127
                  THEN 1 ELSE 0 END) AS BIGINT),
         CAST(SUM(CASE WHEN max_qp >= 64 AND min_qp <= 127
                        AND max_qs >= 64 AND min_qs <= 127
                  THEN n_rows ELSE 0 END) AS BIGINT)
  FROM lfiles
)
SELECT layout, n_files, files_scanned, rows_scanned,
       ROUND(CAST(n_files - files_scanned AS DOUBLE) / n_files, 6)
         AS skip_fraction
FROM probe ORDER BY layout
""",
)
def layout_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bounds = l.agg(
        F.min("l_partkey").alias("minp"),
        F.max("l_partkey").alias("maxp"),
        F.min("l_suppkey").alias("mins"),
        F.max("l_suppkey").alias("maxs"),
    )
    q = l.crossJoin(F.broadcast(bounds)).select(
        F.expr("((l_partkey - minp) * 255) div (maxp - minp)").alias("qp"),
        F.expr("((l_suppkey - mins) * 255) div (maxs - mins)").alias("qs"),
    )
    z = q.select("qp", "qs", _morton_col(F.col("qp"), F.col("qs")).alias("zv"))

    def zone_maps(df: DataFrame, file_col: F.Column) -> DataFrame:
        return df.groupBy(file_col.alias("file_id")).agg(
            F.min("qp").alias("min_qp"),
            F.max("qp").alias("max_qp"),
            F.min("qs").alias("min_qs"),
            F.max("qs").alias("max_qs"),
            F.count(F.lit(1)).alias("n_rows"),
        )

    def probe(zones: DataFrame, layout: str) -> DataFrame:
        hit = (
            (F.col("max_qp") >= 64)
            & (F.col("min_qp") <= 127)
            & (F.col("max_qs") >= 64)
            & (F.col("min_qs") <= 127)
        )
        return zones.agg(
            F.lit(layout).alias("layout"),
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias(
                "files_scanned"
            ),
            F.sum(F.when(hit, F.col("n_rows")).otherwise(0))
            .cast("bigint")
            .alias("rows_scanned"),
        )

    zp = probe(zone_maps(z, F.expr("zv div 4096")), "zorder")
    lp = probe(zone_maps(q, F.expr("qp div 16")), "linear")
    out = zp.unionAll(lp)
    return out.select(
        "layout",
        "n_files",
        "files_scanned",
        "rows_scanned",
        F.round(
            (F.col("n_files") - F.col("files_scanned")).cast("double")
            / F.col("n_files"),
            6,
        ).alias("skip_fraction"),
    ).orderBy("layout")


# ---------------------------------------------------------------------------
# k-core dense backbone
# ---------------------------------------------------------------------------

KCORE_K = 4
KCORE_ORDER_CAP = 1000  # same bounded demo tier as graph_triangle_count
_KCORE_UNROLL = 8  # measured peel rounds <= 3 across sf0.001-0.1; 8 = margin


def _kcore_oracle(k: int = KCORE_K, rounds: int = _KCORE_UNROLL) -> str:
    parts = [
        f"""WITH li AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey < {KCORE_ORDER_CAP}
),
e0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)"""
    ]
    prev = "e0"
    for i in range(1, rounds + 1):
        parts.append(
            f"""d{i} AS MATERIALIZED (
  SELECT v, COUNT(*) AS d FROM (
    SELECT a AS v FROM {prev} UNION ALL SELECT b FROM {prev}
  ) GROUP BY v
),
k{i} AS MATERIALIZED (SELECT v FROM d{i} WHERE d >= {k}),
e{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM {prev} e
  JOIN k{i} ka ON ka.v = e.a
  JOIN k{i} kb ON kb.v = e.b
)"""
        )
        prev = f"e{i}"
    parts.append(
        f"""core_deg AS MATERIALIZED (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT a AS v FROM {prev} UNION ALL SELECT b FROM {prev}
  ) GROUP BY v
),
base AS MATERIALIZED (
  SELECT CAST(COUNT(DISTINCT v) AS BIGINT) AS n_nodes_in FROM (
    SELECT a AS v FROM e0 UNION ALL SELECT b FROM e0
  )
)"""
    )
    final = f"""
SELECT CAST({k} AS BIGINT) AS k,
       base.n_nodes_in,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e0) AS n_edges_in,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM core_deg) AS n_core_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {prev}) AS n_core_edges,
       (SELECT MIN(d) FROM core_deg) AS min_core_deg,
       (SELECT MAX(d) FROM core_deg) AS max_core_deg
FROM base
"""
    return ",\n".join(parts) + final


@register(
    "graph_kcore",
    family="graph",
    doc="k-core (k=4) dense-backbone extraction on the part co-purchase "
    "graph (operators/kcore.py): iterative peeling to the fixpoint "
    "where every surviving node keeps degree >= 4 inside the core.  "
    "The oracle UNROLLS 8 peel rounds in SQL (measured convergence: "
    "<= 3 rounds across sf0.001-0.1; extra rounds are no-ops at the "
    "fixpoint), so the entire iterative computation — degree "
    "aggregates, node filters, edge semi-joins — is hash-checked, not "
    "just the final counts.  Scale shape: per round one degree "
    "aggregate + one node-keyed semi-join, edge list checkpointed to "
    "cut lineage, a single scalar convergence probe per round.",
    oracle=_kcore_oracle(),
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import kcore as KC

    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < KCORE_ORDER_CAP)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("b"))
    e0 = (
        a.join(b, (a["ok"] == b["ok"]) & (F.col("a") < F.col("b")))
        .select("a", "b")
        .distinct()
        .localCheckpoint()
    )
    core = KC.kcore_edges(e0, KCORE_K)
    core_deg = KC.degrees(core)
    stats_core = core_deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_core_nodes"),
        F.min("d").cast("bigint").alias("min_core_deg"),
        F.max("d").cast("bigint").alias("max_core_deg"),
    )
    n_core_edges = core.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_core_edges")
    )
    base_nodes = (
        e0.select(F.col("a").alias("v"))
        .unionAll(e0.select(F.col("b").alias("v")))
        .agg(F.count_distinct("v").cast("bigint").alias("n_nodes_in"))
    )
    base_edges = e0.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges_in"))
    return (
        base_nodes.crossJoin(F.broadcast(base_edges))
        .crossJoin(F.broadcast(stats_core))
        .crossJoin(F.broadcast(n_core_edges))
        .select(
            F.lit(KCORE_K).cast("bigint").alias("k"),
            "n_nodes_in",
            "n_edges_in",
            "n_core_nodes",
            "n_core_edges",
            "min_core_deg",
            "max_core_deg",
        )
    )
