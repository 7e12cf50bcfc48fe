"""Round-14 additions: greedy facility-location exemplar selection.

Reference parity: none — §2.I curation tier (the reference is a
psycopg2 ETL with no subset-selection operators).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import register, table

# ---------------------------------------------------------------------------
# Greedy facility location (Nemhauser et al. '78; the CRAIG / exemplar-
# selection shape in training-data curation)
# ---------------------------------------------------------------------------

FL_K = 5           # greedy picks
FL_CAND_MOD = 29   # candidate pool: vec_id % 29 == 0


def _fl_oracle() -> str:
    cos = (
        "ROUND(list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b}))), 6)"
    )
    dec0 = "CAST(0 AS DECIMAL(18,6))"
    parts = [
        f"""WITH e AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cand AS MATERIALIZED (
  SELECT vec_id, v FROM e WHERE vec_id % {FL_CAND_MOD} = 0
),
sims AS MATERIALIZED (
  SELECT u.vec_id AS i, c.vec_id AS j,
         CAST(GREATEST({cos.format(a="u.v", b="c.v")}, 0)
              AS DECIMAL(18,6)) AS s
  FROM e u CROSS JOIN cand c
),
cur0 AS MATERIALIZED (
  SELECT vec_id AS i, {dec0} AS cur FROM e
)"""
    ]
    for t in range(1, FL_K + 1):
        excl = ""
        if t > 1:
            sel = " UNION ALL ".join(
                f"SELECT j FROM p{x}" for x in range(1, t)
            )
            excl = f"WHERE s.j NOT IN ({sel})"
        parts.append(
            f"""g{t} AS MATERIALIZED (
  SELECT s.j, SUM(GREATEST(s.s - c.cur, {dec0})) AS gain
  FROM sims s JOIN cur{t - 1} c ON c.i = s.i
  {excl}
  GROUP BY s.j
),
p{t} AS MATERIALIZED (
  SELECT j, gain FROM g{t} ORDER BY gain DESC, j ASC LIMIT 1
),
cur{t} AS MATERIALIZED (
  SELECT c.i, GREATEST(c.cur, COALESCE(x.s, {dec0})) AS cur
  FROM cur{t - 1} c
  LEFT JOIN (
    SELECT i, s FROM sims WHERE j = (SELECT j FROM p{t})
  ) x ON x.i = c.i
),
cov{t} AS MATERIALIZED (
  SELECT SUM(cur) AS coverage FROM cur{t}
)"""
        )
    final = "\nUNION ALL\n".join(
        f"SELECT CAST({t} AS INTEGER) AS pick, p{t}.j AS vec_id, "
        f"ROUND(CAST(p{t}.gain AS DOUBLE), 6) AS gain, "
        f"ROUND(CAST(cov{t}.coverage AS DOUBLE), 6) AS coverage FROM p{t}, cov{t}"
        for t in range(1, FL_K + 1)
    )
    return ",\n".join(parts) + "\n" + final


@register(
    "curation_facility_location",
    family="curation",
    doc="Greedy facility-location exemplar selection (operators/"
    f"facility.py — Nemhauser et al. '78, the CRAIG/coreset curation "
    f"shape): pick {FL_K} documents maximizing summed best-coverage of "
    "the WHOLE corpus, f(S) = sum_i max_(j in S) cos+(i, j), from a "
    f"deterministic candidate pool (vec_id % {FL_CAND_MOD} == 0).  "
    "Greedy is (1-1/e)-optimal for monotone submodular f.  Unlike the "
    "MMR rerank (candidate-local by design), every greedy step is a "
    "DISTRIBUTED aggregate: the (corpus x candidates) similarity frame "
    "is built once with the bounded candidate side broadcast, each "
    "step's marginal gains are one map-side-combinable SUM over it "
    "joined to the corpus-sized coverage vector, the argmax is a "
    "TakeOrdered over candidate rows, and the winner rides back as a "
    "broadcast 1-row frame — no driver collect, no global window.  "
    "Determinism: similarities clamp+round to a 6-dp DECIMAL grid, so "
    "gains are exact order-independent sums and the greedy path is "
    "engine-identical (ties by candidate id); the oracle unrolls the "
    "loop as per-pick MATERIALIZED CTEs.  Emits (pick, vec_id, gain, "
    "coverage) in selection order.",
    oracle=_fl_oracle(),
)
def curation_facility_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.facility import facility_location_greedy

    e = table(spark, sf_dir, "embeddings")
    cand = e.where(F.col("vec_id") % FL_CAND_MOD == 0)
    return facility_location_greedy(e, cand, k=FL_K)


# ---------------------------------------------------------------------------
# Distributed suffix array (Manber–Myers prefix doubling) — the Lee et al.
# corpus-dedup primitive, built with log(n) rounds of joins + the
# two-pass distributed dense rank (operators/prefix_sum.py)
# ---------------------------------------------------------------------------

SA_DOC_MOD = 101   # bounded verification tier: doc_id % 101 == 0
SA_MAX_CHARS = 300  # per-doc cap before the chr(1) separator

_SA_ORACLE = f"""
WITH tier AS MATERIALIZED (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         substr(regexp_replace(COALESCE(text, ''), '[^ -~]', '', 'g'),
                1, {SA_MAX_CHARS}) || chr(1) AS doc_text
  FROM documents WHERE doc_id % {SA_DOC_MOD} = 0
),
offs AS MATERIALIZED (
  SELECT doc_id, doc_text, length(doc_text) AS doc_len,
         CAST(COALESCE(SUM(length(doc_text)) OVER (
             ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS doc_off
  FROM tier
),
corpus AS MATERIALIZED (
  SELECT string_agg(doc_text, '' ORDER BY doc_id) AS s FROM tier
),
posn AS MATERIALIZED (
  SELECT doc_id, doc_text, doc_off,
         unnest(generate_series(1, doc_len)) AS lp
  FROM offs
)
SELECT CAST(row_number() OVER (
         ORDER BY substr((SELECT s FROM corpus),
                         CAST(p.doc_off + p.lp AS INTEGER))) AS BIGINT)
         AS sa_rank,
       CAST(p.doc_off + p.lp - 1 AS BIGINT) AS pos,
       p.doc_id,
       substr(p.doc_text, CAST(p.lp AS INTEGER), 8) AS head8
FROM posn p
"""


@register(
    "text_suffix_array",
    family="text",
    doc="Distributed suffix array of the concatenated document corpus "
    "(operators/suffix_array.py — Manber–Myers prefix doubling, the "
    "sort-based shared-nothing SA construction; Lee et al.'s "
    "corpus-dedup primitive, completing dedup_substring_spans' fixed-L "
    f"gram form).  Bounded tier doc_id % {SA_DOC_MOD} == 0, each doc "
    f"sanitized to printable ASCII, capped at {SA_MAX_CHARS} chars, "
    "chr(1)-terminated.  Each round orders positions by their first "
    "2^k chars as the pair (rank[i], rank[i+2^k]) — two equi-joins on "
    "position plus operators/prefix_sum.py::global_dense_rank (range-"
    "partition distinct pairs, local dense rank, broadcast offsets — "
    "no single-reducer window), with early exit once ranks are all "
    "distinct (3-5 rounds on natural text).  A past-the-end lookup "
    "ranks 0, encoding the prefix-of tie-break without a terminator.  "
    "Emits (sa_rank, pos, doc_id, head8); the oracle sorts the real "
    "suffixes of the same corpus string directly — an independent "
    "O(n^2)-char algorithm that only the bounded tier makes affordable.",
    oracle=_SA_ORACLE,
)
def text_suffix_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.suffix_array import (
        corpus_positions,
        suffix_array_prefix_doubling,
    )

    docs = table(spark, sf_dir, "documents").where(
        F.col("doc_id") % SA_DOC_MOD == 0
    )
    chars, offsets = corpus_positions(docs, max_chars=SA_MAX_CHARS)
    sa = suffix_array_prefix_doubling(chars)
    return (
        sa.join(chars.select("pos", "doc_id", "local_pos"), "pos")
        .join(F.broadcast(offsets.select("doc_id", "doc_text")), "doc_id")
        .select(
            F.col("sa_rank").cast("long").alias("sa_rank"),
            F.col("pos").cast("long").alias("pos"),
            "doc_id",
            F.expr("substring(doc_text, cast(local_pos as int) + 1, 8)")
            .alias("head8"),
        )
    )


# ---------------------------------------------------------------------------
# Hash-seeded bootstrap percentile CI — the resampling companion to
# quality_permutation_test (same md5 determinism discipline)
# ---------------------------------------------------------------------------

BOOT_B = 200  # resamples; percentile resolution 1/B


@register(
    "quality_bootstrap_ci",
    family="quality",
    doc="Nonparametric bootstrap percentile CI for mean document length, "
    "with the resampling DETERMINISTIC and oracle-replayable (the "
    "quality_permutation_test discipline): resample b's i-th draw is "
    "doc_id = md5_long(b':'i) % n (doc_ids are 0..n-1 contiguous), "
    f"B = {BOOT_B} resamples x n draws with replacement in ONE explode "
    "fan-out joined back to the corpus by doc_id — the Poisson-"
    "bootstrap shape, no per-resample scan, B bounds the blow-up.  "
    "Per-resample sums are exact BIGINTs; the 95% CI takes the "
    "ceil(0.025B)/ceil(0.975B) order statistics over the B resample "
    "means — a window whose input is B rows, fixed by protocol, never "
    "corpus-sized.  Emits (n_docs, n_resamples, mean_obs, ci_lo, "
    "ci_hi).",
    oracle=f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, CAST(len(text) AS BIGINT) AS score FROM documents
),
nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM base),
draws AS MATERIALIZED (
  SELECT b.b,
         CAST(('0x' || substr(md5(b.b || ':' || i.i), 1, 15)) AS BIGINT)
           % (SELECT n FROM nn) AS pick
  FROM UNNEST(range(1, {BOOT_B} + 1)) AS b(b),
       UNNEST(range(0, (SELECT n FROM nn))) AS i(i)
),
means AS MATERIALIZED (
  SELECT d.b,
         CAST(SUM(s.score) AS DOUBLE) / COUNT(*) AS m
  FROM draws d JOIN base s ON s.doc_id = d.pick
  GROUP BY d.b
),
ranked AS (
  SELECT m, row_number() OVER (ORDER BY m, b) AS rk FROM means
)
SELECT (SELECT CAST(n AS BIGINT) FROM nn) AS n_docs,
       CAST({BOOT_B} AS BIGINT) AS n_resamples,
       (SELECT ROUND(CAST(SUM(score) AS DOUBLE) / COUNT(*), 6) FROM base)
         AS mean_obs,
       ROUND((SELECT m FROM ranked
              WHERE rk = CAST(ceil(0.025 * {BOOT_B}) AS BIGINT)), 6)
         AS ci_lo,
       ROUND((SELECT m FROM ranked
              WHERE rk = CAST(ceil(0.975 * {BOOT_B}) AS BIGINT)), 6)
         AS ci_hi
""",
)
def quality_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_long

    d = table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", F.length("text").cast("bigint").alias("score")
    )
    nn = base.agg(F.count(F.lit(1)).alias("n"))
    draws = (
        spark.range(1, BOOT_B + 1)
        .select(F.col("id").alias("b"))
        .crossJoin(F.broadcast(nn))
        .select(
            "b", F.explode(F.sequence(F.lit(0), F.col("n") - 1)).alias("i")
        )
        .crossJoin(F.broadcast(nn))
        .select(
            "b",
            (
                md5_long(
                    F.concat(
                        F.col("b").cast("string"),
                        F.lit(":"),
                        F.col("i").cast("string"),
                    )
                )
                % F.col("n")
            ).alias("pick"),
        )
    )
    means = (
        draws.join(base, draws["pick"] == base["doc_id"])
        .groupBy("b")
        .agg(
            (F.sum("score").cast("double") / F.count(F.lit(1))).alias("m")
        )
    )
    # order statistics over B rows — bounded by the resample protocol
    ranked = means.withColumn(
        "rk", F.row_number().over(Window.orderBy("m", "b"))
    )
    import math

    k_lo = math.ceil(0.025 * BOOT_B)
    k_hi = math.ceil(0.975 * BOOT_B)
    ci = (
        ranked.where(F.col("rk").isin(k_lo, k_hi))
        .agg(
            F.round(F.min(F.when(F.col("rk") == k_lo, F.col("m"))), 6)
            .alias("ci_lo"),
            F.round(F.min(F.when(F.col("rk") == k_hi, F.col("m"))), 6)
            .alias("ci_hi"),
        )
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(
            F.sum("score").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_obs"),
    )
    return (
        stats.crossJoin(F.broadcast(ci))
        .select(
            "n_docs",
            F.lit(BOOT_B).cast("bigint").alias("n_resamples"),
            "mean_obs",
            "ci_lo",
            "ci_hi",
        )
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit — forensic data-quality screen
# ---------------------------------------------------------------------------

import math as _math

# log10(1 + 1/d) injected as the SAME Python double into both engines
# (NOTES gotcha 13: textual fractional literals parse as DECIMAL on
# Spark and diverge ~1e-8 from double math)
_BENFORD_P = {d: _math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def _benford_oracle() -> str:
    p_case = " ".join(
        f"WHEN {d} THEN CAST({_BENFORD_P[d]!r} AS DOUBLE)"
        for d in range(1, 10)
    )
    return f"""
WITH digits AS MATERIALIZED (
  SELECT substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR),
                1, 1) AS digit
  FROM lineitem WHERE l_extendedprice > 0
),
counts AS (SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit),
spine AS (
  SELECT CAST(dd.dd AS VARCHAR) AS digit,
         CASE dd.dd {p_case} END AS p
  FROM UNNEST(range(1, 10)) AS dd(dd)
),
joined AS MATERIALIZED (
  SELECT s.digit, s.p, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
  FROM spine s LEFT JOIN counts c ON c.digit = s.digit
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nt,
         SUM((n - CAST(SUM(n) OVER () AS DOUBLE) * p)
             * (n - CAST(SUM(n) OVER () AS DOUBLE) * p)
             / (CAST(SUM(n) OVER () AS DOUBLE) * p)) AS _bad
  FROM joined
)
SELECT j.digit,
       j.n AS n_obs,
       ROUND(CAST(j.n AS DOUBLE) / t.nt, 6) AS frac_obs,
       ROUND(j.p, 6) AS p_benford,
       ROUND(c.chi2, 6) AS chi2_total
FROM joined j,
     (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM joined) t,
     (SELECT SUM((n - (SELECT CAST(SUM(n) AS DOUBLE) FROM joined) * p)
                 * (n - (SELECT CAST(SUM(n) AS DOUBLE) FROM joined) * p)
                 / ((SELECT CAST(SUM(n) AS DOUBLE) FROM joined) * p))
               AS chi2
      FROM joined) c
"""


@register(
    "quality_benford_digits",
    family="quality",
    doc="Benford's-law first-digit audit over lineitem extended prices "
    "— the classic forensic screen for fabricated numeric data: "
    "observed leading-digit frequencies vs log10(1+1/d), plus the "
    "chi-square statistic.  First digit is taken from the DIGITS of "
    "floor(price) (floor is exact on IEEE doubles in both engines; a "
    "double->int cast would round on DuckDB but truncate on Spark), "
    "expected probabilities are Python-evaluated double literals "
    "injected into both plans (gotcha 13).  One hash aggregate over 9 "
    "digit cells; the chi-square total is a 1-row aggregate broadcast "
    "back onto the 9-row digit spine.  Emits (digit, n_obs, frac_obs, "
    "p_benford, chi2_total) x 9.",
    oracle=_benford_oracle(),
)
def quality_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(F.col("l_extendedprice") > 0)
    digits = li.select(
        F.substring(
            F.floor(F.col("l_extendedprice")).cast("bigint").cast("string"),
            1,
            1,
        ).alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    p_col = F.col("dd")
    p_expr = None
    for d in range(1, 10):
        branch = F.when(p_col == d, F.lit(_BENFORD_P[d]))
        p_expr = branch if p_expr is None else p_expr.when(
            p_col == d, F.lit(_BENFORD_P[d])
        )
    spine = spark.range(1, 10).select(
        F.col("id").alias("dd")
    ).select(
        F.col("dd").cast("string").alias("digit"),
        p_expr.alias("p"),
    )
    joined = spine.join(counts, "digit", "left").select(
        "digit",
        "p",
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
    )
    totals = joined.agg(F.sum("n").cast("bigint").alias("nt"))
    chi = (
        joined.crossJoin(F.broadcast(joined.agg(
            F.sum("n").cast("double").alias("ntd")
        )))
        .select(
            (
                (F.col("n") - F.col("ntd") * F.col("p"))
                * (F.col("n") - F.col("ntd") * F.col("p"))
                / (F.col("ntd") * F.col("p"))
            ).alias("term")
        )
        .agg(F.sum("term").alias("chi2"))
    )
    return (
        joined.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(chi))
        .select(
            "digit",
            F.col("n").alias("n_obs"),
            F.round(F.col("n").cast("double") / F.col("nt"), 6).alias(
                "frac_obs"
            ),
            F.round(F.col("p"), 6).alias("p_benford"),
            F.round(F.col("chi2"), 6).alias("chi2_total"),
        )
    )


_LCP_ORACLE = f"""
WITH tier AS MATERIALIZED (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         substr(regexp_replace(COALESCE(text, ''), '[^ -~]', '', 'g'),
                1, {SA_MAX_CHARS}) || chr(1) AS doc_text
  FROM documents WHERE doc_id % {SA_DOC_MOD} = 0
),
offs AS MATERIALIZED (
  SELECT doc_id, doc_text, length(doc_text) AS doc_len,
         CAST(COALESCE(SUM(length(doc_text)) OVER (
             ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS doc_off
  FROM tier
),
corpus AS MATERIALIZED (
  SELECT string_agg(doc_text, '' ORDER BY doc_id) AS s FROM tier
),
posn AS MATERIALIZED (
  SELECT doc_off + unnest(generate_series(1, doc_len)) - 1 AS pos
  FROM offs
),
ranked AS MATERIALIZED (
  SELECT CAST(row_number() OVER (
           ORDER BY substr((SELECT s FROM corpus),
                           CAST(pos + 1 AS INTEGER))) AS BIGINT) AS sa_rank,
         CAST(pos AS BIGINT) AS pos
  FROM posn
),
pairs AS MATERIALIZED (
  SELECT a.sa_rank, a.pos AS pos_a, b.pos AS pos_b,
         (SELECT length(s) FROM corpus) - GREATEST(a.pos, b.pos) + 1
           AS maxcmp
  FROM ranked a JOIN ranked b ON b.sa_rank = a.sa_rank + 1
),
probes AS MATERIALIZED (
  SELECT sa_rank, pos_a, pos_b,
         unnest(generate_series(1, maxcmp)) AS k
  FROM pairs
)
SELECT sa_rank, pos_a, pos_b,
       CAST(MIN(CASE WHEN substr((SELECT s FROM corpus),
                                 CAST(pos_a + k AS INTEGER), 1)
                       <> substr((SELECT s FROM corpus),
                                 CAST(pos_b + k AS INTEGER), 1)
                 THEN k END) - 1 AS BIGINT) AS lcp
FROM probes
GROUP BY sa_rank, pos_a, pos_b
"""


@register(
    "text_suffix_lcp",
    family="text",
    doc="LCP array over the suffix-array-adjacent suffix pairs of the "
    "same bounded corpus tier as text_suffix_array — the repeated-"
    "substring readout of Lee et al.'s dedup pipeline (the MAX row is "
    "the corpus's longest repeated substring).  Kasai's O(n) LCP walk "
    "is inherently sequential; this uses the rank-table binary "
    "decomposition instead (operators/suffix_array.py::lcp_adjacent): "
    "the doubling ladder RETAINS each duplicate-bearing span's rank "
    "table — all-distinct ranks at span s imply max LCP <= s-1, so "
    "the ladder early-stops there and the retained spans sum to "
    "exactly s-1 (~3-5 levels on natural text, not log2(n)) — then "
    "each adjacent pair descends the spans largest-first, adding span "
    "to its accumulator whenever rank_span[pos_a+acc] == "
    "rank_span[pos_b+acc] — two EQUI-joins per level, "
    "never a character comparison.  The oracle probes characters "
    "directly (first differing offset per adjacent pair) — an "
    "independent O(sum maxcmp) algorithm, affordable on the tier.  "
    "Emits (sa_rank, pos_a, pos_b, lcp) for every adjacent pair.",
    oracle=_LCP_ORACLE,
)
def text_suffix_lcp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.suffix_array import (
        corpus_positions,
        lcp_adjacent,
        suffix_array_with_history,
    )

    docs = table(spark, sf_dir, "documents").where(
        F.col("doc_id") % SA_DOC_MOD == 0
    )
    chars, _ = corpus_positions(docs, max_chars=SA_MAX_CHARS)
    sa, history = suffix_array_with_history(chars)
    return lcp_adjacent(sa, history).select(
        F.col("sa_rank").cast("long").alias("sa_rank"),
        F.col("pos_a").cast("long").alias("pos_a"),
        F.col("pos_b").cast("long").alias("pos_b"),
        F.col("lcp").cast("long").alias("lcp"),
    )
