"""Prefix-filtered set-similarity self-join (PPJoin-style).

The classic scalable algorithm for "all pairs with Jaccard >= t" without
the quadratic all-pairs join (Chaudhuri et al. 2006 SSJoin / Xiao et al.
2008 PPJoin, re-expressed as DataFrame ops):

1. order every record's token set by GLOBAL rarity (document frequency
   ascending, token ascending — rarest first);
2. keep only each record's PREFIX — the first ``|s| - ceil(t*|s|) + 1``
   tokens.  Two sets with Jaccard >= t MUST share at least one prefix
   token (pigeonhole on the overlap lower bound ceil(t/(1+t)*(|a|+|b|)),
   so the prefix join is a LOSSLESS candidate generator;
3. equi-join prefixes on the token (rare tokens -> tiny buckets), apply
   the length filter ``t*|a| <= |b| <= |a|/t`` that Jaccard implies;
4. verify candidates exactly with one overlap count per pair.

Scale shape: no all-pairs expansion — the join key is a single token and
prefix tokens are by construction the RAREST ones, so bucket sizes are
bounded by the df of rare tokens (the stopword problem of a naive
token join disappears: stopwords sit at the END of the df ordering and
never enter short prefixes).  The per-record rank is a window
partitioned by record id (never global); the df table joins by token.

No counterpart in the reference (a psycopg2 ETL —
/root/reference/main_ingest.py has no similarity operators); this is
part of the LLM-pipeline tier the rebuild adds.
"""

from __future__ import annotations

from fractions import Fraction

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _rational(threshold: float) -> tuple[int, int]:
    """threshold as an exact small rational p/q (q <= 10^6).

    The prefix bound needs ceil(t*|s|) EXACTLY: computed in floating
    point, t=0.9 with |s|=10 gives fl(9.000000000000002) -> ceil 10,
    silently shortening the prefix by one and breaking the lossless
    candidate guarantee.  All bound arithmetic therefore runs on the
    rational form in integer math.
    """
    fr = Fraction(threshold).limit_denominator(1_000_000)
    return fr.numerator, fr.denominator


def prefix_length(set_size: F.Column, threshold: float) -> F.Column:
    """|s| - ceil(t*|s|) + 1 — the Jaccard prefix bound, exact.

    With t = p/q, ceil(|s|*p/q) = floor((|s|*p + q - 1)/q) in integer
    arithmetic; |s|*p stays well under 2^53 so the double division
    inside FLOOR cannot cross an integer boundary (fractional parts are
    multiples of 1/q >= 1e-6, double error ~1e-16 relative).
    """
    p, q = _rational(threshold)
    ceil_ts = F.floor((set_size * F.lit(p) + F.lit(q - 1)) / F.lit(q))
    return set_size - ceil_ts + 1


def prefix_candidates(
    tokens: DataFrame,
    threshold: float,
    id_col: str = "id",
    token_col: str = "token",
) -> DataFrame:
    """Candidate (id_a < id_b) pairs sharing >= 1 prefix token.

    ``tokens``: one row per DISTINCT (id, token).  Returns
    (id_a, id_b, sz_a, sz_b) distinct pairs after the length filter
    AND the PPJoin positional filter (both lossless).

    Positional filter (Xiao et al. 2008 §4, re-derived for the
    symmetric prefix join): tokens carry their rank in the GLOBAL
    rarity order, identical in every record.  For a pair, take the
    FIRST token shared by both prefixes — min (rnk_a, rnk_b); shared
    tokens appear in the same relative order on both sides, so min
    rnk_a picks min rnk_b too.  No common token can precede it (it
    would sit inside both prefixes, contradicting firstness), so
    overlap <= 1 + min(|a|-i, |b|-j).  Jaccard >= t needs overlap >=
    ceil(t/(1+t)·(|a|+|b|)) = ceil(p·(|a|+|b|)/(p+q)); for integer
    ubound that is ubound·(p+q) >= p·(|a|+|b|) exactly — candidates
    failing it can never verify and are dropped before the expensive
    overlap count.
    """
    dfreq = tokens.groupBy(token_col).agg(F.count(F.lit(1)).alias("df"))
    # set size via an unordered window over the SAME id partitioning the
    # rank needs — one shuffle supplies both, instead of a separate
    # groupBy + join back (two extra ops on the full token frame)
    ranked = (
        tokens.join(dfreq, token_col)
        .withColumn(
            "sz", F.count(F.lit(1)).over(Window.partitionBy(id_col))
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(
                    F.col("df").asc(), F.col(token_col).asc()
                )
            ),
        )
        .where(F.col("rnk") <= prefix_length(F.col("sz"), threshold))
        .select(id_col, token_col, "sz", "rnk")
    )
    a = ranked.select(
        F.col(id_col).alias("id_a"), F.col(token_col).alias("tk"),
        F.col("sz").alias("sz_a"), F.col("rnk").alias("rnk_a"),
    )
    b = ranked.select(
        F.col(id_col).alias("id_b"), F.col(token_col).alias("tk"),
        F.col("sz").alias("sz_b"), F.col("rnk").alias("rnk_b"),
    )
    p, q = _rational(threshold)
    # length filter t*|a| <= |b| <= |a|/t in exact integer form:
    # |b|*q >= |a|*p and |a|*q >= |b|*p (no float rounding at the bound)
    first = F.min(F.struct("rnk_a", "rnk_b")).alias("first")
    ubound = F.lit(1) + F.least(
        F.col("sz_a") - F.col("first.rnk_a"),
        F.col("sz_b") - F.col("first.rnk_b"),
    )
    return (
        a.join(b, "tk")
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.col("sz_b") * q >= F.col("sz_a") * p)
        .where(F.col("sz_a") * q >= F.col("sz_b") * p)
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(first)
        .where(ubound * (p + q) >= (F.col("sz_a") + F.col("sz_b")) * p)
        .select("id_a", "id_b", "sz_a", "sz_b")
    )


def verified_pairs(
    tokens: DataFrame,
    threshold: float,
    id_col: str = "id",
    token_col: str = "token",
) -> DataFrame:
    """Exact (id_a, id_b, sz_a, sz_b, n_common, jaccard) with J >= t.

    Verification counts the overlap only for prefix candidates: the
    candidate pair list joins both token postings and aggregates per
    pair — candidate-bounded work, not all-pairs.
    """
    cand = prefix_candidates(tokens, threshold, id_col, token_col)
    ta = tokens.select(
        F.col(id_col).alias("id_a"), F.col(token_col).alias("tk")
    )
    tb = tokens.select(
        F.col(id_col).alias("id_b"), F.col(token_col).alias("tk")
    )
    common = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "tk"])
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("n_common")
    )
    p, q = _rational(threshold)
    # J >= p/q  <=>  n_common*q >= (sz_a+sz_b-n_common)*p — exact in ints
    keep = F.col("n_common") * q >= (
        F.col("sz_a") + F.col("sz_b") - F.col("n_common")
    ) * p
    return (
        common.withColumn("jaccard", F.round(jac, 6))
        .where(keep)
        .select("id_a", "id_b", "sz_a", "sz_b", "n_common", "jaccard")
    )


def exact_prefix_len(sz: int, threshold: float) -> int:
    """Python twin of ``prefix_length`` for tests (same integer math)."""
    p, q = _rational(threshold)
    return sz - -(-(sz * p) // q) + 1
