"""HyperLogLog distinct-count estimation as a deterministic, fully
oracle-checkable aggregate (Flajolet et al. 2007).

``agg_approx_distinct`` exercises Spark's builtin HLL++ and can only be
rows-only-checked (its registers are engine-private).  This operator
builds the sketch from the repo's cross-engine md5 hash
(functions/hashing.py), so every register value — and therefore the
estimate itself — is reproducible in SQL: register index = low p bits,
rho = leading-zero rank of the remaining 60-p bits computed EXACTLY via
``length(bin(w))`` (both engines render integers to binary strings —
no float log2 at bit boundaries).

Determinism discipline for the estimate: the harmonic denominator
Σ 2^(-M_j) is the integer Σ 2^(61-M_j) divided by 2^61, summed as
DECIMAL(38,0) — exact and order-independent — then ONE double division;
empty registers enter in closed form (n_empty · 2^61) so the m
registers never need densifying.  The small-range linear-counting
branch compares exact integers, so both engines take the same branch.

Scale: this is the whole point of the sketch — COUNT(DISTINCT) is a
full shuffle of the key universe, the HLL is a map-side-combinable
(group, 64-register) max-aggregate whose state is 64 small ints per
group regardless of cardinality.

Reference parity: none — §2.I sketch tier.
"""

from __future__ import annotations

import math
from fractions import Fraction

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions.hashing import md5_long

HLL_P = 6  # 2^6 = 64 registers
_M = 1 << HLL_P
# alpha_m * m^2, written with the same literal arithmetic as the oracle
_ALPHA_M2 = f"(0.7213 / (1.0 + 1.079 / {_M}.0)) * {_M * _M}.0"
_POW61 = 1 << 61

# Linear-counting branch (raw <= 2.5*m) decided on the EXACT integer
# denominator instead of the double `raw`:
#   raw <= 2.5*m  ⟺  alpha_m2 * 2^61 / num <= 2.5*m  ⟺  num >= threshold
# with threshold = alpha_m2 * 2^61 / (2.5*m) computed exactly here (the
# double alpha_m2 is the same IEEE value Python / Spark / DuckDB all
# evaluate from the literal above; Fraction lifts it losslessly).  For
# integer num, `num >= threshold` ⟺ `num >= ceil(threshold)` — so both
# engines compare the same DECIMAL against the same integer literal and
# provably take the same branch, with no reliance on double-division
# rounding at the boundary.
_LC_THRESHOLD = math.ceil(
    Fraction((0.7213 / (1.0 + 1.079 / float(_M))) * float(_M * _M))
    * _POW61
    / (Fraction(5, 2) * _M)
)


def hll_rho(h: Column) -> Column:
    """rho of the 60-p bit word above the register index: 61 - p minus
    the word's bit length (bin() gives the exact length; w = 0 → 61-p)."""
    w = F.shiftright(h, HLL_P)
    bitlen = F.when(w == 0, F.lit(0)).otherwise(F.length(F.bin(w)))
    return F.lit(61 - HLL_P) - bitlen


def hll_estimate(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """(group, n_exact, hll_estimate, rel_error) — the md5-register HLL
    estimate next to the exact distinct count it approximates."""
    h = md5_long(F.col(value_col))
    reg = (
        df.select(
            F.col(group_col).alias("g"),
            (h % _M).alias("j"),
            hll_rho(h).alias("rho"),
            F.col(value_col).alias("v"),
        )
        .groupBy("g", "j")
        .agg(
            F.max("rho").alias("mj"),
            # exact distinct per register: cheap tie-out, the sum over
            # registers is the group's exact distinct (register index is
            # a function of the value)
            F.count_distinct(F.col("v")).alias("nd"),
        )
    )
    per = reg.groupBy("g").agg(
        F.sum("nd").cast("bigint").alias("n_exact"),
        # F.shiftleft only takes a literal bit count; the SQL form
        # accepts a column expression
        F.sum(
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT), 61 - mj) AS DECIMAL(38,0))"
            )
        ).alias("num_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    num_dec = F.col("num_present") + (
        F.lit(_M) - F.col("n_present")
    ).cast("decimal(38,0)") * F.lit(_POW61).cast("decimal(38,0)")
    num = num_dec.cast("double")
    zeros = (F.lit(_M) - F.col("n_present")).cast("double")
    raw = F.expr(_ALPHA_M2) * F.lit(float(_POW61)) / num
    # branch on the exact DECIMAL num, not the double raw (see
    # _LC_THRESHOLD) — raw <= 2.5*m ⟺ num >= threshold
    est = F.when(
        # threshold exceeds BIGINT range — inject as a DECIMAL literal
        (num_dec >= F.expr(f"CAST('{_LC_THRESHOLD}' AS DECIMAL(38,0))"))
        & (zeros > 0),
        F.lit(float(_M)) * F.log(F.lit(float(_M)) / zeros),
    ).otherwise(raw)
    return per.select(
        F.col("g").alias(group_col),
        "n_exact",
        F.round(est, 6).alias("hll_estimate"),
        F.round(
            F.abs(est - F.col("n_exact").cast("double"))
            / F.col("n_exact").cast("double"),
            6,
        ).alias("rel_error"),
    )
