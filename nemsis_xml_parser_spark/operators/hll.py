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
# alpha_m * m^2 as the PYTHON-evaluated double, injected with F.lit.
# Spark SQL parses fractional literals as DECIMALs, so the textual
# expression `(0.7213 / (1.0 + 1.079 / 64.0)) * 4096.0` evaluates in
# decimal arithmetic there (≈2905.46048) while DuckDB promotes the
# division to DOUBLE (2905.460551… — exactly Python's IEEE result);
# the ~2.5e-8 relative gap flips the 6th decimal of raw-branch
# estimates (caught by graph_hyperball_anf — the LC branch all earlier
# HLL queries took hides it).  The oracle keeps the textual form,
# which DuckDB evaluates to this same double.
_ALPHA_M2_VAL = (0.7213 / (1.0 + 1.079 / float(_M))) * float(_M * _M)
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
    Fraction(_ALPHA_M2_VAL) * _POW61 / (Fraction(5, 2) * _M)
)


def hll_rho(h: Column) -> Column:
    """rho of the 60-p bit word above the register index: 61 - p minus
    the word's bit length (bin() gives the exact length; w = 0 → 61-p)."""
    w = F.shiftright(h, HLL_P)
    bitlen = F.when(w == 0, F.lit(0)).otherwise(F.length(F.bin(w)))
    return F.lit(61 - HLL_P) - bitlen


# the exact-integer numerator term per present register (F.shiftleft
# only takes a literal bit count; the SQL form accepts a column expr)
HLL_NUM_TERM = "CAST(shiftleft(CAST(1 AS BIGINT), 61 - mj) AS DECIMAL(38,0))"


def hll_est_expr(num_present: Column, n_present: Column) -> Column:
    """The HLL estimate from a sparse register aggregate — num_present =
    exact DECIMAL(38,0) Σ 2^(61-mj) over PRESENT registers, n_present =
    their count.  Empty registers enter in closed form; the
    linear-counting branch is decided on the exact integer denominator
    (see _LC_THRESHOLD) so both engines provably take the same branch."""
    num_dec = num_present + (F.lit(_M) - n_present).cast(
        "decimal(38,0)"
    ) * F.lit(_POW61).cast("decimal(38,0)")
    zeros = (F.lit(_M) - n_present).cast("double")
    raw = (
        F.lit(_ALPHA_M2_VAL) * F.lit(float(_POW61)) / num_dec.cast("double")
    )
    return F.when(
        # threshold exceeds BIGINT range — inject as a DECIMAL literal
        (num_dec >= F.expr(f"CAST('{_LC_THRESHOLD}' AS DECIMAL(38,0))"))
        & (zeros > 0),
        F.lit(float(_M)) * F.log(F.lit(float(_M)) / zeros),
    ).otherwise(raw)


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
        F.sum(F.expr(HLL_NUM_TERM)).alias("num_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    est = hll_est_expr(F.col("num_present"), F.col("n_present"))
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
