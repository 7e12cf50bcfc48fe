"""md5-register HLL vs a pure-Python reference and its error bound."""

from __future__ import annotations

import hashlib
import math

from nemsis_xml_parser_spark.operators.hll import HLL_P, hll_estimate


def ref_hll(values):
    m = 1 << HLL_P
    regs = [0] * m
    for v in values:
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        j = h % m
        w = h >> HLL_P
        rho = (61 - HLL_P) - (w.bit_length())
        regs[j] = max(regs[j], rho)
    num = sum(2.0 ** (-r) for r in regs)
    raw = (0.7213 / (1.0 + 1.079 / m)) * m * m / num
    zeros = regs.count(0)
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return raw


def test_hll_matches_python_reference(spark):
    vals = [f"token{i * 7}" for i in range(500)]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "g string, v string"
    )
    row = hll_estimate(df, "g", "v").collect()[0]
    assert row.n_exact == 500
    assert abs(row.hll_estimate - ref_hll(set(vals))) < 1e-4


def test_hll_error_within_bound_and_duplicate_blind(spark):
    # duplicates must not move the estimate; error within ~3 sigma of
    # the 1.04/sqrt(m) HLL standard error
    vals = [f"item-{i}" for i in range(2000)]
    rows = [("g", v) for v in vals] + [("g", v) for v in vals[:700]]
    df = spark.createDataFrame(rows, "g string, v string")
    row = hll_estimate(df, "g", "v").collect()[0]
    assert row.n_exact == 2000
    assert row.rel_error < 3 * 1.04 / math.sqrt(64)
    df2 = spark.createDataFrame(
        [("g", v) for v in vals], "g string, v string"
    )
    row2 = hll_estimate(df2, "g", "v").collect()[0]
    assert row2.hll_estimate == row.hll_estimate


def test_hll_small_range_linear_counting(spark):
    df = spark.createDataFrame(
        [("g", f"x{i}") for i in range(10)], "g string, v string"
    )
    row = hll_estimate(df, "g", "v").collect()[0]
    assert row.n_exact == 10
    assert abs(row.hll_estimate - ref_hll({f"x{i}" for i in range(10)})) < 1e-4
