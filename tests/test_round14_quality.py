"""Invariant tests for the round-14 quality queries (the DuckDB oracle
gate proves engine parity; these pin the statistical contracts)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from nemsis_xml_parser_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_bootstrap_ci_contract(spark):
    row = QUERIES["quality_bootstrap_ci"].spark(spark, SF_DIR).collect()[0]
    assert row["n_resamples"] == 200
    assert row["n_docs"] > 0
    # percentile interval must be ordered and bracket a plausible mean
    assert row["ci_lo"] <= row["ci_hi"]
    # the observed mean need not be inside a percentile CI in theory,
    # but for a mean of a well-behaved sample it is — and determinism
    # means this either always holds on this corpus or never does
    assert row["ci_lo"] <= row["mean_obs"] <= row["ci_hi"]


def test_bootstrap_ci_deterministic(spark):
    q = QUERIES["quality_bootstrap_ci"].spark
    a = q(spark, SF_DIR).collect()
    b = q(spark, SF_DIR).collect()
    assert a == b


def test_benford_digits_contract(spark):
    rows = QUERIES["quality_benford_digits"].spark(spark, SF_DIR).collect()
    assert sorted(r["digit"] for r in rows) == [str(d) for d in range(1, 10)]
    # observed fractions sum to ~1, expected probabilities sum to ~1
    assert abs(sum(r["frac_obs"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["p_benford"] for r in rows) - 1.0) < 1e-6
    for r in rows:
        assert abs(r["p_benford"] - round(math.log10(1 + 1 / int(r["digit"])), 6)) < 1e-9
    # one chi2 total replicated across the spine, non-negative
    chis = {r["chi2_total"] for r in rows}
    assert len(chis) == 1 and chis.pop() >= 0
    # counts actually reflect the table
    n_total = sum(r["n_obs"] for r in rows)
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    assert n_total == li.where(F.col("l_extendedprice") > 0).count()
