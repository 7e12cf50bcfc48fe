"""Split conformal audit (plans/round13.py): the distribution-free
coverage guarantee must show up empirically, and the order statistic
must be the finite-sample-valid index."""

from __future__ import annotations

import math

from nemsis_xml_parser_spark.plans import QUERIES
from nemsis_xml_parser_spark.plans.round13 import CP_ALPHA


def test_coverage_near_guarantee(spark):
    rows = QUERIES["quality_conformal_interval"].spark(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 5  # one per order priority
    for r in rows:
        # finite-sample: coverage >= 1 - alpha in expectation; allow
        # sampling slack below, and it must never be vacuous (radius > 0)
        assert r.coverage >= 1 - CP_ALPHA - 0.05, r
        assert r.q_radius > 0
        assert r.n_calib > 100 and r.n_test > 100


def test_order_statistic_index(spark):
    """q_radius equals the ceil((n+1)(1-alpha))-th smallest calibration
    residual, recomputed independently driver-side."""
    import pyspark.sql.functions as F

    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").select(
        F.col("o_orderpriority").alias("seg"),
        F.col("o_totalprice").cast("decimal(18,4)").alias("y"),
        (F.md5(F.col("o_orderkey").cast("string")) < F.lit("8")).alias(
            "is_calib"
        ),
    )
    calib = [(r.seg, float(r.y)) for r in o.where("is_calib").collect()]
    mus = {}
    for seg in {s for s, _ in calib}:
        ys = [y for s, y in calib if s == seg]
        mus[seg] = sum(ys) / len(ys)
    got = {
        r.seg: r.q_radius
        for r in QUERIES["quality_conformal_interval"]
        .spark(spark, "/root/testdata/sf0.01")
        .collect()
    }
    for seg, mu in mus.items():
        rs = sorted(round(abs(y - mu), 4) for s, y in calib if s == seg)
        k = min(math.ceil((len(rs) + 1) * (1 - CP_ALPHA)), len(rs))
        assert abs(rs[k - 1] - got[seg]) < 1e-9, seg
