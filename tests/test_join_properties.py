"""Property-based equivalence tests (hypothesis) for the custom join
operators: randomized inputs, independent reference implementations.

* asof_join (union + fill-forward window) ≡ per-row Python brute force
* salted_join (8-way salt replication)    ≡ plain equi-join
"""

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from nemsis_xml_parser_spark.operators.asof_join import asof_join
from nemsis_xml_parser_spark.operators.partitioning import salted_join

# (key, ts) pairs from tiny domains so collisions/ties actually happen
left_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 9)), min_size=1, max_size=12
)
right_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 9)), max_size=12
)


def brute_asof(lrows, rrows):
    """For each left row: value of the latest right row with ts<=left.ts in
    the same key; ties on (key, ts) resolved by max value (= right_order)."""
    out = {}
    for i, (k, t) in enumerate(lrows):
        cands = [(rt, v) for (rk, rt, v) in rrows if rk == k and rt <= t]
        out[i] = max(cands)[1] if cands else None
    return out


@settings(max_examples=8, deadline=None)
@given(left_rows, right_rows)
def test_asof_join_matches_brute_force(spark, lrows, rrows):
    # right value doubles as the deterministic tie-break (max wins)
    rrows3 = [(k, t, k * 100 + t * 10 + i) for i, (k, t) in enumerate(rrows)]
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)], "lid long, k long, ts long"
    )
    right = spark.createDataFrame(
        rrows3, "k long, ts long, val long"
    ).withColumn("__ord", F.col("val"))
    out = asof_join(left, right, key="k", ts="ts", right_order="__ord", value_cols=["val"])
    got = {r["lid"]: r["val"] for r in out.collect()}
    assert got == brute_asof(lrows, rrows3)


@settings(max_examples=8, deadline=None)
@given(left_rows, right_rows)
def test_salted_join_identical_to_plain(spark, lrows, rrows):
    left = spark.createDataFrame(
        [(i, k) for i, (k, _) in enumerate(lrows)], "lid long, k long"
    )
    right = (
        spark.createDataFrame(rrows or [(99, 0)], "k long, v long")
        .groupBy("k")
        .count()
    )
    plain = sorted(
        (r["lid"], r["k"], r["count"]) for r in left.join(right, "k").collect()
    )
    salted = sorted(
        (r["lid"], r["k"], r["count"])
        for r in salted_join(left, right, key="k", salt=4).collect()
    )
    assert salted == plain


points_strat = st.lists(
    st.tuples(st.integers(0, 20), st.floats(-10, 10, allow_nan=False)),
    min_size=1, max_size=15,
)
intervals_strat = st.lists(
    st.tuples(
        st.integers(0, 20),
        st.floats(-10, 10, allow_nan=False),
        st.floats(0, 6, allow_nan=False),  # span (>=0; zero-width → empty)
    ),
    max_size=10,
)


@settings(max_examples=8, deadline=None)
@given(points_strat, intervals_strat)
def test_banded_range_join_matches_naive(spark, prows, irows):
    from nemsis_xml_parser_spark.operators.range_join import banded_range_join

    points = spark.createDataFrame(
        [(i, v) for i, (_, v) in enumerate(prows)], "pid long, val double"
    )
    intervals = spark.createDataFrame(
        [(i, lo, lo + span) for i, (_, lo, span) in enumerate(irows)] or [(99, 5.0, 5.0)],
        "iid long, lo double, hi double",
    )
    naive = sorted(
        (r["pid"], r["iid"])
        for r in points.join(
            intervals,
            (points.val >= intervals.lo) & (points.val < intervals.hi),
        ).collect()
    )
    banded = sorted(
        (r["pid"], r["iid"])
        for r in banded_range_join(
            points, intervals, "val", "lo", "hi", band_width=2.5
        ).collect()
    )
    assert banded == naive
