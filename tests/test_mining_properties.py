"""Property-based parity for the mining/join tier: FP-growth vs brute
force on random baskets; nearest as-of vs pd.merge_asof on random
series.  Few hypothesis examples (each runs a Spark job), wide shapes."""

from __future__ import annotations

from collections import Counter
from itertools import combinations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from nemsis_xml_parser_spark.operators.asof_join import asof_join
from nemsis_xml_parser_spark.operators.fpgrowth import fpgrowth_itemsets

baskets_strategy = st.lists(
    st.lists(st.integers(min_value=1, max_value=8), min_size=1, max_size=6),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(baskets_strategy, st.integers(min_value=1, max_value=4))
def test_fpgrowth_matches_bruteforce(spark, baskets, minsup):
    rows = [(k, i) for k, items in enumerate(baskets) for i in items]
    df = spark.createDataFrame(rows, "k bigint, item bigint")
    got = {
        (tuple(r["items"]), r["support"])
        for r in fpgrowth_itemsets(df, "k", "item", minsup).collect()
    }
    cnt: Counter = Counter()
    for items in baskets:
        s = sorted(set(items))
        for n in range(1, len(s) + 1):
            for c in combinations(s, n):
                cnt[c] += 1
    want = {(c, n) for c, n in cnt.items() if n >= minsup}
    assert got == want


ts_strategy = st.lists(
    st.integers(min_value=0, max_value=50), min_size=1, max_size=12, unique=True
)


@settings(max_examples=8, deadline=None)
@given(ts_strategy, ts_strategy)
def test_nearest_asof_matches_pandas(spark, lts, rts):
    left = spark.createDataFrame([(1, t) for t in lts], "k long, ts long")
    right = spark.createDataFrame(
        [(1, t, t * 10) for t in rts], "k long, ts long, v long"
    )
    got = {
        r["ts"]: r["v"]
        for r in asof_join(
            left, right, "k", "ts", "v", ["v"], direction="nearest"
        ).collect()
    }
    lp = pd.DataFrame({"ts": sorted(lts)})
    rp = pd.DataFrame({"ts": sorted(rts), "v": [t * 10 for t in sorted(rts)]})
    exp = pd.merge_asof(lp, rp, on="ts", direction="nearest")
    want = {
        int(row.ts): (None if pd.isna(row.v) else int(row.v))
        for row in exp.itertuples()
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(ts_strategy, ts_strategy,
       st.sampled_from(["backward", "forward", "nearest"]),
       st.integers(min_value=0, max_value=20))
def test_asof_tolerance_matches_pandas(spark, lts, rts, direction, tol):
    left = spark.createDataFrame([(1, t) for t in lts], "k long, ts long")
    right = spark.createDataFrame(
        [(1, t, t * 10) for t in rts], "k long, ts long, v long"
    )
    got = {
        r["ts"]: r["v"]
        for r in asof_join(
            left, right, "k", "ts", "v", ["v"],
            direction=direction, tolerance=tol,
        ).collect()
    }
    lp = pd.DataFrame({"ts": sorted(lts)})
    rp = pd.DataFrame({"ts": sorted(rts), "v": [t * 10 for t in sorted(rts)]})
    exp = pd.merge_asof(lp, rp, on="ts", direction=direction, tolerance=tol)
    want = {
        int(row.ts): (None if pd.isna(row.v) else int(row.v))
        for row in exp.itertuples()
    }
    assert got == want
