"""FP-growth (PFP) mining: brute-force parity, a-priori cross-check,
wide-basket behavior, max_len bound."""

from __future__ import annotations

from collections import Counter
from itertools import combinations

import pytest

from nemsis_xml_parser_spark.operators.apriori import pair_supports, triple_supports
from nemsis_xml_parser_spark.operators.fpgrowth import fpgrowth_itemsets

BASKETS = [
    (1, [1, 2, 3]),
    (2, [1, 2, 4]),
    (3, [1, 2, 3, 4]),
    (4, [2, 3, 5]),
    (5, [1, 3, 5]),
    (6, [2, 4, 5]),
    (7, [1, 2, 3, 5]),
    (8, [3, 4]),
    (9, [1, 4, 5]),
    (10, [2, 3, 4, 5]),
]


def brute(minsup: int, max_len: int | None = None) -> set:
    cnt: Counter = Counter()
    for _, items in BASKETS:
        top = len(items) if max_len is None else min(max_len, len(items))
        for n in range(1, top + 1):
            for c in combinations(sorted(items), n):
                cnt[c] += 1
    return {(c, s) for c, s in cnt.items() if s >= minsup}


@pytest.fixture(scope="module")
def basket_df(spark):
    rows = [(k, i) for k, items in BASKETS for i in items]
    return spark.createDataFrame(rows, "k bigint, item bigint")


def collect_sets(df) -> set:
    return {(tuple(r["items"]), r["support"]) for r in df.collect()}


def test_matches_bruteforce_all_sizes(basket_df):
    got = collect_sets(fpgrowth_itemsets(basket_df, "k", "item", 2))
    assert got == brute(2)


def test_max_len_bound(basket_df):
    got = collect_sets(fpgrowth_itemsets(basket_df, "k", "item", 2, max_len=2))
    assert got == {(c, s) for c, s in brute(2) if len(c) <= 2}


def test_minsup_floor(basket_df):
    got = collect_sets(fpgrowth_itemsets(basket_df, "k", "item", 4))
    assert got == brute(4)
    assert all(s >= 4 for _, s in got)


def test_agrees_with_apriori_pairs_and_triples(basket_df):
    """Same itemsets + supports as the join-per-level a-priori tier."""
    fp = collect_sets(fpgrowth_itemsets(basket_df, "k", "item", 2, max_len=3))
    pairs = {
        ((r["a"], r["b"]), r["c"])
        for r in pair_supports(basket_df, "k", "item", 2).collect()
    }
    triples = {
        ((r["a"], r["b"], r["c"]), r["cnt"])
        for r in triple_supports(basket_df, "k", "item", 2).collect()
    }
    assert {(c, s) for c, s in fp if len(c) == 2} == pairs
    assert {(c, s) for c, s in fp if len(c) == 3} == triples


def test_wide_basket_deep_itemsets(spark):
    """A 12-item basket duplicated 3x: every subset of it is frequent at
    minsup 3 — the deep-mining case the level-wise joins would need 12
    shuffle rounds for; FP-growth's per-group recursion covers it in one
    shuffle.  Checked exactly against the closed form C(12, n)."""
    wide = list(range(100, 112))
    rows = [(k, i) for k in (1, 2, 3) for i in wide] + [(4, 100), (4, 101)]
    df = spark.createDataFrame(rows, "k bigint, item bigint")
    got = collect_sets(fpgrowth_itemsets(df, "k", "item", 3))
    # every non-empty subset of `wide` has support 3 (+1 for {100},{101},
    # {100,101} from basket 4)
    assert len(got) == 2**12 - 1
    bonus = {(100,), (101,), (100, 101)}
    for c, s in got:
        assert s == (4 if c in bonus else 3)


def test_sharded_groups_identical_output(basket_df):
    """PFP F-list sharding (n_groups) is a physical-layout knob only."""
    plain = collect_sets(fpgrowth_itemsets(basket_df, "k", "item", 2))
    for g in (1, 3, 64):
        assert collect_sets(
            fpgrowth_itemsets(basket_df, "k", "item", 2, n_groups=g)
        ) == plain


def test_empty_below_support(spark):
    df = spark.createDataFrame([(1, 10), (2, 20)], "k bigint, item bigint")
    assert fpgrowth_itemsets(df, "k", "item", 2).count() == 0
