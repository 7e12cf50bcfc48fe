"""Unit + property tests for the PPJoin-style prefix-filtered
set-similarity join (operators/ssjoin.py).

The registered query's oracle proves end-to-end equality with the naive
all-pairs formulation; these tests pin the algorithmic guts: the prefix
bound, losslessness of candidate generation, and that the filter has
actual teeth (prunes candidates vs the naive shared-token join).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyspark.sql.functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nemsis_xml_parser_spark.operators import ssjoin as SS  # noqa: E402


def _tokens(spark, sets):
    rows = [(i, t) for i, toks in sets.items() for t in toks]
    return spark.createDataFrame(rows, "id long, token string")


def _jaccard(a, b):
    a, b = set(a), set(b)
    return len(a & b) / len(a | b)


def test_prefix_length_formula():
    # |s| - ceil(t|s|) + 1
    assert SS.exact_prefix_len(10, 0.5) == 6
    assert SS.exact_prefix_len(10, 0.9) == 2
    assert SS.exact_prefix_len(1, 0.5) == 1
    assert SS.exact_prefix_len(7, 0.8) == 2


def test_verified_pairs_match_bruteforce(spark):
    sets = {
        1: ["a", "b", "c", "d"],
        2: ["a", "b", "c", "e"],      # J(1,2)=3/5=0.6
        3: ["x", "y", "z", "w"],      # disjoint from 1,2
        4: ["x", "y", "z", "q"],      # J(3,4)=0.6
        5: ["a", "x"],                # shares tokens, low J everywhere
        6: ["a", "b", "c", "d"],      # identical to 1 -> J=1.0
    }
    t = 0.5
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in SS.verified_pairs(_tokens(spark, sets), t).collect()
    }
    want = {
        (i, j): round(_jaccard(sets[i], sets[j]), 6)
        for i in sets
        for j in sets
        if i < j and _jaccard(sets[i], sets[j]) >= t
    }
    assert got == want


def test_prefix_filter_is_lossless_but_prunes(spark):
    # skewed universe: token 's' is a stopword present everywhere
    sets = {i: [f"u{i}", f"v{i}", "s"] for i in range(20)}
    sets[100] = ["u1", "v1", "s"]  # true near-dup of 1 (J=1.0)
    tok = _tokens(spark, sets)
    t = 0.8
    cand = SS.prefix_candidates(tok, t)
    cand_pairs = {(r.id_a, r.id_b) for r in cand.collect()}
    # lossless: every true pair is a candidate
    verified = {(r.id_a, r.id_b) for r in SS.verified_pairs(tok, t).collect()}
    assert verified == {(1, 100)}
    assert verified <= cand_pairs
    # teeth: the naive shared-token join would pair all 21 sets through
    # the stopword 's' (210 pairs); the prefix never includes 's' at
    # t=0.8 (prefix length 1, rarest-first), so candidates stay tiny
    naive_pairs = 21 * 20 // 2
    assert len(cand_pairs) < naive_pairs / 10


def test_rare_first_prefix_excludes_stopword(spark):
    sets = {i: [f"u{i}", "s"] for i in range(10)}
    tok = _tokens(spark, sets)
    # t=0.9 on size-2 sets -> prefix length 2-2+1=1 -> only the rarest
    # token (each u_i, df=1) enters the prefix; 's' (df=10) never does
    cand = SS.prefix_candidates(tok, 0.9)
    assert cand.count() == 0


def test_prefix_len_exact_at_float_boundary():
    # fl(10*0.9) = 9.000000000000002 -> a float ceil gives 10, shortening
    # the prefix by one and breaking losslessness; exact rational math
    # must give ceil(9.0) = 9 -> prefix length 10 - 9 + 1 = 2
    assert SS.exact_prefix_len(10, 0.9) == 2
    assert SS.exact_prefix_len(10, 0.3) == 8   # ceil(3.0000000000000004)=3
    assert SS.exact_prefix_len(7, 0.7) == 3    # ceil(4.9)=5 -> 7-5+1
    for sz in range(1, 60):
        for t in (0.1, 0.2, 0.3, 0.5, 0.7, 0.8, 0.9, 0.95):
            from fractions import Fraction
            fr = Fraction(t).limit_denominator(1_000_000)
            true_ceil = -((-sz * fr.numerator) // fr.denominator)
            assert SS.exact_prefix_len(sz, t) == sz - true_ceil + 1


def test_prefix_lossless_at_float_boundary(spark):
    # size-10 sets, t=0.9: J>=0.9 pairs must survive the prefix filter
    # even though fl(10*0.9) rounds up past the integer
    base = [f"w{k}" for k in range(9)]
    sets = {1: base + ["x1"], 2: base + ["x2"]}  # overlap 9, union 11: J=9/11<0.9
    sets[3] = list(sets[1])                      # J(1,3)=1.0 >= 0.9
    tok = _tokens(spark, sets)
    verified = {(r.id_a, r.id_b) for r in SS.verified_pairs(tok, 0.9).collect()}
    assert verified == {(1, 3)}
