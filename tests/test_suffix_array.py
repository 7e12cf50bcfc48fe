"""Suffix array by prefix doubling (operators/suffix_array.py) and the
two-pass distributed dense rank it rides on (operators/prefix_sum.py).

Ground truth is the direct definition: sort the actual suffix strings.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nemsis_xml_parser_spark.operators.prefix_sum import global_dense_rank
from nemsis_xml_parser_spark.operators.suffix_array import (
    DOC_SEP,
    corpus_positions,
    suffix_array_prefix_doubling,
)


def _chars_frame(spark, s: str):
    return spark.createDataFrame(
        [(i, s[i]) for i in range(len(s))], "pos long, c string"
    )


def _true_ranks(s: str) -> dict[int, int]:
    order = sorted(range(len(s)), key=lambda i: s[i:])
    return {pos: rank + 1 for rank, pos in enumerate(order)}


def test_global_dense_rank_matches_sorted_distinct(spark):
    rows = [(i, (i * 7919) % 13, (i * 104729) % 5) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    out = {
        r["id"]: r["gr"]
        for r in global_dense_rank(df, ["a", "b"], num_ranges=4).collect()
    }
    keys = sorted({(a, b) for _, a, b in rows})
    want = {k: i + 1 for i, k in enumerate(keys)}
    for i, a, b in rows:
        assert out[i] == want[(a, b)]


def test_banana_suffix_array(spark):
    s = "banana"
    got = {
        r["pos"]: r["sa_rank"]
        for r in suffix_array_prefix_doubling(
            _chars_frame(spark, s), num_ranges=4
        ).collect()
    }
    assert got == _true_ranks(s)


def test_repetitive_corpus_needs_many_rounds(spark):
    # all-equal chars force the full log2(n) doubling ladder (every
    # round's early-stop probe fails until d >= n)
    s = "a" * 33 + "b"
    got = {
        r["pos"]: r["sa_rank"]
        for r in suffix_array_prefix_doubling(
            _chars_frame(spark, s), num_ranges=4
        ).collect()
    }
    assert got == _true_ranks(s)


@settings(max_examples=6, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from("ab c!"), min_size=1, max_size=60
    )
)
def test_random_strings_match_direct_sort(spark, s):
    got = {
        r["pos"]: r["sa_rank"]
        for r in suffix_array_prefix_doubling(
            _chars_frame(spark, s), num_ranges=4
        ).collect()
    }
    assert got == _true_ranks(s)


def test_corpus_positions_concat_and_query_shape(spark):
    docs = spark.createDataFrame(
        [
            (0, "ba\x90na"),   # non-ASCII byte is sanitized out
            (7, None),          # NULL text -> separator only
            (14, "abba"),
        ],
        "doc_id long, text string",
    )
    chars, offsets = corpus_positions(docs, max_chars=3)
    # sanitize -> cap at 3 -> append separator, concatenated in id order
    want_corpus = "ban" + DOC_SEP + DOC_SEP + "abb" + DOC_SEP
    rows = sorted(chars.collect(), key=lambda r: r["pos"])
    assert "".join(r["c"] for r in rows) == want_corpus
    assert [r["pos"] for r in rows] == list(range(len(want_corpus)))
    # doc attribution and local positions survive the explode
    assert [(r["doc_id"], r["local_pos"]) for r in rows] == [
        (0, 0), (0, 1), (0, 2), (0, 3), (7, 0),
        (14, 0), (14, 1), (14, 2), (14, 3),
    ]
    # ranks over the multi-doc corpus equal the direct sort of the
    # same concatenation (suffixes cross document boundaries)
    got = {
        r["pos"]: r["sa_rank"]
        for r in suffix_array_prefix_doubling(chars, num_ranges=4).collect()
    }
    assert got == _true_ranks(want_corpus)
    offs = {r["doc_id"]: r["doc_off"] for r in offsets.collect()}
    assert offs == {0: 0, 7: 4, 14: 5}


def test_early_stop_round_count(spark):
    # distinct-heavy text goes all-unique after very few doublings; the
    # implementation must return identical ranks either way — compare a
    # forced-full-ladder run (max_rounds) against the early-stop run
    s = "the quick brown fox jumps over the lazy dog"
    chars = _chars_frame(spark, s)
    early = {
        r["pos"]: r["sa_rank"]
        for r in suffix_array_prefix_doubling(chars, num_ranges=4).collect()
    }
    assert early == _true_ranks(s)


def _true_lcps(s: str) -> dict[int, tuple[int, int, int]]:
    order = sorted(range(len(s)), key=lambda i: s[i:])
    out = {}
    for r in range(len(order) - 1):
        a, b = order[r], order[r + 1]
        l = 0
        while a + l < len(s) and b + l < len(s) and s[a + l] == s[b + l]:
            l += 1
        out[r + 1] = (a, b, l)
    return out


def test_lcp_walk_banana(spark):
    from nemsis_xml_parser_spark.operators.suffix_array import (
        lcp_adjacent,
        suffix_array_with_history,
    )

    s = "banana"
    sa, hist = suffix_array_with_history(_chars_frame(spark, s), num_ranges=4)
    got = {
        r["sa_rank"]: (r["pos_a"], r["pos_b"], r["lcp"])
        for r in lcp_adjacent(sa, hist).collect()
    }
    assert got == _true_lcps(s)


def test_lcp_walk_repetitive_and_random(spark):
    from nemsis_xml_parser_spark.operators.suffix_array import (
        lcp_adjacent,
        suffix_array_with_history,
    )

    for s in ("aaaaaaab", "abcabcabcabcxyzabcabc", "mississippi river runs"):
        sa, hist = suffix_array_with_history(
            _chars_frame(spark, s), num_ranges=4
        )
        got = {
            r["sa_rank"]: (r["pos_a"], r["pos_b"], r["lcp"])
            for r in lcp_adjacent(sa, hist).collect()
        }
        assert got == _true_lcps(s), s
