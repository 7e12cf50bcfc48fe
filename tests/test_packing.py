"""Greedy boundary-respecting packing: invariants + hypothesis properties."""

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nemsis_xml_parser_spark.operators.packing import greedy_pack


def _frame(spark, rows):
    return spark.createDataFrame(rows, "lang string, doc_id long, tok long")


def test_greedy_pack_basic(spark):
    rows = [
        ("en", 1, 1000), ("en", 2, 1000), ("en", 3, 100),
        ("en", 4, 2049),            # oversized: own pack, flagged
        ("de", 10, 2048),           # exact fit
        ("de", 11, 1),
    ]
    out = greedy_pack(_frame(spark, rows), budget=2048).collect()
    packs = {(r["shard"], r["pack_id"]): r for r in out}
    en0 = packs[("en", 0)]
    assert en0["doc_ids"] == [1, 2]  # 2000 fits; +100 would overflow 2048
    assert en0["tokens"] <= 2048
    en1 = packs[("en", 1)]
    assert 3 in en1["doc_ids"]
    oversize = [r for r in out if r["oversize"]]
    assert [r["doc_ids"] for r in oversize] == [[4]]
    de0 = packs[("de", 0)]
    assert de0["tokens"] == 2048 and de0["fill"] == 1.0
    assert packs[("de", 1)]["doc_ids"] == [11]


@settings(max_examples=15, deadline=None)
@given(
    toks=st.lists(st.integers(min_value=0, max_value=3000), min_size=1, max_size=60),
    budget=st.integers(min_value=100, max_value=2500),
)
def test_greedy_pack_invariants(spark_session_global, toks, budget):
    spark = spark_session_global
    rows = [("en", i, t) for i, t in enumerate(toks)]
    out = greedy_pack(_frame(spark, rows), budget=budget).collect()
    # every doc packed exactly once
    packed = [d for r in sorted(out, key=lambda r: r["pack_id"]) for d in r["doc_ids"]]
    assert sorted(packed) == list(range(len(toks)))
    # doc order preserved within the shard stream
    assert packed == sorted(packed)
    for r in out:
        assert r["tokens"] == sum(toks[d] for d in r["doc_ids"])
        # a pack only exceeds budget when it is a single oversized doc
        if r["tokens"] > budget:
            assert r["oversize"] and r["n_docs"] == 1
        # greedy tightness: the first doc of the NEXT pack would not have fit
    by_id = {r["pack_id"]: r for r in out}
    for pid in range(len(by_id) - 1):
        nxt_first = by_id[pid + 1]["doc_ids"][0]
        assert by_id[pid]["tokens"] + toks[nxt_first] > budget


@pytest.fixture(scope="module")
def spark_session_global(spark):
    return spark
