"""Round-15 guarded local endgames: parity of the single-task twins
against the distributed paths they replace (pagerank / personalized
pagerank / Borůvka round ladder / suffix-array prefix doubling /
dyadic rank descent).  Every assertion is EXACT equality — the twins
claim bit-identical replays, not approximations."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pyspark.sql.functions as F  # noqa: E402

from nemsis_xml_parser_spark.operators.mst import (  # noqa: E402
    boruvka_forest,
)
from nemsis_xml_parser_spark.operators.pagerank import (  # noqa: E402
    pagerank,
    personalized_pagerank,
)
from nemsis_xml_parser_spark.operators.suffix_array import (  # noqa: E402
    corpus_positions,
    suffix_array_prefix_doubling,
)


def _seeded_edges(seed: int, n_nodes: int, n_edges: int):
    """Deterministic pseudo-random directed multigraph (hash-based,
    no RNG state)."""
    rows = []
    for i in range(n_edges):
        u = (i * 7919 + seed * 104729) % n_nodes
        v = (i * 6007 + seed * 15485863 + 1) % n_nodes
        if u != v:
            rows.append((u, v))
    return rows


def test_pagerank_local_matches_distributed(spark):
    for seed in (1, 2, 3):
        rows = _seeded_edges(seed, 40, 120)
        df = spark.createDataFrame(rows, "src long, dst long")
        got_local = {
            (r["node"], r["degree"], r["pr"])
            for r in pagerank(df, iters=3).collect()
        }
        got_dist = {
            (r["node"], r["degree"], r["pr"])
            for r in pagerank(df, iters=3, local_finish_max=0).collect()
        }
        assert got_local == got_dist


def test_ppr_local_matches_distributed(spark):
    rows = _seeded_edges(5, 30, 90)
    df = spark.createDataFrame(rows, "src long, dst long")
    seeds = spark.createDataFrame([(1,), (2,), (7,)], "node long")
    got_local = {
        (r["node"], r["degree"], r["is_seed"], r["pr"])
        for r in personalized_pagerank(df, seeds, iters=3).collect()
    }
    got_dist = {
        (r["node"], r["degree"], r["is_seed"], r["pr"])
        for r in personalized_pagerank(
            df, seeds, iters=3, local_finish_max=0
        ).collect()
    }
    assert got_local == got_dist


def test_boruvka_local_matches_distributed(spark):
    triples = [
        (u, v, (u * 7 + v * 13) % 50)
        for u, v in _seeded_edges(9, 25, 80)
        if u < v
    ]
    df = spark.createDataFrame(triples, "u long, v long, w long")
    p_loc, c_loc = boruvka_forest(df, rounds=5)
    p_dst, c_dst = boruvka_forest(df, rounds=5, local_finish_max=0)
    assert {tuple(r) for r in p_loc.collect()} == {
        tuple(r) for r in p_dst.collect()
    }
    assert {tuple(r) for r in c_loc.collect()} == {
        tuple(r) for r in c_dst.collect()
    }


def test_suffix_array_local_matches_distributed(spark):
    docs = spark.createDataFrame(
        [
            (0, "banana bandana"),
            (1, "an annal; a banana!"),
            (2, "nanananananananana"),
            (3, "the quick brown fox"),
        ],
        "doc_id long, text string",
    )
    chars, _ = corpus_positions(docs, max_chars=40)
    got_local = {
        (r["pos"], r["sa_rank"])
        for r in suffix_array_prefix_doubling(chars).collect()
    }
    got_dist = {
        (r["pos"], r["sa_rank"])
        for r in suffix_array_prefix_doubling(chars, local_max=0).collect()
    }
    assert got_local == got_dist


def test_dyadic_rows_descent_matches_join_descent(spark):
    from nemsis_xml_parser_spark.operators.dyadic import (
        dyadic_counts,
        dyadic_rank_select,
        dyadic_rank_select_rows,
    )
    from nemsis_xml_parser_spark.operators.lineage import cut_lineage

    L = 8
    vals = [(i * i * 37 + i) % 251 for i in range(400)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    counts = cut_lineage(dyadic_counts(df, F.col("v"), L))
    targets = [(0.25, 100), (0.5, 200), (0.75, 300)]
    tdf = spark.createDataFrame(targets, "q double, target long")
    want = {
        (r["q"], r["target"], r["value"])
        for r in dyadic_rank_select(counts, tdf, L).collect()
    }
    got = {
        (q, t, v)
        for q, t, v in dyadic_rank_select_rows(
            [(r["l"], r["bucket"], r["c"]) for r in counts.collect()],
            targets,
            L,
        )
    }
    assert got == want
    # tie-out against a direct sort: the descent returns the TRUE
    # order statistics
    ordered = sorted(vals)
    for q, t, v in got:
        assert v == ordered[t - 1]
