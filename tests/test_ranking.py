from __future__ import annotations

import math

from nemsis_xml_parser_spark.operators.ranking import bm25_scores


def _bm25(tf: int, df: int, n: int, dl: int, avgdl: float, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))


def test_bm25_matches_closed_form(spark):
    docs = spark.createDataFrame(
        [
            (0, "spark join spark window"),
            (1, "scan filter agg"),
            (2, "join join join table"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["spark", "join"]).collect()}
    avgdl = (4 + 3 + 4) / 3.0
    want0 = _bm25(2, 1, 3, 4, avgdl) + _bm25(1, 2, 3, 4, avgdl)  # spark + join
    want2 = _bm25(3, 2, 3, 4, avgdl)  # join only
    assert set(got) == {0, 2}  # doc 1 matches nothing
    assert abs(got[0] - want0) < 1e-6
    assert abs(got[2] - want2) < 1e-6


def test_bm25_rewards_rarity_and_penalizes_length(spark):
    docs = spark.createDataFrame(
        [(0, "rare common"), (1, "common " * 50), (2, "common x")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["rare", "common"]).collect()}
    # 'rare' (df=1) outscores doc 2's 'common' (df=3)
    assert got[0] > got[2]
    # same tf of 'common' but 50x longer doc scores lower
    assert got[1] < got[2] or got[1] < got[0]
