from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from nemsis_xml_parser_spark.operators.fuzzy import fuzzy_pairs


def _brute_pairs(rows):
    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    out = set()
    for i, (ia, na) in enumerate(rows):
        for ib, nb in rows[i + 1:]:
            if lev(na, nb) <= 1:
                out.add((min(ia, ib), max(ia, ib)))
    return out


def test_fastss_matches_brute_force(spark):
    rng = random.Random(11)
    alphabet = "abcde"
    base = ["".join(rng.choice(alphabet) for _ in range(6)) for _ in range(30)]
    rows = []
    nid = 0
    for s in base:
        rows.append((nid, s)); nid += 1
        r = rng.random()
        if r < 0.4:  # substitution
            i = rng.randrange(len(s))
            rows.append((nid, s[:i] + rng.choice(alphabet) + s[i + 1:])); nid += 1
        elif r < 0.6:  # deletion
            i = rng.randrange(len(s))
            rows.append((nid, s[:i] + s[i + 1:])); nid += 1
        elif r < 0.8:  # insertion
            i = rng.randrange(len(s) + 1)
            rows.append((nid, s[:i] + rng.choice(alphabet) + s[i:])); nid += 1
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r["id_a"], r["id_b"]) for r in fuzzy_pairs(df).collect()
    }
    assert got == _brute_pairs(rows)


def test_fastss_rejects_unsupported_distance(spark):
    df = spark.createDataFrame([(1, "ab")], "id long, name string")
    with pytest.raises(NotImplementedError):
        fuzzy_pairs(df, max_dist=2)


def test_fastss_no_false_negatives_on_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "alpha"), (3, "alphx"), (4, "zzz")],
        "id long, name string",
    )
    got = {(r["id_a"], r["id_b"], r["dist"]) for r in fuzzy_pairs(df).collect()}
    assert got == {(1, 2, 0), (1, 3, 1), (2, 3, 1)}
