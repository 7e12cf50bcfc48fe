"""Greedy facility-location exemplar selection: independent numpy greedy
parity, submodularity (non-increasing gains), and coverage accounting."""

from __future__ import annotations

from decimal import Decimal

import numpy as np
import pyspark.sql.functions as F

from nemsis_xml_parser_spark.operators.facility import (
    facility_location_greedy,
)

SRC = "/root/testdata/sf0.001/embeddings.parquet"
K = 5
MOD = 29


def _numpy_greedy(vecs: dict[int, np.ndarray], cand_ids: list[int], k: int):
    """Reference greedy on the same 6-dp clamped-cosine grid, exact
    Decimal sums (the engine contract)."""
    ids = sorted(vecs)
    sims = {}
    for j in cand_ids:
        vj = vecs[j]
        nj = np.sqrt(vj @ vj)
        col = {}
        for i in ids:
            vi = vecs[i]
            den = np.sqrt(vi @ vi) * nj
            c = float(vi @ vj / den) if den > 0 else 0.0
            col[i] = max(
                Decimal(format(round(c, 6), ".6f")), Decimal("0")
            )
        sims[j] = col
    cur = {i: Decimal("0") for i in ids}
    picks = []
    chosen: set[int] = set()
    for t in range(k):
        best = None
        for j in sorted(cand_ids):
            if j in chosen:
                continue
            gain = sum(
                max(sims[j][i] - cur[i], Decimal("0")) for i in ids
            )
            if best is None or gain > best[1]:
                best = (j, gain)
        j, gain = best
        chosen.add(j)
        for i in ids:
            cur[i] = max(cur[i], sims[j][i])
        picks.append((t + 1, j, float(gain), float(sum(cur.values()))))
    return picks


def test_matches_independent_greedy(spark):
    e = spark.read.parquet(SRC).select("vec_id", "embedding").limit(150)
    cand = e.where(F.col("vec_id") % MOD == 0)
    got = [
        (r.pick, r.vec_id, r.gain, r.coverage)
        for r in facility_location_greedy(e, cand, k=K)
        .orderBy("pick")
        .collect()
    ]
    vecs = {
        int(r.vec_id): np.array(r.embedding, dtype=np.float64)
        for r in e.collect()
    }
    cand_ids = [i for i in vecs if i % MOD == 0]
    exp = _numpy_greedy(vecs, cand_ids, K)
    assert [(p, j) for p, j, *_ in got] == [(p, j) for p, j, *_ in exp]
    for (_, _, g1, c1), (_, _, g2, c2) in zip(got, exp):
        assert abs(g1 - g2) < 1e-6 and abs(c1 - c2) < 1e-6


def test_submodular_gains_and_coverage_accounting(spark):
    e = spark.read.parquet(SRC).select("vec_id", "embedding")
    cand = e.where(F.col("vec_id") % MOD == 0)
    rows = (
        facility_location_greedy(e, cand, k=K).orderBy("pick").collect()
    )
    assert [r.pick for r in rows] == list(range(1, K + 1))
    assert len({r.vec_id for r in rows}) == K  # no re-picks
    gains = [r.gain for r in rows]
    # greedy marginal gains of a submodular f are non-increasing
    assert all(a >= b - 1e-9 for a, b in zip(gains, gains[1:]))
    # coverage is the running sum of gains (both from exact sums)
    run = 0.0
    for r in rows:
        run += r.gain
        assert abs(r.coverage - run) < 1e-6
