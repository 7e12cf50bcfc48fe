"""Round-14 additions: greedy facility-location exemplar selection.

Reference parity: none — §2.I curation tier (the reference is a
psycopg2 ETL with no subset-selection operators).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import register, table

# ---------------------------------------------------------------------------
# Greedy facility location (Nemhauser et al. '78; the CRAIG / exemplar-
# selection shape in training-data curation)
# ---------------------------------------------------------------------------

FL_K = 5           # greedy picks
FL_CAND_MOD = 29   # candidate pool: vec_id % 29 == 0


def _fl_oracle() -> str:
    cos = (
        "ROUND(list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b}))), 6)"
    )
    dec0 = "CAST(0 AS DECIMAL(18,6))"
    parts = [
        f"""WITH e AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cand AS MATERIALIZED (
  SELECT vec_id, v FROM e WHERE vec_id % {FL_CAND_MOD} = 0
),
sims AS MATERIALIZED (
  SELECT u.vec_id AS i, c.vec_id AS j,
         CAST(GREATEST({cos.format(a="u.v", b="c.v")}, 0)
              AS DECIMAL(18,6)) AS s
  FROM e u CROSS JOIN cand c
),
cur0 AS MATERIALIZED (
  SELECT vec_id AS i, {dec0} AS cur FROM e
)"""
    ]
    for t in range(1, FL_K + 1):
        excl = ""
        if t > 1:
            sel = " UNION ALL ".join(
                f"SELECT j FROM p{x}" for x in range(1, t)
            )
            excl = f"WHERE s.j NOT IN ({sel})"
        parts.append(
            f"""g{t} AS MATERIALIZED (
  SELECT s.j, SUM(GREATEST(s.s - c.cur, {dec0})) AS gain
  FROM sims s JOIN cur{t - 1} c ON c.i = s.i
  {excl}
  GROUP BY s.j
),
p{t} AS MATERIALIZED (
  SELECT j, gain FROM g{t} ORDER BY gain DESC, j ASC LIMIT 1
),
cur{t} AS MATERIALIZED (
  SELECT c.i, GREATEST(c.cur, COALESCE(x.s, {dec0})) AS cur
  FROM cur{t - 1} c
  LEFT JOIN (
    SELECT i, s FROM sims WHERE j = (SELECT j FROM p{t})
  ) x ON x.i = c.i
),
cov{t} AS MATERIALIZED (
  SELECT SUM(cur) AS coverage FROM cur{t}
)"""
        )
    final = "\nUNION ALL\n".join(
        f"SELECT CAST({t} AS INTEGER) AS pick, p{t}.j AS vec_id, "
        f"ROUND(CAST(p{t}.gain AS DOUBLE), 6) AS gain, "
        f"ROUND(CAST(cov{t}.coverage AS DOUBLE), 6) AS coverage FROM p{t}, cov{t}"
        for t in range(1, FL_K + 1)
    )
    return ",\n".join(parts) + "\n" + final


@register(
    "curation_facility_location",
    family="curation",
    doc="Greedy facility-location exemplar selection (operators/"
    f"facility.py — Nemhauser et al. '78, the CRAIG/coreset curation "
    f"shape): pick {FL_K} documents maximizing summed best-coverage of "
    "the WHOLE corpus, f(S) = sum_i max_(j in S) cos+(i, j), from a "
    f"deterministic candidate pool (vec_id % {FL_CAND_MOD} == 0).  "
    "Greedy is (1-1/e)-optimal for monotone submodular f.  Unlike the "
    "MMR rerank (candidate-local by design), every greedy step is a "
    "DISTRIBUTED aggregate: the (corpus x candidates) similarity frame "
    "is built once with the bounded candidate side broadcast, each "
    "step's marginal gains are one map-side-combinable SUM over it "
    "joined to the corpus-sized coverage vector, the argmax is a "
    "TakeOrdered over candidate rows, and the winner rides back as a "
    "broadcast 1-row frame — no driver collect, no global window.  "
    "Determinism: similarities clamp+round to a 6-dp DECIMAL grid, so "
    "gains are exact order-independent sums and the greedy path is "
    "engine-identical (ties by candidate id); the oracle unrolls the "
    "loop as per-pick MATERIALIZED CTEs.  Emits (pick, vec_id, gain, "
    "coverage) in selection order.",
    oracle=_fl_oracle(),
)
def curation_facility_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.facility import facility_location_greedy

    e = table(spark, sf_dir, "embeddings")
    cand = e.where(F.col("vec_id") % FL_CAND_MOD == 0)
    return facility_location_greedy(e, cand, k=FL_K)
