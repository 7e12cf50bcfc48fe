"""Round-11 queries: multi-table LSH ANN (the E2LSH OR-amplification
that gives hyperplane LSH a usable recall point), plus this round's
additions to the similarity/streaming frontier.

Reference parity: none — §2.I LLM-pipeline extension tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import register, table

# ---------------------------------------------------------------------------
# Multi-table sign-LSH — the OR-amplified recall path
# ---------------------------------------------------------------------------

_MT_PLANES = 6
_MT_TABLES = 8
_MT_K = 5
_MT_NQ = 3


def _mtlsh_oracle(
    num_planes: int = _MT_PLANES,
    n_tables: int = _MT_TABLES,
    k: int = _MT_K,
    nq: int = _MT_NQ,
    seed: int = 42,
) -> str:
    """Generated oracle: every table's seeded hyperplanes inlined as one
    (t, plane_idx, p) VALUES relation; per-table sign buckets, the
    (t, bucket) candidate join, cross-table DISTINCT and the exact-cosine
    top-k replayed relationally — byte-identical to
    similarity.lsh_multitable_topk."""
    from ..operators.similarity import _lcg_planes

    rows = []
    for t in range(n_tables):
        for i, p in enumerate(_lcg_planes(num_planes, 64, seed + t)):
            lst = "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in p) + "]"
            rows.append(f"({t}, {i}, {lst})")
    values = ",\n    ".join(rows)
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
planes(t, plane_idx, p) AS (VALUES
    {values}
),
b AS (
  SELECT e.vec_id, pl.t,
         CAST(SUM(CASE WHEN list_dot_product(e.v, pl.p) >= 0
                       THEN CAST(POWER(2, pl.plane_idx) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS bucket
  FROM e CROSS JOIN planes pl
  GROUP BY e.vec_id, pl.t
),
cand AS (
  SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
  FROM b qb JOIN b cb ON cb.t = qb.t AND cb.bucket = qb.bucket
  WHERE qb.vec_id < {nq} AND cb.vec_id != qb.vec_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         ROUND(list_dot_product(q.v, n.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(n.v, n.v))), 6) AS cosine
  FROM cand c
  JOIN e q ON q.vec_id = c.query_id
  JOIN e n ON n.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {k}
"""


@register(
    "ann_lsh_multitable_topk",
    family="similarity",
    doc="Multi-table sign-LSH top-k (operators/similarity.py::"
    "lsh_multitable_topk; the E2LSH OR-amplification of Indyk/Motwani "
    "and Datar et al.): 8 INDEPENDENT seeded 6-plane tables, candidate "
    "union across tables, cross-table DISTINCT, exact-cosine re-rank.  "
    "Multi-probe widens one table's search with correlated probes and "
    "plateaued at recall 0.10 (ANN_RECALL_r10's negative result); "
    "independent tables follow the 1-(1-p^planes)^L curve instead — "
    "the standard construction that pushes hyperplane LSH to usable "
    "RECALL (0.56-0.69 at planes6x16 / planes4x8, ANN_RECALL_r11, vs "
    "the 0.10 multi-probe plateau).  Honest frontier note: at the "
    "harness's 2000-vector corpus the L-table index work cannot "
    "amortize against an O(n) brute scan (2.8-9x brute wall), so "
    "IVFPQ+rerank (0.986 at 1.9x) dominates every hyperplane-LSH "
    "config THERE — the multitable curve is the 100 TB shape, where "
    "the bucket-pruned candidate fraction, not the index pass, is the "
    "cost that matters.  Deterministic end to end "
    "(LCG hyperplanes seeded 42..49, 6-dp rounding, neighbor-id ties), "
    "so the oracle replays every table's buckets and the full re-rank "
    "from the same plane constants.  At 100 TB: the corpus index "
    "carries L bucket rows per vector (the E2LSH space tradeoff) and "
    "the candidate join shuffles only (table, bucket) groups.",
    oracle=_mtlsh_oracle(),
)
def ann_lsh_multitable_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity as S

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.where(F.col("vec_id") < _MT_NQ)
    out = S.lsh_multitable_topk(
        queries,
        emb,
        k=_MT_K,
        num_planes=_MT_PLANES,
        n_tables=_MT_TABLES,
        dim=64,
    )
    return out.select(
        "query_id",
        "neighbor_id",
        "cosine",
        F.col("rank").cast("int").alias("rank"),
    )
