"""HITS (hubs & authorities) power iteration on a directed edge list.

Kleinberg's HITS on a bipartite interaction graph (e.g. customers →
parts): authority(p) accumulates the hub mass of everyone pointing at
p, hub(c) accumulates the authority mass c points at; each side is
L1-normalized per half-iteration.

Determinism contract (the same trick as operators/pagerank.py): every
per-edge contribution is rounded to 12 dp and cast to DECIMAL(20,12)
BEFORE the sum, so the aggregate is exact and order-independent in both
engines; normalization divides two DOUBLEs derived from exact decimal
sums and re-rounds to 12 dp.  An unrolled SQL oracle can replay every
iteration bit-for-bit.

Scale shape: per half-iteration one key-grouped aggregate (shuffle on
dst resp. src) and a broadcast 1-row L1-total; the edge list should be
localCheckpoint-ed by the caller if candidate generation upstream is
expensive.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .lineage import cut_lineage

_DEC = "decimal(20,12)"


def _l1_normalize(raw: DataFrame, key: str, raw_col: str, out_col: str) -> DataFrame:
    total = raw.agg(F.sum(raw_col).alias("_t"))  # exact decimal sum
    return raw.crossJoin(F.broadcast(total)).select(
        key,
        F.round(
            F.col(raw_col).cast("double") / F.col("_t").cast("double"), 12
        ).alias(out_col),
    )


def hits(edges: DataFrame, iters: int = 2) -> tuple[DataFrame, DataFrame]:
    """(authorities, hubs) after ``iters`` full iterations.

    ``edges``: (src, dst) distinct directed edges.  Returns
    ``(dst, auth)`` and ``(src, hub)`` frames, scores L1-normalized and
    rounded to 12 dp.  Raises on ``iters < 1`` (iters=0 would return
    ``(None, hubs)``) and on an empty edge list (the L1 total would be
    NULL and every score silently null).
    """
    if iters < 1:
        raise ValueError(f"hits() needs iters >= 1, got {iters}")
    e = edges.select("src", "dst")
    if e.isEmpty():
        raise ValueError("hits() on an empty edge list: L1 normalization undefined")
    hubs = e.select("src").distinct().withColumn("hub", F.lit(1.0))
    auth = None
    for _ in range(iters):
        auth_raw = (
            e.join(hubs, "src")
            .groupBy("dst")
            .agg(F.sum(F.round(F.col("hub"), 12).cast(_DEC)).alias("auth_raw"))
        )
        # localCheckpoint per half-iteration: the normalize references its
        # input twice (L1 total + the division) and the next iteration
        # references this one — without truncation the plan doubles per
        # level (measured: 44 exchanges at iters=2, ~6 with checkpoints)
        auth = _l1_normalize(auth_raw, "dst", "auth_raw", "auth").transform(cut_lineage)
        hub_raw = (
            e.join(auth, "dst")
            .groupBy("src")
            .agg(F.sum(F.round(F.col("auth"), 12).cast(_DEC)).alias("hub_raw"))
        )
        hubs = _l1_normalize(hub_raw, "src", "hub_raw", "hub").transform(cut_lineage)
    return auth, hubs
