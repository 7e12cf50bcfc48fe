"""Deterministic random-walk corpus generation (DeepWalk / node2vec
input stage) with a counter-based PRNG.

Graph-embedding pipelines (DeepWalk, node2vec, PinSage) start by
materializing a corpus of random walks that a skip-gram model then
consumes.  At cluster scale the walk generator must be REPRODUCIBLE
across retries and partitioning — the standard trick is a counter-based
generator (Philox-style): the "random" choice at (walk, step) is a pure
hash of the counter, never mutable RNG state.  That is exactly what
makes the operator oracle-expressible: both engines evaluate the same
integer hash and the same argmin.

Per step the frontier (walk_id, cur) joins the adjacency list once
(shuffle keyed on node) and each walk picks the neighbor minimizing

    score(walk, step, nbr) = ((walk % P)*31 + step*101 + (nbr % P)*977) % P

with the (score, nbr) pair packed as ``score * 2^31 + nbr`` so a single
integer MIN performs the lexicographic argmin on both engines (the
``operators/winnow.py`` packing trick).  Lineage is cut per step.

Reference parity: none — §2.I graph/embedding-pipeline tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .lineage import cut_lineage

WALK_P = 1_000_003  # hash modulus (prime)
_PACK = 1 << 31  # nbr ids must stay below this; score < WALK_P keeps
# packed values < 2^51, comfortably inside BIGINT


def _score(walk: F.Column, step: int, nbr: F.Column) -> F.Column:
    return (
        (walk % WALK_P) * 31 + F.lit(step * 101) + (nbr % WALK_P) * 977
    ) % WALK_P


def deterministic_walks(
    adj: DataFrame,
    seeds: DataFrame,
    steps: int,
    src: str = "src",
    dst: str = "dst",
    node: str = "v",
) -> DataFrame:
    """(walk_id, step, node) visit rows: one walk per seed (walk_id =
    seed id, step 0 at the seed), each step choosing the hash-argmin
    neighbor.  A walk ends early only at a node with no out-edges."""
    a = adj.select(
        F.col(src).cast("long").alias("src"),
        # The argmin pack multiplies the score by 2^31 and adds the
        # neighbor id; an id >= 2^31 would silently corrupt the argmin,
        # so out-of-range ids fail loudly at scan time instead.
        F.when(
            (F.col(dst).cast("long") >= 0) & (F.col(dst).cast("long") < _PACK),
            F.col(dst).cast("long"),
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("deterministic_walks: node id out of packable "
                          "range [0, 2^31): "),
                    F.col(dst).cast("string"),
                )
            )
        )
        .alias("dst"),
    )
    frontier = cut_lineage(
        seeds.select(F.col(node).cast("long").alias("walk_id")).distinct()
        .select("walk_id", F.col("walk_id").alias("cur"))
    )
    visits = [
        frontier.select(
            "walk_id", F.lit(0).alias("step"), F.col("cur").alias("node")
        )
    ]
    for t in range(1, steps + 1):
        packed = (
            frontier.join(a, frontier["cur"] == a["src"])
            .groupBy("walk_id")
            .agg(
                F.min(
                    _score(F.col("walk_id"), t, F.col("dst")) * F.lit(_PACK)
                    + F.col("dst")
                ).alias("m")
            )
        )
        frontier = cut_lineage(
            packed.select("walk_id", (F.col("m") % F.lit(_PACK)).alias("cur"))
        )
        visits.append(
            frontier.select(
                "walk_id", F.lit(t).alias("step"), F.col("cur").alias("node")
            )
        )
    out = visits[0]
    for v in visits[1:]:
        out = out.unionByName(v)
    return out


def walk_paths(visits: DataFrame) -> DataFrame:
    """(walk_id, path, end_node): '->'-joined node sequence per walk."""
    return visits.groupBy("walk_id").agg(
        F.concat_ws(
            "->",
            F.transform(
                F.array_sort(F.collect_list(F.struct("step", "node"))),
                lambda s: s["node"].cast("string"),
            ),
        ).alias("path"),
        F.max_by("node", "step").cast("long").alias("end_node"),
    )
