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

Per step the walk state (walk_id, cur, path) joins the adjacency list
once (keyed on node) and each walk picks the neighbor minimizing

    score(walk, step, nbr) = ((walk % P)*31 + step*101 + (nbr % P)*977) % P

with the (score, nbr) pair packed as ``score * 2^31 + nbr`` so a single
integer MIN performs the lexicographic argmin on both engines (the
``operators/winnow.py`` packing trick).  The path-so-far rides INSIDE
the argmin struct (constant per group, so the min is still decided by
the packed score), which makes every step a single join + aggregate on
the SAME key — the whole ``steps``-deep ladder chains into ONE linear
plan: one hash exchange on walk_id total (each per-step aggregate
reuses the previous step's partitioning), the adjacency exchange reused
across steps, and ZERO per-step driver jobs (no per-step lineage cut —
state is referenced exactly once per round, so the plan stays linear
and job-ladder latency disappears; guide §2.4 / §1.2).  Walks that hit
a sink survive as rows via the left join and stop growing (cur goes
NULL, which matches nothing downstream).

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


def deterministic_walk_state(
    adj: DataFrame,
    seeds: DataFrame,
    steps: int,
    src: str = "src",
    dst: str = "dst",
    node: str = "v",
) -> DataFrame:
    """(walk_id, path ARRAY<LONG>) — one walk per seed (walk_id = seed
    id, path[0] = the seed), each step choosing the hash-argmin
    neighbor.  A walk ends early only at a node with no out-edges."""
    a = cut_lineage(
        # pinned ONCE: every step references the adjacency, and without
        # the pin each of the ``steps`` joins would replicate the whole
        # adjacency-construction subtree into the final plan
        adj.select(
            F.col(src).cast("long").alias("src"),
            # The argmin pack multiplies the score by 2^31 and adds the
            # neighbor id; an id >= 2^31 would silently corrupt the
            # argmin, so out-of-range ids fail loudly at scan time
            # instead.
            F.when(
                (F.col(dst).cast("long") >= 0)
                & (F.col(dst).cast("long") < _PACK),
                F.col(dst).cast("long"),
            )
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "deterministic_walks: node id out of packable "
                            "range [0, 2^31): "
                        ),
                        F.col(dst).cast("string"),
                    )
                )
            )
            .alias("dst"),
        )
    )
    state = (
        seeds.select(F.col(node).cast("long").alias("walk_id"))
        .distinct()
        .select(
            "walk_id",
            F.col("walk_id").alias("cur"),
            F.array(F.col("walk_id")).alias("path"),
        )
    )
    for t in range(1, steps + 1):
        j = state.join(a, state["cur"] == a["src"], "left")
        picked = j.groupBy("walk_id").agg(
            # packed score decides the min; the extended path rides along
            # (constant prefix per group, suffix determined by dst, and
            # the packed head is unique per dst — the struct min IS the
            # scalar argmin of the old form)
            F.min(
                F.when(
                    F.col("dst").isNotNull(),
                    F.struct(
                        (
                            _score(F.col("walk_id"), t, F.col("dst"))
                            * F.lit(_PACK)
                            + F.col("dst")
                        ).alias("m"),
                        F.concat("path", F.array("dst")).alias("p"),
                    ),
                )
            ).alias("pick"),
            # path/cur are constant within the group; min == the value
            F.min("path").alias("path0"),
        )
        state = picked.select(
            "walk_id",
            (F.col("pick.m") % F.lit(_PACK)).alias("cur"),
            F.coalesce(F.col("pick.p"), F.col("path0")).alias("path"),
        )
    return state.select("walk_id", "path")


def deterministic_walks(
    adj: DataFrame,
    seeds: DataFrame,
    steps: int,
    src: str = "src",
    dst: str = "dst",
    node: str = "v",
) -> DataFrame:
    """(walk_id, step, node) visit rows: the exploded form of
    ``deterministic_walk_state`` (step = position in the walk)."""
    state = deterministic_walk_state(
        adj, seeds, steps, src=src, dst=dst, node=node
    )
    return state.select(
        "walk_id", F.posexplode("path").alias("step", "node")
    )


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
