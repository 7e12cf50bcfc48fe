"""Incremental minimum-spanning-forest maintenance over an edge stream.

The streaming twin of ``operators/mst.py::boruvka_forest``, built on
the sparsification identity every distributed MST pipeline leans on
(Lattanzi et al., "Filtering: a method for solving graph problems in
MapReduce", SPAA'11):

    MSF(A ∪ B) = MSF(MSF(A) ∪ B)

— non-forest edges of A can never enter the forest of any supergraph
(the cycle property), so the persisted state is the CURRENT FOREST
(≤ n-1 edges, O(nodes)) and each microbatch re-runs Borůvka on
forest ∪ batch, never on the edge history.  Parallel edges reduce to
their minimum weight first (groupBy (u, v) min w), keeping the
(w, u, v) total order unique — the same reduction the batch twin
applies to the full union, so after every commit the store equals the
batch algorithm on all edges ever seen (parity tests).

Idempotent under replay (re-merging a batch already folded into the
forest changes nothing — MSF is a closure operator), so the
checkpointed source + the txlog-versioned store compose to
exactly-once state, the ``streaming/components.py`` argument verbatim.

Reference parity: none — §2.I streaming-graph tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.mst import boruvka_forest
from ..operators.txlog import commit_table, current_version, read_table, vacuum

FOREST_SCHEMA = "u long, v long, w long"
_ROUNDS = 20  # components at least halve per round: covers n < 2^20


def empty_forest(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], FOREST_SCHEMA)


def canonical_min_edges(edges: DataFrame, src="u", dst="v", weight="w") -> DataFrame:
    """Canonical (u < v) pairs reduced to their minimum weight — the
    reduction both the incremental fold and the batch twin apply."""
    u, v = F.col(src).cast("long"), F.col(dst).cast("long")
    return (
        edges.select(
            F.least(u, v).alias("u"),
            F.greatest(u, v).alias("v"),
            F.col(weight).cast("long").alias("w"),
        )
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
    )


def merge_msf_batch(forest: DataFrame, edges: DataFrame, **cols) -> DataFrame:
    """Fold one batch of weighted edges into the forest store.

    The solve input is forest ∪ batch — O(nodes) + O(batch) edges, NOT
    the edge history — so when it fits one executor the fold finishes
    with the single-task Kruskal endgame (``operators/mst.py::
    kruskal_local``, the Lattanzi filtering recipe: distributed rounds
    only while the residual exceeds memory).  Per microbatch that is
    ONE Arrow job instead of log(n) Borůvka rounds × several jobs each
    (measured 1.7k → >4k rows/s on the stream bench).  The count guard
    rides the union's aggregate; past ``LOCAL_FINISH_MAX`` the fold
    falls back to the distributed rounds — identical picks either way
    (the MSF is unique under the (w, u, v) total order; parity tests).
    """
    from ..operators.lineage import cut_lineage
    from ..operators.mst import LOCAL_FINISH_MAX, kruskal_local

    union = canonical_min_edges(
        forest.unionByName(canonical_min_edges(edges, **cols))
    )
    obs = Observation()
    union = union.observe(
        obs, F.count(F.lit(1)).alias("n")
    ).transform(cut_lineage)
    if (obs.get["n"] or 0) <= LOCAL_FINISH_MAX:
        return kruskal_local(union)
    picked, _ = boruvka_forest(union, _ROUNDS)
    return picked.select("u", "v", "w")


def read_forest(
    spark: SparkSession, state_root: str, name: str = "msf"
) -> DataFrame:
    if current_version(state_root, name) is None:
        return empty_forest(spark)
    return read_table(spark, state_root, name)


def start_msf_maintenance(
    edges_stream: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    name: str = "msf",
    src: str = "u",
    dst: str = "v",
    weight: str = "w",
    available_now: bool = True,
) -> StreamingQuery:
    spark = edges_stream.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            forest = read_forest(spark, state_root, name)
            new_forest = merge_msf_batch(
                forest, batch_df, src=src, dst=dst, weight=weight
            )
            commit_table(new_forest, state_root, name)
            vacuum(state_root, name, keep=2)
        finally:
            batch_df.unpersist()

    writer = edges_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
