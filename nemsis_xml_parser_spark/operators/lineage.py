"""Lineage cutting for iterative DataFrame algorithms — localCheckpoint
with a statistics reset.

Every iterative operator here (connected components, PageRank, SCC,
Borůvka, k-means, IVF training) cuts lineage once per round so round N
does not re-execute rounds 1..N-1.  Spark 4's ``Dataset.localCheckpoint``
has a driver-side pathology for exactly this pattern:
``LogicalRDD.fromDataset`` re-derives the checkpointed frame's
statistics from the ORIGIN plan (``LogicalRDD.rewriteStatsAndConstraints``,
``sql/core/.../ExistingRDD.scala``), and the size-only estimator models
a join as the PRODUCT of its children's ``sizeInBytes``.  A round that
self-joins the previous round's checkpoint therefore SQUARES the stat:
the BigInt's digit count doubles every round (measured: 33 digits after
round 1, 35 *million* by round 4 of a Borůvka contraction), and from
there each checkpoint and each join-selection burns seconds of driver
CPU multiplying million-digit BigInts — 46 s to checkpoint an 11-row
frame, tripling per round (jstack: all samples inside
``LogicalPlanStats.stats`` under ``Dataset.checkpoint``).

``cut_lineage`` fixes the recurrence: it materializes the frame with
``localCheckpoint(eager=True)`` exactly as before, then rewraps the
checkpointed RDD in a fresh ``LogicalRDD`` WITHOUT the rewritten
stats (``SparkSession.internalCreateDataFrame``), so the next round's
leaves carry the default size estimate (19 digits) and the product
stays bounded.  Join strategy is unaffected in practice: the inflated
product stats were never broadcast-eligible anyway, and AQE re-plans
from RUNTIME sizes, not these estimates.

On a real cluster swap ``localCheckpoint`` for reliable
``checkpoint()`` (executor loss cannot lose round state); the stats
reset applies identically.

Reference parity: none — this is Spark-runtime engineering for the
§2.I iterative-operator tier (the reference is a single-threaded
psycopg2 ETL with no iterative algorithms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame) -> DataFrame:
    """Materialize ``df`` (eager localCheckpoint) and return a frame
    whose plan is a stats-free leaf over the checkpointed partitions.

    Semantically identical to ``df.localCheckpoint(eager=True)`` —
    same rows, same schema, lineage truncated — but the returned
    frame's ``sizeInBytes`` statistic is the session default instead
    of the origin plan's (possibly astronomically inflated) estimate,
    which keeps driver-side BigInt stat arithmetic O(1) per round in
    iterative self-join loops.  Falls back to the plain checkpointed
    frame if the internal constructor is unavailable (e.g. Spark
    Connect, where the pathology is server-side anyway).
    """
    spark = df.sparkSession
    jdf = df._jdf.localCheckpoint(True)
    try:
        jrdd = jdf.queryExecution().toRdd()
        jds = spark._jsparkSession.internalCreateDataFrame(
            jrdd, jdf.schema(), False
        )
        return DataFrame(jds, spark)
    except Exception:  # pragma: no cover - non-classic sessions
        return DataFrame(jdf, spark)
