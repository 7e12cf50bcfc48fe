"""Streaming near-dup detection against the FULL historical corpus — a
persisted MinHash-LSH bucket index maintained per microbatch.

``streaming/events.py::dedup_stream_by_minhash`` drops duplicates only
inside the watermark horizon — the right tool for replayed feeds, but a
production ingest must answer "is this document a near-dup of ANYTHING
we have ever accepted?".  This module is that operator: the LSH
band-bucket keys (``operators/dedup.py::minhash_band_keys`` — the
byte-identical keys the batch pair generator joins on) are persisted as
an APPEND-ONLY index, and each microbatch equi-joins its keys against
it.

Per batch:

1. band the batch (one Arrow/expression pass, signature-sized output);
2. candidates = batch-keys ⋈ index on (band_idx, band_hash) plus the
   batch's self-join — exactly the batch algorithm's candidate set,
   restricted to pairs touching this batch;
3. write candidate pairs to ``{out_root}/batch={id}`` with OVERWRITE;
4. append the batch's keys as ``{index_root}/batch={id}``, also
   OVERWRITE.

Exactly-once without a ledger: both writes are keyed by batch id, so a
replayed batch overwrites its own outputs; and because pairs are
canonicalized (min, max) and distinct, re-running step 2 AFTER step 4
already committed yields the same set (the batch's own keys joining
back against themselves produce exactly the self-join pairs).  The
index is append-only — per-batch cost is O(batch), never O(history) —
which is what lets the pattern run forever; the batch twin's
``max_bucket`` star-capping applies to the history side verbatim when
a bucket goes hot (not wired here: candidates are emitted uncapped and
the downstream verify/election stages own the skew posture).

Reference parity: none — §2.I streaming-dedup tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import minhash_band_keys

BAND_SCHEMA = "doc_id long, band_idx int, band_hash string"


def read_index(spark: SparkSession, index_root: str) -> DataFrame:
    """All committed band keys (empty frame if none yet)."""
    try:
        return spark.read.schema(BAND_SCHEMA).parquet(
            f"{index_root}/batch=*"
        )
    except AnalysisException:
        # Only "path does not exist" (first batch) is expected; any other
        # read-time error must propagate so the microbatch retries instead
        # of silently contributing zero history pairs to an append-only
        # index that would never regenerate them.
        return spark.createDataFrame([], BAND_SCHEMA)


def candidates_against_index(
    banded_batch: DataFrame, index: DataFrame
) -> DataFrame:
    """Distinct canonical (doc_a < doc_b) candidate pairs touching the
    batch: batch x history on the band key, plus the batch's self-join."""
    hist = (
        banded_batch.alias("n")
        .join(
            index.alias("h"),
            (F.col("n.band_idx") == F.col("h.band_idx"))
            & (F.col("n.band_hash") == F.col("h.band_hash"))
            & (F.col("n.doc_id") != F.col("h.doc_id")),
        )
        .select(
            F.least("n.doc_id", "h.doc_id").alias("doc_a"),
            F.greatest("n.doc_id", "h.doc_id").alias("doc_b"),
        )
    )
    a = banded_batch.alias("a")
    b = banded_batch.alias("b")
    selfp = a.join(
        b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    )
    return hist.unionByName(selfp).distinct()


def start_dedup_index_stream(
    docs_stream: DataFrame,
    index_root: str,
    out_root: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    available_now: bool = True,
    batch_shuffle_partitions: int | None = 8,
) -> StreamingQuery:
    """foreachBatch loop: band → candidates vs index → batch-keyed
    OVERWRITE writes (module docstring's exactly-once argument), with
    the winnow_index r10 microbatch tuning: shuffles and scan width
    scoped narrow for the MB-scale batch jobs (AQE off inside the
    hand-partitioned body), the compute-heavy banding stage widened
    past the maxFilesPerTrigger source partitioning, narrow index
    files out."""
    spark = docs_stream.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch hands over a DataFrame bound to the streaming
        # query's CLONED session (Structured Streaming runs every query
        # on sparkSession.cloneSession()), so the conf overrides below
        # land on the clone and CANNOT race a concurrent stream or
        # batch query on the shared outer session (probe-verified:
        # setting shuffle.partitions here leaves the outer session
        # untouched).  All batch-body reads plan under this session so
        # the overrides actually apply to them.
        spark = batch_df.sparkSession
        prev: dict[str, str | None] = {}
        if batch_shuffle_partitions is not None:
            for key, val in (
                ("spark.sql.shuffle.partitions", batch_shuffle_partitions),
                ("spark.sql.files.minPartitionNum", 1),
                ("spark.sql.adaptive.enabled", "false"),
            ):
                prev[key] = spark.conf.get(key, None)
                spark.conf.set(key, str(val))
        batch_df = batch_df.repartition(spark.sparkContext.defaultParallelism)
        try:
            # repartition, NOT coalesce: minhash_band_keys is pure narrow
            # expressions (signatures + band explode, no shuffle), so a
            # coalesce(4) would collapse the whole signature computation
            # to 4 tasks; the explicit key-row-sized shuffle keeps the
            # compute stage at the repartitioned batch width and only the
            # persisted frame narrow
            banded = minhash_band_keys(
                batch_df, text_col, id_col, num_hashes, bands, n
            ).repartition(4).persist()
            index = read_index(spark, index_root)
            pairs = candidates_against_index(banded, index)
            pairs.write.mode("overwrite").parquet(
                f"{out_root}/batch={batch_id}"
            )
            banded.write.mode("overwrite").parquet(
                f"{index_root}/batch={batch_id}"
            )
            banded.unpersist()
        finally:
            for key, val in prev.items():
                if val is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, val)

    writer = docs_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_candidate_pairs(spark: SparkSession, out_root: str) -> DataFrame:
    return spark.read.schema("doc_a long, doc_b long").parquet(
        f"{out_root}/batch=*"
    ).distinct()
