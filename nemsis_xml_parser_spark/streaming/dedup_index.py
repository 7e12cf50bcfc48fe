"""Streaming near-dup detection against the FULL historical corpus — a
persisted MinHash-LSH bucket index maintained per microbatch.

``streaming/events.py::dedup_stream_by_minhash`` drops duplicates only
inside the watermark horizon — the right tool for replayed feeds, but a
production ingest must answer "is this document a near-dup of ANYTHING
we have ever accepted?".  This module is that operator: the LSH
band-bucket keys (md5 family, byte-identical to the batch pair
generator's ``operators/dedup.py::minhash_band_keys`` — the stream
computes them through the Arrow twin ``minhash_band_keys_arrow``,
parity-pinned) are persisted as an APPEND-ONLY index, and each
microbatch equi-joins its keys against it.

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
canonicalized (min, max) and deduped on read (the per-batch files may
carry one copy per shared band — ``read_candidate_pairs`` distincts),
re-running step 2 AFTER step 4 already committed yields the same SET
(the batch's own keys joining back against themselves produce exactly
the self-join pairs).  The
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

from ..operators.dedup import minhash_band_keys_arrow

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
    banded_batch: DataFrame, index: DataFrame, distinct: bool = True
) -> DataFrame:
    """Distinct canonical (doc_a < doc_b) candidate pairs touching the
    batch: batch x history on the band key, plus the batch's self-join.
    ``distinct=False`` skips the final dedup exchange and may emit a
    pair once per shared band (≤ ``bands`` copies) — the streaming body
    writes that form because ``read_candidate_pairs`` distincts on read
    anyway, and at microbatch latency a whole exchange+aggregate stage
    costs more than the ≤4x write amplification.

    Shuffle shape (r13): the banded batch is trigger-bounded (4 keys x
    ``maxFilesPerTrigger`` docs), so it is BROADCAST into both joins —
    the O(history) index side is only ever SCANNED, never shuffled
    (the winnow_index/fp_groups posture; pre-r13 this sort-merge-joined
    the whole index on the band key every batch).  The only exchange
    left in the candidate path is the final pair distinct."""
    hist = (
        index.alias("h")
        .join(
            F.broadcast(banded_batch.alias("n")),
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
        F.broadcast(b),
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    )
    out = hist.unionByName(selfp)
    return out.distinct() if distinct else out


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
    the cdc_index r12 microbatch recipe: banding runs through the
    Arrow kernel twin (``minhash_band_keys_arrow`` — byte-identical
    md5-family keys without the interpreted-HOF ~0.5 µs/element wall),
    the batch body keeps the scan's own partitioning (no repartition
    bracketing — scheduling dominates MB-scale stages), shuffles
    scoped narrow and AQE off inside the hand-partitioned body."""
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
        try:
            # ONE repartition, before the kernel: shingle hashing is the
            # batch's CPU (one md5 per distinct shingle), so the Arrow
            # stage must run wider than maxFilesPerTrigger's 1-2 scan
            # partitions; the exchange moves only the raw text (MBs).
            # The banded output is persisted at the same width — narrow
            # enough for index files, wide enough for the probe build.
            banded = minhash_band_keys_arrow(
                batch_df.repartition(8), text_col, id_col,
                num_hashes, bands, n
            ).persist()
            index = read_index(spark, index_root)
            # distinct=False: read_candidate_pairs dedups on read; the
            # per-batch exchange+aggregate stage costs more than the
            # ≤4x write amplification at microbatch latency
            pairs = candidates_against_index(banded, index, distinct=False)
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
