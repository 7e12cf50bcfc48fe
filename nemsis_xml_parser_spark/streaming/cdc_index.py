"""Streaming chunk-level dedup against the FULL historical corpus —
Gear-CDC chunk fingerprints maintained as a persisted index per
microbatch: incremental storage-dedup ("have we stored this chunk
anywhere, ever?") plus chunk-sharing candidate pairs.

Third instantiation of the history-index pattern
(``streaming/dedup_index.py`` = LSH band keys,
``streaming/winnow_index.py`` = winnowing fingerprints): the state
machinery is REUSED from winnow_index — CDC chunk hashes flow through
the same (doc_id, gh) schema, the same cumulative-df stop-list (hot
boilerplate chunks go mute, monotone, prefix-consistent) and the same
batch-keyed OVERWRITE exactly-once argument.  What CDC adds over both:
fingerprints are byte-RANGES, so a hit localizes WHAT is duplicated,
and an edit re-synchronizes at the next content boundary (the
chunk-store dedup-ratio economics).

Per batch the sink also records the batch's dedup ratio — chunks whose
hash already exists in history (or earlier in the batch) versus total —
the number a chunk-store sizes capacity with.

Reference parity: none — §2.I streaming-dedup tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.cdc import cdc_chunks
from .winnow_index import candidates_against_fp_index, read_fp_index

__all__ = [
    "read_chunk_index",
    "start_cdc_index_stream",
    "read_cdc_pairs",
    "read_dedup_ratios",
]

read_chunk_index = read_fp_index  # same (doc_id, gh) layout


def start_cdc_index_stream(
    docs_stream: DataFrame,
    index_root: str,
    out_root: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    mask_bits: int = 6,
    max_df: int | None = 50,
    min_shared: int = 2,
    available_now: bool = True,
) -> StreamingQuery:
    """foreachBatch loop: chunk → dedup-ratio + candidates vs index →
    batch-keyed OVERWRITE writes (winnow_index's exactly-once
    argument verbatim)."""
    spark = docs_stream.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            fps = (
                cdc_chunks(
                    batch_df, mask_bits=mask_bits,
                    id_col=id_col, text_col=text_col,
                )
                .select("doc_id", F.col("chunk_hash").alias("gh"))
                .persist()
            )
            index = read_chunk_index(spark, index_root)
            pairs = candidates_against_fp_index(
                fps, index, max_df=max_df, min_shared=min_shared
            )
            pairs.write.mode("overwrite").parquet(
                f"{out_root}/batch={batch_id}"
            )
            # batch dedup ratio: chunk INSTANCES whose hash is already
            # known (history or another copy in this batch) / total.
            # Replay-safe: the history side EXCLUDES rows contributed by
            # this batch's own docs (on replay the index already holds
            # them; doc_ids are owned by exactly one batch under the
            # file-source contract), so the ratio row recomputes
            # identically and is overwritten wholesale by batch id.
            own_docs = fps.select("doc_id").distinct()
            known = (
                index.join(own_docs, "doc_id", "left_anti")
                .select("gh")
                .distinct()
            )
            total = fps.count()
            new_hashes = (
                fps.select("gh").distinct().join(known, "gh", "left_anti")
            )
            first_copies = (
                fps.join(new_hashes, "gh", "left_semi")
                .groupBy("gh")
                .agg(F.lit(1).alias("one"))
                .count()
            )
            spark.createDataFrame(
                [(batch_id, total, total - first_copies)],
                "batch_id long, total_chunks long, duplicate_chunks long",
            ).write.mode("overwrite").parquet(
                f"{out_root}_ratio/batch={batch_id}"
            )
            fps.write.mode("overwrite").parquet(
                f"{index_root}/batch={batch_id}"
            )
            fps.unpersist()
        finally:
            batch_df.unpersist()

    writer = docs_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cdc_pairs(spark: SparkSession, out_root: str) -> DataFrame:
    return spark.read.schema(
        "doc_a long, doc_b long, shared long"
    ).parquet(f"{out_root}/batch=*").distinct()


def read_dedup_ratios(spark: SparkSession, out_root: str) -> DataFrame:
    return spark.read.schema(
        "batch_id long, total_chunks long, duplicate_chunks long"
    ).parquet(f"{out_root}_ratio/batch=*")
