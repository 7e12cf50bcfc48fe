"""Streaming XML directory ingest — the idiomatic upgrade of the
reference's run-per-file CLI workflow (/root/reference/README.md:81-89,
SURVEY §1.5 last row).

``readStream.format('binaryFile')`` watches a drop directory; each
microbatch flattens its files (same mapInPandas flatten as batch) and
applies the PCR-scoped overwrite via ``foreachBatch`` — giving exactly-once
file tracking (checkpointed source) where the reference only had an
unchecked MD5 log.  ``cleanSource='archive'`` reproduces the
processed_xml_archive/ behavior natively.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.flatten import _flatten_partition
from ..schema import ELEMENT_SCHEMA


def stream_elements(
    spark: SparkSession,
    watch_dir: str,
    glob: str = "*.xml",
    archive_dir: str | None = None,
    deterministic_ids: bool = False,
) -> DataFrame:
    """Streaming canonical elements DataFrame from a watched directory."""
    reader = (
        spark.readStream.format("binaryFile")
        # streaming sources require an explicit schema; this is binaryFile's
        # fixed one
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", 64)
    )
    if archive_dir is not None:
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_dir
        )
    binary = reader.load(watch_dir).select("path", "content")
    return binary.mapInPandas(
        lambda it: _flatten_partition(it, deterministic_ids), schema=ELEMENT_SCHEMA
    )


def start_warehouse_stream(
    spark: SparkSession,
    watch_dir: str,
    warehouse_dir: str,
    checkpoint_dir: str,
    glob: str = "*.xml",
    deterministic_ids: bool = False,
) -> StreamingQuery:
    """Microbatch EP1: each batch of files goes through the same per-tag
    overwrite-and-write path as batch ingest (foreachBatch bridges the
    streaming plan to the batch sink operators)."""
    from ..operators.warehouse import attribute_columns_per_table, table_frame, table_names
    import os
    import shutil
    import pyspark.sql.functions as F

    elements_stream = stream_elements(
        spark, watch_dir, glob=glob, deterministic_ids=deterministic_ids
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = batch_df.cache()
        try:
            incoming = table_names(batch_df)
            attr_map = attribute_columns_per_table(batch_df)
            pcr_keys = (
                batch_df.select("pcr_uuid")
                .where(F.col("pcr_uuid").isNotNull())
                .distinct()
                .withColumnRenamed("pcr_uuid", "pcr_uuid_context")
            )
            from ..catalog import clean_scratch_dirs, list_table_dirs

            clean_scratch_dirs(warehouse_dir)
            existing = list_table_dirs(warehouse_dir)
            for t in sorted(set(existing) | set(incoming)):
                path = os.path.join(warehouse_dir, t)
                new_rows = (
                    table_frame(batch_df, t, attr_map.get(t, []))
                    if t in incoming
                    else None
                )
                if t in existing:
                    old = spark.read.parquet(path)
                    kept = old.join(F.broadcast(pcr_keys), "pcr_uuid_context", "left_anti")
                    merged = (
                        kept.unionByName(new_rows, allowMissingColumns=True)
                        if new_rows is not None
                        else kept
                    )
                    staging = path + "__staging"
                    merged.write.mode("overwrite").parquet(staging)
                    shutil.rmtree(path)
                    os.rename(staging, path)
                elif new_rows is not None:
                    new_rows.write.mode("overwrite").parquet(path)
        finally:
            batch_df.unpersist()

    return (
        elements_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
