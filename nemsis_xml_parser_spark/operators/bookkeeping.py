"""File-level bookkeeping, idempotency and the ingest pipeline runner
(SURVEY B5/B8, D5/D6, G2/G3/G4).

Reference behavior: every processed XML file gets a row in
``XMLFilesProcessed`` (UUID, name, MD5, timestamp, status, schema version)
(/root/reference/main_ingest.py:67-98,648-655); the MD5 is recorded but
never checked — re-ingest is only neutralized by the PCR-scoped overwrite.
The rebuild records the same log AND uses it: ``files_to_process`` anti-joins
incoming files against already-succeeded MD5s, giving true skip-if-seen
idempotency on top of the overwrite semantics.

The lake layout is plain parquet directories under a warehouse root:

    {root}/_files_processed/          bookkeeping log (append)
    {root}/{tag}/                     one directory per dynamic table

At 100 TB the same code runs with Delta/Iceberg table paths for ACID
overwrite; the operators only assume ``read.parquet`` / ``write.parquet``.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import os
import shutil
import uuid
from concurrent.futures import ThreadPoolExecutor

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..schema import (
    FILES_PROCESSED_SCHEMA,
    INGESTION_LOGIC_VERSION,
    STATUS_ERROR_NOT_FOUND,
    STATUS_ERROR_PARSE,
    STATUS_OK,
)


def file_md5(path: str, chunk_size: int = 4096) -> str | None:
    """Chunked MD5 (parity: /root/reference/main_ingest.py:39-50)."""
    try:
        digest = hashlib.md5()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(chunk_size), b""):
                digest.update(chunk)
        return digest.hexdigest()
    except OSError:
        return None


def files_processed_path(warehouse_dir: str) -> str:
    return os.path.join(warehouse_dir, "_files_processed")


def log_processed_files(
    spark: SparkSession,
    warehouse_dir: str,
    records: list[tuple[str, str | None, str]],
) -> None:
    """Append (file_name, md5, status) records to the bookkeeping table
    (parity: main_ingest.py:67-98 + database_setup.py:80-95)."""
    now = dt.datetime.now(dt.timezone.utc).isoformat()
    rows = [
        (str(uuid.uuid4()), name, md5, now, status, INGESTION_LOGIC_VERSION)
        for name, md5, status in records
    ]
    spark.createDataFrame(rows, schema=FILES_PROCESSED_SCHEMA).write.mode(
        "append"
    ).parquet(files_processed_path(warehouse_dir))


def read_files_processed(spark: SparkSession, warehouse_dir: str) -> DataFrame:
    path = files_processed_path(warehouse_dir)
    if not os.path.isdir(path):  # first run: empty log
        return spark.createDataFrame([], schema=FILES_PROCESSED_SCHEMA)
    return spark.read.parquet(path)


def files_to_process(
    spark: SparkSession, warehouse_dir: str, file_paths: list[str]
) -> tuple[list[str], list[str]]:
    """Split incoming files into (todo, skipped) by MD5 anti-join against
    previously-succeeded files (SURVEY D5 — the check the reference records
    data for but never performs)."""
    seen = {
        r["md5_hash"]
        for r in read_files_processed(spark, warehouse_dir)
        .where(F.col("status") == STATUS_OK)
        .select("md5_hash")
        .distinct()
        .collect()
    }
    todo, skipped = [], []
    for p in file_paths:
        (skipped if file_md5(p) in seen else todo).append(p)
    return todo, skipped


def archive_file(path: str, archive_dir: str) -> str:
    """Move a processed file to the archive (parity: main_ingest.py:101-116;
    timestamp-uniquified on collision like move_to_error_directory)."""
    os.makedirs(archive_dir, exist_ok=True)
    dest = os.path.join(archive_dir, os.path.basename(path))
    if os.path.exists(dest):
        stamp = dt.datetime.now().strftime("%Y%m%d%H%M%S")
        root, ext = os.path.splitext(os.path.basename(path))
        dest = os.path.join(archive_dir, f"{root}_{stamp}{ext}")
    shutil.move(path, dest)
    return dest


def move_to_error_directory(path: str, error_dir: str) -> str:
    """Failure routing (parity: main_ingest.py:119-139)."""
    return archive_file(path, error_dir)


def ingest_xml_files(
    spark: SparkSession,
    file_paths: list[str],
    warehouse_dir: str,
    archive_dir: str | None = None,
    error_dir: str | None = None,
    deterministic_ids: bool = False,
) -> dict[str, str]:
    """EP1 pipeline (SURVEY G3) over a batch of XML files:

    md5-skip → flatten → PCR-scoped overwrite per tag → warehouse write →
    bookkeeping log → archive/error routing.  Returns {file: status}.

    Unlike the reference's file-at-a-time loop, the whole batch flattens in
    ONE distributed pass; per-file statuses are derived from the parse
    results.  Files that parse to zero elements get Error_Parsing_Empty and
    error-dir routing (parity: main_ingest.py:386-397).
    """
    from .flatten import flatten_xml_files
    from .warehouse import attribute_columns_per_table, table_frame, table_names

    statuses: dict[str, str] = {}
    todo, skipped = files_to_process(spark, warehouse_dir, file_paths)
    for p in skipped:
        statuses[p] = "Skipped_MD5_Seen"

    missing = [p for p in todo if not os.path.exists(p)]
    for p in missing:
        statuses[p] = STATUS_ERROR_NOT_FOUND
    todo = [p for p in todo if os.path.exists(p)]
    if not todo:
        return statuses

    elements = flatten_xml_files(spark, todo, deterministic_ids=deterministic_ids)
    elements = elements.cache()
    try:
        parsed_files = {
            r["file"] for r in elements.select("file").distinct().collect()
        }
        incoming_tables = table_names(elements)
        attr_map = attribute_columns_per_table(elements)

        # PCR-scoped overwrite against every existing dynamic table
        # (SURVEY D3): one anti-join per table on the broadcast key set.
        pcr_keys = (
            elements.select("pcr_uuid").where(F.col("pcr_uuid").isNotNull()).distinct()
        )
        # drop crashed-rewrite leftovers first so a '{table}__staging' dir is
        # never treated as a real dynamic table, then list survivors
        from ..catalog import clean_scratch_dirs, list_table_dirs

        clean_scratch_dirs(warehouse_dir)
        existing_tables = list_table_dirs(warehouse_dir)

        def write_table(t: str) -> None:
            path = os.path.join(warehouse_dir, t)
            new_rows = (
                table_frame(elements, t, attr_map.get(t, []))
                if t in incoming_tables
                else None
            )
            if t in existing_tables:
                old = spark.read.parquet(path)
                kept = old.join(
                    F.broadcast(
                        pcr_keys.withColumnRenamed("pcr_uuid", "pcr_uuid_context")
                    ),
                    on="pcr_uuid_context",
                    how="left_anti",
                )
                merged = (
                    kept.unionByName(new_rows, allowMissingColumns=True)
                    if new_rows is not None
                    else kept
                )
                # rewrite via a staging dir: parquet overwrite cannot read
                # and clobber the same path in one job
                staging = path + "__staging"
                merged.write.mode("overwrite").parquet(staging)
                shutil.rmtree(path)
                os.rename(staging, path)
            elif new_rows is not None:
                new_rows.write.mode("overwrite").parquet(path)

        # concurrent per-tag write jobs: outputs are disjoint directories and
        # Spark's scheduler handles concurrent actions, so the only thing
        # serial execution buys is idle cores between job barriers.  The
        # reference processes tags inside a single-threaded per-element loop
        # (/root/reference/main_ingest.py:429-495).
        all_tables = sorted(set(existing_tables) | set(incoming_tables))
        with ThreadPoolExecutor(max_workers=min(8, max(1, len(all_tables)))) as ex:
            for fut in [ex.submit(write_table, t) for t in all_tables]:
                fut.result()  # propagate the first failure

        file_urls = {p: "file:" + os.path.abspath(p) for p in todo}
        records = []
        for p in todo:
            ok = file_urls[p] in parsed_files
            status = STATUS_OK if ok else STATUS_ERROR_PARSE
            statuses[p] = status
            records.append((os.path.basename(p), file_md5(p), status))
        log_processed_files(spark, warehouse_dir, records)

        for p in todo:
            if statuses[p] == STATUS_OK and archive_dir:
                archive_file(p, archive_dir)
            elif statuses[p] != STATUS_OK and error_dir:
                move_to_error_directory(p, error_dir)
        return statuses
    finally:
        elements.unpersist()
