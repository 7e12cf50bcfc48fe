"""Versioned-table commits with an atomic pointer swap — a minimal
ACID-ish layer over plain parquet (SURVEY D6 "transaction-per-file
atomicity", upgraded past the reference's single-connection commit and
past this repo's staging-dir rename, which has a crash window where the
table directory is briefly absent).

Layout per table:

    {root}/{name}/v=N/...parquet      immutable version directories
    {root}/{name}/_current            text file holding N (the manifest)

``commit_table`` writes the NEW version directory first, then atomically
replaces ``_current`` (os.replace — atomic on POSIX).  A crash at any
point leaves readers on the previous committed version; a half-written
``v=N+1`` is invisible garbage, removed by ``vacuum``.  Delta/Iceberg are
exactly this idea industrialized (JSON log + snapshots); when those
formats are available the same call sites swap to them.

Readers resolve through the pointer (``read_table``) so writers never
mutate a directory a concurrent reader may be scanning — the reason the
plain staging-rename can fail a reader mid-swap.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _pointer_path(root: str, name: str) -> str:
    return os.path.join(root, name, "_current")


def current_version(root: str, name: str) -> int | None:
    try:
        with open(_pointer_path(root, name)) as fh:
            return int(fh.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def commit_table(df: DataFrame, root: str, name: str) -> int:
    """Write ``df`` as the next version of ``{root}/{name}`` and publish it
    atomically.  Returns the committed version number."""
    cur = current_version(root, name)
    nxt = 0 if cur is None else cur + 1
    table_dir = os.path.join(root, name)
    df.write.mode("overwrite").parquet(os.path.join(table_dir, f"v={nxt}"))
    tmp = _pointer_path(root, name) + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(str(nxt))
    os.replace(tmp, _pointer_path(root, name))  # the commit point
    return nxt


def read_table(spark: SparkSession, root: str, name: str) -> DataFrame:
    """Read the current committed version (raises if never committed)."""
    cur = current_version(root, name)
    if cur is None:
        raise FileNotFoundError(f"no committed version for table {name!r} under {root}")
    return spark.read.parquet(os.path.join(root, name, f"v={cur}"))


def vacuum(root: str, name: str, keep: int = 2) -> list[int]:
    """Drop version directories older than the newest ``keep`` committed
    ones (and any orphaned half-writes newer than the pointer).  Returns
    the removed version numbers."""
    import shutil

    cur = current_version(root, name)
    if cur is None:
        return []
    table_dir = os.path.join(root, name)
    versions = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(table_dir)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    )
    keep_set = set(v for v in versions if v <= cur)
    keep_set = set(sorted(keep_set)[-keep:])
    removed = []
    for v in versions:
        if v not in keep_set and v != cur:
            shutil.rmtree(os.path.join(table_dir, f"v={v}"))
            removed.append(v)
    return removed
