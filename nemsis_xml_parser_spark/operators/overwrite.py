"""Key-scoped overwrite — "UUID-based Overwrite" (SURVEY D2/D3).

Reference behavior (/root/reference/main_ingest.py:276-328,400-421): for
every distinct ``pcr_uuid_context`` in an incoming file, delete all rows
carrying that UUID from EVERY dynamic table, then insert the fresh rows —
O(tables × UUIDs) DELETE round-trips.

Spark-first: one set-based anti-join per table against the (small,
broadcast) incoming key set, unioned with the new rows:

    kept = old ⟕anti keys ;  result = kept ∪ new

On Delta/Iceberg this is ``MERGE``/``replaceWhere``; on plain parquet it is
rewrite-on-overwrite.  The key set is tiny (UUIDs per file), so the
anti-join broadcasts — no shuffle of the big side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def distinct_pcr_uuids(elements: DataFrame) -> DataFrame:
    """Distinct non-null PCR UUIDs in the incoming batch
    (parity: /root/reference/main_ingest.py:400-403)."""
    return (
        elements.select(F.col("pcr_uuid"))
        .where(F.col("pcr_uuid").isNotNull())
        .distinct()
    )


def overwrite_by_key(
    existing: DataFrame,
    incoming: DataFrame,
    key: str = "pcr_uuid",
) -> DataFrame:
    """delete-then-insert as a declarative plan: rows of ``existing`` whose
    ``key`` appears (non-null) in ``incoming`` are dropped, then ``incoming``
    is appended.  NULL-keyed existing rows are always kept — the reference
    only deletes per concrete UUID (main_ingest.py:312-316)."""
    keys = (
        incoming.select(F.col(key)).where(F.col(key).isNotNull()).distinct()
    )
    kept = existing.join(F.broadcast(keys), on=key, how="left_anti")
    return kept.unionByName(incoming, allowMissingColumns=True)


def idempotent_reingest(existing: DataFrame, incoming: DataFrame, key: str = "pcr_uuid") -> DataFrame:
    """Alias documenting the idempotency contract: applying the same batch
    twice yields the same table state (tests/test_overwrite.py)."""
    return overwrite_by_key(existing, incoming, key)
