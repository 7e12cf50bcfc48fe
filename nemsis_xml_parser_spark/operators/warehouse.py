"""Per-tag warehouse fan-out (SURVEY E1/B1-B3) and attribute pivot.

The reference creates one PostgreSQL table per distinct XML tag with 5
common columns + one TEXT column per observed attribute
(/root/reference/main_ingest.py:169-273), widening with ``ALTER TABLE`` as
new attributes appear (:252-271) and inserting row-at-a-time (:466-495).

Spark-first redesign:

* the canonical elements DataFrame keeps attributes in a MAP column;
* ``attribute_columns_per_table`` derives the full column set per tag in ONE
  distributed pass (replaces per-element catalog probes — the reference's
  main scalability anti-pattern, SURVEY §4);
* ``table_frame`` produces the exact reference table shape (FIXTURES.md F3):
  ``element_id, parent_element_id, pcr_uuid_context, original_tag_name,
  {table}_value`` + attribute columns, names lowercased, attr names that
  collide with the common columns silently dropped — parity with the
  column-intersection filter (/root/reference/main_ingest.py:479-483);
* ``write_warehouse`` defaults to ONE shuffle-free write of the canonical
  schema ``partitionBy("table_name")`` (single Spark job for the whole
  fan-out); ``read_table`` projects any table back into the reference's
  exact pivoted shape via a partition-pruned scan.  ``layout="per-table"``
  keeps the one-directory-per-tag compat layout, writing parents before
  children using the flatten's ``depth`` (FK ordering, SURVEY §7.4).

At 100 TB the partitioned layout is the one that holds: ingest cost is a
single job regardless of tag count (NEMSIS has hundreds of tags — per-tag
jobs would mean hundreds of scheduler round-trips per batch), and every
consumer read is pruned to its table's directory.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..naming import COMMON_COLUMNS, table_name_for_tag, value_column_name

COMMON_5_PREFIX = list(COMMON_COLUMNS)  # + the per-table value column


def table_names(elements: DataFrame) -> list[str]:
    """Distinct destination tables (lowercased), derived distributively."""
    rows = elements.select(
        F.lower(F.col("table_name")).alias("t")
    ).distinct().collect()
    return sorted(r["t"] for r in rows)


def attribute_columns_per_table(elements: DataFrame) -> dict[str, list[str]]:
    """One distributed pass: per tag, the set of sanitized+lowercased
    attribute names ever observed (schema-evolution-by-widening collapsed
    into a single aggregation; replaces main_ingest.py:252-271).
    Collision rule parity: attribute names equal to a common column are
    dropped (main_ingest.py:479-483).
    """
    rows = (
        elements.select(
            F.lower(F.col("table_name")).alias("t"),
            F.explode_outer(F.map_keys("attributes")).alias("attr"),
        )
        .where(F.col("attr").isNotNull())
        .select("t", F.lower(F.col("attr")).alias("attr"))
        .distinct()
        .collect()
    )
    out: dict[str, list[str]] = {}
    for r in rows:
        out.setdefault(r["t"], []).append(r["attr"])
    for t, attrs in out.items():
        reserved = set(COMMON_5_PREFIX) | {value_column_name(t)}
        out[t] = sorted(a for a in attrs if a not in reserved)
    return out


def table_frame(
    elements: DataFrame, table: str, attr_cols: list[str] | None = None
) -> DataFrame:
    """The per-tag table in the reference's exact shape (FIXTURES.md F3).

    ``table`` is the lowercased sanitized tag.  ``attr_cols`` (lowercased)
    defaults to a derivation pass over ``elements``.
    """
    table = table_name_for_tag(table)
    subset = elements.where(F.lower(F.col("table_name")) == table)
    if attr_cols is None:
        attr_cols = attribute_columns_per_table(subset).get(table, [])

    # attribute keys were sanitized during flatten; lookup must be
    # case-insensitive because column names are lowercased at sink time
    lower_map = F.expr(
        "map_from_entries(transform(map_entries(attributes), e -> struct(lower(e.key), e.value)))"
    )
    cols = [
        F.col("element_id"),
        F.col("parent_element_id"),
        F.col("pcr_uuid").alias("pcr_uuid_context"),
        F.col("element_tag").alias("original_tag_name"),
        F.col("value").alias(value_column_name(table)),
    ]
    cols += [lower_map.getItem(a).alias(a) for a in attr_cols]
    return subset.select(*cols)


def table_comments(elements: DataFrame) -> dict[str, str]:
    """Per-table XML path (the reference stores it as the PG table comment,
    main_ingest.py:235-239).  First-seen path per tag, made deterministic by
    taking the min path."""
    rows = (
        elements.groupBy(F.lower(F.col("table_name")).alias("t"))
        .agg(F.min("path").alias("path"))
        .collect()
    )
    return {r["t"]: r["path"] for r in rows}


def write_warehouse(
    elements: DataFrame,
    lake_dir: str,
    mode: str = "overwrite",
    file_format: str = "parquet",
    layout: str = "partitioned",
) -> dict[str, list[str]]:
    """Materialize the per-tag warehouse under ``lake_dir``.

    ``layout="partitioned"`` (default, the 100 TB path): ONE write job of
    the canonical element schema ``partitionBy("table_name")`` — no per-tag
    job fan-out, no shuffle (partitioning is directory layout, not an
    Exchange), and every per-table read is partition-pruned.  The
    reference's exact per-table shape (value column renamed, attributes
    pivoted) is a lazy projection applied at read time by ``read_table``.
    Atomicity of the whole fan-out is the single job commit — closer to the
    reference's one-transaction-per-file guarantee (main_ingest.py:500-642)
    than N independent per-tag jobs.

    ``layout="per-table"`` (compat): one pivoted parquet directory per tag,
    written parents-before-children (ascending min-depth) so a referential
    reader never sees a child table whose parent is missing.

    Returns {table: [columns...]} — the warehouse schema registry, in the
    reference's pivoted shape for both layouts.
    """
    elements = elements.cache()
    try:
        attr_map = attribute_columns_per_table(elements)
        registry: dict[str, list[str]] = {
            t: COMMON_5_PREFIX
            + [value_column_name(t)]
            + attr_map.get(t, [])
            for t in table_names(elements)
        }

        if layout == "partitioned":
            (
                elements.select(
                    F.lower(F.col("table_name")).alias("table_name"),
                    F.col("element_id"),
                    F.col("parent_element_id"),
                    F.col("pcr_uuid").alias("pcr_uuid_context"),
                    F.col("element_tag").alias("original_tag_name"),
                    F.col("value"),
                    F.col("attributes"),
                )
                .write.mode(mode)
                .format(file_format)
                .partitionBy("table_name")
                .save(lake_dir)
            )
            return registry
        if layout != "per-table":
            raise ValueError(f"unknown layout {layout!r}")

        depth_rows = (
            elements.groupBy(F.lower(F.col("table_name")).alias("t"))
            .agg(F.min("depth").alias("d"))
            .collect()
        )
        levels: dict[int, list[str]] = {}
        for r in depth_rows:
            levels.setdefault(r["d"], []).append(r["t"])

        def write_table(t: str) -> None:
            frame = table_frame(elements, t, attr_map.get(t, []))
            frame.write.mode(mode).format(file_format).save(os.path.join(lake_dir, t))

        # parent-before-child across depth levels (barrier per level), but
        # concurrent write jobs within a level — sibling tags have no
        # referential ordering between them, so serializing them only
        # leaves cores idle between job barriers
        for d in sorted(levels):
            with ThreadPoolExecutor(
                max_workers=min(8, len(levels[d]))
            ) as ex:
                for fut in [
                    ex.submit(write_table, t) for t in sorted(levels[d])
                ]:
                    fut.result()
        return registry
    finally:
        elements.unpersist()


def read_table(
    spark, lake_dir: str, table: str, attr_cols: list[str] | None = None
) -> DataFrame:
    """Read one table from a ``layout="partitioned"`` lake in the
    reference's exact pivoted shape (FIXTURES.md F3).

    The ``table_name`` filter is partition pruning (a directory pick, zero
    data read outside the table); the value-column rename and attribute
    pivot are narrow projections — the whole thing stays a single
    partition-pruned scan at any corpus size.
    """
    table = table_name_for_tag(table).lower()
    part = spark.read.parquet(lake_dir).where(F.col("table_name") == table)
    if attr_cols is None:
        rows = (
            part.select(F.explode_outer(F.map_keys("attributes")).alias("attr"))
            .where(F.col("attr").isNotNull())
            .select(F.lower(F.col("attr")).alias("attr"))
            .distinct()
            .collect()
        )
        reserved = set(COMMON_5_PREFIX) | {value_column_name(table)}
        attr_cols = sorted(r["attr"] for r in rows if r["attr"] not in reserved)
    lower_map = F.expr(
        "map_from_entries(transform(map_entries(attributes), e -> struct(lower(e.key), e.value)))"
    )
    return part.select(
        F.col("element_id"),
        F.col("parent_element_id"),
        F.col("pcr_uuid_context"),
        F.col("original_tag_name"),
        F.col("value").alias(value_column_name(table)),
        *[lower_map.getItem(a).alias(a) for a in attr_cols],
    )


def orphan_check(child: DataFrame, parent: DataFrame) -> DataFrame:
    """Lake-side replacement for FK enforcement (SURVEY B4): children whose
    ``parent_element_id`` has no matching parent row.  Empty result ⇔ the
    reference's ``ADD CONSTRAINT ... FOREIGN KEY`` would have succeeded
    (main_ingest.py:605-618)."""
    return child.join(
        parent,
        child["parent_element_id"] == parent["element_id"],
        "left_anti",
    )
