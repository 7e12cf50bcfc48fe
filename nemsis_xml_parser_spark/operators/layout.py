"""Z-order (Morton) clustered write layout — multi-column data skipping
on plain parquet.

Parquet scans prune files/row-groups whose min-max footer ranges miss
the predicate.  A sort by one column clusters only that column; Z-order
interleaves the bit representations of several columns so EVERY indexed
column stays range-clustered, making selective predicates on any of
them skip most files (the effect Delta's ``OPTIMIZE ZORDER BY`` and
Iceberg's sort orders buy; here on plain parquet via
``repartitionByRange`` + ``sortWithinPartitions``).

All steps are DataFrame ops: per-column min/max come from one tiny
aggregate (broadcast scalar), rank-normalization and bit interleaving
are codegen-side integer arithmetic — no UDFs, no driver collect of
data rows.  At 100 TB the range partitioner samples the Morton key the
same way a plain sort would; the write stays fully parallel.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _normalize(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Scale a numeric column to an integer in [0, 2^bits) by min-max
    position.  Constant columns map to 0."""
    span = (cmax - cmin).cast("double")
    frac = F.when(span > 0, (col.cast("double") - cmin.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    top = F.lit((1 << bits) - 1)
    return F.least(F.floor(frac * (1 << bits)).cast("long"), top.cast("long"))


def morton_key(norm_cols: Sequence[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of already-normalized integer
    columns into one Z-order key (codegen-side shifts/masks)."""
    n = len(norm_cols)
    if n * bits > 63:
        raise ValueError(
            f"morton_key: {n} cols x {bits} bits = {n * bits} bits exceeds the"
            " 63 usable bits of a signed long (keys would wrap/collide);"
            " lower bits or index fewer columns"
        )
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(norm_cols):
            bit = F.shiftrightunsigned(c, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit, b * n + i)
            )
    return key


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int = 8,
    bits: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``.

    One stats aggregate (min/max per indexed column, broadcast), then a
    range-repartition + within-partition sort on the Morton key.  Each
    output file covers a compact hyper-rectangle of the indexed space,
    so min-max pruning works for predicates on ANY of ``cols``.
    """
    if bits is None:
        bits = min(16, 63 // max(len(cols), 1))
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    stats = df.agg(*aggs)
    with_key = df.join(F.broadcast(stats))
    norm = [
        _normalize(
            F.col(c), F.col(f"__min_{c}"), F.col(f"__max_{c}"), bits
        )
        for c in cols
    ]
    keyed = with_key.withColumn("__z", morton_key(norm, bits)).drop(
        *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols]
    )
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_pruning_fraction(
    spark, path: str, col: str, lo, hi
) -> float:
    """Diagnostic: fraction of parquet files whose [min, max] range for
    ``col`` overlaps [lo, hi] — the files a footer-pruned scan must
    read.  Used by tests to prove the clustering effect; at cluster
    scale the same numbers come from the scan metrics."""
    import glob
    import os

    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    overlapping = 0
    for f in files:
        row = spark.read.parquet(f).agg(
            F.min(col).alias("mn"), F.max(col).alias("mx")
        ).collect()[0]
        if row["mn"] is not None and not (row["mx"] < lo or row["mn"] > hi):
            overlapping += 1
    return overlapping / max(len(files), 1)
