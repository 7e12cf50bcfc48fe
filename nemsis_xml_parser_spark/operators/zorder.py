"""Z-order (Morton) layout — multi-dimensional data clustering for
data-skipping file layouts.

The layout step behind Delta/Iceberg ``OPTIMIZE ZORDER BY (a, b)``:
interleave the bits of the clustering columns so rows close in the
multi-dimensional key space land in the same file, making BOTH columns'
per-file min/max ranges tight — a linear sort can only tighten one.
Scans with predicates on either column then skip most files using
footer statistics alone.

``z_value`` builds the interleave as pure JVM bit arithmetic (no UDF);
file assignment by the z-value's high bits (``z >> k``) is the
deterministic, oracle-expressible equivalent of range-partitioning the
z-key — in a real write path the same column feeds
``repartitionByRange(z).sortWithinPartitions(z)`` so each output file
covers one contiguous z-range.

Reference parity: none — the reference has no layout optimization;
§2.I curation/lake tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def z_value(x: Column, y: Column, bits: int) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative
    integer columns: x takes the even output bits, y the odd."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def z_value_sql(x: str, y: str, bits: int) -> str:
    """The identical interleave as engine-portable SQL text (``>>``,
    ``&``, ``<<``) for oracle generation."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_file_stats(
    df: DataFrame, x: Column, y: Column, bits: int, file_bits: int
) -> DataFrame:
    """Assign every row to a z-contiguous file (top ``file_bits`` bits
    of the z-value) and report the per-file footer statistics a scan
    would skip on: row count and min/max of each clustering column."""
    z = z_value(x, y, bits)
    fid = F.shiftright(z, 2 * bits - file_bits)
    return (
        df.select(
            fid.cast("int").alias("file_id"),
            x.cast("long").alias("x"),
            y.cast("long").alias("y"),
        )
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )
