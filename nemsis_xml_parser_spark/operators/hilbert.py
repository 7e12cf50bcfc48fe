"""Hilbert-curve layout — the locality-tighter alternative to Z-order
for data-skipping file layouts.

The Hilbert space-filling curve (Hilbert 1891; the xy→d transform is
the classic bit-level loop popularized in public-domain form, e.g.
Wikipedia's `d2xy/xy2d`) visits every cell of a 2^bits × 2^bits grid so
that CONSECUTIVE indices are always Manhattan-distance 1 apart — unlike
Morton order, which jumps across the key space at every power-of-two
boundary.  For a file layout that means per-file min/max ranges on both
clustering columns are tighter on average than the Z-order cells, which
is why Delta Lake's newer clustering (liquid clustering) and many geo
stores prefer Hilbert keys.

The transform is a fixed ``bits``-level loop of reflections and swaps;
each level is pure integer arithmetic on (x, y, d), rendered here as
one chained projection per level (Spark) and one chained CTE per level
(the SQL twin) so both engines run the identical unrolled program —
the z_value / z_value_sql pairing convention of operators/zorder.py.

Reference parity: none — the reference has no layout optimization;
§2.I curation/lake tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def hilbert_steps(bits: int) -> list[int]:
    return [1 << i for i in range(bits - 1, -1, -1)]


def hilbert_frame(
    df: DataFrame, x: Column, y: Column, bits: int
) -> DataFrame:
    """Append column ``h`` = Hilbert index of (x, y) on the
    2^bits × 2^bits grid; inputs must already lie in [0, 2^bits).
    One narrow projection per level keeps the expression tree linear
    in ``bits`` instead of exponential."""
    clash = {"__hx", "__hy", "h"}.intersection(df.columns)
    if clash:
        raise ValueError(
            f"hilbert_frame: input already has reserved column(s) {sorted(clash)}"
        )
    n = 1 << bits
    out = df.select("*", x.alias("__hx"), y.alias("__hy"), F.lit(0).cast("long").alias("h"))
    for s in hilbert_steps(bits):
        rx = (F.col("__hx").bitwiseAND(F.lit(s)) > 0).cast("long")
        ry = (F.col("__hy").bitwiseAND(F.lit(s)) > 0).cast("long")
        d2 = F.col("h") + F.lit(s * s) * (F.lit(3) * rx).bitwiseXOR(ry)
        x_refl = F.when(
            (ry == 0) & (rx == 1), F.lit(n - 1) - F.col("__hx")
        ).otherwise(F.col("__hx"))
        y_refl = F.when(
            (ry == 0) & (rx == 1), F.lit(n - 1) - F.col("__hy")
        ).otherwise(F.col("__hy"))
        # when ry == 0 the axes swap (after the reflection)
        x_next = F.when(ry == 0, y_refl).otherwise(F.col("__hx"))
        y_next = F.when(ry == 0, x_refl).otherwise(F.col("__hy"))
        keep = [c for c in out.columns if c not in ("__hx", "__hy", "h")]
        out = out.select(
            *keep,
            x_next.alias("__hx"),
            y_next.alias("__hy"),
            d2.alias("h"),
        )
    return out.drop("__hx", "__hy")


def hilbert_sql_ctes(x: str, y: str, bits: int, source: str) -> str:
    """The identical unrolled program as chained SQL CTEs.  ``source``
    is the relation providing columns ``{x}``/``{y}`` plus any
    passthrough columns; the final CTE is named ``hilbert`` and carries
    every source column plus ``h``.  Per-level columns are NUMBERED
    (hx0 → hx1 → …) — DuckDB's lateral column aliases would otherwise
    let a later expression in the same SELECT bind to the new alias
    instead of the previous level's value."""
    n = 1 << bits
    lines = [
        f"lvl0 AS (SELECT *, {x} AS hx0, {y} AS hy0, 0 AS h0 FROM {source})"
    ]
    k = 0
    for k, s in enumerate(hilbert_steps(bits), start=1):
        p = k - 1
        rx = f"CASE WHEN (hx{p} & {s}) > 0 THEN 1 ELSE 0 END"
        ry = f"CASE WHEN (hy{p} & {s}) > 0 THEN 1 ELSE 0 END"
        lines.append(
            f"""lvl{k} AS (
  SELECT * EXCLUDE (hx{p}, hy{p}, h{p}),
    CASE WHEN ({ry}) = 0 THEN
      CASE WHEN ({rx}) = 1 THEN {n - 1} - hy{p} ELSE hy{p} END
    ELSE hx{p} END AS hx{k},
    CASE WHEN ({ry}) = 0 THEN
      CASE WHEN ({rx}) = 1 THEN {n - 1} - hx{p} ELSE hx{p} END
    ELSE hy{p} END AS hy{k},
    h{p} + {s * s} * xor(3 * ({rx}), {ry}) AS h{k}
  FROM lvl{p})"""
        )
    lines.append(
        f"hilbert AS (SELECT * EXCLUDE (hx{k}, hy{k}, h{k}), h{k} AS h"
        f" FROM lvl{k})"
    )
    return ",\n".join(lines)


def hilbert_file_stats(
    df: DataFrame, x: Column, y: Column, bits: int, file_bits: int
) -> DataFrame:
    """Assign every row to a Hilbert-contiguous file (top ``file_bits``
    bits of h) and report the per-file footer statistics a scan skips
    on — the zorder_file_stats twin for curve comparison."""
    hf = hilbert_frame(
        df.select(x.alias("cx"), y.alias("cy")),
        F.col("cx"),
        F.col("cy"),
        bits,
    )
    fid = F.shiftright(F.col("h"), 2 * bits - file_bits)
    return (
        hf.select(fid.alias("file_id"), "cx", "cy")
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("cx").cast("long").alias("x_min"),
            F.max("cx").cast("long").alias("x_max"),
            F.min("cy").cast("long").alias("y_min"),
            F.max("cy").cast("long").alias("y_max"),
        )
    )
