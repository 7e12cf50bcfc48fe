"""Column profiling — one-pass ANALYZE-style statistics for any table.

A training-data pipeline needs cheap corpus health checks (null rates,
cardinalities, value ranges) before/after every transform; the
reference gets these for free from PostgreSQL's ``ANALYZE``/catalog,
so the Spark engine provides its own.

One aggregate pass computes every per-column measure, then a
``stack()`` unpivots the single row into (column_name, ...) rows — the
table is scanned once regardless of column count.  ``exact=True`` uses
``COUNT(DISTINCT)`` (Catalyst expands the aggregate per distinct
column — fine for tens of columns, and required for the DuckDB oracle);
at 100 TB pass ``exact=False`` for one-pass HLL
``approx_count_distinct`` with no expand.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def profile_columns(
    df: DataFrame, cols: Sequence[str] | None = None, exact: bool = True
) -> DataFrame:
    """(column_name, n_rows, n_null, n_distinct, min_str, max_str) per column.

    min/max are computed on the native type (so numeric columns order
    numerically) and cast to string for a uniform schema.
    """
    cols = list(cols) if cols is not None else df.columns
    distinct = F.count_distinct if exact else F.approx_count_distinct
    # Internal aliases are positional (_null_0, _dist_0, ...) so arbitrary
    # source column names (quotes, commas, dots) can never break or inject
    # into the stack() expression; the user-visible name appears only as an
    # escaped string literal.
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for i, c in enumerate(cols):
        col = df[c]
        aggs += [
            F.count_if(col.isNull()).alias(f"_null_{i}"),
            distinct(col).alias(f"_dist_{i}"),
            F.min(col).cast("string").alias(f"_min_{i}"),
            F.max(col).cast("string").alias(f"_max_{i}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        "'{lit}', _null_{i}, _dist_{i}, _min_{i}, _max_{i}".format(
            lit=c.replace("\\", "\\\\").replace("'", "\\'"), i=i
        )
        for i, c in enumerate(cols)
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_null, n_distinct, min_str, max_str)"
        ),
        F.col("_n_rows").alias("n_rows"),
    ).select("column_name", "n_rows", "n_null", "n_distinct", "min_str", "max_str")
