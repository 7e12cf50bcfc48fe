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
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        aggs += [
            F.count_if(F.col(c).isNull()).alias(f"_null_{c}"),
            distinct(F.col(c)).alias(f"_dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _null_{c}, _dist_{c}, _min_{c}, _max_{c}" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_null, n_distinct, min_str, max_str)"
        ),
        F.col("_n_rows").alias("n_rows"),
    ).select("column_name", "n_rows", "n_null", "n_distinct", "min_str", "max_str")
