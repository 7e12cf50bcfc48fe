"""Group-wise Pandas operators (``groupBy().applyInPandas``) — the
Arrow-batched per-group escape hatch for semantics awkward in pure SQL
(per-group model fits, normalization against group statistics, custom
ranking).  Completes the UDF surface alongside ``mapInPandas`` (flatten,
multimodal) and ``applyInPandasWithState`` (streaming).

Scale note: applyInPandas shuffles by the group key once and streams each
group through Arrow — group size, not table size, must fit in executor
memory.  For z-score the group is one language's documents: at 100 TB
partition further (e.g. by (lang, shard)) or prefer the pure-SQL window
formulation; this operator exists to exercise and test the pattern, and
its results are oracle-verified against the window algebra.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame


def zscore_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out_col: str = "zscore",
) -> DataFrame:
    """Per-group z-score of an integer column via applyInPandas.

    Uses the exact-sum formula (ints sum exactly in both pandas and SQL):
    mean = Σx/n, var = (Σx² − (Σx)²/n)/(n−1) — identical operation order to
    the SQL oracle so doubles agree bit-for-bit.  Groups of size 1 → NULL.
    """
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        x = pdf[value_col]
        if n < 2:
            pdf[out_col] = None
            return pdf
        sx = int(x.sum())
        sx2 = int((x.astype(object) ** 2).sum())  # exact int arithmetic
        mean = sx / n
        var = (sx2 - sx * sx / n) / (n - 1)
        std = math.sqrt(var)
        pdf[out_col] = None if std == 0.0 else (x - mean) / std
        return pdf

    return df.groupBy(group_col).applyInPandas(fn, schema=out_schema)
