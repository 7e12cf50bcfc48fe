"""Distributed dense linear-algebra primitives over embedding columns.

``gram_matrix`` computes X^T X (the Gram / unnormalized covariance
matrix) the way a 100 TB pipeline must: each Arrow batch reduces its
rows to a LOCAL d x d partial product (numpy BLAS, zero Python loops),
and only the (i, j, partial) triples — P·d² rows, independent of the
corpus size — shuffle to the final (i, j) sum.  This is the map-side
tree-aggregation shape; shipping raw vectors to a single reducer or
pair-exploding every row (n·d² rows) are the two anti-patterns it
replaces.  Gram feeds covariance/PCA/whitening/linear probes — the
core statistic of every embedding-quality pass.

No counterpart in the reference (a psycopg2 ETL with no vector ops).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

GRAM_SCHEMA = StructType(
    [
        StructField("i", IntegerType(), False),
        StructField("j", IntegerType(), False),
        StructField("partial", DoubleType(), False),
    ]
)


def gram_matrix(
    df: DataFrame, vec_col: str = "embedding", upper_only: bool = True
) -> DataFrame:
    """(i, j, gram) with gram = Σ_rows v[i]·v[j], i <= j when
    ``upper_only`` (the matrix is symmetric).

    Per-partition partials via numpy ``X.T @ X``; the shuffle carries
    only d² rows per partition.  Final values are plain double sums of
    the per-partition partials — round at the consumer if cross-engine
    bit-stability is needed.
    """
    import numpy as np

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            g = x.T @ x
            d = g.shape[0]
            iu = np.triu_indices(d) if upper_only else (
                np.repeat(np.arange(d), d), np.tile(np.arange(d), d)
            )
            yield pd.DataFrame(
                {
                    "i": iu[0].astype("int32"),
                    "j": iu[1].astype("int32"),
                    "partial": g[iu[0], iu[1]],
                }
            )

    vecs = df.select(
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v")
    )
    return (
        vecs.mapInPandas(partials, schema=GRAM_SCHEMA)
        .groupBy("i", "j")
        .agg(F.sum("partial").alias("gram"))
    )
