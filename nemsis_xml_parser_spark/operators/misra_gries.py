"""Misra–Gries heavy hitters — the deterministic counter-based summary
(Misra/Gries '82; mergeability per Agarwal et al., "Mergeable
Summaries", PODS'12) as the PRUNING pass of the classic two-pass exact
heavy-hitter pipeline.

Per partition, the offline MG construction compresses the partition's
exact key counts to at most ``k`` counters by subtracting the (k+1)-th
largest count from every counter and dropping the non-positive ones —
each surviving counter underestimates its key's true partition count
by at most n_partition/(k+1), and every key with true count above that
bound survives.  Summaries MERGE by plain counter addition (the
per-key sum keeps the no-false-negative property: summed
underestimation is at most N/(k+1) across the whole input), so the
global candidate set is ONE hash aggregate over at most
partitions x k summary rows.  Pass two re-counts the candidates
exactly (broadcast semi-join + aggregate) and filters at the
N/(k+1) threshold — the OUTPUT is therefore exact (MG guarantees the
candidate set is a superset of the true heavy hitters), which is what
lets a plain GROUP BY / HAVING oracle verify a sketch-pruned pipeline
hash-for-hash.

Scale shape: pass one touches each row once inside Arrow batches and
emits ≤ k rows per partition; the candidate aggregate and the
semi-joined recount are the only shuffles, and the recount scan is the
second pass a counter-based (non-linear-sketch) summary fundamentally
needs for exact answers.

Reference parity: none — §2.I sketch tier.
"""

from __future__ import annotations

from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["mg_partition_summaries", "mg_exact_heavy_hitters"]


def mg_partition_summaries(
    df: DataFrame, key_col: str, k: int
) -> DataFrame:
    """(key, cnt) Misra–Gries summary rows, at most ``k`` per input
    partition — the offline MG construction over the partition's exact
    counts (vectorized: value_counts, subtract the (k+1)-th largest,
    keep positive)."""
    import pandas as pd

    if k < 1:
        raise ValueError("k must be >= 1")

    def summarize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        acc: dict = {}
        for pdf in batches:
            for key, cnt in pdf[key_col].value_counts().items():
                acc[key] = acc.get(key, 0) + int(cnt)
        if not acc:
            return
        counts = sorted(acc.values(), reverse=True)
        sub = counts[k] if len(counts) > k else 0
        rows = [
            (key, cnt - sub) for key, cnt in acc.items() if cnt - sub > 0
        ]
        yield pd.DataFrame(rows, columns=["key", "cnt"])

    return df.select(F.col(key_col).cast("string").alias(key_col)).mapInPandas(
        summarize, schema="key string, cnt long"
    )


def mg_exact_heavy_hitters(
    df: DataFrame, key_col: str, k: int
) -> DataFrame:
    """(key, exact_count, threshold) — every key whose exact frequency
    exceeds N/(k+1), found via MG candidate pruning + exact recount
    (module docstring).  Output is EXACT; the sketch only bounds the
    recount's input."""
    summaries = mg_partition_summaries(df, key_col, k)
    candidates = summaries.groupBy("key").agg(
        F.sum("cnt").alias("mg_cnt")
    )
    keyed = df.select(F.col(key_col).cast("string").alias("key"))
    recount = (
        keyed.join(F.broadcast(candidates.select("key")), "key", "left_semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_count"))
    )
    n_total = keyed.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        recount.crossJoin(F.broadcast(n_total))
        .where(
            F.col("exact_count") * F.lit(k + 1) > F.col("n")
        )
        .select(
            "key",
            "exact_count",
            F.floor(F.col("n") / F.lit(k + 1)).cast("bigint").alias(
                "threshold"
            ),
        )
    )
