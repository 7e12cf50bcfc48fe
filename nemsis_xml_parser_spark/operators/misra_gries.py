"""Misra–Gries heavy hitters — the deterministic counter-based summary
(Misra/Gries '82; mergeability per Agarwal et al., "Mergeable
Summaries", PODS'12) as the PRUNING pass of the classic two-pass exact
heavy-hitter pipeline.

Pass one is TRUE streaming MG: each Arrow batch's exact value counts
are merged into a bounded accumulator which is then compressed back to
at most ``k`` counters by subtracting the (k+1)-th largest count and
dropping the non-positive ones.  Merging exact batch counts (an MG
summary with zero error) into an MG summary and re-compressing is
exactly the Agarwal et al. merge, so after any prefix of batches the
accumulator is a valid MG summary of the rows seen: every counter
underestimates its key's true count by at most n_seen/(k+1), and every
key with true count above that bound survives.  Peak memory is
k + (distinct keys in one Arrow batch) — never the partition's
distinct-key count.  Summaries MERGE across partitions by plain
counter addition (summed underestimation is at most N/(k+1) across the
whole input), so the global candidate set is ONE hash aggregate over
at most partitions x k summary rows.  Pass two re-counts the
candidates exactly (broadcast null-safe semi-join + aggregate) and
filters at the N/(k+1) threshold — the OUTPUT is therefore exact (MG
guarantees the candidate set is a superset of the true heavy hitters),
which is what lets a plain GROUP BY / HAVING oracle verify a
sketch-pruned pipeline hash-for-hash.

NULL keys are counted (``value_counts(dropna=False)`` folded under a
``None`` counter key) and recounted through a null-safe (`<=>`)
semi-join, matching SQL GROUP BY's single NULL group.

Scale shape: pass one touches each row once inside Arrow batches and
emits ≤ k rows per partition; the candidate aggregate and the
semi-joined recount are the only shuffles, and the recount scan is the
second pass a counter-based (non-linear-sketch) summary fundamentally
needs for exact answers.

Reference parity: none — §2.I sketch tier.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Mapping, Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = [
    "mg_partition_summaries",
    "mg_exact_heavy_hitters",
    "mg_fold",
]


def _mg_compress(acc: dict, k: int) -> None:
    """In-place MG compress: subtract the (k+1)-th largest count from
    every counter and drop the non-positive ones.  No-op when the
    accumulator already holds at most ``k`` counters; afterwards it
    always does (at most k counts can strictly exceed the (k+1)-th
    largest)."""
    if len(acc) <= k:
        return
    counts = sorted(acc.values(), reverse=True)
    sub = counts[k]
    dead = [key for key, cnt in acc.items() if cnt <= sub]
    for key in dead:
        del acc[key]
    for key in acc:
        acc[key] -= sub


def mg_fold(
    batches: Iterable[Mapping],
    k: int,
    probe: Optional[dict] = None,
) -> dict:
    """Fold per-batch exact key->count mappings into a Misra–Gries
    accumulator of at most ``k`` counters (compressed after every
    batch).  ``probe``, if given, records ``probe['peak']`` = the
    largest accumulator size observed immediately after folding a
    batch (i.e. before compress) — the memory high-water mark,
    bounded by k + max-batch-distinct-keys."""
    acc: dict = {}
    for counts in batches:
        for key, cnt in counts.items():
            acc[key] = acc.get(key, 0) + int(cnt)
        if probe is not None:
            probe["peak"] = max(probe.get("peak", 0), len(acc))
        _mg_compress(acc, k)
    return acc


def mg_partition_summaries(
    df: DataFrame, key_col: str, k: int, with_peak: bool = False
) -> DataFrame:
    """(key, cnt) Misra–Gries summary rows, at most ``k`` per input
    partition, built by the streaming per-batch fold+compress (module
    docstring) so executor memory stays O(k + arrow-batch-distinct).
    ``with_peak=True`` adds a ``peak_acc`` column (the fold's memory
    high-water mark) for bound tests."""
    import pandas as pd

    if k < 1:
        raise ValueError("k must be >= 1")

    def summarize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        probe: dict = {}

        def batch_counts():
            for pdf in batches:
                vc = pdf[key_col].value_counts(dropna=False)
                yield {
                    (key if pd.notna(key) else None): int(cnt)
                    for key, cnt in vc.items()
                }

        acc = mg_fold(batch_counts(), k, probe)
        if not acc:
            return
        out = pd.DataFrame(list(acc.items()), columns=["key", "cnt"])
        if with_peak:
            out["peak_acc"] = probe.get("peak", 0)
        yield out

    schema = "key string, cnt long" + (
        ", peak_acc long" if with_peak else ""
    )
    return df.select(F.col(key_col).cast("string").alias(key_col)).mapInPandas(
        summarize, schema=schema
    )


def mg_exact_heavy_hitters(
    df: DataFrame, key_col: str, k: int
) -> DataFrame:
    """(key, exact_count, threshold) — every key whose exact frequency
    exceeds N/(k+1), found via MG candidate pruning + exact recount
    (module docstring).  Output is EXACT; the sketch only bounds the
    recount's input.  The candidate semi-join is null-safe so a NULL
    heavy key matches SQL GROUP BY's NULL group."""
    summaries = mg_partition_summaries(df, key_col, k)
    candidates = summaries.groupBy("key").agg(
        F.sum("cnt").alias("mg_cnt")
    )
    keyed = df.select(F.col(key_col).cast("string").alias("key"))
    cand_keys = F.broadcast(candidates.select(F.col("key").alias("cand_key")))
    recount = (
        keyed.join(cand_keys, keyed["key"].eqNullSafe(cand_keys["cand_key"]), "left_semi")
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
