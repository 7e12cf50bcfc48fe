"""Isotonic regression (PAVA) over a BOUNDED binned domain via the
minimax closed form.

The pool-adjacent-violators fit has the order-free characterization

    iso(i) = max_{j <= i} min_{k >= i} weighted_mean(y[j..k])

(Robertson–Wright–Dykstra, *Order Restricted Statistical Inference*,
eq. 1.9 — the "max-min formula").  PAVA itself is a sequential sweep —
useless on a cluster — but on a *binned* domain (calibration bins,
score deciles: tens of rows, never corpus rows) the minimax form is
three bounded triangular joins, fully declarative and oracle-replayable.
The corpus-scale work (binning + per-bin counts) is ONE hash aggregate;
everything after runs on the broadcast-sized bin frame.  This is the
standard shape for probability calibration in a training pipeline:
bin model scores, isotonic-fit the empirical rates, serve the fitted
step function.

Determinism: interval means are ROUND(pos/n, 12) doubles (identical
IEEE division on both engines); min/max over doubles is exact.

Reference parity: the reference (psycopg2 ETL) has no statistics
surface; §2.I extension tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .lineage import cut_lineage


def isotonic_fit_binned(bins: DataFrame, max_bins: int = 256) -> DataFrame:
    """Fit isotonic (non-decreasing) rates over a bounded bin frame.

    ``bins``: (bin, n, pos) with ``bin`` orderable, ``n`` > 0 —
    already-aggregated per-bin totals, at most ``max_bins`` rows (the
    minimax formulation is cubic in the bin count; 256 bins → ≤ 16.7M
    tiny triple-join rows, still broadcast-scale.  Corpus rows must be
    aggregated into bins BEFORE calling — that aggregation is the only
    corpus-scale stage).

    Returns (bin, n, pos, iso_m) where iso_m is the round-12 fitted
    rate; monotone non-decreasing in ``bin`` by construction.
    """
    b = bins.transform(cut_lineage)
    cnt = b.count()
    if cnt > max_bins:
        raise ValueError(
            f"isotonic_fit_binned: {cnt} bins exceeds max_bins={max_bins}; "
            "aggregate to a bounded bin domain first"
        )
    jk = (
        b.select(F.col("bin").alias("j"))
        .join(F.broadcast(b.select(F.col("bin").alias("k"))), F.col("j") <= F.col("k"))
        .join(
            F.broadcast(b),
            (F.col("bin") >= F.col("j")) & (F.col("bin") <= F.col("k")),
        )
        .groupBy("j", "k")
        .agg(
            F.round(
                F.sum("pos").cast("double") / F.sum("n").cast("double"), 12
            ).alias("m")
        )
    )
    mn = (
        b.select(F.col("bin").alias("i"))
        .join(
            F.broadcast(jk),
            (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")),
        )
        .groupBy("i", "j")
        .agg(F.min("m").alias("mn"))
    )
    iso = mn.groupBy("i").agg(F.max("mn").alias("iso_m"))
    return b.join(
        F.broadcast(iso.withColumnRenamed("i", "bin")), "bin"
    ).select("bin", "n", "pos", "iso_m")
