"""Hilbert curve: reference-match of the unrolled transform, bijection
and unit-step adjacency, and the locality claim vs Morton order."""

from __future__ import annotations

import pyspark.sql.functions as F

from nemsis_xml_parser_spark.operators.hilbert import (
    hilbert_file_stats,
    hilbert_frame,
)
from nemsis_xml_parser_spark.operators.zorder import zorder_file_stats

BITS = 4
N = 1 << BITS


def _xy2d(n: int, x: int, y: int) -> int:
    """Sequential public-domain reference."""
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def _grid(spark, n):
    return spark.range(n * n).select(
        (F.col("id") % n).alias("x"),
        (F.col("id") / n).cast("long").alias("y"),
    )


def test_matches_reference_and_bijection(spark):
    rows = hilbert_frame(_grid(spark, N), F.col("x"), F.col("y"), BITS).collect()
    seen = set()
    for r in rows:
        assert r.h == _xy2d(N, r.x, r.y)
        seen.add(r.h)
    assert seen == set(range(N * N))


def test_unit_step_adjacency():
    """Consecutive Hilbert indices are Manhattan-distance 1 — the
    property Morton order lacks (its jumps are what loosen file
    bounding boxes)."""
    cells = {}
    for x in range(N):
        for y in range(N):
            cells[_xy2d(N, x, y)] = (x, y)
    path = [cells[d] for d in range(N * N)]
    for (x1, y1), (x2, y2) in zip(path, path[1:]):
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_tighter_files_than_morton(spark):
    """On a uniform 64x64 grid split into 16 files, the mean per-file
    bounding-box area under Hilbert order is no worse than under
    Morton order — the reason the layout exists."""
    bits, file_bits, n = 6, 4, 64
    g = _grid(spark, n)

    def mean_area(stats_df):
        rows = stats_df.collect()
        return sum(
            (r.x_max - r.x_min + 1) * (r.y_max - r.y_min + 1) for r in rows
        ) / len(rows)

    hb = mean_area(
        hilbert_file_stats(g, F.col("x"), F.col("y"), bits, file_bits)
    )
    zo = mean_area(
        zorder_file_stats(g, F.col("x"), F.col("y"), bits, file_bits)
    )
    assert hb <= zo
