"""Morton interleave correctness + the data-skipping property it buys."""

from __future__ import annotations

import pyspark.sql.functions as F

from nemsis_xml_parser_spark.operators.zorder import (
    z_value,
    z_value_sql,
    zorder_file_stats,
)


def ref_morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_reference(spark):
    pts = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = df.select(
        "x", "y", z_value(F.col("x"), F.col("y"), 6).alias("z")
    ).collect()
    for r in got:
        assert r.z == ref_morton(r.x, r.y, 6)


def test_z_value_sql_twin_is_identical(spark):
    df = spark.createDataFrame(
        [(x, (x * 13 + 5) % 256) for x in range(256)], "x long, y long"
    )
    df.createOrReplaceTempView("_zpts")
    a = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", z_value(F.col("x"), F.col("y"), 8).alias("z")
        ).collect()
    }
    b = {
        (r.x, r.y): r.z
        for r in spark.sql(
            f"SELECT x, y, {z_value_sql('x', 'y', 8)} AS z FROM _zpts"
        ).collect()
    }
    assert a == b


def test_zorder_tightens_both_ranges(spark):
    # dense 64x64 grid, 16 files: z-order gives every file a 16x16 cell
    # (both ranges 16-wide); a linear sort on x would leave y full-width
    pts = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(pts, "x long, y long")
    stats = zorder_file_stats(
        df, F.col("x"), F.col("y"), bits=6, file_bits=4
    ).collect()
    assert len(stats) == 16
    for r in stats:
        assert r.n_rows == 256
        assert r.x_max - r.x_min == 15
        assert r.y_max - r.y_min == 15
