"""Z-order layout: Morton key correctness and measured file-pruning
benefit on BOTH indexed columns vs a single-column sort."""

import pyspark.sql.functions as F

from nemsis_xml_parser_spark.operators.layout import (
    file_pruning_fraction,
    morton_key,
    zorder_write,
)


def test_morton_interleave_small_values(spark):
    df = spark.createDataFrame([(1, 0), (0, 1), (3, 3)], "x long, y long")
    got = [
        r["z"]
        for r in df.select(
            morton_key([F.col("x"), F.col("y")], bits=2).alias("z")
        ).collect()
    ]
    # interleave x into even bits, y into odd: (1,0)->0b01, (0,1)->0b10, (3,3)->0b1111
    assert got == [1, 2, 15]


def test_zorder_prunes_both_columns(spark, tmp_path):
    # a grid where x and y are independent: a linear sort on x leaves y
    # scattered across every file; z-order clusters both
    n = 64
    rows = [(i % n, i // n) for i in range(n * n)]
    df = spark.createDataFrame(rows, "x long, y long")

    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    zorder_write(df, zpath, ["x", "y"], num_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    probe = (0, n // 8)  # selective range: 1/8 of the domain
    zx = file_pruning_fraction(spark, zpath, "x", *probe)
    zy = file_pruning_fraction(spark, zpath, "y", *probe)
    lx = file_pruning_fraction(spark, lpath, "x", *probe)
    ly = file_pruning_fraction(spark, lpath, "y", *probe)

    # linear layout: perfect on x, useless on y (every file overlaps)
    assert lx <= 0.25
    assert ly == 1.0
    # z-order: strictly better than linear on y, still pruning on x
    assert zy <= 0.5, f"z-order failed to cluster y: {zy}"
    assert zx <= 0.5, f"z-order failed to cluster x: {zx}"
    # and the combined worst case beats linear's worst case
    assert max(zx, zy) < max(lx, ly)


def test_zorder_roundtrip_preserves_rows(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, (i * 37) % 100, f"s{i}") for i in range(500)],
        "a long, b long, s string",
    )
    p = str(tmp_path / "zz")
    zorder_write(df, p, ["a", "b"], num_files=4)
    back = spark.read.parquet(p)
    assert back.count() == 500
    assert set(back.columns) == {"a", "b", "s"}
    assert back.agg(F.sum("a")).collect()[0][0] == sum(range(500))
