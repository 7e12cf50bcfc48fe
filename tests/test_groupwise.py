"""groupBy().applyInPandas z-score operator: exact values and edge cases."""

import math

from nemsis_xml_parser_spark.operators.groupwise import zscore_by_group


def test_zscore_values_and_edge_groups(spark):
    rows = [
        # group "a": 1, 2, 3 -> mean 2, sample std 1
        (1, "a", 1), (2, "a", 2), (3, "a", 3),
        # group "b": single member -> NULL
        (4, "b", 10),
        # group "c": constant -> std 0 -> NULL
        (5, "c", 7), (6, "c", 7),
    ]
    df = spark.createDataFrame(rows, "id long, g string, x long")
    out = {r["id"]: r["zscore"] for r in zscore_by_group(df, "g", "x").collect()}
    assert math.isclose(out[1], -1.0) and math.isclose(out[2], 0.0)
    assert math.isclose(out[3], 1.0)
    assert out[4] is None
    assert out[5] is None and out[6] is None


def test_zscore_preserves_all_rows_and_columns(spark):
    df = spark.createDataFrame(
        [(1, "a", 5, "keep"), (2, "a", 9, "keep2")],
        "id long, g string, x long, extra string",
    )
    out = zscore_by_group(df, "g", "x")
    assert out.count() == 2
    assert set(out.columns) == {"id", "g", "x", "extra", "zscore"}
