from __future__ import annotations

from nemsis_xml_parser_spark.operators.profiling import profile_columns


def test_profile_counts_nulls_distincts_minmax(spark):
    df = spark.createDataFrame(
        [(1, "b"), (2, None), (2, "a"), (None, "a")],
        "k long, v string",
    )
    rows = {r["column_name"]: r for r in profile_columns(df).collect()}
    assert rows["k"]["n_rows"] == 4
    assert rows["k"]["n_null"] == 1
    assert rows["k"]["n_distinct"] == 2
    assert rows["k"]["min_str"] == "1" and rows["k"]["max_str"] == "2"
    assert rows["v"]["n_null"] == 1
    assert rows["v"]["n_distinct"] == 2
    assert rows["v"]["min_str"] == "a" and rows["v"]["max_str"] == "b"


def test_profile_approx_mode_and_subset(spark):
    df = spark.createDataFrame([(i, str(i % 3)) for i in range(100)], "k long, v string")
    rows = {r["column_name"]: r for r in profile_columns(df, cols=["v"], exact=False).collect()}
    assert set(rows) == {"v"}
    assert abs(rows["v"]["n_distinct"] - 3) <= 1
