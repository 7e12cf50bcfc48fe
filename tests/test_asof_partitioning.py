"""As-of join (composition vs pandas reference), salted join equivalence,
bucketed-join shuffle elimination, stateful streaming operator."""

import pyspark.sql.functions as F
import pytest

from nemsis_xml_parser_spark.operators.asof_join import asof_join, asof_join_pandas
from nemsis_xml_parser_spark.operators.partitioning import (
    bucketed_join,
    physical_plan,
    salted_join,
    write_bucketed,
)

ASOF_LEFT = [
    (1, 10, "l1"),
    (1, 20, "l2"),
    (1, 5, "l0"),   # before any right row → NULL
    (2, 7, "l3"),
]
ASOF_RIGHT = [
    (1, 10, 100, "r10"),   # exact-ts match counts ("at or before")
    (1, 15, 101, "r15"),
    (1, 15, 102, "r15b"),  # tie on (key, ts): greatest order wins
    (2, 6, 103, "r6"),
]


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(ASOF_LEFT, "k long, t long, lv string")
    right = spark.createDataFrame(ASOF_RIGHT, "k long, t long, ord long, rv string")
    return left, right


def test_asof_join_semantics(asof_frames):
    left, right = asof_frames
    out = {
        (r["k"], r["t"]): r["rv"]
        for r in asof_join(left, right, "k", "t", "ord", ["rv"]).collect()
    }
    assert out[(1, 10)] == "r10"   # exact ts
    assert out[(1, 20)] == "r15b"  # tie broken by greatest ord
    assert out[(1, 5)] is None     # nothing at or before
    assert out[(2, 7)] == "r6"


def test_asof_null_in_matched_row_preserved(spark):
    """A NULL value column in the matched (latest) right row must surface as
    NULL — not fall back to an older right row's non-NULL value."""
    left = spark.createDataFrame([(1, 20, "l")], "k long, t long, lv string")
    right = spark.createDataFrame(
        [(1, 10, 1, "old"), (1, 15, 2, None)], "k long, t long, ord long, rv string"
    )
    comp = asof_join(left, right, "k", "t", "ord", ["rv"]).collect()
    ref = asof_join_pandas(left, right, "k", "t", "ord", ["rv"]).collect()
    assert comp[0]["rv"] is None
    assert ref[0]["rv"] is None


def test_asof_composition_matches_pandas_reference(asof_frames):
    left, right = asof_frames
    a = sorted(
        map(str, asof_join(left, right, "k", "t", "ord", ["rv"]).collect())
    )
    b = sorted(
        map(str, asof_join_pandas(left, right, "k", "t", "ord", ["rv"]).collect())
    )
    assert a == b


def test_salted_join_equals_plain_join(spark):
    l = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    r = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    plain = (
        l.join(r.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(
            l, r.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", salt=4
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(str, plain.collect())) == sorted(map(str, salted.collect()))


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    write_bucketed(o, "orders_b", "o_orderkey", 4, str(tmp_path / "ob"))
    write_bucketed(l, "lineitem_b", "l_orderkey", 4, str(tmp_path / "lb"))
    # force SMJ so the planner can't pick broadcast (which would bypass
    # bucketing entirely on these tiny tables)
    joined = (
        spark.table("orders_b")
        .hint("merge")
        .join(
            spark.table("lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
    )
    joined.collect()
    plan = physical_plan(joined)
    assert "Exchange" not in plan, plan  # co-located: no shuffle
    # same join on raw parquet DOES shuffle (control)
    raw = o.join(l, o.o_orderkey == l.l_orderkey)
    raw = raw.hint("merge")  # force SMJ so the comparison is like-for-like
    raw.collect()
    assert "Exchange" in physical_plan(raw)


def test_stateful_running_totals(spark, tmp_path):
    import pandas as pd

    from nemsis_xml_parser_spark.streaming.stateful import running_totals

    src = tmp_path / "ev"
    src.mkdir()
    pd.DataFrame(
        [
            (1, "click", 1.0),
            (2, "click", 2.0),
            (3, "view", 5.0),
        ],
        columns=["event_id", "event_type", "value"],
    ).to_json(src / "b1.json", orient="records", lines=True)
    ev = spark.readStream.schema("event_id long, event_type string, value double").json(
        str(src)
    )
    q = (
        running_totals(ev)
        .writeStream.format("memory")
        .queryName("totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {
        r["event_type"]: (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM totals").collect()
    }
    assert out["click"] == (2, 3.0)
    assert out["view"] == (1, 5.0)
