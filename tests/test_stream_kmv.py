"""Streaming KMV distinct-count: fold parity vs the batch estimator
(the min-k semilattice makes the state order-independent), bounded
state, replay idempotence."""

from __future__ import annotations

import pyspark.sql.functions as F

from nemsis_xml_parser_spark.functions.hashing import md5_long
from nemsis_xml_parser_spark.streaming.kmv import (
    kmv_estimates,
    read_kmv_estimates,
    read_kmv_state,
    start_kmv_stream,
)

K = 32


def _batch_truth(spark, rows, k=K):
    """The batch KMV over the full key set — state AND estimate."""
    df = spark.createDataFrame(rows, "grp string, key long")
    h = df.select(
        "grp", md5_long(F.col("key").cast("string")).alias("hv")
    ).distinct()
    from pyspark.sql import Window

    ranked = h.withColumn(
        "rn", F.row_number().over(Window.partitionBy("grp").orderBy("hv"))
    ).where(F.col("rn") <= k)
    state = {(r.grp, r.hv) for r in ranked.collect()}
    est = {
        r.grp: (r.n_retained, r.kmv_estimate)
        for r in kmv_estimates(
            ranked.select("grp", "hv"), k
        ).collect()
    }
    return state, est


def test_stream_fold_matches_batch_and_state_is_bounded(spark, tmp_path):
    # two groups: one far past k distinct keys (estimation regime), one
    # under k (exact regime)
    rows = [("big", i * 7919 % 100003) for i in range(600)] + [
        ("small", i) for i in range(10)
    ]
    src = tmp_path / "src"
    for i in range(3):
        spark.createDataFrame(
            rows[i::3], "grp string, key long"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"f{i}"))
    stream = (
        spark.readStream.schema("grp string, key long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "f*"))
    )
    q = start_kmv_stream(
        stream,
        str(tmp_path / "state"),
        str(tmp_path / "est"),
        str(tmp_path / "cp"),
        key_col="key",
        group_col="grp",
        k=K,
    )
    q.awaitTermination()
    want_state, want_est = _batch_truth(spark, rows)
    got_state = {
        (r.grp, r.hv)
        for r in read_kmv_state(spark, str(tmp_path / "state")).collect()
    }
    assert got_state == want_state  # order-independent fold, bit-exact
    ests = read_kmv_estimates(spark, str(tmp_path / "est"))
    last = {
        r.grp: (r.n_retained, r.kmv_estimate)
        for r in ests.where(
            F.col("batch_id") == ests.agg(F.max("batch_id")).collect()[0][0]
        ).collect()
    }
    assert last == want_est
    # bounded state: never more than k rows per group
    n_big, n_small = (
        sum(1 for g, _ in got_state if g == "big"),
        sum(1 for g, _ in got_state if g == "small"),
    )
    assert n_big == K
    assert n_small == 10  # exact regime: under k keeps them all
    assert last["small"] == (10, 10.0)
    # estimation regime: within 40% of the true distinct count at k=32
    true_big = len({r[1] for r in rows if r[0] == "big"})
    assert abs(last["big"][1] - true_big) / true_big < 0.4


def test_replay_is_idempotent(spark, tmp_path):
    rows = [("g", i) for i in range(100)]
    df = spark.createDataFrame(rows, "grp string, key long")
    df.coalesce(1).write.parquet(str(tmp_path / "src" / "f0"))
    stream = (
        spark.readStream.schema("grp string, key long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src" / "f*"))
    )
    kwargs = dict(key_col="key", group_col="grp", k=K)
    q = start_kmv_stream(
        stream, str(tmp_path / "state"), str(tmp_path / "est"),
        str(tmp_path / "cp"), **kwargs,
    )
    q.awaitTermination()
    s1 = {
        (r.grp, r.hv)
        for r in read_kmv_state(spark, str(tmp_path / "state")).collect()
    }
    # simulate a replay of the same batch with a fresh checkpoint: the
    # min-k union fold is idempotent, state and estimates unchanged
    stream2 = (
        spark.readStream.schema("grp string, key long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src" / "f*"))
    )
    q2 = start_kmv_stream(
        stream2, str(tmp_path / "state"), str(tmp_path / "est"),
        str(tmp_path / "cp2"), **kwargs,
    )
    q2.awaitTermination()
    s2 = {
        (r.grp, r.hv)
        for r in read_kmv_state(spark, str(tmp_path / "state")).collect()
    }
    assert s1 == s2
