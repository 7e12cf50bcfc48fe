"""Streaming HLL distinct-count: fold parity vs the batch sketch (the
register max-merge semilattice makes the state order-independent),
bounded state, replay idempotence, estimate-equals-batch-query."""

from __future__ import annotations

import pyspark.sql.functions as F

from nemsis_xml_parser_spark.streaming.hll import (
    hll_registers,
    hll_state_estimates,
    read_hll_estimates,
    read_hll_state,
    start_hll_stream,
)


def _batch_truth(spark, rows):
    """The batch HLL over the full key set — state AND estimate."""
    df = spark.createDataFrame(rows, "grp string, key long")
    regs = hll_registers(df, "key", "grp")
    state = {(r.grp, r.j, r.mj) for r in regs.collect()}
    est = {
        r.grp: (r.n_present, r.hll_estimate)
        for r in hll_state_estimates(regs).collect()
    }
    return state, est


def test_stream_fold_matches_batch_and_state_is_bounded(spark, tmp_path):
    # one group far into the estimation regime, one tiny (LC branch)
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
    q = start_hll_stream(
        stream,
        str(tmp_path / "state"),
        str(tmp_path / "est"),
        str(tmp_path / "cp"),
        key_col="key",
        group_col="grp",
    )
    q.awaitTermination()
    want_state, want_est = _batch_truth(spark, rows)
    got_state = {
        (r.grp, r.j, r.mj)
        for r in read_hll_state(spark, str(tmp_path / "state")).collect()
    }
    assert got_state == want_state  # order-independent fold, bit-exact
    ests = read_hll_estimates(spark, str(tmp_path / "est"))
    last = {
        r.grp: (r.n_present, r.hll_estimate)
        for r in ests.where(
            F.col("batch_id") == ests.agg(F.max("batch_id")).collect()[0][0]
        ).collect()
    }
    assert last == want_est
    # bounded state: never more than 64 register rows per group
    assert sum(1 for g, *_ in got_state if g == "big") <= 64
    # estimation-regime accuracy: within 40% at 64 registers
    true_big = len({r[1] for r in rows if r[0] == "big"})
    assert abs(last["big"][1] - true_big) / true_big < 0.4
    # tiny group takes the linear-counting branch and lands close
    assert abs(last["small"][1] - 10) < 2


def test_replay_is_idempotent(spark, tmp_path):
    rows = [("g", i) for i in range(100)]
    df = spark.createDataFrame(rows, "grp string, key long")
    df.coalesce(1).write.parquet(str(tmp_path / "src" / "f0"))

    def run(cp):
        stream = (
            spark.readStream.schema("grp string, key long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(tmp_path / "src" / "f*"))
        )
        q = start_hll_stream(
            stream, str(tmp_path / "state"), str(tmp_path / "est"),
            str(tmp_path / cp), key_col="key", group_col="grp",
        )
        q.awaitTermination()
        return {
            (r.grp, r.j, r.mj)
            for r in read_hll_state(spark, str(tmp_path / "state")).collect()
        }

    s1 = run("cp")
    # replay with a fresh checkpoint: register max-merge is idempotent
    s2 = run("cp2")
    assert s1 == s2
