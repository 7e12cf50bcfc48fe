"""Representative per-microbatch DataFrames for the foreachBatch
streaming pipelines — the input to the stream plan-budget gate
(tools/gen_plan_budgets_stream.py writes budgets,
tests/test_stream_plan_audit.py enforces them).

The six foreachBatch pipelines hand-partition their batch bodies
(scoped narrow shuffles, widened compute stages); the classic
regression there is NOT a new Exchange but a ``coalesce`` landing
above a narrow producer and collapsing the whole compute stage to a
handful of tasks (NOTES.md gotcha 12 — it cost cdc_history_index 30%
in r10 before it was caught by a bench diff).  The gate therefore pins
``coalesce`` counts alongside exchanges/cartesian/bnlj: the sketch
folds legitimately ``coalesce(1)`` their bounded post-aggregate state
(pinned at their recorded counts), while the history-index compute
paths must stay coalesce-free.

Each builder stages a tiny synthetic corpus plus one pre-seeded index
batch dir under ``root`` so index reads are real file scans (the plan
shape the stream sees from batch 1 on), then returns the SAME frame
compositions the foreachBatch bodies execute.  Builders reuse the
modules' public helpers so the audited expressions are the production
expressions; the kmv fold (inline in its body) is transcribed with a
pointer comment.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402


def _docs(spark: SparkSession) -> DataFrame:
    rows = [
        (i, f"synthetic document {i} body words tokens here run {i % 5} "
            f"shared tail phrase common across documents")
        for i in range(24)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def stream_batch_frames(
    spark: SparkSession, root: str
) -> dict[str, DataFrame]:
    """{pipeline_frame_name: DataFrame} for plan auditing."""
    from nemsis_xml_parser_spark.functions.hashing import md5_long
    from nemsis_xml_parser_spark.operators.cdc import cdc_chunks
    from nemsis_xml_parser_spark.operators.dedup import minhash_band_keys
    from nemsis_xml_parser_spark.operators.sketches import (
        countmin_cells,
        countmin_estimate,
    )
    from nemsis_xml_parser_spark.operators.winnow import (
        winnowing_fingerprints,
    )
    from nemsis_xml_parser_spark.streaming.countmin import read_cm_cells
    from nemsis_xml_parser_spark.streaming.dedup_index import (
        candidates_against_index,
        read_index,
    )
    from nemsis_xml_parser_spark.streaming.hll import (
        hll_registers,
        read_hll_state,
    )
    from nemsis_xml_parser_spark.streaming.kmv import read_kmv_state
    from nemsis_xml_parser_spark.streaming.winnow_index import (
        fp_groups,
        pairs_from_groups,
        read_fp_index,
    )

    docs = _docs(spark)
    width = spark.sparkContext.defaultParallelism
    frames: dict[str, DataFrame] = {}

    # --- winnow history index (streaming/winnow_index.py body) ---
    wfps = winnowing_fingerprints(
        docs.repartition(width, F.col("doc_id")), max_df=None
    ).repartition(4)
    wfps.write.mode("overwrite").parquet(f"{root}/wnidx/batch=0")
    widx = read_fp_index(spark, f"{root}/wnidx")
    frames["winnow_fps"] = wfps
    frames["winnow_pairs"] = pairs_from_groups(
        fp_groups(wfps, widx), max_df=50, min_shared=3
    )

    # --- cdc history index (streaming/cdc_index.py body) ---
    cfps = (
        cdc_chunks(docs.repartition(width), mask_bits=6)
        .select("doc_id", F.col("chunk_hash").alias("gh"))
        .repartition(4)
    )
    cfps.write.mode("overwrite").parquet(f"{root}/cdcidx/batch=0")
    cidx = read_fp_index(spark, f"{root}/cdcidx")
    frames["cdc_fps"] = cfps
    frames["cdc_pairs"] = pairs_from_groups(
        fp_groups(cfps, cidx), max_df=50, min_shared=2
    )

    # --- minhash-LSH dedup index (streaming/dedup_index.py body) ---
    banded = minhash_band_keys(
        docs.repartition(width), "text", "doc_id", 16, 4, 3
    ).repartition(4)
    banded.write.mode("overwrite").parquet(f"{root}/ndidx/batch=0")
    nidx = read_index(spark, f"{root}/ndidx")
    frames["dedup_banded"] = banded
    frames["dedup_pairs"] = candidates_against_index(banded, nidx)

    # --- kmv fold (streaming/kmv.py body, fold transcribed; state is
    # the batch-0 empty frame — the txlog read needs a committed
    # version, and the fold's plan shape above the state source is what
    # the gate pins) ---
    bh = docs.select(
        F.lit("all").alias("grp"),
        md5_long(F.col("doc_id").cast("string")).alias("hv"),
    ).distinct()
    frames["kmv_fold"] = (
        read_kmv_state(spark, f"{root}/kmv")
        .unionByName(bh)
        .distinct()
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("grp").orderBy(F.col("hv").asc())
            ),
        )
        .where(F.col("__rn") <= 256)
        .select("grp", "hv")
        .coalesce(1)
    )

    # --- hll fold (streaming/hll.py body) ---
    hreg = hll_registers(docs, "doc_id", None)
    frames["hll_fold"] = (
        read_hll_state(spark, f"{root}/hll")
        .unionByName(hreg)
        .groupBy("grp", "j")
        .agg(F.max("mj").cast("int").alias("mj"))
        .coalesce(1)
    )

    # --- ivf index maintenance (streaming/ivf_index.py body) ---
    from nemsis_xml_parser_spark.operators.ivf import (
        assign_cells,
        train_centroids,
    )

    vecs = spark.createDataFrame(
        [(i, [float((i * 7 + d) % 13) - 6.0 for d in range(8)])
         for i in range(32)],
        "vec_id long, embedding array<double>",
    )
    cents = train_centroids(vecs, nlist=4, iters=1)
    frames["ivf_assign"] = assign_cells(vecs, cents)

    # --- count-min delta + estimate (streaming/countmin.py body) ---
    keyed = (
        docs.select(F.col("doc_id").cast("string").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    delta = countmin_cells(keyed, "k", "cnt", 4, 64).coalesce(1)
    delta.write.mode("overwrite").parquet(f"{root}/cm/batch=0")
    frames["cm_delta"] = delta
    frames["cm_estimate"] = countmin_estimate(
        keyed.select("k"), read_cm_cells(spark, f"{root}/cm"), "k", 4, 64
    )

    return frames
