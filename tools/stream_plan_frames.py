"""Representative per-microbatch DataFrames for the foreachBatch
streaming pipelines — the input to the stream plan-budget gate
(tools/gen_plan_budgets_stream.py writes budgets,
tests/test_stream_plan_audit.py enforces them).

Coverage (r12): every bench pipeline.  The foreachBatch families get a
representative batch-body frame below; the stateful pipelines
(windowed aggregates, watermark dedup, stream-stream join) are run
LIVE for one availableNow drain by :func:`stream_live_plans` so their
stateful operators are pinned too.  The foreachBatch pipelines
hand-partition their batch bodies
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
    from nemsis_xml_parser_spark.operators.cdc import cdc_chunks_arrow
    from nemsis_xml_parser_spark.operators.sketches import (
        countmin_cells,
        countmin_estimate,
    )
    from nemsis_xml_parser_spark.operators.winnow import (
        winnowing_fingerprints_arrow,
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

    # --- winnow history index (streaming/winnow_index.py body, r13
    # shape: Arrow fingerprint kernel after ONE repartition — the
    # kernel dedups per doc internally, so no window/distinct) ---
    wfps = winnowing_fingerprints_arrow(
        docs.repartition(8), max_df=None
    )
    wfps.write.mode("overwrite").parquet(f"{root}/wnidx/batch=0")
    widx = read_fp_index(spark, f"{root}/wnidx")
    frames["winnow_fps"] = wfps
    frames["winnow_pairs"] = pairs_from_groups(
        fp_groups(wfps, widx), max_df=50, min_shared=3
    )

    # --- cdc history index (streaming/cdc_index.py body, r12 shape:
    # vectorized Arrow chunker, fully narrow — NO width repartition, NO
    # narrow-4 shuffle; the batch dir is written first and the pairs
    # half consumes the same frame) ---
    cfps = cdc_chunks_arrow(docs, mask_bits=6).select(
        "doc_id", F.col("chunk_hash").alias("gh")
    )
    cfps.write.mode("overwrite").parquet(f"{root}/cdcidx/batch=0")
    cidx = read_fp_index(spark, f"{root}/cdcidx")
    frames["cdc_fps"] = cfps
    frames["cdc_pairs"] = pairs_from_groups(
        fp_groups(cfps, cidx), max_df=50, min_shared=2
    )

    # --- minhash-LSH dedup index (streaming/dedup_index.py body, r13
    # shape: Arrow banding kernel after ONE repartition, batch side
    # broadcast into both candidate joins, per-batch distinct dropped —
    # read_candidate_pairs dedups on read) ---
    from nemsis_xml_parser_spark.operators.dedup import (
        minhash_band_keys_arrow,
    )

    banded = minhash_band_keys_arrow(
        docs.repartition(8), "text", "doc_id", 16, 4, 3
    )
    banded.write.mode("overwrite").parquet(f"{root}/ndidx/batch=0")
    nidx = read_index(spark, f"{root}/ndidx")
    frames["dedup_banded"] = banded
    frames["dedup_pairs"] = candidates_against_index(
        banded, nidx, distinct=False
    )

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
    # (live stateful plans — windowed_rollup, minhash_dedup,
    # stream_join, drift/cusum/hh windowed counts — are captured by
    # stream_live_plans below: their defining operators only exist in
    # a MicroBatchExecution plan, not in a batch frame)
    from nemsis_xml_parser_spark.operators.ivf import (
        assign_cells_arrow,
        train_centroids,
    )

    vecs = spark.createDataFrame(
        [(i, [float((i * 7 + d) % 13) - 6.0 for d in range(8)])
         for i in range(32)],
        "vec_id long, embedding array<double>",
    )
    cents = train_centroids(vecs, nlist=4, iters=1)
    # r13: production assignment is the Arrow kernel with closure-held
    # centroids (collected once per stream)
    frames["ivf_assign"] = assign_cells_arrow(vecs, cents.collect())

    # --- NSW graph-index maintenance (streaming/nsw_index.py body:
    # beam-found history candidates + the vectorized in-batch kernel
    # feeding one per-src window; nav edges under the hub budget) ---
    from nemsis_xml_parser_spark.functions import vectors as VV
    from nemsis_xml_parser_spark.streaming.nsw_index import (
        NAV_MAX,
        _seeded_cent_rows as _seeded_rows,
        nsw_insertion_edges_guided,
    )

    ncents = train_centroids(vecs, nlist=4, iters=0)
    ncells = assign_cells_arrow(vecs, ncents.collect()).withColumn(
        "nrm", VV.norm(F.col("iv"))
    )
    nseeds = (
        vecs.select(
            (F.col("vec_id") % 4).cast("int").alias("cid"),
            F.col("vec_id").alias("svid"),
        )
        .groupBy("cid")
        .agg(F.min("svid").alias("svid"))
    )
    nfound = spark.createDataFrame(
        [(0, 1, 0.5), (2, 3, 0.25)],
        "query_id long, neighbor_id long, cosine double",
    )
    frames["nsw_insertion_edges"] = nsw_insertion_edges_guided(
        # r13: the guided insert takes the frozen seed-filtered centroid
        # ROWS (the Arrow nearest kernel's closure input), not the frame
        vecs, ncells, nfound, nseeds,
        _seeded_rows(nseeds, ncents),
        nav_max=NAV_MAX, nav_used={0: 3},
    )

    # --- connected-components maintenance (streaming/components.py
    # body: read store -> fold batch -> commit) ---
    from nemsis_xml_parser_spark.streaming.components import (
        merge_components_batch,
    )

    edges = spark.createDataFrame(
        [(i, (i + 1) % 12) for i in range(16)], "src long, dst long"
    )
    cc_state = spark.createDataFrame(
        [(i, i % 3) for i in range(6)], "node long, component long"
    )
    frames["cc_merge"] = merge_components_batch(cc_state, edges)

    # --- MSF maintenance (streaming/msf.py body; the tiny-residual
    # microbatch path finishes with the single-task Kruskal endgame,
    # which is the legitimate coalesce(1) this frame pins) ---
    from nemsis_xml_parser_spark.streaming.msf import merge_msf_batch

    wedges = spark.createDataFrame(
        [(i, (i + 1) % 10, (i * 3) % 7 + 1) for i in range(14)],
        "u long, v long, w long",
    )
    forest = spark.createDataFrame([], "u long, v long, w long")
    frames["msf_merge"] = merge_msf_batch(forest, wedges)

    # --- drift monitor batch half (streaming/drift.py::psi_from_counts
    # over one closed window's histogram) ---
    from nemsis_xml_parser_spark.streaming.drift import psi_from_counts

    counts = spark.createDataFrame(
        [(0, 3600, b, 10 + b) for b in range(8)],
        "window_start long, window_end long, bucket int, n_cur long",
    )
    reference = spark.createDataFrame(
        [(b, 12 + b, 100.0) for b in range(8)],
        "bucket int, n_ref long, t_ref double",
    )
    frames["drift_psi"] = psi_from_counts(counts, reference)

    # --- heavy-hitter monitor batch half
    # (streaming/heavyhitters.py::heavy_hitters_from_counts) ---
    from nemsis_xml_parser_spark.streaming.heavyhitters import (
        heavy_hitters_from_counts,
    )

    key_counts = spark.createDataFrame(
        [(0, 3600, f"u{i % 5}", 10 + i) for i in range(15)],
        "window_start long, window_end long, key string, n long",
    )
    frames["hh_topk"] = heavy_hitters_from_counts(key_counts)

    # --- exactly-once JDBC sinks (streaming/sink.py): the batch body is
    # DBAPI staging (no SQL plan) — what the gate CAN pin is the staged
    # projection feeding mapPartitionsWithIndex, which must stay narrow
    # (an exchange here would shuffle every microbatch row before the
    # per-partition scratch-table writes) ---
    frames["sink_staged_projection"] = docs.select("doc_id", "text")

    # cusum_counts' batch body is a watermark-bounded orderBy+collect on
    # the driver (documented in streaming/changepoint.py) — its SQL half
    # is the windowed_event_counts stateful plan, pinned by the live
    # capture in gen_plan_budgets_stream.py alongside windowed_rollup,
    # minhash_dedup, stream_join, drift/hh windowed counts.

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


def stream_live_plans(spark: SparkSession, root: str) -> dict[str, str]:
    """{pipeline_name: last-executed microbatch plan string} for the
    STATEFUL pipelines — watermarked windowed aggregates, the
    dropDuplicatesWithinWatermark dedup, the stream-stream interval
    join.  Their defining physical operators (StateStoreSave,
    StreamingDeduplicateWithinWatermark, StreamingSymmetricHashJoin)
    only exist in a MicroBatchExecution plan, so each pipeline is run
    for one availableNow drain into the noop sink on a tiny staged
    corpus and its executed plan captured via ``explainInternal`` —
    the live counterpart of the batch frames above."""
    from nemsis_xml_parser_spark.streaming.changepoint import (
        windowed_event_counts,
    )
    from nemsis_xml_parser_spark.streaming.drift import windowed_counts
    from nemsis_xml_parser_spark.streaming.events import (
        dedup_stream_by_minhash,
        tumbling_counts,
    )
    from nemsis_xml_parser_spark.streaming.heavyhitters import (
        windowed_key_counts,
    )
    from nemsis_xml_parser_spark.streaming.joins import (
        attribute_clicks_stream,
    )

    ev_rows = [
        (
            f"2024-01-01 {h:02d}:{m:02d}:00",
            "view" if i % 3 else "click",
            float(i),
            i % 5,
            i,
        )
        for i, (h, m) in enumerate(
            (h, m) for h in range(4) for m in (0, 20, 40)
        )
    ]
    ev = spark.createDataFrame(
        ev_rows, "ts_s string, event_type string, value double, "
        "user_id long, event_id long"
    ).select(
        F.col("ts_s").cast("timestamp").alias("ts"),
        "event_type", "value", "user_id", "event_id",
    )
    ev.write.mode("overwrite").parquet(f"{root}/live_events")
    ds = _docs(spark).select(
        "doc_id", "text", F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts")
    )
    ds = ds.withColumn("n_chars", F.length("text"))
    ds.write.mode("overwrite").parquet(f"{root}/live_docs")

    def src(path, schema):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )

    ev_schema = spark.read.parquet(f"{root}/live_events").schema
    doc_schema = spark.read.parquet(f"{root}/live_docs").schema

    pipelines = {
        "windowed_rollup": lambda: tumbling_counts(
            src(f"{root}/live_events", ev_schema)
        ),
        "minhash_dedup": lambda: dedup_stream_by_minhash(
            src(f"{root}/live_docs", doc_schema)
        ),
        "stream_join": lambda: attribute_clicks_stream(
            src(f"{root}/live_events", ev_schema).where(
                F.col("event_type") == "view"
            ),
            src(f"{root}/live_events", ev_schema).where(
                F.col("event_type") == "click"
            ),
        ),
        "drift_windowed_counts": lambda: windowed_counts(
            src(f"{root}/live_docs", doc_schema)
        ),
        "cusum_windowed_counts": lambda: windowed_event_counts(
            src(f"{root}/live_events", ev_schema)
        ),
        "hh_windowed_counts": lambda: windowed_key_counts(
            src(f"{root}/live_events", ev_schema)
        ),
    }
    plans: dict[str, str] = {}
    for i, (name, build) in enumerate(sorted(pipelines.items())):
        q = (
            build()
            .writeStream.format("noop")
            .option("checkpointLocation", f"{root}/live_cp_{i}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        plans[name] = q._jsq.explainInternal(False)
    return plans
