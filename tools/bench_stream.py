"""Streaming microbatch throughput bench (SCALING.md streaming tier).

Measures the three streaming flagships end-to-end with the file source
split into many microbatches (``maxFilesPerTrigger``), draining with
``trigger(availableNow=True)`` into the noop sink:

* ``windowed_rollup``  — watermarked tumbling count/sum per event_type
  (streaming/events.py:tumbling_counts) over the events table;
* ``minhash_dedup``    — streaming MinHash near-dup drop with
  watermark-bounded signature state
  (streaming/events.py:dedup_stream_by_minhash) over documents;
* ``stream_join``      — watermarked stream-stream interval join
  (streaming/joins.py:attribute_clicks_stream), views x clicks.

Per pipeline it reports rows/s (total source rows / wall-clock to drain),
microbatch count, and the peak state-store row count from the progress
metrics — the number that decides whether the watermark actually bounds
memory.  Prints ONE JSON line; numbers are recorded in SCALING.md.

Usage: python tools/bench_stream.py [sf_dir] [--out FILE]
(default sf dir /root/testdata/sf0.1; --out also writes the JSON line to
FILE — each round records BENCH_stream_r{N}.json at the repo root so
microbatch throughput is diffable across rounds like the batch bench)
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from nemsis_xml_parser_spark.plans.registry import table  # noqa: E402
from nemsis_xml_parser_spark.session import get_spark  # noqa: E402

import os

# env-tunable so the same bench sweeps microbatch sizes: fewer, fatter
# batches stress per-batch fixed costs (sink txn overhead, state commit),
# many small ones stress scheduling — both matter at cluster scale
N_SOURCE_FILES = int(os.environ.get("STREAM_BENCH_SOURCE_FILES", "16"))
FILES_PER_TRIGGER = int(
    os.environ.get("STREAM_BENCH_FILES_PER_TRIGGER", "2")
)  # default -> ~8 microbatches per run
DOC_COPIES = int(os.environ.get("STREAM_BENCH_DOC_COPIES", "10"))


def _drain(stream_df, checkpoint: str) -> dict:
    """Run to completion on the noop sink; return progress rollup."""
    q = (
        stream_df.writeStream.format("noop")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    t0 = time.time()
    q.awaitTermination()
    wall = time.time() - t0
    rows = 0
    batches = 0
    peak_state = 0
    for p in q.recentProgress:
        rows += p["numInputRows"]
        batches += 1
        for so in p.get("stateOperators") or []:
            peak_state = max(peak_state, so.get("numRowsTotal", 0))
    return {
        "rows": rows,
        "batches": batches,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
        "peak_state_rows": peak_state,
    }


def main() -> None:
    args = sys.argv[1:]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    spark = get_spark("bench-stream")
    work = Path(tempfile.mkdtemp(prefix="bench_stream_"))
    out: dict[str, dict] = {}
    try:
        # stage sources as many-file parquet so the file source yields
        # multiple microbatches (the shape a real drop-directory produces)
        ev_dir, doc_dir = str(work / "events"), str(work / "docs")
        (
            table(spark, sf_dir, "events")
            # watermarks need TIMESTAMP (LTZ); session tz is pinned UTC so
            # the NTZ->LTZ cast is the identity
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .repartition(N_SOURCE_FILES)
            .write.parquet(ev_dir)
        )
        n_docs = table(spark, sf_dir, "documents").count()
        (
            table(spark, sf_dir, "documents")
            # replicate the corpus DOC_COPIES x with per-copy text variation
            # (unique signatures) so the dedup tier streams enough rows to
            # measure per-row cost, not the tiny-corpus per-batch floor —
            # the events tiers stream 100k+ for the same reason
            .crossJoin(
                spark.range(DOC_COPIES).select(F.col("id").alias("__copy"))
            )
            .select(
                (F.col("doc_id") + F.col("__copy") * n_docs).alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.col("text"),
                    F.concat(F.lit("copyvariant"), F.col("__copy")),
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            # synthesize an arrival timestamp: one doc per second
            .withColumn(
                "ts",
                F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id")),
            )
            .repartition(N_SOURCE_FILES)
            .write.parquet(doc_dir)
        )
        ev_schema = spark.read.parquet(ev_dir).schema
        doc_schema = spark.read.parquet(doc_dir).schema

        def source(path, schema):
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
                .parquet(path)
            )

        from nemsis_xml_parser_spark.streaming.events import (
            dedup_stream_by_minhash,
            tumbling_counts,
        )
        from nemsis_xml_parser_spark.streaming.joins import attribute_clicks_stream

        out["windowed_rollup"] = _drain(
            tumbling_counts(source(ev_dir, ev_schema)), str(work / "cp1")
        )
        out["minhash_dedup"] = _drain(
            dedup_stream_by_minhash(source(doc_dir, doc_schema)),
            str(work / "cp2"),
        )
        views = source(ev_dir, ev_schema).where(F.col("event_type") == "view")
        clicks = source(ev_dir, ev_schema).where(F.col("event_type") == "click")
        out["stream_join"] = _drain(
            attribute_clicks_stream(views, clicks), str(work / "cp3")
        )

        from nemsis_xml_parser_spark.streaming.drift import windowed_counts

        out["drift_histogram"] = _drain(
            windowed_counts(source(doc_dir, doc_schema)), str(work / "cp4")
        )

        from nemsis_xml_parser_spark.streaming.changepoint import (
            windowed_event_counts,
        )

        out["cusum_counts"] = _drain(
            windowed_event_counts(
                source(ev_dir, ev_schema), window="1 hour", watermark="2 hours"
            ),
            str(work / "cp5"),
        )

        from nemsis_xml_parser_spark.streaming.heavyhitters import (
            windowed_key_counts,
        )

        out["heavy_hitter_counts"] = _drain(
            windowed_key_counts(
                source(ev_dir, ev_schema), window="1 hour", watermark="2 hours"
            ),
            str(work / "cp6"),
        )

        # exactly-once JDBC sink (streaming/sink.py): events stream into a
        # live DuckDB warehouse through the transactional batch-id ledger
        from nemsis_xml_parser_spark.operators.dbapi import DuckTxnConnection
        from nemsis_xml_parser_spark.streaming.sink import (
            stream_to_jdbc_exactly_once,
        )

        db_path = str(work / "sink_wh.db")
        q = stream_to_jdbc_exactly_once(
            source(ev_dir, ev_schema).select("event_id", "event_type"),
            lambda: DuckTxnConnection(db_path),
            "events_wh",
            ["event_id", "event_type"],
            sink_id="bench",
            checkpoint=str(work / "cp7"),
            create_sql='CREATE TABLE IF NOT EXISTS "events_wh" '
            '("event_id" BIGINT, "event_type" TEXT);',
        )
        t0 = time.time()
        q.processAllAvailable()
        q.stop()
        wall = time.time() - t0
        rows = sum(p["numInputRows"] for p in q.recentProgress)
        out["exactly_once_jdbc_sink"] = {
            "rows": rows,
            "batches": sum(1 for _ in q.recentProgress),
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
            "peak_state_rows": 0,  # stateless sink; dedup state is the DB ledger
        }

        # distributed exactly-once sink: per-partition executor staging +
        # one driver promote txn (streaming/sink.py, VERDICT r6 nit #1 fix)
        from nemsis_xml_parser_spark.streaming.sink import (
            duckdb_distributed_hooks,
            stream_to_jdbc_exactly_once_distributed,
        )

        db2 = str(work / "sink_wh_dist.db")
        q = stream_to_jdbc_exactly_once_distributed(
            source(ev_dir, ev_schema).select("event_id", "event_type"),
            str(work / "cp8"),
            table="events_wh",
            columns=["event_id", "event_type"],
            sink_id="bench",
            create_sql='CREATE TABLE IF NOT EXISTS "events_wh" '
            '("event_id" BIGINT, "event_type" TEXT);',
            column_types={"event_id": "BIGINT", "event_type": "TEXT"},
            **duckdb_distributed_hooks(
                db2, str(work / "stg"), "events_wh", "bench"
            ),
        )
        t0 = time.time()
        q.processAllAvailable()
        q.stop()
        wall = time.time() - t0
        rows = sum(p["numInputRows"] for p in q.recentProgress)
        out["exactly_once_jdbc_sink_distributed"] = {
            "rows": rows,
            "batches": sum(1 for _ in q.recentProgress),
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
            "peak_state_rows": 0,
        }
        # incremental CC maintenance (streaming/components.py): identity-
        # stitching edges (user_id ↔ synthetic device id) fold into the
        # txlog-versioned label store per microbatch; rows/s is edge
        # throughput including the per-batch root-graph CC solve and the
        # store version commit
        from nemsis_xml_parser_spark.streaming.components import (
            read_state,
            start_components_maintenance,
        )

        edges = source(ev_dir, ev_schema).select(
            F.col("user_id").alias("src"),
            (F.col("event_id") % 4096 + 1_000_000).alias("dst"),
        )
        q = start_components_maintenance(
            edges, str(work / "cc_state"), str(work / "cp9")
        )
        t0 = time.time()
        q.awaitTermination()
        wall = time.time() - t0
        # numInputRows double-counts foreachBatch's multi-branch source
        # re-scans; the true edge count is the staged source's row count
        rows = spark.read.parquet(ev_dir).count()
        out["cc_maintenance"] = {
            "rows": rows,
            "batches": sum(1 for _ in q.recentProgress),
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
            "peak_state_rows": read_state(
                spark, str(work / "cc_state")
            ).count(),  # label-store rows, the state this op actually keeps
        }
        # incremental MSF maintenance (streaming/msf.py): forest ∪ batch
        # re-solved per microbatch via the sparsification identity; state
        # is the forest (O(nodes)), metric includes the Borůvka solve +
        # txlog commit
        from nemsis_xml_parser_spark.streaming.msf import (
            read_forest,
            start_msf_maintenance,
        )

        wedges = source(ev_dir, ev_schema).select(
            F.col("user_id").alias("u"),
            (F.col("event_id") % 4096 + 1_000_000).alias("v"),
            (F.col("event_id") % 97 + 1).alias("w"),
        )
        q = start_msf_maintenance(
            wedges, str(work / "msf_state"), str(work / "cp11")
        )
        t0 = time.time()
        q.awaitTermination()
        wall = time.time() - t0
        rows = spark.read.parquet(ev_dir).count()
        out["msf_maintenance"] = {
            "rows": rows,
            "batches": sum(1 for _ in q.recentProgress),
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
            "peak_state_rows": read_forest(
                spark, str(work / "msf_state")
            ).count(),  # forest edges — the O(nodes) state bound
        }

        # historical near-dup index (streaming/dedup_index.py): per batch
        # band + join vs the append-only LSH bucket index + batch-keyed
        # overwrite commits; rows/s includes candidate emission
        from nemsis_xml_parser_spark.streaming.dedup_index import (
            read_candidate_pairs,
            start_dedup_index_stream,
        )

        q = start_dedup_index_stream(
            source(doc_dir, doc_schema),
            str(work / "ndidx"),
            str(work / "ndpairs"),
            str(work / "cp10"),
        )
        t0 = time.time()
        q.awaitTermination()
        wall = time.time() - t0
        rows = spark.read.parquet(doc_dir).count()
        out["dedup_history_index"] = {
            "rows": rows,
            "batches": sum(1 for _ in q.recentProgress),
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
            "peak_state_rows": spark.read.parquet(
                str(work / "ndidx") + "/batch=*"
            ).count(),  # index keys = the state this op actually keeps
            "candidate_pairs": read_candidate_pairs(
                spark, str(work / "ndpairs")
            ).count(),
        }

        # historical winnowing index (streaming/winnow_index.py): per
        # batch fingerprint + cumulative-df stop-list + join vs the
        # append-only fingerprint index; rows/s includes pair emission
        from nemsis_xml_parser_spark.streaming.winnow_index import (
            read_winnow_pairs,
            start_winnow_index_stream,
        )

        q = start_winnow_index_stream(
            source(doc_dir, doc_schema),
            str(work / "wnidx"),
            str(work / "wnpairs"),
            str(work / "cp12"),
        )
        t0 = time.time()
        q.awaitTermination()
        wall = time.time() - t0
        rows = spark.read.parquet(doc_dir).count()
        out["winnow_history_index"] = {
            "rows": rows,
            "batches": sum(1 for _ in q.recentProgress),
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
            "peak_state_rows": spark.read.parquet(
                str(work / "wnidx") + "/batch=*"
            ).count(),
            "candidate_pairs": read_winnow_pairs(
                spark, str(work / "wnpairs")
            ).count(),
        }

        # historical CDC chunk index (streaming/cdc_index.py): per batch
        # chunk + dedup-ratio + join vs the append-only chunk index
        from nemsis_xml_parser_spark.streaming.cdc_index import (
            read_cdc_pairs,
            read_chunk_index,
            read_dedup_ratios,
            start_cdc_index_stream,
        )

        q = start_cdc_index_stream(
            source(doc_dir, doc_schema),
            str(work / "cdcidx"),
            str(work / "cdcpairs"),
            str(work / "cp13"),
        )
        t0 = time.time()
        q.awaitTermination()
        wall = time.time() - t0
        rows = spark.read.parquet(doc_dir).count()
        ratios = read_dedup_ratios(spark, str(work / "cdcpairs")).collect()
        tot = sum(r.total_chunks for r in ratios)
        dup = sum(r.duplicate_chunks for r in ratios)
        out["cdc_history_index"] = {
            "rows": rows,
            "batches": sum(1 for _ in q.recentProgress),
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
            # compaction-aware: batch dirs fold into the txlog table
            "peak_state_rows": read_chunk_index(
                spark, str(work / "cdcidx")
            ).count(),
            "candidate_pairs": read_cdc_pairs(
                spark, str(work / "cdcpairs")
            ).count(),
            "corpus_dedup_ratio": round(dup / tot, 4) if tot else None,
        }
        # streaming KMV distinct-count (streaming/kmv.py): bounded
        # min-k sketch state folded per batch through the txlog store;
        # per-batch estimate rows out
        from nemsis_xml_parser_spark.streaming.kmv import (
            read_kmv_estimates,
            read_kmv_state,
            start_kmv_stream,
        )

        q = start_kmv_stream(
            source(ev_dir, ev_schema),
            str(work / "kmvstate"),
            str(work / "kmvest"),
            str(work / "cp14"),
            key_col="user_id",
            group_col="event_type",
        )
        t0 = time.time()
        q.awaitTermination()
        wall = time.time() - t0
        rows = spark.read.parquet(ev_dir).count()
        out["kmv_distinct_maintenance"] = {
            "rows": rows,
            "batches": sum(1 for _ in q.recentProgress),
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
            "peak_state_rows": read_kmv_state(
                spark, str(work / "kmvstate")
            ).count(),
            "estimate_rows": read_kmv_estimates(
                spark, str(work / "kmvest")
            ).count(),
        }
        # streaming HLL distinct-count (streaming/hll.py): 64-register
        # max-merge state folded per batch through the txlog store —
        # the second mergeable-sketch instantiation of the kmv template
        from nemsis_xml_parser_spark.streaming.hll import (
            read_hll_estimates,
            read_hll_state,
            start_hll_stream,
        )

        q = start_hll_stream(
            source(ev_dir, ev_schema),
            str(work / "hllstate"),
            str(work / "hllest"),
            str(work / "cp15"),
            key_col="user_id",
            group_col="event_type",
        )
        t0 = time.time()
        q.awaitTermination()
        wall = time.time() - t0
        rows = spark.read.parquet(ev_dir).count()
        out["hll_distinct_maintenance"] = {
            "rows": rows,
            "batches": sum(1 for _ in q.recentProgress),
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
            "peak_state_rows": read_hll_state(
                spark, str(work / "hllstate")
            ).count(),
            "estimate_rows": read_hll_estimates(
                spark, str(work / "hllest")
            ).count(),
        }
        # streaming Count-Min (streaming/countmin.py): cell-wise-SUM
        # deltas batch-keyed (overwrite = replay-idempotent), watermark
        # compaction — the third algebraic sketch class after min-k/max
        from nemsis_xml_parser_spark.streaming.countmin import (
            read_cm_cells,
            read_cm_estimates,
            start_countmin_stream,
        )

        q = start_countmin_stream(
            source(ev_dir, ev_schema),
            str(work / "cmstate"),
            str(work / "cmest"),
            str(work / "cp16"),
            key_col="user_id",
        )
        t0 = time.time()
        q.awaitTermination()
        wall = time.time() - t0
        rows = spark.read.parquet(ev_dir).count()
        out["countmin_maintenance"] = {
            "rows": rows,
            "batches": sum(1 for _ in q.recentProgress),
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
            "peak_state_rows": read_cm_cells(
                spark, str(work / "cmstate")
            ).count(),
            "estimate_rows": read_cm_estimates(
                spark, str(work / "cmest")
            ).count(),
        }
        # streaming IVF index maintenance (streaming/ivf_index.py):
        # train-once centroids, per-batch cell assignment appended
        # batch-keyed + cid-partitioned, txlog compaction — the ANN
        # index's incremental-upsert twin (18th pipeline, r11)
        from nemsis_xml_parser_spark.streaming.ivf_index import (
            read_ivf_cells,
            start_ivf_index_stream,
        )

        vec_dir = str(work / "vecs")
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        n_vec = emb.count()
        (
            # replicate the corpus 25x with distinct ids (same per-row
            # assignment cost) so the pipeline streams enough rows to
            # measure per-row throughput, not the per-batch job floor —
            # the same posture as the doc-replication above
            emb.crossJoin(
                spark.range(25).select(F.col("id").alias("__copy"))
            )
            .select(
                (F.col("vec_id") + F.col("__copy") * n_vec).alias("vec_id"),
                "embedding",
            )
            .repartition(N_SOURCE_FILES)
            .write.parquet(vec_dir)
        )
        vec_schema = spark.read.parquet(vec_dir).schema
        q = start_ivf_index_stream(
            source(vec_dir, vec_schema),
            str(work / "ivfidx"),
            str(work / "cp17"),
        )
        t0 = time.time()
        q.awaitTermination()
        wall = time.time() - t0
        rows = spark.read.parquet(vec_dir).count()
        out["ivf_index_maintenance"] = {
            "rows": rows,
            "batches": sum(1 for _ in q.recentProgress),
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
            "peak_state_rows": read_ivf_cells(
                spark, str(work / "ivfidx")
            ).count(),
        }

        # streaming NSW graph-index maintenance (streaming/nsw_index.py):
        # per batch NSW insertion edges vs the cid-pruned history +
        # batch-keyed edge/cell writes; rows/s includes edge selection
        from nemsis_xml_parser_spark.streaming.nsw_index import (
            read_nsw_edges,
            start_nsw_index_stream,
        )

        # NSW runs on DOUBLE-width triggers (r13, the VERDICT-sanctioned
        # lever): a graph insert pays a beam search per batch, so the
        # deployment posture is fewer, fatter triggers — 4 files/trigger
        # vs the shared default 2.  compact_every=2 keeps one mid-stream
        # compaction inside the measured window (compaction now runs at
        # the START of the batch after the fold window's commit, so the
        # old default would never fire in a 4-batch drain).
        nsw_src = (
            spark.readStream.schema(vec_schema)
            .option("maxFilesPerTrigger", 2 * FILES_PER_TRIGGER)
            .parquet(vec_dir)
        )
        q = start_nsw_index_stream(
            nsw_src,
            str(work / "nswidx"),
            str(work / "cp18"),
            compact_every=2,
        )
        t0 = time.time()
        q.awaitTermination()
        wall = time.time() - t0
        out["nsw_index_maintenance"] = {
            "rows": rows,
            "batches": sum(1 for _ in q.recentProgress),
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
            "peak_state_rows": read_nsw_edges(
                spark, str(work / "nswidx")
            ).count(),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    line = json.dumps({"metric": "stream_microbatch_throughput",
                       "sf_dir": sf_dir, "pipelines": out})
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
