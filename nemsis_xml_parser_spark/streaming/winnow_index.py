"""Streaming winnowing dedup against the FULL historical corpus — a
persisted fingerprint index maintained per microbatch, with the batch
twin's document-frequency stop-guard made STATEFUL.

``streaming/dedup_index.py`` answers "near-dup of anything ever seen?"
with MinHash-LSH band keys; this module is the same history-index
pattern for winnowing fingerprints (``operators/winnow.py`` — the
SIGMOD'03 MOSS selection), whose locality guarantee (any shared run of
>= w + k - 1 words shares a fingerprint) LSH sketches cannot give.

Per batch:

1. select the batch's UNGUARDED per-doc fingerprints
   (``winnowing_fingerprints(max_df=None)`` — the same expression tree
   as the batch twin, so stream == batch byte-identically);
2. cumulative document frequency per fingerprint = distinct docs over
   index ∪ batch — the batch twin's ``max_df`` guard evaluated on the
   prefix of the corpus seen so far.  The stop-list is therefore
   MONOTONE: once a fingerprint goes hot (boilerplate, license
   headers) it never generates another candidate; pairs already
   emitted under a colder corpus stand.  That is the streaming
   rendering of the batch guard — each batch applies exactly the
   guard the batch algorithm would apply to the corpus-so-far;
3. candidate pairs touching the batch = guarded batch fingerprints ⋈
   guarded (index ∪ batch) on the fingerprint, canonicalized
   (doc_a < doc_b), scored by the number of DISTINCT shared
   fingerprints, kept at ``min_shared`` — the batch pair semantics,
   restricted to pairs touching this batch;
4. write pairs to ``{out_root}/batch={id}`` and the batch's unguarded
   fingerprints to ``{index_root}/batch={id}``, both OVERWRITE.

Exactly-once without a ledger, the ``dedup_index`` argument verbatim:
both writes are batch-keyed so a replayed batch overwrites its own
outputs, the df count is over DISTINCT (doc, fingerprint) so a batch
already folded into the index does not double-count itself, and the
pair join against index ∪ batch (distinct) is replay-stable.

Scale: the index is append-only and the per-batch join shuffles only
fingerprint-keyed rows; the df aggregate is a hash agg over the index
scan the join reads anyway.  A long-lived deployment would compact the
per-batch df contributions into a versioned (fingerprint, df) table
(the txlog store pattern) instead of re-aggregating the scan; at bench
horizons the scan is the cheaper and simpler posture.

Reference parity: none — §2.I streaming-dedup tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.winnow import winnowing_fingerprints

FP_SCHEMA = "doc_id long, gh long"


def read_fp_index(spark: SparkSession, index_root: str) -> DataFrame:
    """All committed (doc_id, gh) fingerprints (empty frame if none)."""
    try:
        return spark.read.schema(FP_SCHEMA).parquet(f"{index_root}/batch=*")
    except AnalysisException as e:
        # only "path does not exist" (first batch) is expected; any other
        # AnalysisException (schema/metadata corruption) must propagate so
        # the microbatch retries instead of silently dropping the entire
        # history from the candidate join
        if _is_missing_path(e):
            return spark.createDataFrame([], FP_SCHEMA)
        raise


def _is_missing_path(e: AnalysisException) -> bool:
    cls = None
    try:
        cls = e.getCondition()  # Spark 4 name for getErrorClass
    except Exception:
        pass
    if cls is not None and "PATH_NOT_FOUND" in cls:
        return True
    return "Path does not exist" in str(e)


def candidates_against_fp_index(
    fps_batch: DataFrame,
    index: DataFrame,
    max_df: int | None = 50,
    min_shared: int = 3,
    is_union: bool = False,
) -> DataFrame:
    """(doc_a, doc_b, shared) candidate pairs touching the batch.

    ``fps_batch`` / ``index`` hold UNGUARDED (doc_id, gh) rows; the
    ``max_df`` guard is applied here on the cumulative corpus (index ∪
    batch), distinct-counted so a replayed batch already present in the
    index does not double-count itself (module docstring).

    Shuffle shape (r10 rework): no materialized distinct of the union
    anywhere — the df guard is ONE ``count_distinct(doc_id)`` aggregate
    (identical stop-list: per-doc fingerprints are already distinct and
    a replayed batch's docs collapse in the distinct count), and
    duplicate (doc, gh) rows on the candidate side are harmless because
    the pair score is ``count_distinct(gh)``.  No planning-time
    broadcast hints: the hot list and the batch side are small, and AQE
    converts those joins to broadcasts at RUNTIME inside one job chain —
    a literal ``F.broadcast`` here was measured SLOWER (it forces the
    hot aggregate to materialize as its own job before the probe can
    even start).

    ``is_union=True`` means ``index`` already IS index ∪ batch (the
    stream passes the cached union so the growing index is scanned once
    per batch, not once for the guard and again for the join)."""
    all_fps = index if is_union else index.unionByName(fps_batch)
    if max_df is not None:
        hot = (
            all_fps.groupBy("gh")
            .agg(F.count_distinct("doc_id").alias("df"))
            .where(F.col("df") > max_df)
            .select("gh")
        )
        all_fps = all_fps.join(hot, "gh", "left_anti")
        fps_batch = fps_batch.join(hot, "gh", "left_anti")
    a = fps_batch.select(F.col("doc_id").alias("da"), "gh")
    b = all_fps.select(F.col("doc_id").alias("db"), "gh")
    return (
        a.join(b, "gh")
        .where(F.col("da") != F.col("db"))
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            "gh",
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count_distinct("gh").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )


def start_winnow_index_stream(
    docs_stream: DataFrame,
    index_root: str,
    out_root: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    max_df: int | None = 50,
    min_shared: int = 3,
    available_now: bool = True,
    batch_shuffle_partitions: int | None = 8,
) -> StreamingQuery:
    """foreachBatch loop: fingerprint → guard → candidates vs index →
    batch-keyed OVERWRITE writes (module docstring's exactly-once
    argument).

    ``batch_shuffle_partitions``: shuffle width for the per-batch jobs.
    A microbatch is trigger-bounded and MB-scale, but the session
    default (sized for full-table batch queries) makes every one of the
    ~6 sequential stages per batch launch 32-64 near-empty tasks —
    measured as the DOMINANT cost of this pipeline (task scheduling,
    not data).  AQE's partition coalescing does not close it because
    ``parallelismFirst`` (Spark's default) keeps post-shuffle width at
    defaultParallelism.  The override is scoped to the batch body and
    restored after; pass None to keep the session default (e.g. when a
    single trigger can carry GBs on a real cluster)."""
    spark = docs_stream.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch hands over a DataFrame bound to the streaming
        # query's CLONED session (Structured Streaming runs every query
        # on sparkSession.cloneSession()), so the conf overrides below
        # land on the clone and CANNOT race a concurrent stream or
        # batch query on the shared outer session (probe-verified:
        # setting shuffle.partitions here leaves the outer session
        # untouched).  All batch-body reads plan under this session so
        # the overrides actually apply to them.
        spark = batch_df.sparkSession
        prev: dict[str, str | None] = {}
        if batch_shuffle_partitions is not None:
            # minPartitionNum floors every file scan at defaultParallelism
            # tasks — the accumulated MB-scale index files otherwise fan
            # out to 32 near-empty scan tasks per batch, same cost class
            # as the shuffle width (docstring)
            # AQE off for the batch body: every partition count is
            # hand-set here, so AQE's stage-by-stage re-optimization only
            # adds a scheduling pause per shuffle (measured ~15% of batch
            # wall); restored with the rest
            for key, val in (
                ("spark.sql.shuffle.partitions", batch_shuffle_partitions),
                ("spark.sql.files.minPartitionNum", 1),
                ("spark.sql.adaptive.enabled", "false"),
            ):
                prev[key] = spark.conf.get(key, None)
                spark.conf.set(key, str(val))
        # The file source hands the batch over in maxFilesPerTrigger
        # partitions, so the COMPUTE-heavy stage (ngram explode + per-char
        # rolling hash, the pipeline's real CPU) would run ~2-wide on a
        # 32-core executor pool: repartition the raw docs to full width
        # first (a ~MB shuffle), narrow everything after.
        batch_df = batch_df.repartition(
            spark.sparkContext.defaultParallelism
        )
        try:
            # 4-way persisted frame: a microbatch's fingerprints are
            # MB-scale, but left at the session's 32 shuffle partitions
            # every downstream stage (union scan, df aggregate, candidate
            # join) launches 32-64 near-empty tasks — measured ~4 s/batch
            # of pure task overhead against even a one-batch index.
            # Narrow frames in, narrow index files out (the batch=N dirs
            # hold 4 small files the next batch's scan bin-packs).
            # repartition, not coalesce (the dedup_index/cdc_index note):
            # winnowing's window exchange protects the k-gram hash stage,
            # but the explicit tiny shuffle keeps every pre-persist stage
            # at batch width regardless of where exchanges sit
            fps = winnowing_fingerprints(
                batch_df, k=k, w=w, max_df=None,
                id_col=id_col, text_col=text_col,
            ).repartition(4).persist()
            index = read_fp_index(spark, index_root)
            # cache the union for the batch: the df guard and the
            # candidate join both consume it, and without the cache the
            # GROWING index would be scanned twice per batch
            all_fps = index.unionByName(fps).persist()
            pairs = candidates_against_fp_index(
                fps, all_fps, max_df=max_df, min_shared=min_shared,
                is_union=True,
            )
            pairs.write.mode("overwrite").parquet(
                f"{out_root}/batch={batch_id}"
            )
            fps.write.mode("overwrite").parquet(
                f"{index_root}/batch={batch_id}"
            )
            all_fps.unpersist()
            fps.unpersist()
        finally:
            for key, val in prev.items():
                if val is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, val)

    writer = docs_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_winnow_pairs(spark: SparkSession, out_root: str) -> DataFrame:
    return spark.read.schema(
        "doc_a long, doc_b long, shared long"
    ).parquet(f"{out_root}/batch=*").distinct()
