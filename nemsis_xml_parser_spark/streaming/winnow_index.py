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
   (``winnowing_fingerprints_arrow(max_df=None)`` — the numpy kernel
   twin, row-set-identical to the batch expression form by the
   tests/test_winnow.py parity pin, so stream == batch exactly);
2. cumulative document frequency per fingerprint = distinct docs over
   index ∪ batch — the batch twin's ``max_df`` guard evaluated on the
   prefix of the corpus seen so far, computed only for fingerprints
   PRESENT IN THE BATCH (the broadcast semi-restriction in
   ``candidates_against_fp_index`` — foreign fingerprints cannot join
   anyway).  The stop-list is therefore MONOTONE: once a fingerprint
   goes hot (boilerplate, license headers) it never generates another
   candidate; pairs already emitted under a colder corpus stand.  That
   is the streaming rendering of the batch guard — each batch applies
   exactly the guard the batch algorithm would apply to the
   corpus-so-far;
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

Scale: the index is append-only and only ever SCANNED per batch — the
broadcast semi-restriction keeps every shuffle, aggregate and cache at
microbatch size (``fp_groups``), and the monotone hot sidecar bounds
the per-gh posting lists by max_df + the trigger size, so no per-batch
cost grows with history except the file scan itself (which a cid/gh
bucketing or the cdc_index txlog compaction bounds on a long-lived
deployment).

Reference parity: none — §2.I streaming-dedup tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.winnow import (  # noqa: F401 (re-export)
    winnowing_fingerprints,
    winnowing_fingerprints_arrow,
)

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


def fp_groups(
    fps_batch: DataFrame, index: DataFrame, restrict: bool = True
) -> DataFrame:
    """(gh, bd, ad) per fingerprint present in the batch: the SET of
    batch doc_ids carrying it (``bd``) and the set of ALL doc_ids
    carrying it over index ∪ batch (``ad`` ⊇ ``bd``).

    Shuffle shape (r11 rework): the history side is first RESTRICTED to
    fingerprints present in the batch via a broadcast semi-join
    (``restrict=True``) — an index row whose gh is absent from the
    batch can affect neither the df guard (df is per-gh; foreign ghs
    only heat foreign ghs, which pair emission drops anyway) nor the
    pairs themselves.  The growing O(history) index is therefore only
    ever SCANNED (file read, broadcast-probed narrow) — never shuffled,
    never aggregated, never cached per batch.  ONE ``collect_set``
    aggregate (a single exchange on gh, map-side partials) then carries
    everything downstream consumers need: ``size(ad)`` IS the exact
    cumulative document frequency, and replay duplicates (a replayed
    batch whose rows already sit in the index) collapse inside the sets
    — the dup-immunity the old count_distinct formulation bought with
    two extra exchanges.  The batch's gh column is DEDUPLICATED before
    the broadcast (ADVICE r12 #4): the distinct's map-side partial
    collapses per-partition duplicates before its (tiny) exchange, so
    the broadcast payload is one long per DISTINCT fingerprint in the
    trigger — ≤ 8 B × distinct ghs, trigger-bounded, never history- or
    corpus-bounded, and immune to fingerprint-per-doc fan-out even at
    GB triggers.  Cost: one extra small exchange per batch (re-pinned
    in tools/plan_budgets_stream.json), bought back by the smaller
    driver collect + executor fan-out.

    Set-size bound: callers that maintain a monotone hot-fingerprint
    sidecar (the streams below) drop already-hot ghs from BOTH sides
    first, so ``ad`` is bounded by max_df + the trigger size — the
    aggregate never accumulates an unbounded boilerplate posting list
    even at cluster scale."""
    if restrict:
        index = index.join(
            F.broadcast(fps_batch.select("gh").distinct()), "gh", "left_semi"
        )
    tagged = index.select(
        "gh", "doc_id", F.lit(False).alias("is_batch")
    ).unionByName(
        fps_batch.select("gh", "doc_id", F.lit(True).alias("is_batch"))
    )
    return tagged.groupBy("gh").agg(
        F.collect_set(
            F.when(F.col("is_batch"), F.col("doc_id"))
        ).alias("bd"),
        F.collect_set("doc_id").alias("ad"),
    )


def pairs_from_groups(
    g: DataFrame, max_df: int | None = 50, min_shared: int = 3
) -> DataFrame:
    """(doc_a, doc_b, shared) from ``fp_groups`` output: guard on
    ``size(ad)`` (the exact cumulative df), explode batch-doc x all-doc
    per fingerprint, count fingerprints per pair.

    Per gh a pair is emitted exactly once — both-in-batch pairs keep
    only the ``da < db`` orientation, history partners appear under a
    single ``da`` — so a plain ``count(*)`` equals the old
    ``count_distinct(gh)`` score with one exchange instead of two."""
    if max_df is not None:
        g = g.where(F.size("ad") <= max_df)
    p = (
        g.where(F.size("bd") >= 1)
        .select("bd", F.explode("bd").alias("da"), "ad")
        .select("bd", "da", F.explode("ad").alias("db"))
        .where(
            (F.col("da") != F.col("db"))
            & (
                ~F.array_contains("bd", F.col("db"))
                | (F.col("da") < F.col("db"))
            )
        )
    )
    return (
        p.select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
    )


def candidates_against_fp_index(
    fps_batch: DataFrame,
    index: DataFrame,
    max_df: int | None = 50,
    min_shared: int = 3,
    restrict: bool = True,
) -> DataFrame:
    """(doc_a, doc_b, shared) candidate pairs touching the batch.

    ``fps_batch`` / ``index`` hold UNGUARDED (doc_id, gh) rows — the
    index WITHOUT this batch; the ``max_df`` guard is applied on the
    cumulative corpus (index ∪ batch), set-deduplicated so a replayed
    batch already present in the index does not double-count itself
    (module docstring).  Composition of :func:`fp_groups` +
    :func:`pairs_from_groups` — the streams call the two halves
    separately so the group frame can also feed the hot-sidecar append
    and the cdc dedup ratio."""
    return pairs_from_groups(
        fp_groups(fps_batch, index, restrict=restrict),
        max_df=max_df,
        min_shared=min_shared,
    )


def read_hot_fps(
    spark: SparkSession, index_root: str, exclude_batch: int | None = None
) -> DataFrame | None:
    """The monotone hot-fingerprint sidecar: every gh whose cumulative
    df has ever crossed max_df, one tiny ``hot/batch=N`` dir per batch
    that detected new crossings (batches with none write NOTHING, so a
    corpus without boilerplate pays zero for the mechanism — returns
    None and the caller skips the anti-joins and their broadcast job).
    ``exclude_batch`` skips the CURRENT batch's own dir so a replayed
    batch re-detects (and re-writes) its own crossings instead of
    having them pre-dropped — the overwrite stays bit-identical."""
    import os

    root = os.path.join(index_root, "hot")
    dirs: list[str] = []
    if os.path.isdir(root):
        for d in sorted(os.listdir(root)):
            if d.startswith("batch=") and d != f"batch={exclude_batch}":
                dirs.append(os.path.join(root, d))
    if not dirs:
        return None
    return spark.read.schema("gh long").parquet(*dirs)


def write_hot_fps(index_root: str, batch_id: int, ghs: list[int]) -> None:
    """Append this batch's newly-hot ghs to the sidecar — driver-side
    pyarrow write (the list is tiny by construction: ghs crossing the
    df threshold in one batch), atomic via tmp + rename so concurrent
    readers of other batches never see a torn file.  Nothing is written
    when the list is empty, keeping the no-boilerplate fast path free.
    Replay-safe: the list is a deterministic function of the batch and
    the index-so-far, so a replayed batch rewrites identical bytes."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if not ghs:
        return
    d = os.path.join(index_root, "hot", f"batch={batch_id}")
    os.makedirs(d, exist_ok=True)
    # clear foreign files (stale Spark-named part-* from an older writer
    # version, or a crashed tmp) so the fixed-name rename below leaves
    # exactly one readable file for the glob scan
    for f in os.listdir(d):
        if f != "part-0.parquet":
            os.remove(os.path.join(d, f))
    tmp = os.path.join(d, ".part-0.parquet.tmp")
    pq.write_table(
        pa.table({"gh": pa.array(sorted(ghs), pa.int64())}), tmp
    )
    os.replace(tmp, os.path.join(d, "part-0.parquet"))


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
    batch_shuffle_partitions: int | None = 4,
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
                ("spark.sql.files.minPartitionNum", 4),
                ("spark.sql.adaptive.enabled", "false"),
            ):
                prev[key] = spark.conf.get(key, None)
                spark.conf.set(key, str(val))
        try:
            # ONE repartition before the Arrow kernel (the dedup_index
            # r13 shape): fingerprint selection is the batch's CPU, so
            # the kernel stage must run wider than maxFilesPerTrigger's
            # 1-2 scan partitions; the exchange moves only raw text.
            # The kernel dedups per doc internally (no window, no
            # distinct), so the r11 exchange-reuse bracketing is moot —
            # the persisted frame keeps the kernel width and the
            # batch=N index dirs stay small-file-bounded.
            fps = winnowing_fingerprints_arrow(
                batch_df.repartition(8), k=k, w=w, max_df=None,
                id_col=id_col, text_col=text_col,
            ).persist()
            index = read_fp_index(spark, index_root)
            # r11: no union cache, no per-batch df aggregate over the
            # full history.  The history scan is restricted to batch ghs
            # (broadcast semi inside fp_groups), already-hot ghs are
            # dropped from both sides via the tiny monotone hot sidecar
            # (bounding the collect_set posting lists by max_df + the
            # trigger size), and ONE group aggregate feeds both the pair
            # emission and the newly-hot append.
            fps_g = fps
            hot_prior = (
                read_hot_fps(spark, index_root, exclude_batch=batch_id)
                if max_df is not None
                else None
            )
            if hot_prior is not None:
                b = F.broadcast(hot_prior)
                index = index.join(b, "gh", "left_anti")
                fps_g = fps.join(b, "gh", "left_anti")
            g = fp_groups(fps_g, index)
            obs = None
            if max_df is not None:
                # the newly-hot gh list rides the pairs job as an
                # observe() metric on the UNFILTERED group frame (the
                # frame's only consumer, so no persist and no second
                # job) — ghs whose cumulative df crossed max_df THIS
                # batch; monotone, so each gh lands in exactly one hot
                # dir, and a replay recomputes the identical list (its
                # own dir was excluded from hot_prior above)
                from pyspark.sql import Observation

                obs = Observation(f"winnow_hot_{batch_id}")
                g = g.observe(
                    obs,
                    F.collect_list(
                        F.when(F.size("ad") > max_df, F.col("gh"))
                    ).alias("newly_hot"),
                )
            pairs = pairs_from_groups(
                g, max_df=max_df, min_shared=min_shared
            )
            pairs.write.mode("overwrite").parquet(
                f"{out_root}/batch={batch_id}"
            )
            if obs is not None:
                write_hot_fps(
                    index_root, batch_id, list(obs.get["newly_hot"])
                )
            fps.write.mode("overwrite").parquet(
                f"{index_root}/batch={batch_id}"
            )
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
