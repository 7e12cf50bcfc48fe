"""Historical CDC chunk index stream: fold parity vs a batch chunk-pair
computation, replay stability of the dedup-ratio rows, e2e drain."""

from __future__ import annotations

import pyspark.sql.functions as F

from nemsis_xml_parser_spark.operators.cdc import cdc_chunks
from nemsis_xml_parser_spark.streaming.cdc_index import (
    candidates_against_fp_index,
    read_cdc_pairs,
    read_chunk_index,
    read_dedup_ratios,
    start_cdc_index_stream,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the curation "
    "pipeline chunks every document into content defined pieces that "
    "resynchronize after any local edit because boundaries depend only "
    "on nearby bytes and never on absolute offsets in the stream"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus(k: int):
    rows = []
    for i in range(k):
        t = BASE
        if i % 3 == 1:
            t = t.replace("quick brown", "quick shiny brown", 1)
        if i % 3 == 2:
            t = "a totally different preamble here " + t
        rows.append((i, t))
    return rows


def _batch_pairs(spark, rows, min_shared):
    """Batch twin: chunk-sharing pairs over the full corpus."""
    ch = cdc_chunks(_docs(spark, rows)).select(
        "doc_id", F.col("chunk_hash").alias("gh")
    ).distinct()
    a = ch.select(F.col("doc_id").alias("da"), "gh")
    b = ch.select(F.col("doc_id").alias("db"), "gh")
    return {
        (r.doc_a, r.doc_b, r.shared)
        for r in (
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
        ).collect()
    }


def test_fold_matches_batch_pairs(spark, tmp_path):
    rows = _corpus(9)
    batches = [rows[0:3], rows[3:6], rows[6:9]]
    index = read_chunk_index(spark, str(tmp_path / "idx"))
    got = set()
    for b in batches:
        fps = cdc_chunks(_docs(spark, b)).select(
            "doc_id", F.col("chunk_hash").alias("gh")
        )
        pairs = candidates_against_fp_index(
            fps, index, max_df=None, min_shared=2
        )
        got |= {(r.doc_a, r.doc_b, r.shared) for r in pairs.collect()}
        index = index.unionByName(fps)
    assert got == _batch_pairs(spark, rows, min_shared=2)
    assert got  # the shared-template corpus must produce pairs


def test_streaming_e2e_ratio_and_replay(spark, tmp_path):
    rows = _corpus(6)
    src = tmp_path / "docs"
    for i, chunk in enumerate([rows[0:3], rows[3:6]]):
        _docs(spark, chunk).coalesce(1).write.mode("overwrite").parquet(
            str(src / f"f{i}")
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "f*"))
    )
    q = start_cdc_index_stream(
        stream,
        str(tmp_path / "idx"),
        str(tmp_path / "pairs"),
        str(tmp_path / "cp"),
        max_df=None,
    )
    q.awaitTermination()
    ratios = {
        r.batch_id: (r.total_chunks, r.duplicate_chunks)
        for r in read_dedup_ratios(spark, str(tmp_path / "pairs")).collect()
    }
    assert set(ratios) == {0, 1}
    # batch 1 repeats batch 0's three template variants verbatim:
    # every chunk hash is already in history -> 100% duplicates
    assert ratios[1][1] == ratios[1][0]
    got = {
        (r.doc_a, r.doc_b, r.shared)
        for r in read_cdc_pairs(spark, str(tmp_path / "pairs")).collect()
    }
    assert got == _batch_pairs(spark, rows, min_shared=2)
    # replay batch 0: a structured-streaming replay happens BEFORE any
    # later batch runs, so the index holds at most earlier batches plus
    # the batch's OWN write (crash after the index commit).  The
    # own-doc exclusion must make both crash windows — index with and
    # without self — produce the original ratio row.
    fps0 = cdc_chunks(_docs(spark, rows[0:3])).select(
        "doc_id", F.col("chunk_hash").alias("gh")
    )

    def ratio(idx):
        own = fps0.select("doc_id").distinct()
        known = idx.join(own, "doc_id", "left_anti").select("gh").distinct()
        total = fps0.count()
        new_h = fps0.select("gh").distinct().join(known, "gh", "left_anti")
        firsts = (
            fps0.join(new_h, "gh", "left_semi").select("gh").distinct().count()
        )
        return (total, total - firsts)

    empty_idx = read_chunk_index(spark, str(tmp_path / "nonexistent"))
    with_self = spark.read.schema("doc_id long, gh long").parquet(
        str(tmp_path / "idx" / "batch=0")
    )
    assert ratio(empty_idx) == ratios[0]
    assert ratio(with_self) == ratios[0]


def test_compaction_bounds_index_and_keeps_parity(spark, tmp_path):
    import os
    rows = _corpus(12)
    src = tmp_path / "docs"
    batches = [rows[0:3], rows[3:6], rows[6:9], rows[9:12]]
    for i, chunk in enumerate(batches):
        _docs(spark, chunk).coalesce(1).write.mode("overwrite").parquet(
            str(src / f"f{i}")
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "f*"))
    )
    q = start_cdc_index_stream(
        stream,
        str(tmp_path / "idx"),
        str(tmp_path / "pairs"),
        str(tmp_path / "cp"),
        max_df=None,
        compact_every=2,  # fold after batches 1 and 3
    )
    q.awaitTermination()
    # bounded: all 4 batch dirs folded into the txlog table (batch 3,
    # the last, triggers the second compaction), <= keep versions remain
    idx_root = str(tmp_path / "idx")
    batch_dirs = [d for d in os.listdir(idx_root) if d.startswith("batch=")]
    assert batch_dirs == []
    versions = [d for d in os.listdir(os.path.join(idx_root, "compacted"))
                if d.startswith("v=")]
    assert 1 <= len(versions) <= 2
    # the compacted view holds exactly the distinct corpus fingerprints
    full = read_chunk_index(spark, idx_root)
    exact = (
        cdc_chunks(_docs(spark, rows))
        .select("doc_id", F.col("chunk_hash").alias("gh"))
        .distinct()
    )
    assert full.distinct().count() == full.count() == exact.count()
    # fold parity unchanged by compaction
    got = {
        (r.doc_a, r.doc_b, r.shared)
        for r in read_cdc_pairs(spark, str(tmp_path / "pairs")).collect()
    }
    assert got == _batch_pairs(spark, rows, min_shared=2)
