"""Streaming NSW graph-index maintenance: single-batch equivalence with
the batch build, multi-batch recall parity, replay duplicate immunity,
and compaction degree bounds."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from nemsis_xml_parser_spark.operators.nsw import (
    build_nsw_graph,
    nsw_beam_topk,
)
from nemsis_xml_parser_spark.streaming.nsw_index import (
    compact_nsw_edges,
    nsw_stream_index_topk,
    read_nsw_edges,
    start_nsw_index_stream,
)

SRC = "/root/testdata/sf0.001/embeddings.parquet"


def _stage(spark, tmp_path, n_files=3, n=240):
    src = tmp_path / "vecs"
    e = spark.read.parquet(SRC).select("vec_id", "embedding").limit(n)
    per = n // n_files
    for i in range(n_files):
        e.where(
            (F.col("vec_id") >= i * per) & (F.col("vec_id") < (i + 1) * per)
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"f{i}"))
    return e, str(src)


def _run(spark, src, idx_root, cp, **kw):
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    q = start_nsw_index_stream(stream, idx_root, cp, **kw)
    q.awaitTermination()


def _brute_topk(e, queries, k):
    from nemsis_xml_parser_spark.operators.similarity import brute_force_topk

    return brute_force_topk(queries, e, k=k)


def _recall(got_rows, truth_rows, k):
    got, truth = {}, {}
    for r in got_rows:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in truth_rows:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    return hits / (len(truth) * k)


def test_single_batch_equals_batch_build(spark, tmp_path):
    """The whole corpus in ONE trigger: the insertion rule with empty
    history IS the batch build — identical edge set, identical top-k."""
    e, src = _stage(spark, tmp_path, n_files=1)
    idx = str(tmp_path / "idx")
    _run(spark, src, idx, str(tmp_path / "cp"), compact_every=None)
    got = {
        (r.src, r.dst)
        for r in read_nsw_edges(spark, idx).select("src", "dst").distinct().collect()
    }
    exp = {(r.src, r.dst) for r in build_nsw_graph(e).collect()}
    assert got == exp and len(got) > 0
    queries = e.where(F.col("vec_id") < 5)
    got_topk = sorted(
        tuple(r)
        for r in nsw_stream_index_topk(spark, idx, queries, k=5).collect()
    )
    exp_topk = sorted(
        tuple(r) for r in nsw_beam_topk(queries, e, k=5).collect()
    )
    assert got_topk == exp_topk


def test_multibatch_recall_parity(spark, tmp_path):
    """Corpus over 3 triggers: stream-built graph recall@5 within 0.02
    of the batch graph's on the same corpus (the VERDICT parity bar)."""
    e, src = _stage(spark, tmp_path, n_files=3)
    idx = str(tmp_path / "idx")
    _run(spark, src, idx, str(tmp_path / "cp"), compact_every=None)
    k = 5
    queries = e.where(F.col("vec_id") % 17 == 0)
    truth = _brute_topk(e, queries, k).collect()
    stream_rows = nsw_stream_index_topk(
        spark, idx, queries, k=k, entries=3
    ).collect()
    batch_rows = nsw_beam_topk(queries, e, k=k, entries=3).collect()
    r_stream = _recall(stream_rows, truth, k)
    r_batch = _recall(batch_rows, truth, k)
    assert r_stream >= r_batch - 0.02, (r_stream, r_batch)


def test_replay_duplicates_do_not_shift_topk(spark, tmp_path):
    """A crash-window replay re-appends a batch's edge and cell dirs;
    the duplicate rows must not move any search result, and compaction
    folds them away with the degree bound restored."""
    e, src = _stage(spark, tmp_path, n_files=3)
    idx = str(tmp_path / "idx")
    _run(spark, src, idx, str(tmp_path / "cp"), compact_every=None)
    queries = e.where(F.col("vec_id") < 5)
    before = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in nsw_stream_index_topk(spark, idx, queries, k=5).collect()
    )
    # simulate replay: duplicate batch 1's edges under a fresh dir name
    # (the crash window where old outputs are still visible)
    spark.read.parquet(f"{idx}/edges/batch=1").write.mode(
        "overwrite"
    ).parquet(f"{idx}/edges/batch=99")
    after = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in nsw_stream_index_topk(spark, idx, queries, k=5).collect()
    )
    assert after == before
    compact_nsw_edges(spark, idx)
    ed = read_nsw_edges(spark, idx)
    assert ed.count() == ed.distinct().count()
    deg = (
        ed.where(F.col("kind") == "intra")
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.max("d"))
        .first()[0]
    )
    assert deg <= 12  # g_keep = 2 * g_intra bound after compaction
    assert not [
        d for d in os.listdir(f"{idx}/edges") if d.startswith("batch=")
    ]


def test_compaction_during_stream(spark, tmp_path):
    """compact_every folds both stores mid-stream; the searcher reads
    compaction ∪ fresh dirs transparently."""
    e, src = _stage(spark, tmp_path, n_files=3)
    idx = str(tmp_path / "idx")
    _run(spark, src, idx, str(tmp_path / "cp"), compact_every=2)
    cell_dirs = [
        d for d in os.listdir(f"{idx}/cells") if d.startswith("batch=")
    ]
    assert cell_dirs == ["batch=2"]
    queries = e.where(F.col("vec_id") < 3)
    rows = nsw_stream_index_topk(spark, idx, queries, k=5).collect()
    assert {r.query_id for r in rows} == {0, 1, 2}
    assert all(1 <= r.rank <= 5 for r in rows)


def test_recall_floor_across_compositions(spark, tmp_path):
    """VERDICT r13 #4: an ABSOLUTE recall floor, not just parity with
    one insert order.  The same 500-vector corpus is streamed under
    three different microbatch compositions (contiguous ids, modulo
    stripes, md5 buckets — same rows, different insert order and
    different in-batch candidate pools), with mid-stream compaction so
    the orphan-repair pass is on the measured path.  Single-entry
    beam-8 x hops-3 recall@10 must hold >= 0.40 for EVERY composition —
    below the bench-scale observed 0.50 - 0.05 run-to-run band, so a
    regression that eats the variance budget still fails here."""
    e = spark.read.parquet(SRC).select("vec_id", "embedding")
    k, floor = 10, 0.40
    queries = e.where(F.col("vec_id") % 11 == 0)
    truth = _brute_topk(e, queries, k).collect()

    def split(tag):
        if tag == "contig":
            return (F.col("vec_id") * 5 / 500).cast("int")
        if tag == "stripe":
            return (F.col("vec_id") % 5).cast("int")
        return (F.abs(F.hash(F.md5(F.col("vec_id").cast("string")))) % 5
                ).cast("int")

    for tag in ("contig", "stripe", "md5"):
        src = tmp_path / f"vecs_{tag}"
        parts = e.withColumn("__p", split(tag))
        for i in range(5):
            parts.where(F.col("__p") == i).drop("__p").coalesce(
                1
            ).write.mode("overwrite").parquet(str(src / f"f{i}"))
        idx = str(tmp_path / f"idx_{tag}")
        _run(spark, str(src), idx, str(tmp_path / f"cp_{tag}"),
             compact_every=2)
        rows = nsw_stream_index_topk(
            spark, idx, queries, k=k, beam=8, hops=3, entries=1
        ).collect()
        r = _recall(rows, truth, k)
        assert r >= floor, f"recall@{k} {r:.3f} < {floor} ({tag})"
