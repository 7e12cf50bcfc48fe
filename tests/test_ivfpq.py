"""IVF-PQ: shapes, determinism, cell pruning, and shortlist recall vs
exact L2 (the pq_topk recall harness, composed index)."""

import pyspark.sql.functions as F
import pytest

from nemsis_xml_parser_spark.functions import vectors as V
from nemsis_xml_parser_spark.operators import ivfpq as X

SF = "/root/testdata/sf0.001"
NLIST, M, KSUB, DIM = 8, 8, 16, 64


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .cache()
    )


@pytest.fixture(scope="module")
def index(emb):
    return X.train_ivfpq(emb, nlist=NLIST, m=M, ksub=KSUB, dim=DIM)


def test_index_shapes(emb, index):
    centroids, codebooks, codes = index
    assert centroids.count() <= NLIST
    cb = codebooks.collect()
    assert {r["sub_idx"] for r in cb} == set(range(M))
    rows = codes.collect()
    assert len(rows) == emb.count()
    assert all(len(r["codes"]) == M for r in rows)
    # every item's cell exists in the coarse quantizer
    cids = {r["cid"] for r in centroids.collect()}
    assert {r["cid"] for r in rows} <= cids


def test_search_prunes_to_probed_cells(emb, index):
    centroids, codebooks, codes = index
    queries = emb.where(F.col("vec_id") < 5)
    got = X.ivfpq_topk(queries, centroids, codebooks, codes,
                       k=1000, nprobe=2, m=M, dim=DIM)
    # with nprobe=2 of 8 cells, each query can only ever see the members
    # of its 2 probed cells — candidate count must be well under corpus
    cell_sizes = {r["cid"]: r["n"] for r in
                  codes.groupBy("cid").agg(F.count("*").alias("n")).collect()}
    n_corpus = emb.count()
    by_q = {}
    for r in got.collect():
        by_q[r["query_id"]] = by_q.get(r["query_id"], 0) + 1
    assert set(by_q) == set(range(5))
    assert all(n < n_corpus for n in by_q.values())
    assert all(n <= sum(sorted(cell_sizes.values(), reverse=True)[:2])
               for n in by_q.values())


def test_determinism(emb, index):
    centroids, codebooks, codes = index
    queries = emb.where(F.col("vec_id") < 5)
    a = X.ivfpq_topk(queries, centroids, codebooks, codes, k=5, nprobe=3,
                     m=M, dim=DIM).collect()
    b = X.ivfpq_topk(queries, centroids, codebooks, codes, k=5, nprobe=3,
                     m=M, dim=DIM).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_shortlist_recall_vs_exact(emb, index):
    centroids, codebooks, codes = index
    queries = emb.where(F.col("vec_id") < 20)
    got = X.ivfpq_topk(queries, centroids, codebooks, codes, k=20,
                       nprobe=NLIST, m=M, dim=DIM)
    by_q = {}
    for r in sorted(got.collect(), key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])

    q = queries.select(F.col("vec_id").alias("query_id"),
                       V.to_double_array("embedding").alias("qv"))
    c = emb.select(F.col("vec_id").alias("neighbor_id"),
                   V.to_double_array("embedding").alias("cv"))
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(
        F.col("d").asc(), F.col("neighbor_id").asc()
    )
    exact = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("d", F.round(V.l2_distance("qv", "cv"), 6))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
    )
    exact_by_q = {}
    for r in exact.collect():
        exact_by_q.setdefault(int(r["query_id"]), set()).add(int(r["neighbor_id"]))
    # nprobe=nlist isolates the PQ approximation; residual encoding must do
    # at least as well as plain PQ's measured floor (test_pq.py: 0.15/0.4)
    hits5 = sum(len(set(by_q[q][:5]) & exact_by_q[q]) for q in exact_by_q)
    hits20 = sum(len(set(by_q[q]) & exact_by_q[q]) for q in exact_by_q)
    n = sum(len(v) for v in exact_by_q.values())
    assert hits5 / n >= 0.15, f"IVF-PQ recall@5 too low: {hits5 / n:.2f}"
    assert hits20 / n >= 0.4, f"IVF-PQ shortlist recall@20 too low: {hits20 / n:.2f}"


def test_rerank_recall_beats_adc_and_obeys_contract(emb, index):
    # rerank with nprobe=nlist and a generous shortlist must recover the
    # exact cosine top-k almost entirely — quantization error only hurts
    # when a true neighbor misses the shortlist
    centroids, codebooks, codes = index
    queries = emb.where(F.col("vec_id") < 20)
    got = X.ivfpq_rerank_topk(queries, emb, centroids, codebooks, codes,
                              k=5, alpha=16, nprobe=NLIST, m=M, dim=DIM)
    rows = got.collect()
    by_q = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert all(len(v) <= 5 for v in by_q.values())
    # cosine column is the EXACT rounded cosine of the raw vectors
    one = rows[0]
    qv = emb.where(F.col("vec_id") == one["query_id"]).collect()[0]["embedding"]
    cv = emb.where(F.col("vec_id") == one["neighbor_id"]).collect()[0]["embedding"]
    import math
    dot = sum(float(a) * float(b) for a, b in zip(qv, cv))
    nq = math.sqrt(sum(float(a) ** 2 for a in qv))
    nc = math.sqrt(sum(float(b) ** 2 for b in cv))
    assert abs(one["cosine"] - round(dot / (nq * nc), 6)) < 1e-9

    from nemsis_xml_parser_spark.operators.similarity import brute_force_topk
    exact_by_q = {}
    for r in brute_force_topk(queries, emb, k=5).collect():
        exact_by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    adc = X.ivfpq_topk(queries, centroids, codebooks, codes, k=5,
                       nprobe=NLIST, m=M, dim=DIM)
    adc_by_q = {}
    for r in adc.collect():
        adc_by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    n = sum(len(v) for v in exact_by_q.values())
    rr = sum(len(set(by_q[q]) & exact_by_q[q]) for q in exact_by_q) / n
    ar = sum(len(adc_by_q.get(q, set()) & exact_by_q[q]) for q in exact_by_q) / n
    assert rr >= 0.8, f"rerank recall@5 too low: {rr:.2f}"
    assert rr >= ar, f"rerank ({rr:.2f}) must not trail ADC-only ({ar:.2f})"
