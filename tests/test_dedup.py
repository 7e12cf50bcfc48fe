"""Dedup operator tests: planted near-duplicates, LSH vs brute-force
agreement, SimHash determinism."""

import pyspark.sql.functions as F
import pytest

from nemsis_xml_parser_spark.operators import dedup as D

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near-dup of 0
    (2, "spark executes distributed dataframe plans with catalyst and tungsten engines"),
    (3, "spark executes distributed dataframe plans with catalyst and tungsten runtime"),  # near-dup of 2
    (4, "completely different content about medical records and emergency services data"),
    (5, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 0
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_exact_dedup_keeps_first(docs):
    out = D.exact_dedup(docs)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [0, 1, 2, 3, 4]  # 5 dropped (dup of 0)


def test_exact_dedup_normalizes_whitespace_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world "), (3, "other")],
        "doc_id long, text string",
    )
    assert sorted(r["doc_id"] for r in D.exact_dedup(df).collect()) == [1, 3]


def test_ngram_jaccard_finds_planted_pairs(docs):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert (0, 1) in pairs
    assert (2, 3) in pairs
    assert (0, 5) in pairs  # exact dup → jaccard 1.0
    assert (0, 2) not in pairs


def test_minhash_lsh_matches_bruteforce(docs):
    brute = {
        (r["doc_a"], r["doc_b"])
        for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    # LSH candidates are verified exactly → lsh ⊆ brute; high-similarity
    # planted pairs must be recalled
    assert lsh <= brute
    assert (0, 5) in lsh
    assert (0, 1) in lsh


def test_minhash_signature_deterministic(docs):
    a = D.minhash_signatures(docs).collect()
    b = D.minhash_signatures(docs).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
    # identical text → identical signature
    sig = {r["doc_id"]: r["sig"] for r in a}
    assert sig[0] == sig[5]
    assert sig[0] != sig[4]


def test_simhash_properties(docs):
    fp = {r["doc_id"]: r["simhash"] for r in D.simhash_fingerprints(docs).collect()}
    assert fp[0] == fp[5]  # exact dup → same simhash
    # near-dups closer in Hamming space than unrelated docs
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(fp[0], fp[1]) < ham(fp[0], fp[4])


def test_simhash_near_pairs(docs):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in D.simhash_near_pairs(docs, max_hamming=6).collect()
    }
    assert (0, 5) in pairs  # hamming 0
    assert (0, 4) not in pairs
