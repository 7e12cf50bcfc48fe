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


def test_fast_hash_mode_equivalent_shape(docs):
    """xxhash64 fast mode: same schema and structural behavior as the
    md5 family (identical docs → identical signatures, near-dup pairs
    found), different hash values (it's a different family)."""
    slow = {r["doc_id"]: r["sig"] for r in D.minhash_signatures(docs).collect()}
    fast = {r["doc_id"]: r["sig"] for r in
            D.minhash_signatures(docs, fast=True).collect()}
    assert set(slow) == set(fast)
    assert all(len(v) == 16 for v in fast.values())
    assert all(all(x >= 0 for x in v) for v in fast.values())
    assert fast[0] == fast[5]  # exact dup: identical signature
    assert fast[0] != slow[0]  # genuinely a different family
    # deterministic across evaluations
    again = {r["doc_id"]: r["sig"] for r in
             D.minhash_signatures(docs, fast=True).collect()}
    assert again == fast

    pairs_slow = {(r["doc_a"], r["doc_b"]) for r in
                  D.minhash_lsh_pairs(docs, threshold=0.1).collect()}
    pairs_fast = {(r["doc_a"], r["doc_b"]) for r in
                  D.minhash_lsh_pairs(docs, threshold=0.1, fast=True).collect()}
    # the high-overlap cluster {0,1,5} must surface in ANY hash family
    # (exact dups share every band; 0/1 share nearly all shingles);
    # borderline pairs like (2,3) may differ between families — candidate
    # recall is family-dependent, verification is exact in both modes
    assert {(0, 1), (0, 5), (1, 5)} <= pairs_fast
    assert pairs_fast <= pairs_slow | {(2, 3)}

    fp_fast = {r["doc_id"]: r["simhash"] for r in
               D.simhash_fingerprints(docs, fast=True).collect()}
    assert fp_fast[0] == fp_fast[5]
    assert all(v >= 0 for v in fp_fast.values())


def test_minhash_max_bucket_star_mode_preserves_clusters(spark):
    # a hot family of 30 near-identical docs (the adversarial-skew shape:
    # every band bucket they share is oversized) + two unrelated docs
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(i, f"{base} variant{i}") for i in range(30)]
    rows += [(100, "completely different text about spark shuffles and joins"),
             (101, "another unrelated document discussing parquet file layout")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    full = D.minhash_lsh_pairs(df, threshold=0.5)
    star = D.minhash_lsh_pairs(df, threshold=0.5, max_bucket=5)
    n_full, n_star = full.count(), star.count()
    # star mode collapses the oversized buckets' quadratic expansion
    assert n_star < n_full
    assert n_star <= 29 + 5 * 4  # ~O(members), never O(members^2)

    from nemsis_xml_parser_spark.operators import components as C

    nodes = df.select("doc_id")
    cf = {(r["doc_id"], r["cluster_id"])
          for r in C.dedup_clusters(full, nodes=nodes).collect()}
    cs = {(r["doc_id"], r["cluster_id"])
          for r in C.dedup_clusters(star, nodes=nodes).collect()}
    # the point of star edges: identical duplicate CLUSTERS either way
    assert cf == cs


def test_minhash_max_bucket_noop_when_buckets_small(docs):
    full = {(r["doc_a"], r["doc_b"], r["jaccard"])
            for r in D.minhash_lsh_pairs(docs, threshold=0.5).collect()}
    capped = {(r["doc_a"], r["doc_b"], r["jaccard"])
              for r in D.minhash_lsh_pairs(docs, threshold=0.5,
                                           max_bucket=1000).collect()}
    assert full == capped


from hypothesis import given, settings
from hypothesis import strategies as st

_words = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "shared", "template", "tokens",
     "corpus", "sample", "words"]
)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.lists(_words, min_size=4, max_size=10), min_size=4, max_size=12),
    st.integers(min_value=1, max_value=4),
)
def test_star_cap_refines_uncapped_clusters(spark, texts, cap):
    """For ANY corpus and cap: capped star candidates are a subset of the
    uncapped candidate set, so capped components always REFINE uncapped
    components (every capped cluster is contained in one uncapped
    cluster) — the guarantee the skew guard rests on."""
    from nemsis_xml_parser_spark.operators import components as C

    rows = [(i, " ".join(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    nodes = df.select("doc_id")
    full = C.dedup_clusters(
        D.minhash_lsh_pairs(df, threshold=0.2), nodes=nodes
    ).collect()
    capped = C.dedup_clusters(
        D.minhash_lsh_pairs(df, threshold=0.2, max_bucket=cap), nodes=nodes
    ).collect()
    full_of = {r["doc_id"]: r["cluster_id"] for r in full}
    by_capped: dict = {}
    for r in capped:
        by_capped.setdefault(r["cluster_id"], set()).add(r["doc_id"])
    for members in by_capped.values():
        assert len({full_of[m] for m in members}) == 1, (
            f"capped cluster {members} spans multiple uncapped clusters"
        )
