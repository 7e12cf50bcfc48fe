"""Text-analysis function tests."""

import pyspark.sql.functions as F
import pytest

from nemsis_xml_parser_spark.functions import text as T

SAMPLES = [
    (1, "the cat and the dog of the house"),        # en
    (2, "der hund und die katze und der vogel"),    # de
    (3, "el perro de la casa de la madre"),         # es
    (4, "xyzzy plugh qwerty"),                      # no stopwords → und
    (5, ""),                                        # empty
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(SAMPLES, "doc_id long, text string").cache()


def _one(df, col):
    return {r["doc_id"]: r[col] for r in df.collect()}


def test_token_count(docs):
    out = _one(docs.select("doc_id", T.token_count(F.col("text")).alias("n")), "n")
    assert out[1] == 8
    assert out[4] == 3
    assert out[5] == 0


def test_tokens_and_ngrams(docs):
    df = docs.select(
        "doc_id",
        F.size(T.tokens(F.col("text"))).alias("nt"),
        F.size(T.word_ngrams(F.col("text"), 3)).alias("ng"),
    )
    out = {r["doc_id"]: (r["nt"], r["ng"]) for r in df.collect()}
    assert out[1] == (8, 6)   # n tokens → n-2 trigrams
    assert out[4] == (3, 1)
    assert out[5] == (0, 0)


def test_detect_language(docs):
    out = _one(
        docs.select("doc_id", T.detect_language(F.col("text")).alias("lang")), "lang"
    )
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "es"
    assert out[4] == "und"
    assert out[5] == "und"


def test_stopword_hits_counts_word_bounded(spark):
    df = spark.createDataFrame([(1, "the theory of the theme")], "i long, text string")
    n = df.select(T.stopword_hits(F.col("text"), ("the",)).alias("n")).collect()[0]["n"]
    assert n == 2  # 'theory'/'theme' must not match


def test_quality_score_bounds(docs):
    out = _one(
        docs.select("doc_id", T.quality_score(F.col("text")).alias("q")), "q"
    )
    for v in out.values():
        assert 0.0 <= v <= 1.0
    assert out[1] > out[5]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, " hello world"), (3, "different")],
        "i long, text string",
    )
    fps = [r["f"] for r in df.select(T.fingerprint(F.col("text")).alias("f")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_rolling_hash_deterministic(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "abd"), (3, "abc")], "i long, t string")
    hs = [r["h"] for r in df.select(T.rolling_hash(F.col("t")).alias("h")).collect()]
    assert hs[0] == hs[2]
    assert hs[0] != hs[1]
    # matches the polynomial definition
    expected = ((ord("a") * 31 + ord("b")) * 31 + ord("c")) % (2**31 - 1)
    assert hs[0] == expected


def test_sanitize_identifier_col_matches_python(spark):
    from nemsis_xml_parser_spark.naming import sanitize_name

    cases = ["eVitals.01", "1Bad.Tag", "a b-c", "...", "ok_name"]
    df = spark.createDataFrame([(c,) for c in cases], "raw string")
    got = [
        r["s"]
        for r in df.select(T.sanitize_identifier_col(F.col("raw")).alias("s")).collect()
    ]
    # ASCII inputs: Column form must equal the driver-side python twin
    assert got == [sanitize_name(c) for c in cases]
