"""Winnowing fingerprint selection: the r11 array-HOF fast path must
be byte-identical to the original explode + per-doc-window formulation
(operators/winnow.py keeps both; the oracle SQL was derived from the
window form, so this parity pin is what lets the fast path inherit the
oracle checks)."""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: F401
from hypothesis import given, settings
from hypothesis import strategies as st

from nemsis_xml_parser_spark.operators.winnow import (
    winnowing_fingerprints,
    winnowing_fingerprints_window,
)


def _symdiff(a, b) -> int:
    return a.exceptAll(b).unionByName(b.exceptAll(a)).count()


def test_arr_matches_window_on_edge_shapes(spark):
    rows = [
        (1, ""),
        (2, "one"),
        (3, "a b c d e"),  # exactly k words -> 1 shingle, too few windows
        (4, "a b c d e f g h"),  # k + w - 1 words -> exactly 1 window
        (5, "  padded   whitespace\tand\nnewlines in this doc body here  "),
        (6, "x " * 40),  # degenerate repeated token
        (7, "über die faule brücke springt der flinke fuchs hinweg leise"),
        (8, "the quick brown fox jumps over the lazy dog " * 3),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    assert _symdiff(
        winnowing_fingerprints(d, max_df=None),
        winnowing_fingerprints_window(d, max_df=None),
    ) == 0
    # guarded form too (exercises the df semi-join on both paths)
    assert _symdiff(
        winnowing_fingerprints(d, max_df=2),
        winnowing_fingerprints_window(d, max_df=2),
    ) == 0


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab c\tqwe rty")),
            min_size=0,
            max_size=120,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_arr_matches_window_hypothesis(spark, texts):
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    assert _symdiff(
        winnowing_fingerprints(d, max_df=None, k=3, w=2),
        winnowing_fingerprints_window(d, max_df=None, k=3, w=2),
    ) == 0


def test_arrow_twin_parity(spark):
    """winnowing_fingerprints_arrow == winnowing_fingerprints row-set-
    identical on the real corpus plus edge cases (NULL / empty /
    whitespace text, sub-window docs, tab/newline separators,
    control-char padding, unicode, repeated tokens)."""
    import pyspark.sql.functions as F

    from nemsis_xml_parser_spark.operators.winnow import (
        winnowing_fingerprints,
        winnowing_fingerprints_arrow,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text")
        .limit(400)
    )
    extra = spark.createDataFrame(
        [
            (9001, None),
            (9002, ""),
            (9003, "   \t\n  "),
            (9004, "seven words is just below the window"),
            (9005, "exactly eight words meets the winnow window floor"),
            (9006, "tab\tsep\ttokens and\tmore tokens here for the window"),
            (9007, "\x01\x02 control padded text needs the java trim twin here \x1f"),
            (9008, "répété répété répété unicode naïve café tokens beyond window"),
            (9009, "a a a a a a a a a a a a"),
        ]
        # ADVICE r13: control chars ATTACHED to boundary words — the
        # expression form keeps "\x01word" / "word\x1f" as single tokens;
        # a kernel that Java-trims chars <= U+0020 yields different
        # shingles and different window minima on these distinct-vocab
        # docs (they fail against the pre-fix kernel).
        + [
            (
                9100 + i,
                f"\x01v{i}a v{i}b v{i}c v{i}d v{i}e v{i}f v{i}g v{i}h\x1f",
            )
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    d = docs.unionByName(extra)
    for max_df in (None, 50):
        exp = {
            (r.doc_id, r.gh)
            for r in winnowing_fingerprints(d, max_df=max_df).collect()
        }
        got = {
            (r.doc_id, r.gh)
            for r in winnowing_fingerprints_arrow(d, max_df=max_df).collect()
        }
        assert got == exp, f"arrow/expression divergence (max_df={max_df})"
