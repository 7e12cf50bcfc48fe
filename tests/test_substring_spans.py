"""Cross-document substring-span dedup (plans/round12.py): exact maximal
span lengths on a constructed corpus — the bounded-tier contract behind
the oracle-checked dedup_substring_spans query."""

from __future__ import annotations

import pyspark.sql.functions as F

from nemsis_xml_parser_spark.plans.round12 import SUB_L


def _run(spark, rows):
    from nemsis_xml_parser_spark.plans import QUERIES
    import tempfile

    # route the registered query at a scratch sf_dir carrying only the
    # documents table it reads
    d = tempfile.mkdtemp(prefix="subspan_")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    return {
        (r.doc_a, r.doc_b): (r.longest_span_tokens, r.n_spans, r.shared_grams)
        for r in QUERIES["dedup_substring_spans"].spark(spark, d).collect()
    }


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_exact_span_length(spark):
    """Two docs sharing one contiguous 30-token run (unique elsewhere):
    the reported longest span is exactly 30 and the gram count is the
    aligned-window count 30 - SUB_L + 1."""
    shared = _words("s", 30)
    rows = [
        (1, _words("a", 20) + " " + shared + " " + _words("b", 20)),
        (2, _words("c", 5) + " " + shared + " " + _words("d", 40)),
    ]
    got = _run(spark, rows)
    assert got == {(1, 2): (30, 1, 30 - SUB_L + 1)}


def test_below_granularity_invisible(spark):
    """A shared run shorter than SUB_L tokens produces no pair."""
    shared = _words("s", SUB_L - 1)
    rows = [
        (1, _words("a", 20) + " " + shared),
        (2, _words("c", 20) + " " + shared),
    ]
    assert _run(spark, rows) == {}


def test_two_separate_spans(spark):
    """Two disjoint shared runs in the same pair are reported as two
    spans with the longest one surfaced."""
    s1, s2 = _words("x", 20), _words("y", 15)
    rows = [
        (1, s1 + " " + _words("a", 10) + " " + s2),
        (2, s2 + " " + _words("b", 25) + " " + s1),
    ]
    got = _run(spark, rows)
    span, n_spans, grams = got[(1, 2)]
    assert span == 20 and n_spans == 2
    assert grams == (20 - SUB_L + 1) + (15 - SUB_L + 1)


def test_boilerplate_guard(spark):
    """A run shared by more than SUB_MAXDF docs goes mute (the df guard
    that stops boilerplate going quadratic)."""
    from nemsis_xml_parser_spark.plans.round12 import SUB_MAXDF

    boiler = _words("lic", 20)
    rows = [(i, _words(f"u{i}_", 10) + " " + boiler)
            for i in range(SUB_MAXDF + 5)]
    assert _run(spark, rows) == {}


def test_null_and_empty_text_emit_nothing(spark):
    """NULL and empty texts must produce zero grams (ADVICE r12: the
    pre-fix plan turned each NULL text into one empty gram, so two NULL
    docs manufactured a spurious pair).  A real shared span alongside
    them still reports exactly once."""
    shared = _words("s", 20)
    rows = [
        (1, None),
        (2, None),
        (3, ""),
        (4, "   "),
        (5, _words("a", 5) + " " + shared),
        (6, shared + " " + _words("b", 5)),
    ]
    assert _run(spark, rows) == {(5, 6): (20, 1, 20 - SUB_L + 1)}
