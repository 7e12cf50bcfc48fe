"""Gear-CDC chunking: boundary determinism, the edit-resynchronization
property that motivates content-defined over fixed-size chunking, and
the window-fold == sequential-recurrence exactness argument."""

from __future__ import annotations

import hashlib

from nemsis_xml_parser_spark.operators.cdc import (
    GEAR_WINDOW,
    _P61,
    cdc_chunks,
    cdc_chunks_arrow,
    cdc_dedup_summary,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the curation "
    "pipeline chunks every document into content defined pieces that "
    "resynchronize after any local edit because boundaries depend only "
    "on nearby bytes and never on absolute offsets in the stream"
)


def _py_chunks(text: str, mask_bits: int = 6) -> list[str]:
    """Sequential reference: the literal gear recurrence."""
    h = 0
    out, cur = [], []
    for ch in text:
        g = int(hashlib.md5(ch.encode()).hexdigest()[:15], 16) % _P61
        h = (2 * h + g) % _P61
        cur.append(ch)
        if h % (1 << mask_bits) == 0:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


def test_matches_sequential_recurrence(spark):
    """The bounded-window fold IS the sequential gear state (mod-2^61
    kills terms older than GEAR_WINDOW) — chunk lengths and hashes
    match a plain Python loop."""
    docs = spark.createDataFrame([(1, BASE)], "doc_id long, text string")
    got = sorted(
        (r.chunk_idx, r.chunk_len)
        for r in cdc_chunks(docs, mask_bits=6).collect()
    )
    exp = [(i, len(c)) for i, c in enumerate(_py_chunks(BASE))]
    assert got == exp
    assert GEAR_WINDOW == 61  # the exactness bound is part of the contract


def test_edit_resynchronizes(spark):
    """Inserting one word near the front changes only the chunks around
    the edit: every chunk hash after the first boundary past the edit
    is shared with the original — the property fixed-size chunking
    lacks entirely."""
    edited = BASE.replace("quick brown", "quick shiny brown", 1)
    docs = spark.createDataFrame(
        [(1, BASE), (2, edited)], "doc_id long, text string"
    )
    rows = cdc_chunks(docs, mask_bits=6).collect()
    h1 = {r.chunk_hash for r in rows if r.doc_id == 1}
    h2 = {r.chunk_hash for r in rows if r.doc_id == 2}
    shared = h1 & h2
    # everything except the edited head chunk(s) re-aligns
    assert len(shared) >= len(h1) - 2
    assert len(shared) >= 1


def test_summary_counts(spark):
    docs = spark.createDataFrame(
        [(1, BASE), (2, BASE)], "doc_id long, text string"
    )
    row = cdc_dedup_summary(cdc_chunks(docs, mask_bits=6)).collect()[0]
    n = len(_py_chunks(BASE))
    assert row.total_chunks == 2 * n
    assert row.distinct_chunks == n  # identical docs share every chunk
    assert row.cross_doc_chunks == n
    assert row.max_doc_reuse == 2


def test_empty_doc_yields_no_chunks(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "xy")], "doc_id long, text string"
    )
    rows = cdc_chunks(docs, mask_bits=6).collect()
    assert {r.doc_id for r in rows} == {2}


def test_arrow_twin_parity(spark):
    """cdc_chunks_arrow (the vectorized streaming-hot-path kernel) is
    row-identical to the expression form across edits, empty docs,
    non-Latin-1 codepoints (the md5 fallback branch), and mask_bits
    variants."""
    edited = BASE.replace("quick brown", "quick shiny brown", 1)
    unicode_doc = "naïve café — ∑ über 東京 " + BASE[:80]
    docs = spark.createDataFrame(
        [(1, BASE), (2, edited), (3, ""), (4, None), (5, unicode_doc)],
        "doc_id long, text string",
    )
    for mb in (4, 6):
        exp = sorted(
            tuple(r) for r in cdc_chunks(docs, mask_bits=mb).collect()
        )
        got = sorted(
            tuple(r) for r in cdc_chunks_arrow(docs, mask_bits=mb).collect()
        )
        assert got == exp and len(got) > 0
