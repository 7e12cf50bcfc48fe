"""Text analysis column expressions (north-star text operators + the
reference's naming/trim semantics as Column forms).

All built-in-function compositions (regexp/split/transform/aggregate) —
no Python in the hot path, so they stay inside whole-stage codegen and
scale linearly with executors.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Stopword seeds for the n-gram/stopword language heuristic.  Deliberately
# tiny and deterministic so the DuckDB oracle can reproduce them in SQL.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "es": ("el", "de", "la"),
    "fr": ("le", "et", "les"),
}


def sanitize_identifier_col(col: Column) -> Column:
    """Column form of naming.sanitize_name (ASCII subset): ``.``→``_``,
    strip non-[A-Za-z0-9_], ``_``-prefix when digit-leading, empty →
    ``unnamed_element``.  Parity target: /root/reference/xml_handler.py:10-19
    (driver-side twin: nemsis_xml_parser_spark.naming.sanitize_name)."""
    cleaned = F.regexp_replace(F.regexp_replace(col, r"\.", "_"), r"[^A-Za-z0-9_]", "")
    prefixed = F.when(cleaned.rlike(r"^[0-9]"), F.concat(F.lit("_"), cleaned)).otherwise(
        cleaned
    )
    return F.when(prefixed == "", F.lit("unnamed_element")).otherwise(prefixed)


def strip_namespace_col(col: Column) -> Column:
    """``{uri}Tag`` → ``Tag`` (/root/reference/xml_handler.py:59-62)."""
    return F.regexp_replace(col, r"^\{[^}]*\}", "")


def trim_nullify(col: Column) -> Column:
    """Reference text semantics (/root/reference/xml_handler.py:100):
    absent → NULL, otherwise ``strip()`` (whitespace-only → '')."""
    return F.when(col.isNull(), F.lit(None)).otherwise(F.trim(col))


def token_count(col: Column) -> Column:
    """Whitespace token count via length arithmetic — identical formula is
    expressible in ANSI SQL for the oracle: n_spaces + 1 on trimmed text,
    0 for empty."""
    trimmed = F.trim(col)
    n = F.length(trimmed) - F.length(F.regexp_replace(trimmed, r" ", "")) + F.lit(1)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(n)


def tokens(col: Column) -> Column:
    """ARRAY<STRING> of whitespace tokens (empty tokens dropped)."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


# BPE-ish pre-tokenization: letter runs, digit runs, and single
# non-alphanumeric marks — the GPT-2-style split boundary without the merge
# table.  RE2/Java-regex compatible so the DuckDB oracle reproduces it.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_tokens(col: Column) -> Column:
    """ARRAY<STRING> of BPE-ish subword boundaries (pre-merge units)."""
    return F.regexp_extract_all(col, F.lit(BPE_PATTERN), F.lit(0))


def bpe_token_count(col: Column) -> Column:
    return F.coalesce(F.size(bpe_tokens(col)), F.lit(0))


def clean_text(col: Column) -> Column:
    """Curation normalize: strip HTML-ish tags, collapse whitespace runs,
    trim.  Regexes are RE2/Java-identical so the DuckDB oracle reproduces
    the output byte-for-byte."""
    no_tags = F.regexp_replace(col, r"<[^>]*>", " ")
    collapsed = F.regexp_replace(no_tags, r"\s+", " ")
    return F.trim(collapsed)


def word_ngrams(col: Column, n: int = 3) -> Column:
    """ARRAY<STRING> of word n-gram shingles (space-joined).

    The token array is bound once through a single-element-array transform
    (Spark has no LET): referencing ``tokens(col)`` directly inside the
    per-index lambda would re-run the regex split per SHINGLE — O(tokens²)
    string work per document."""

    def build(toks: Column) -> Column:
        # coalesce guards NULL text: size(NULL) is NULL, the <= 0 test
        # falls through, and sequence(0, greatest(NULL-1, -1)) would emit
        # PHANTOM empty-string shingles — two NULL docs then collide in
        # every downstream shingle join (the dedup_substring_spans bug,
        # ADVICE r12).  NULL text => zero shingles, matching the DuckDB
        # string_split/UNNEST oracles.
        count = F.coalesce(F.size(toks) - F.lit(n - 1), F.lit(0))
        idxs = F.sequence(F.lit(0), F.greatest(count - 1, F.lit(-1)))
        return F.when(count <= 0, F.array().cast("array<string>")).otherwise(
            F.transform(
                idxs,
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        )

    return F.flatten(F.transform(F.array(tokens(col)), build))


def stopword_hits(col: Column, words: tuple[str, ...]) -> Column:
    """Total occurrences of the given words (space-bounded) counted via
    non-overlapping ``replace`` length arithmetic:
    ``(len(padded) - len(replace(padded, ' w ', ''))) / len(' w ')``.
    replace() has identical left-to-right non-overlapping semantics in
    Spark and DuckDB, so the oracle reproduces this bit-for-bit."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    hit = F.lit(0)
    for w in words:
        needle = f" {w} "
        c = (
            F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit("")))
        ) / F.lit(len(needle))
        hit = hit + c.cast("int")
    return hit


def detect_language(col: Column) -> Column:
    """Stopword-vote language ID over LANG_STOPWORDS; ties broken by
    language code order (earlier code wins), no hits → 'und'.

    Implemented as greatest() over (score, tie_rank, lang) structs — pure
    expression, codegen-friendly, and reproducible in the SQL oracle via
    the same max-of-scores + CASE chain."""
    scores = [
        (lang, stopword_hits(col, words))
        for lang, words in sorted(LANG_STOPWORDS.items())
    ]
    packed = F.greatest(
        *[
            F.struct(
                score.alias("s"), F.lit(idx).alias("tie"), F.lit(lang).alias("lang")
            )
            # reverse alphabetical idx so alphabetically-earlier codes win ties
            for idx, (lang, score) in enumerate(
                sorted(scores, key=lambda t: t[0], reverse=True)
            )
        ]
    )
    return F.when(packed["s"] > 0, packed["lang"]).otherwise(F.lit("und"))


def quality_score(col: Column) -> Column:
    """Deterministic document quality heuristic in [0,1]:
    0.5·min(1, len/500) + 0.3·(1 − punct_ratio) + 0.2·min(1, mean_token_len/8).
    Oracle-reproducible with the same arithmetic."""
    length = F.length(col).cast("double")
    punct = F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", "")).cast("double")
    punct_ratio = F.when(length > 0, punct / length).otherwise(F.lit(0.0))
    ntok = token_count(col).cast("double")
    mean_tok = F.when(ntok > 0, (length - (ntok - 1)) / ntok).otherwise(F.lit(0.0))
    return (
        F.lit(0.5) * F.least(F.lit(1.0), length / F.lit(500.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.2) * F.least(F.lit(1.0), mean_tok / F.lit(8.0))
    )


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    Stable across engines (md5 is standard) → oracle-checkable."""
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(norm)


def rolling_hash(col: Column, base: int = 31, mod: int = 2**31 - 1) -> Column:
    """Polynomial rolling hash over characters (document fingerprinting
    variant) computed JVM-side with aggregate over the char codes."""
    chars = F.split(col, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % F.lit(mod),
    )
