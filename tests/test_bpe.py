"""BPE merge-table trainer vs a pure-Python Sennrich reference.

The reference applies a merge with the canonical greedy left-to-right
scan (merge at i, continue at i+2 — the semantics of Sennrich's
re.sub-based learn_bpe); the operator must reproduce its merge table
exactly, including the count-desc / pair-asc tie-break."""

from __future__ import annotations

from collections import Counter

import pytest

from nemsis_xml_parser_spark.operators.bpe import (
    train_bpe_merges,
    word_frequencies,
)


def ref_bpe(word_counts: dict[str, int], rounds: int):
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for r in range(1, rounds + 1):
        pairs: Counter = Counter()
        for toks, c in vocab.items():
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] += c
        if not pairs:
            break
        (x, y), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, x, y, x + y, c))
        new_vocab: dict[tuple, int] = {}
        for toks, cnt in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == x and toks[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + cnt
        vocab = new_vocab
    return merges


def _train(spark, word_counts, rounds):
    words = spark.createDataFrame(
        list(word_counts.items()), "w string, cnt bigint"
    )
    got = train_bpe_merges(words, rounds).collect()
    return [
        (r.round, r.left_tok, r.right_tok, r.merged, r.merge_count)
        for r in sorted(got, key=lambda r: r.round)
    ]


def test_bpe_greedy_runs_and_tiebreak(spark):
    # 'aaaaa' exercises the greedy run semantics: merge (a,a) must fuse
    # left-to-right non-overlapping → (aa)(aa)(a), so round 2's count of
    # (aa,aa) is 1 per word, not 2.
    wc = {"aaaaa": 10, "aaaa": 7, "bc": 9, "bcbc": 1}
    assert _train(spark, wc, 4) == ref_bpe(wc, 4)


def test_bpe_no_false_match_inside_longer_symbol(spark):
    # after (l,l)→ll, the pair (l,o) of 'hello' is gone but 'lo' in
    # 'loop' must not be fused by any (ll,*) merge false-matching.
    wc = {"hello": 5, "llama": 4, "loop": 6, "ll": 3}
    assert _train(spark, wc, 5) == ref_bpe(wc, 5)


def test_bpe_realistic_corpus(spark):
    text = (
        "the quick brown fox jumps over the lazy dog "
        "the lazy dog sleeps the fox jumps again and again"
    )
    wc = Counter(text.split())
    assert _train(spark, dict(wc), 8) == ref_bpe(dict(wc), 8)


def test_bpe_stops_when_fully_fused(spark):
    # 2 distinct 2-char words → only 2 possible merges; rounds=10 must
    # return 2 rows, not raise.
    wc = {"ab": 3, "cd": 2}
    rows = _train(spark, wc, 10)
    assert rows == ref_bpe(wc, 10)
    assert len(rows) == 2


def test_word_frequencies_alphabet_guard(spark):
    docs = spark.createDataFrame(
        [("Foo bar! bar (baz) x9 X9",)], "text string"
    )
    got = {r.w: r.cnt for r in word_frequencies(docs).collect()}
    # 'bar!' and '(baz)' fail the lowercase-alnum guard; 'X9' lowers to x9
    assert got == {"foo": 1, "bar": 1, "x9": 2}


@pytest.mark.parametrize(
    "word,pair,expected",
    [
        ("aaaaa", ("a", "a"), ["aa", "aa", "a"]),
        ("llo", ("l", "o"), ["l", "lo"]),
        ("ll", ("l", "l"), ["ll"]),
    ],
)
def test_paren_cell_replace_is_greedy(word, pair, expected):
    # the representation argument itself: str.replace on the paren-cell
    # form == greedy left-to-right merge (same scan all three engines do)
    cells = "".join(f"({c})" for c in word)
    x, y = pair
    out = cells.replace(f"({x})({y})", f"({x}{y})")
    assert out == "".join(f"({t})" for t in expected)
