"""Historical LSH index stream: fold parity vs the batch candidate
generator, replay idempotency, append-only index shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from nemsis_xml_parser_spark.operators.dedup import (
    minhash_band_keys,
    minhash_lsh_pairs,
)
from nemsis_xml_parser_spark.streaming.dedup_index import (
    candidates_against_index,
    read_candidate_pairs,
    read_index,
    start_dedup_index_stream,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus(k: int):
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "a completely different document about spark shuffle partitions",
        "training data curation needs deduplication at corpus scale",
    ]
    rows = []
    for i in range(k):
        t = base[i % 3]
        if i % 4 == 0 and i > 0:
            t = t + " with a tiny suffix tweak"
        rows.append((i, t))
    return rows


def test_fold_matches_batch_candidates(spark, tmp_path):
    # both hash families: the fold == batch property is per-family (the
    # stream runs the md5-family Arrow kernel — minhash_band_keys_arrow
    # has no fast/xxhash option; the oracle-checked batch queries use the
    # md5 family too) — batch-side parity must hold for whichever family
    # is asked for
    for fast in (False, True):
        rows = _corpus(18)
        batches = [rows[0:6], rows[6:12], rows[12:18]]
        index = read_index(spark, str(tmp_path / "idx"))
        got = set()
        for b in batches:
            banded = minhash_band_keys(_docs(spark, b), fast=fast)
            pairs = candidates_against_index(banded, index)
            got |= {(r.doc_a, r.doc_b) for r in pairs.collect()}
            index = index.unionByName(banded)
        exp = {
            (r.doc_a, r.doc_b)
            for r in minhash_lsh_pairs(
                _docs(spark, rows), candidates_only=True, fast=fast
            ).collect()
        }
        assert got == exp, f"fold/batch divergence (fast={fast})"


def test_streaming_e2e_and_replay_stability(spark, tmp_path):
    rows = _corpus(12)
    src = tmp_path / "docs"
    src.mkdir()
    for i in range(3):
        _docs(spark, rows[i * 4 : (i + 1) * 4]).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    idx, out = str(tmp_path / "idx"), str(tmp_path / "pairs")
    q = start_dedup_index_stream(stream, idx, out, str(tmp_path / "cp"))
    q.awaitTermination(120)

    got = {
        (r.doc_a, r.doc_b) for r in read_candidate_pairs(spark, out).collect()
    }
    exp = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(
            _docs(spark, rows), candidates_only=True
        ).collect()
    }
    assert got == exp
    # index is append-only: one batch dir per microbatch, union = all keys
    n_keys = read_index(spark, idx).count()
    assert n_keys == 12 * 4  # 4 bands per doc

    # replay the last batch by hand (simulates post-commit re-delivery):
    # candidate set for that batch is unchanged even though its keys are
    # already in the index
    last = _docs(spark, rows[8:12])
    banded = minhash_band_keys(last)
    replay = candidates_against_index(banded, read_index(spark, idx))
    batch_pairs = {
        (r.doc_a, r.doc_b)
        for r in spark.read.parquet(f"{out}/batch=2").collect()
    }
    got_replay = {(r.doc_a, r.doc_b) for r in replay.collect()}
    assert batch_pairs <= got_replay <= exp
    # pairs the replay adds beyond the original batch can only be pairs
    # already emitted by earlier batches (dup emission, deduped on read)
    earlier = {
        (r.doc_a, r.doc_b)
        for b in (0, 1)
        for r in spark.read.parquet(f"{out}/batch={b}").collect()
    }
    assert got_replay - batch_pairs <= earlier


def test_self_pairs_not_emitted(spark, tmp_path):
    banded = minhash_band_keys(_docs(spark, _corpus(4)))
    pairs = candidates_against_index(
        banded, read_index(spark, str(tmp_path / "none"))
    ).collect()
    assert all(r.doc_a < r.doc_b for r in pairs)


def test_arrow_band_keys_parity(spark):
    """minhash_band_keys_arrow == minhash_band_keys frame-for-frame on an
    edge-case corpus: NULL / empty / all-whitespace text, sub-shingle
    docs, tab/newline separators, control-char padding (Java trim),
    unicode tokens, duplicate shingles."""
    from nemsis_xml_parser_spark.operators.dedup import (
        minhash_band_keys_arrow,
    )

    rows = _corpus(10) + [
        (100, None),
        (101, ""),
        (102, "   \t\n  "),
        (103, "two words"),
        (104, "exactly three tokens"),
        (105, "tab\tsep\ttokens\tand more\ttokens here"),
        (106, "line\nbreaks\ncount\nas\nwhitespace too"),
        (107, "\x01\x02 control padded text needs java trim twin \x1f"),
        (108, "répété répété répété unicode tokens naïve café"),
        (109, "a a a a a a a a (degenerate repeated token stream)"),
    ]
    # ADVICE r13: control chars ATTACHED to boundary words (no space
    # between) — the expression form keeps "\x01word" as one token, so a
    # kernel that Java-trims chars <= U+0020 produces a different shingle
    # set AND (with fully distinct vocab per doc) different minima; these
    # rows fail against the pre-fix kernel instead of passing by the
    # Kirsch-Mitzenmacher-envelope coincidence.
    rows += [
        (200 + i, f"\x01w{i}a w{i}b w{i}c w{i}d w{i}e\x1f")
        for i in range(20)
    ]
    d = _docs(spark, rows)
    exp = {
        (r.doc_id, r.band_idx, r.band_hash)
        for r in minhash_band_keys(d).collect()
    }
    got = {
        (r.doc_id, r.band_idx, r.band_hash)
        for r in minhash_band_keys_arrow(d).collect()
    }
    assert got == exp
