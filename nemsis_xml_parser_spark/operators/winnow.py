"""Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03 —
the MOSS algorithm): word-k-gram shingles are rolling-hashed and each
sliding window of ``w`` consecutive shingle hashes SELECTS its minimum
(ties to the rightmost position — "robust winnowing").  The guarantee:
any shared substring of >= w + k - 1 words yields at least one shared
selected fingerprint, while only ~2/(w+1) of the shingles are stored —
the sublinear-storage middle ground between exact-substring dedup
(every shingle) and MinHash (a fixed-size sketch with no locality).

Distributed shape: one explode to (doc, pos, hash), one BOUNDED per-doc
window (ROWS frame of w, partitioned by doc — never a global window),
a distinct, a document-frequency stop-fingerprint guard (fingerprints
seen in more than ``max_df`` docs are dropped — boilerplate templates,
license headers; the same skew bound as the LSH star cap), and a
fingerprint-keyed equi-join for pairs.  No stage is all-pairs.

The lexicographic (hash, rightmost-pos) window minimum is packed into
ONE integer — hash * 2^pos_bits + (2^pos_bits - 1 - pos) — so a plain
MIN over the frame implements the tie-break identically in Spark and
in the generated DuckDB oracles (plans/round8.py).  Docs must have
fewer than 2^pos_bits shingles; chunk longer documents upstream.

Reference parity: none — the reference (psycopg2 ETL) has no dedup
surface; §2.I LLM-curation tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions import text as T


def _selected_fps_arr(
    text: F.Column, k: int, w: int, pos_bits: int
) -> F.Column:
    """ARRAY<BIGINT> of the distinct selected fingerprints of one
    document, computed entirely with per-row array HOFs — zero
    shuffles, no 2M-row shingle explode, no per-doc window sorts
    (the r11 microbatch lever; same recipe as the r10 cdc_chunks
    rewrite).

    Byte-parity with the window formulation (kept below as
    ``winnowing_fingerprints_window`` and pinned by
    tests/test_winnow.py): the shingle subtree IS ``T.word_ngrams`` —
    the same expression the explode path consumed — and the packed
    lexicographic key, the ``pos <= n_ng - w`` full-frame filter
    (= ``sequence(0, n_ng - w)``) and the double-division unpack are
    transcribed term for term.  The ngram and key arrays are bound
    once via single-element-array transforms (the ``word_ngrams``
    LET idiom) so CollapseProject cannot inline them into the window
    lambda and re-hash every shingle per window position —
    O(shingles²) work."""
    pos_mask = F.lit((1 << pos_bits) - 1)
    P = F.lit(2147483647).cast("long")  # rolling_hash modulus

    def from_keys(ks: F.Column) -> F.Column:
        # coalesce guards NULL text (size(NULL) is NULL and the <= 0
        # test would fall through — the word_ngrams r13 bug class; at
        # the default k=5,w=4 the window guard happened to mask it, but
        # the emptiness must not depend on parameter luck)
        n_win = F.coalesce(F.size(ks) - F.lit(w - 1), F.lit(0))
        return F.when(
            n_win <= 0, F.array().cast("array<bigint>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_win - 1, F.lit(-1))),
                lambda j: F.floor(
                    F.array_min(F.slice(ks, j + 1, w))
                    / F.lit(1 << pos_bits)
                ),
            )
        )

    def word_hash_pows(ws: F.Column) -> F.Column:
        # (H(word), 31^len(word) mod P) per word — each word's chars
        # folded ONCE.  The shingle hash is then composed from these in
        # O(k) long ops per shingle instead of re-folding ~k words' worth
        # of characters per shingle: H(s1 || s2) = H(s1)*31^len(s2) +
        # H(s2) (mod P), the defining identity of the polynomial hash,
        # so the composed value is BIT-IDENTICAL to rolling_hash over the
        # joined shingle string (pinned vs the window twin in
        # tests/test_winnow.py).
        return F.transform(
            ws,
            lambda wd: F.struct(
                T.rolling_hash(wd).alias("h"),
                F.aggregate(
                    F.sequence(F.lit(1), F.length(wd)),
                    F.lit(1).cast("long"),
                    lambda acc, _: (acc * 31) % P,
                ).alias("pw"),
            ),
        )

    def shingle_keys(hps: F.Column) -> F.Column:
        n_ng = F.coalesce(F.size(hps) - F.lit(k - 1), F.lit(0))

        def combine(acc: F.Column, x: F.Column) -> F.Column:
            # append ' ' + word: shift by 31^(1+len), add H(' '||word)
            # = 32*31^len + H(word); every factor < 2^36 and every
            # product < 2^62, so the arithmetic stays exact in BIGINT
            joined = (
                acc["h"] * ((x["pw"] * 31) % P)
                + ((x["pw"] * 32) % P + x["h"])
            ) % P
            return F.struct(
                F.when(acc["first"], x["h"]).otherwise(joined).alias("h"),
                F.lit(False).alias("first"),
            )

        return F.when(
            n_ng <= 0, F.array().cast("array<bigint>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_ng - 1, F.lit(-1))),
                lambda i: F.aggregate(
                    F.slice(hps, i + 1, k),
                    F.struct(
                        F.lit(0).cast("long").alias("h"),
                        F.lit(True).alias("first"),
                    ),
                    combine,
                    lambda acc: acc["h"],
                )
                * F.lit(1 << pos_bits)
                + (pos_mask - i.cast("long")),
            )
        )

    # LET-bind words -> (hash, pow) pairs -> packed keys via
    # single-element-array transforms (the word_ngrams idiom) so
    # CollapseProject cannot inline and re-evaluate the expensive
    # arrays per reference
    sel = F.flatten(
        F.transform(
            F.array(T.tokens(text)),
            lambda ws: F.flatten(
                F.transform(
                    F.array(word_hash_pows(ws)),
                    lambda hps: F.flatten(
                        F.transform(
                            F.array(shingle_keys(hps)), from_keys
                        )
                    ),
                )
            ),
        )
    )
    return F.array_distinct(sel)


def winnowing_fingerprints_arrow(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    max_df: int | None = 50,
    pos_bits: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Vectorized Arrow twin of :func:`winnowing_fingerprints` —
    identical (doc_id, gh) output, parity-pinned by
    tests/test_winnow.py.

    Why a twin exists (the cdc/minhash r12/r13 argument): the
    array-HOF selection, though already one narrow stage, evaluates
    every word fold, shingle composition and window min in the
    INTERPRETED expression path.  The kernel does the same math per
    Arrow batch: one polynomial char fold per DISTINCT word
    (partition-cached — corpora repeat words heavily), the shingle
    hash composed across k words as k-1 vectorized numpy passes using
    the same H(s1‖s2) = H(s1)·31^(1+len(s2)) + H(' '‖s2) identity
    (every factor < 2^31, products < 2^62 — int64-exact, bit-identical
    to rolling_hash over the joined string), the packed
    (hash, rightmost-pos) key and the w-wide sliding min as
    ``np.minimum`` over w shifted views.  Tokenization twins the
    expression form exactly: ASCII ``\\s+`` split with empty tokens
    filtered — identical to ``filter(split(trim(col),'\\s+'), t!='')``
    since Spark trim strips only spaces and the empty filter absorbs
    boundary whitespace; NO Java-trim-style strip of all chars <=
    U+0020, which would drop leading/trailing control chars the
    expression form keeps inside tokens (ADVICE r13 high).  Still a
    narrow map — the guard aggregate is the only shuffle, as in the
    expression form."""
    import re

    import numpy as np
    import pandas as pd

    P = 2147483647
    mask = (1 << pos_bits) - 1
    ws_re = re.compile(r"\s+", re.ASCII)

    def kernel(batches):
        cache: dict[str, tuple[int, int]] = {}

        def word_hp(wd: str) -> tuple[int, int]:
            hp = cache.get(wd)
            if hp is None:
                h = 0
                for ch in wd:
                    h = (h * 31 + ord(ch)) % P
                hp = (h, pow(31, len(wd), P))
                cache[wd] = hp
            return hp

        for pdf in batches:
            out_id, out_gh = [], []
            for row_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = ws_re.split(text) if text else []
                toks = [t for t in toks if t]
                n_ng = len(toks) - (k - 1)
                n_win = n_ng - (w - 1)
                if n_win <= 0:
                    continue
                hps = [word_hp(t) for t in toks]
                H = np.fromiter(
                    (h for h, _ in hps), dtype=np.int64, count=len(hps)
                )
                PW = np.fromiter(
                    (p for _, p in hps), dtype=np.int64, count=len(hps)
                )
                S = H[:n_ng].copy()
                for j in range(1, k):
                    hx = H[j : j + n_ng]
                    pwx = PW[j : j + n_ng]
                    S = (S * ((pwx * 31) % P) + ((pwx * 32) % P + hx)) % P
                key = (S << pos_bits) + (mask - np.arange(n_ng))
                m = key[:n_win].copy()
                for j in range(1, w):
                    np.minimum(m, key[j : j + n_win], out=m)
                for gh in np.unique(m >> pos_bits):
                    out_id.append(row_id)
                    out_gh.append(int(gh))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_id, dtype="int64"),
                    "gh": pd.Series(out_gh, dtype="int64"),
                }
            )

    fps = docs.select(F.col(id_col).alias(id_col), text_col).mapInPandas(
        kernel, schema="doc_id long, gh long"
    )
    if max_df is None:
        return fps
    ok = (
        fps.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_df)
        .select("gh")
    )
    return fps.join(ok, "gh", "left_semi")


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    max_df: int | None = 50,
    pos_bits: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, gh) — the distinct selected fingerprints per document,
    after the ``max_df`` stop-fingerprint guard (None disables it).

    Selection runs per-document inside one narrow array-HOF stage
    (:func:`_selected_fps_arr`); the only shuffles left are the
    guard's df aggregate (when enabled) and whatever the caller adds."""
    fps = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            _selected_fps_arr(F.col(text_col), k, w, pos_bits)
        ).alias("gh"),
    )
    if max_df is None:
        return fps
    ok = (
        fps.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_df)
        .select("gh")
    )
    return fps.join(ok, "gh", "left_semi")


def winnowing_fingerprints_window(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    max_df: int | None = 50,
    pos_bits: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The original explode + per-doc-window formulation — kept as the
    independently-derived parity twin for the array-HOF fast path
    (tests/test_winnow.py asserts identical output on the real corpus),
    and as the reference rendering of the SIGMOD'03 selection rule."""
    ng = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(T.word_ngrams(F.col(text_col), k)).alias("pos", "g"),
    )
    h = ng.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        T.rolling_hash(F.col("g")).alias("gh"),
    )
    pos_mask = F.lit((1 << pos_bits) - 1)
    key = F.col("gh") * F.lit(1 << pos_bits) + (pos_mask - F.col("pos"))
    w_cnt = Window.partitionBy("doc_id")
    w_min = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    sel = h.select(
        "doc_id",
        "pos",
        F.count(F.lit(1)).over(w_cnt).alias("n_ng"),
        F.min(key).over(w_min).alias("wkey"),
    )
    fps = (
        sel.where(F.col("pos") <= F.col("n_ng") - w)
        .select(
            "doc_id",
            F.floor(F.col("wkey") / F.lit(1 << pos_bits)).alias("gh"),
        )
        .distinct()
    )
    if max_df is None:
        return fps
    ok = (
        fps.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_df)
        .select("gh")
    )
    return fps.join(ok, "gh", "left_semi")


def winnowing_pairs(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    max_df: int | None = 50,
    min_shared: int = 3,
    pos_bits: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_a, doc_b, shared) — document pairs sharing at least
    ``min_shared`` selected fingerprints (doc_a < doc_b), via one
    fingerprint-keyed equi-join over the guarded fingerprint table."""
    fps = winnowing_fingerprints(
        docs, k=k, w=w, max_df=max_df, pos_bits=pos_bits,
        id_col=id_col, text_col=text_col,
    )
    a = fps.select(F.col("doc_id").alias("doc_a"), "gh")
    b = fps.select(F.col("doc_id").alias("doc_b"), "gh")
    return (
        a.join(b, "gh")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
