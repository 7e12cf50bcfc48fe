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
    after the ``max_df`` stop-fingerprint guard (None disables it)."""
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
