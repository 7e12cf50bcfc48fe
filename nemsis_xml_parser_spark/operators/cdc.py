"""Content-defined chunking (CDC) — Gear-hash boundary detection and
cross-document chunk-level dedup.

Fixed-size chunking breaks dedup the moment one byte is inserted (every
later chunk shifts); CONTENT-DEFINED boundaries re-synchronize after an
edit because a boundary depends only on the bytes near it.  This is the
storage-dedup workhorse (LBFS' Rabin chunking; Gear/FastCDC — Xia et
al., USENIX ATC'16 — replace Rabin with one shift+add per byte) and the
chunk-level complement to the repo's document-level dedup ladder: two
near-identical documents share almost every chunk fingerprint, and the
shared-chunk table is the byte-range evidence a curation pipeline uses
to locate WHAT is duplicated, not just THAT a pair is similar.

Algorithm (basic Gear-CDC):

* gear value per character: ``G(ch) = md5_long(ch)`` — the repo's
  cross-engine 60-bit md5 hash, so the oracle recomputes it verbatim;
* rolling hash ``h_i = (2 * h_{i-1} + G(ch_i)) mod 2^61`` — expanding
  the recurrence, the multiplier of ``G(ch_j)`` is ``2^(i-j)``, which
  vanishes mod 2^61 past lag 61 and — the part that matters — vanishes
  mod 2^mask_bits past lag ``mask_bits``.  The BOUNDARY test only reads
  ``h mod 2^mask_bits``, so a fold over a bounded per-document ROWS
  window of the last ``mask_bits`` characters reproduces the TRUE
  sequential gear boundary set exactly (never a global window, and not
  an approximation — tests pin it against the literal recurrence);
* boundary after position i when ``h_i mod 2^mask_bits == 0`` (average
  chunk length 2^mask_bits), plus an implicit boundary at end-of-doc.
  Plain Gear-CDC: no min/max chunk clamps — those make boundary
  eligibility depend on the previous boundary (a sequential chain) and
  are the part of FastCDC that does NOT distribute; the unclamped
  variant is fully content-local, hence embarrassingly parallel.

Scale: ZERO shuffles — the boundary set is computed per document row
with array higher-order functions (filter over sequence(1, n) with an
inline mask_bits-char fold), then one posexplode per CHUNK (~n/2^mask
rows) and one substring per chunk.  The fold steps are codegen-side
integer ops; (2*acc + g) stays under 2^63 so both engines compute the
identical wrapped-free arithmetic.

Reference parity: none — the reference (psycopg2 ETL) has no dedup
surface; §2.I LLM-curation tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.hashing import md5_long

_P61 = 1 << 61
# full-state exactness bound (2^lag mod 2^61 == 0 past 61); the operator
# itself only needs mask_bits of window — see cdc_chunks
GEAR_WINDOW = 61

# Precomputed gear table for the single-char hash: md5_long(chr(i)) for
# codepoints 0..255 — IDENTICAL values to the md5 expression (first 15
# hex chars of the UTF-8 md5, the md5_long contract), computed once in
# Python instead of 6 md5 digests per character position inside the
# boundary fold (r11: the fold was ~40% of the chunker's CPU).
# Codepoints >= 256 fall back to the md5 expression.
import hashlib as _hashlib

_GEAR_TAB = tuple(
    int(_hashlib.md5(chr(i).encode("utf-8")).hexdigest()[:15], 16)
    for i in range(256)
)


def _gear(ch):
    """Gear value of one character: array-literal lookup by codepoint
    (O(1), constant-folded 256-entry literal) with the md5 expression
    as the >=256 fallback — bit-identical to md5_long(ch) % 2^61
    (md5_long is 60-bit, so the modulo is the identity; the DuckDB
    oracles keep computing the md5 form verbatim)."""
    tab = F.array(*[F.lit(v).cast("long") for v in _GEAR_TAB])
    return F.coalesce(
        F.when(F.ascii(ch) < 256, F.element_at(tab, F.ascii(ch) + 1)),
        md5_long(ch) % F.lit(_P61),
    )


def _gear64(ch, mask: int):
    """Gear value reduced mod ``mask`` (the only bits the boundary fold
    reads): the same constant-folded 256-entry table with each entry
    pre-reduced, md5 fallback for codepoints >= 256."""
    tab = F.array(*[F.lit(v % mask).cast("long") for v in _GEAR_TAB])
    return F.coalesce(
        F.when(F.ascii(ch) < 256, F.element_at(tab, F.ascii(ch) + 1)),
        md5_long(ch) % F.lit(mask),
    )


def cdc_chunks(
    docs: DataFrame,
    mask_bits: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_len, chunk_hash) — Gear-CDC chunks per
    document; ``chunk_hash`` is the repo md5_long of the chunk text.

    Rendering (r12 rewrite: ONE linear fold per document — no
    per-character explode, no window sort, no shuffle at all; the whole
    boundary computation is one codegen projection per document row,
    embarrassingly parallel):

    * the boundary test reads ``h mod 2^mask_bits``, and
      ``(2*h + g) mod 2^mask_bits`` depends only on
      ``h mod 2^mask_bits`` and ``g mod 2^mask_bits`` — so a single
      ``aggregate`` fold carrying the mask_bits-bit running state
      reproduces the TRUE sequential gear boundary set exactly (never
      a global window, and not an approximation — tests pin it against
      the literal full-width recurrence).  One gear-table lookup per
      character; the boundary-position array is appended inside the
      fold's struct accumulator (the r10 form re-hashed a
      mask_bits-char slice per POSITION — 6x the gear lookups plus a
      slice allocation per character);
    * the fold's finish lambda adds the implicit end-of-doc boundary
      (unless a boundary already fell there), so the ends array leaves
      the fold ready-made; starts follow by shifting; ONE posexplode
      per CHUNK (corpus/2^mask_bits rows, never per-character rows)
      and one ``substring`` per chunk off the original document
      string.
    """
    mask = 1 << mask_bits
    chars = F.filter(F.split(F.col(text_col), ""), lambda x: x != "")
    d1 = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("__t"),
        chars.alias("__c"),
        F.size(chars).alias("__n"),
    )

    def step(acc, ch):
        r2 = (acc["r"] * 2 + _gear64(ch, mask)) % mask
        return F.struct(
            r2.alias("r"),
            (acc["i"] + 1).alias("i"),
            F.when(
                r2 == 0, F.concat(acc["e"], F.array(acc["i"] + 1))
            )
            .otherwise(acc["e"])
            .alias("e"),
        )

    def finish(acc):
        return F.when(
            F.coalesce(
                F.try_element_at(acc["e"], F.lit(-1)) == acc["i"],
                F.lit(False),
            ),
            acc["e"],
        ).otherwise(F.concat(acc["e"], F.array(acc["i"])))

    ends = F.aggregate(
        F.col("__c"),
        F.struct(
            F.lit(0).cast("long").alias("r"),
            F.lit(0).cast("int").alias("i"),
            F.array().cast("array<int>").alias("e"),
        ),
        step,
        finish,
    )
    d2 = d1.where(F.col("__n") > 0)
    d3 = d2.select("doc_id", "__t", ends.alias("__e"))
    starts = F.concat(
        F.array(F.lit(1)),
        F.transform(
            F.slice(F.col("__e"), 1, F.size(F.col("__e")) - 1),
            lambda e: e + 1,
        ),
    )
    d4 = d3.select(
        "doc_id",
        "__t",
        F.posexplode(
            F.arrays_zip(starts.alias("s"), F.col("__e").alias("e"))
        ).alias("chunk_idx", "z"),
    )
    return d4.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (F.col("z.e") - F.col("z.s") + 1).cast("long").alias("chunk_len"),
        md5_long(
            F.expr("substring(__t, z.s, z.e - z.s + 1)")
        ).alias("chunk_hash"),
    )


def cdc_chunks_arrow(
    docs: DataFrame,
    mask_bits: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Vectorized Arrow twin of :func:`cdc_chunks` — byte-identical
    output (parity-pinned by ``tests/test_cdc.py``), rendered as a
    ``mapInPandas`` numpy kernel instead of the expression-tree fold.

    Why a twin exists: Spark evaluates higher-order-function lambdas
    (``aggregate``/``filter``) in the INTERPRETED expression path —
    they never enter whole-stage codegen — so the declarative fold
    costs ~0.5 µs per character.  The kernel below does the same math
    as numpy array ops: codepoints via a single UTF-32 decode, the
    gear table as one fancy-index gather, and the rolling state
    ``h_i mod 2^mask_bits`` as ``mask_bits`` shifted adds (the
    recurrence's 2^lag weights vanish mod the mask past lag
    ``mask_bits``, so the sliding weighted sum IS the exact sequential
    state — same argument as the expression form).  Still a narrow
    map: no shuffle, embarrassingly parallel per Arrow batch, the
    streaming hot path's chunker.  The expression form remains the
    oracle-parity showcase and the plan the batch queries audit."""
    import numpy as np
    import pandas as pd
    from hashlib import md5

    mask = 1 << mask_bits
    tab = np.array([v % mask for v in _GEAR_TAB], dtype=np.int64)

    def kernel(batches):
        for pdf in batches:
            out_id, out_idx, out_len, out_hash = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None or len(text) == 0:
                    continue
                cp = np.frombuffer(
                    text.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                n = cp.shape[0]
                g = tab[np.minimum(cp, 255)]
                hi = np.flatnonzero(cp > 255)
                for j in hi:  # rare non-Latin-1 fallback, md5 per char
                    h = int(
                        md5(chr(int(cp[j])).encode("utf-8")).hexdigest()[:15],
                        16,
                    )
                    g[j] = h % mask
                acc = np.zeros(n, dtype=np.int64)
                for lag in range(min(mask_bits, n)):
                    acc[lag:] += g[: n - lag] << lag
                ends = np.flatnonzero((acc & (mask - 1)) == 0) + 1
                if ends.shape[0] == 0 or ends[-1] != n:
                    ends = np.append(ends, n)
                start = 0
                for idx, e in enumerate(ends):
                    chunk = text[start:e]
                    out_id.append(doc_id)
                    out_idx.append(idx)
                    out_len.append(e - start)
                    out_hash.append(
                        int(md5(chunk.encode("utf-8")).hexdigest()[:15], 16)
                    )
                    start = e
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_id, dtype="int64"),
                    "chunk_idx": pd.Series(out_idx, dtype="int64"),
                    "chunk_len": pd.Series(out_len, dtype="int64"),
                    "chunk_hash": pd.Series(out_hash, dtype="int64"),
                }
            )

    return docs.select(F.col(id_col).alias(id_col), text_col).mapInPandas(
        kernel,
        schema="doc_id long, chunk_idx long, chunk_len long, chunk_hash long",
    )


def cdc_dedup_summary(chunks: DataFrame) -> DataFrame:
    """One-row corpus summary of chunk-level duplication: total /
    distinct chunk counts, chunks appearing in more than one document,
    the maximum cross-document reuse of any single chunk, and mean
    chunk length — the numbers that size a chunk-store."""
    per_chunk = chunks.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.count_distinct("doc_id").alias("n_docs"),
        F.max("chunk_len").alias("chunk_len"),
    )
    return per_chunk.agg(
        F.sum("n_copies").cast("bigint").alias("total_chunks"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_chunks"),
        F.sum((F.col("n_docs") > 1).cast("long"))
        .cast("bigint")
        .alias("cross_doc_chunks"),
        F.max("n_docs").cast("bigint").alias("max_doc_reuse"),
        F.round(
            F.sum(F.col("chunk_len") * F.col("n_copies"))
            / F.sum("n_copies"),
            4,
        ).alias("mean_chunk_len"),
    )
