"""Deterministic hashing primitives for dedup operators.

Two interchangeable hash families behind one API:

* ``fast=False`` (default): MD5-derived, so the same signatures are
  computable in the DuckDB oracle (md5 is engine-independent; Spark's
  xxhash64/murmur are not).  Registered queries use this for oracle
  parity.
* ``fast=True``: Spark's native ``xxhash64`` — no hex detour through
  conv/substring, ~3× cheaper per hash, the production setting when
  cross-engine reproducibility isn't needed.  Same output shape
  (non-negative BIGINTs in the same bit ranges), different values.

All expressions are built-ins — JVM-side, codegen-friendly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

_MASK60 = (1 << 60) - 1
_MASK48 = (1 << 48) - 1


def md5_long(col: Column, fast: bool = False) -> Column:
    """Non-negative 60-bit BIGINT hash.  Default: first 15 hex chars of md5
    (DuckDB twin: ``CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)`` — see
    plans.llm_ops oracles).  ``fast=True``: masked xxhash64."""
    if fast:
        return F.xxhash64(col).bitwiseAND(F.lit(_MASK60).cast("long"))
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def seeded_hash(col: Column, seed: int, fast: bool = False) -> Column:
    """k-th member of the hash family: hash(seed || value) → BIGINT."""
    if fast:
        return F.xxhash64(F.lit(seed), col).bitwiseAND(
            F.lit(_MASK60).cast("long")
        )
    return md5_long(F.concat(F.lit(f"{seed}:"), col))


MINHASH_PRIME = (1 << 61) - 1  # Mersenne prime M61


def minhash_signature(
    shingles: Column, num_hashes: int, fast: bool = False
) -> Column:
    """ARRAY<BIGINT> minhash signature of an ARRAY<STRING> shingle set.

    ONE md5 per shingle; the k-member hash family comes from double hashing
    (Kirsch–Mitzenmacher): hash_k = (h1 + k·h2) mod M61 with h1 = 60 bits,
    h2 = 48 bits of the digest — so k·h2 never overflows BIGINT for k ≤
    ~8000.  ~16× cheaper than one md5 per family member at num_hashes=16.
    Empty sets → 2^62 sentinel so unions behave."""
    return minhash_signature_from_pairs(
        shingle_hash_pairs(shingles, fast), num_hashes
    )


def shingle_hash_pairs(shingles: Column, fast: bool = False) -> Column:
    """ARRAY<STRUCT<h1,h2>> — one digest per shingle (two xxhash64 calls in
    fast mode; both far cheaper than per-family-member hashing).
    Materialize this in its own projection (withColumn/select) before
    fanning out to family members, so the digest is provably computed
    once."""
    if fast:
        return F.transform(
            shingles,
            lambda s: F.struct(
                F.xxhash64(s)
                .bitwiseAND(F.lit(_MASK60).cast("long"))
                .alias("h1"),
                F.xxhash64(F.lit(1), s)
                .bitwiseAND(F.lit(_MASK48).cast("long"))
                .alias("h2"),
            ),
        )
    return F.transform(
        shingles,
        lambda s: F.struct(
            F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(F.md5(s), 17, 12), 16, 10).cast("long").alias("h2"),
        ),
    )


def minhash_signature_from_pairs(pairs: Column, num_hashes: int) -> Column:
    sentinel = F.lit(2**62).cast("long")

    def member_k(k: int):
        def fn(p):
            return (p["h1"] + F.lit(k).cast("long") * p["h2"]) % F.lit(MINHASH_PRIME)

        return fn

    sigs = [
        F.coalesce(F.array_min(F.transform(pairs, member_k(k))), sentinel)
        for k in range(num_hashes)
    ]
    return F.array(*sigs)


def simhash64(tokens_col: Column, bits: int = 32, fast: bool = False) -> Column:
    """SimHash over an ARRAY<STRING> token column (default 32 bits).

    Per token: 60-bit hash (md5-derived, or masked xxhash64 with
    ``fast=True``); per bit: +1 if set else -1; final
    bit = sign of the sum.  Single pass: ONE aggregate over the tokens with
    an ARRAY<LONG> vote accumulator (zip_with per token), then one fold of
    the vote vector into the bit pattern.  The earlier per-bit formulation
    (one aggregate per bit) inlined the md5 transform ``bits`` times and
    re-walked the array per bit — ~9 s → sub-second per 500-doc batch.
    """
    hashed = F.transform(tokens_col, lambda s: md5_long(s, fast))
    masks = F.array(*[F.lit(1 << bit).cast("long") for bit in range(bits)])
    votes = F.aggregate(
        hashed,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda a, m: a
            + F.when(h.bitwiseAND(m) != F.lit(0).cast("long"), F.lit(1)).otherwise(
                F.lit(-1)
            ).cast("long"),
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            masks,
            lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two BIGINT bit-patterns via bit_count(xor)."""
    return F.bit_count(a.bitwiseXOR(b))
