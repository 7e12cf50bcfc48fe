"""Deterministic probabilistic-sketch operators: Count-Min and Bloom.

The two workhorse sketches a 100 TB pipeline runs beside HLL (which is
registered as the rows-only ``sketch_hll_mergeable`` / ``agg_approx_
distinct`` pair): Count-Min for heavy-hitter frequency estimation under
a fixed memory budget, Bloom filters for distributed membership
pre-filtering before expensive joins.

Both are built from the SAME md5 double-hash family as the MinHash
operators (functions.hashing: h1 = 60 digest bits, h2 = 48 digest bits,
member_i = (h1 + i·h2) mod M61 — Kirsch–Mitzenmacher), so every cell /
bit position is reproducible in ANSI SQL and the estimates are fully
hash-oracle-checkable — these sketches earn real driver rows, not the
weaker rows-only check.

Scale shape — both sketches are TABLES, not driver-side bitsets:

* Count-Min: one exact per-key aggregate (the mergeable build — partial
  aggregation does the heavy lifting map-side), then d rows per key into
  a (row, bucket) cell aggregate of d·w rows total.  Point queries join
  the probe's d positions against the cell table and take MIN.
* Bloom: the bit-set is a DISTINCT (position) frame (≤ m rows) built in
  one explode + distinct; membership probes are an equi-join on
  position, claiming membership when all k positions match.  At scale
  the bit frame broadcasts (m is KB-sized by construction) — exactly
  how engines push runtime bloom filters into scans.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions import hashing as H

M61 = (1 << 61) - 1


def _hash_pair(key: Column) -> tuple[Column, Column]:
    """(h1, h2) — 60- and 48-bit non-negative BIGINTs from one md5.
    DuckDB twins: CAST(('0x'||substr(md5(k),1,15)) AS BIGINT) and
    substr(md5(k),17,12)."""
    return (
        H.md5_long(key),
        F.conv(F.substring(F.md5(key), 17, 12), 16, 10).cast("long"),
    )


def _positions(h1: Column, h2: Column, k: int, m: int) -> Column:
    """ARRAY<BIGINT> of the k family positions in [0, m)."""
    return F.array(
        *[(h1 + F.lit(i) * h2) % F.lit(M61) % F.lit(m) for i in range(k)]
    )


def countmin_cells(
    keyed: DataFrame, key_col: str, count_col: str, depth: int, width: int
) -> DataFrame:
    """(i, pos, total) Count-Min cell table from exact per-key counts.

    ``keyed`` is the output of the upstream exact aggregate — the
    mergeable-build contract: cells are sums of key counts, so two cell
    tables built from disjoint corpus shards merge by cell-wise
    addition."""
    h1, h2 = _hash_pair(F.col(key_col).cast("string"))
    return (
        keyed.select(
            F.col(count_col).alias("cnt"),
            F.posexplode(_positions(h1, h2, depth, width)).alias("i", "pos"),
        )
        .groupBy("i", "pos")
        .agg(F.sum("cnt").cast("bigint").alias("total"))
    )


def countmin_estimate(
    probes: DataFrame, cells: DataFrame, key_col: str, depth: int, width: int
) -> DataFrame:
    """Point-query the cell table: per probe key, MIN over the d row
    cells its positions hash to.  Returns (key, cm_estimate)."""
    h1, h2 = _hash_pair(F.col(key_col).cast("string"))
    pp = probes.select(
        F.col(key_col),
        F.posexplode(_positions(h1, h2, depth, width)).alias("i", "pos"),
    )
    return (
        pp.join(F.broadcast(cells), ["i", "pos"])
        .groupBy(key_col)
        .agg(F.min("total").cast("bigint").alias("cm_estimate"))
    )


def bloom_bits(keys: DataFrame, key_col: str, k: int, m: int) -> DataFrame:
    """(pos) DISTINCT bit-position frame — the Bloom filter as a table."""
    h1, h2 = _hash_pair(F.col(key_col).cast("string"))
    return (
        keys.select(F.explode(_positions(h1, h2, k, m)).alias("pos"))
        .distinct()
    )


def bloom_claims(
    probes: DataFrame, bits: DataFrame, key_col: str, k: int, m: int
) -> DataFrame:
    """Per probe key: claimed (all k positions set → 1).  The bit frame
    broadcasts — it is ≤ m rows by construction."""
    h1, h2 = _hash_pair(F.col(key_col).cast("string"))
    pp = probes.select(
        F.col(key_col), F.explode(_positions(h1, h2, k, m)).alias("pos")
    )
    hits = (
        pp.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy(key_col)
        .agg(F.sum(F.coalesce("hit", F.lit(0))).alias("n_hits"))
    )
    return hits.select(
        key_col, (F.col("n_hits") == k).cast("int").alias("claimed")
    )
