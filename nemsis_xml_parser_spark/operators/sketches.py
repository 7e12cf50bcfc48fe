"""Deterministic probabilistic sketches: Count-Min, Bloom, and HLL.

The three workhorse sketches of a 100 TB pipeline: HyperLogLog for
mergeable distinct counting, Count-Min for heavy-hitter frequency
estimation under a fixed memory budget, Bloom filters for distributed
membership pre-filtering before expensive joins.  (Spark's Apache
DataSketches HLL — ``hll_sketch_agg``/``hll_union_agg`` — is
pytest-covered in tests/test_sketches.py; the registered query uses the
deterministic register build below so the sketch itself is
cross-engine hash-checkable, not just rows-only.)

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


HLL_P = 9           # 2^9 = 512 registers
HLL_M = 1 << HLL_P
_HLL_RANK_MAX = 49  # rank word w has 48 bits; w = 0 -> rank 49
_HLL_SCALE = 1 << _HLL_RANK_MAX  # 2^49: makes SUM(2^-rank) an exact BIGINT


def hll_rank(w: Column) -> Column:
    """Position of the first set bit (from the top) of the 48-bit rank
    word, 1-based; w = 0 -> 49.  ``49 - length(bin(w))`` is exact
    integer arithmetic — ``bin`` drops leading zeros identically in
    Spark and DuckDB, so no float log2 at the boundary."""
    return F.when(w == 0, F.lit(_HLL_RANK_MAX)).otherwise(
        F.lit(_HLL_RANK_MAX) - F.length(F.bin(w))
    )


def hll_registers(
    keys: DataFrame, key_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """(group..., bucket, maxrank) deterministic-HLL register table.

    bucket comes from the 60-bit md5 slice, the rank word from the
    independent 48-bit slice (same double-hash family as Count-Min /
    Bloom / MinHash).  One key-grouped MAX aggregate — partial
    aggregation does the work map-side, and register tables built from
    disjoint shards merge by bucket-wise MAX (the mergeability that
    makes distinct counts tractable at 100 TB)."""
    group_cols = group_cols or []
    h1, h2 = _hash_pair(F.col(key_col).cast("string"))
    return (
        keys.select(
            *group_cols,
            (h1 % F.lit(HLL_M)).alias("bucket"),
            hll_rank(h2).alias("rank"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("maxrank"))
    )


def hll_merge(registers: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge register tables: bucket-wise MAX within the new grouping."""
    group_cols = group_cols or []
    return registers.groupBy(*group_cols, "bucket").agg(
        F.max("maxrank").alias("maxrank")
    )


def hll_estimate(registers: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """HLL estimate per group: (group..., n_set, v_zero, s_scaled,
    est_raw, est_std).

    s_scaled = Σ 2^(49-maxrank) + v_zero·2^49 is an exact BIGINT (≤
    512·2^49 < 2^59), so the harmonic mean Σ 2^-rank = s_scaled / 2^49
    is one exact double division and est_raw = α_m·m²/Σ is the same
    IEEE expression tree in both engines — bit-identical before the
    defensive ROUND(,6).  est_std applies Flajolet's small-range
    correction: when est_raw ≤ 2.5·m and zero registers remain, linear
    counting m·ln(m/V) replaces the (badly biased there) raw estimate;
    the branch is selected on the bit-identical est_raw, and ln is the
    only libm call (rounded to 6 dp — Java vs C++ log differ at most in
    the last ulp)."""
    group_cols = group_cols or []
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_set"),
        F.sum(
            # pyspark's shiftleft() only takes a literal shift — go via
            # SQL, where ShiftLeft accepts an expression shift amount
            F.expr(f"shiftleft(cast(1 as bigint), {_HLL_RANK_MAX} - maxrank)")
        ).alias("s_present"),
    )
    v_zero = F.lit(HLL_M) - F.col("n_set")
    s_scaled = F.col("s_present") + v_zero * F.lit(_HLL_SCALE)
    est_raw = (
        F.lit(0.7213)
        / (F.lit(1.0) + F.lit(1.079) / F.lit(float(HLL_M)))
        * F.lit(float(HLL_M))
        * F.lit(float(HLL_M))
        / (s_scaled.cast("double") / F.lit(float(_HLL_SCALE)))
    )
    est_lc = F.lit(float(HLL_M)) * F.log(
        F.lit(float(HLL_M)) / v_zero.cast("double")
    )
    est_std = F.when(
        (est_raw <= F.lit(2.5 * HLL_M)) & (v_zero > 0), est_lc
    ).otherwise(est_raw)
    return agg.select(
        *group_cols,
        F.col("n_set").cast("bigint").alias("n_set"),
        v_zero.cast("bigint").alias("v_zero"),
        s_scaled.cast("bigint").alias("s_scaled"),
        F.round(est_raw, 6).alias("est_raw"),
        F.round(est_std, 6).alias("est_std"),
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
