"""Deduplication operators for large-scale training-data pipelines.

Four tiers, cheapest-first — the standard web-scale dedup ladder:

1. ``exact_dedup``        — md5-fingerprint groupBy; one shuffle on the hash,
                            perfectly parallel at 100 TB.
2. ``ngram_jaccard_pairs``— exact shingle-set Jaccard via a shingle
                            self-join; quadratic in bucket size, so use only
                            on candidate sets (or small samples).
3. ``minhash_lsh_pairs``  — MinHash signatures + banded LSH: candidates are
                            pairs sharing a band bucket, verified with exact
                            Jaccard.  Near-linear: the only join is on band
                            keys, and true near-dups concentrate in buckets.
4. ``simhash_fingerprints`` — 32-bit SimHash; near-dups differ in ≤k bits.

All hashing is md5-derived (functions.hashing) so results are reproducible
in the DuckDB oracle and across engines; at production scale the same API
can switch to xxhash64 for ~3× hash throughput.

Skew note: shingle self-joins can skew on stop-shingles; ``minhash_lsh_pairs``
avoids that by joining on (band_idx, band_hash) whose cardinality is
controlled by the band count, and AQE's skew-join splitting handles residual
hot buckets.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions import hashing as H
from ..functions import text as T


def exact_dedup(
    df: DataFrame, text_col: str = "text", order_col: str = "doc_id"
) -> DataFrame:
    """Keep-first exact dedup on the normalized-text fingerprint.

    row_number over the fingerprint partition (not dropDuplicates) so the
    survivor is deterministic: lowest ``order_col`` wins.
    """
    w = Window.partitionBy("__fprint").orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__fprint", T.fingerprint(F.col(text_col)))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__fprint", "__rn")
    )


def _distinct_shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, shingle) distinct pairs — the set representation of each doc."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(T.word_ngrams(F.col(text_col), n))).alias(
                "shingle"
            ),
        )
        .distinct()
    )


def _jaccard_from_shingles(shingles: DataFrame, threshold: float) -> DataFrame:
    """Pairs with |A∩B|/|A∪B| ≥ threshold from a (doc_id, shingle) relation."""
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = F.col("n_common").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("n_common")
    )
    return (
        common.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .where(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """Exact n-gram Jaccard pairs ≥ threshold (quadratic — sample/candidate
    sets only; the LSH variant below is the 100 TB path)."""
    return _jaccard_from_shingles(_distinct_shingles(df, text_col, id_col, n), threshold)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    n: int = 3,
    fast: bool = False,
) -> DataFrame:
    """(doc_id, sig ARRAY<BIGINT>) MinHash signatures.

    Two projections: the md5 hash pairs are materialized first so each
    shingle is hashed exactly once, then the k family members derive from
    double hashing (functions.hashing.minhash_signature_from_pairs)."""
    shingles = F.array_distinct(T.word_ngrams(F.col(text_col), n))
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            H.shingle_hash_pairs(shingles, fast).alias("_hp"),
        )
        .select(
            "doc_id",
            H.minhash_signature_from_pairs(F.col("_hp"), num_hashes).alias("sig"),
        )
    )


def minhash_band_keys(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    fast: bool = False,
) -> DataFrame:
    """(doc_id, band_idx, band_hash) — the LSH band-bucket keys every
    MinHash consumer joins on.  Factored out so the streaming historical
    index (streaming/dedup_index.py) builds byte-identical keys to the
    batch pair generator below."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, n, fast)

    def band_key(parts):
        joined = F.concat_ws(",", *parts)
        if fast:
            return F.xxhash64(joined).cast("string")
        return F.md5(joined)

    return sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    band_key(
                        [
                            F.col("sig")[i].cast("string")
                            for i in range(
                                b * rows_per_band, (b + 1) * rows_per_band
                            )
                        ]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )


def minhash_band_keys_arrow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """Vectorized Arrow twin of :func:`minhash_band_keys` (md5 family) —
    byte-identical output, parity-pinned by tests/test_dedup_index.py.

    Why a twin exists (the cdc_chunks_arrow argument, SCALING.md r12):
    the expression form's shingle transform + 16 double-hash members +
    array_min all run through INTERPRETED higher-order-function lambdas
    (~0.5 µs/element — they never enter whole-stage codegen), which
    dominates a microbatch latency budget.  The kernel does the same
    math per Arrow batch: one hashlib-md5 digest per DISTINCT shingle
    (bytes 0-7.5 → h1, 8-14 → h2 — exactly substring(md5,1,15)/(17,12)
    of the hex form), the Kirsch-Mitzenmacher members as ONE numpy
    (shingles × k) broadcast mod M61 with a reduceat min per doc
    segment, and the band key as md5 of the comma-joined decimal
    signature slice.  Tokenization twins the expression form exactly:
    an ASCII ``\\s+`` split (Java ``\\s`` is ASCII-only by default,
    same class as Python's ``re.ASCII`` ``\\s``) with empty tokens
    filtered — identical to ``filter(split(trim(col),'\\s+'), t!='')``
    because Spark's trim strips only spaces and the empty-token filter
    absorbs any leading/trailing whitespace run.  No extra strip: a
    Java-trim-style strip of ALL chars <= U+0020 would drop leading /
    trailing CONTROL chars the expression form keeps inside tokens
    (ADVICE r13 high).  Still a narrow map — no
    shuffle, parallel per Arrow batch; the streaming history-index hot
    path.  The expression form remains the oracle-parity showcase and
    the batch queries' audited plan."""
    import re
    from hashlib import md5

    import numpy as np
    import pandas as pd

    rows_per_band = num_hashes // bands
    prime = H.MINHASH_PRIME
    sentinel = 2**62
    ws = re.compile(r"\s+", re.ASCII)
    ks = np.arange(num_hashes, dtype=np.int64)

    def kernel(batches):
        for pdf in batches:
            digests, offsets = [], [0]
            for text in pdf[text_col]:
                toks = ws.split(text) if text else []
                toks = [t for t in toks if t]
                grams = {
                    " ".join(toks[i : i + n])
                    for i in range(len(toks) - n + 1)
                }
                digests.extend(md5(g.encode("utf-8")).digest() for g in grams)
                offsets.append(len(digests))
            n_docs = len(pdf)
            sigs = np.full((n_docs, num_hashes), sentinel, dtype=np.int64)
            if digests:
                # bulk h1/h2 extraction: one frombuffer over the joined
                # digests instead of two int.from_bytes per shingle
                raw = np.frombuffer(b"".join(digests), dtype=np.uint8)
                raw = raw.reshape(-1, 16).astype(np.int64)
                w7 = 256 ** np.arange(6, -1, -1, dtype=np.int64)
                # hex[0:15] = 60 bits: 7 whole bytes (< 2^56, int64-safe;
                # a naive 8-byte dot would overflow) then the high nibble
                # of byte 7; hex[16:28] = bytes 8..13
                h1 = ((raw[:, :7] @ w7) << 4) | (raw[:, 7] >> 4)
                h2 = raw[:, 8:14] @ w7[1:]
                members = h1[:, None] + ks[None, :] * h2[:, None]
                if num_hashes > 4096:
                    # h1 < 2^60 and k*h2 < k*2^48, so for k <= 4095 the
                    # sum is < 2^60 + 2^60 - 2^48 < M61 and the mod is
                    # the identity — skipping it halves the matrix pass
                    members %= prime
                starts = np.asarray(offsets[:-1])
                nonempty = starts < np.asarray(offsets[1:])
                mins = np.minimum.reduceat(members, starts[nonempty], axis=0)
                sigs[nonempty] = mins
            out_id, out_idx, out_hash = [], [], []
            for row_id, sig in zip(pdf[id_col], sigs):
                for b in range(bands):
                    part = sig[b * rows_per_band : (b + 1) * rows_per_band]
                    key = ",".join(str(int(v)) for v in part)
                    out_id.append(row_id)
                    out_idx.append(b)
                    out_hash.append(md5(key.encode("ascii")).hexdigest())
            yield pd.DataFrame(
                {"doc_id": out_id, "band_idx": out_idx, "band_hash": out_hash}
            )

    return df.select(F.col(id_col).alias(id_col), text_col).mapInPandas(
        kernel, schema="doc_id long, band_idx int, band_hash string"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.1,
    fast: bool = False,
    max_bucket: int | None = None,
    candidates_only: bool = False,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-verified.

    The defaults (16 hashes, 4 bands of 4 rows) are the planner choice
    ``lsh_planner.plan_minhash_lsh(0.9, num_hashes=16, fp_jaccard=0.2)``:
    ≥95% collision recall for near-dup families (J ≥ 0.9) with ≤5%
    candidate rate at J ≤ 0.2 — derive (bands, rows) for other operating
    points from that helper instead of hand-tuning.

    ``candidates_only=True`` returns the distinct candidate pair list
    (doc_a, doc_b) BEFORE exact-Jaccard verification — the quantity the
    band-bucket expansion actually inflates under skew, which the soak
    regression gate (tests/test_soak.py) counts directly.

    signature → ``bands`` bands of ``num_hashes//bands`` rows → band-bucket
    join on (band_idx, md5(band)) → candidate pairs → exact Jaccard filter.
    The candidate join is equi on the band key, so it shuffles only the
    (small) signature relation — never the corpus text.

    ``max_bucket`` is the adversarial-skew guard (measured need: a corpus
    where 20% of docs share one boilerplate template inflates the hot band
    bucket to 4% of all rows and the all-pairs expansion to ~50x the
    uniform case — tools/scale_soak.py '10x-hot' tier).  Buckets larger
    than ``max_bucket`` emit STAR edges (every member → the bucket's min
    doc_id) instead of all pairs: O(bucket) candidates instead of
    O(bucket²), still exact-verified.  Guarantee (precisely): within an
    oversized bucket, members whose verified similarity TO THE
    REPRESENTATIVE (min doc_id) clears ``threshold`` stay connected — a
    REFINEMENT of the uncapped clustering, not equality.  A cluster
    linked only through non-representative edges (chain/hub-shaped: A~B
    and B~C clear the threshold but neither clears it against the
    representative) MAY split under capping even though its members are
    pairwise near-dups.  The hypothesis test
    (tests/test_dedup.py:star-mode) asserts the refinement property in
    general, plus cluster EQUALITY on template-family corpora — the case
    where every member is similar to the representative (measured on the
    10x-hot corpus: the 8.8k-doc giant cluster splits into
    template-family clusters ≤ 1.3k, while wall-clock drops
    762 s → 28 s).  That trade — bounded recall loss on
    stop-shingle collisions for a 27x speedup — is the standard
    production posture for web-scale dedup."""
    banded = minhash_band_keys(
        df, text_col, id_col, num_hashes, bands, n, fast
    )
    if max_bucket is not None:
        # one aggregate per band bucket: size + representative (min doc_id).
        # Small buckets keep the exact all-pairs expansion; oversized ones
        # collapse to star edges around the representative.
        stats = banded.groupBy("band_idx", "band_hash").agg(
            F.count(F.lit(1)).alias("bsz"), F.min("doc_id").alias("rep")
        )
        banded = banded.join(stats, ["band_idx", "band_hash"])
        small = banded.where(F.col("bsz") <= max_bucket)
        a = small.alias("a")
        b = small.alias("b")
        small_pairs = a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        star_pairs = (
            banded.where((F.col("bsz") > max_bucket) & (F.col("doc_id") != F.col("rep")))
            .select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        )
        candidates = small_pairs.unionAll(star_pairs).distinct()
    else:
        a = banded.alias("a")
        b = banded.alias("b")
        candidates = (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )
    if candidates_only:
        return candidates
    # exact verification on candidates only.  Each doc's DISTINCT shingle
    # set is collected ONCE as an array and joined onto the candidate
    # pairs; the intersection count is computed codegen-side with
    # array_intersect.  Same exact Jaccard as the explode-join shape this
    # replaces, but the (candidate x shingle) exploded relation is never
    # materialized or shuffled — the old plan shuffled it on
    # (doc_b, shingle) and then again for the per-pair groupBy, which
    # SOAK_ladder_r08 measured as the dominant hot-tier stage.  Shuffle
    # volume is the same order (each doc's shingles ship once per pair
    # touching it either way); the two extra wide shuffles are gone.
    sets_ = (
        _distinct_shingles(df, text_col, id_col, n)
        .groupBy("doc_id")
        .agg(F.collect_list("shingle").alias("shs"))
    )
    va = sets_.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a"))
    vb = sets_.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"))
    scored = (
        candidates.join(va, "doc_a")
        .join(vb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("shs_a", "shs_b")).alias("n_common"),
            F.size("shs_a").alias("sz_a"),
            F.size("shs_b").alias("sz_b"),
        )
    )
    jac = F.col("n_common").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("n_common")
    )
    # n_common >= 1 replicates the old inner-join semantics: pairs with
    # no shared shingle never surfaced (they vanished in the shingle
    # equi-join), even at threshold 0.0.
    return (
        scored.where((F.col("n_common") >= 1) & (jac >= threshold))
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def simhash_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    fast: bool = False,
) -> DataFrame:
    """(doc_id, simhash) — near-dups have small Hamming distance."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        H.simhash64(T.tokens(F.col(text_col)), bits=bits, fast=fast).alias("simhash"),
    )


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs by Hamming distance ≤ k.

    Candidate generation by bucketing on bit-chunks (pigeonhole: a pair with
    ≤k differing bits shares at least one of k+1 chunks), then exact Hamming
    verification — avoids the quadratic cross join at scale."""
    fp = simhash_fingerprints(df, text_col, id_col, bits)
    chunks = max_hamming + 1
    chunk_bits = bits // chunks
    banded = fp.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), c * chunk_bits)
                    .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                    for c in range(chunks)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            H.hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """DIRECTED shingle-containment pairs: containment(a → b) =
    |shingles(a) ∩ shingles(b)| / |shingles(a)| — the asymmetric
    near-dup measure (Broder's containment, alongside resemblance):
    a quote, excerpt, or boilerplate-wrapped copy of ``a`` inside a
    larger ``b`` scores high even when Jaccard is low because ``b``'s
    extra content inflates the union.  Returns BOTH directions
    (doc_a != doc_b, no canonical ordering — direction is the point).

    Quadratic shingle self-join — sample/candidate sets only, like
    ngram_jaccard_pairs; at scale the LSH candidate generator bounds
    the pair set first and this verify runs on candidates."""
    shingles = _distinct_shingles(df, text_col, id_col, n)
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = shingles.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = shingles.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    cont = F.col("n_common").cast("double") / F.col("sz_a")
    return (
        common.join(
            F.broadcast(
                sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
            ),
            "doc_a",
        )
        .where(cont >= threshold)
        .select("doc_a", "doc_b", F.round(cont, 6).alias("containment"))
    )
