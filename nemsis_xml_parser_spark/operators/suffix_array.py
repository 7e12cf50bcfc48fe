"""Distributed suffix-array construction by prefix doubling.

The corpus-scale exact-substring primitive: Lee et al.'s training-data
deduplication builds a suffix array over the concatenated corpus to
find repeated substrings ("Deduplicating Training Data Makes Language
Models Better"); ``dedup_substring_spans`` covers the fixed-L gram
form, this operator builds the FULL lexicographic suffix order with
the Manber–Myers prefix-doubling recurrence re-expressed as O(log n)
rounds of equi-joins + distributed dense ranking (sort-based SA
construction is the standard shared-nothing approach).

No counterpart in the reference (a single-threaded psycopg2 ETL);
§2.I-10 text-tier extension.

Round k orders positions by their first 2^k characters, represented as
the pair ``(rank_k[i], rank_k[i + 2^k])`` — both O(1) lookups into the
previous round's rank table via a self equi-join on position, never a
string comparison.  Ranks come from a rows-direct two-pass global
dense rank (``_ranked_rows`` — the ``prefix_sum.global_dense_rank``
shape minus the distinct pass and the join-back, which buy nothing
when the pairs are near-distinct anyway): pairs are range-partitioned,
locally dense-ranked (window input bounded by n / num_ranges), and
offset by broadcast per-partition distinct counts — no single-reducer
window anywhere, so every round is a plain shuffle-and-rank the way a
TeraSort round is, and exactly ONE eager job per round.

A position past the end of the corpus ranks as 0 (below every real
rank): if suffix A is a proper prefix of suffix B then A < B, which is
exactly the tie-break the sentinel encodes, so no terminator character
needs to exist in the data.

Early stop: once ``max(rank) == n`` every rank is unique and the order
is final — on natural text that happens after 3–5 rounds (most 8–32
character windows are already unique), far below the log2(n) worst
case.  The probe rides the per-round ``cut_lineage`` materialization
via ``Observation`` (the convergence-probe discipline of
``operators/components.py``), costing no extra job.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation, Window

from .lineage import cut_lineage

# Per-document separator appended before concatenation: sorts below
# every printable ASCII char in both engines (byte 0x01), so a suffix
# that crosses a document boundary compares consistently with DuckDB's
# byte-wise substr ordering.
DOC_SEP = "\x01"


def corpus_positions(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_chars: int = 300,
) -> tuple[DataFrame, DataFrame]:
    """(bounded doc tier) -> (chars, doc_offsets).

    ``chars``: one row per corpus position — (pos, c, doc_id,
    local_pos), where pos is the 0-based offset into the concatenation
    of the tier's documents in doc_id order (each sanitized to
    printable ASCII, capped at ``max_chars``, and terminated by
    ``DOC_SEP``).  ``doc_offsets``: one row per tier document —
    (doc_id, doc_text, doc_len, doc_off).

    The doc-offset running sum is a window over the TIER's documents —
    bounded by the tier size the caller selected, not by corpus volume
    (at an unbounded tier, swap in ``scalable_running_sum`` over
    doc_id; the chars explode is per-document and already narrow).
    """
    clean = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.concat(
            F.substring(
                F.regexp_replace(
                    F.coalesce(F.col(text_col), F.lit("")), "[^ -~]", ""
                ),
                1,
                max_chars,
            ),
            F.lit(DOC_SEP),
        ).alias("doc_text"),
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    offsets = clean.withColumn("doc_len", F.length("doc_text")).withColumn(
        "doc_off",
        F.coalesce(F.sum("doc_len").over(w), F.lit(0)).cast("long"),
    )
    chars = (
        offsets.select(
            "doc_id",
            "doc_off",
            "doc_text",
            F.explode(F.sequence(F.lit(1), F.col("doc_len"))).alias("lp"),
        )
        .select(
            (F.col("doc_off") + F.col("lp") - 1).alias("pos"),
            F.expr("substring(doc_text, lp, 1)").alias("c"),
            "doc_id",
            (F.col("lp") - 1).cast("long").alias("local_pos"),
        )
    )
    return chars, offsets


def _alpha_ranks(chars: DataFrame) -> tuple[DataFrame, int, bool]:
    """Initial per-position ranks from the character dictionary.
    Returns (cur PINNED (pos, r), n, all_distinct)."""
    alphabet = chars.select("c").distinct()
    # window over the distinct-character dictionary — bounded by the
    # printable-ASCII alphabet (<= 96 rows), never by corpus size
    alpha_rank = alphabet.withColumn(
        "r", F.dense_rank().over(Window.orderBy("c")).cast("long")
    )
    obs = Observation()
    cur = (
        chars.join(F.broadcast(alpha_rank), "c")
        .select("pos", "r")
        .observe(obs, F.count(F.lit(1)).alias("n"), F.max("r").alias("mx"))
        .transform(cut_lineage)
    )
    n = obs.get["n"] or 0
    mx = obs.get["mx"] or 0
    return cur, n, mx >= n


def _paired(cur: DataFrame, d: int) -> DataFrame:
    """(pos, r1, r2): this round's prefix-doubling pair — r2 = the rank
    d positions ahead, 0 past the end (the prefix-of tie-break)."""
    shifted = cur.select(
        (F.col("pos") - d).alias("pos"), F.col("r").alias("r2")
    )
    return cur.join(shifted, "pos", "left").select(
        "pos",
        F.col("r").alias("r1"),
        F.coalesce("r2", F.lit(0)).alias("r2"),
    )


def _ranked_rows(
    paired: DataFrame, num_ranges: int
) -> tuple[DataFrame, bool]:
    """Rows-direct two-pass global dense rank of the (r1, r2) pairs —
    the ``global_dense_rank`` shape WITHOUT the distinct pass and
    without the join-back (positions carry their ranks directly), which
    removes two pair-sized exchanges per round; the all-ranks-distinct
    termination probe rides the pin's ``observe`` as max(per-pair
    count) == 1, so no dedicated probe job exists either (guide §1.4,
    §2.4).  Rank correctness does not depend on where the sampled range
    boundaries fall; only the _pid consistency between the local-rank
    window and the offsets aggregate is load-bearing, and the eager pin
    freezes _pid as data before either branch reads it (the
    ``prefix_sum`` discipline).  Returns (ranked LAZY (pos, r),
    all_distinct)."""
    obs = Observation()
    ranged = (
        paired.repartitionByRange(num_ranges, F.col("r1"), F.col("r2"))
        .withColumn("_pid", F.spark_partition_id())
        # duplicate probe: a window clustered by the pair key — range
        # partitioning on (r1, r2) already satisfies it, no exchange
        .withColumn(
            "_dup", F.count(F.lit(1)).over(Window.partitionBy("r1", "r2"))
        )
        .observe(obs, F.max("_dup").alias("dups"))
        .transform(cut_lineage)
    )
    local = ranged.withColumn(
        "_lr",
        F.dense_rank().over(Window.partitionBy("_pid").orderBy("r1", "r2")),
    )
    counts = ranged.groupBy("_pid").agg(
        F.countDistinct("r1", "r2").alias("_ct")
    )
    ca = counts.select(F.col("_pid").alias("_pa"))
    cb = counts.select(F.col("_pid").alias("_pb"), "_ct")
    offsets = (
        ca.join(F.broadcast(cb), F.col("_pb") < F.col("_pa"))
        .groupBy("_pa")
        .agg(F.sum("_ct").alias("_off"))
    )
    ranked = (
        local.join(
            F.broadcast(offsets), local["_pid"] == offsets["_pa"], "left"
        )
        .select(
            "pos",
            (F.coalesce(F.col("_off"), F.lit(0)) + F.col("_lr"))
            .cast("long")
            .alias("r"),
        )
    )
    dups = obs.get["dups"] or 0
    return ranked, dups <= 1


# Corpus-position count below which the whole prefix-doubling ladder
# runs as ONE single-task Arrow batch (the Lattanzi filtering endgame —
# components.union_find_local / mst.kruskal_local / bpe.BPE_LOCAL_MAX
# convention): at the bound the (pos, r) state is ~32 MB and the numpy
# doubling replay is sub-second, versus O(log n) sequential shuffle-
# and-pin rounds x local-mode job latency.  At scale the guard fails
# and the distributed rounds are untouched.
SA_LOCAL_MAX = 2_000_000


def _sa_local(cur: DataFrame, max_rounds: int) -> DataFrame:
    """Single-task twin of the prefix-doubling loop over the pinned
    alpha-rank frame — (pos, r) in, (pos, r) out with the identical
    round ladder: per round the (r1, r2) pair at doubling offset d
    (r2 = 0 past the end), then a dense rank by (r1, r2) ascending —
    ``np.unique``'s sorted inverse IS that dense rank, and the packed
    key r1*(n+1)+r2 preserves the lexicographic order exactly (both
    ranks <= n, n <= SA_LOCAL_MAX so the key fits int64).  Loop
    conditions replicate the distributed loop (all-distinct early
    stop, d < n, max_rounds), so ranks are bit-identical
    (tests/test_suffix_array.py parity covers both paths)."""
    import pandas as pd

    def finish(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        pos = pdf["pos"].to_numpy(np.int64)
        r = pdf["r"].to_numpy(np.int64)
        order = np.argsort(pos)
        pos = pos[order]
        r = r[order]
        n = int(pos.shape[0])
        d = 1
        rounds = 0
        while d < n and rounds < max_rounds:
            if np.unique(r).shape[0] == n:  # all-distinct early stop
                break
            idx = np.searchsorted(pos, pos + d)
            safe = np.minimum(idx, n - 1)
            valid = (idx < n) & (pos[safe] == pos + d)
            r2 = np.where(valid, r[safe], 0)
            key = r * np.int64(n + 1) + r2
            _, inv = np.unique(key, return_inverse=True)
            r = inv.astype(np.int64) + 1
            d *= 2
            rounds += 1
        return pd.DataFrame({"pos": pos, "r": r})

    return (
        cur.select("pos", "r")
        .groupBy(F.lit(1).alias("__g"))
        .applyInPandas(lambda pdf: finish(pdf), "pos long, r long")
    )


def suffix_array_prefix_doubling(
    chars: DataFrame,
    max_rounds: int = 40,
    num_ranges: int = 8,
    local_max: int = SA_LOCAL_MAX,
) -> DataFrame:
    """(pos, c, ...) -> (pos, sa_rank): the 1-based lexicographic rank
    of each suffix of the corpus string the positions spell out.

    ``max_rounds`` is a safety bound only — the loop exits when ranks
    are all-distinct or the doubling offset passes the corpus length,
    whichever is first (<= ceil(log2(n)) rounds always).  When the
    position count (off the alpha-rank pin's observe) fits
    ``local_max`` the whole ladder runs as ONE lazy single-task Arrow
    batch (``_sa_local`` — zero per-round jobs; pass ``local_max=0``
    to force the distributed path, as the parity tests do); otherwise
    one eager job per round (the ``_ranked_rows`` pin) and the rank
    computation itself stays lazy and folds into the next round's (or
    the caller's) job.
    """
    cur, n, done = _alpha_ranks(chars)
    if not done and n and n <= local_max:
        return _sa_local(cur, max_rounds).select(
            "pos", F.col("r").alias("sa_rank")
        )
    d = 1
    rounds = 0
    while not done and d < n and rounds < max_rounds:
        cur, done = _ranked_rows(_paired(cur, d), num_ranges)
        d *= 2
        rounds += 1
    return cur.select("pos", F.col("r").alias("sa_rank"))


def suffix_array_with_history(
    chars: DataFrame, num_ranges: int = 8
) -> tuple[DataFrame, list[tuple[int, DataFrame]]]:
    """Prefix doubling that RETAINS the duplicate-bearing rank tables.

    Returns ``(sa, walk_history)`` where ``sa`` is (pos, sa_rank) as in
    ``suffix_array_prefix_doubling`` and ``walk_history`` is
    ``[(span, ranks)]`` with ranks = (pos, r) ordering positions by
    their first ``span`` characters.  rank_span[i] == rank_span[j] iff
    the two length-``span`` prefixes are identical (a suffix shorter
    than ``span`` never ties anything — the 0 sentinel encodes its
    length class), which is exactly the predicate the LCP binary walk
    needs.

    The ladder early-stops at the first ALL-DISTINCT span s exactly
    like ``suffix_array_prefix_doubling``, because all-distinct ranks
    at span s mean no two suffixes share an s-prefix, i.e. **max LCP
    <= s - 1** — and the retained spans 1, 2, ..., s/2 sum to exactly
    s - 1, so the binary decomposition can reach every possible LCP
    value.  The all-distinct final table itself is EXCLUDED from
    walk_history (its equality test can never fire); on natural text
    that leaves ~3-5 duplicate-bearing levels instead of the full
    log2(n) ladder.
    """
    cur, n, done = _alpha_ranks(chars)
    history: list[tuple[int, DataFrame]] = []
    d = 1
    while not done and d < n:
        history.append((d, cur))  # cur still has duplicate ranks
        ranked, done = _ranked_rows(_paired(cur, d), num_ranges)
        # unlike the plain SA loop, every retained rank table is read
        # MANY times by the LCP binary walk — pin each round's result
        cur = cut_lineage(ranked)
        d *= 2
    sa = cur.select("pos", F.col("r").alias("sa_rank"))
    return sa, history


def lcp_adjacent(
    sa: DataFrame, history: list[tuple[int, DataFrame]]
) -> DataFrame:
    """(pos, sa_rank) + rank history -> one row per ADJACENT suffix pair
    in lexicographic order: (sa_rank, pos_a, pos_b, lcp).

    The classic rank-table LCP walk: descend the spans (largest first);
    whenever rank_span[pos_a + acc] == rank_span[pos_b + acc], the next
    ``span`` characters match and ``acc += span`` — a binary
    decomposition of the LCP into O(log n) EQUI-joins against the
    retained rank tables (two lookups per level), never a character
    comparison.  The maximum over these rows is the corpus's longest
    repeated substring (Lee et al.'s dedup target); Kasai's O(n) walk
    is inherently sequential, this form is log-round distributed.
    """
    nxt = sa.select(
        (F.col("sa_rank") - 1).alias("sa_rank"), F.col("pos").alias("pos_b")
    )
    pairs = (
        sa.join(nxt, "sa_rank")
        .select(
            "sa_rank",
            F.col("pos").alias("pos_a"),
            "pos_b",
            F.lit(0).cast("long").alias("acc"),
        )
        .transform(cut_lineage)
    )
    for span, ranks in sorted(history, key=lambda t: -t[0]):
        ra = ranks.select(F.col("pos").alias("_pa"), F.col("r").alias("_ra"))
        rb = ranks.select(F.col("pos").alias("_pb"), F.col("r").alias("_rb"))
        pairs = (
            pairs.join(
                ra, pairs["pos_a"] + pairs["acc"] == ra["_pa"], "left"
            )
            .join(rb, pairs["pos_b"] + pairs["acc"] == rb["_pb"], "left")
            .withColumn(
                "acc",
                F.when(
                    F.col("_ra").isNotNull()
                    & (F.col("_ra") == F.col("_rb")),
                    F.col("acc") + span,
                ).otherwise(F.col("acc")),
            )
            .drop("_pa", "_ra", "_pb", "_rb")
            .transform(cut_lineage)
        )
    return pairs.select("sa_rank", "pos_a", "pos_b", F.col("acc").alias("lcp"))
