"""Distributed BPE merge-table training (Sennrich et al. 2016 semantics).

The trainer every LLM tokenizer pipeline runs: collapse the corpus to a
word-frequency table ONCE (the only corpus-sized shuffle), then iterate
merge rounds over the vocabulary — count adjacent symbol pairs weighted
by word frequency, pick the most frequent pair (deterministic
count-desc / pair-asc tie-break), fuse it everywhere, repeat.  At 100 TB
the word table is millions of rows where the corpus is trillions of
tokens, so the per-round cost is a bounded hash aggregate — exactly the
scaling shape sentencepiece/fastBPE use.

Cross-engine-exact merge application
------------------------------------
A word's symbol sequence is stored as a *cell string*: ``abc`` →
``(a)(b)(c)``.  Applying merge (x, y) is then a single literal
``replace('(x)(y)' → '(xy)')``.  Because every cell carries its own
opening AND closing paren, adjacent pair occurrences share no
characters, so the left-to-right non-overlapping scan that
``replace`` performs on every engine (Spark ``UTF8String.replace``,
DuckDB ``replace``, Python ``str.replace``) IS Sennrich's greedy
re.sub application: in a run ``aaaa`` the merge (a,a) produces
``(aa)(aa)``, never ``(aa)(a)(a)`` — and a pair can never false-match
inside a longer symbol (``(ll)(o)`` does not contain ``(l)(o)``).
The alphabet guard (``^[a-z0-9]+$``) keeps the paren delimiters
unambiguous, mirroring the normalization pass real trainers run first.

Reference parity: none — the reference (a single-threaded psycopg2 ETL)
has no tokenizer training; this is the §2.I LLM-pipeline tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .lineage import cut_lineage

WORD_GUARD = "^[a-z0-9]+$"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, cnt) over whitespace tokens of lowercased text, restricted to
    the trainer alphabet (lowercase alnum) so the cell delimiters are
    unambiguous.  This is the one corpus-sized aggregate."""
    from ..functions import text as T

    w = docs.select(F.explode(T.tokens(F.lower(F.col(text_col)))).alias("w"))
    return (
        w.where(F.col("w").rlike(WORD_GUARD))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


BPE_LOCAL_MAX = 2_000_000  # vocab rows under which the merge loop runs
# as ONE single-task Arrow stage (the operators/mst.py
# _resolve_roots_local guarded-endgame pattern)


def _bpe_merge_loop(
    cells: list, cnts: list, rounds: int
) -> list[tuple[int, str, str, str, int]]:
    """The merge loop on a materialized vocabulary — operation-for-
    operation the Spark loop below: pair counts are exact int sums over
    the ``)(``-split cells, the argmax orders (count DESC, x ASC,
    y ASC) (Python str comparison == Spark's binary UTF8 ordering —
    UTF-8 byte order preserves code-point order), and the fuse is a
    left-to-right non-overlapping literal replace (str.replace ==
    F.replace)."""
    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(1, rounds + 1):
        pc: dict[tuple[str, str], int] = {}
        for s, c in zip(cells, cnts):
            toks = s[1:-1].split(")(")
            if len(toks) < 2:
                continue
            c = int(c)
            for i in range(len(toks) - 1):
                k = (toks[i], toks[i + 1])
                pc[k] = pc.get(k, 0) + c
        if not pc:  # vocabulary fully fused — nothing left to merge
            break
        (x, y), c = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((r, x, y, x + y, int(c)))
        if r < rounds:
            old, new = f"({x})({y})", f"({x}{y})"
            cells = [s.replace(old, new) for s in cells]
    return merges


def train_bpe_merges(words: DataFrame, rounds: int) -> DataFrame:
    """Learn ``rounds`` BPE merges from a (w, cnt) word-frequency frame.

    Returns a tiny local frame ``(round, left_tok, right_tok, merged,
    merge_count)`` — merge_count is the pair's corpus frequency at the
    moment it was chosen (i.e. before it was fused).

    The corpus collapses to the vocabulary before any merge work; when
    the vocabulary fits the ``BPE_LOCAL_MAX`` row budget (measured off
    the pin's ``observe`` — no extra job) the whole merge loop runs as
    ONE single-task Arrow stage over the pinned vocab instead of
    ``rounds`` sequential (pair-count aggregate + argmax collect +
    lineage cut) job pairs — the guarded local endgame of
    ``operators/mst.py::_resolve_roots_local`` (guide §1.2: at demo
    scale the job ladder is the wall; at 100 TB an over-budget vocab
    takes the distributed loop below unchanged).  Both paths compute
    the identical merge table (``tests/test_bpe.py`` pins local ==
    distributed).
    """
    from pyspark.sql import Observation

    spark = words.sparkSession
    obs = Observation()
    vocab = cut_lineage(
        words.select(
            F.regexp_replace(F.col("w"), "(.)", "($1)").alias("cells"),
            F.col("cnt"),
        ).observe(obs, F.count(F.lit(1)).alias("n"))
    )
    n_vocab = obs.get["n"] or 0
    out_schema = (
        "round int, left_tok string, right_tok string, merged string, "
        "merge_count bigint"
    )
    if n_vocab <= BPE_LOCAL_MAX:

        def run(batches):
            import pandas as pd

            cells: list = []
            cnts: list = []
            for b in batches:
                cells.extend(b["cells"].tolist())
                cnts.extend(b["cnt"].tolist())
            got = _bpe_merge_loop(cells, cnts, rounds)
            yield pd.DataFrame(
                got,
                columns=[
                    "round", "left_tok", "right_tok", "merged",
                    "merge_count",
                ],
            ).astype(
                {"round": "int32", "merge_count": "int64"}
            ) if got else pd.DataFrame(
                {
                    "round": pd.Series(dtype="int32"),
                    "left_tok": pd.Series(dtype="object"),
                    "right_tok": pd.Series(dtype="object"),
                    "merged": pd.Series(dtype="object"),
                    "merge_count": pd.Series(dtype="int64"),
                }
            )

        rows = (
            vocab.coalesce(1)  # pinned leaf — the corpus aggregate above
            # already ran wide; this only narrows the merge-loop task
            .mapInPandas(run, out_schema)
            .collect()  # <= rounds rows, bounded by the protocol constant
        )
        return spark.createDataFrame(
            [tuple(r) for r in rows] or [], out_schema
        )
    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(1, rounds + 1):
        toks = vocab.select(
            "cnt",
            F.split(
                F.expr("substring(cells, 2, length(cells) - 2)"), r"\)\("
            ).alias("toks"),
        ).where(F.size("toks") >= 2)
        pairs = toks.select(
            "cnt",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.struct(
                        F.element_at("toks", i).alias("x"),
                        F.element_at("toks", i + 1).alias("y"),
                    ),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
            .agg(F.sum("cnt").cast("bigint").alias("c"))
            .orderBy(F.col("c").desc(), F.col("x").asc(), F.col("y").asc())
            .limit(1)
            .collect()
        )
        if not best:  # vocabulary fully fused — nothing left to merge
            break
        x, y, c = best[0].x, best[0].y, int(best[0].c)
        merges.append((r, x, y, x + y, c))
        if r < rounds:
            vocab = cut_lineage(
                vocab.withColumn(
                    "cells",
                    F.replace(
                        F.col("cells"),
                        F.lit(f"({x})({y})"),
                        F.lit(f"({x}{y})"),
                    ),
                )
            )
    return spark.createDataFrame(
        merges,
        "round int, left_tok string, right_tok string, merged string, "
        "merge_count bigint",
    )


def word_frequencies_by(
    docs: DataFrame, group_col: str, text_col: str = "text"
) -> DataFrame:
    """(group, cells, cnt) — the per-group word-frequency vocabulary in
    paren-cell form, for the ENCODE side (training stays global)."""
    from ..functions import text as T

    w = docs.select(
        F.col(group_col).alias(group_col),
        F.explode(T.tokens(F.lower(F.col(text_col)))).alias("w"),
    )
    return (
        w.where(F.col("w").rlike(WORD_GUARD))
        .groupBy(group_col, "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(
            group_col,
            F.regexp_replace(F.col("w"), "(.)", "($1)").alias("cells"),
            "cnt",
        )
    )


def apply_bpe_merges(
    vocab: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Apply a trained merge list IN ORDER to a paren-cell vocabulary —
    Sennrich's greedy encode, the literal-replace argument of the
    module docstring.  ``merges`` is [(left_tok, right_tok), ...]; each
    is one narrow replace, so the apply never rescans the corpus."""
    out = vocab
    for left, right in merges:
        out = out.withColumn(
            "cells",
            F.replace(
                F.col("cells"),
                F.lit(f"({left})({right})"),
                F.lit(f"({left}{right})"),
            ),
        )
    return out
