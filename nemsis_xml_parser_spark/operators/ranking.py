"""BM25 full-text relevance ranking over the documents corpus.

The reference engine defers all retrieval to PostgreSQL full-text
search; here the standard Okapi BM25 scorer is expressed as pure
DataFrame algebra so it scales with the corpus:

* one pass builds per-document term frequencies for the query terms
  (filter *before* the groupBy, so the shuffle carries only matching
  (doc, term) rows — never the full inverted index);
* document frequency and corpus stats (N, avgdl) are tiny aggregates
  broadcast back into the score join;
* no Python UDFs — ln/arith stay inside whole-stage codegen.

avgdl is computed as exact BIGINT sum / count (one double division) so
the DuckDB oracle reproduces it bit-for-bit; per-doc scores sum <=
len(terms) doubles and are rounded to 6 decimals at the boundary.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions import text as T


def bm25_scores(
    docs: DataFrame,
    terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc_id, bm25) for every document matching >= 1 query term.

    idf uses the standard smoothed form ln(1 + (N - df + 0.5)/(df + 0.5)),
    which is always positive (Robertson-Sparck Jones with the +1 floor).
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        T.tokens(F.lower(F.col(text_col))).alias("_toks"),
    )
    lengths = base.select("doc_id", F.size("_toks").alias("dl"))
    stats = lengths.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )
    tf = (
        base.select("doc_id", F.explode("_toks").alias("term"))
        .where(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(lengths, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "_score",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
                )
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.sum("_score"), 6).alias("bm25")
    )
