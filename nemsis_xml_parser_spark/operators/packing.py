"""Sequence packing for training-batch assembly (north-star LLM op).

Two tiers, mirroring the dedup design:

* ``pack_sequences_cumsum`` (plans/llm_ops.py): closed-form
  cumulative-fill packing — one window, fully SQL-expressible, docs may
  straddle pack boundaries (the "concat-then-chunk" strategy most
  pretraining pipelines use).
* ``greedy_pack`` (here): boundary-respecting first-fit — a document is
  never split; a pack closes when the next document would overflow the
  token budget.  Inherently sequential per stream, so it runs as
  ``applyInPandas`` per shard key (language here): each shard's scan is
  a tight pandas loop, shards pack in parallel, and the output unit is
  (shard, pack_id) — exactly how a 100 TB corpus packs, since packs
  never span shards.

Oversized documents (tok > budget) get a pack of their own (the
downstream truncation/split policy is the caller's decision, flagged via
``oversize``).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

PACK_SCHEMA = (
    "shard string, pack_id bigint, n_docs bigint, tokens bigint, "
    "fill double, oversize boolean, doc_ids array<bigint>"
)


def greedy_pack(
    docs: DataFrame,
    budget: int = 2048,
    shard_col: str = "lang",
    id_col: str = "doc_id",
    token_col: str = "tok",
) -> DataFrame:
    """First-fit greedy packing per shard: (shard, pack_id, n_docs,
    tokens, fill, oversize, doc_ids).  Deterministic: docs are packed in
    ``id_col`` order within their shard."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        shard = str(pdf[shard_col].iloc[0])
        out = []
        cur_ids: list[int] = []
        cur_tok = 0

        def close():
            if cur_ids:
                out.append(
                    (
                        shard,
                        len(out),
                        len(cur_ids),
                        cur_tok,
                        cur_tok / budget,
                        cur_tok > budget,
                        list(cur_ids),
                    )
                )

        for doc, tok in zip(pdf[id_col], pdf[token_col]):
            tok = int(tok)
            if cur_tok + tok > budget and cur_ids:
                close()
                cur_ids, cur_tok = [], 0
            cur_ids.append(int(doc))
            cur_tok += tok
        close()
        return pd.DataFrame(
            out,
            columns=[
                "shard", "pack_id", "n_docs", "tokens", "fill",
                "oversize", "doc_ids",
            ],
        )

    return (
        docs.select(
            F.col(shard_col).cast("string").alias(shard_col),
            F.col(id_col),
            F.col(token_col),
        )
        .groupBy(shard_col)
        .applyInPandas(pack, schema=PACK_SCHEMA)
    )
