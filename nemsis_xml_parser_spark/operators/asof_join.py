"""As-of join — an operator Spark lacks natively (pyspark_guide "Common
OLAP patterns"): for each left row, the most recent right row with
``right.ts <= left.ts`` within the same key.

Two interchangeable implementations:

* ``asof_join``          — pure built-in composition: union both sides
                           tagged, one window pass carries the last right
                           value forward, filter back to left rows.  One
                           shuffle on (key), no UDF — the default and the
                           100 TB path.
* ``asof_join_pandas``   — ``applyInPandas`` + ``pd.merge_asof`` per key
                           group: the escape hatch pattern for semantics
                           the built-ins can't express (here they can, so
                           this exists as the reference implementation the
                           composition is tested against).

Ties (right rows sharing one (key, ts)): the row with the greatest
``right_order`` column wins — callers pass a deterministic tie-break
column, matching DuckDB's ASOF JOIN after the right side is deduped.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _dedupe_right(right: DataFrame, key: str, ts: str, order: str) -> DataFrame:
    w = Window.partitionBy(key, ts).orderBy(F.col(order).desc())
    return (
        right.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_order: str,
    value_cols: list[str],
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """As-of join via union + fill window.

    ``direction="backward"`` (default): ``value_cols`` from the LATEST
    right row at or before the left row's ``ts``.
    ``direction="forward"``: from the EARLIEST right row at or after it
    (the next-event lookup — e.g. "first signup following this view").
    ``direction="nearest"``: whichever of the two is closer in absolute
    time; exact ties prefer backward (pd.merge_asof semantics).
    ``tolerance`` (optional): a literal of the ts column's difference
    type — an interval SQL string like ``"INTERVAL 1 HOUR"`` for
    timestamps, or a number for numeric ts — beyond which a match is
    nulled out (pd.merge_asof tolerance).
    NULL when no such row.  Exactly one shuffle (hash on ``key``), then
    a single window pass — scales linearly; forward is the same pass
    with the time axis reversed, and nearest evaluates both passes over
    the one shuffled layout and picks per row.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    right = _dedupe_right(right, key, ts, right_order)
    lcols = left.columns
    l_tag = left.withColumn("__is_left", F.lit(1))
    # carry the matched right row's ts inside the struct: nearest needs
    # the distances, and it preserves merge_asof's NULL-field semantics
    r_tag = right.select(
        key, ts, *value_cols
    ).withColumn("__rts", F.col(ts)).withColumn("__is_left", F.lit(0))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    struct_cols = [*value_cols, "__rts"]

    def carried_over(ts_ord):
        # right rows sort before left rows at the same ts so "at or
        # before" (resp. "at or after") includes exact-ts matches
        w = (
            Window.partitionBy(key)
            .orderBy(ts_ord, F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # Fill forward ONE struct carrying all value columns: the struct
        # is non-null for every right row even when individual fields are
        # NULL, so a NULL inside the matched row is preserved instead of
        # falling back to an older row's non-NULL value.
        return F.last(
            F.when(
                F.col("__is_left") == 0,
                F.struct(*[F.col(c) for c in struct_cols]),
            ),
            ignorenulls=True,
        ).over(w)

    if direction == "backward":
        chosen = carried_over(F.col(ts).asc())
    elif direction == "forward":
        chosen = carried_over(F.col(ts).desc())
    else:
        back = carried_over(F.col(ts).asc())
        fwd = carried_over(F.col(ts).desc())
        closer_back = (F.col(ts) - back["__rts"]) <= (fwd["__rts"] - F.col(ts))
        chosen = (
            F.when(fwd.isNull(), back)
            .when(back.isNull(), fwd)
            .when(closer_back, back)
            .otherwise(fwd)
        )
    if tolerance is not None:
        # pd.merge_asof tolerance semantics: a match farther than
        # ``tolerance`` from the left ts is discarded (nulls out), not
        # replaced by the next-nearer row — the fill already carries the
        # NEAREST admissible row per direction, so the filter is exact.
        tol = F.expr(tolerance) if isinstance(tolerance, str) else F.lit(tolerance)
        dist = F.when(
            chosen["__rts"] <= F.col(ts), F.col(ts) - chosen["__rts"]
        ).otherwise(chosen["__rts"] - F.col(ts))
        chosen = F.when(dist <= tol, chosen)
    filled = unioned.select("*", chosen.alias("__asof"))
    out = filled.where(F.col("__is_left") == 1).select(
        *lcols, *[F.col("__asof")[c].alias(c) for c in value_cols]
    )
    return out


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_order: str,
    value_cols: list[str],
) -> DataFrame:
    """Reference implementation via per-key ``pd.merge_asof`` (Arrow-batched
    grouped map).  Semantics-identical to ``asof_join``; used in tests as
    the independent oracle and as the template for genuinely
    non-composable grouped logic."""
    from pyspark.sql.types import StructField, StructType

    right = _dedupe_right(right, key, ts, right_order)
    r_sel = right.select(key, ts, *value_cols)
    lcols = left.columns
    # fresh StructType — StructType.add mutates in place, which would
    # corrupt left.schema (and left.columns) for the closure below
    out_schema = StructType(
        list(left.schema.fields)
        + [
            StructField(f.name, f.dataType, True)
            for f in r_sel.schema.fields
            if f.name in value_cols
        ]
    )

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        lp = (
            pdf[pdf["__side"] == "l"][lcols]
            .sort_values(ts, kind="mergesort")
            .reset_index(drop=True)
        )
        rp = (
            pdf[pdf["__side"] == "r"][[key, ts, *value_cols]]
            .sort_values(ts, kind="mergesort")
            .reset_index(drop=True)
        )
        if lp.empty:
            return pd.DataFrame(columns=[*lcols, *value_cols])
        if rp.empty:
            for c in value_cols:
                lp[c] = None
            return lp
        return pd.merge_asof(lp, rp.drop(columns=[key]), on=ts, direction="backward")

    l_tag = left.withColumn("__side", F.lit("l"))
    r_tag = r_sel.withColumn("__side", F.lit("r"))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    return (
        unioned.groupBy(key)
        .applyInPandas(lambda _, pdf: merge_group(pdf), schema=out_schema)
    )
